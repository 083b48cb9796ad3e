"""Edge-capacity overflow auditing.

The TPU build replaces ``torch_cluster.radius``'s unbounded edge lists
(reference models/score_model.py:375-408) with fixed-capacity compaction that
drops the farthest pairs on overflow (graphs/radius.py).  A wrong capacity
would change results *silently* -- so every runtime radius graph counts its
dropped edges (``ListEdges.overflow``, sown as flax intermediates), and this
module surfaces them:

  * ``edge_overflow(model, variables, batch)``: one forward, returns the total
    dropped-edge count per edge type.
  * ``audit_worst_case(...)``: runs the forward at t=1 on a *randomized* pose
    (the sigma-dependent cross cutoff ``3*sigma+20`` is largest there), i.e.
    the edge-pressure worst case of an inference trajectory.

bench.py and the evaluator report these; a nonzero count at shipped caps is a
loud signal instead of a silent quality bug.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _collect_overflow(intermediates) -> dict[str, int]:
    out: dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        name = next((k for k in keys if str(k).startswith("overflow_")), None)
        if name is not None:
            out[str(name)] = out.get(str(name), 0) + int(jnp.sum(leaf))
    return out


def edge_overflow(model, variables, batch, **apply_kw) -> dict[str, int]:
    """Total dropped true edges per edge type for one forward."""
    # one-shot audit, but still jit: eager per-op dispatch through a TPU
    # tunnel is ~100x slower than one compiled program
    run = jax.jit(lambda v, b: model.apply(
        v, b, deterministic=True, use_running_average=True,
        mutable=["intermediates"], **apply_kw,
    ))
    _, state = run(variables, batch)
    return _collect_overflow(state["intermediates"])


def audit_worst_case(
    model, variables, batch, key, tr_sigma_max: float = 19.0, latent_fn=None
):
    """Overflow at the inference worst case: t=1, randomized ligand position.

    The t=1 forward has the largest cross cutoff (3*sigma_max + 20) and the
    widest ligand spread, so zero overflow here strongly suggests adequate
    caps for the whole trajectory.  ``latent_fn`` supplies latents for DisCo
    models whose embeddings require them.
    """
    from ..sampling import randomize_position

    k1, k2 = jax.random.split(key)
    rb = randomize_position(k1, batch, False, False, tr_sigma_max)
    rb = rb.set_time(1.0, 1.0, 1.0)
    kw = {}
    if latent_fn is not None:
        kw["latent"] = latent_fn(rb, k2)
    return edge_overflow(model, variables, rb, **kw)
