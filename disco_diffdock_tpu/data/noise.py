"""On-device training-time noise transform.

Parity with ``NoiseTransform`` (datasets_utils/pdbbind.py:27-57), which runs
per-sample on the host inside dataloader workers.  Here the perturbation and
the exact score targets are computed on device for the whole padded batch in
one shot (inside the jitted train step): t ~ Beta(alpha, beta) per graph,
Gaussian translation, IGSO(3) rotation, *unwrapped* Gaussian torsion updates
(the reference uses np.random.normal, not the wrapped sampler, :49), and
score-matching targets tr=-u/sigma^2, rot=IGSO3 score, tor=torus score.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import so3, torus
from ..geom.conformer import modify_conformer
from ..geom.diffusion import SigmaSchedule
from ..graphs.containers import ComplexBatch


def apply_noise(
    key: jax.Array,
    batch: ComplexBatch,
    sigma: SigmaSchedule,
    alpha: float = 1.0,
    beta: float = 1.0,
    no_torsion: bool = False,
    t_override=None,
    graph_ids: jnp.ndarray | None = None,
) -> tuple[ComplexBatch, dict]:
    """Perturb poses and return (noised batch, targets dict).

    Targets: tr_score (B,3), rot_score (B,3), tor_score (B,R),
    tor_sigma (B,), all in the same padded layout as the model outputs.

    Every random draw is keyed per graph by ``fold_in(key, graph_id)``
    (``graph_ids`` defaults to ``arange(B)``), so the draws depend only on
    the graph's GLOBAL batch position -- a data-parallel shard passing its
    global ids reproduces the single-device noise exactly, making sharded
    training bit-comparable to unsharded (tests/test_parallel.py).
    """
    B = batch.num_graphs
    R = batch.tor_edges.shape[1]
    if graph_ids is None:
        graph_ids = jnp.arange(B)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(graph_ids)

    if t_override is None:
        t = jax.vmap(
            lambda k: jax.random.beta(jax.random.split(k, 4)[0], alpha, beta, ())
        )(keys)
    else:
        t = jnp.broadcast_to(jnp.asarray(t_override, jnp.float32), (B,))
    tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t, t, t)

    def draw(k, tr_s, rot_s, tor_s):
        _, k_tr, k_rot, k_tor = jax.random.split(k, 4)
        tr_g = jax.random.normal(k_tr, (3,)) * tr_s
        rot_g = so3.sample_vec(k_rot, rot_s)
        tor_g = jax.random.normal(k_tor, (R,)) * tor_s
        return tr_g, rot_g, tor_g

    tr_update, rot_update, tor_update = jax.vmap(draw)(
        keys, tr_sigma, rot_sigma, tor_sigma)

    new_pos = modify_conformer(
        batch.lig_pos,
        batch.lig_mask,
        tr_update,
        rot_update,
        None if no_torsion else tor_update,
        batch.tor_edges,
        batch.tor_mask_rotate,
        batch.tor_mask,
    )
    noised = batch.replace(lig_pos=new_pos).set_time(t, t, t)

    targets = {
        "tr_score": -tr_update / tr_sigma[:, None] ** 2,
        "rot_score": so3.score_vec(rot_sigma, rot_update),
        "tor_score": torus.score(tor_update, tor_sigma[:, None]) * batch.tor_mask,
        "tor_sigma": tor_sigma,
    }
    return noised, targets
