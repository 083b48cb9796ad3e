"""A/B: is hoisting step-invariant receptor assembly out of the scan worth it?

The sampler's scan body (sampling/sampler.py) calls the score model, whose
``embed`` rebuilds the receptor-side operands every step: one-hot gather
matrices for the precomputed kNN edges, edge vectors/distances, spherical
harmonics, and the RBF distance expansion (models/score_model.py:313-334).
With ``shared_rec`` these compute at B=1, and they depend only on scan
*constants* (the receptor is rigid: reference models/score_model.py:346-373
precomputes rec edges once per complex), so XLA's while-loop LICM may already
hoist them -- and even if not, the absolute cost may be under the bench's
measurement noise.  This probe settles it before any invasive model-API
plumbing:

  A) a 20-step scan whose body recomputes the receptor assembly from closure
     constants and feeds it into per-step dependent work (a conv-like matmul
     with the carry)
  B) the same scan with the assembly precomputed outside and closed over

Timing: whole-program wall time with a host fetch (block_until_ready does not
wait on the tunneled platform; see scatter_ab.py), differenced against a
zero-body calibration scan.

Measured (v5e, B=1 NR=320 Er=7680 D=32, 3x5 windows, median):
  recompute-in-body 20 steps : see output
  hoisted                    : see output
Run: ``python benchmarks/rec_hoist_ab.py``.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from disco_diffdock_tpu.graphs.containers import ListEdges
from disco_diffdock_tpu.nn.conv import build_onehots, gather_pos
from disco_diffdock_tpu.nn.sh import spherical_harmonics

NR, ER, D = 320, 320 * 24, 32
STEPS = 20


def rec_assembly(rec_edges, rec_pos):
    """The step-invariant receptor operands embed() builds every forward."""
    oh = build_onehots(rec_edges, NR, NR, jnp.bfloat16)
    vec = gather_pos(oh[1], rec_pos) - gather_pos(oh[0], rec_pos)
    dist = jnp.linalg.norm(vec + 1e-12, axis=-1)
    offset = jnp.linspace(0.0, 15.0, D)
    coeff = -0.5 / 15.0**2 * (D - 1) ** 2
    dd = dist[..., None] - offset
    rbf = jnp.exp(coeff * dd * dd)
    sh = spherical_harmonics(vec, 1)
    return oh, rbf, sh


def make_run(hoist: bool, rec_edges, rec_pos, w):
    pre = rec_assembly(rec_edges, rec_pos) if hoist else None

    @jax.jit
    def run(h0):
        def body(h, _):
            oh, rbf, sh = pre if hoist else rec_assembly(rec_edges, rec_pos)
            # per-step dependent consumer: edge features * weights, scattered
            # back through the one-hot (a stand-in for the layer-0 rec conv)
            e = jnp.concatenate([rbf, sh], -1).astype(jnp.bfloat16)
            msg = jnp.einsum("bed,df->bef", e, w)
            node = jnp.einsum("ben,bef->bnf", oh[0], msg)
            h = h + node.astype(jnp.float32) * 1e-3
            return h, None

        h, _ = jax.lax.scan(body, h0, None, length=STEPS)
        return h.sum()

    return run


def timeit(run, h0, windows=3, reps=5):
    float(run(h0))  # compile
    secs = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            v = float(run(h0))
        secs.append((time.perf_counter() - t0) / reps)
    return float(np.median(secs)) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rec_pos = jax.random.normal(k1, (1, NR, 3)) * 20
    # kNN-like edges: each node connected to 24 random others
    src = jnp.repeat(jnp.arange(NR), 24)[None]
    dst = jax.random.randint(k2, (1, ER), 0, NR)
    rec_edges = ListEdges(src=src, dst=dst, mask=jnp.ones((1, ER), bool))
    w = jax.random.normal(k3, (D + 4, 64), jnp.bfloat16) * 0.1
    h0 = jnp.zeros((1, NR, 64), jnp.float32)

    in_body = timeit(make_run(False, rec_edges, rec_pos, w), h0)
    hoisted = timeit(make_run(True, rec_edges, rec_pos, w), h0)
    print(f"recompute-in-body: {in_body:8.3f} ms / {STEPS}-step program")
    print(f"          hoisted: {hoisted:8.3f} ms / {STEPS}-step program")
    print(f"            delta: {in_body - hoisted:8.3f} ms "
          f"({(in_body - hoisted) / STEPS * 1e3:.1f} us/step)")


if __name__ == "__main__":
    main()
