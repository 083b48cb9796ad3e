"""A/B gather/scatter strategies at all-atom (confidence-model) shapes.

The CG bench model uses one-hot MXU matmuls for gather/scatter (nn/conv.py),
which costs O(E*N*D) FLOPs and O(B*E*N) one-hot bytes.  At the all-atom
model's atom-node count (N=2560) those one-hots get heavy; this measures the
alternatives on the real chip so the all-atom path can pick per-shape:

  1. one-hot matmul (current default)
  2. jnp.take_along_axis gather + jax.ops.segment_sum scatter (flattened)
  3. native XLA .at[].add scatter / take gather

Run: `python benchmarks/scatter_ab.py [B E N D]`.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    B, E, N, D = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (8, 30720, 2560, 84)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    nodes = jax.random.normal(k1, (B, N, D), jnp.bfloat16)
    msg = jax.random.normal(k2, (B, E, D), jnp.bfloat16)
    idx = jax.random.randint(k3, (B, E), 0, N)
    mask = jnp.ones((B, E), bool)

    @jax.jit
    def onehot_pair(nodes, msg, idx, mask):
        oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16) * mask[..., None]
        x = jnp.einsum("ben,bnd->bed", oh, nodes)
        s = jnp.einsum("ben,bed->bnd", oh, msg, preferred_element_type=jnp.float32)
        return x, s

    @jax.jit
    def segment_pair(nodes, msg, idx, mask):
        x = jnp.take_along_axis(nodes, idx[..., None], axis=1)
        flat_idx = (idx + N * jnp.arange(B)[:, None]).reshape(-1)
        flat_msg = jnp.where(mask.reshape(-1, 1), msg.reshape(B * E, D), 0)
        s = jax.ops.segment_sum(flat_msg.astype(jnp.float32), flat_idx, num_segments=B * N)
        return x, s.reshape(B, N, D)

    @jax.jit
    def at_add_pair(nodes, msg, idx, mask):
        x = jnp.take_along_axis(nodes, idx[..., None], axis=1)
        z = jnp.zeros((B, N, D), jnp.float32)
        mm = jnp.where(mask[..., None], msg, 0).astype(jnp.float32)
        s = z.at[jnp.arange(B)[:, None], idx].add(mm)
        return x, s

    for name, fn in [("onehot", onehot_pair), ("segment_sum", segment_pair), ("at_add", at_add_pair)]:
        ms = timeit(fn, nodes, msg, idx, mask)
        print(f"{name:>12}: {ms:8.3f} ms  (B={B} E={E} N={N} D={D})", flush=True)


if __name__ == "__main__":
    main()
