"""Masked segment reductions over padded edge lists.

TPU-native replacement for ``torch_scatter.scatter(..., reduce='mean')``
(tensor_layers.py:159) and ``scatter_mean`` pooling (score_model.py:265).
``scatter_sum`` lowers to a vmapped ``segment_sum`` (XLA scatter-add); the
hot conv path uses the one-hot MXU matmul formulation in ``nn/conv.py``
instead (gather_mm/scatter_mm — measured faster at conv shapes,
benchmarks/scatter_ab.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_sum(
    values: jnp.ndarray,
    index: jnp.ndarray,
    mask: jnp.ndarray,
    num_segments: int,
) -> jnp.ndarray:
    """Masked per-graph scatter-add.

    Args:
      values: (B, E, D).
      index: (B, E) int32 target node per edge.
      mask: (B, E) validity.
      num_segments: N (static).
    Returns:
      (B, N, D) sums over valid edges.
    """
    v = values * mask[..., None].astype(values.dtype)
    idx = jnp.where(mask, index, 0)  # masked values are zero, index safe

    def one(v_, i_):
        return jax.ops.segment_sum(v_, i_, num_segments=num_segments)

    return jax.vmap(one)(v, idx)


def scatter_mean(
    values: jnp.ndarray,
    index: jnp.ndarray,
    mask: jnp.ndarray,
    num_segments: int,
    eps: float = 1e-12,
) -> jnp.ndarray:
    s = scatter_sum(values, index, mask, num_segments)
    c = scatter_sum(
        jnp.ones(values.shape[:2] + (1,), values.dtype), index, mask, num_segments
    )
    return s / (c + eps)


def masked_mean_pool(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D), (B, N) -> (B, D) mean over valid nodes."""
    w = mask.astype(x.dtype)[..., None]
    return jnp.sum(x * w, axis=1) / (jnp.sum(w, axis=1) + 1e-12)
