"""Masked, batched Kabsch rigid alignment in pure JAX (no LAPACK at runtime).

Reference behavior (/root/reference/utils/geometry.py:88-156): SVD of the 3x3
cross-covariance, reflection fix via diag(1,1,-1), R = V S U^T, t aligns the
centroids.  The TPU build differs in two ways:

  * it is *masked*: padded atom slots (mask=0) do not contribute to centroids
    or to the covariance, so padded and unpadded batches give identical results
  * the 3x3 SVD runs through ``jnp.linalg.svd`` which XLA lowers to an
    iterative Jacobi method on TPU -- jit-safe, batched, differentiable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Geometry must stay fp32-exact even on TPU (default matmul precision is
# bf16); all contractions here pin HIGHEST precision.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def kabsch_align(
    A: jnp.ndarray, B: jnp.ndarray, mask: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find rigid (R, t) minimizing || (A @ R^T + t) - B || over valid atoms.

    Args:
      A: (..., N, 3) source points.
      B: (..., N, 3) target points.
      mask: optional (..., N) validity mask.

    Returns:
      R: (..., 3, 3) rotation with det(R) = +1.
      t: (..., 3) translation (row-vector convention: x' = x @ R^T + t).
    """
    if mask is None:
        w = jnp.ones(A.shape[:-1], dtype=A.dtype)
    else:
        w = mask.astype(A.dtype)
    denom = jnp.sum(w, axis=-1, keepdims=True)[..., None] + 1e-12
    wA = A * w[..., None]
    wB = B * w[..., None]
    cA = jnp.sum(wA, axis=-2, keepdims=True) / denom
    cB = jnp.sum(wB, axis=-2, keepdims=True) / denom
    Am = (A - cA) * w[..., None]
    Bm = (B - cB) * w[..., None]

    # Cross-covariance H = Am^T @ Bm : (..., 3, 3)
    H = _einsum("...ni,...nj->...ij", Am, Bm)

    U, S, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    R = _einsum("...ij,...jk->...ik", V, Ut)
    det = jnp.linalg.det(R)
    # Reflection fix: flip the sign of V's last column where det < 0.
    flip = jnp.where(det < 0, -1.0, 1.0)[..., None]
    V_fixed = V.at[..., :, 2].multiply(flip)
    R = _einsum("...ij,...jk->...ik", V_fixed, Ut)

    t = (cB - _einsum("...ni,...ji->...nj", cA, R)).squeeze(-2)
    return R, t


def kabsch_apply(pos: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply (R, t) to (..., N, 3) points: x @ R^T + t."""
    return _einsum("...ni,...ji->...nj", pos, R) + t[..., None, :]
