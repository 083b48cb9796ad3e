"""Rotation conversions (quaternion / axis-angle / matrix), pure JAX.

Behavioral parity with the reference's pytorch3d-derived conversions
(/root/reference/utils/geometry.py:6-85): quaternions are real-part-first,
axis-angle magnitude is the CCW angle in radians, and the small-angle branch of
``axis_angle_to_quaternion`` uses the same 2nd-order Taylor expansion
``sin(x/2)/x ~= 1/2 - x^2/48``.  All functions are shape-polymorphic over
leading batch dims and jit/vmap-safe (``jnp.where`` instead of boolean
indexing).
"""
from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Convert quaternions (..., 4), real part first, to matrices (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convert axis-angle vectors (..., 3) to quaternions (..., 4), real first.

    Small-angle-safe: for |angle| < 1e-6 uses sin(x/2)/x ~= 1/2 - x^2/48.
    """
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half_angles = 0.5 * angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # Avoid division by zero inside the discarded branch.
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / safe_angles,
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1
    )


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Convert axis-angle vectors (..., 3) to rotation matrices (..., 3, 3)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to axis-angle vectors (..., 3).

    Numerically stable log map: angle from the trace, axis from the
    antisymmetric part, with a small-angle-safe normalization.
    """
    trace = matrix[..., 0, 0] + matrix[..., 1, 1] + matrix[..., 2, 2]
    cos_angle = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos_angle)
    # Antisymmetric part gives axis * 2 sin(angle)
    ax = jnp.stack(
        [
            matrix[..., 2, 1] - matrix[..., 1, 2],
            matrix[..., 0, 2] - matrix[..., 2, 0],
            matrix[..., 1, 0] - matrix[..., 0, 1],
        ],
        axis=-1,
    )
    sin_angle = jnp.sin(angle)
    small = jnp.abs(sin_angle) < 1e-6
    scale = jnp.where(
        small, 0.5, angle / jnp.where(small, jnp.ones_like(sin_angle), 2.0 * sin_angle)
    )
    # Near angle = pi the antisymmetric part vanishes; fall back to the
    # symmetric-part square-root construction.
    near_pi = angle > jnp.pi - 1e-3
    diag = jnp.stack([matrix[..., 0, 0], matrix[..., 1, 1], matrix[..., 2, 2]], -1)
    axis_sq = jnp.clip((diag - cos_angle[..., None]) / (1.0 - cos_angle[..., None] + 1e-12), 0.0, None)
    axis_pi = jnp.sqrt(axis_sq)
    # fix signs from the off-diagonal symmetric entries RELATIVE TO THE
    # LARGEST axis component (taken positive): S_kj = m[k,j] + m[j,k] has the
    # sign of axis_k * axis_j near pi.  Referencing component 0
    # unconditionally loses the y/z relative sign whenever axis_x ~ 0
    # (e.g. a pi rotation about (0, 1, -1)/sqrt(2)).
    S = matrix + jnp.swapaxes(matrix, -1, -2)
    k = jnp.argmax(axis_sq, axis=-1)
    onek = (k[..., None] == jnp.arange(3)).astype(matrix.dtype)
    s_row = jnp.einsum("...i,...ij->...j", onek, S)
    signs = jnp.where(onek > 0.5, 1.0, jnp.where(s_row >= 0, 1.0, -1.0))
    axis_pi = axis_pi * signs
    axis_pi = axis_pi / (jnp.linalg.norm(axis_pi, axis=-1, keepdims=True) + 1e-12)
    out = jnp.where(near_pi[..., None], axis_pi * angle[..., None], ax * scale[..., None])
    return out


def random_rotation_matrix(key, shape=()) -> jnp.ndarray:
    """Uniform random rotation matrices of shape (*shape, 3, 3).

    Uses the normalized-Gaussian quaternion construction (uniform on SO(3)).
    """
    import jax

    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)
