"""Real spherical harmonics l <= 3, closed-form, 'component' normalization.

Replaces the reference's ``o3.spherical_harmonics(..., normalize=True,
normalization='component')`` calls (models/score_model.py:342,371,406 etc.)
with explicit polynomials that XLA fuses into the surrounding edge math.

Basis convention: m-ordered (-l..l) real harmonics, so l=1 is
sqrt(3) * (y, z, x) of the unit vector.  The same formulas (numpy twin
``sh_numpy``) are used to derive Clebsch-Gordan tables in ``cg.py``, so every
tensor-product contraction in the framework is consistent with this basis by
construction.  'component' normalization: each l-block of a unit vector has
squared norm (2l+1).

Helpers ``vec_to_irrep`` / ``irrep_to_vec`` convert between physical (x, y, z)
vectors and the (y, z, x) l=1 component layout.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _sh_impl(xp, vec, lmax: int, normalize: bool):
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    if normalize:
        n = xp.sqrt(x * x + y * y + z * z) + 1e-12
        x, y, z = x / n, y / n, z / n
    comps = [xp.ones_like(x)]  # l=0
    if lmax >= 1:
        s3 = math.sqrt(3.0)
        comps += [s3 * y, s3 * z, s3 * x]
    if lmax >= 2:
        s15 = math.sqrt(15.0)
        comps += [
            s15 * x * y,
            s15 * y * z,
            (math.sqrt(5.0) / 2.0) * (3 * z * z - 1),
            s15 * x * z,
            (s15 / 2.0) * (x * x - y * y),
        ]
    if lmax >= 3:
        comps += [
            math.sqrt(35.0 / 8.0) * y * (3 * x * x - y * y),
            math.sqrt(105.0) * x * y * z,
            math.sqrt(21.0 / 8.0) * y * (5 * z * z - 1),
            (math.sqrt(7.0) / 2.0) * z * (5 * z * z - 3),
            math.sqrt(21.0 / 8.0) * x * (5 * z * z - 1),
            (math.sqrt(105.0) / 2.0) * z * (x * x - y * y),
            math.sqrt(35.0 / 8.0) * x * (x * x - 3 * y * y),
        ]
    if lmax >= 4:
        raise NotImplementedError("spherical harmonics implemented for l <= 3")
    return xp.stack(comps, axis=-1)


def spherical_harmonics(vec: jnp.ndarray, lmax: int, normalize: bool = True) -> jnp.ndarray:
    """(..., 3) vectors -> (..., (lmax+1)^2) component-normalized real SH."""
    return _sh_impl(jnp, vec, lmax, normalize)


def sh_numpy(vec: np.ndarray, lmax: int, normalize: bool = True) -> np.ndarray:
    """Numpy twin of :func:`spherical_harmonics` (used by cg.py and tests)."""
    return _sh_impl(np, vec, lmax, normalize)


def sh_block_numpy(vec: np.ndarray, l: int) -> np.ndarray:
    """Single-l block (..., 2l+1) of the numpy SH."""
    full = sh_numpy(vec, l)
    return full[..., l * l : (l + 1) * (l + 1)]


def vec_to_irrep(v: jnp.ndarray) -> jnp.ndarray:
    """Physical (x, y, z) -> l=1 component layout (y, z, x)."""
    return jnp.stack([v[..., 1], v[..., 2], v[..., 0]], axis=-1)


def irrep_to_vec(c: jnp.ndarray) -> jnp.ndarray:
    """l=1 component layout (y, z, x) -> physical (x, y, z)."""
    return jnp.stack([c[..., 2], c[..., 0], c[..., 1]], axis=-1)
