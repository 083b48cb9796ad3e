"""Conformer updates on the product manifold R^3 x SO(3) x T^m, masked+batched.

Reference behavior (/root/reference/utils/diffusion_utils.py:19-55): apply the
translation update and an axis-angle rotation about the ligand centroid, then
the per-bond torsion updates, then Kabsch-align the flexible result back onto
the rigid pose so torsion changes don't leak into the tr/rot components.

The TPU build is fully batched (B, N, 3), masked (padded atoms ignored in the
centroid and the alignment), and jit-safe -- it is the per-step state update
inside the sampler's ``lax.scan``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from .kabsch import kabsch_align, kabsch_apply
from .rotations import axis_angle_to_matrix
from .torsion import apply_torsion_updates


def masked_mean(pos: jnp.ndarray, mask: jnp.ndarray, axis=-2, keepdims=True) -> jnp.ndarray:
    w = mask.astype(pos.dtype)[..., None]
    return jnp.sum(pos * w, axis=axis, keepdims=keepdims) / (
        jnp.sum(w, axis=axis, keepdims=keepdims) + 1e-12
    )


def modify_conformer(
    pos: jnp.ndarray,
    atom_mask: jnp.ndarray,
    tr_update: jnp.ndarray,
    rot_update: jnp.ndarray,
    torsion_updates: jnp.ndarray | None = None,
    tor_edges: jnp.ndarray | None = None,
    mask_rotate: jnp.ndarray | None = None,
    bond_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply (tr, rot, torsion) updates to ligand poses.

    Args:
      pos: (B, N, 3) ligand positions.
      atom_mask: (B, N) validity.
      tr_update: (B, 3) translation.
      rot_update: (B, 3) axis-angle rotation about the ligand centroid.
      torsion_updates: (B, R) per-rotatable-bond angles, or None.
      tor_edges: (B, R, 2) bond endpoints.
      mask_rotate: (B, R, N) moving-atom masks.
      bond_mask: (B, R) validity of bond slots.

    Returns:
      (B, N, 3) updated positions (padded slots transformed rigidly, harmless).
    """
    center = masked_mean(pos, atom_mask)
    rot_mat = axis_angle_to_matrix(rot_update)  # (B, 3, 3)
    rigid_new_pos = (
        _einsum("bni,bji->bnj", pos - center, rot_mat)
        + tr_update[:, None, :]
        + center
    )

    if torsion_updates is None:
        return rigid_new_pos

    flexible_new_pos = apply_torsion_updates(
        rigid_new_pos, tor_edges, mask_rotate, torsion_updates, bond_mask
    )
    R, t = kabsch_align(flexible_new_pos, rigid_new_pos, atom_mask)
    return kabsch_apply(flexible_new_pos, R, t)
