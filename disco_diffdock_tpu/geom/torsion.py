"""Torsion-angle updates over padded rotatable-bond arrays, as a ``lax.scan``.

Reference behavior (/root/reference/utils/torsion.py:48-86): for each rotatable
bond (u, v) in order, rotate the atom subset ``mask_rotate[bond]`` about the
bond axis ``pos[u] - pos[v]`` by the bond's torsion update, pivoting at
``pos[v]``.  The rotations compose serially along the molecule, which the TPU
build expresses as a ``lax.scan`` over the padded bond axis: padded bond slots
carry ``bond_mask=0`` and apply the identity.

Convention parity: positive rotation if the axis points "inwards" (u - v), and
``mask_rotate[r, v] == True`` / ``mask_rotate[r, u] == False`` (v side moves).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from .rotations import axis_angle_to_matrix


def apply_torsion_updates(
    pos: jnp.ndarray,
    tor_edges: jnp.ndarray,
    mask_rotate: jnp.ndarray,
    torsion_updates: jnp.ndarray,
    bond_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply per-bond torsion rotations serially.

    Args:
      pos: (..., N, 3) atom positions.
      tor_edges: (..., R, 2) int32 bond endpoints (u, v); v-side rotates.
      mask_rotate: (..., R, N) bool, atoms that move for each bond.
      torsion_updates: (..., R) rotation angles in radians.
      bond_mask: optional (..., R) validity of each bond slot.

    Returns:
      (..., N, 3) updated positions.

    The leading batch dims of all arguments must match (or be absent for the
    single-graph case).
    """
    single = pos.ndim == 2
    if single:
        pos = pos[None]
        tor_edges = tor_edges[None]
        mask_rotate = mask_rotate[None]
        torsion_updates = torsion_updates[None]
        if bond_mask is not None:
            bond_mask = bond_mask[None]

    B, N, _ = pos.shape
    R = tor_edges.shape[-2]
    if bond_mask is None:
        bond_mask = jnp.ones((B, R), dtype=bool)

    # scan over the bond axis; carry = positions
    def body(carry_pos, inp):
        uv, mrot, theta, valid = inp  # (B,2), (B,N), (B,), (B,)
        u, v = uv[:, 0], uv[:, 1]
        pu = jnp.take_along_axis(carry_pos, u[:, None, None].repeat(3, -1), axis=1)[:, 0]
        pv = jnp.take_along_axis(carry_pos, v[:, None, None].repeat(3, -1), axis=1)[:, 0]
        rot_vec = pu - pv  # (B, 3) -- positive rotation points inwards
        norm = jnp.linalg.norm(rot_vec, axis=-1, keepdims=True) + 1e-12
        theta_eff = jnp.where(valid, theta, 0.0)
        rot_mat = axis_angle_to_matrix(rot_vec / norm * theta_eff[:, None])  # (B,3,3)
        moved = _einsum("bni,bji->bnj", carry_pos - pv[:, None, :], rot_mat) + pv[:, None, :]
        sel = (mrot & valid[:, None])[..., None]
        return jnp.where(sel, moved, carry_pos), None

    xs = (
        jnp.moveaxis(tor_edges, 1, 0),  # (R, B, 2)
        jnp.moveaxis(mask_rotate, 1, 0),  # (R, B, N)
        jnp.moveaxis(torsion_updates, 1, 0),  # (R, B)
        jnp.moveaxis(bond_mask, 1, 0),  # (R, B)
    )
    out, _ = jax.lax.scan(body, pos, xs)
    return out[0] if single else out
