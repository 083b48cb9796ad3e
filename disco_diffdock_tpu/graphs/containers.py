"""Padded fixed-shape hetero-graph containers (pytrees).

The reference uses torch_geometric ``HeteroData`` with dynamic node/edge
counts (datasets_utils/pdbbind.py:295-352).  On TPU everything is dense and
padded: per-batch arrays (B, N, ...) with validity masks, and per-edge-type
fixed-capacity index lists.  Bucketing (several capacity profiles) bounds the
padding waste; within one jit program all shapes are static.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class ListEdges:
    """Fixed-capacity edge list inside one graph of a padded batch.

    ``src`` is the *receiving* node (reference convention: messages aggregate
    at edge_src, features come from edge_dst -- tensor_layers.py:153-159).
    """

    src: jnp.ndarray  # (B, E) int32
    dst: jnp.ndarray  # (B, E) int32
    mask: jnp.ndarray  # (B, E) bool
    # per-graph count of true edges dropped by capacity truncation; None for
    # precomputed/static edge lists that cannot overflow (a wrong runtime cap
    # changes results SILENTLY otherwise -- this makes it observable)
    overflow: Any = None

    @property
    def capacity(self) -> int:
        return self.src.shape[-1]

    def flip(self) -> "ListEdges":
        return ListEdges(src=self.dst, dst=self.src, mask=self.mask,
                         overflow=self.overflow)


@flax.struct.dataclass
class ComplexBatch:
    """A padded batch of protein-ligand complexes (B graphs).

    Features mirror the reference featurization (process_mols.py):
      lig_x: (B, NL, 16) int categorical codes (atomic num, chirality, ...)
      rec_x: (B, NR, 1 + esm_dim) residue code + optional ESM embedding
      lig_bonds: fixed-capacity bond edge list with 4-way bond-type one-hot
      rec_edges: precomputed C-alpha kNN edge list (protein is rigid)
      tor_*: rotatable-bond machinery for the torsion manifold
    ``lig_pos`` is the diffusing state; ``orig_pos`` the crystal pose (used by
    the oracle encoder and for training targets).
    """

    # ligand nodes
    lig_x: jnp.ndarray  # (B, NL, 16) int32
    lig_pos: jnp.ndarray  # (B, NL, 3) f32
    lig_mask: jnp.ndarray  # (B, NL) bool
    # ligand bond edges (bidirectional, fixed capacity)
    lig_bonds: ListEdges
    lig_bond_attr: jnp.ndarray  # (B, EB, 4) f32 one-hot bond type
    # receptor nodes
    rec_x: jnp.ndarray  # (B, NR, 1 + esm) f32 (code in col 0)
    rec_pos: jnp.ndarray  # (B, NR, 3) f32
    rec_mask: jnp.ndarray  # (B, NR) bool
    rec_edges: ListEdges  # precomputed kNN
    # rotatable bonds
    tor_edges: jnp.ndarray  # (B, R, 2) int32 (u, v); v side rotates
    tor_mask_rotate: jnp.ndarray  # (B, R, NL) bool
    tor_mask: jnp.ndarray  # (B, R) bool
    # bookkeeping
    graph_mask: jnp.ndarray  # (B,) bool -- padded graphs in a batch
    original_center: jnp.ndarray  # (B, 3) protein-centroid shift applied at featurization
    # all-atom receptor representation (confidence model family); None for CG
    atom_x: jnp.ndarray | None = None  # (B, NA, 4) int32
    atom_pos: jnp.ndarray | None = None  # (B, NA, 3)
    atom_mask: jnp.ndarray | None = None  # (B, NA)
    atom_edges: ListEdges | None = None  # precomputed atom radius graph
    ar_edges: ListEdges | None = None  # atom -> residue membership edges
    # diffusion state (set by set_time)
    complex_t: dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict
    )  # each (B,)
    # optional extras (orig poses, latents, scores...)
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def num_graphs(self) -> int:
        return self.lig_x.shape[0]

    @property
    def max_lig(self) -> int:
        return self.lig_x.shape[1]

    @property
    def max_rec(self) -> int:
        return self.rec_x.shape[1]

    def set_time(self, t_tr, t_rot, t_tor) -> "ComplexBatch":
        """Stamp per-graph diffusion times (diffusion_utils.py:101-117).

        Each t may be a scalar or a (B,) array.
        """
        B = self.num_graphs
        bc = lambda t: jnp.broadcast_to(jnp.asarray(t, jnp.float32), (B,))
        return self.replace(
            complex_t={"tr": bc(t_tr), "rot": bc(t_rot), "tor": bc(t_tor)}
        )
