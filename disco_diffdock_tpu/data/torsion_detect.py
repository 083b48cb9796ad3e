"""Rotatable-bond detection on the ligand bond graph.

Parity with ``get_transformation_mask`` (utils/torsion.py:15-45): a bond is
rotatable iff removing it disconnects the molecule into two components each
with more than one atom; the *smaller* component rotates, and the bond is
oriented (u, v) with v on the rotating side (assertions torsion.py:58-59).
"""
from __future__ import annotations

import networkx as nx
import numpy as np


def get_transformation_mask(n_atoms: int, bonds: np.ndarray):
    """bonds: (E, 2) undirected unique bond pairs.

    Returns (tor_edges (R, 2) int32 with v-side rotating, mask_rotate (R, n)).
    """
    G = nx.Graph()
    G.add_nodes_from(range(n_atoms))
    G.add_edges_from(map(tuple, bonds))

    tor_edges, masks = [], []
    for u, v in bonds:
        G2 = G.copy()
        G2.remove_edge(u, v)
        if nx.is_connected(G2):
            continue
        comps = sorted(nx.connected_components(G2), key=len)
        small = comps[0]
        if len(small) <= 1:
            continue
        # orient so the rotating side (small component) contains v
        if u in small:
            u, v = v, u
        m = np.zeros(n_atoms, bool)
        m[list(small)] = True
        tor_edges.append((u, v))
        masks.append(m)
    return (
        np.asarray(tor_edges, np.int32).reshape(-1, 2),
        np.asarray(masks, bool).reshape(-1, n_atoms),
    )


def apply_torsion_np(pos: np.ndarray, tor_edges: np.ndarray, mask_rotate: np.ndarray, updates: np.ndarray) -> np.ndarray:
    """Numpy twin of geom.torsion.apply_torsion_updates (single conformer)."""
    from scipy.spatial.transform import Rotation

    pos = pos.copy()
    for r, (u, v) in enumerate(tor_edges):
        if updates[r] == 0:
            continue
        axis = pos[u] - pos[v]
        axis = axis / (np.linalg.norm(axis) + 1e-12) * updates[r]
        R = Rotation.from_rotvec(axis).as_matrix()
        sel = mask_rotate[r]
        pos[sel] = (pos[sel] - pos[v]) @ R.T + pos[v]
    return pos
