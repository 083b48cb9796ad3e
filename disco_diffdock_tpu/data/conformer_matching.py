"""Conformer matching: fit a generated conformer's torsions to the crystal.

Parity with ``optimize_rotatable_bonds`` (datasets_utils/conformer_matching.py
:30-61): scipy differential evolution over the rotatable-bond angles,
objective = Kabsch-aligned RMSD between the torsion-adjusted conformer and the
true pose.  This gives training the "generated local structure + true
torsions" starting pose.  The torsion application uses the framework's own
numpy twin instead of RDKit SetDihedral (identical geometry).
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import differential_evolution

from .torsion_detect import apply_torsion_np


def aligned_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """Kabsch-aligned RMSD between two (N, 3) point sets."""
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    H = ac.T @ bc
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    return float(np.sqrt(((ac @ R.T - bc) ** 2).sum(-1).mean()))


def optimize_rotatable_bonds(
    conf_pos: np.ndarray,
    true_pos: np.ndarray,
    tor_edges: np.ndarray,
    mask_rotate: np.ndarray,
    popsize: int = 15,
    maxiter: int = 15,
    seed: int = 0,
) -> tuple[np.ndarray, float]:
    """Return (matched conformer positions, final aligned RMSD)."""
    R = len(tor_edges)
    if R == 0:
        return conf_pos.copy(), aligned_rmsd(conf_pos, true_pos)

    def objective(x):
        return aligned_rmsd(apply_torsion_np(conf_pos, tor_edges, mask_rotate, x), true_pos)

    res = differential_evolution(
        objective,
        bounds=[(-np.pi, np.pi)] * R,
        popsize=popsize,
        maxiter=maxiter,
        seed=seed,
        polish=False,
    )
    out = apply_torsion_np(conf_pos, tor_edges, mask_rotate, res.x)
    return out, float(res.fun)
