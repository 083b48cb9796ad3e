"""Conformer matching: fit a generated conformer's torsions to the crystal.

Parity with ``optimize_rotatable_bonds`` (datasets_utils/conformer_matching.py
:30-61): scipy differential evolution over the rotatable-bond angles,
objective = Kabsch-aligned RMSD between the torsion-adjusted conformer and the
true pose.  This gives training the "generated local structure + true
torsions" starting pose.  The torsion application uses the framework's own
numpy twin instead of RDKit SetDihedral (identical geometry).

Also carries the reference's alternative torsion machinery
(datasets_utils/conformer_matching.py:64-183), re-derived on the plain bond
graph so it runs without RDKit:
  * ``get_torsion_quads`` — dihedral atom quadruples for each rotatable bond
    (reference ``get_torsion_angles`` :64-84);
  * ``get_torsions_geomol`` — the GeoMol SMARTS-pattern torsion finder
    (reference ``get_torsions`` :88-125), expressed as graph predicates
    (single acyclic bond, both endpoints non-terminal and triple-bond-free);
  * ``von_mises_match`` — closed-form dihedral transfer by von-Mises circular
    averaging over all neighbor dihedrals of the target point cloud
    (reference ``get_dihedral_vonMises``/``get_von_mises_rms`` :128-183), a
    cheap alternative to differential evolution.
"""
from __future__ import annotations

import networkx as nx
import numpy as np
from scipy.optimize import differential_evolution

from .torsion_detect import apply_torsion_np, get_transformation_mask


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

    # exact reference kwargs (conformer_matching.py:30-41): mutation (0.5,1),
    # recombination 0.8, and scipy's default polish=True (an L-BFGS-B refine
    # of the DE winner that materially tightens the matched torsions)
    res = differential_evolution(
        objective,
        bounds=[(-np.pi, np.pi)] * R,
        popsize=popsize,
        maxiter=maxiter,
        mutation=(0.5, 1),
        recombination=0.8,
        disp=False,
        seed=seed,
    )
    out = apply_torsion_np(conf_pos, tor_edges, mask_rotate, res.x)
    return out, float(res.fun)


# ---------------------------------------------------------------------------
# Dihedral geometry on raw point clouds
# ---------------------------------------------------------------------------

def dihedral_from_point_cloud(Z: np.ndarray, quad) -> float:
    """Dihedral angle (rad) of the 4 points ``Z[quad]``.

    Same construction as the reference's ``GetDihedralFromPointCloud``
    (conformer_matching.py:136-147): project the outer bond vectors onto the
    plane orthogonal to the central bond and take the signed angle.
    """
    p = Z[list(quad)]
    b0 = p[1] - p[0]
    b1 = p[2] - p[1]
    b2 = p[2] - p[3]
    b1n = b1 / np.linalg.norm(b1)
    v0 = b0 - (b0 @ b1n) * b1n
    v2 = b2 - (b2 @ b1n) * b1n
    v0 = v0 / np.linalg.norm(v0)
    v2 = v2 / np.linalg.norm(v2)
    x = v0 @ v2
    y = np.cross(v0, b1n) @ v2
    return float(np.arctan2(y, x))


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _adjacency(n_atoms: int, bonds: np.ndarray) -> list[list[int]]:
    adj: list[list[int]] = [[] for _ in range(n_atoms)]
    for a, b in bonds:
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    return adj


def get_torsion_quads(n_atoms: int, bonds: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-rotatable-bond dihedral quadruples (a, u, v, b).

    Parity with the reference ``get_torsion_angles``
    (conformer_matching.py:64-84): a bond is rotatable iff removing it
    disconnects the graph into two components each larger than one atom; the
    quad takes the first remaining neighbor on each side.  Orientation follows
    ``get_transformation_mask`` (v-side rotates) so the quads line up 1:1 with
    the (tor_edges, mask_rotate) this framework trains on.

    Returns (quads (R, 4) int32, tor_edges (R, 2) int32, mask_rotate (R, n)).
    """
    tor_edges, mask_rotate = get_transformation_mask(n_atoms, bonds)
    adj = _adjacency(n_atoms, bonds)
    quads = []
    for u, v in tor_edges:
        a = next(n for n in adj[int(u)] if n != int(v))
        b = next(n for n in adj[int(v)] if n != int(u))
        quads.append((a, int(u), int(v), b))
    return (
        np.asarray(quads, np.int32).reshape(-1, 4),
        tor_edges,
        mask_rotate,
    )


def get_torsions_geomol(n_atoms: int, bonds: np.ndarray, bond_types: np.ndarray) -> np.ndarray:
    """GeoMol torsion finder (reference ``get_torsions``,
    conformer_matching.py:88-125), without RDKit.

    The SMARTS ``[!$(*#*)&!D1]-&!@[!$(*#*)&!D1]`` selects single, acyclic
    bonds whose endpoints each have degree > 1 and no incident triple bond —
    all graph predicates: a bond is acyclic iff removing it disconnects the
    molecule.  For each matched bond the quad takes the first other neighbor
    on each side, skipping 3-rings, and flips the quad when the far atom
    sits in a ring (reference :111-121).  ``bond_types`` uses the
    framework's 1/2/3/4(=aromatic) convention.

    Returns (T, 4) int32 quads, ONE per eligible bond — RDKit's
    GetSubstructMatches uniquifies by atom set (default uniquify=True), so
    the symmetric two-atom SMARTS yields each bond once.
    """
    G = nx.Graph()
    G.add_nodes_from(range(n_atoms))
    G.add_edges_from(map(tuple, bonds))
    ring_atoms = {a for cyc in nx.cycle_basis(G) for a in cyc}

    has_triple = np.zeros(n_atoms, bool)
    for (a, b), t in zip(bonds, bond_types):
        if t == 3:
            has_triple[a] = has_triple[b] = True

    def eligible(a):
        return G.degree[a] > 1 and not has_triple[a]

    single_acyclic = []
    for (a, b), t in zip(bonds, bond_types):
        if t != 1:
            continue
        G.remove_edge(a, b)
        acyclic = not nx.has_path(G, a, b)
        G.add_edge(a, b)
        if acyclic:
            single_acyclic.append((int(a), int(b)))

    quads = []
    for u, v in single_acyclic:
        if not (eligible(u) and eligible(v)):
            continue
        for a in G.neighbors(u):
            if a == v:
                continue
            for b in G.neighbors(v):
                if b == u or b == a:
                    continue
                if b in ring_atoms:
                    quads.append((b, v, u, a))
                else:
                    quads.append((a, u, v, b))
                break
            break
    return np.asarray(quads, np.int32).reshape(-1, 4)


def set_dihedrals(
    pos: np.ndarray,
    tor_edges: np.ndarray,
    mask_rotate: np.ndarray,
    quads: np.ndarray,
    targets: np.ndarray,
) -> np.ndarray:
    """Rotate each torsion so dihedral(quads[r]) == targets[r].

    Numpy twin of RDKit ``SetDihedralRad`` as used by the reference's
    ``apply_changes`` (conformer_matching.py:24-27), built on the framework's
    own torsion application.  The rotation sign is probed per bond (the
    dihedral's sense under a v-side rotation depends on quad orientation).
    """
    pos = pos.copy()
    for r in range(len(tor_edges)):
        cur = dihedral_from_point_cloud(pos, quads[r])
        delta = _wrap(float(targets[r]) - cur)
        if abs(delta) < 1e-9:
            continue
        one = tor_edges[r : r + 1]
        msk = mask_rotate[r : r + 1]
        probe = apply_torsion_np(pos, one, msk, np.asarray([1e-3]))
        sense = np.sign(_wrap(dihedral_from_point_cloud(probe, quads[r]) - cur))
        pos = apply_torsion_np(pos, one, msk, np.asarray([sense * delta]))
    return pos


def von_mises_match(
    conf_pos: np.ndarray,
    true_pos: np.ndarray,
    n_atoms: int,
    bonds: np.ndarray,
) -> tuple[np.ndarray, float]:
    """Closed-form conformer matching by von-Mises dihedral transfer.

    Parity with ``get_dihedral_vonMises`` + ``get_von_mises_rms``
    (conformer_matching.py:150-183): for each rotatable bond (i, j), every
    neighbor pair (k, l) votes for a target dihedral read off the true point
    cloud, rotated into the canonical quad's frame by the conformer's own
    (k..k0) + (l0..l) dihedral offsets; votes are averaged on the circle
    (resultant of unit vectors) and the conformer's dihedral is set to the
    mean.  One pass, no optimizer — the cheap alternative to
    ``optimize_rotatable_bonds``.

    Returns (matched positions, Kabsch-aligned RMSD vs true_pos).
    """
    quads, tor_edges, mask_rotate = get_torsion_quads(n_atoms, bonds)
    adj = _adjacency(n_atoms, bonds)
    targets = np.zeros(len(quads))
    for r, (k0, i, j, l0) in enumerate(quads):
        v = np.zeros(2)
        for k in adj[int(i)]:
            if k == j:
                continue
            for l in adj[int(j)]:
                if l == i:
                    continue
                s = dihedral_from_point_cloud(true_pos, (k, i, j, l))
                off = dihedral_from_point_cloud(conf_pos, (k, i, j, k0)) + \
                    dihedral_from_point_cloud(conf_pos, (l0, i, j, l))
                # A^T(off) @ S(s) == [cos(s-off), sin(s-off)]: the vote
                # rotated back into the canonical quad's frame
                v += np.array([np.cos(s - off), np.sin(s - off)])
        nrm = np.linalg.norm(v)
        targets[r] = np.arctan2(v[1], v[0]) if nrm > 1e-12 else \
            dihedral_from_point_cloud(true_pos, quads[r])
    out = set_dihedrals(conf_pos, tor_edges, mask_rotate, quads, targets)
    return out, aligned_rmsd(out, true_pos)
