"""Evaluation metrics: RMSDs (incl. symmetry-corrected), clashes, aggregates.

Parity targets: ``get_symmetry_rmsd`` (utils/utils.py:84-114, spyrmsd with a
10s timeout and plain-RMSD fallback) and the metric aggregation of
evaluate.py:414-585 (top-k raw and confidence-filtered percentiles,
rmsds_below_2/5, centroid distances, steric-clash and self-intersection
fractions).

The symmetry correction enumerates ligand bond-graph automorphisms with
networkx VF2 (element labels + connectivity, no bond orders -- the same
constraints spyrmsd's symmrmsd uses) instead of spyrmsd; the enumeration
is capped (count cap playing the role of the reference's SIGALRM timeout)
and falls back to plain RMSD.
"""
from __future__ import annotations


import networkx as nx
import numpy as np


def obrms_rmsd(pred_sdf_path: str, true_sdf_path: str) -> float | None:
    """Alternative RMSD via the OpenBabel ``obrms`` CLI (utils/utils.py:18-34;
    unused on the main path).  Returns None when obrms is unavailable."""
    import shutil
    import subprocess

    if shutil.which("obrms") is None:
        return None
    try:
        out = subprocess.run(
            ["obrms", pred_sdf_path, true_sdf_path],
            capture_output=True, text=True, timeout=30, check=True,
        )
        return float(out.stdout.split()[-1])
    except Exception:
        return None


def rmsd(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(((a - b) ** 2).sum(-1).mean()))


_AUTOMORPHISM_CACHE: dict = {}


def ligand_automorphisms(
    elements: np.ndarray, bonds: np.ndarray, max_count: int = 1000
) -> list[np.ndarray]:
    """Permutations of atom indices preserving elements and bonds.

    Native C++ backtracking search when available (csrc/graph_ops.cpp
    ``graph_automorphisms``), networkx VF2 otherwise.  Results are cached per
    ligand graph: the evaluator calls this once per pose of the same complex
    (40x in the standard protocol), and the graph never changes within one.
    """
    elements = np.asarray(elements)
    bonds = np.asarray(bonds).reshape(-1, 2)
    key = (elements.tobytes(), bonds.tobytes(), max_count)
    if key in _AUTOMORPHISM_CACHE:
        return _AUTOMORPHISM_CACHE[key]

    from ..ops import native

    perms = native.graph_automorphisms(
        elements.astype(np.int32), bonds, max_count
    )
    if perms is None:  # no compiler: networkx VF2 fallback
        G = nx.Graph()
        for i, e in enumerate(elements):
            G.add_node(i, el=int(e))
        for a, b in bonds:
            G.add_edge(int(a), int(b))
        matcher = nx.algorithms.isomorphism.GraphMatcher(
            G, G, node_match=lambda x, y: x["el"] == y["el"]
        )
        perms = []
        for mapping in matcher.isomorphisms_iter():
            perms.append(np.asarray([mapping[i] for i in range(len(elements))]))
            if len(perms) >= max_count:
                break
    if len(_AUTOMORPHISM_CACHE) > 512:
        _AUTOMORPHISM_CACHE.clear()
    _AUTOMORPHISM_CACHE[key] = perms
    return perms


def symmetry_rmsd(
    pred: np.ndarray,
    true: np.ndarray,
    elements: np.ndarray,
    bonds: np.ndarray,
    max_automorphisms: int = 1000,
) -> float:
    """Minimum RMSD over ligand-graph automorphisms (no re-alignment --
    matching spyrmsd's symmrmsd on fixed coordinates)."""
    try:
        perms = ligand_automorphisms(elements, bonds, max_automorphisms)
    except Exception:
        perms = []
    if not perms:
        return rmsd(pred, true)
    # include the identity explicitly: a max_automorphisms-truncated
    # enumeration is not guaranteed to contain it, and the symmetry RMSD
    # must never exceed the plain RMSD
    return min(rmsd(pred, true), min(rmsd(pred[p], true) for p in perms))


def min_cross_distance(lig: np.ndarray, rec_atoms: np.ndarray) -> float:
    d = np.linalg.norm(lig[:, None] - rec_atoms[None], axis=-1)
    return float(d.min())


def min_self_distance(lig: np.ndarray, bonds: np.ndarray) -> float:
    """Minimum non-bonded intra-ligand atom distance."""
    n = len(lig)
    d = np.linalg.norm(lig[:, None] - lig[None], axis=-1)
    mask = ~np.eye(n, dtype=bool)
    for a, b in bonds:
        mask[a, b] = mask[b, a] = False
    return float(d[mask].min()) if mask.any() else np.inf


def aggregate(
    rmsds: np.ndarray,
    confidences: np.ndarray | None = None,
    centroid_dists: np.ndarray | None = None,
    no_overlap_mask: np.ndarray | None = None,
    prefix: str = "",
) -> dict:
    """Aggregate (n_complex, n_poses) arrays into the reference's metric dict
    (evaluate.py:414-585), BOTH families:

    - raw: pose-pooled mean/below-2/below-5/percentiles over every sampled
      pose, plus ``top1_``/``top5_``/``top10_`` = best over the first k poses
      in sampling order (the reference's ``rmsds[:, :k]``; ``top1_`` is our
      addition for symmetry with the filtered family).
    - confidence-filtered (when ``confidences`` given): ``filtered_`` = the
      single top-confidence pose, ``top5_filtered_``/``top10_filtered_`` =
      best over the k highest-confidence poses; centroid twins throughout.
    """
    out = {}

    def family(r, cd, order, tag, pre, ks=(1, 5, 10)):
        """best-of-first-k families over an ordering of the pose axis."""
        res = {}
        r_o = np.take_along_axis(r, order, axis=1)
        cd_o = np.take_along_axis(cd, order, axis=1) if cd is not None else None
        for k in ks:
            if r.shape[1] < k:
                continue
            kt = {1: "", 5: "top5_", 10: "top10_"}[k]
            name = (f"{kt}{tag}" if tag else (f"top{k}_" if k > 1 else "top1_"))
            best = r_o[:, :k].min(axis=1)
            res[f"{pre}{name}rmsds_below_2"] = 100.0 * float((best < 2).mean())
            res[f"{pre}{name}rmsds_below_5"] = 100.0 * float((best < 5).mean())
            res[f"{pre}{name}rmsds_percentile_25"] = float(np.percentile(best, 25))
            res[f"{pre}{name}rmsds_percentile_50"] = float(np.percentile(best, 50))
            res[f"{pre}{name}rmsds_percentile_75"] = float(np.percentile(best, 75))
            if cd_o is not None:
                # centroid of the best-RMSD pose among the first k (the
                # reference's argsort(rmsds[:, :k])[:, 0] indexing,
                # evaluate.py:474-475)
                pick = np.argmin(r_o[:, :k], axis=1)
                best_cd = cd_o[np.arange(len(r)), pick]
                res[f"{pre}{name}centroid_below_2"] = 100.0 * float((best_cd < 2).mean())
                res[f"{pre}{name}centroid_below_5"] = 100.0 * float((best_cd < 5).mean())
                res[f"{pre}{name}centroid_percentile_25"] = float(np.percentile(best_cd, 25))
                res[f"{pre}{name}centroid_percentile_50"] = float(np.percentile(best_cd, 50))
                res[f"{pre}{name}centroid_percentile_75"] = float(np.percentile(best_cd, 75))
        return res

    def block(r, c, cd, pre):
        res = {
            # pose-pooled stats (reference's rmsds_below_2/5 divide by N)
            f"{pre}mean_rmsd": float(r.mean()),
            f"{pre}rmsds_below_2": 100.0 * float((r < 2).mean()),
            f"{pre}rmsds_below_5": 100.0 * float((r < 5).mean()),
            f"{pre}rmsds_percentile_25": float(np.percentile(r, 25)),
            f"{pre}rmsds_percentile_50": float(np.percentile(r, 50)),
            f"{pre}rmsds_percentile_75": float(np.percentile(r, 75)),
        }
        if cd is not None:
            res.update({
                f"{pre}mean_centroid": float(cd.mean()),
                f"{pre}centroid_below_2": 100.0 * float((cd < 2).mean()),
                f"{pre}centroid_below_5": 100.0 * float((cd < 5).mean()),
                f"{pre}centroid_percentile_25": float(np.percentile(cd, 25)),
                f"{pre}centroid_percentile_50": float(np.percentile(cd, 50)),
                f"{pre}centroid_percentile_75": float(np.percentile(cd, 75)),
            })
        raw_order = np.tile(np.arange(r.shape[1]), (r.shape[0], 1))
        res.update(family(r, cd, raw_order, "", pre))
        if c is not None:
            conf_order = np.argsort(-c, axis=1)
            res.update(family(r, cd, conf_order, "filtered_", pre))
        # best achievable over all poses (oracle selection ceiling)
        res[f"{pre}best_rmsds_below_2"] = 100.0 * float((r.min(axis=1) < 2).mean())
        res[f"{pre}best_rmsds_below_5"] = 100.0 * float((r.min(axis=1) < 5).mean())
        return res

    out.update(block(rmsds, confidences, centroid_dists, prefix))
    if no_overlap_mask is not None and no_overlap_mask.any():
        out.update(
            block(
                rmsds[no_overlap_mask],
                confidences[no_overlap_mask] if confidences is not None else None,
                centroid_dists[no_overlap_mask] if centroid_dists is not None else None,
                prefix + "no_overlap_",
            )
        )
    return out
