"""Synthetic protein-ligand complexes for tests and benchmarks.

Generates chemically-plausible geometry (a branched ligand chain with
rotatable bonds, a folded C-alpha trace) and random categorical features,
padded into a ``ComplexBatch`` -- exercising every container field without
RDKit/BioPython (which stay host-side, data/featurize.py).
"""
from __future__ import annotations

import numpy as np

from ..config import GraphCaps
from ..graphs.containers import ComplexBatch, ListEdges
from ..ops.native import knn_edges as knn_edges_host
from .features import LIG_FEATURE_DIMS


def make_ligand(rng: np.random.RandomState, n_atoms: int):
    """Random branched chain: positions, bond pairs, rotatable bonds."""
    pos = np.zeros((n_atoms, 3), np.float32)
    parent = np.zeros(n_atoms, np.int64)
    for i in range(1, n_atoms):
        parent[i] = rng.randint(max(0, i - 3), i)
        d = rng.randn(3)
        d = d / np.linalg.norm(d) * 1.5
        pos[i] = pos[parent[i]] + d
    bonds = np.stack([parent[1:], np.arange(1, n_atoms)], 1)  # (n-1, 2) tree

    # rotatable bonds: tree edges whose child subtree has >1 atom and that
    # are not terminal; mask_rotate marks the child-side subtree (v side).
    children: dict[int, list[int]] = {i: [] for i in range(n_atoms)}
    for u, v in bonds:
        children[u].append(v)

    def subtree(v):
        out = [v]
        for c in children[v]:
            out += subtree(c)
        return out

    tor, masks = [], []
    for u, v in bonds:
        sub = subtree(v)
        if 1 < len(sub) < n_atoms - 1:
            tor.append((u, v))
            m = np.zeros(n_atoms, bool)
            m[sub] = True
            masks.append(m)
    tor = np.asarray(tor, np.int32).reshape(-1, 2)
    masks = np.asarray(masks, bool).reshape(-1, n_atoms)
    return pos, bonds.astype(np.int32), tor, masks


def make_receptor(rng: np.random.RandomState, n_res: int):
    """Self-avoiding-ish random walk C-alpha trace, ~3.8A steps."""
    pos = np.zeros((n_res, 3), np.float32)
    d = rng.randn(3)
    for i in range(1, n_res):
        d = 0.6 * d + rng.randn(3)
        d = d / np.linalg.norm(d)
        pos[i] = pos[i - 1] + 3.8 * d
    return pos - pos.mean(0)


def make_complex_record(
    seed: int = 0,
    n_lig: int = 10,
    n_res: int = 16,
    esm_dim: int = 0,
    receptor_radius: float = 15.0,
    c_alpha_max_neighbors: int = 8,
    all_atoms: bool = False,
    atoms_per_res: int = 2,
    atom_radius: float = 5.0,
    atom_max_neighbors: int = 8,
) -> dict:
    """One raw HeteroComplex record (the dict ``collate`` consumes) -- the
    synthetic analogue of ``featurize.build_complex_record`` for tests of the
    bucketing/streaming data path without RDKit or fixture files."""
    rng = np.random.RandomState(seed)
    pos, bonds, tor, masks = make_ligand(rng, n_lig)
    rpos = make_receptor(rng, n_res)
    pos = pos + rpos[rng.randint(n_res)] * 0.5
    bidir = np.concatenate([bonds, bonds[:, ::-1]], 0).astype(np.int32)
    bond_attr = np.zeros((len(bidir), 4), np.float32)
    bond_attr[np.arange(len(bidir)), rng.randint(0, 4, len(bidir))] = 1.0
    lig_x = np.stack(
        [rng.randint(0, dim, n_lig) for dim in LIG_FEATURE_DIMS], 1
    ).astype(np.int32)
    s, d = knn_edges_host(rpos, receptor_radius, c_alpha_max_neighbors)
    rec = dict(
        lig_x=lig_x, lig_pos=pos, bonds=bidir, bond_attr=bond_attr,
        rec_code=rng.randint(0, 38, n_res).astype(np.float32),
        rec_pos=rpos, rec_src=s.astype(np.int32), rec_dst=d.astype(np.int32),
        tor_edges=tor, mask_rotate=masks,
        orig_pos=pos.copy(), rdkit_pos=pos.copy(),
        original_center=np.zeros(3, np.float32),
    )
    if esm_dim:
        rec["esm"] = rng.randn(n_res, esm_dim).astype(np.float32)
    if all_atoms:
        na = n_res * atoms_per_res
        res_of_atom = np.repeat(np.arange(n_res), atoms_per_res)
        apos = rpos[res_of_atom] + rng.randn(na, 3).astype(np.float32) * 1.5
        s_, d_ = knn_edges_host(apos, atom_radius, atom_max_neighbors)
        rec.update(
            atom_x=np.stack([rng.randint(0, 38, na), rng.randint(0, 119, na),
                             rng.randint(0, 23, na), rng.randint(0, 38, na)],
                            1).astype(np.int32),
            atom_pos=apos, atom_src=s_.astype(np.int32),
            atom_dst=d_.astype(np.int32), atom_res=res_of_atom.astype(np.int32),
        )
    return rec


class RecordDataset:
    """In-memory record list with the ``PDBBind`` loader interface
    (``names`` / ``__len__`` / ``__getitem__`` / memoized ``sizes``) plus a
    load counter, so tests can assert the streaming loaders stay lazy."""

    def __init__(self, records, names=None):
        self.records = list(records)
        self.names = list(names) if names is not None else [
            f"synth{i}" for i in range(len(self.records))]
        self.loads = 0

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        self.loads += 1
        return self.records[i]

    def sizes(self, i):
        from .collate import fit_counts

        cache = getattr(self, "_size_cache", None)
        if cache is None:
            cache = self._size_cache = {}
        if i not in cache:
            cache[i] = fit_counts(self.records[i])
        return cache[i]


def make_complex_batch(
    seed: int = 0,
    batch: int = 2,
    n_lig: int = 24,
    n_res: int = 96,
    caps: GraphCaps | None = None,
    receptor_radius: float = 15.0,
    c_alpha_max_neighbors: int = 24,
    esm_dim: int = 1280,
    same_complex: bool = False,
    all_atoms: bool = False,
    atoms_per_res: int = 6,
    atom_radius: float = 5.0,
    atom_max_neighbors: int = 8,
) -> ComplexBatch:
    """Build a padded synthetic batch (numpy; convert with jnp.asarray via jax)."""
    import jax.numpy as jnp

    caps = caps or GraphCaps(
        max_lig=max(32, n_lig), max_rec=max(128, n_res),
        rec_edge_cap=max(128, n_res) * c_alpha_max_neighbors,
    )
    rng = np.random.RandomState(seed)

    NL, NR = caps.max_lig, caps.max_rec
    lig_x = np.zeros((batch, NL, 16), np.int32)
    lig_pos = np.zeros((batch, NL, 3), np.float32)
    lig_mask = np.zeros((batch, NL), bool)
    bond_src = np.zeros((batch, caps.lig_bond_cap), np.int32)
    bond_dst = np.zeros((batch, caps.lig_bond_cap), np.int32)
    bond_mask = np.zeros((batch, caps.lig_bond_cap), bool)
    bond_attr = np.zeros((batch, caps.lig_bond_cap, 4), np.float32)
    rec_x = np.zeros((batch, NR, 1 + esm_dim), np.float32)
    rec_pos = np.zeros((batch, NR, 3), np.float32)
    rec_mask = np.zeros((batch, NR), bool)
    re_src = np.zeros((batch, caps.rec_edge_cap), np.int32)
    re_dst = np.zeros((batch, caps.rec_edge_cap), np.int32)
    re_mask = np.zeros((batch, caps.rec_edge_cap), bool)
    tor_edges = np.zeros((batch, caps.tor_cap, 2), np.int32)
    tor_mask_rotate = np.zeros((batch, caps.tor_cap, NL), bool)
    tor_mask = np.zeros((batch, caps.tor_cap), bool)
    if all_atoms:
        NA = caps.max_atoms
        atom_x = np.zeros((batch, NA, 4), np.int32)
        atom_pos = np.zeros((batch, NA, 3), np.float32)
        atom_mask = np.zeros((batch, NA), bool)
        ae_src = np.zeros((batch, caps.atom_edge_cap), np.int32)
        ae_dst = np.zeros((batch, caps.atom_edge_cap), np.int32)
        ae_mask = np.zeros((batch, caps.atom_edge_cap), bool)
        ar_src = np.zeros((batch, NA), np.int32)
        ar_dst = np.zeros((batch, NA), np.int32)
        ar_mask = np.zeros((batch, NA), bool)

    for b in range(batch):
        brng = rng if not same_complex else np.random.RandomState(seed)
        nl = n_lig
        pos, bonds, tor, masks = make_ligand(brng, nl)
        lig_pos[b, :nl] = pos
        lig_mask[b, :nl] = True
        for i, dim in enumerate(LIG_FEATURE_DIMS):
            lig_x[b, :nl, i] = brng.randint(0, dim, nl)
        # bidirectional bond list with one-hot types
        eb = min(len(bonds) * 2, caps.lig_bond_cap)
        bidir = np.concatenate([bonds, bonds[:, ::-1]], 0)[:eb]
        bond_src[b, :eb] = bidir[:, 0]
        bond_dst[b, :eb] = bidir[:, 1]
        bond_mask[b, :eb] = True
        bond_attr[b, np.arange(eb), brng.randint(0, 4, eb)] = 1.0

        nr = n_res
        rpos = make_receptor(brng, nr)
        rec_pos[b, :nr] = rpos
        rec_mask[b, :nr] = True
        rec_x[b, :nr, 0] = brng.randint(0, 38, nr)
        if esm_dim:
            rec_x[b, :nr, 1:] = brng.randn(nr, esm_dim).astype(np.float32)
        s, d = knn_edges_host(rpos, receptor_radius, c_alpha_max_neighbors)
        ne = min(len(s), caps.rec_edge_cap)
        re_src[b, :ne] = s[:ne]
        re_dst[b, :ne] = d[:ne]
        re_mask[b, :ne] = True

        # ligand placed near the receptor surface
        lig_pos[b, :nl] += rpos[brng.randint(nr)] * 0.5

        ntor = min(len(tor), caps.tor_cap)
        tor_edges[b, :ntor] = tor[:ntor]
        tor_mask_rotate[b, :ntor, :nl] = masks[:ntor]
        tor_mask[b, :ntor] = True

        if all_atoms:
            na = min(nr * atoms_per_res, caps.max_atoms)
            res_of_atom = np.repeat(np.arange(nr), atoms_per_res)[:na]
            apos = rpos[res_of_atom] + brng.randn(na, 3).astype(np.float32) * 1.5
            atom_pos[b, :na] = apos
            atom_mask[b, :na] = True
            atom_x[b, :na, 0] = brng.randint(0, 38, na)
            atom_x[b, :na, 1] = brng.randint(0, 119, na)
            atom_x[b, :na, 2] = brng.randint(0, 23, na)
            atom_x[b, :na, 3] = brng.randint(0, 38, na)
            s_, d_ = knn_edges_host(apos, atom_radius, atom_max_neighbors)
            ne_ = min(len(s_), caps.atom_edge_cap)
            ae_src[b, :ne_] = s_[:ne_]
            ae_dst[b, :ne_] = d_[:ne_]
            ae_mask[b, :ne_] = True
            ar_src[b, :na] = np.arange(na)
            ar_dst[b, :na] = res_of_atom
            ar_mask[b, :na] = True

    cb = ComplexBatch(
        lig_x=jnp.asarray(lig_x),
        lig_pos=jnp.asarray(lig_pos),
        lig_mask=jnp.asarray(lig_mask),
        lig_bonds=ListEdges(jnp.asarray(bond_src), jnp.asarray(bond_dst), jnp.asarray(bond_mask)),
        lig_bond_attr=jnp.asarray(bond_attr),
        rec_x=jnp.asarray(rec_x),
        rec_pos=jnp.asarray(rec_pos),
        rec_mask=jnp.asarray(rec_mask),
        rec_edges=ListEdges(jnp.asarray(re_src), jnp.asarray(re_dst), jnp.asarray(re_mask)),
        tor_edges=jnp.asarray(tor_edges),
        tor_mask_rotate=jnp.asarray(tor_mask_rotate),
        tor_mask=jnp.asarray(tor_mask),
        graph_mask=jnp.ones((batch,), bool),
        original_center=jnp.zeros((batch, 3)),
        atom_x=jnp.asarray(atom_x) if all_atoms else None,
        atom_pos=jnp.asarray(atom_pos) if all_atoms else None,
        atom_mask=jnp.asarray(atom_mask) if all_atoms else None,
        atom_edges=ListEdges(jnp.asarray(ae_src), jnp.asarray(ae_dst), jnp.asarray(ae_mask)) if all_atoms else None,
        ar_edges=ListEdges(jnp.asarray(ar_src), jnp.asarray(ar_dst), jnp.asarray(ar_mask)) if all_atoms else None,
        extras={"orig_pos": jnp.asarray(lig_pos)},
    )
    return cb.set_time(1.0, 1.0, 1.0)
