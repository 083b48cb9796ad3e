"""Collation of host-featurized complexes into padded ``ComplexBatch``es.

The host side produces one ``dict`` of numpy arrays per complex (the
"HeteroComplex" record, mirroring the reference's HeteroData fields,
datasets_utils/pdbbind.py:295-352).  ``collate`` pads a list of records into
one fixed-shape ComplexBatch; ``pick_bucket`` chooses the smallest capacity
profile that fits, bounding padding waste (the TPU answer to dynamic shapes).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..config import GraphCaps

# Default bucket ladder: compiled programs are cached per bucket.
DEFAULT_BUCKETS = (
    GraphCaps(max_lig=24, max_rec=128, lig_bond_cap=56, lig_radius_cap=384,
              rec_edge_cap=128 * 24, cross_cap=1536, tor_cap=8, tor_edge_cap=192,
              max_atoms=1024, atom_edge_cap=1024 * 8, la_cap=512),
    GraphCaps(max_lig=32, max_rec=256, lig_bond_cap=72, lig_radius_cap=512,
              rec_edge_cap=256 * 24, cross_cap=3072, tor_cap=12, tor_edge_cap=256,
              max_atoms=2048, atom_edge_cap=2048 * 8, la_cap=768),
    GraphCaps(max_lig=48, max_rec=384, lig_bond_cap=112, lig_radius_cap=1024,
              rec_edge_cap=384 * 24, cross_cap=6144, tor_cap=16, tor_edge_cap=384,
              max_atoms=3072, atom_edge_cap=3072 * 8, la_cap=1024),
    GraphCaps(max_lig=64, max_rec=768, lig_bond_cap=148, lig_radius_cap=1536,
              rec_edge_cap=768 * 24, cross_cap=12288, tor_cap=24, tor_edge_cap=512,
              max_atoms=6144, atom_edge_cap=6144 * 8, la_cap=1536),
)


def complex_size(rec: dict) -> tuple[int, int, int]:
    return len(rec["lig_pos"]), len(rec["rec_pos"]), len(rec["tor_edges"])


def fit_counts(rec: dict) -> tuple:
    """The per-record lengths bucket fitting depends on — memoizable so
    per-epoch bucket assignment never decompresses full records."""
    nl, nr, nt = complex_size(rec)
    has_atoms = rec.get("atom_pos") is not None
    return (nl, nr, nt, len(rec["bonds"]), len(rec["rec_src"]),
            len(rec["atom_pos"]) if has_atoms else None,
            len(rec["atom_src"]) if has_atoms else 0)


def fits_counts(c: tuple, caps: GraphCaps) -> bool:
    nl, nr, nt, nb, ne, na, nae = c
    ok = (
        nl <= caps.max_lig
        and nr <= caps.max_rec
        and nt <= caps.tor_cap
        and nb <= caps.lig_bond_cap
        and ne <= caps.rec_edge_cap
    )
    if ok and na is not None:
        ok = na <= caps.max_atoms and nae <= caps.atom_edge_cap
    return ok


def fits(rec: dict, caps: GraphCaps) -> bool:
    return fits_counts(fit_counts(rec), caps)


def _roundup(x: int, m: int) -> int:
    return int(-(-max(int(x), 1) // m) * m)


def caps_from_datasets(datasets, all_atoms: bool | None = None) -> GraphCaps:
    """Exact-fit GraphCaps over one or more preprocessed datasets.

    Node/bond/kNN-edge capacities come from the observed maxima; the
    runtime-geometry capacities (ligand radius graph, sigma-dependent cross
    edges, torsion-midpoint edges, ligand-atom cross edges) are set to their
    *worst-case* values (all-pairs), so no edge can ever be silently dropped.
    Right for small/fixture datasets where worst-case padding is affordable;
    large trees should use the DEFAULT_BUCKETS ladder instead.
    """
    nl = nr = nb = nre = nt = na = nae = 0
    seen_atoms = False
    for ds in datasets:
        for i in range(len(ds)):
            rec = ds[i]
            nl = max(nl, len(rec["lig_pos"]))
            nr = max(nr, len(rec["rec_pos"]))
            nb = max(nb, len(rec["bonds"]))
            nre = max(nre, len(rec["rec_src"]))
            nt = max(nt, len(rec["tor_edges"]))
            if rec.get("atom_pos") is not None:
                seen_atoms = True
                na = max(na, len(rec["atom_pos"]))
                nae = max(nae, len(rec["atom_src"]))
    if all_atoms is None:
        all_atoms = seen_atoms
    max_lig = _roundup(nl, 4)
    max_rec = _roundup(nr, 8)
    caps = GraphCaps(
        max_lig=max_lig,
        max_rec=max_rec,
        lig_bond_cap=_roundup(nb, 4),
        lig_radius_cap=max_lig * max_lig,
        rec_edge_cap=_roundup(nre, 8),
        cross_cap=max_lig * max_rec,
        tor_cap=max(nt, 1),
        tor_edge_cap=max(nt, 1) * max_lig,
        max_atoms=_roundup(na, 8) if all_atoms else GraphCaps.max_atoms,
        atom_edge_cap=_roundup(nae, 8) if all_atoms else GraphCaps.atom_edge_cap,
        la_cap=max_lig * _roundup(na, 8) if all_atoms else GraphCaps.la_cap,
    )
    return caps


def ladder_for_datasets(
    datasets, base: Sequence[GraphCaps] = DEFAULT_BUCKETS,
    all_atoms: bool | None = None,
) -> tuple:
    """Bucket ladder for reference-scale training (the 16k-complex PDBBind
    tree, reference datasets_utils/pdbbind.py:384-406): the ``base`` buckets
    that pad less than the exact worst case, plus the exact-fit caps as a
    final catch-all so no complex is ever dropped.  First-fit assignment then
    pays worst-case padding only for the tail, and each bucket compiles one
    program.  Runtime-geometry caps of the base buckets are finite (unlike
    the catch-all's all-pairs caps) -- trainers must surface the edge
    -overflow audit (graphs/audit.py) so any high-sigma truncation is
    counted, not silent."""
    exact = caps_from_datasets(datasets, all_atoms=all_atoms)

    def saves_padding(b: GraphCaps) -> bool:
        ok = b.max_lig <= exact.max_lig and b.max_rec <= exact.max_rec
        if ok and all_atoms:
            ok = b.max_atoms <= exact.max_atoms
        return ok and (b.max_lig, b.max_rec) != (exact.max_lig, exact.max_rec)

    return tuple(b for b in base if saves_padding(b)) + (exact,)


def pick_bucket(recs: Sequence[dict], buckets: Sequence[GraphCaps] = DEFAULT_BUCKETS) -> GraphCaps:
    for caps in buckets:
        if all(fits(r, caps) for r in recs):
            return caps
    raise ValueError(
        "complex exceeds the largest bucket: "
        + str([complex_size(r) for r in recs if not fits(r, buckets[-1])])
    )


def collate(recs: Sequence[dict], caps: GraphCaps | None = None, esm_dim: int = 1280,
            pad_graphs_to: int | None = None):
    """Pad records into a ComplexBatch (numpy -> device on first use).

    ``pad_graphs_to`` pads the BATCH axis to a fixed size by repeating real
    records, marked invalid in ``graph_mask`` so the loss/metrics exclude
    them (one compiled program per bucket even for remainder batches, and no
    complex is ever dropped).  Repeats rather than zero-dummies: a zeros
    complex has degenerate geometry whose NaNs would poison the masked loss
    (NaN * 0 == NaN)."""
    import jax.numpy as jnp

    from ..graphs.containers import ComplexBatch, ListEdges

    if not recs:
        raise ValueError("collate needs at least one record")
    if caps is None:
        caps = pick_bucket(recs)
    n_valid = len(recs)
    if pad_graphs_to is not None and n_valid < pad_graphs_to:
        recs = list(recs) + [recs[i % n_valid]
                             for i in range(pad_graphs_to - n_valid)]
    B = len(recs)
    NL, NR = caps.max_lig, caps.max_rec
    all_atoms = recs[0].get("atom_pos") is not None

    def zeros(shape, dtype=np.float32):
        return np.zeros(shape, dtype)

    out = dict(
        lig_x=zeros((B, NL, 16), np.int32),
        lig_pos=zeros((B, NL, 3)),
        lig_mask=zeros((B, NL), bool),
        bond_src=zeros((B, caps.lig_bond_cap), np.int32),
        bond_dst=zeros((B, caps.lig_bond_cap), np.int32),
        bond_mask=zeros((B, caps.lig_bond_cap), bool),
        bond_attr=zeros((B, caps.lig_bond_cap, 4)),
        rec_x=zeros((B, NR, 1 + esm_dim)),
        rec_pos=zeros((B, NR, 3)),
        rec_mask=zeros((B, NR), bool),
        re_src=zeros((B, caps.rec_edge_cap), np.int32),
        re_dst=zeros((B, caps.rec_edge_cap), np.int32),
        re_mask=zeros((B, caps.rec_edge_cap), bool),
        tor_edges=zeros((B, caps.tor_cap, 2), np.int32),
        tor_mask_rotate=zeros((B, caps.tor_cap, NL), bool),
        tor_mask=zeros((B, caps.tor_cap), bool),
        orig_pos=zeros((B, NL, 3)),
        rdkit_pos=zeros((B, NL, 3)),
        center=zeros((B, 3)),
    )
    if all_atoms:
        NA = caps.max_atoms
        out.update(
            atom_x=zeros((B, NA, 4), np.int32),
            atom_pos=zeros((B, NA, 3)),
            atom_mask=zeros((B, NA), bool),
            ae_src=zeros((B, caps.atom_edge_cap), np.int32),
            ae_dst=zeros((B, caps.atom_edge_cap), np.int32),
            ae_mask=zeros((B, caps.atom_edge_cap), bool),
            ar_src=zeros((B, NA), np.int32),
            ar_dst=zeros((B, NA), np.int32),
            ar_mask=zeros((B, NA), bool),
        )

    for b, r in enumerate(recs):
        nl = len(r["lig_pos"])
        out["lig_x"][b, :nl] = r["lig_x"]
        out["lig_pos"][b, :nl] = r["lig_pos"]
        out["lig_mask"][b, :nl] = True
        out["orig_pos"][b, :nl] = r.get("orig_pos", r["lig_pos"])
        out["rdkit_pos"][b, :nl] = r.get("rdkit_pos", r["lig_pos"])
        eb = len(r["bonds"])
        out["bond_src"][b, :eb] = r["bonds"][:, 0]
        out["bond_dst"][b, :eb] = r["bonds"][:, 1]
        out["bond_mask"][b, :eb] = True
        out["bond_attr"][b, :eb] = r["bond_attr"]
        nr_ = len(r["rec_pos"])
        out["rec_x"][b, :nr_, 0] = r["rec_code"]
        if r.get("esm") is not None and esm_dim > 0:
            # records cached WITH embeddings may be consumed by a model
            # trained without them (esm_dim=0 -> drop) or narrower (slice)
            w = min(int(r["esm"].shape[1]), esm_dim)
            out["rec_x"][b, :nr_, 1 : 1 + w] = r["esm"][:, :w]
        out["rec_pos"][b, :nr_] = r["rec_pos"]
        out["rec_mask"][b, :nr_] = True
        ne = len(r["rec_src"])
        out["re_src"][b, :ne] = r["rec_src"]
        out["re_dst"][b, :ne] = r["rec_dst"]
        out["re_mask"][b, :ne] = True
        nt = len(r["tor_edges"])
        if nt:
            out["tor_edges"][b, :nt] = r["tor_edges"]
            out["tor_mask_rotate"][b, :nt, :nl] = r["mask_rotate"]
            out["tor_mask"][b, :nt] = True
        out["center"][b] = r.get("original_center", np.zeros(3))
        if all_atoms:
            na = len(r["atom_pos"])
            out["atom_x"][b, :na] = r["atom_x"]
            out["atom_pos"][b, :na] = r["atom_pos"]
            out["atom_mask"][b, :na] = True
            nae = len(r["atom_src"])
            out["ae_src"][b, :nae] = r["atom_src"]
            out["ae_dst"][b, :nae] = r["atom_dst"]
            out["ae_mask"][b, :nae] = True
            out["ar_src"][b, :na] = np.arange(na)
            out["ar_dst"][b, :na] = r["atom_res"]
            out["ar_mask"][b, :na] = True

    cb = ComplexBatch(
        lig_x=jnp.asarray(out["lig_x"]),
        lig_pos=jnp.asarray(out["lig_pos"]),
        lig_mask=jnp.asarray(out["lig_mask"]),
        lig_bonds=ListEdges(
            jnp.asarray(out["bond_src"]), jnp.asarray(out["bond_dst"]), jnp.asarray(out["bond_mask"])
        ),
        lig_bond_attr=jnp.asarray(out["bond_attr"]),
        rec_x=jnp.asarray(out["rec_x"]),
        rec_pos=jnp.asarray(out["rec_pos"]),
        rec_mask=jnp.asarray(out["rec_mask"]),
        rec_edges=ListEdges(
            jnp.asarray(out["re_src"]), jnp.asarray(out["re_dst"]), jnp.asarray(out["re_mask"])
        ),
        tor_edges=jnp.asarray(out["tor_edges"]),
        tor_mask_rotate=jnp.asarray(out["tor_mask_rotate"]),
        tor_mask=jnp.asarray(out["tor_mask"]),
        graph_mask=jnp.asarray(np.arange(B) < n_valid),
        original_center=jnp.asarray(out["center"]),
        atom_x=jnp.asarray(out["atom_x"]) if all_atoms else None,
        atom_pos=jnp.asarray(out["atom_pos"]) if all_atoms else None,
        atom_mask=jnp.asarray(out["atom_mask"]) if all_atoms else None,
        atom_edges=ListEdges(
            jnp.asarray(out["ae_src"]), jnp.asarray(out["ae_dst"]), jnp.asarray(out["ae_mask"])
        ) if all_atoms else None,
        ar_edges=ListEdges(
            jnp.asarray(out["ar_src"]), jnp.asarray(out["ar_dst"]), jnp.asarray(out["ar_mask"])
        ) if all_atoms else None,
        extras={"orig_pos": jnp.asarray(out["orig_pos"]),
                "rdkit_pos": jnp.asarray(out["rdkit_pos"])},
    )
    return cb.set_time(0.0, 0.0, 0.0)


def replicate_record(rec: dict, n: int) -> list[dict]:
    """N pose copies of one complex (evaluate.py:232's deepcopy list)."""
    return [dict(rec) for _ in range(n)]
