"""PDBBind dataset: host preprocessing with cache + bucketed batch loader.

Parity with datasets_utils/pdbbind.py: per-complex featurization (ligand
parsing + conformer matching + receptor graph), a disk cache keyed by every
preprocessing parameter (:87-95), multiprocessing over complexes (:156-197),
and a loader that yields padded ``ComplexBatch``es.  TPU-native differences:
the cache stores one compressed .npz per complex (instead of one giant
pickle), and batches are *size-bucketed* so each bucket compiles one program.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from multiprocessing import Pool
from typing import Iterator, Optional, Sequence

import numpy as np

from ..config import GraphCaps
from .collate import DEFAULT_BUCKETS, collate, fit_counts, fits  # noqa: F401
from . import featurize


@dataclasses.dataclass(frozen=True)
class PDBBindConfig:
    data_dir: str = "data/PDBBind_processed"
    split_path: str = "data/splits/timesplit_train"
    cache_path: str = "data/cache_tpu"
    receptor_radius: float = 15.0
    c_alpha_max_neighbors: Optional[int] = 24
    matching: bool = True
    popsize: int = 15
    maxiter: int = 15
    remove_hs: bool = True
    max_lig_size: Optional[int] = None
    all_atoms: bool = False
    atom_radius: float = 5.0
    atom_max_neighbors: Optional[int] = 8
    esm_embeddings_path: Optional[str] = None
    num_workers: int = 1
    limit_complexes: int = 0
    num_conformers: int = 1
    # drop receptor chains with no CA within this distance of the ligand
    # (reference confidence_train.py:66 --chain_cutoff); None keeps all
    chain_cutoff: Optional[float] = None

    def cache_dir(self) -> str:
        # hash only the parameters that change the per-complex .npz output —
        # host-side knobs (worker count, cache/split locations, complex
        # limit) must not invalidate hours of conformer matching
        d = dataclasses.asdict(self)
        for k in ("num_workers", "cache_path", "split_path", "limit_complexes"):
            d.pop(k, None)
        d["_featurizer_version"] = featurize.FEATURIZER_VERSION
        key = json.dumps(d, sort_keys=True, default=str)
        h = hashlib.md5(key.encode()).hexdigest()[:12]
        split = os.path.splitext(os.path.basename(self.split_path))[0]
        return os.path.join(self.cache_path, f"{split}_{h}")


def _process_one(args) -> Optional[str]:
    cfg, name, out_dir, esm = args
    out_path = os.path.join(out_dir, f"{name}.npz")
    if os.path.exists(out_path):
        return name
    try:
        rec_path = os.path.join(cfg.data_dir, name, f"{name}_protein_processed.pdb")
        if not os.path.exists(rec_path):
            return None
        # try .sdf first, fall back to .mol2 when the SDF fails to read or
        # sanitize (reference read_sdf_or_mol2, process_mols.py:533-548)
        mol = None
        for ext in (".sdf", ".mol2"):
            p = os.path.join(cfg.data_dir, name, f"{name}_ligand{ext}")
            if os.path.exists(p):
                mol = featurize.read_molecule(p, remove_hs=cfg.remove_hs)
                if mol is not None:
                    break
        if mol is None:
            return None
        lig0 = featurize.ligand_graph(mol)
        if cfg.max_lig_size and len(lig0["lig_pos"]) > cfg.max_lig_size:
            return None
        receptor = featurize.receptor_from_pdb(rec_path, lig0["lig_pos"],
                                               chain_cutoff=cfg.chain_cutoff)
        rec = featurize.build_complex_record(
            mol, receptor, esm=esm,
            receptor_radius=cfg.receptor_radius,
            c_alpha_max_neighbors=cfg.c_alpha_max_neighbors,
            matching=cfg.matching, popsize=cfg.popsize, maxiter=cfg.maxiter,
            all_atoms=cfg.all_atoms, atom_radius=cfg.atom_radius,
            atom_max_neighbors=cfg.atom_max_neighbors, name=name,
            num_conformers=cfg.num_conformers,
        )
        # atomic write: an interrupted save must not leave a truncated .npz
        # that later resumes treat as a completed complex
        tmp_path = f"{out_path}.tmp{os.getpid()}.npz"
        np.savez_compressed(tmp_path, **{k: v for k, v in rec.items() if v is not None})
        os.replace(tmp_path, out_path)
        return name
    except Exception as e:  # skip-and-log, as the reference does throughout
        print(f"| WARNING: skipping {name}: {type(e).__name__}: {e}")
        return None


class PDBBind:
    """Preprocessed complex store over a PDBBind-style directory tree."""

    def __init__(self, cfg: PDBBindConfig):
        self.cfg = cfg
        self.cache = cfg.cache_dir()
        os.makedirs(self.cache, exist_ok=True)
        with open(cfg.split_path) as f:
            names = [L.strip() for L in f if L.strip()]
        if cfg.limit_complexes:
            names = names[: cfg.limit_complexes]
        self.names = self._preprocess(names)

    def _preprocess(self, names: Sequence[str]) -> list[str]:
        todo = [n for n in names if not os.path.exists(os.path.join(self.cache, f"{n}.npz"))]
        if todo:
            esm_map = self._load_esm()
            args = [(self.cfg, n, self.cache, esm_map.get(n) if esm_map else None) for n in todo]
            if self.cfg.num_workers > 1:
                with Pool(self.cfg.num_workers, maxtasksperchild=1) as pool:
                    # 1000-complex shards as in the reference (pdbbind.py:166-175)
                    for i in range(0, len(args), 1000):
                        pool.map(_process_one, args[i : i + 1000])
            else:
                for a in args:
                    _process_one(a)
        return [n for n in names if os.path.exists(os.path.join(self.cache, f"{n}.npz"))]

    def _load_esm(self):
        path = self.cfg.esm_embeddings_path
        if path is None:
            return None
        if path.endswith(".pt"):
            import torch

            d = torch.load(path, map_location="cpu")
            flat = {k: np.asarray(v, np.float32) for k, v in d.items()}
            if not any("_chain_" in k for k in flat):
                return flat
            # reference format (esm_embeddings_to_pt.py): one entry PER CHAIN
            # keyed '<name>_chain_<i>' — concatenate chains in index order
            from .esm import concat_chain_embeddings

            return concat_chain_embeddings(flat)
        with np.load(path, allow_pickle=True) as z:
            return {k: z[k] for k in z.files}

    def __len__(self) -> int:
        return len(self.names)

    def get(self, name: str) -> dict:
        with np.load(os.path.join(self.cache, f"{name}.npz"), allow_pickle=True) as z:
            return {k: z[k] for k in z.files}

    def __getitem__(self, i: int) -> dict:
        return self.get(self.names[i])

    def sizes(self, i: int) -> tuple:
        """collate.fit_counts of complex i, memoized — bucket assignment
        runs every epoch and must not decompress the full record (ESM
        arrays included) just to read a handful of lengths."""
        from .collate import fit_counts

        cache = getattr(self, "_size_cache", None)
        if cache is None:
            cache = self._size_cache = {}
        if i not in cache:
            cache[i] = fit_counts(self[i])
        return cache[i]


def print_statistics(dataset: PDBBind) -> dict:
    """Dataset statistics (pdbbind.py:print_statistics analogue)."""
    nl, nr, nt = [], [], []
    for i in range(len(dataset)):
        rec = dataset[i]
        nl.append(len(rec["lig_pos"]))
        nr.append(len(rec["rec_pos"]))
        nt.append(len(rec["tor_edges"]))
    stats = {
        "complexes": len(dataset),
        "lig_atoms_mean": float(np.mean(nl)), "lig_atoms_max": int(np.max(nl)),
        "residues_mean": float(np.mean(nr)), "residues_max": int(np.max(nr)),
        "rot_bonds_mean": float(np.mean(nt)), "rot_bonds_max": int(np.max(nt)),
    }
    print("HAPPENING | dataset statistics:", stats)
    return stats


def assign_buckets(
    dataset: PDBBind,
    buckets: Sequence[GraphCaps],
    multiplicity: int = 1,
) -> tuple[dict[int, list[int]], list[int]]:
    """First-fit bucket assignment over memoized per-complex sizes.

    Returns ``(groups, oversized)``: bucket index -> dataset indices, plus
    the indices (deduplicated) that fit no bucket.
    """
    from .collate import fit_counts, fits_counts

    groups: dict[int, list[int]] = {bi: [] for bi in range(len(buckets))}
    oversized: list[int] = []
    for idx0 in range(len(dataset) * multiplicity):
        idx = idx0 % len(dataset)
        counts = (dataset.sizes(idx) if hasattr(dataset, "sizes")
                  else fit_counts(dataset[idx]))
        for bi, caps in enumerate(buckets):
            if fits_counts(counts, caps):
                groups[bi].append(idx)
                break
        else:
            if idx0 < len(dataset):
                oversized.append(idx)
    return groups, oversized


def bucketed_batches(
    dataset: PDBBind,
    batch_size: int,
    rng: np.random.RandomState,
    buckets: Sequence[GraphCaps] = DEFAULT_BUCKETS,
    esm_dim: int = 1280,
    shuffle: bool = True,
    drop_oversized: bool = True,
    multiplicity: int = 1,
    drop_remainder: bool = True,
    pad_remainder: bool = False,
    with_info: bool = False,
) -> Iterator:
    """Yield padded ComplexBatches grouped by size bucket, LAZILY: records
    load and collate one batch at a time, so an epoch never holds more than
    the in-flight batches (plus any prefetch depth) in host memory.

    Complexes are assigned to the smallest fitting bucket, shuffled within
    buckets, and emitted as full batches per bucket (so every batch of a
    bucket reuses one compiled program).  ``multiplicity`` repeats the dataset
    (train_multiplicity); complexes with extra matched conformers start from
    a randomly chosen one each epoch (pdbbind.py:41-42).  ``with_info`` yields
    ``(batch, {"caps", "bucket", "names", "indices"})`` so callers can key
    per-bucket compiled programs and per-complex caches.  Complexes exceeding
    the largest bucket are dropped with a LOUD warning (or raise when
    ``drop_oversized=False``) -- never silently.

    Remainder semantics (a bucket's member count modulo ``batch_size``):
    ``pad_remainder`` emits the final partial group padded to ``batch_size``
    with repeated records masked out via ``graph_mask`` (fixed shapes, no
    complex dropped -- the right mode for compiled training, where
    ``drop_remainder`` would PERMANENTLY exclude every complex in a bucket
    with fewer than ``batch_size`` members); ``drop_remainder=False`` emits
    it at its natural smaller size (one extra compile per remainder shape).
    """
    groups, oversized = assign_buckets(dataset, buckets, multiplicity)
    if oversized:
        names = [dataset.names[i] for i in oversized[:10]]
        msg = (f"{len(oversized)} complexes exceed the largest bucket "
               f"and were dropped: {names}{'...' if len(oversized) > 10 else ''}")
        if not drop_oversized:
            raise ValueError(msg)
        print(f"| WARNING: {msg}")
    order = []
    for bi, idxs in groups.items():
        if shuffle:
            rng.shuffle(idxs)
        stop = (len(idxs) - batch_size + 1
                if drop_remainder and not pad_remainder else len(idxs))
        for i in range(0, max(stop, 0), batch_size):
            order.append((bi, idxs[i : i + batch_size]))
    if shuffle:
        rng.shuffle(order)
    for bi, idxs in order:
        recs = []
        for i in idxs:
            rec = dataset[i]
            ec = rec.get("extra_conformers")
            if ec is not None and len(ec) and rng.rand() < len(ec) / (len(ec) + 1):
                rec = dict(rec)
                rec["lig_pos"] = ec[rng.randint(len(ec))]
            recs.append(rec)
        cb = collate(recs, buckets[bi], esm_dim=esm_dim,
                     pad_graphs_to=batch_size if pad_remainder else None)
        if with_info:
            yield cb, {
                "caps": buckets[bi], "bucket": bi,
                "names": [dataset.names[i] for i in idxs],
                "indices": list(idxs),  # valid rows only; pads are repeats
            }
        else:
            yield cb
