"""ESM language-model embedding pipeline (offline prep + online compute).

Parity with the reference's three offline scripts + online path (SURVEY.md
section 2.2 "ESM pipeline"):
  * ``pdb_to_fasta``: receptor PDBs -> per-chain FASTA records
    (datasets_utils/esm_embedding_preparation.py)
  * ``combine_embeddings``: per-chain ESM .pt outputs -> one mapping
    (datasets_utils/esm_embeddings_to_pt.py; layer-33 representations)
  * ``compute_esm_embeddings``: online esm2_t33_650M path
    (utils/inference_utils.py:90-119), gated on fair-esm being installed.

Embeddings are stored as one .npz mapping complex-name -> (n_res, dim)
float32 (the reference uses a torch .pt dict; both load paths are supported
by data/pdbbind.py).
"""
from __future__ import annotations

import os
from typing import Iterable

import numpy as np

# EXACTLY the reference prep script's table (pdbbind_lm_embedding_
# preparation.py:23-49): the 20 standard residues plus MSE->M (selenomet),
# PYL->O, SEC->U, ASX->B, GLX->Z, XAA->X, XLE->J.  Anything else becomes
# '-' (the reference's fallback), NOT a parent-residue guess — the letter
# stream feeds ESM, so it must match the reference token-for-token.
THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q",
    "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K",
    "MET": "M", "MSE": "M", "PHE": "F", "PRO": "P", "PYL": "O", "SER": "S",
    "SEC": "U", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V", "ASX": "B",
    "GLX": "Z", "XAA": "X", "XLE": "J",
}
UNKNOWN_RESIDUE = "-"


def chain_sequences(pdb_path: str) -> list[tuple[str, str]]:
    """[(chain_id, one-letter sequence)] for residues with complete backbone."""
    from .featurize import HAS_BIOPYTHON, _residues_biopython
    from . import minichem

    residues = (
        _residues_biopython(pdb_path) if HAS_BIOPYTHON else minichem.parse_pdb_residues(pdb_path)
    )
    chains: dict[str, list[str]] = {}
    for r in residues:
        if all(k in r.atoms for k in ("N", "CA", "C")):
            chains.setdefault(r.chain, []).append(
                THREE_TO_ONE.get(r.name, UNKNOWN_RESIDUE))
    return [(c, "".join(seq)) for c, seq in chains.items()]


def complex_name(pdb_path: str) -> str:
    """Complex name for embedding keys: the PDBBind receptor file
    <name>_protein_processed.pdb keys as <name> (the reference prep script
    keys records by complex name, pdbbind_lm_embedding_preparation.py)."""
    base = os.path.splitext(os.path.basename(pdb_path))[0]
    for suffix in ("_protein_processed", "_protein"):
        if base.endswith(suffix):
            return base[: -len(suffix)]
    return base


def pdb_to_fasta(pdb_paths: Iterable[str], out_path: str, max_len: int = 1022) -> None:
    """Write per-chain FASTA records named <name>_chain_<i> (sequences
    truncated at 1022 tokens as in inference_utils.py:95)."""
    with open(out_path, "w") as f:
        for path in pdb_paths:
            name = complex_name(path)
            for i, (_, seq) in enumerate(chain_sequences(path)):
                f.write(f">{name}_chain_{i}\n{seq[:max_len]}\n")


def concat_chain_embeddings(items: dict) -> dict:
    """Group ``<name>_chain_<i>``-keyed arrays by complex name and
    concatenate the chains in index order into one (n_res, dim) array per
    complex (the reference's per-chain .pt contract,
    esm_embeddings_to_pt.py).  Keys without ``_chain_`` pass through."""
    chains: dict[str, dict[int, np.ndarray]] = {}
    for k, v in items.items():
        if "_chain_" in k:
            name, idx = k.rsplit("_chain_", 1)
            chains.setdefault(name, {})[int(idx)] = v
        else:
            chains.setdefault(k, {})[0] = v
    return {
        name: np.concatenate([parts[i] for i in sorted(parts)], 0)
        for name, parts in chains.items()
    }


def combine_embeddings(embedding_dir: str, out_path: str) -> None:
    """Combine per-chain ESM outputs (<name>_chain_<i>.pt with layer-33
    representations, or .npy) into one npz mapping name -> (n_res, dim)."""
    items: dict[str, np.ndarray] = {}
    for fn in sorted(os.listdir(embedding_dir)):
        base, ext = os.path.splitext(fn)
        if "_chain_" not in base:
            continue
        if ext == ".pt":
            import torch

            d = torch.load(os.path.join(embedding_dir, fn), map_location="cpu")
            emb = d["representations"][33].numpy()
        else:
            emb = np.load(os.path.join(embedding_dir, fn))
        items[base] = np.asarray(emb, np.float32)
    np.savez_compressed(out_path, **concat_chain_embeddings(items))


def generate_structure(
    sequence: str,
    out_path: str,
    model=None,
    chunk_size: int = 256,
) -> bool:
    """Fold a protein sequence to a PDB file with ESMFold.

    Parity with ``generate_ESM_structure`` (utils/inference_utils.py:122-150):
    retries with a halved axial-attention chunk size on out-of-memory errors
    until chunk_size <= 2, then gives up.  Returns True iff a structure was
    written.  ``model`` may be injected (anything with ``set_chunk_size`` and
    ``infer_pdb``); by default the hook loads ``esmfold_v1`` and is gated on
    fair-esm being installed.
    """
    if model is None:
        try:
            import esm as fair_esm
        except ImportError as e:
            raise RuntimeError(
                "ESMFold structure generation needs fair-esm; provide a "
                "protein PDB file instead, or install fair-esm"
            ) from e
        model = fair_esm.pretrained.esmfold_v1().eval()
    model.set_chunk_size(chunk_size)
    while True:
        try:
            pdb_text = model.infer_pdb(sequence)
        except RuntimeError as e:
            if "out of memory" not in str(e):
                raise
            chunk_size //= 2
            if chunk_size <= 2:
                print("| WARNING: not enough memory for ESMFold")
                return False
            print(f"| WARNING: ESMFold OOM, retrying with chunk_size={chunk_size}")
            model.set_chunk_size(chunk_size)
            continue
        with open(out_path, "w") as f:
            f.write(pdb_text)
        return True


def compute_esm_embeddings(pdb_paths: Iterable[str], out_path: str, device: str = "cpu") -> None:
    """Online path: esm2_t33_650M over receptor chains (needs fair-esm)."""
    try:
        import esm  # noqa: F401
        import torch
    except ImportError as e:
        raise RuntimeError(
            "fair-esm is not installed in this environment; precompute "
            "embeddings offline (pdb_to_fasta + the ESM extraction script + "
            "combine_embeddings)"
        ) from e

    model, alphabet = esm.pretrained.esm2_t33_650M_UR50D()
    model = model.eval().to(device)
    converter = alphabet.get_batch_converter()
    out = {}
    for path in pdb_paths:
        name = complex_name(path)
        chains = chain_sequences(path)
        embs = []
        for _, seq in chains:
            _, _, toks = converter([(name, seq[:1022])])
            with torch.no_grad():
                rep = model(toks.to(device), repr_layers=[33])["representations"][33]
            embs.append(rep[0, 1 : len(seq[:1022]) + 1].cpu().numpy())
        out[name] = np.concatenate(embs, 0).astype(np.float32)
    np.savez_compressed(out_path, **out)


def _resolve_pdbs(args) -> list[str]:
    if args.pdb:
        return list(args.pdb)
    assert args.data_dir, "pass --pdb paths or --data_dir"
    names = None
    if args.split_path:
        with open(args.split_path) as f:
            names = [line.strip() for line in f if line.strip()]
    else:
        names = sorted(os.listdir(args.data_dir))
    paths = []
    for n in names:
        p = os.path.join(args.data_dir, n, f"{n}_protein_processed.pdb")
        if os.path.exists(p):
            paths.append(p)
    return paths


def main(argv=None):
    """CLI twin of the reference's three offline ESM scripts
    (pdbbind_lm_embedding_preparation.py / esm extraction /
    esm_embeddings_to_pt.py) plus the online path:

        python -m disco_diffdock_tpu.data.esm prepare --data_dir <PDBBind> --out fasta.fa
        python -m disco_diffdock_tpu.data.esm combine --esm_dir <chain_pt_dir> --out esm.npz
        python -m disco_diffdock_tpu.data.esm online  --data_dir <PDBBind> --out esm.npz
    """
    import argparse

    p = argparse.ArgumentParser(description="ESM embedding pipeline")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("prepare", help="receptor PDBs -> per-chain FASTA "
                                        "for the fair-esm extract script")
    sp.add_argument("--pdb", nargs="*", default=None)
    sp.add_argument("--data_dir", default=None)
    sp.add_argument("--split_path", default=None)
    sp.add_argument("--out", required=True)
    sc = sub.add_parser("combine", help="per-chain ESM outputs -> one npz")
    sc.add_argument("--esm_dir", required=True)
    sc.add_argument("--out", required=True)
    so = sub.add_parser("online", help="compute embeddings in-process "
                                       "(needs fair-esm)")
    so.add_argument("--pdb", nargs="*", default=None)
    so.add_argument("--data_dir", default=None)
    so.add_argument("--split_path", default=None)
    so.add_argument("--out", required=True)
    so.add_argument("--device", default="cpu")
    args = p.parse_args(argv)
    if args.cmd == "prepare":
        paths = _resolve_pdbs(args)
        pdb_to_fasta(paths, args.out)
        print(f"HAPPENING | wrote FASTA for {len(paths)} receptors -> {args.out}")
    elif args.cmd == "combine":
        combine_embeddings(args.esm_dir, args.out)
        print(f"HAPPENING | combined embeddings -> {args.out}")
    else:
        paths = _resolve_pdbs(args)
        compute_esm_embeddings(paths, args.out, device=args.device)
        print(f"HAPPENING | embeddings for {len(paths)} receptors -> {args.out}")


if __name__ == "__main__":
    main()
