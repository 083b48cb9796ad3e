"""Host-side featurization: molecules + receptors -> HeteroComplex records.

Parity target: datasets_utils/process_mols.py (featurizers, graph builders,
receptor extraction) and datasets_utils/pdbbind.py:295-352 (record assembly,
protein-centroid centering).  Chemistry stays on the host exactly as in the
reference; the device only ever sees padded arrays (data/collate.py).

Import gating: RDKit and BioPython are preferred when importable; otherwise
the built-in ``minichem`` parsers take over (SDF/mol2/pdbqt/PDB, approximate
chemical perception -- see minichem.py docstring).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..ops.native import knn_edges as knn_edges_host
from .features import ALLOWABLE_FEATURES, safe_index
from . import minichem

# bump when featurization output changes so preprocessed caches invalidate
# (PDBBindConfig.cache_dir folds this into the key)
FEATURIZER_VERSION = 2
from .torsion_detect import get_transformation_mask

try:
    from rdkit import Chem  # noqa: F401
    from rdkit.Chem import AllChem  # noqa: F401

    HAS_RDKIT = True
except ImportError:
    HAS_RDKIT = False

try:
    from Bio.PDB import PDBParser  # noqa: F401

    HAS_BIOPYTHON = True
except ImportError:
    HAS_BIOPYTHON = False


# --------------------------------------------------------------------- ligand
def read_molecule(path: str, remove_hs: bool = True):
    """Read .sdf/.mol2/.pdbqt/.pdb (process_mols.py:490-505 formats) via
    RDKit, or via the minichem parsers without it."""
    if HAS_RDKIT:
        return _read_molecule_rdkit(path, remove_hs)
    if path.endswith(".sdf") or path.endswith(".mol"):
        mol = minichem.parse_sdf(path)
    elif path.endswith(".mol2"):
        mol = minichem.parse_mol2(path)
    elif path.endswith(".pdbqt"):
        mol = minichem.parse_pdb_ligand(path, pdbqt=True)
    elif path.endswith(".pdb"):
        mol = minichem.parse_pdb_ligand(path)
    else:
        raise ValueError(f"unsupported extension: {path}")
    # RDKit's SanitizeMol perceives aromaticity on read; mirror it here so
    # Kekule SDF rings featurize as aromatic on the fallback path too
    mol = minichem.perceive_aromaticity(mol)
    return mol.remove_hs() if remove_hs else mol


def _read_molecule_rdkit(path: str, remove_hs: bool):
    from rdkit import Chem

    if path.endswith(".sdf"):
        supplier = Chem.SDMolSupplier(path, sanitize=False, removeHs=False)
        mol = supplier[0]
    elif path.endswith(".mol2"):
        mol = Chem.MolFromMol2File(path, sanitize=False, removeHs=False)
    elif path.endswith(".pdbqt"):
        with open(path) as f:
            pdb_block = "".join(L[:66] + "\n" for L in f)
        mol = Chem.MolFromPDBBlock(pdb_block, sanitize=False, removeHs=False)
    elif path.endswith(".pdb"):
        mol = Chem.MolFromPDBFile(path, sanitize=False, removeHs=False)
    else:
        raise ValueError(f"unsupported extension: {path}")
    if mol is None:
        return None
    try:
        Chem.SanitizeMol(mol)
        if remove_hs:
            mol = Chem.RemoveHs(mol, sanitize=True)
    except Exception as e:
        # the reference SKIPS molecules whose sanitization fails
        # (read_molecule returns None on exception, process_mols.py:505-525;
        # read_sdf_or_mol2 flags `problem` and pdbbind drops the complex) —
        # keeping the unsanitized mol would featurize unperceived
        # aromaticity/hybridization as junk codes
        print(f"| WARNING: sanitize failed for {path}: {e}")
        return None
    return mol


def lig_atom_featurizer_rdkit(mol) -> np.ndarray:
    """Exact parity with process_mols.py:93-116."""
    A = ALLOWABLE_FEATURES
    ringinfo = mol.GetRingInfo()
    out = []
    for idx, atom in enumerate(mol.GetAtoms()):
        out.append([
            safe_index(A["possible_atomic_num_list"], atom.GetAtomicNum()),
            A["possible_chirality_list"].index(str(atom.GetChiralTag())),
            safe_index(A["possible_degree_list"], atom.GetTotalDegree()),
            safe_index(A["possible_formal_charge_list"], atom.GetFormalCharge()),
            safe_index(A["possible_implicit_valence_list"], atom.GetImplicitValence()),
            safe_index(A["possible_numH_list"], atom.GetTotalNumHs()),
            safe_index(A["possible_number_radical_e_list"], atom.GetNumRadicalElectrons()),
            safe_index(A["possible_hybridization_list"], str(atom.GetHybridization())),
            A["possible_is_aromatic_list"].index(atom.GetIsAromatic()),
            safe_index(A["possible_numring_list"], ringinfo.NumAtomRings(idx)),
            A["possible_is_in_ring3_list"].index(ringinfo.IsAtomInRingOfSize(idx, 3)),
            A["possible_is_in_ring4_list"].index(ringinfo.IsAtomInRingOfSize(idx, 4)),
            A["possible_is_in_ring5_list"].index(ringinfo.IsAtomInRingOfSize(idx, 5)),
            A["possible_is_in_ring6_list"].index(ringinfo.IsAtomInRingOfSize(idx, 6)),
            A["possible_is_in_ring7_list"].index(ringinfo.IsAtomInRingOfSize(idx, 7)),
            A["possible_is_in_ring8_list"].index(ringinfo.IsAtomInRingOfSize(idx, 8)),
        ])
    return np.asarray(out, np.int32)


_BOND_TYPE_INDEX = {"SINGLE": 0, "DOUBLE": 1, "TRIPLE": 2, "AROMATIC": 3}


def ligand_graph(mol) -> dict:
    """Bond graph + features for either an RDKit Mol or a MiniMol.

    Returns dict(lig_x, lig_pos, bonds (bidirectional), bond_attr one-hot).
    """
    if HAS_RDKIT and not isinstance(mol, minichem.MiniMol):
        lig_x = lig_atom_featurizer_rdkit(mol)
        lig_z = np.asarray([a.GetAtomicNum() for a in mol.GetAtoms()], np.int32)
        conf = mol.GetConformer()
        pos = np.asarray(conf.GetPositions(), np.float32)
        rows, attr = [], []
        for bond in mol.GetBonds():
            a, b = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
            t = _BOND_TYPE_INDEX.get(str(bond.GetBondType()), 0)
            for (s, d) in ((a, b), (b, a)):
                rows.append((s, d))
                onehot = np.zeros(4, np.float32)
                onehot[t] = 1
                attr.append(onehot)
        bonds_undirected = np.asarray(
            [(b.GetBeginAtomIdx(), b.GetEndAtomIdx()) for b in mol.GetBonds()], np.int32
        ).reshape(-1, 2)
    else:
        lig_x = minichem.featurize_minimol(mol)
        lig_z = np.asarray([minichem.atomic_number(e) for e in mol.elements],
                           np.int32)
        pos = mol.pos.astype(np.float32)
        rows, attr = [], []
        for (a, b), t in zip(mol.bonds, mol.bond_types):
            ti = min(int(t) - 1, 3) if t >= 1 else 0
            for (s, d) in ((a, b), (b, a)):
                rows.append((s, d))
                onehot = np.zeros(4, np.float32)
                onehot[ti] = 1
                attr.append(onehot)
        bonds_undirected = mol.bonds
    return dict(
        lig_x=lig_x,
        lig_z=lig_z,
        lig_pos=pos,
        bonds=np.asarray(rows, np.int32).reshape(-1, 2),
        bond_attr=np.asarray(attr, np.float32).reshape(-1, 4),
        bonds_undirected=bonds_undirected,
    )


def generate_conformer(mol, seed: int = 0):
    """ETKDG conformer via RDKit (random-coord + MMFF fallbacks,
    process_mols.py:269-278).

    minichem fallback: uniform-random torsions on the rotatable bonds of the
    input coordinates (+ small jitter).  This mirrors ETKDG's functional role
    in the pipeline -- a conformer with good local structure but decorrelated
    global shape, which conformer matching then re-fits to the crystal pose
    (get_lig_graph_with_matching, process_mols.py:280-326) -- whereas plain
    coordinate noise would leak the crystal torsions into the training start.
    """
    if HAS_RDKIT and not isinstance(mol, minichem.MiniMol):
        from rdkit.Chem import AllChem

        # AddHs -> embed -> RemoveHs, as the reference does
        # (process_mols.py:293-300): ETKDG/MMFF geometry differs materially
        # when run on a hydrogen-free molecule.  AddHs appends Hs after the
        # heavy atoms, so heavy-atom indices are stable.
        mol2 = Chem.Mol(mol)
        mol2.RemoveAllConformers()
        mol2 = Chem.AddHs(mol2)
        ps = AllChem.ETKDGv2()
        ps.randomSeed = seed
        cid = AllChem.EmbedMolecule(mol2, ps)
        if cid == -1:
            ps.useRandomCoords = True
            AllChem.EmbedMolecule(mol2, ps)
            try:
                AllChem.MMFFOptimizeMolecule(mol2, confId=0)
            except Exception:
                pass
        pos = np.asarray(mol2.GetConformer().GetPositions(), np.float32)
        return pos[: mol.GetNumAtoms()]
    rng = np.random.RandomState(seed)
    pos = mol.pos.copy()
    from .torsion_detect import apply_torsion_np, get_transformation_mask

    tor_edges, mask_rotate = get_transformation_mask(len(pos), mol.bonds)
    if len(tor_edges):
        upd = rng.uniform(-np.pi, np.pi, len(tor_edges))
        pos = apply_torsion_np(pos, tor_edges, mask_rotate, upd)
    return (pos + rng.randn(*pos.shape) * 0.01).astype(np.float32)


# ------------------------------------------------------------------- receptor
def receptor_from_pdb(
    path: str,
    lig_pos: Optional[np.ndarray] = None,
    chain_cutoff: Optional[float] = None,
) -> dict:
    """Parse a receptor PDB into per-residue arrays.

    Parity with extract_receptor_structure (process_mols.py:152-245): drops
    HOH and residues missing any of N/CA/C; optionally keeps only chains with
    any CA within ``chain_cutoff`` of the ligand.  Returns residue codes,
    CA/N/C coords, and per-residue heavy-atom lists for the all-atom path.
    """
    if HAS_BIOPYTHON:
        residues = _residues_biopython(path)
    else:
        residues = minichem.parse_pdb_residues(path)

    chains: dict[str, list] = {}
    for res in residues:
        if all(k in res.atoms for k in ("N", "CA", "C")):
            chains.setdefault(res.chain, []).append(res)

    # esm_rows: indices of the kept residues into the flat all-chains
    # embedding array (the ESM pipeline embeds EVERY chain in file order,
    # reference pdbbind_lm_embedding_preparation.py:67-88, and
    # extract_receptor_structure aligns per chain, process_mols.py:219-238) —
    # so chain filtering must drop the matching embedding rows too
    kept, esm_rows = [], []
    offset = 0
    for chain, rs in chains.items():
        take = True
        if chain_cutoff is not None and lig_pos is not None:
            ca = np.asarray([r.atoms["CA"][1] for r in rs])
            dmin = np.sqrt(((ca[:, None] - lig_pos[None]) ** 2).sum(-1)).min()
            take = dmin <= chain_cutoff
        if take:
            kept.extend(rs)
            esm_rows.extend(range(offset, offset + len(rs)))
        offset += len(rs)
    if not kept:  # keep everything rather than fail
        kept = [r for rs in chains.values() for r in rs]
        esm_rows = list(range(offset))

    A = ALLOWABLE_FEATURES
    code = np.asarray(
        [safe_index(A["possible_amino_acids"], r.name) for r in kept], np.int32
    )
    ca = np.asarray([r.atoms["CA"][1] for r in kept], np.float32)
    n = np.asarray([r.atoms["N"][1] for r in kept], np.float32)
    c = np.asarray([r.atoms["C"][1] for r in kept], np.float32)

    atom_feats, atom_pos, atom_res = [], [], []
    for ri, r in enumerate(kept):
        for name, (elem, xyz) in r.atoms.items():
            if elem.upper() == "H":
                continue
            z = minichem.atomic_number("C" if elem == "CD" else elem)
            atom_feats.append([
                safe_index(A["possible_amino_acids"], r.name),
                safe_index(A["possible_atomic_num_list"], z),
                safe_index(A["possible_atom_type_2"], (name + "*")[:2]),
                safe_index(A["possible_atom_type_3"], name),
            ])
            atom_pos.append(xyz)
            atom_res.append(ri)
    return dict(
        rec_code=code,
        rec_pos=ca,
        n_coords=n,
        c_coords=c,
        atom_x=np.asarray(atom_feats, np.int32).reshape(-1, 4),
        atom_pos=np.asarray(atom_pos, np.float32).reshape(-1, 3),
        atom_res=np.asarray(atom_res, np.int32),
        esm_rows=np.asarray(esm_rows, np.int32),
        esm_total=np.int32(offset),
    )


def _residues_biopython(path: str):
    import warnings

    from Bio.PDB import PDBParser
    from Bio.PDB.PDBExceptions import PDBConstructionWarning

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", PDBConstructionWarning)
        structure = PDBParser().get_structure("rec", path)
    out = []
    for model in structure:
        for chain in model:
            for res in chain:
                if res.get_resname() == "HOH":
                    continue
                atoms = {}
                for atom in res:
                    atoms[atom.name] = (atom.element, tuple(atom.get_coord()))
                out.append(minichem.MiniResidue(res.get_resname(), chain.id, atoms))
        break  # first model only
    return out


def mu_r_norm_features(ca: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Per-residue multi-sigma soft direction statistics
    (process_mols.py:356-363), stored for record parity."""
    from scipy.special import softmax

    sigmas = np.array([1.0, 2.0, 5.0, 10.0, 30.0])[:, None]
    n = len(ca)
    out = np.zeros((n, 5), np.float32)
    for i in range(n):
        nb = dst[src == i]
        if len(nb) == 0:
            continue
        diff = ca[i] - ca[nb]
        dists = np.linalg.norm(diff, axis=1)
        w = softmax(-dists[None] ** 2 / sigmas, axis=1)
        mean_vec = w @ diff
        denom = w @ dists
        out[i] = np.linalg.norm(mean_vec, axis=1) / (denom + 1e-12)
    return out


# --------------------------------------------------------------- full records
def build_complex_record(
    mol,
    receptor: dict,
    esm: Optional[np.ndarray] = None,
    receptor_radius: float = 15.0,
    c_alpha_max_neighbors: Optional[int] = 24,
    matching: bool = True,
    popsize: int = 15,
    maxiter: int = 15,
    all_atoms: bool = False,
    atom_radius: float = 5.0,
    atom_max_neighbors: Optional[int] = 8,
    name: str = "complex",
    seed: int = 0,
    num_conformers: int = 1,
) -> dict:
    """Assemble a HeteroComplex record (datasets_utils/pdbbind.py:295-352):
    ligand graph (+ conformer matching), receptor kNN graph, centering at the
    protein centroid."""
    lig = ligand_graph(mol)
    orig_pos = lig["lig_pos"].copy()
    tor_edges, mask_rotate = get_transformation_mask(len(orig_pos), lig["bonds_undirected"])

    extra_conformers = []
    if matching:
        from .conformer_matching import optimize_rotatable_bonds

        conf = generate_conformer(mol, seed)
        rdkit_raw = conf.copy()  # pre-matching conformer (orig_rdkit_pos,
        # process_mols.py:299) — AR no_randomness training repositions the
        # ligand to THIS pose (dataset_ar.py:91-95)
        matched, rmsd = optimize_rotatable_bonds(
            conf, orig_pos, tor_edges, mask_rotate, popsize, maxiter, seed
        )
        start_pos = _kabsch_to(matched, orig_pos)
        # multi-conformer option (process_mols.py:308-321): extra matched
        # conformers; the loader picks one at random per epoch
        for k in range(1, num_conformers):
            ck = generate_conformer(mol, seed + 1000 * k)
            mk, _ = optimize_rotatable_bonds(
                ck, orig_pos, tor_edges, mask_rotate, popsize, maxiter, seed + 1000 * k
            )
            extra_conformers.append(_kabsch_to(mk, orig_pos))
    else:
        start_pos = orig_pos.copy()
        rdkit_raw = start_pos

    src, dst = knn_edges_host(receptor["rec_pos"], receptor_radius, c_alpha_max_neighbors)

    if esm is not None:
        # the embedding array covers EVERY chain of the receptor file; keep
        # only the rows of the residues the parse kept (chain_cutoff may have
        # dropped whole chains).  A row-count mismatch means the embeddings
        # were built from a different structure — error loudly rather than
        # train on misaligned features (reference asserts the same,
        # process_mols.py:243-245).
        esm = np.asarray(esm, np.float32)
        n_res = len(receptor["rec_pos"])
        rows, total = receptor.get("esm_rows"), receptor.get("esm_total")
        if rows is not None and len(esm) == int(total):
            esm = esm[np.asarray(rows)]
        elif len(esm) != n_res:
            raise ValueError(
                f"{name}: ESM embedding rows ({len(esm)}) match neither the "
                f"receptor file's complete-backbone residue count "
                f"({int(total) if total is not None else 'unknown'}) nor the "
                f"kept residues ({n_res}); the embeddings were built from a "
                f"different structure"
            )

    center = receptor["rec_pos"].mean(0, keepdims=True)
    rec = dict(
        name=name,
        lig_x=lig["lig_x"],
        # true atomic numbers for automorphism/visualisation use — the lig_x
        # feature code is a vocabulary index, not Z, and inverting it breaks
        # for exotic elements mapped to 'misc'
        lig_z=lig["lig_z"],
        lig_pos=(start_pos - center).astype(np.float32),
        orig_pos=(orig_pos - center).astype(np.float32),
        rdkit_pos=(rdkit_raw - center).astype(np.float32),
        bonds=lig["bonds"],
        bond_attr=lig["bond_attr"],
        tor_edges=tor_edges,
        mask_rotate=mask_rotate,
        rec_code=receptor["rec_code"],
        rec_pos=(receptor["rec_pos"] - center).astype(np.float32),
        rec_src=src,
        rec_dst=dst,
        esm=esm,
        mu_r_norm=mu_r_norm_features(receptor["rec_pos"], src, dst),
        side_chain_vecs=np.stack(
            [receptor["n_coords"] - receptor["rec_pos"],
             receptor["c_coords"] - receptor["rec_pos"]], 1
        ).astype(np.float32),
        original_center=center[0].astype(np.float32),
    )
    if extra_conformers:
        rec["extra_conformers"] = (np.stack(extra_conformers) - center).astype(np.float32)
    if all_atoms:
        asrc, adst = knn_edges_host(receptor["atom_pos"], atom_radius, atom_max_neighbors)
        rec.update(
            atom_x=receptor["atom_x"],
            atom_pos=(receptor["atom_pos"] - center).astype(np.float32),
            atom_res=receptor["atom_res"],
            atom_src=asrc,
            atom_dst=adst,
        )
    return rec


def _kabsch_to(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rigidly align a onto b (numpy)."""
    ac, bc = a - a.mean(0), b - b.mean(0)
    H = ac.T @ bc
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    return ac @ R.T + b.mean(0)


def selftest():
    """Drive the fallback path end-to-end on a tiny synthetic SDF + PDB."""
    sdf = (
        "test\n  mini\n\n  6  5  0  0  0  0  0  0  0  0999 V2000\n"
        "    0.0000    0.0000    0.0000 C   0  0\n"
        "    1.5000    0.0000    0.0000 C   0  0\n"
        "    2.2000    1.3000    0.0000 O   0  0\n"
        "    2.2000   -1.3000    0.0000 C   0  0\n"
        "    3.7000   -1.3000    0.0000 N   0  0\n"
        "    1.7000   -2.6000    0.5000 C   0  0\n"
        "  1  2  1  0\n  2  3  2  0\n  2  4  1  0\n  4  5  1  0\n  4  6  1  0\n"
        "M  END\n$$$$\n"
    )
    pdb_lines = []
    rng = np.random.RandomState(0)
    pos = np.cumsum(rng.randn(12, 3) * 2, 0)
    serial = 1
    for i in range(4):
        for nm, el in (("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")):
            p = pos[i * 3 % 12] + rng.randn(3)
            pdb_lines.append(
                f"ATOM  {serial:5d}  {nm:<3s} ALA A{i + 1:4d}    "
                f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          {el:>2s}"
            )
            serial += 1
    mol = minichem.parse_sdf(sdf)
    # through a real file so the BioPython path (which opens a filename)
    # works too, not just the minichem text parser
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".pdb", delete=False) as f:
        f.write("\n".join(pdb_lines) + "\n")
        pdb_path = f.name
    try:
        receptor_rec = receptor_from_pdb(pdb_path)
    finally:
        os.unlink(pdb_path)
    rec = build_complex_record(mol, receptor_rec, matching=True, maxiter=2, popsize=4, all_atoms=True)
    from .collate import collate

    batch = collate([rec], esm_dim=0)
    print("selftest OK:", {k: tuple(np.shape(v)) for k, v in list(rec.items())[:6]},
          "batch lig", batch.lig_pos.shape, "rec", batch.rec_pos.shape,
          "atoms", batch.atom_pos.shape)


if __name__ == "__main__":
    import sys

    if "--selftest" in sys.argv:
        selftest()
