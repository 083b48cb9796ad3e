"""Inference dataset for user-provided protein/ligand lists (no cache).

Parity with ``InferenceDataset`` (utils/inference_utils.py:153-275): builds
records directly from protein PDB paths + ligand files or SMILES
descriptions; when no crystal ligand pose exists the ligand is centered at
its own centroid (:269-270) and a generated conformer is the starting
structure.  SMILES input needs RDKit; file input works through minichem too.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import featurize


def record_from_paths(
    protein_path: Optional[str],
    ligand_description: str,
    esm: Optional[np.ndarray] = None,
    name: str = "complex",
    keep_local_structures: bool = False,
    receptor_radius: float = 15.0,
    c_alpha_max_neighbors: Optional[int] = 24,
    all_atoms: bool = False,
    remove_hs: bool = True,
    seed: int = 0,
    protein_sequence: Optional[str] = None,
    out_dir: Optional[str] = None,
    esmfold_model=None,
) -> Optional[dict]:
    """Build an inference record.  ``ligand_description`` is a file path or a
    SMILES string (RDKit only).  When ``protein_path`` is None a structure is
    folded from ``protein_sequence`` with ESMFold into
    ``<out_dir>/<name>/<name>_esmfold.pdb`` (parity with
    utils/inference_utils.py:199-210), reusing an existing file if present."""
    import os

    if protein_path is None:
        if protein_sequence is None:
            raise ValueError("need protein_path or protein_sequence")
        from .esm import generate_structure

        out_dir = out_dir or "."
        protein_path = os.path.join(out_dir, name, f"{name}_esmfold.pdb")
        if not os.path.exists(protein_path):
            os.makedirs(os.path.dirname(protein_path), exist_ok=True)
            if not generate_structure(protein_sequence, protein_path, model=esmfold_model):
                return None

    if os.path.exists(ligand_description):
        mol = featurize.read_molecule(ligand_description, remove_hs=remove_hs)
        if mol is None:
            print(f"| WARNING: could not read ligand {ligand_description}")
            return None
        # the reference re-embeds a FRESH conformer for file ligands too
        # (inference_utils.py:231-236, RemoveAllConformers + generate);
        # keep_local_structures keeps the file's pose
        fresh_conformer = not keep_local_structures
    else:
        if not featurize.HAS_RDKIT:
            raise RuntimeError("SMILES ligand input requires RDKit")
        from rdkit import Chem
        from rdkit.Chem import AllChem

        mol = Chem.MolFromSmiles(ligand_description)
        if mol is None:
            return None
        mol = Chem.AddHs(mol)
        ps = AllChem.ETKDGv2()
        ps.randomSeed = seed
        if AllChem.EmbedMolecule(mol, ps) == -1:
            # macrocycles etc.: random-coords + MMFF fallback
            # (process_mols.py:269-278)
            ps.useRandomCoords = True
            if AllChem.EmbedMolecule(mol, ps) == -1:
                print(f"| WARNING: could not embed {ligand_description}")
                return None
            try:
                AllChem.MMFFOptimizeMolecule(mol, confId=0)
            except Exception:
                pass
        if remove_hs:
            mol = Chem.RemoveHs(mol)
        fresh_conformer = False  # the embed above IS the fresh conformer

    lig = featurize.ligand_graph(mol)
    receptor = featurize.receptor_from_pdb(protein_path, lig["lig_pos"])
    # matching=False: there is no crystal pose to match against — the
    # reference inference path never runs conformer matching
    # (inference_utils.py:246 matching=False)
    rec = featurize.build_complex_record(
        mol, receptor, esm=esm, receptor_radius=receptor_radius,
        c_alpha_max_neighbors=c_alpha_max_neighbors, matching=False,
        all_atoms=all_atoms, name=name, seed=seed,
    )
    if fresh_conformer:
        conf = np.asarray(featurize.generate_conformer(mol, seed), np.float32)
        rec["lig_pos"] = conf
        rec["rdkit_pos"] = conf.copy()
    # no crystal pose: center the start ligand at its own centroid
    # (inference_utils.py:269-270) -- the "orig" pose is just the input
    rec["lig_pos"] = rec["lig_pos"] - rec["lig_pos"].mean(0, keepdims=True)
    return rec


def build_inference_records(
    protein_paths: Sequence[str],
    ligand_descriptions: Sequence[str],
    esm_map: Optional[dict] = None,
    **kw,
) -> list[dict]:
    import os

    assert len(protein_paths) == len(ligand_descriptions), (
        f"{len(protein_paths)} proteins vs {len(ligand_descriptions)} ligands"
    )
    out = []
    for i, (pp, ld) in enumerate(zip(protein_paths, ligand_descriptions)):
        base = (os.path.splitext(os.path.basename(pp))[0]
                if pp is not None else "seq")
        name = f"{base}_{i}"
        esm = esm_map.get(base) if esm_map else None
        try:
            rec = record_from_paths(pp, ld, esm=esm, name=name, **kw)
        except Exception as e:
            print(f"| WARNING: skipping {name}: {e}")
            rec = None
        if rec is not None:
            out.append(rec)
    return out
