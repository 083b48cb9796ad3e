"""Verify the featurizer parity panel against REAL RDKit.

The image this framework is developed in has no RDKit, so the rdkit code
branch of data/featurize.py is exercised by tests/test_data.py through a
fake mol that reports hand-DECLARED RDKit-true values
(tests/featurizer_panel.py).  This script closes the loop on any machine
where rdkit IS importable: it rebuilds every panel molecule from its SMILES
(RDKit preserves SMILES atom order) and asserts

  1. the DECLARED per-atom values (numH, hybridization, aromaticity,
     charge, degree, implicit valence) against actual RDKit output, and
  2. the full 16-column featurization of the real-RDKit branch
     (lig_atom_featurizer_rdkit) against the minichem fallback branch.

Usage:  python scripts/verify_rdkit_parity.py        (exits 1 on divergence)
Reference semantics: process_mols.py:93-116 after SanitizeMol.
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np

try:
    from rdkit import Chem
    from rdkit.Chem import AllChem
except ImportError:
    print("rdkit is not importable in this environment; nothing to verify "
          "(the fake-mol panel in tests/test_data.py is the fallback check).")
    sys.exit(0)

from featurizer_panel import PANEL, Z
from test_data import _sdf_text

from disco_diffdock_tpu.data import featurize, minichem


def check(spec) -> list[str]:
    errors = []
    mol = Chem.MolFromSmiles(spec["smiles"])
    if mol is None:
        return [f"{spec['name']}: SMILES failed to parse"]
    if mol.GetNumAtoms() != len(spec["elements"]):
        return [f"{spec['name']}: atom count {mol.GetNumAtoms()} != "
                f"{len(spec['elements'])}"]
    charges = dict(spec["charges"])
    for i, (atom, el, (numh, hyb, arom)) in enumerate(
            zip(mol.GetAtoms(), spec["elements"], spec["atoms"])):
        got = (atom.GetAtomicNum(), atom.GetTotalNumHs(),
               str(atom.GetHybridization()), atom.GetIsAromatic(),
               atom.GetFormalCharge())
        want = (Z[el], numh, hyb, arom, charges.get(i, 0))
        if got != want:
            errors.append(
                f"{spec['name']} atom {i} ({el}): declared "
                f"(Z,numH,hyb,arom,chg)={want}, RDKit says {got}")
    declared_ar = spec["aromatic_bonds"]
    got_ar = {
        (min(b.GetBeginAtomIdx(), b.GetEndAtomIdx()),
         max(b.GetBeginAtomIdx(), b.GetEndAtomIdx()))
        for b in mol.GetBonds()
        if str(b.GetBondType()) == "AROMATIC"
    }
    if got_ar != declared_ar:
        errors.append(f"{spec['name']}: aromatic bonds declared "
                      f"{sorted(declared_ar)} vs RDKit {sorted(got_ar)}")

    # full-featurization cross-check: real-rdkit branch vs minichem branch
    AllChem.Compute2DCoords(mol)
    gx_rdkit = featurize.lig_atom_featurizer_rdkit(mol)
    mini = minichem.perceive_aromaticity(minichem.parse_sdf(
        _sdf_text(spec["elements"], spec["bonds"], spec["charges"] or None)))
    gx_mini = minichem.featurize_minimol(mini)
    if not np.array_equal(gx_rdkit, gx_mini):
        diff = np.argwhere(gx_rdkit != gx_mini)
        errors.append(f"{spec['name']}: featurization diverges at "
                      f"(atom, column) {diff.tolist()[:8]}")
    return errors


def main():
    all_errors = []
    for spec in PANEL:
        errs = check(spec)
        status = "FAIL" if errs else "ok"
        print(f"  {spec['name']:22s} {status}")
        all_errors += errs
    if all_errors:
        print("\nDIVERGENCES vs real RDKit:")
        for e in all_errors:
            print("  -", e)
        sys.exit(1)
    print(f"\nall {len(PANEL)} panel molecules verified against real RDKit")


if __name__ == "__main__":
    main()
