"""The featurizer parity panel: ~20 molecules with hand-declared RDKit-true
per-atom values (reference semantics: process_mols.py:93-116 after
SanitizeMol).

Consumed by two checks:
  * tests/test_data.py::TestRDKitPathParity::test_panel_both_paths_equal --
    drives the REAL rdkit code branch through a fake mol reporting these
    declared values and asserts it equals the minichem fallback branch
    (rdkit itself is not installed in this image);
  * scripts/verify_rdkit_parity.py -- whenever real RDKit IS importable,
    rebuilds every molecule from its SMILES (atom order preserved) and
    asserts the DECLARED values (and hence minichem) against actual RDKit.

Each entry:
  name, smiles,
  elements: heavy-atom symbols in order,
  bonds: (a, b, order) Kekule bonds, 0-based, order 1/2/3,
  charges: [(atom_idx, charge)],
  atoms: per-atom (numH, hybridization, is_aromatic) as RDKit reports them
         after sanitization (degree = heavy-neighbor count + numH;
         implicit valence = numH for these implicit-H molecules),
  aromatic_bonds: set of (min, max) pairs RDKit reports as AROMATIC.
"""
from __future__ import annotations

Z = {"C": 6, "N": 7, "O": 8, "P": 15, "S": 16, "Cl": 17}


def ring(n, orders, off=0):
    return [(off + i, off + (i + 1) % n, orders[i]) for i in range(n)]


def _arom(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs}


PANEL = [
    dict(
        name="ethanol", smiles="CCO",
        elements=["C", "C", "O"], bonds=[(0, 1, 1), (1, 2, 1)], charges=[],
        atoms=[(3, "SP3", False), (2, "SP3", False), (1, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="acetate", smiles="CC(=O)[O-]",
        elements=["C", "C", "O", "O"],
        bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 1)], charges=[(3, -1)],
        atoms=[(3, "SP3", False), (0, "SP2", False), (0, "SP2", False),
               (0, "SP2", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="ethylammonium", smiles="CC[NH3+]",
        elements=["C", "C", "N"], bonds=[(0, 1, 1), (1, 2, 1)],
        charges=[(2, 1)],
        atoms=[(3, "SP3", False), (2, "SP3", False), (3, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="acetamide", smiles="CC(=O)N",
        elements=["C", "C", "O", "N"],
        bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 1)], charges=[],
        atoms=[(3, "SP3", False), (0, "SP2", False), (0, "SP2", False),
               (2, "SP2", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="aniline", smiles="c1ccccc1N",
        elements=["C"] * 6 + ["N"],
        bonds=ring(6, [1, 2, 1, 2, 1, 2]) + [(0, 6, 1)], charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 5 + [(2, "SP2", False)],
        aromatic_bonds=_arom([(i, (i + 1) % 6) for i in range(6)]),
    ),
    dict(
        name="methanesulfonamide", smiles="CS(=O)(=O)N",
        elements=["C", "S", "O", "O", "N"],
        bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 2), (1, 4, 1)], charges=[],
        atoms=[(3, "SP3", False), (0, "SP3", False), (0, "SP2", False),
               (0, "SP2", False), (2, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="methyl_phosphate", smiles="COP(=O)(O)O",
        elements=["C", "O", "P", "O", "O", "O"],
        bonds=[(0, 1, 1), (1, 2, 1), (2, 3, 2), (2, 4, 1), (2, 5, 1)],
        charges=[],
        atoms=[(3, "SP3", False), (0, "SP3", False), (0, "SP3", False),
               (0, "SP2", False), (1, "SP3", False), (1, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="methyl_vinyl_ether", smiles="C=COC",
        elements=["C", "C", "O", "C"],
        bonds=[(0, 1, 2), (1, 2, 1), (2, 3, 1)], charges=[],
        atoms=[(2, "SP2", False), (1, "SP2", False), (0, "SP2", False),
               (3, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="acetonitrile", smiles="CC#N",
        elements=["C", "C", "N"], bonds=[(0, 1, 1), (1, 2, 3)], charges=[],
        atoms=[(3, "SP3", False), (0, "SP", False), (0, "SP", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="propene", smiles="C=CC",
        elements=["C", "C", "C"], bonds=[(0, 1, 2), (1, 2, 1)], charges=[],
        atoms=[(2, "SP2", False), (1, "SP2", False), (3, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="nitromethane", smiles="C[N+](=O)[O-]",
        elements=["C", "N", "O", "O"],
        bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 1)], charges=[(1, 1), (3, -1)],
        atoms=[(3, "SP3", False), (0, "SP2", False), (0, "SP2", False),
               (0, "SP2", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="guanidinium", smiles="C(=[NH2+])(N)N",
        elements=["C", "N", "N", "N"],
        bonds=[(0, 1, 2), (0, 2, 1), (0, 3, 1)], charges=[(1, 1)],
        atoms=[(0, "SP2", False), (2, "SP2", False), (2, "SP2", False),
               (2, "SP2", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="methanethiol", smiles="CS",
        elements=["C", "S"], bonds=[(0, 1, 1)], charges=[],
        atoms=[(3, "SP3", False), (1, "SP3", False)],
        aromatic_bonds=set(),
    ),
    dict(
        name="chlorobenzene", smiles="c1ccccc1Cl",
        elements=["C"] * 6 + ["Cl"],
        bonds=ring(6, [1, 2, 1, 2, 1, 2]) + [(0, 6, 1)], charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 5 + [(0, "SP3", False)],
        aromatic_bonds=_arom([(i, (i + 1) % 6) for i in range(6)]),
    ),
    dict(
        name="naphthalene", smiles="c1ccc2ccccc2c1",
        elements=["C"] * 10,
        # perimeter 0..9 + fusion 4-9; Kekule doubles on even perimeter bonds
        bonds=[(i, (i + 1) % 10, 2 if i % 2 == 0 else 1) for i in range(10)]
        + [(4, 9, 1)],
        charges=[],
        atoms=[(1, "SP2", True)] * 4 + [(0, "SP2", True)]
        + [(1, "SP2", True)] * 4 + [(0, "SP2", True)],
        aromatic_bonds=_arom([(i, (i + 1) % 10) for i in range(10)]
                             + [(4, 9)]),
    ),
    dict(
        name="pyridine", smiles="n1ccccc1",
        elements=["N"] + ["C"] * 5,
        bonds=ring(6, [1, 2, 1, 2, 1, 2]), charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 5,
        aromatic_bonds=_arom([(i, (i + 1) % 6) for i in range(6)]),
    ),
    dict(
        name="pyrrole", smiles="[nH]1cccc1",
        elements=["N"] + ["C"] * 4,
        bonds=ring(5, [1, 2, 1, 2, 1]), charges=[],
        atoms=[(1, "SP2", True)] + [(1, "SP2", True)] * 4,
        aromatic_bonds=_arom([(i, (i + 1) % 5) for i in range(5)]),
    ),
    dict(
        name="imidazole", smiles="n1c[nH]cc1",
        elements=["N", "C", "N", "C", "C"],
        bonds=[(0, 1, 2), (1, 2, 1), (2, 3, 1), (3, 4, 2), (4, 0, 1)],
        charges=[],
        atoms=[(0, "SP2", True), (1, "SP2", True), (1, "SP2", True),
               (1, "SP2", True), (1, "SP2", True)],
        aromatic_bonds=_arom([(i, (i + 1) % 5) for i in range(5)]),
    ),
    dict(
        name="furan", smiles="o1cccc1",
        elements=["O"] + ["C"] * 4,
        bonds=ring(5, [1, 2, 1, 2, 1]), charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 4,
        aromatic_bonds=_arom([(i, (i + 1) % 5) for i in range(5)]),
    ),
    dict(
        name="thiophene", smiles="s1cccc1",
        elements=["S"] + ["C"] * 4,
        bonds=ring(5, [1, 2, 1, 2, 1]), charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 4,
        aromatic_bonds=_arom([(i, (i + 1) % 5) for i in range(5)]),
    ),
    dict(
        name="quinoline", smiles="n1cccc2ccccc12",
        elements=["N"] + ["C"] * 9,
        bonds=[(i, (i + 1) % 10, 2 if i % 2 == 0 else 1) for i in range(10)]
        + [(4, 9, 1)],
        charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 3
        + [(0, "SP2", True)] + [(1, "SP2", True)] * 4 + [(0, "SP2", True)],
        aromatic_bonds=_arom([(i, (i + 1) % 10) for i in range(10)]
                             + [(4, 9)]),
    ),
    dict(
        name="toluene", smiles="c1ccccc1C",
        elements=["C"] * 7,
        bonds=ring(6, [1, 2, 1, 2, 1, 2]) + [(0, 6, 1)], charges=[],
        atoms=[(0, "SP2", True)] + [(1, "SP2", True)] * 5 + [(3, "SP3", False)],
        aromatic_bonds=_arom([(i, (i + 1) % 6) for i in range(6)]),
    ),
]
