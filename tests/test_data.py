"""Data-layer tests: featurization fallback, torsion detection, matching,
collation/bucketing, native ops, inference records."""
import numpy as np
import pytest

from disco_diffdock_tpu.data import featurize, minichem
from disco_diffdock_tpu.data.collate import DEFAULT_BUCKETS, collate, pick_bucket
from disco_diffdock_tpu.data.conformer_matching import aligned_rmsd, optimize_rotatable_bonds
from disco_diffdock_tpu.data.torsion_detect import apply_torsion_np, get_transformation_mask
from disco_diffdock_tpu.ops import native

SDF = (
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


def make_pdb(n_res=6, seed=0):
    rng = np.random.RandomState(seed)
    lines = []
    serial = 1
    pos = np.cumsum(rng.randn(n_res, 3) * 2.5, 0)
    for i in range(n_res):
        for nm, el in (("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O"), ("CB", "C")):
            p = pos[i] + rng.randn(3) * 0.8
            lines.append(
                f"ATOM  {serial:5d}  {nm:<3s} GLY A{i + 1:4d}    "
                f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00          {el:>2s}"
            )
            serial += 1
    return "\n".join(lines) + "\n"


class TestMinichem:
    def test_sdf_roundtrip(self):
        mol = minichem.parse_sdf(SDF)
        assert len(mol.elements) == 6 and len(mol.bonds) == 5
        assert mol.elements[2] == "O" and mol.bond_types[1] == 2
        text = minichem.write_sdf(mol, mol.pos)
        mol2 = minichem.parse_sdf(text)
        np.testing.assert_allclose(mol2.pos, mol.pos, atol=1e-3)

    def test_featurize_codes_in_range(self):
        from disco_diffdock_tpu.data.features import LIG_FEATURE_DIMS

        mol = minichem.parse_sdf(SDF)
        x = minichem.featurize_minimol(mol)
        assert x.shape == (6, 16)
        for i, dim in enumerate(LIG_FEATURE_DIMS):
            assert x[:, i].min() >= 0 and x[:, i].max() < dim

    def test_pdb_parse(self):
        residues = minichem.parse_pdb_residues(make_pdb())
        assert len(residues) == 6
        assert all("CA" in r.atoms for r in residues)

    def test_hybridization_from_bond_orders(self):
        """RDKit-semantics hybridization from incident bond orders: nitrile
        C -> SP, carbonyl C -> SP2, saturated C -> SP3."""
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        # CH3-C#N (acetonitrile) + C=O fragment: atoms C(sp3), C(sp), N,
        # then C(sp2)=O
        text = (
            "m\n  mini\n\n  5  3  0  0  0  0  0  0  0  0999 V2000\n"
            "    0.0000    0.0000    0.0000 C   0  0\n"
            "    1.5000    0.0000    0.0000 C   0  0\n"
            "    2.7000    0.0000    0.0000 N   0  0\n"
            "    5.0000    0.0000    0.0000 C   0  0\n"
            "    6.2000    0.0000    0.0000 O   0  0\n"
            "  1  2  1  0\n  2  3  3  0\n  4  5  2  0\n"
            "M  END\n$$$$\n"
        )
        mol = minichem.parse_sdf(text)
        x = minichem.featurize_minimol(mol)
        hyb = A["possible_hybridization_list"]
        assert hyb[x[0, 7]] == "SP3"  # methyl C
        assert hyb[x[1, 7]] == "SP"   # nitrile C
        assert hyb[x[3, 7]] == "SP2"  # carbonyl C

    def test_mol2_parse_matches_sdf(self):
        """TRIPOS MOL2 twin of the SDF fixture parses to the same graph
        (process_mols.py:491-492 ingestion, RDKit-free)."""
        mol = minichem.parse_sdf(SDF)
        atom_lines, bond_lines = [], []
        sybyl = {("C", 0): "C.3", ("O", 0): "O.2", ("N", 0): "N.3"}
        for i, (e, p) in enumerate(zip(mol.elements, mol.pos)):
            atom_lines.append(
                f"{i + 1:>4} {e}{i + 1:<3} {p[0]:9.4f} {p[1]:9.4f} "
                f"{p[2]:9.4f} {sybyl[(e, 0)]:<6} 1 LIG 0.0000")
        for j, ((a, b), t) in enumerate(zip(mol.bonds, mol.bond_types)):
            bond_lines.append(f"{j + 1:>4} {a + 1:>4} {b + 1:>4} {t}")
        text = (
            "@<TRIPOS>MOLECULE\ntest\n 6 5 0 0 0\nSMALL\nNO_CHARGES\n"
            "@<TRIPOS>ATOM\n" + "\n".join(atom_lines)
            + "\n@<TRIPOS>BOND\n" + "\n".join(bond_lines) + "\n"
        )
        m2 = minichem.parse_mol2(text)
        assert m2.elements == mol.elements
        np.testing.assert_allclose(m2.pos, mol.pos, atol=1e-3)
        np.testing.assert_array_equal(m2.bonds, mol.bonds)
        np.testing.assert_array_equal(m2.bond_types, mol.bond_types)

    def test_mol2_aromatic_and_amide_types(self):
        text = (
            "@<TRIPOS>MOLECULE\nx\n 2 1 0 0 0\nSMALL\nNO_CHARGES\n"
            "@<TRIPOS>ATOM\n"
            "1 C1 0.0 0.0 0.0 C.ar 1 LIG 0.0\n"
            "2 N1 1.4 0.0 0.0 N.am 1 LIG 0.0\n"
            "@<TRIPOS>BOND\n1 1 2 ar\n"
        )
        m = minichem.parse_mol2(text)
        assert m.elements == ["C", "N"]
        assert m.bond_types.tolist() == [4]  # ar -> aromatic

    def test_pdb_ligand_conect_and_inference(self):
        # ethanol-ish HETATM block with CONECT
        text = (
            "HETATM    1  C1  LIG A   1       0.000   0.000   0.000  1.00  0.00           C\n"
            "HETATM    2  C2  LIG A   1       1.500   0.000   0.000  1.00  0.00           C\n"
            "HETATM    3  O1  LIG A   1       2.160   1.250   0.000  1.00  0.00           O\n"
            "CONECT    1    2\nCONECT    2    1    3\n"
        )
        m = minichem.parse_pdb_ligand(text)
        assert m.elements == ["C", "C", "O"]
        np.testing.assert_array_equal(m.bonds, [[0, 1], [1, 2]])
        # without CONECT, covalent-radius inference finds the same bonds
        no_conect = "\n".join(L for L in text.splitlines() if not L.startswith("CONECT"))
        m2 = minichem.parse_pdb_ligand(no_conect)
        np.testing.assert_array_equal(m2.bonds, [[0, 1], [1, 2]])

    def test_pdbqt_autodock_types(self):
        text = (
            "HETATM    1  C1  LIG A   1       0.000   0.000   0.000  1.00  0.00    +0.1 A \n"
            "HETATM    2  O1  LIG A   1       1.300   0.000   0.000  1.00  0.00    -0.3 OA\n"
            "HETATM    3  H1  LIG A   1       1.800   0.800   0.000  1.00  0.00    +0.2 HD\n"
        )
        m = minichem.parse_pdb_ligand(text, pdbqt=True)
        assert m.elements == ["C", "O", "H"]  # A->C, OA->O, HD->H
        assert m.remove_hs().elements == ["C", "O"]

    def test_read_molecule_mol2_end_to_end(self, tmp_path):
        """A mol2 ligand featurizes through the full ligand_graph path
        without RDKit (VERDICT round-2 item 9)."""
        mol = minichem.parse_sdf(SDF)
        lines = ["@<TRIPOS>MOLECULE", "lig", " 6 5 0 0 0", "SMALL",
                 "NO_CHARGES", "@<TRIPOS>ATOM"]
        ty = {"C": "C.3", "O": "O.2", "N": "N.3"}
        for i, (e, p) in enumerate(zip(mol.elements, mol.pos)):
            lines.append(f"{i + 1} {e}{i + 1} {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                         f"{ty[e]} 1 LIG 0.0")
        lines.append("@<TRIPOS>BOND")
        for j, ((a, b), t) in enumerate(zip(mol.bonds, mol.bond_types)):
            lines.append(f"{j + 1} {a + 1} {b + 1} {t}")
        path = tmp_path / "lig.mol2"
        path.write_text("\n".join(lines) + "\n")
        m = featurize.read_molecule(str(path), remove_hs=True)
        g = featurize.ligand_graph(m)
        assert g["lig_x"].shape == (6, 16)
        assert g["lig_z"].tolist() == [6, 6, 8, 6, 7, 6]
        assert g["bonds"].shape == (10, 2)  # 5 bonds, bidirectional


def _sdf_text(elements, bonds, charges=None):
    """Build V2000 SDF text from an element list and (a, b, order) bonds
    (0-based); coordinates are an arbitrary spread (perception is graph-only)."""
    lines = ["m", "  mini", "",
             f"{len(elements):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000"]
    for i, e in enumerate(elements):
        lines.append(f"{float(i):10.4f}{float(i % 3):10.4f}{0.0:10.4f} {e:<3s} 0  0")
    for a, b, t in bonds:
        lines.append(f"{a + 1:3d}{b + 1:3d}{t:3d}  0")
    if charges:
        for idx, c in charges:
            lines.append(f"M  CHG  1 {idx + 1:3d} {c:3d}")
    lines += ["M  END", "$$$$", ""]
    return "\n".join(lines)


def _ring_bonds(n, orders):
    return [(i, (i + 1) % n, orders[i]) for i in range(n)]


class TestAromaticity:
    """Hueckel perception on Kekule input (RDKit sanitization analogue --
    reference reads via SanitizeMol, process_mols.py:481-505)."""

    def test_benzene_kekule(self):
        mol = minichem.parse_sdf(_sdf_text(["C"] * 6, _ring_bonds(6, [1, 2, 1, 2, 1, 2])))
        out = minichem.perceive_aromaticity(mol)
        assert out.bond_types.tolist() == [4] * 6
        assert out.kekule_types.tolist() == [1, 2, 1, 2, 1, 2]
        x = minichem.featurize_minimol(out)
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        assert all(A["possible_is_aromatic_list"][v] for v in x[:, 8])
        # Kekule valence preserved: each aromatic C keeps exactly 1 H
        assert all(A["possible_numH_list"][v] == 1 for v in x[:, 5])
        assert all(A["possible_hybridization_list"][v] == "SP2" for v in x[:, 7])

    def test_pyridine_and_pyrrole(self):
        pyridine = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["N"] + ["C"] * 5, _ring_bonds(6, [1, 2, 1, 2, 1, 2]))))
        assert (pyridine.bond_types == 4).all()
        pyrrole = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["N"] + ["C"] * 4, _ring_bonds(5, [1, 2, 1, 2, 1]))))
        assert (pyrrole.bond_types == 4).all()
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        # pyridine N: Kekule orders 1+2 -> 0 H; pyrrole N: 1+1 -> 1 H
        xp = minichem.featurize_minimol(pyridine)
        assert A["possible_numH_list"][xp[0, 5]] == 0
        xr = minichem.featurize_minimol(pyrrole)
        assert A["possible_numH_list"][xr[0, 5]] == 1

    def test_furan_thiophene(self):
        for el in ("O", "S"):
            m = minichem.perceive_aromaticity(
                minichem.parse_sdf(_sdf_text([el] + ["C"] * 4, _ring_bonds(5, [1, 2, 1, 2, 1]))))
            assert (m.bond_types == 4).all(), el

    def test_non_aromatic_rings(self):
        # cyclohexane: saturated
        ch = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["C"] * 6, _ring_bonds(6, [1] * 6))))
        assert (ch.bond_types == 1).all()
        # cyclopentadiene: one sp3 carbon breaks the ring
        cp = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["C"] * 5, _ring_bonds(5, [2, 1, 2, 1, 1]))))
        assert (cp.bond_types != 4).all()
        # 1,4-benzoquinone: exocyclic C=O atoms contribute 0 -> 4 pi, fails
        els = ["C"] * 6 + ["O", "O"]
        bonds = _ring_bonds(6, [1, 2, 1, 1, 2, 1]) + [(0, 6, 2), (3, 7, 2)]
        bq = minichem.perceive_aromaticity(minichem.parse_sdf(_sdf_text(els, bonds)))
        assert (bq.bond_types != 4).all()

    def test_naphthalene_fused(self):
        # two fused 6-rings, Kekule orders; every ring bond goes aromatic
        bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
                 (5, 0, 1), (4, 6, 1), (6, 7, 2), (7, 8, 1), (8, 9, 2),
                 (9, 5, 1)]
        m = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["C"] * 10, bonds)))
        assert (m.bond_types == 4).all()

    def test_naphthalene_unlucky_kekule(self):
        """Kekulization-independence of fused aromatics: with both bridgehead
        doubles pointing INTO ring 1 (shared bond single), ring 2 alone counts
        only 4 pi — the fixpoint pass must still mark the whole system
        (regression: one valid Kekule structure left half of naphthalene
        non-aromatic)."""
        bonds = [(0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 4, 2), (4, 5, 1),
                 (5, 0, 2), (4, 6, 1), (6, 7, 2), (7, 8, 1), (8, 9, 2),
                 (9, 5, 1)]
        m = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(["C"] * 10, bonds)))
        assert (m.bond_types == 4).all()

    def test_hypervalent_s_p_hybridization(self):
        """Sulfone S and phosphate P are SP3 in RDKit (steric number 4)
        despite their double bonds; nitriles/alkynes stay SP (regression:
        S(=O)(=O) featurized as SP, P=O as SP2)."""
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        def hyb(elements, bonds, idx):
            x = minichem.featurize_minimol(
                minichem.parse_sdf(_sdf_text(elements, bonds)))
            return A["possible_hybridization_list"][x[idx, 7]]

        # dimethyl sulfone C-S(=O)(=O)-C
        assert hyb(["C", "S", "C", "O", "O"],
                   [(0, 1, 1), (1, 2, 1), (1, 3, 2), (1, 4, 2)], 1) == "SP3"
        # sulfoxide C-S(=O)-C
        assert hyb(["C", "S", "C", "O"],
                   [(0, 1, 1), (1, 2, 1), (1, 3, 2)], 1) == "SP3"
        # phosphonate C-P(=O)(O)(O)
        assert hyb(["C", "P", "O", "O", "O"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 1), (1, 4, 1)], 1) == "SP3"
        # nitrile C#N unchanged
        assert hyb(["C", "C", "N"], [(0, 1, 1), (1, 2, 3)], 1) == "SP"
        assert hyb(["C", "C", "N"], [(0, 1, 1), (1, 2, 3)], 2) == "SP"
        # thiocarbonyl S (degree 1) stays SP2
        assert hyb(["C", "S"], [(0, 1, 2)], 1) == "SP2"
        # nitro drawn uncharged/pentavalent N(=O)=O: steric number 3 -> SP2
        # (regression: the S/P-only hypervalent special case left it SP3)
        assert hyb(["C", "N", "O", "O"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 2)], 1) == "SP2"
        assert hyb(["C", "N", "O", "O"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 2)], 2) == "SP2"

    def test_conjugation_aware_sp2(self):
        """RDKit >= 2020.09 demotes SN-4 lone-pair atoms in conjugated
        environments to SP2: amide N, aniline N, ester O.  Isolated amine N
        and ether O stay SP3 (regression: all four read SP3 before the
        conjugation-aware pass)."""
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        def hyb(elements, bonds, idx):
            x = minichem.featurize_minimol(minichem.perceive_aromaticity(
                minichem.parse_sdf(_sdf_text(elements, bonds))))
            return A["possible_hybridization_list"][x[idx, 7]]

        # acetamide CC(=O)N: the amide N is SP2
        assert hyb(["C", "C", "O", "N"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 1)], 3) == "SP2"
        # methylamine C-N stays SP3
        assert hyb(["C", "N"], [(0, 1, 1)], 1) == "SP3"
        # aniline: N on a benzene ring is SP2
        ring = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
                (5, 0, 1)]
        assert hyb(["C"] * 6 + ["N"], ring + [(0, 6, 1)], 6) == "SP2"
        # methyl acetate CC(=O)OC: the ester (single-bonded) O is SP2
        assert hyb(["C", "C", "O", "O", "C"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 1), (3, 4, 1)], 3) == "SP2"
        # dimethyl ether O stays SP3
        assert hyb(["C", "O", "C"], [(0, 1, 1), (1, 2, 1)], 1) == "SP3"
        # phenylphosphine: P is NOT demoted (RDKit Issue211 — C(ar)-P bonds
        # are not conjugated)
        assert hyb(["C"] * 6 + ["P"], ring + [(0, 6, 1)], 6) == "SP3"
        # methanesulfonamide C-S(=O)(=O)-N: sulfonyl S has sigma count 4, so
        # RDKit's countAtomElec bars it from conjugating — N stays SP3
        # (regression: the any-multiple-bond-neighbour test demoted it)
        assert hyb(["C", "S", "O", "O", "N"],
                   [(0, 1, 1), (1, 2, 2), (1, 3, 2), (1, 4, 1)], 4) == "SP3"
        # methyl phosphate C-O-P(=O)(O)(O): P is never a conjugation
        # candidate (Issue211), so the ester O stays SP3
        assert hyb(["C", "O", "P", "O", "O", "O"],
                   [(0, 1, 1), (1, 2, 1), (2, 3, 2), (2, 4, 1), (2, 5, 1)],
                   1) == "SP3"

    def test_write_sdf_preserves_charges_and_kekule(self):
        """Written poses keep formal charges (M CHG) and localized Kekule
        bond orders (regression: charged ligands silently neutralized on
        re-read; aromatic type-4 bonds leaked into V2000 output)."""
        els = ["C"] * 6 + ["C", "O", "O"]
        bonds = _ring_bonds(6, [1, 2, 1, 2, 1, 2]) + [
            (0, 6, 1), (6, 7, 2), (6, 8, 1)]
        m = minichem.perceive_aromaticity(
            minichem.parse_sdf(_sdf_text(els, bonds, charges=[(8, -1)])))
        text = minichem.write_sdf(m, m.pos)
        back = minichem.parse_sdf(text)
        assert int(back.charges[8]) == -1
        # ring bonds written as Kekule 1/2, not query type 4
        assert sorted(back.bond_types[:6].tolist()) == [1, 1, 1, 2, 2, 2]

    def test_naphthalene_ring_features(self):
        """SSSR-style ring features: every atom in a 6-ring (a spanning-tree
        cycle basis could report a 10-ring), fusion atoms in 2 rings."""
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        bonds = [(0, 1, 2), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
                 (5, 0, 1), (4, 6, 1), (6, 7, 2), (7, 8, 1), (8, 9, 2),
                 (9, 5, 1)]
        m = minichem.parse_sdf(_sdf_text(["C"] * 10, bonds))
        x = minichem.featurize_minimol(minichem.perceive_aromaticity(m))
        assert all(A["possible_is_in_ring6_list"][v] for v in x[:, 13])
        nring = [A["possible_numring_list"][v] for v in x[:, 9]]
        assert nring[4] == 2 and nring[5] == 2  # fusion atoms
        assert nring[0] == 1

    def test_idempotent_and_remove_hs(self):
        mol = minichem.parse_sdf(_sdf_text(["C"] * 6, _ring_bonds(6, [1, 2, 1, 2, 1, 2])))
        once = minichem.perceive_aromaticity(mol)
        twice = minichem.perceive_aromaticity(once)
        assert twice.bond_types.tolist() == once.bond_types.tolist()
        assert twice.kekule_types.tolist() == once.kekule_types.tolist()
        # toluene with explicit ring H: removal keeps both type arrays aligned
        els = ["C"] * 7 + ["H"]
        bonds = _ring_bonds(6, [1, 2, 1, 2, 1, 2]) + [(0, 6, 1), (1, 7, 1)]
        tol = minichem.perceive_aromaticity(minichem.parse_sdf(_sdf_text(els, bonds)))
        heavy = tol.remove_hs()
        assert len(heavy.elements) == 7
        assert heavy.bond_types.tolist()[:6] == [4] * 6
        assert heavy.kekule_types.tolist()[:6] == [1, 2, 1, 2, 1, 2]

    def test_charged_valence(self):
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        # methoxide CH3-O(-): O gets 0 implicit H (effective valence 1)
        m = minichem.parse_sdf(_sdf_text(["C", "O"], [(0, 1, 1)], charges=[(1, -1)]))
        x = minichem.featurize_minimol(m)
        assert A["possible_numH_list"][x[1, 5]] == 0
        assert A["possible_formal_charge_list"][x[1, 3]] == -1
        # ammonium-like N(+) on one bond -> 3 implicit H
        m = minichem.parse_sdf(_sdf_text(["C", "N"], [(0, 1, 1)], charges=[(1, 1)]))
        x = minichem.featurize_minimol(m)
        assert A["possible_numH_list"][x[1, 5]] == 3

    def test_exotic_valence_implicit_h(self):
        """RDKit walks the element's allowed-valence LIST (S 2/4/6, P 3/5),
        so hypervalent S/P still gain implicit Hs from the next row up, and
        metals (no list) never do (regression: a single default valence
        clamped hypervalent atoms to 0 H and granted Fe 4-minus-degree Hs)."""
        from disco_diffdock_tpu.data.features import ALLOWABLE_FEATURES as A

        def nh(elements, bonds, idx, charges=None):
            x = minichem.featurize_minimol(minichem.parse_sdf(
                _sdf_text(elements, bonds, charges=charges or [])))
            return A["possible_numH_list"][x[idx, 5]]

        # trimethylsulfonium-like NEUTRAL S with 3 sigma bonds: RDKit fits
        # the valence-4 row -> 1 implicit H (old model: max(0, 2-3) = 0)
        assert nh(["C", "S", "C", "C"],
                  [(0, 1, 1), (1, 2, 1), (1, 3, 1)], 1) == 1
        # methylphosphine C-PH2: valence-3 row -> 2 H
        assert nh(["C", "P"], [(0, 1, 1)], 1) == 2
        # C-P(=O)(C): explicit valence 4 fits the valence-5 row -> 1 H
        assert nh(["C", "P", "O", "C"],
                  [(0, 1, 1), (1, 2, 2), (1, 3, 1)], 1) == 1
        # phosphate P(=O)(O)(O)(O): explicit 5 = row 5 exactly -> 0 H
        assert nh(["P", "O", "O", "O", "O"],
                  [(0, 1, 2), (0, 2, 1), (0, 3, 1), (0, 4, 1)], 0) == 0
        # sulfoxide S (explicit 4 = row 4) and sulfone S (explicit 6): 0 H
        assert nh(["C", "S", "C", "O"],
                  [(0, 1, 1), (1, 2, 1), (1, 3, 2)], 1) == 0
        assert nh(["C", "S", "C", "O", "O"],
                  [(0, 1, 1), (1, 2, 1), (1, 3, 2), (1, 4, 2)], 1) == 0
        # thiol S: plain valence-2 row -> 1 H
        assert nh(["C", "S"], [(0, 1, 1)], 1) == 1
        # S+ with three bonds: charge shifts the list to 3/5/7 -> 0 H
        assert nh(["C", "S", "C", "C"],
                  [(0, 1, 1), (1, 2, 1), (1, 3, 1)], 1, charges=[(1, 1)]) == 0
        # metals have NO valence list: a 2-coordinate Fe gets 0 implicit H
        # (old model: default valence 4 granted it 2)
        assert nh(["O", "Fe", "O"], [(0, 1, 1), (1, 2, 1)], 1) == 0
        # borohydride-like B(-) with one bond: early-atom charge flip -> 3 H
        assert nh(["C", "B"], [(0, 1, 1)], 1, charges=[(1, -1)]) == 3
        # over-valent N (bad file, N with 5 sigma bonds): no row fits -> 0
        assert nh(["N", "C", "C", "C", "C", "C"],
                  [(0, i, 1) for i in range(1, 6)], 0) == 0

    def test_read_molecule_perceives(self, tmp_path):
        p = tmp_path / "benzene.sdf"
        p.write_text(_sdf_text(["C"] * 6, _ring_bonds(6, [1, 2, 1, 2, 1, 2])))
        mol = featurize.read_molecule(str(p), remove_hs=True)
        g = featurize.ligand_graph(mol)
        # bond one-hot lands on the AROMATIC slot (index 3)
        assert (g["bond_attr"][:, 3] == 1).all()


class TestTorsionDetect:
    def test_chain_molecule(self):
        # chain 0-1-2-3-4: bonds (1,2),(2,3) are rotatable (both sides >1)
        bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
        tor, masks = get_transformation_mask(5, bonds)
        assert len(tor) == 2
        for (u, v), m in zip(tor, masks):
            assert not m[u] and m[v]  # v side rotates
            assert 1 < m.sum() < 4  # smaller component

    def test_ring_not_rotatable(self):
        bonds = np.array([[0, 1], [1, 2], [2, 0], [2, 3], [3, 4], [4, 5]])
        tor, _ = get_transformation_mask(6, bonds)
        # ring bonds never rotate; (2,3) and (3,4) both split with >1 atoms
        pairs = {tuple(sorted(t)) for t in tor}
        assert pairs == {(2, 3), (3, 4)}


class TestConformerMatching:
    def test_recovers_torsions(self):
        rng = np.random.RandomState(0)
        pos = np.zeros((8, 3), np.float32)
        pos[:, 0] = np.arange(8) * 1.5
        pos[:, 1] = 0.3 * np.sin(np.arange(8))
        bonds = np.stack([np.arange(7), np.arange(1, 8)], 1)
        tor, masks = get_transformation_mask(8, bonds)
        true_angles = rng.uniform(-2, 2, len(tor))
        true_pos = apply_torsion_np(pos, tor, masks, true_angles)
        matched, rmsd = optimize_rotatable_bonds(pos, true_pos, tor, masks, popsize=20, maxiter=40)
        assert rmsd < 0.3, rmsd
        assert aligned_rmsd(matched, true_pos) < 0.3


class TestFeaturizePipeline:
    def test_fallback_conformer_randomizes_torsions(self):
        """The RDKit-free generate_conformer keeps local structure (bond
        lengths) but decorrelates torsions -- ETKDG's functional role, not a
        crystal-coordinate leak."""
        # butane-like chain with two rotatable bonds + a branch
        text = _sdf_text(
            ["C"] * 6,
            [(0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)],
        )
        mol = minichem.parse_sdf(text)
        # spread into a non-degenerate 3D zig-zag so axes are well-defined
        rng = np.random.RandomState(3)
        mol.pos = (np.stack([np.arange(6) * 1.5,
                             0.5 * np.sin(np.arange(6) * 2),
                             0.3 * np.cos(np.arange(6))], 1)
                   + rng.randn(6, 3) * 0.05).astype(np.float32)
        conf = featurize.generate_conformer(mol, seed=1)

        def bond_lengths(p):
            return np.array([np.linalg.norm(p[a] - p[b]) for a, b in mol.bonds])

        np.testing.assert_allclose(
            bond_lengths(conf), bond_lengths(mol.pos), atol=0.08)
        # global shape decorrelated: end-to-end distance changes
        d0 = np.linalg.norm(mol.pos[0] - mol.pos[5])
        d1 = np.linalg.norm(conf[0] - conf[5])
        assert abs(d0 - d1) > 0.2, (d0, d1)

    def test_build_record_and_collate(self):
        mol = minichem.parse_sdf(SDF)
        receptor = featurize.receptor_from_pdb(make_pdb())
        rec = featurize.build_complex_record(
            mol, receptor, matching=True, maxiter=2, popsize=4, all_atoms=True
        )
        assert rec["lig_x"].shape == (6, 16)
        assert len(rec["rec_pos"]) == 6
        assert rec["atom_x"].shape[1] == 4
        # centered at protein centroid
        np.testing.assert_allclose(rec["rec_pos"].mean(0), 0.0, atol=1e-4)
        batch = collate([rec, rec], esm_dim=0)
        assert batch.num_graphs == 2
        assert bool(batch.lig_mask[0, :6].all()) and not bool(batch.lig_mask[0, 6:].any())

    def test_chain_cutoff(self):
        receptor_all = featurize.receptor_from_pdb(make_pdb())
        far_lig = np.full((3, 3), 500.0, np.float32)
        rec2 = featurize.receptor_from_pdb(make_pdb(), far_lig, chain_cutoff=10.0)
        # no chain near the ligand -> keep-all fallback
        assert len(rec2["rec_pos"]) == len(receptor_all["rec_pos"])

    @staticmethod
    def _two_chain_pdb(n_a=4, n_b=3, sep=500.0):
        lines, serial = [], 1
        for ci, (chain, n) in enumerate((("A", n_a), ("B", n_b))):
            rng = np.random.RandomState(ci)
            pos = np.array([sep * ci, 0.0, 0.0]) + np.cumsum(rng.randn(n, 3) * 2.0, 0)
            for i in range(n):
                for nm, el in (("N", "N"), ("CA", "C"), ("C", "C")):
                    p = pos[i] + rng.randn(3) * 0.5
                    lines.append(
                        f"ATOM  {serial:5d}  {nm:<3s} GLY {chain}{i + 1:4d}    "
                        f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00"
                        f"          {el:>2s}"
                    )
                    serial += 1
        return "\n".join(lines) + "\n"

    def test_chain_cutoff_slices_esm_rows(self):
        """Dropping a chain drops its ESM embedding rows: the embedding
        array covers EVERY chain of the file in order (the reference prep
        script keys all chains, pdbbind_lm_embedding_preparation.py:67-88,
        and extract_receptor_structure aligns per chain,
        process_mols.py:219-238)."""
        text = self._two_chain_pdb()
        mol = minichem.parse_sdf(SDF)
        esm = np.arange(7, dtype=np.float32)[:, None].repeat(4, 1)  # 4+3 rows

        # ligand near chain B -> chain A dropped -> rows 4..6 kept
        near_b = np.full((3, 3), 0.0, np.float32) + np.array([500.0, 0, 0])
        receptor = featurize.receptor_from_pdb(text, near_b, chain_cutoff=50.0)
        assert len(receptor["rec_pos"]) == 3
        rec = featurize.build_complex_record(
            mol, receptor, esm=esm, matching=False)
        np.testing.assert_array_equal(rec["esm"][:, 0], [4.0, 5.0, 6.0])

        # no filtering -> all 7 rows pass through
        receptor = featurize.receptor_from_pdb(text)
        rec = featurize.build_complex_record(
            mol, receptor, esm=esm, matching=False)
        assert rec["esm"].shape[0] == 7

        # wrong row count errors loudly instead of training misaligned
        with pytest.raises(ValueError, match="ESM embedding rows"):
            featurize.build_complex_record(
                mol, receptor, esm=esm[:5], matching=False)

    def test_load_esm_reference_per_chain_pt(self, tmp_path):
        """data/pdbbind._load_esm accepts the reference .pt format keyed
        '<name>_chain_<i>' (esm_embeddings_to_pt.py) by concatenating the
        chains in index order."""
        import torch

        from disco_diffdock_tpu.data.pdbbind import PDBBind, PDBBindConfig

        d = {
            "cplx_chain_1": torch.ones(3, 4),
            "cplx_chain_0": torch.zeros(2, 4),
            "other": torch.full((2, 4), 7.0),
        }
        path = str(tmp_path / "emb.pt")
        torch.save(d, path)
        ds = PDBBind.__new__(PDBBind)
        ds.cfg = PDBBindConfig(data_dir=".", esm_embeddings_path=path)
        out = ds._load_esm()
        assert out["cplx"].shape == (5, 4)
        np.testing.assert_array_equal(out["cplx"][:2], 0.0)
        np.testing.assert_array_equal(out["cplx"][2:], 1.0)
        assert out["other"].shape == (2, 4)


class TestBuckets:
    def test_pick_smallest_fitting(self):
        rec = dict(
            lig_pos=np.zeros((20, 3)), rec_pos=np.zeros((100, 3)),
            tor_edges=np.zeros((3, 2), np.int32), bonds=np.zeros((40, 2), np.int32),
            rec_src=np.zeros(500, np.int32),
        )
        caps = pick_bucket([rec])
        assert caps is DEFAULT_BUCKETS[0]
        rec["lig_pos"] = np.zeros((60, 3))
        assert pick_bucket([rec]) is DEFAULT_BUCKETS[3]

    def test_oversized_raises(self):
        rec = dict(
            lig_pos=np.zeros((100, 3)), rec_pos=np.zeros((100, 3)),
            tor_edges=np.zeros((3, 2), np.int32), bonds=np.zeros((4, 2), np.int32),
            rec_src=np.zeros(5, np.int32),
        )
        with pytest.raises(ValueError):
            pick_bucket([rec])


class TestNativeOps:
    def test_knn_matches_python(self):
        from disco_diffdock_tpu.graphs.radius import knn_edges_host

        rng = np.random.RandomState(1)
        pos = (np.cumsum(rng.randn(80, 3), 0) * 2).astype(np.float32)
        s1, d1 = native.knn_edges(pos, 10.0, 12)
        s2, d2 = knn_edges_host(pos, 10.0, 12)
        assert set(zip(s1.tolist(), d1.tolist())) == set(zip(s2.tolist(), d2.tolist()))

    def test_radius_pairs(self):
        rng = np.random.RandomState(2)
        a = rng.randn(30, 3).astype(np.float32) * 5
        b = rng.randn(50, 3).astype(np.float32) * 5
        ia, ib = native.radius_pairs(a, b, 4.0)
        d = np.linalg.norm(a[:, None] - b[None], axis=-1)
        expect = set(zip(*np.nonzero(d < 4.0)))
        assert set(zip(ia.tolist(), ib.tolist())) == expect

    def test_dense_unlimited_knn_not_truncated(self):
        """max_neighbors=None on a dense cloud must return ALL under-cutoff
        edges: the ctypes wrapper's initial output capacity (n*64) is smaller
        than the true count here, exercising the grow-and-retry path."""
        rng = np.random.RandomState(3)
        pos = rng.randn(120, 3).astype(np.float32)  # dense: ~all pairs < 6A
        s, d = native.knn_edges(pos, 6.0, None)
        dist = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
        expect = int(((dist < 6.0) & ~np.eye(120, dtype=bool)).sum())
        assert len(s) == expect
        assert len(s) > 120 * 64  # proves the first capacity was insufficient

    def test_radius_pairs_grow_retry(self):
        rng = np.random.RandomState(4)
        a = rng.randn(8, 3).astype(np.float32) * 0.1
        b = rng.randn(4096, 3).astype(np.float32) * 0.1  # all pairs match
        ia, ib = native.radius_pairs(a, b, 10.0)
        assert len(ia) == 8 * 4096  # > default cap of 8*256

    def test_empty_inputs_terminate(self):
        """Empty point sets must return empty edge lists: the grow-and-retry
        loop's capacity starts at n*k, and 0*2 stays 0 forever (a CA-only PDB
        can leave zero receptor residues)."""
        empty = np.zeros((0, 3), np.float32)
        some = np.zeros((3, 3), np.float32)
        s, d = native.knn_edges(empty, 5.0, 10)
        assert len(s) == 0 and len(d) == 0
        for a, b in [(empty, some), (some, empty), (empty, empty)]:
            ia, ib = native.radius_pairs(a, b, 5.0)
            assert len(ia) == 0 and len(ib) == 0


class TestTorsionVariants:
    """von-Mises / GeoMol / quad machinery (conformer_matching.py variants;
    reference datasets_utils/conformer_matching.py:64-183)."""

    def _chain(self, n=8):
        pos = np.zeros((n, 3))
        pos[:, 0] = np.arange(n) * 1.5
        pos[:, 1] = 0.4 * np.sin(np.arange(n) * 1.7)
        pos[:, 2] = 0.3 * np.cos(np.arange(n) * 0.9)
        bonds = np.stack([np.arange(n - 1), np.arange(1, n)], 1)
        return pos, bonds

    def test_quads_align_with_edges(self):
        from disco_diffdock_tpu.data.conformer_matching import get_torsion_quads

        pos, bonds = self._chain()
        quads, tor, masks = get_torsion_quads(8, bonds)
        assert len(quads) == len(tor) == len(masks)
        for (a, u, v, b), (eu, ev) in zip(quads, tor):
            assert (u, v) == (eu, ev)
            assert a != v and b != u  # outer atoms on the correct sides

    def test_set_dihedrals_roundtrip(self):
        from disco_diffdock_tpu.data.conformer_matching import (
            dihedral_from_point_cloud, get_torsion_quads, set_dihedrals)

        pos, bonds = self._chain()
        quads, tor, masks = get_torsion_quads(8, bonds)
        rng = np.random.RandomState(3)
        targets = rng.uniform(-np.pi, np.pi, len(quads))
        out = set_dihedrals(pos, tor, masks, quads, targets)
        for q, t in zip(quads, targets):
            got = dihedral_from_point_cloud(out, q)
            assert abs((got - t + np.pi) % (2 * np.pi) - np.pi) < 1e-6
        # bond lengths preserved
        d0 = np.linalg.norm(pos[bonds[:, 0]] - pos[bonds[:, 1]], axis=-1)
        d1 = np.linalg.norm(out[bonds[:, 0]] - out[bonds[:, 1]], axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-8)

    def test_von_mises_recovers_chain(self):
        from disco_diffdock_tpu.data.conformer_matching import von_mises_match

        pos, bonds = self._chain()
        tor, masks = get_transformation_mask(8, bonds)
        rng = np.random.RandomState(4)
        true_pos = apply_torsion_np(pos, tor, masks, rng.uniform(-2, 2, len(tor)))
        matched, rmsd = von_mises_match(pos, true_pos, 8, bonds)
        # single-vote chain: the transfer is exact up to rigid alignment
        assert rmsd < 1e-5, rmsd

    def test_geomol_finder(self):
        from disco_diffdock_tpu.data.conformer_matching import get_torsions_geomol

        # plain chain: ONE quad per eligible interior bond — RDKit's
        # GetSubstructMatches uniquifies by atom set, so the symmetric
        # two-atom SMARTS matches each bond once
        _, bonds = self._chain(5)
        quads = get_torsions_geomol(5, bonds, np.ones(4, np.int32))
        centers = sorted(tuple(sorted((q[1], q[2]))) for q in quads)
        assert centers == [(1, 2), (2, 3)]

        # triple bond at (1,2) disqualifies atoms 1 and 2 entirely
        quads = get_torsions_geomol(5, bonds, np.array([1, 3, 1, 1], np.int32))
        assert len(quads) == 0

        # ring bonds excluded; one quad per acyclic single bond
        bonds = np.array([[0, 1], [1, 2], [2, 0], [2, 3], [3, 4], [4, 5]])
        quads = get_torsions_geomol(6, bonds, np.ones(6, np.int32))
        centers = sorted(tuple(sorted((q[1], q[2]))) for q in quads)
        assert centers == [(2, 3), (3, 4)]
        # the (2,3) quad runs forward (far atom 4 is not in the ring) with a
        # ring atom on the near side
        q23 = [q for q in quads.tolist() if sorted(q[1:3]) == [2, 3]][0]
        assert q23[1:] == [2, 3, 4] and q23[0] in (0, 1)
        assert [2, 3, 4, 5] in quads.tolist()


class TestESMFold:
    """generate_structure hook (data/esm.py; reference
    utils/inference_utils.py:122-150)."""

    class _MockFold:
        def __init__(self, fail_n=0, pdb="MOCK PDB\n"):
            self.fail_n, self.pdb, self.chunk_log = fail_n, pdb, []

        def set_chunk_size(self, n):
            self.chunk_log.append(n)

        def infer_pdb(self, seq):
            if self.fail_n > 0:
                self.fail_n -= 1
                raise RuntimeError("CUDA out of memory")
            return self.pdb

    def test_gate_error_without_fair_esm(self):
        from disco_diffdock_tpu.data.esm import generate_structure

        try:
            import esm  # noqa: F401

            pytest.skip("fair-esm unexpectedly installed")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="fair-esm"):
            generate_structure("MKV", "/tmp/never.pdb")

    def test_oom_halving_retry(self, tmp_path):
        from disco_diffdock_tpu.data.esm import generate_structure

        out = tmp_path / "fold.pdb"
        model = self._MockFold(fail_n=2)
        assert generate_structure("MKV", str(out), model=model)
        assert out.read_text() == "MOCK PDB\n"
        assert model.chunk_log == [256, 128, 64]

    def test_oom_gives_up_below_chunk_2(self, tmp_path):
        from disco_diffdock_tpu.data.esm import generate_structure

        model = self._MockFold(fail_n=100)
        assert not generate_structure("MKV", str(tmp_path / "f.pdb"), model=model)

    def test_record_from_sequence(self, tmp_path):
        from disco_diffdock_tpu.data.inference import record_from_paths

        sdf = tmp_path / "lig.sdf"
        sdf.write_text(SDF)
        model = self._MockFold(pdb=make_pdb(n_res=8))
        rec = record_from_paths(
            None, str(sdf), name="seqonly", protein_sequence="G" * 8,
            out_dir=str(tmp_path), esmfold_model=model,
        )
        assert rec is not None and rec["rec_pos"].shape[0] == 8
        assert (tmp_path / "seqonly" / "seqonly_esmfold.pdb").exists()


class TestRDKitPathParity:
    """The RDKit-installed featurization branch (untestable directly here —
    RDKit is absent) driven through a fake mol that reports RDKit-true
    values, asserted EQUAL to the minichem fallback on the same molecule.
    Catches divergence between the two ligand_graph branches
    (process_mols.py:93-116 parity on both sides)."""

    class _Atom:
        def __init__(self, z, deg, numh, hyb, arom, chg=0):
            self.z, self.deg, self.numh = z, deg, numh
            self.hyb, self.arom, self.chg = hyb, arom, chg

        def GetAtomicNum(self):
            return self.z

        def GetChiralTag(self):
            return "CHI_UNSPECIFIED"

        def GetTotalDegree(self):
            return self.deg

        def GetFormalCharge(self):
            return self.chg

        def GetImplicitValence(self):
            return self.numh

        def GetTotalNumHs(self):
            return self.numh

        def GetNumRadicalElectrons(self):
            return 0

        def GetHybridization(self):
            return self.hyb

        def GetIsAromatic(self):
            return self.arom

    class _Bond:
        def __init__(self, a, b, t):
            self.a, self.b, self.t = a, b, t

        def GetBeginAtomIdx(self):
            return self.a

        def GetEndAtomIdx(self):
            return self.b

        def GetBondType(self):
            return self.t

    class _Ring:
        def __init__(self, rings):
            self.rings = rings  # list of atom-index sets

        def NumAtomRings(self, i):
            return sum(i in r for r in self.rings)

        def IsAtomInRingOfSize(self, i, n):
            return any(i in r and len(r) == n for r in self.rings)

    class _Mol:
        def __init__(self, atoms, bonds, rings, pos):
            self.atoms, self.bonds = atoms, bonds
            self.rings, self.pos = rings, pos

        def GetAtoms(self):
            return self.atoms

        def GetBonds(self):
            return self.bonds

        def GetRingInfo(self):
            return TestRDKitPathParity._Ring(self.rings)

        def GetConformer(self):
            mol = self

            class C:
                def GetPositions(self):
                    return mol.pos

            return C()

    def _toluene_fake(self):
        # ring C0..C5 (C0 ipso), methyl C6; RDKit-true values after sanitize
        atoms = [self._Atom(6, 3, 0, "SP2", True)] + \
                [self._Atom(6, 3, 1, "SP2", True) for _ in range(5)] + \
                [self._Atom(6, 4, 3, "SP3", False)]
        bonds = [self._Bond(i, (i + 1) % 6, "AROMATIC") for i in range(6)]
        bonds.append(self._Bond(0, 6, "SINGLE"))
        pos = np.arange(21, dtype=np.float32).reshape(7, 3)
        return self._Mol(atoms, bonds, [set(range(6))], pos)

    def _toluene_mini(self):
        pos_lines = _sdf_text(["C"] * 7,
                              _ring_bonds(6, [1, 2, 1, 2, 1, 2]) + [(0, 6, 1)])
        m = minichem.perceive_aromaticity(minichem.parse_sdf(pos_lines))
        return minichem.MiniMol(
            m.elements, np.arange(21, dtype=np.float32).reshape(7, 3),
            m.bonds, m.bond_types, m.charges, m.kekule_types)

    def test_toluene_both_paths_equal(self, monkeypatch):
        from disco_diffdock_tpu.data import featurize

        fake = self._toluene_fake()
        gx = featurize.lig_atom_featurizer_rdkit(fake)
        monkeypatch.setattr(featurize, "HAS_RDKIT", True)
        g_rdkit = featurize.ligand_graph(fake)
        monkeypatch.setattr(featurize, "HAS_RDKIT", False)
        g_mini = featurize.ligand_graph(self._toluene_mini())
        np.testing.assert_array_equal(gx, g_mini["lig_x"])
        np.testing.assert_array_equal(g_rdkit["lig_x"], g_mini["lig_x"])
        np.testing.assert_array_equal(g_rdkit["lig_z"], g_mini["lig_z"])
        np.testing.assert_array_equal(g_rdkit["bonds"], g_mini["bonds"])
        np.testing.assert_array_equal(g_rdkit["bond_attr"], g_mini["bond_attr"])
        np.testing.assert_allclose(g_rdkit["lig_pos"], g_mini["lig_pos"])

    @classmethod
    def _fake_from_spec(cls, spec):
        """Fake-RDKit mol reporting the panel's DECLARED RDKit-true values."""
        import networkx as nx

        from tests.featurizer_panel import Z

        heavy_deg = [0] * len(spec["elements"])
        for a, b, _ in spec["bonds"]:
            heavy_deg[a] += 1
            heavy_deg[b] += 1
        charges = dict(spec["charges"])
        atoms = [
            cls._Atom(Z[el], heavy_deg[i] + numh, numh, hyb, arom,
                      charges.get(i, 0))
            for i, (el, (numh, hyb, arom)) in enumerate(
                zip(spec["elements"], spec["atoms"]))
        ]
        order_name = {1: "SINGLE", 2: "DOUBLE", 3: "TRIPLE"}
        bonds = [
            cls._Bond(a, b, "AROMATIC"
                      if (min(a, b), max(a, b)) in spec["aromatic_bonds"]
                      else order_name[t])
            for a, b, t in spec["bonds"]
        ]
        G = nx.Graph()
        G.add_nodes_from(range(len(atoms)))
        G.add_edges_from((a, b) for a, b, _ in spec["bonds"])
        rings = [set(r) for r in nx.minimum_cycle_basis(G)]
        n = len(atoms)
        pos = np.arange(3 * n, dtype=np.float32).reshape(n, 3)
        return cls._Mol(atoms, bonds, rings, pos)

    @staticmethod
    def _mini_from_spec(spec):
        m = minichem.perceive_aromaticity(minichem.parse_sdf(
            _sdf_text(spec["elements"], spec["bonds"], spec["charges"] or None)))
        n = len(spec["elements"])
        return minichem.MiniMol(
            m.elements, np.arange(3 * n, dtype=np.float32).reshape(n, 3),
            m.bonds, m.bond_types, m.charges, m.kekule_types)

    def test_panel_both_paths_equal(self, monkeypatch):
        """The ~20-molecule featurizer parity panel (VERDICT r4 #4): charged
        N/O, fused rings, heteroaromatics, sulfonamide, phosphate ester,
        amide/aniline/enol-ether -- the rdkit code branch (driven by a fake
        mol reporting the DECLARED RDKit-true values,
        tests/featurizer_panel.py) must featurize identically to the
        minichem fallback branch.  scripts/verify_rdkit_parity.py asserts
        the declarations against real RDKit whenever it is importable."""
        from disco_diffdock_tpu.data import featurize
        from tests.featurizer_panel import PANEL

        assert len(PANEL) >= 20
        for spec in PANEL:
            fake = self._fake_from_spec(spec)
            monkeypatch.setattr(featurize, "HAS_RDKIT", True)
            g_rdkit = featurize.ligand_graph(fake)
            monkeypatch.setattr(featurize, "HAS_RDKIT", False)
            g_mini = featurize.ligand_graph(self._mini_from_spec(spec))
            for key in ("lig_x", "lig_z", "bonds", "bond_attr"):
                np.testing.assert_array_equal(
                    g_rdkit[key], g_mini[key],
                    err_msg=f"{spec['name']}: {key} diverges between the "
                            "rdkit branch and the minichem fallback")


class TestMinichemKnownDivergences:
    """Inventory of the DOCUMENTED minichem-vs-RDKit aromaticity divergences
    (PARITY.md "Known gaps"): each case pins the exact FALLBACK behavior so
    any silent drift in perceive_aromaticity fails loudly here first.  The
    RDKit path is authoritative whenever rdkit is importable
    (scripts/verify_rdkit_parity.py re-checks these with real RDKit);
    reference semantics: SanitizeMol on read, process_mols.py:481-505.
    """

    @staticmethod
    def _aromatic_atoms(elements, bonds, charges=None):
        mol = minichem.parse_sdf(_sdf_text(elements, bonds, charges))
        out = minichem.perceive_aromaticity(mol)
        return sorted({
            i
            for (a, b), t in zip(out.bonds, out.bond_types) if t == 4
            for i in (int(a), int(b))
        })

    def test_azulene_envelope_divergence(self):
        """DIVERGENT: azulene is aromatic only as the fused 10-pi envelope.
        RDKit's default model fuses rings and marks ALL 10 atoms aromatic;
        minichem perceives per minimum-cycle-basis ring -- the 7-ring passes
        Hueckel (6 pi), the 5-ring does not (5 pi) -- so atoms 7-9 stay
        non-aromatic.  Pinned fallback: partial perception, never silence."""
        per = [(i, (i + 1) % 10, 2 if i % 2 == 0 else 1) for i in range(10)]
        got = self._aromatic_atoms(["C"] * 10, per + [(0, 6, 1)])
        assert got == [0, 1, 2, 3, 4, 5, 6], got  # RDKit: list(range(10))

    def test_pentalene_agrees_nonaromatic(self):
        """Pentalene (fused 5-5, 8 pi, antiaromatic): both models say
        non-aromatic -- fences the fixpoint loop against over-marking."""
        per = [(i, (i + 1) % 8, 2 if i % 2 == 0 else 1) for i in range(8)]
        assert self._aromatic_atoms(["C"] * 8, per + [(0, 4, 1)]) == []

    def test_exocyclic_carbonyl_rings_agree(self):
        """Tropone and 2-pyridone: the exocyclic C=O carbon contributes 0
        electrons but stays eligible -- both perceive aromatic (RDKit's
        canonical SMILES for tropone is the aromatic O=c1cccccc1)."""
        tropone = self._aromatic_atoms(
            ["C"] * 7 + ["O"],
            _ring_bonds(7, [2, 1, 2, 1, 2, 1, 1]) + [(6, 7, 2)])
        assert tropone == [0, 1, 2, 3, 4, 5, 6], tropone
        pyridone = self._aromatic_atoms(
            ["N"] + ["C"] * 5 + ["O"],
            [(0, 1, 1), (1, 2, 1), (2, 3, 2), (3, 4, 1), (4, 5, 2),
             (5, 0, 1), (1, 6, 2)])
        assert pyridone == [0, 1, 2, 3, 4, 5], pyridone

    def test_ring_size_window(self):
        """Rings outside 5-7 never perceive: cyclobutadiene (4) and
        cyclooctatetraene (8) stay Kekule on both models."""
        assert self._aromatic_atoms(
            ["C"] * 4, _ring_bonds(4, [2, 1, 2, 1])) == []
        assert self._aromatic_atoms(
            ["C"] * 8, _ring_bonds(8, [2, 1, 2, 1, 2, 1, 2, 1])) == []

    def test_charged_ring_systems_agree(self):
        """Pyrylium (O+ Kekulized with the in-ring double) and the
        cyclopentadienyl anion perceive aromatic; tropylium's 7-ring with
        C+ contributing 0 perceives aromatic (6 pi over 7 atoms)."""
        assert self._aromatic_atoms(
            ["O"] + ["C"] * 5, _ring_bonds(6, [1, 2, 1, 2, 1, 2]),
            charges=[(0, 1)]) == [0, 1, 2, 3, 4, 5]
        assert self._aromatic_atoms(
            ["C"] * 5, _ring_bonds(5, [1, 2, 1, 2, 1]),
            charges=[(0, -1)]) == [0, 1, 2, 3, 4]
        assert self._aromatic_atoms(
            ["C"] * 7, _ring_bonds(7, [1, 2, 1, 2, 1, 2, 1]),
            charges=[(0, 1)]) == [0, 1, 2, 3, 4, 5, 6]
