"""Evaluation-stack tests: symmetry RMSD, aggregation, meters, PDB writer."""
import os

import numpy as np

from disco_diffdock_tpu.eval.metrics import (
    aggregate,
    ligand_automorphisms,
    min_cross_distance,
    min_self_distance,
    symmetry_rmsd,
)
from disco_diffdock_tpu.eval.visualise import PDBTrajectory
from disco_diffdock_tpu.utils.meters import AverageMeter, sigma_interval_index


class TestSymmetryRMSD:
    def test_symmetric_molecule(self):
        """A 'benzene-like' ring: rotating atom labels must not change RMSD."""
        n = 6
        ang = np.arange(n) * np.pi / 3
        pos = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], 1)
        elements = np.full(n, 6)
        bonds = np.stack([np.arange(n), (np.arange(n) + 1) % n], 1)
        autos = ligand_automorphisms(elements, bonds)
        assert len(autos) == 12  # dihedral group of the hexagon
        # relabeled prediction: plain RMSD large, symmetry RMSD ~0
        perm = np.roll(np.arange(n), 1)
        pred = pos[perm]
        plain = np.sqrt(((pred - pos) ** 2).sum(-1).mean())
        assert plain > 0.5
        assert symmetry_rmsd(pred, pos, elements, bonds) < 1e-6

    def test_asymmetric_falls_back(self):
        pos = np.random.RandomState(0).randn(5, 3)
        elements = np.array([6, 7, 8, 6, 1])
        bonds = np.array([[0, 1], [1, 2], [2, 3], [3, 4]])
        r = symmetry_rmsd(pos + 0.1, pos, elements, bonds)
        np.testing.assert_allclose(r, 0.1 * np.sqrt(3), rtol=0.2)


class TestClashMetrics:
    def test_min_cross(self):
        lig = np.zeros((1, 3))
        rec = np.array([[0.3, 0, 0], [5, 5, 5]])
        assert abs(min_cross_distance(lig, rec) - 0.3) < 1e-6

    def test_min_self_excludes_bonds(self):
        pos = np.array([[0, 0, 0], [0.1, 0, 0], [5, 0, 0]], float)
        bonds = np.array([[0, 1]])
        assert min_self_distance(pos, bonds) > 4  # bonded 0-1 pair excluded


class TestAggregate:
    def test_confidence_filtering(self):
        # 2 complexes x 4 poses; best pose has the highest confidence
        rmsds = np.array([[1.0, 8.0, 9.0, 10.0], [6.0, 1.5, 9.0, 9.0]])
        conf = np.array([[5.0, 1.0, 0.0, -1.0], [0.0, 9.0, 1.0, 2.0]])
        m = aggregate(rmsds, conf)
        assert m["filtered_rmsds_below_2"] == 100.0
        # without confidence the first pose is picked: only complex 0 < 2
        m2 = aggregate(rmsds, None)
        assert m2["top1_rmsds_below_2"] == 50.0

    def test_both_families_reference_parity(self):
        """Raw top-k uses sampling order; filtered top-k uses confidence
        order; pooled stats cover every pose (evaluate.py:414-585)."""
        # one complex, 10 poses; best rmsd is pose 7, highest conf is pose 0
        r = np.array([[3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1.0, 2.5, 10.0]])
        c = np.array([[9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.0, 0.0]])
        m = aggregate(r, c)
        # raw family: first-k in sampling order
        assert m["top1_rmsds_below_5"] == 100.0  # pose 0 = 3.0
        assert m["top5_rmsds_below_2"] == 0.0  # min(first 5) = 3.0
        assert m["top10_rmsds_below_2"] == 100.0  # pose 7 = 1.0
        # filtered family: confidence picks pose 0 (rmsd 3.0)
        assert m["filtered_rmsds_below_2"] == 0.0
        assert m["filtered_rmsds_below_5"] == 100.0
        assert m["top5_filtered_rmsds_below_2"] == 0.0  # conf top5 = poses 0-4
        assert m["top10_filtered_rmsds_below_2"] == 100.0
        # pose-pooled stats over ALL poses
        assert m["rmsds_below_2"] == 10.0  # 1 of 10 poses
        assert m["rmsds_below_5"] == 40.0  # 3.0, 4.0, 1.0, 2.5
        np.testing.assert_allclose(m["rmsds_percentile_50"], np.median(r))
        # oracle ceiling
        assert m["best_rmsds_below_2"] == 100.0

    def test_pooled_percentiles_differ_from_weighted_mean(self):
        """Percentiles must come from the pooled sample: a weighted mean of
        per-bucket medians gives a different (wrong) answer."""
        b1 = np.array([[1.0], [2.0], [3.0]])
        b2 = np.array([[10.0]])
        pooled = aggregate(np.vstack([b1, b2]))
        assert pooled["rmsds_percentile_50"] == 2.5
        weighted = (np.median(b1) * 3 + np.median(b2) * 1) / 4
        assert abs(weighted - pooled["rmsds_percentile_50"]) > 1

    def test_no_overlap_subset(self):
        rmsds = np.asarray([[1.0], [10.0], [1.0]])
        mask = np.asarray([True, True, False])
        m = aggregate(rmsds, None, no_overlap_mask=mask)
        assert m["no_overlap_rmsds_below_2"] == 50.0
        np.testing.assert_allclose(m["rmsds_below_2"], 200 / 3)


class TestMeters:
    def test_average(self):
        m = AverageMeter(["loss", "acc"])
        m.add([np.asarray(1.0), np.asarray(0.5)])
        m.add([np.asarray(3.0), np.asarray(1.0)])
        s = m.summary()
        assert s["loss"] == 2.0 and s["acc"] == 0.75

    def test_intervals(self):
        m = AverageMeter(["loss"], intervals=10)
        t = np.asarray([0.05, 0.95, 0.96])
        idx = sigma_interval_index(t, 10)
        m.add([np.asarray([1.0, 2.0, 4.0])], interval_idx=[idx])
        s = m.summary()
        assert s["int0_loss"] == 1.0 and s["int9_loss"] == 3.0


class TestPDBWriter:
    def test_multimodel(self, tmp_path):
        viz = PDBTrajectory([6, 7, 8])
        for i in range(3):
            viz.add(np.full((3, 3), float(i)), latent_pos=np.ones((1, 3)))
        path = os.path.join(tmp_path, "traj.pdb")
        viz.write(path)
        text = open(path).read()
        assert text.count("MODEL") == 3
        assert text.count("HETATM") == 12  # (3 atoms + 1 latent) x 3 frames
        assert "LAT" in text


class TestNativeAutomorphisms:
    """Native C++ automorphism enumeration vs the networkx VF2 reference
    (csrc/graph_ops.cpp graph_automorphisms)."""

    def _nx_perms(self, elements, bonds, max_count=1000):
        import networkx as nx

        G = nx.Graph()
        for i, e in enumerate(elements):
            G.add_node(i, el=int(e))
        for a, b in bonds:
            G.add_edge(int(a), int(b))
        matcher = nx.algorithms.isomorphism.GraphMatcher(
            G, G, node_match=lambda x, y: x["el"] == y["el"])
        out = []
        for m in matcher.isomorphisms_iter():
            out.append(tuple(m[i] for i in range(len(elements))))
            if len(out) >= max_count:
                break
        return set(out)

    def test_matches_networkx_on_random_graphs(self):
        from disco_diffdock_tpu.ops import native

        if not native.available():
            import pytest

            pytest.skip("no native toolchain")
        rng = np.random.RandomState(0)
        for trial in range(8):
            n = rng.randint(4, 12)
            els = rng.choice([1, 6, 7, 8], n)
            # random spanning tree + a few extra edges
            bonds = [(i, rng.randint(0, i)) for i in range(1, n)]
            for _ in range(rng.randint(0, 3)):
                a, b = rng.randint(0, n, 2)
                if a != b and (a, b) not in bonds and (b, a) not in bonds:
                    bonds.append((a, b))
            bonds = np.asarray(bonds, np.int32)
            got = {tuple(p.tolist())
                   for p in native.graph_automorphisms(els.astype(np.int32), bonds)}
            assert got == self._nx_perms(els, bonds), (trial, n)

    def test_disconnected_fragments(self):
        """Multi-fragment ligands occur in PDBBind; fragment swaps and
        per-fragment flips must all enumerate (2 x 2 x 2 = 8 here)."""
        from disco_diffdock_tpu.ops import native

        if not native.available():
            import pytest

            pytest.skip("no native toolchain")
        els = np.array([6, 6, 6, 6], np.int32)
        bonds = np.array([[0, 1], [2, 3]], np.int32)
        got = {tuple(p.tolist()) for p in native.graph_automorphisms(els, bonds)}
        assert got == self._nx_perms(els, bonds) and len(got) == 8

    def test_symmetry_rmsd_uses_cache(self):
        from disco_diffdock_tpu.eval import metrics

        els = np.array([6, 6, 6, 6])
        bonds = np.array([[0, 1], [1, 2], [2, 3]])
        pos = np.random.RandomState(1).randn(4, 3)
        metrics._AUTOMORPHISM_CACHE.clear()
        r1 = metrics.symmetry_rmsd(pos, pos[::-1], els, bonds)
        assert len(metrics._AUTOMORPHISM_CACHE) == 1
        r2 = metrics.symmetry_rmsd(pos, pos[::-1], els, bonds)
        assert len(metrics._AUTOMORPHISM_CACHE) == 1 and r1 == r2
        # reversal is an automorphism of the uniform chain -> rmsd 0
        assert r1 < 1e-6


class TestRetryHelper:
    """run_with_retries: reseeded attempts, then the sentinel path
    (reference evaluate.py:230,394-408)."""

    class _Final:
        def __init__(self):
            import numpy as np

            self.lig_pos = np.zeros((2, 3, 3))

    def test_retries_then_succeeds(self):
        import jax

        from disco_diffdock_tpu.eval.evaluate import run_with_retries

        calls = {"n": 0}

        def flaky(batch, key):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return self._Final(), None, None, None

        pos, conf, traj, latent = run_with_retries(
            flaky, None, jax.random.PRNGKey(0), 3)
        assert pos is not None and calls["n"] == 3

    def test_exhausts_to_sentinel(self):
        import jax

        from disco_diffdock_tpu.eval.evaluate import run_with_retries

        def broken(batch, key):
            raise RuntimeError("always")

        pos, conf, traj, latent = run_with_retries(
            broken, None, jax.random.PRNGKey(0), 2)
        assert pos is None and conf is None and traj is None and latent is None


def test_synthetic_all_atom_score_eval():
    """The all-atom score model runs the FULL sampler/eval path (the
    reference evaluates --all_atoms score runs through the same evaluate.py
    driver as the CG family)."""
    from disco_diffdock_tpu.eval.evaluate import main

    m = main(["--synthetic", "--all_atoms", "--n_complexes", "1",
              "--samples_per_complex", "2", "--inference_steps", "2"])
    assert m["rmsds_below_2"] is not None
    assert all(v == 0 for v in m["edge_overflow"].values())


def test_synthetic_confidence_full_metric_family(tmp_path):
    """--synthetic_confidence attaches a random-init confidence model and
    synthetic ligand bonds/elements so the COMPLETE metric family the
    reference computes (evaluate.py:331-338,453-456) is populated: no null
    self_intersect_fraction, a real filtered_ family, symmetry RMSD path."""
    from disco_diffdock_tpu.eval.evaluate import main

    m = main(["--synthetic", "--n_complexes", "1", "--samples_per_complex",
              "2", "--inference_steps", "2", "--synthetic_confidence",
              "--out_dir", str(tmp_path / "e")])
    assert m["self_intersect_fraction"] is not None
    assert m["steric_clash_fraction"] is not None
    assert "filtered_rmsds_below_2" in m
    assert all(v is not None for k, v in m.items()
               if k.startswith("filtered_")), m


def test_visualisation_writes_every_pose_ranked(tmp_path):
    """--save_visualisation writes EVERY pose's trajectory into a per-complex
    dir, files named <rank>_<rmsd>[_<conf>].pdb ranked by rmsd when no
    confidence model ran (reference evaluate.py:344-390), frames in the
    original protein frame."""
    import glob

    from disco_diffdock_tpu.eval.evaluate import main

    out = str(tmp_path / "viz")
    main(["--synthetic", "--n_complexes", "1", "--samples_per_complex", "2",
          "--inference_steps", "2", "--save_visualisation",
          "--out_dir", out])
    files = sorted(glob.glob(os.path.join(out, "0", "*.pdb")))
    assert len(files) == 2, files  # one trajectory PDB per pose
    names = [os.path.basename(f) for f in files]
    assert names[0].startswith("1_") and names[1].startswith("2_"), names
    with open(files[0]) as f:
        assert "MODEL" in f.read()  # multi-frame trajectory content


def test_no_model_suppresses_confidence_family(tmp_path):
    """--no_model with --confidence_model_dir: the confidence model never
    runs, so the filtered_ family must NOT be fabricated from the all-zero
    placeholder confidences (argsort of zeros = sampling order presented as
    a confidence ranking)."""
    import jax

    from disco_diffdock_tpu.eval.evaluate import evaluate_complexes
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.sampling.sampler import SamplerConfig
    from tests.test_score_model import small_batch, small_caps, small_cfg
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

    model = TensorProductScoreModel(cfg=small_cfg(), caps=small_caps())
    batch = small_batch()
    variables = model.init(jax.random.PRNGKey(0), batch)
    scfg = SamplerConfig(inference_steps=2)
    metrics = evaluate_complexes(
        model, variables, [batch], scfg, SigmaSchedule(),
        jax.random.PRNGKey(1),
        confidence_model=object(),  # never applied under no_model
        no_model=True,
    )
    assert "rmsds_below_2" in metrics
    assert not any(k.startswith("filtered_") for k in metrics)


def test_rdkit_to_minimol_keeps_charges_and_kekule(monkeypatch):
    """The RDKit->MiniMol shell for SDF writing must carry formal charges
    (M CHG records) and Kekule bond orders (type-4 aromatic bonds are
    query-only in V2000), not zero/aromatic placeholders."""
    import sys
    import types

    class FakeAtom:
        def __init__(self, sym, chg):
            self.sym, self.chg = sym, chg

        def GetSymbol(self):
            return self.sym

        def GetFormalCharge(self):
            return self.chg

    class FakeBond:
        def __init__(self, a, b, t):
            self.a, self.b, self.t = a, b, t

        def GetBeginAtomIdx(self):
            return self.a

        def GetEndAtomIdx(self):
            return self.b

        def GetBondType(self):
            return self.t

    class FakeMol:
        def __init__(self, atoms, bonds, kek_orders):
            self.atoms, self.bonds, self.kek = atoms, bonds, kek_orders

        def GetAtoms(self):
            return self.atoms

        def GetBonds(self):
            return self.bonds

        def GetNumConformers(self):
            return 0

    def fake_kekulize(m, clearAromaticFlags=False):
        for b, order in zip(m.bonds, m.kek):
            b.t = order

    chem = types.SimpleNamespace(Mol=lambda m: FakeMol(
        m.atoms, [FakeBond(b.a, b.b, b.t) for b in m.bonds], m.kek),
        Kekulize=fake_kekulize)
    monkeypatch.setitem(sys.modules, "rdkit", types.SimpleNamespace(Chem=chem))

    from disco_diffdock_tpu.data.minichem import write_sdf
    from disco_diffdock_tpu.eval.dock import _rdkit_to_minimol

    # N+ with an "aromatic" bond whose Kekule order is DOUBLE
    mol = FakeMol(
        [FakeAtom("N", 1), FakeAtom("C", 0), FakeAtom("O", -1)],
        [FakeBond(0, 1, "AROMATIC"), FakeBond(1, 2, "SINGLE")],
        ["DOUBLE", "SINGLE"],
    )
    mm = _rdkit_to_minimol(mol)
    assert mm.charges.tolist() == [1, 0, -1]
    assert mm.bond_types.tolist() == [4, 1]  # perception kept
    assert mm.kekule_types.tolist() == [2, 1]  # but V2000 writes Kekule
    sdf = write_sdf(mm, mm.pos, "q")
    assert "M  CHG" in sdf
    body = sdf[sdf.index("V2000"):]
    assert "  1  2  2  0" in body  # bond written as order 2, not query-4
