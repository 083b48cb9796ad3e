"""End-to-end real-data pipeline on the committed fixture complexes.

Exercises the exact command sequence a user runs on real PDBBind data
(reference README.md:13-32), on the minichem-parseable fixtures under
tests/fixtures/: score+encoder training -> two-phase confidence training ->
two-phase AR training -> full evaluation with confidence reranking and AR
latents.  Quality is NOT asserted (the models train for one tiny epoch);
the contract -- featurization, caching, yml+checkpoint round-trips, phase-1
pose caches, metric artifacts -- is.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
DATA = os.path.join(_FIX, "pdbbind")
SPLITS = os.path.join(_FIX, "splits")


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("real_pipeline")
    return {
        "cache": str(root / "cache"),
        "runs": str(root / "runs"),
        "eval": str(root / "eval"),
    }


@pytest.fixture(scope="module")
def score_run(dirs):
    from disco_diffdock_tpu.train.train_score import main

    main([
        "--data_dir", DATA,
        "--split_train", os.path.join(SPLITS, "fixture_train"),
        "--split_val", os.path.join(SPLITS, "fixture_val"),
        "--cache_path", dirs["cache"],
        "--ns", "4", "--nv", "2", "--num_conv_layers", "2",
        "--dropout", "0.0", "--esm_embedding_dim", "4",
        "--enc_ns", "4", "--enc_nv", "2", "--enc_num_conv_layers", "2",
        "--batch_size", "2", "--n_epochs", "1", "--val_inference_freq", "0",
        "--run_name", "score", "--log_dir", dirs["runs"],
    ])
    return os.path.join(dirs["runs"], "score")


class TestFixtureFeaturization:
    def test_pdbbind_over_fixtures(self, dirs):
        from disco_diffdock_tpu.data.pdbbind import PDBBind, PDBBindConfig

        ds = PDBBind(PDBBindConfig(
            data_dir=DATA, split_path=os.path.join(SPLITS, "fixture_train"),
            cache_path=dirs["cache"],
        ))
        assert len(ds) == 2
        rec = ds[0]
        assert len(rec["tor_edges"]) >= 2
        assert rec["lig_x"].shape[1] == 16
        # centered at the protein centroid (pdbbind.py:341-352)
        assert np.abs(rec["rec_pos"].mean(0)).max() < 1e-3


class TestScoreTraining:
    def test_run_dir_contract(self, score_run):
        from disco_diffdock_tpu.train.loading import load_run_configs

        assert os.path.exists(os.path.join(score_run, "model_parameters.yml"))
        score_cfg, enc_cfg, caps = load_run_configs(score_run)
        assert enc_cfg is not None  # DisCo wrapper run
        assert caps is not None and caps.max_lig >= 13
        assert os.path.exists(os.path.join(score_run, "ckpt_last"))


class TestConfidenceTraining:
    def test_two_phase_real_data(self, dirs, score_run):
        from disco_diffdock_tpu.train.train_confidence import main

        main([
            "--original_model_dir", score_run,
            "--data_dir", DATA,
            "--split_train", os.path.join(SPLITS, "fixture_train"),
            "--split_val", os.path.join(SPLITS, "fixture_val"),
            "--cache_path", dirs["cache"],
            "--samples_per_complex", "2", "--inference_steps", "2",
            "--epochs", "1", "--ns", "4", "--nv", "2", "--num_conv_layers", "2",
            "--run_name", "conf", "--log_dir", dirs["runs"],
        ])
        run = os.path.join(dirs["runs"], "conf")
        assert os.path.exists(os.path.join(run, "ckpt_best"))
        # phase-1 pose caches are per complex name + cache id
        cache = os.path.join(run, "pose_cache")
        # train (fix1, fix2) + val (fix3) pose caches, keyed name + cache id
        assert sorted(os.listdir(cache)) == [
            "fix1_cache0.npz", "fix2_cache0.npz", "fix3_cache0.npz"]
        with np.load(os.path.join(cache, "fix1_cache0.npz")) as z:
            assert z["pos"].shape[0] == 2 and z["rmsd"].shape == (2,)

    def test_ladder_mode_cli(self, dirs, score_run, capsys, tmp_path):
        """--bucket_mode ladder from the confidence CLI: the streaming
        bucket path (shared with the score trainer) runs the two-phase
        recipe end-to-end (fixtures collapse to the exact catch-all
        bucket; multi-bucket equivalence is pinned in test_streaming)."""
        from disco_diffdock_tpu.train.train_confidence import main

        main([
            "--original_model_dir", score_run,
            "--data_dir", DATA,
            "--split_train", os.path.join(SPLITS, "fixture_train"),
            "--split_val", os.path.join(SPLITS, "fixture_val"),
            "--cache_path", dirs["cache"], "--bucket_mode", "ladder",
            "--samples_per_complex", "2", "--inference_steps", "2",
            "--epochs", "1", "--ns", "4", "--nv", "2", "--num_conv_layers", "2",
            "--run_name", "conf_ladder", "--log_dir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "bucket_mode=ladder" in out
        # phase-1 sampling audits its finite caps per bucket (the
        # ladder_for_datasets contract): truncation is counted, not silent
        assert "pose-cache edge-overflow audit" in out
        assert os.path.exists(
            os.path.join(str(tmp_path), "conf_ladder", "ckpt_best"))

    def test_auc_metric_rejected_for_nonbinary_modes(self):
        """--main_metric auc with a multiclass/regression label mode errors
        at parse time (regression: AUC was silently NaN every epoch, so the
        best checkpoint froze at epoch 0 and the scheduler never stepped)."""
        from disco_diffdock_tpu.train.train_confidence import main

        with pytest.raises(SystemExit, match="main_metric auc"):
            main(["--original_model_dir", "x", "--main_metric", "auc",
                  "--rmsd_classification_cutoff", "2", "5"])
        with pytest.raises(SystemExit, match="main_metric auc"):
            main(["--original_model_dir", "x", "--main_metric", "auc",
                  "--rmsd_prediction"])


class TestARTraining:
    def test_two_phase_real_data(self, dirs, score_run):
        from disco_diffdock_tpu.train.train_ar import main

        main([
            "--original_model_dir", score_run,
            "--data_dir", DATA,
            "--split_train", os.path.join(SPLITS, "fixture_train"),
            "--split_val", os.path.join(SPLITS, "fixture_val"),
            "--cache_path", dirs["cache"],
            "--batch_size", "2", "--epochs", "2", "--warmup_epochs", "1",
            "--run_name", "ar", "--log_dir", dirs["runs"],
        ])
        # best selected by held-out val metrics, along all three axes
        for tag in ("ckpt_best", "ckpt_best_loss", "ckpt_best_seq", "ckpt_last"):
            assert os.path.exists(os.path.join(dirs["runs"], "ar", tag)), tag

    def test_ladder_mode_cli(self, dirs, score_run, capsys, tmp_path):
        """--bucket_mode ladder from the AR CLI: label generation + training
        through the streaming bucket path."""
        from disco_diffdock_tpu.train.train_ar import main

        main([
            "--original_model_dir", score_run,
            "--data_dir", DATA,
            "--split_train", os.path.join(SPLITS, "fixture_train"),
            "--split_val", os.path.join(SPLITS, "fixture_val"),
            "--cache_path", dirs["cache"], "--bucket_mode", "ladder",
            "--batch_size", "2", "--epochs", "1", "--warmup_epochs", "1",
            "--run_name", "ar_ladder", "--log_dir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "bucket_mode=ladder" in out
        assert os.path.exists(
            os.path.join(str(tmp_path), "ar_ladder", "ckpt_best"))


class TestEvaluateReal:
    def test_full_eval_with_confidence_and_ar(self, dirs, score_run, tmp_path):
        from disco_diffdock_tpu.eval.evaluate import main

        no_overlap = tmp_path / "no_overlap"
        no_overlap.write_text("fix3\n")  # receptor-unseen subset = the test complex
        metrics = main([
            "--data_dir", DATA,
            "--split_path", os.path.join(SPLITS, "fixture_test"),
            "--cache_path", dirs["cache"],
            "--model_dir", score_run,
            "--confidence_model_dir", os.path.join(dirs["runs"], "conf"),
            "--ar_model_dir", os.path.join(dirs["runs"], "ar"),
            "--samples_per_complex", "2", "--inference_steps", "2",
            "--no_overlap_names_path", str(no_overlap),
            "--out_dir", dirs["eval"],
        ])
        assert metrics["n_complexes"] == 1
        assert np.isfinite(metrics["rmsds_below_2"])
        bucket = os.path.join(dirs["eval"], "bucket0")
        for artifact in ("rmsds.npy", "confidences.npy", "metrics.json",
                         "centroid_distances.npy", "run_times.npy"):
            assert os.path.exists(os.path.join(bucket, artifact)), artifact
            # pooled cross-bucket artifacts at the top level
            assert os.path.exists(os.path.join(dirs["eval"], artifact)), artifact
        assert os.path.exists(os.path.join(dirs["eval"], "complex_names.npy"))
        # both metric families survive the cross-bucket merge
        assert "top1_rmsds_below_2" in metrics
        assert "filtered_rmsds_below_2" in metrics
        with open(os.path.join(bucket, "metrics.json")) as f:
            m = json.load(f)
            assert "filtered_rmsds_below_2" in m
            # receptor-unseen subset metrics (evaluate.py:420-421 parity)
            assert "no_overlap_rmsds_below_2" in m

    def test_ar_without_encoder_errors_loudly(self, tmp_path):
        """--ar_model_dir against a latent-free score run must raise, not
        silently fall back to no latents."""
        from disco_diffdock_tpu.config import ScoreModelConfig
        from disco_diffdock_tpu.eval.evaluate import main
        from disco_diffdock_tpu.train.checkpoints import save_config

        run_dir = str(tmp_path / "latent_free_run")
        save_config(run_dir, score_model=ScoreModelConfig(latent_dim=0))
        with pytest.raises(SystemExit, match="encoder"):
            main([
                "--data_dir", DATA,
                "--split_path", os.path.join(SPLITS, "fixture_test"),
                "--cache_path", str(tmp_path / "cache"),
                "--model_dir", run_dir,
                "--ar_model_dir", str(tmp_path / "whatever"),
                "--out_dir", str(tmp_path / "out"),
            ])


class TestDockCLI:
    def test_dock_protein_ligand(self, dirs, score_run, tmp_path):
        """User-facing docking: PDB + SDF in, ranked SDF poses out
        (eval/dock.py; completes the reference's unused InferenceDataset
        path, utils/inference_utils.py:153-275)."""
        from disco_diffdock_tpu.data import minichem
        from disco_diffdock_tpu.eval.dock import main

        out = str(tmp_path / "dock")
        results = main([
            "--protein", os.path.join(DATA, "fix1", "fix1_protein_processed.pdb"),
            "--ligand", os.path.join(DATA, "fix1", "fix1_ligand.sdf"),
            "--model_dir", score_run,
            "--samples_per_complex", "2", "--inference_steps", "2",
            "--save_visualisation", "--allow_seed_latents",
            "--out_dir", out,
        ])
        assert len(results) == 2 and results[0]["rank"] == 1
        sdf = os.path.join(out, results[0]["file"])
        assert os.path.exists(sdf)
        mol = minichem.parse_sdf(open(sdf).read())
        ref = minichem.parse_sdf(
            open(os.path.join(DATA, "fix1", "fix1_ligand.sdf")).read()
        ).remove_hs()
        # pose has the ligand's atoms/bonds and lives near the receptor frame
        assert mol.elements == ref.elements
        assert len(mol.bonds) == len(ref.bonds)
        assert np.isfinite(mol.pos).all()
        with open(os.path.join(out, "fix1_protein_processed_results.json")) as f:
            assert len(json.load(f)["poses"]) == 2
        traj = os.path.join(out, "fix1_protein_processed_rank1_traj.pdb")
        assert os.path.exists(traj)
        assert open(traj).read().count("MODEL") >= 2  # one frame per step


    def test_dock_no_random_reaches_randomize(self, dirs, score_run, tmp_path,
                                              monkeypatch):
        """--no_random must suppress the initial pose randomization too, not
        just the in-sampler noise (regression: dock passed a hardcoded False
        to randomize_position; reference evaluate.py threads args.no_random)."""
        from disco_diffdock_tpu.eval import dock

        seen = {}
        real = dock.randomize_position

        def spy(key, batch, no_torsion, no_random, tr_sigma_max):
            seen["no_random"] = no_random
            return real(key, batch, no_torsion, no_random, tr_sigma_max)

        monkeypatch.setattr(dock, "randomize_position", spy)
        dock.main([
            "--protein", os.path.join(DATA, "fix1", "fix1_protein_processed.pdb"),
            "--ligand", os.path.join(DATA, "fix1", "fix1_ligand.sdf"),
            "--model_dir", score_run,
            "--samples_per_complex", "1", "--inference_steps", "1",
            "--no_random", "--allow_seed_latents",
            "--out_dir", str(tmp_path / "dock_nr"),
        ])
        assert seen["no_random"] is True


    def test_disco_run_requires_ar_prior(self, dirs, score_run, tmp_path):
        """Docking a DisCo run without --ar_model_dir fails fast instead of
        silently conditioning on encoder latents of the seed conformer
        (regression; --allow_seed_latents is the explicit override)."""
        from disco_diffdock_tpu.eval import dock

        with pytest.raises(SystemExit, match="AR"):
            dock.main([
                "--protein", os.path.join(DATA, "fix1",
                                          "fix1_protein_processed.pdb"),
                "--ligand", os.path.join(DATA, "fix1", "fix1_ligand.sdf"),
                "--model_dir", score_run,
                "--out_dir", str(tmp_path / "d"),
            ])

    def test_ar_without_encoder_errors_loudly(self, tmp_path):
        """--ar_model_dir against a latent-free score run must raise, not
        silently drop the requested AR prior (mirror of the evaluate guard)."""
        from disco_diffdock_tpu.config import ScoreModelConfig
        from disco_diffdock_tpu.eval import dock
        from disco_diffdock_tpu.train.checkpoints import save_config

        run_dir = str(tmp_path / "latent_free_run")
        save_config(run_dir, score_model=ScoreModelConfig(latent_dim=0))
        with pytest.raises(SystemExit, match="encoder"):
            dock.main([
                "--protein", os.path.join(DATA, "fix1",
                                          "fix1_protein_processed.pdb"),
                "--ligand", os.path.join(DATA, "fix1", "fix1_ligand.sdf"),
                "--model_dir", run_dir,
                "--ar_model_dir", str(tmp_path / "whatever"),
                "--out_dir", str(tmp_path / "d"),
            ])


class TestServe:
    def test_disco_run_requires_ar_prior(self, dirs, score_run):
        from disco_diffdock_tpu.serve import DockingService

        with pytest.raises(SystemExit, match="AR"):
            DockingService(score_run)

    def test_ar_without_encoder_errors_loudly(self, tmp_path):
        """ar_model_dir against a latent-free score run must raise at
        construction, not feed zero-width latents into a model initialized
        without them (mirror of evaluate/dock guards)."""
        from disco_diffdock_tpu.config import ScoreModelConfig
        from disco_diffdock_tpu.serve import DockingService
        from disco_diffdock_tpu.train.checkpoints import save_config

        run_dir = str(tmp_path / "latent_free_run")
        save_config(run_dir, score_model=ScoreModelConfig(latent_dim=0))
        with pytest.raises(SystemExit, match="encoder"):
            DockingService(run_dir, ar_model_dir=str(tmp_path / "whatever"))

    def test_warmup_precompiles_buckets(self, dirs, score_run):
        """service.warmup builds and warm-executes the bucket programs at
        startup so no user request pays compile + executable warm-in
        (profile_notes.md addendum #3: ~a dozen executions to steady state
        on a tunneled TPU)."""
        from disco_diffdock_tpu.serve import DockingService

        service = DockingService(score_run, allow_seed_latents=True)
        assert service.program_count == 0
        warmed = service.warmup(samples=2, steps=2, n_buckets=1, executions=2)
        assert service.program_count == 1
        assert len(warmed) == 1 and warmed[0]["seconds"] > 0
        # idempotent: re-warming reuses the cached program
        service.warmup(samples=2, steps=2, n_buckets=1, executions=1)
        assert service.program_count == 1

    def test_http_dock_roundtrip(self, dirs, score_run):
        """serve.py: one process owns the chip; programs compile per bucket
        and are reused across requests (second request is compile-free)."""
        import http.client
        import threading
        from http.server import HTTPServer

        from disco_diffdock_tpu.serve import DockingService, make_handler

        service = DockingService(score_run, allow_seed_latents=True)
        server = HTTPServer(("127.0.0.1", 0), make_handler(service))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("GET", "/healthz")
            health = json.loads(conn.getresponse().read())
            assert health["ok"] and health["programs"] == 0

            pdb_text = open(os.path.join(DATA, "fix1", "fix1_protein_processed.pdb")).read()
            sdf_text = open(os.path.join(DATA, "fix1", "fix1_ligand.sdf")).read()
            body = json.dumps({
                "protein_pdb": pdb_text, "ligand_sdf": sdf_text,
                "samples": 2, "steps": 2, "name": "fix1",
            })
            for i in range(2):  # second request reuses the compiled program
                conn.request("POST", "/dock", body,
                             {"Content-Type": "application/json"})
                resp = json.loads(conn.getresponse().read())
                assert len(resp["poses"]) == 2, resp
                assert resp["poses"][0]["rank"] == 1
                assert "V2000" in resp["poses"][0]["sdf"]

            conn.request("GET", "/healthz")
            assert json.loads(conn.getresponse().read())["programs"] == 1

            # malformed request -> structured 500, server keeps serving
            conn.request("POST", "/dock", "{}",
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 500 and "error" in json.loads(r.read())

            # host filesystem paths are rejected without --allow-paths
            conn.request("POST", "/dock", json.dumps({
                "protein_path": os.path.join(
                    DATA, "fix1", "fix1_protein_processed.pdb"),
                "ligand_sdf": sdf_text, "samples": 2, "steps": 2,
            }), {"Content-Type": "application/json"})
            r = conn.getresponse()
            assert r.status == 500
            assert "allow-paths" in json.loads(r.read())["error"]
        finally:
            server.shutdown()


class TestDockCSV:
    def test_batch_csv(self, dirs, score_run, tmp_path):
        """Batch docking over a CSV; same-bucket rows reuse one compiled
        program through the serving layer."""
        from disco_diffdock_tpu.eval.dock import main

        csv_path = tmp_path / "jobs.csv"
        rows = ["complex_name,protein_path,ligand_description"]
        for name in ("fix1", "fix2"):
            rows.append(
                f"{name},{os.path.join(DATA, name, name + '_protein_processed.pdb')},"
                f"{os.path.join(DATA, name, name + '_ligand.sdf')}"
            )
        csv_path.write_text("\n".join(rows) + "\n")
        out = str(tmp_path / "batch")
        results = main([
            "--protein_ligand_csv", str(csv_path),
            "--model_dir", score_run, "--allow_seed_latents",
            "--samples_per_complex", "2", "--inference_steps", "2",
            "--out_dir", out,
        ])
        assert len(results) == 2
        for name in ("fix1", "fix2"):
            assert os.path.exists(os.path.join(out, name, "rank1.sdf"))
        with open(os.path.join(out, "results.json")) as f:
            assert len(json.load(f)) == 2
