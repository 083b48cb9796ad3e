"""Regenerate results/eval from the committed fixture complexes with the
FULL metric family populated (VERDICT r4 #8): ligand bonds present so
self_intersect_fraction is computed, a confidence model loaded so the
filtered_* family is real, AR latents in the loop.

Pipeline (the reference README.md:13-32 sequence, on tests/fixtures):
  1. score+encoder training        (train.py)
  2. two-phase confidence training (confidence_train.py)
  3. two-phase AR training         (train_ar.py)
  4. evaluation with confidence reranking + AR latents (evaluate.py)

Runs on CPU (tiny fixture models dispatch-bound through the TPU tunnel).
Usage: python scripts/make_eval_artifact.py [--epochs 3]
Artifacts: results/eval/** (+ the run dirs under results/runs_fixture/).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

FIX = os.path.join(REPO, "tests", "fixtures")
DATA = os.path.join(FIX, "pdbbind")
SPLITS = os.path.join(FIX, "splits")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "results"))
    args = ap.parse_args()

    runs = os.path.join(args.out, "runs_fixture")
    cache = os.path.join(args.out, "cache_fixture")
    eval_dir = os.path.join(args.out, "eval")
    for d in (runs, eval_dir):
        shutil.rmtree(d, ignore_errors=True)

    from disco_diffdock_tpu.eval.evaluate import main as eval_main
    from disco_diffdock_tpu.train.train_ar import main as ar_main
    from disco_diffdock_tpu.train.train_confidence import main as conf_main
    from disco_diffdock_tpu.train.train_score import main as score_main

    print("=== 1/4 score+encoder training")
    score_main([
        "--data_dir", DATA,
        "--split_train", os.path.join(SPLITS, "fixture_train"),
        "--split_val", os.path.join(SPLITS, "fixture_val"),
        "--cache_path", cache,
        "--ns", "8", "--nv", "2", "--num_conv_layers", "3",
        "--dropout", "0.0", "--esm_embedding_dim", "4",
        "--enc_ns", "8", "--enc_nv", "2", "--enc_num_conv_layers", "2",
        "--batch_size", "2", "--n_epochs", str(args.epochs),
        "--val_inference_freq", "0",
        "--run_name", "score", "--log_dir", runs,
    ])
    score_run = os.path.join(runs, "score")

    print("=== 2/4 confidence training (two-phase)")
    conf_main([
        "--original_model_dir", score_run,
        "--data_dir", DATA,
        "--split_train", os.path.join(SPLITS, "fixture_train"),
        "--split_val", os.path.join(SPLITS, "fixture_val"),
        "--cache_path", cache,
        "--samples_per_complex", "4", "--inference_steps", "4",
        "--epochs", str(args.epochs),
        "--ns", "8", "--nv", "2", "--num_conv_layers", "2",
        "--run_name", "conf", "--log_dir", runs,
    ])

    print("=== 3/4 AR training (two-phase)")
    ar_main([
        "--original_model_dir", score_run,
        "--data_dir", DATA,
        "--split_train", os.path.join(SPLITS, "fixture_train"),
        "--split_val", os.path.join(SPLITS, "fixture_val"),
        "--cache_path", cache,
        "--batch_size", "2", "--epochs", str(args.epochs),
        "--warmup_epochs", "1",
        "--run_name", "ar", "--log_dir", runs,
    ])

    print("=== 4/4 evaluation (confidence reranking + AR latents)")
    metrics = eval_main([
        "--data_dir", DATA,
        "--split_path", os.path.join(SPLITS, "fixture_test"),
        "--cache_path", cache,
        "--model_dir", score_run,
        "--confidence_model_dir", os.path.join(runs, "conf"),
        "--ar_model_dir", os.path.join(runs, "ar"),
        "--samples_per_complex", "8", "--inference_steps", "8",
        "--out_dir", eval_dir,
    ])

    nulls = [k for k, v in metrics.items() if v is None]
    print(json.dumps(metrics, indent=1, default=str))
    required = ("self_intersect_fraction", "steric_clash_fraction",
                "filtered_rmsds_below_2", "run_times_mean")
    missing = [k for k in required
               if metrics.get(k) is None and k not in metrics.get("", {})]
    if missing:
        print(f"ERROR: metric family incomplete, nulls: {missing}")
        sys.exit(1)
    if nulls:
        print(f"note: remaining null metrics (expected none): {nulls}")
    # the artifact must be honest about its provenance
    with open(os.path.join(eval_dir, "PROVENANCE.md"), "w") as f:
        f.write(
            "Fixture-run artifact: tiny models trained for "
            f"{args.epochs} epochs on the 3 committed fixture complexes\n"
            "(tests/fixtures/pdbbind) purely to demonstrate the COMPLETE\n"
            "metric family (reference evaluate.py:331-338,453-456).  The\n"
            "numbers carry no docking-quality claim; see\n"
            "benchmarks/convergence_ab.md for training-correctness evidence\n"
            "and PARITY.md for the quality-parity status.\n"
            "Regenerate: python scripts/make_eval_artifact.py\n")
    print("eval artifact written to", eval_dir)


if __name__ == "__main__":
    main()
