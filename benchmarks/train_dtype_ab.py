"""Mixed-precision TRAINING A/B: bf16 vs f32 message/TP compute (VERDICT r4 #5).

Two measurements on the real TPU chip, one process, interleaved windows
(back-to-back identical runs vary +-5% through the tunneled platform, so
the two variants alternate window-by-window):

  1. steps/sec of the flagship DisCo wrapper train step at bench shapes
     (bench.py build_train, 8x 32-atom/320-res, worst-case caps) for
     compute_dtype float32 vs bfloat16 (params/optimizer/batch-norm stay
     f32 in both -- only the per-edge MLP + tensor-product messages cast,
     nn/conv.py compute_dtype);
  2. loss-curve parity: N train steps from identical init params with
     identical per-step noise keys, both dtypes; curves must track within a
     few percent for bf16 to be adoptable (reference f32 loop:
     utils/training.py:96-133).

Usage: python benchmarks/train_dtype_ab.py [--steps 12 --windows 3 --parity_steps 40]
Writes benchmarks/train_dtype_ab.json; summary belongs in benchmarks/mfu.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import numpy as np


def build(dtype, train_steps):
    import bench

    bench.TRAIN_STEPS = train_steps
    return bench.build_train(dtype)


def measure_rates(args):
    """Interleaved steps/sec windows for both dtypes."""
    import bench

    progs = {}
    for d in ("float32", "bfloat16"):
        step, state, batch = build(d, args.steps)
        # compile + warm-in (a fresh executable runs ~10x slow for its
        # first dozen executions on the tunneled platform; see
        # bench.measure_train)
        key = jax.random.PRNGKey(7)
        state, aux = step(state, batch, key)
        np.asarray(aux["loss"])
        for i in range(args.steps):
            state, aux = step(state, batch, jax.random.fold_in(key, 900 + i))
        np.asarray(aux["loss"])
        progs[d] = (step, state, batch)

    rates = {"float32": [], "bfloat16": []}
    key = jax.random.PRNGKey(11)
    for w in range(args.windows):
        for d in ("float32", "bfloat16"):
            step, state, batch = progs[d]
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, aux = step(state, batch,
                                  jax.random.fold_in(key, w * args.steps + i))
            loss = float(np.asarray(aux["loss"]))
            assert np.isfinite(loss), (d, loss)
            rates[d].append(args.steps / (time.perf_counter() - t0))
            progs[d] = (step, state, batch)
            print(f"window {w} {d:9s} {rates[d][-1]:.3f} steps/s", flush=True)
    return {d: float(np.median(r)) for d, r in rates.items()}, rates


def measure_parity(args):
    """Same-init same-noise loss curves, both dtypes, small shapes."""
    import dataclasses

    import optax

    from disco_diffdock_tpu.config import (EncoderConfig, GraphCaps,
                                           ScoreModelConfig)
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.wrapper import ModelWrapper
    from disco_diffdock_tpu.train.steps import TrainState
    from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

    caps = GraphCaps(
        max_lig=16, max_rec=48, lig_bond_cap=36, lig_radius_cap=16 * 15,
        rec_edge_cap=48 * 8, cross_cap=512, tor_cap=4, tor_edge_cap=96,
    )
    batch = make_complex_batch(seed=0, batch=4, n_lig=14, n_res=40, caps=caps,
                               esm_dim=64, c_alpha_max_neighbors=8)
    sigma = SigmaSchedule()
    curves = {}
    for d in ("float32", "bfloat16"):
        cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=4,
                               esm_embedding_dim=64, latent_dim=2,
                               latent_vocab=1, latent_droprate=0.1,
                               dropout=0.0, compute_dtype=d)
        model = ModelWrapper(score_cfg=cfg, encoder_cfg=EncoderConfig(
            ns=16, nv=4, num_conv_layers=2, esm_embedding_dim=64, dropout=0.0),
            caps=caps, latent_droprate=0.1)
        rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
                "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
        variables = jax.jit(
            lambda b: model.init(rngs, b, deterministic=False))(batch)
        tx = optax.adam(1e-3)
        state = TrainState.create(variables, tx)
        step = jax.jit(make_wrapper_train_step(model, tx, sigma, 1.0, 1.0))
        losses = []
        for s in range(args.parity_steps):
            state, aux = step(state, batch,
                              jax.random.fold_in(jax.random.PRNGKey(5), s))
            losses.append(float(np.asarray(aux["loss"])))
        curves[d] = losses
        print(f"parity {d}: first {losses[0]:.4f} last {losses[-1]:.4f}",
              flush=True)
    f32, bf16 = np.asarray(curves["float32"]), np.asarray(curves["bfloat16"])
    rel = np.abs(f32 - bf16) / np.maximum(f32, 1e-9)
    return curves, {
        "mean_rel_diff": float(rel.mean()),
        "max_rel_diff": float(rel.max()),
        "final_window_f32": float(f32[-8:].mean()),
        "final_window_bf16": float(bf16[-8:].mean()),
        "both_decrease": bool(f32[-8:].mean() < f32[:8].mean()
                              and bf16[-8:].mean() < bf16[:8].mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--parity_steps", type=int, default=40)
    ap.add_argument("--skip-rates", action="store_true")
    args = ap.parse_args()

    cache = os.path.join(REPO, ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    out = {}
    if not args.skip_rates:
        medians, all_rates = measure_rates(args)
        out["steps_per_sec"] = medians
        out["windows"] = all_rates
        out["speedup_bf16"] = medians["bfloat16"] / medians["float32"]
    curves, parity = measure_parity(args)
    out["parity"] = parity
    out["curves"] = curves
    with open(os.path.join(REPO, "benchmarks", "train_dtype_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curves"}, indent=1))


if __name__ == "__main__":
    main()
