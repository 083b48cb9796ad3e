"""Flagship benchmark: pose generation for one complex, 40 poses x 20 steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md north star): a protein-ligand complex of realistic size
(32 heavy ligand atoms, 320 residues), DisCo-DiffDock-S score-model scale
(ns=24, nv=6, 5 conv layers, sh_lmax=1, ESM 1280), 40 pose copies batched on
the pose axis, the full 20-step reverse SDE as a chain of jitted lax.scans.

Edge exactness: the reference keeps EVERY pair under the sigma-dependent
cross cutoff 3*sigma+20 (models/score_model.py:375-408).  Round 1 benched
with cross_cap=4096, which silently dropped up to ~60% of true cross edges at
high sigma (found by the graphs/audit.py overflow counters).  The bench now
runs a *segmented* capacity schedule -- early steps carry the worst-case
cross capacity (max_lig*max_rec, which cannot overflow), later steps a
measured+margin capacity -- and audits the realized trajectory for dropped
edges after timing.  Zero truncation, at a fraction of the
worst-case-everywhere cost (see sampling/sampler.py segmented scan).

vs_baseline compares against the reference-equivalent PyTorch CPU
implementation (benchmarks/reference_torch_baseline.py; the real reference
cannot run in this image -- no torch_geometric/e3nn/torch_cluster).  Its
measured seconds/complex is cached in benchmarks/baseline_measured.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

N_POSES = 40
STEPS = 20
N_LIG = 32
N_RES = 320

# (n_steps, cross_cap): seg1 is the exact worst case (cannot overflow); later
# caps are per-step trajectory maxima (3 seeds) + >=10% margin -- the post-run
# audit below re-verifies the realized trajectory every bench invocation.
# (Round-3 remeasure: the old (4,9216),(10,6144) tail had only 6144 at step
# 10 where the 3-seed max is 6150 -- seed-dependent truncation by a few
# edges; the 5-segment schedule below is both safer and slightly tighter.)
CROSS_CAP_SCHEDULE = (
    (6, N_LIG * N_RES), (2, 9472), (2, 7680), (4, 6784), (6, 5824),
)
LIG_RADIUS_CAP = N_LIG * (N_LIG - 1)  # exact worst case

_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_measured.json")


def get_baseline_seconds() -> float | None:
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            return json.load(f)["seconds_per_complex_40x20"]
    return None


def build(cache_onehots: bool = True):
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling

    cfg = ScoreModelConfig(latent_dim=0, latent_droprate=0.0, dropout=0.0,
                           compute_dtype="bfloat16",
                           cache_onehots=cache_onehots)

    def caps_with(cross_cap):
        return GraphCaps(
            max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72,
            lig_radius_cap=LIG_RADIUS_CAP, rec_edge_cap=N_RES * 24,
            cross_cap=cross_cap, tor_cap=8, tor_edge_cap=256,
        )

    caps = caps_with(CROSS_CAP_SCHEDULE[0][1])
    # 40 pose copies of ONE complex (same_complex=True), batched on axis 0
    batch = make_complex_batch(
        seed=0, batch=N_POSES, n_lig=N_LIG, n_res=N_RES, caps=caps,
        esm_dim=cfg.esm_embedding_dim, same_complex=True,
    )
    models = [
        (n, TensorProductScoreModel(cfg=cfg, caps=caps_with(cc)))
        for n, cc in CROSS_CAP_SCHEDULE
    ]
    # params are capacity-independent: init once on the worst-case model
    variables = jax.jit(models[0][1].init)(jax.random.PRNGKey(0), batch)
    sigma = SigmaSchedule()
    scfg = SamplerConfig(inference_steps=STEPS, no_final_step_noise=True)

    # swept TPU compile options (utils/xla_opts.py; currently empty -- the
    # 2026-08-17 sweep found the whole option surface neutral-to-negative)
    from functools import partial

    from disco_diffdock_tpu.utils.xla_opts import tpu_compiler_options

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def run(b, key):
        k1, k2 = jax.random.split(key)
        b = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
        # 40 pose copies of ONE complex: receptor-side work runs once
        final, _, _ = sampling(models, variables, b, k2, scfg, sigma,
                               shared_rec=True)
        return final.lig_pos

    @jax.jit
    def run_traj(b, key):
        """Worst-case-caps trajectory for the post-run edge audit."""
        k1, k2 = jax.random.split(key)
        b = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
        tcfg = SamplerConfig(inference_steps=STEPS, no_final_step_noise=True,
                             return_trajectory=True)
        rb = b
        final, _, traj = sampling(models[0][1], variables, rb, k2, tcfg, sigma)
        return rb.lig_pos, traj

    return run, run_traj, batch


# 8 worst-case complexes/batch: the shipped preset trains batch 24, but at
# THIS bench's pathological shape (every complex at 32x320 with the full
# 10240-pair t=1 cross capacity) 24x overflows the chip's HBM even under
# XLA remat -- real training never sees that (the bucket ladder sizes caps
# per bucket); the bench pins a fixed worst-case-shape figure instead
TRAIN_BATCH = 8
TRAIN_STEPS = 12


def build_train(compute_dtype: str = "bfloat16"):
    """Flagship TRAINING program at bench shapes: the DisCo ModelWrapper step
    (TPEncoder + gumbel latents + latent droprate + score model -- what
    configs/disco_diffdockS_score.yml trains; reference train.py epoch loop)
    on a TRAIN_BATCH-complex batch of 32-atom/320-res complexes with exact
    worst-case edge caps (training samples t~U(0,1), so t=1 cross edges must
    all fit; see the TRAIN_BATCH comment for why 8, not the preset's 24).

    ``compute_dtype`` defaults to the trainers' default (bf16 message/TP
    compute, f32 params/optimizer/batch-norm accumulation); the f32-vs-bf16
    steps/sec + loss-parity A/B lives in benchmarks/train_dtype_ab.py."""
    import optax

    from disco_diffdock_tpu.config import (
        EncoderConfig, GraphCaps, ScoreModelConfig)
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.wrapper import ModelWrapper
    from disco_diffdock_tpu.train.steps import TrainState
    from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

    cfg = ScoreModelConfig(compute_dtype=compute_dtype)
    caps = GraphCaps(
        max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72,
        lig_radius_cap=LIG_RADIUS_CAP, rec_edge_cap=N_RES * 24,
        cross_cap=N_LIG * N_RES, tor_cap=8, tor_edge_cap=256,
    )
    batch = make_complex_batch(
        seed=0, batch=TRAIN_BATCH, n_lig=N_LIG, n_res=N_RES, caps=caps,
        esm_dim=cfg.esm_embedding_dim, c_alpha_max_neighbors=24,
    )
    model = ModelWrapper(score_cfg=cfg, encoder_cfg=EncoderConfig(),
                         caps=caps, latent_droprate=cfg.latent_droprate)
    init_rngs = {
        "params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
    }
    variables = jax.jit(
        lambda b: model.init(init_rngs, b, deterministic=False))(batch)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_wrapper_train_step(model, tx, SigmaSchedule(), 1.0, 1.0))
    return step, state, batch


def measure_train(step, state, batch) -> float:
    """Optimizer steps/sec.  Each dispatch consumes the previous TrainState,
    so the chain self-serializes on device; fetching the LAST step's loss is
    the one host sync that forces the whole chain (block_until_ready does not
    wait on the tunneled platform -- see the verify skill / scatter_ab.py).

    Warm-in: a freshly compiled/loaded executable runs ~10x slow for about
    its first dozen executions on this tunneled platform (measured 0.96 vs
    9.2 steps/sec, profile_notes.md round-4 addendum), so a full UNTIMED
    window runs first and the reported figure is the median of three timed
    windows at steady state."""
    key = jax.random.PRNGKey(7)
    state, aux = step(state, batch, key)  # compile
    np.asarray(aux["loss"])
    for i in range(TRAIN_STEPS):  # warm-in window (untimed)
        state, aux = step(state, batch, jax.random.fold_in(key, 1000 + i))
    np.asarray(aux["loss"])
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(TRAIN_STEPS):
            state, aux = step(state, batch,
                              jax.random.fold_in(key, w * TRAIN_STEPS + i))
        loss = float(np.asarray(aux["loss"]))
        assert np.isfinite(loss), f"non-finite train loss {loss}"
        rates.append(TRAIN_STEPS / (time.perf_counter() - t0))
    return float(np.median(rates))


def audit_trajectory(run_traj, batch, key) -> dict:
    """Count true cross / lig-radius edges along a realized trajectory and
    compare against the segment schedule; a wrong cap fails loudly."""
    from disco_diffdock_tpu.geom.diffusion import get_t_schedule

    pos0, traj = run_traj(batch, key)
    pos0, traj = np.asarray(pos0), np.asarray(traj)
    entering = np.concatenate([pos0[None], traj[:-1]], 0)
    rec = np.asarray(batch.rec_pos)
    t_grid = get_t_schedule(STEPS)
    step_caps = np.concatenate(
        [np.full(n, cc) for n, cc in CROSS_CAP_SCHEDULE]
    )
    worst_cross = worst_lig = dropped = 0
    for i, t in enumerate(t_grid):
        cut = 3 * (0.1 ** (1 - t) * 19.0**t) + 20
        d = np.linalg.norm(entering[i][:, :, None] - rec[:, None], axis=-1)
        n_cross = int((d < cut).sum(axis=(1, 2)).max())
        dl = np.linalg.norm(entering[i][:, :, None] - entering[i][:, None], axis=-1)
        n_lig = int(((dl < 5.0) & ~np.eye(N_LIG, dtype=bool)[None]).sum(axis=(1, 2)).max())
        worst_cross = max(worst_cross, n_cross)
        worst_lig = max(worst_lig, n_lig)
        dropped += max(n_cross - int(step_caps[i]), 0) + max(n_lig - LIG_RADIUS_CAP, 0)
    return {
        "max_true_cross_edges": worst_cross,
        "max_true_lig_radius_edges": worst_lig,
        "dropped_edges": dropped,
    }


def _enable_compile_cache():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    _enable_compile_cache()
    run, run_traj, batch = build()
    profile = "--profile" in sys.argv
    # warmup / compile
    out = run(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    if profile:
        jax.profiler.start_trace("/tmp/bench_trace")
    # back-to-back identical runs vary ~+-5% through the tunneled platform
    # (shared-tenancy / daemon state; see profile_notes.md methodology
    # addendum): measure several windows and report the MEDIAN window
    windows, reps = 3, 5
    secs = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(reps):
            out = run(batch, jax.random.PRNGKey(w * reps + i + 1))
        # host fetch: block_until_ready does NOT wait over the tunneled TPU
        # platform (see benchmarks/scatter_ab.py timing methodology); a
        # transfer is the only reliable sync.  out is (40, 32, 3).
        np.asarray(out)
        secs.append((time.perf_counter() - t0) / reps)
    sec = float(np.median(secs))
    print(f"per-window seconds/complex: {[round(s, 4) for s in secs]}",
          file=sys.stderr)
    if profile:
        jax.profiler.stop_trace()

    audit = audit_trajectory(run_traj, batch, jax.random.PRNGKey(101))
    print(f"edge-capacity audit (realized trajectory): {audit}", file=sys.stderr)
    if audit["dropped_edges"] > 0:
        print("| WARNING: edge capacity overflow -- the schedule is "
              "truncating real edges; raise CROSS_CAP_SCHEDULE", file=sys.stderr)

    # flagship TRAINING throughput (VERDICT r3 item 2): the DisCo wrapper
    # optimizer step at bench shapes; no reference baseline exists (the
    # reference never ran in this image), so the figure is self-tracked
    train_sps = None
    if "--no-train" not in sys.argv:
        tstep, tstate, tbatch = build_train()
        train_sps = measure_train(tstep, tstate, tbatch)
        print(f"train: {train_sps:.3f} optimizer steps/sec (batch "
              f"{TRAIN_BATCH}, {N_LIG}-atom/{N_RES}-res, wrapper step)",
              file=sys.stderr)

    complexes_per_sec = 1.0 / sec
    baseline = get_baseline_seconds()
    vs_baseline = (baseline / sec) if baseline else None
    print(
        json.dumps(
            {
                "metric": "complexes/sec (40 poses x 20 reverse-diffusion steps, 32-atom ligand, 320-res receptor)",
                "value": round(complexes_per_sec, 4),
                "unit": "complexes/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                # honest labeling (VERDICT r4 #7): what the baseline IS, and
                # how stable the headline number is run-to-run
                "baseline_kind": (
                    "reimplemented torch-CPU stand-in (benchmarks/"
                    "reference_torch_baseline.py) -- the real reference's "
                    "torch_geometric/e3nn/torch_cluster stack is not "
                    "installable in this image"),
                "variance_band_pct": 5,  # +-5% between identical runs
                "window_seconds_per_complex": [round(s, 4) for s in secs],
                "history_note": (
                    "BENCH_r01's 1.96 predates the host-transfer timing fix "
                    "(block_until_ready does not wait on this tunneled "
                    "platform) and the exact-edge graph semantics; "
                    "comparable figures start at r02"),
                "train_steps_per_sec": (round(train_sps, 4)
                                        if train_sps else None),
                "train_batch_size": TRAIN_BATCH,
            }
        )
    )


if __name__ == "__main__":
    main()
