"""Flagship benchmark: pose generation for one complex, 40 poses x 20 steps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md north star): a protein-ligand complex of realistic size
(32 heavy ligand atoms, 320 residues), DisCo-DiffDock-S score-model scale
(ns=24, nv=6, 5 conv layers, sh_lmax=1, ESM 1280), 40 pose copies batched on
the pose axis, the full 20-step reverse SDE as one jitted lax.scan.

vs_baseline compares against the reference-equivalent PyTorch CPU
implementation (benchmarks/reference_torch_baseline.py; the real reference
cannot run in this image -- no torch_geometric/e3nn/torch_cluster).  Its
measured seconds/complex is cached in benchmarks/baseline_measured.json.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

N_POSES = 40
STEPS = 20
N_LIG = 32
N_RES = 320

_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline_measured.json")


def get_baseline_seconds() -> float | None:
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            return json.load(f)["seconds_per_complex_40x20"]
    return None


def build():
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling

    cfg = ScoreModelConfig(latent_dim=0, latent_droprate=0.0, dropout=0.0, compute_dtype="bfloat16")
    caps = GraphCaps(
        max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72, lig_radius_cap=448,
        rec_edge_cap=N_RES * 24, cross_cap=4096, tor_cap=8, tor_edge_cap=256,
    )
    # 40 pose copies of ONE complex (same_complex=True), batched on axis 0
    batch = make_complex_batch(
        seed=0, batch=N_POSES, n_lig=N_LIG, n_res=N_RES, caps=caps,
        esm_dim=cfg.esm_embedding_dim, same_complex=True,
    )
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    # jit the init: eager per-op dispatch through the TPU tunnel is ~100x slower
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    sigma = SigmaSchedule()
    scfg = SamplerConfig(inference_steps=STEPS, no_final_step_noise=True)

    @jax.jit
    def run(b, key):
        k1, k2 = jax.random.split(key)
        b = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
        final, _, _ = sampling(model, variables, b, k2, scfg, sigma)
        return final.lig_pos

    return run, batch


def main():
    import sys

    run, batch = build()
    profile = "--profile" in sys.argv
    # warmup / compile
    out = run(batch, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    if profile:
        jax.profiler.start_trace("/tmp/bench_trace")
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(batch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    sec = (time.perf_counter() - t0) / reps
    if profile:
        jax.profiler.stop_trace()

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
            }
        )
    )


if __name__ == "__main__":
    main()
