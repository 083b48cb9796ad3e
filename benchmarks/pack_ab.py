"""Measure complex-packing throughput at the bench workload.

Packs k same-bucket complexes x 40 poses into one program (pose/batch axis
B = 40k) and reports seconds per complex for k in 1..4.  The eval driver
already packs (eval/evaluate.py); this quantifies the bench-workload gain.
Run on the real chip: `python benchmarks/pack_ab.py`.
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

N_POSES, STEPS, N_LIG, N_RES = 40, 20, 32, 320


def build(k):
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling

    import bench

    cfg = ScoreModelConfig(latent_dim=0, latent_droprate=0.0, dropout=0.0,
                           compute_dtype="bfloat16")

    def caps_with(cc):
        return GraphCaps(
            max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72,
            lig_radius_cap=N_LIG * (N_LIG - 1), rec_edge_cap=N_RES * 24,
            cross_cap=cc, tor_cap=8, tor_edge_cap=256,
        )

    caps = caps_with(bench.CROSS_CAP_SCHEDULE[0][1])
    batch = make_complex_batch(
        seed=0, batch=N_POSES * k, n_lig=N_LIG, n_res=N_RES, caps=caps,
        esm_dim=cfg.esm_embedding_dim, same_complex=True,
    )
    models = [
        (n, TensorProductScoreModel(cfg=cfg, caps=caps_with(cc)))
        for n, cc in bench.CROSS_CAP_SCHEDULE
    ]
    variables = jax.jit(models[0][1].init)(jax.random.PRNGKey(0), batch)
    sigma = SigmaSchedule()
    scfg = SamplerConfig(inference_steps=STEPS, no_final_step_noise=True)

    @jax.jit
    def run(b, key):
        k1, k2 = jax.random.split(key)
        b = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
        # k=1 is a single-complex pose batch -> the shared-receptor fast
        # path applies, exactly as in the eval driver's unpacked programs
        final, _, _ = sampling(models, variables, b, k2, scfg, sigma,
                               shared_rec=(k == 1))
        return final.lig_pos

    return run, batch


def main():
    for k in (1, 2, 4):
        run, batch = build(k)
        # Sync via host fetch: block_until_ready does not wait for execution
        # on the tunneled TPU platform (see bench.py / scatter_ab.py).
        np.asarray(run(batch, jax.random.PRNGKey(0)))
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            out = run(batch, jax.random.PRNGKey(i + 1))
        np.asarray(out)
        sec = (time.perf_counter() - t0) / reps
        print(f"pack k={k}: {sec:7.3f} s/program = {sec / k:6.3f} s/complex "
              f"({k / sec:5.3f} complexes/sec)", flush=True)


if __name__ == "__main__":
    main()
