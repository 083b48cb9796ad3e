"""A/B the winning inference compile option on the TRAINING step.

The xla_opts_ab.py sweep picked dot-dot duplicated fusion for the inference
trajectory program; training compiles a different program (noise + forward +
backward + Adam), so its effect is measured separately before wiring it into
the trainers.  Run on the real chip:
``python benchmarks/train_opts_ab.py``.
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np
import optax

sys.path.insert(0, ".")

BATCH, N_LIG, N_RES = 24, 32, 320


def main():
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from disco_diffdock_tpu.train.steps import TrainState, make_train_step

    cfg = ScoreModelConfig(latent_dim=0, latent_droprate=0.0, dropout=0.0,
                           compute_dtype="bfloat16")
    caps = GraphCaps(
        max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72,
        lig_radius_cap=N_LIG * (N_LIG - 1), rec_edge_cap=N_RES * 24,
        cross_cap=N_LIG * N_RES, tor_cap=8, tor_edge_cap=256,
    )
    batch = make_complex_batch(seed=0, batch=BATCH, n_lig=N_LIG, n_res=N_RES,
                               caps=caps, esm_dim=cfg.esm_embedding_dim)
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, deterministic=False))(batch)
    tx = optax.adam(1e-3)
    sigma = SigmaSchedule()
    step = make_train_step(model, tx, sigma, 1.0, 1.0)

    for name, opts in (("base", None),
                       ("dotdup", {"xla_tpu_dot_dot_fusion_duplicated": "true"})):
        state = TrainState.create(variables, tx)
        fn = jax.jit(step, compiler_options=opts)
        state, aux = fn(state, batch, jax.random.PRNGKey(2))
        np.asarray(aux["loss"])  # sync
        reps = 20
        t0 = time.perf_counter()
        for i in range(reps):
            state, aux = fn(state, batch, jax.random.PRNGKey(3 + i))
        np.asarray(aux["loss"])  # host fetch = the only reliable sync
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:>8}: {ms:8.2f} ms/step "
              f"({BATCH / (ms / 1e3):.1f} complexes/sec)", flush=True)


if __name__ == "__main__":
    main()
