"""A/B one score-model forward at bench seg-1 capacities across conv modes.

Times the jitted flagship forward (40 poses, 32-atom ligand, 320 residues,
cross_cap=max_lig*max_rec) for use_pallas_conv in {False, "message", "block"}.
Run on the real TPU chip: `python benchmarks/ab_forward.py [modes...]`.
"""
from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, ".")

N_POSES, N_LIG, N_RES = 40, 32, 320


def build(mode):
    from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
    from disco_diffdock_tpu.data.synthetic import make_complex_batch
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

    cfg = ScoreModelConfig(
        latent_dim=0, latent_droprate=0.0, dropout=0.0,
        compute_dtype="bfloat16",
        use_pallas_conv=False if mode == "fusew2" else mode,
        fuse_w2=mode == "fusew2",
    )
    caps = GraphCaps(
        max_lig=N_LIG, max_rec=N_RES, lig_bond_cap=72,
        lig_radius_cap=N_LIG * (N_LIG - 1), rec_edge_cap=N_RES * 24,
        cross_cap=N_LIG * N_RES, tor_cap=8, tor_edge_cap=256,
    )
    batch = make_complex_batch(
        seed=0, batch=N_POSES, n_lig=N_LIG, n_res=N_RES, caps=caps,
        esm_dim=cfg.esm_embedding_dim, same_complex=True,
    )
    model = TensorProductScoreModel(cfg=cfg, caps=caps)
    batch = batch.set_time(0.7, 0.7, 0.7)
    return model, batch


def main():
    modes = sys.argv[1:] or ["xla", "message", "block"]
    results = {}
    for m in modes:
        mode = False if m == "xla" else m
        model, batch = build(mode)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

        @jax.jit
        def fwd(b):
            return model.apply(
                variables, b, deterministic=True, use_running_average=True)

        import numpy as np

        out = fwd(batch)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(batch)
        # host fetch = the only reliable device sync on the tunneled platform
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / reps * 1e3
        results[m] = ms
        print(f"{m:>8}: {ms:8.2f} ms/forward", flush=True)
    print(results)


if __name__ == "__main__":
    main()
