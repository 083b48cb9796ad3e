"""Evaluation driver: full docking inference + metric aggregation.

Functional counterpart of the reference ``evaluate.py``: per test complex,
N pose copies -> randomize -> the jitted reverse-diffusion sampler (with the
DisCo low-temperature constants / CFG / AR latents) -> confidence reranking ->
symmetry-corrected RMSDs, centroid distances, steric-clash and
self-intersection fractions -> top-k and confidence-filtered aggregates +
.npy artifacts.  Failures score rmsd=10000 (evaluate.py:400-408).

``--synthetic`` drives the whole pipeline on generated complexes (this image
has no PDBBind data); with real data, pass --data_dir/--split_path and the
run dirs of trained models.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from ..config import GraphCaps, ScoreModelConfig
from ..data.synthetic import make_complex_batch
from ..geom.diffusion import SigmaSchedule, get_t_schedule
from ..models.score_model import TensorProductScoreModel
from ..sampling import SamplerConfig, randomize_position, sampling
from .metrics import aggregate, min_cross_distance, min_self_distance, symmetry_rmsd


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_complexes", type=int, default=3, help="synthetic mode")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_path", default="data/splits/timesplit_test")
    p.add_argument("--model_dir", default=None, help="score-model run dir")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--ar_model_dir", default=None)
    p.add_argument("--ckpt", default="best_ema_inference")
    p.add_argument("--samples_per_complex", type=int, default=8)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--out_dir", default="results/eval")
    p.add_argument("--no_final_step_noise", action="store_true", default=True)
    p.add_argument("--temp_sampling", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    p.add_argument("--temp_psi", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--temp_sigma_data", type=float, nargs=3, default=[0.5, 0.5, 0.5])
    p.add_argument("--classifier_free_guidance_weight", type=float, default=0.0)
    p.add_argument("--save_visualisation", action="store_true")
    p.add_argument("--limit_failures", type=int, default=3)
    return p.parse_args(argv)


def evaluate_complexes(
    model,
    variables,
    complex_batches,
    scfg: SamplerConfig,
    sigma: SigmaSchedule,
    key,
    latent_fn=None,
    confidence_model=None,
    confidence_variables=None,
    lig_meta=None,
    out_dir=None,
    save_visualisation=False,
):
    """Run inference on a list of pose-replicated batches; return metrics.

    ``complex_batches``: one ComplexBatch of N pose copies per complex.
    ``lig_meta``: optional per-complex dicts {elements, bonds} for symmetry
    RMSD (plain RMSD without).
    """
    all_rmsds, all_conf, all_cent, run_times = [], [], [], []
    clash, self_int = [], []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    # one compiled program reused across complexes (shapes are bucketed)
    @jax.jit
    def _run(batch, key):
        k1, k2, k3 = jax.random.split(key, 3)
        latent = latent_fn(batch, k3) if latent_fn is not None else None
        rb = randomize_position(k1, batch, scfg.no_torsion, False, sigma.tr_sigma_max)
        return sampling(
            model, variables, rb, k2, scfg, sigma, latent=latent,
            confidence_model=confidence_model,
            confidence_variables=confidence_variables,
        )

    for ci, batch in enumerate(complex_batches):
        key, k = jax.random.split(key)
        t0 = time.time()
        final, conf, traj = _run(batch, k)
        jax.block_until_ready(final.lig_pos)
        run_times.append(time.time() - t0)

        pos = np.asarray(final.lig_pos)
        mask = np.asarray(batch.lig_mask[0])
        true = np.asarray(batch.extras["orig_pos"][0])[mask]
        meta = lig_meta[ci] if lig_meta is not None else None
        rmsds, cents = [], []
        for p in pos:
            pv = p[mask]
            if meta is not None:
                r = symmetry_rmsd(pv, true, meta["elements"], meta["bonds"])
            else:
                r = float(np.sqrt(((pv - true) ** 2).sum(-1).mean()))
            rmsds.append(r)
            cents.append(float(np.linalg.norm(pv.mean(0) - true.mean(0))))
        all_rmsds.append(rmsds)
        all_cent.append(cents)
        all_conf.append(
            np.asarray(conf) if conf is not None else np.zeros(len(pos))
        )
        rec_atoms = np.asarray(batch.rec_pos[0])[np.asarray(batch.rec_mask[0])]
        clash.append(
            float(np.mean([min_cross_distance(p[mask], rec_atoms) < 0.4 for p in pos]))
        )
        if meta is not None:
            self_int.append(
                float(np.mean([min_self_distance(p[mask], meta["bonds"]) < 0.4 for p in pos]))
            )
        if save_visualisation and traj is not None and out_dir:
            from .visualise import PDBTrajectory

            els = meta["elements"] if meta else ["C"] * int(mask.sum())
            viz = PDBTrajectory(els)
            for frame in np.asarray(traj)[:, 0]:
                viz.add(frame[mask])
            viz.write(os.path.join(out_dir, f"complex{ci}_traj.pdb"))

    rmsds = np.asarray(all_rmsds)
    confs = np.asarray(all_conf)
    cents = np.asarray(all_cent)
    metrics = aggregate(rmsds, confs if confs.any() else None, cents)
    metrics["run_times_mean"] = float(np.mean(run_times))
    metrics["run_times_std"] = float(np.std(run_times))
    metrics["steric_clash_fraction"] = float(np.mean(clash)) if clash else None
    metrics["self_intersect_fraction"] = float(np.mean(self_int)) if self_int else None
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "rmsds.npy"), rmsds)
        np.save(os.path.join(out_dir, "confidences.npy"), confs)
        np.save(os.path.join(out_dir, "centroid_distances.npy"), cents)
        np.save(os.path.join(out_dir, "run_times.npy"), np.asarray(run_times))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


def main(argv=None):
    args = parse_args(argv)
    sigma = SigmaSchedule()
    scfg = SamplerConfig(
        inference_steps=args.inference_steps,
        no_final_step_noise=args.no_final_step_noise,
        temp_sampling=tuple(args.temp_sampling),
        temp_psi=tuple(args.temp_psi),
        temp_sigma_data=tuple(args.temp_sigma_data),
        cfg_weight=args.classifier_free_guidance_weight,
        return_trajectory=args.save_visualisation,
    )

    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=32 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
        )
        cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=0, latent_droprate=0.0,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=caps)
        batches = [
            make_complex_batch(
                seed=s, batch=args.samples_per_complex, n_lig=10, n_res=24,
                caps=caps, esm_dim=16, c_alpha_max_neighbors=8, same_complex=True,
            )
            for s in range(args.n_complexes)
        ]
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
        metrics = evaluate_complexes(
            model, variables, batches, scfg, sigma, jax.random.PRNGKey(1),
            out_dir=args.out_dir, save_visualisation=args.save_visualisation,
        )
    else:
        from ..data.collate import collate, pick_bucket, replicate_record
        from ..data.pdbbind import PDBBind, PDBBindConfig
        from ..train.checkpoints import CheckpointManager, load_config

        raise NotImplementedError(
            "real-data evaluation wiring lands with trained checkpoints; "
            "use --synthetic in environments without PDBBind"
        )

    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
