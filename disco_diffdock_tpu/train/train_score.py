"""Score-model (+ latent-encoder) training driver.

Functional counterpart of the reference ``train.py``: Adam + plateau
scheduler, EMA of the score-model parameters, per-epoch train/val loss,
periodic *real inference* validation (the 20-step sampler on held-out
complexes, reporting rmsds_lt2/lt5 -- the early-stopping metric), best-model
checkpoints along both axes, self-describing run dir.

Run modes:
  --synthetic          tiny synthetic complexes (environment has no PDBBind)
  --data_dir ...       real PDBBind tree (RDKit/BioPython preferred)
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import EncoderConfig, GraphCaps, ScoreModelConfig
from ..data.noise import apply_noise
from ..data.synthetic import make_complex_batch
from ..geom.diffusion import SigmaSchedule
from ..models.score_model import TensorProductScoreModel
from ..models.wrapper import ModelWrapper
from ..sampling import SamplerConfig, randomize_position, sampling
from .checkpoints import CheckpointManager, save_config
from .losses import score_matching_loss
from .steps import TrainState, make_train_step, make_val_step


def build_model(score_cfg, enc_cfg, caps):
    if enc_cfg is not None:
        return ModelWrapper(
            score_cfg=score_cfg, encoder_cfg=enc_cfg, caps=caps,
            latent_droprate=score_cfg.latent_droprate,
        )
    return TensorProductScoreModel(cfg=score_cfg, caps=caps)


def make_wrapper_train_step(model, tx, sigma, alpha, beta, axis_name=None):
    """Train step for the joint encoder+score wrapper (extra rng streams)."""

    def loss_fn(params, batch_stats, noised, targets, tr_s, rot_s, rngs):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            noised, deterministic=False, use_running_average=False,
            mutable=["batch_stats"], rngs=rngs,
        )
        loss, aux = score_matching_loss(preds, targets, noised, tr_s, rot_s,
                                        axis_name=axis_name)
        return loss, (aux, mut["batch_stats"])

    def step(state: TrainState, batch, key):
        k_noise, k_drop, k_gum, k_rate = jax.random.split(key, 4)
        ids = jnp.arange(batch.num_graphs)
        if axis_name is not None:
            idx = jax.lax.axis_index(axis_name)
            ids = ids + idx * batch.num_graphs
            k_drop, k_gum, k_rate = (
                jax.random.fold_in(k, idx) for k in (k_drop, k_gum, k_rate))
        noised, targets = apply_noise(
            k_noise, batch, sigma, alpha, beta, graph_ids=ids)
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
        rngs = {"dropout": k_drop, "gumbel": k_gum, "droprate": k_rate}
        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, noised, targets, tr_s, rot_s, rngs
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema=state.ema.update(new_params), step=state.step + 1,
        ), aux

    return step


def inference_epoch(model, variables, batches, sigma, key, steps=20, is_wrapper=False):
    """Real-sampler validation (utils/training.py:180-231): one pose per
    complex, plain RMSD vs the crystal pose, %<2A and %<5A."""
    scfg = SamplerConfig(inference_steps=steps)
    rmsds = []
    for batch in batches:
        key, k1, k2, k3 = jax.random.split(key, 4)
        if is_wrapper:
            latent = model.apply(
                variables, batch,
                method=lambda m, b: m.encoder(
                    b, latent_temperature=0.01, apply_gumbel=True,
                    deterministic=True, use_running_average=True,
                ),
                rngs={"gumbel": k3},
            )

            def apply_model(v, b, latent=None, unconditional=None, **kw):
                return model.apply(
                    v, b,
                    method=lambda m, bb: m.score_model(
                        bb, latent=latent, unconditional=unconditional,
                        deterministic=True, use_running_average=True,
                    ),
                )
        else:
            latent = None
            apply_model = model.apply

        class _M:  # tiny adapter exposing .apply for sampling()
            apply = staticmethod(apply_model)

        rb = randomize_position(k1, batch, False, False, sigma.tr_sigma_max)
        final, _, _ = sampling(_M, variables, rb, k2, scfg, sigma, latent=latent)
        # masked RMSD per graph vs original pose
        diff = np.asarray(final.lig_pos - batch.extras["orig_pos"])
        m = np.asarray(batch.lig_mask)
        rmsd = np.sqrt((np.sum(diff**2, -1) * m).sum(-1) / m.sum(-1))
        rmsds.append(rmsd)
    rmsds = np.concatenate(rmsds)
    return {
        "valinf_rmsds_lt2": 100.0 * float((rmsds < 2).mean()),
        "valinf_rmsds_lt5": 100.0 * float((rmsds < 5).mean()),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_name", default="score_run")
    p.add_argument("--log_dir", default="workdir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_train", default="data/splits/timesplit_no_lig_overlap_train")
    p.add_argument("--split_val", default="data/splits/timesplit_no_lig_overlap_val")
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--num_dataloader_workers", type=int, default=1)
    p.add_argument("--esm_embeddings_path", default=None)
    # model-scale flags (defaults = the shipped DisCo-DiffDock-S score model)
    p.add_argument("--ns", type=int, default=24)
    p.add_argument("--nv", type=int, default=6)
    p.add_argument("--num_conv_layers", type=int, default=5)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--esm_embedding_dim", type=int, default=1280)
    p.add_argument("--enc_ns", type=int, default=24)
    p.add_argument("--enc_nv", type=int, default=4)
    p.add_argument("--enc_num_conv_layers", type=int, default=3)
    # bf16 is the training default (validated: overfit-then-sample converges
    # identically, final RMSD 1.93A bf16 vs 2.01A f32; geometry stays f32 via
    # pinned-precision einsums in geom/)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--steps", type=int, default=10, help="synthetic-mode train steps")
    p.add_argument("--n_epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--w_decay", type=float, default=0.0)
    p.add_argument("--ema_rate", type=float, default=0.999)
    # plateau scheduler (reference utils/utils.py:71-81; shipped score run
    # uses scheduler=plateau, patience=30): steps on the val-inference
    # metric when periodic inference runs, else on val loss (train.py:79-83)
    p.add_argument("--scheduler", default="plateau", choices=["plateau", "none"])
    p.add_argument("--scheduler_patience", type=int, default=30)
    p.add_argument("--val_inference_freq", type=int, default=5)
    p.add_argument("--test_sigma_intervals", action="store_true",
                   help="bin validation losses into 10 sigma intervals "
                        "(reference utils/training.py:143-146)")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--num_inference_complexes", type=int, default=500)
    p.add_argument("--restart", action="store_true")
    p.add_argument("--restart_lr", type=float, default=None,
                   help="override the learning rate when restarting")
    p.add_argument("--non_strict_loading", action="store_true",
                   help="on restart, merge only the checkpoint leaves whose "
                        "path+shape match the current model (escape hatch "
                        "for architecture tweaks; reference train.py:131-138)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--project", default="disco_diffdock_tpu")
    p.add_argument("--n_devices", type=int, default=1,
                   help=">1 shards each train batch over a data mesh "
                        "(batch size must divide it); gradients sync via "
                        "psum over ICI -- the DataParallel analogue "
                        "(utils/model_utils.py:98-99)")
    p.add_argument("--use_latents", action="store_true", default=True)
    p.add_argument("--no_latents", dest="use_latents", action="store_false")
    p.add_argument("--sampling_alpha", type=float, default=1.0)
    p.add_argument("--sampling_beta", type=float, default=1.0)
    from .config_overlay import add_config_arg, apply_config_overlay

    add_config_arg(p)
    args = apply_config_overlay(p.parse_args(argv))

    sigma = SigmaSchedule()
    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=32 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
        )
        score_cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=2 if args.use_latents else 0, latent_vocab=1,
            latent_droprate=0.1 if args.use_latents else 0.0,
            compute_dtype=args.compute_dtype,
        )
        enc_cfg = (
            EncoderConfig(ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0)
            if args.use_latents else None
        )
        sb = max(4, args.n_devices)  # synthetic batch divisible by the mesh
        train_batches = [
            make_complex_batch(seed=s, batch=sb, n_lig=10, n_res=24, caps=caps,
                               esm_dim=16, c_alpha_max_neighbors=8)
            for s in range(2)
        ]
        val_batches = train_batches[:1]
        inf_batches = val_batches
    else:
        from ..data.collate import caps_from_datasets
        from ..data.pdbbind import PDBBind, PDBBindConfig, bucketed_batches

        score_cfg = ScoreModelConfig(
            ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
            dropout=args.dropout, esm_embedding_dim=args.esm_embedding_dim,
            latent_dim=2 if args.use_latents else 0,
            latent_droprate=0.1 if args.use_latents else 0.0,
            compute_dtype=args.compute_dtype,
        )
        enc_cfg = EncoderConfig(
            ns=args.enc_ns, nv=args.enc_nv,
            num_conv_layers=args.enc_num_conv_layers,
            dropout=args.dropout, esm_embedding_dim=args.esm_embedding_dim,
        ) if args.use_latents else None
        ds_train = PDBBind(PDBBindConfig(
            data_dir=args.data_dir, split_path=args.split_train,
            cache_path=args.cache_path, limit_complexes=args.limit_complexes,
            num_workers=args.num_dataloader_workers,
            esm_embeddings_path=args.esm_embeddings_path,
        ))
        ds_val = PDBBind(PDBBindConfig(
            data_dir=args.data_dir, split_path=args.split_val,
            cache_path=args.cache_path, limit_complexes=args.limit_complexes,
            num_workers=args.num_dataloader_workers,
            esm_embeddings_path=args.esm_embeddings_path,
        ))
        # one exact-fit capacity profile over train+val: no edge slot can
        # overflow, and the whole run compiles one train program
        caps = caps_from_datasets([ds_train, ds_val])
        print(f"HAPPENING | fitted caps: {caps}")
        val_batches = list(bucketed_batches(
            ds_val, args.batch_size, np.random.RandomState(0), buckets=(caps,),
            esm_dim=score_cfg.esm_embedding_dim, shuffle=False,
            drop_remainder=False,
        ))
        # the val-LOSS epoch sees the full val split (reference train.py:43-46
        # keys best-by-loss on all of it); only the real-inference epoch is
        # capped at num_inference_complexes (train.py:48-53)
        n_keep = max(1, args.num_inference_complexes // args.batch_size)
        inf_batches = val_batches[:n_keep]

    run_dir = f"{args.log_dir}/{args.run_name}"
    save_config(run_dir, score_model=score_cfg,
                **({"encoder": enc_cfg} if enc_cfg else {}),
                **({"caps": caps} if caps else {}))
    ckpt = CheckpointManager(run_dir)

    model = build_model(score_cfg, enc_cfg, caps)
    init_rngs = {
        "params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
    }
    if args.synthetic:
        example = train_batches[0]
    else:
        example = next(iter(bucketed_batches(
            ds_train, args.batch_size, np.random.RandomState(0), buckets=(caps,),
            esm_dim=score_cfg.esm_embedding_dim, drop_remainder=False,
        )))
    variables = jax.jit(lambda b: model.init(init_rngs, b, deterministic=False))(example)

    from .plateau import ReduceLROnPlateau, get_learning_rate, make_adam

    tx = make_adam(args.lr, args.w_decay)
    # EMA over the score-model params only (reference train.py:110); for the
    # DisCo wrapper the encoder rides along un-averaged in the shadow
    state = TrainState.create(
        variables, tx, ema_decay=args.ema_rate,
        ema_scope="score_model" if enc_cfg is not None else None,
    )
    if args.restart and ckpt.exists("last"):
        if args.non_strict_loading:
            from .loading import merge_matching

            raw = ckpt.restore_raw("last")
            state = state.replace(
                params=merge_matching(state.params, raw.get("params", {})),
                batch_stats=merge_matching(state.batch_stats, raw.get("batch_stats") or {}),
                ema=state.ema.replace(
                    shadow=merge_matching(state.ema.shadow,
                                          (raw.get("ema") or {}).get("shadow", {}))),
            )
            print("restarted (non-strict merge; optimizer state fresh)")
        else:
            state = ckpt.restore("last", state)
            print(f"restarted from step {int(state.step)}")
        if args.restart_lr is not None:
            # fresh optimizer at the overridden LR (train.py:121-124)
            tx = make_adam(args.restart_lr, args.w_decay)
            state = state.replace(opt_state=tx.init(state.params))

    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.project, name=args.run_name,
                                   config=vars(args))
        except ImportError:
            print("| WARNING: wandb not installed; logging disabled")

    mesh = None
    if args.n_devices > 1:
        from ..parallel import make_mesh, replicate, shard_batch, shard_train_step

        mesh = make_mesh(args.n_devices)
        assert args.batch_size % args.n_devices == 0 or args.synthetic, (
            "--batch_size must divide --n_devices")
    axis = "data" if mesh is not None else None
    if enc_cfg is not None:
        raw_step = make_wrapper_train_step(
            model, tx, sigma, args.sampling_alpha, args.sampling_beta,
            axis_name=axis)
    else:
        raw_step = make_train_step(
            model, tx, sigma, args.sampling_alpha, args.sampling_beta,
            axis_name=axis)
    if mesh is not None:
        step_fn = shard_train_step(raw_step, mesh)
        state = replicate(state, mesh)
    else:
        step_fn = jax.jit(raw_step)
    val_fn = jax.jit(make_val_step(model, sigma, wrapper=enc_cfg is not None))

    key = jax.random.PRNGKey(42)
    best_loss, best_inf = np.inf, -np.inf
    scheduler = None
    if args.scheduler == "plateau":
        # mode follows the stepped metric: the running-best inference metric
        # (goal max) when periodic inference runs, else val loss (goal min)
        scheduler = ReduceLROnPlateau(
            mode="max" if args.val_inference_freq else "min",
            patience=args.scheduler_patience, min_lr=args.lr / 100,
        )
    n_epochs = 1 if args.synthetic else args.n_epochs
    for epoch in range(n_epochs):
        t0 = time.time()
        losses = []
        steps = args.steps if args.synthetic else None
        it = 0
        batches = train_batches if args.synthetic else bucketed_batches(
            ds_train, args.batch_size, np.random.RandomState(epoch),
            buckets=(caps,), esm_dim=score_cfg.esm_embedding_dim,
            drop_remainder=len(ds_train) >= args.batch_size,
        )
        while True:
            for batch in batches:
                key, k = jax.random.split(key)
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                state, aux = step_fn(state, batch, k)
                losses.append(float(aux["loss"]))
                it += 1
                if steps and it >= steps:
                    break
            if not steps or it >= steps:
                break
        mean_loss = float(np.mean(losses))
        print(f"epoch {epoch}: train_loss={mean_loss:.4f} ({time.time() - t0:.1f}s, {it} steps)")
        if wandb_run:
            wandb_run.log({"train_loss": mean_loss}, step=epoch)

        # validation loss epoch (reference test_epoch every epoch); best
        # checkpoints key off VAL loss (train.py:66-77), not train loss
        from ..utils.meters import AverageMeter, sigma_interval_index

        intervals = 10 if args.test_sigma_intervals else 1
        meter = AverageMeter(
            ["loss", "tr_loss", "rot_loss", "tor_loss"], intervals=intervals)
        vloss_sum = vloss_n = 0.0
        for vb in val_batches:
            key, k = jax.random.split(key)
            aux, tvals, gmask = val_fn(
                state.variables(), vb, k, ema_params=state.ema.shadow)
            gm = np.asarray(gmask)
            tvals = np.asarray(tvals)[gm]
            per = {k2: np.asarray(v)[gm] for k2, v in aux.items()}
            vloss_sum += float(per["loss"].sum())
            vloss_n += len(per["loss"])
            if intervals > 1:
                idx = sigma_interval_index(tvals, intervals)
                meter.add([per["loss"], per["tr_loss"], per["rot_loss"],
                           per["tor_loss"]], interval_idx=[idx] * 4)
        val_loss = vloss_sum / max(vloss_n, 1)
        print(f"epoch {epoch}: val_loss={val_loss:.4f}")
        if intervals > 1:
            print(f"epoch {epoch}: {meter.summary()}")
        if wandb_run:
            wandb_run.log({"val_loss": val_loss}, step=epoch)

        ckpt.save("last", state)
        if val_loss < best_loss:
            best_loss = val_loss
            ckpt.save("best", state)
            ckpt.save("best_ema", state.replace(params=state.ema.shadow))

        if args.val_inference_freq and (epoch + 1) % args.val_inference_freq == 0 or args.synthetic:
            key, k = jax.random.split(key)
            metrics = inference_epoch(
                model,
                {"params": state.ema.shadow, "batch_stats": state.batch_stats},
                inf_batches,
                sigma, k, steps=args.inference_steps,
                is_wrapper=enc_cfg is not None,
            )
            print(f"epoch {epoch}: {metrics}")
            if wandb_run:
                wandb_run.log(metrics, step=epoch)
            if metrics["valinf_rmsds_lt2"] >= best_inf:
                best_inf = metrics["valinf_rmsds_lt2"]
                ckpt.save("best_inference", state)
                ckpt.save("best_ema_inference", state.replace(params=state.ema.shadow))

        if scheduler is not None:
            # reference train.py:79-83: step on the running-best inference
            # value when periodic inference is configured, else on val loss
            metric = best_inf if args.val_inference_freq else val_loss
            new_opt = scheduler.step(metric, state.opt_state)
            if new_opt is not state.opt_state:
                state = state.replace(opt_state=new_opt)
            if wandb_run:
                wandb_run.log(
                    {"current_lr": get_learning_rate(state.opt_state)}, step=epoch)
    print("training done")
    return state


if __name__ == "__main__":
    main()
