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


def build_model(score_cfg, enc_cfg, caps, training_latent_temperature=1.0):
    if enc_cfg is not None:
        return ModelWrapper(
            score_cfg=score_cfg, encoder_cfg=enc_cfg, caps=caps,
            latent_droprate=score_cfg.latent_droprate,
            training_latent_temperature=training_latent_temperature,
        )
    if score_cfg.all_atoms:
        from ..models.all_atom_score_model import AllAtomScoreModel

        return AllAtomScoreModel(cfg=score_cfg, caps=caps)
    return TensorProductScoreModel(cfg=score_cfg, caps=caps)


def make_wrapper_train_step(model, tx, sigma, alpha, beta, axis_name=None,
                            tr_weight=0.33, rot_weight=0.33, tor_weight=0.33,
                            no_torsion=False):
    """Train step for the joint encoder+score wrapper (extra rng streams)."""

    def loss_fn(params, batch_stats, noised, targets, tr_s, rot_s, rngs):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            noised, deterministic=False, use_running_average=False,
            mutable=["batch_stats"], rngs=rngs,
        )
        loss, aux = score_matching_loss(preds, targets, noised, tr_s, rot_s,
                                        tr_weight, rot_weight, tor_weight,
                                        no_torsion, axis_name=axis_name)
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
            k_noise, batch, sigma, alpha, beta, no_torsion, graph_ids=ids)
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


def inference_epoch(model_for, variables, batches, sigma, key, steps=20,
                    is_wrapper=False, latent_temperature=0.01):
    """Real-sampler validation (utils/training.py:180-231): one pose per
    complex, plain RMSD vs the crystal pose, %<2A and %<5A.  ``model_for``
    maps a batch's GraphCaps to the matching-capacity model (params are
    capacity-independent, so one state serves every bucket); ``batches``
    yields ``(batch, info)`` pairs (see bucketed_batches with_info)."""
    scfg = SamplerConfig(inference_steps=steps)
    rmsds = []
    for batch, info in batches:
        model = model_for(info["caps"])
        key, k1, k2, k3 = jax.random.split(key, 4)
        if is_wrapper:
            latent = model.apply(
                variables, batch,
                method=lambda m, b: m.encoder(
                    b, latent_temperature=latent_temperature, apply_gumbel=True,
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
    if not rmsds:
        return {"valinf_rmsds_lt2": float("nan"),
                "valinf_rmsds_lt5": float("nan")}
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
    p.add_argument("--num_dataloader_workers", "--num_workers",
                   dest="num_dataloader_workers", type=int, default=1,
                   help="host preprocessing Pool size (reference --num_workers)")
    p.add_argument("--esm_embeddings_path", default=None)
    p.add_argument("--bucket_mode", default="auto",
                   choices=["auto", "exact", "ladder"],
                   help="graph-capacity strategy: 'exact' fits ONE worst-case"
                        " bucket over train+val (no edge can drop; right for"
                        " small/fixture trees); 'ladder' uses the"
                        " DEFAULT_BUCKETS size ladder + an exact catch-all"
                        " (bounded padding at reference scale; per-bucket"
                        " compiled steps; runtime edge caps audited per"
                        " epoch).  'auto' picks ladder for >256 complexes")
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="host batches collated ahead of the device by the "
                        "background prefetch thread (the DataLoader "
                        "num_workers analogue, pdbbind.py:384-406)")
    # ---- model hyperparameters (reference utils/parsing.py:70-112 names;
    # defaults = the shipped DisCo-DiffDock-S score model yml, not the
    # reference parser's defaults)
    p.add_argument("--ns", type=int, default=24)
    p.add_argument("--nv", type=int, default=6)
    p.add_argument("--num_conv_layers", type=int, default=5)
    p.add_argument("--sh_lmax", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--no_batch_norm", action="store_true")
    p.add_argument("--use_second_order_repr", action="store_true")
    p.add_argument("--sigma_embed_dim", type=int, default=32)
    p.add_argument("--distance_embed_dim", type=int, default=32)
    p.add_argument("--cross_distance_embed_dim", type=int, default=32)
    p.add_argument("--max_radius", type=float, default=5.0,
                   help="ligand radius-graph cutoff")
    p.add_argument("--cross_max_distance", type=float, default=80.0)
    p.add_argument("--dynamic_max_cross", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--scale_by_sigma", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--no_torsion", action="store_true")
    p.add_argument("--embedding_type", default="sinusoidal")
    p.add_argument("--embedding_scale", type=float, default=1000.0)
    p.add_argument("--use_old_atom_encoder", action="store_true",
                   help="legacy AtomEncoder variant (models/layers.py:81-116)")
    p.add_argument("--esm_embedding_dim", type=int, default=1280,
                   help="width of the --esm_embeddings_path vectors (the "
                        "reference hardcodes esm2 650M's 1280)")
    p.add_argument("--all_atoms", action="store_true",
                   help="train the all-atom score model "
                        "(reference model_utils.py:26-27); no latents")
    # ---- discrete latents (reference parsing.py:89-112)
    p.add_argument("--latent_dim", type=int, default=2)
    p.add_argument("--latent_vocab", type=int, default=1)
    p.add_argument("--latent_droprate", type=float, default=0.1)
    p.add_argument("--latent_cross_attention", action="store_true")
    p.add_argument("--new_cross_attention", action="store_true")
    p.add_argument("--cross_attention_heads", type=int, default=1)
    p.add_argument("--cross_attention_dim", type=int, default=64)
    p.add_argument("--latent_no_batchnorm", action="store_true")
    p.add_argument("--latent_dropout", type=float, default=0.0)
    p.add_argument("--latent_hidden_dim", type=int, default=128)
    p.add_argument("--latent_virtual_nodes", action="store_true")
    p.add_argument("--latent_nodes_residual", action="store_true")
    p.add_argument("--training_latent_temperature", type=float, default=1.0)
    p.add_argument("--sampling_latent_temperature", type=float, default=0.01)
    # ---- latent encoder (reference encoder_* names; --enc_* kept as aliases)
    p.add_argument("--encoder_ns", "--enc_ns", dest="encoder_ns",
                   type=int, default=24)
    p.add_argument("--encoder_nv", "--enc_nv", dest="encoder_nv",
                   type=int, default=4)
    p.add_argument("--encoder_num_conv_layers", "--enc_num_conv_layers",
                   dest="encoder_num_conv_layers", type=int, default=3)
    p.add_argument("--encoder_cross_max_distance", type=float, default=30.0)
    p.add_argument("--encoder_no_esm", action="store_true")
    # ---- sigma schedule (reference parsing.py:61-66; defaults = shipped yml)
    p.add_argument("--tr_sigma_min", type=float, default=0.1)
    p.add_argument("--tr_sigma_max", type=float, default=19.0)
    p.add_argument("--rot_sigma_min", type=float, default=0.03)
    p.add_argument("--rot_sigma_max", type=float, default=1.55)
    p.add_argument("--tor_sigma_min", type=float, default=0.03)
    p.add_argument("--tor_sigma_max", type=float, default=3.14)
    # ---- loss weights (reference parsing.py:58-60)
    p.add_argument("--tr_weight", type=float, default=0.33)
    p.add_argument("--rot_weight", type=float, default=0.33)
    p.add_argument("--tor_weight", type=float, default=0.33)
    # ---- featurization / matching (reference parsing.py:44-54; defaults =
    # the shipped score run's yml)
    p.add_argument("--receptor_radius", type=float, default=15.0)
    p.add_argument("--c_alpha_max_neighbors", type=int, default=24)
    p.add_argument("--atom_radius", type=float, default=5.0)
    p.add_argument("--atom_max_neighbors", type=int, default=8)
    p.add_argument("--matching_popsize", type=int, default=15)
    p.add_argument("--matching_maxiter", type=int, default=15)
    p.add_argument("--max_lig_size", type=int, default=None)
    p.add_argument("--remove_hs", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--num_conformers", type=int, default=1)
    p.add_argument("--train_multiplicity", type=int, default=1,
                   help="passes over the train set per epoch (fresh noise "
                        "each pass; reference parsing.py:94)")
    p.add_argument("--val_multiplicity", type=int, default=1)
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
    p.add_argument("--train_inference_freq", type=int, default=None,
                   help="also run the real-sampler epoch on train complexes "
                        "every N epochs (reference parsing.py:17)")
    p.add_argument("--inference_earlystop_metric", default="valinf_rmsds_lt2",
                   choices=["valinf_rmsds_lt2", "valinf_rmsds_lt5"])
    p.add_argument("--inference_earlystop_goal", default="max",
                   choices=["max", "min"])
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the periodic-inference epoch (and its best "
                        "checkpoint) on the EMA weights (reference "
                        "utils/training.py ema handling)")
    p.add_argument("--test_sigma_intervals", action="store_true",
                   help="bin validation losses into 10 sigma intervals "
                        "(reference utils/training.py:143-146)")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--num_inference_complexes", type=int, default=500)
    p.add_argument("--restart", action="store_true")
    p.add_argument("--restart_dir", default=None,
                   help="warm-start params/EMA from ANOTHER run dir's last "
                        "checkpoint (reference train.py:126-139); combine "
                        "with --non_strict_loading for architecture tweaks")
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
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each conv edge block: backward "
                        "recomputes per-edge intermediates instead of "
                        "storing them -- several-fold smaller training HBM "
                        "footprint for ~1 extra forward of FLOPs (bigger "
                        "batches / buckets per chip)")
    p.add_argument("--sampling_alpha", type=float, default=1.0)
    p.add_argument("--sampling_beta", type=float, default=1.0)
    from .config_overlay import add_config_arg, apply_config_overlay

    add_config_arg(p)
    args = apply_config_overlay(p.parse_args(argv))

    # reference semantics: latents iff latent_dim > 0 (train.py:36); the
    # all-atom model takes none (all_atom_score_model asserts latent_dim==0)
    use_latents = args.use_latents and args.latent_dim > 0 and not args.all_atoms
    sigma = SigmaSchedule(
        tr_sigma_min=args.tr_sigma_min, tr_sigma_max=args.tr_sigma_max,
        rot_sigma_min=args.rot_sigma_min, rot_sigma_max=args.rot_sigma_max,
        tor_sigma_min=args.tor_sigma_min, tor_sigma_max=args.tor_sigma_max,
    )
    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=32 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
            **({"max_atoms": 64, "atom_edge_cap": 512, "la_cap": 1024}
               if args.all_atoms else {}),
        )
        score_cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=2 if use_latents else 0, latent_vocab=1,
            latent_droprate=0.1 if use_latents else 0.0,
            all_atoms=args.all_atoms, no_torsion=args.no_torsion,
            compute_dtype=args.compute_dtype, remat=args.remat,
        )
        enc_cfg = (
            EncoderConfig(ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16,
                          dropout=0.0, remat=args.remat)
            if use_latents else None
        )
        nd = max(1, args.n_devices)
        sb = ((4 + nd - 1) // nd) * nd  # >=4 and divisible by the mesh
        train_batches = [
            (make_complex_batch(seed=s, batch=sb, n_lig=10, n_res=24, caps=caps,
                                esm_dim=16, c_alpha_max_neighbors=8,
                                all_atoms=args.all_atoms, atoms_per_res=2),
             {"caps": caps})
            for s in range(2)
        ]
        buckets = (caps,)
        bucket_mode = "exact"

        def train_stream(seed):
            return iter(train_batches)

        def val_stream():
            return iter(train_batches[:1])

        inf_stream = val_stream
        traininf_stream = val_stream
    else:
        from ..data.collate import caps_from_datasets
        from ..data.pdbbind import PDBBind, PDBBindConfig, bucketed_batches

        esm_dim = args.esm_embedding_dim if args.esm_embeddings_path else 0
        score_cfg = ScoreModelConfig(
            ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
            sh_lmax=args.sh_lmax, sigma_embed_dim=args.sigma_embed_dim,
            distance_embed_dim=args.distance_embed_dim,
            cross_distance_embed_dim=args.cross_distance_embed_dim,
            lig_max_radius=args.max_radius,
            cross_max_distance=args.cross_max_distance,
            dynamic_max_cross=args.dynamic_max_cross,
            use_second_order_repr=args.use_second_order_repr,
            batch_norm=not args.no_batch_norm,
            dropout=args.dropout, esm_embedding_dim=esm_dim,
            scale_by_sigma=args.scale_by_sigma, no_torsion=args.no_torsion,
            embedding_type=args.embedding_type,
            embedding_scale=args.embedding_scale,
            use_old_atom_encoder=args.use_old_atom_encoder,
            all_atoms=args.all_atoms,
            latent_dim=args.latent_dim if use_latents else 0,
            latent_vocab=args.latent_vocab if use_latents else 1,
            latent_droprate=args.latent_droprate if use_latents else 0.0,
            latent_cross_attention=args.latent_cross_attention,
            new_cross_attention=args.new_cross_attention,
            cross_attention_heads=args.cross_attention_heads,
            cross_attention_dim=args.cross_attention_dim,
            compute_dtype=args.compute_dtype, remat=args.remat,
        )
        enc_cfg = EncoderConfig(
            ns=args.encoder_ns, nv=args.encoder_nv,
            num_conv_layers=args.encoder_num_conv_layers,
            sh_lmax=args.sh_lmax,
            distance_embed_dim=args.distance_embed_dim,
            cross_distance_embed_dim=args.cross_distance_embed_dim,
            lig_max_radius=args.max_radius,
            cross_max_distance=args.encoder_cross_max_distance,
            use_second_order_repr=args.use_second_order_repr,
            batch_norm=not args.no_batch_norm,
            dropout=args.dropout,
            esm_embedding_dim=0 if args.encoder_no_esm else esm_dim,
            latent_dim=args.latent_dim, latent_vocab=args.latent_vocab,
            latent_no_batchnorm=args.latent_no_batchnorm,
            latent_dropout=args.latent_dropout,
            latent_hidden_dim=args.latent_hidden_dim,
            latent_virtual_nodes=args.latent_virtual_nodes,
            latent_nodes_residual=args.latent_nodes_residual,
            remat=args.remat,
        ) if use_latents else None
        ds_cfg = dict(
            data_dir=args.data_dir,
            cache_path=args.cache_path, limit_complexes=args.limit_complexes,
            num_workers=args.num_dataloader_workers,
            esm_embeddings_path=args.esm_embeddings_path,
            receptor_radius=args.receptor_radius,
            c_alpha_max_neighbors=args.c_alpha_max_neighbors,
            popsize=args.matching_popsize, maxiter=args.matching_maxiter,
            max_lig_size=args.max_lig_size, remove_hs=args.remove_hs,
            num_conformers=args.num_conformers, all_atoms=args.all_atoms,
            atom_radius=args.atom_radius,
            atom_max_neighbors=args.atom_max_neighbors,
        )
        ds_train = PDBBind(PDBBindConfig(split_path=args.split_train, **ds_cfg))
        ds_val = PDBBind(PDBBindConfig(split_path=args.split_val, **ds_cfg))
        # capacity strategy: ONE exact-fit worst-case bucket (no edge slot
        # can overflow, one compiled program -- fixture scale) or the size
        # ladder + exact catch-all (bounded padding at the reference's
        # 16k-complex scale, one program per bucket, runtime caps audited)
        bucket_mode = args.bucket_mode
        if bucket_mode == "auto":
            bucket_mode = ("ladder" if len(ds_train) + len(ds_val) > 256
                           else "exact")
        if bucket_mode == "ladder":
            from ..data.collate import ladder_for_datasets

            buckets = ladder_for_datasets([ds_train, ds_val],
                                          all_atoms=args.all_atoms)
        else:
            buckets = (caps_from_datasets([ds_train, ds_val]),)
        caps = buckets[-1]  # largest; persisted for downstream consumers
        from ..data.pdbbind import assign_buckets

        groups, _ = assign_buckets(ds_train, buckets)
        print(f"HAPPENING | bucket_mode={bucket_mode}: "
              + ", ".join(
                  f"b{bi}(lig<={buckets[bi].max_lig},"
                  f"rec<={buckets[bi].max_rec})={len(ix)}"
                  for bi, ix in groups.items() if ix)
              + f"; largest caps: {caps}")

        # all loaders STREAM: one collated batch in flight at a time (plus
        # prefetch depth) -- never the materialized split (the reference
        # equivalently streams through DataLoader workers,
        # datasets_utils/pdbbind.py:384-406)
        def train_stream(seed):
            # pad_remainder: a bucket's final partial group is padded with
            # graph_mask-ed repeats -- dropping it would PERMANENTLY exclude
            # every complex in a bucket with < batch_size members, and a
            # smaller last batch would break DP shard divisibility
            return bucketed_batches(
                ds_train, args.batch_size, np.random.RandomState(seed),
                buckets=buckets, esm_dim=score_cfg.esm_embedding_dim,
                pad_remainder=True, with_info=True,
            )

        def val_stream():
            # the val-LOSS epoch sees the full val split (reference
            # train.py:43-46 keys best-by-loss on all of it)
            return bucketed_batches(
                ds_val, args.batch_size, np.random.RandomState(0),
                buckets=buckets, esm_dim=score_cfg.esm_embedding_dim,
                shuffle=False, drop_remainder=False, with_info=True,
            )

        # only the real-inference epoch caps at num_inference_complexes
        # (train.py:48-53)
        n_keep = max(1, args.num_inference_complexes // args.batch_size)

        def inf_stream():
            import itertools

            return itertools.islice(val_stream(), n_keep)

        def traininf_stream():
            import itertools

            if not args.train_inference_freq:
                return iter(())
            return itertools.islice(
                bucketed_batches(
                    ds_train, args.batch_size, np.random.RandomState(0),
                    buckets=buckets, esm_dim=score_cfg.esm_embedding_dim,
                    shuffle=False, drop_remainder=False, with_info=True,
                ), n_keep)

    run_dir = f"{args.log_dir}/{args.run_name}"
    save_config(run_dir, score_model=score_cfg,
                **({"encoder": enc_cfg} if enc_cfg else {}),
                **({"caps": caps} if caps else {}))
    ckpt = CheckpointManager(run_dir)

    # one model PER BUCKET (params are capacity-independent -- capacities
    # only size the runtime edge arrays), sharing one TrainState
    _models: dict = {}

    def model_for(c):
        if c not in _models:
            _models[c] = build_model(
                score_cfg, enc_cfg, c,
                training_latent_temperature=args.training_latent_temperature)
        return _models[c]

    init_rngs = {
        "params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3),
    }
    example, example_info = next(iter(train_stream(0)))
    model = model_for(example_info["caps"])
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
    elif args.restart_dir:
        # warm start from ANOTHER run's last checkpoint (train.py:126-139):
        # params/batch_stats/EMA transfer, optimizer state starts fresh
        from .loading import merge_matching

        src = CheckpointManager(args.restart_dir)
        for t in ("last", "best", "best_ema"):
            if src.exists(t):
                raw = src.restore_raw(t)
                break
        else:
            raise SystemExit(f"--restart_dir: no checkpoint in {args.restart_dir}")
        if not args.non_strict_loading:
            mismatch = jax.tree_util.tree_structure(state.params) != \
                jax.tree_util.tree_structure(
                    jax.tree_util.tree_map(lambda x: 0, raw.get("params", {})))
            if mismatch:
                raise SystemExit(
                    "--restart_dir: parameter tree differs from this model; "
                    "pass --non_strict_loading to merge matching leaves only")
        state = state.replace(
            params=merge_matching(state.params, raw.get("params", {})),
            batch_stats=merge_matching(state.batch_stats,
                                       raw.get("batch_stats") or {}),
            ema=state.ema.replace(
                shadow=merge_matching(state.ema.shadow,
                                      (raw.get("ema") or {}).get("shadow", {}))),
        )
        print(f"warm-started from {args.restart_dir} ({t})")
        if args.restart_lr is not None:
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
        # hard error in ALL modes (synthetic included): an uneven shard
        # would silently train on a wrong per-device batch
        if args.batch_size % args.n_devices != 0:
            raise SystemExit("--n_devices must divide --batch_size "
                             f"({args.batch_size} % {args.n_devices} != 0)")
    axis = "data" if mesh is not None else None
    lw = dict(tr_weight=args.tr_weight, rot_weight=args.rot_weight,
              tor_weight=args.tor_weight, no_torsion=args.no_torsion)
    if mesh is not None:
        state = replicate(state, mesh)
    # per-bucket compiled programs, built lazily on a bucket's first batch
    # (eval already compiles per bucket, eval/evaluate.py); the single
    # TrainState flows through all of them
    _step_fns: dict = {}
    _val_fns: dict = {}

    def step_for(c):
        if c not in _step_fns:
            make = (make_wrapper_train_step if enc_cfg is not None
                    else make_train_step)
            raw = make(model_for(c), tx, sigma, args.sampling_alpha,
                       args.sampling_beta, axis_name=axis, **lw)
            # state NOT donated: the scoped EMA shadow aliases the live
            # encoder params by design (train/ema.py), which XLA rejects
            # as a double donation; at ~20M params double-buffering is free
            _step_fns[c] = (shard_train_step(raw, mesh) if mesh is not None
                            else jax.jit(raw))
        return _step_fns[c]

    def val_for(c):
        if c not in _val_fns:
            _val_fns[c] = jax.jit(make_val_step(
                model_for(c), sigma, wrapper=enc_cfg is not None, **lw))
        return _val_fns[c]

    # per-epoch edge-overflow audit (finite ladder runtime caps CAN truncate
    # high-sigma cross edges; the exact worst-case bucket cannot): one t=1
    # randomized-pose forward per bucket, overflow counters sown by
    # graphs/radius.py and surfaced in the epoch log (graphs/audit.py)
    _audit_fns: dict = {}

    def audit_for(c):
        if c not in _audit_fns:
            m = model_for(c)
            if enc_cfg is not None:
                ld = score_cfg.latent_dim

                def fwd(v, b):
                    return m.apply(
                        v, b, mutable=["intermediates"],
                        method=lambda mm, bb: mm.score_model(
                            bb,
                            latent=(jnp.zeros((bb.num_graphs,
                                               bb.lig_x.shape[1], ld)),
                                    jnp.zeros((bb.num_graphs,
                                               bb.rec_x.shape[1], ld))),
                            unconditional=jnp.ones((bb.num_graphs, 1)),
                            deterministic=True, use_running_average=True))
            else:
                def fwd(v, b):
                    return m.apply(v, b, deterministic=True,
                                   use_running_average=True,
                                   mutable=["intermediates"])

            def run(v, b, k):
                rb = randomize_position(k, b, args.no_torsion, False,
                                        sigma.tr_sigma_max)
                _, st = fwd(v, rb.set_time(1.0, 1.0, 1.0))
                return st["intermediates"]

            _audit_fns[c] = jax.jit(run)
        return _audit_fns[c]

    key = jax.random.PRNGKey(42)
    best_loss = np.inf
    best_inf = -np.inf if args.inference_earlystop_goal == "max" else np.inf
    scheduler = None
    if args.scheduler == "plateau":
        # mode follows the stepped metric: the running-best inference metric
        # (configurable goal) when periodic inference runs, else val loss
        scheduler = ReduceLROnPlateau(
            mode=(args.inference_earlystop_goal if args.val_inference_freq
                  else "min"),
            patience=args.scheduler_patience, min_lr=args.lr / 100,
        )
    from ..data.prefetch import prefetch

    n_epochs = 1 if args.synthetic else args.n_epochs
    for epoch in range(n_epochs):
        t0 = time.time()
        losses = []
        steps = args.steps if args.synthetic else None
        it = 0
        audit_batches: dict = {}  # last-seen batch per bucket, for the audit
        # train_multiplicity: extra passes over the set with fresh noise
        # draws per pass (reference parsing.py:94 / pdbbind multiplicity)
        rep = 0
        while True:
            stream = train_stream(epoch * 131 + rep)
            if not args.synthetic:
                # background host collation overlaps device compute
                stream = prefetch(stream, depth=args.prefetch_depth)
            try:
                for batch, info in stream:
                    c = info["caps"]
                    key, k = jax.random.split(key)
                    if mesh is not None:
                        batch = shard_batch(batch, mesh)
                    state, aux = step_for(c)(state, batch, k)
                    if len(buckets) > 1:
                        audit_batches[c] = batch
                    # keep the loss ON DEVICE: a float() here would force a
                    # host round-trip (~28 ms RTT on the tunneled platform)
                    # every optimizer step, serializing host and device
                    losses.append(aux["loss"])
                    it += 1
                    if steps and it >= steps:
                        break
            finally:
                getattr(stream, "close", lambda: None)()
            rep += 1
            # synthetic: cycle the fixed batches until --steps optimizer
            # steps have run; real data: train_multiplicity passes
            if steps:
                if it >= steps:
                    break
            elif rep >= max(1, args.train_multiplicity):
                break
        # one stacked transfer for the whole epoch's losses
        mean_loss = float(np.mean(jax.device_get(jnp.stack(losses))))
        print(f"epoch {epoch}: train_loss={mean_loss:.4f} ({time.time() - t0:.1f}s, {it} steps)")
        if wandb_run:
            wandb_run.log({"train_loss": mean_loss}, step=epoch)

        if audit_batches:
            # finite ladder caps may truncate edges at high sigma -- count
            # them LOUDLY every epoch (one worst-case forward per bucket)
            from ..graphs.audit import _collect_overflow

            for c, ab in sorted(audit_batches.items(),
                                key=lambda kv: kv[0].max_rec):
                key, k = jax.random.split(key)
                inter = audit_for(c)(state.variables(), ab, k)
                ov = _collect_overflow(jax.device_get(inter))
                tag = f"bucket(lig<={c.max_lig},rec<={c.max_rec})"
                if any(ov.values()):
                    print(f"| WARNING: epoch {epoch} edge-overflow audit "
                          f"{tag}: {ov} true edges dropped at t=1 caps")
                else:
                    print(f"epoch {epoch}: edge-overflow audit {tag}: 0")

        # validation loss epoch (reference test_epoch every epoch); best
        # checkpoints key off VAL loss (train.py:66-77), not train loss
        from ..utils.meters import AverageMeter, sigma_interval_index

        intervals = 10 if args.test_sigma_intervals else 1
        meter = AverageMeter(
            ["loss", "tr_loss", "rot_loss", "tor_loss"], intervals=intervals)
        vloss_sum = vloss_n = 0.0
        # use_ema: validation + inference on the EMA weights (reference
        # train.py:41-42 copies EMA into the model before both epochs)
        eval_params = state.ema.shadow if args.use_ema else None
        for _ in range(max(1, args.val_multiplicity)):
            vstream = val_stream() if args.synthetic else prefetch(
                val_stream(), depth=args.prefetch_depth)
            try:
                for vb, vinfo in vstream:
                    key, k = jax.random.split(key)
                    aux, tvals, gmask = val_for(vinfo["caps"])(
                        state.variables(), vb, k, ema_params=eval_params)
                    gm = np.asarray(gmask)
                    tvals = np.asarray(tvals)[gm]
                    per = {k2: np.asarray(v)[gm] for k2, v in aux.items()}
                    vloss_sum += float(per["loss"].sum())
                    vloss_n += len(per["loss"])
                    if intervals > 1:
                        idx = sigma_interval_index(tvals, intervals)
                        meter.add([per["loss"], per["tr_loss"],
                                   per["rot_loss"], per["tor_loss"]],
                                  interval_idx=[idx] * 4)
            finally:
                if not args.synthetic:
                    vstream.close()
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

        inf_params = state.ema.shadow if args.use_ema else state.params
        if args.val_inference_freq and (epoch + 1) % args.val_inference_freq == 0 or args.synthetic:
            key, k = jax.random.split(key)
            metrics = inference_epoch(
                model_for,
                {"params": inf_params, "batch_stats": state.batch_stats},
                inf_stream(),
                sigma, k, steps=args.inference_steps,
                is_wrapper=enc_cfg is not None,
                latent_temperature=args.sampling_latent_temperature,
            )
            print(f"epoch {epoch}: {metrics}")
            if wandb_run:
                wandb_run.log(metrics, step=epoch)
            cur = metrics[args.inference_earlystop_metric]
            better = (cur >= best_inf if args.inference_earlystop_goal == "max"
                      else cur <= best_inf)
            if better:
                best_inf = cur
                ckpt.save("best_inference", state)
                ckpt.save("best_ema_inference", state.replace(params=state.ema.shadow))

        if args.train_inference_freq and (epoch + 1) % args.train_inference_freq == 0:
            key, k = jax.random.split(key)
            tmetrics = inference_epoch(
                model_for,
                {"params": inf_params, "batch_stats": state.batch_stats},
                traininf_stream(),
                sigma, k, steps=args.inference_steps,
                is_wrapper=enc_cfg is not None,
                latent_temperature=args.sampling_latent_temperature,
            )
            tmetrics = {k2.replace("valinf_", "traininf_"): v
                        for k2, v in tmetrics.items()}
            print(f"epoch {epoch}: {tmetrics}")
            if wandb_run:
                wandb_run.log(tmetrics, step=epoch)

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
