"""Confidence-model training: two-phase, as in the reference.

Phase 1 (dataset generation, confidence/dataset.py:181-242): run the trained
score model's full reverse diffusion for ``samples_per_complex`` poses per
complex and cache positions + RMSDs vs the crystal pose (combinable across
multiple cache ids).

Phase 2 (confidence/confidence_train.py): train the all-atom model in
confidence mode.  Label modes: BCE on rmsd < 2A (default), multi-cutoff CE
(``rmsd_classification_cutoff`` list), or direct RMSD regression; optional
balanced positive/negative sampling.  A held-out val split is scored every
epoch (loss/accuracy/held-out ROC-AUC); ``ckpt_best`` tracks the best
``--main_metric`` and a plateau scheduler steps on it
(confidence_train.py:149-200,226-227).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GraphCaps, ScoreModelConfig
from ..data.synthetic import make_complex_batch
from ..geom.diffusion import SigmaSchedule
from ..models.all_atom_score_model import AllAtomScoreModel
from ..models.score_model import TensorProductScoreModel
from ..sampling import SamplerConfig, randomize_position, sampling
from .checkpoints import CheckpointManager, save_config
from .steps import TrainState


def generate_confidence_dataset(
    model, variables, batches, scfg, sigma, key, cache_dir=None, cache_id=0,
    latent_fn=None, names=None,
):
    """Phase 1: sampled poses + RMSD labels per complex batch.

    Each input batch is N pose copies of one complex; returns a list of
    (positions (N, NL, 3), rmsds (N,)).  Cached per (complex name, cache_id)
    so multiple runs combine (confidence/dataset.py:100-124).  ``latent_fn``
    supplies oracle-encoder latents for DisCo score models.
    """
    @jax.jit
    def run(b, k):
        k0, k1, k2 = jax.random.split(k, 3)
        latent = latent_fn(b, k2) if latent_fn is not None else None
        rb = randomize_position(k0, b, scfg.no_torsion, False, sigma.tr_sigma_max)
        return sampling(model, variables, rb, k1, scfg, sigma, latent=latent)[0].lig_pos

    out = []
    for ci, batch in enumerate(batches):
        path = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            name = names[ci] if names is not None else f"complex{ci}"
            path = os.path.join(cache_dir, f"{name}_cache{cache_id}.npz")
            if os.path.exists(path):
                with np.load(path) as z:
                    out.append((z["pos"], z["rmsd"]))
                continue
        key, k = jax.random.split(key)
        pos = np.asarray(run(batch, k))
        mask = np.asarray(batch.lig_mask[0])
        true = np.asarray(batch.extras["orig_pos"])[:, mask]
        rmsd = np.sqrt(((pos[:, mask] - true) ** 2).sum(-1).mean(-1))
        if path:
            np.savez_compressed(path, pos=pos, rmsd=rmsd)
        out.append((pos, rmsd))
    return out


def _fit_pos(pos: np.ndarray, NL: int) -> np.ndarray:
    """Re-pad cached pose arrays to a batch's ligand capacity (caches written
    by another run -- cache_ids_to_combine -- may have used another bucket;
    slots beyond the true atom count are padding either way)."""
    if pos.shape[1] == NL:
        return pos
    if pos.shape[1] > NL:
        return pos[:, :NL]
    out = np.zeros((pos.shape[0], NL, 3), pos.dtype)
    out[:, : pos.shape[1]] = pos
    return out


def ensure_pose_caches(
    runtime_for, pick_caps, dset, names, samples_per_complex, esm_dim,
    scfg, sigma, base_key, cache_dir, cache_ids,
) -> int:
    """Phase 1, STREAMING: guarantee every (complex, cache id) pose cache
    file exists, sampling only the missing ones -- one collated batch in
    flight at a time, never the materialized split (the eager per-complex
    batch list was host-RAM infeasible at the reference's 16k scale).
    Keys are deterministic per (cache id, complex index), so interrupted
    runs resume with identical poses.  Returns the number of caches written.
    """
    from ..data.collate import collate, replicate_record

    os.makedirs(cache_dir, exist_ok=True)
    run_fns: dict = {}
    n_new = 0
    for ci, n in enumerate(names):
        missing = [
            (j, cid) for j, cid in enumerate(cache_ids)
            if not os.path.exists(os.path.join(cache_dir, f"{n}_cache{cid}.npz"))
        ]
        if not missing:
            continue
        rec = dset.get(n)
        c = pick_caps(rec)
        batch = collate(replicate_record(rec, samples_per_complex), c,
                        esm_dim=esm_dim)
        score_view, score_vars, latent_fn = runtime_for(c)
        if c not in run_fns:
            # finite ladder caps CAN truncate high-sigma cross edges during
            # the phase-1 reverse trajectories, silently corrupting the RMSD
            # labels -- audit the t=1 worst case once per bucket (the
            # ladder_for_datasets contract; same pattern as evaluate.py)
            from ..graphs.audit import audit_worst_case

            ov = audit_worst_case(
                score_view, score_vars, batch,
                jax.random.fold_in(base_key, 7919 + len(run_fns)),
                tr_sigma_max=sigma.tr_sigma_max, latent_fn=latent_fn)
            tag = f"bucket(lig<={c.max_lig},rec<={c.max_rec})"
            if any(v > 0 for v in ov.values()):
                print(f"| WARNING: pose-cache edge-overflow audit {tag}: "
                      f"{ov} true edges dropped at t=1 caps -- RMSD labels "
                      f"may be affected")
            else:
                print(f"HAPPENING | pose-cache edge-overflow audit {tag}: 0")

            @jax.jit
            def run(b, k, _sv=score_view, _v=score_vars, _lf=latent_fn):
                k0, k1, k2 = jax.random.split(k, 3)
                latent = _lf(b, k2) if _lf is not None else None
                rb = randomize_position(k0, b, scfg.no_torsion, False,
                                        sigma.tr_sigma_max)
                return sampling(_sv, _v, rb, k1, scfg, sigma,
                                latent=latent)[0].lig_pos

            run_fns[c] = run
        mask = np.asarray(batch.lig_mask[0])
        true = np.asarray(batch.extras["orig_pos"])[:, mask]
        for j, cid in missing:
            k = jax.random.fold_in(jax.random.fold_in(base_key, j), ci)
            pos = np.asarray(run_fns[c](batch, k))
            rmsd = np.sqrt(((pos[:, mask] - true) ** 2).sum(-1).mean(-1))
            path = os.path.join(cache_dir, f"{n}_cache{cid}.npz")
            # tmp must end in .npz or savez_compressed appends it and the
            # os.replace below misses the file (pdbbind.py:99 pattern)
            tmp = f"{path}.tmp{os.getpid()}.npz"
            np.savez_compressed(tmp, pos=pos, rmsd=rmsd)
            os.replace(tmp, path)
            n_new += 1
    return n_new


def load_pose_cache(cache_dir: str, name: str, cache_ids) -> tuple:
    """Concatenated (pos, rmsd) for one complex across cache ids
    (confidence/dataset.py:100-124)."""
    pos_l, rmsd_l = [], []
    for cid in cache_ids:
        with np.load(os.path.join(cache_dir, f"{name}_cache{cid}.npz")) as z:
            pos_l.append(z["pos"])
            rmsd_l.append(z["rmsd"])
    NL = max(p.shape[1] for p in pos_l)
    return (np.concatenate([_fit_pos(p, NL) for p in pos_l]),
            np.concatenate(rmsd_l))


def confidence_labels(rmsds: np.ndarray, cutoffs) -> np.ndarray:
    """BCE label (rmsd < 2) or multi-cutoff class index."""
    if cutoffs is None:
        return (rmsds < 2.0).astype(np.float32)
    return np.sum(rmsds[..., None] > np.asarray(cutoffs)[None], axis=-1).astype(np.int32)


def _confidence_loss_acc(out, labels, gm, mode):
    if mode == "bce":
        per = optax.sigmoid_binary_cross_entropy(out, labels)
        acc = ((out > 0) == (labels > 0.5)).astype(jnp.float32)
    elif mode == "classification":
        per = optax.softmax_cross_entropy_with_integer_labels(out, labels)
        acc = (jnp.argmax(out, -1) == labels).astype(jnp.float32)
    else:  # rmsd regression
        per = (out - labels) ** 2
        acc = (jnp.abs(out - labels) < 1.0).astype(jnp.float32)
    loss = jnp.sum(per * gm) / (jnp.sum(gm) + 1e-12)
    accuracy = jnp.sum(acc * gm) / (jnp.sum(gm) + 1e-12)
    return loss, accuracy


def make_confidence_train_step(model, tx, mode="bce", axis_name=None):
    def loss_fn(params, batch_stats, batch, labels, drop_key):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            deterministic=False, use_running_average=False,
            mutable=["batch_stats"], rngs={"dropout": drop_key},
        )
        gm = batch.graph_mask.astype(jnp.float32)
        loss, accuracy = _confidence_loss_acc(out, labels, gm, mode)
        return loss, (accuracy, mut["batch_stats"])

    def step(state: TrainState, batch, labels, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, labels, key
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema=state.ema.update(new_params), step=state.step + 1,
        ), {"loss": loss, "accuracy": acc}

    return step


def make_confidence_eval_step(model, mode="bce"):
    """Held-out loss/accuracy + raw scores (no dropout, running stats)."""

    def step(variables, batch, labels):
        out = model.apply(variables, batch,
                          deterministic=True, use_running_average=True)
        gm = batch.graph_mask.astype(jnp.float32)
        loss, acc = _confidence_loss_acc(out, labels, gm, mode)
        return {"loss": loss, "accuracy": acc}, out

    return step


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Rank-based AUC (no sklearn dependency)."""
    pos = scores[labels > 0.5]
    neg = scores[labels <= 0.5]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    ranks = np.argsort(np.argsort(np.concatenate([pos, neg])))
    return float((ranks[: len(pos)].sum() - len(pos) * (len(pos) - 1) / 2) / (len(pos) * len(neg)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_name", default="confidence_run")
    p.add_argument("--log_dir", default="workdir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--original_model_dir", default=None, help="trained score run dir")
    p.add_argument("--ckpt", default="best_ema_inference")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_train", default="data/splits/timesplit_no_lig_overlap_train")
    p.add_argument("--split_val", default="data/splits/timesplit_no_lig_overlap_val")
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--bucket_mode", default="auto",
                   choices=["auto", "exact", "ladder"],
                   help="exact: one worst-case bucket (fixture scale); "
                        "ladder: DEFAULT_BUCKETS + exact catch-all (bounded "
                        "padding at 16k-complex scale); auto picks ladder "
                        "for >256 complexes")
    p.add_argument("--prefetch_depth", type=int, default=2,
                   help="batches collated ahead by the background prefetch "
                        "thread (DataLoader num_workers analogue)")
    p.add_argument("--samples_per_complex", type=int, default=4)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint conv edge blocks (several-fold "
                        "smaller training HBM footprint, ~1 extra forward "
                        "of recompute)")
    p.add_argument("--inference_steps", type=int, default=4)
    p.add_argument("--epochs", "--n_epochs", dest="epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--w_decay", type=float, default=0.0)
    p.add_argument("--multiplicity", type=int, default=1,
                   help="training passes per epoch with fresh pose draws "
                        "(reference confidence_train.py:37)")
    p.add_argument("--transfer_weights", action="store_true",
                   help="build the confidence trunk with the ORIGINAL score "
                        "run's hyperparameters and warm-start every matching "
                        "parameter from its checkpoint "
                        "(reference confidence_train.py:285-294)")
    p.add_argument("--restart_dir", default=None,
                   help="warm-start params from another confidence run dir")
    p.add_argument("--cache_ids_to_combine", nargs="+", default=None,
                   help="pose-cache ids whose poses are concatenated per "
                        "complex (confidence/dataset.py:100-124); missing "
                        "ids are generated")
    p.add_argument("--model_save_frequency", type=int, default=0,
                   help="additionally keep an epoch-tagged checkpoint every "
                        "N epochs (0 disables)")
    p.add_argument("--best_model_save_frequency", type=int, default=0,
                   help="additionally snapshot the current best every N "
                        "epochs (0 disables)")
    # val tracking + best-model selection (confidence_train.py:52-53,149-200)
    p.add_argument("--main_metric", default="accuracy",
                   choices=["loss", "accuracy", "auc"])
    p.add_argument("--main_metric_goal", default="max", choices=["min", "max"])
    p.add_argument("--scheduler", default="plateau", choices=["plateau", "none"])
    p.add_argument("--scheduler_patience", type=int, default=20)
    p.add_argument("--n_devices", type=int, default=1,
                   help=">1 shards each train batch over a data mesh "
                        "(must divide samples_per_complex)")
    p.add_argument("--rmsd_classification_cutoff", type=float, nargs="*", default=None)
    p.add_argument("--rmsd_prediction", action="store_true")
    p.add_argument("--balanced", "--balance", dest="balanced", action="store_true")
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--cache_creation_id", type=int, default=0)
    # confidence-model scale (defaults = shipped all-atom confidence model)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--project", default="disco_diffdock_tpu")
    # ---- confidence-model hyperparameters (reference parsing names;
    # defaults = the shipped paper_confidence_model yml)
    p.add_argument("--ns", type=int, default=24)
    p.add_argument("--nv", type=int, default=6)
    p.add_argument("--num_conv_layers", type=int, default=5)
    p.add_argument("--sh_lmax", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--confidence_dropout", type=float, default=0.0)
    p.add_argument("--confidence_no_batchnorm", action="store_true")
    p.add_argument("--no_batch_norm", action="store_true")
    p.add_argument("--use_second_order_repr", action="store_true")
    p.add_argument("--sigma_embed_dim", type=int, default=32)
    p.add_argument("--distance_embed_dim", type=int, default=32)
    p.add_argument("--cross_distance_embed_dim", type=int, default=32)
    p.add_argument("--max_radius", type=float, default=5.0)
    p.add_argument("--cross_max_distance", type=float, default=80.0)
    p.add_argument("--dynamic_max_cross", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--scale_by_sigma", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--embedding_type", default="sinusoidal")
    p.add_argument("--embedding_scale", type=float, default=1000.0)
    p.add_argument("--use_old_atom_encoder", action="store_true")
    # ---- featurization (reference parsing names; shipped-yml defaults)
    p.add_argument("--esm_embeddings_path", default=None)
    p.add_argument("--num_dataloader_workers", "--num_workers",
                   dest="num_dataloader_workers", type=int, default=1)
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
    p.add_argument("--chain_cutoff", type=float, default=None,
                   help="drop receptor chains with no CA within this "
                        "distance of the ligand (reference default 10)")
    from .config_overlay import add_config_arg, apply_config_overlay

    add_config_arg(p)
    args = apply_config_overlay(p.parse_args(argv))

    if args.main_metric == "auc" and (args.rmsd_prediction
                                      or args.rmsd_classification_cutoff):
        raise SystemExit(
            "--main_metric auc is only defined for the binary (bce) label "
            "mode; with --rmsd_prediction/--rmsd_classification_cutoff the "
            "AUC would be NaN every epoch, freezing the best checkpoint at "
            "epoch 0. Use --main_metric loss or accuracy."
        )

    sigma = SigmaSchedule()
    esm_dim = 16
    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=24, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=24 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
            max_atoms=96, atom_edge_cap=96 * 8, la_cap=128,
        )
        score_cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=2, esm_embedding_dim=16, dropout=0.0,
            latent_dim=0, latent_droprate=0.0,
        )
        score_model = TensorProductScoreModel(cfg=score_cfg, caps=caps)
        batches = [
            make_complex_batch(
                seed=s, batch=args.samples_per_complex, n_lig=10, n_res=16, caps=caps,
                esm_dim=16, c_alpha_max_neighbors=8, same_complex=True, all_atoms=True,
                atoms_per_res=4,
            )
            for s in range(2)
        ]
        score_vars = jax.jit(score_model.init)(jax.random.PRNGKey(0), batches[0])
        # held-out complexes (different seeds) for val tracking
        val_batches = [
            make_complex_batch(
                seed=100 + s, batch=args.samples_per_complex, n_lig=10, n_res=16,
                caps=caps, esm_dim=16, c_alpha_max_neighbors=8, same_complex=True,
                all_atoms=True, atoms_per_res=4,
            )
            for s in range(2)
        ]
        latent_fn = None
        names = val_names = None
        conf_ns, conf_nv, conf_layers = 8, 2, 2
    else:
        assert args.original_model_dir and args.data_dir, (
            "real-data confidence training needs --original_model_dir and --data_dir"
        )
        from ..data.collate import caps_from_datasets, collate, replicate_record
        from ..data.pdbbind import PDBBind, PDBBindConfig
        from .loading import build_score_runtime

        ds_cfg = dict(
            data_dir=args.data_dir,
            cache_path=args.cache_path, limit_complexes=args.limit_complexes,
            num_workers=args.num_dataloader_workers,
            esm_embeddings_path=args.esm_embeddings_path,
            receptor_radius=args.receptor_radius,
            c_alpha_max_neighbors=args.c_alpha_max_neighbors,
            popsize=args.matching_popsize, maxiter=args.matching_maxiter,
            max_lig_size=args.max_lig_size, remove_hs=args.remove_hs,
            num_conformers=args.num_conformers,
            chain_cutoff=args.chain_cutoff, all_atoms=True,
            atom_radius=args.atom_radius,
            atom_max_neighbors=args.atom_max_neighbors,
        )
        ds = PDBBind(PDBBindConfig(split_path=args.split_train, **ds_cfg))
        ds_val = PDBBind(PDBBindConfig(split_path=args.split_val, **ds_cfg))
        bucket_mode = args.bucket_mode
        if bucket_mode == "auto":
            bucket_mode = "ladder" if len(ds) + len(ds_val) > 256 else "exact"
        if bucket_mode == "ladder":
            from ..data.collate import ladder_for_datasets

            buckets = ladder_for_datasets([ds, ds_val], all_atoms=True)
        else:
            buckets = (caps_from_datasets([ds, ds_val], all_atoms=True),)
        caps = buckets[-1]
        print(f"HAPPENING | {len(ds)} train / {len(ds_val)} val complexes, "
              f"bucket_mode={bucket_mode} ({len(buckets)} buckets), "
              f"largest caps: {caps}")
        # pull the score run's feature dims so rec_x widths line up
        from .loading import load_run_configs

        trained_score_cfg, _, _ = load_run_configs(args.original_model_dir)
        esm_dim = trained_score_cfg.esm_embedding_dim
        names = list(ds.names)
        val_names = list(ds_val.names)

        from ..data.collate import fits

        def pick_caps(rec):
            for b in buckets:
                if fits(rec, b):
                    return b
            return caps  # the exact catch-all always fits

        # one score runtime per bucket for phase 1 (variables/cfg identical
        # across buckets; only the runtime edge capacities differ)
        _runtimes: dict = {}

        def runtime_for(c):
            if c not in _runtimes:
                sv, svars, lf, _, _ = build_score_runtime(
                    args.original_model_dir, c, tag=args.ckpt)
                _runtimes[c] = (sv, svars, lf)
            return _runtimes[c]

        score_model, score_vars, latent_fn, score_cfg, _ = build_score_runtime(
            args.original_model_dir, caps, tag=args.ckpt,
        )
        # seed the per-bucket cache so a complex landing in the catch-all
        # bucket doesn't restore + build the identical runtime a second time
        _runtimes[caps] = (score_model, score_vars, latent_fn)
        if args.transfer_weights:
            # confidence trunk takes the ORIGINAL score run's architecture so
            # its weights transfer key-for-key (confidence_train.py:285-294)
            conf_ns, conf_nv, conf_layers = (
                trained_score_cfg.ns, trained_score_cfg.nv,
                trained_score_cfg.num_conv_layers)
            args.sh_lmax = trained_score_cfg.sh_lmax
        else:
            conf_ns, conf_nv, conf_layers = args.ns, args.nv, args.num_conv_layers

    # ---- phase 1
    scfg = SamplerConfig(inference_steps=args.inference_steps)
    cache_dir = args.cache_dir
    if cache_dir is None and not args.synthetic:
        cache_dir = os.path.join(args.log_dir, args.run_name, "pose_cache")
    cache_ids = ([str(i) for i in args.cache_ids_to_combine]
                 if args.cache_ids_to_combine else [str(args.cache_creation_id)])

    if args.synthetic:
        def gen(bs, base_key, nm):
            # one dataset per cache id, poses concatenated per complex
            # (confidence/dataset.py:100-124)
            per_id = [
                generate_confidence_dataset(
                    score_model, score_vars, bs, scfg, sigma,
                    jax.random.fold_in(base_key, j),
                    cache_dir=cache_dir, cache_id=cid, latent_fn=latent_fn,
                    names=nm,
                )
                for j, cid in enumerate(cache_ids)
            ]
            return [
                (np.concatenate([d[ci][0] for d in per_id]),
                 np.concatenate([d[ci][1] for d in per_id]))
                for ci in range(len(bs))
            ]

        data = gen(batches, jax.random.PRNGKey(1), names)
        # the reference generates a ConfidenceDataset for the val loader too
        # (confidence_train.py:297-307): held-out per-epoch val poses
        val_data = gen(val_batches, jax.random.PRNGKey(7),
                       [f"valcomplex{i}" for i in range(len(val_batches))])
        print(f"phase 1 done: {len(data)} train + {len(val_data)} val "
              f"complexes x {args.samples_per_complex} poses; rmsd range "
              f"[{min(d[1].min() for d in data):.2f}, "
              f"{max(d[1].max() for d in data):.2f}]")

        def train_items(seed):
            return iter([(b, d[0], d[1], caps) for b, d in zip(batches, data)])

        def val_items():
            return iter([(b, d[0], d[1], caps)
                         for b, d in zip(val_batches, val_data)])

        example_batch, example_caps = batches[0], caps
    else:
        from ..data.collate import collate, replicate_record
        from ..data.prefetch import prefetch

        # STREAMING phase 1: only missing (complex, cache id) pose sets are
        # sampled; one collated batch in flight, resumable
        n_new = ensure_pose_caches(
            runtime_for, pick_caps, ds, names, args.samples_per_complex,
            esm_dim, scfg, sigma, jax.random.PRNGKey(1), cache_dir, cache_ids)
        n_new += ensure_pose_caches(
            runtime_for, pick_caps, ds_val, val_names,
            args.samples_per_complex, esm_dim, scfg, sigma,
            jax.random.PRNGKey(7), cache_dir, cache_ids)
        all_rmsd = np.concatenate(
            [load_pose_cache(cache_dir, n, cache_ids)[1] for n in names])
        print(f"phase 1 done: {n_new} new pose caches; {len(names)} train + "
              f"{len(val_names)} val complexes x "
              f"{args.samples_per_complex * len(cache_ids)} poses; train "
              f"rmsd range [{all_rmsd.min():.2f}, {all_rmsd.max():.2f}]")

        def _items(dset, nms, seed, shuffle):
            order = list(nms)
            if shuffle:
                np.random.RandomState(seed).shuffle(order)

            def g():
                for n in order:
                    rec = dset.get(n)
                    c = pick_caps(rec)
                    batch = collate(replicate_record(rec, args.samples_per_complex),
                                    c, esm_dim=esm_dim)
                    pos, rmsd = load_pose_cache(cache_dir, n, cache_ids)
                    yield batch, pos, rmsd, c

            return prefetch(g(), depth=args.prefetch_depth)

        def train_items(seed):
            return _items(ds, names, seed, True)

        def val_items():
            return _items(ds_val, val_names, 0, False)

        rec0 = ds.get(names[0])
        example_caps = pick_caps(rec0)
        example_batch = collate(
            replicate_record(rec0, args.samples_per_complex), example_caps,
            esm_dim=esm_dim)

    # ---- phase 2
    mode = "rmsd" if args.rmsd_prediction else (
        "classification" if args.rmsd_classification_cutoff else "bce"
    )
    n_out = (len(args.rmsd_classification_cutoff) + 1) if args.rmsd_classification_cutoff else 1
    conf_cfg = ScoreModelConfig(
        ns=conf_ns, nv=conf_nv, num_conv_layers=conf_layers,
        sh_lmax=args.sh_lmax, sigma_embed_dim=args.sigma_embed_dim,
        distance_embed_dim=args.distance_embed_dim,
        cross_distance_embed_dim=args.cross_distance_embed_dim,
        lig_max_radius=args.max_radius,
        cross_max_distance=args.cross_max_distance,
        dynamic_max_cross=args.dynamic_max_cross,
        use_second_order_repr=args.use_second_order_repr,
        batch_norm=not args.no_batch_norm,
        scale_by_sigma=args.scale_by_sigma,
        embedding_type=args.embedding_type,
        embedding_scale=args.embedding_scale,
        use_old_atom_encoder=args.use_old_atom_encoder,
        esm_embedding_dim=esm_dim,
        dropout=args.dropout, confidence_mode=True,
        confidence_dropout=args.confidence_dropout,
        confidence_no_batchnorm=args.confidence_no_batchnorm,
        num_confidence_outputs=n_out,
        all_atoms=True, latent_dim=0, latent_droprate=0.0,
        remat=args.remat,
    )
    from .plateau import ReduceLROnPlateau, make_adam

    _models: dict = {}

    def model_for(c):
        if c not in _models:
            _models[c] = AllAtomScoreModel(cfg=conf_cfg, caps=c)
        return _models[c]

    model = model_for(example_caps)
    b0 = example_batch.set_time(0.0, 0.0, 0.0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(2), b0)
    if args.transfer_weights and not args.synthetic:
        from .loading import merge_matching

        variables = dict(variables)
        variables["params"] = merge_matching(variables["params"],
                                             score_vars["params"])
        variables["batch_stats"] = merge_matching(
            variables.get("batch_stats", {}),
            score_vars.get("batch_stats") or {})
        print("HAPPENING | transferred matching trunk weights from the score run")
    tx = make_adam(args.lr, args.w_decay)
    state = TrainState.create(variables, tx)
    if args.restart_dir:
        from .loading import merge_matching, restore_variables

        raw = restore_variables(args.restart_dir, "last", use_ema=False)
        state = state.replace(
            params=merge_matching(state.params, raw["params"]),
            batch_stats=merge_matching(state.batch_stats,
                                       raw.get("batch_stats") or {}),
        )
        print(f"warm-started from {args.restart_dir}")
    mesh = None
    if args.n_devices > 1:
        from ..parallel import make_mesh, replicate, shard_batch, shard_step

        mesh = make_mesh(args.n_devices)
        if args.samples_per_complex % args.n_devices != 0:
            raise SystemExit("--n_devices must divide --samples_per_complex")
        state = replicate(state, mesh)
    # per-bucket compiled steps, built lazily on first use
    _step_fns: dict = {}
    _eval_fns: dict = {}

    def step_for(c):
        if c not in _step_fns:
            raw = make_confidence_train_step(
                model_for(c), tx, mode,
                axis_name="data" if mesh is not None else None)
            _step_fns[c] = (shard_step(raw, mesh, n_sharded_args=2)
                            if mesh is not None else jax.jit(raw))
        return _step_fns[c]

    def eval_for(c):
        if c not in _eval_fns:
            _eval_fns[c] = jax.jit(make_confidence_eval_step(model_for(c), mode))
        return _eval_fns[c]

    run_dir = f"{args.log_dir}/{args.run_name}"
    save_config(run_dir, confidence_model=conf_cfg, caps=caps)
    ckpt = CheckpointManager(run_dir)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(3)
    from ..utils.wandb_log import maybe_wandb

    wandb_run = maybe_wandb(args.wandb, args.project, args.run_name, vars(args))
    best_val = np.inf if args.main_metric_goal == "min" else -np.inf
    best_epoch = -1
    scheduler = (ReduceLROnPlateau(mode=args.main_metric_goal,
                                   patience=args.scheduler_patience,
                                   min_lr=args.lr / 100)
                 if args.scheduler == "plateau" else None)
    for epoch in range(args.epochs):
        metrics = []
        for rep in range(max(1, args.multiplicity)):
            items = train_items(epoch * 131 + rep)
            try:
                for batch, pos, rmsd, c in items:
                    # one cached pose per complex copy (dataset.py:160-166),
                    # with optional balanced positive/negative resampling
                    idx = rng.randint(0, len(rmsd), batch.num_graphs)
                    if args.balanced and (rmsd < 2).any() and (rmsd >= 2).any():
                        want_pos = rng.rand(batch.num_graphs) < 0.5
                        pos_idx, neg_idx = np.where(rmsd < 2)[0], np.where(rmsd >= 2)[0]
                        idx = np.where(want_pos,
                                       rng.choice(pos_idx, batch.num_graphs),
                                       rng.choice(neg_idx, batch.num_graphs))
                    lab = confidence_labels(rmsd[idx],
                                            args.rmsd_classification_cutoff)
                    if args.rmsd_prediction:
                        lab = rmsd[idx].astype(np.float32)
                    p = _fit_pos(pos, batch.lig_pos.shape[1])[idx]
                    b = batch.replace(lig_pos=jnp.asarray(p)).set_time(0.0, 0.0, 0.0)
                    key, k = jax.random.split(key)
                    lab = jnp.asarray(lab)
                    if mesh is not None:
                        b, lab = shard_batch(b, mesh), shard_batch(lab, mesh)
                    state, m = step_for(c)(state, b, lab, k)
                    # device dicts accumulate async; ONE stacked fetch per
                    # epoch (a float() per step would sync every step)
                    metrics.append(m)
            finally:
                getattr(items, "close", lambda: None)()
        metrics = jax.device_get(
            jax.tree.map(lambda *xs: jnp.stack(xs), *metrics))
        loss = float(np.mean(metrics["loss"]))
        acc = float(np.mean(metrics["accuracy"]))
        print(f"epoch {epoch}: train loss={loss:.4f} acc={acc:.3f}")

        # held-out val pass (confidence_train.py:149-200): fixed pose draw
        # per epoch so the tracked metric is comparable across epochs
        val_rng = np.random.RandomState(1234)
        vmetrics, vscores, vlabels = [], [], []
        variables_now = {"params": state.params, "batch_stats": state.batch_stats}
        vitems = val_items()
        try:
            for batch, pos, rmsd, c in vitems:
                idx = val_rng.randint(0, len(rmsd), batch.num_graphs)
                lab = confidence_labels(rmsd[idx], args.rmsd_classification_cutoff)
                if args.rmsd_prediction:
                    lab = rmsd[idx].astype(np.float32)
                p = _fit_pos(pos, batch.lig_pos.shape[1])[idx]
                b = batch.replace(lig_pos=jnp.asarray(p)).set_time(0.0, 0.0, 0.0)
                m, out = eval_for(c)(variables_now, b, jnp.asarray(lab))
                vmetrics.append({k2: float(v) for k2, v in m.items()})
                if mode == "bce":
                    vlabels.append((rmsd[idx] < 2).astype(np.float32))
                    vscores.append(np.asarray(out).reshape(-1))
        finally:
            getattr(vitems, "close", lambda: None)()
        val = {
            "loss": float(np.mean([m["loss"] for m in vmetrics])),
            "accuracy": float(np.mean([m["accuracy"] for m in vmetrics])),
            "auc": (roc_auc(np.concatenate(vlabels), np.concatenate(vscores))
                    if vscores else float("nan")),
        }
        print(f"epoch {epoch}: val loss={val['loss']:.4f} "
              f"acc={val['accuracy']:.3f} auc={val['auc']:.3f}")
        if wandb_run:
            wandb_run.log({"loss": loss, "accuracy": acc,
                           **{f"val_{k2}": v for k2, v in val.items()}},
                          step=epoch)
        ckpt.save("last", state)
        if args.model_save_frequency and (epoch + 1) % args.model_save_frequency == 0:
            ckpt.save(f"epoch{epoch + 1}", state)
        tracked = val[args.main_metric]
        improved = (tracked <= best_val if args.main_metric_goal == "min"
                    else tracked >= best_val)
        if np.isfinite(tracked) and improved or best_epoch < 0:
            best_val, best_epoch = tracked, epoch
            ckpt.save("best", state)
        if args.best_model_save_frequency and \
                (epoch + 1) % args.best_model_save_frequency == 0:
            # a COPY of the best-so-far checkpoint, not the current state
            # (reference confidence_train.py:238-239 shutil.copyfile);
            # on-disk so no live state is retained across epochs
            ckpt.copy("best", f"best_epoch{epoch + 1}")
        if scheduler is not None and np.isfinite(tracked):
            new_opt = scheduler.step(tracked, state.opt_state)
            if new_opt is not state.opt_state:
                state = state.replace(opt_state=new_opt)
    print(f"confidence training done (best val {args.main_metric}="
          f"{best_val:.4f} at epoch {best_epoch})")
    return state


if __name__ == "__main__":
    main()
