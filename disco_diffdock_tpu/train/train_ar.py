"""Autoregressive latent-prior training: two-phase, as in the reference.

Phase 1 (label generation, autoregressive/dataset_ar.py:128-175): run the
trained encoder on oracle poses over the dataset and cache per-complex latent
logits (soft distributions in ``no_sampling`` mode).

Phase 2 (autoregressive/train_ar.py): train ``PretrainedScoreEncoder`` with
cross-entropy over nodes: per sample pick a random ``decoding_idx``, feed the
hard one-hots of slots < idx as input latent, predict slot idx; ligand
positions come from a randomly-rotated generated conformer (``no_randomness``,
dataset_ar.py:91-95).  The score trunk is frozen for ``warmup_epochs`` then
unfrozen with a fresh optimizer (:242-246,309-313).  Every epoch a held-out
val split is scored: per-idx teacher-forced accuracy plus full sequential
``encode_ar`` accuracy (train_ar.py:152-216); ``ckpt_best`` keeps the best
val accuracy, ``ckpt_best_seq`` the best sequential-decode accuracy (the
quantity that matters at inference), ``ckpt_best_loss`` the best val loss,
and a plateau scheduler steps on val accuracy (:240).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import EncoderConfig, GraphCaps, ScoreModelConfig
from ..data.synthetic import make_complex_batch
from ..models.ar import PretrainedScoreEncoder, encode_ar
from ..models.encoder import TPEncoder
from .checkpoints import CheckpointManager, save_config
from .steps import TrainState


def generate_ar_labels(encoder, enc_vars, batches, key):
    """Phase 1: per-batch soft latent logits (B, Ld, NL+NR) from the oracle
    encoder in no-sampling mode, plus the node mask."""
    run = jax.jit(
        lambda b: encoder.apply(
            enc_vars, b, apply_gumbel=False, deterministic=True, use_running_average=True
        )
    )
    out = []
    for batch in batches:
        logits, mask = run(batch)
        out.append((np.asarray(logits), np.asarray(mask)))
    return out


def generate_ar_labels_to_disk(encoder_for, enc_vars, stream, label_dir) -> int:
    """Phase 1, STREAMING: run the oracle encoder bucket-by-bucket over a
    ``(batch, info)`` stream and cache per-complex TRIMMED latent logits on
    disk (the reference caches latents per complex,
    autoregressive/dataset_ar.py:160-175) -- the split is never materialized
    in host RAM.  Already-cached complexes are skipped, so interrupted runs
    resume.  Returns the number of complexes written."""
    import os

    os.makedirs(label_dir, exist_ok=True)
    fns: dict = {}
    n_done = 0
    for batch, info in stream:
        paths = [os.path.join(label_dir, f"{nm}.npz") for nm in info["names"]]
        if all(os.path.exists(p) for p in paths):
            continue
        caps = info["caps"]
        if caps not in fns:
            enc = encoder_for(caps)
            fns[caps] = jax.jit(lambda b, e=enc: e.apply(
                enc_vars, b, apply_gumbel=False, deterministic=True,
                use_running_average=True))
        logits, _ = fns[caps](batch)
        logits = np.asarray(logits)
        lig_mask = np.asarray(batch.lig_mask)
        rec_mask = np.asarray(batch.rec_mask)
        NL = lig_mask.shape[1]
        for b, path in enumerate(paths):
            if os.path.exists(path):
                continue
            nl, nr = int(lig_mask[b].sum()), int(rec_mask[b].sum())
            # tmp must end in .npz or savez_compressed appends it and the
            # os.replace below misses the file (pdbbind.py:99 pattern)
            tmp = f"{path}.tmp{os.getpid()}.npz"
            np.savez_compressed(tmp, logits_lig=logits[b, :, :nl],
                                logits_rec=logits[b, :, NL:NL + nr])
            os.replace(tmp, path)
            n_done += 1
    return n_done


def load_ar_labels(label_dir, names, latent_dim: int, NL: int, NR: int):
    """Reassemble a batch's padded (B, Ld, NL+NR) oracle-logit array from the
    per-complex disk cache (padding slots stay 0 -- they are masked by
    node_mask before any use)."""
    import os

    soft = np.zeros((len(names), latent_dim, NL + NR), np.float32)
    for b, nm in enumerate(names):
        with np.load(os.path.join(label_dir, f"{nm}.npz")) as z:
            ll, lr = z["logits_lig"], z["logits_rec"]
        soft[b, :, : ll.shape[1]] = ll
        soft[b, :, NL:NL + lr.shape[1]] = lr
    return soft


def make_ar_train_step(model, tx, input_latent_dim, trunk_frozen: bool,
                       axis_name=None):
    """CE over nodes for a random decoding slot; optionally freeze the trunk
    (zero updates for pretrained_score_model params).  With ``axis_name`` the
    step is shard_map-ready (grads/aux pmean over the data axis)."""

    def loss_fn(params, batch_stats, batch, input_latent, dec_idx, labels, node_mask, drop_key):
        (logits, _), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, input_latent, dec_idx,
            deterministic=False, use_running_average=False,
            mutable=["batch_stats"], rngs={"dropout": drop_key},
        )
        lg = jnp.where(node_mask[:, None, :], logits, -1e9)[:, 0, :]  # (B, N)
        # labels are DISTRIBUTIONS over nodes: softmax of the oracle logits
        # in no_sampling mode (dataset_ar.py:104), one-hot otherwise
        per = optax.softmax_cross_entropy(lg, labels)
        gm = batch.graph_mask.astype(jnp.float32)
        loss = jnp.sum(per * gm) / (jnp.sum(gm) + 1e-12)
        hit = jnp.argmax(lg, -1) == jnp.argmax(labels, -1)
        acc = jnp.sum(hit * gm) / (jnp.sum(gm) + 1e-12)
        return loss, (acc, mut["batch_stats"])

    def step(state: TrainState, batch, input_latent, dec_idx, labels, node_mask, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, input_latent, dec_idx,
            labels, node_mask, key,
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            acc = jax.lax.pmean(acc, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        def _zero_trunk(tree):
            return jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.zeros_like(g)
                if any(getattr(p, "key", None) == "pretrained_score_model"
                       for p in path)
                else g,
                tree,
            )

        if trunk_frozen:
            grads = _zero_trunk(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if trunk_frozen:
            # zero the UPDATES too: with w_decay > 0 add_decayed_weights
            # re-injects decay*param after the grad mask, which would erode
            # the frozen trunk (reference freezes via requires_grad=False,
            # so torch Adam skips those params entirely)
            updates = _zero_trunk(updates)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema=state.ema.update(new_params), step=state.step + 1,
        ), {"loss": loss, "accuracy": acc}

    return step


def make_ar_eval_step(model):
    """Teacher-forced loss/accuracy, deterministic (test_epoch analogue,
    reference train_ar.py:150-216)."""

    def step(variables, batch, input_latent, dec_idx, labels, node_mask):
        logits, _ = model.apply(
            variables, batch, input_latent, dec_idx,
            deterministic=True, use_running_average=True,
        )
        lg = jnp.where(node_mask[:, None, :], logits, -1e9)[:, 0, :]
        per = optax.softmax_cross_entropy(lg, labels)
        gm = batch.graph_mask.astype(jnp.float32)
        loss = jnp.sum(per * gm) / (jnp.sum(gm) + 1e-12)
        hit = jnp.argmax(lg, -1) == jnp.argmax(labels, -1)
        acc = jnp.sum(hit * gm) / (jnp.sum(gm) + 1e-12)
        return loss, acc

    return step


def _masked_softmax(row: np.ndarray) -> np.ndarray:
    """Softmax over the -inf-masked node axis (invalid slots -> prob 0)."""
    m = row.max(-1, keepdims=True)
    e = np.exp(row - m)
    e[~np.isfinite(row)] = 0.0
    return (e / np.maximum(e.sum(-1, keepdims=True), 1e-30)).astype(np.float32)


def _label_vectors(soft: np.ndarray, dec_idx: np.ndarray,
                   no_sampling: bool) -> np.ndarray:
    """Per-graph CE target over nodes for the chosen decoding slot: the
    softmax of the oracle logits in no_sampling mode (dataset_ar.py:104),
    the argmax one-hot otherwise (dataset_ar.py:112-115)."""
    B, _, N = soft.shape
    rows = soft[np.arange(B), dec_idx]  # (B, N)
    if no_sampling:
        return _masked_softmax(rows)
    out = np.zeros((B, N), np.float32)
    out[np.arange(B), rows.argmax(-1)] = 1.0
    return out


def teacher_forced_inputs(batch, labels_soft, node_mask, input_latent_dim,
                          dec_value: int, no_sampling: bool = True):
    """Deterministic teacher-forced inputs for a FIXED decoding slot — used
    by the val pass to report per-idx accuracy (reference meter_all with
    intervals=num_latents, train_ar.py:153).  Inputs use the noise-free
    argmax one-hots (the reference's val loader gumbel-samples; we keep the
    val metric deterministic and epoch-comparable)."""
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]
    soft = np.where(np.asarray(node_mask)[:, None, :], np.asarray(labels_soft), -np.inf)
    hard = soft.argmax(-1)  # (B, Ld)
    lat = np.zeros((B, NL + NR, input_latent_dim), np.float32)
    for b in range(B):
        for j in range(dec_value):
            lat[b, hard[b, j], j] = 1.0
    labels = _label_vectors(soft, np.full(B, dec_value), no_sampling)
    return (
        (jnp.asarray(lat[:, :NL]), jnp.asarray(lat[:, NL:])),
        jnp.full((B,), dec_value, jnp.int32),
        jnp.asarray(labels),
    )


from ..sampling import rotate_ligand  # shared pose op (sampler.py)


def prepare_ar_sample(rng, batch, labels_soft, node_mask, input_latent_dim, key,
                      no_sampling: bool = True, no_randomness: bool = True,
                      tr_sigma_max: float = 19.0):
    """Random decoding slot + teacher-forced inputs + CE target vectors.

    no_sampling (shipped recipe, dataset_ar.py:98-108): inputs are one-hots
    of argmax(logits + gumbel noise) per slot, target is the SOFTMAX of the
    oracle logits.  Otherwise (dataset_ar.py:110-119): inputs are the raw
    oracle logit fields themselves, target the argmax one-hot.
    Slots >= dec_idx are zeroed in the input either way.
    """
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]
    # mask padded node slots before the argmax -- otherwise a padding node can
    # become the label and the CE explodes against the -1e9 masked logit
    soft = np.where(np.asarray(node_mask)[:, None, :], np.asarray(labels_soft), -np.inf)
    dec_idx = rng.randint(0, input_latent_dim, B)
    if no_sampling:
        # argmax of gumbel-perturbed logits == a categorical sample
        # (the reference's gumbel_softmax(..., 0.01) + argmax)
        u = rng.uniform(1e-12, 1.0, soft.shape)
        hard = (soft - np.log(-np.log(u))).argmax(-1)  # (B, Ld)
        lat = np.zeros((B, NL + NR, input_latent_dim), np.float32)
        for b in range(B):
            for j in range(dec_idx[b]):
                lat[b, hard[b, j], j] = 1.0
    else:
        lat = np.where(np.isfinite(soft), soft, 0.0).transpose(0, 2, 1).astype(np.float32)
        for b in range(B):
            lat[b, :, dec_idx[b]:] = 0.0
    labels = _label_vectors(soft, dec_idx, no_sampling)
    # no_randomness (shipped recipe): reposition the ligand to the RAW
    # pre-matching RDKit conformer and random-rotate about its centroid
    # (dataset_ar.py:91-95 resets pos to orig_rdkit_pos, then
    # randomize_position's unconditional center+rotate, sampling.py:25-29);
    # else the full torsion+rotation+translation randomization on the
    # matched start pose (sampling.py:12-34)
    if no_randomness:
        b2 = rotate_ligand(
            batch.replace(lig_pos=batch.extras.get("rdkit_pos", batch.lig_pos)),
            key)
    else:
        from ..sampling import randomize_position

        b2 = randomize_position(key, batch, False, False, tr_sigma_max)
    return (
        b2,
        (jnp.asarray(lat[:, :NL]), jnp.asarray(lat[:, NL:])),
        jnp.asarray(dec_idx, jnp.int32),
        jnp.asarray(labels),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_name", default="ar_run")
    p.add_argument("--log_dir", default="workdir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--original_model_dir", default=None,
                   help="trained DisCo score+encoder run dir")
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
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint conv edge blocks (several-fold "
                        "smaller training HBM footprint, ~1 extra forward "
                        "of recompute)")
    p.add_argument("--epochs", "--n_epochs", dest="epochs", type=int, default=2)
    p.add_argument("--warmup_epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--w_decay", type=float, default=0.0)
    p.add_argument("--num_accumulation_steps", type=int, default=1,
                   help="gradient accumulation (reference train_ar.py:55)")
    p.add_argument("--no_sampling", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="soft-CE labels + gumbel-sampled input one-hots "
                        "(dataset_ar.py:98-108; the shipped AR recipe).  "
                        "--no-no_sampling: raw logit inputs + argmax labels")
    p.add_argument("--no_randomness", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="random rigid rotation only (shipped recipe); "
                        "--no-no_randomness adds torsion+translation noise")
    p.add_argument("--use_pretrained_score",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="warm-start the trunk from the trained score model "
                        "(reference train_ar.py:99,309-313)")
    p.add_argument("--overfit", action="store_true",
                   help="train and validate on the first batch only")
    p.add_argument("--train_multiplicity", type=int, default=1)
    p.add_argument("--val_multiplicity", type=int, default=1)
    p.add_argument("--restart_dir", default=None,
                   help="warm-start params from another AR run dir")
    p.add_argument("--model_save_frequency", type=int, default=0)
    p.add_argument("--best_model_save_frequency", type=int, default=0)
    p.add_argument("--latent_hidden_dim", type=int, default=128)
    p.add_argument("--latent_no_batchnorm", action="store_true")
    p.add_argument("--latent_dropout", type=float, default=0.0)
    # ---- featurization (reference parsing names; shipped-yml defaults)
    p.add_argument("--esm_embeddings_path", default=None)
    p.add_argument("--num_dataloader_workers", "--num_workers",
                   dest="num_dataloader_workers", type=int, default=1)
    p.add_argument("--receptor_radius", type=float, default=15.0)
    p.add_argument("--c_alpha_max_neighbors", type=int, default=24)
    p.add_argument("--matching_popsize", type=int, default=15)
    p.add_argument("--matching_maxiter", type=int, default=15)
    p.add_argument("--max_lig_size", type=int, default=None)
    p.add_argument("--remove_hs", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--num_conformers", type=int, default=1)
    p.add_argument("--chain_cutoff", type=float, default=None)
    p.add_argument("--latent_dim", type=int, default=2)
    p.add_argument("--ar_ns", type=int, default=None,
                   help="AR model's own scalar width for the predictor input "
                   "slice (reference train_ar ns flag; the shipped AR uses 16 "
                   "on the ns=24 trunk).  Default: the score model's ns.")
    # val tracking + best selection (reference train_ar.py:46-53,219-260)
    p.add_argument("--main_metric", default="accuracy",
                   choices=["loss", "accuracy", "sequential_accuracy"])
    p.add_argument("--main_metric_goal", default="max", choices=["min", "max"])
    p.add_argument("--scheduler", default="plateau", choices=["plateau", "none"])
    p.add_argument("--scheduler_patience", type=int, default=20)
    p.add_argument("--n_devices", type=int, default=1,
                   help=">1 shards each train batch over a data mesh "
                        "(must divide batch_size)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--project", default="disco_diffdock_tpu")
    from .config_overlay import add_config_arg, apply_config_overlay

    add_config_arg(p)
    args = apply_config_overlay(p.parse_args(argv))

    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=24, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=24 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
        )
        score_cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=args.latent_dim, latent_vocab=1, latent_droprate=0.1,
            remat=args.remat,
        )
        enc_cfg = EncoderConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=args.latent_dim, apply_gumbel_softmax=False,
            remat=args.remat,
        )
        batches = [
            make_complex_batch(seed=s, batch=4, n_lig=10, n_res=16, caps=caps,
                               esm_dim=16, c_alpha_max_neighbors=8)
            for s in range(2)
        ]
        val_batches = [
            make_complex_batch(seed=100 + s, batch=4, n_lig=10, n_res=16,
                               caps=caps, esm_dim=16, c_alpha_max_neighbors=8)
            for s in range(1)
        ]
        # phase 1 with a freshly init'd encoder (no trained run dir exists)
        encoder = TPEncoder(cfg=enc_cfg, caps=caps)
        enc_vars = jax.jit(encoder.init)(jax.random.PRNGKey(0), batches[0])
        warm_score_params = warm_score_stats = None
    else:
        assert args.original_model_dir and args.data_dir, (
            "real-data AR training needs --original_model_dir and --data_dir"
        )
        from ..data.collate import caps_from_datasets, ladder_for_datasets
        from ..data.pdbbind import PDBBind, PDBBindConfig, bucketed_batches
        from .loading import load_run_configs, restore_variables

        ds_cfg = dict(
            data_dir=args.data_dir,
            cache_path=args.cache_path, limit_complexes=args.limit_complexes,
            num_workers=args.num_dataloader_workers,
            esm_embeddings_path=args.esm_embeddings_path,
            receptor_radius=args.receptor_radius,
            c_alpha_max_neighbors=args.c_alpha_max_neighbors,
            popsize=args.matching_popsize, maxiter=args.matching_maxiter,
            max_lig_size=args.max_lig_size, remove_hs=args.remove_hs,
            num_conformers=args.num_conformers, chain_cutoff=args.chain_cutoff,
        )
        ds = PDBBind(PDBBindConfig(split_path=args.split_train, **ds_cfg))
        ds_val = PDBBind(PDBBindConfig(split_path=args.split_val, **ds_cfg))
        bucket_mode = args.bucket_mode
        if bucket_mode == "auto":
            bucket_mode = "ladder" if len(ds) + len(ds_val) > 256 else "exact"
        buckets = (ladder_for_datasets([ds, ds_val])
                   if bucket_mode == "ladder"
                   else (caps_from_datasets([ds, ds_val]),))
        caps = buckets[-1]
        score_cfg, enc_cfg, _ = load_run_configs(args.original_model_dir)
        assert enc_cfg is not None, (
            "--original_model_dir must be a DisCo run (encoder in its yml)"
        )
        args.latent_dim = enc_cfg.latent_dim
        import dataclasses as _dc

        enc_cfg = _dc.replace(enc_cfg, apply_gumbel_softmax=False,
                              remat=args.remat)
        if args.remat:
            # remat is a runtime memory knob, not a checkpoint property
            score_cfg = _dc.replace(score_cfg, remat=True)
        print(f"HAPPENING | {len(ds)} train / {len(ds_val)} val complexes, "
              f"bucket_mode={bucket_mode} ({len(buckets)} buckets), "
              f"largest caps: {caps}")
        # phase 1 uses the TRAINED encoder from the wrapper checkpoint
        wrapper_vars = restore_variables(args.original_model_dir, args.ckpt)
        enc_vars = {
            "params": wrapper_vars["params"]["encoder"],
            "batch_stats": (wrapper_vars["batch_stats"] or {}).get("encoder", {}),
        }
        # phase 2 warm-starts the AR trunk from the trained score model
        # (the reference loads the score ckpt, train_ar.py:107-131)
        warm_score_params = wrapper_vars["params"]["score_model"]
        warm_score_stats = (wrapper_vars["batch_stats"] or {}).get("score_model")

    run_dir = f"{args.log_dir}/{args.run_name}"

    # ---- phase 1: oracle-encoder soft latent labels (train + val splits,
    # reference dataset_ar.py instantiated for both loaders)
    if args.synthetic:
        labels = generate_ar_labels(encoder, enc_vars, batches, jax.random.PRNGKey(1))
        val_labels = generate_ar_labels(encoder, enc_vars, val_batches, jax.random.PRNGKey(1))
        print(f"phase 1 done: {len(labels)} train + {len(val_labels)} val "
              f"label batches, logits {labels[0][0].shape}")
        if args.overfit:
            batches, labels = batches[:1], labels[:1]
            val_batches, val_labels = batches, labels

        def train_data(seed):
            return [
                (b, soft, np.concatenate([np.asarray(b.lig_mask),
                                          np.asarray(b.rec_mask)], 1), caps)
                for b, (soft, _) in zip(batches, labels)
            ]

        def val_data():
            return [
                (b, soft, np.concatenate([np.asarray(b.lig_mask),
                                          np.asarray(b.rec_mask)], 1), caps)
                for b, (soft, _) in zip(val_batches, val_labels)
            ]

        example_batch, example_caps = batches[0], caps
    else:
        from ..data.prefetch import prefetch

        _encoders: dict = {}

        def encoder_for(c):
            if c not in _encoders:
                _encoders[c] = TPEncoder(cfg=enc_cfg, caps=c)
            return _encoders[c]

        def _stream(dset, seed, shuffle):
            # pad_remainder (not a smaller last batch): fixed shapes keep one
            # compiled program per bucket AND keep batches DP-shardable;
            # padded repeats are graph_mask-ed out of loss/metrics
            return bucketed_batches(
                dset, args.batch_size, np.random.RandomState(seed),
                buckets=buckets, esm_dim=score_cfg.esm_embedding_dim,
                shuffle=shuffle, pad_remainder=True, with_info=True,
            )

        label_dir = os.path.join(run_dir, "ar_labels")
        n_new = generate_ar_labels_to_disk(
            encoder_for, enc_vars, _stream(ds, 0, False), label_dir)
        n_new += generate_ar_labels_to_disk(
            encoder_for, enc_vars, _stream(ds_val, 0, False), label_dir)
        print(f"phase 1 done: {n_new} newly cached label sets in {label_dir}")

        def _with_labels(stream):
            for b, info in stream:
                NL, NR = b.lig_x.shape[1], b.rec_x.shape[1]
                soft = load_ar_labels(label_dir, info["names"],
                                      args.latent_dim, NL, NR)
                B, n_valid = b.lig_x.shape[0], soft.shape[0]
                if n_valid < B:
                    # remainder rows are collate's repeats (row k >= n_valid
                    # duplicates record (k - n_valid) % n_valid); align the
                    # labels the same way (masked out of loss regardless)
                    idx = [k if k < n_valid else (k - n_valid) % n_valid
                           for k in range(B)]
                    soft = soft[idx]
                node_mask = np.concatenate(
                    [np.asarray(b.lig_mask), np.asarray(b.rec_mask)], 1)
                yield b, soft, node_mask, info["caps"]

        if args.overfit:
            first = [next(_with_labels(_stream(ds, 0, False)))]

            def train_data(seed):
                return first

            def val_data():
                return first

            example_batch, example_caps = first[0][0], first[0][3]
        else:
            def train_data(seed):
                return prefetch(_with_labels(_stream(ds, seed, True)),
                                depth=args.prefetch_depth)

            def val_data():
                return prefetch(_with_labels(_stream(ds_val, 0, False)),
                                depth=args.prefetch_depth)

            eb, einfo = next(iter(_stream(ds, 0, False)))
            example_batch, example_caps = eb, einfo["caps"]

    # ---- phase 2: one model per bucket (params are capacity-independent),
    # sharing a single TrainState
    _models: dict = {}

    def model_for(c):
        if c not in _models:
            _models[c] = PretrainedScoreEncoder(
                score_cfg=score_cfg, caps=c, latent_dim=1,
                input_latent_dim=args.latent_dim, ns=args.ar_ns,
                latent_hidden_dim=args.latent_hidden_dim,
                latent_no_batchnorm=args.latent_no_batchnorm,
                latent_dropout=args.latent_dropout,
            )
        return _models[c]

    model = model_for(example_caps)
    B, NL = example_batch.lig_x.shape[:2]
    NR = example_batch.rec_x.shape[1]
    lat0 = (jnp.zeros((B, NL, args.latent_dim)), jnp.zeros((B, NR, args.latent_dim)))
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(2), b, lat0, jnp.zeros((B,), jnp.int32))
    )(example_batch)
    if warm_score_params is not None and args.use_pretrained_score:
        params = dict(variables["params"])
        params["pretrained_score_model"] = warm_score_params
        variables = {**variables, "params": params}
        if warm_score_stats is not None and variables.get("batch_stats"):
            stats = dict(variables["batch_stats"])
            stats["pretrained_score_model"] = warm_score_stats
            variables = {**variables, "batch_stats": stats}
    from .plateau import ReduceLROnPlateau, make_adam

    tx = make_adam(args.lr, args.w_decay)
    if args.num_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.num_accumulation_steps)
    state = TrainState.create(variables, tx)
    if args.restart_dir:
        from .loading import merge_matching
        from .loading import restore_variables as _restore

        raw = _restore(args.restart_dir, "last", use_ema=False)
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
        if args.batch_size % args.n_devices != 0:
            raise SystemExit("--n_devices must divide --batch_size")
        state = replicate(state, mesh)
    # per-(bucket, frozen) compiled steps, built lazily on first use
    _steps: dict = {}
    _evals: dict = {}
    _seqs: dict = {}

    def step_for(c, frozen: bool):
        k = (c, frozen)
        if k not in _steps:
            raw = make_ar_train_step(
                model_for(c), tx, args.latent_dim, trunk_frozen=frozen,
                axis_name="data" if mesh is not None else None)
            _steps[k] = (shard_step(raw, mesh, n_sharded_args=5)
                         if mesh is not None else jax.jit(raw))
        return _steps[k]

    def eval_for(c):
        if c not in _evals:
            _evals[c] = jax.jit(make_ar_eval_step(model_for(c)))
        return _evals[c]

    # per-epoch edge-overflow audit: finite ladder caps CAN truncate cross
    # edges at the randomized conditioning pose (ar_conditioning draws
    # tr_sigma_max translations unless --no_randomness), silently starving
    # the trunk of real edges -- surface the count per bucket, per epoch
    # (the ladder_for_datasets contract; mirrors train_score.py's audit)
    _audits: dict = {}

    def audit_for(c):
        if c not in _audits:
            m = model_for(c)

            @jax.jit
            def run(variables, b, lat, dec):
                _, st = m.apply(variables, b, lat, dec,
                                deterministic=True, use_running_average=True,
                                mutable=["intermediates"])
                return st["intermediates"]

            _audits[c] = run
        return _audits[c]

    def seq_decode_for(c):
        if c not in _seqs:
            m = model_for(c)

            @jax.jit
            def seq_decode(variables, batch, key):
                def apply_fn(b, lat, dec):
                    return m.apply(variables, b, lat, dec,
                                   deterministic=True, use_running_average=True)
                return encode_ar(apply_fn, batch, key, args.latent_dim, 1000.0)

            _seqs[c] = seq_decode
        return _seqs[c]

    save_config(run_dir, ar_model=score_cfg, caps=caps,
                ar={"ns": args.ar_ns,
                    "latent_hidden_dim": args.latent_hidden_dim,
                    "latent_no_batchnorm": args.latent_no_batchnorm,
                    "latent_dropout": args.latent_dropout,
                    # consumers must condition encode_ar on the same pose
                    # family the model trained on (ar_pos semantics,
                    # utils/sampling.py:36-46)
                    "no_randomness": bool(args.no_randomness)})
    ckpt = CheckpointManager(run_dir)

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(3)
    from ..utils.wandb_log import maybe_wandb

    wandb_run = maybe_wandb(args.wandb, args.project, args.run_name, vars(args))
    best = {"accuracy": -np.inf, "loss": np.inf, "sequential_accuracy": -np.inf}
    scheduler = (ReduceLROnPlateau(mode=args.main_metric_goal,
                                   patience=args.scheduler_patience,
                                   min_lr=args.lr / 100)
                 if args.scheduler == "plateau" else None)
    # the reference freezes the trunk only for a pretrained-score warmup and
    # never on restart (train_ar.py:242-246 gate on use_pretrained_score;
    # the restart branch :303-307 skips the freeze entirely)
    freeze_warmup = (args.use_pretrained_score and args.warmup_epochs > 0
                     and not args.restart_dir)
    for epoch in range(args.epochs):
        if freeze_warmup and epoch == args.warmup_epochs:
            # unfreeze with a fresh optimizer + scheduler (train_ar.py:309-313)
            state = state.replace(opt_state=tx.init(state.params))
            if scheduler is not None:
                scheduler = ReduceLROnPlateau(
                    mode=args.main_metric_goal,
                    patience=args.scheduler_patience, min_lr=args.lr / 100)
        frozen_now = freeze_warmup and epoch < args.warmup_epochs
        ms = []
        audit_inputs: dict = {}  # last-seen (pre-shard) inputs per bucket
        for rep in range(max(1, args.train_multiplicity)):
            data = train_data(epoch * 131 + rep)
            try:
                for batch, soft, node_mask, c in data:
                    key, k1, k2 = jax.random.split(key, 3)
                    b2, lat, dec, lab = prepare_ar_sample(
                        rng, batch, soft, node_mask, args.latent_dim, k1,
                        no_sampling=args.no_sampling,
                        no_randomness=args.no_randomness)
                    nm = jnp.asarray(node_mask)
                    if not args.synthetic and len(buckets) > 1:
                        audit_inputs[c] = (b2, lat, dec)
                    if mesh is not None:
                        b2, lat, dec, lab, nm = (
                            shard_batch(x, mesh) for x in (b2, lat, dec, lab, nm))
                    state, m = step_for(c, frozen_now)(
                        state, b2, lat, dec, lab, nm, k2)
                    # device dicts accumulate async; ONE stacked fetch per
                    # epoch (a float() per step would sync every step)
                    ms.append(m)
            finally:
                getattr(data, "close", lambda: None)()
        ms = jax.device_get(jax.tree.map(lambda *xs: jnp.stack(xs), *ms))
        train_loss = float(np.mean(ms["loss"]))
        train_acc = float(np.mean(ms["accuracy"]))
        print(f"epoch {epoch}: loss={train_loss:.4f} "
              f"acc={train_acc:.3f} "
              f"({'frozen' if frozen_now else 'unfrozen'} trunk)")

        if audit_inputs:
            from ..graphs.audit import _collect_overflow

            variables_now = {"params": state.params,
                             "batch_stats": state.batch_stats}
            for c, (ab, alat, adec) in sorted(audit_inputs.items(),
                                              key=lambda kv: kv[0].max_rec):
                inter = audit_for(c)(variables_now, ab, alat, adec)
                ov = _collect_overflow(jax.device_get(inter))
                tag = f"bucket(lig<={c.max_lig},rec<={c.max_rec})"
                if any(ov.values()):
                    print(f"| WARNING: epoch {epoch} edge-overflow audit "
                          f"{tag}: {ov} true edges dropped at the "
                          f"conditioning pose")
                else:
                    print(f"epoch {epoch}: edge-overflow audit {tag}: 0")

        # held-out val: per-idx teacher-forced accuracy + full sequential
        # encode_ar accuracy every epoch (train_ar.py:150-216)
        variables_now = {"params": state.params, "batch_stats": state.batch_stats}
        vloss, vacc = [], []
        per_idx = {d: [] for d in range(args.latent_dim)}
        seq_hits, seq_n = 0, 0
        vi = 0
        for _ in range(max(1, args.val_multiplicity)):
            vdata = val_data()
            try:
                for batch, soft, node_mask, c in vdata:
                    # fixed rotation per batch so the metric is epoch
                    # -comparable; same no_randomness pose source as
                    # training (raw RDKit conformer)
                    vsrc = (batch.replace(
                        lig_pos=batch.extras.get("rdkit_pos", batch.lig_pos))
                        if args.no_randomness else batch)
                    vb = rotate_ligand(
                        vsrc, jax.random.fold_in(jax.random.PRNGKey(11), vi))
                    for d in range(args.latent_dim):
                        lat, dec, lab = teacher_forced_inputs(
                            batch, soft, node_mask, args.latent_dim, d,
                            no_sampling=args.no_sampling)
                        lo, ac = eval_for(c)(variables_now, vb, lat, dec, lab,
                                             jnp.asarray(node_mask))
                        vloss.append(float(lo))
                        vacc.append(float(ac))
                        per_idx[d].append(float(ac))
                    lat_l, lat_r = seq_decode_for(c)(
                        variables_now, vb,
                        jax.random.fold_in(jax.random.PRNGKey(9), vi))
                    pred_nodes = np.concatenate(
                        [np.asarray(lat_l), np.asarray(lat_r)], 1).argmax(1)  # (B, Ld)
                    soft_m = np.where(np.asarray(node_mask)[:, None, :],
                                      np.asarray(soft), -np.inf)
                    true_nodes = soft_m.argmax(-1)
                    gm = np.asarray(batch.graph_mask, bool)
                    seq_hits += int((pred_nodes[gm] == true_nodes[gm]).all(-1).sum())
                    seq_n += int(gm.sum())
                    vi += 1
            finally:
                getattr(vdata, "close", lambda: None)()
        val = {
            "loss": float(np.mean(vloss)),
            "accuracy": float(np.mean(vacc)),
            "sequential_accuracy": seq_hits / max(seq_n, 1),
        }
        idx_str = " ".join(
            f"acc{d}={np.mean(per_idx[d]):.3f}" for d in range(args.latent_dim))
        print(f"epoch {epoch}: val loss={val['loss']:.4f} "
              f"acc={val['accuracy']:.3f} seq_acc={val['sequential_accuracy']:.3f} "
              f"[{idx_str}]")
        if wandb_run:
            wandb_run.log({"loss": train_loss, "accuracy": train_acc,
                           **{f"val_{k3}": v for k3, v in val.items()}},
                          step=epoch)
        ckpt.save("last", state)
        if args.model_save_frequency and (epoch + 1) % args.model_save_frequency == 0:
            ckpt.save(f"epoch{epoch + 1}", state)
        if val["accuracy"] >= best["accuracy"]:
            best["accuracy"] = val["accuracy"]
            ckpt.save("best", state)
        if val["loss"] <= best["loss"]:
            best["loss"] = val["loss"]
            ckpt.save("best_loss", state)
        if val["sequential_accuracy"] >= best["sequential_accuracy"]:
            best["sequential_accuracy"] = val["sequential_accuracy"]
            ckpt.save("best_seq", state)
        if args.best_model_save_frequency and \
                (epoch + 1) % args.best_model_save_frequency == 0:
            # periodic COPIES of the best-so-far checkpoints, not the current
            # state (reference train_ar.py:261-263 shutil.copyfile's
            # best_model_accuracy.pt / best_model_loss.pt).  On-disk copy:
            # no live state retained across epochs, and a no-op (not a
            # crash) when NaN val metrics mean no best was ever saved
            ckpt.copy("best", f"best_epoch{epoch + 1}")
            ckpt.copy("best_loss", f"best_loss_epoch{epoch + 1}")
        if scheduler is not None:
            tracked = val[args.main_metric]
            new_opt = scheduler.step(tracked, state.opt_state)
            if new_opt is not state.opt_state:
                state = state.replace(opt_state=new_opt)
    print(f"AR training done (best val acc={best['accuracy']:.3f}, "
          f"seq_acc={best['sequential_accuracy']:.3f})")
    return state


if __name__ == "__main__":
    main()
