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
from functools import partial
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GraphCaps, ScoreModelConfig
from ..data.synthetic import make_complex_batch
from ..geom.diffusion import SigmaSchedule
from ..models.score_model import TensorProductScoreModel
from ..sampling import SamplerConfig, randomize_position, sampling
from .metrics import aggregate, min_cross_distance, min_self_distance, symmetry_rmsd


def enumerate_temp_flags():
    """(flag-name, (triple-attr, component-index)) for the reference's nine
    per-axis temperature spellings (evaluate.py:70-78)."""
    out = []
    for attr in ("temp_sampling", "temp_psi", "temp_sigma_data"):
        for ci, comp in enumerate(("tr", "rot", "tor")):
            out.append((f"{attr}_{comp}", (attr, ci)))
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--n_complexes", type=int, default=3, help="synthetic mode")
    p.add_argument("--all_atoms", action="store_true",
                   help="synthetic mode: drive the all-atom score model "
                        "through the sampler (real runs read all_atoms from "
                        "the run config)")
    p.add_argument("--synthetic_confidence", action="store_true",
                   help="synthetic mode: attach a random-init confidence "
                        "model so the filtered_ metric family is exercised "
                        "end-to-end (reference evaluate.py:453-456)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_path", default="data/splits/timesplit_test")
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--model_dir", default=None, help="score-model run dir")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--ar_model_dir", default=None)
    p.add_argument("--ckpt", "--ckpt_score", dest="ckpt",
                   default="best_ema_inference")
    p.add_argument("--ar_ckpt", default="best",
                   help="checkpoint tag inside --ar_model_dir")
    p.add_argument("--confidence_ckpt", default="best",
                   help="checkpoint tag inside --confidence_model_dir")
    p.add_argument("--samples_per_complex", type=int, default=8)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--num_dataloader_workers", "--num_workers",
                   dest="num_dataloader_workers", type=int, default=1)
    p.add_argument("--eval_batch_size", type=int, default=40,
                   help="total graphs per compiled program; complexes pack "
                        "together when samples_per_complex is smaller")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=None,
                   help="run only the first N steps of the schedule "
                        "(reference evaluate.py:55)")
    p.add_argument("--ode", action="store_true",
                   help="probability-flow ODE updates (halved drift, no noise)")
    p.add_argument("--no_random", action="store_true",
                   help="no noise in the diffusion steps and no random "
                        "initial translation")
    p.add_argument("--no_model", action="store_true",
                   help="score the randomized seed conformers without "
                        "running the model (reference evaluate.py:44)")
    p.add_argument("--out_dir", default="results/eval")
    # reference default is False (evaluate.py:46); the shipped inference
    # presets (configs/inference_*.yml) turn it on
    p.add_argument("--no_final_step_noise", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--temp_sampling", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    p.add_argument("--temp_psi", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--temp_sigma_data", type=float, nargs=3, default=[0.5, 0.5, 0.5])
    # per-axis scalar spellings (reference evaluate.py:70-78); when set they
    # override the corresponding component of the triple above
    for name, _ in enumerate_temp_flags():
        p.add_argument(f"--{name}", type=float, default=None)
    p.add_argument("--classifier_free_guidance_weight", type=float, default=0.0)
    p.add_argument("--cfg_start", type=float, default=None,
                   help="apply CFG only while t <= cfg_start (reference :62)")
    p.add_argument("--cfg_end", type=float, default=None)
    p.add_argument("--softmax_latent_temperature", type=float, default=1.0,
                   help="AR sequential-decode softmax temperature")
    p.add_argument("--log_softmax_latent_temperature", type=float, default=None,
                   help="log10 spelling of the AR decode temperature "
                        "(reference README: -1.5); overrides the linear flag")
    p.add_argument("--gumbel_latent_temperature", type=float, default=0.01,
                   help="oracle-encoder gumbel temperature (evaluate.py:58)")
    p.add_argument("--compute_ar_accuracy", action="store_true",
                   help="report the AR prior's slot agreement with the "
                        "oracle encoder (reference sampling.py:90-101)")
    p.add_argument("--oracle", action="store_true",
                   help="keep oracle-encoder latents even when "
                        "--ar_model_dir is given (reference evaluate.py:281 "
                        "passes ar_model=None under --oracle)")
    p.add_argument("--esm_embeddings_path", default=None)
    p.add_argument("--no_overlap_names_path", default=None,
                   help="text file of test complex names with no receptor "
                        "overlap with train (evaluate.py:43,217); adds the "
                        "no_overlap_ metric family")
    p.add_argument("--save_visualisation", action="store_true")
    p.add_argument("--limit_failures", type=int, default=3)
    p.add_argument("--n_devices", type=int, default=1,
                   help=">1 shards each program's batch axis over a data "
                        "mesh (must divide the batch size)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--project", default="disco_diffdock_tpu")
    from ..train.config_overlay import add_config_arg, apply_config_overlay

    add_config_arg(p)
    args = apply_config_overlay(p.parse_args(argv))
    # scalar per-axis temperatures override the triple's component -- on a
    # COPY: writing into the parser's mutable default list would leak the
    # override into every later parse_args in the same process
    for name, (attr, ci) in enumerate_temp_flags():
        v = getattr(args, name)
        if v is not None:
            triple = list(getattr(args, attr))
            triple[ci] = v
            setattr(args, attr, triple)
    if args.log_softmax_latent_temperature is not None:
        args.softmax_latent_temperature = 10.0 ** args.log_softmax_latent_temperature
    return args


def run_with_retries(run_fn, batch, key, limit_failures: int, tag=""):
    """Call ``run_fn(batch, key)`` with fresh keys up to ``limit_failures``
    times; returns (pos, conf, traj, latent) or (None,)*4 after the last
    failure (reference retry-then-sentinel, evaluate.py:230,394-408).
    The host fetch doubles as the device sync."""
    for attempt in range(max(1, limit_failures)):
        key, k = jax.random.split(key)
        try:
            final, conf, traj, latent = run_fn(batch, k)
            pos = np.asarray(final.lig_pos)
            return (pos, (np.asarray(conf) if conf is not None else None),
                    traj, latent)
        except Exception as e:
            print(f"| WARNING: batch{tag} attempt {attempt + 1} failed "
                  f"({type(e).__name__}: {e})")
    return None, None, None, None


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
    batch_packs=None,
    names=None,
    no_overlap_names=None,
    mesh=None,
    limit_failures: int = 3,
    return_arrays: bool = False,
    no_model: bool = False,
):
    """Run inference on a list of pose-replicated batches; return metrics.

    ``complex_batches``: one ComplexBatch per program.  By default each batch
    is N pose copies of ONE complex (the reference's per-complex host loop,
    evaluate.py:221); with ``batch_packs`` several same-bucket complexes pack
    into one program -- ``batch_packs[i]`` is a list of ``(offset, n_poses,
    meta_index)`` rows describing batch i, which lifts small-complex
    throughput (one compile + one launch amortized over the pack).
    ``lig_meta``: optional per-complex dicts {elements, bonds} for symmetry
    RMSD (plain RMSD without).  ``names``: per-complex names (same indexing
    as lig_meta); with ``no_overlap_names`` (a set) the receptor-unseen
    subset gets its own no_overlap_ metric family (evaluate.py:391-421).
    With ``mesh`` (a jax.sharding.Mesh with a "data" axis) each program's
    batch axis shards across devices -- poses/complexes are independent, so
    inference is embarrassingly data-parallel; variables replicate and XLA
    partitions the program (the multi-chip serving path; the reference's
    closest analogue is DataParallel inference, utils/model_utils.py:98-99).
    The batch size must divide the mesh size.
    """
    if mesh is not None:
        from ..parallel import replicate, shard_batch

        variables = replicate(variables, mesh)
        complex_batches = [shard_batch(b, mesh) for b in complex_batches]
        if confidence_variables is not None:
            confidence_variables = replicate(confidence_variables, mesh)
    all_rmsds, all_conf, all_cent, run_times = [], [], [], []
    clash, self_int, row_names = [], [], []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    # edge-capacity audit at the t=1 worst case: a wrong cap would truncate
    # real edges silently, so surface the dropped-edge counts in the metrics
    from ..graphs.audit import audit_worst_case

    edge_overflow = audit_worst_case(
        model, variables, complex_batches[0], key,
        tr_sigma_max=sigma.tr_sigma_max, latent_fn=latent_fn,
    )
    if any(v > 0 for v in edge_overflow.values()):
        print(f"| WARNING: edge capacity overflow {edge_overflow} -- "
              "caps are truncating real edges")

    # pose-shared receptor fast path applies when every program holds ONE
    # complex's pose copies (the reference per-complex protocol); packed
    # multi-complex programs keep the general path
    shared_rec = batch_packs is None or all(len(p) == 1 for p in batch_packs)

    # one compiled program reused across complexes (shapes are bucketed);
    # measured-win TPU compile options (utils/xla_opts.py)
    from ..utils.xla_opts import tpu_compiler_options

    @partial(jax.jit, compiler_options=tpu_compiler_options())
    def _run(batch, key):
        k1, k2, k3 = jax.random.split(key, 3)
        rb = randomize_position(k1, batch, scfg.no_torsion, scfg.no_random,
                                sigma.tr_sigma_max)
        # latents AFTER randomization: the reference's AR prior conditions on
        # ar_pos — derived from the randomized pose (utils/sampling.py:36-46,
        # 83-88); the oracle encoder reads extras['orig_pos'] either way
        latent = latent_fn(rb, k3) if latent_fn is not None else None
        if no_model:
            # score the randomized seed conformers without running the model
            # (reference --no_model, evaluate.py:44,261)
            return rb, None, None, None
        out = sampling(
            model, variables, rb, k2, scfg, sigma, latent=latent,
            confidence_model=confidence_model,
            confidence_variables=confidence_variables,
            shared_rec=shared_rec,
        )
        return out + (latent,)

    if batch_packs is None:
        # default: one complex per batch, all rows are its poses
        batch_packs = [
            [(0, b.num_graphs, bi)] for bi, b in enumerate(complex_batches)
        ]

    for bi, batch in enumerate(complex_batches):
        pack = batch_packs[bi]
        t0 = time.time()
        # retry with fresh keys before the sentinel (shapes are static, so
        # the retry targets transient runtime/SVD failures, not OOM)
        key, k = jax.random.split(key)
        pos_all, conf_all, traj, latent_out = run_with_retries(
            _run, batch, k, limit_failures, tag=f" {bi}")
        if pos_all is None:
            # failure sentinel parity (evaluate.py:400-408)
            print(f"| WARNING: batch {bi} failed {max(1, limit_failures)} "
                  "attempts; recording rmsd=10000, confidence=-10000")
            for (ofs, n, ci) in pack:
                all_rmsds.append([10000.0] * n)
                all_cent.append([10000.0] * n)
                all_conf.append(np.full(n, -10000.0))
                # the reference appends sentinel DISTANCES (10000 -> counted
                # as non-clashing poses), so failed complexes stay in the
                # clash/self-intersection denominators (evaluate.py:400-408
                # with :331-338): record 0.0 fractions here to match
                clash.append(0.0)
                if lig_meta is not None and lig_meta[ci] is not None:
                    self_int.append(0.0)
                run_times.append((time.time() - t0) / len(pack))
                row_names.append(names[ci] if names is not None else str(ci))
            continue
        per_complex_time = (time.time() - t0) / len(pack)

        anchors = None
        if latent_out is not None:
            # latent anchor decode on the FINAL poses (reference
            # utils/sampling.py:205-221, printed with the per-complex rmsds
            # at evaluate.py:327-328 and drawn as pseudo-atoms :344-390).
            # Returns None for vocab>1 / virtual-node latents (single
            # invariant array — no node identity to print).
            from ..sampling.sampler import decode_latent_anchors

            anchors = decode_latent_anchors(
                batch.replace(lig_pos=jnp.asarray(pos_all)), latent_out)

        for (ofs, n, ci) in pack:
            run_times.append(per_complex_time)
            row_names.append(names[ci] if names is not None else str(ci))
            pos = pos_all[ofs : ofs + n]
            mask = np.asarray(batch.lig_mask[ofs])
            true = np.asarray(batch.extras["orig_pos"][ofs])[mask]
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
                conf_all[ofs : ofs + n] if conf_all is not None else np.zeros(n)
            )
            # the reference measures min ligand-to-receptor distance over
            # EVERY protein atom (evaluate.py:250-258); use the all-atom
            # coordinates whenever collated (all-atom confidence runs), else
            # C-alphas -- a documented under-count, since a <0.4A approach to
            # a side chain is invisible at C-alpha resolution
            if batch.atom_pos is not None:
                rec_atoms = np.asarray(batch.atom_pos[ofs])[
                    np.asarray(batch.atom_mask[ofs])]
            else:
                rec_atoms = np.asarray(batch.rec_pos[ofs])[
                    np.asarray(batch.rec_mask[ofs])]
            clash.append(
                float(np.mean([min_cross_distance(p[mask], rec_atoms) < 0.4 for p in pos]))
            )
            if meta is not None:
                self_int.append(
                    float(np.mean([min_self_distance(p[mask], meta["bonds"]) < 0.4 for p in pos]))
                )
            if anchors is not None:
                strs = [anchors[ofs + i]["latent_str"] for i in range(n)]
                print(f"HAPPENING | {row_names[-1]} latents {strs}")
            if save_visualisation and traj is not None and out_dir:
                from .visualise import PDBTrajectory

                els = meta["elements"] if meta else ["C"] * int(mask.sum())
                # EVERY pose's trajectory, one dir per complex, files named
                # <rank>_<rmsd>[_<confidence>].pdb ranked by confidence when
                # a model ran, else by rmsd (reference evaluate.py:344-390);
                # frames in the ORIGINAL protein frame (+original_center,
                # utils/sampling.py:227-228, dock.py's convention) so they
                # overlay the crystal PDB; anchors are already in that frame
                center = np.asarray(batch.original_center[ofs])
                cdir = os.path.join(out_dir, str(row_names[-1]))
                os.makedirs(cdir, exist_ok=True)
                chere = conf_all[ofs : ofs + n] if conf_all is not None else None
                order = (np.argsort(-chere) if chere is not None
                         else np.argsort(rmsds))
                for rank, pi in enumerate(order):
                    viz = PDBTrajectory(els)
                    anchor_pos = None
                    if anchors is not None and len(anchors[ofs + pi]["latent_pos"]):
                        anchor_pos = anchors[ofs + pi]["latent_pos"]
                    for frame in np.asarray(traj)[:, ofs + pi]:
                        viz.add(frame[mask] + center, latent_pos=anchor_pos)
                    tag = f"{rank + 1}_{rmsds[pi]:.1f}"
                    if chere is not None:
                        tag += f"_{chere[pi]:.1f}"
                    viz.write(os.path.join(cdir, f"{tag}.pdb"))

    rmsds = np.asarray(all_rmsds)
    confs = np.asarray(all_conf)
    cents = np.asarray(all_cent)
    overlap_mask = (
        np.asarray([n in no_overlap_names for n in row_names])
        if no_overlap_names else None
    )
    # the confidence-filtered family exists iff a confidence model actually
    # ran: the -10000 failure sentinel would otherwise make all-zero
    # placeholder confidences look real and fabricate filtered_ metrics, and
    # under --no_model the model never runs even when a dir is given
    has_conf = confidence_model is not None and not no_model
    metrics = aggregate(rmsds, confs if has_conf else None, cents,
                        no_overlap_mask=overlap_mask)
    metrics["run_times_mean"] = float(np.mean(run_times))
    metrics["run_times_std"] = float(np.std(run_times))
    # PERCENT of poses, matching the reference's 100 * (d < 0.4) / N units
    # (evaluate.py:453-457)
    metrics["steric_clash_fraction"] = 100 * float(np.mean(clash)) if clash else None
    metrics["self_intersect_fraction"] = 100 * float(np.mean(self_int)) if self_int else None
    metrics["edge_overflow"] = edge_overflow
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "rmsds.npy"), rmsds)
        np.save(os.path.join(out_dir, "confidences.npy"), confs)
        np.save(os.path.join(out_dir, "centroid_distances.npy"), cents)
        np.save(os.path.join(out_dir, "run_times.npy"), np.asarray(run_times))
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
    if return_arrays:
        # raw per-complex arrays so callers can POOL across buckets before
        # computing medians/percentiles (reference evaluate.py:420-585
        # aggregates over the pooled arrays, not per-bucket summaries)
        arrays = dict(
            rmsds=rmsds, confidences=confs, centroid_dists=cents,
            run_times=np.asarray(run_times), names=row_names,
            clash=np.asarray(clash),
            self_int=np.asarray(self_int) if self_int else None,
            has_confidence=has_conf,
        )
        return metrics, arrays
    return metrics


def evaluate_real(args, scfg: SamplerConfig, sigma: SigmaSchedule):
    """Full-dataset evaluation from trained run dirs (evaluate.py:107-610).

    Loads model_parameters.yml + checkpoints from ``--model_dir`` (score
    model, optionally with encoder), ``--confidence_model_dir`` and
    ``--ar_model_dir``; featurizes the test split; per complex: N pose copies
    -> randomize -> jitted sampler (+ oracle/AR latents) -> confidence ->
    symmetry-corrected metrics.  One compiled program per size bucket.
    """
    from ..config import ScoreModelConfig
    from ..data.collate import DEFAULT_BUCKETS, collate, fits_counts, replicate_record
    from ..data.pdbbind import PDBBind, PDBBindConfig
    from ..models.all_atom_score_model import AllAtomScoreModel
    from ..models.score_model import TensorProductScoreModel
    from ..train.checkpoints import load_config
    from ..train.loading import (
        build_score_runtime, cfg_from_dict, load_run_configs, restore_variables,
    )

    score_cfg, enc_cfg, run_caps = load_run_configs(args.model_dir)
    if args.ar_model_dir and enc_cfg is None:
        # fail fast: silently falling back to no latents would misreport the
        # requested DisCo (AR-latent) protocol as having run
        raise SystemExit(
            "--ar_model_dir requires a score run trained WITH a latent "
            f"encoder, but {args.model_dir} has no encoder config — AR "
            "latents would be silently ignored")

    mesh = None
    if getattr(args, "n_devices", 1) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(args.n_devices)

    ds = PDBBind(PDBBindConfig(
        data_dir=args.data_dir, split_path=args.split_path,
        cache_path=args.cache_path,
        limit_complexes=getattr(args, "limit_complexes", 0),
        num_workers=getattr(args, "num_dataloader_workers", 1),
        esm_embeddings_path=getattr(args, "esm_embeddings_path", None),
        all_atoms=(args.confidence_model_dir is not None
                   or score_cfg.all_atoms),
    ))
    print(f"HAPPENING | evaluating {len(ds)} complexes from {args.split_path}")

    # bucket ladder: the training run's exact-fit caps first (small datasets
    # evaluate in one program), then the default ladder for anything larger
    buckets = ((run_caps,) if run_caps is not None else ()) + tuple(DEFAULT_BUCKETS)

    # group complexes by bucket so each bucket compiles once
    per_bucket: dict[int, list[int]] = {}
    unbucketable = []
    for i in range(len(ds)):
        counts = ds.sizes(i)  # memoized length tuple — no full-record load
        for bi, caps in enumerate(buckets):
            if fits_counts(counts, caps):
                per_bucket.setdefault(bi, []).append(i)
                break
        else:
            # score as a failure (reference evaluate.py:400-408 sentinel)
            # rather than silently dropping it, which would inflate metrics
            unbucketable.append(i)
            print(f"| WARNING: complex {ds.names[i]} exceeds every size "
                  f"bucket; recording rmsd=10000, confidence=-10000")

    no_overlap = None
    if getattr(args, "no_overlap_names_path", None):
        with open(args.no_overlap_names_path) as f:
            no_overlap = {line.strip() for line in f if line.strip()}

    all_metrics = []
    for bi, idxs in sorted(per_bucket.items()):
        caps = buckets[bi]
        # pack several same-bucket complexes x poses into one program
        # (lifts small-complex throughput vs the reference's one-complex
        # host loop, evaluate.py:221)
        S = args.samples_per_complex
        pack_n = max(1, args.eval_batch_size // S)
        batches, packs, metas, cnames = [], [], [], []
        for g0 in range(0, len(idxs), pack_n):
            group = idxs[g0 : g0 + pack_n]
            recs, pack = [], []
            for j, i in enumerate(group):
                rec = ds[i]
                recs.extend(replicate_record(rec, S))
                # true atomic numbers stored at featurization time; the
                # vocabulary-index fallback only covers pre-lig_z caches
                elements = rec.get("lig_z")
                if elements is None:
                    elements = rec["lig_x"][:, 0] + 1
                metas.append({"elements": elements, "bonds": rec["bonds"][::2]})
                cnames.append(str(rec.get("name", i)))
                pack.append((j * S, S, len(metas) - 1))
            batches.append(collate(recs, caps, esm_dim=score_cfg.esm_embedding_dim))
            packs.append(pack)

        score_model_view, variables, latent_fn, _, _ = build_score_runtime(
            args.model_dir, caps, tag=args.ckpt,
            latent_temperature=getattr(args, "gumbel_latent_temperature", 0.01),
        )

        conf_model = conf_vars = None
        if args.confidence_model_dir:
            conf_run = load_config(args.confidence_model_dir)
            conf_cfg = cfg_from_dict(conf_run["confidence_model"], ScoreModelConfig)
            conf_model = AllAtomScoreModel(cfg=conf_cfg, caps=caps) if conf_cfg.all_atoms \
                else TensorProductScoreModel(cfg=conf_cfg, caps=caps)
            conf_vars = restore_variables(args.confidence_model_dir,
                                          args.confidence_ckpt, use_ema=False)

        if enc_cfg is not None and args.ar_model_dir:
            # AR latents replace the oracle-encoder latents (one shared
            # construction across evaluate/dock/serve: build_ar_latent_fn)
            from ..train.loading import build_ar_latent_fn

            single = all(len(p) == 1 for p in packs)
            oracle_latent_fn = latent_fn
            ar_latent_fn = build_ar_latent_fn(
                args.ar_model_dir, score_cfg, caps, ar_ckpt=args.ar_ckpt,
                softmax_latent_temperature=getattr(
                    args, "softmax_latent_temperature", 1.0),
                shared_rec=single,
            )

            # --oracle keeps encoder latents; the AR model is still loaded
            # for --compute_ar_accuracy (reference evaluate.py:281)
            if not getattr(args, "oracle", False):
                latent_fn = ar_latent_fn

            if getattr(args, "compute_ar_accuracy", False):
                # fraction of latent slots where the AR prior picks the same
                # anchor node as the oracle encoder on the TRUE pose
                # (reference utils/sampling.py:90-101 ar_accuracy)
                hits = n_slots = 0
                for bb in batches:
                    k = jax.random.PRNGKey(17)
                    o_l, o_r = oracle_latent_fn(bb, k)
                    a_l, a_r = ar_latent_fn(bb, k)
                    o = np.concatenate([np.asarray(o_l), np.asarray(o_r)], 1).argmax(1)
                    a = np.concatenate([np.asarray(a_l), np.asarray(a_r)], 1).argmax(1)
                    gm = np.asarray(bb.graph_mask, bool)
                    hits += int((o[gm] == a[gm]).sum())
                    n_slots += int(gm.sum() * o.shape[-1])
                print(f"HAPPENING | ar_accuracy={hits / max(n_slots, 1):.3f} "
                      f"(bucket {bi})")

        m, arrays = evaluate_complexes(
            score_model_view, variables, batches, scfg, sigma,
            jax.random.PRNGKey(bi), latent_fn=latent_fn,
            confidence_model=conf_model, confidence_variables=conf_vars,
            lig_meta=metas, out_dir=os.path.join(args.out_dir, f"bucket{bi}"),
            save_visualisation=args.save_visualisation,
            batch_packs=packs, names=cnames, no_overlap_names=no_overlap,
            mesh=mesh, limit_failures=args.limit_failures,
            no_model=args.no_model, return_arrays=True,
        )
        m["n_complexes"] = len(idxs)
        all_metrics.append((m, arrays))

    # POOL the raw per-complex arrays across buckets, then aggregate once:
    # medians/percentiles over a pooled sample, not a weighted mean of
    # per-bucket medians (reference evaluate.py:420-585 semantics).  Pose
    # counts match across buckets (same samples_per_complex), so rows stack.
    S0 = args.samples_per_complex
    empty = np.zeros((0, S0))
    total = sum(m["n_complexes"] for m, _ in all_metrics)
    rmsds = np.vstack([a["rmsds"] for _, a in all_metrics] or [empty])
    confs = np.vstack([a["confidences"] for _, a in all_metrics] or [empty])
    cents = np.vstack([a["centroid_dists"] for _, a in all_metrics] or [empty])
    names_all = [n for _, a in all_metrics for n in a["names"]]
    run_times = np.concatenate(
        [a["run_times"] for _, a in all_metrics] or [np.zeros(0)])
    clash = np.concatenate([a["clash"] for _, a in all_metrics] or [np.zeros(0)])
    self_ints = [a["self_int"] for _, a in all_metrics if a["self_int"] is not None]
    has_conf = any(a["has_confidence"] for _, a in all_metrics)
    if unbucketable:
        # sentinel rows for complexes no bucket could hold
        S = rmsds.shape[1]
        k = len(unbucketable)
        rmsds = np.vstack([rmsds, np.full((k, S), 10000.0)])
        confs = np.vstack([confs, np.full((k, S), -10000.0)])
        cents = np.vstack([cents, np.full((k, S), 10000.0)])
        names_all += [ds.names[i] for i in unbucketable]
        # NaN, not 0.0: these complexes never ran, and a zero would read as a
        # real (impossibly fast) measurement and deflate the timing aggregate
        run_times = np.concatenate([run_times, np.full(k, np.nan)])
        total += k
    overlap_mask = (np.asarray([n in no_overlap for n in names_all])
                    if no_overlap else None)
    merged = aggregate(rmsds, confs if has_conf else None, cents,
                       no_overlap_mask=overlap_mask)
    merged["run_times_mean"] = float(np.nanmean(run_times)) if len(run_times) else 0.0
    merged["run_times_std"] = float(np.nanstd(run_times)) if len(run_times) else 0.0
    merged["steric_clash_fraction"] = (
        100 * float(clash.mean()) if len(clash) else None)
    merged["self_intersect_fraction"] = (
        100 * float(np.concatenate(self_ints).mean()) if self_ints else None)
    overflow: dict[str, float] = {}
    for m, _ in all_metrics:
        for k, v in (m.get("edge_overflow") or {}).items():
            overflow[k] = overflow.get(k, 0) + v
    merged["edge_overflow"] = overflow
    merged["n_complexes"] = total
    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "rmsds.npy"), rmsds)
    np.save(os.path.join(args.out_dir, "confidences.npy"), confs)
    np.save(os.path.join(args.out_dir, "centroid_distances.npy"), cents)
    np.save(os.path.join(args.out_dir, "run_times.npy"), run_times)
    np.save(os.path.join(args.out_dir, "complex_names.npy"), np.asarray(names_all))
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(merged, f, indent=2)
    return merged


def main(argv=None):
    args = parse_args(argv)
    sigma = SigmaSchedule()
    scfg = SamplerConfig(
        inference_steps=args.inference_steps,
        actual_steps=args.actual_steps,
        ode=args.ode,
        no_random=args.no_random,
        no_final_step_noise=args.no_final_step_noise,
        temp_sampling=tuple(args.temp_sampling),
        temp_psi=tuple(args.temp_psi),
        temp_sigma_data=tuple(args.temp_sigma_data),
        cfg_weight=args.classifier_free_guidance_weight,
        **({"cfg_start": args.cfg_start} if args.cfg_start is not None else {}),
        **({"cfg_end": args.cfg_end} if args.cfg_end is not None else {}),
        return_trajectory=args.save_visualisation,
    )

    if args.synthetic:
        caps = GraphCaps(
            max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
            rec_edge_cap=32 * 8, tor_cap=4, tor_edge_cap=48,
            # both families keep every lig<->residue pair in range at t=1
            # (the CG dynamic cross cutoff is huge at sigma_max); 16*32=512
            # covers the whole pair grid, so the audit below stays at zero
            cross_cap=512,
            max_atoms=128, atom_edge_cap=128 * 8, la_cap=160,
        )
        cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
            latent_dim=0, latent_droprate=0.0, all_atoms=args.all_atoms,
        )
        if args.all_atoms:
            # all-atom SCORE model as the diffusion model (the reference
            # trains/evaluates this family via --all_atoms, model_utils.py:26)
            from ..models.all_atom_score_model import AllAtomScoreModel

            model = AllAtomScoreModel(cfg=cfg, caps=caps)
        else:
            model = TensorProductScoreModel(cfg=cfg, caps=caps)
        batches = [
            make_complex_batch(
                seed=s, batch=args.samples_per_complex, n_lig=10, n_res=24,
                caps=caps, esm_dim=16, c_alpha_max_neighbors=8, same_complex=True,
                all_atoms=args.all_atoms,
                **({"atoms_per_res": 4} if args.all_atoms else {}),
            )
            for s in range(args.n_complexes)
        ]
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
        # ligand bonds + elements from the synthetic records so the full
        # metric family (symmetry RMSD, self_intersect_fraction) is computed
        # exactly as the real-data path does (reference evaluate.py:331-338);
        # the synthetic bond list is bidirectional, first half is unique
        metas = []
        for b in batches:
            lm = np.asarray(b.lig_mask[0])
            bm = np.asarray(b.lig_bonds.mask[0])
            src = np.asarray(b.lig_bonds.src[0])[bm]
            dst = np.asarray(b.lig_bonds.dst[0])[bm]
            bonds = np.stack([src, dst], 1)[: len(src) // 2]
            metas.append({"elements": np.asarray(b.lig_x[0])[lm, 0] + 1,
                          "bonds": bonds})
        conf_model = conf_vars = None
        if args.synthetic_confidence:
            import dataclasses

            conf_cfg = dataclasses.replace(
                cfg, confidence_mode=True, num_confidence_outputs=1)
            if args.all_atoms:
                from ..models.all_atom_score_model import AllAtomScoreModel

                conf_model = AllAtomScoreModel(cfg=conf_cfg, caps=caps)
            else:
                conf_model = TensorProductScoreModel(cfg=conf_cfg, caps=caps)
            conf_vars = jax.jit(conf_model.init)(
                jax.random.PRNGKey(2), batches[0])
        mesh = None
        if args.n_devices > 1:
            from ..parallel import make_mesh

            mesh = make_mesh(args.n_devices)
        metrics = evaluate_complexes(
            model, variables, batches, scfg, sigma, jax.random.PRNGKey(1),
            out_dir=args.out_dir, save_visualisation=args.save_visualisation,
            confidence_model=conf_model, confidence_variables=conf_vars,
            lig_meta=metas, mesh=mesh, limit_failures=args.limit_failures,
            no_model=args.no_model,
        )
    else:
        metrics = evaluate_real(args, scfg, sigma)

    print(json.dumps(metrics, indent=2))
    from ..utils.wandb_log import maybe_wandb

    wandb_run = maybe_wandb(args.wandb, args.project, "evaluate", vars(args))
    if wandb_run:
        wandb_run.log({k: v for k, v in metrics.items()
                       if isinstance(v, (int, float)) and v is not None})
    return metrics


if __name__ == "__main__":
    main()
