"""Export a framework run dir as a reference-loadable torch checkpoint.

The exact inverse of scripts/import_reference_checkpoint.py: models trained
in this framework become ``.pt`` state_dicts + ``model_parameters.yml`` that
the reference's own drivers (evaluate.py:107-199, confidence_train.py:288-294,
train_ar.py:107-131) reconstruct directly — weight layouts are permuted back
into e3nn's instruction-ordered convention with the per-path basis sign
corrections (disco_diffdock_tpu/interop/).

    python scripts/export_to_reference.py --run_dir workdir/my_score_run \
        --out_dir /tmp/exported [--tag best_ema_inference] [--no_ema]

AR runs materialize only the frozen score trunk (the reference's
PretrainedScoreEncoder state_dict additionally carries the trunk's unused
tr/rot/tor head weights, pretrained_score_encoder.py:9-27); pass
``--score_run_dir`` pointing at the original score run to graft those head
tensors so the reference can load the export strictly.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# pure host-side conversion: keep orbax restores off the (tunneled) TPU --
# per-array device transfers carry ~28 ms RTT each on the axon platform
jax.config.update("jax_platforms", "cpu")

import numpy as np
import yaml

from disco_diffdock_tpu.config import EncoderConfig, ScoreModelConfig
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.interop.torch_import import (
    AR_HEAD_DROP_PREFIXES,
    export_state_dict,
)
from disco_diffdock_tpu.train.checkpoints import load_config
from disco_diffdock_tpu.train.loading import (
    ar_kwargs_from_run,
    cfg_from_dict,
    restore_variables,
)


def reference_yml_from_cfg(score_cfg: ScoreModelConfig,
                           enc_cfg: "EncoderConfig | None" = None) -> dict:
    """ScoreModelConfig -> the yml keys the reference's get_model reads
    (utils/model_utils.py:25-93); inverse of the import CLI's translation."""
    y = {
        "ns": score_cfg.ns,
        "nv": score_cfg.nv,
        "num_conv_layers": score_cfg.num_conv_layers,
        "sh_lmax": score_cfg.sh_lmax,
        "sigma_embed_dim": score_cfg.sigma_embed_dim,
        "distance_embed_dim": score_cfg.distance_embed_dim,
        "cross_distance_embed_dim": score_cfg.cross_distance_embed_dim,
        "max_radius": score_cfg.lig_max_radius,
        "cross_max_distance": score_cfg.cross_max_distance,
        "dynamic_max_cross": score_cfg.dynamic_max_cross,
        "use_second_order_repr": score_cfg.use_second_order_repr,
        "no_batch_norm": not score_cfg.batch_norm,
        "dropout": score_cfg.dropout,
        "scale_by_sigma": score_cfg.scale_by_sigma,
        "no_torsion": score_cfg.no_torsion,
        "embedding_type": score_cfg.embedding_type,
        "embedding_scale": score_cfg.embedding_scale,
        "all_atoms": score_cfg.all_atoms,
        "use_old_atom_encoder": score_cfg.use_old_atom_encoder,
        "latent_dim": score_cfg.latent_dim,
        "latent_vocab": score_cfg.latent_vocab if score_cfg.latent_dim else 0,
        "latent_droprate": score_cfg.latent_droprate,
        "latent_cross_attention": score_cfg.latent_cross_attention,
        "new_cross_attention": score_cfg.new_cross_attention,
        "cross_attention_heads": score_cfg.cross_attention_heads,
        "cross_attention_dim": score_cfg.cross_attention_dim,
    }
    if score_cfg.confidence_mode:
        y["confidence_dropout"] = score_cfg.confidence_dropout
        y["confidence_no_batchnorm"] = score_cfg.confidence_no_batchnorm
        if score_cfg.num_confidence_outputs > 1:
            # arity is what matters: N outputs <=> N-1 cutoffs (model_utils.py:46)
            y["rmsd_classification_cutoff"] = [2.0] * (
                score_cfg.num_confidence_outputs - 1
            )
    if score_cfg.esm_embedding_dim > 0:
        # the reference keys ESM usage off this path's presence and hardcodes
        # the esm2_t33_650M width (1280); the actual width is baked into the
        # exported rec-embedding tensors
        y["esm_embeddings_path"] = "data/embeddings_output"
        if score_cfg.esm_embedding_dim != 1280:
            print(f"WARNING | esm_embedding_dim={score_cfg.esm_embedding_dim} "
                  "!= the reference's hardcoded 1280; the reference model "
                  "constructor must be adjusted to load this export")
    if enc_cfg is not None:
        y.update({
            "encoder_ns": enc_cfg.ns,
            "encoder_nv": enc_cfg.nv,
            "encoder_num_conv_layers": enc_cfg.num_conv_layers,
            "encoder_cross_max_distance": enc_cfg.cross_max_distance,
            "latent_no_batchnorm": enc_cfg.latent_no_batchnorm,
            "latent_dropout": enc_cfg.latent_dropout,
            "latent_hidden_dim": enc_cfg.latent_hidden_dim,
            "latent_virtual_nodes": enc_cfg.latent_virtual_nodes,
            "latent_nodes_residual": enc_cfg.latent_nodes_residual,
            "encoder_no_esm": enc_cfg.esm_embedding_dim == 0,
        })
    sched = SigmaSchedule()
    for k in ("tr_sigma_min", "tr_sigma_max", "rot_sigma_min", "rot_sigma_max",
              "tor_sigma_min", "tor_sigma_max"):
        y[k] = float(getattr(sched, k))
    return y


def to_torch(sd: dict) -> dict:
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
            for k, v in sd.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--run_dir", required=True, help="framework run dir")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--tag", default="best_ema_inference",
                   help="checkpoint tag (falls back best_ema -> best -> last)")
    p.add_argument("--no_ema", action="store_true",
                   help="export raw params instead of the EMA shadow")
    p.add_argument("--score_run_dir", default=None,
                   help="for AR runs: the original score run, to graft the "
                        "trunk head tensors the reference state_dict carries")
    args = p.parse_args(argv)

    run_cfg = load_config(args.run_dir)
    variables = restore_variables(args.run_dir, args.tag, use_ema=not args.no_ema)
    os.makedirs(args.out_dir, exist_ok=True)

    if "ar_model" in run_cfg:
        score_cfg = cfg_from_dict(run_cfg["ar_model"], ScoreModelConfig)
        ar_kw = ar_kwargs_from_run(args.run_dir)
        sd = export_state_dict(
            variables, "ar", score_cfg=score_cfg,
            latent_no_batchnorm=bool(ar_kw.get("latent_no_batchnorm", False)),
        )
        if args.score_run_dir:
            head_vars = restore_variables(args.score_run_dir, args.tag,
                                          use_ema=not args.no_ema)
            head_sd = export_state_dict(head_vars, "score", score_cfg=score_cfg)
            heads = tuple(pfx[len("pretrained_score_model."):]
                          for pfx in AR_HEAD_DROP_PREFIXES)
            n = 0
            for k, v in head_sd.items():
                if k.startswith(heads):
                    sd[f"pretrained_score_model.{k}"] = v
                    n += 1
            print(f"HAPPENING | grafted {n} trunk-head tensors from "
                  f"{args.score_run_dir}")
        else:
            print("WARNING | no --score_run_dir: the export omits the trunk "
                  "head tensors; load it in the reference with strict=False")
        yml = {
            "ns": int(ar_kw.get("ns") or score_cfg.ns),
            "latent_hidden_dim": int(ar_kw.get("latent_hidden_dim", 128)),
            "latent_no_batchnorm": bool(ar_kw.get("latent_no_batchnorm", False)),
            "latent_dropout": float(ar_kw.get("latent_dropout", 0.0)),
            "original_model_dir": args.score_run_dir or "",
        }
    elif "encoder" in run_cfg and "score_model" not in run_cfg:
        enc_cfg = cfg_from_dict(run_cfg["encoder"], EncoderConfig)
        sd = export_state_dict(variables, "encoder", enc_cfg=enc_cfg)
        yml = {f"encoder_{k}" if k in ("ns", "nv", "num_conv_layers") else k: v
               for k, v in dataclasses.asdict(enc_cfg).items()}
    else:
        key = "score_model" if "score_model" in run_cfg else "confidence_model"
        score_cfg = cfg_from_dict(run_cfg[key], ScoreModelConfig)
        enc_cfg = (cfg_from_dict(run_cfg["encoder"], EncoderConfig)
                   if "encoder" in run_cfg else None)
        if enc_cfg is not None:
            sd = export_state_dict(variables, "wrapper", score_cfg=score_cfg,
                                   enc_cfg=enc_cfg)
        elif score_cfg.all_atoms:
            sd = export_state_dict(variables, "all_atom", score_cfg=score_cfg)
        else:
            sd = export_state_dict(variables, "score", score_cfg=score_cfg)
        yml = reference_yml_from_cfg(score_cfg, enc_cfg)

    import torch

    name = "best_model.pt" if args.no_ema else "best_ema_model.pt"
    torch.save(to_torch(sd), os.path.join(args.out_dir, name))
    with open(os.path.join(args.out_dir, "model_parameters.yml"), "w") as f:
        yaml.safe_dump(yml, f)
    print(f"HAPPENING | wrote {args.out_dir}/{name} ({len(sd)} tensors) "
          "+ model_parameters.yml")


if __name__ == "__main__":
    main()
