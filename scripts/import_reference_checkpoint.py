"""Import a reference DisCo-DiffDock torch checkpoint into a framework run dir.

Usage (from the repo root):

    python scripts/import_reference_checkpoint.py \
        --checkpoint /path/to/disco_diffdockS_score_model/best_ema_model.pt \
        --out_dir workdir/imported_score

    # AR prior: the trunk hyperparameters come from the ORIGINAL score run
    python scripts/import_reference_checkpoint.py \
        --checkpoint /path/to/disco_diffdockS_ar_model/best_ema_model.pt \
        --score_yml /path/to/disco_diffdockS_score_model/model_parameters.yml \
        --out_dir workdir/imported_ar

The reference run's ``model_parameters.yml`` is read from the checkpoint's
directory unless ``--reference_yml`` is given.  The output is a run dir this
framework's eval/dock/serve drivers consume directly (self-describing
``model_parameters.yml`` + an orbax ``ckpt_best`` holding params, batch stats
and an EMA shadow equal to the imported params):

    python -m disco_diffdock_tpu.eval.evaluate --model_dir workdir/imported_score ...
    python -m disco_diffdock_tpu.eval.dock --model_dir workdir/imported_score ...

Family is auto-detected from the state_dict keys (ModelWrapper /
PretrainedScoreEncoder / all-atom / bare score model); reference hyperparameter
names are translated per utils/model_utils.py:25-152's constructor wiring.
ESM embedding width and the old-vs-new atom-encoder variant are inferred from
the checkpoint tensors themselves (the reference ymls store neither: the yml
carries only ``esm_embeddings_path``, and configs predating
``use_old_atom_encoder`` default to the OLD encoder, model_utils.py:62).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# pure host-side conversion: keep orbax saves off the (tunneled) TPU --
# per-array device transfers carry ~28 ms RTT each on the axon platform
jax.config.update("jax_platforms", "cpu")

import numpy as np
import yaml

from disco_diffdock_tpu.config import EncoderConfig, ScoreModelConfig
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.interop.torch_import import import_state_dict
from disco_diffdock_tpu.train.checkpoints import save_config


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and all(
        hasattr(v, "shape") for v in obj["model"].values()
    ):
        # full-state checkpoint (last_model.pt: {epoch, model, optimizer, ema})
        obj = obj["model"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}


def detect_kind(sd: dict) -> str:
    keys = sd.keys()
    if any(k.startswith("pretrained_score_model.") for k in keys):
        return "ar"
    if any(k.startswith("score_model.") or k.startswith("encoder.") for k in keys):
        return "wrapper"
    if any(k.startswith("atom_node_embedding.") for k in keys):
        return "all_atom"
    return "score"


def detect_old_encoder(sd: dict, prefix: str = "") -> bool:
    if f"{prefix}lig_node_embedding.linear.weight" in sd:
        return True
    if f"{prefix}lig_node_embedding.additional_features_embedder.weight" in sd:
        return False
    # encoders may have no ligand extras at all; check the receptor side
    if f"{prefix}rec_node_embedding.lm_embedding_layer.weight" in sd:
        return True
    return False


def infer_esm_dim(sd: dict, prefix: str, ns: int, sigma_embed_dim: int,
                  lat_extra: int, old: bool) -> int:
    if old:
        key = f"{prefix}rec_node_embedding.lm_embedding_layer.weight"
        return sd[key].shape[1] - ns if key in sd else 0
    key = f"{prefix}rec_node_embedding.additional_features_embedder.weight"
    if key not in sd:
        return 0
    return int(sd[key].shape[1]) - ns - sigma_embed_dim - lat_extra


def score_cfg_from_reference(y: dict, sd: dict, prefix: str = "",
                             confidence: bool = False) -> ScoreModelConfig:
    """Translate a reference training yml (+ checkpoint shapes) into our
    ScoreModelConfig, following get_model's wiring (utils/model_utils.py:25-69)."""
    latent_dim = int(y.get("latent_dim", 0) or 0)
    latent_vocab = int(y.get("latent_vocab", 0) or 0)
    old = detect_old_encoder(sd, prefix)
    ns = int(y["ns"])
    sigma = int(y.get("sigma_embed_dim", 32))
    esm_dim = infer_esm_dim(sd, prefix, ns, sigma, latent_dim * latent_vocab, old)
    cutoffs = y.get("rmsd_classification_cutoff")
    return ScoreModelConfig(
        ns=ns,
        nv=int(y["nv"]),
        num_conv_layers=int(y["num_conv_layers"]),
        sh_lmax=int(y.get("sh_lmax", 2)),
        sigma_embed_dim=sigma,
        distance_embed_dim=int(y.get("distance_embed_dim", 32)),
        cross_distance_embed_dim=int(y.get("cross_distance_embed_dim", 32)),
        lig_max_radius=float(y.get("max_radius", 5.0)),
        cross_max_distance=float(y.get("cross_max_distance", 80.0)),
        dynamic_max_cross=bool(y.get("dynamic_max_cross", False)),
        use_second_order_repr=bool(y.get("use_second_order_repr", False)),
        batch_norm=not bool(y.get("no_batch_norm", False)),
        dropout=float(y.get("dropout", 0.0)),
        scale_by_sigma=bool(y.get("scale_by_sigma", True)),
        no_torsion=bool(y.get("no_torsion", False)),
        embedding_type=y.get("embedding_type", "sinusoidal"),
        embedding_scale=float(y.get("embedding_scale", 1000)),
        esm_embedding_dim=esm_dim,
        confidence_mode=confidence,
        use_old_atom_encoder=old,
        confidence_dropout=float(y.get("confidence_dropout", 0.0) or 0.0),
        confidence_no_batchnorm=bool(y.get("confidence_no_batchnorm", False)),
        num_confidence_outputs=(len(cutoffs) + 1 if isinstance(cutoffs, list) else 1),
        all_atoms=bool(y.get("all_atoms", False)),
        latent_dim=latent_dim,
        latent_vocab=latent_vocab if latent_dim > 0 else 1,
        latent_droprate=float(y.get("latent_droprate", 0.0) or 0.0),
        latent_cross_attention=bool(y.get("latent_cross_attention", False)),
        new_cross_attention=bool(y.get("new_cross_attention", False)),
        cross_attention_heads=int(y.get("cross_attention_heads", 1)),
        cross_attention_dim=int(y.get("cross_attention_dim", 64)),
    )


def encoder_cfg_from_reference(y: dict, sd: dict) -> EncoderConfig:
    """TPEncoder wiring from get_model (utils/model_utils.py:70-93): shares
    sh_lmax/dropout/batch-norm/distance dims with the score model, uses the
    encoder_* keys for the rest."""
    latent_dim = int(y.get("latent_dim", 0) or 0)
    latent_vocab = int(y.get("latent_vocab", 1) or 1)
    ns = int(y["encoder_ns"])
    key = "encoder.rec_node_embedding.additional_features_embedder.weight"
    esm_dim = int(sd[key].shape[1]) - ns if key in sd else 0
    return EncoderConfig(
        ns=ns,
        nv=int(y["encoder_nv"]),
        num_conv_layers=int(y["encoder_num_conv_layers"]),
        sh_lmax=int(y.get("sh_lmax", 2)),
        distance_embed_dim=int(y.get("distance_embed_dim", 32)),
        cross_distance_embed_dim=int(y.get("cross_distance_embed_dim", 32)),
        lig_max_radius=float(y.get("max_radius", 5.0)),
        cross_max_distance=float(y.get("encoder_cross_max_distance", 30.0)),
        use_second_order_repr=bool(y.get("use_second_order_repr", False)),
        batch_norm=not bool(y.get("no_batch_norm", False)),
        dropout=float(y.get("dropout", 0.0)),
        esm_embedding_dim=esm_dim,
        latent_dim=latent_dim,
        latent_vocab=latent_vocab,
        latent_no_batchnorm=bool(y.get("latent_no_batchnorm", False)),
        latent_dropout=float(y.get("latent_dropout", 0.0) or 0.0),
        latent_hidden_dim=int(y.get("latent_hidden_dim", 128)),
        latent_virtual_nodes=bool(y.get("latent_virtual_nodes", False)),
        latent_nodes_residual=bool(y.get("latent_nodes_residual", False)),
    )


def warn_sigma_mismatch(y: dict) -> None:
    ours = SigmaSchedule()
    for k in ("tr_sigma_min", "tr_sigma_max", "rot_sigma_min", "rot_sigma_max",
              "tor_sigma_min", "tor_sigma_max"):
        if k in y and y[k] is not None and not np.isclose(
            float(y[k]), getattr(ours, k)
        ):
            print(f"WARNING | reference {k}={y[k]} != framework default "
                  f"{getattr(ours, k)}; pass matching sigma flags at eval time")


def save_run_dir(out_dir: str, variables: dict, configs: dict) -> None:
    import orbax.checkpoint as ocp

    os.makedirs(out_dir, exist_ok=True)
    save_config(out_dir, **configs)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        # eval tags best_ema/best both resolve through this shadow
        "ema": {"shadow": variables["params"]},
    }
    path = os.path.join(os.path.abspath(out_dir), "ckpt_best")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True, help=".pt state_dict path")
    p.add_argument("--reference_yml", default=None,
                   help="reference run's model_parameters.yml "
                        "(default: next to the checkpoint)")
    p.add_argument("--score_yml", default=None,
                   help="for AR checkpoints: the ORIGINAL score run's yml "
                        "(reference original_model_dir)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--kind", default="auto",
                   choices=["auto", "score", "wrapper", "encoder", "ar", "all_atom"])
    args = p.parse_args(argv)

    sd = load_torch_state_dict(args.checkpoint)
    yml_path = args.reference_yml or os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)), "model_parameters.yml"
    )
    with open(yml_path) as f:
        y = yaml.safe_load(f)
    kind = detect_kind(sd) if args.kind == "auto" else args.kind
    print(f"HAPPENING | importing {args.checkpoint} as kind={kind} "
          f"({len(sd)} tensors)")

    if kind == "ar":
        if not args.score_yml:
            cand = os.path.join(str(y.get("original_model_dir", "")),
                                "model_parameters.yml")
            if not os.path.exists(cand):
                raise SystemExit(
                    "AR checkpoints wrap a pretrained score trunk; pass "
                    "--score_yml pointing at the original score run's "
                    "model_parameters.yml (reference original_model_dir)"
                )
            args.score_yml = cand
        with open(args.score_yml) as f:
            ys = yaml.safe_load(f)
        score_cfg = score_cfg_from_reference(ys, sd, prefix="pretrained_score_model.")
        variables = import_state_dict(
            sd, "ar", score_cfg=score_cfg,
            latent_no_batchnorm=bool(y.get("latent_no_batchnorm", False)),
        )
        ar_extra = {
            "ns": int(y["ns"]),
            "latent_hidden_dim": int(y.get("latent_hidden_dim", 128)),
            "latent_no_batchnorm": bool(y.get("latent_no_batchnorm", False)),
            "latent_dropout": float(y.get("latent_dropout", 0.0) or 0.0),
        }
        save_run_dir(args.out_dir, variables, dict(ar_model=score_cfg, ar=ar_extra))
        warn_sigma_mismatch(ys)
    elif kind == "wrapper":
        confidence = any(k.startswith("score_model.confidence_predictor.") for k in sd)
        score_cfg = score_cfg_from_reference(y, sd, prefix="score_model.",
                                             confidence=confidence)
        enc_cfg = (encoder_cfg_from_reference(y, sd)
                   if any(k.startswith("encoder.") for k in sd) else None)
        variables = import_state_dict(sd, "wrapper", score_cfg=score_cfg,
                                      enc_cfg=enc_cfg)
        cfgs = dict(score_model=score_cfg)
        if enc_cfg is not None:
            cfgs["encoder"] = enc_cfg
        save_run_dir(args.out_dir, variables, cfgs)
        warn_sigma_mismatch(y)
    elif kind == "encoder":
        enc_cfg = encoder_cfg_from_reference(
            {**y, "encoder_ns": y.get("encoder_ns", y.get("ns")),
             "encoder_nv": y.get("encoder_nv", y.get("nv")),
             "encoder_num_conv_layers": y.get("encoder_num_conv_layers",
                                              y.get("num_conv_layers"))},
            {f"encoder.{k}": v for k, v in sd.items()},
        )
        variables = import_state_dict(sd, "encoder", enc_cfg=enc_cfg)
        save_run_dir(args.out_dir, variables, dict(encoder=enc_cfg))
    else:  # score / all_atom
        confidence = any(k.startswith("confidence_predictor.") for k in sd)
        score_cfg = score_cfg_from_reference(y, sd, confidence=confidence)
        k = "all_atom" if (kind == "all_atom" or score_cfg.all_atoms) else "score"
        variables = import_state_dict(sd, k, score_cfg=score_cfg)
        key = "confidence_model" if confidence else "score_model"
        save_run_dir(args.out_dir, variables, {key: score_cfg})
        warn_sigma_mismatch(y)

    n_leaves = len([1 for _ in _iter_leaves(variables["params"])])
    print(f"HAPPENING | wrote {args.out_dir} (ckpt_best, {n_leaves} param arrays)")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
