"""Rebuild trained models from self-describing run dirs (yml + checkpoint).

The reference's downstream tools reconstruct models purely from
``model_parameters.yml`` + ``.pt`` checkpoints (evaluate.py:107-199,
confidence/confidence_train.py:288-294, autoregressive/train_ar.py:107-131).
This module is the TPU counterpart: one place that turns a run dir into a
model + restored variables + (for DisCo wrappers) a latent function and a
score-forward adapter that ``sampling()`` can drive.
"""
from __future__ import annotations

import dataclasses

from ..config import EncoderConfig, GraphCaps, ScoreModelConfig
from ..models.score_model import TensorProductScoreModel
from ..models.wrapper import ModelWrapper
from .checkpoints import CheckpointManager, load_config


def cfg_from_dict(d: dict, cls):
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in fields})


def load_run_configs(run_dir: str):
    """Returns (score_cfg, enc_cfg_or_None, caps_or_None) from a run dir."""
    run_cfg = load_config(run_dir)
    key = "score_model" if "score_model" in run_cfg else (
        "confidence_model" if "confidence_model" in run_cfg else "ar_model"
    )
    score_cfg = cfg_from_dict(run_cfg[key], ScoreModelConfig)
    enc_cfg = cfg_from_dict(run_cfg["encoder"], EncoderConfig) if "encoder" in run_cfg else None
    caps = cfg_from_dict(run_cfg["caps"], GraphCaps) if "caps" in run_cfg else None
    return score_cfg, enc_cfg, caps


def ar_kwargs_from_run(run_dir: str) -> dict:
    """AR-specific PretrainedScoreEncoder kwargs stored in an AR run dir's
    yml under the ``ar`` key (reference quirk: the AR model's own ns may
    differ from the score trunk's, pretrained_score_encoder.py:15 -- the
    shipped AR uses ns=16 on the ns=24 trunk).  Empty for pre-quirk runs."""
    try:
        cfg = load_config(run_dir)
    except FileNotFoundError:
        return {}
    ar = cfg.get("ar") or {}
    allowed = {"ns", "latent_hidden_dim", "latent_no_batchnorm", "latent_dropout"}
    return {k: v for k, v in ar.items() if k in allowed and v is not None}


def ar_no_randomness_from_run(run_dir: str) -> bool:
    """Whether the AR run trained with no_randomness (rotated raw-RDKit
    conditioning pose, the shipped recipe) — consumers must build the same
    ``ar_pos`` at inference (utils/sampling.py:36-46).  Defaults True."""
    try:
        cfg = load_config(run_dir)
    except FileNotFoundError:
        return True
    return bool((cfg.get("ar") or {}).get("no_randomness", True))


def merge_matching(template, restored):
    """Non-strict parameter merge (reference ``non_strict_loading``,
    train.py:131-138): take restored leaves whose path and shape match the
    template; keep freshly-initialized values for everything else.  Lets a
    tweaked architecture warm-start from an older run's checkpoint."""
    if isinstance(template, dict):
        if not isinstance(restored, dict):
            return template
        return {
            k: merge_matching(v, restored[k]) if k in restored else v
            for k, v in template.items()
        }
    t_shape = getattr(template, "shape", None)
    r_shape = getattr(restored, "shape", None)
    return restored if t_shape == r_shape else template


def restore_variables(run_dir: str, tag: str, use_ema: bool = True):
    """Restore ``{"params", "batch_stats"}`` from a run dir (EMA params by
    default).  Template-free: reads the raw checkpoint pytree, so it works
    regardless of which optimizer the run was trained with.

    Falls back through tag -> "best_ema" -> "best" -> "last" so small fixture
    runs that never hit the best-inference path still load.
    """
    ckpt = CheckpointManager(run_dir)
    for t in (tag, "best_ema", "best", "last"):
        if ckpt.exists(t):
            raw = ckpt.restore_raw(t)
            break
    else:
        raise FileNotFoundError(f"no checkpoint in {run_dir}")
    params = raw["ema"]["shadow"] if use_ema else raw["params"]
    return {"params": params, "batch_stats": raw.get("batch_stats") or {}}


def build_score_runtime(
    run_dir: str,
    caps: GraphCaps,
    tag: str = "best_ema_inference",
    use_ema: bool = True,
    latent_temperature: float = 0.01,
):
    """Load a trained score run (plain or DisCo wrapper) for inference.

    Returns ``(score_view, variables, latent_fn, score_cfg, enc_cfg)`` where
    ``score_view.apply(variables, batch, latent=..., unconditional=...)`` is
    what ``sampling()`` drives, and ``latent_fn(batch, key)`` produces oracle
    -encoder latents (None for latent-free models).
    """
    score_cfg, enc_cfg, _ = load_run_configs(run_dir)
    if enc_cfg is not None:
        model = ModelWrapper(
            score_cfg=score_cfg, encoder_cfg=enc_cfg, caps=caps,
            latent_droprate=score_cfg.latent_droprate,
        )
        variables = restore_variables(run_dir, tag, use_ema)

        def latent_fn(batch, key):
            return model.apply(
                variables, batch,
                method=lambda m, b: m.encoder(
                    b, latent_temperature=latent_temperature, apply_gumbel=True,
                    deterministic=True, use_running_average=True,
                ),
                rngs={"gumbel": key},
            )

        class _ScoreView:
            @staticmethod
            def apply(v, b, latent=None, unconditional=None,
                      deterministic=True, use_running_average=True,
                      shared_rec=False, **kw):
                # extra kwargs (e.g. mutable=["intermediates"] for the edge
                # -capacity audit) forward to flax apply
                return model.apply(
                    v, b,
                    method=lambda m, bb: m.score_model(
                        bb, latent=latent, unconditional=unconditional,
                        deterministic=deterministic,
                        use_running_average=use_running_average,
                        shared_rec=shared_rec,
                    ),
                    **kw,
                )

        return _ScoreView, variables, latent_fn, score_cfg, enc_cfg

    if score_cfg.all_atoms:
        # all-atom SCORE run (train_score --all_atoms, model_utils.py:26-27)
        from ..models.all_atom_score_model import AllAtomScoreModel

        model = AllAtomScoreModel(cfg=score_cfg, caps=caps)
    else:
        model = TensorProductScoreModel(cfg=score_cfg, caps=caps)
    variables = restore_variables(run_dir, tag, use_ema)
    return model, variables, None, score_cfg, None


def build_ar_latent_fn(
    ar_model_dir: str,
    score_cfg,
    caps: GraphCaps,
    ar_ckpt: str = "best",
    softmax_latent_temperature: float = 1.0,
    shared_rec: bool = True,
):
    """``latent_fn(batch, key)`` drawing DisCo latents from a trained AR
    prior: re-pose the batch per the run's ar_pos semantics
    (utils/sampling.py:36-46), then sequentially decode anchors with the
    frozen-trunk AR model (encode_ar).  One implementation shared by
    evaluate / dock / serve so the conditioning semantics cannot drift
    between the CLIs.  ``shared_rec=True`` is the one-complex-S-poses fast
    path; pass False for packed multi-complex programs."""
    import jax

    from ..models.ar import PretrainedScoreEncoder, encode_ar
    from ..sampling import ar_conditioning_pose

    ar_model = PretrainedScoreEncoder(
        score_cfg=score_cfg, caps=caps, latent_dim=1,
        input_latent_dim=score_cfg.latent_dim,
        **ar_kwargs_from_run(ar_model_dir),
    )
    ar_vars = restore_variables(ar_model_dir, ar_ckpt, use_ema=False)
    ar_no_rand = ar_no_randomness_from_run(ar_model_dir)

    def latent_fn(b, key):
        k_pose, key = jax.random.split(key)
        b = ar_conditioning_pose(b, k_pose, ar_no_rand)

        def apply_fn(bb, lat, dec):
            return ar_model.apply(ar_vars, bb, lat, dec,
                                  deterministic=True,
                                  use_running_average=True,
                                  shared_rec=shared_rec)

        return encode_ar(apply_fn, b, key, score_cfg.latent_dim,
                         softmax_latent_temperature)

    return latent_fn
