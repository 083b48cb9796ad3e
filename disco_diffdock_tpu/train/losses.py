"""Score-matching loss in sigma-normalized units.

Parity with ``loss_function`` (utils/training.py:14-61): per-component MSE
with tr scaled by sigma_tr^2, rot normalized by the expected IGSO(3) score
norm, tor normalized by the torus score norm; masked means over the padded
batch/bond axes; "base losses" (target magnitudes) returned for monitoring.
Graph-mask aware so padded graphs in a sharded batch contribute nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom import so3, torus


def score_matching_loss(
    preds,
    targets: dict,
    batch,
    tr_sigma: jnp.ndarray,
    rot_sigma: jnp.ndarray,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
    no_torsion: bool = False,
    apply_mean: bool = True,
    axis_name: str | None = None,
):
    """Returns (loss, aux dict of per-component losses).

    With ``axis_name`` (inside shard_map) the graph/torsion-count
    denominators become cross-shard means, so each shard's loss is exactly
    its contribution to the GLOBAL batch loss: pmean(per-shard losses) ==
    the unsharded loss even when shards carry different torsion counts (the
    reference computes the loss on the gathered full batch after
    DataParallel, utils/training.py:17-53 -- global normalization)."""
    tr_pred, rot_pred, tor_pred = preds
    gm = batch.graph_mask.astype(jnp.float32)
    ng = jnp.sum(gm) + 1e-12
    if axis_name is not None:
        ng = jax.lax.pmean(ng, axis_name)

    def gmean(x):  # (B, k) -> masked scalar mean over graphs and k
        return jnp.sum(jnp.mean(x, axis=-1) * gm) / ng

    tr_loss_per = (tr_pred - targets["tr_score"]) ** 2 * tr_sigma[:, None] ** 2
    tr_base_per = targets["tr_score"] ** 2 * tr_sigma[:, None] ** 2

    rot_norm = so3.score_norm(rot_sigma)[:, None]
    rot_loss_per = ((rot_pred - targets["rot_score"]) / rot_norm) ** 2
    rot_base_per = (targets["rot_score"] / rot_norm) ** 2

    if no_torsion:
        tor_loss = tor_base = jnp.zeros(())
        tor_loss_g = tor_base_g = jnp.zeros_like(gm)
    else:
        tor_norm2 = torus.score_norm(targets["tor_sigma"])[:, None]
        tm = (batch.tor_mask & batch.graph_mask[:, None]).astype(jnp.float32)
        nt = jnp.sum(tm) + 1e-4
        if axis_name is not None:
            nt = jax.lax.pmean(nt, axis_name)
        tor_l = (tor_pred - targets["tor_score"]) ** 2 / tor_norm2 * tm
        tor_b = targets["tor_score"] ** 2 / tor_norm2 * tm
        tor_loss = jnp.sum(tor_l) / nt
        tor_base = jnp.sum(tor_b) / nt
        # per-graph means (test_epoch's apply_mean=False path, training.py:44-53)
        cnt = jnp.sum(tm, -1) + 1e-4
        tor_loss_g = jnp.sum(tor_l, -1) / cnt
        tor_base_g = jnp.sum(tor_b, -1) / cnt

    if apply_mean:
        tr_loss, tr_base = gmean(tr_loss_per), gmean(tr_base_per)
        rot_loss, rot_base = gmean(rot_loss_per), gmean(rot_base_per)
        loss = tr_loss * tr_weight + rot_loss * rot_weight + tor_loss * tor_weight
        aux = dict(
            loss=loss, tr_loss=tr_loss, rot_loss=rot_loss, tor_loss=tor_loss,
            tr_base_loss=tr_base, rot_base_loss=rot_base, tor_base_loss=tor_base,
        )
        return loss, aux
    else:
        tr_g = jnp.mean(tr_loss_per, -1)
        rot_g = jnp.mean(rot_loss_per, -1)
        loss_g = tr_g * tr_weight + rot_g * rot_weight + tor_loss_g * tor_weight
        aux = dict(
            loss=loss_g, tr_loss=tr_g, rot_loss=rot_g, tor_loss=tor_loss_g,
            tr_base_loss=jnp.mean(tr_base_per, -1),
            rot_base_loss=jnp.mean(rot_base_per, -1),
            tor_base_loss=tor_base_g,
        )
        return loss_g, aux
