"""Jitted training / eval steps for the score model.

The reference train loop (utils/training.py:96-135) runs host-side per batch;
here one ``train_step`` fuses noise transform + forward + loss + Adam update
+ EMA into a single XLA program, and ``parallel.mesh`` wraps it in shard_map
for data parallelism.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..data.noise import apply_noise
from ..geom.diffusion import SigmaSchedule
from .ema import EMAState
from .losses import score_matching_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, ema_decay=0.999,
               ema_scope: Optional[str] = None):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema=EMAState.create(params, ema_decay, scope=ema_scope),
            step=jnp.zeros((), jnp.int32),
        )

    def variables(self, ema: bool = False):
        p = self.ema.shadow if ema else self.params
        return {"params": p, "batch_stats": self.batch_stats}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    sigma: SigmaSchedule,
    alpha: float = 1.0,
    beta: float = 1.0,
    no_torsion: bool = False,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build a train step.  If ``axis_name`` is set the step is shard_map
    -ready: gradients/metrics/batch_stats are pmean'd over that axis."""

    def loss_fn(params, batch_stats, noised, targets, tr_s, rot_s, drop_key):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            noised,
            deterministic=False,
            use_running_average=False,
            mutable=["batch_stats"],
            rngs={"dropout": drop_key},
        )
        loss, aux = score_matching_loss(
            preds, targets, noised, tr_s, rot_s,
            tr_weight, rot_weight, tor_weight, no_torsion,
            axis_name=axis_name,
        )
        return loss, (aux, mut["batch_stats"])

    def train_step(state: TrainState, batch, key):
        k_noise, k_drop = jax.random.split(key)
        # global graph ids: noise draws depend only on a graph's global
        # position, so a sharded step reproduces the unsharded step exactly
        ids = jnp.arange(batch.num_graphs)
        if axis_name is not None:
            ids = ids + jax.lax.axis_index(axis_name) * batch.num_graphs
            k_drop = jax.random.fold_in(k_drop, jax.lax.axis_index(axis_name))
        noised, targets = apply_noise(
            k_noise, batch, sigma, alpha, beta, no_torsion, graph_ids=ids)
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
        (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, noised, targets, tr_s, rot_s, k_drop
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema=state.ema.update(new_params),
            step=state.step + 1,
        )
        return new_state, aux

    return train_step


def make_eval_step(model, sigma: SigmaSchedule, no_torsion: bool = False) -> Callable:
    """Validation loss on a fixed noise draw (test_epoch analogue)."""

    def eval_step(state: TrainState, batch, key, ema: bool = False):
        noised, targets = apply_noise(key, batch, sigma, 1.0, 1.0, no_torsion)
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
        preds = model.apply(
            state.variables(ema=ema), noised,
            deterministic=True, use_running_average=True,
        )
        _, aux = score_matching_loss(preds, targets, noised, tr_s, rot_s)
        return aux

    return eval_step


def make_val_step(model, sigma: SigmaSchedule, wrapper: bool = False,
                  no_torsion: bool = False, tr_weight: float = 0.33,
                  rot_weight: float = 0.33, tor_weight: float = 0.33) -> Callable:
    """Per-graph validation losses (test_epoch with apply_mean=False,
    reference utils/training.py:138-146): returns (per-graph aux, t,
    graph_mask) so the caller can aggregate and optionally bin by sigma
    interval.  ``wrapper`` adds the gumbel rng stream the DisCo encoder
    samples with even in eval mode (torch gumbel_softmax samples in eval)."""

    def val_step(variables, batch, key, ema_params=None):
        k_noise, k_gum = jax.random.split(key)
        v = variables if ema_params is None else {**variables, "params": ema_params}
        noised, targets = apply_noise(k_noise, batch, sigma, 1.0, 1.0, no_torsion)
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
        preds = model.apply(
            v, noised, deterministic=True, use_running_average=True,
            rngs={"gumbel": k_gum} if wrapper else {},
        )
        _, aux = score_matching_loss(
            preds, targets, noised, tr_s, rot_s, apply_mean=False,
            tr_weight=tr_weight, rot_weight=rot_weight, tor_weight=tor_weight,
            no_torsion=no_torsion,
        )
        return aux, t, batch.graph_mask

    return val_step
