"""Plateau LR scheduling for the training drivers.

The reference steps ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (factor
0.7, patience ``--scheduler_patience``, min_lr = lr/100; built in
``utils/utils.py:71-81``) on the val-inference metric when periodic real
inference runs, else on the val loss (``train.py:79-83``); the confidence
trainer steps it on its main val metric (``confidence_train.py:226-227``).

TPU-native shape: the step function is one jitted program with the whole
``TrainState`` as an argument, so the learning rate must be DATA, not a
compile-time constant — we build Adam under ``optax.inject_hyperparams`` so
the LR lives in the optimizer state, and the host-side scheduler mutates it
between epochs without retracing.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def make_adam(lr: float, w_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam (+ optional COUPLED L2 weight decay: the decay term is added to
    the gradient before Adam's moment normalization, matching the reference's
    torch.optim.Adam(weight_decay=...) — NOT AdamW-style decoupling) with the
    learning rate held in the optimizer state so plateau scheduling never
    recompiles."""
    return optax.chain(
        optax.add_decayed_weights(w_decay) if w_decay else optax.identity(),
        optax.inject_hyperparams(optax.adam)(learning_rate=lr),
    )


def _inject_state(opt_state):
    """The InjectHyperparamsState inside a make_adam() optimizer state
    (searched recursively so wrappers like optax.MultiSteps compose)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiStepsState
        return _inject_state(opt_state.inner_opt_state)
    if isinstance(opt_state, tuple):
        for part in opt_state:
            try:
                return _inject_state(part)
            except ValueError:
                continue
    raise ValueError("optimizer state has no injected hyperparams; "
                     "build the optimizer with make_adam()")


def get_learning_rate(opt_state) -> float:
    return float(_inject_state(opt_state).hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with the injected LR replaced (same
    dtype/shape, so jitted steps keep their compiled program)."""
    inject = _inject_state(opt_state)
    old = inject.hyperparams["learning_rate"]
    new_inject = inject._replace(hyperparams={
        **inject.hyperparams,
        "learning_rate": jnp.asarray(lr, dtype=old.dtype),
    })

    def rebuild(node):
        if node is inject:
            return new_inject
        if hasattr(node, "inner_opt_state"):
            return node._replace(inner_opt_state=rebuild(node.inner_opt_state))
        if isinstance(node, tuple) and not hasattr(node, "hyperparams"):
            parts = [rebuild(p) for p in node]
            return type(node)(*parts) if hasattr(node, "_fields") else tuple(parts)
        return node

    return rebuild(opt_state)


class ReduceLROnPlateau:
    """Host-side twin of the torch scheduler the reference configures
    (mode min/max, factor 0.7, patience in epochs, floor min_lr).

    ``step(metric, opt_state)`` returns the (possibly updated) optimizer
    state; reductions print a HAPPENING line like the reference's verbosity.
    """

    def __init__(self, mode: str = "min", factor: float = 0.7,
                 patience: int = 30, min_lr: float = 0.0):
        assert mode in ("min", "max")
        self.mode, self.factor, self.patience, self.min_lr = (
            mode, factor, patience, min_lr)
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad_epochs = 0

    def _is_better(self, metric: float) -> bool:
        return metric < self.best if self.mode == "min" else metric > self.best

    def step(self, metric: float, opt_state):
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
            return opt_state
        self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            old_lr = get_learning_rate(opt_state)
            new_lr = max(old_lr * self.factor, self.min_lr)
            if new_lr < old_lr:
                print(f"HAPPENING | plateau scheduler: lr {old_lr:.3e} -> "
                      f"{new_lr:.3e}")
                return set_learning_rate(opt_state, new_lr)
        return opt_state
