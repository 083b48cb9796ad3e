"""Exponential moving average of parameters (score_sde-style).

Parity with ``ExponentialMovingAverage`` (utils/utils.py:117-199): warmup
decay min(rate, (1+n)/(10+n)), shadow update s <- s - (1-d)(s - p), and the
store / copy-to / restore protocol expressed functionally (swap for eval).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import jax


@flax.struct.dataclass
class EMAState:
    decay: float = flax.struct.field(pytree_node=False)
    num_updates: jnp.ndarray = None  # scalar int32
    shadow: dict = None
    # EMA only this top-level params subtree (reference: score-model params
    # only, train.py:110); the rest of the shadow tracks the live params so
    # the validation swap evaluates {current encoder + EMA score model}.
    scope: str | None = flax.struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, decay: float = 0.999, scope: str | None = None):
        if scope is not None and scope not in params:
            scope = None  # plain (non-wrapper) models: EMA everything
        return cls(
            decay=decay,
            num_updates=jnp.zeros((), jnp.int32),
            shadow=jax.tree.map(lambda x: x, params),
            scope=scope,
        )

    def update(self, params) -> "EMAState":
        n = self.num_updates + 1
        d = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))

        def ema(s, p):
            return jax.tree.map(lambda a, b: a - (1.0 - d) * (a - b), s, p)

        if self.scope is not None:
            new_shadow = {
                k: (ema(self.shadow[k], v) if k == self.scope else v)
                for k, v in params.items()
            }
        else:
            new_shadow = ema(self.shadow, params)
        return self.replace(num_updates=n, shadow=new_shadow)
