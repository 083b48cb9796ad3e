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

    @classmethod
    def create(cls, params, decay: float = 0.999):
        return cls(
            decay=decay,
            num_updates=jnp.zeros((), jnp.int32),
            shadow=jax.tree.map(lambda x: x, params),
        )

    def update(self, params) -> "EMAState":
        n = self.num_updates + 1
        d = jnp.minimum(self.decay, (1.0 + n) / (10.0 + n))
        new_shadow = jax.tree.map(
            lambda s, p: s - (1.0 - d) * (s - p), self.shadow, params
        )
        return self.replace(num_updates=n, shadow=new_shadow)
