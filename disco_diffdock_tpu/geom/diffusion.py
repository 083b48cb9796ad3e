"""Diffusion schedules and time embeddings.

Parity targets: ``t_to_sigma`` / ``get_t_schedule`` / sinusoidal + Gaussian-
Fourier embeddings (/root/reference/utils/diffusion_utils.py:12-98).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SigmaSchedule:
    """Geometric sigma interpolation per component: sigma(t) = min^(1-t) max^t."""

    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 19.0
    rot_sigma_min: float = 0.03
    rot_sigma_max: float = 1.55
    tor_sigma_min: float = 0.03
    tor_sigma_max: float = 3.14

    def t_to_sigma(self, t_tr, t_rot, t_tor):
        tr = self.tr_sigma_min ** (1 - t_tr) * self.tr_sigma_max**t_tr
        rot = self.rot_sigma_min ** (1 - t_rot) * self.rot_sigma_max**t_rot
        tor = self.tor_sigma_min ** (1 - t_tor) * self.tor_sigma_max**t_tor
        return tr, rot, tor


def get_t_schedule(inference_steps: int) -> np.ndarray:
    """Linear t grid: linspace(1, 0, steps+1)[:-1]."""
    return np.linspace(1, 0, inference_steps + 1)[:-1]


def sinusoidal_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """Transformer-style sinusoidal embedding of (...,) timesteps."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[..., None] * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def gaussian_fourier_embedding(
    timesteps: jnp.ndarray, W: jnp.ndarray
) -> jnp.ndarray:
    """score_sde-style Gaussian Fourier features; W is a fixed (dim/2,) draw."""
    x_proj = timesteps[..., None] * W * 2 * np.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def get_timestep_embedding(embedding_type: str, embedding_dim: int, embedding_scale: float = 10000):
    """Return fn: (...,) t -> (..., embedding_dim) embedding.

    'sinusoidal' scales t by ``embedding_scale`` first (reference default
    embedding_scale=1000); 'fourier' uses a fixed Gaussian projection seeded
    deterministically.
    """
    if embedding_type == "sinusoidal":
        return lambda t: sinusoidal_embedding(embedding_scale * t, embedding_dim)
    elif embedding_type == "fourier":
        W = jax.random.normal(jax.random.PRNGKey(0), (embedding_dim // 2,)) * embedding_scale
        return lambda t: gaussian_fourier_embedding(t, W)
    raise NotImplementedError(embedding_type)
