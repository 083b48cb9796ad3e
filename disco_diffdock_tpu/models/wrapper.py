"""Joint encoder + score-model wrapper for training.

Parity with ``ModelWrapper`` (models/model_classes.py:53-85): the encoder
(oracle pose) produces latents with the training Gumbel temperature, a
per-graph Bernoulli *latent droprate* mask zeroes latents and raises the
unconditional flag (classifier-free-guidance training), then the score model
runs conditioned.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EncoderConfig, GraphCaps, ScoreModelConfig
from ..graphs.containers import ComplexBatch
from .encoder import TPEncoder
from .score_model import TensorProductScoreModel


class ModelWrapper(nn.Module):
    score_cfg: ScoreModelConfig
    encoder_cfg: EncoderConfig | None
    caps: GraphCaps
    training_latent_temperature: float = 1.0
    latent_droprate: float = 0.0

    def setup(self):
        self.score_model = TensorProductScoreModel(cfg=self.score_cfg, caps=self.caps)
        if self.encoder_cfg is not None:
            self.encoder = TPEncoder(cfg=self.encoder_cfg, caps=self.caps)

    def __call__(
        self,
        batch: ComplexBatch,
        latent_temperature: float | None = None,
        deterministic: bool = True,
        use_running_average: bool = False,
    ):
        latent = None
        unconditional = None
        if self.encoder_cfg is not None:
            temp = (
                latent_temperature
                if latent_temperature is not None
                else self.training_latent_temperature
            )
            latent = self.encoder(
                batch,
                latent_temperature=temp,
                apply_gumbel=True,
                deterministic=deterministic,
                use_running_average=use_running_average,
            )
            B = batch.num_graphs
            if self.latent_droprate > 0 and not deterministic:
                key = self.make_rng("droprate")
                keep = jax.random.bernoulli(
                    key, 1.0 - self.latent_droprate, (B, 1)
                ).astype(jnp.float32)
                unconditional = 1.0 - keep
                if isinstance(latent, tuple):
                    latent = (latent[0] * keep[:, :, None], latent[1] * keep[:, :, None])
                else:
                    latent = latent * keep[..., None]
            else:
                unconditional = jnp.zeros((B, 1))
        return self.score_model(
            batch,
            latent=latent,
            unconditional=unconditional,
            deterministic=deterministic,
            use_running_average=use_running_average,
        )
