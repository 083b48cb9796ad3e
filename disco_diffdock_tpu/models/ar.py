"""Autoregressive latent prior on the frozen score-model trunk.

Parity with ``PretrainedScoreEncoder`` (models/pretrained_score_encoder.py:
8-89) and ``GenericEncoder.encode_ar`` (models/model_classes.py:9-49): the
score model's ``embed()`` runs at t=1 with unconditional=1 and the partial
latent string as conditioning; fresh per-node MLPs score every ligand/receptor
node; decoding proceeds slot-by-slot, sampling a node per graph from the
temperature-scaled softmax (multinomial, or argmax at temperature >= 100) and
feeding the grown one-hot back in.

The sequential decode is a Python loop over ``latent_dim`` slots (2 in the
shipped config) inside one jit -- each iteration is a full trunk forward, as
in the reference.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GraphCaps, ScoreModelConfig
from ..graphs.containers import ComplexBatch
from .encoder import LatentPredictorMLP
from .score_model import TensorProductScoreModel


class PretrainedScoreEncoder(nn.Module):
    score_cfg: ScoreModelConfig
    caps: GraphCaps
    latent_dim: int = 1  # output slots scored per forward (reference: 1)
    input_latent_dim: int = 2  # latent string length being decoded
    latent_hidden_dim: int = 128
    latent_no_batchnorm: bool = False
    latent_dropout: float = 0.0
    # reference quirk (pretrained_score_encoder.py:15,63-66): the predictor
    # input slices the trunk scalars with the AR model's OWN ns, which may be
    # smaller than the score model's (the shipped AR config uses ns=16 on the
    # ns=24 trunk, taking the first/last 16 scalar channels).  None = score ns.
    ns: "int | None" = None

    def setup(self):
        self.pretrained_score_model = TensorProductScoreModel(
            cfg=self.score_cfg, caps=self.caps
        )
        self.latent_s_predictor = LatentPredictorMLP(
            self.latent_hidden_dim, self.latent_dim,
            self.latent_no_batchnorm, self.latent_dropout,
        )
        self.latent_r_predictor = LatentPredictorMLP(
            self.latent_hidden_dim, self.latent_dim,
            self.latent_no_batchnorm, self.latent_dropout,
        )

    def __call__(
        self,
        batch: ComplexBatch,
        input_latent,
        decoding_idx: jnp.ndarray,
        deterministic: bool = True,
        use_running_average: bool = False,
        shared_rec: bool = False,
    ):
        """One AR decoding step: returns (logits (B, latent_dim, NL+NR), mask).

        ``input_latent``: (lat_l (B,NL,ild), lat_r (B,NR,ild)) partial string.
        ``decoding_idx``: (B,) which slot is being decoded (conditioning is
        implicit: slots >= idx are zero in input_latent, as in the reference).
        ``shared_rec``: pose-copied single-complex batch (eval decode) --
        receptor-side trunk arrays compute at B=1 where latent-free.
        """
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        b = batch.set_time(1.0, 1.0, 1.0)
        lig_attr, rec_attr, _ = self.pretrained_score_model.embed(
            b,
            latent=input_latent,
            unconditional=jnp.ones((B, 1)),
            deterministic=deterministic,
            use_running_average=use_running_average,
            shared_rec=shared_rec,
        )
        ns = self.ns if self.ns is not None else self.score_cfg.ns
        if self.score_cfg.num_conv_layers >= 3:
            s_lig = jnp.concatenate([lig_attr[..., :ns], lig_attr[..., -ns:]], -1)
            s_rec = jnp.concatenate([rec_attr[..., :ns], rec_attr[..., -ns:]], -1)
        else:
            s_lig = lig_attr[..., :ns]
            s_rec = rec_attr[..., :ns]
        pl = self.latent_s_predictor(s_lig, batch.lig_mask, deterministic, use_running_average)
        pr = self.latent_r_predictor(s_rec, batch.rec_mask, deterministic, use_running_average)
        logits = jnp.swapaxes(jnp.concatenate([pl, pr], 1), 1, 2)  # (B, Ld, NL+NR)
        node_mask = jnp.concatenate([batch.lig_mask, batch.rec_mask], 1)
        return logits, node_mask


def encode_ar(
    model_apply,
    batch: ComplexBatch,
    key: jax.Array,
    input_latent_dim: int,
    sampling_temperature: float = 1.0,
):
    """Sequential AR latent decoding (model_classes.py:9-49), vocab=1 path.

    ``model_apply(batch, input_latent, decoding_idx) -> (logits, node_mask)``
    where logits is (B, 1, NL+NR).  Returns (lat_l, lat_r) one-hot strings.
    """
    B, NL = batch.lig_x.shape[:2]
    NR = batch.rec_x.shape[1]

    # lax.scan over latent slots (SURVEY section 7 build-order #10): the
    # decoder body traces/compiles ONCE regardless of latent_dim, instead of
    # unrolling (and recompiling per latent_dim) like the reference's Python
    # loop (model_classes.py:26-46).  The serial dependency (each slot's
    # partial string feeds the next forward) is expressed as the scan carry.
    def step(carry, idx):
        lat_l, lat_r, key = carry
        key, k = jax.random.split(key)
        dec = jnp.full((B,), idx, jnp.int32)
        logits, node_mask = model_apply(batch, (lat_l, lat_r), dec)
        lat = logits[:, 0, :] * sampling_temperature  # (B, NL+NR)
        lat = jnp.where(node_mask, lat, -jnp.inf)
        if sampling_temperature >= 100:
            choice = jnp.argmax(lat, axis=-1)
        else:
            lat = jnp.nan_to_num(lat, nan=-jnp.inf, posinf=80.0)
            choice = jax.random.categorical(k, lat, axis=-1)
        onehot = jax.nn.one_hot(choice, NL + NR)
        # slots are written exactly once from a zero init, so a one-hot
        # outer-product add == dynamic-index write (scan-friendly)
        slot = jax.nn.one_hot(idx, input_latent_dim)
        lat_l = lat_l + onehot[:, :NL, None] * slot[None, None, :]
        lat_r = lat_r + onehot[:, NL:, None] * slot[None, None, :]
        return (lat_l, lat_r, key), None

    init = (jnp.zeros((B, NL, input_latent_dim)),
            jnp.zeros((B, NR, input_latent_dim)), key)
    (lat_l, lat_r, _), _ = jax.lax.scan(
        step, init, jnp.arange(input_latent_dim))
    return lat_l, lat_r
