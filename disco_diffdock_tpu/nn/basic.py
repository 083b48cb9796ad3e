"""Basic neural building blocks: MLPs, encoders, smearing, gumbel softmax.

Parity targets in /root/reference/models/layers.py (FCBlock :15-22,
CrossAttention :35-78, AtomEncoder :119-149, gumbel_softmax :152-181) and
GaussianSmearing (models/tensor_layers.py:171-181).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FCBlock(nn.Module):
    """n-layer MLP: Linear/act/dropout x (layers-1) + final Linear.

    ``dtype`` sets the computation dtype (params stay float32); bf16 halves
    the bandwidth of the edge-weight MLPs, the forward's dominant cost.
    """

    hidden_dim: int
    out_dim: int
    layers: int = 2
    dropout: float = 0.0
    activation: str = "relu"
    batchnorm: bool = False  # plain (non-irreps) batchnorm variant unused by shipped models
    dtype: object = None
    out_splits: tuple = ()  # when set, final layer emits per-split outputs

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = {"relu": nn.relu, "silu": nn.silu}[self.activation]
        for _ in range(self.layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
            x = act(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        if self.out_splits:
            # column partition of the final Dense: identical math, but each
            # block is materialized directly (no slice pass downstream)
            return tuple(
                nn.Dense(d, dtype=self.dtype, name=f"out{i}")(x) if d > 0 else None
                for i, d in enumerate(self.out_splits)
            )
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class GaussianSmearing(nn.Module):
    """RBF embedding of distances on a linspace grid (tensor_layers.py:171)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist):
        offset = jnp.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        d = dist[..., None] - offset
        return jnp.exp(coeff * d * d)


class AtomEncoder(nn.Module):
    """Sum of categorical embeddings + joint linear over extra scalars.

    Mirrors models/layers.py:119-149: per-categorical-feature embedding tables
    summed, then one Linear over [embedding, scalar extras] when extras exist.
    Input layout: (..., n_cat + additional) with categorical codes first.
    """

    emb_dim: int
    categorical_dims: Sequence[int]
    additional_dim: int = 0  # scalar feats + sigma emb + lm emb + latent

    @nn.compact
    def __call__(self, x):
        n_cat = len(self.categorical_dims)
        emb = 0.0
        for i, vocab in enumerate(self.categorical_dims):
            table = nn.Embed(
                vocab, self.emb_dim, embedding_init=nn.initializers.xavier_uniform()
            )
            emb = emb + table(x[..., i].astype(jnp.int32))
        if self.additional_dim > 0:
            extras = x[..., n_cat : n_cat + self.additional_dim]
            emb = nn.Dense(self.emb_dim)(
                jnp.concatenate([emb, extras.astype(emb.dtype)], axis=-1)
            )
        return emb


class OldAtomEncoder(nn.Module):
    """Legacy encoder variant (models/layers.py:81-116): categorical sum +
    scalar linear added, ESM embedding fused through a separate late linear
    (instead of one joint linear over all extras).  Selected by the
    ``use_old_atom_encoder`` flag; shipped models use the new encoder."""

    emb_dim: int
    categorical_dims: Sequence[int]
    scalar_dim: int = 0  # scalar feats + sigma emb
    lm_embedding_dim: int = 0

    @nn.compact
    def __call__(self, x):
        n_cat = len(self.categorical_dims)
        emb = 0.0
        for i, vocab in enumerate(self.categorical_dims):
            table = nn.Embed(
                vocab, self.emb_dim, embedding_init=nn.initializers.xavier_uniform()
            )
            emb = emb + table(x[..., i].astype(jnp.int32))
        if self.scalar_dim > 0:
            emb = emb + nn.Dense(self.emb_dim)(
                x[..., n_cat : n_cat + self.scalar_dim].astype(emb.dtype)
            )
        if self.lm_embedding_dim > 0:
            lm = x[..., -self.lm_embedding_dim :]
            emb = nn.Dense(self.emb_dim)(
                jnp.concatenate([emb, lm.astype(emb.dtype)], axis=-1)
            )
        return emb


def gumbel_softmax(
    key: jax.Array, logits: jnp.ndarray, temperature: float, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Straight-through hard Gumbel-softmax over the last axis.

    Parity with models/layers.py:152-181 (y_hard - stop_grad(y) + y), plus an
    optional validity mask: invalid slots get -inf logits so padded nodes can
    never be selected.
    """
    eps = 1e-20
    u = jax.random.uniform(key, logits.shape)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    z = logits + g
    if mask is not None:
        z = jnp.where(mask, z, -1e9)
    y = jax.nn.softmax(z / temperature, axis=-1)
    idx = jnp.argmax(y, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
    return y_hard - jax.lax.stop_gradient(y) + y


class CrossAttention(nn.Module):
    """Multi-head cross attention (models/layers.py:35-78)."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, deterministic: bool = True):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False)(x)
        k = nn.Dense(inner, use_bias=False)(context)
        v = nn.Dense(inner, use_bias=False)(context)

        def split(t):
            return t.reshape(t.shape[:-1] + (self.heads, self.dim_head))

        q, k, v = split(q), split(k), split(v)
        sim = jnp.einsum("...ihd,...jhd->...hij", q, k) * self.dim_head**-0.5
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("...hij,...jhd->...ihd", attn, v)
        out = out.reshape(out.shape[:-2] + (inner,))
        out = nn.Dense(self.query_dim)(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)
