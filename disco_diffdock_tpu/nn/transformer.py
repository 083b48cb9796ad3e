"""Dense graph-transformer attention for the latent virtual-node encoder.

Replaces torch_geometric's ``TransformerConv`` on the specific bipartite
structure of latent_encoder.py:105-132,223-305: every real (ligand/receptor)
node exchanges messages with the ``dim`` virtual latent nodes of its graph,
and virtual nodes attend to each other.  Because every edge feature there is
a concatenation of a source-side part and a target-side part, the
key/value projections separate -- the target-side contribution shifts all of
a query's logits equally (softmax-invariant) and adds a constant to the
value sum -- so the whole operator runs as masked dense attention with no
edge materialization.

TransformerConv semantics (heads=1, concat=False, root weight on):
  out_i = W_skip x_i + sum_j alpha_ij (W_v x_j + W_ev e_ij)
  alpha = softmax_j((W_q x_i) . (W_k x_j + W_ek e_ij) / sqrt(d))
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DenseTransformerAttention(nn.Module):
    """One masked dense attention: queries (B,Q,Dq) over keys (B,K,Dk)."""

    out_dim: int

    @nn.compact
    def __call__(self, q_x, kv_x, mask, e_key=None, e_val=None):
        """mask: (B, Q, K) validity.  e_key/e_val: optional (B, K, d) source
        -side edge-feature projections added to keys/values (the target-side
        parts are softmax-invariant / constant and handled by the caller)."""
        d = self.out_dim
        q = nn.Dense(d, name="lin_q")(q_x)
        k = nn.Dense(d, name="lin_k")(kv_x)
        v = nn.Dense(d, name="lin_v")(kv_x)
        if e_key is not None:
            k = k + e_key
        if e_val is not None:
            v = v + e_val
        logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(float(d))
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        attn = attn * mask  # fully-masked queries -> zero output
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        return nn.Dense(d, name="lin_skip", use_bias=True)(q_x) + out
