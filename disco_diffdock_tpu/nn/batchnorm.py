"""Masked equivariant batch normalization over irreps blocks.

Mirrors e3nn's ``nn.BatchNorm`` semantics (used at tensor_layers.py:145):
per-channel running stats, mean subtraction only for even scalars (0e), and
per-channel division by the square root of the mean component-norm; affine
scale for every channel, affine bias only for 0e.  Two TPU-native extensions:

  * all statistics are *masked* -- padded node slots contribute nothing, so
    padded and unpadded batches normalize identically
  * statistics may pool over several node sets at once (the reference
    normalizes the concatenated [ligand; receptor] node array; here the two
    stay separate arrays but share stats via ``MaskedIrrepsBatchNorm.stats``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .irreps import Irreps


class MaskedIrrepsBatchNorm(nn.Module):
    irreps: str
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, xs, masks, use_running_average: bool = False):
        """Normalize a list of (B, N, D) arrays with (B, N) masks jointly.

        Accepts a single array/mask or lists; returns same structure.
        """
        single = not isinstance(xs, (list, tuple))
        if single:
            xs, masks = [xs], [masks]
        irreps = Irreps(self.irreps)
        slices = irreps.slices()
        n_ch = sum(mi.mul for mi in irreps)
        n_scalar = sum(mi.mul for mi in irreps if mi.ir.l == 0 and mi.ir.p == 1)

        # zero-size params break checkpoint backends; create only when used
        ra_mean = (
            self.variable("batch_stats", "mean", lambda: jnp.zeros((n_scalar,)))
            if n_scalar else None
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((n_ch,)))
        weight = self.param("weight", nn.initializers.ones, (n_ch,))
        bias = (
            self.param("bias", nn.initializers.zeros, (n_scalar,)) if n_scalar else None
        )

        total = sum(jnp.sum(m) for m in masks) + 1e-12

        outs = [jnp.zeros_like(x) for x in xs]
        ch = 0
        sc = 0
        new_mean = []
        new_var = []
        for mi, sl in zip(irreps, slices):
            d = mi.ir.dim
            blocks = [
                x[..., sl].reshape(x.shape[:-1] + (mi.mul, d)) for x in xs
            ]
            is_scalar = mi.ir.l == 0 and mi.ir.p == 1

            if is_scalar:
                if use_running_average:
                    mean = ra_mean.value[sc : sc + mi.mul]
                else:
                    mean = (
                        sum(
                            jnp.sum(b[..., 0] * m[..., None], axis=(0, 1))
                            for b, m in zip(blocks, masks)
                        )
                        / total
                    )
                    new_mean.append(mean)
                blocks = [b - mean[:, None] for b in blocks]
            # component-mean squared norm per channel
            if use_running_average:
                norm = ra_var.value[ch : ch + mi.mul]
            else:
                norm = (
                    sum(
                        jnp.sum(
                            jnp.mean(b**2, axis=-1) * m[..., None], axis=(0, 1)
                        )
                        for b, m in zip(blocks, masks)
                    )
                    / total
                )
                new_var.append(norm)
            factor = weight[ch : ch + mi.mul] * jax_rsqrt(norm + self.eps)
            blocks = [b * factor[:, None] for b in blocks]
            if is_scalar:
                blocks = [b + bias[sc : sc + mi.mul, None] for b in blocks]
                sc += mi.mul
            for i, b in enumerate(blocks):
                outs[i] = outs[i].at[..., sl].set(b.reshape(b.shape[:-2] + (mi.dim,)))
            ch += mi.mul

        if not use_running_average and not self.is_initializing():
            if new_mean:
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * jnp.concatenate(new_mean)
            if new_var:
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * jnp.concatenate(new_var)

        return outs[0] if single else outs


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)
