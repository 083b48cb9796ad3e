"""Equivariant tensor products: the core message operation of the score GNN.

The reference has two implementations (models/tensor_layers.py):
  * ``FasterTensorProduct`` (:39-116) -- a hand-written lmax=1 fast path
    (dot / cross / scalar-mult with per-key weight matmuls), used by every
    shipped sh_lmax=1 model; and
  * e3nn's ``o3.FullyConnectedTensorProduct`` for the general case.

The TPU build has ONE general implementation built from the CG tables of
``cg.py``, with the fast path's normalization convention generalized: for each
output irrep, basis features from all contributing (input-block, sh-block)
paths are concatenated along the channel axis and hit with a single per-edge
weight matrix scaled by 1/sqrt(fan_in).  For lmax=1 inputs/outputs and
sh='1x0e+1x1o' this reproduces the reference fast path bit-for-bit in
structure (dot/sqrt(3), cross/sqrt(2), identical weight layout and order).

All contractions here run in the model compute dtype (bf16-friendly); the per
-edge weight matmul is a batched small matmul that XLA maps onto the MXU.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .cg import cg_tensor
from .irreps import Irreps, spherical_harmonics_irreps


@dataclasses.dataclass(frozen=True)
class _Path:
    in_block: int  # index into in_irreps
    sh_block: int  # index into sh_irreps


class WeightedTensorProduct:
    """Fully-connected weighted TP: (in, sh, per-edge weights) -> out.

    Weight layout: concatenated per output block, each block a
    (fan_in_k, out_mul_k) matrix flattened row-major -- matching the
    reference FasterTensorProduct's weight_shapes dict order when the irreps
    coincide (models/tensor_layers.py:57-63).
    """

    def __init__(self, in_irreps, sh_irreps, out_irreps):
        self.in_irreps = Irreps(in_irreps)
        self.sh_irreps = Irreps(sh_irreps)
        self.out_irreps = Irreps(out_irreps)
        for mi in self.sh_irreps:
            assert mi.mul == 1, "sh multiplicities must be 1"

        self.paths: list[list[_Path]] = []  # per out block
        self.fan_in: list[int] = []
        for k, out_mi in enumerate(self.out_irreps):
            paths_k, fan = [], 0
            for i, in_mi in enumerate(self.in_irreps):
                for j, sh_mi in enumerate(self.sh_irreps):
                    l1, l2, l3 = in_mi.ir.l, sh_mi.ir.l, out_mi.ir.l
                    if in_mi.ir.p * sh_mi.ir.p != out_mi.ir.p:
                        continue
                    if not abs(l1 - l2) <= l3 <= l1 + l2:
                        continue
                    paths_k.append(_Path(i, j))
                    fan += in_mi.mul
            self.paths.append(paths_k)
            self.fan_in.append(fan)
        self.weight_splits = [
            f * out_mi.mul for f, out_mi in zip(self.fan_in, self.out_irreps)
        ]
        self.weight_numel = sum(self.weight_splits)

    def __call__(self, x: jnp.ndarray, sh: jnp.ndarray, weight, w_layout: str = "fo") -> jnp.ndarray:
        """Apply the TP.

        Args:
          x: (..., in_dim) input features.
          sh: (..., sh_dim) spherical-harmonic features.
          weight: (..., weight_numel) per-edge weights, or a tuple of per-key
            blocks matching ``weight_splits`` (avoids a slice pass over the
            big weight tensor on the hot path).
          w_layout: flattening order of each per-block weight matrix --
            "fo" = (fan, out_mul) row-major (the reference FasterTensorProduct
            layout, tensor_layers.py:88-92), "of" = (out_mul, fan).  "of" lets
            the fan-contraction read the per-edge weights in the layout the
            producing matmul emits, which removes a full HBM layout-copy of
            every weight block on TPU (profiled ~10 ms/forward at bench
            shapes).  Same math either way -- only the parameter column order
            differs, so a model must be trained and served with one layout.
        Returns:
          (..., out_dim).
        """
        w_blocks = weight if isinstance(weight, (tuple, list)) else None
        in_slices = self.in_irreps.slices()
        sh_slices = self.sh_irreps.slices()
        x_blocks = [
            x[..., sl].reshape(x.shape[:-1] + (mi.mul, mi.ir.dim))
            for mi, sl in zip(self.in_irreps, in_slices)
        ]
        sh_blocks = [sh[..., sl] for sl in sh_slices]

        basis_t = w_layout == "of_t"
        outs = []
        w_ofs = 0
        for k, out_mi in enumerate(self.out_irreps):
            fan = self.fan_in[k]
            if fan == 0:
                outs.append(
                    jnp.zeros(x.shape[:-1] + (out_mi.dim,), dtype=x.dtype)
                )
                continue
            basis = []
            for path in self.paths[k]:
                in_mi = self.in_irreps[path.in_block]
                sh_mi = self.sh_irreps[path.sh_block]
                C = jnp.asarray(
                    cg_tensor(in_mi.ir.l, sh_mi.ir.l, out_mi.ir.l), dtype=x.dtype
                )
                # two-step broadcast-multiply-reduce (einsum lowers to a
                # batched tiny convolution on TPU): first contract sh with the
                # CG tensor, then the input channels.
                # T: (..., d1, d3) = sum_j sh[..., j] C[i, j, k]
                T = jnp.sum(
                    sh_blocks[path.sh_block][..., None, :, None] * C[None, ...], axis=-2
                )
                if basis_t:
                    # b_t: (..., d3, mul) = sum_i T[..., i, k] x[..., m, i]
                    b = jnp.sum(
                        jnp.swapaxes(T, -1, -2)[..., :, None, :]
                        * x_blocks[path.in_block][..., None, :, :],
                        axis=-1,
                    )
                else:
                    # b: (..., mul, d3) = sum_i x[..., m, i] T[..., i, k]
                    b = jnp.sum(
                        x_blocks[path.in_block][..., :, :, None] * T[..., None, :, :], axis=-2
                    )
                basis.append(b)
            # (..., fan, d3), or (..., d3, fan) in the transposed variant
            basis = jnp.concatenate(basis, axis=-1 if basis_t else -2)
            n = fan * out_mi.mul
            # divide by a python float: numpy f64 scalars would silently
            # promote bf16 weights to f32 (2x bandwidth on the hot path)
            wk = w_blocks[k] if w_blocks is not None else weight[..., w_ofs : w_ofs + n]
            w_ofs += n
            # contraction over fan as explicit multiply+reduce: XLA lowers the
            # einsum form to a batched tiny convolution on TPU (~60 GB/s);
            # the broadcast product + sum fuses into a single bandwidth-bound
            # loop fusion instead (~700 GB/s).
            if w_layout == "of_t":
                # both operands read f-minor in their produced layouts
                W = wk.reshape(wk.shape[:-1] + (out_mi.mul, fan)) / float(np.sqrt(fan))
                out = jnp.sum(
                    basis[..., None, :, :] * W[..., :, None, :], axis=-1
                )  # (..., 1, d3, fan) * (..., o, 1, fan) -> (..., o, d3)
            elif w_layout == "of":
                W = wk.reshape(wk.shape[:-1] + (out_mi.mul, fan)) / float(np.sqrt(fan))
                out = jnp.sum(
                    basis[..., None, :, :] * W[..., :, :, None], axis=-2
                )  # (..., 1, fan, d3) * (..., o, fan, 1) -> (..., o, d3)
            else:
                W = wk.reshape(wk.shape[:-1] + (fan, out_mi.mul)) / float(np.sqrt(fan))
                if out_mi.ir.dim > 1:
                    # per-component fan contractions: each (..., fan) x
                    # (..., fan, o) slice matches the scalar-block pattern
                    # XLA folds into a single convolution fusion with the
                    # upstream per-edge weight matmul -- which removes the
                    # ~10 ms of bf16[B,E,fan,o] layout copies the joint
                    # (fan, o, d3) broadcast-reduce needed (profile_notes.md)
                    out = jnp.stack(
                        [jnp.sum(basis[..., k][..., :, None] * W, axis=-2)
                         for k in range(out_mi.ir.dim)], -1,
                    )  # (..., o, d3)
                else:
                    out = jnp.sum(
                        basis[..., :, None, :] * W[..., :, :, None], axis=-3
                    )  # (..., fan, 1, d3) * (..., fan, o, 1) -> (..., o, d3)
            outs.append(out.reshape(out.shape[:-2] + (out_mi.dim,)))
        return jnp.concatenate(outs, axis=-1)


class FullTensorProduct:
    """Unweighted full TP (every path kept as its own output block).

    Replaces ``o3.FullTensorProduct(sh_irreps, '2e')`` for the torsion bond
    convolution (models/score_model.py:152,295-296).  Output paths beyond
    ``lmax_out`` are dropped (they cannot reach any output irrep of the
    shipped models).
    """

    def __init__(self, irreps1, irreps2, lmax_out: int = 3):
        self.irreps1 = Irreps(irreps1)
        self.irreps2 = Irreps(irreps2)
        paths = []
        out = []
        for i, mi1 in enumerate(self.irreps1):
            for j, mi2 in enumerate(self.irreps2):
                assert mi2.mul == 1
                p3 = mi1.ir.p * mi2.ir.p
                for l3 in range(abs(mi1.ir.l - mi2.ir.l), mi1.ir.l + mi2.ir.l + 1):
                    if l3 > lmax_out:
                        continue
                    paths.append((i, j, l3))
                    out.append((mi1.mul, l3, p3))
        self.paths = paths
        self.irreps_out = Irreps(out)

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        s1 = self.irreps1.slices()
        s2 = self.irreps2.slices()
        outs = []
        for (i, j, l3) in self.paths:
            mi1, mi2 = self.irreps1[i], self.irreps2[j]
            b1 = x1[..., s1[i]].reshape(x1.shape[:-1] + (mi1.mul, mi1.ir.dim))
            b2 = x2[..., s2[j]]
            C = jnp.asarray(cg_tensor(mi1.ir.l, mi2.ir.l, l3), dtype=x1.dtype)
            T = jnp.sum(b2[..., None, :, None] * C[None, ...], axis=-2)  # (..., d1, d3)
            o = jnp.sum(b1[..., :, :, None] * T[..., None, :, :], axis=-2)  # (..., mul, d3)
            outs.append(o.reshape(o.shape[:-2] + (mi1.mul * (2 * l3 + 1),)))
        return jnp.concatenate(outs, axis=-1)


def get_irrep_seq(ns: int, nv: int, use_second_order_repr: bool, reduce_pseudoscalars: bool = False):
    """Feature-type progression per conv layer (tensor_layers.py:12-27)."""
    if use_second_order_repr:
        return [
            f"{ns}x0e",
            f"{ns}x0e + {nv}x1o + {nv}x2e",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o",
            f"{ns}x0e + {nv}x1o + {nv}x2e + {nv}x1e + {nv}x2o + {nv if reduce_pseudoscalars else ns}x0o",
        ]
    return [
        f"{ns}x0e",
        f"{ns}x0e + {nv}x1o",
        f"{ns}x0e + {nv}x1o + {nv}x1e",
        f"{ns}x0e + {nv}x1o + {nv}x1e + {nv if reduce_pseudoscalars else ns}x0o",
    ]


def sh_irreps(lmax: int) -> Irreps:
    return spherical_harmonics_irreps(lmax)
