"""Tensor-product message-passing convolution over padded edge blocks.

Mirrors ``TensorProductConvLayer`` (models/tensor_layers.py:119-168): per-edge
-group MLPs produce tensor-product weights, messages are TP(node[dst], sh, w),
aggregated by *joint* masked mean over all blocks incident to each receiving
node, then equivariant batch-norm and a zero-padded residual.

Differences from the reference are purely representational: node sets stay
separate per type (ligand / receptor / atom / virtual), and edges are fixed
-capacity masked lists, so the layer is jit-static and vmappable.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graphs.containers import ListEdges
from ..graphs.segment import scatter_sum
from .basic import FCBlock
from .batchnorm import MaskedIrrepsBatchNorm
from .irreps import Irreps
from .tensor_product import WeightedTensorProduct


@dataclasses.dataclass
class ConvBlock:
    """One edge block feeding a conv layer (built by the model each call)."""

    edges: ListEdges
    src_type: str  # receiving node set
    dst_type: str  # supplying node set
    edge_attr: jnp.ndarray  # (B, E, F)
    edge_sh: jnp.ndarray  # (B, E, sh_dim)
    group: int = 0  # which FC parameter group


def gather_nodes(node_attr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) gathered at (B, E) -> (B, E, D)."""
    return jnp.take_along_axis(node_attr, idx[..., None].astype(jnp.int32), axis=1)


class TPConvLayer(nn.Module):
    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    hidden_features: Optional[int] = None
    edge_groups: int = 1
    residual: bool = True
    batch_norm: bool = True
    dropout: float = 0.0
    tp_weights_layers: int = 2

    @nn.compact
    def __call__(
        self,
        node_attrs: dict[str, jnp.ndarray],
        node_masks: dict[str, jnp.ndarray],
        blocks: list[ConvBlock],
        out_types: Optional[list[str]] = None,
        out_counts: Optional[dict[str, int]] = None,
        deterministic: bool = True,
        use_running_average: bool = False,
    ) -> dict[str, jnp.ndarray]:
        """Run the convolution; returns dict of (B, N_t, out_dim) per type.

        ``out_types``: which node sets receive output (default: all types that
        appear as src of some block).  ``out_counts`` overrides the node count
        for output-only types (e.g. a per-graph center node or bond nodes).
        """
        tp = WeightedTensorProduct(self.in_irreps, self.sh_irreps, self.out_irreps)
        hidden = self.hidden_features or self.n_edge_features
        fcs = [
            FCBlock(
                hidden,
                tp.weight_numel,
                layers=self.tp_weights_layers,
                dropout=self.dropout,
                name=f"fc{g}",
            )
            for g in range(self.edge_groups)
        ]

        if out_types is None:
            out_types = sorted({b.src_type for b in blocks})
        out_dim = Irreps(self.out_irreps).dim
        counts = {
            t: (out_counts or {}).get(
                t, node_attrs[t].shape[1] if t in node_attrs else None
            )
            for t in out_types
        }
        B = blocks[0].edges.src.shape[0]
        sums = {
            t: jnp.zeros((B, counts[t], out_dim), dtype=blocks[0].edge_attr.dtype)
            for t in out_types
        }
        ns = {t: jnp.zeros((B, counts[t], 1), dtype=blocks[0].edge_attr.dtype) for t in out_types}

        for blk in blocks:
            w = fcs[blk.group](blk.edge_attr, deterministic=deterministic)
            x = gather_nodes(node_attrs[blk.dst_type], blk.edges.dst)
            msg = tp(x, blk.edge_sh, w)
            sums[blk.src_type] = sums[blk.src_type] + scatter_sum(
                msg, blk.edges.src, blk.edges.mask, counts[blk.src_type]
            )
            ones = jnp.ones(msg.shape[:2] + (1,), msg.dtype)
            ns[blk.src_type] = ns[blk.src_type] + scatter_sum(
                ones, blk.edges.src, blk.edges.mask, counts[blk.src_type]
            )

        outs = {t: sums[t] / (ns[t] + 1e-12) for t in out_types}

        if self.batch_norm:
            bn = MaskedIrrepsBatchNorm(self.out_irreps)
            masks = [
                node_masks.get(t, jnp.ones(outs[t].shape[:2], bool)) for t in out_types
            ]
            normed = bn(
                [outs[t] for t in out_types], masks, use_running_average=use_running_average
            )
            outs = dict(zip(out_types, normed))

        if self.residual:
            for t in out_types:
                if t in node_attrs:
                    pad = out_dim - node_attrs[t].shape[-1]
                    outs[t] = outs[t] + jnp.pad(
                        node_attrs[t], [(0, 0), (0, 0), (0, pad)]
                    )
        return outs
