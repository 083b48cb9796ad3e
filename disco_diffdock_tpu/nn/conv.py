"""Tensor-product message-passing convolution over padded edge blocks.

Mirrors ``TensorProductConvLayer`` (models/tensor_layers.py:119-168): per-edge
-group MLPs produce tensor-product weights, messages are TP(node[dst], sh, w),
aggregated by *joint* masked mean over all blocks incident to each receiving
node, then equivariant batch-norm and a zero-padded residual.

TPU-native execution strategy (from device profiling):
  * gathers and scatters run as one-hot matmuls on the MXU -- XLA's native
    gather/scatter lowering for these shapes is latency-bound (~16 GB/s);
    the one-hot formulation is ~50x faster and the one-hots are built once
    per edge set and shared across layers (positions are fixed per forward)
  * the message pipeline (edge MLP + TP) can run in bfloat16
    (``compute_dtype``); aggregation and batch-norm accumulate in float32
  * receiver/supplier scalar features are gathered inside the layer via the
    shared one-hots (the reference concatenates them on the host per layer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graphs.containers import ListEdges
from .batchnorm import MaskedIrrepsBatchNorm
from .irreps import Irreps
from .tensor_product import WeightedTensorProduct


# per-edge TP weight layout used by all conv layers (see tensor_product.py
# __call__ docstring).  Measured on v5e at bench shapes: "fo" 49.2 ms,
# "of" 49.5 ms, "of_t" 50.8 ms per forward -- XLA's layout assignment
# normalizes the logical index order away, so the reference "fo" layout
# stays the default (it also matches the Pallas kernel's expectation).
_DEFAULT_W_LAYOUT = "fo"


def build_onehots(edges: ListEdges, n_src: int, n_dst: int, dtype=jnp.bfloat16):
    """(oh_src (B,E,Ns) masked, oh_dst (B,E,Nd)) for matmul gather/scatter."""
    m = edges.mask
    oh_src = (
        jax.nn.one_hot(edges.src, n_src, dtype=dtype)
        * m[..., None].astype(dtype)
    )
    oh_dst = jax.nn.one_hot(edges.dst, n_dst, dtype=dtype)
    return oh_src, oh_dst


def gather_nodes(node_attr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) gathered at (B, E) -> (B, E, D) (plain XLA gather)."""
    return jnp.take_along_axis(node_attr, idx[..., None].astype(jnp.int32), axis=1)


def gather_mm(oh: jnp.ndarray, node_attr: jnp.ndarray) -> jnp.ndarray:
    """One-hot matmul gather: (B,E,N) @ (B,N,D) -> (B,E,D) on the MXU.

    Either operand may carry a leading dim of 1 (pose-shared receptor mode,
    models/score_model.py shared_rec): a B=1 one-hot against B-pose node
    features (or vice versa) contracts with the singleton operand READ ONCE
    instead of replicated B times -- at bench shapes the receptor one-hot is
    ~200 MB/step replicated vs ~5 MB shared.
    """
    pet = node_attr.dtype if node_attr.dtype == jnp.float32 else None
    if oh.shape[0] == node_attr.shape[0]:
        return jnp.einsum("ben,bnd->bed", oh, node_attr.astype(oh.dtype),
                          preferred_element_type=pet)
    if oh.shape[0] == 1:
        return jnp.einsum("en,bnd->bed", oh[0], node_attr.astype(oh.dtype),
                          preferred_element_type=pet)
    return jnp.einsum("ben,nd->bed", oh, node_attr[0].astype(oh.dtype),
                      preferred_element_type=pet)


def gather_pos(oh: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Position gather as a HIGH-precision one-hot matmul.

    XLA's native gather on 3-wide f32 rows is latency-bound (~5 GB/s); the
    matmul form runs ~4x faster.  HIGH precision (3-pass bf16) keeps
    coordinates exact to ~2^-21 relative -- sub-micro-Angstrom here.
    Leading dims of 1 broadcast as in :func:`gather_mm`.
    """
    oh = oh.astype(jnp.float32)
    if oh.shape[0] == pos.shape[0]:
        return jnp.einsum("ben,bnd->bed", oh, pos,
                          precision=jax.lax.Precision.HIGH)
    if oh.shape[0] == 1:
        return jnp.einsum("en,bnd->bed", oh[0], pos,
                          precision=jax.lax.Precision.HIGH)
    return jnp.einsum("ben,nd->bed", oh, pos[0],
                      precision=jax.lax.Precision.HIGH)


def scatter_mm(oh_src: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
    """One-hot matmul scatter-add: (B,E,N)^T @ (B,E,D) -> (B,N,D), f32 acc.
    Leading dims of 1 broadcast as in :func:`gather_mm`."""
    if oh_src.shape[0] == msg.shape[0]:
        return jnp.einsum("ben,bed->bnd", oh_src, msg.astype(oh_src.dtype),
                          preferred_element_type=jnp.float32)
    if oh_src.shape[0] == 1:
        return jnp.einsum("en,bed->bnd", oh_src[0], msg.astype(oh_src.dtype),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("ben,ed->bnd", oh_src, msg[0].astype(oh_src.dtype),
                      preferred_element_type=jnp.float32)


def bcat(parts):
    """Concat along the feature axis, broadcasting mixed leading dims (the
    pose-shared receptor arrays carry B=1 next to per-pose B arrays)."""
    bmax = max(p.shape[0] for p in parts)
    return jnp.concatenate(
        [jnp.broadcast_to(p, (bmax,) + p.shape[1:]) if p.shape[0] != bmax else p
         for p in parts], -1)


@dataclasses.dataclass
class ConvBlock:
    """One edge block feeding a conv layer (built by the model each call).

    ``edge_attr`` carries the *base* per-edge features; receiver/supplier
    scalar features are appended inside the layer when ``append_scalars``.
    ``scalar_src_type``/``scalar_dst_type`` override which node sets supply
    those scalars (used by flipped cross blocks).
    """

    edges: ListEdges
    src_type: str  # receiving node set
    dst_type: str  # supplying node set
    edge_attr: jnp.ndarray  # (B, E, F)
    edge_sh: jnp.ndarray  # (B, E, sh_dim)
    group: int = 0  # which FC parameter group
    append_scalars: bool = True
    onehots: Optional[tuple] = None  # (oh_src, oh_dst) cache


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
    n_scalars: Optional[int] = None  # scalar feature width (default: ns from irreps)
    compute_dtype: Any = jnp.float32
    # fused Pallas modes (inference path): False = pure XLA; "block" (or
    # True) = gather+MLP+TP+scatter mega-kernel; "message" = MLP+TP only,
    # gathers/scatters stay in XLA (ops/pallas_conv.py edge_message)
    use_pallas: Any = False
    fuse_w2: bool = False  # one wide w2 matmul instead of per-block matmuls
    # training-memory rematerialization: jax.checkpoint around each edge
    # block's gather->MLP->TP->scatter, so the backward pass recomputes the
    # per-edge intermediates (gathered features, MLP hidden, TP weight
    # blocks, messages -- the 100s-of-MB temps at worst-case caps) instead
    # of storing them; only node-level activations and the layer-shared
    # one-hots persist per layer.  Trades ~1 extra forward of FLOPs for
    # a several-fold cut in training HBM footprint.
    remat: bool = False

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
        """Run the convolution; returns dict of (B, N_t, out_dim) per type."""
        tp = WeightedTensorProduct(self.in_irreps, self.sh_irreps, self.out_irreps)
        hidden = self.hidden_features or self.n_edge_features
        cdt = self.compute_dtype
        # out-major weight layout lets the fan-contraction consume the w2
        # matmul output in its produced layout (saves a full HBM layout copy
        # of every per-edge weight block, ~10 ms/forward at bench shapes).
        # The Pallas kernel bakes in the reference "fo" layout, so a config
        # must keep use_pallas fixed between training and serving.
        w_layout = "fo" if self.use_pallas else _DEFAULT_W_LAYOUT
        # edge-weight MLP params declared inline (not via FCBlock) so the
        # Pallas fused kernel can consume the same parameter tree
        assert self.tp_weights_layers == 2
        init = nn.initializers.lecun_normal()
        zeros = nn.initializers.zeros
        f_in = self.n_edge_features
        mlps = []
        for g in range(self.edge_groups):
            w1 = self.param(f"fc{g}_w1", init, (f_in, hidden))
            b1 = self.param(f"fc{g}_b1", zeros, (hidden,))
            w2 = [
                self.param(f"fc{g}_w2_{k}", init, (hidden, d)) if d else None
                for k, d in enumerate(tp.weight_splits)
            ]
            b2 = [
                self.param(f"fc{g}_b2_{k}", zeros, (d,)) if d else None
                for k, d in enumerate(tp.weight_splits)
            ]
            mlps.append((w1, b1, w2, b2))

        def run_mlp(g, e, deterministic):
            # NOTE: splitting this first matmul into per-part partial
            # matmuls (avoiding the concat materialization) was measured at
            # 1.33 vs 1.41 complexes/sec end-to-end -- XLA's concat+matmul
            # lowering wins, matching the round-2 2D-flattened-MLP finding.
            w1, b1, w2, b2 = mlps[g]
            h = nn.relu(e @ w1.astype(cdt) + b1.astype(cdt))
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            if self.fuse_w2:
                # one wide matmul over the concatenated per-block weight
                # matrices, then slice views per block
                W2 = jnp.concatenate([w.astype(cdt) for w in w2 if w is not None], -1)
                B2 = jnp.concatenate([b.astype(cdt) for b in b2 if b is not None], -1)
                big = h @ W2 + B2
                outs, ofs = [], 0
                for wk in w2:
                    if wk is None:
                        outs.append(None)
                    else:
                        outs.append(big[..., ofs : ofs + wk.shape[-1]])
                        ofs += wk.shape[-1]
                return tuple(outs)
            return tuple(
                (h @ wk.astype(cdt) + bk.astype(cdt)) if wk is not None else None
                for wk, bk in zip(w2, b2)
            )
        ns = self.n_scalars or Irreps(self.in_irreps)[0].mul

        if out_types is None:
            out_types = sorted({b.src_type for b in blocks})
        out_dim = Irreps(self.out_irreps).dim
        counts = {
            t: (out_counts or {}).get(
                t, node_attrs[t].shape[1] if t in node_attrs else None
            )
            for t in out_types
        }
        # init at B=1: jnp broadcasting grows the accumulators to the pose
        # batch on the first pose-dependent contribution, so blocks whose
        # arrays are pose-shared (leading dim 1, shared_rec mode) accumulate
        # once instead of per pose
        sums = {t: jnp.zeros((1, counts[t], out_dim), jnp.float32) for t in out_types}
        ns_count = {t: jnp.zeros((1, counts[t], 1), jnp.float32) for t in out_types}

        for blk in blocks:
            if blk.onehots is not None:
                oh_src, oh_dst = blk.onehots
            else:
                oh_src, oh_dst = build_onehots(
                    blk.edges, counts[blk.src_type], node_attrs[blk.dst_type].shape[1],
                    dtype=cdt,
                )
            fusable = (
                self.use_pallas
                and (deterministic or self.dropout == 0.0)
                and blk.append_scalars
                and blk.src_type in node_attrs
                # the Pallas kernels assume uniform leading dims (no
                # pose-shared B=1 broadcasting)
                and blk.edges.src.shape[0]
                == node_attrs[blk.dst_type].shape[0]
                == node_attrs[blk.src_type].shape[0]
            )
            if fusable and self.use_pallas == "message":
                # MLP+TP fused in VMEM; gathers/scatters remain XLA fusions.
                # Saves the per-edge TP weight blocks' HBM round trips
                # (~3.7 KB/edge) without the block kernel's fusion barrier
                # around gather/scatter.
                from ..ops.pallas_conv import edge_message

                x = gather_mm(oh_dst, node_attrs[blk.dst_type].astype(cdt))
                s_src = gather_mm(oh_src, node_attrs[blk.src_type][..., :ns].astype(cdt))
                eattr = jnp.concatenate(
                    [blk.edge_attr.astype(cdt), s_src, x[..., :ns]], -1
                )
                w1, b1, w2, b2 = mlps[blk.group]
                msg = edge_message(tp, eattr, x, blk.edge_sh.astype(cdt), w1, b1, w2, b2)
                sums[blk.src_type] = sums[blk.src_type] + scatter_mm(oh_src, msg)
                ones = jnp.ones(msg.shape[:2] + (1,), cdt)
                ns_count[blk.src_type] = ns_count[blk.src_type] + scatter_mm(oh_src, ones)
                continue
            if fusable:
                # fully fused gather+MLP+TP+scatter kernel; node sums direct
                from ..ops.pallas_conv import edge_block_message_sum, prepare_x_imajor

                w1, b1, w2, b2 = mlps[blk.group]
                sums[blk.src_type] = sums[blk.src_type] + edge_block_message_sum(
                    tp, blk.edge_attr.astype(cdt), blk.edge_sh.astype(cdt),
                    oh_src, oh_dst,
                    prepare_x_imajor(tp, node_attrs[blk.dst_type]).astype(cdt),
                    node_attrs[blk.src_type].astype(cdt), ns, w1, b1, w2, b2,
                )
                ones = jnp.ones(blk.edge_attr.shape[:2] + (1,), cdt)
                ns_count[blk.src_type] = ns_count[blk.src_type] + scatter_mm(oh_src, ones)
                continue
            if self.remat:
                # checkpointed PURE edge-block function: inputs are the
                # (layer-shared, already-live) one-hots plus node-level
                # arrays, outputs are node-level sums -- nothing per-edge
                # survives the forward pass.  Dropout runs as an explicit
                # bernoulli on a key drawn OUTSIDE the checkpoint so the
                # recompute is deterministic (nn.Dropout's make_rng cannot
                # be called inside jax.checkpoint).
                dropout_on = self.dropout > 0.0 and not deterministic
                key = self.make_rng("dropout") if dropout_on else None
                apnd, rate = blk.append_scalars, self.dropout
                w1, b1, w2, b2 = mlps[blk.group]

                def edge_block_fn(oh_s, oh_d, dst_attr, src_nodes,
                                  eattr_base, sh, k, w1, b1, w2, b2):
                    x = gather_mm(oh_d, dst_attr.astype(cdt))
                    e = eattr_base.astype(cdt)
                    if apnd:
                        if src_nodes is not None:
                            s_src = gather_mm(
                                oh_s, src_nodes[..., :ns].astype(cdt))
                        else:
                            s_src = jnp.zeros(e.shape[:2] + (ns,), cdt)
                        e = bcat([e, s_src, x[..., :ns]])
                    h = nn.relu(e @ w1.astype(cdt) + b1.astype(cdt))
                    if dropout_on:
                        keep = 1.0 - rate
                        h = jnp.where(jax.random.bernoulli(k, keep, h.shape),
                                      h / keep, 0.0)
                    w = tuple(
                        (h @ wk.astype(cdt) + bk.astype(cdt))
                        if wk is not None else None
                        for wk, bk in zip(w2, b2))
                    m = tp(x, sh.astype(cdt), w, w_layout=w_layout)
                    ones = jnp.ones(m.shape[:2] + (1,), cdt)
                    return scatter_mm(oh_s, m), scatter_mm(oh_s, ones)

                s, c = jax.checkpoint(edge_block_fn)(
                    oh_src, oh_dst, node_attrs[blk.dst_type],
                    node_attrs.get(blk.src_type), blk.edge_attr,
                    blk.edge_sh, key, w1, b1, w2, b2)
                sums[blk.src_type] = sums[blk.src_type] + s
                ns_count[blk.src_type] = ns_count[blk.src_type] + c
                continue
            x = gather_mm(oh_dst, node_attrs[blk.dst_type].astype(cdt))
            eattr = blk.edge_attr.astype(cdt)
            if blk.append_scalars:
                if blk.src_type in node_attrs:
                    s_src = gather_mm(oh_src, node_attrs[blk.src_type][..., :ns].astype(cdt))
                else:
                    s_src = jnp.zeros(eattr.shape[:2] + (ns,), cdt)
                eattr = bcat([eattr, s_src, x[..., :ns]])
            w = run_mlp(blk.group, eattr, deterministic)
            msg = tp(x, blk.edge_sh.astype(cdt), w, w_layout=w_layout)
            sums[blk.src_type] = sums[blk.src_type] + scatter_mm(oh_src, msg)
            ones = jnp.ones(msg.shape[:2] + (1,), cdt)
            ns_count[blk.src_type] = ns_count[blk.src_type] + scatter_mm(oh_src, ones)

        outs = {t: sums[t] / (ns_count[t] + 1e-12) for t in out_types}

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
