"""Pallas fused edge-message kernel: weight-MLP + tensor product in VMEM.

The edge-message pipeline (edge features -> 2-layer weight MLP -> per-edge
tensor product with the supplier's irreps features) is the sampler's dominant
cost.  The XLA path materializes the hidden activations and every per-key
weight block in HBM (~4 KB/edge of round trips); this kernel keeps the whole
pipeline in VMEM per tile of edges:

  e (T, F) --MXU--> H = relu(e @ W1 + b1) --MXU--> W_k = H @ W2_k + b2_k
  basis from x (i-major layout) and sh via the CG tables (VPU, unrolled)
  basis element-repeat via a constant expansion matmul (MXU), then
  msg_k[:, m, c] = sum_f basis[:, f, c] * W_k[:, f, m] / sqrt(fan) as one
  wide multiply + log2(fan) contiguous-half folds (full VPU lanes)

Only the per-edge inputs (eattr, x, sh) and the output message touch HBM.
The kernel is generic over the ``WeightedTensorProduct`` spec (any lmax with
CG entries baked in as constants at trace time).  Forward/inference path
only -- training uses the XLA formulation (dropout + autodiff).

Measured on one v5e-class chip at the receptor-block size (40x7680 edges,
ns=24/nv=6 irreps): 11.9 ms vs 21.1 ms for the XLA path on pre-materialized
inputs -- 1.8x.  HOWEVER, inside the full model both kernels LOSE
end-to-end (round-2 sweep, benchmarks/profile_notes.md): the message-only
mode runs 132 ms vs 47 ms/forward at the flagship capacities
(use_pallas_conv="message", benchmarks/ab_forward.py), and the full
edge-block mega-kernel below measured 0.46 vs 1.25 complexes/sec -- the
pallas_call boundary materializes inputs XLA would otherwise fuse through,
and the unrolled VPU tensor product cannot match XLA's pipelined
multiply-reduce fusions at these widths.  Both ship default-OFF
(``ScoreModelConfig.use_pallas_conv``) as measured design-space probes;
the XLA formulation is the production path on both training and inference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.cg import cg_tensor


def _tp_structure(tp):
    """Static description: per out-block list of (x_offset, mul, C, sh_slice)."""
    out = []
    in_slices = tp.in_irreps.slices()
    sh_slices = tp.sh_irreps.slices()
    for k, out_mi in enumerate(tp.out_irreps):
        paths = []
        for path in tp.paths[k]:
            in_mi = tp.in_irreps[path.in_block]
            sh_mi = tp.sh_irreps[path.sh_block]
            C = cg_tensor(in_mi.ir.l, sh_mi.ir.l, out_mi.ir.l)
            paths.append(
                dict(
                    x_off=in_slices[path.in_block].start,
                    mul=in_mi.mul,
                    d1=in_mi.ir.dim,
                    sh_off=sh_slices[path.sh_block].start,
                    d2=sh_mi.ir.dim,
                    C=C,
                )
            )
        out.append(dict(paths=paths, mul_out=out_mi.mul, d3=out_mi.ir.dim, fan=tp.fan_in[k]))
    return out


def prepare_x_imajor(tp, x: jnp.ndarray) -> jnp.ndarray:
    """Reorder irreps features to i-major layout: per block, component-major
    (d, mul) so the kernel slices contiguous (T, mul) chunks per component."""
    blocks = []
    for mi, sl in zip(tp.in_irreps, tp.in_irreps.slices()):
        b = x[..., sl].reshape(x.shape[:-1] + (mi.mul, mi.ir.dim))
        blocks.append(jnp.swapaxes(b, -1, -2).reshape(x.shape[:-1] + (mi.dim,)))
    return jnp.concatenate(blocks, -1)


def _make_kernel(struct, f_in, hidden, out_dim, acc_dtype=jnp.float32):
    def kernel(e_ref, x_ref, sh_ref, w1_ref, b1_ref, *wb_refs):
        out_ref = wb_refs[-1]
        n3 = len(wb_refs) // 3
        w2_refs = wb_refs[:n3]
        b2_refs = wb_refs[n3 : 2 * n3]
        erep_refs = wb_refs[2 * n3 : -1]

        e = e_ref[:]
        h = jnp.maximum(
            jnp.dot(e, w1_ref[:], preferred_element_type=acc_dtype) + b1_ref[0], 0.0
        ).astype(e.dtype)
        x = x_ref[:]
        sh = sh_ref[:]

        out_blocks = []
        wi = 0
        for blk in struct:
            d3, mul_out, fan = blk["d3"], blk["mul_out"], blk["fan"]
            if fan == 0:
                out_blocks.append(jnp.zeros((e.shape[0], mul_out * d3), e.dtype))
                continue
            W = (
                jnp.dot(h, w2_refs[wi][:], preferred_element_type=acc_dtype)
                + b2_refs[wi][0]
            ) * (1.0 / np.sqrt(fan))
            erep = erep_refs[wi][:]
            wi += 1
            comps = []
            for c in range(d3):
                parts = []
                for p in blk["paths"]:
                    acc = None
                    for i in range(p["d1"]):
                        for j in range(p["d2"]):
                            coef = float(p["C"][i, j, c])
                            if abs(coef) < 1e-12:
                                continue
                            xi = x[:, p["x_off"] + i * p["mul"] : p["x_off"] + (i + 1) * p["mul"]]
                            term = xi * (coef * sh[:, p["sh_off"] + j : p["sh_off"] + j + 1])
                            acc = term if acc is None else acc + term
                    if acc is None:
                        acc = jnp.zeros((e.shape[0], p["mul"]), e.dtype)
                    parts.append(acc)
                bc = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
                # element-repeat each basis column mul_out times (MXU)
                bc_rep = jnp.dot(bc, erep, preferred_element_type=acc_dtype)
                P = W * bc_rep  # (T, fan*mul_out), f-major columns
                # pairwise fold over fan: contiguous halves, full-lane adds
                n = fan
                while n > 1:
                    half = n // 2
                    left = P[:, : half * mul_out]
                    right = P[:, half * mul_out : 2 * half * mul_out]
                    ssum = left + right
                    if n % 2:
                        tail = P[:, 2 * half * mul_out :]
                        if half == 1:
                            ssum = ssum + tail
                        else:
                            ssum = jnp.concatenate(
                                [ssum[:, :mul_out] + tail, ssum[:, mul_out:]], axis=1
                            )
                    P = ssum
                    n = half
                comps.append(P)
            # c-major (T, d3*mul_out): Mosaic cannot shape-cast 3D stacks;
            # the wrapper permutes columns back to the m-major irreps layout
            blk_out = jnp.concatenate(comps, axis=-1)
            out_blocks.append(blk_out.astype(e.dtype))
        out_ref[:] = jnp.concatenate(out_blocks, axis=-1)

    return kernel


def _edge_message_flat(tp, eattr, x_imajor, sh, w1, b1, w2s, b2s, ereps, tile, interpret):
    M, F = eattr.shape
    out_dim = tp.out_irreps.dim
    struct = _tp_structure(tp)
    kernel = _make_kernel(struct, F, w1.shape[1], out_dim)

    grid = (M // tile,)
    in_specs = [
        pl.BlockSpec((tile, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, x_imajor.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, sh.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for w in w2s:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in b2s:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for r in ereps:
        in_specs.append(pl.BlockSpec(r.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, out_dim), eattr.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(eattr, x_imajor, sh, w1, b1, *w2s, *b2s, *ereps)


def edge_message(tp, eattr, x, sh, w1, b1, w2_list, b2_list, tile: int = 512):
    """Fused edge messages.

    Args:
      tp: WeightedTensorProduct spec (hashable static).
      eattr: (B, E, F) assembled edge features.
      x: (B, E, in_dim) supplier irreps features (standard m-major layout).
      sh: (B, E, sh_dim).
      w1, b1: first MLP layer params.
      w2_list, b2_list: per-out-block second-layer params (None for fan=0).
    Returns:
      (B, E, out_dim) messages.
    """
    B, E, F = eattr.shape
    M = B * E
    pad = (-M) % tile
    dtype = eattr.dtype

    def flat(a):
        a = a.reshape(M, a.shape[-1])
        if pad:
            a = jnp.pad(a, [(0, pad), (0, 0)])
        return a

    x_im = prepare_x_imajor(tp, x)
    # column permutation from the kernel's c-major block layout to m-major
    perm = []
    off = 0
    for mi in tp.out_irreps:
        mul, d3 = mi.mul, mi.ir.dim
        for m in range(mul):
            for c in range(d3):
                perm.append(off + c * mul + m)
        off += mul * d3
    perm = jnp.asarray(np.asarray(perm, np.int32))
    w2s = [w.astype(dtype) for w in w2_list if w is not None]
    b2s = [b.reshape(1, -1).astype(dtype) for b in b2_list if b is not None]
    b1 = b1.reshape(1, -1)
    # per-key element-repeat expansion matrices Erep[f, f*mul+m] = 1
    ereps = []
    for mi, fan in zip(tp.out_irreps, tp.fan_in):
        if fan == 0:
            continue
        E_ = np.zeros((fan, fan * mi.mul), np.float32)
        for f in range(fan):
            E_[f, f * mi.mul : (f + 1) * mi.mul] = 1.0
        ereps.append(jnp.asarray(E_, dtype=dtype))
    interpret = jax.default_backend() != "tpu"
    out = _edge_message_flat(
        tp, flat(eattr), flat(x_im), flat(sh),
        w1.astype(dtype), b1.astype(dtype), tuple(w2s), tuple(b2s), tuple(ereps),
        tile, interpret,
    )
    if pad:
        out = out[:M]
    out = jnp.take(out, perm, axis=-1)
    return out.reshape(B, E, -1)


# --------------------------------------------------------------------------
# Fused edge-BLOCK kernel: one-hot gather + weight MLP + TP + scatter-sum in
# a single pallas_call.  The node sum accumulates in a VMEM-resident output
# block (same block index for every edge tile of a graph), so the only HBM
# traffic is: base edge attrs + sh + the two one-hot tiles in, node arrays
# once per graph, node sums out.
#
# MEASURED (v5e-class chip, 40x20 bench): 0.70 complexes/sec at tile=1024
# (0.62 at 256) vs 1.95 for the XLA formulation.  The per-(graph, tile) grid
# granularity starves the MXU (256-1024-row matmuls vs XLA's 160k-row fused
# batches) and the accumulating output block serializes the grid.  Both
# Pallas kernels therefore ship default-off; at this model scale XLA's
# pipelined fusions win, and these kernels document the design space for a
# future larger-model configuration where per-edge weights dominate HBM.
# --------------------------------------------------------------------------


def _make_block_kernel(struct, ns, out_dim, acc_dtype=jnp.float32):
    def kernel(base_ref, sh_ref, ohs_ref, ohd_ref, xnode_ref, snode_ref,
               w1_ref, b1_ref, *wb_refs):
        out_ref = wb_refs[-1]
        n3 = (len(wb_refs) - 1) // 3
        w2_refs = wb_refs[:n3]
        b2_refs = wb_refs[n3 : 2 * n3]
        erep_refs = wb_refs[2 * n3 : 3 * n3]

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        oh_src = ohs_ref[0]
        oh_dst = ohd_ref[0]
        # gathers on the MXU
        x = jnp.dot(oh_dst, xnode_ref[0], preferred_element_type=acc_dtype).astype(oh_dst.dtype)
        s_src = jnp.dot(oh_src, snode_ref[0][:, :ns], preferred_element_type=acc_dtype).astype(oh_src.dtype)
        e = jnp.concatenate([base_ref[0], s_src, x[:, :ns]], axis=-1)
        h = jnp.maximum(
            jnp.dot(e, w1_ref[:], preferred_element_type=acc_dtype) + b1_ref[0], 0.0
        ).astype(e.dtype)
        sh = sh_ref[0]

        out_blocks = []
        wi = 0
        for blk in struct:
            d3, mul_out, fan = blk["d3"], blk["mul_out"], blk["fan"]
            if fan == 0:
                out_blocks.append(jnp.zeros((e.shape[0], mul_out * d3), e.dtype))
                continue
            W = (
                jnp.dot(h, w2_refs[wi][:], preferred_element_type=acc_dtype)
                + b2_refs[wi][0]
            ) * (1.0 / np.sqrt(fan))
            erep = erep_refs[wi][:]
            wi += 1
            comps = []
            for c in range(d3):
                parts = []
                for p in blk["paths"]:
                    acc = None
                    for i in range(p["d1"]):
                        for j in range(p["d2"]):
                            coef = float(p["C"][i, j, c])
                            if abs(coef) < 1e-12:
                                continue
                            xi = x[:, p["x_off"] + i * p["mul"] : p["x_off"] + (i + 1) * p["mul"]]
                            term = xi * (coef * sh[:, p["sh_off"] + j : p["sh_off"] + j + 1])
                            acc = term if acc is None else acc + term
                    if acc is None:
                        acc = jnp.zeros((e.shape[0], p["mul"]), e.dtype)
                    parts.append(acc)
                bc = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
                bc_rep = jnp.dot(bc, erep, preferred_element_type=acc_dtype)
                P = W * bc_rep
                n = fan
                while n > 1:
                    half = n // 2
                    left = P[:, : half * mul_out]
                    right = P[:, half * mul_out : 2 * half * mul_out]
                    ssum = left + right
                    if n % 2:
                        tail = P[:, 2 * half * mul_out :]
                        if half == 1:
                            ssum = ssum + tail
                        else:
                            ssum = jnp.concatenate(
                                [ssum[:, :mul_out] + tail, ssum[:, mul_out:]], axis=1
                            )
                    P = ssum
                    n = half
                comps.append(P)
            out_blocks.append(jnp.concatenate(comps, axis=-1).astype(e.dtype))
        msg = jnp.concatenate(out_blocks, axis=-1)  # c-major columns
        # scatter-sum into the resident node accumulator (MXU):
        # (Ns, T) x (T, Do) via dot_general contracting the tile axis
        contrib = jax.lax.dot_general(
            oh_src, msg, (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype
        )
        out_ref[0] += contrib

    return kernel


def edge_block_message_sum(
    tp, base_eattr, sh, oh_src, oh_dst, x_nodes, s_nodes, ns,
    w1, b1, w2_list, b2_list, tile: int = 1024,
):
    """Fused gather+MLP+TP+scatter for one edge block.

    Args:
      base_eattr: (B, E, Fb) embedded base edge features.
      sh: (B, E, sh_dim).
      oh_src/oh_dst: (B, E, Ns) masked / (B, E, Nd) one-hots.
      x_nodes: (B, Nd, D_in) supplier node features.
      s_nodes: (B, Ns, >=ns) receiver node features (first ns cols used).
      ns: scalar width appended to edge features.
    Returns:
      (B, Ns, out_dim) per-node message SUMS in f32 (c-major within blocks
      re-permuted to m-major), plus requires counts computed by the caller.
    """
    B, E, Fb = base_eattr.shape
    Ns = oh_src.shape[-1]
    Nd = oh_dst.shape[-1]
    dtype = base_eattr.dtype
    pad = (-E) % tile
    if pad:
        z = lambda a: jnp.pad(a, [(0, 0), (0, pad), (0, 0)])
        base_eattr, sh, oh_src, oh_dst = z(base_eattr), z(sh), z(oh_src), z(oh_dst)
    Ep = E + pad
    n_tiles = Ep // tile

    struct = _tp_structure(tp)
    out_dim = tp.out_irreps.dim
    kernel = _make_block_kernel(struct, ns, out_dim)

    w2s = [w.astype(dtype) for w in w2_list if w is not None]
    b2s = [b.reshape(1, -1).astype(dtype) for b in b2_list if b is not None]
    ereps = []
    for mi, fan in zip(tp.out_irreps, tp.fan_in):
        if fan == 0:
            continue
        E_ = np.zeros((fan, fan * mi.mul), np.float32)
        for f in range(fan):
            E_[f, f * mi.mul : (f + 1) * mi.mul] = 1.0
        ereps.append(jnp.asarray(E_, dtype=dtype))

    def tile_spec(width):
        return pl.BlockSpec((1, tile, width), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)

    def node_spec(n, width):
        return pl.BlockSpec((1, n, width), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)

    def param_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [
        tile_spec(Fb), tile_spec(sh.shape[-1]), tile_spec(Ns), tile_spec(Nd),
        node_spec(Nd, x_nodes.shape[-1]), node_spec(Ns, s_nodes.shape[-1]),
        param_spec(w1.shape), param_spec((1, b1.shape[-1]) if b1.ndim == 1 else b1.shape),
    ]
    for w in w2s:
        in_specs.append(param_spec(w.shape))
    for b in b2s:
        in_specs.append(param_spec(b.shape))
    for r in ereps:
        in_specs.append(param_spec(r.shape))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ns, out_dim), jnp.float32),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Ns, out_dim), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(
        base_eattr, sh, oh_src, oh_dst,
        x_nodes.astype(dtype), s_nodes.astype(dtype),
        w1.astype(dtype), b1.reshape(1, -1).astype(dtype), *w2s, *b2s, *ereps,
    )
    # c-major -> m-major column permutation
    perm = []
    off = 0
    for mi in tp.out_irreps:
        mul, d3 = mi.mul, mi.ir.dim
        for m in range(mul):
            for c in range(d3):
                perm.append(off + c * mul + m)
        off += mul * d3
    return jnp.take(out, jnp.asarray(np.asarray(perm, np.int32)), axis=-1)
