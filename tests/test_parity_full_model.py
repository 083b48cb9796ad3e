"""Full-model numeric parity: the COMPLETE score-model forward and one
reverse Euler-Maruyama step vs an independent plain-torch oracle.

The unit-level parity suite (test_parity_torch.py) checks the TP kernel, the
SO(3)/torus tables and modify_conformer in isolation.  This file closes the
remaining gap: a from-scratch torch/numpy twin of the reference's
``TensorProductScoreModel.forward`` (models/score_model.py:169-307) --
dynamic (unpadded) graph building, 5-layer conv trunk over the 4 edge
groups, center-conv tr/rot head, pseudotorque torsion head, sigma
normalizations -- consuming the SAME randomized flax parameter tree as the
JAX model, must produce the same three scores on padded masked batches; and
one full reverse step (utils/sampling.py:105-198) with the shipped
DisCo-DiffDock low-temperature constants must produce the same pose.

The oracle intentionally re-derives everything the padded/masked/one-hot TPU
path could get wrong: edge enumeration (vs capacity compaction), joint
scatter-means (vs one-hot matmuls), running-stat batchnorm slicing, head
plumbing, drift math.  Two shared ingredients are consumed rather than
re-derived, each validated elsewhere: the Clebsch-Gordan tables
(tests/test_nn.py equivariance suite) and the SO(3)/torus score-norm tables
(test_parity_torch.py vs the reference formulas).
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom import so3, torus
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.nn.cg import cg_tensor
from disco_diffdock_tpu.nn.irreps import Irreps
from disco_diffdock_tpu.nn.tensor_product import FullTensorProduct, get_irrep_seq

# ---------------------------------------------------------------------------
# torch oracle building blocks
# ---------------------------------------------------------------------------


def t_sinusoidal(t: float, dim: int, scale: float = 1000.0) -> np.ndarray:
    """sinusoidal_embedding(scale * t, dim) (diffusion_utils.py:58-70).

    Computed in float32 like both the reference and the JAX model: the
    ``scale * t`` phase multiplies frequency rounding by up to 1000, so a
    float64 recompute here would NOT match either implementation."""
    half = dim // 2
    freqs = np.exp(
        np.arange(half, dtype=np.float32)
        * np.float32(-math.log(10000.0) / (half - 1))).astype(np.float32)
    x = (np.float32(scale) * np.float32(t)) * freqs
    emb = np.concatenate([np.sin(x), np.cos(x)])
    return emb.astype(np.float64)


def t_sh(vec: torch.Tensor, lmax: int) -> torch.Tensor:
    """Component-normalized real SH, (y,z,x) l=1 layout (nn/sh.py twin)."""
    n = torch.sqrt((vec * vec).sum(-1, keepdim=True)) + 1e-12
    x, y, z = (vec / n).unbind(-1)
    comps = [torch.ones_like(x)]
    if lmax >= 1:
        s3 = math.sqrt(3.0)
        comps += [s3 * y, s3 * z, s3 * x]
    if lmax >= 2:
        s15 = math.sqrt(15.0)
        comps += [s15 * x * y, s15 * y * z,
                  (math.sqrt(5.0) / 2.0) * (3 * z * z - 1),
                  s15 * x * z, (s15 / 2.0) * (x * x - y * y)]
    assert lmax <= 2
    return torch.stack(comps, -1)


def t_rbf(dist: torch.Tensor, stop: float, num: int) -> torch.Tensor:
    """GaussianSmearing (models/score_model.py GaussianSmearing twin)."""
    offset = torch.linspace(0.0, stop, num, dtype=dist.dtype)
    coeff = -0.5 / float(stop) ** 2 * (num - 1) ** 2
    d = dist[..., None] - offset
    return torch.exp(coeff * d * d)


def t_t(x) -> torch.Tensor:
    """Parameter-leaf converter: numpy (or jax) array -> f64 torch tensor,
    torch tensors pass through untouched.  The pass-through is what makes the
    oracle DIFFERENTIABLE: the training-step parity tests feed a params tree
    whose leaves are requires_grad torch tensors, and every helper below
    routes parameter access through this function."""
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x, np.float64))


def t_fcblock(params: dict, x: torch.Tensor) -> torch.Tensor:
    """FCBlock with layers=2: Dense/relu/Dense (nn/basic.py FCBlock)."""
    h = torch.relu(x @ t_t(params["Dense_0"]["kernel"]) + t_t(params["Dense_0"]["bias"]))
    return h @ t_t(params["Dense_1"]["kernel"]) + t_t(params["Dense_1"]["bias"])


def t_dense(params: dict, x: torch.Tensor) -> torch.Tensor:
    out = x @ t_t(params["kernel"])
    if "bias" in params:
        out = out + t_t(params["bias"])
    return out


def t_atom_encoder(params: dict, codes: np.ndarray, extras: torch.Tensor,
                   n_cat: int) -> torch.Tensor:
    """AtomEncoder: sum of Embed tables + joint Dense over [emb, extras];
    with no extras (additional_dim=0) the Dense is absent."""
    emb = 0.0
    for i in range(n_cat):
        table = t_t(params[f"Embed_{i}"]["embedding"])
        emb = emb + table[torch.from_numpy(codes[:, i].astype(np.int64))]
    if "Dense_0" not in params:
        return emb
    return t_dense(params["Dense_0"], torch.cat([emb, extras], -1))


class TorchWeightedTP:
    """General weighted TP twin of nn/tensor_product.WeightedTensorProduct,
    layout 'fo', 1/sqrt(fan) normalization (reference FasterTensorProduct
    convention, tensor_layers.py:88-92, generalized)."""

    def __init__(self, in_irreps, sh_irreps, out_irreps):
        self.in_irreps = Irreps(in_irreps)
        self.sh_irreps = Irreps(sh_irreps)
        self.out_irreps = Irreps(out_irreps)
        self.paths, self.fan_in = [], []
        for out_mi in self.out_irreps:
            pk, fan = [], 0
            for i, in_mi in enumerate(self.in_irreps):
                for j, sh_mi in enumerate(self.sh_irreps):
                    if in_mi.ir.p * sh_mi.ir.p != out_mi.ir.p:
                        continue
                    if not abs(in_mi.ir.l - sh_mi.ir.l) <= out_mi.ir.l <= in_mi.ir.l + sh_mi.ir.l:
                        continue
                    pk.append((i, j))
                    fan += in_mi.mul
            self.paths.append(pk)
            self.fan_in.append(fan)
        self.weight_splits = [f * mi.mul for f, mi in zip(self.fan_in, self.out_irreps)]

    def __call__(self, x: torch.Tensor, sh: torch.Tensor,
                 w_blocks: list) -> torch.Tensor:
        in_slices = self.in_irreps.slices()
        sh_slices = self.sh_irreps.slices()
        outs = []
        for k, out_mi in enumerate(self.out_irreps):
            fan = self.fan_in[k]
            if fan == 0:
                outs.append(torch.zeros(x.shape[:-1] + (out_mi.dim,), dtype=x.dtype))
                continue
            basis = []
            for (i, j) in self.paths[k]:
                in_mi, sh_mi = self.in_irreps[i], self.sh_irreps[j]
                C = torch.from_numpy(
                    cg_tensor(in_mi.ir.l, sh_mi.ir.l, out_mi.ir.l).astype(np.float64))
                xb = x[..., in_slices[i]].reshape(x.shape[:-1] + (in_mi.mul, in_mi.ir.dim))
                shb = sh[..., sh_slices[j]]
                T = torch.einsum("ej,ijk->eik", shb, C)
                basis.append(torch.einsum("emi,eik->emk", xb, T))
            basis = torch.cat(basis, dim=-2)  # (E, fan, d3)
            W = w_blocks[k].reshape(-1, fan, out_mi.mul) / math.sqrt(fan)
            out = torch.einsum("efk,efo->eok", basis, W)
            outs.append(out.reshape(out.shape[0], out_mi.dim))
        return torch.cat(outs, -1)


def t_conv_mlp(params: dict, g: int, eattr: torch.Tensor, n_splits: int):
    """Per-group edge-weight MLP of TPConvLayer (nn/conv.py fc{g}_*)."""
    h = torch.relu(eattr @ t_t(params[f"fc{g}_w1"]) + t_t(params[f"fc{g}_b1"]))
    blocks = []
    for k in range(n_splits):
        if f"fc{g}_w2_{k}" in params:
            blocks.append(h @ t_t(params[f"fc{g}_w2_{k}"]) + t_t(params[f"fc{g}_b2_{k}"]))
        else:
            blocks.append(None)
    return blocks


def t_irreps_bn(params: dict, stats, irreps, x: torch.Tensor,
                batch_stats=None) -> torch.Tensor:
    """MaskedIrrepsBatchNorm twin (nn/batchnorm.py): per-channel var for all
    blocks, mean + bias only for 0e, weight for every channel.  By default
    consumes the RUNNING stats in ``stats`` (use_running_average mode); the
    training-step parity tests pass ``batch_stats=(mean, var)`` torch tensors
    (from :func:`t_bn_batch_stats`) to run in training mode instead."""
    irreps = Irreps(irreps)
    weight = t_t(params["weight"])
    bias = t_t(params["bias"]) if "bias" in params else None
    if batch_stats is not None:
        mean, var = batch_stats
    else:
        mean = t_t(stats["mean"]) if "mean" in stats else None
        var = t_t(stats["var"])
    blocks_out = []
    ch = sc = 0
    for mi, sl in zip(irreps, irreps.slices()):
        d = mi.ir.dim
        b = x[..., sl].reshape(x.shape[:-1] + (mi.mul, d))
        is_scalar = mi.ir.l == 0 and mi.ir.p == 1
        if is_scalar:
            b = b - mean[sc: sc + mi.mul][:, None]
        factor = weight[ch: ch + mi.mul] / torch.sqrt(var[ch: ch + mi.mul] + 1e-5)
        b = b * factor[:, None]
        if is_scalar:
            b = b + bias[sc: sc + mi.mul][:, None]
            sc += mi.mul
        blocks_out.append(b.reshape(b.shape[:-2] + (mi.dim,)))
        ch += mi.mul
    return torch.cat(blocks_out, -1)


def t_bn_batch_stats(irreps, xs):
    """Joint masked TRAINING-mode batch statistics over a list of UNPADDED
    (n_i, D) torch tensors -- the twin of MaskedIrrepsBatchNorm's stat
    computation (nn/batchnorm.py: total = sum of valid rows + 1e-12, scalar
    blocks mean-subtracted BEFORE the component-mean squared norm).  Returns
    differentiable (mean (n_scalar,) | None, var (n_ch,))."""
    irreps = Irreps(irreps)
    total = float(sum(int(x.shape[0]) for x in xs)) + 1e-12
    means, variances = [], []
    for mi, sl in zip(irreps, irreps.slices()):
        d = mi.ir.dim
        blocks = [x[..., sl].reshape(x.shape[0], mi.mul, d) for x in xs]
        if mi.ir.l == 0 and mi.ir.p == 1:
            mean = sum(b[..., 0].sum(0) for b in blocks) / total
            means.append(mean)
            blocks = [b - mean[:, None] for b in blocks]
        variances.append(sum((b ** 2).mean(-1).sum(0) for b in blocks) / total)
    mean = torch.cat(means) if means else None
    return mean, torch.cat(variances)


# --- generator-driven batch-norm protocol -----------------------------------
# The oracle trunks/heads are written as generators that YIELD at every
# batch-norm site: ``normalized = yield (site_path, irreps, [tensors])``.
# Driving a generator with the running-stats normalizer reproduces the plain
# use_running_average oracle (all the forward-parity tests); the training
# -step parity tests drive a batch of per-graph generators in LOCKSTEP,
# computing joint training-mode statistics across the graphs at each site --
# exactly what the flax model does over the padded batch.


def _bn_running(params, stats):
    """bn_fn applying running-average normalization (site-relative lookup)."""

    def fn(site, irreps, xs):
        p, s = params, stats
        for k in site:
            p, s = p[k], s[k]
        return [t_irreps_bn(p, s, irreps, x) for x in xs]

    return fn


def _drive(gen, bn_fn):
    """Run a BN-yielding oracle generator to completion."""
    try:
        req = next(gen)
        while True:
            req = gen.send(bn_fn(*req))
    except StopIteration as e:
        return e.value


def _prefix_sites(gen, prefix: tuple):
    """Adapter generator: re-root a sub-generator's BN site paths."""
    try:
        req = next(gen)
        while True:
            sent = yield (prefix + req[0],) + tuple(req[1:])
            req = gen.send(sent)
    except StopIteration as e:
        return e.value


def drive_joint(gens, bn_fn_joint):
    """Drive per-graph generators in lockstep: at each BN site, hand ALL
    graphs' tensors to ``bn_fn_joint(site, irreps, xs_per_gen)`` (which
    computes joint batch statistics) and send each graph its normalized
    share.  Returns the list of generator return values."""
    results = [None] * len(gens)
    reqs = {}
    for i, gen in enumerate(gens):
        try:
            reqs[i] = next(gen)
        except StopIteration as e:  # pragma: no cover - no-BN configs
            results[i] = e.value
    while reqs:
        order = sorted(reqs)
        sites = {reqs[i][0] for i in order}
        assert len(sites) == 1, f"generators desynchronized: {sites}"
        site, irreps = reqs[order[0]][:2]
        outs = bn_fn_joint(site, irreps, [reqs[i][2] for i in order])
        new_reqs = {}
        for j, i in enumerate(order):
            try:
                new_reqs[i] = gens[i].send(outs[j])
            except StopIteration as e:
                results[i] = e.value
        reqs = new_reqs
    return results


def make_bn_train_joint(params, momentum=0.1):
    """Joint training-mode bn_fn + a dict capturing each site's batch stats
    (for checking the running-stat momentum updates against the jax side).
    ``params`` is the root tree the site paths are relative to."""
    captured = {}

    def fn(site, irreps, xs_per_gen):
        flat = [x for xs in xs_per_gen for x in xs]
        mean, var = t_bn_batch_stats(irreps, flat)
        captured[site] = (mean, var)
        p = params
        for k in site:
            p = p[k]
        return [
            [t_irreps_bn(p, None, irreps, x, batch_stats=(mean, var)) for x in xs]
            for xs in xs_per_gen
        ]

    return fn, captured


def irrep_to_vec_np(c: torch.Tensor) -> torch.Tensor:
    """(y,z,x) component layout -> physical (x,y,z) (nn/sh.py)."""
    return torch.stack([c[..., 2], c[..., 0], c[..., 1]], -1)


# ---------------------------------------------------------------------------
# the oracle forward (one UNPADDED graph, dynamic edges, plain torch)
# ---------------------------------------------------------------------------


def oracle_trunk_gen(params, cfg: ScoreModelConfig, sigma: SigmaSchedule,
                     g: dict, t: float, lat=None, unconditional: bool = False,
                     confidence_mode: bool = False, glat=None, post_layer=None):
    """Graph build + conv trunk; returns (lig_attr, rec_attr) torch f64.
    Generator: yields at every batch-norm site (see the BN protocol above);
    use :func:`oracle_trunk` for the plain running-average form.

    ``lat``: optional ((nl, Ld), (nr, Ld)) numpy node-latent features
    (vocab=1 path): appended to node extras, [lat[src], lat[dst]] appended
    to lig/rec edge attrs, zeros on cross edges (score_model.py:329-404).
    ``glat``: optional flat (Ld*vocab,) numpy graph-level latent (vocab>1
    path): broadcast onto node extras, appended once per lig/rec edge
    (gather at src of a graph-constant), zeros on cross edges.
    ``post_layer``: optional callable ``(li, lig_attr, rec_attr) ->
    (lig_attr, rec_attr)`` applied after conv layer li (the latent
    cross-attention twin, score_model.py:232-254).
    ``unconditional``: add the five CFG unconditional embeddings after the
    embedding MLPs (score_model.py:209-215) -- the AR prior's trunk mode.
    """
    ns = cfg.ns
    pos_l = torch.from_numpy(g["lig_pos"].astype(np.float64))
    pos_r = torch.from_numpy(g["rec_pos"].astype(np.float64))
    nl, nr = len(pos_l), len(pos_r)

    tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t, t, t)
    if confidence_mode:
        # confidence models consume raw complex_t as the "sigmas"
        # (score_model.py embed(): sigmas = (t_tr, t_rot, t_tor)), so the
        # dynamic cross cutoff reads 3*t + 20
        tr_sigma = t
    sig_emb = torch.from_numpy(t_sinusoidal(t, cfg.sigma_embed_dim, cfg.embedding_scale))
    if lat is not None:
        lat_l, lat_r = t_t(lat[0]), t_t(lat[1])
    if glat is not None:
        gvec = t_t(glat)

    # node embeddings (score_model.py:310-373 node paths)
    lig_extras = sig_emb[None].expand(nl, -1)
    if lat is not None:
        lig_extras = torch.cat([lig_extras, lat_l], -1)
    if glat is not None:
        lig_extras = torch.cat([lig_extras, gvec[None].expand(nl, -1)], -1)
    lig_attr = t_atom_encoder(
        params["lig_node_embedding"], g["lig_x"], lig_extras, n_cat=16)
    rec_extras = torch.cat([
        torch.from_numpy(g["rec_x"][:, 1:].astype(np.float64)),
        sig_emb[None].expand(nr, -1)], -1)
    if lat is not None:
        rec_extras = torch.cat([rec_extras, lat_r], -1)
    if glat is not None:
        rec_extras = torch.cat([rec_extras, gvec[None].expand(nr, -1)], -1)
    rec_attr = t_atom_encoder(
        params["rec_node_embedding"], g["rec_x"][:, :1], rec_extras, n_cat=1)

    # ---- ligand edges: bonds + 5A radius pairs (duplicates kept, as in the
    # reference's concatenation, score_model.py:310-344)
    b_src = g["bonds"][:, 0].tolist()
    b_dst = g["bonds"][:, 1].tolist()
    r_src, r_dst = [], []
    for i in range(nl):
        for j in range(nl):
            if i != j and np.linalg.norm(g["lig_pos"][i] - g["lig_pos"][j]) < cfg.lig_max_radius:
                r_src.append(i)
                r_dst.append(j)
    lig_src = np.asarray(b_src + r_src)
    lig_dst = np.asarray(b_dst + r_dst)
    bond_feat = torch.zeros((len(lig_src), 4), dtype=torch.float64)
    bond_feat[: len(b_src)] = torch.from_numpy(g["bond_attr"].astype(np.float64))
    vec_l = pos_l[lig_dst] - pos_l[lig_src]
    dist_l = torch.sqrt(((vec_l + 1e-12) ** 2).sum(-1))
    lig_eattr = [
        bond_feat, sig_emb[None].expand(len(lig_src), -1),
        t_rbf(dist_l, cfg.lig_max_radius, cfg.distance_embed_dim)]
    if lat is not None:
        lig_eattr.append(torch.cat([lat_l[lig_src], lat_l[lig_dst]], -1))
    if glat is not None:
        lig_eattr.append(gvec[None].expand(len(lig_src), -1))
    lig_eattr = t_fcblock(params["lig_edge_embedding"], torch.cat(lig_eattr, -1))
    lig_sh = t_sh(vec_l, cfg.sh_lmax)

    # ---- receptor edges (precomputed kNN)
    rec_src, rec_dst = g["rec_src"], g["rec_dst"]
    vec_r = pos_r[rec_dst] - pos_r[rec_src]
    dist_r = torch.sqrt(((vec_r + 1e-12) ** 2).sum(-1))
    rec_eattr = [
        sig_emb[None].expand(len(rec_src), -1),
        t_rbf(dist_r, cfg.rec_max_radius, cfg.distance_embed_dim)]
    if lat is not None:
        rec_eattr.append(torch.cat([lat_r[rec_src], lat_r[rec_dst]], -1))
    if glat is not None:
        rec_eattr.append(gvec[None].expand(len(rec_src), -1))
    rec_eattr = t_fcblock(params["rec_edge_embedding"], torch.cat(rec_eattr, -1))
    rec_sh = t_sh(vec_r, cfg.sh_lmax)

    # ---- cross edges, dynamic cutoff 3*sigma_tr + 20 (score_model.py:202)
    cutoff = tr_sigma * 3 + 20 if cfg.dynamic_max_cross else cfg.cross_max_distance
    x_src, x_dst = [], []
    for i in range(nl):
        for j in range(nr):
            if np.linalg.norm(g["lig_pos"][i] - g["rec_pos"][j]) < cutoff:
                x_src.append(i)
                x_dst.append(j)
    # int64 even when EMPTY (np.asarray([]) is float64; a far-drifted pose
    # mid-trajectory can legitimately have zero cross pairs)
    x_src, x_dst = np.asarray(x_src, np.int64), np.asarray(x_dst, np.int64)
    vec_x = pos_r[x_dst] - pos_l[x_src]
    dist_x = torch.sqrt(((vec_x + 1e-12) ** 2).sum(-1))
    cross_eattr = [
        sig_emb[None].expand(len(x_src), -1),
        t_rbf(dist_x, cfg.cross_max_distance, cfg.cross_distance_embed_dim)]
    if lat is not None or glat is not None:
        # reference zeroes cross-edge latent features (score_model.py:401)
        d = cfg.latent_dim * max(cfg.latent_vocab, 2)
        cross_eattr.append(torch.zeros((len(x_src), d), dtype=torch.float64))
    cross_eattr = t_fcblock(params["cross_edge_embedding"], torch.cat(cross_eattr, -1))
    cross_sh = t_sh(vec_x, cfg.sh_lmax)

    if unconditional:
        # CFG unconditional embeddings, added after the embedding MLPs
        # (score_model.py:350-358 with u == 1)
        lig_attr = lig_attr + t_t(params["lig_node_uncond"])
        rec_attr = rec_attr + t_t(params["rec_node_uncond"])
        lig_eattr = lig_eattr + t_t(params["lig_edge_uncond"])
        rec_eattr = rec_eattr + t_t(params["rec_edge_uncond"])
        cross_eattr = cross_eattr + t_t(params["cross_edge_uncond"])

    # ---- conv trunk: 4 blocks per layer, joint scatter-mean per receiver
    # (nn/conv.py TPConvLayer; reference tensor_layers.py:147-168).  NOTE the
    # flipped cross block reuses the un-negated cross SH -- a reference quirk
    # (score_model.py:223: edge_sh cat repeats lr_edge_sh for the flip).
    seq = get_irrep_seq(ns, cfg.nv, cfg.use_second_order_repr)
    sh_irreps = "1x0e + 1x1o" if cfg.sh_lmax == 1 else "1x0e + 1x1o + 1x2e"
    for li in range(cfg.num_conv_layers):
        in_ir = seq[min(li, len(seq) - 1)]
        out_ir = seq[min(li + 1, len(seq) - 1)]
        tp = TorchWeightedTP(in_ir, sh_irreps, out_ir)
        lp = params[f"conv{li}"]
        out_dim = Irreps(out_ir).dim
        sums = {"lig": torch.zeros((nl, out_dim), dtype=torch.float64),
                "rec": torch.zeros((nr, out_dim), dtype=torch.float64)}
        counts = {"lig": torch.zeros((nl, 1), dtype=torch.float64),
                  "rec": torch.zeros((nr, 1), dtype=torch.float64)}
        blocks = [
            (lig_src, lig_dst, lig_eattr, lig_sh, 0, "lig", "lig"),
            (x_src, x_dst, cross_eattr, cross_sh, 1, "lig", "rec"),
            (rec_src, rec_dst, rec_eattr, rec_sh, 2, "rec", "rec"),
            (x_dst, x_src, cross_eattr, cross_sh, 3, "rec", "lig"),
        ]
        attrs = {"lig": lig_attr, "rec": rec_attr}
        for (src, dst, eattr, esh, grp, rt, st) in blocks:
            xfeat = attrs[st][dst]
            full = torch.cat([eattr, attrs[rt][src][:, :ns], xfeat[:, :ns]], -1)
            w = t_conv_mlp(lp, grp, full, len(tp.weight_splits))
            msg = tp(xfeat, esh, w)
            idx = torch.from_numpy(np.asarray(src, np.int64))
            sums[rt].index_add_(0, idx, msg)
            counts[rt].index_add_(
                0, idx, torch.ones((len(src), 1), dtype=torch.float64))
        outs = {k: sums[k] / (counts[k] + 1e-12) for k in sums}
        if cfg.batch_norm:
            normed = yield ((f"conv{li}", "MaskedIrrepsBatchNorm_0"), out_ir,
                            [outs["lig"], outs["rec"]])
            outs = {"lig": normed[0], "rec": normed[1]}
        pad = out_dim - attrs["lig"].shape[-1]
        lig_attr = outs["lig"] + torch.nn.functional.pad(attrs["lig"], (0, pad))
        rec_attr = outs["rec"] + torch.nn.functional.pad(attrs["rec"], (0, pad))
        if post_layer is not None:
            lig_attr, rec_attr = post_layer(li, lig_attr, rec_attr)
    return lig_attr, rec_attr


def oracle_trunk(params, stats, cfg: ScoreModelConfig, sigma: SigmaSchedule,
                 g: dict, t: float, **kw):
    """Running-average driver of :func:`oracle_trunk_gen` (original API)."""
    return _drive(oracle_trunk_gen(params, cfg, sigma, g, t, **kw),
                  _bn_running(params, stats))


def oracle_forward_gen(params, cfg: ScoreModelConfig, sigma: SigmaSchedule,
                       g: dict, t: float, lat=None, unconditional: bool = False,
                       glat=None, post_layer=None):
    """Full forward as a BN-yielding generator: trunk + score heads."""
    lig_attr, rec_attr = yield from oracle_trunk_gen(
        params, cfg, sigma, g, t, lat=lat, unconditional=unconditional,
        glat=glat, post_layer=post_layer)
    return (yield from oracle_score_heads_gen(params, cfg, sigma, g, t, lig_attr))


def oracle_forward(params, stats, cfg: ScoreModelConfig, sigma: SigmaSchedule,
                   g: dict, t: float, lat=None, unconditional: bool = False,
                   glat=None, post_layer=None):
    """Plain-torch twin of TensorProductScoreModel.__call__ for one graph.

    ``g``: dict of unpadded numpy arrays (lig_x, lig_pos, rec_x, rec_pos,
    bonds (E,2) src/dst, bond_attr, rec_src, rec_dst, tor_edges (R,2)).
    ``lat``/``unconditional`` forward to :func:`oracle_trunk` (the latent
    -conditioned / CFG trunk modes).
    Returns (tr_pred (3,), rot_pred (3,), tor_pred (R,)).
    """
    out = _drive(
        oracle_forward_gen(params, cfg, sigma, g, t, lat=lat,
                           unconditional=unconditional, glat=glat,
                           post_layer=post_layer),
        _bn_running(params, stats))
    return tuple(o.detach().numpy() for o in out)


def oracle_score_heads(params, stats, cfg, sigma, g, t, lig_attr):
    """Running-average driver of :func:`oracle_score_heads_gen`."""
    out = _drive(oracle_score_heads_gen(params, cfg, sigma, g, t, lig_attr),
                 _bn_running(params, stats))
    return tuple(o.detach().numpy() for o in out)


def oracle_score_heads_gen(params, cfg: ScoreModelConfig,
                           sigma: SigmaSchedule, g: dict, t: float,
                           lig_attr: torch.Tensor):
    """tr/rot/tor score heads on a trunk's final ligand irreps.  Shared by
    the CG and all-atom oracles: the two reference models' head code is
    structurally identical (models/score_model.py:259-307 vs
    models/all_atom_score_model.py:285-343) with the same parameter names.
    Generator form (yields at BN sites); returns numpy arrays UNLESS the
    params tree holds live torch tensors, in which case differentiable torch
    tensors come back (the training-parity path)."""
    ns = cfg.ns
    pos_l = torch.from_numpy(g["lig_pos"].astype(np.float64))
    nl = len(pos_l)
    tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t, t, t)
    sig_emb = torch.from_numpy(t_sinusoidal(t, cfg.sigma_embed_dim, cfg.embedding_scale))
    seq = get_irrep_seq(ns, cfg.nv, cfg.use_second_order_repr)
    sh_irreps = "1x0e + 1x1o" if cfg.sh_lmax == 1 else "1x0e + 1x1o + 1x2e"
    final_ir = seq[min(cfg.num_conv_layers, len(seq) - 1)]

    # ---- center conv head (score_model.py:269-287)
    center = pos_l.mean(0, keepdim=True)
    vec_c = pos_l - center
    dist_c = torch.sqrt(((vec_c + 1e-12) ** 2).sum(-1))
    center_eattr = torch.cat([
        t_rbf(dist_c, cfg.center_max_distance, cfg.distance_embed_dim),
        sig_emb[None].expand(nl, -1)], -1)
    center_eattr = t_fcblock(params["center_edge_embedding"], center_eattr)
    center_eattr = torch.cat([center_eattr, lig_attr[:, :ns]], -1)
    center_sh = t_sh(vec_c, cfg.sh_lmax)
    tp_f = TorchWeightedTP(final_ir, sh_irreps, "2x1o + 2x1e")
    wf = t_conv_mlp(params["final_conv"], 0, center_eattr, len(tp_f.weight_splits))
    msg = tp_f(lig_attr, center_sh, wf)
    gp = msg.mean(0, keepdim=True)
    if cfg.batch_norm:
        gp = (yield (("final_conv", "MaskedIrrepsBatchNorm_0"),
                     "2x1o + 2x1e", [gp]))[0]
    gp = gp[0]
    tr_pred = irrep_to_vec_np(gp[:3] + gp[6:9])
    rot_pred = irrep_to_vec_np(gp[3:6] + gp[9:12])

    tr_norm = torch.linalg.norm(tr_pred) + 1e-12
    h = t_dense(params["tr_final_dense1"], torch.cat([tr_norm[None], sig_emb])[None])
    tr_scale = t_dense(params["tr_final_dense2"], torch.relu(h))[0, 0]
    tr_pred = tr_pred / tr_norm * tr_scale
    rot_norm = torch.linalg.norm(rot_pred) + 1e-12
    h = t_dense(params["rot_final_dense1"], torch.cat([rot_norm[None], sig_emb])[None])
    rot_scale = t_dense(params["rot_final_dense2"], torch.relu(h))[0, 0]
    rot_pred = rot_pred / rot_norm * rot_scale

    if cfg.scale_by_sigma:
        tr_pred = tr_pred / tr_sigma
        # the SO(3)/torus norm tables are parity-tested separately; consume
        # the repo lookups here (the reference does .cpu() table lookups too)
        rot_pred = rot_pred * float(so3.score_norm(jnp.asarray([rot_sigma]))[0])

    # ---- pseudotorque torsion head (score_model.py:291-307)
    R = len(g["tor_edges"])
    tor_pred = torch.zeros(R, dtype=torch.float64)
    if R and not cfg.no_torsion:
        u, v = g["tor_edges"][:, 0], g["tor_edges"][:, 1]
        bond_pos = (pos_l[u] + pos_l[v]) / 2
        t_src, t_dst = [], []
        bp = bond_pos.numpy()
        for i in range(R):
            for j in range(nl):
                if np.linalg.norm(bp[i] - g["lig_pos"][j]) < cfg.lig_max_radius:
                    t_src.append(i)
                    t_dst.append(j)
        t_src, t_dst = np.asarray(t_src), np.asarray(t_dst)
        vec_t = pos_l[t_dst] - bond_pos[t_src]
        dist_t = torch.sqrt(((vec_t + 1e-12) ** 2).sum(-1))
        t_eattr = t_fcblock(params["final_edge_embedding"],
                            t_rbf(dist_t, cfg.lig_max_radius, cfg.distance_embed_dim))
        bond_attr = lig_attr[u] + lig_attr[v]
        t_eattr = torch.cat([t_eattr, lig_attr[t_dst][:, :ns],
                             bond_attr[t_src][:, :ns]], -1)
        bond_vec = pos_l[v] - pos_l[u]
        bond_sh2 = t_sh(bond_vec, 2)[:, 4:9]
        edge_sh = t_sh(vec_t, cfg.sh_lmax)
        ftp = FullTensorProduct(sh_irreps, "1x2e")
        tor_sh = torch.from_numpy(np.asarray(
            ftp(jnp.asarray(edge_sh.numpy()),
                jnp.asarray(bond_sh2.numpy()[t_src])), np.float64))
        tp_t = TorchWeightedTP(final_ir, str(ftp.irreps_out), f"{ns}x0o + {ns}x0e")
        wt = t_conv_mlp(params["tor_bond_conv"], 0, t_eattr, len(tp_t.weight_splits))
        msg = tp_t(lig_attr[t_dst], tor_sh, wt)
        sums = torch.zeros((R, 2 * ns), dtype=torch.float64)
        cnt = torch.zeros((R, 1), dtype=torch.float64)
        sums.index_add_(0, torch.from_numpy(t_src), msg)
        cnt.index_add_(0, torch.from_numpy(t_src),
                       torch.ones((len(t_src), 1), dtype=torch.float64))
        tor_feat = sums / (cnt + 1e-12)
        if cfg.batch_norm:
            tor_feat = (yield (("tor_bond_conv", "MaskedIrrepsBatchNorm_0"),
                               f"{ns}x0o + {ns}x0e", [tor_feat]))[0]
        h = torch.tanh(t_dense(params["tor_final_dense1"], tor_feat))
        tor_pred = t_dense(params["tor_final_dense2"], h)[:, 0]
        if cfg.scale_by_sigma:
            tor_pred = tor_pred * math.sqrt(
                float(torus.score_norm(jnp.asarray([tor_sigma]))[0]))
    elif cfg.batch_norm and not cfg.no_torsion:
        # keep per-graph generators in lockstep when a graph has R == 0:
        # the flax model still runs the (fully masked) tor BN site
        yield (("tor_bond_conv", "MaskedIrrepsBatchNorm_0"),
               f"{ns}x0o + {ns}x0e", [torch.zeros((0, 2 * ns), dtype=torch.float64)])
    return tr_pred, rot_pred, tor_pred


# ---------------------------------------------------------------------------
# fixture: tiny model + randomized parameter tree shared by both sides
# ---------------------------------------------------------------------------

CAPS = GraphCaps(
    max_lig=12, max_rec=16, lig_bond_cap=30, lig_radius_cap=12 * 11,
    rec_edge_cap=16 * 8, cross_cap=12 * 16, tor_cap=4, tor_edge_cap=4 * 12,
)
CFG = ScoreModelConfig(
    ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
    latent_dim=0, latent_droprate=0.0, compute_dtype="float32",
)


def _randomize(variables, seed=11):
    """Replace every param/stat leaf with a random draw so no zero-init
    blind spot survives (vars stay positive)."""
    rng = np.random.RandomState(seed)

    def rnd(path, leaf):
        flat = " ".join(str(p) for p in path)
        # fan-scaled draws keep activations O(1) through 5 layers: large
        # activations would amplify f32-vs-f64 divergence past any sharp
        # tolerance without testing anything extra
        fan = leaf.shape[0] if leaf.ndim == 2 else 1
        x = rng.randn(*leaf.shape).astype(np.float32) / np.sqrt(fan)
        if "var" in flat:
            x = np.abs(x) + 1.0
        if "weight" in flat and "MaskedIrreps" in flat:
            x = np.abs(x) + 0.5
        return jnp.asarray(x)

    return jax.tree_util.tree_map_with_path(rnd, variables)


def _damp_heads(variables, factor=0.05):
    """Stabilize an UNTRAINED random net for reverse-step/trajectory
    rollouts.  The tr/rot scale heads consume the prediction NORM
    (score_model.py:508-517), which itself grows with the coordinate scale,
    and with random params tr_scale is asymptotically LINEAR in tr_norm --
    a positive feedback loop that explodes rollouts (one t=1 low-temperature
    step already reaches |pos| ~ 5e4) and amplifies f32-vs-f64 drift past
    any tolerance without testing anything extra.  Zeroing the dense1 kernel
    row that reads the norm makes the step SIZE depend only on the bounded
    sigma embedding, while directions, trunk math, sigma scaling, noise and
    conformer mechanics -- what these tests pin -- are untouched; the oracle
    twin consumes the same zeroed params.  The final Dense is also damped so
    per-step drift stays small against the noise (same rationale as
    _randomize's fan scaling)."""

    def scale(path, leaf):
        flat = " ".join(str(p) for p in path)
        if any(h in flat for h in ("tr_final_dense2", "rot_final_dense2",
                                   "tor_final_dense2")):
            return leaf * factor
        if ("kernel" in flat and leaf.ndim == 2
                and ("tr_final_dense1" in flat
                     or "rot_final_dense1" in flat)):
            return leaf.at[0].set(0.0)  # row 0 = the norm input
        return leaf

    return jax.tree_util.tree_map_with_path(scale, variables)


@pytest.fixture(scope="module")
def setup():
    batch = make_complex_batch(
        seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
        c_alpha_max_neighbors=6,
    )
    model = TensorProductScoreModel(cfg=CFG, caps=CAPS)
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = _randomize(variables)
    return model, variables, batch


def _unpad_graph(batch, gi: int) -> dict:
    """Extract one graph's unpadded numpy arrays from the padded batch."""
    lm = np.asarray(batch.lig_mask[gi])
    rm = np.asarray(batch.rec_mask[gi])
    nl = int(lm.sum())
    bonds_mask = np.asarray(batch.lig_bonds.mask[gi])
    bonds = np.stack([np.asarray(batch.lig_bonds.src[gi]),
                      np.asarray(batch.lig_bonds.dst[gi])], -1)[bonds_mask]
    rec_em = np.asarray(batch.rec_edges.mask[gi])
    tor_m = np.asarray(batch.tor_mask[gi])
    return dict(
        lig_x=np.asarray(batch.lig_x[gi])[:nl],
        lig_pos=np.asarray(batch.lig_pos[gi])[:nl],
        rec_x=np.asarray(batch.rec_x[gi])[rm],
        rec_pos=np.asarray(batch.rec_pos[gi])[rm],
        bonds=bonds,
        bond_attr=np.asarray(batch.lig_bond_attr[gi])[bonds_mask],
        rec_src=np.asarray(batch.rec_edges.src[gi])[rec_em],
        rec_dst=np.asarray(batch.rec_edges.dst[gi])[rec_em],
        tor_edges=np.asarray(batch.tor_edges[gi])[tor_m],
        tor_mask_rotate=np.asarray(batch.tor_mask_rotate[gi])[tor_m][:, :nl],
    )


class TestFullModelForwardParity:
    """Complete padded/masked JAX forward == dynamic-graph torch oracle."""

    @pytest.mark.parametrize("t", [1.0, 0.5, 0.05])
    def test_scores_match(self, setup, t):
        model, variables, batch = setup
        b = batch.set_time(t, t, t)
        tr, rot, tor = model.apply(
            variables, b, deterministic=True, use_running_average=True
        )
        tr, rot, tor = np.asarray(tr), np.asarray(rot), np.asarray(tor)
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            o_tr, o_rot, o_tor = oracle_forward(
                params, stats, CFG, model.sigma, g, t)
            np.testing.assert_allclose(tr[gi], o_tr, rtol=2e-4, atol=2e-5,
                                       err_msg=f"tr graph {gi} t={t}")
            np.testing.assert_allclose(rot[gi], o_rot, rtol=2e-4, atol=2e-5,
                                       err_msg=f"rot graph {gi} t={t}")
            R = len(g["tor_edges"])
            np.testing.assert_allclose(tor[gi][:R], o_tor, rtol=2e-4, atol=2e-5,
                                       err_msg=f"tor graph {gi} t={t}")
            assert np.all(tor[gi][R:] == 0.0)


def t_latent_mlp_gen(params: dict, hidden: int, x: torch.Tensor):
    """LatentPredictorMLP: (Dense-BN-ReLU) x2 + Dense (latent_encoder.py:
    148-169); generator form yielding at the two BN sites."""
    for i in range(2):
        x = t_dense(params[f"Dense_{i}"], x)
        x = (yield ((f"MaskedIrrepsBatchNorm_{i}",), f"{hidden}x0e", [x]))[0]
        x = torch.relu(x)
    return t_dense(params["Dense_2"], x)


def t_latent_mlp(params: dict, stats: dict, hidden: int, x: torch.Tensor):
    """Running-average driver of :func:`t_latent_mlp_gen`."""
    return _drive(t_latent_mlp_gen(params, hidden, x), _bn_running(params, stats))


def oracle_encoder_trunk(params, stats, cfg, g: dict, orig: np.ndarray):
    """Running-average driver of :func:`oracle_encoder_trunk_gen`."""
    return _drive(oracle_encoder_trunk_gen(params, cfg, g, orig),
                  _bn_running(params, stats))


def oracle_encoder_trunk_gen(params, cfg, g: dict, orig: np.ndarray):
    """Time-free encoder trunk over the ORACLE pose (latent_encoder.py:
    171-305 without the latent heads): fixed 30A cross cutoff, no sigma
    embedding.  Returns the {"lig", "rec"} attr dict; shared by the
    vocab=1 and vocab>1 encoder parity tests.  Generator form (BN yields)."""
    ns = cfg.ns
    pos_l = torch.from_numpy(orig.astype(np.float64))  # oracle pose
    pos_r = torch.from_numpy(g["rec_pos"].astype(np.float64))
    nl, nr = len(pos_l), len(pos_r)

    lig_attr = t_atom_encoder(
        params["lig_node_embedding"], g["lig_x"],
        torch.zeros((nl, 0), dtype=torch.float64), n_cat=16)
    rec_attr = t_atom_encoder(
        params["rec_node_embedding"], g["rec_x"][:, :1],
        torch.from_numpy(g["rec_x"][:, 1:].astype(np.float64)), n_cat=1)

    # lig bonds + 5A radius on the ORACLE pose
    b_src, b_dst = g["bonds"][:, 0].tolist(), g["bonds"][:, 1].tolist()
    r_src, r_dst = [], []
    for i in range(nl):
        for j in range(nl):
            if i != j and np.linalg.norm(orig[i] - orig[j]) < cfg.lig_max_radius:
                r_src.append(i)
                r_dst.append(j)
    lig_src = np.asarray(b_src + r_src)
    lig_dst = np.asarray(b_dst + r_dst)
    bond_feat = torch.zeros((len(lig_src), 4), dtype=torch.float64)
    bond_feat[: len(b_src)] = torch.from_numpy(g["bond_attr"].astype(np.float64))
    vec = pos_l[lig_dst] - pos_l[lig_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    lig_eattr = t_fcblock(params["lig_edge_embedding"], torch.cat(
        [bond_feat, t_rbf(dist, cfg.lig_max_radius, cfg.distance_embed_dim)], -1))
    lig_sh = t_sh(vec, cfg.sh_lmax)

    rec_src, rec_dst = g["rec_src"], g["rec_dst"]
    vec = pos_r[rec_dst] - pos_r[rec_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    rec_eattr = t_fcblock(params["rec_edge_embedding"],
                          t_rbf(dist, cfg.rec_max_radius, cfg.distance_embed_dim))
    rec_sh = t_sh(vec, cfg.sh_lmax)

    # fixed 30A cross cutoff on the oracle pose
    x_src, x_dst = [], []
    for i in range(nl):
        for j in range(nr):
            if np.linalg.norm(orig[i] - g["rec_pos"][j]) < cfg.cross_max_distance:
                x_src.append(i)
                x_dst.append(j)
    x_src, x_dst = np.asarray(x_src), np.asarray(x_dst)
    vec = pos_r[x_dst] - pos_l[x_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    cross_eattr = t_fcblock(params["cross_edge_embedding"],
                            t_rbf(dist, cfg.cross_max_distance,
                                  cfg.cross_distance_embed_dim))
    cross_sh = t_sh(vec, cfg.sh_lmax)

    seq = get_irrep_seq(ns, cfg.nv, cfg.use_second_order_repr)
    sh_irreps = "1x0e + 1x1o"
    attrs = {"lig": lig_attr, "rec": rec_attr}
    for li in range(cfg.num_conv_layers):
        in_ir = seq[min(li, len(seq) - 1)]
        out_ir = seq[min(li + 1, len(seq) - 1)]
        tp = TorchWeightedTP(in_ir, sh_irreps, out_ir)
        lp = params[f"conv{li}"]
        out_dim = Irreps(out_ir).dim
        sums = {"lig": torch.zeros((nl, out_dim), dtype=torch.float64),
                "rec": torch.zeros((nr, out_dim), dtype=torch.float64)}
        counts = {"lig": torch.zeros((nl, 1), dtype=torch.float64),
                  "rec": torch.zeros((nr, 1), dtype=torch.float64)}
        for (src, dst, eattr, esh, grp, rt, st) in (
            (lig_src, lig_dst, lig_eattr, lig_sh, 0, "lig", "lig"),
            (x_src, x_dst, cross_eattr, cross_sh, 1, "lig", "rec"),
            (rec_src, rec_dst, rec_eattr, rec_sh, 2, "rec", "rec"),
            (x_dst, x_src, cross_eattr, cross_sh, 3, "rec", "lig"),
        ):
            xfeat = attrs[st][dst]
            full = torch.cat([eattr, attrs[rt][src][:, :ns], xfeat[:, :ns]], -1)
            w = t_conv_mlp(lp, grp, full, len(tp.weight_splits))
            msg = tp(xfeat, esh, w)
            idx = torch.from_numpy(np.asarray(src, np.int64))
            sums[rt].index_add_(0, idx, msg)
            counts[rt].index_add_(
                0, idx, torch.ones((len(src), 1), dtype=torch.float64))
        outs = {k: sums[k] / (counts[k] + 1e-12) for k in sums}
        if cfg.batch_norm:
            normed = yield ((f"conv{li}", "MaskedIrrepsBatchNorm_0"), out_ir,
                            [outs["lig"], outs["rec"]])
            outs = {"lig": normed[0], "rec": normed[1]}
        pad = out_dim - attrs["lig"].shape[-1]
        attrs = {
            "lig": outs["lig"] + torch.nn.functional.pad(attrs["lig"], (0, pad)),
            "rec": outs["rec"] + torch.nn.functional.pad(attrs["rec"], (0, pad)),
        }
    return attrs


class TestEncoderParity:
    """The DisCo latent encoder (TPEncoder, vocab=1 node-anchor config):
    time-free trunk over the ORACLE pose with a fixed 30A cross cutoff,
    per-node latent-logit heads, softmax over the union of nodes
    (latent_encoder.py:16-343) vs a plain-torch dynamic-graph oracle."""

    def test_logits_match(self):
        from disco_diffdock_tpu.config import EncoderConfig
        from disco_diffdock_tpu.models.encoder import TPEncoder

        cfg = EncoderConfig(
            ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6, dropout=0.0,
            latent_dim=2, latent_hidden_dim=16,
        )
        batch = make_complex_batch(
            seed=8, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TPEncoder(cfg=cfg, caps=CAPS)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            batch,
        )
        variables = _randomize(variables, seed=17)
        logits, node_mask = model.apply(
            variables, batch, apply_gumbel=False,
            deterministic=True, use_running_average=True,
        )
        logits = np.asarray(logits)
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        ns = cfg.ns

        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            om = np.asarray(batch.lig_mask[gi])
            orig = np.asarray(batch.extras["orig_pos"][gi])[om]
            attrs = oracle_encoder_trunk(params, stats, cfg, g, orig)
            nl, nr = len(orig), len(g["rec_pos"])

            def scalars(a):
                if cfg.num_conv_layers >= 3:
                    return torch.cat([a[:, :ns], a[:, -ns:]], -1)
                return a[:, :ns]

            pl = t_latent_mlp(params["latent_s_predictor"],
                              stats["latent_s_predictor"],
                              cfg.latent_hidden_dim, scalars(attrs["lig"]))
            pr = t_latent_mlp(params["latent_r_predictor"],
                              stats["latent_r_predictor"],
                              cfg.latent_hidden_dim, scalars(attrs["rec"]))
            o_logits = torch.cat([pl, pr], 0).T.numpy()  # (latent_dim, nl+nr)
            got = np.concatenate([logits[gi][:, :nl], logits[gi][:, CAPS.max_lig:
                                                                  CAPS.max_lig + nr]], -1)
            np.testing.assert_allclose(got, o_logits, rtol=3e-4, atol=3e-5,
                                       err_msg=f"graph {gi}")


class TestAllAtomConfidenceParity:
    """The all-atom confidence-model forward (3 node types, 9 convs per
    depth level, last-layer ligand-only, quirk distance expansions --
    reference models/all_atom_score_model.py:15-459) vs a plain-torch
    dynamic-graph oracle on the same randomized parameter tree."""

    CAPS = GraphCaps(
        max_lig=12, max_rec=16, lig_bond_cap=30, lig_radius_cap=12 * 11,
        rec_edge_cap=16 * 8, cross_cap=12 * 16, tor_cap=4, tor_edge_cap=4 * 12,
        max_atoms=64, atom_edge_cap=64 * 8, la_cap=12 * 64,
    )
    CFG = ScoreModelConfig(
        ns=4, nv=2, num_conv_layers=3, sh_lmax=2, esm_embedding_dim=6,
        dropout=0.0, latent_dim=0, latent_droprate=0.0, all_atoms=True,
        confidence_mode=True, compute_dtype="float32",
    )

    def _unpad_aa(self, batch, gi):
        g = _unpad_graph(batch, gi)
        am = np.asarray(batch.atom_mask[gi])
        aem = np.asarray(batch.atom_edges.mask[gi])
        arm = np.asarray(batch.ar_edges.mask[gi])
        g.update(
            atom_x=np.asarray(batch.atom_x[gi])[am],
            atom_pos=np.asarray(batch.atom_pos[gi])[am],
            atom_src=np.asarray(batch.atom_edges.src[gi])[aem],
            atom_dst=np.asarray(batch.atom_edges.dst[gi])[aem],
            ar_src=np.asarray(batch.ar_edges.src[gi])[arm],
            ar_dst=np.asarray(batch.ar_edges.dst[gi])[arm],
        )
        return g

    def _oracle(self, params, stats, cfg, g, t):
        # confidence mode: sigma = raw t, so the cutoff uses t directly
        cutoff = t * 3 + 20 if cfg.dynamic_max_cross else cfg.cross_max_distance
        la = oracle_aa_trunk(params, stats, cfg, g, t, cutoff)
        ns = cfg.ns
        L = cfg.num_conv_layers
        scal = torch.cat([la[:, :ns], la[:, -ns:]], -1) if L >= 3 else la[:, :ns]
        x = t_dense(params["confidence_mlp1"], scal.mean(0, keepdim=True))
        if not cfg.confidence_no_batchnorm:
            x = t_irreps_bn(params["confidence_bn1"], stats["confidence_bn1"],
                            f"{ns}x0e", x)
        x = torch.relu(x)
        x = t_dense(params["confidence_mlp2"], x)
        if not cfg.confidence_no_batchnorm:
            x = t_irreps_bn(params["confidence_bn2"], stats["confidence_bn2"],
                            f"{ns}x0e", x)
        x = torch.relu(x)
        return float(t_dense(params["confidence_out"], x)[0, 0])

    @pytest.mark.parametrize("t", [0.0, 0.3])
    def test_confidence_matches(self, t):
        from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel

        batch = make_complex_batch(
            seed=6, batch=2, n_lig=10, n_res=14, caps=self.CAPS, esm_dim=6,
            c_alpha_max_neighbors=6, all_atoms=True, atoms_per_res=4,
        )
        model = AllAtomScoreModel(cfg=self.CFG, caps=self.CAPS)
        variables = model.init(jax.random.PRNGKey(0), batch)
        variables = _randomize(variables, seed=13)
        b = batch.set_time(t, t, t)
        conf = np.asarray(model.apply(
            variables, b, deterministic=True, use_running_average=True))
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        for gi in range(batch.num_graphs):
            g = self._unpad_aa(batch, gi)
            o = self._oracle(params, stats, self.CFG, g, t)
            np.testing.assert_allclose(conf[gi], o, rtol=3e-4, atol=3e-5,
                                       err_msg=f"graph {gi} t={t}")


def oracle_aa_trunk(params, stats, cfg, g, t, cross_cutoff):
    """Plain-torch all-atom trunk (3 node types, 9 convs per depth level,
    last-layer ligand-only -- reference models/all_atom_score_model.py) for
    one unpadded graph; returns the final ligand irreps.  ``cross_cutoff``
    is the lig<->residue radius: raw-t-based in confidence mode, sigma-based
    in score mode (all_atom_score_model.py:170-173)."""
    ns = cfg.ns
    pos_l = torch.from_numpy(g["lig_pos"].astype(np.float64))
    pos_r = torch.from_numpy(g["rec_pos"].astype(np.float64))
    pos_a = torch.from_numpy(g["atom_pos"].astype(np.float64))
    nl, nr, na = len(pos_l), len(pos_r), len(pos_a)
    sig = torch.from_numpy(t_sinusoidal(t, cfg.sigma_embed_dim, cfg.embedding_scale))

    lig_attr = t_atom_encoder(params["lig_node_embedding"], g["lig_x"],
                              sig[None].expand(nl, -1), n_cat=16)
    rec_extras = torch.cat([
        torch.from_numpy(g["rec_x"][:, 1:].astype(np.float64)),
        sig[None].expand(nr, -1)], -1)
    rec_attr = t_atom_encoder(params["rec_node_embedding"],
                              g["rec_x"][:, :1], rec_extras, n_cat=1)
    atom_attr = t_atom_encoder(params["atom_node_embedding"], g["atom_x"],
                               sig[None].expand(na, -1), n_cat=4)

    def rbf_pair(pos_s, pos_d, src, dst, stop):
        vec = pos_d[dst] - pos_s[src]
        dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
        return vec, t_rbf(dist, stop, cfg.distance_embed_dim)

    # lig: bonds + radius (dup kept)
    b_src, b_dst = g["bonds"][:, 0].tolist(), g["bonds"][:, 1].tolist()
    r_src, r_dst = [], []
    for i in range(nl):
        for j in range(nl):
            if i != j and np.linalg.norm(
                    g["lig_pos"][i] - g["lig_pos"][j]) < cfg.lig_max_radius:
                r_src.append(i)
                r_dst.append(j)
    lig_src = np.asarray(b_src + r_src)
    lig_dst = np.asarray(b_dst + r_dst)
    bond_feat = torch.zeros((len(lig_src), 4), dtype=torch.float64)
    bond_feat[: len(b_src)] = torch.from_numpy(g["bond_attr"].astype(np.float64))
    vec, rbf = rbf_pair(pos_l, pos_l, lig_src, lig_dst, cfg.lig_max_radius)
    lig_eattr = t_fcblock(params["lig_edge_embedding"], torch.cat(
        [bond_feat, sig[None].expand(len(lig_src), -1), rbf], -1))
    lig_sh = t_sh(vec, cfg.sh_lmax)

    rec_src, rec_dst = g["rec_src"], g["rec_dst"]
    vec, rbf = rbf_pair(pos_r, pos_r, rec_src, rec_dst, cfg.rec_max_radius)
    rec_eattr = t_fcblock(params["rec_edge_embedding"], torch.cat(
        [sig[None].expand(len(rec_src), -1), rbf], -1))
    rec_sh = t_sh(vec, cfg.sh_lmax)

    atom_src, atom_dst = g["atom_src"], g["atom_dst"]
    # quirk: atom graph reuses the LIGAND 0-5A expansion (:380)
    vec, rbf = rbf_pair(pos_a, pos_a, atom_src, atom_dst, cfg.lig_max_radius)
    atom_eattr = t_fcblock(params["atom_edge_embedding"], torch.cat(
        [sig[None].expand(len(atom_src), -1), rbf], -1))
    atom_sh = t_sh(vec, cfg.sh_lmax)

    # lr edges at the caller-supplied cutoff (confidence: 3*t+20;
    # score mode: 3*sigma_tr+20)
    cutoff = cross_cutoff
    lr_src, lr_dst = [], []
    for i in range(nl):
        for j in range(nr):
            if np.linalg.norm(g["lig_pos"][i] - g["rec_pos"][j]) < cutoff:
                lr_src.append(i)
                lr_dst.append(j)
    lr_src, lr_dst = np.asarray(lr_src), np.asarray(lr_dst)
    vec = pos_r[lr_dst] - pos_l[lr_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    lr_eattr = t_fcblock(params["lr_edge_embedding"], torch.cat(
        [sig[None].expand(len(lr_src), -1),
         t_rbf(dist, cfg.cross_max_distance, cfg.cross_distance_embed_dim)], -1))
    lr_sh = t_sh(vec, cfg.sh_lmax)

    # la: 5A cutoff but the CROSS distance expansion (:414 quirk)
    la_src, la_dst = [], []
    for i in range(nl):
        for j in range(na):
            if np.linalg.norm(g["lig_pos"][i] - g["atom_pos"][j]) < cfg.lig_max_radius:
                la_src.append(i)
                la_dst.append(j)
    la_src, la_dst = np.asarray(la_src), np.asarray(la_dst)
    vec = pos_a[la_dst] - pos_l[la_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    la_eattr = t_fcblock(params["la_edge_embedding"], torch.cat(
        [sig[None].expand(len(la_src), -1),
         t_rbf(dist, cfg.cross_max_distance, cfg.cross_distance_embed_dim)], -1))
    la_sh = t_sh(vec, cfg.sh_lmax)

    ar_src, ar_dst = g["ar_src"], g["ar_dst"]
    vec = pos_r[ar_dst] - pos_a[ar_src]
    dist = torch.sqrt(((vec + 1e-12) ** 2).sum(-1))
    ar_eattr = t_fcblock(params["ar_edge_embedding"], torch.cat(
        [sig[None].expand(len(ar_src), -1),
         t_rbf(dist, cfg.rec_max_radius, cfg.distance_embed_dim)], -1))
    ar_sh = t_sh(vec, cfg.sh_lmax)

    seq = get_irrep_seq(ns, cfg.nv, cfg.use_second_order_repr)
    sh_irreps = "1x0e + 1x1o + 1x2e"
    attrs = {"lig": lig_attr, "rec": rec_attr, "atom": atom_attr}
    sizes = {"lig": nl, "rec": nr, "atom": na}
    L = cfg.num_conv_layers

    def conv(li, j, src, dst, eattr, esh, rt, st, in_ir, out_ir):
        tp = TorchWeightedTP(in_ir, sh_irreps, out_ir)
        lp = params[f"conv{li}_{j}"]
        x = attrs[st][dst]
        full = torch.cat([eattr, attrs[rt][src][:, :ns], x[:, :ns]], -1)
        w = t_conv_mlp(lp, 0, full, len(tp.weight_splits))
        msg = tp(x, esh, w)
        out_dim = Irreps(out_ir).dim
        sums = torch.zeros((sizes[rt], out_dim), dtype=torch.float64)
        cnt = torch.zeros((sizes[rt], 1), dtype=torch.float64)
        sums.index_add_(0, torch.from_numpy(np.asarray(src)), msg)
        cnt.index_add_(0, torch.from_numpy(np.asarray(src)),
                       torch.ones((len(src), 1), dtype=torch.float64))
        out = sums / (cnt + 1e-12)
        if cfg.batch_norm:
            out = t_irreps_bn(lp["MaskedIrrepsBatchNorm_0"],
                              stats[f"conv{li}_{j}"]["MaskedIrrepsBatchNorm_0"],
                              out_ir, out)
        return out

    for li in range(L):
        in_ir = seq[min(li, len(seq) - 1)]
        out_ir = seq[min(li + 1, len(seq) - 1)]
        blocks = [
            (0, lig_src, lig_dst, lig_eattr, lig_sh, "lig", "lig"),
            (1, lr_src, lr_dst, lr_eattr, lr_sh, "lig", "rec"),
            (2, la_src, la_dst, la_eattr, la_sh, "lig", "atom"),
            (3, atom_src, atom_dst, atom_eattr, atom_sh, "atom", "atom"),
            (4, la_dst, la_src, la_eattr, la_sh, "atom", "lig"),
            (5, ar_src, ar_dst, ar_eattr, ar_sh, "atom", "rec"),
            (6, rec_src, rec_dst, rec_eattr, rec_sh, "rec", "rec"),
            (7, lr_dst, lr_src, lr_eattr, lr_sh, "rec", "lig"),
            (8, ar_dst, ar_src, ar_eattr, ar_sh, "rec", "atom"),
        ]
        ups = {}
        for (j, src, dst, eattr, esh, rt, st) in blocks:
            if li == L - 1 and j >= 3:
                continue  # last layer updates ligand only (:245)
            ups[j] = conv(li, j, src, dst, eattr, esh, rt, st, in_ir, out_ir)
        D = Irreps(out_ir).dim

        def pad_to(x):
            return torch.nn.functional.pad(x, (0, D - x.shape[-1]))

        new_attrs = {"lig": pad_to(attrs["lig"]) + ups[0] + ups[2] + ups[1]}
        if li != L - 1:
            new_attrs["atom"] = pad_to(attrs["atom"]) + ups[3] + ups[4] + ups[5]
            new_attrs["rec"] = pad_to(attrs["rec"]) + ups[6] + ups[8] + ups[7]
        else:
            new_attrs["atom"], new_attrs["rec"] = attrs["atom"], attrs["rec"]
        attrs = new_attrs

    return attrs["lig"]

class TestAllAtomScoreParity:
    """The all-atom model in SCORE mode (tr/rot/tor + pseudotorque heads on
    the 3-node-type trunk -- the reference trains this family via
    --all_atoms, model_utils.py:26-27) vs the shared torch oracles:
    oracle_aa_trunk at the sigma-based cross cutoff + oracle_score_heads."""

    CAPS = TestAllAtomConfidenceParity.CAPS
    CFG = dataclasses.replace(TestAllAtomConfidenceParity.CFG,
                              confidence_mode=False)

    @pytest.mark.parametrize("t", [0.8, 0.3])
    def test_scores_match(self, t):
        from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel

        batch = make_complex_batch(
            seed=8, batch=2, n_lig=10, n_res=14, caps=self.CAPS, esm_dim=6,
            c_alpha_max_neighbors=6, all_atoms=True, atoms_per_res=4,
        )
        model = AllAtomScoreModel(cfg=self.CFG, caps=self.CAPS)
        variables = model.init(jax.random.PRNGKey(0), batch)
        variables = _randomize(variables, seed=21)
        b = batch.set_time(t, t, t)
        tr, rot, tor = model.apply(
            variables, b, deterministic=True, use_running_average=True)
        tr, rot, tor = np.asarray(tr), np.asarray(rot), np.asarray(tor)
        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        tr_sigma = float(model.sigma.t_to_sigma(
            jnp.asarray([t]), jnp.asarray([t]), jnp.asarray([t]))[0][0])
        for gi in range(batch.num_graphs):
            g = TestAllAtomConfidenceParity._unpad_aa(
                TestAllAtomConfidenceParity, batch, gi)
            lig_attr = oracle_aa_trunk(params, stats, self.CFG, g, t,
                                       tr_sigma * 3 + 20)
            o_tr, o_rot, o_tor = oracle_score_heads(
                params, stats, self.CFG, model.sigma, g, t, lig_attr)
            np.testing.assert_allclose(tr[gi], o_tr, rtol=3e-4, atol=3e-5,
                                       err_msg=f"tr graph {gi} t={t}")
            np.testing.assert_allclose(rot[gi], o_rot, rtol=3e-4, atol=3e-5,
                                       err_msg=f"rot graph {gi} t={t}")
            R = len(g["tor_edges"])
            np.testing.assert_allclose(tor[gi][:R], o_tor, rtol=3e-4,
                                       atol=3e-5,
                                       err_msg=f"tor graph {gi} t={t}")
            assert np.all(tor[gi][R:] == 0.0)



class TestReverseStepParity:
    """One full Euler-Maruyama reverse step (utils/sampling.py:105-198) with
    the shipped DisCo-DiffDock-S low-temperature constants vs a numpy oracle
    consuming the torch-oracle scores."""

    def test_one_step_low_temperature(self, setup):
        from disco_diffdock_tpu.sampling import SamplerConfig, sampling
        from tests.test_parity_torch import _oracle_modify_conformer

        model, variables, batch = setup
        # damp the norm-feedback scale heads so one t=1 low-temperature step
        # stays physically bounded (see _damp_heads: undamped random heads
        # reach |pos| ~ 5e4, where rtol swamps the math being pinned); the
        # oracle consumes the same damped params below
        variables = _damp_heads(variables)
        sigma = model.sigma
        # shipped DisCo-DiffDock-S constants (configs/inference_disco_*.yml)
        temp_sampling = (1.546842681537956, 4.005218254154881, 3.6499018519649384)
        temp_psi = (1.1826298582329897, 0.9209708061994818, 0.2768632399747332)
        temp_sigma_data = (0.5911354109955666, 0.6379099342794536, 0.3566754905393134)
        scfg = SamplerConfig(
            inference_steps=1, no_final_step_noise=True,
            temp_sampling=temp_sampling, temp_psi=temp_psi,
            temp_sigma_data=temp_sigma_data,
        )
        final, _, _ = sampling(
            model, variables, batch, jax.random.PRNGKey(5), scfg, sigma)
        final_pos = np.asarray(final.lig_pos)
        # fixture-health guard: the trajectory must stay physically bounded
        # (damped heads), else the tolerance below stops meaning anything
        assert np.abs(final_pos).max() < 500, (
            f"fixture trajectory exploded: |pos|max={np.abs(final_pos).max():.1f}")

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        t, dt = 1.0, 1.0  # linspace(1,0,2)[:-1]; last step dt = t
        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            tr_s, rot_s, tor_s = oracle_forward(params, stats, CFG, sigma, g, t)
            tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t, t, t)
            out = {}
            for name, (sc, sig, smin, smax, ts, psi, tsd) in {
                "tr": (tr_s, tr_sigma, sigma.tr_sigma_min, sigma.tr_sigma_max,
                       temp_sampling[0], temp_psi[0], temp_sigma_data[0]),
                "rot": (rot_s, rot_sigma, sigma.rot_sigma_min, sigma.rot_sigma_max,
                        temp_sampling[1], temp_psi[1], temp_sigma_data[1]),
                "tor": (tor_s, tor_sigma, sigma.tor_sigma_min, sigma.tor_sigma_max,
                        temp_sampling[2], temp_psi[2], temp_sigma_data[2]),
            }.items():
                gcoef = sig * math.sqrt(2 * math.log(smax / smin))
                sd = math.exp(tsd * math.log(smax) + (1 - tsd) * math.log(smin))
                lam = (sd + sig) / (sd + sig / ts)
                # z = 0 on the (single) final step with no_final_step_noise
                out[name] = gcoef**2 * dt * (lam + ts * psi / 2) * sc
            new_pos = _oracle_modify_conformer(
                g["lig_pos"].astype(np.float64), out["tr"], out["rot"],
                g["tor_edges"], g["tor_mask_rotate"], out["tor"])
            nl = len(new_pos)
            np.testing.assert_allclose(
                final_pos[gi][:nl], new_pos, rtol=5e-4, atol=5e-4,
                err_msg=f"pose after 1 reverse step, graph {gi}")


class TestARPriorParity:
    """The AR latent prior (PretrainedScoreEncoder, models/ar.py): score
    trunk at t=1 with unconditional=1 and the partial latent string as
    conditioning, fresh per-node predictor MLPs, softmax over the union of
    nodes; sequential slot-by-slot decode (reference
    pretrained_score_encoder.py:8-89, model_classes.py:9-49) vs a
    plain-torch dynamic-graph oracle built on the same trunk twin."""

    ILD = 2  # input latent string length (shipped latent_dim)

    @pytest.fixture(scope="class")
    def ar_setup(self):
        from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder

        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=self.ILD, latent_vocab=1, latent_droprate=0.1,
            compute_dtype="float32",
        )
        batch = make_complex_batch(
            seed=21, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = PretrainedScoreEncoder(
            score_cfg=cfg, caps=CAPS, latent_dim=1,
            input_latent_dim=self.ILD, latent_hidden_dim=16,
        )
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        zero_lat = (jnp.zeros((B, NL, self.ILD)), jnp.zeros((B, NR, self.ILD)))
        dec0 = jnp.zeros((B,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), batch, zero_lat, dec0)
        variables = _randomize(variables, seed=23)
        return cfg, model, variables, batch

    def _oracle_logits(self, cfg, params, stats, sigma, g, lat_np):
        """Torch twin of one AR forward: trunk at t=1 (unconditional) +
        the two latent predictor heads; returns (nl+nr,) slot logits."""
        sp = params["pretrained_score_model"]
        ss = stats["pretrained_score_model"]
        lig_attr, rec_attr = oracle_trunk(
            sp, ss, cfg, sigma, g, 1.0, lat=lat_np, unconditional=True)
        ns = cfg.ns

        def scalars(a):
            if cfg.num_conv_layers >= 3:
                return torch.cat([a[:, :ns], a[:, -ns:]], -1)
            return a[:, :ns]

        pl = t_latent_mlp(params["latent_s_predictor"],
                          stats["latent_s_predictor"], 16, scalars(lig_attr))
        pr = t_latent_mlp(params["latent_r_predictor"],
                          stats["latent_r_predictor"], 16, scalars(rec_attr))
        return torch.cat([pl, pr], 0)[:, 0].numpy()  # (nl+nr,)

    def test_ar_logits_match(self, ar_setup):
        cfg, model, variables, batch = ar_setup
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        rng = np.random.RandomState(5)

        # partial string: slot 0 already decoded (a random valid node per
        # graph), slot 1 being decoded
        lat_l = np.zeros((B, NL, self.ILD), np.float32)
        lat_r = np.zeros((B, NR, self.ILD), np.float32)
        anchors = []
        for gi in range(B):
            nl = int(np.asarray(batch.lig_mask[gi]).sum())
            nr = int(np.asarray(batch.rec_mask[gi]).sum())
            a = rng.randint(0, nl + nr)
            anchors.append(a)
            if a < nl:
                lat_l[gi, a, 0] = 1.0
            else:
                lat_r[gi, a - nl, 0] = 1.0
        dec = jnp.full((B,), 1, jnp.int32)

        logits, node_mask = model.apply(
            variables, batch, (jnp.asarray(lat_l), jnp.asarray(lat_r)), dec,
            deterministic=True, use_running_average=True,
        )
        logits = np.asarray(logits)  # (B, 1, NL+NR)
        assert logits.shape == (B, 1, NL + NR)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        sigma = SigmaSchedule()
        for gi in range(B):
            g = _unpad_graph(batch, gi)
            nl, nr = len(g["lig_pos"]), len(g["rec_pos"])
            o = self._oracle_logits(
                cfg, params, stats, sigma, g,
                (lat_l[gi, :nl], lat_r[gi, :nr]))
            got = np.concatenate(
                [logits[gi, 0, :nl], logits[gi, 0, NL:NL + nr]])
            np.testing.assert_allclose(got, o, rtol=3e-4, atol=3e-5,
                                       err_msg=f"AR slot logits, graph {gi}")

    def test_sequential_decode_matches(self, ar_setup):
        """encode_ar (a lax.scan over latent slots) at argmax temperature:
        the final one-hot strings must equal the oracle's slot-by-slot
        argmax decode, and each slot's jax logits -- recomputed directly on
        the oracle's partial string -- must match the oracle
        (model_classes.py:26-46 temperature>=100 branch).  Per-slot choice
        equality makes the jax scan's intermediate partial strings equal to
        the oracle's by induction (slots are written exactly once)."""
        from disco_diffdock_tpu.models.ar import encode_ar

        cfg, model, variables, batch = ar_setup
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]

        def apply_fn(b, lat, d):
            return model.apply(variables, b, lat, d,
                               deterministic=True, use_running_average=True)

        lat_l, lat_r = encode_ar(
            apply_fn, batch, jax.random.PRNGKey(3), self.ILD,
            sampling_temperature=1000.0)
        lat_l, lat_r = np.asarray(lat_l), np.asarray(lat_r)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        sigma = SigmaSchedule()
        for gi in range(B):
            g = _unpad_graph(batch, gi)
            nl, nr = len(g["lig_pos"]), len(g["rec_pos"])
            ol = np.zeros((nl, self.ILD), np.float32)
            orr = np.zeros((nr, self.ILD), np.float32)
            for idx in range(self.ILD):
                o = self._oracle_logits(cfg, params, stats, sigma, g, (ol, orr))
                # jax logits on the oracle's partial string, this slot
                pl = np.zeros((B, NL, self.ILD), np.float32)
                pr = np.zeros((B, NR, self.ILD), np.float32)
                pl[gi, :nl], pr[gi, :nr] = ol, orr
                lg, _ = apply_fn(batch, (jnp.asarray(pl), jnp.asarray(pr)),
                                 jnp.full((B,), idx, jnp.int32))
                lg = np.asarray(lg)
                got = np.concatenate([lg[gi, 0, :nl], lg[gi, 0, NL:NL + nr]])
                np.testing.assert_allclose(got, o, rtol=3e-4, atol=3e-5,
                                           err_msg=f"decode slot {idx}, graph {gi}")
                choice = int(np.argmax(o))  # argmax branch at temp >= 100
                if choice < nl:
                    ol[choice, idx] = 1.0
                    assert lat_l[gi, choice, idx] == 1.0, (gi, idx, choice)
                else:
                    orr[choice - nl, idx] = 1.0
                    assert lat_r[gi, choice - nl, idx] == 1.0, (gi, idx, choice)
            # exactly one node chosen per slot
            assert lat_l[gi].sum(0).max() <= 1.0 + 1e-6
            np.testing.assert_allclose(
                lat_l[gi, :nl].sum(0) + lat_r[gi, :nr].sum(0),
                np.ones(self.ILD), err_msg=f"one-hot per slot, graph {gi}")


class TestCFGReverseStepParity:
    """One reverse step under classifier-free guidance (utils/sampling.py:
    119-135): conditional pass with the latent string, unconditional pass
    with zeroed latents + unconditional embeddings, extrapolation
    c + w*(c - u), then the plain Euler-Maruyama update -- vs the torch
    oracle run twice per graph."""

    def test_one_cfg_step(self):
        from disco_diffdock_tpu.sampling import SamplerConfig, sampling
        from tests.test_parity_torch import _oracle_modify_conformer

        ILD = 2
        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=ILD, latent_vocab=1, latent_droprate=0.1,
            compute_dtype="float32",
        )
        batch = make_complex_batch(
            seed=31, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        lat_l = np.zeros((B, NL, ILD), np.float32)
        lat_r = np.zeros((B, NR, ILD), np.float32)
        rng = np.random.RandomState(7)
        for gi in range(B):
            nl = int(np.asarray(batch.lig_mask[gi]).sum())
            nr = int(np.asarray(batch.rec_mask[gi]).sum())
            for s in range(ILD):
                a = rng.randint(0, nl + nr)
                if a < nl:
                    lat_l[gi, a, s] = 1.0
                else:
                    lat_r[gi, a - nl, s] = 1.0
        lat = (jnp.asarray(lat_l), jnp.asarray(lat_r))
        variables = model.init(
            jax.random.PRNGKey(0), batch, latent=lat,
            unconditional=jnp.zeros((B, 1)))
        variables = _damp_heads(_randomize(variables, seed=29))

        w = 0.5
        scfg = SamplerConfig(
            inference_steps=1, no_final_step_noise=True,
            cfg_weight=w, cfg_start=1.0, cfg_end=0.0,
        )
        sigma = SigmaSchedule()
        final, _, _ = sampling(
            model, variables, batch, jax.random.PRNGKey(5), scfg, sigma,
            latent=lat)
        final_pos = np.asarray(final.lig_pos)
        # fixture-health guard: the trajectory must stay physically bounded
        # (damped heads), else the tolerance below stops meaning anything
        assert np.abs(final_pos).max() < 500, (
            f"fixture trajectory exploded: |pos|max={np.abs(final_pos).max():.1f}")

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        t, dt = 1.0, 1.0
        for gi in range(B):
            g = _unpad_graph(batch, gi)
            nl, nr = len(g["lig_pos"]), len(g["rec_pos"])
            glat = (lat_l[gi, :nl], lat_r[gi, :nr])
            zlat = (np.zeros_like(glat[0]), np.zeros_like(glat[1]))
            cond = oracle_forward(params, stats, cfg, sigma, g, t, lat=glat)
            unc = oracle_forward(params, stats, cfg, sigma, g, t, lat=zlat,
                                 unconditional=True)
            tr_sigma, rot_sigma, tor_sigma = sigma.t_to_sigma(t, t, t)
            out = {}
            for name, c, u, sig, smin, smax in (
                ("tr", cond[0], unc[0], tr_sigma, sigma.tr_sigma_min, sigma.tr_sigma_max),
                ("rot", cond[1], unc[1], rot_sigma, sigma.rot_sigma_min, sigma.rot_sigma_max),
                ("tor", cond[2], unc[2], tor_sigma, sigma.tor_sigma_min, sigma.tor_sigma_max),
            ):
                s = c + w * (c - u)
                gcoef = sig * math.sqrt(2 * math.log(smax / smin))
                out[name] = gcoef**2 * dt * s  # z = 0 on the final step
            new_pos = _oracle_modify_conformer(
                g["lig_pos"].astype(np.float64), out["tr"], out["rot"],
                g["tor_edges"], g["tor_mask_rotate"], out["tor"])
            np.testing.assert_allclose(
                final_pos[gi][:nl], new_pos, rtol=5e-4, atol=5e-4,
                err_msg=f"CFG reverse step, graph {gi}")


class TestCGConfidenceParity:
    """The coarse-grained model's confidence head (score_model.py:263-266:
    masked-mean-pooled scalar features -> MLP/BN/ReLU x2 -> linear) on the
    same trunk, in confidence_mode (raw complex_t consumed as the sigmas,
    so the dynamic cross cutoff is 3*t + 20) -- the CG counterpart of the
    shipped all-atom confidence family."""

    @pytest.mark.parametrize("t", [0.0, 0.3])
    def test_confidence_matches(self, t):
        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=0, latent_droprate=0.0, compute_dtype="float32",
            confidence_mode=True, num_confidence_outputs=1,
            confidence_dropout=0.0,
        )
        batch = make_complex_batch(
            seed=41, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        b = batch.set_time(t, t, t)
        variables = model.init(jax.random.PRNGKey(0), b)
        variables = _randomize(variables, seed=43)
        conf = np.asarray(model.apply(
            variables, b, deterministic=True, use_running_average=True))
        assert conf.shape == (batch.num_graphs,)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        sigma = SigmaSchedule()
        ns = cfg.ns
        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            lig_attr, _ = oracle_trunk(params, stats, cfg, sigma, g, t,
                                       confidence_mode=True)
            scal = torch.cat([lig_attr[:, :ns], lig_attr[:, -ns:]], -1)
            pooled = scal.mean(0, keepdim=True)  # masked mean == mean (unpadded)
            x = t_dense(params["confidence_mlp1"], pooled)
            x = t_irreps_bn(params["confidence_bn1"], stats["confidence_bn1"],
                            f"{ns}x0e", x)
            x = torch.relu(x)
            x = t_dense(params["confidence_mlp2"], x)
            x = t_irreps_bn(params["confidence_bn2"], stats["confidence_bn2"],
                            f"{ns}x0e", x)
            x = torch.relu(x)
            o = t_dense(params["confidence_out"], x)[0, 0].item()
            np.testing.assert_allclose(conf[gi], o, rtol=3e-4, atol=3e-5,
                                       err_msg=f"CG confidence, graph {gi}")


def t_xattn(params: dict, heads: int, dim_head: int,
            x: torch.Tensor, ctx: torch.Tensor) -> torch.Tensor:
    """CrossAttention twin (nn/basic.py CrossAttention; reference
    models/layers.py:35-78): q/k/v Dense (no bias), per-head softmax
    attention, output Dense."""
    W = lambda k: torch.from_numpy(np.asarray(params[k]["kernel"], np.float64))
    q = (x @ W("Dense_0")).reshape(-1, heads, dim_head)
    k = (ctx @ W("Dense_1")).reshape(-1, heads, dim_head)
    v = (ctx @ W("Dense_2")).reshape(-1, heads, dim_head)
    sim = torch.einsum("ihd,jhd->hij", q, k) * dim_head ** -0.5
    attn = torch.softmax(sim, -1)
    out = torch.einsum("hij,jhd->ihd", attn, v).reshape(-1, heads * dim_head)
    b3 = torch.from_numpy(np.asarray(params["Dense_3"]["bias"], np.float64))
    return out @ W("Dense_3") + b3


class TestVocabLatentScoreParity:
    """The vocab>1 latent path of the score model: graph-level latents
    broadcast onto nodes/edges (score_model.py:329-404 vocab branch) plus
    the per-layer bilinear latent cross-attention (:232-254 simple
    attention: att = scal @ lat^T, res = MLP(att @ lat), zero-padded back
    onto the irreps layout) -- vs the torch oracle via the glat/post_layer
    trunk hooks."""

    LD, VOCAB = 2, 3

    @pytest.mark.parametrize("new_xattn", [False, True])
    def test_scores_match(self, new_xattn):
        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=self.LD, latent_vocab=self.VOCAB, latent_droprate=0.0,
            latent_cross_attention=True, new_cross_attention=new_xattn,
            cross_attention_heads=2, cross_attention_dim=8,
            compute_dtype="float32",
        )
        batch = make_complex_batch(
            seed=51, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        B = batch.num_graphs
        rng = np.random.RandomState(13)
        # one-hot slot latents, as the gumbel head emits (B, Ld, vocab)
        lat3 = np.zeros((B, self.LD, self.VOCAB), np.float32)
        for gi in range(B):
            for s in range(self.LD):
                lat3[gi, s, rng.randint(self.VOCAB)] = 1.0
        latent = jnp.asarray(lat3.reshape(B, -1))

        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        t = 0.5
        b = batch.set_time(t, t, t)
        variables = model.init(jax.random.PRNGKey(0), b, latent=latent)
        variables = _randomize(variables, seed=53)
        # damp the latent-attention stacks: the bilinear path SQUARES
        # activations per layer (att = scal@lat^T, res = att@lat) and fully
        # random O(1) weights explode past f32 over 5 layers -- both sides
        # consume the same tree, so the scaling tests the identical math
        p = dict(variables["params"])
        for k in list(p):
            if k.startswith("lat_"):  # lat_emb / lat_res / lat_xattn stacks
                p[k] = jax.tree.map(lambda x: x * 0.2, p[k])
        variables = {**variables, "params": p}
        tr, rot, tor = model.apply(
            variables, b, latent=latent,
            deterministic=True, use_running_average=True)
        tr, rot, tor = np.asarray(tr), np.asarray(rot), np.asarray(tor)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        sigma = SigmaSchedule()
        ns = cfg.ns
        L = cfg.num_conv_layers
        tot = L * ns + max(0, L - 2) * ns

        for gi in range(B):
            g = _unpad_graph(batch, gi)
            # per-slot latent embeddings (score_model.py:69-78,232-236)
            lat_emb = torch.stack([
                t_fcblock(params[f"lat_emb{i}"],
                          torch.from_numpy(lat3[gi, i].astype(np.float64)))
                for i in range(self.LD)
            ], 0)  # (Ld, tot)
            assert lat_emb.shape == (self.LD, tot)

            def post_layer(li, lig_attr, rec_attr):
                cur_len = ns if li < 2 else 2 * ns
                cur_idx = li * ns + max(0, li - 2) * ns
                lat = lat_emb[:, cur_idx:cur_idx + cur_len]  # (Ld, d)
                outs = []
                for x in (lig_attr, rec_attr):
                    if li < 2:
                        scal = x[:, :ns]
                    else:
                        scal = torch.cat([x[:, :ns], x[:, -ns:]], -1)
                    if new_xattn:
                        # multi-head path (score_model.py:241-246): xattn +
                        # residual, MLP + residual, minus scal (re-added as
                        # x + res_full below)
                        res = t_xattn(params[f"lat_xattn{li}"], 2, 8,
                                      scal, lat) + scal
                        res = t_fcblock(params[f"lat_res{li}"], res) + res
                        res = res - scal
                    else:
                        att = scal @ lat.T           # (n, Ld)
                        res = att @ lat              # (n, d)
                        res = t_fcblock(params[f"lat_res{li}"], res)
                    D = x.shape[-1]
                    if li < 2:
                        res_full = torch.nn.functional.pad(res, (0, D - res.shape[-1]))
                    else:
                        res_full = torch.cat([
                            torch.nn.functional.pad(res[:, :ns], (0, D - 2 * ns)),
                            res[:, ns:]], -1)
                    outs.append(x + res_full)
                return outs[0], outs[1]

            o_tr, o_rot, o_tor = oracle_forward(
                params, stats, cfg, sigma, g, t,
                glat=lat3[gi].reshape(-1), post_layer=post_layer)
            np.testing.assert_allclose(tr[gi], o_tr, rtol=3e-4, atol=3e-5,
                                       err_msg=f"tr graph {gi}")
            np.testing.assert_allclose(rot[gi], o_rot, rtol=3e-4, atol=3e-5,
                                       err_msg=f"rot graph {gi}")
            R = len(g["tor_edges"])
            np.testing.assert_allclose(tor[gi][:R], o_tor, rtol=3e-4, atol=3e-5,
                                       err_msg=f"tor graph {gi}")


class TestEncoderVocabParity:
    """The encoder's vocab>1 head (latent_encoder.py:312-319): mean-pooled
    lig/rec scalar features concatenated -> LatentPredictorMLP ->
    (B, latent_dim, vocab) logits -- on the shared time-free oracle trunk."""

    def test_vocab_logits_match(self):
        from disco_diffdock_tpu.config import EncoderConfig
        from disco_diffdock_tpu.models.encoder import TPEncoder

        LD, VOCAB = 2, 4
        cfg = EncoderConfig(
            ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6, dropout=0.0,
            latent_dim=LD, latent_vocab=VOCAB, latent_hidden_dim=16,
        )
        batch = make_complex_batch(
            seed=61, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TPEncoder(cfg=cfg, caps=CAPS)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            batch,
        )
        variables = _randomize(variables, seed=67)
        logits = np.asarray(model.apply(
            variables, batch, apply_gumbel=False,
            deterministic=True, use_running_average=True,
        ))
        assert logits.shape == (batch.num_graphs, LD, VOCAB)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        ns = cfg.ns
        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            om = np.asarray(batch.lig_mask[gi])
            orig = np.asarray(batch.extras["orig_pos"][gi])[om]
            attrs = oracle_encoder_trunk(params, stats, cfg, g, orig)

            def scalars(a):
                if cfg.num_conv_layers >= 3:
                    return torch.cat([a[:, :ns], a[:, -ns:]], -1)
                return a[:, :ns]

            pooled = torch.cat([
                scalars(attrs["lig"]).mean(0), scalars(attrs["rec"]).mean(0)
            ])[None]  # masked mean == mean on unpadded arrays
            o = t_latent_mlp(params["latent_predictor"],
                             stats["latent_predictor"],
                             cfg.latent_hidden_dim, pooled)
            o = o.reshape(LD, VOCAB).numpy()
            np.testing.assert_allclose(logits[gi], o, rtol=3e-4, atol=3e-5,
                                       err_msg=f"vocab logits, graph {gi}")


class TestSecondOrderReprParity:
    """The --use_second_order_repr variant (tensor_layers.py:12-27 second
    branch: 2e/2o feature irreps) with sh_lmax=2 -- the general-CG
    WeightedTensorProduct path in a complete score-model forward."""

    def test_scores_match(self):
        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=0, latent_droprate=0.0, compute_dtype="float32",
            use_second_order_repr=True, sh_lmax=2,
        )
        batch = make_complex_batch(
            seed=81, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        t = 0.4
        b = batch.set_time(t, t, t)
        variables = model.init(jax.random.PRNGKey(0), b)
        variables = _randomize(variables, seed=83)
        tr, rot, tor = model.apply(
            variables, b, deterministic=True, use_running_average=True)
        tr, rot, tor = np.asarray(tr), np.asarray(rot), np.asarray(tor)

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        sigma = SigmaSchedule()
        for gi in range(batch.num_graphs):
            g = _unpad_graph(batch, gi)
            o_tr, o_rot, o_tor = oracle_forward(params, stats, cfg, sigma, g, t)
            np.testing.assert_allclose(tr[gi], o_tr, rtol=3e-4, atol=3e-5,
                                       err_msg=f"tr graph {gi}")
            np.testing.assert_allclose(rot[gi], o_rot, rtol=3e-4, atol=3e-5,
                                       err_msg=f"rot graph {gi}")
            R = len(g["tor_edges"])
            np.testing.assert_allclose(tor[gi][:R], o_tor, rtol=3e-4, atol=3e-5,
                                       err_msg=f"tor graph {gi}")


class TestTrajectoryParity:
    """FULL-TRAJECTORY oracle parity (utils/sampling.py:105-198): the JAX
    sampler and a numpy/torch twin share ONE pre-drawn noise sequence
    (sampler.py noise_override), so every step's drift, noise scaling,
    segment boundary, CFG window transition, no_final_step_noise and
    actual_steps final-dt handling must line up for the final poses to agree
    -- RNG-stream differences are decoupled, math differences are not."""

    STEPS = 20

    _damp_heads = staticmethod(_damp_heads)  # shared with the 1-step tests

    def _noise(self, seed, steps, B, R):
        rng = np.random.RandomState(seed)
        return (rng.randn(steps, B, 3).astype(np.float32),
                rng.randn(steps, B, 3).astype(np.float32),
                rng.randn(steps, B, R).astype(np.float32))

    def _oracle_trajectory(self, params, stats, cfg, sigma, batch, gi, noise,
                           t_grid, dt_grid, noise_on, temp=None,
                           cfg_weight=0.0, cfg_window=(1.0, 0.0), lat=None):
        """Numpy twin of the reverse SDE for one graph: per step, torch
        -oracle scores on the CURRENT pose, Euler-Maruyama (optionally
        low-temperature / CFG-extrapolated) update, oracle conformer apply."""
        from tests.test_parity_torch import _oracle_modify_conformer

        g = _unpad_graph(batch, gi)
        nl = len(g["lig_pos"])
        Rg = len(g["tor_edges"])
        pos = g["lig_pos"].astype(np.float64)
        tr_n, rot_n, tor_n = noise
        consts = {
            "tr": (sigma.tr_sigma_min, sigma.tr_sigma_max),
            "rot": (sigma.rot_sigma_min, sigma.rot_sigma_max),
            "tor": (sigma.tor_sigma_min, sigma.tor_sigma_max),
        }
        for s, (t, dt) in enumerate(zip(t_grid, dt_grid)):
            g["lig_pos"] = pos.astype(np.float32)
            if lat is not None:
                glat = (lat[0][gi, :nl], lat[1][gi]
                        [: len(g["rec_pos"])])
            else:
                glat = None
            scores = oracle_forward(params, stats, cfg, sigma, g, float(t),
                                    lat=glat)
            if cfg_weight != 0.0 and cfg_window[1] <= t <= cfg_window[0]:
                zlat = ((np.zeros_like(glat[0]), np.zeros_like(glat[1]))
                        if glat is not None else None)
                unc = oracle_forward(params, stats, cfg, sigma, g, float(t),
                                     lat=zlat, unconditional=True)
                scores = tuple(c + cfg_weight * (c - u)
                               for c, u in zip(scores, unc))
            z = {"tr": tr_n[s, gi] * noise_on[s],
                 "rot": rot_n[s, gi] * noise_on[s],
                 "tor": tor_n[s, gi, :Rg] * noise_on[s]}
            sig = dict(zip(("tr", "rot", "tor"),
                           sigma.t_to_sigma(float(t), float(t), float(t))))
            out = {}
            for ci, name in enumerate(("tr", "rot", "tor")):
                smin, smax = consts[name]
                gcoef = sig[name] * math.sqrt(2 * math.log(smax / smin))
                sc = scores[ci]
                if temp is not None and temp[0][ci] != 1.0:
                    ts, psi, tsd = temp[0][ci], temp[1][ci], temp[2][ci]
                    sd = math.exp(tsd * math.log(smax) + (1 - tsd) * math.log(smin))
                    lam = (sd + sig[name]) / (sd + sig[name] / ts)
                    out[name] = (gcoef**2 * dt * (lam + ts * psi / 2) * sc
                                 + gcoef * math.sqrt(dt * (1 + psi)) * z[name])
                else:
                    out[name] = (gcoef**2 * dt * sc
                                 + gcoef * math.sqrt(dt) * z[name])
            pos = _oracle_modify_conformer(
                pos, out["tr"], out["rot"], g["tor_edges"],
                g["tor_mask_rotate"], out["tor"])
        return pos

    def _grids(self, steps, actual=None, final_noise=False):
        from disco_diffdock_tpu.geom.diffusion import get_t_schedule

        t = np.asarray(get_t_schedule(steps), np.float32)
        dt = np.concatenate([t[:-1] - t[1:], [t[-1]]]).astype(np.float32)
        if actual and actual < steps:
            t, dt = t[:actual], dt[:actual].copy()
            dt[-1] = t[-1]
        noise_on = np.ones(len(t), np.float32)
        if not final_noise:
            noise_on[-1] = 0.0
        return t, dt, noise_on

    def test_segmented_plain_trajectory(self, setup):
        """20 steps across a 12+8 segment boundary (two separately compiled
        scans, different capacity profiles), no_final_step_noise."""
        import dataclasses as _dc

        from disco_diffdock_tpu.sampling import SamplerConfig, sampling

        model, variables, batch = setup
        variables = self._damp_heads(variables)
        sigma = model.sigma
        B, R = batch.num_graphs, batch.tor_edges.shape[1]
        noise = self._noise(41, self.STEPS, B, R)
        # same worst-case (non-truncating) geometry, different padding: the
        # segment mechanism is exercised without changing any true edge
        caps2 = _dc.replace(CAPS, rec_edge_cap=16 * 10, tor_edge_cap=4 * 12 + 8)
        model2 = TensorProductScoreModel(cfg=CFG, caps=caps2)
        scfg = SamplerConfig(inference_steps=self.STEPS,
                             no_final_step_noise=True)
        final, _, _ = sampling([(12, model), (8, model2)], variables, batch,
                               jax.random.PRNGKey(5), scfg, sigma,
                               noise_override=noise)
        final_pos = np.asarray(final.lig_pos)
        # fixture-health guard: the trajectory must stay physically bounded
        # (damped heads), else the tolerance below stops meaning anything
        assert np.abs(final_pos).max() < 500, (
            f"fixture trajectory exploded: |pos|max={np.abs(final_pos).max():.1f}")

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        t, dt, noise_on = self._grids(self.STEPS)
        for gi in range(B):
            want = self._oracle_trajectory(
                params, stats, CFG, sigma, batch, gi, noise, t, dt, noise_on)
            nl = len(want)
            np.testing.assert_allclose(
                final_pos[gi][:nl], want, rtol=2e-3, atol=2e-3,
                err_msg=f"20-step segmented trajectory, graph {gi}")

    def test_lowtemp_actual_steps_trajectory(self, setup):
        """--actual_steps truncation (14 of 20; the final executed step
        integrates the remaining time to t=0) under the shipped 9-constant
        low-temperature scaling, with injected noise."""
        from disco_diffdock_tpu.sampling import SamplerConfig, sampling

        model, variables, batch = setup
        variables = self._damp_heads(variables)
        sigma = model.sigma
        B, R = batch.num_graphs, batch.tor_edges.shape[1]
        ACTUAL = 14
        noise = self._noise(43, ACTUAL, B, R)
        temp = ((1.546842681537956, 4.005218254154881, 3.6499018519649384),
                (1.1826298582329897, 0.9209708061994818, 0.2768632399747332),
                (0.5911354109955666, 0.6379099342794536, 0.3566754905393134))
        scfg = SamplerConfig(
            inference_steps=self.STEPS, actual_steps=ACTUAL,
            no_final_step_noise=True, temp_sampling=temp[0],
            temp_psi=temp[1], temp_sigma_data=temp[2])
        final, _, _ = sampling(model, variables, batch,
                               jax.random.PRNGKey(5), scfg, sigma,
                               noise_override=noise)
        final_pos = np.asarray(final.lig_pos)
        # fixture-health guard: the trajectory must stay physically bounded
        # (damped heads), else the tolerance below stops meaning anything
        assert np.abs(final_pos).max() < 500, (
            f"fixture trajectory exploded: |pos|max={np.abs(final_pos).max():.1f}")

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        t, dt, noise_on = self._grids(self.STEPS, actual=ACTUAL)
        for gi in range(B):
            want = self._oracle_trajectory(
                params, stats, CFG, sigma, batch, gi, noise, t, dt, noise_on,
                temp=temp)
            nl = len(want)
            np.testing.assert_allclose(
                final_pos[gi][:nl], want, rtol=2e-3, atol=2e-3,
                err_msg=f"low-temp actual_steps trajectory, graph {gi}")

    def test_cfg_window_trajectory(self):
        """The CFG window opens AND closes mid-trajectory (cfg_start=0.7,
        cfg_end=0.25 on the 20-step grid): in-window steps extrapolate
        c + w(c - u), out-of-window steps must not."""
        from disco_diffdock_tpu.sampling import SamplerConfig, sampling

        ILD = 2
        cfg = ScoreModelConfig(
            ns=4, nv=2, num_conv_layers=5, esm_embedding_dim=6, dropout=0.0,
            latent_dim=ILD, latent_vocab=1, latent_droprate=0.1,
            compute_dtype="float32",
        )
        batch = make_complex_batch(
            seed=31, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        R = batch.tor_edges.shape[1]
        lat_l = np.zeros((B, NL, ILD), np.float32)
        lat_r = np.zeros((B, NR, ILD), np.float32)
        rng = np.random.RandomState(7)
        for gi in range(B):
            nl = int(np.asarray(batch.lig_mask[gi]).sum())
            nr = int(np.asarray(batch.rec_mask[gi]).sum())
            for s in range(ILD):
                a = rng.randint(0, nl + nr)
                if a < nl:
                    lat_l[gi, a, s] = 1.0
                else:
                    lat_r[gi, a - nl, s] = 1.0
        lat = (jnp.asarray(lat_l), jnp.asarray(lat_r))
        variables = model.init(
            jax.random.PRNGKey(0), batch, latent=lat,
            unconditional=jnp.zeros((B, 1)))
        variables = self._damp_heads(_randomize(variables, seed=29))

        w, start, end = 0.5, 0.7, 0.25
        noise = self._noise(47, self.STEPS, B, R)
        sigma = SigmaSchedule()
        scfg = SamplerConfig(inference_steps=self.STEPS,
                             no_final_step_noise=True,
                             cfg_weight=w, cfg_start=start, cfg_end=end)
        final, _, _ = sampling(model, variables, batch,
                               jax.random.PRNGKey(5), scfg, sigma,
                               latent=lat, noise_override=noise)
        final_pos = np.asarray(final.lig_pos)
        # fixture-health guard: the trajectory must stay physically bounded
        # (damped heads), else the tolerance below stops meaning anything
        assert np.abs(final_pos).max() < 500, (
            f"fixture trajectory exploded: |pos|max={np.abs(final_pos).max():.1f}")

        params = jax.tree.map(np.asarray, variables["params"])
        stats = jax.tree.map(np.asarray, variables["batch_stats"])
        t, dt, noise_on = self._grids(self.STEPS)
        # the window must actually open and close inside the grid
        on = (t >= end) & (t <= start)
        assert 0 < on.sum() < len(t) and not on[0] and not on[-1]
        for gi in range(B):
            want = self._oracle_trajectory(
                params, stats, cfg, sigma, batch, gi, noise, t, dt, noise_on,
                cfg_weight=w, cfg_window=(start, end), lat=(lat_l, lat_r))
            nl = len(want)
            np.testing.assert_allclose(
                final_pos[gi][:nl], want, rtol=2e-3, atol=2e-3,
                err_msg=f"CFG-window trajectory, graph {gi}")
