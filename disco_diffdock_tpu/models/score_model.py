"""SE(3)-equivariant tensor-product score model (coarse-grained).

TPU-native redesign of the reference ``TensorProductScoreModel``
(models/score_model.py:14-439): same computational graph -- ligand radius
+bond edges, precomputed receptor kNN edges, sigma-dependent dynamic cross
edges, N tensor-product conv layers with 4 per-edge-group weight MLPs,
a ligand-centroid "center conv" head for tr/rot scores and a rotatable-bond
pseudotorque head for torsion scores -- re-expressed over padded fixed-shape
batches:

  * all graphs are (B, N, ...) dense arrays with masks; radius graphs are
    rebuilt on-device every call (masked distances + top-k compaction)
  * the dynamic cross cutoff 3*sigma_tr + 20 (reference :202-206) is a
    per-graph broadcast scalar -- no shape changes
  * score normalizations (so3.score_norm / torus.score_norm) are device table
    lookups instead of the reference's per-step .cpu() round-trips (:286,:306)
  * vector outputs live in the (y,z,x) irrep layout internally and are
    converted to physical (x,y,z) at the heads.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import GraphCaps, ScoreModelConfig
from ..data.features import LIG_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS
from ..geom import so3, torus
from ..geom.diffusion import SigmaSchedule, get_timestep_embedding
from ..graphs.containers import ComplexBatch, ListEdges
from ..graphs.radius import radius_edges
from ..graphs.segment import masked_mean_pool
from ..nn.basic import AtomEncoder, FCBlock
from ..nn.batchnorm import MaskedIrrepsBatchNorm
from ..nn.conv import (ConvBlock, TPConvLayer, bcat as _bcat, build_onehots,
                       gather_nodes, gather_pos)
from ..nn.irreps import spherical_harmonics_irreps
from ..nn.sh import irrep_to_vec, spherical_harmonics
from ..nn.tensor_product import FullTensorProduct, get_irrep_seq


class GaussianSmearing(nn.Module):
    start: float
    stop: float
    num: int

    @nn.compact
    def __call__(self, dist):
        offset = jnp.linspace(self.start, self.stop, self.num)
        coeff = -0.5 / float(self.stop - self.start) ** 2 * (self.num - 1) ** 2
        d = dist[..., None] - offset
        return jnp.exp(coeff * d * d)


def _concat_edges(a: ListEdges, b: ListEdges) -> ListEdges:
    return ListEdges(
        src=jnp.concatenate([a.src, b.src], -1),
        dst=jnp.concatenate([a.dst, b.dst], -1),
        mask=jnp.concatenate([a.mask, b.mask], -1),
    )


def _edge_latent(lat_src, lat_dst, edges: ListEdges):
    """Per-edge latent features: [lat[src], lat[dst]] (score_model.py:335)."""
    return jnp.concatenate(
        [gather_nodes(lat_src, edges.src), gather_nodes(lat_dst, edges.dst)], -1
    )


class TensorProductScoreModel(nn.Module):
    cfg: ScoreModelConfig
    caps: GraphCaps
    sigma: SigmaSchedule = SigmaSchedule()

    def setup(self):
        cfg = self.cfg
        ns, nv = cfg.ns, cfg.nv
        self.sh_irreps = str(spherical_harmonics_irreps(cfg.sh_lmax))
        self.irrep_seq = get_irrep_seq(ns, nv, cfg.use_second_order_repr)
        lat = cfg.latent_dim * cfg.latent_vocab


        self.timestep_emb = get_timestep_embedding(
            cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale
        )

        if cfg.use_old_atom_encoder:
            # legacy variant: scalar linear added to the embedding sum, ESM
            # fused through a late linear (models/layers.py:81-116).  The
            # reference's OldAtomEncoder takes no latent features (its
            # constructor predates latents) -- old-encoder checkpoints are
            # latent-free.
            assert lat == 0, "use_old_atom_encoder predates latent models"
            from ..nn.basic import OldAtomEncoder

            self.lig_node_embedding = OldAtomEncoder(
                ns, LIG_FEATURE_DIMS, cfg.sigma_embed_dim, 0
            )
            self.rec_node_embedding = OldAtomEncoder(
                ns, REC_RESIDUE_FEATURE_DIMS, cfg.sigma_embed_dim,
                cfg.esm_embedding_dim,
            )
        else:
            self.lig_node_embedding = AtomEncoder(
                ns, LIG_FEATURE_DIMS, cfg.sigma_embed_dim + lat
            )
            self.rec_node_embedding = AtomEncoder(
                ns,
                REC_RESIDUE_FEATURE_DIMS,
                cfg.esm_embedding_dim + cfg.sigma_embed_dim + lat,
            )
        self.lig_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
        self.rec_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
        self.cross_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)

        if cfg.latent_droprate > 0:
            zeros = nn.initializers.zeros
            self.lig_node_uncond = self.param("lig_node_uncond", zeros, (1, ns))
            self.rec_node_uncond = self.param("rec_node_uncond", zeros, (1, ns))
            self.lig_edge_uncond = self.param("lig_edge_uncond", zeros, (1, ns))
            self.rec_edge_uncond = self.param("rec_edge_uncond", zeros, (1, ns))
            self.cross_edge_uncond = self.param("cross_edge_uncond", zeros, (1, ns))

        self.lig_distance_expansion = GaussianSmearing(0.0, cfg.lig_max_radius, cfg.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, cfg.rec_max_radius, cfg.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim)

        if cfg.latent_cross_attention:
            # per-slot latent embeddings + per-layer residual MLPs (+ optional
            # multi-head cross attention), score_model.py:69-87
            self.tot_scalar_size = cfg.num_conv_layers * ns + max(0, cfg.num_conv_layers - 2) * ns
            self.latent_embedding_layers = [
                FCBlock(self.tot_scalar_size, self.tot_scalar_size, 2, cfg.dropout, name=f"lat_emb{i}")
                for i in range(cfg.latent_dim)
            ]
            self.latent_residual_layers = [
                FCBlock(ns if i < 2 else 2 * ns, ns if i < 2 else 2 * ns, 2, cfg.dropout, name=f"lat_res{i}")
                for i in range(cfg.num_conv_layers)
            ]
            if cfg.new_cross_attention:
                from ..nn.basic import CrossAttention

                self.cross_attention_layers = [
                    CrossAttention(
                        ns if i < 2 else 2 * ns, heads=cfg.cross_attention_heads,
                        dim_head=cfg.cross_attention_dim, dropout=cfg.dropout,
                        name=f"lat_xattn{i}",
                    )
                    for i in range(cfg.num_conv_layers)
                ]

        self.compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        self.conv_layers = [
            TPConvLayer(
                in_irreps=self.irrep_seq[min(i, len(self.irrep_seq) - 1)],
                sh_irreps=self.sh_irreps,
                out_irreps=self.irrep_seq[min(i + 1, len(self.irrep_seq) - 1)],
                n_edge_features=3 * ns,
                hidden_features=3 * ns,
                residual=True,
                batch_norm=cfg.batch_norm,
                dropout=cfg.dropout,
                edge_groups=4,
                n_scalars=ns,
                compute_dtype=self.compute_dtype,
                use_pallas=cfg.use_pallas_conv,
                fuse_w2=cfg.fuse_w2,
                remat=cfg.remat,
                name=f"conv{i}",
            )
            for i in range(cfg.num_conv_layers)
        ]
        final_irreps = self.irrep_seq[min(cfg.num_conv_layers, len(self.irrep_seq) - 1)]

        if cfg.confidence_mode:
            self.confidence_mlp1 = nn.Dense(ns)
            self.confidence_mlp2 = nn.Dense(ns)
            self.confidence_out = nn.Dense(cfg.num_confidence_outputs)
            if not cfg.confidence_no_batchnorm:
                self.confidence_bn1 = MaskedIrrepsBatchNorm(f"{ns}x0e")
                self.confidence_bn2 = MaskedIrrepsBatchNorm(f"{ns}x0e")
            self.confidence_dropout_layer = nn.Dropout(cfg.confidence_dropout)
        else:
            self.center_distance_expansion = GaussianSmearing(0.0, cfg.center_max_distance, cfg.distance_embed_dim)
            self.center_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
            self.final_conv = TPConvLayer(
                in_irreps=final_irreps,
                sh_irreps=self.sh_irreps,
                out_irreps="2x1o + 2x1e",
                n_edge_features=2 * ns,
                residual=False,
                batch_norm=cfg.batch_norm,
                dropout=cfg.dropout,
                remat=cfg.remat,
                name="final_conv",
            )
            self.tr_final_dense1 = nn.Dense(ns)
            self.tr_final_dense2 = nn.Dense(1)
            self.rot_final_dense1 = nn.Dense(ns)
            self.rot_final_dense2 = nn.Dense(1)
            if not cfg.no_torsion:
                self.final_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
                self.final_tp_tor = FullTensorProduct(self.sh_irreps, "1x2e")
                self.tor_bond_conv = TPConvLayer(
                    in_irreps=final_irreps,
                    sh_irreps=str(self.final_tp_tor.irreps_out),
                    out_irreps=f"{cfg.ns}x0o + {cfg.ns}x0e",
                    n_edge_features=3 * ns,
                    residual=False,
                    batch_norm=cfg.batch_norm,
                    dropout=cfg.dropout,
                    remat=cfg.remat,
                    name="tor_bond_conv",
                )
                self.tor_final_dense1 = nn.Dense(ns, use_bias=False)
                self.tor_final_dense2 = nn.Dense(1, use_bias=False)
        self.dropout_layer = nn.Dropout(cfg.dropout)

    # ------------------------------------------------------------------ embed
    def embed(
        self,
        batch: ComplexBatch,
        latent=None,
        unconditional: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        use_running_average: bool = False,
        lig_pos: Optional[jnp.ndarray] = None,
        shared_rec: bool = False,
    ):
        """Run graph building + conv trunk.

        Returns (lig_attr, rec_attr, (tr_sigma, rot_sigma, tor_sigma)).
        ``latent``: None or (lat_l (B,NL,Ld), lat_r (B,NR,Ld)) for vocab=1, or
        (B, Ld*vocab) graph-level latents for vocab>1.
        ``unconditional``: (B, 1) float flags for CFG (latent droprate).

        ``shared_rec``: the caller guarantees every graph in the batch is a
        pose copy of ONE complex with a shared diffusion time (the sampler's
        pose-batch protocol, utils/sampling.py:55-56).  Receptor-side arrays
        then compute at B=1 -- one-hot gather operands read once instead of
        replicated per pose, and layer-0 receptor-receptor messages compute
        once -- with pose-dependent data broadcasting in where it joins.
        Inference-only (use with use_running_average=True: train-mode BN
        stats would weight the shared receptor rows once instead of B
        times).
        """
        cfg = self.cfg
        ns = cfg.ns
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        pos_l = batch.lig_pos if lig_pos is None else lig_pos

        t_tr, t_rot, t_tor = (batch.complex_t[k] for k in ("tr", "rot", "tor"))
        if cfg.confidence_mode:
            sigmas = (t_tr, t_rot, t_tor)
        else:
            sigmas = self.sigma.t_to_sigma(t_tr, t_rot, t_tor)
        tr_sigma = sigmas[0]

        sig_emb = self.timestep_emb(t_tr)  # (B, emb)
        node_sig_l = jnp.broadcast_to(sig_emb[:, None, :], (B, NL, sig_emb.shape[-1]))
        node_sig_r = jnp.broadcast_to(sig_emb[:, None, :], (B, NR, sig_emb.shape[-1]))

        if latent is not None and cfg.latent_vocab == 1:
            lat_l, lat_r = latent
        elif latent is not None:
            g = latent.reshape(B, -1)
            lat_l = jnp.broadcast_to(g[:, None, :], (B, NL, g.shape[-1]))
            lat_r = jnp.broadcast_to(g[:, None, :], (B, NR, g.shape[-1]))
        else:
            lat_l = lat_r = None

        # ---- ligand graph: bond edges + on-device radius edges
        redges = radius_edges(
            pos_l, batch.lig_mask, pos_l, batch.lig_mask,
            cfg.lig_max_radius, self.caps.lig_radius_cap, exclude_self=True,
        )
        self.sow("intermediates", "overflow_lig_radius", redges.overflow)
        lig_edges = _concat_edges(batch.lig_bonds, redges)
        cdt = self.compute_dtype
        lig_oh = build_onehots(lig_edges, NL, NL, cdt)
        EB = batch.lig_bonds.capacity
        bond_feat = jnp.concatenate(
            [batch.lig_bond_attr, jnp.zeros((B, redges.capacity, cfg.in_lig_edge_features))], 1
        )
        vec_l = gather_pos(lig_oh[1], pos_l) - gather_pos(lig_oh[0], pos_l)
        dist_l = jnp.linalg.norm(vec_l + 1e-12, axis=-1)
        lig_eattr = [bond_feat,
                     jnp.broadcast_to(sig_emb[:, None, :], (B, lig_edges.capacity, sig_emb.shape[-1])),
                     self.lig_distance_expansion(dist_l)]
        if lat_l is not None:
            if cfg.latent_vocab == 1:
                lig_eattr.append(_edge_latent(lat_l, lat_l, lig_edges))
            else:
                lig_eattr.append(gather_nodes(lat_l, lig_edges.src))
        lig_eattr = jnp.concatenate(lig_eattr, -1)
        lig_sh = spherical_harmonics(vec_l, cfg.sh_lmax)

        lig_node_in = [batch.lig_x.astype(jnp.float32), node_sig_l]
        if lat_l is not None:
            lig_node_in.append(lat_l)
        lig_attr = self.lig_node_embedding(jnp.concatenate(lig_node_in, -1))
        lig_eattr = self.lig_edge_embedding(lig_eattr, deterministic=deterministic)

        # ---- receptor graph (precomputed kNN; protein rigid).  shared_rec:
        # every receptor array computes at B=1 and broadcasts downstream.
        BR = 1 if shared_rec else B
        r1 = slice(0, 1) if shared_rec else slice(None)
        rec_edges = ListEdges(
            src=batch.rec_edges.src[r1], dst=batch.rec_edges.dst[r1],
            mask=batch.rec_edges.mask[r1], overflow=batch.rec_edges.overflow,
        ) if shared_rec else batch.rec_edges
        rec_oh = build_onehots(rec_edges, NR, NR, cdt)
        vec_r = (gather_pos(rec_oh[1], batch.rec_pos[r1])
                 - gather_pos(rec_oh[0], batch.rec_pos[r1]))
        dist_r = jnp.linalg.norm(vec_r + 1e-12, axis=-1)
        rec_eattr = [jnp.broadcast_to(sig_emb[r1, None, :],
                                      (BR, rec_edges.capacity, sig_emb.shape[-1])),
                     self.rec_distance_expansion(dist_r)]
        if lat_r is not None:
            if cfg.latent_vocab == 1:
                rec_eattr.append(_edge_latent(lat_r, lat_r, rec_edges))
            else:
                rec_eattr.append(gather_nodes(lat_r, rec_edges.src))
        rec_eattr = _bcat(rec_eattr)
        rec_sh = spherical_harmonics(vec_r, cfg.sh_lmax)

        rec_node_in = [batch.rec_x[r1].astype(jnp.float32), node_sig_r[r1]]
        if lat_r is not None:
            rec_node_in.append(lat_r)
        rec_attr = self.rec_node_embedding(_bcat(rec_node_in))
        rec_eattr = self.rec_edge_embedding(rec_eattr, deterministic=deterministic)

        # ---- cross graph with per-graph dynamic cutoff
        if cfg.dynamic_max_cross:
            cross_cutoff = tr_sigma * 3 + 20
        else:
            cross_cutoff = cfg.cross_max_distance
        cross_edges = radius_edges(
            pos_l, batch.lig_mask, batch.rec_pos, batch.rec_mask,
            cross_cutoff, self.caps.cross_cap,
        )
        self.sow("intermediates", "overflow_cross", cross_edges.overflow)
        cross_oh = build_onehots(cross_edges, NL, NR, cdt)
        crossT_oh = build_onehots(cross_edges.flip(), NR, NL, cdt)
        vec_x = gather_pos(cross_oh[1], batch.rec_pos) - gather_pos(crossT_oh[1], pos_l)
        dist_x = jnp.linalg.norm(vec_x + 1e-12, axis=-1)
        cross_eattr = [jnp.broadcast_to(sig_emb[:, None, :], (B, cross_edges.capacity, sig_emb.shape[-1])),
                       self.cross_distance_expansion(dist_x)]
        if lat_l is not None:
            # reference zeroes cross-edge latent features (score_model.py:401)
            d = cfg.latent_dim * max(cfg.latent_vocab, 2)
            cross_eattr.append(jnp.zeros((B, cross_edges.capacity, d)))
        cross_eattr = jnp.concatenate(cross_eattr, -1)
        cross_sh = spherical_harmonics(vec_x, cfg.sh_lmax)
        cross_eattr = self.cross_edge_embedding(cross_eattr, deterministic=deterministic)

        # ---- classifier-free-guidance unconditional embeddings
        if cfg.latent_droprate > 0 and unconditional is not None:
            u = unconditional.reshape(B, 1, 1)
            # shared_rec guarantees pose-shared flags: keep rec terms at B=1
            ur = u[r1]
            lig_attr = lig_attr + u * self.lig_node_uncond
            rec_attr = rec_attr + ur * self.rec_node_uncond
            lig_eattr = lig_eattr + u * self.lig_edge_uncond
            rec_eattr = rec_eattr + ur * self.rec_edge_uncond
            cross_eattr = cross_eattr + u * self.cross_edge_uncond

        # ---- per-layer latent cross-attention embeddings (vocab > 1 only)
        latent_embedding = None
        if cfg.latent_cross_attention and latent is not None and cfg.latent_vocab > 1:
            lat3 = latent.reshape(B, cfg.latent_dim, cfg.latent_vocab)
            latent_embedding = jnp.stack(
                [self.latent_embedding_layers[i](lat3[:, i], deterministic=deterministic)
                 for i in range(cfg.latent_dim)], axis=1,
            )  # (B, latent_dim, tot_scalar_size)

        # ---- conv trunk (one-hots built once; edges fixed within a forward.
        # cache_onehots=False passes None so each layer rebuilds them at the
        # point of use -- the A/B probe for XLA fusing the iota-compare into
        # the dot operand instead of re-reading the materialized one-hot)
        _c = (lambda oh: oh) if cfg.cache_onehots else (lambda oh: None)
        attrs = {"lig": lig_attr, "rec": rec_attr}
        # BN-stat masks AND the graph mask: remainder batches pad the BATCH
        # axis by repeating real complexes (data/collate.py pad_graphs_to),
        # and without the graph mask those repeats would double-count in the
        # batch-norm statistics of small buckets (ADVICE r4)
        gm = batch.graph_mask[:, None]
        masks = {"lig": batch.lig_mask & gm, "rec": batch.rec_mask[r1] & gm[r1]}
        for li, layer in enumerate(self.conv_layers):
            blocks = [
                ConvBlock(lig_edges, "lig", "lig", lig_eattr, lig_sh, 0, onehots=_c(lig_oh)),
                ConvBlock(cross_edges, "lig", "rec", cross_eattr, cross_sh, 1, onehots=_c(cross_oh)),
                ConvBlock(rec_edges, "rec", "rec", rec_eattr, rec_sh, 2, onehots=_c(rec_oh)),
                ConvBlock(cross_edges.flip(), "rec", "lig", cross_eattr, cross_sh, 3, onehots=_c(crossT_oh)),
            ]
            attrs = layer(
                attrs, masks, blocks,
                deterministic=deterministic, use_running_average=use_running_average,
            )

            if latent_embedding is not None:
                attrs = self._latent_attention(
                    attrs, latent_embedding, li, deterministic
                )

        return attrs["lig"], attrs["rec"], sigmas

    def _latent_attention(self, attrs, latent_embedding, li, deterministic):
        """Latent<->node scalar mixing after conv layer li
        (score_model.py:232-254): either the simple bilinear attention
        (bmm with the latent embeddings) or multi-head cross attention, then
        a residual MLP, zero-padded back onto the irreps layout."""
        cfg = self.cfg
        ns = cfg.ns
        cur_len = ns if li < 2 else 2 * ns
        cur_idx = li * ns + max(0, li - 2) * ns
        lat = latent_embedding[:, :, cur_idx : cur_idx + cur_len]  # (B, dim, d)
        new_attrs = {}
        for t, x in attrs.items():
            if li < 2:
                scal = x[..., :ns]
            else:
                scal = jnp.concatenate([x[..., :ns], x[..., -ns:]], -1)
            if cfg.new_cross_attention:
                res = self.cross_attention_layers[li](
                    scal, lat, deterministic=deterministic
                ) + scal
                res = self.latent_residual_layers[li](res, deterministic=deterministic) + res
                res = res - scal  # it is added back below
            else:
                att = jnp.einsum("bnd,bkd->bnk", scal, lat)
                res = jnp.einsum("bnk,bkd->bnd", att, lat)
                res = self.latent_residual_layers[li](res, deterministic=deterministic)
            D = x.shape[-1]
            if li < 2:
                res_full = jnp.pad(res, [(0, 0), (0, 0), (0, D - res.shape[-1])])
            else:
                res_full = jnp.concatenate(
                    [jnp.pad(res[..., :ns], [(0, 0), (0, 0), (0, D - 2 * ns)]), res[..., ns:]], -1
                )
            new_attrs[t] = x + res_full
        return new_attrs

    def scalar_features(self, attr: jnp.ndarray) -> jnp.ndarray:
        """[0e scalars ; 0o pseudoscalars] when depth >= 3 (score_model.py:264)."""
        ns = self.cfg.ns
        if self.cfg.num_conv_layers >= 3:
            return jnp.concatenate([attr[..., :ns], attr[..., -ns:]], -1)
        return attr[..., :ns]

    # ---------------------------------------------------------------- forward
    def __call__(
        self,
        batch: ComplexBatch,
        latent=None,
        unconditional=None,
        deterministic: bool = True,
        use_running_average: bool = False,
        shared_rec: bool = False,
    ):
        cfg = self.cfg
        ns = cfg.ns
        B, NL = batch.lig_x.shape[:2]
        lig_attr, rec_attr, (tr_sigma, rot_sigma, tor_sigma) = self.embed(
            batch, latent, unconditional, deterministic, use_running_average,
            shared_rec=shared_rec,
        )

        if cfg.confidence_mode:
            pooled = masked_mean_pool(self.scalar_features(lig_attr), batch.lig_mask)
            x = self.confidence_mlp1(pooled)
            if not cfg.confidence_no_batchnorm:
                x = self.confidence_bn1(
                    x[:, None, :], batch.graph_mask[:, None],
                    use_running_average=use_running_average,
                )[:, 0]
            x = nn.relu(x)
            x = self.confidence_dropout_layer(x, deterministic=deterministic)
            x = self.confidence_mlp2(x)
            if not cfg.confidence_no_batchnorm:
                x = self.confidence_bn2(
                    x[:, None, :], batch.graph_mask[:, None],
                    use_running_average=use_running_average,
                )[:, 0]
            x = nn.relu(x)
            x = self.confidence_dropout_layer(x, deterministic=deterministic)
            conf = self.confidence_out(x)
            return jnp.squeeze(conf, -1) if cfg.num_confidence_outputs == 1 else conf

        # ---- center conv: tr/rot scores from a per-graph centroid node
        w = batch.lig_mask.astype(jnp.float32)[..., None]
        center = jnp.sum(batch.lig_pos * w, 1, keepdims=True) / (jnp.sum(w, 1, keepdims=True) + 1e-12)
        vec_c = batch.lig_pos - center  # (B, NL, 3) supplier - receiver(center)
        dist_c = jnp.linalg.norm(vec_c + 1e-12, axis=-1)
        sig_emb = self.timestep_emb(batch.complex_t["tr"])  # graph_sigma_emb
        center_eattr = jnp.concatenate(
            [self.center_distance_expansion(dist_c),
             jnp.broadcast_to(sig_emb[:, None, :], (B, NL, sig_emb.shape[-1]))], -1)
        center_eattr = self.center_edge_embedding(center_eattr, deterministic=deterministic)
        center_eattr = jnp.concatenate([center_eattr, lig_attr[..., :ns]], -1)
        center_sh = spherical_harmonics(vec_c, cfg.sh_lmax)
        idx = jnp.broadcast_to(jnp.arange(NL, dtype=jnp.int32)[None], (B, NL))
        center_edges = ListEdges(
            src=jnp.zeros((B, NL), jnp.int32), dst=idx, mask=batch.lig_mask
        )
        blocks = [ConvBlock(center_edges, "center", "lig", center_eattr, center_sh, append_scalars=False)]
        global_pred = self.final_conv(
            {"lig": lig_attr}, {"center": batch.graph_mask[:, None]}, blocks,
            out_types=["center"], out_counts={"center": 1},
            deterministic=deterministic, use_running_average=use_running_average,
        )["center"][:, 0]  # (B, 12)

        tr_pred = irrep_to_vec(global_pred[:, :3] + global_pred[:, 6:9])
        rot_pred = irrep_to_vec(global_pred[:, 3:6] + global_pred[:, 9:12])

        tr_norm = jnp.linalg.norm(tr_pred, axis=-1, keepdims=True) + 1e-12
        h = self.tr_final_dense1(jnp.concatenate([tr_norm, sig_emb], -1))
        h = self.dropout_layer(h, deterministic=deterministic)
        tr_scale = self.tr_final_dense2(nn.relu(h))
        tr_pred = tr_pred / tr_norm * tr_scale
        rot_norm = jnp.linalg.norm(rot_pred, axis=-1, keepdims=True) + 1e-12
        h = self.rot_final_dense1(jnp.concatenate([rot_norm, sig_emb], -1))
        h = self.dropout_layer(h, deterministic=deterministic)
        rot_scale = self.rot_final_dense2(nn.relu(h))
        rot_pred = rot_pred / rot_norm * rot_scale

        if cfg.scale_by_sigma:
            tr_pred = tr_pred / tr_sigma[:, None]
            rot_pred = rot_pred * so3.score_norm(rot_sigma)[:, None]

        if cfg.no_torsion:
            return tr_pred, rot_pred, jnp.zeros((B, batch.tor_edges.shape[1]))

        # ---- torsion head: pseudotorque conv around rotatable-bond midpoints
        R = batch.tor_edges.shape[1]
        u_idx, v_idx = batch.tor_edges[..., 0], batch.tor_edges[..., 1]
        pos_u = gather_nodes(batch.lig_pos, u_idx)
        pos_v = gather_nodes(batch.lig_pos, v_idx)
        bond_pos = (pos_u + pos_v) / 2
        tor_edges = radius_edges(
            bond_pos, batch.tor_mask, batch.lig_pos, batch.lig_mask,
            cfg.lig_max_radius, self.caps.tor_edge_cap,
        )
        self.sow("intermediates", "overflow_tor_edges", tor_edges.overflow)
        vec_t = gather_nodes(batch.lig_pos, tor_edges.dst) - gather_nodes(bond_pos, tor_edges.src)
        dist_t = jnp.linalg.norm(vec_t + 1e-12, axis=-1)
        t_eattr = self.final_edge_embedding(
            self.lig_distance_expansion(dist_t), deterministic=deterministic
        )
        bond_attr = gather_nodes(lig_attr, u_idx) + gather_nodes(lig_attr, v_idx)
        t_eattr = jnp.concatenate(
            [t_eattr,
             gather_nodes(lig_attr[..., :ns], tor_edges.dst),
             gather_nodes(bond_attr[..., :ns], tor_edges.src)], -1)

        bond_vec = pos_v - pos_u
        bond_sh2 = spherical_harmonics(bond_vec, 2)[..., 4:9]  # the 2e block
        edge_sh = spherical_harmonics(vec_t, cfg.sh_lmax)
        tor_sh = self.final_tp_tor(edge_sh, gather_nodes(bond_sh2, tor_edges.src))

        blocks = [ConvBlock(tor_edges, "bond", "lig", t_eattr, tor_sh, append_scalars=False)]
        # graph mask in the BN-stat mask: see the embed() trunk masks comment
        gm = batch.graph_mask[:, None]
        tor_feat = self.tor_bond_conv(
            {"lig": lig_attr}, {"bond": batch.tor_mask & gm}, blocks,
            out_types=["bond"], out_counts={"bond": R},
            deterministic=deterministic, use_running_average=use_running_average,
        )["bond"]  # (B, R, 2ns)
        h = self.tor_final_dense1(tor_feat)
        h = jnp.tanh(h)
        h = self.dropout_layer(h, deterministic=deterministic)
        tor_pred = self.tor_final_dense2(h)[..., 0]  # (B, R)

        if cfg.scale_by_sigma:
            tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
        tor_pred = tor_pred * batch.tor_mask

        return tr_pred, rot_pred, tor_pred
