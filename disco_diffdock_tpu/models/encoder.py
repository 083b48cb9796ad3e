"""Discrete-latent encoder (TPEncoder): the DisCo-Diff latent inference model.

TPU-native redesign of models/latent_encoder.py:16-447.  The same tensor
-product trunk as the score model, but time-free (sigma_embed_dim=0), reading
the ligand's *oracle* (crystal) pose at train time (:189-192), with output
heads producing discrete latents:

  * ``latent_vocab == 1`` (shipped config): per-node scalars for every latent
    slot -> softmax over the union of ligand+receptor nodes of each graph ->
    straight-through Gumbel one-hot "anchor node" indicators (:320-343)
  * ``latent_vocab > 1``: mean-pooled scalars -> MLP -> (B, latent_dim,
    vocab) Gumbel softmax (:312-319)

The padded-batch formulation does the per-graph softmax over a masked
concatenated node axis -- no per-graph Python loops (the reference loops over
graphs, :328-339).  AR-decoder conditioning (``input_latent`` +
``decoding_idx`` one-hots, :172-186) is supported for the standalone-encoder
AR variant.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EncoderConfig, GraphCaps
from ..data.features import LIG_FEATURE_DIMS, REC_RESIDUE_FEATURE_DIMS
from ..graphs.containers import ComplexBatch
from ..graphs.radius import radius_edges
from ..nn.basic import AtomEncoder, FCBlock, gumbel_softmax
from ..nn.batchnorm import MaskedIrrepsBatchNorm
from ..nn.conv import ConvBlock, TPConvLayer, gather_nodes
from ..nn.irreps import spherical_harmonics_irreps
from ..nn.sh import spherical_harmonics
from ..nn.transformer import DenseTransformerAttention
from ..nn.tensor_product import get_irrep_seq
from .score_model import GaussianSmearing, _concat_edges, _edge_latent


class LatentPredictorMLP(nn.Module):
    """Linear-BN-ReLU-Dropout x2 + Linear head (latent_encoder.py:148-169)."""

    hidden: int
    out: int
    no_batchnorm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic=True, use_running_average=False):
        for i in range(2):
            x = nn.Dense(self.hidden)(x)
            if not self.no_batchnorm:
                x = MaskedIrrepsBatchNorm(f"{self.hidden}x0e")(
                    x, mask, use_running_average=use_running_average
                )
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out)(x)


class VirtualNodeBlock(nn.Module):
    """One latent virtual-node message-passing step (latent_encoder.py:
    105-132,271-295): virtual nodes attend over all real nodes + each other,
    real-node scalars attend over the virtual nodes; TransformerConv
    semantics with separable edge features (see nn/transformer.py)."""

    d_node_in: int  # real-node scalar width at this depth
    d_out: int  # transformer output width
    ns: int

    @nn.compact
    def __call__(self, node_scal, node_mask, type_attr, latent_attr, latent_edge):
        """node_scal (B,N,d_in), node_mask (B,N), type_attr (B,N,ns) learned
        per-node-type edge part, latent_attr (B,dim,d_in-ish), latent_edge
        (B,dim,ns).  Returns (new_node_scal (B,N,d_out), new_latent)."""
        d = self.d_out
        B, N = node_scal.shape[:2]
        dim = latent_attr.shape[1]
        # source-side edge projections (key & value); target-side key parts
        # are softmax-invariant, target-side value parts add a constant
        ek_real = nn.Dense(d, name="ek_real")(type_attr)
        ev_real = nn.Dense(d, name="ev_real")(type_attr)
        ek_lat = nn.Dense(d, name="ek_lat")(latent_edge)
        ev_lat = nn.Dense(d, name="ev_lat")(latent_edge)
        evq_lat = nn.Dense(d, name="evq_lat")(latent_edge)  # dst-part for latent queries
        evq_real = nn.Dense(d, name="evq_real")(type_attr)  # dst-part for real queries

        # ---- virtual-node update: keys = [real nodes ; other virtuals]
        attn_v = DenseTransformerAttention(d, name="attn_virtual")
        kv = jnp.concatenate([node_scal, jnp.pad(latent_attr, [(0, 0), (0, 0), (0, max(0, node_scal.shape[-1] - latent_attr.shape[-1]))])[..., : node_scal.shape[-1]]], 1)
        e_key = jnp.concatenate([ek_real, ek_lat], 1)
        e_val = jnp.concatenate([ev_real, ev_lat], 1)
        self_mask = ~jnp.eye(dim, dtype=bool)[None]
        mask_v = jnp.concatenate(
            [jnp.broadcast_to(node_mask[:, None, :], (B, dim, N)),
             jnp.broadcast_to(self_mask, (B, dim, dim))], -1)
        new_latent = attn_v(latent_attr, kv, mask_v, e_key, e_val) + evq_lat

        # ---- real-node update: keys = the dim virtual nodes
        attn_r = DenseTransformerAttention(d, name="attn_real")
        mask_r = jnp.broadcast_to(node_mask[:, :, None], (B, N, dim))
        new_scal = attn_r(node_scal, latent_attr, mask_r, ek_lat, ev_lat) + evq_real
        return new_scal, new_latent


class TPEncoder(nn.Module):
    cfg: EncoderConfig
    caps: GraphCaps

    def setup(self):
        cfg = self.cfg
        ns, nv = cfg.ns, cfg.nv
        self.sh_irreps = str(spherical_harmonics_irreps(cfg.sh_lmax))
        self.irrep_seq = get_irrep_seq(ns, nv, cfg.use_second_order_repr)
        # input-latent conditioning dims (AR decoder mode)
        ild = cfg.input_latent_dim
        lat_node = ild * (cfg.latent_vocab + 1)
        self.lig_node_embedding = AtomEncoder(ns, LIG_FEATURE_DIMS, lat_node)
        self.rec_node_embedding = AtomEncoder(
            ns, REC_RESIDUE_FEATURE_DIMS, cfg.esm_embedding_dim + lat_node
        )
        self.lig_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
        self.rec_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
        self.cross_edge_embedding = FCBlock(ns, ns, 2, cfg.dropout)
        self.lig_distance_expansion = GaussianSmearing(0.0, cfg.lig_max_radius, cfg.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, cfg.rec_max_radius, cfg.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim)

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
                remat=cfg.remat,
                name=f"conv{i}",
            )
            for i in range(cfg.num_conv_layers)
        ]

        scalar_dim = 2 * ns if cfg.num_conv_layers >= 3 else ns
        if cfg.latent_virtual_nodes:
            dim = max(cfg.latent_dim, cfg.input_latent_dim)
            init = nn.initializers.xavier_uniform()
            self.initial_virtual_node_attr = self.param("initial_virtual_node_attr", init, (dim, ns))
            self.virtual_edge_attr = self.param("virtual_edge_attr", init, (dim, ns))
            self.complex_edge_attr = self.param("complex_edge_attr", init, (2, ns))
            if cfg.input_latent_dim > 0:
                self.latent_node_embedding_fc = FCBlock(ns, ns, 2, cfg.dropout)
                self.latent_edge_embedding_fc = FCBlock(ns, ns, 2, cfg.dropout)
                self.active_virtual_node_attr = self.param("active_virtual_node_attr", init, (dim, ns))
                self.active_edge_attr = self.param("active_edge_attr", init, (dim, ns))
            self.virtual_blocks = [
                VirtualNodeBlock(
                    d_node_in=ns if i < 2 else 2 * ns,
                    d_out=ns if i < 1 else 2 * ns,
                    ns=ns, name=f"virtual{i}",
                )
                for i in range(cfg.num_conv_layers)
            ]
            if cfg.latent_nodes_residual:
                self.residual_node_layers = [
                    FCBlock(2 * ns, ns if i < 2 else 2 * ns, 2, cfg.dropout, name=f"resnode{i}")
                    for i in range(cfg.num_conv_layers)
                ]
                self.residual_latent_layers = [
                    FCBlock(2 * ns, ns if i < 1 else 2 * ns, 2, cfg.dropout, name=f"reslat{i}")
                    for i in range(cfg.num_conv_layers)
                ]
            self.virtual_node_predictors = [
                FCBlock(cfg.latent_hidden_dim, cfg.latent_vocab, 3, cfg.latent_dropout, name=f"vpred{i}")
                for i in range(dim)
            ]
        if cfg.latent_vocab > 1:
            self.latent_predictor = LatentPredictorMLP(
                cfg.latent_hidden_dim, cfg.latent_dim * cfg.latent_vocab,
                cfg.latent_no_batchnorm, cfg.latent_dropout,
            )
        else:
            self.latent_s_predictor = LatentPredictorMLP(
                cfg.latent_hidden_dim, cfg.latent_dim,
                cfg.latent_no_batchnorm, cfg.latent_dropout,
            )
            self.latent_r_predictor = LatentPredictorMLP(
                cfg.latent_hidden_dim, cfg.latent_dim,
                cfg.latent_no_batchnorm, cfg.latent_dropout,
            )

    def __call__(
        self,
        batch: ComplexBatch,
        latent_temperature: float = 1.0,
        apply_gumbel: Optional[bool] = None,
        input_latent=None,
        decoding_idx: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        use_running_average: bool = False,
    ):
        """Encode; returns (lat_l, lat_r) one-hots, or per-node logits
        (B, latent_dim, NL+NR) with the node mask when ``apply_gumbel`` is
        False (the AR-training mode), or (B, latent_dim, vocab) for vocab>1.
        """
        cfg = self.cfg
        ns = cfg.ns
        if apply_gumbel is None:
            apply_gumbel = cfg.apply_gumbel_softmax
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]

        # oracle pose at train time; diffusing pose in AR-decoder mode
        if cfg.use_oracle:
            pos_l = batch.extras["orig_pos"]
        else:
            pos_l = batch.lig_pos

        virtual_latent_in = None
        if cfg.latent_virtual_nodes and input_latent is not None:
            # virtual-node mode: input latents condition the virtual nodes
            # only, not the node/edge features (latent_factor=0,
            # latent_encoder.py:48,194-196)
            virtual_latent_in = input_latent
            dec_onehot_v = jax.nn.one_hot(decoding_idx, cfg.input_latent_dim)
            input_latent = None
        vocab_flat = False
        if input_latent is not None:
            if cfg.latent_vocab > 1:
                # vocab>1: (B, latent_dim, vocab) codes, flattened and
                # broadcast per node; edge conditioning is the src-node
                # latent only (latent_encoder.py:174-178,361-364,392-394)
                flat = jnp.reshape(input_latent, (B, -1))
                lat_l_in = jnp.broadcast_to(flat[:, None, :], (B, NL, flat.shape[-1]))
                lat_r_in = jnp.broadcast_to(flat[:, None, :], (B, NR, flat.shape[-1]))
                vocab_flat = True
            else:
                lat_l_in, lat_r_in = input_latent
            dec_onehot = jax.nn.one_hot(decoding_idx, cfg.input_latent_dim)  # (B, ild)
        else:
            lat_l_in = lat_r_in = dec_onehot = None

        # ---- ligand graph
        redges = radius_edges(
            pos_l, batch.lig_mask, pos_l, batch.lig_mask,
            cfg.lig_max_radius, self.caps.lig_radius_cap, exclude_self=True,
        )
        self.sow("intermediates", "overflow_lig_radius", redges.overflow)
        lig_edges = _concat_edges(batch.lig_bonds, redges)
        bond_feat = jnp.concatenate(
            [batch.lig_bond_attr, jnp.zeros((B, redges.capacity, cfg.in_lig_edge_features))], 1
        )
        vec_l = gather_nodes(pos_l, lig_edges.dst) - gather_nodes(pos_l, lig_edges.src)
        dist_l = jnp.linalg.norm(vec_l + 1e-12, axis=-1)
        lig_eattr = [bond_feat, self.lig_distance_expansion(dist_l)]
        lig_node_in = [batch.lig_x.astype(jnp.float32)]
        if lat_l_in is not None:
            dec_l = jnp.broadcast_to(dec_onehot[:, None, :], (B, NL, cfg.input_latent_dim))
            lig_eattr.append(gather_nodes(lat_l_in, lig_edges.src) if vocab_flat
                             else _edge_latent(lat_l_in, lat_l_in, lig_edges))
            lig_eattr.append(gather_nodes(dec_l, lig_edges.src))
            lig_node_in += [lat_l_in, dec_l]
        lig_attr = self.lig_node_embedding(jnp.concatenate(lig_node_in, -1))
        lig_eattr = self.lig_edge_embedding(jnp.concatenate(lig_eattr, -1), deterministic=deterministic)
        lig_sh = spherical_harmonics(vec_l, cfg.sh_lmax)

        # ---- receptor graph
        rec_edges = batch.rec_edges
        vec_r = gather_nodes(batch.rec_pos, rec_edges.dst) - gather_nodes(batch.rec_pos, rec_edges.src)
        dist_r = jnp.linalg.norm(vec_r + 1e-12, axis=-1)
        rec_eattr = [self.rec_distance_expansion(dist_r)]
        rec_node_in = [batch.rec_x.astype(jnp.float32)]
        if lat_r_in is not None:
            dec_r = jnp.broadcast_to(dec_onehot[:, None, :], (B, NR, cfg.input_latent_dim))
            rec_eattr.append(gather_nodes(lat_r_in, rec_edges.src) if vocab_flat
                             else _edge_latent(lat_r_in, lat_r_in, rec_edges))
            rec_eattr.append(gather_nodes(dec_r, rec_edges.src))
            rec_node_in += [lat_r_in, dec_r]
        rec_attr = self.rec_node_embedding(jnp.concatenate(rec_node_in, -1))
        rec_eattr = self.rec_edge_embedding(jnp.concatenate(rec_eattr, -1), deterministic=deterministic)
        rec_sh = spherical_harmonics(vec_r, cfg.sh_lmax)

        # ---- cross graph (fixed cutoff, encoder_cross_max_distance=30)
        cross_edges = radius_edges(
            pos_l, batch.lig_mask, batch.rec_pos, batch.rec_mask,
            cfg.cross_max_distance, self.caps.cross_cap,
        )
        self.sow("intermediates", "overflow_cross", cross_edges.overflow)
        vec_x = gather_nodes(batch.rec_pos, cross_edges.dst) - gather_nodes(pos_l, cross_edges.src)
        dist_x = jnp.linalg.norm(vec_x + 1e-12, axis=-1)
        cross_eattr = [self.cross_distance_expansion(dist_x)]
        if lat_l_in is not None:
            cross_eattr.append(gather_nodes(lat_l_in, cross_edges.src) if vocab_flat
                               else _edge_latent(lat_l_in, lat_r_in, cross_edges))
            cross_eattr.append(gather_nodes(dec_l, cross_edges.src))
        cross_eattr = self.cross_edge_embedding(jnp.concatenate(cross_eattr, -1), deterministic=deterministic)
        cross_sh = spherical_harmonics(vec_x, cfg.sh_lmax)

        # ---- latent virtual-node state (latent_encoder.py:223-245)
        latent_attr = latent_edge = None
        if cfg.latent_virtual_nodes:
            dim = max(cfg.latent_dim, cfg.input_latent_dim)
            latent_attr = jnp.broadcast_to(self.initial_virtual_node_attr[None], (B, dim, ns))
            latent_edge = jnp.broadcast_to(self.virtual_edge_attr[None], (B, dim, ns))
            if virtual_latent_in is not None:
                cond = jnp.concatenate(
                    [virtual_latent_in,
                     jnp.broadcast_to(dec_onehot_v[:, None, :], (B, dim, cfg.input_latent_dim))], -1)
                latent_attr = latent_attr + self.latent_node_embedding_fc(cond, deterministic=deterministic)
                latent_edge = latent_edge + self.latent_edge_embedding_fc(cond, deterministic=deterministic)
                active = jax.nn.one_hot(decoding_idx, dim)[..., None]  # (B, dim, 1)
                latent_attr = latent_attr + active * self.active_virtual_node_attr[None]
                latent_edge = latent_edge + active * self.active_edge_attr[None]
            type_attr = jnp.concatenate(
                [jnp.broadcast_to(self.complex_edge_attr[0][None, None], (B, NL, ns)),
                 jnp.broadcast_to(self.complex_edge_attr[1][None, None], (B, NR, ns))], 1)
            node_mask_all = jnp.concatenate([batch.lig_mask, batch.rec_mask], 1)

        # ---- conv trunk (same 4-group structure as the score model)
        attrs = {"lig": lig_attr, "rec": rec_attr}
        # AND the graph mask so batch-axis padding repeats (data/collate.py
        # pad_graphs_to) don't double-count in BN statistics (ADVICE r4)
        gm = batch.graph_mask[:, None]
        masks = {"lig": batch.lig_mask & gm, "rec": batch.rec_mask & gm}
        for li, layer in enumerate(self.conv_layers):
            blocks = [
                ConvBlock(lig_edges, "lig", "lig", lig_eattr, lig_sh, 0),
                ConvBlock(cross_edges, "lig", "rec", cross_eattr, cross_sh, 1),
                ConvBlock(rec_edges, "rec", "rec", rec_eattr, rec_sh, 2),
                ConvBlock(cross_edges.flip(), "rec", "lig", cross_eattr, cross_sh, 3),
            ]
            attrs = layer(attrs, masks, blocks, deterministic=deterministic,
                          use_running_average=use_running_average)

            if cfg.latent_virtual_nodes:
                def scal_of(a):
                    if li >= 2:
                        return jnp.concatenate([a[..., :ns], a[..., -ns:]], -1)
                    return a[..., :ns]

                node_scal = jnp.concatenate([scal_of(attrs["lig"]), scal_of(attrs["rec"])], 1)
                new_scal, new_latent = self.virtual_blocks[li](
                    node_scal, node_mask_all, type_attr, latent_attr, latent_edge
                )
                if cfg.latent_nodes_residual:
                    res_n = self.residual_node_layers[li](new_scal, deterministic=deterministic)
                    res_l = self.residual_latent_layers[li](new_latent, deterministic=deterministic)
                    upd_l = res_n[:, :NL]
                    upd_r = res_n[:, NL:]
                    add = True
                    if latent_attr.shape[-1] < res_l.shape[-1]:
                        latent_attr = jnp.pad(latent_attr, [(0, 0), (0, 0), (0, res_l.shape[-1] - latent_attr.shape[-1])])
                    latent_attr = latent_attr + res_l
                else:
                    upd_l, upd_r = new_scal[:, :NL], new_scal[:, NL:]
                    add = False
                    latent_attr = new_latent

                def write_back(a, upd, addmode):
                    first = a[..., :ns] + upd[..., :ns] if addmode else upd[..., :ns]
                    a = jnp.concatenate([first, a[..., ns:]], -1)
                    if li >= 2:
                        last = a[..., -ns:] + upd[..., -ns:] if addmode else upd[..., -ns:]
                        a = jnp.concatenate([a[..., :-ns], last], -1)
                    return a

                attrs = dict(attrs)
                attrs["lig"] = write_back(attrs["lig"], upd_l, add)
                attrs["rec"] = write_back(attrs["rec"], upd_r, add)

        def scalars(a):
            if cfg.num_conv_layers >= 3:
                return jnp.concatenate([a[..., :ns], a[..., -ns:]], -1)
            return a[..., :ns]

        s_lig, s_rec = scalars(attrs["lig"]), scalars(attrs["rec"])

        if cfg.latent_virtual_nodes:
            dim = max(cfg.latent_dim, cfg.input_latent_dim)
            logits = jnp.stack(
                [self.virtual_node_predictors[i](latent_attr[:, i], deterministic=deterministic)
                 for i in range(dim)], 1,
            )  # (B, dim, vocab)
            if not apply_gumbel:
                return logits
            key = self.make_rng("gumbel")
            return gumbel_softmax(key, logits, latent_temperature)

        if cfg.latent_vocab > 1:
            from ..graphs.segment import masked_mean_pool

            pooled = jnp.concatenate(
                [masked_mean_pool(s_lig, batch.lig_mask), masked_mean_pool(s_rec, batch.rec_mask)], -1
            )
            logits = self.latent_predictor(
                pooled[:, None, :], batch.graph_mask[:, None], deterministic, use_running_average
            ).reshape(B, cfg.latent_dim, cfg.latent_vocab)
            if not apply_gumbel:
                return logits
            key = self.make_rng("gumbel")
            return gumbel_softmax(key, logits, latent_temperature)

        # vocab == 1: softmax over the union of nodes of each graph
        pl = self.latent_s_predictor(s_lig, batch.lig_mask & gm, deterministic, use_running_average)
        pr = self.latent_r_predictor(s_rec, batch.rec_mask & gm, deterministic, use_running_average)
        logits = jnp.concatenate([pl, pr], 1)  # (B, NL+NR, latent_dim)
        logits = jnp.swapaxes(logits, 1, 2)  # (B, latent_dim, NL+NR)
        node_mask = jnp.concatenate([batch.lig_mask, batch.rec_mask], 1)  # (B, NL+NR)
        if not apply_gumbel:
            return logits, node_mask
        key = self.make_rng("gumbel")
        onehot = gumbel_softmax(
            key, logits, latent_temperature, mask=node_mask[:, None, :]
        )  # (B, latent_dim, NL+NR)
        lat = jnp.swapaxes(onehot, 1, 2)  # (B, NL+NR, latent_dim)
        return lat[:, :NL], lat[:, NL:]
