"""All-atom tensor-product score model (3 node types) -- the shipped
confidence-model architecture.

TPU-native redesign of models/all_atom_score_model.py:15-459: ligand atoms,
receptor residues, and receptor heavy atoms, with 9 independent conv layers
per depth level (3 intra: lig/atom/rec; 6 inter: lr, la, al, ar, ra, rl),
each with its own weight MLP, separate mean aggregation and batch norm, and
manual summed residuals (:232-278).  The last depth level only updates the
ligand (:245, "last layer optimisation").  sh_lmax defaults to 2 -> the
general CG tensor-product path.

Quirk parity: ligand->atom edges use the *cross* distance expansion despite
the 5A cutoff (:414), atom->residue membership edges are precomputed, and
atom-graph distance embedding reuses the ligand 0-5A expansion (:380).
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ..config import GraphCaps, ScoreModelConfig
from ..data.features import (
    LIG_FEATURE_DIMS,
    REC_ATOM_FEATURE_DIMS,
    REC_RESIDUE_FEATURE_DIMS,
)
from ..geom import so3, torus
from ..geom.diffusion import SigmaSchedule, get_timestep_embedding
from ..graphs.containers import ComplexBatch, ListEdges
from ..graphs.radius import radius_edges
from ..graphs.segment import masked_mean_pool
from ..nn.basic import AtomEncoder, FCBlock
from ..nn.batchnorm import MaskedIrrepsBatchNorm
from ..nn.conv import ConvBlock, TPConvLayer, build_onehots, gather_nodes
from ..nn.irreps import spherical_harmonics_irreps
from ..nn.sh import irrep_to_vec, spherical_harmonics
from ..nn.tensor_product import FullTensorProduct, get_irrep_seq
from .score_model import GaussianSmearing, _concat_edges


class AllAtomScoreModel(nn.Module):
    cfg: ScoreModelConfig
    caps: GraphCaps
    sigma: SigmaSchedule = SigmaSchedule()

    def setup(self):
        cfg = self.cfg
        ns, nv = cfg.ns, cfg.nv
        self.sh_irreps = str(spherical_harmonics_irreps(cfg.sh_lmax))
        self.irrep_seq = get_irrep_seq(ns, nv, cfg.use_second_order_repr)
        self.timestep_emb = get_timestep_embedding(
            cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale
        )

        if cfg.use_old_atom_encoder:
            # the shipped paper_confidence_model predates the
            # use_old_atom_encoder flag and therefore uses this legacy
            # variant (reference model_utils.py:62 defaults it to True)
            from ..nn.basic import OldAtomEncoder

            self.lig_node_embedding = OldAtomEncoder(
                ns, LIG_FEATURE_DIMS, cfg.sigma_embed_dim, 0
            )
            self.rec_node_embedding = OldAtomEncoder(
                ns, REC_RESIDUE_FEATURE_DIMS, cfg.sigma_embed_dim,
                cfg.esm_embedding_dim,
            )
            self.atom_node_embedding = OldAtomEncoder(
                ns, REC_ATOM_FEATURE_DIMS, cfg.sigma_embed_dim, 0
            )
        else:
            self.lig_node_embedding = AtomEncoder(ns, LIG_FEATURE_DIMS, cfg.sigma_embed_dim)
            self.rec_node_embedding = AtomEncoder(
                ns, REC_RESIDUE_FEATURE_DIMS, cfg.esm_embedding_dim + cfg.sigma_embed_dim
            )
            self.atom_node_embedding = AtomEncoder(ns, REC_ATOM_FEATURE_DIMS, cfg.sigma_embed_dim)
        for name in ("lig", "rec", "atom", "lr", "ar", "la"):
            setattr(self, f"{name}_edge_embedding", FCBlock(ns, ns, 2, cfg.dropout))

        self.lig_distance_expansion = GaussianSmearing(0.0, cfg.lig_max_radius, cfg.distance_embed_dim)
        self.rec_distance_expansion = GaussianSmearing(0.0, cfg.rec_max_radius, cfg.distance_embed_dim)
        self.cross_distance_expansion = GaussianSmearing(0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim)

        convs = []
        for i in range(cfg.num_conv_layers):
            in_ir = self.irrep_seq[min(i, len(self.irrep_seq) - 1)]
            out_ir = self.irrep_seq[min(i + 1, len(self.irrep_seq) - 1)]
            for j in range(9):
                convs.append(
                    TPConvLayer(
                        in_irreps=in_ir, sh_irreps=self.sh_irreps, out_irreps=out_ir,
                        n_edge_features=3 * ns, residual=False,
                        batch_norm=cfg.batch_norm, dropout=cfg.dropout,
                        n_scalars=ns, remat=cfg.remat,
                        name=f"conv{i}_{j}",
                    )
                )
        self.conv_layers = convs
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
                in_irreps=final_irreps, sh_irreps=self.sh_irreps,
                out_irreps="2x1o + 2x1e", n_edge_features=2 * ns,
                residual=False, batch_norm=cfg.batch_norm, dropout=cfg.dropout,
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
                    in_irreps=final_irreps, sh_irreps=str(self.final_tp_tor.irreps_out),
                    out_irreps=f"{ns}x0o + {ns}x0e", n_edge_features=3 * ns,
                    residual=False, batch_norm=cfg.batch_norm, dropout=cfg.dropout,
                    remat=cfg.remat,
                    name="tor_bond_conv",
                )
                self.tor_final_dense1 = nn.Dense(ns, use_bias=False)
                self.tor_final_dense2 = nn.Dense(1, use_bias=False)
        self.dropout_layer = nn.Dropout(cfg.dropout)

    def __call__(
        self,
        batch: ComplexBatch,
        latent=None,  # unused: reference AA model asserts latent_dim == 0
        unconditional=None,
        deterministic: bool = True,
        use_running_average: bool = False,
        shared_rec: bool = False,
    ):
        """``shared_rec``: every graph is a pose copy of one complex with a
        shared time (the confidence-reranking batch) -- receptor-residue,
        receptor-atom and membership-edge arrays compute at B=1 and
        broadcast where pose-dependent data joins (see
        score_model.TensorProductScoreModel.embed).  Inference-only."""
        cfg = self.cfg
        ns = cfg.ns
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        NA = batch.atom_x.shape[1]
        r1 = slice(0, 1) if shared_rec else slice(None)

        def _sl(edges: ListEdges) -> ListEdges:
            if not shared_rec:
                return edges
            return ListEdges(src=edges.src[r1], dst=edges.dst[r1],
                             mask=edges.mask[r1], overflow=edges.overflow)

        rec_edges_s = _sl(batch.rec_edges)
        atom_edges_s = _sl(batch.atom_edges)
        ar_edges_s = _sl(batch.ar_edges)
        rec_pos_s = batch.rec_pos[r1]
        atom_pos_s = batch.atom_pos[r1]

        t_tr, t_rot, t_tor = (batch.complex_t[k] for k in ("tr", "rot", "tor"))
        if cfg.confidence_mode:
            tr_sigma, rot_sigma, tor_sigma = t_tr, t_rot, t_tor
        else:
            tr_sigma, rot_sigma, tor_sigma = self.sigma.t_to_sigma(t_tr, t_rot, t_tor)

        sig = self.timestep_emb(t_tr)  # (B, emb)

        def bsig(n):
            return jnp.broadcast_to(sig[:, None, :], (B, n, sig.shape[-1]))

        # ---- node embeddings (receptor-side at B=1 when pose-shared)
        lig_attr = self.lig_node_embedding(
            jnp.concatenate([batch.lig_x.astype(jnp.float32), bsig(NL)], -1)
        )
        rec_attr = self.rec_node_embedding(
            jnp.concatenate([batch.rec_x[r1].astype(jnp.float32), bsig(NR)[r1]], -1)
        )
        atom_attr = self.atom_node_embedding(
            jnp.concatenate([batch.atom_x[r1].astype(jnp.float32), bsig(NA)[r1]], -1)
        )

        # ---- edges + attrs + sh per block
        def evec(pos_s, pos_d, edges):
            return gather_nodes(pos_d, edges.dst) - gather_nodes(pos_s, edges.src)

        redges = radius_edges(
            batch.lig_pos, batch.lig_mask, batch.lig_pos, batch.lig_mask,
            cfg.lig_max_radius, self.caps.lig_radius_cap, exclude_self=True,
        )
        self.sow("intermediates", "overflow_lig_radius", redges.overflow)
        lig_edges = _concat_edges(batch.lig_bonds, redges)
        bond_feat = jnp.concatenate(
            [batch.lig_bond_attr, jnp.zeros((B, redges.capacity, cfg.in_lig_edge_features))], 1
        )
        v = evec(batch.lig_pos, batch.lig_pos, lig_edges)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        lig_eattr = self.lig_edge_embedding(
            jnp.concatenate([bond_feat, bsig(lig_edges.capacity), self.lig_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        lig_sh = spherical_harmonics(v, cfg.sh_lmax)

        v = evec(rec_pos_s, rec_pos_s, rec_edges_s)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        rec_eattr = self.rec_edge_embedding(
            jnp.concatenate([bsig(rec_edges_s.capacity)[r1], self.rec_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        rec_sh = spherical_harmonics(v, cfg.sh_lmax)

        v = evec(atom_pos_s, atom_pos_s, atom_edges_s)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        atom_eattr = self.atom_edge_embedding(
            jnp.concatenate([bsig(atom_edges_s.capacity)[r1], self.lig_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        atom_sh = spherical_harmonics(v, cfg.sh_lmax)

        cross_cutoff = tr_sigma * 3 + 20 if cfg.dynamic_max_cross else cfg.cross_max_distance
        lr_edges = radius_edges(
            batch.lig_pos, batch.lig_mask, batch.rec_pos, batch.rec_mask,
            cross_cutoff, self.caps.cross_cap,
        )
        self.sow("intermediates", "overflow_cross", lr_edges.overflow)
        v = evec(batch.lig_pos, batch.rec_pos, lr_edges)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        lr_eattr = self.lr_edge_embedding(
            jnp.concatenate([bsig(lr_edges.capacity), self.cross_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        lr_sh = spherical_harmonics(v, cfg.sh_lmax)

        la_edges = radius_edges(
            batch.lig_pos, batch.lig_mask, batch.atom_pos, batch.atom_mask,
            cfg.lig_max_radius, self.caps.la_cap,
        )
        self.sow("intermediates", "overflow_lig_atom", la_edges.overflow)
        v = evec(batch.lig_pos, batch.atom_pos, la_edges)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        la_eattr = self.la_edge_embedding(
            jnp.concatenate([bsig(la_edges.capacity), self.cross_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        la_sh = spherical_harmonics(v, cfg.sh_lmax)

        v = gather_nodes(rec_pos_s, ar_edges_s.dst) - gather_nodes(atom_pos_s, ar_edges_s.src)
        d = jnp.linalg.norm(v + 1e-12, axis=-1)
        ar_eattr = self.ar_edge_embedding(
            jnp.concatenate([bsig(ar_edges_s.capacity)[r1], self.rec_distance_expansion(d)], -1),
            deterministic=deterministic,
        )
        ar_sh = spherical_harmonics(v, cfg.sh_lmax)

        # one-hot gather/scatter operands built ONCE per edge set and shared
        # across all depth levels (they only depend on the edge indices);
        # receptor-side pairs are pose-shared at B=1 under shared_rec
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        oh = {
            "lig": build_onehots(lig_edges, NL, NL, cdt),
            "lr": build_onehots(lr_edges, NL, NR, cdt),
            "rl": build_onehots(lr_edges.flip(), NR, NL, cdt),
            "la": build_onehots(la_edges, NL, NA, cdt),
            "al": build_onehots(la_edges.flip(), NA, NL, cdt),
            "atom": build_onehots(atom_edges_s, NA, NA, cdt),
            "ar": build_onehots(ar_edges_s, NA, NR, cdt),
            "ra": build_onehots(ar_edges_s.flip(), NR, NA, cdt),
            "rec": build_onehots(rec_edges_s, NR, NR, cdt),
        }

        # ---- 9-conv trunk
        attrs = {"lig": lig_attr, "rec": rec_attr, "atom": atom_attr}
        # AND the graph mask so batch-axis padding repeats (data/collate.py
        # pad_graphs_to) don't double-count in BN statistics (ADVICE r4)
        gm = batch.graph_mask[:, None]
        masks = {"lig": batch.lig_mask & gm, "rec": batch.rec_mask[r1] & gm[r1],
                 "atom": batch.atom_mask[r1] & gm[r1]}

        L = cfg.num_conv_layers
        for l in range(L):
            def run(conv_idx, edges, src_t, dst_t, base, sh_, oh_key):
                # receiver/supplier scalar features appended inside the layer
                return self.conv_layers[9 * l + conv_idx](
                    attrs, masks,
                    [ConvBlock(edges, src_t, dst_t, base, sh_, onehots=oh[oh_key])],
                    out_types=[src_t], out_counts={src_t: attrs[src_t].shape[1]},
                    deterministic=deterministic, use_running_average=use_running_average,
                )[src_t]

            lig_update = run(0, lig_edges, "lig", "lig", lig_eattr, lig_sh, "lig")
            lr_update = run(1, lr_edges, "lig", "rec", lr_eattr, lr_sh, "lr")
            la_update = run(2, la_edges, "lig", "atom", la_eattr, la_sh, "la")

            if l != L - 1:
                atom_update = run(3, atom_edges_s, "atom", "atom", atom_eattr, atom_sh, "atom")
                al_update = run(4, la_edges.flip(), "atom", "lig", la_eattr, la_sh, "al")
                ar_update = run(5, ar_edges_s, "atom", "rec", ar_eattr, ar_sh, "ar")
                rec_update = run(6, rec_edges_s, "rec", "rec", rec_eattr, rec_sh, "rec")
                rl_update = run(7, lr_edges.flip(), "rec", "lig", lr_eattr, lr_sh, "rl")
                ra_update = run(8, ar_edges_s.flip(), "rec", "atom", ar_eattr, ar_sh, "ra")

            def pad_to(x, D):
                return jnp.pad(x, [(0, 0), (0, 0), (0, D - x.shape[-1])])

            D = lig_update.shape[-1]
            attrs["lig"] = pad_to(attrs["lig"], D) + lig_update + la_update + lr_update
            if l != L - 1:
                attrs["atom"] = pad_to(attrs["atom"], D) + atom_update + al_update + ar_update
                attrs["rec"] = pad_to(attrs["rec"], D) + rec_update + ra_update + rl_update

        lig_attr = attrs["lig"]

        def scalar_features(a):
            if L >= 3:
                return jnp.concatenate([a[..., :ns], a[..., -ns:]], -1)
            return a[..., :ns]

        if cfg.confidence_mode:
            x = self.confidence_mlp1(masked_mean_pool(scalar_features(lig_attr), batch.lig_mask))
            if not cfg.confidence_no_batchnorm:
                x = self.confidence_bn1(
                    x[:, None, :], batch.graph_mask[:, None], use_running_average=use_running_average
                )[:, 0]
            x = nn.relu(x)
            x = self.confidence_dropout_layer(x, deterministic=deterministic)
            x = self.confidence_mlp2(x)
            if not cfg.confidence_no_batchnorm:
                x = self.confidence_bn2(
                    x[:, None, :], batch.graph_mask[:, None], use_running_average=use_running_average
                )[:, 0]
            x = nn.relu(x)
            x = self.confidence_dropout_layer(x, deterministic=deterministic)
            conf = self.confidence_out(x)
            return jnp.squeeze(conf, -1) if cfg.num_confidence_outputs == 1 else conf

        # ---- tr/rot center head (identical structure to the CG model)
        w = batch.lig_mask.astype(jnp.float32)[..., None]
        center = jnp.sum(batch.lig_pos * w, 1, keepdims=True) / (jnp.sum(w, 1, keepdims=True) + 1e-12)
        vec_c = batch.lig_pos - center
        dist_c = jnp.linalg.norm(vec_c + 1e-12, axis=-1)
        center_eattr = self.center_edge_embedding(
            jnp.concatenate([self.center_distance_expansion(dist_c), bsig(NL)], -1),
            deterministic=deterministic,
        )
        center_eattr = jnp.concatenate([center_eattr, lig_attr[..., :ns]], -1)
        center_sh = spherical_harmonics(vec_c, cfg.sh_lmax)
        idx = jnp.broadcast_to(jnp.arange(NL, dtype=jnp.int32)[None], (B, NL))
        center_edges = ListEdges(jnp.zeros((B, NL), jnp.int32), idx, batch.lig_mask)
        global_pred = self.final_conv(
            {"lig": lig_attr}, {"center": batch.graph_mask[:, None]},
            [ConvBlock(center_edges, "center", "lig", center_eattr, center_sh, append_scalars=False)],
            out_types=["center"], out_counts={"center": 1},
            deterministic=deterministic, use_running_average=use_running_average,
        )["center"][:, 0]

        tr_pred = irrep_to_vec(global_pred[:, :3] + global_pred[:, 6:9])
        rot_pred = irrep_to_vec(global_pred[:, 3:6] + global_pred[:, 9:12])
        tr_norm = jnp.linalg.norm(tr_pred, axis=-1, keepdims=True) + 1e-12
        h = self.tr_final_dense1(jnp.concatenate([tr_norm, sig], -1))
        tr_pred = tr_pred / tr_norm * self.tr_final_dense2(
            nn.relu(self.dropout_layer(h, deterministic=deterministic))
        )
        rot_norm = jnp.linalg.norm(rot_pred, axis=-1, keepdims=True) + 1e-12
        h = self.rot_final_dense1(jnp.concatenate([rot_norm, sig], -1))
        rot_pred = rot_pred / rot_norm * self.rot_final_dense2(
            nn.relu(self.dropout_layer(h, deterministic=deterministic))
        )
        if cfg.scale_by_sigma:
            tr_pred = tr_pred / tr_sigma[:, None]
            rot_pred = rot_pred * so3.score_norm(rot_sigma)[:, None]

        if cfg.no_torsion:
            return tr_pred, rot_pred, jnp.zeros((B, batch.tor_edges.shape[1]))

        # ---- torsion head
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
        t_eattr = self.final_edge_embedding(self.lig_distance_expansion(dist_t), deterministic=deterministic)
        bond_attr = gather_nodes(lig_attr, u_idx) + gather_nodes(lig_attr, v_idx)
        t_eattr = jnp.concatenate(
            [t_eattr, gather_nodes(lig_attr[..., :ns], tor_edges.dst),
             gather_nodes(bond_attr[..., :ns], tor_edges.src)], -1)
        bond_sh2 = spherical_harmonics(pos_v - pos_u, 2)[..., 4:9]
        tor_sh = self.final_tp_tor(
            spherical_harmonics(vec_t, cfg.sh_lmax), gather_nodes(bond_sh2, tor_edges.src)
        )
        tor_feat = self.tor_bond_conv(
            {"lig": lig_attr}, {"bond": batch.tor_mask & gm},
            [ConvBlock(tor_edges, "bond", "lig", t_eattr, tor_sh, append_scalars=False)],
            out_types=["bond"], out_counts={"bond": R},
            deterministic=deterministic, use_running_average=use_running_average,
        )["bond"]
        h = jnp.tanh(self.tor_final_dense1(tor_feat))
        tor_pred = self.tor_final_dense2(
            self.dropout_layer(h, deterministic=deterministic)
        )[..., 0]
        if cfg.scale_by_sigma:
            tor_pred = tor_pred * jnp.sqrt(torus.score_norm(tor_sigma))[:, None]
        return tr_pred, rot_pred, tor_pred * batch.tor_mask
