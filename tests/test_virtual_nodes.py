"""Latent virtual-node encoder path: functional coverage + the separable
-attention equivalence oracle.

The TPU build replaces torch_geometric's ``TransformerConv`` over
materialized virtual-node edges (reference latent_encoder.py:89-132,
223-305) with masked dense attention whose edge features are decomposed
into source-side and target-side parts (nn/transformer.py): the
target-side KEY part shifts all of a query's logits equally
(softmax-invariant) and the target-side VALUE part adds a constant to the
attention-weighted sum.  ``TestSeparableAttentionOracle`` verifies that
claim against a direct edge-materialized reference implementation;
``TestVirtualNodeEncoder`` drives the full encoder path (plain, gumbel,
AR-conditioned) and checks rotation invariance of the logits.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from disco_diffdock_tpu.config import EncoderConfig, GraphCaps
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.models.encoder import TPEncoder, VirtualNodeBlock

CAPS = GraphCaps(
    max_lig=12, max_rec=16, lig_bond_cap=30, lig_radius_cap=12 * 11,
    rec_edge_cap=16 * 8, cross_cap=12 * 16, tor_cap=4, tor_edge_cap=4 * 12,
)


def enc_cfg(**kw):
    base = dict(
        ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6, dropout=0.0,
        latent_dim=2, latent_vocab=3, latent_hidden_dim=16,
        latent_virtual_nodes=True,
    )
    base.update(kw)
    return EncoderConfig(**base)


class TestSeparableAttentionOracle:
    """VirtualNodeBlock == edge-materialized TransformerConv semantics.

    Reference form, per directed edge j->i with edge feature
    e_ij = [src_part_j ; dst_part_i]:

        out_i = W_skip x_i + sum_j alpha_ij (W_v x_j + W_ev e_ij)
        alpha = softmax_j((W_q x_i) . (W_k x_j + W_ek e_ij) / sqrt(d))

    The dst-part KEY columns of W_ek are softmax-invariant, so the dense
    build does not parameterize them at all: the oracle includes an
    ARBITRARY random dst-key matrix and the outputs must still match.
    """

    @pytest.mark.parametrize("d_in,lat_w", [(8, 8), (8, 5), (4, 8)])
    def test_block_matches_reference_form(self, d_in, lat_w):
        rng = np.random.RandomState(3)
        B, N, dim, ns, d = 2, 6, 3, 4, 8
        node_scal = rng.randn(B, N, d_in).astype(np.float32)
        node_mask = np.ones((B, N), bool)
        node_mask[0, -2:] = False  # padded real nodes
        type_attr = rng.randn(B, N, ns).astype(np.float32)
        latent_attr = rng.randn(B, dim, lat_w).astype(np.float32)
        latent_edge = rng.randn(B, dim, ns).astype(np.float32)

        block = VirtualNodeBlock(d_node_in=d_in, d_out=d, ns=ns)
        args = (jnp.asarray(node_scal), jnp.asarray(node_mask),
                jnp.asarray(type_attr), jnp.asarray(latent_attr),
                jnp.asarray(latent_edge))
        variables = block.init(jax.random.PRNGKey(0), *args)
        new_scal, new_latent = block.apply(variables, *args)
        new_scal, new_latent = np.asarray(new_scal), np.asarray(new_latent)

        p = jax.tree.map(np.asarray, variables["params"])

        def dense(name, x, sub):
            k = p[sub][name]["kernel"] if sub else p[name]["kernel"]
            b = (p[sub][name].get("bias") if sub else p[name].get("bias"))
            y = x @ k
            return y + b if b is not None else y

        def lin(att, which, x):
            q = p[att][f"lin_{which}"]
            y = x @ q["kernel"]
            return y + q["bias"] if "bias" in q else y

        ek_real = dense("ek_real", type_attr, None)
        ev_real = dense("ev_real", type_attr, None)
        ek_lat = dense("ek_lat", latent_edge, None)
        ev_lat = dense("ev_lat", latent_edge, None)
        evq_lat = dense("evq_lat", latent_edge, None)
        evq_real = dense("evq_real", type_attr, None)
        # arbitrary dst-side KEY projections the dense build never
        # parameterizes -- they must not change the output
        ekq_lat = rng.randn(B, dim, d).astype(np.float32)
        ekq_real = rng.randn(B, N, d).astype(np.float32)

        # virtual-node features used as keys: latent_attr padded/truncated
        # to the real-node scalar width (VirtualNodeBlock kv concat)
        lat_as_node = np.zeros((B, dim, d_in), np.float32)
        w = min(lat_w, d_in)
        lat_as_node[..., :w] = latent_attr[..., :w]

        # ---- reference-form virtual-node update (queries = virtual nodes,
        # keys = valid real nodes + other virtuals), explicit edge loop
        for b in range(B):
            for i in range(dim):
                q = lin("attn_virtual", "q", latent_attr[b, i])
                keys, vals = [], []
                for j in range(N):
                    if not node_mask[b, j]:
                        continue
                    kj = lin("attn_virtual", "k", node_scal[b, j]) + ek_real[b, j] + ekq_lat[b, i]
                    vj = lin("attn_virtual", "v", node_scal[b, j]) + ev_real[b, j] + evq_lat[b, i]
                    keys.append(kj)
                    vals.append(vj)
                for j in range(dim):
                    if j == i:
                        continue
                    kj = lin("attn_virtual", "k", lat_as_node[b, j]) + ek_lat[b, j] + ekq_lat[b, i]
                    vj = lin("attn_virtual", "v", lat_as_node[b, j]) + ev_lat[b, j] + evq_lat[b, i]
                    keys.append(kj)
                    vals.append(vj)
                logits = np.stack(keys) @ q / np.sqrt(d)
                a = np.exp(logits - logits.max())
                a = a / a.sum()
                out = (a[:, None] * np.stack(vals)).sum(0)
                ref = lin("attn_virtual", "skip", latent_attr[b, i]) + out
                np.testing.assert_allclose(
                    new_latent[b, i], ref, rtol=2e-4, atol=2e-5,
                    err_msg=f"virtual update b={b} i={i}")

        # ---- reference-form real-node update (queries = real nodes,
        # keys = the dim virtual nodes)
        for b in range(B):
            for i in range(N):
                if not node_mask[b, i]:
                    continue
                q = lin("attn_real", "q", node_scal[b, i])
                keys = np.stack([
                    lin("attn_real", "k", latent_attr[b, j]) + ek_lat[b, j] + ekq_real[b, i]
                    for j in range(dim)])
                vals = np.stack([
                    lin("attn_real", "v", latent_attr[b, j]) + ev_lat[b, j] + evq_real[b, i]
                    for j in range(dim)])
                logits = keys @ q / np.sqrt(d)
                a = np.exp(logits - logits.max())
                a = a / a.sum()
                out = (a[:, None] * vals).sum(0)
                ref = lin("attn_real", "skip", node_scal[b, i]) + out
                np.testing.assert_allclose(
                    new_scal[b, i], ref, rtol=2e-4, atol=2e-5,
                    err_msg=f"real update b={b} i={i}")


class TestVirtualNodeEncoder:
    def _setup(self, **cfg_kw):
        cfg = enc_cfg(**cfg_kw)
        batch = make_complex_batch(
            seed=71, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6,
        )
        model = TPEncoder(cfg=cfg, caps=CAPS)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            batch,
        )
        return cfg, model, variables, batch

    def test_logits_and_gumbel(self):
        cfg, model, variables, batch = self._setup()
        dim = max(cfg.latent_dim, cfg.input_latent_dim)
        logits = model.apply(
            variables, batch, apply_gumbel=False,
            deterministic=True, use_running_average=True,
        )
        assert logits.shape == (batch.num_graphs, dim, cfg.latent_vocab)
        assert np.isfinite(np.asarray(logits)).all()
        onehot = model.apply(
            variables, batch, apply_gumbel=True, latent_temperature=0.01,
            deterministic=True, use_running_average=True,
            rngs={"gumbel": jax.random.PRNGKey(7)},
        )
        oh = np.asarray(onehot)
        assert oh.shape == (batch.num_graphs, dim, cfg.latent_vocab)
        np.testing.assert_allclose(oh.sum(-1), 1.0, atol=1e-5)

    def test_ar_conditioning_runs(self):
        """input_latent conditions the virtual nodes only (latent_factor=0
        mode, latent_encoder.py:48,194-196): the partial string + active
        -slot embeddings must change the logits."""
        cfg, model, variables, batch = self._setup(input_latent_dim=2,
                                                   latent_nodes_residual=True)
        B = batch.num_graphs
        dim = max(cfg.latent_dim, cfg.input_latent_dim)
        # virtual-node mode: the partial string is per-SLOT vocab one-hots
        # (B, dim, vocab), not node one-hots (encoder docstring :208)
        lat = jnp.zeros((B, dim, cfg.latent_vocab)).at[:, 0, 0].set(1.0)
        dec = jnp.ones((B,), jnp.int32)
        # params were initialized WITHOUT conditioning branches above; re-init
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            batch, input_latent=lat, decoding_idx=dec,
        )
        l1 = np.asarray(model.apply(
            variables, batch, input_latent=lat, decoding_idx=dec,
            apply_gumbel=False, deterministic=True, use_running_average=True))
        lat2 = jnp.zeros((B, dim, cfg.latent_vocab)).at[:, 0, 2].set(1.0)
        l2 = np.asarray(model.apply(
            variables, batch, input_latent=lat2, decoding_idx=dec,
            apply_gumbel=False, deterministic=True, use_running_average=True))
        assert np.isfinite(l1).all() and np.isfinite(l2).all()
        assert np.abs(l1 - l2).max() > 1e-7  # the string actually conditions

    def test_rotation_invariance(self):
        """Virtual-node logits read only scalar features of an
        SE(3)-equivariant trunk: a rigid rotation of the whole complex must
        leave them unchanged (the architecture's core invariant)."""
        from disco_diffdock_tpu.geom.rotations import axis_angle_to_matrix

        cfg, model, variables, batch = self._setup()
        l0 = np.asarray(model.apply(
            variables, batch, apply_gumbel=False,
            deterministic=True, use_running_average=True))
        R = axis_angle_to_matrix(jnp.asarray([[0.4, -0.8, 0.3]]))[0]

        def rot(x):
            return jnp.einsum("bni,ij->bnj", x, R.T)

        batch2 = batch.replace(lig_pos=rot(batch.lig_pos), rec_pos=rot(batch.rec_pos))
        extras = dict(batch2.extras)
        extras["orig_pos"] = rot(batch.extras["orig_pos"])
        batch2 = batch2.replace(extras=extras)
        l1 = np.asarray(model.apply(
            variables, batch2, apply_gumbel=False,
            deterministic=True, use_running_average=True))
        np.testing.assert_allclose(l0, l1, rtol=2e-4, atol=2e-4)
