"""Edge-capacity overflow observability (graphs/radius.py + graphs/audit.py).

A wrong runtime edge capacity silently changes results (the compaction drops
the farthest pairs); these tests pin the dropped-edge accounting that makes
it observable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.graphs.audit import audit_worst_case, edge_overflow
from disco_diffdock_tpu.graphs.radius import radius_edges
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel

CAPS = GraphCaps(
    max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
    rec_edge_cap=32 * 8, cross_cap=128, tor_cap=4, tor_edge_cap=48,
)


class TestCompactOverflow:
    def test_counts_dropped_edges(self):
        rng = np.random.RandomState(0)
        pos = jnp.asarray(rng.randn(2, 8, 3), jnp.float32)
        mask = jnp.ones((2, 8), bool)
        # huge cutoff: all 8*7=56 directed pairs are true edges
        edges = radius_edges(pos, mask, pos, mask, 1e9, 40, exclude_self=True)
        np.testing.assert_array_equal(np.asarray(edges.overflow), [16, 16])
        assert int(edges.mask.sum()) == 80  # 2 graphs x 40 kept

    def test_zero_when_capacity_adequate(self):
        rng = np.random.RandomState(1)
        pos = jnp.asarray(rng.randn(1, 8, 3), jnp.float32)
        mask = jnp.ones((1, 8), bool)
        edges = radius_edges(pos, mask, pos, mask, 1e9, 56, exclude_self=True)
        np.testing.assert_array_equal(np.asarray(edges.overflow), [0])

    def test_padded_nodes_do_not_count(self):
        rng = np.random.RandomState(2)
        pos = jnp.asarray(rng.randn(1, 8, 3), jnp.float32)
        mask = jnp.asarray([[True] * 4 + [False] * 4])
        edges = radius_edges(pos, mask, pos, mask, 1e9, 6, exclude_self=True)
        # 4*3=12 true pairs, capacity 6 -> 6 dropped
        np.testing.assert_array_equal(np.asarray(edges.overflow), [6])


class TestModelAudit:
    def test_score_model_reports_per_edge_type(self):
        # worst-case caps: cross_cap = max_lig * max_rec can never overflow
        caps = CAPS.scaled(cross_cap=16 * 32, lig_radius_cap=16 * 16)
        cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=2, esm_embedding_dim=16,
            dropout=0.0, latent_dim=0, latent_droprate=0.0,
        )
        batch = make_complex_batch(
            seed=0, batch=2, n_lig=10, n_res=24, caps=caps, esm_dim=16,
            c_alpha_max_neighbors=8,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=caps)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

        ov = edge_overflow(model, variables, batch)
        assert set(ov) == {"overflow_lig_radius", "overflow_cross", "overflow_tor_edges"}
        assert all(v == 0 for v in ov.values()), ov

        # worst case (t=1, randomized pose) still fits worst-case caps
        ov = audit_worst_case(model, variables, batch, jax.random.PRNGKey(1))
        assert all(v == 0 for v in ov.values()), ov

    def test_overflow_detected_with_tight_caps(self):
        tight = CAPS.scaled(cross_cap=8)
        cfg = ScoreModelConfig(
            ns=8, nv=2, num_conv_layers=2, esm_embedding_dim=16,
            dropout=0.0, latent_dim=0, latent_droprate=0.0,
        )
        batch = make_complex_batch(
            seed=0, batch=2, n_lig=10, n_res=24, caps=tight, esm_dim=16,
            c_alpha_max_neighbors=8,
        )
        model = TensorProductScoreModel(cfg=cfg, caps=tight)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        ov = edge_overflow(model, variables, batch)
        assert ov["overflow_cross"] > 0
