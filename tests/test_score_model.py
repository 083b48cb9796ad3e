"""Score-model tests: shapes, SE(3) equivariance, padding invariance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.nn import cg


def small_cfg(**kw):
    base = dict(
        ns=8, nv=2, num_conv_layers=3, dropout=0.0, esm_embedding_dim=16,
        latent_dim=0, latent_vocab=1, latent_droprate=0.0,
    )
    base.update(kw)
    return ScoreModelConfig(**base)


def small_caps():
    return GraphCaps(
        max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=128,
        rec_edge_cap=32 * 8, cross_cap=256, tor_cap=4, tor_edge_cap=64,
    )


def small_batch(seed=0, batch=2):
    return make_complex_batch(
        seed=seed, batch=batch, n_lig=10, n_res=24, caps=small_caps(),
        esm_dim=16, c_alpha_max_neighbors=8,
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch()
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


class TestForward:
    def test_shapes(self, model_and_params):
        model, params, batch = model_and_params
        (tr, rot, tor), _ = model.apply(params, batch, mutable=["batch_stats"])
        assert tr.shape == (2, 3)
        assert rot.shape == (2, 3)
        assert tor.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(tr)))
        assert np.all(np.isfinite(np.asarray(rot)))
        assert np.all(np.isfinite(np.asarray(tor)))

    def test_padded_tor_slots_zero(self, model_and_params):
        model, params, batch = model_and_params
        (_, _, tor), _ = model.apply(params, batch, mutable=["batch_stats"])
        tm = np.asarray(batch.tor_mask)
        assert np.all(np.asarray(tor)[~tm] == 0)

    def test_equivariance(self, model_and_params):
        """Rotate the whole complex: tr/rot scores rotate, torsion invariant.

        This is the single most valuable correctness oracle (SURVEY.md #4b).
        """
        model, params, batch = model_and_params
        (tr, rot, tor), _ = model.apply(params, batch, mutable=["batch_stats"])

        R = cg._random_rotation(np.random.RandomState(5)).astype(np.float32)
        Rj = jnp.asarray(R)
        rbatch = batch.replace(
            lig_pos=batch.lig_pos @ Rj.T, rec_pos=batch.rec_pos @ Rj.T
        )
        (tr_r, rot_r, tor_r), _ = model.apply(params, rbatch, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(tr_r), np.asarray(tr) @ R.T, atol=2e-3)
        np.testing.assert_allclose(np.asarray(rot_r), np.asarray(rot) @ R.T, atol=2e-3)
        np.testing.assert_allclose(np.asarray(tor_r), np.asarray(tor), atol=2e-3)

    def test_shared_rec_matches_full(self):
        """shared_rec=True (receptor-side work at B=1, the N-poses protocol
        fast path) must reproduce the plain forward exactly on a pose-copied
        batch -- it is a pure re-association of the same math."""
        cfg = small_cfg()
        model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
        batch = make_complex_batch(
            seed=2, batch=6, n_lig=10, n_res=24, caps=small_caps(),
            esm_dim=16, c_alpha_max_neighbors=8, same_complex=True,
        )
        # distinct ligand poses per row (receptor stays shared)
        key = jax.random.PRNGKey(3)
        batch = batch.replace(
            lig_pos=batch.lig_pos
            + jax.random.normal(key, batch.lig_pos.shape) * 0.5
        ).set_time(0.7, 0.7, 0.7)
        params = model.init(jax.random.PRNGKey(0), batch)
        ref = model.apply(params, batch, deterministic=True,
                          use_running_average=True)
        fast = model.apply(params, batch, deterministic=True,
                           use_running_average=True, shared_rec=True)
        for r, f, name in zip(ref, fast, ("tr", "rot", "tor")):
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(r), rtol=2e-4, atol=2e-5,
                err_msg=name)

    def test_padding_invariance(self):
        """Growing the padded capacities must not change the outputs."""
        cfg = small_cfg()
        batch1 = small_batch()
        model1 = TensorProductScoreModel(cfg=cfg, caps=small_caps())
        params = model1.init(jax.random.PRNGKey(0), batch1)
        (tr1, rot1, tor1), _ = model1.apply(params, batch1, mutable=["batch_stats"])

        # tor_cap stays 4: raising it would admit MORE real rotatable bonds
        # (a graph change, not padding)
        caps2 = GraphCaps(
            max_lig=24, max_rec=48, lig_bond_cap=48, lig_radius_cap=256,
            rec_edge_cap=48 * 8, cross_cap=512, tor_cap=4, tor_edge_cap=96,
        )
        batch2 = make_complex_batch(
            seed=0, batch=2, n_lig=10, n_res=24, caps=caps2, esm_dim=16,
            c_alpha_max_neighbors=8,
        )
        model2 = TensorProductScoreModel(cfg=cfg, caps=caps2)
        (tr2, rot2, tor2), _ = model2.apply(params, batch2, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rot1), np.asarray(rot2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(tor1), np.asarray(tor2), atol=1e-4)

    def test_confidence_mode(self):
        cfg = small_cfg(confidence_mode=True)
        model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
        batch = small_batch().set_time(0.0, 0.0, 0.0)
        params = model.init(jax.random.PRNGKey(0), batch)
        conf, _ = model.apply(params, batch, mutable=["batch_stats"])
        assert conf.shape == (2,)
        assert np.all(np.isfinite(np.asarray(conf)))

    def test_latent_conditioning(self):
        cfg = small_cfg(latent_dim=2, latent_vocab=1, latent_droprate=0.1)
        model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
        batch = small_batch()
        B, NL = batch.lig_x.shape[:2]
        NR = batch.rec_x.shape[1]
        lat_l = jnp.zeros((B, NL, 2)).at[:, 0, 0].set(1.0)
        lat_r = jnp.zeros((B, NR, 2)).at[:, 0, 1].set(1.0)
        uncond = jnp.zeros((B, 1))
        params = model.init(jax.random.PRNGKey(0), batch, latent=(lat_l, lat_r), unconditional=uncond)
        (tr, _, _), _ = model.apply(
            params, batch, latent=(lat_l, lat_r), unconditional=uncond, mutable=["batch_stats"]
        )
        # different latent -> different score
        lat_l2 = jnp.zeros((B, NL, 2)).at[:, 3, 0].set(1.0)
        (tr2, _, _), _ = model.apply(
            params, batch, latent=(lat_l2, lat_r), unconditional=uncond, mutable=["batch_stats"]
        )
        assert np.abs(np.asarray(tr) - np.asarray(tr2)).max() > 1e-6


def test_fuse_w2_equivalent():
    """fuse_w2 (one concatenated TP-weight matmul per edge group) is a pure
    lowering change: outputs match the per-block-matmul path exactly."""
    import numpy as np

    batch = small_batch()
    m0 = TensorProductScoreModel(cfg=small_cfg(), caps=small_caps())
    v = m0.init(jax.random.PRNGKey(0), batch)
    (tr0, rot0, tor0), _ = m0.apply(v, batch, mutable=["batch_stats"])
    m1 = TensorProductScoreModel(cfg=small_cfg(fuse_w2=True), caps=small_caps())
    (tr1, rot1, tor1), _ = m1.apply(v, batch, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot1), np.asarray(rot0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tor1), np.asarray(tor0), atol=1e-5)
