"""Pallas fused edge-message kernel vs the XLA tensor-product path.

Runs in interpreter mode on the CPU test topology; the TPU-compiled kernel is
exercised by bench.py and was verified to match on-device (max rel diff at
bf16 noise level).
"""
import jax
import jax.numpy as jnp
import numpy as np

from disco_diffdock_tpu.nn.sh import spherical_harmonics
from disco_diffdock_tpu.nn.tensor_product import WeightedTensorProduct
from disco_diffdock_tpu.ops.pallas_conv import edge_message, prepare_x_imajor


def _setup(in_ir, out_ir, B=2, E=64, F=20, H=24, seed=0):
    rng = np.random.RandomState(seed)
    tp = WeightedTensorProduct(in_ir, "1x0e+1x1o", out_ir)
    eattr = jnp.asarray(rng.randn(B, E, F).astype(np.float32))
    x = jnp.asarray(rng.randn(B, E, tp.in_irreps.dim).astype(np.float32))
    sh = spherical_harmonics(jnp.asarray(rng.randn(B, E, 3).astype(np.float32)), 1)
    w1 = jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = [jnp.asarray(rng.randn(H, d).astype(np.float32) * 0.1) for d in tp.weight_splits]
    b2 = [jnp.asarray(rng.randn(d).astype(np.float32) * 0.1) for d in tp.weight_splits]
    return tp, eattr, x, sh, w1, b1, w2, b2


def _xla_ref(tp, eattr, x, sh, w1, b1, w2, b2):
    h = jax.nn.relu(eattr @ w1 + b1)
    wk = tuple(h @ w + b for w, b in zip(w2, b2))
    return tp(x, sh, wk)


def test_matches_xla_full_irreps():
    args = _setup("8x0e+3x1o+3x1e+8x0o", "8x0e+3x1o+3x1e+8x0o")
    ref = _xla_ref(*args)
    out = edge_message(*args, tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_matches_xla_first_layer():
    # first conv layer: scalars-only input
    args = _setup("8x0e", "8x0e+3x1o")
    ref = _xla_ref(*args)
    out = edge_message(*args, tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_padding_rows():
    # E not a multiple of the tile: padded rows must not corrupt output
    args = _setup("8x0e+3x1o", "8x0e+3x1o+3x1e", E=37)
    ref = _xla_ref(*args)
    out = edge_message(*args, tile=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_x_imajor_roundtrip():
    tp, _, x, *_ = _setup("8x0e+3x1o+3x1e+8x0o", "8x0e")
    xi = prepare_x_imajor(tp, x)
    assert xi.shape == x.shape
    # scalars block unchanged (d=1)
    np.testing.assert_allclose(np.asarray(xi[..., :8]), np.asarray(x[..., :8]))


def test_fused_block_matches_xla_model():
    """End-to-end: the fused gather+MLP+TP+scatter kernel inside the score
    model reproduces the XLA path (interpret mode)."""
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from tests.test_score_model import small_batch, small_caps, small_cfg

    batch = small_batch()
    m0 = TensorProductScoreModel(cfg=small_cfg(), caps=small_caps())
    v = m0.init(jax.random.PRNGKey(0), batch)
    (tr0, rot0, tor0), _ = m0.apply(v, batch, mutable=["batch_stats"])
    m1 = TensorProductScoreModel(cfg=small_cfg(use_pallas_conv=True), caps=small_caps())
    (tr1, rot1, tor1), _ = m1.apply(v, batch, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot1), np.asarray(rot0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tor1), np.asarray(tor0), atol=1e-5)


def test_message_mode_matches_xla_model():
    """use_pallas_conv="message" (MLP+TP fused, gather/scatter in XLA)
    reproduces the XLA path inside the score model (interpret mode)."""
    from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
    from tests.test_score_model import small_batch, small_caps, small_cfg

    batch = small_batch()
    m0 = TensorProductScoreModel(cfg=small_cfg(), caps=small_caps())
    v = m0.init(jax.random.PRNGKey(0), batch)
    (tr0, rot0, tor0), _ = m0.apply(v, batch, mutable=["batch_stats"])
    m1 = TensorProductScoreModel(cfg=small_cfg(use_pallas_conv="message"), caps=small_caps())
    (tr1, rot1, tor1), _ = m1.apply(v, batch, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot1), np.asarray(rot0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tor1), np.asarray(tor0), atol=1e-5)
