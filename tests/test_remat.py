"""Conv edge-block rematerialization (nn/conv.py remat flag).

jax.checkpoint must change ONLY the backward-pass memory schedule: loss and
gradients are bit-for-bit functions of the same math, so remat on/off must
agree to float tolerance, in both the bare score model and the DisCo
wrapper (encoder + score), and the dropout path (explicit bernoulli inside
the checkpoint, key drawn outside) must still train.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from disco_diffdock_tpu.config import EncoderConfig, GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.train.steps import TrainState, make_train_step

CAPS = GraphCaps(
    max_lig=12, max_rec=16, lig_bond_cap=24, lig_radius_cap=144,
    rec_edge_cap=16 * 8, cross_cap=192, tor_cap=4, tor_edge_cap=48,
)
CFG = ScoreModelConfig(
    ns=8, nv=2, num_conv_layers=3, esm_embedding_dim=16, dropout=0.0,
    latent_dim=0, latent_droprate=0.0, compute_dtype="float32",
)


def _batch():
    return make_complex_batch(seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS,
                              esm_dim=16, c_alpha_max_neighbors=6)


class TestRematEquivalence:
    def _loss_and_grads(self, cfg, batch):
        from disco_diffdock_tpu.data.noise import apply_noise
        from disco_diffdock_tpu.train.losses import score_matching_loss

        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        variables = model.init(jax.random.PRNGKey(0), batch)
        sigma = SigmaSchedule()

        def loss_fn(params):
            noised, targets = apply_noise(
                jax.random.PRNGKey(7), batch, sigma, 1.0, 1.0, False,
                graph_ids=jnp.arange(batch.num_graphs))
            t = noised.complex_t["tr"]
            tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                noised, deterministic=True, use_running_average=False,
                mutable=["batch_stats"])
            loss, _ = score_matching_loss(preds, targets, noised, tr_s, rot_s)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        return float(loss), jax.device_get(grads)

    def test_loss_and_grads_match(self):
        """Same params, same batch, same keys: remat on/off produce the same
        loss and gradients (remat is a memory schedule, never a math change;
        tolerance covers XLA's different fusion/reassociation schedule)."""
        batch = _batch()
        loss0, g0 = self._loss_and_grads(CFG, batch)
        loss1, g1 = self._loss_and_grads(
            dataclasses.replace(CFG, remat=True), batch)
        assert loss0 == pytest.approx(loss1, rel=1e-5)
        flat0, _ = jax.flatten_util.ravel_pytree(g0)
        flat1, _ = jax.flatten_util.ravel_pytree(g1)
        scale = float(np.abs(flat0).max())
        np.testing.assert_allclose(np.asarray(flat1), np.asarray(flat0),
                                   rtol=1e-3, atol=1e-5 * max(scale, 1.0))

    def test_forward_match(self):
        """Inference forward (no grad) is unaffected by the flag."""
        batch = _batch().set_time(0.5, 0.5, 0.5)
        m0 = TensorProductScoreModel(cfg=CFG, caps=CAPS)
        variables = m0.init(jax.random.PRNGKey(0), batch)
        m1 = TensorProductScoreModel(
            cfg=dataclasses.replace(CFG, remat=True), caps=CAPS)
        out0 = m0.apply(variables, batch, deterministic=True,
                        use_running_average=True)
        out1 = m1.apply(variables, batch, deterministic=True,
                        use_running_average=True)
        for a, b in zip(out0, out1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_wrapper_with_dropout_trains(self):
        """The DisCo wrapper (encoder + gumbel + droprate + score) with
        dropout ON under remat: the explicit-bernoulli dropout inside the
        checkpoint must draw its key outside and produce a finite,
        decreasing-ish loss over a few steps."""
        from disco_diffdock_tpu.models.wrapper import ModelWrapper
        from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

        cfg = dataclasses.replace(
            CFG, dropout=0.1, latent_dim=2, latent_droprate=0.1, remat=True)
        enc_cfg = EncoderConfig(ns=8, nv=2, num_conv_layers=3,
                                esm_embedding_dim=16, dropout=0.1, remat=True)
        batch = _batch()
        model = ModelWrapper(score_cfg=cfg, encoder_cfg=enc_cfg, caps=CAPS,
                             latent_droprate=cfg.latent_droprate)
        rngs = {"params": jax.random.PRNGKey(0),
                "gumbel": jax.random.PRNGKey(1),
                "droprate": jax.random.PRNGKey(2),
                "dropout": jax.random.PRNGKey(3)}
        variables = model.init(rngs, batch, deterministic=False)
        tx = optax.adam(1e-3)
        state = TrainState.create(variables, tx)
        step = jax.jit(make_wrapper_train_step(model, tx, SigmaSchedule(),
                                               1.0, 1.0))
        key = jax.random.PRNGKey(9)
        losses = []
        for i in range(3):
            key, k = jax.random.split(key)
            state, aux = step(state, batch, k)
            losses.append(float(aux["loss"]))
        assert all(np.isfinite(losses)), losses

    def test_dropout_key_advances(self):
        """Under remat with dropout on, two different dropout keys give
        different losses (the bernoulli mask is actually applied)."""
        cfg = dataclasses.replace(CFG, dropout=0.3, remat=True)
        batch = _batch().set_time(0.5, 0.5, 0.5)
        model = TensorProductScoreModel(cfg=cfg, caps=CAPS)
        variables = model.init(jax.random.PRNGKey(0), batch)

        def fwd(seed):
            out = model.apply(
                variables, batch, deterministic=False,
                use_running_average=True,
                rngs={"dropout": jax.random.PRNGKey(seed)})
            return float(jnp.sum(out[0] ** 2))

        assert fwd(1) != fwd(2)
