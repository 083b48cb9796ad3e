"""Training-step smoke tests (CPU, tiny sizes): loss finite and decreasing."""
import jax
import numpy as np
import optax

from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.train.ema import EMAState
from disco_diffdock_tpu.train.steps import TrainState, make_eval_step, make_train_step

from tests.test_score_model import small_batch, small_caps, small_cfg


def test_train_step_decreases_loss():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch(batch=4)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(2e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, SigmaSchedule()))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        # fixed noise key: pure optimization on one noise draw must descend
        state, aux = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 12


def test_eval_step_and_ema():
    cfg = small_cfg()
    model = TensorProductScoreModel(cfg=cfg, caps=small_caps())
    batch = small_batch(batch=2)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx)
    ev = make_eval_step(model, SigmaSchedule())
    aux = ev(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    aux_ema = ev(state, batch, jax.random.PRNGKey(2), ema=True)
    # before any update, EMA shadow == params
    np.testing.assert_allclose(float(aux_ema["loss"]), float(aux["loss"]), rtol=1e-5)


def test_ema_warmup_decay():
    params = {"w": jax.numpy.ones(3)}
    ema = EMAState.create(params, decay=0.999)
    new_params = {"w": jax.numpy.zeros(3)}
    ema = ema.update(new_params)
    # first update: decay = min(0.999, 2/11); shadow = d*1 + (1-d)*0 = 2/11
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]), 2.0 / 11.0, rtol=1e-5)
