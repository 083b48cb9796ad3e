"""Training-STEP parity vs the differentiable torch oracle.

Forward parity (test_parity_full_model.py) pins the score functions; this
file closes the remaining training-loop gap: one full optimization step of
the shipped train step -- loss value, parameter GRADIENTS (torch autograd on
the oracle), the Adam update, the batch-norm statistic updates, and the EMA
shadow -- must match a from-scratch twin of the reference's

  * ``loss_function`` (utils/training.py:14-61): sigma-normalized
    3-component MSE with per-graph torsion aggregation,
  * ``train_epoch``'s backward + optimizer step (utils/training.py:96-135),
  * ``ExponentialMovingAverage`` (utils/utils.py:117-199, train.py:110),

computed in float64 torch on dynamically-built (unpadded) graphs.  Training
mode means the batch norms consume JOINT batch statistics across the graphs
of the batch -- the per-graph oracle generators are driven in lockstep so
every BN site normalizes with statistics pooled over all graphs, exactly
like the flax model does over the padded masked batch.

Covers the bare score model (reference train.py without latents) and the
full DisCo ModelWrapper (TPEncoder + straight-through Gumbel latents +
latent droprate CFG masking, models/model_classes.py:53-85) including the
straight-through gradient path into the encoder.
"""
from __future__ import annotations

import dataclasses
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from disco_diffdock_tpu.config import EncoderConfig, ScoreModelConfig
from disco_diffdock_tpu.data.noise import apply_noise
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom import so3, torus
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.models.wrapper import ModelWrapper
from disco_diffdock_tpu.train.losses import score_matching_loss
from disco_diffdock_tpu.train.steps import TrainState, make_train_step
from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

from tests.test_parity_full_model import (
    CAPS, CFG, _prefix_sites, _randomize, _unpad_graph, drive_joint,
    make_bn_train_joint, oracle_encoder_trunk_gen, oracle_forward_gen,
    t_latent_mlp_gen)

LR = 1e-3
# larger-than-default Adam eps: at step 1 the update is lr*g/(|g|+eps), and
# with the default 1e-8 the update degenerates to lr*sign(g) -- any f32-vs
# -f64 wobble on a near-zero gradient would flip a sign and move a parameter
# by 2*lr, testing float noise instead of the step plumbing.  eps=1e-2 keeps
# the update a SMOOTH function of the gradient; the optax-vs-twin math being
# pinned is identical at any eps.
EPS = 1e-2


# ---------------------------------------------------------------------------
# torch parameter trees, gradient collection, tree comparison
# ---------------------------------------------------------------------------


def torch_tree(tree):
    """Nested dict of arrays -> requires_grad float64 torch leaves."""
    if isinstance(tree, dict):
        return {k: torch_tree(v) for k, v in tree.items()}
    t = torch.tensor(np.asarray(tree), dtype=torch.float64)
    t.requires_grad_(True)
    return t


def grad_tree(ttree):
    if isinstance(ttree, dict):
        return {k: grad_tree(v) for k, v in ttree.items()}
    g = ttree.grad
    return np.zeros(ttree.shape) if g is None else g.detach().numpy()


def assert_tree_close(got, want, rtol, atol_scale, path=""):
    """got (jax/np tree) vs want (np tree), per-leaf scaled tolerance."""
    if isinstance(want, dict):
        assert set(got.keys()) == set(want.keys()), path
        for k in want:
            assert_tree_close(got[k], want[k], rtol, atol_scale, f"{path}/{k}")
        return
    w = np.asarray(want)
    # scale floor 1e-3: a leaf whose oracle values are pure cancellation
    # noise (e.g. a BN bias grad ~1e-18 where the jax f32 side carries
    # ~1e-11 roundoff) is compared at a small ABSOLUTE tolerance instead of
    # a meaningless relative one; real defects move values by O(the live
    # magnitudes), far above atol_scale * 1e-3
    scale = max(float(np.abs(w).max()) if w.size else 0.0, 1e-3)
    np.testing.assert_allclose(np.asarray(got), w, rtol=rtol,
                               atol=atol_scale * scale, err_msg=path)


def walk(tree, site):
    for k in site:
        tree = tree[k]
    return tree


def bn_sites(stats, path=()):
    """All BN-site paths (dicts holding a 'var' leaf) in a batch_stats tree."""
    if isinstance(stats, dict):
        if "var" in stats:
            yield path
        else:
            for k, v in stats.items():
                yield from bn_sites(v, path + (k,))


# ---------------------------------------------------------------------------
# torch twins: loss, Adam, EMA
# ---------------------------------------------------------------------------


def torch_loss(outs, noised, targets, B, weights=(0.33, 0.33, 0.33)):
    """Twin of score_matching_loss (train/losses.py; reference
    utils/training.py:14-53): per-graph oracle preds ``outs`` ->
    (loss, components) in torch f64."""
    tvals = np.asarray(noised.complex_t["tr"], np.float64)
    sigma = SigmaSchedule()
    tr_sig, rot_sig, _ = sigma.t_to_sigma(tvals, tvals, tvals)
    rot_norm = np.asarray(so3.score_norm(jnp.asarray(rot_sig, jnp.float32)),
                          np.float64)
    tor_norm2 = np.asarray(torus.score_norm(targets["tor_sigma"]), np.float64)
    tr_t = np.asarray(targets["tr_score"], np.float64)
    rot_t = np.asarray(targets["rot_score"], np.float64)
    tor_t = np.asarray(targets["tor_score"], np.float64)
    tm = np.asarray(noised.tor_mask)

    ng = float(B) + 1e-12
    nt = float(tm.sum()) + 1e-4
    tr_loss = rot_loss = tor_loss = 0.0
    for gi, (tr_p, rot_p, tor_p) in enumerate(outs):
        tr_loss = tr_loss + ((tr_p - torch.from_numpy(tr_t[gi])) ** 2).mean() \
            * float(tr_sig[gi]) ** 2 / ng
        rot_loss = rot_loss + (((rot_p - torch.from_numpy(rot_t[gi]))
                                / float(rot_norm[gi])) ** 2).mean() / ng
        Rg = int(tm[gi].sum())
        if Rg:
            tor_loss = tor_loss + (
                (tor_p[:Rg] - torch.from_numpy(tor_t[gi][:Rg])) ** 2
                / float(tor_norm2[gi])).sum() / nt
    if not torch.is_tensor(tor_loss):
        tor_loss = torch.zeros((), dtype=torch.float64)
    loss = weights[0] * tr_loss + weights[1] * rot_loss + weights[2] * tor_loss
    return loss, dict(tr_loss=tr_loss, rot_loss=rot_loss, tor_loss=tor_loss)


def adam_twin(p0, g, lr=LR, b1=0.9, b2=0.999, eps=EPS):
    """optax.adam at step 1: mu_hat = g, nu_hat = g^2 (bias corrections
    cancel), update = -lr * g / (sqrt(g^2) + eps)."""
    if isinstance(p0, dict):
        return {k: adam_twin(p0[k], g[k], lr, b1, b2, eps) for k in p0}
    p0 = np.asarray(p0, np.float64)
    return p0 - lr * g / (np.sqrt(g * g) + eps)


def ema_twin(shadow0, p1, n=1, decay=0.999):
    """ExponentialMovingAverage.update twin (utils/utils.py:117-199):
    warmup decay min(decay, (1+n)/(10+n)), s <- s - (1-d)(s - p)."""
    d = min(decay, (1.0 + n) / (10.0 + n))
    if isinstance(shadow0, dict):
        return {k: ema_twin(shadow0[k], p1[k], n, decay) for k in shadow0}
    s = np.asarray(shadow0, np.float64)
    return s - (1.0 - d) * (s - np.asarray(p1, np.float64))


def check_bn_updates(old_stats, new_stats, captured, momentum=0.1,
                     rtol=3e-4, atol_scale=3e-5):
    """Every BN site's running stats must advance by the momentum rule with
    the oracle's joint batch statistics; and the oracle must have visited
    EVERY site (no silently skipped batch norm)."""
    sites = set(bn_sites(old_stats))
    assert sites == set(captured), (
        f"BN site mismatch: jax-only {sites - set(captured)}, "
        f"oracle-only {set(captured) - sites}")
    for site, (bmean, bvar) in captured.items():
        old = walk(old_stats, site)
        new = walk(new_stats, site)
        want_var = ((1 - momentum) * np.asarray(old["var"], np.float64)
                    + momentum * bvar.detach().numpy())
        assert_tree_close(new["var"], want_var, rtol, atol_scale,
                          "/".join(site) + "/var")
        if "mean" in old:
            want_mean = ((1 - momentum) * np.asarray(old["mean"], np.float64)
                         + momentum * bmean.detach().numpy())
            assert_tree_close(new["mean"], want_mean, rtol, atol_scale,
                              "/".join(site) + "/mean")


# ---------------------------------------------------------------------------
# test 1: bare score model (reference train.py without latents)
# ---------------------------------------------------------------------------


class TestScoreModelTrainStep:
    def test_one_step(self):
        batch = make_complex_batch(
            seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6)
        B = batch.num_graphs
        model = TensorProductScoreModel(cfg=CFG, caps=CAPS)
        variables = _randomize(model.init(jax.random.PRNGKey(0), batch))
        sigma = SigmaSchedule()
        tx = optax.adam(LR, eps=EPS)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, sigma, 1.0, 1.0)

        key = jax.random.PRNGKey(7)
        new_state, aux = step(state, batch, key)

        # --- replicate the step's internal noise draw (steps.py train_step)
        k_noise, k_drop = jax.random.split(key)
        noised, targets = apply_noise(
            k_noise, batch, sigma, 1.0, 1.0, False, graph_ids=jnp.arange(B))
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)

        # --- jax reference gradients (identical loss_fn to the step)
        def loss_fn(params):
            preds, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noised, deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs={"dropout": k_drop})
            loss, laux = score_matching_loss(
                preds, targets, noised, tr_s, rot_s)
            return loss, (laux, mut["batch_stats"])

        (jloss, (jaux, _)), jgrads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # the replication must be exact: the real step saw this same loss
        np.testing.assert_allclose(float(aux["loss"]), float(jloss),
                                   rtol=1e-6, err_msg="noise replication")

        # --- torch oracle: joint-BN training forward + autograd
        tparams = torch_tree(jax.tree.map(np.asarray, state.params))
        tvals = np.asarray(t)
        gens = [
            oracle_forward_gen(tparams, CFG, sigma, _unpad_graph(noised, gi),
                               float(tvals[gi]))
            for gi in range(B)
        ]
        bn_fn, captured = make_bn_train_joint(tparams)
        outs = drive_joint(gens, bn_fn)
        tloss, tcomps = torch_loss(outs, noised, targets, B)

        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=3e-4,
                                   err_msg="train loss")
        for k in ("tr_loss", "rot_loss", "tor_loss"):
            np.testing.assert_allclose(float(jaux[k]), tcomps[k].item(),
                                       rtol=5e-4, atol=1e-7, err_msg=k)

        tloss.backward()
        tgrads = grad_tree(tparams)
        assert_tree_close(jgrads, tgrads, rtol=2e-3, atol_scale=2e-4,
                          path="grads")

        # --- batch-stat momentum updates (flax momentum=0.1)
        check_bn_updates(jax.tree.map(np.asarray, state.batch_stats),
                         jax.tree.map(np.asarray, new_state.batch_stats),
                         captured)

        # --- Adam update on the oracle gradients
        p0 = jax.tree.map(np.asarray, state.params)
        p1_twin = adam_twin(p0, tgrads)
        assert_tree_close(jax.tree.map(np.asarray, new_state.params), p1_twin,
                          rtol=1e-5, atol_scale=1e-5, path="post-step params")

        # --- EMA shadow (against the jax post-step params: isolates the
        # shadow-update rule itself at f32 exactness)
        p1 = jax.tree.map(np.asarray, new_state.params)
        shadow_twin = ema_twin(p0, p1)
        assert_tree_close(jax.tree.map(np.asarray, new_state.ema.shadow),
                          shadow_twin, rtol=1e-6, atol_scale=1e-6, path="ema")
        assert int(new_state.ema.num_updates) == 1
        assert int(new_state.step) == 1


# ---------------------------------------------------------------------------
# test 2: the DisCo ModelWrapper (encoder + gumbel latents + droprate CFG)
# ---------------------------------------------------------------------------

TEMP = 1.0  # training gumbel temperature (ModelWrapper default)
DROPRATE = 0.8  # with the deterministic bernoulli below: graph0 keep, graph1 drop


def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
    """Deterministic, key-independent stand-in for jax.random.uniform: makes
    the gumbel noise reproducible in the torch twin.  (Both sides consume
    identical draws; randomness is not what this test pins.)"""
    return jnp.asarray(fake_uniform_np(shape), dtype) * (maxval - minval) + minval


def fake_uniform_np(shape):
    n = int(np.prod(shape)) if shape else 1
    vals = ((np.arange(n) * 37 % 101) + 1.0) / 103.0
    return vals.reshape(shape) if shape else vals[0]


def fake_bernoulli(key, p=0.5, shape=()):
    """Deterministic droprate mask: alternating keep/drop by position."""
    n = int(np.prod(shape))
    return jnp.reshape(jnp.arange(n) % 2 == 0, shape)


class TestWrapperTrainStep:
    def test_one_step(self, monkeypatch):
        monkeypatch.setattr(jax.random, "uniform", fake_uniform)
        monkeypatch.setattr(jax.random, "bernoulli", fake_bernoulli)

        scfg = dataclasses.replace(CFG, latent_dim=2, latent_vocab=1,
                                   latent_droprate=DROPRATE)
        ecfg = EncoderConfig(
            ns=4, nv=2, num_conv_layers=3, esm_embedding_dim=6, dropout=0.0,
            latent_dim=2, latent_hidden_dim=16)
        batch = make_complex_batch(
            seed=3, batch=2, n_lig=10, n_res=14, caps=CAPS, esm_dim=6,
            c_alpha_max_neighbors=6)
        B, NL = batch.lig_x.shape[:2]
        model = ModelWrapper(score_cfg=scfg, encoder_cfg=ecfg, caps=CAPS,
                             latent_droprate=DROPRATE,
                             training_latent_temperature=TEMP)
        init_rngs = {"params": jax.random.PRNGKey(0),
                     "gumbel": jax.random.PRNGKey(1),
                     "droprate": jax.random.PRNGKey(2),
                     "dropout": jax.random.PRNGKey(3)}
        variables = _randomize(model.init(init_rngs, batch, deterministic=False))
        sigma = SigmaSchedule()
        tx = optax.adam(LR, eps=EPS)
        state = TrainState.create(variables, tx, ema_scope="score_model")
        step = make_wrapper_train_step(model, tx, sigma, 1.0, 1.0)

        key = jax.random.PRNGKey(11)
        new_state, aux = step(state, batch, key)

        # --- replicate the step's internal noise draw (train_score.py step)
        k_noise, k_drop, k_gum, k_rate = jax.random.split(key, 4)
        noised, targets = apply_noise(
            k_noise, batch, sigma, 1.0, 1.0, False, graph_ids=jnp.arange(B))
        t = noised.complex_t["tr"]
        tr_s, rot_s, _ = sigma.t_to_sigma(t, t, t)
        rngs = {"dropout": k_drop, "gumbel": k_gum, "droprate": k_rate}

        def loss_fn(params):
            preds, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noised, deterministic=False, use_running_average=False,
                mutable=["batch_stats"], rngs=rngs)
            loss, laux = score_matching_loss(
                preds, targets, noised, tr_s, rot_s)
            return loss, (laux, mut["batch_stats"])

        (jloss, (jaux, _)), jgrads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        np.testing.assert_allclose(float(aux["loss"]), float(jloss),
                                   rtol=1e-6, err_msg="noise replication")

        # --- torch oracle
        tparams = torch_tree(jax.tree.map(np.asarray, state.params))
        tvals = np.asarray(t)
        NR = batch.rec_x.shape[1]
        Ld = ecfg.latent_dim
        U = fake_uniform_np((B, Ld, NL + NR))  # the gumbel draw, replicated
        keep = [1.0 if i % 2 == 0 else 0.0 for i in range(B)]  # fake_bernoulli

        def wrapper_gen(gi):
            g = _unpad_graph(noised, gi)
            nl, nr = len(g["lig_pos"]), len(g["rec_pos"])
            om = np.asarray(batch.lig_mask[gi])
            orig = np.asarray(batch.extras["orig_pos"][gi])[om]
            attrs = yield from _prefix_sites(
                oracle_encoder_trunk_gen(tparams["encoder"], ecfg, g, orig),
                ("encoder",))
            ns = ecfg.ns

            def scalars(a):
                if ecfg.num_conv_layers >= 3:
                    return torch.cat([a[:, :ns], a[:, -ns:]], -1)
                return a[:, :ns]

            pl = yield from _prefix_sites(
                t_latent_mlp_gen(tparams["encoder"]["latent_s_predictor"],
                                 ecfg.latent_hidden_dim, scalars(attrs["lig"])),
                ("encoder", "latent_s_predictor"))
            pr = yield from _prefix_sites(
                t_latent_mlp_gen(tparams["encoder"]["latent_r_predictor"],
                                 ecfg.latent_hidden_dim, scalars(attrs["rec"])),
                ("encoder", "latent_r_predictor"))
            logits = torch.cat([pl, pr], 0).T  # (Ld, nl+nr)
            # gumbel straight-through (nn/basic.py gumbel_softmax; reference
            # models/layers.py:152-181) with the SAME injected uniforms at
            # the real padded positions
            u = torch.from_numpy(np.concatenate(
                [U[gi][:, :nl], U[gi][:, NL:NL + nr]], -1))
            gn = -torch.log(-torch.log(u + 1e-20) + 1e-20)
            y = torch.softmax((logits + gn) / TEMP, -1)
            y_hard = torch.nn.functional.one_hot(
                torch.argmax(y, -1), y.shape[-1]).to(y.dtype)
            lat = (y_hard - y.detach() + y).T  # (nl+nr, Ld)
            # latent droprate (models/model_classes.py:70-83): dropped graphs
            # get zeroed latents + the unconditional CFG embeddings
            lat_l, lat_r = lat[:nl] * keep[gi], lat[nl:] * keep[gi]
            return (yield from _prefix_sites(
                oracle_forward_gen(tparams["score_model"], scfg, sigma, g,
                                   float(tvals[gi]), lat=(lat_l, lat_r),
                                   unconditional=(keep[gi] == 0.0)),
                ("score_model",)))

        gens = [wrapper_gen(gi) for gi in range(B)]
        bn_fn, captured = make_bn_train_joint(tparams)
        outs = drive_joint(gens, bn_fn)
        tloss, tcomps = torch_loss(outs, noised, targets, B)

        np.testing.assert_allclose(float(jloss), tloss.item(), rtol=3e-4,
                                   err_msg="wrapper train loss")
        for k in ("tr_loss", "rot_loss", "tor_loss"):
            np.testing.assert_allclose(float(jaux[k]), tcomps[k].item(),
                                       rtol=5e-4, atol=1e-7, err_msg=k)

        tloss.backward()
        tgrads = grad_tree(tparams)
        # the straight-through path must carry gradient into the encoder
        # through graph0's latents (graph1 is dropped)
        enc_gnorm = math.sqrt(sum(
            float((np.asarray(g) ** 2).sum())
            for g in jax.tree.leaves(tgrads["encoder"])))
        assert enc_gnorm > 1e-8, "no gradient reached the encoder"
        assert_tree_close(jgrads, tgrads, rtol=2e-3, atol_scale=2e-4,
                          path="grads")

        check_bn_updates(jax.tree.map(np.asarray, state.batch_stats),
                         jax.tree.map(np.asarray, new_state.batch_stats),
                         captured)

        p0 = jax.tree.map(np.asarray, state.params)
        p1_twin = adam_twin(p0, tgrads)
        assert_tree_close(jax.tree.map(np.asarray, new_state.params), p1_twin,
                          rtol=1e-5, atol_scale=1e-5, path="post-step params")

        # --- EMA: score-model subtree shadowed, encoder tracks live params
        # (reference EMAs the score model only, train.py:110)
        p1 = jax.tree.map(np.asarray, new_state.params)
        shadow = jax.tree.map(np.asarray, new_state.ema.shadow)
        shadow_twin = ema_twin(p0["score_model"], p1["score_model"])
        assert_tree_close(shadow["score_model"], shadow_twin,
                          rtol=1e-6, atol_scale=1e-6, path="ema score_model")
        assert_tree_close(shadow["encoder"], p1["encoder"],
                          rtol=0, atol_scale=0, path="ema encoder passthrough")
