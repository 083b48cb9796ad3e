"""Full AR-prior learning validation on one synthetic complex (on-chip).

The complete DisCo inference story without an oracle: (1) overfit the joint
encoder + score wrapper; (2) phase-1 AR labels from the trained encoder;
(3) phase-2 PretrainedScoreEncoder training on the trained score trunk
(frozen warmup, then unfrozen); (4) sequential ``encode_ar`` decode must
recover the encoder's latents; (5) sampling with AR latents must dock.

Measured on one TPU v5e-class chip (~12 min):
    teacher-forced AR accuracy 1.000 (loss 0.0004)
    sequential encode_ar accuracy 0.500 (own-sample feedback on the toy
    overfit; the sampler tolerates it)
    AR-latent sampling: initial RMSD 27.9 -> final 2.84 mean (min 1.58),
    100% < 5A  (oracle-latent baseline: 2.50 mean)

Run: python scripts/validate_ar_pipeline.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from disco_diffdock_tpu.config import EncoderConfig, GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.ar import PretrainedScoreEncoder, encode_ar
from disco_diffdock_tpu.models.encoder import TPEncoder
from disco_diffdock_tpu.models.wrapper import ModelWrapper
from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling
from disco_diffdock_tpu.train.steps import TrainState
from disco_diffdock_tpu.train.train_ar import (
    generate_ar_labels, make_ar_train_step, prepare_ar_sample)
from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

LATENT_DIM = 2
caps = GraphCaps(max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
                 rec_edge_cap=32 * 8, cross_cap=192, tor_cap=4, tor_edge_cap=48)
score_cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                             dropout=0.0, latent_dim=LATENT_DIM, latent_vocab=1,
                             latent_droprate=0.1)
enc_cfg = EncoderConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                        dropout=0.0, latent_dim=LATENT_DIM)
sigma = SigmaSchedule()
batch = make_complex_batch(seed=0, batch=16, n_lig=12, n_res=24, caps=caps,
                           esm_dim=16, c_alpha_max_neighbors=8, same_complex=True)

# ---- stage 1: overfit the joint wrapper ------------------------------------
model = ModelWrapper(score_cfg=score_cfg, encoder_cfg=enc_cfg, caps=caps,
                     latent_droprate=0.1)
rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
        "droprate": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
variables = jax.jit(lambda b: model.init(rngs, b, deterministic=False))(batch)
tx = optax.adam(2e-3)
state = TrainState.create(variables, tx)
step = jax.jit(make_wrapper_train_step(model, tx, sigma, 1.0, 1.0))


@jax.jit
def train100(state, key):
    def body(carry, k):
        st, = carry
        st, aux = step(st, batch, k)
        return (st,), aux["loss"]
    keys = jax.random.split(key, 100)
    (state,), losses = jax.lax.scan(body, (state,), keys)
    return state, losses


t0 = time.time()
for i in range(6):
    state, losses = train100(state, jax.random.PRNGKey(100 + i))
    print(f"wrapper steps {(i + 1) * 100}: loss {float(losses[-10:].mean()):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

vars_ema = {"params": state.ema.shadow, "batch_stats": state.batch_stats}

# ---- stage 2: phase-1 AR labels from the TRAINED encoder --------------------
import dataclasses as _dc

encoder = TPEncoder(cfg=_dc.replace(enc_cfg, apply_gumbel_softmax=False), caps=caps)
enc_vars = {"params": vars_ema["params"]["encoder"],
            "batch_stats": (vars_ema["batch_stats"] or {}).get("encoder", {})}
labels = generate_ar_labels(encoder, enc_vars, [batch], jax.random.PRNGKey(1))
soft, node_mask = labels[0]
print(f"phase 1: labels {soft.shape}", flush=True)

# ---- stage 3: phase-2 AR training on the trained score trunk ---------------
ar_model = PretrainedScoreEncoder(score_cfg=score_cfg, caps=caps, latent_dim=1,
                                  input_latent_dim=LATENT_DIM)
B, NL = batch.lig_x.shape[:2]
NR = batch.rec_x.shape[1]
lat0 = (jnp.zeros((B, NL, LATENT_DIM)), jnp.zeros((B, NR, LATENT_DIM)))
ar_vars = jax.jit(
    lambda b: ar_model.init(jax.random.PRNGKey(2), b, lat0, jnp.zeros((B,), jnp.int32))
)(batch)
params = dict(ar_vars["params"])
params["pretrained_score_model"] = vars_ema["params"]["score_model"]
ar_vars = {**ar_vars, "params": params}
if ar_vars.get("batch_stats"):
    stats = dict(ar_vars["batch_stats"])
    stats["pretrained_score_model"] = (vars_ema["batch_stats"] or {}).get("score_model", {})
    ar_vars = {**ar_vars, "batch_stats": stats}
ar_tx = optax.adam(1e-3)
ar_state = TrainState.create(ar_vars, ar_tx)
frozen = jax.jit(make_ar_train_step(ar_model, ar_tx, LATENT_DIM, trunk_frozen=True))
free = jax.jit(make_ar_train_step(ar_model, ar_tx, LATENT_DIM, trunk_frozen=False))

rng = np.random.RandomState(0)
key = jax.random.PRNGKey(3)
N_STEPS, WARMUP = 300, 100
for i in range(N_STEPS):
    if i == WARMUP:
        ar_state = ar_state.replace(opt_state=ar_tx.init(ar_state.params))
    key, k1, k2 = jax.random.split(key, 3)
    b2, lat, dec, lab = prepare_ar_sample(rng, batch, soft, node_mask, LATENT_DIM, k1)
    ar_state, m = (frozen if i < WARMUP else free)(
        ar_state, b2, lat, dec, lab, jnp.asarray(node_mask), k2)
    if (i + 1) % 100 == 0:
        print(f"AR steps {i + 1}: loss {float(m['loss']):.4f} "
              f"acc {float(m['accuracy']):.3f} ({time.time() - t0:.0f}s)", flush=True)

# ---- stage 4: sequential decode accuracy ------------------------------------
def apply_fn(b, lat, dec):
    out, _ = ar_model.apply(
        {"params": ar_state.params, "batch_stats": ar_state.batch_stats},
        b, lat, dec, mutable=["batch_stats"],
    )
    return out


lat_l, lat_r = encode_ar(apply_fn, batch, jax.random.PRNGKey(9), LATENT_DIM, 1000.0)
pred_nodes = np.concatenate([np.asarray(lat_l), np.asarray(lat_r)], 1).argmax(1)
true_nodes = np.where(np.asarray(node_mask)[:, None, :], np.asarray(soft), -np.inf).argmax(-1)
seq_acc = float((pred_nodes == true_nodes).mean())
print(f"sequential encode_ar accuracy: {seq_acc:.3f}")

# ---- stage 5: sample with AR latents ----------------------------------------
scfg = SamplerConfig(inference_steps=20, no_final_step_noise=True)


@jax.jit
def sample(b, key):
    k1, k2, k3 = jax.random.split(key, 3)
    latent = encode_ar(apply_fn, b, k3, LATENT_DIM, 1000.0)

    class _SV:
        @staticmethod
        def apply(v, bb, latent=None, unconditional=None, **kw):
            return model.apply(v, bb, method=lambda m, b2: m.score_model(
                b2, latent=latent, unconditional=unconditional,
                deterministic=True, use_running_average=True))
    rb = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
    final, _, _ = sampling(_SV, vars_ema, rb, k2, scfg, sigma, latent=latent)
    return rb.lig_pos, final.lig_pos


init_pos, final_pos = sample(batch, jax.random.PRNGKey(999))
m = np.asarray(batch.lig_mask[0])
true = np.asarray(batch.extras["orig_pos"])[:, m]


def rmsds(p):
    p = np.asarray(p)[:, m]
    return np.sqrt(((p - true) ** 2).sum(-1).mean(-1))


r0, r1 = rmsds(init_pos), rmsds(final_pos)
print("AR pipeline (trained encoder -> AR prior -> AR-latent sampling):")
print(f"initial RMSD: mean {r0.mean():.2f}; final RMSD: mean {r1.mean():.2f} "
      f"(min {r1.min():.2f}); <2A: {(r1 < 2).mean() * 100:.0f}%  "
      f"<5A: {(r1 < 5).mean() * 100:.0f}%")
