"""Confidence-pipeline learning validation on one synthetic complex (on-chip).

The reranking story end to end: (1) PARTIALLY train a score model so its
sampled poses span good and bad RMSDs; (2) phase-1 pose generation with the
full reverse-diffusion sampler + RMSD labels; (3) phase-2 all-atom
confidence training (BCE on rmsd < 2 A); (4) the trained confidence model
must rank HELD-OUT sampled poses by quality (ROC-AUC well above chance)
and its top-1 pick must beat the pose average.

Measured on one TPU v5e-class chip (~20 min): 96 phase-1 poses spanning
[0.35, 64] A (43 positives), confidence BCE loss 0.22 after 40 epochs,
held-out ROC-AUC 0.800, and the top-1 confidence pick IS the best
available held-out pose (0.66 A vs pose mean 2.18 A).

Run: python scripts/validate_confidence_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.all_atom_score_model import AllAtomScoreModel
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.sampling import SamplerConfig
from disco_diffdock_tpu.train.steps import TrainState, make_train_step
from disco_diffdock_tpu.train.train_confidence import (
    generate_confidence_dataset, make_confidence_train_step, roc_auc)

caps = GraphCaps(max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
                 rec_edge_cap=32 * 8, cross_cap=192, tor_cap=4, tor_edge_cap=48,
                 max_atoms=256, atom_edge_cap=256 * 8, la_cap=256)
cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                       dropout=0.0, latent_dim=0, latent_droprate=0.0)
sigma = SigmaSchedule()
batch = make_complex_batch(seed=0, batch=16, n_lig=12, n_res=24, caps=caps,
                           esm_dim=16, c_alpha_max_neighbors=8,
                           same_complex=True, all_atoms=True)

# ---- stage 1: PARTIAL score training (pose quality must be mixed) ----------
model = TensorProductScoreModel(cfg=cfg, caps=caps)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
tx = optax.adam(2e-3)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, tx, sigma, 1.0, 1.0))


@jax.jit
def train100(state, key):
    def body(c, k):
        st, = c
        st, aux = step(st, batch, k)
        return (st,), aux["loss"]
    (state,), losses = jax.lax.scan(body, (state,), jax.random.split(key, 100))
    return state, losses


t0 = time.time()
for i in range(4):
    state, losses = train100(state, jax.random.PRNGKey(100 + i))
    print(f"score steps {(i + 1) * 100}: loss {float(losses[-10:].mean()):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)
score_vars = {"params": state.ema.shadow, "batch_stats": state.batch_stats}

# ---- stage 2: phase-1 pose generation + RMSD labels -------------------------
scfg = SamplerConfig(inference_steps=20, no_final_step_noise=True)
N_BATCHES = 6
data = generate_confidence_dataset(
    model, score_vars, [batch] * N_BATCHES, scfg, sigma, jax.random.PRNGKey(7))
rmsds = np.concatenate([d[1] for d in data])
n_pos = int((rmsds < 2).sum())
print(f"phase 1: {len(rmsds)} poses, rmsd range [{rmsds.min():.2f}, "
      f"{rmsds.max():.2f}], {n_pos} positives (<2A)", flush=True)

# ---- stage 3: phase-2 all-atom confidence training --------------------------
conf_cfg = ScoreModelConfig(ns=12, nv=3, num_conv_layers=3, sh_lmax=2,
                            esm_embedding_dim=16, dropout=0.0,
                            confidence_mode=True, all_atoms=True,
                            latent_dim=0, latent_droprate=0.0)
conf_model = AllAtomScoreModel(cfg=conf_cfg, caps=caps)
b0 = batch.set_time(0.0, 0.0, 0.0)
conf_vars = jax.jit(conf_model.init)(jax.random.PRNGKey(2), b0)
ctx = optax.adam(3e-4)
cstate = TrainState.create(conf_vars, ctx)
cstep = jax.jit(make_confidence_train_step(conf_model, ctx, "bce"))
eval_fn = jax.jit(
    lambda v, b: conf_model.apply(v, b, deterministic=True, use_running_average=True))

# train on the first N-1 pose batches; hold out the last
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(3)
train_data, held_out = data[:-1], data[-1]
for epoch in range(40):
    ms = []
    for pos, rmsd in train_data:
        idx = rng.randint(0, len(rmsd), batch.num_graphs)
        lab = (rmsd[idx] < 2.0).astype(np.float32)
        b = batch.replace(lig_pos=jnp.asarray(pos[idx])).set_time(0.0, 0.0, 0.0)
        key, k = jax.random.split(key)
        cstate, m = cstep(cstate, b, jnp.asarray(lab), k)
        ms.append(float(m["loss"]))
    if (epoch + 1) % 10 == 0:
        print(f"confidence epoch {epoch + 1}: loss {np.mean(ms):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

# ---- stage 4: held-out ranking quality --------------------------------------
pos_h, rmsd_h = held_out
b = batch.replace(lig_pos=jnp.asarray(pos_h)).set_time(0.0, 0.0, 0.0)
scores = np.asarray(eval_fn(
    {"params": cstate.params, "batch_stats": cstate.batch_stats}, b)).reshape(-1)
# label threshold: 2A as in the protocol, falling back to the held-out
# median when the pose draw leaves one class empty (AUC would be nan)
thr = 2.0
labels = (rmsd_h < thr).astype(np.float32)
if labels.min() == labels.max():
    thr = float(np.median(rmsd_h))
    labels = (rmsd_h < thr).astype(np.float32)
auc = roc_auc(labels, scores)
top1 = rmsd_h[np.argmax(scores)]
print("confidence pipeline (partial score -> pose cache -> all-atom reranker):")
print(f"held-out AUC {auc:.3f} (label: rmsd < {thr:.2f}); top-1 pick rmsd "
      f"{top1:.2f} vs pose mean {rmsd_h.mean():.2f} "
      f"(best available {rmsd_h.min():.2f})")
