"""End-to-end learning validation: overfit the score model on one synthetic
complex, then run the 20-step sampler from randomized poses.

This exercises every convention in the chain -- noise transform targets,
sigma-normalized loss, score directions, Euler-Maruyama drift signs, manifold
conformer updates -- and passes only if they are all mutually consistent.
Measured result on one TPU v5e-class chip (~20 min):

    initial RMSD: mean 27.9   ->   final RMSD: mean 2.0, 44% < 2A, 100% < 5A

Run: python scripts/validate_learning.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np, optax
from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling
from disco_diffdock_tpu.train.steps import TrainState, make_train_step

caps = GraphCaps(max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
                 rec_edge_cap=32*8, cross_cap=192, tor_cap=4, tor_edge_cap=48)
cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                       dropout=0.0, latent_dim=0, latent_droprate=0.0)
sigma = SigmaSchedule()
# 16 copies of ONE complex; poses perturbed fresh each step by the noiser
batch = make_complex_batch(seed=0, batch=16, n_lig=12, n_res=24, caps=caps,
                           esm_dim=16, c_alpha_max_neighbors=8, same_complex=True)
model = TensorProductScoreModel(cfg=cfg, caps=caps)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
tx = optax.adam(2e-3)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, tx, sigma))

# training scan: 100 steps per jitted call
@jax.jit
def train100(state, key):
    def body(carry, k):
        st, = carry
        st, aux = step(st, batch, k)
        return (st,), aux["loss"]
    keys = jax.random.split(key, 100)
    (state,), losses = jax.lax.scan(body, (state,), keys)
    return state, losses

t0=time.time()
for i in range(8):
    state, losses = train100(state, jax.random.PRNGKey(100+i))
    print(f"steps {(i+1)*100}: loss {float(losses[-10:].mean()):.4f} ({time.time()-t0:.0f}s)", flush=True)

# now sample from scratch
scfg = SamplerConfig(inference_steps=20, no_final_step_noise=True)
vars_ema = {"params": state.ema.shadow, "batch_stats": state.batch_stats}
@jax.jit
def sample(b, key):
    k1, k2 = jax.random.split(key)
    rb = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
    final, _, _ = sampling(model, vars_ema, rb, k2, scfg, sigma)
    return rb.lig_pos, final.lig_pos

init_pos, final_pos = sample(batch, jax.random.PRNGKey(999))
m = np.asarray(batch.lig_mask[0])
true = np.asarray(batch.extras["orig_pos"])[:, m]
def rmsds(p):
    p = np.asarray(p)[:, m]
    return np.sqrt(((p - true)**2).sum(-1).mean(-1))
r0, r1 = rmsds(init_pos), rmsds(final_pos)
print(f"initial RMSD: mean {r0.mean():.2f} (min {r0.min():.2f})")
print(f"final RMSD:   mean {r1.mean():.2f} (min {r1.min():.2f}); <2A: {(r1<2).mean()*100:.0f}%  <5A: {(r1<5).mean()*100:.0f}%")
