"""DisCo-pipeline learning validation: overfit the JOINT encoder + score
wrapper (gumbel latents, latent-droprate CFG training) on one synthetic
complex, then sample with oracle encoder latents.

Exercises the latent plumbing end to end (straight-through gradients,
droprate CFG, oracle-latent conditioning at inference).  Measured on one
TPU v5e-class chip (~15 min):

    initial RMSD mean 27.9 -> final 2.50 mean (min 1.20), 25% < 2A, 100% < 5A

Run: python scripts/validate_disco_pipeline.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np, optax
from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig, EncoderConfig
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.wrapper import ModelWrapper
from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling
from disco_diffdock_tpu.train.steps import TrainState
from disco_diffdock_tpu.train.train_score import make_wrapper_train_step

caps = GraphCaps(max_lig=16, max_rec=32, lig_bond_cap=36, lig_radius_cap=96,
                 rec_edge_cap=32*8, cross_cap=192, tor_cap=4, tor_edge_cap=48)
score_cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                             dropout=0.0, latent_dim=2, latent_vocab=1, latent_droprate=0.1)
enc_cfg = EncoderConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=16,
                        dropout=0.0, latent_dim=2)
sigma = SigmaSchedule()
batch = make_complex_batch(seed=0, batch=16, n_lig=12, n_res=24, caps=caps,
                           esm_dim=16, c_alpha_max_neighbors=8, same_complex=True)
model = ModelWrapper(score_cfg=score_cfg, encoder_cfg=enc_cfg, caps=caps, latent_droprate=0.1)
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

t0=time.time()
for i in range(7):
    state, losses = train100(state, jax.random.PRNGKey(100+i))
    print(f"steps {(i+1)*100}: loss {float(losses[-10:].mean()):.4f} ({time.time()-t0:.0f}s)", flush=True)

vars_ema = {"params": state.ema.shadow, "batch_stats": state.batch_stats}
scfg = SamplerConfig(inference_steps=20, no_final_step_noise=True)

@jax.jit
def sample(b, key):
    k1, k2, k3 = jax.random.split(key, 3)
    latent = model.apply(vars_ema, b, method=lambda m, bb: m.encoder(
        bb, latent_temperature=0.01, apply_gumbel=True,
        deterministic=True, use_running_average=True), rngs={"gumbel": k3})

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
    return np.sqrt(((p - true)**2).sum(-1).mean(-1))
r0, r1 = rmsds(init_pos), rmsds(final_pos)
print(f"DisCo pipeline (encoder latents + CFG droprate training):")
print(f"initial RMSD: mean {r0.mean():.2f}; final RMSD: mean {r1.mean():.2f} "
      f"(min {r1.min():.2f}); <2A: {(r1<2).mean()*100:.0f}%  <5A: {(r1<5).mean()*100:.0f}%")
