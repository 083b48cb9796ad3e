"""Learning validation through the REAL data path (on-chip).

The other validation scripts learn on synthetic batches; this one goes
through the actual featurization pipeline -- PDBBind-layout fixture
complexes parsed by minichem, conformer matching, torsion detection, kNN
receptor graphs, npz cache, collation -- then overfits the score model on
the two train complexes and docks them with the 20-step sampler.  Catches
sign/convention bugs the synthetic path cannot (real torsion masks, real
bond graphs, PDB parsing, centering).

Measured on one TPU v5e-class chip (~10 min, 2000 steps, joint 2-complex
overfit; loss 0.136):
    fix1: initial 27.1 A -> final mean 1.37 (min 0.50); 100% < 2 A
    fix2: initial 27.6 A -> final mean 1.51 (min 0.53); 75% < 2 A, 100% < 5 A
Two findings this validation caught, both now baked into the fixtures:
an IDEAL helix is a perfect screw (pose geometrically underdetermined;
the generator now breaks the symmetry), and a receptor without LM node
embeddings is nearly featureless (overfit stalls near 7 A) -- matching
the shipped models' reliance on ESM2 embeddings, so the fixtures ship a
deterministic stand-in npz exercised through esm_embeddings_path.

Run: python scripts/validate_fixture_training.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time

import jax
import numpy as np
import optax

from disco_diffdock_tpu.config import ScoreModelConfig
from disco_diffdock_tpu.data.collate import caps_from_datasets, collate, replicate_record
from disco_diffdock_tpu.data.pdbbind import PDBBind, PDBBindConfig
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.sampling import SamplerConfig, randomize_position, sampling
from disco_diffdock_tpu.train.steps import TrainState, make_train_step

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")

ds = PDBBind(PDBBindConfig(
    data_dir=os.path.join(_FIX, "pdbbind"),
    split_path=os.path.join(_FIX, "splits", "fixture_train"),
    cache_path=tempfile.mkdtemp(prefix="fixcache_"),
    esm_embeddings_path=os.path.join(_FIX, "esm_fixture.npz"),
))
caps = caps_from_datasets([ds])
print(f"featurized {len(ds)} fixture complexes; caps: {caps}")

ESM_DIM = 16
POSES = 8
recs = [ds[i] for i in range(len(ds))]
# train batch: the two complexes, each replicated 4x (noise diversity)
train_batch = collate([r for r in recs for _ in range(4)], caps, esm_dim=ESM_DIM)
# eval batch: POSES pose copies per complex
eval_batch = collate(
    [rr for r in recs for rr in replicate_record(r, POSES)], caps, esm_dim=ESM_DIM)

cfg = ScoreModelConfig(ns=16, nv=4, num_conv_layers=3, esm_embedding_dim=ESM_DIM,
                       dropout=0.0, latent_dim=0, latent_droprate=0.0)
sigma = SigmaSchedule()
model = TensorProductScoreModel(cfg=cfg, caps=caps)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), train_batch)
tx = optax.adam(2e-3)
state = TrainState.create(variables, tx)
step = jax.jit(make_train_step(model, tx, sigma, 1.0, 1.0))


@jax.jit
def train100(state, key):
    def body(carry, k):
        st, = carry
        st, aux = step(st, train_batch, k)
        return (st,), aux["loss"]
    keys = jax.random.split(key, 100)
    (state,), losses = jax.lax.scan(body, (state,), keys)
    return state, losses


t0 = time.time()
for i in range(20):
    state, losses = train100(state, jax.random.PRNGKey(100 + i))
    if (i + 1) % 4 == 0:
        print(f"steps {(i + 1) * 100}: loss {float(losses[-10:].mean()):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

vars_ema = {"params": state.ema.shadow, "batch_stats": state.batch_stats}
scfg = SamplerConfig(inference_steps=20, no_final_step_noise=True)


@jax.jit
def sample(b, key):
    k1, k2 = jax.random.split(key)
    rb = randomize_position(k1, b, False, False, sigma.tr_sigma_max)
    final, _, _ = sampling(model, vars_ema, rb, k2, scfg, sigma)
    return rb.lig_pos, final.lig_pos


init_pos, final_pos = sample(eval_batch, jax.random.PRNGKey(999))
init_pos, final_pos = np.asarray(init_pos), np.asarray(final_pos)
mask = np.asarray(eval_batch.lig_mask)
true = np.asarray(eval_batch.extras["orig_pos"])
d0 = np.sqrt((((init_pos - true) ** 2).sum(-1) * mask).sum(-1) / mask.sum(-1))
d1 = np.sqrt((((final_pos - true) ** 2).sum(-1) * mask).sum(-1) / mask.sum(-1))
print("real-data-path learning validation (fixture complexes):")
for ci, name in enumerate(r["name"] for r in recs):
    r1 = d1[ci * POSES : (ci + 1) * POSES]
    print(f"  {name}: initial {d0[ci * POSES:(ci + 1) * POSES].mean():.2f} A -> "
          f"final mean {r1.mean():.2f} (min {r1.min():.2f}); "
          f"<2A {(r1 < 2).mean() * 100:.0f}%  <5A {(r1 < 5).mean() * 100:.0f}%")
print(f"overall: final mean {d1.mean():.2f} A, <5A {(d1 < 5).mean() * 100:.0f}%")
