"""Tiny-data convergence A/B: JAX training vs the differentiable torch twin.

The strongest docking-quality evidence available in an environment with no
PDBBind tree and no reference weights (VERDICT r4 #3): train the flagship
-dimension score model (ns=24/nv=6/5 conv layers, the shipped
DisCo-DiffDock-S scale) with the REAL shipped train step, and train the
float64 plain-torch oracle twin (tests/test_parity_full_model.py) from the
same initial parameters on the IDENTICAL fixture dataset with SHARED noise
draws, for a few hundred steps.  If the two loss trajectories track each
other and the post-training sampled poses agree, every ingredient of
training -- forward, loss (reference utils/training.py:14-61), backward,
Adam (train.py:22-90), batch-norm statistics -- is converging identically,
not just matching on one step.

Run:  python benchmarks/convergence_ab.py --steps 200
Artifacts: benchmarks/convergence_ab.json + benchmarks/convergence_ab.md
CI subset: tests/test_convergence_ab.py (20 steps via run_ab()).

Both sides run on CPU in this script (f32 jax vs f64 torch): the A/B pins
MATH, not hardware; TPU bf16 matmul defaults would add unrelated noise.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
import torch

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from disco_diffdock_tpu.config import GraphCaps, ScoreModelConfig
from disco_diffdock_tpu.data.noise import apply_noise
from disco_diffdock_tpu.data.synthetic import make_complex_batch
from disco_diffdock_tpu.geom.diffusion import SigmaSchedule, get_t_schedule
from disco_diffdock_tpu.models.score_model import TensorProductScoreModel
from disco_diffdock_tpu.sampling import SamplerConfig, sampling
from disco_diffdock_tpu.train.steps import TrainState, make_train_step

from tests.test_parity_full_model import (
    _unpad_graph, drive_joint, make_bn_train_joint, oracle_forward,
    oracle_forward_gen)
from tests.test_parity_torch import _oracle_modify_conformer
from tests.test_parity_train_step import grad_tree, torch_loss, torch_tree

CAPS = GraphCaps(
    max_lig=12, max_rec=16, lig_bond_cap=30, lig_radius_cap=12 * 11,
    rec_edge_cap=16 * 8, cross_cap=12 * 16, tor_cap=4, tor_edge_cap=4 * 12,
)
# shipped DisCo-DiffDock-S score-model dims; dropout off (the torch twin is
# deterministic) and no latents (the wrapper's gumbel path has its own
# one-step parity test, tests/test_parity_train_step.py)
CFG = ScoreModelConfig(latent_dim=0, latent_droprate=0.0, dropout=0.0,
                       esm_embedding_dim=32)
LR = 1e-3


class TorchTwin:
    """Float64 torch trainer around the oracle generators: Adam (optax
    formulas) + momentum BN running stats."""

    def __init__(self, params_np, stats_np, cfg, sigma,
                 lr=LR, b1=0.9, b2=0.999, eps=1e-8, momentum=0.1):
        self.params = torch_tree(params_np)
        self.stats = jax.tree.map(lambda x: np.asarray(x, np.float64), stats_np)
        self.cfg, self.sigma = cfg, sigma
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.momentum = momentum
        self.m = jax.tree.map(lambda x: np.zeros(np.shape(x)), params_np)
        self.v = jax.tree.map(lambda x: np.zeros(np.shape(x)), params_np)
        self.t = 0

    def _zero_grads(self, tree):
        for leaf in jax.tree.leaves(tree):
            if leaf.grad is not None:
                leaf.grad = None

    def step(self, noised, targets) -> float:
        B = noised.num_graphs
        tvals = np.asarray(noised.complex_t["tr"])
        gens = [
            oracle_forward_gen(self.params, self.cfg, self.sigma,
                               _unpad_graph(noised, gi), float(tvals[gi]))
            for gi in range(B)
        ]
        bn_fn, captured = make_bn_train_joint(self.params)
        outs = drive_joint(gens, bn_fn)
        loss, _ = torch_loss(outs, noised, targets, B)
        self._zero_grads(self.params)
        loss.backward()
        grads = grad_tree(self.params)

        # Adam (optax.scale_by_adam + scale(-lr))
        self.t += 1
        bc1 = 1.0 - self.b1 ** self.t
        bc2 = 1.0 - self.b2 ** self.t
        self.m = jax.tree.map(
            lambda m, g: self.b1 * m + (1 - self.b1) * g, self.m, grads)
        self.v = jax.tree.map(
            lambda v, g: self.b2 * v + (1 - self.b2) * g * g, self.v, grads)

        def apply(p, m, v):
            with torch.no_grad():
                upd = (m / bc1) / (np.sqrt(v / bc2) + self.eps)
                p -= torch.from_numpy(self.lr * upd)
        jax.tree.map(apply, self.params, self.m, self.v)

        # BN running stats (flax momentum rule, nn/batchnorm.py:102-106)
        for site, (bmean, bvar) in captured.items():
            node = self.stats
            for k in site:
                node = node[k]
            node["var"] = ((1 - self.momentum) * node["var"]
                           + self.momentum * bvar.detach().numpy())
            if "mean" in node:
                node["mean"] = ((1 - self.momentum) * node["mean"]
                                + self.momentum * bmean.detach().numpy())
        return float(loss)

    def sample_trajectory(self, batch, gi, noise, steps):
        """Reverse SDE with the twin's trained params/running stats (the
        plain no-temperature drift of utils/sampling.py:137-168)."""
        sigma = self.sigma
        g = _unpad_graph(batch, gi)
        Rg = len(g["tor_edges"])
        pos = g["lig_pos"].astype(np.float64)
        t_grid = np.asarray(get_t_schedule(steps), np.float32)
        dt_grid = np.concatenate([t_grid[:-1] - t_grid[1:], [t_grid[-1]]])
        tr_n, rot_n, tor_n = noise
        params = jax.tree.map(
            lambda x: x.detach() if torch.is_tensor(x) else x, self.params)
        with torch.no_grad():
            for s, (t, dt) in enumerate(zip(t_grid, dt_grid)):
                g["lig_pos"] = pos.astype(np.float32)
                scores = oracle_forward(params, self.stats, self.cfg, sigma,
                                        g, float(t))
                on = 0.0 if s == steps - 1 else 1.0  # no_final_step_noise
                z = (tr_n[s, gi] * on, rot_n[s, gi] * on, tor_n[s, gi, :Rg] * on)
                sig = sigma.t_to_sigma(float(t), float(t), float(t))
                consts = ((sigma.tr_sigma_min, sigma.tr_sigma_max),
                          (sigma.rot_sigma_min, sigma.rot_sigma_max),
                          (sigma.tor_sigma_min, sigma.tor_sigma_max))
                upd = []
                for ci in range(3):
                    smin, smax = consts[ci]
                    gc = sig[ci] * math.sqrt(2 * math.log(smax / smin))
                    upd.append(gc ** 2 * dt * np.asarray(scores[ci], np.float64)
                               + gc * math.sqrt(dt) * z[ci])
                pos = _oracle_modify_conformer(
                    pos, upd[0], upd[1], g["tor_edges"], g["tor_mask_rotate"],
                    upd[2])
        return pos


def run_ab(n_steps=200, n_batches=4, seed=0, sample_steps=20, eps=1e-8,
           progress=False, control=False):
    """Run the A/B; returns a dict of trajectories and pose agreement.

    ``control=True`` additionally trains the JAX side a second time from a
    1e-7-relatively-perturbed init (same keys): SGD trajectories are
    CHAOTIC, so any rounding-scale difference -- f32-vs-f64 or a last-ulp
    init wiggle -- decoheres the per-step losses after a dozen-odd steps
    while both runs settle on the same loss plateau.  The control pins the
    intrinsic decoherence rate, so the torch-twin divergence profile can be
    read against it instead of against zero.
    """
    sigma = SigmaSchedule()
    model = TensorProductScoreModel(cfg=CFG, caps=CAPS)
    batches = [
        make_complex_batch(seed=100 + i, batch=2, n_lig=10, n_res=14,
                           caps=CAPS, esm_dim=CFG.esm_embedding_dim,
                           c_alpha_max_neighbors=6)
        for i in range(n_batches)
    ]
    variables = model.init(jax.random.PRNGKey(seed), batches[0])
    tx = optax.adam(LR, eps=eps)
    state0 = TrainState.create(variables, tx)
    jstep = jax.jit(make_train_step(model, tx, sigma, 1.0, 1.0))
    noise_fn = jax.jit(lambda k, b: apply_noise(
        k, b, sigma, 1.0, 1.0, False, graph_ids=jnp.arange(b.num_graphs)))
    base = jax.random.PRNGKey(1234 + seed)

    def train_jax(state):
        losses = []
        for s in range(n_steps):
            state, aux = jstep(state, batches[s % n_batches],
                               jax.random.fold_in(base, s))
            losses.append(float(aux["loss"]))
        return state, losses

    twin = TorchTwin(jax.tree.map(np.asarray, state0.params),
                     jax.tree.map(np.asarray, state0.batch_stats),
                     CFG, sigma, eps=eps)

    jax_losses, torch_losses = [], []
    state = state0
    t0 = time.time()
    for s in range(n_steps):
        batch = batches[s % n_batches]
        key = jax.random.fold_in(base, s)
        state, aux = jstep(state, batch, key)
        jax_losses.append(float(aux["loss"]))
        # the step's own internal noise split (train/steps.py train_step)
        k_noise, _ = jax.random.split(key)
        noised, targets = noise_fn(k_noise, batch)
        torch_losses.append(twin.step(noised, targets))
        if progress and (s + 1) % 10 == 0:
            print(f"step {s+1:4d}  jax {jax_losses[-1]:.4f}  "
                  f"torch {torch_losses[-1]:.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # ---- sampled pose set from both trained models, shared noise
    eval_batch = batches[0]
    B, R = eval_batch.num_graphs, eval_batch.tor_edges.shape[1]
    rng = np.random.RandomState(7)
    noise = (rng.randn(sample_steps, B, 3).astype(np.float32),
             rng.randn(sample_steps, B, 3).astype(np.float32),
             rng.randn(sample_steps, B, R).astype(np.float32))
    scfg = SamplerConfig(inference_steps=sample_steps,
                         no_final_step_noise=True)

    def sample_jax(st):
        final, _, _ = sampling(model, st.variables(), eval_batch,
                               jax.random.PRNGKey(5), scfg, sigma,
                               noise_override=noise)
        return np.asarray(final.lig_pos)

    jpos = sample_jax(state)
    pose_rmsds = []
    for gi in range(B):
        tpos = twin.sample_trajectory(eval_batch, gi, noise, sample_steps)
        nl = len(tpos)
        pose_rmsds.append(float(np.sqrt(
            ((jpos[gi][:nl] - tpos) ** 2).sum(-1).mean())))

    ja, ta = np.asarray(jax_losses), np.asarray(torch_losses)
    w = max(1, n_steps // 10)
    out = dict(
        n_steps=n_steps,
        jax_losses=jax_losses,
        torch_losses=torch_losses,
        max_rel_diff=float(np.abs(ja - ta).max() / max(ta.min(), 1e-9)),
        mean_rel_diff=float((np.abs(ja - ta) / np.maximum(ta, 1e-9)).mean()),
        final_window_jax=float(ja[-w:].mean()),
        final_window_torch=float(ta[-w:].mean()),
        first_window_jax=float(ja[:w].mean()),
        pose_rmsds=pose_rmsds,
        wall_seconds=time.time() - t0,
    )

    if control:
        # jax-vs-jax chaos control: perturb the init by one part in 1e7
        pstate = state0.replace(params=jax.tree.map(
            lambda x: x * (1.0 + 1e-7), state0.params))
        pstate, control_losses = train_jax(pstate)
        ca = np.asarray(control_losses)
        cpos = sample_jax(pstate)
        mask = np.asarray(eval_batch.lig_mask)
        out["control_losses"] = control_losses
        out["control_mean_rel_diff"] = float(
            (np.abs(ja - ca) / np.maximum(ja, 1e-9)).mean())
        out["control_final_window"] = float(ca[-w:].mean())
        out["control_pose_rmsds"] = [
            float(np.sqrt(((jpos[gi][mask[gi]] - cpos[gi][mask[gi]]) ** 2)
                          .sum(-1).mean()))
            for gi in range(B)
        ]
    return out


def _sparkline(vals, width=60):
    blocks = "▁▂▃▄▅▆▇█"
    v = np.asarray(vals, np.float64)
    if len(v) > width:
        idx = np.linspace(0, len(v) - 1, width).astype(int)
        v = v[idx]
    lo, hi = float(v.min()), float(v.max())
    span = max(hi - lo, 1e-12)
    return "".join(blocks[int((x - lo) / span * (len(blocks) - 1))] for x in v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks"))
    args = ap.parse_args()
    res = run_ab(n_steps=args.steps, progress=True, control=True)

    with open(os.path.join(args.out, "convergence_ab.json"), "w") as f:
        json.dump(res, f, indent=1)

    ja, ta = np.asarray(res["jax_losses"]), np.asarray(res["torch_losses"])
    ca = np.asarray(res["control_losses"])
    rel_t = np.abs(ja - ta) / np.maximum(ta, 1e-9)
    rel_c = np.abs(ja - ca) / np.maximum(ja, 1e-9)
    K = 12  # coherent phase (before chaotic decoherence)
    rows = "\n".join(
        f"| {s} | {ja[s]:.4f} | {ta[s]:.4f} | {rel_t[s]*100:.2f}% "
        f"| {rel_c[s]*100:.2f}% |"
        for s in range(0, len(ja), max(1, len(ja) // 20)))
    md = f"""# Tiny-data convergence A/B (JAX vs torch-oracle twin)

Flagship-dimension score model (ns=24/nv=6/5 layers), {res['n_steps']} Adam
steps on 4 fixed synthetic complex-batches, shared per-step noise draws,
identical initial parameters.  JAX trains with the shipped jitted
`make_train_step` in f32 on CPU; the twin is the float64 plain-torch oracle
(tests/test_parity_full_model.py) with from-scratch Adam + BN running-stat
updates.  Reference loop: /root/reference/train.py:22-90,
utils/training.py:14-61.

**How to read this.** SGD trajectories are chaotic: ANY rounding-scale
difference decoheres the per-step losses exponentially.  The chaos control
below re-trains the SAME jax program from an init perturbed by one part in
1e7 -- its divergence profile is the noise floor every cross-implementation
comparison must be read against.  Implementation agreement therefore shows
up as (a) step-for-step agreement in the coherent phase (first ~{K} steps),
(b) identical post-decoherence loss plateaus, with the twin's divergence
profile matching the chaos control's.

```
jax     {_sparkline(res['jax_losses'])}
torch   {_sparkline(res['torch_losses'])}
control {_sparkline(res['control_losses'])}
        loss {res['first_window_jax']:.4f} -> {res['final_window_jax']:.4f} (jax first/final 10%-window means)
```

| metric | torch twin (f64) | chaos control (jax, init +1e-7) |
|---|---|---|
| coherent-phase mean rel. diff (steps 0-{K-1}) | {rel_t[:K].mean()*100:.3f}% | {rel_c[:K].mean()*100:.3f}% |
| full-run mean per-step rel. diff | {res['mean_rel_diff']*100:.2f}% | {res['control_mean_rel_diff']*100:.2f}% |
| final 10%-window loss | {res['final_window_torch']:.4f} | {res['control_final_window']:.4f} |
| final 10%-window loss (jax reference) | {res['final_window_jax']:.4f} | same |
| sampled-pose RMSD vs jax (A, per graph) | {', '.join(f'{r:.2f}' for r in res['pose_rmsds'])} | {', '.join(f'{r:.2f}' for r in res['control_pose_rmsds'])} |

Wall time {res['wall_seconds']:.0f}s.  Pose RMSDs between independently
-decohered-but-equally-trained parameter sets measure the chaos, not a
defect: the twin's pose disagreement must be of the same order as the
control's (both far below the ~40 A error of an untrained model,
results/eval history).

**Tolerance statement.**  The fast CI subset (tests/test_convergence_ab.py)
runs the coherent phase ({K} steps) and asserts mean per-step rel. diff
< 1%, max < 3%, and sampled-pose RMSD < 0.5 A -- exactness before chaos.
This artifact documents the long-horizon statistical agreement: final
-window loss within 3% and a divergence profile matching the chaos control.

Selected steps:

| step | jax loss | torch loss | twin rel diff | control rel diff |
|---|---|---|---|---|
{rows}
"""
    with open(os.path.join(args.out, "convergence_ab.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
