"""Fast CI subset of the tiny-data convergence A/B (VERDICT r4 #3).

The full artifact (benchmarks/convergence_ab.md, 200 steps + chaos control)
is produced by ``python benchmarks/convergence_ab.py``; this test runs the
same harness over the COHERENT phase only (12 steps -- SGD trajectories are
chaotic, so f32-vs-f64 decoheres the curves exponentially after a dozen-odd
steps; the artifact documents that regime against an explicit jax-vs-jax
perturbation control).  Within the coherent phase the shipped jitted train
step (f32 jax) and the float64 torch-oracle twin, from identical initial
parameters on identical fixture batches with shared noise draws, must stay
glued together -- and the poses sampled from the two trained parameter sets
(shared sampler noise) must agree.  Reference loop: train.py:22-90,
utils/training.py:14-61.
"""
from __future__ import annotations

import numpy as np


def test_convergence_ab_coherent_phase():
    from benchmarks.convergence_ab import run_ab

    res = run_ab(n_steps=12, sample_steps=6)
    ja = np.asarray(res["jax_losses"])
    ta = np.asarray(res["torch_losses"])

    rel = np.abs(ja - ta) / np.maximum(ta, 1e-9)
    assert rel.mean() < 0.01, f"mean per-step rel diff {rel.mean():.4f}"
    assert rel.max() < 0.03, f"max per-step rel diff {rel.max():.4f}"

    # the two trained parameter sets sample matching poses while coherent
    assert max(res["pose_rmsds"]) < 0.5, res["pose_rmsds"]
