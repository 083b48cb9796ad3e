"""Per-compile TPU XLA option plumbing for the inference programs.

The tunneled TPU client rejects TPU-backend ``XLA_FLAGS`` at client-side
argument parse, but per-jit ``compiler_options`` travel inside the compile
request and reach the backend — ``benchmarks/xla_opts_ab.py`` sweeps
candidate knobs against the flagship bench trajectory program.

**Measured result (v5e, 2026-08-17): every candidate is NEUTRAL.**  On an
idle host, back-to-back at 10 reps each, the program runs 632.9-634.1
ms/complex identically for: default options, duplicated dot-dot fusion,
dot-strength-reduction off, and their combination; an earlier sweep round
that showed dot-dup "+7.5%" was contaminated — its baseline was measured
while the full CPU test suite ran concurrently, which depresses the
tunneled-dispatch pipeline by ~8-10%.  Scoped-vmem raises (32-96 MiB) and
the latency-hiding scheduler measured at or below baseline even in the
contaminated round, so the whole option surface is flat-to-negative here.

The plumbing stays (it is the only way to reach backend options through
the tunnel, and the sweep harness documents the methodology: idle host,
high reps, within-run comparisons only); the shipped option set is empty.
"""
from __future__ import annotations

import jax

# empty: the 2026-08-17 sweep found no option that beats the default
# compilation of the inference programs (see module docstring)
TPU_INFERENCE_OPTIONS: dict[str, str] = {}


def tpu_compiler_options() -> dict[str, str] | None:
    """The swept-and-kept options on a TPU backend, ``None`` elsewhere (the
    CPU/GPU compilers reject unknown TPU option names loudly)."""
    if TPU_INFERENCE_OPTIONS and jax.default_backend() == "tpu":
        return dict(TPU_INFERENCE_OPTIONS)
    return None
