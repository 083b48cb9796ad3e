"""Measured per-compile TPU XLA options for the inference programs.

The tunneled TPU client rejects TPU-backend ``XLA_FLAGS`` at client-side
argument parse, but per-jit ``compiler_options`` travel inside the compile
request and reach the backend.  ``benchmarks/xla_opts_ab.py`` sweeps the
candidate knobs against the flagship bench trajectory program (40 poses x
20 reverse steps, v5e); the 2026-08-17 sweep measured, in complexes/sec:

    base                                   1.442
    xla_tpu_dot_dot_fusion_duplicated      1.550   <- shipped (+7.5%)
    xla_tpu_scoped_vmem_limit_kib=49152    1.492   (+3.5% alone, but
                                                    REGRESSES combined with
                                                    dot-dup: 1.246)
    xla_tpu_licm_size_inflation_ratio=4    1.461
    latency-hiding scheduler               1.431
    dot-dup + licm4                        1.546   (within noise of dot-dup)
    dot-dup + vmem32/48/64                 1.401 / 1.246 / 1.186

Duplicated dot-dot fusion lets XLA fuse a producer dot into multiple
consumer dots by duplicating it -- exactly the shape of the per-edge
weight-MLP -> four fan-contraction TP blocks in the conv layer, whose
weight-block handoff was the last profiled copy cost (profile_notes.md).
Options interact, so ship the single best configuration rather than a
stack of individually-positive knobs.

Numerics: fusion grouping only changes fp reassociation at the level XLA
already varies between releases; the parity suite tolerances are unchanged.
"""
from __future__ import annotations

import jax

# the winning configuration from the sweep above
TPU_INFERENCE_OPTIONS: dict[str, str] = {
    "xla_tpu_dot_dot_fusion_duplicated": "true",
}


def tpu_compiler_options() -> dict[str, str] | None:
    """The measured-win options on a TPU backend, ``None`` elsewhere (the
    CPU/GPU compilers reject unknown TPU option names loudly)."""
    if jax.default_backend() == "tpu":
        return dict(TPU_INFERENCE_OPTIONS)
    return None
