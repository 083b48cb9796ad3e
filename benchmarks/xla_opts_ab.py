"""A/B TPU compiler options on the flagship bench trajectory program.

The tunneled axon client rejects TPU-backend XLA_FLAGS at client-side parse
(round-3 finding), but per-compile ``compiler_options`` ship inside the
compile request and reach the backend — this probe sweeps the documented
knobs the profile pointed at (scoped-vmem budget, LICM size inflation for
hoisting step-invariant work out of the 20-step scan, the latency-hiding
scheduler) against the unmodified program.

Run on the real chip: ``python benchmarks/xla_opts_ab.py [name ...]``.
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

OPTION_SETS: dict[str, dict[str, str]] = {
    "base": {},
    "vmem48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "licm4": {"xla_tpu_licm_size_inflation_ratio": "4.0"},
    "licm16": {"xla_tpu_licm_size_inflation_ratio": "16.0"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "dotdup": {"xla_tpu_dot_dot_fusion_duplicated": "true"},
    "vmem48+licm16": {
        "xla_tpu_scoped_vmem_limit_kib": "49152",
        "xla_tpu_licm_size_inflation_ratio": "16.0",
    },
    "dotdup+vmem48": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_scoped_vmem_limit_kib": "49152",
    },
    "dotdup+vmem32": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_scoped_vmem_limit_kib": "32768",
    },
    "dotdup+vmem64": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
    "dotdup+licm4": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_licm_size_inflation_ratio": "4.0",
    },
    "dotdup+vmem48+licm4": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_scoped_vmem_limit_kib": "49152",
        "xla_tpu_licm_size_inflation_ratio": "4.0",
    },
    # round 2 of the sweep: fusion-family neighbors of the winner
    "nodsr": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "dotdup+nodsr": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_enable_dot_strength_reduction": "false",
    },
    "norwb": {"xla_tpu_rwb_fusion": "false"},
    "dotdup+norwb": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_rwb_fusion": "false",
    },
    "dotdup+nestedloop": {
        "xla_tpu_dot_dot_fusion_duplicated": "true",
        "xla_tpu_enable_multi_level_nested_loop_fusion": "true",
    },
}


def main():
    import bench

    names = sys.argv[1:] or list(OPTION_SETS)
    run, _, batch = bench.build()
    key = jax.random.PRNGKey(0)
    results = {}
    for name in names:
        opts = OPTION_SETS[name]
        try:
            compiled = run.lower(batch, key).compile(compiler_options=opts)
        except Exception as e:  # unknown option and similar -> report, move on
            print(f"{name:>14}: COMPILE FAILED: {type(e).__name__}: {e}",
                  flush=True)
            continue
        out = compiled(batch, key)
        np.asarray(out)  # host fetch = the only reliable sync over the tunnel
        reps = int(__import__("os").environ.get("XLA_AB_REPS", "3"))
        t0 = time.perf_counter()
        for i in range(reps):
            out = compiled(batch, jax.random.PRNGKey(i + 1))
        np.asarray(out)
        sec = (time.perf_counter() - t0) / reps
        results[name] = sec
        print(f"{name:>14}: {sec * 1e3:8.1f} ms/complex "
              f"({1.0 / sec:.3f} complexes/sec)  {opts}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
