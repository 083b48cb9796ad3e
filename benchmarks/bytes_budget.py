"""Bytes budget for the flagship inference roofline gap (VERDICT r4 #6).

mfu.md shows the bench program at 30% of its bandwidth-bound roofline
ceiling, previously attributed to "bandwidth-inefficient small operands"
without numbers.  This script produces the numbers, in two parts:

1. **Analytic HBM byte classes** -- computed exactly from the bench
   capacities and the irreps algebra (nn/tensor_product.py): per-edge TP
   weight blocks, one-hot gather/scatter operands, edge attributes/hidden
   activations, node features, parameters.  Each class is labeled
   IRREDUCIBLE (the algorithm must move these bytes at this architecture)
   or SCHEDULE (XLA could in principle keep them in VMEM / regenerate).

2. **Measured per-op-class device time** -- aggregated from a chrome-trace
   profile of the bench loop (``python bench.py --profile`` writes
   /tmp/bench_trace): device op durations bucketed by HLO op-name class,
   so each byte class's analytic minimum ms (bytes / 819 GB/s) sits next
   to what the schedule actually spends.

Run on the real chip:
    python bench.py --profile          # writes /tmp/bench_trace
    python benchmarks/bytes_budget.py  # prints the markdown table
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM = 819e9
BF16 = 2

# bench workload constants (bench.py)
N_POSES, N_LIG, N_RES, STEPS = 40, 32, 320, 20
NS, NV, LAYERS = 24, 6, 5
LIG_E = 72 + 992            # bond_cap + lig_radius_cap, per pose
REC_E = N_RES * 24          # B=1 (shared_rec)
TOR_E, TOR_CAP = 256, 8
# per-step cross capacities (the 5-segment schedule, bench.py)
CROSS_SCHEDULE = [(6, N_LIG * N_RES), (2, 9472), (2, 7680), (4, 6784), (6, 5824)]


def tp_for(in_ir, sh_ir, out_ir):
    from disco_diffdock_tpu.nn.tensor_product import WeightedTensorProduct

    return WeightedTensorProduct(in_ir, sh_ir, out_ir)


def analytic():
    """Per-complex (40 poses x 20 steps) HBM bytes by class, bf16 path."""
    from disco_diffdock_tpu.nn.irreps import Irreps
    from disco_diffdock_tpu.nn.tensor_product import get_irrep_seq

    seq = get_irrep_seq(NS, NV, False)
    sh = "1x0e + 1x1o"
    cross_per_step = [cc for n, cc in CROSS_SCHEDULE for _ in range(n)]

    classes = defaultdict(float)
    for li in range(LAYERS):
        in_ir = seq[min(li, len(seq) - 1)]
        out_ir = seq[min(li + 1, len(seq) - 1)]
        tp = tp_for(in_ir, sh, out_ir)
        w_numel = tp.weight_numel  # sum fan_k * mul_k
        din = Irreps(in_ir).dim
        dout = Irreps(out_ir).dim
        for step_cross in [sum(cross_per_step) / STEPS]:  # mean cross cap
            # edge multiplicities per forward: (E_total, n_node_gathers)
            edges = [
                ("lig", LIG_E * N_POSES, N_LIG * N_POSES),
                ("cross", step_cross * N_POSES, None),  # two directed blocks
                ("crossT", step_cross * N_POSES, None),
                ("rec", REC_E * 1, N_RES),
            ]
            for name, E, _n in edges:
                # per-edge TP weight blocks: written by the w2 matmul, read
                # by the fan contraction -- 2 passes, IRREDUCIBLE (the
                # defining data structure of a weighted TP over edges)
                classes["tp_weights (w2 out, irreducible)"] += 2 * E * w_numel * BF16
                # edge-MLP hidden h (3ns wide): write + read
                classes["edge_mlp_hidden (irreducible)"] += 2 * E * 3 * NS * BF16
                # edge attr base + gathered scalars (3ns): read per layer
                classes["edge_attr+scalars (irreducible)"] += E * 3 * NS * BF16
                # per-edge messages (dout): write + read by scatter matmul
                classes["messages (irreducible)"] += 2 * E * dout * BF16
                # gathered node features x[dst] (din): write + read
                classes["gathered_x (irreducible)"] += 2 * E * din * BF16
                # edge SH (4 comps): read
                classes["edge_sh (irreducible)"] += E * 4 * BF16

        # one-hot operands: materialized once (cache_onehots=True), re-READ
        # by gather/scatter matmuls each layer: lig src+dst+scatter;
        # cross dst(rec gather)+scatter(lig) x2 directions; rec src/dst.
        # SCHEDULE class: the onehot_ab.py A/B showed regenerating them is
        # a wash, so XLA is already hiding most of this, but the HLO-level
        # traffic is real if not fused.
        oh = (3 * LIG_E * N_POSES * N_LIG
              + 3 * (sum(cross_per_step) / STEPS) * N_POSES * (N_LIG + N_RES) / 2 * 2
              + 3 * REC_E * N_RES)
        classes["one_hot_operands (schedule)"] += oh * BF16

    per_forward = {k: v for k, v in classes.items()}
    # params are read once per forward; tiny
    per_forward["params (irreducible)"] = 2.6e6 * BF16

    per_complex = {k: v * STEPS for k, v in per_forward.items()}
    return per_forward, per_complex


def trace_buckets(trace_dir="/tmp/bench_trace"):
    """Aggregate device-op durations from the newest chrome trace by HLO
    op-name class.  Returns {bucket: ms_total} over the traced window."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    # Leaf device ops live on the "XLA Ops" thread of the TPU device PID;
    # "XLA Modules" / `while` container rows wrap the same time and would
    # double-count it.
    device_pids, op_tids = set(), set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                device_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name":
            if ev.get("args", {}).get("name") == "XLA Ops":
                op_tids.add((ev["pid"], ev["tid"]))
    buckets = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if (ev.get("ph") != "X" or ev.get("pid") not in device_pids
                or (ev["pid"], ev.get("tid")) not in op_tids):
            continue
        name = ev.get("name", "")
        key = re.sub(r"[.\d]+$", "", name).strip(".")
        # coarse class: leading fused-op kind
        key = key.split("(")[0]
        # `while` / `conditional` / `jit_*` rows are CONTAINERS whose body
        # ops also appear as X events on this thread -- counting them
        # would double the body time.
        if key in ("while", "conditional") or key.startswith("jit_"):
            continue
        buckets[key] += ev.get("dur", 0.0) / 1e3  # us -> ms
    return dict(sorted(buckets.items(), key=lambda kv: -kv[1]))


def main():
    per_forward, per_complex = analytic()
    total = sum(per_complex.values())
    print("## Analytic HBM byte classes (bench workload, per complex = "
          "40 poses x 20 steps)\n")
    print("| class | GB/complex | min ms at 819 GB/s | share |")
    print("|---|---|---|---|")
    for k, v in sorted(per_complex.items(), key=lambda kv: -kv[1]):
        print(f"| {k} | {v/1e9:.2f} | {v/V5E_HBM*1e3:.1f} | {v/total:.1%} |")
    print(f"| **total** | **{total/1e9:.2f}** | **{total/V5E_HBM*1e3:.1f}** "
          f"| 100% |")
    irr = sum(v for k, v in per_complex.items() if "irreducible" in k)
    print(f"\nirreducible subtotal: {irr/1e9:.2f} GB -> "
          f"{irr/V5E_HBM*1e3:.1f} ms/complex at peak bandwidth")

    buckets = trace_buckets()
    if buckets:
        tot = sum(buckets.values())
        # bench.py --profile traces `windows * reps` identical runs of the
        # one-complex program (3 * 5 at the time of writing)
        n_complexes = 15
        print("\n## Measured device-op time by class (chrome trace, leaf "
              f"XLA ops, {n_complexes} complexes profiled)\n")
        print("| op class | ms total | ms/complex | share |")
        print("|---|---|---|---|")
        for k, v in list(buckets.items())[:18]:
            print(f"| {k} | {v:.1f} | {v/n_complexes:.1f} | {v/tot:.1%} |")
        print(f"| **total** | **{tot:.1f}** | **{tot/n_complexes:.1f}** "
              f"| 100% |")
        print(f"\ndevice leaf-op time: {tot/n_complexes:.0f} ms/complex vs "
              f"analytic HBM floor {total/V5E_HBM*1e3:.0f} ms/complex -> "
              f"schedule efficiency {total/V5E_HBM*1e3/(tot/n_complexes):.0%}"
              " of the bytes-derived bound")
    else:
        print("\n(no chrome trace found under /tmp/bench_trace -- run "
              "`python bench.py --profile` first)")


if __name__ == "__main__":
    main()
