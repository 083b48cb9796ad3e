"""A/B: shared materialized one-hots vs per-use rebuild on the bench program.

The conv layers gather/scatter through one-hot matmuls; the one-hots are
E x N bfloat16 (the cross set: 40 x 10240 x 320 = 262 MB) and, cached, are
re-read from HBM by every conv matmul that uses them -- by the round-4 mfu
numbers they are the dominant HBM term of this memory-bound program.
Rebuilding the iota-compare one-hot AT EVERY USE (cache_onehots=False)
offers XLA the chance to fuse the compare into each dot operand and skip
the re-reads entirely; if the backend instead materializes every rebuild,
it costs a little extra compute and nothing else.  Only a measurement can
tell which lowering the backend picks.

Run on an IDLE chip: ``python benchmarks/onehot_ab.py``.
Windows interleave A/B to defeat the tunneled platform's tenancy drift
(profile_notes.md methodology addendum).
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    import bench

    key = jax.random.PRNGKey(0)
    progs = {}
    for name, cache in (("cached", True), ("rebuild", False)):
        run, _, batch = bench.build(cache_onehots=cache)
        # full untimed warm-in window: a fresh executable runs below steady
        # state for ~its first dozen executions on the tunneled platform
        # (profile_notes.md addendum #3); one call is NOT enough
        out = None
        for i in range(12):
            out = run(batch, jax.random.fold_in(key, i))
        np.asarray(out)  # host fetch = the only reliable sync here
        progs[name] = (run, batch)

    reps, windows = 5, 3
    secs = {name: [] for name in progs}
    for w in range(windows):
        for name, (run, batch) in progs.items():  # interleaved windows
            t0 = time.perf_counter()
            for i in range(reps):
                out = run(batch, jax.random.PRNGKey(w * reps + i + 1))
            np.asarray(out)
            secs[name].append((time.perf_counter() - t0) / reps)
    for name, ss in secs.items():
        med = float(np.median(ss))
        print(f"{name:>8}: {med * 1e3:8.1f} ms/complex median "
              f"({1.0 / med:.3f} complexes/sec)  windows="
              f"{[round(s * 1e3, 1) for s in ss]}", flush=True)


if __name__ == "__main__":
    main()
