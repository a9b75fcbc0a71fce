"""Host control experiment for the scaling protocol (BASELINE.md).

Measures how THIS host scales a pure-numpy replica of the CSR gather
kernel (sorted-id gather + bincount over a ~1M-edge block) across 1, 4,
and 16 independent processes — no Spark, no JVM, no shuffle. This is the
hardware ceiling for the memory-bound fraction of a superstep: N vs 4N
EXECUTOR clusters each bring their own memory subsystem, but a
single-host parallelism proxy shares one, so random-gather workloads
stop scaling when the memory system saturates, regardless of engine.

r3 measurement on the 32-core/125 GB shared VM:
  procs=1  agg 4.9 blocks/s
  procs=4  agg 18.8 blocks/s  (3.9x — near-ideal)
  procs=16 agg 40.2 blocks/s  (2.1x over 4 procs = 0.53 efficiency)

i.e. the HOST ITSELF fails the >=0.8 gate at 4 -> 16 processes for this
access pattern. Any single-host efficiency number for the CSR path must
be read against this ceiling; BENCH/SCALING_ANALYSIS.md folds it into a
per-phase extrapolation to real N vs 4N clusters.
"""
import json
import multiprocessing as mp
import os
import time

import numpy as np


def work(n_iter: int) -> float:
    rng = np.random.default_rng(os.getpid())
    ids = np.sort(rng.integers(0, 4_000_000, 150_000))
    vals = rng.random(150_000)
    src = rng.integers(0, 4_000_000, 1_000_000)
    di = rng.integers(0, 800_000, 1_000_000)
    t0 = time.time()
    for _ in range(n_iter):
        idx = np.clip(np.searchsorted(ids, src), 0, len(ids) - 1)
        m = vals[idx]
        np.bincount(di, weights=m, minlength=800_000)
    return time.time() - t0


def main() -> None:
    out = {}
    for procs in (1, 4, 16):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(work, [8] * procs)
            wall = time.time() - t0
        out[f"procs_{procs}"] = {
            "wall_sec": round(wall, 2),
            "agg_blocks_per_sec": round(procs * 8 / wall, 1),
        }
    thr4 = out["procs_4"]["agg_blocks_per_sec"]
    thr16 = out["procs_16"]["agg_blocks_per_sec"]
    out["host_4_to_16_efficiency"] = round((thr16 / thr4) / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
