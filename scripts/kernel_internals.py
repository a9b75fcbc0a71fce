"""Where does the CSR kernel phase's wall time actually go?

The §5b phase table (BENCH/SCALING_ANALYSIS.md) shows the gather kernel at
0.49 efficiency — the one phase under the host control's 0.53 ceiling. Its
numpy arithmetic is ~8 ms/block (microbench) yet the phase costs
~220 ms/block at local[4] and ~450 ms at local[16]: the wall must live in
the mapInPandas machinery (Arrow decode of the state scan, output
DataFrame -> Arrow -> JVM serialization) rather than the compute. This
script decomposes it:

  inside-kernel timers (written per task to /tmp/chaos_kernel_internals):
    t_in  : list(batches)        — Arrow -> pandas state decode
    t_np  : to_numpy/argsort/gather/bincount — the actual kernel math
    t_out : pd.DataFrame(...)    — output frame construction (pre-Arrow)
  variants (each run as its own mapInPandas + count-agg, 1-row exchange):
    full  : production kernel (output = ~|du| rows/block crosses Arrow)
    tiny  : same compute, yields a 1-row frame — FULL minus TINY isolates
            the output Arrow serialization + JVM-side scan of ~900 MB
    noop  : drains input, no compute, 1-row yield — scheduling + decode

Usage: python scripts/kernel_internals.py CPUS [SHUFFLE] — one config per
process (bench.py rule). Prints one JSON line.
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

cpus = int(sys.argv[1])
shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else 64

os.environ.setdefault("CHAOS_AQE", "off")
os.environ.setdefault("CHAOS_CSR_BLOCK_DIR", "/dev/shm/chaos_csr_blocks")
os.environ.setdefault("CHAOS_BLOCK_CACHE_BYTES", str(3 * 2**30))

from chaos_spark.csr import CsrGraph, _check_aligned, _load_disk_block  # noqa: E402
from chaos_spark.engine import materialize, superstep_conf  # noqa: E402
from chaos_spark.graph import DST, ID  # noqa: E402
from chaos_spark.session import get_spark  # noqa: E402

GRAPH = "/tmp/chaos_bench/rmat_s22_e64000000_seed42.parquet"
LOG_DIR = "/tmp/chaos_kernel_internals"

spark = get_spark(
    f"kern-int-{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions=shuffle,
    extra_conf={
        "spark.driver.memory": "32g",
        "spark.local.dir": "/dev/shm/chaos-spark-local",
        "spark.cleaner.periodicGC.interval": "10min",
    },
)
edges = spark.read.parquet(GRAPH)
g = CsrGraph(spark, edges, num_partitions=shuffle, token=f"bench-{GRAPH}-{shuffle}")
n = g.num_vertices
token, block_dir = g.cache_token, g.block_dir


def make_kernel(variant: str, log: bool):
    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t0 = time.perf_counter()
        pdfs = list(batches)
        t_in = time.perf_counter() - t0
        blk = _load_disk_block(token, pid, block_dir)
        if blk is None or not pdfs:
            return
        t1 = time.perf_counter()
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        ids = pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        od = pdf["out_degree"].to_numpy(dtype=np.float64)
        rank = pdf["rank"].to_numpy(dtype=np.float64)
        m = np.where(od > 0, rank / np.where(od > 0, od, 1.0), 0.0)
        if variant != "noop":
            _check_aligned(blk, ids[order])
            m_edge = m[order][blk["pos"]]
            partial = np.bincount(blk["dst_inverse"], weights=m_edge,
                                  minlength=len(blk["dst_unique"]))
        t_np = time.perf_counter() - t1
        t2 = time.perf_counter()
        if variant == "full":
            out = pd.DataFrame({DST: blk["dst_unique"], "partial": partial})
        else:
            out = pd.DataFrame({DST: np.zeros(1, np.int64),
                                "partial": np.zeros(1)})
        t_out = time.perf_counter() - t2
        if log:
            with open(os.path.join(
                LOG_DIR, f"{variant}-{pid}-{os.getpid()}-{time.monotonic_ns()}"
            ), "w") as f:
                json.dump({"in": t_in, "np": t_np, "out": t_out}, f)
        yield out

    return kernel


def run(variant: str, log: bool):
    k = make_kernel(variant, log)
    (state.mapInPandas(k, schema=f"{DST} long, partial double")
     .agg(F.count(F.lit(1))).first())


with superstep_conf(spark, g.p, adaptive=False):
    state = materialize(g.align_state(
        g.verts.join(g.out_deg, ID, "left").select(
            F.col(ID),
            F.coalesce(F.col("out_degree"), F.lit(0)).alias("out_degree"),
            F.lit(1.0 / n).alias("rank"),
        )
    ))
    state.count()
    for i in range(4):  # warm pool + block/position caches
        t0 = time.time()
        run("full", log=False)
        print(f"# warm {i}: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)

    out = {"cpus": cpus, "shuffle": shuffle, "edges": g.num_edges}
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    for variant in ("full", "tiny", "noop"):
        ts = []
        for _ in range(5):
            t0 = time.time()
            run(variant, log=True)
            ts.append(round(time.time() - t0, 3))
        out[variant + "_all"] = ts
        out[variant + "_med"] = sorted(ts)[len(ts) // 2]
        recs = []
        for p in glob.glob(os.path.join(LOG_DIR, f"{variant}-*")):
            with open(p) as f:
                recs.append(json.load(f))
        for sec in ("in", "np", "out"):
            vals = [r[sec] for r in recs]
            out[f"{variant}_task_{sec}_sum"] = round(sum(vals), 3)
        out[variant + "_tasks"] = len(recs)
        print(f"# {variant}: wall_med={out[variant + '_med']} "
              f"task_sums in/np/out = {out[variant + '_task_in_sum']}/"
              f"{out[variant + '_task_np_sum']}/{out[variant + '_task_out_sum']} "
              f"({len(recs)} tasks over 5 reps)", file=sys.stderr, flush=True)

print(json.dumps(out))
