"""A/B: why does bench.py's leg measure ~5 s/superstep at local[16] when
csr_diag's identical full superstep measures ~2.9 s?

Runs, in ONE process with the exact bench env (block cache, tmpfs TMPDIR,
GC pinned):
  A) the production path twice (warmup + timed), exactly like bench --one
  B) a raw loop of the same superstep WITHOUT run_supersteps (no
     release_state, no history bookkeeping)
and prints per-superstep seconds for each so the harness-side overhead is
attributable.

Usage: python scripts/bench_vs_diag_ab.py CPUS [SHUFFLE]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CHAOS_AQE", "off")
os.environ.setdefault("CHAOS_PERIODIC_GC", "10min")
os.environ.setdefault("CHAOS_CSR_BLOCK_DIR", "/dev/shm/chaos_csr_blocks")
os.environ.setdefault("TMPDIR", "/dev/shm/chaos-tmp")
os.environ.setdefault("CHAOS_BLOCK_CACHE_BYTES", str(1536 * 1024 * 1024))
os.makedirs(os.environ["TMPDIR"], exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from chaos_spark.csr import CsrGraph, _pagerank_csr_disk  # noqa: E402
from chaos_spark.engine import materialize, materialize_stats, superstep_conf  # noqa: E402
from chaos_spark.graph import DST, ID  # noqa: E402
from chaos_spark.session import get_spark  # noqa: E402

GRAPH = "/tmp/chaos_bench/rmat_s22_e64000000_seed42.parquet"
cpus = int(sys.argv[1])
shuffle = int(sys.argv[2]) if len(sys.argv) > 2 else 64

spark = get_spark(
    f"ab-{cpus}",
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
out = {"cpus": cpus, "shuffle": shuffle}
no_ckpt = 99

with superstep_conf(spark, g.p, adaptive=False):
    t0 = time.time()
    r_warm = _pagerank_csr_disk(spark, g, 0.85, 0.0, 10, checkpoint_every=no_ckpt)
    out["A_warmup_steps"] = [h["seconds"] for h in r_warm.history]
    out["A_warmup_wall"] = round(time.time() - t0, 2)

    t0 = time.time()
    r_timed = _pagerank_csr_disk(spark, g, 0.85, 0.0, 10, checkpoint_every=no_ckpt)
    out["A_timed_steps"] = [h["seconds"] for h in r_timed.history]
    out["A_timed_wall"] = round(time.time() - t0, 2)

    # B: raw loop — same superstep expression, no run_supersteps machinery.
    n = g.num_vertices
    token, block_dir = g.cache_token, g.block_dir
    from chaos_spark.csr import _load_disk_block, _gather_positions, _disk_src  # noqa: E402
    import numpy as np  # noqa: E402
    import pandas as pd  # noqa: E402

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = list(batches)
        blk = _load_disk_block(token, pid, block_dir)
        if blk is None or not pdfs:
            return
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        ids = pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        od = pdf["out_degree"].to_numpy(dtype=np.float64)
        rank = pdf["rank"].to_numpy(dtype=np.float64)
        m = np.where(od > 0, rank / np.where(od > 0, od, 1.0), 0.0)
        _check_aligned(blk, ids[order])
        m_edge = m[order][blk["pos"]]
        partial = np.bincount(blk["dst_inverse"], weights=m_edge,
                              minlength=len(blk["dst_unique"]))
        yield pd.DataFrame({DST: blk["dst_unique"], "partial": partial})

    state = materialize(g.align_state(
        g.verts.join(g.out_deg, ID, "left").select(
            F.col(ID),
            F.coalesce(F.col("out_degree"), F.lit(0)).alias("out_degree"),
            F.lit(1.0 / n).alias("rank"),
        )
    ))
    state.count()
    steps = []
    for i in range(10):
        t0 = time.time()
        partials = state.mapInPandas(kernel, schema=f"{DST} long, partial double")
        contribs = partials.groupBy(DST).agg(F.sum("partial").alias("contrib"))
        new = state.join(
            contribs.hint("shuffle_hash"), state[ID] == contribs[DST], "left"
        ).select(
            state[ID], state["out_degree"], state["rank"].alias("_prev"),
            (F.lit(0.15 / n) + F.lit(0.85) *
             (F.coalesce(F.col("contrib"), F.lit(0.0)))).alias("rank"),
        )
        new, m = materialize_stats(
            new,
            [F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta"),
             F.sum(F.when(F.col("out_degree") == 0, F.col("rank"))
                   .otherwise(0.0)).alias("dm")],
            keep=[ID, "out_degree", "rank"],
        )
        state = new
        steps.append(round(time.time() - t0, 3))
    out["B_raw_steps"] = steps

print(json.dumps(out))
