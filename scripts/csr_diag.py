"""Per-phase breakdown of one CSR PageRank superstep on the bench graph.

The r2 verdict's scaling gate needs to know WHERE the non-scaling fraction
lives. Amdahl on the r3 probe (local[4] 9.9 s vs local[16] 5.64 s) implies
~4 s of per-superstep cost that does not parallelize; this script times the
superstep's phases cumulatively so the serial component is attributable:

  kernel   : state scan -> mapInPandas CSR gather -> count (no exchange)
  +agg     : ... -> groupBy(dst).sum (the partial-stream exchange)
  +join    : full superstep (apply join + delta/dangling agg action)
  +join/shj: full superstep with preferSortMergeJoin=false

Usage: python scripts/csr_diag.py CPUS [GC_INTERVAL] [SHUFFLE]
Prints one JSON line. Run one configuration per process (bench.py rule).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

cpus = int(sys.argv[1])
gc = sys.argv[2] if len(sys.argv) > 2 else "30s"
shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 32

os.environ.setdefault("CHAOS_AQE", "off")
os.environ.setdefault("CHAOS_CSR_BLOCK_DIR", "/dev/shm/chaos_csr_blocks")

from chaos_spark.csr import CsrGraph, _check_aligned, _load_disk_block  # noqa: E402
from chaos_spark.engine import materialize, materialize_stats, superstep_conf  # noqa: E402
from chaos_spark.graph import DST, ID  # noqa: E402
from chaos_spark.session import get_spark  # noqa: E402

GRAPH = "/tmp/chaos_bench/rmat_s22_e64000000_seed42.parquet"

spark = get_spark(
    f"csr-diag-{cpus}",
    master=f"local[{cpus}]",
    shuffle_partitions=shuffle,
    extra_conf={
        "spark.driver.memory": "32g",
        "spark.local.dir": "/dev/shm/chaos-spark-local",
        "spark.cleaner.periodicGC.interval": gc,
    },
)
edges = spark.read.parquet(GRAPH)
print(f"# session up, building CsrGraph t={time.time():.0f}", file=sys.stderr, flush=True)
g = CsrGraph(spark, edges, num_partitions=shuffle, token=f"bench-{GRAPH}-{shuffle}")
print(f"# CsrGraph ready t={time.time():.0f}", file=sys.stderr, flush=True)
n = g.num_vertices
token, block_dir = g.cache_token, g.block_dir


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


def full_step(cur):
    """r1-r3 barrier: lazy localCheckpoint + separate stats agg action."""
    partials = cur.mapInPandas(kernel, schema=f"{DST} long, partial double")
    contribs = partials.groupBy(DST).agg(F.sum("partial").alias("contrib"))
    new = cur.join(contribs, cur[ID] == contribs[DST], "left").select(
        cur[ID], cur["out_degree"], cur["rank"].alias("_prev"),
        (F.lit(0.15 / n) + F.lit(0.85) *
         F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
    )
    new = materialize(new)
    new.agg(F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta")).first()
    return new.select(ID, "out_degree", "rank")


def full_step_obs(cur):
    """r4 barrier: shuffle_hash apply join + observe-folded stats (the
    production superstep, chaos_spark/csr.py _pagerank_csr_disk)."""
    partials = cur.mapInPandas(kernel, schema=f"{DST} long, partial double")
    contribs = partials.groupBy(DST).agg(F.sum("partial").alias("contrib"))
    new = cur.join(
        contribs.hint("shuffle_hash"), cur[ID] == contribs[DST], "left"
    ).select(
        cur[ID], cur["out_degree"], cur["rank"].alias("_prev"),
        (F.lit(0.15 / n) + F.lit(0.85) *
         F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
    )
    new, _ = materialize_stats(
        new,
        [F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta")],
        keep=[ID, "out_degree", "rank"],
    )
    return new


with superstep_conf(spark, g.p, adaptive=False):
    state = materialize(g.align_state(
        g.verts.join(g.out_deg, ID, "left").select(
            F.col(ID),
            F.coalesce(F.col("out_degree"), F.lit(0)).alias("out_degree"),
            F.lit(1.0 / n).alias("rank"),
        )
    ))
    state.count()

    # warm-up: JIT, worker pool, block caches
    for i in range(6):
        t0 = time.time()
        state = full_step(state)
        print(f"# warmup {i}: {time.time()-t0:.2f}s", file=sys.stderr, flush=True)

    out = {"cpus": cpus, "gc": gc, "shuffle": shuffle, "vertices": n,
           "edges": g.num_edges}

    def med(name, fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        out[name + "_all"] = ts
        out[name] = sorted(ts)[len(ts) // 2]
        print(f"# {name}: {out[name]} {ts}", file=sys.stderr, flush=True)

    med("scan_only", lambda: state.agg(F.count(F.lit(1))).first())
    med("kernel", lambda: state.mapInPandas(
        kernel, schema=f"{DST} long, partial double"
    ).agg(F.count(F.lit(1))).first())
    med("kernel_agg", lambda: state.mapInPandas(
        kernel, schema=f"{DST} long, partial double"
    ).groupBy(DST).agg(F.sum("partial")).agg(F.count(F.lit(1))).first())

    def one_full():
        global state
        state = full_step(state)

    med("full_step", one_full)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    med("full_step_shj", one_full)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

    def one_full_obs():
        global state
        state = full_step_obs(state)

    med("full_step_obs", one_full_obs)

print(json.dumps(out))
