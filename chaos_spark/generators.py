"""Seeded synthetic graph generators — RMAT and Erdős–Rényi.

Chaos's trillion-edge runs use Graph500 RMAT inputs ([C15] §6.1; [REPO]
`utils/rmat*`). Two implementations:

- :func:`rmat_edges_numpy` — vectorized numpy, for test/bench tiers that
  fit on the driver (≤ ~10^8 edges).
- :func:`rmat_edges_spark` — fully distributed, deterministic, collect-free:
  ``spark.range(E)`` plus per-bit quadrant selection driven by
  ``xxhash64(edge_id, level)``; this is the generator that scales to the
  trillion-edge tier (no driver materialization, embarrassingly parallel,
  identical output for a given seed regardless of parallelism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_PROBS = (0.57, 0.19, 0.19, 0.05)


def rmat_edges_numpy(
    scale: int,
    num_edges: int,
    seed: int = 42,
    probs: tuple[float, float, float, float] = DEFAULT_PROBS,
) -> pd.DataFrame:
    """RMAT edge list over V = 2**scale vertices as a pandas DataFrame
    ``(src, dst)``; duplicates kept (FIXTURES.md G4)."""
    rng = np.random.default_rng(seed)
    src = np.zeros(num_edges, dtype=np.int64)
    dst = np.zeros(num_edges, dtype=np.int64)
    p = np.asarray(probs, dtype=np.float64)
    p = p / p.sum()
    for bit in range(scale):
        q = rng.choice(4, size=num_edges, p=p)
        src |= (q >> 1).astype(np.int64) << bit
        dst |= (q & 1).astype(np.int64) << bit
    return pd.DataFrame({"src": src, "dst": dst})


def rmat_edges_spark(
    spark: SparkSession,
    scale: int,
    num_edges: int,
    seed: int = 42,
    probs: tuple[float, float, float, float] = DEFAULT_PROBS,
    num_partitions: int | None = None,
    keep_id: bool = False,
) -> DataFrame:
    """Distributed deterministic RMAT: ``(src, dst)`` over 2**scale vertices.

    Per edge i and bit level b, the quadrant is chosen by comparing a
    uniform in [0,1) derived from ``xxhash64(i, b, seed)`` against the
    cumulative quadrant probabilities — pure Spark SQL expressions, whole
    stage codegen, no Python, no shuffle.

    ``keep_id`` also emits the generating edge id — the join key the value
    oracle (genoracle.rmat_sql) verifies per-edge output against.
    """
    a, b_, c, _ = probs
    c1, c2, c3 = a, a + b_, a + b_ + c
    df = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    # u in [0,1): low 53 bits of the hash / 2^53.
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for bit in range(scale):
        h = F.xxhash64(F.col("id"), F.lit(bit), F.lit(seed))
        u = F.pmod(h, F.lit(1 << 53)).cast("double") / F.lit(float(1 << 53))
        quad = (
            F.when(u < c1, F.lit(0))
            .when(u < c2, F.lit(1))
            .when(u < c3, F.lit(2))
            .otherwise(F.lit(3))
        )
        src = src + (F.shiftright(quad, 1).cast("long") * F.lit(1 << bit)).cast("long")
        dst = dst + ((quad % 2).cast("long") * F.lit(1 << bit)).cast("long")
    cols = [src.alias("src"), dst.alias("dst")]
    if keep_id:
        cols.insert(0, F.col("id"))
    return df.select(*cols)


def erdos_renyi_edges_spark(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
    keep_id: bool = False,
) -> DataFrame:
    """Uniform random ``(src, dst)`` — [REPO] `utils/` ER generator analogue;
    deterministic via xxhash64, distributed via spark.range. ``keep_id``
    also emits the generating edge id (for the genoracle.er_sql value
    oracle)."""
    df = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    cols = [
        F.pmod(F.xxhash64(F.col("id"), F.lit("s"), F.lit(seed)), F.lit(num_vertices)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit("d"), F.lit(seed)), F.lit(num_vertices)).alias("dst"),
    ]
    if keep_id:
        cols.insert(0, F.col("id"))
    return df.select(*cols)
