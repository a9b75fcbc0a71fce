"""Table IO abstraction — Iceberg when a catalog is configured, Parquet
directories otherwise (SURVEY §7 decision log).

The north rule's storage model is an Iceberg edge table; this sandbox has
no Iceberg runtime jars, so every writer/reader here goes through one
seam: if ``spark.sql.catalog.<name>`` is configured (a real cluster),
``saveAsTable``/``table`` against the catalog; otherwise plain Parquet
paths under a base dir. Checkpoints (chaos_spark.checkpoint) and the
bench graphs use this layout; semantics (including the bucketed edge
layout below) are identical either way.

The scale-relevant piece is :func:`write_edges_bucketed`: the static edge
table is written ONCE, bucketed/sorted by the per-superstep join key, so
iterative jobs never re-shuffle the (huge, constant) edge side —
X-Stream's per-partition edge files as a storage layout ([X13] §3.2;
Iceberg bucket transform / Spark bucketBy on a cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None (Parquet fallback)."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, _ in confs:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            return k.rsplit(".", 1)[1]
    return None


def write_table(df: DataFrame, base_dir: str, name: str,
                mode: str = "overwrite") -> str:
    """Write a logical table; returns its locator (table name or path)."""
    cat = iceberg_catalog(df.sparkSession)
    if cat is not None:
        ident = f"{cat}.chaos.{name}"
        df.writeTo(ident).createOrReplace()
        return ident
    path = os.path.join(base_dir, name)
    df.write.mode(mode).parquet(path)
    return path


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    cat = iceberg_catalog(spark)
    if cat is not None:
        return spark.table(f"{cat}.chaos.{name}")
    return spark.read.parquet(os.path.join(base_dir, name))


def write_edges_bucketed(
    edges: DataFrame, base_dir: str, name: str,
    num_buckets: int, by: str = "src",
) -> str:
    """Persist the static edge table pre-partitioned on the superstep join
    key. Parquet fallback: one file tree per hash bucket (``bucket=<k>``
    subdirs), reproducing the co-located-scan property; Iceberg: the
    bucket partition transform."""
    cat = iceberg_catalog(edges.sparkSession)
    if cat is not None:
        ident = f"{cat}.chaos.{name}"
        edges.writeTo(ident).partitionedBy(
            F.bucket(num_buckets, F.col(by))
        ).createOrReplace()
        return ident
    path = os.path.join(base_dir, name)
    (
        edges.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(by)), F.lit(num_buckets)).cast("int")
        )
        .repartition(num_buckets, F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return path


def read_edges_bucketed(spark: SparkSession, locator: str) -> DataFrame:
    """Read edges written by :func:`write_edges_bucketed` (either backend)."""
    if os.path.sep in locator or os.path.isdir(locator):
        return spark.read.parquet(locator)
    return spark.table(locator)
