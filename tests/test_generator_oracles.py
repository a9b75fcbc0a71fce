"""Generator value-oracles (SURVEY §2.3): the DuckDB SQL images of the
seeded RMAT / Erdős–Rényi generators must reproduce Spark's xxhash64-driven
output EXACTLY. Three layers; the DuckDB-vs-Python layers also run without
a JVM in scripts/xxh64_sql_probe.py — here we pin the Python references
(and therefore the SQL) to the actual Spark expressions."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from chaos_spark.generators import erdos_renyi_edges_spark, rmat_edges_spark
from chaos_spark.genoracle import (
    er_sql,
    rmat_sql,
    xxh64_int_py,
    xxh64_long_py,
    xxh64_str1_py,
)

M64 = (1 << 64) - 1


def _signed(x: int) -> int:
    return x - (1 << 64) if x & (1 << 63) else x


@pytest.mark.parametrize("v", [0, 1, -1, 42, 2**63 - 1, -(2**63),
                               123456789123456789, -98765432109876])
def test_xxh64_long_matches_spark(spark, v):
    # lit(v) for small ints is an INT literal (hashInt path) — cast to
    # long so Spark takes the hashLong path the generators use via col(id)
    got = spark.range(1).select(F.xxhash64(F.lit(v).cast("long"))).first()[0]
    assert got == _signed(xxh64_long_py(v, 42))


@pytest.mark.parametrize("v", [0, 1, -1, 5, 2**31 - 1, -(2**31)])
def test_xxh64_int_matches_spark(spark, v):
    got = spark.range(1).select(
        F.xxhash64(F.lit(v).cast("int"))
    ).first()[0]
    assert got == _signed(xxh64_int_py(v, 42))


@pytest.mark.parametrize("s", ["s", "d", "x"])
def test_xxh64_str1_matches_spark(spark, s):
    got = spark.range(1).select(F.xxhash64(F.lit(s))).first()[0]
    assert got == _signed(xxh64_str1_py(s.encode(), 42))


def test_xxh64_chain_matches_spark(spark):
    # The exact column chain the RMAT generator uses: (long, int, int).
    got = spark.range(7).select(
        F.col("id"),
        F.xxhash64(F.col("id"), F.lit(3), F.lit(99)).alias("h"),
    ).collect()
    for r in got:
        h = xxh64_long_py(r["id"], 42)
        h = xxh64_int_py(3, h)
        h = xxh64_int_py(99, h)
        assert r["h"] == _signed(h)


def test_rmat_sql_matches_spark_generator(spark):
    df = rmat_edges_spark(spark, scale=7, num_edges=1000, seed=7, keep_id=True)
    got = {r["id"]: (r["src"], r["dst"]) for r in df.collect()}
    want = {
        int(i): (int(s), int(d))
        for i, s, d in duckdb.connect().execute(
            rmat_sql(scale=7, num_edges=1000, seed=7)
        ).fetchall()
    }
    assert got == want


def test_er_sql_matches_spark_generator(spark):
    df = erdos_renyi_edges_spark(
        spark, num_vertices=300, num_edges=1000, seed=7, keep_id=True
    )
    got = {r["id"]: (r["src"], r["dst"]) for r in df.collect()}
    want = {
        int(i): (int(s), int(d))
        for i, s, d in duckdb.connect().execute(
            er_sql(num_vertices=300, num_edges=1000, seed=7)
        ).fetchall()
    }
    assert got == want
