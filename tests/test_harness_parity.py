"""Rehearsal of the driver's correctness gate: run every harness query in
Spark AND its DuckDB oracle SQL on the same parquet tables, compare row
count + column names + full (order-insensitive) values. Uses sf0.001 for
speed; the driver runs the same comparison at sf0.01."""

import os

import duckdb
import pandas as pd
import pytest

from chaos_spark.harness import ORACLES, QUERIES

SF_DIR = os.environ.get("CHAOS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.queries()) >= set(mod.oracle_sql())


def test_media_meta_hash_never_wraps():
    """SQL_MEDIA_META mirrors the numpy kernel's h = doc_id*2654435761 %
    997 with plain BIGINT math; the two agree only while the product
    stays below 2^63 (numpy wraps mod 2^64, DuckDB would overflow-error).
    Assert the invariant holds for every test/bench tier's id range."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        mx = duckdb.sql(f"SELECT MAX(doc_id) FROM read_parquet('{p}')").fetchone()[0]
        assert mx * 2654435761 < 2**63, sf


def test_dedup_lsh_cc_semantics(spark, con):
    """Dedup clustering invariants beyond the value-hash: labels are
    hash-min (canonical <= own id), kept rows are exactly the canonical
    ids, and every LSH-paired truncation collapses into its original's
    cluster."""
    from chaos_spark.harness import QUERIES, SQL_LSH_PAIRS

    out = QUERIES["dedup_lsh_cc"](spark, SF_DIR).toPandas()
    assert (out.canonical_id <= out.doc_id).all()
    kept = set(out.loc[out.keep == 1, "doc_id"])
    assert kept == set(out.canonical_id.unique())
    canon = dict(zip(out.doc_id, out.canonical_id))
    pairs = con.execute(SQL_LSH_PAIRS).df()
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert canon[a] == canon[b], (a, b)
