"""Structured-Streaming ingest lane (chaos_spark/streaming.py).

The contract under test: the incrementally-maintained import-graph edge
set after any sequence of micro-batches equals the one-shot batch
resolve over the full corpus — independent of arrival order, including
references that arrive strictly BEFORE their target file (the ΔI term
of the delta algebra) — and a replayed micro-batch changes nothing.
"""

import pandas as pd
import pytest

from chaos_spark.extract import extract_references, resolve_references
from chaos_spark.fixtures import gen_source_files
from chaos_spark.streaming import (
    _ingest_batch,
    ingest_corpus_stream,
    read_edges,
)


def _edge_set(df):
    return {(r.repo, r.src_path, r.dst_path) for r in df.collect()}


def _write_corpus(spark, pdf: pd.DataFrame, path: str, n_files: int) -> None:
    spark.createDataFrame(pdf).repartition(n_files).write.mode("append").parquet(path)


def test_multibatch_ingest_equals_batch_resolve(spark, tmp_path):
    """Drain a corpus split across many micro-batches; the maintained
    edge set must equal the batch pipeline's (and the fixture truth)."""
    corpus = gen_source_files(n_rows=300, seed=7, n_repos=6)
    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")
    _write_corpus(spark, corpus.files, src_dir, n_files=8)

    res = ingest_corpus_stream(spark, src_dir, work_dir, max_files_per_trigger=2)
    assert res.batches_run >= 3  # the delta algebra actually crossed batches

    maintained = read_edges(spark, work_dir)
    got = _edge_set(maintained)

    full = spark.createDataFrame(corpus.files)
    want_edges, _ = resolve_references(extract_references(full), full)
    assert got == _edge_set(want_edges)
    assert got == {
        (r.repo, r.src_path, r.dst_path)
        for r in corpus.truth_edges.itertuples(index=False)
    }
    # exact ROW count too: the per-batch union carries no distinct (the
    # e1/e2 terms are disjoint by the delta algebra), so a duplicate
    # anywhere would survive into the maintained table — a set compare
    # alone would mask it. The fixture has duplicate import lines
    # (zipf-sampled targets), so intra-file dedup is exercised as well.
    assert maintained.count() == len(corpus.truth_edges)


def _one_file(repo, path, lang, content):
    return pd.DataFrame(
        [[repo, path, "HEAD", lang, content]],
        columns=["repo", "path", "commit", "lang", "content"],
    )


def test_forward_reference_resolves_on_target_arrival(spark, tmp_path):
    """A ref whose target lands in a LATER drain resolves the moment the
    target arrives (term R_old ⋈ ΔI), with no retry loop — and the
    checkpoint makes the second drain process only the new file."""
    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")

    a = _one_file("r0", "app/main.py", "python", "import lib.util\nx = 1\n")
    _write_corpus(spark, a, src_dir, n_files=1)
    res1 = ingest_corpus_stream(spark, src_dir, work_dir)
    assert res1.batches_run == 1
    assert _edge_set(read_edges(spark, work_dir)) == set()  # dangling ref

    b = _one_file("r0", "lib/util.py", "python", "VALUE = 2\n")
    _write_corpus(spark, b, src_dir, n_files=1)
    res2 = ingest_corpus_stream(spark, src_dir, work_dir)
    assert res2.batches_run == 1  # only the new file, courtesy of the checkpoint

    assert _edge_set(read_edges(spark, work_dir)) == {
        ("r0", "app/main.py", "lib/util.py")
    }


def test_backward_reference_resolves_in_ref_batch(spark, tmp_path):
    """The mirror case: target first, ref later (term ΔR ⋈ I_old)."""
    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")

    b = _one_file("r0", "lib/util.py", "python", "VALUE = 2\n")
    _write_corpus(spark, b, src_dir, n_files=1)
    ingest_corpus_stream(spark, src_dir, work_dir)

    a = _one_file("r0", "app/main.py", "python", "import lib.util\n")
    _write_corpus(spark, a, src_dir, n_files=1)
    ingest_corpus_stream(spark, src_dir, work_dir)

    assert _edge_set(read_edges(spark, work_dir)) == {
        ("r0", "app/main.py", "lib/util.py")
    }


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch may replay a batch after a crash; the per-batch
    overwrite partition dirs make the rewrite byte-identical, so the
    maintained tables are unchanged."""
    corpus = gen_source_files(n_rows=80, seed=11, n_repos=2)
    work_dir = str(tmp_path / "work")
    bdf = spark.createDataFrame(corpus.files)

    _ingest_batch(bdf, 0, work_dir)
    before = _edge_set(read_edges(spark, work_dir))
    _ingest_batch(bdf, 0, work_dir)  # simulated replay of the same batch id
    after_df = read_edges(spark, work_dir)

    assert before == _edge_set(after_df)
    assert after_df.count() == len(corpus.truth_edges)  # no dup rows either
    assert before == {
        (r.repo, r.src_path, r.dst_path)
        for r in corpus.truth_edges.itertuples(index=False)
    }


# ---------------------------------------------------------------------------
# Incremental triangle counting (streaming.maintain_triangle_count)
# ---------------------------------------------------------------------------

def _tri_total(spark, work_dir) -> int:
    from chaos_spark.streaming import read_triangle_count

    return read_triangle_count(spark, work_dir).collect()[0]["triangles"]


def _write_edge_files(spark, rows, path: str, n_files: int) -> None:
    df = spark.createDataFrame(rows, "src long, dst long")
    df.repartition(n_files).write.mode("append").parquet(path)


def test_triangle_stream_equals_batch_count(spark, tmp_path):
    """Split a triangle-rich graph across micro-batches; the maintained
    total must equal algos.triangle_count over the union — with
    duplicate, reversed, and self-loop edges sprinkled across batches."""
    import random

    from chaos_spark.algos import triangle_count
    from chaos_spark.streaming import maintain_triangle_count

    rng = random.Random(7)
    n = 30
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)
             if rng.random() < 0.25]
    noisy = edges + [(b, a) for a, b in rng.sample(edges, 10)] + [(5, 5)]
    rng.shuffle(noisy)

    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")
    _write_edge_files(spark, noisy, src_dir, n_files=6)
    res = maintain_triangle_count(
        spark, src_dir, work_dir, max_files_per_trigger=2
    )
    assert res.batches_run >= 3
    want = triangle_count(spark, spark.createDataFrame(edges, "src long, dst long"))
    assert _tri_total(spark, work_dir) == want
    assert sum(d["delta"] for d in res.batch_deltas) == want


def test_triangle_stream_delta_terms(spark, tmp_path):
    """Constructed batches hitting each delta term exactly: a triangle
    closed by one new edge (t1), by a new wedge over an old base (t2),
    and one arriving whole in a single batch (t3)."""
    from chaos_spark.streaming import maintain_triangle_count

    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")
    # batch 1: wedge 1-2, 2-3 plus base edge 8-9 (no triangles yet)
    _write_edge_files(spark, [(1, 2), (2, 3), (8, 9)], src_dir, 1)
    r1 = maintain_triangle_count(spark, src_dir, work_dir)
    assert [d["delta"] for d in r1.batch_deltas] == [0]
    # batch 2: 1-3 closes the old wedge (t1); 8-10 + 9-10 form a new
    # wedge over old 8-9 (t2); 20-21-22 arrives whole (t3).
    _write_edge_files(
        spark,
        [(1, 3), (8, 10), (9, 10), (20, 21), (21, 22), (20, 22)],
        src_dir, 1,
    )
    r2 = maintain_triangle_count(spark, src_dir, work_dir)
    assert r2.batches_run == 1
    d = r2.batch_deltas[0]
    assert (d["t1"], d["t2"], d["t3"]) == (1, 1, 1)
    assert _tri_total(spark, work_dir) == 3


def test_triangle_stream_rearrival_is_noop(spark, tmp_path):
    """Edges already in the maintained set (same or reversed direction)
    arriving again must not change the count."""
    from chaos_spark.streaming import maintain_triangle_count

    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")
    _write_edge_files(spark, [(1, 2), (2, 3), (1, 3)], src_dir, 1)
    r1 = maintain_triangle_count(spark, src_dir, work_dir)
    assert _tri_total(spark, work_dir) == 1
    _write_edge_files(spark, [(2, 1), (3, 1), (2, 3)], src_dir, 1)
    r2 = maintain_triangle_count(spark, src_dir, work_dir)
    assert r2.batch_deltas[0]["new_edges"] == 0
    assert r2.batch_deltas[0]["delta"] == 0
    assert _tri_total(spark, work_dir) == 1
