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
