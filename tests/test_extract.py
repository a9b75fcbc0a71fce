import hashlib

from pyspark.sql import functions as F

from chaos_spark.extract import corpus_to_graph, extract_references, resolve_references
from chaos_spark.fixtures import gen_source_files
from chaos_spark.graph import assert_no_id_collisions


def _corpus_df(spark, corpus):
    return spark.createDataFrame(corpus.files)


def test_generator_deterministic():
    a = gen_source_files(n_rows=500, seed=42)
    b = gen_source_files(n_rows=500, seed=42)
    assert a.files.equals(b.files)
    assert a.truth_edges.equals(b.truth_edges)
    assert a.n_unresolvable == b.n_unresolvable


def test_content_sha256_invariant(spark):
    """BASELINE.json per-row invariant: content sha256 equality after the
    rows round-trip through the Spark pipeline."""
    corpus = gen_source_files(n_rows=400, seed=42)
    df = _corpus_df(spark, corpus)
    got = {
        (r["repo"], r["path"]): r["sha"]
        for r in df.select("repo", "path", F.sha2("content", 256).alias("sha")).collect()
    }
    for row in corpus.truth_sha.itertuples(index=False):
        assert got[(row.repo, row.path)] == row.sha256
    # and the local hash function agrees with Spark's sha2
    sample = corpus.files.iloc[0]
    assert (
        hashlib.sha256(sample.content.encode()).hexdigest()
        == got[(sample.repo, sample.path)]
    )


def test_extraction_matches_ground_truth(spark):
    corpus = gen_source_files(n_rows=800, seed=42)
    df = _corpus_df(spark, corpus)
    refs = extract_references(df)
    edges, unresolved = resolve_references(refs, df)
    got = {
        (r["repo"], r["src_path"], r["dst_path"])
        for r in edges.collect()
    }
    want = {
        (r.repo, r.src_path, r.dst_path) for r in corpus.truth_edges.itertuples(index=False)
    }
    assert got == want
    # unresolvable imports are dropped and counted, never a crash
    assert unresolved.count() == corpus.n_unresolvable


def test_corpus_to_graph_ids(spark):
    corpus = gen_source_files(n_rows=400, seed=42)
    df = _corpus_df(spark, corpus)
    vertices, edges, _ = corpus_to_graph(df)
    assert_no_id_collisions(vertices)
    assert edges.count() == len(corpus.truth_edges)
    # every edge endpoint is a minted vertex id
    vid = {r["id"] for r in vertices.collect()}
    for r in edges.collect():
        assert r["src"] in vid and r["dst"] in vid
