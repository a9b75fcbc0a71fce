"""CSR fast path ≡ join path (SURVEY §3.2 property) + oracle checks.

The CSR kernel must compute the same fixed point as the DataFrame join
path on every fixture graph: exact for CC (min is summation-order-free),
allclose for PageRank (float sums reorder), and the same superstep count
(both paths see the same convergence deltas up to ulp noise).
"""

from __future__ import annotations

import numpy as np
import pytest

from chaos_spark.algos import connected_components, pagerank
from chaos_spark.csr import cc_csr, pagerank_csr
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw

from tests.oracles import pagerank_oracle

GRAPHS = {
    "chain": g1_chain,
    "star_hub": g2_star,
    "two_cliques_bridge": g3_cliques,
    "powerlaw": lambda: g4_powerlaw(scale=10, num_edges=5000),
}


def _ranks(res):
    return {r["id"]: r["rank"] for r in res.state.select("id", "rank").collect()}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_csr_equals_join_path(spark, name):
    edges = spark.createDataFrame(GRAPHS[name]())
    r_join = pagerank(spark, edges, tol=1e-6, max_iters=60, mode="shuffle")
    r_csr = pagerank_csr(spark, edges, tol=1e-6, max_iters=60, mode="csr")
    a, b = _ranks(r_join), _ranks(r_csr)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-9)
    assert r_csr.supersteps == r_join.supersteps


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_csr_matches_oracle(spark, name):
    pdf = GRAPHS[name]()
    edges = spark.createDataFrame(pdf)
    res = pagerank_csr(spark, edges, tol=1e-9, max_iters=500, mode="csr")
    assert res.converged
    got = _ranks(res)
    want = pagerank_oracle(pdf)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_csr_equals_join_path(spark, name):
    edges = spark.createDataFrame(GRAPHS[name]())
    a = dict(
        connected_components(spark, edges, max_iters=100, mode="join")
        .state.select("id", "label").collect()
    )
    b = dict(cc_csr(spark, edges, max_iters=100, mode="csr").state.select("id", "label").collect())
    assert a == b


@pytest.mark.parametrize("other", ["rows", "packed"])
def test_csr_layouts_equal(spark, other):
    """Disk blocks, cogrouped rows, and packed blobs are pure layout
    choices — equal results (per-block fold order may differ between
    disk and cogroup partitionings, so allclose at float tolerance)."""
    edges = spark.createDataFrame(GRAPHS["powerlaw"]())
    a = _ranks(pagerank_csr(spark, edges, tol=0.0, max_iters=4, layout="disk"))
    b = _ranks(pagerank_csr(spark, edges, tol=0.0, max_iters=4, layout=other))
    ks = sorted(a)
    assert a.keys() == b.keys()
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-12)


def test_lpa_csr_equals_join_path(spark):
    """lpa_csr (disk-block kernel) reaches the identical labeling as the
    DataFrame join path — exact (counts + deterministic min-label ties)."""
    from chaos_spark.algos import label_propagation
    from chaos_spark.csr import lpa_csr

    for name in ("two_cliques_bridge", "powerlaw"):
        edges = spark.createDataFrame(GRAPHS[name]())
        a = dict(
            label_propagation(spark, edges, max_iters=7, mode="join")
            .state.select("id", "label").collect()
        )
        b = dict(
            lpa_csr(spark, edges, max_iters=7, mode="csr").state.select("id", "label").collect()
        )
        assert a == b


def test_pagerank_weighted_csr_equals_join_path(spark):
    """Type-2 (weighted) disk blocks: the CSR kernel's rank/W * w messages
    reach the same fixed point as the join path's weighted regime
    (VERDICT r3 item 6 done-criterion)."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf).withColumn(
        "weight",
        (F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(5))).cast("double"),
    )
    a = _ranks(pagerank(spark, edges, tol=0.0, max_iters=6, weight_col="weight",
                        mode="shuffle"))
    b = _ranks(pagerank_csr(spark, edges, tol=0.0, max_iters=6, mode="csr",
                            weight_col="weight"))
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-12)


def test_csr_partition_invariance(spark):
    """Result must not depend on the partition count (the autotuned P is a
    physical choice, never semantic)."""
    edges = spark.createDataFrame(GRAPHS["powerlaw"]())
    r4 = _ranks(pagerank_csr(spark, edges, tol=0.0, max_iters=5, num_partitions=4, mode="csr"))
    r11 = _ranks(pagerank_csr(spark, edges, tol=0.0, max_iters=5, num_partitions=11, mode="csr"))
    ks = sorted(r4)
    assert np.allclose([r4[k] for k in ks], [r11[k] for k in ks], rtol=0, atol=1e-12)


def test_disk_blocks_rebuilt_on_changed_edges(spark, tmp_path, monkeypatch):
    """ADVICE r2+r3: a caller-pinned token whose underlying edge data
    changed must trigger a block rebuild, never silently reuse stale CSR
    blocks. The _BUILT marker records "{num_edges}:{p}:{content_fp}" and
    is validated on reuse — the xor-fold content fingerprint catches the
    same-count-DIFFERENT-edges regeneration the count alone missed."""
    import os

    import chaos_spark.csr as csr_mod

    monkeypatch.setattr(csr_mod, "_DISK_BLOCK_BASE", str(tmp_path))

    e1 = spark.createDataFrame(g1_chain())
    g_old = csr_mod.CsrGraph(spark, e1, num_partitions=4, token="pinned")
    marker = os.path.join(g_old.block_dir, "_BUILT")

    def marker_text(g):
        return f"v6:{g.num_edges}:{g.num_vertices}:4:{g.edge_fp:x}"

    with open(marker) as f:
        assert f.read() == marker_text(g_old)

    # Same |E|, different edges (reversed chain): count-only markers pass
    # this; the content fingerprint must not.
    e_rev = spark.createDataFrame(
        g1_chain().rename(columns={"src": "dst", "dst": "src"})
    )
    g_rev = csr_mod.CsrGraph(spark, e_rev, num_partitions=4, token="pinned")
    assert g_rev.num_edges == g_old.num_edges
    assert g_rev.edge_fp != g_old.edge_fp
    with open(marker) as f:
        assert f.read() == marker_text(g_rev)

    # "Regenerated" data at the same token: a superset graph whose old src
    # ids are a subset of the new vertex set (the silent-wrong-graph case).
    e2 = spark.createDataFrame(g3_cliques())
    g_new = csr_mod.CsrGraph(spark, e2, num_partitions=4, token="pinned")
    assert g_new.num_edges != g_old.num_edges
    with open(marker) as f:
        assert f.read() == marker_text(g_new)
    # and the rebuilt blocks drive a correct run on the NEW graph
    res = csr_mod.cc_csr(spark, e2, num_partitions=4, token="pinned")
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    from tests.oracles import cc_oracle

    assert labels == cc_oracle(g3_cliques())


def test_check_aligned_guard():
    """The v4 kernels' misalignment guard: the state partition's sorted id
    vector must EQUAL the block's build-time ``ids`` — any repartitioning
    drift (AQE re-plan, parquet round trip, partitioner change) must raise,
    never gather silently from the wrong rows. Pure-numpy unit test of the
    guard itself; the Spark-level layout precondition is exercised by every
    disk-path test above via align_state."""
    from chaos_spark.csr import _check_aligned

    ids = np.array([2, 5, 9, 11], dtype=np.int64)
    blk = {"ids": ids}
    _check_aligned(blk, ids.copy())  # equal vector: no raise

    for bad in (
        np.array([2, 5, 9], dtype=np.int64),        # missing id
        np.array([2, 5, 9, 11, 13], dtype=np.int64),  # extra id
        np.array([2, 5, 10, 11], dtype=np.int64),   # same size, drifted id
        np.array([], dtype=np.int64),               # empty state partition
    ):
        with pytest.raises(RuntimeError, match="misaligned"):
            _check_aligned(blk, bad)


def test_auto_route_three_way():
    """mode="auto" routes by the measured crossover — join below
    CSR_AUTO_MIN_EDGES, fused stream at/above it — while explicit knobs
    pin the named path. Pure routing unit test (num_edges supplied so no
    count job runs; edges is never touched)."""
    from chaos_spark import csr as csr_mod

    lo, hi = csr_mod.CSR_AUTO_MIN_EDGES - 1, csr_mod.CSR_AUTO_MIN_EDGES
    route = csr_mod._auto_route
    assert route(None, "auto", lo, None, None) == ("join", lo)
    assert route(None, "auto", hi, None, None) == ("stream", hi)
    # per-algorithm crossover: the many-superstep algorithms (pagerank,
    # lpa) pass min_edges=STREAM_AUTO_MIN_EDGES (100k, measured in
    # scripts/sf01_path_ab.py); CC keeps the conservative default.
    s_lo = csr_mod.STREAM_AUTO_MIN_EDGES - 1
    s_hi = csr_mod.STREAM_AUTO_MIN_EDGES
    assert csr_mod.STREAM_AUTO_MIN_EDGES < csr_mod.CSR_AUTO_MIN_EDGES
    assert route(None, "auto", s_lo, None, None,
                 min_edges=s_hi) == ("join", s_lo)
    assert route(None, "auto", s_hi, None, None,
                 min_edges=s_hi) == ("stream", s_hi)
    # ... and a size between the two crossovers routes join for CC but
    # stream for pagerank/lpa
    mid = (s_hi + csr_mod.CSR_AUTO_MIN_EDGES) // 2
    assert route(None, "auto", mid, None, None) == ("join", mid)
    assert route(None, "auto", mid, None, None,
                 min_edges=s_hi) == ("stream", mid)
    assert route(None, "csr", lo, None, None) == ("csr", None)
    assert route(None, "stream", lo, "tok", None) == ("stream", lo)
    # explicit classic-kernel knobs pin the kernel even in auto mode
    assert route(None, "auto", hi, "tok", None) == ("csr", None)
    assert route(None, "auto", hi, None, "disk") == ("csr", None)
    assert route(None, "auto", hi, None, None, packed=True) == ("csr", None)
    with pytest.raises(ValueError, match="unknown mode"):
        route(None, "bogus", hi, None, None)


def test_auto_route_serves_stream_above_crossover(spark, monkeypatch):
    """End-to-end: with the crossover lowered beneath the fixture size,
    mode="auto" serves pagerank/cc/lpa through the fused stream path and
    still matches the join-path fixed point (same oracle as the forced
    paths above)."""
    from chaos_spark import csr as csr_mod
    from chaos_spark.algos import label_propagation
    from chaos_spark.csr import lpa_csr

    monkeypatch.setattr(csr_mod, "CSR_AUTO_MIN_EDGES", 1)
    monkeypatch.setattr(csr_mod, "STREAM_AUTO_MIN_EDGES", 1)
    edges = spark.createDataFrame(GRAPHS["two_cliques_bridge"]())
    a = _ranks(pagerank_csr(spark, edges, tol=1e-6, max_iters=60))
    b = _ranks(pagerank(spark, edges, tol=1e-6, max_iters=60, mode="shuffle"))
    ks = sorted(a)
    assert a.keys() == b.keys()
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-9)
    cc_a = dict(cc_csr(spark, edges).state.select("id", "label").collect())
    cc_b = dict(
        connected_components(spark, edges, mode="join")
        .state.select("id", "label").collect()
    )
    assert cc_a == cc_b
    lpa_a = dict(
        lpa_csr(spark, edges, max_iters=3).state.select("id", "label").collect()
    )
    lpa_b = dict(
        label_propagation(spark, edges, max_iters=3, mode="join")
        .state.select("id", "label").collect()
    )
    assert lpa_a == lpa_b


def test_warm_block_registry_reuse_and_reroute(spark, monkeypatch):
    """Cross-algorithm block reuse ([C15] §4 partition reuse): a stream
    LPA run registers its undirected v5 blocks; a subsequent cc_csr in
    AUTO mode below the cold crossover then routes STREAM (warm blocks
    void the cold-build argument), adopts the same block dir without
    rebuilding, and still matches the join fixed point."""
    import os

    from chaos_spark import csr as csr_mod
    from chaos_spark.csr import lpa_csr

    monkeypatch.setattr(csr_mod, "_WARM_BLOCKS", {})
    edges = spark.createDataFrame(GRAPHS["two_cliques_bridge"]())

    # Directed / weighted flavors are distinct keys — no false sharing.
    k_und = csr_mod._warm_key(edges, True, None, None)
    k_dir = csr_mod._warm_key(edges, False, None, None)
    assert k_und is not None and k_dir is not None and k_und != k_dir

    lpa_csr(spark, edges, max_iters=3, mode="stream")
    assert csr_mod._warm_blocks_ready(k_und) is not None
    assert csr_mod._warm_blocks_ready(k_dir) is None
    token, block_dir = csr_mod._WARM_BLOCKS[k_und]
    marker = os.path.join(block_dir, "_BUILT")
    built_at = os.path.getmtime(marker)

    # Below the cold crossover the plain router says join...
    assert csr_mod._auto_route(edges, "auto", 12, None, None) == ("join", 12)
    # ...but with warm blocks the probe flips it to stream.
    assert csr_mod._auto_route(
        edges, "auto", 12, None, None, warm_key=k_und
    ) == ("stream", 12)

    cc_a = dict(cc_csr(spark, edges).state.select("id", "label").collect())
    cc_b = dict(
        connected_components(spark, edges, mode="join")
        .state.select("id", "label").collect()
    )
    assert cc_a == cc_b
    # Same registered dir, no rebuild (marker untouched), entry intact.
    assert csr_mod._WARM_BLOCKS[k_und] == (token, block_dir)
    assert os.path.getmtime(marker) == built_at

    # Registry self-heals when the dir vanishes: probe drops the entry
    # and the router falls back to the join path.
    import shutil

    shutil.rmtree(block_dir)
    assert csr_mod._warm_blocks_ready(k_und) is None
    assert k_und not in csr_mod._WARM_BLOCKS
    assert csr_mod._auto_route(
        edges, "auto", 12, None, None, warm_key=k_und
    ) == ("join", 12)
