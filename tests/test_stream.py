"""Fused streaming-partition superstep ≡ join path (SURVEY §3.2 property).

pagerank_stream must compute the same fixed point, in the same number of
supersteps, as the DataFrame join path and the classic CSR path — allclose
(float association differs across paths), exact id set, rank mass 1. Plus
the stream-specific invariants: resume from a mid-run checkpoint equals the
uninterrupted run (update streams are regenerated, not checkpointed), and
weighted graphs ride the same blocks.
"""

from __future__ import annotations

import numpy as np
import pytest

from chaos_spark.algos import pagerank
from chaos_spark.checkpoint import CheckpointManager
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw
from chaos_spark.stream import pagerank_stream

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
def test_pagerank_stream_equals_join_path(spark, name):
    edges = spark.createDataFrame(GRAPHS[name]())
    r_join = pagerank(spark, edges, tol=1e-6, max_iters=60, mode="shuffle")
    r_str = pagerank_stream(spark, edges, tol=1e-6, max_iters=60)
    a, b = _ranks(r_join), _ranks(r_str)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-9)
    assert r_str.supersteps == r_join.supersteps


def test_pagerank_stream_matches_oracle(spark):
    pdf = GRAPHS["powerlaw"]()
    edges = spark.createDataFrame(pdf)
    res = pagerank_stream(spark, edges, tol=1e-9, max_iters=500)
    assert res.converged
    got = _ranks(res)
    want = pagerank_oracle(pdf)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_stream_weighted_equals_join(spark):
    # Chain + extra weighted edges; weights sum per duplicate (src, dst).
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "src": [0, 1, 2, 3, 4, 0, 0, 2],
            "dst": [1, 2, 3, 4, 0, 2, 2, 4],
            "w": [1.0, 2.0, 0.5, 1.5, 1.0, 3.0, 1.0, 2.5],
        }
    )
    edges = spark.createDataFrame(pdf)
    r_join = pagerank(spark, edges, weight_col="w", tol=1e-8, max_iters=80,
                      mode="shuffle")
    r_str = pagerank_stream(spark, edges, weight_col="w", tol=1e-8,
                            max_iters=80)
    a, b = _ranks(r_join), _ranks(r_str)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-9)


def test_pagerank_stream_chained_equals_unchained(spark):
    # chain=K stacks K supersteps per Spark job with shuffle barriers;
    # fixed-iteration runs must produce identical results (same kernels,
    # same fixed-order dangling fold) and the same superstep count.
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    a = pagerank_stream(spark, edges, tol=0.0, max_iters=9, chain=1)
    b = pagerank_stream(spark, edges, tol=0.0, max_iters=9, chain=4)
    assert a.supersteps == b.supersteps == 9
    ra, rb = _ranks(a), _ranks(b)
    assert set(ra) == set(rb)
    ks = sorted(ra)
    assert np.allclose([ra[k] for k in ks], [rb[k] for k in ks],
                       rtol=0, atol=1e-15)
    # per-layer deltas observed inside the chained jobs match unchained
    da = [h["delta"] for h in a.history]
    db = [h["delta"] for h in b.history]
    assert np.allclose(da[1:], db[1:], rtol=1e-9, atol=1e-15)


def test_pagerank_stream_chained_with_tol_overshoot_bounded(spark):
    # ADVICE r4: chain>1 + tol>0 was untested. Contract (module docstring):
    # the chained run stops at the first JOB whose layers converged, so it
    # may run up to chain-1 supersteps PAST the unchained convergence
    # point — never fewer, never more than that, and the returned state is
    # at least as converged (its last observed delta is also under tol).
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    tol = 1e-6
    a = pagerank_stream(spark, edges, tol=tol, max_iters=60, chain=1)
    b = pagerank_stream(spark, edges, tol=tol, max_iters=60, chain=3)
    assert a.converged and b.converged
    assert a.supersteps <= b.supersteps <= a.supersteps + 2
    assert b.history[-1]["delta"] < tol
    # Both are within tol of the fixed point; successive iterates differ
    # by < tol, so the K-1 overshoot bounds the disagreement by ~2*tol.
    ra, rb = _ranks(a), _ranks(b)
    assert set(ra) == set(rb)
    ks = sorted(ra)
    assert np.allclose([ra[k] for k in ks], [rb[k] for k in ks],
                       rtol=0, atol=3 * tol)


def test_pagerank_stream_chained_resume_equals_uninterrupted(spark, tmp_path):
    # ADVICE r4: resume of a CHAINED run was untested. Fixed-iters (tol=0)
    # so the contract is exact: checkpoint at superstep 4, resume with the
    # same chain, identical final blobs vs the uninterrupted chained run.
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    config = {"algo": "pagerank_stream", "chain": 2, "graph": "g4s9"}

    full = pagerank_stream(spark, edges, tol=0.0, max_iters=8, chain=2)

    cp1 = CheckpointManager(str(tmp_path / "cp"), "pagerank_stream", config)
    part = pagerank_stream(
        spark, edges, tol=0.0, max_iters=4, chain=2,
        checkpointer=cp1, checkpoint_every=4,
    )
    assert part.supersteps == 4
    assert cp1.latest() is not None and cp1.latest()["superstep"] == 4

    cp2 = CheckpointManager(str(tmp_path / "cp"), "pagerank_stream", config)
    res = pagerank_stream(
        spark, edges, tol=0.0, max_iters=8, chain=2,
        checkpointer=cp2, checkpoint_every=4,
    )
    a, b = _ranks(full), _ranks(res)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks],
                       rtol=0, atol=1e-15)
    assert res.supersteps == full.supersteps == 8


def test_pagerank_stream_state_partitions_invariance(spark):
    # Physical blob placement must never affect results: kernels route by
    # the row's part value, not the task index.
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    a = pagerank_stream(spark, edges, tol=1e-6, max_iters=30)
    b = pagerank_stream(spark, edges, tol=1e-6, max_iters=30,
                        state_partitions=2)
    assert a.supersteps == b.supersteps
    ra, rb = _ranks(a), _ranks(b)
    ks = sorted(ra)
    assert np.allclose([ra[k] for k in ks], [rb[k] for k in ks],
                       rtol=0, atol=1e-15)


def test_pagerank_stream_resume_equals_uninterrupted(spark, tmp_path):
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    config = {"algo": "pagerank_stream", "tol": 1e-6, "graph": "g4s9"}

    full = pagerank_stream(spark, edges, tol=1e-6, max_iters=40)

    # Interrupted run: stop after the first checkpoint (superstep 3).
    cp1 = CheckpointManager(str(tmp_path / "cp"), "pagerank_stream", config)
    part = pagerank_stream(
        spark, edges, tol=1e-6, max_iters=3,
        checkpointer=cp1, checkpoint_every=3,
    )
    assert part.supersteps == 3
    assert cp1.latest() is not None and cp1.latest()["superstep"] == 3

    # Resume with a FRESH manager (new process image) and finish.
    cp2 = CheckpointManager(str(tmp_path / "cp"), "pagerank_stream", config)
    res = pagerank_stream(
        spark, edges, tol=1e-6, max_iters=40,
        checkpointer=cp2, checkpoint_every=3,
    )
    a, b = _ranks(full), _ranks(res)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-12)
    assert res.supersteps == full.supersteps


def test_pagerank_stream_warm_start_continues_exactly(spark):
    """warm(cold-k3 state) + 2 supersteps == cold k5 on the stream path —
    the scale path's incremental re-rank handoff (streaming ingest grows
    the graph, re-rank from prior ranks). Bit-level continuation: the
    kernels are fixed-order numpy folds, so no allclose slack is needed
    beyond the init frame's join nondeterminism (none: ranks ride rows)."""
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    cold3 = pagerank_stream(spark, edges, tol=0.0, max_iters=3)
    warm = pagerank_stream(
        spark, edges, tol=0.0, max_iters=2,
        init_ranks=cold3.state.select("id", "rank"),
    )
    cold5 = pagerank_stream(spark, edges, tol=0.0, max_iters=5)
    a, b = _ranks(warm), _ranks(cold5)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-15)


def test_pagerank_csr_warm_start_continues_exactly(spark):
    from chaos_spark.csr import pagerank_csr

    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    cold3 = pagerank_csr(spark, edges, tol=0.0, max_iters=3, mode="csr")
    warm = pagerank_csr(
        spark, edges, tol=0.0, max_iters=2, mode="csr",
        init_ranks=cold3.state.select("id", "rank"),
    )
    cold5 = pagerank_csr(spark, edges, tol=0.0, max_iters=5, mode="csr")
    a, b = _ranks(warm), _ranks(cold5)
    assert set(a) == set(b)
    ks = sorted(a)
    assert np.allclose([a[k] for k in ks], [b[k] for k in ks], rtol=0, atol=1e-12)
