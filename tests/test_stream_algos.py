"""Fused stream CC/LPA ≡ join and classic-CSR paths (SURVEY §3.2 property).

cc_stream / lpa_stream must reach the EXACT same fixed point, in the same
number of supersteps, as the DataFrame join paths (min-fold and integer
mode counts are order-free — no float tolerance anywhere). Plus the
stream-specific invariants from tests/test_stream.py: resume from a
mid-run checkpoint equals the uninterrupted run, and physical blob
placement (state_partitions) never affects results.
"""

from __future__ import annotations

import pytest

from chaos_spark.algos.cc import connected_components
from chaos_spark.algos.lpa import label_propagation
from chaos_spark.checkpoint import CheckpointManager
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw
from chaos_spark.stream_algos import cc_stream, lpa_stream

from tests.oracles import cc_oracle, lpa_oracle

GRAPHS = {
    "chain": g1_chain,
    "star_hub": g2_star,
    "two_cliques_bridge": g3_cliques,
    "powerlaw": lambda: g4_powerlaw(scale=10, num_edges=5000),
}


def _labels(res):
    return {r["id"]: r["label"] for r in res.state.select("id", "label").collect()}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_stream_equals_join_path(spark, name):
    edges = spark.createDataFrame(GRAPHS[name]())
    r_join = connected_components(spark, edges, max_iters=100)
    r_str = cc_stream(spark, edges, max_iters=100)
    assert _labels(r_join) == _labels(r_str)
    assert r_str.supersteps == r_join.supersteps
    assert r_str.converged


def test_cc_stream_matches_oracle(spark):
    pdf = GRAPHS["powerlaw"]()
    edges = spark.createDataFrame(pdf)
    res = cc_stream(spark, edges, max_iters=100)
    assert res.converged
    assert _labels(res) == cc_oracle(pdf)


@pytest.mark.parametrize("name", ["two_cliques_bridge", "powerlaw"])
def test_lpa_stream_equals_join_path(spark, name):
    edges = spark.createDataFrame(GRAPHS[name]())
    r_join = label_propagation(spark, edges, max_iters=7)
    r_str = lpa_stream(spark, edges, max_iters=7)
    assert _labels(r_join) == _labels(r_str)
    assert r_str.supersteps == r_join.supersteps


def test_lpa_stream_matches_oracle(spark):
    pdf = GRAPHS["two_cliques_bridge"]()
    edges = spark.createDataFrame(pdf)
    res = lpa_stream(spark, edges, max_iters=10)
    assert _labels(res) == lpa_oracle(pdf, max_iters=10)


def test_cc_stream_state_partitions_invariance(spark):
    # Kernels route by the row's part value, never the task index.
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    a = cc_stream(spark, edges, max_iters=100)
    b = cc_stream(spark, edges, max_iters=100, state_partitions=2)
    assert _labels(a) == _labels(b)
    assert a.supersteps == b.supersteps


def test_cc_stream_resume_equals_uninterrupted(spark, tmp_path):
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    config = {"algo": "cc_stream", "graph": "g4s9"}

    full = cc_stream(spark, edges, max_iters=100)

    cp1 = CheckpointManager(str(tmp_path / "cp"), "cc_stream", config)
    part = cc_stream(
        spark, edges, max_iters=2, checkpointer=cp1, checkpoint_every=2,
    )
    assert part.supersteps == 2
    assert cp1.latest() is not None and cp1.latest()["superstep"] == 2

    cp2 = CheckpointManager(str(tmp_path / "cp"), "cc_stream", config)
    res = cc_stream(
        spark, edges, max_iters=100, checkpointer=cp2, checkpoint_every=2,
    )
    assert _labels(full) == _labels(res)
    assert res.supersteps == full.supersteps


def test_lpa_stream_resume_equals_uninterrupted(spark, tmp_path):
    pdf = g4_powerlaw(scale=9, num_edges=3000)
    edges = spark.createDataFrame(pdf)
    config = {"algo": "lpa_stream", "graph": "g4s9"}

    full = lpa_stream(spark, edges, max_iters=8)

    cp1 = CheckpointManager(str(tmp_path / "cp"), "lpa_stream", config)
    lpa_stream(spark, edges, max_iters=3, checkpointer=cp1, checkpoint_every=3)
    assert cp1.latest() is not None and cp1.latest()["superstep"] == 3

    cp2 = CheckpointManager(str(tmp_path / "cp"), "lpa_stream", config)
    res = lpa_stream(
        spark, edges, max_iters=8, checkpointer=cp2, checkpoint_every=3,
    )
    assert _labels(full) == _labels(res)
    assert res.supersteps == full.supersteps
