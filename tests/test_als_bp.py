"""ALS and belief propagation — the numeric message-passing kernels
([X13] §5.2 `als*`, `bp*`)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest

from chaos_spark.algos import als, belief_propagation
from chaos_spark.algos.bp import _phi
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ALS
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def low_rank_ratings():
    rng = np.random.default_rng(11)
    U = rng.uniform(0.5, 1.5, size=(6, 2))
    V = rng.uniform(0.5, 1.5, size=(5, 2))
    R = U @ V.T  # exactly rank-2, fully observed
    rows = [
        (u + 1, 100 + i, float(R[u, i]))
        for u in range(6) for i in range(5)
    ]
    return pd.DataFrame(rows, columns=["src", "dst", "weight"])


def test_als_fits_low_rank_matrix(spark, low_rank_ratings):
    ratings = spark.createDataFrame(low_rank_ratings)
    res = als(spark, ratings, rank=2, reg=1e-3, num_sweeps=12)
    rmses = [h["rmse"] for h in res.history]
    assert rmses[-1] < 0.02, rmses
    assert rmses[-1] <= rmses[0]
    # state shape: every user and item has a rank-2 vector
    rows = res.state.collect()
    assert len(rows) == 11
    assert all(len(r["vec"]) == 2 for r in rows)
    sides = {r["side"] for r in rows}
    assert sides == {"user", "item"}


def test_als_deterministic(spark, low_rank_ratings):
    ratings = spark.createDataFrame(low_rank_ratings)
    a = als(spark, ratings, rank=2, reg=1e-2, num_sweeps=3)
    b = als(spark, ratings, rank=2, reg=1e-2, num_sweeps=3)
    va = {(r["id"], r["side"]): r["vec"] for r in a.state.collect()}
    vb = {(r["id"], r["side"]): r["vec"] for r in b.state.collect()}
    assert set(va) == set(vb)
    for k in va:
        assert np.allclose(va[k], vb[k], atol=1e-12)


# ---------------------------------------------------------------------------
# BP
# ---------------------------------------------------------------------------

def _phi_values(spark, ids):
    df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    rows = df.select("id", _phi(F.col("id"), 1).alias("p1")).collect()
    return {r["id"]: r["p1"] for r in rows}


def _exact_marginals(edges, phi1, w):
    """Brute-force MRF marginals P[x_v = 1] by state enumeration."""
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    psi = np.array([[w, 1 - w], [1 - w, w]])
    z = np.zeros(len(nodes))
    total = 0.0
    for assign in itertools.product([0, 1], repeat=len(nodes)):
        p = 1.0
        for v in nodes:
            p *= phi1[v] if assign[idx[v]] == 1 else 1 - phi1[v]
        for u, v in edges:
            p *= psi[assign[idx[u]], assign[idx[v]]]
        total += p
        for v in nodes:
            if assign[idx[v]] == 1:
                z[idx[v]] += p
    return {v: z[idx[v]] / total for v in nodes}


def test_bp_uniform_coupling_gives_node_potentials(spark):
    """w = 0.5 makes ψ uninformative: beliefs must equal φ exactly."""
    pdf = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4]})
    res = belief_propagation(spark, spark.createDataFrame(pdf), coupling=0.5)
    assert res.converged
    got = {r["id"]: r["b1"] for r in res.state.collect()}
    want = _phi_values(spark, got.keys())
    for v in got:
        assert abs(got[v] - want[v]) < 1e-9


def test_bp_exact_on_tree(spark):
    """Loopy BP is exact on trees — compare to brute-force enumeration."""
    edges = [(1, 2), (2, 3), (2, 4), (4, 5)]
    pdf = pd.DataFrame(edges, columns=["src", "dst"])
    res = belief_propagation(
        spark, spark.createDataFrame(pdf), coupling=0.7, tol=1e-10
    )
    assert res.converged
    got = {r["id"]: r["b1"] for r in res.state.collect()}
    phi1 = _phi_values(spark, got.keys())
    want = _exact_marginals(edges, phi1, 0.7)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])


def test_bp_loopy_converges_and_is_calibrated(spark):
    """On a cycle: converges, beliefs in (0,1), coupling pulls adjacent
    beliefs together relative to their bare potentials."""
    pdf = pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 1]})
    res = belief_propagation(spark, spark.createDataFrame(pdf), coupling=0.8)
    assert res.converged
    got = {r["id"]: r["b1"] for r in res.state.collect()}
    assert all(0.0 < b < 1.0 for b in got.values())
    phi1 = _phi_values(spark, got.keys())
    spread_phi = max(phi1.values()) - min(phi1.values())
    spread_bp = max(got.values()) - min(got.values())
    assert spread_bp < spread_phi  # attractive smoothing
