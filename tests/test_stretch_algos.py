"""Oracle tests for the stretch suite: MIS, SCC, bipartiteness, Borůvka
MSF, HyperANF ([X13] §5.2 Table 2 parity set)."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

from chaos_spark.algos import (
    bipartite_check,
    hyper_anf,
    maximal_independent_set,
    minimum_spanning_forest,
    strongly_connected_components,
)
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw
from tests.oracles import nx_ungraph


# ---------------------------------------------------------------------------
# MIS — verify independence + maximality (any valid MIS; ours is
# deterministic, so additionally verify run-to-run equality)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gen", [g1_chain, g2_star, g3_cliques,
                                 lambda: g4_powerlaw(scale=9, num_edges=3000)])
def test_mis_independent_and_maximal(spark, gen):
    pdf = gen()
    edges = spark.createDataFrame(pdf)
    res = maximal_independent_set(spark, edges)
    assert res.converged
    in_set = {r["id"] for r in res.state.collect() if r["in_set"]}
    g = nx_ungraph(pdf, self_loops=False)
    for u, v in g.edges():
        assert not (u in in_set and v in in_set), f"edge ({u},{v}) inside MIS"
    for v in g.nodes():
        assert v in in_set or any(n in in_set for n in g.neighbors(v)), (
            f"vertex {v} not dominated"
        )


def test_mis_deterministic(spark):
    edges = spark.createDataFrame(g3_cliques())
    a = dict(maximal_independent_set(spark, edges).state.collect())
    b = dict(maximal_independent_set(spark, edges).state.collect())
    assert a == b


# ---------------------------------------------------------------------------
# SCC
# ---------------------------------------------------------------------------

def _scc_oracle(pdf: pd.DataFrame) -> dict[int, int]:
    g = nx.DiGraph()
    g.add_edges_from(pdf[["src", "dst"]].drop_duplicates().itertuples(index=False))
    out = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


def _scc_cases():
    cyc = pd.DataFrame({"src": [1, 2, 3, 4, 5, 6, 3], "dst": [2, 3, 1, 5, 6, 4, 4]})
    dag = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 4, 4]})
    return {"two_cycles_bridged": cyc, "dag_all_singletons": dag,
            "chain": g1_chain(), "powerlaw": g4_powerlaw(scale=8, num_edges=1500)}


@pytest.mark.parametrize("name", sorted(_scc_cases()))
def test_scc_matches_networkx(spark, name):
    pdf = _scc_cases()[name]
    edges = spark.createDataFrame(pdf)
    res = strongly_connected_components(spark, edges)
    assert res.converged
    got = dict(res.state.collect())
    assert got == _scc_oracle(pdf)


# ---------------------------------------------------------------------------
# Bipartiteness
# ---------------------------------------------------------------------------

def test_bipartite_even_cycle(spark):
    pdf = pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 1]})
    res = bipartite_check(spark, spark.createDataFrame(pdf))
    assert res.history[-1]["bipartite"] is True
    colors = {r["id"]: r["color"] for r in res.state.collect()}
    g = nx_ungraph(pdf, self_loops=False)
    for u, v in g.edges():
        assert colors[u] != colors[v]


def test_bipartite_odd_cycle_detected(spark):
    pdf = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    res = bipartite_check(spark, spark.createDataFrame(pdf))
    assert res.history[-1]["bipartite"] is False
    assert res.history[-1]["odd_edges"] >= 1


def test_bipartite_matches_networkx(spark):
    pdf = g4_powerlaw(scale=8, num_edges=1200)
    res = bipartite_check(spark, spark.createDataFrame(pdf))
    g = nx_ungraph(pdf, self_loops=False)
    assert res.history[-1]["bipartite"] == nx.is_bipartite(g)
    # parity vs shortest-path-from-min-root oracle, exact
    colors = {r["id"]: r["color"] for r in res.state.collect()}
    for comp in nx.connected_components(g):
        root = min(comp)
        dist = nx.single_source_shortest_path_length(g, root)
        for v in comp:
            assert colors[v] == dist[v] % 2


# ---------------------------------------------------------------------------
# Borůvka MSF
# ---------------------------------------------------------------------------

def _weighted(pdf: pd.DataFrame, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    out = pdf.copy()
    # unique weights -> unique MSF, exact comparison
    w = rng.permutation(len(out)) + 1.0
    out["weight"] = w
    return out


@pytest.mark.parametrize("gen", [g1_chain, g3_cliques,
                                 lambda: g4_powerlaw(scale=8, num_edges=1200)])
def test_boruvka_matches_networkx(spark, gen):
    pdf = _weighted(gen())
    edges = spark.createDataFrame(pdf)
    res = minimum_spanning_forest(spark, edges)
    assert res.converged
    got = {(r["src"], r["dst"]) for r in res.state.collect()}
    got_w = sum(r["weight"] for r in res.state.collect())

    g = nx.Graph()
    for r in pdf.itertuples(index=False):
        u, v = min(r.src, r.dst), max(r.src, r.dst)
        if u == v:
            continue
        if not g.has_edge(u, v) or g[u][v]["weight"] > r.weight:
            g.add_edge(u, v, weight=r.weight)
    want = {
        (min(u, v), max(u, v))
        for u, v in nx.minimum_spanning_edges(g, algorithm="boruvka", data=False)
    }
    want_w = sum(g[u][v]["weight"] for u, v in want)
    assert got == want
    assert abs(got_w - want_w) < 1e-9
    # forest size: |V| - #components
    assert len(got) == g.number_of_nodes() - nx.number_connected_components(g)


# ---------------------------------------------------------------------------
# HyperANF
# ---------------------------------------------------------------------------

def test_hyperanf_matches_exact_neighborhood_function(spark):
    pdf = g3_cliques()
    res = hyper_anf(spark, spark.createDataFrame(pdf), max_iters=20)
    assert res.converged
    g = nx_ungraph(pdf, self_loops=False)
    nf = {r["id"]: r["nf"] for r in res.state.collect()}
    for v in g.nodes():
        exact_curve = []
        dist = nx.single_source_shortest_path_length(g, v)
        maxh = len(nf[v]) - 1
        for h in range(maxh + 1):
            exact_curve.append(sum(1 for d in dist.values() if d <= h))
        est = nf[v]
        # 64-register HLL: allow 35% relative error pointwise
        for e, x in zip(est, exact_curve):
            assert abs(e - x) <= max(1.5, 0.35 * x), (v, est, exact_curve)
    # curve monotone in h
    for v, est in nf.items():
        assert all(b >= a - 1e-9 for a, b in zip(est, est[1:]))


def test_hyperanf_converges_to_component_size(spark):
    pdf = g1_chain()
    res = hyper_anf(spark, spark.createDataFrame(pdf), max_iters=30)
    g = nx_ungraph(pdf, self_loops=False)
    nf = {r["id"]: r["nf"][-1] for r in res.state.collect()}
    for comp in nx.connected_components(g):
        size = len(comp)
        for v in comp:
            assert abs(nf[v] - size) <= max(1.5, 0.35 * size)


def test_hyperanf_sql_hash_and_registers_match_numpy():
    """The DuckDB oracle's limb-decomposed mod-2^64 murmur finalizer and
    first-set-bit rank must agree bit-for-bit with _init_registers — the
    whole hyperanf_k3 value oracle rests on this."""
    import duckdb

    from chaos_spark.algos.hyperanf import M, _init_registers
    from chaos_spark.harness import hyperanf_sql

    ids = np.arange(0, 5000, dtype=np.int64)
    regs = _init_registers(ids, 42)
    want_j = regs.argmax(axis=1)
    want_rank = regs.max(axis=1)

    con = duckdb.connect()
    con.execute("CREATE TABLE E AS SELECT range::BIGINT AS src,"
                " range::BIGINT AS dst FROM range(0, 5000)")
    # k=0: the oracle's r0 CTE is exactly the init registers (self-loop
    # edges keep every vertex isolated, so no propagation even at k>0).
    sql = hyperanf_sql("SELECT src, dst FROM E", 0)
    got = con.execute(
        sql.replace("FROM est", "FROM est") + " ORDER BY id"
    ).df()
    # pull the raw (j, rank) rows from the r0 CTE directly
    r0 = con.execute(
        "WITH " + sql.split("WITH ", 1)[1].split("\nSELECT id, ROUND")[0]
        + " SELECT id, j, rank FROM r0 ORDER BY id"
    ).df()
    assert len(r0) == len(ids)
    assert (r0["j"].to_numpy() == want_j).all()
    assert (r0["rank"].to_numpy() == want_rank).all()
    # and the estimate column exists for every vertex
    assert len(got) == len(ids)


def test_conductance_hand_computed(spark):
    """Two triangles joined by one bridge; S = one triangle. cut = 1,
    vol(S) = vol(S~) = 7 (3 internal edges x2 + the bridge endpoint),
    phi = 1/7. Also checked against networkx on a random graph below."""
    from chaos_spark.algos.conductance import conductance

    tri = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3)]
    edges = spark.createDataFrame(pd.DataFrame(tri, columns=["src", "dst"]))
    m = spark.createDataFrame(
        pd.DataFrame({"id": range(6), "member": [1, 1, 1, 0, 0, 0]})
    )
    row = conductance(spark, edges, m).first()
    assert row["cut_edges"] == 1
    assert row["vol_0"] == row["vol_1"] == 7
    assert abs(row["conductance"] - 1 / 7) < 1e-15


def test_conductance_matches_networkx(spark):
    from chaos_spark.algos.conductance import conductance

    pdf = g4_powerlaw(scale=8, num_edges=1500)
    g = nx_ungraph(pdf)
    g.remove_edges_from(nx.selfloop_edges(g))
    s = {v for v in g.nodes if v % 3 == 0}
    want = nx.conductance(g, s)
    edges = spark.createDataFrame(pdf)
    m = spark.createDataFrame(
        pd.DataFrame({"id": list(g.nodes), "member": [int(v % 3 == 0) for v in g.nodes]})
    )
    row = conductance(spark, edges, m).first()
    assert abs(row["conductance"] - want) < 1e-12


def test_conductance_missing_membership_raises(spark):
    from chaos_spark.algos.conductance import conductance

    edges = spark.createDataFrame(pd.DataFrame({"src": [0, 1], "dst": [1, 2]}))
    m = spark.createDataFrame(pd.DataFrame({"id": [0, 1], "member": [0, 1]}))
    with pytest.raises(ValueError, match="missing from membership"):
        conductance(spark, edges, m)
