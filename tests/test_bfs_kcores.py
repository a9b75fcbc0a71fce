import networkx as nx
import pandas as pd

from chaos_spark.algos import bfs, k_core, sssp
from chaos_spark.fixtures import g1_chain, g3_cliques, g4_powerlaw
from tests.oracles import nx_digraph, nx_ungraph


def test_bfs_chain(spark):
    pdf = g1_chain()
    res = bfs(spark, spark.createDataFrame(pdf), root=0)
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    assert got == {i: float(i) for i in range(8)}


def test_bfs_unreachable_null(spark):
    pdf = g1_chain()
    res = bfs(spark, spark.createDataFrame(pdf), root=3)
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    assert got[0] is None and got[7] == 4.0


def test_sssp_weighted(spark):
    pdf = pd.DataFrame(
        {"src": [0, 0, 1, 2], "dst": [1, 2, 3, 3], "weight": [1.0, 4.0, 1.0, 1.0]}
    )
    res = sssp(spark, spark.createDataFrame(pdf), root=0, weight_col="weight")
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 4.0, 3: 2.0}


def test_bfs_powerlaw_vs_networkx(spark):
    pdf = g4_powerlaw(scale=9, num_edges=2000)
    root = int(pdf["src"].iloc[0])
    res = bfs(spark, spark.createDataFrame(pdf), root=root)
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    want = nx.single_source_shortest_path_length(nx_digraph(pdf), root)
    for v, d in got.items():
        assert (d is None and v not in want) or (d == float(want[v]))


def test_kcore_cliques(spark):
    pdf = g3_cliques()
    res = k_core(spark, spark.createDataFrame(pdf), k=4)
    got = {r["id"] for r in res.state.collect() if r["in_core"]}
    want = set(nx.k_core(nx_ungraph(pdf, self_loops=False), 4).nodes())
    assert got == want == set(range(10))
