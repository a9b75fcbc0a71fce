from chaos_spark.algos import label_propagation
from chaos_spark.fixtures import g1_chain, g3_cliques, g4_powerlaw
from tests.oracles import lpa_oracle


def _check(spark, edges_pdf, max_iters=10):
    edges = spark.createDataFrame(edges_pdf)
    res = label_propagation(spark, edges, max_iters=max_iters, mode="join")
    got = {r["id"]: r["label"] for r in res.state.collect()}
    want = lpa_oracle(edges_pdf, max_iters=max_iters)
    assert got == want


def test_lpa_chain(spark):
    _check(spark, g1_chain())


def test_lpa_cliques_two_communities(spark):
    pdf = g3_cliques()
    _check(spark, pdf)
    res = label_propagation(spark, spark.createDataFrame(pdf), mode="join")
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert labels[10] == 10  # isolated-but-for-self-loop keeps its label


def test_lpa_powerlaw(spark):
    _check(spark, g4_powerlaw(scale=9, num_edges=2000), max_iters=5)
