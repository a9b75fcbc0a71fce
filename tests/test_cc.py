from chaos_spark.algos import connected_components
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw
from tests.oracles import cc_oracle


def _check(spark, edges_pdf):
    edges = spark.createDataFrame(edges_pdf)
    res = connected_components(spark, edges, max_iters=100)
    assert res.converged
    got = {r["id"]: r["label"] for r in res.state.collect()}
    want = cc_oracle(edges_pdf)
    assert got == want


def test_cc_chain(spark):
    _check(spark, g1_chain())


def test_cc_star(spark):
    _check(spark, g2_star())


def test_cc_cliques_three_components(spark):
    pdf = g3_cliques()
    edges = spark.createDataFrame(pdf)
    res = connected_components(spark, edges)
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert labels == cc_oracle(pdf)
    # one merged component (bridge 4->5) + singleton 10
    assert len(set(labels.values())) == 2
    assert labels[10] == 10


def test_cc_powerlaw(spark):
    _check(spark, g4_powerlaw(scale=10, num_edges=3000))
