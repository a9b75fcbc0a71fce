from chaos_spark.algos import connected_components
from chaos_spark.fixtures import g1_chain, g2_star, g3_cliques, g4_powerlaw
from tests.oracles import cc_oracle


def _check(spark, edges_pdf):
    edges = spark.createDataFrame(edges_pdf)
    res = connected_components(spark, edges, max_iters=100, mode="join")
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
    res = connected_components(spark, edges, mode="join")
    labels = {r["id"]: r["label"] for r in res.state.collect()}
    assert labels == cc_oracle(pdf)
    # one merged component (bridge 4->5) + singleton 10
    assert len(set(labels.values())) == 2
    assert labels[10] == 10


def test_cc_powerlaw(spark):
    _check(spark, g4_powerlaw(scale=10, num_edges=3000))


def test_cc_warm_start_continues_exactly(spark):
    """warm(cold-k3 labels) + 3 supersteps == cold k6, label for label —
    the distance-min identity L_t(v) = min_{d(u,v)<=t} L_0(u)."""
    pdf = g4_powerlaw(scale=9, num_edges=2500)
    edges = spark.createDataFrame(pdf)
    cold3 = connected_components(spark, edges, max_iters=3, mode="join")
    warm = connected_components(
        spark, edges, max_iters=3, init_labels=cold3.state.select("id", "label")
    )
    cold6 = connected_components(spark, edges, max_iters=6, mode="join")
    a = {r["id"]: r["label"] for r in warm.state.collect()}
    b = {r["id"]: r["label"] for r in cold6.state.collect()}
    assert a == b


def test_cc_warm_start_on_grown_graph_exact(spark):
    """Append-only growth: warm-starting from the old graph's converged
    labels reaches the exact per-component min-id fixed point of the
    grown graph, in no more supersteps than cold."""
    pdf = g3_cliques()
    grown = spark.createDataFrame(pdf)
    old = spark.createDataFrame(pdf.iloc[: len(pdf) // 2])
    prior = connected_components(spark, old, max_iters=200,
                                 mode="join").state.select(
        "id", "label"
    )
    warm = connected_components(spark, grown, max_iters=200, init_labels=prior)
    cold = connected_components(spark, grown, max_iters=200, mode="join")
    a = {r["id"]: r["label"] for r in warm.state.collect()}
    want = cc_oracle(pdf)
    assert a == want
    assert warm.supersteps <= cold.supersteps
