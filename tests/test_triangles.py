from chaos_spark.algos import triangle_count, triangle_counts_per_vertex
from chaos_spark.fixtures import g1_chain, g3_cliques, g4_powerlaw
from tests.oracles import triangles_oracle


def test_triangles_chain_zero(spark):
    edges = spark.createDataFrame(g1_chain())
    assert triangle_count(spark, edges) == 0


def test_triangles_cliques(spark):
    pdf = g3_cliques()
    edges = spark.createDataFrame(pdf)
    # two 5-cliques -> 2 * C(5,3) = 20 triangles; bridge adds none
    assert triangle_count(spark, edges) == 20
    got = {r["id"]: r["triangles"] for r in triangle_counts_per_vertex(spark, edges).collect()}
    assert got == triangles_oracle(pdf)


def test_triangles_powerlaw(spark):
    pdf = g4_powerlaw(scale=9, num_edges=4000)
    edges = spark.createDataFrame(pdf)
    want = triangles_oracle(pdf)
    assert triangle_count(spark, edges) == sum(want.values()) // 3
    got = {r["id"]: r["triangles"] for r in triangle_counts_per_vertex(spark, edges).collect()}
    assert got == want
