from chaos_spark.generators import (
    erdos_renyi_edges_spark,
    rmat_edges_numpy,
    rmat_edges_spark,
)


def test_rmat_numpy_deterministic():
    a = rmat_edges_numpy(10, 1000, seed=42)
    b = rmat_edges_numpy(10, 1000, seed=42)
    assert a.equals(b)
    assert a["src"].between(0, 1023).all() and a["dst"].between(0, 1023).all()


def test_rmat_spark_deterministic_across_parallelism(spark):
    """The distributed generator must be partition-count invariant —
    the property that lets it scale to the trillion-edge tier."""
    a = rmat_edges_spark(spark, 10, 2000, seed=7, num_partitions=2)
    b = rmat_edges_spark(spark, 10, 2000, seed=7, num_partitions=8)
    pa = a.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert pa.equals(pb)
    assert pa["src"].between(0, 1023).all()


def test_rmat_spark_skew_shape(spark):
    """Quadrant probs (0.57,...) must concentrate mass on low ids."""
    df = rmat_edges_spark(spark, 12, 20000, seed=42).toPandas()
    low = (df["src"] < 2048).mean()
    assert low > 0.6  # heavily skewed toward the first half of the id space


def test_erdos_renyi(spark):
    df = erdos_renyi_edges_spark(spark, 100, 5000, seed=1).toPandas()
    assert df["src"].between(0, 99).all() and df["dst"].between(0, 99).all()
    # roughly uniform: every decile of the id space is hit
    assert df["src"].floordiv(10).nunique() == 10
