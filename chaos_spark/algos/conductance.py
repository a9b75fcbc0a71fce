"""Conductance of a vertex cut — the last member of X-Stream's published
algorithm suite ([X13] §5.2 Table 2 lists Conductance alongside
BFS/WCC/…; a one-pass edge-centric scatter like SpMV).

For a membership assignment m(v) ∈ {0, 1} over the undirected,
deduplicated, self-loop-free closure of the edge table:

    cut     = |{ {u,v} ∈ E : m(u) ≠ m(v) }|        (each undirected edge once)
    vol(S)  = Σ_{v ∈ S} deg(v)                       (undirected degree)
    φ       = cut / min(vol(S), vol(V∖S))            (0 if the min volume is 0)

Spark mapping: orient each undirected edge once (src < dst after
symmetrized dedup), join membership onto both endpoints (the only
shuffle — two hash joins against the same membership frame), then a
single global aggregate computes cut and both volumes in one pass —
vol(S) = Σ m(u)+m(v) over oriented edges, since an edge contributes 1
to the degree of each endpoint. No iteration, no groupBy exchange: the
aggregate is a partial-agg reduce. Scale shape: membership is a
|V|-row 2-column frame; at huge |V| the joins shuffle-hash on id, at
small |V| Catalyst auto-broadcasts it — both correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph import DST, ID, SRC, dedup_edges, symmetrize


def conductance(
    spark: SparkSession,
    edges: DataFrame,
    membership: DataFrame,
    member_col: str = "member",
) -> DataFrame:
    """``membership`` is ``(id, <member_col>)`` with 0/1 values; every
    vertex of the edge table must appear (a missing endpoint raises —
    silently treating it as side 0 would misstate the cut). Returns a
    single row ``(cut_edges, vol_0, vol_1, conductance)`` where side 1
    is S (member = 1).
    """
    und = dedup_edges(symmetrize(edges), drop_self_loops=True)
    # one canonical row per undirected edge
    e = und.where(F.col(SRC) < F.col(DST))
    m = membership.select(
        F.col(ID), F.col(member_col).cast("int").alias("_m")
    )
    ms = m.select(F.col(ID).alias("_sid"), F.col("_m").alias("_ms"))
    mt = m.select(F.col(ID).alias("_tid"), F.col("_m").alias("_mt"))
    j = (
        e.join(ms, e[SRC] == ms["_sid"], "left")
        .join(mt, e[DST] == mt["_tid"], "left")
        .select("_ms", "_mt")
    )
    row = j.agg(
        F.sum(F.when(F.col("_ms").isNull() | F.col("_mt").isNull(), 1).otherwise(0)).alias("_missing"),
        F.sum(F.when(F.col("_ms") != F.col("_mt"), 1).otherwise(0)).alias("cut"),
        (F.sum("_ms") + F.sum("_mt")).alias("vol1"),
        F.count(F.lit(1)).alias("_ne"),
    ).first()
    if int(row["_missing"] or 0) > 0:
        raise ValueError(
            f"conductance: {row['_missing']} edge endpoints missing from membership"
        )
    cut = int(row["cut"] or 0)
    vol1 = int(row["vol1"] or 0)
    vol0 = 2 * int(row["_ne"]) - vol1  # each edge adds 2 to total volume
    denom = min(vol0, vol1)
    phi = float(cut) / denom if denom > 0 else 0.0
    return spark.createDataFrame(
        [(cut, vol0, vol1, phi)],
        "cut_edges bigint, vol_0 bigint, vol_1 bigint, conductance double",
    )
