"""Minimum spanning forest — Borůvka over weighted edges.

Semantics ([X13] §5.2 `mcst` kernel): rounds over the undirected weighted
graph; every component selects its minimum-weight outgoing edge (ties
broken by (weight, min endpoint, max endpoint) so the chosen forest is
unique even with duplicate weights), selected edges join the forest, and
touched components merge. Repeat until no component has an outgoing edge
(one round of Chaos = one scatter/gather on the component-contracted
graph; we contract logically via a component-label table instead of
rewriting the edge table).

Component merging after selection is itself a hash-min fixpoint over just
the selected edges (a pseudo-forest, so it converges in O(log of the
largest merged chain) supersteps — cheap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..engine import (
    RunResult,
    choose_num_partitions,
    materialize,
    superstep_conf,
)
from ..graph import DST, ID, SRC, partition_edges, vertices_from_edges


def minimum_spanning_forest(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> RunResult:
    """Borůvka MSF over ``edges(src, dst, weight)`` (treated undirected,
    self-loops dropped). Result ``state``: the forest edges
    ``(src, dst, weight)`` with src < dst, deterministic tie-breaks."""
    p = num_partitions or choose_num_partitions(spark, edges.count() * 2)
    with superstep_conf(spark, p):
        return _boruvka(spark, edges, max_rounds, p)


def _boruvka(spark, edges, max_rounds, p) -> RunResult:
    # Canonical undirected weighted edges: src < dst, min weight per pair.
    canon = (
        edges.where(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias(SRC),
            F.greatest(SRC, DST).alias(DST),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy(SRC, DST)
        .agg(F.min("weight").alias("weight"))
    )
    canon = partition_edges(canon.select(SRC, DST, "weight"), p, by=SRC).persist()
    canon.count()
    verts = vertices_from_edges(canon)

    labels = materialize(
        verts.select(F.col(ID), F.col(ID).alias("comp")).repartition(p, F.col(ID))
    )
    labels.count()

    forest = None
    history = []
    supersteps = 0

    for round_no in range(max_rounds):
        lab_s = labels.select(F.col(ID).alias(SRC), F.col("comp").alias("c1"))
        lab_d = labels.select(F.col(ID).alias(DST), F.col("comp").alias("c2"))
        xe = (
            canon.join(lab_s, SRC).join(lab_d, DST)
            .where(F.col("c1") != F.col("c2"))
            .select(
                SRC, DST, "weight", "c1", "c2",
                F.struct(
                    F.col("weight"), F.col(SRC).alias("s"), F.col(DST).alias("d")
                ).alias("pick"),
            )
        )
        # Each component picks its min outgoing edge (both directions).
        per_comp = (
            xe.select(F.col("c1").alias("comp"), "pick")
            .union(xe.select(F.col("c2").alias("comp"), "pick"))
            .groupBy("comp")
            .agg(F.min("pick").alias("pick"))
            .select(
                F.col("pick.s").alias(SRC),
                F.col("pick.d").alias(DST),
                F.col("pick.weight").alias("weight"),
            )
            .distinct()
        )
        per_comp = per_comp.persist()
        n_sel = per_comp.count()
        supersteps += 1
        history.append({"superstep": supersteps, "seconds": 0.0,
                        "selected": n_sel, "converged": n_sel == 0})
        if n_sel == 0:
            per_comp.unpersist()
            break
        forest = per_comp if forest is None else forest.union(per_comp)
        forest = materialize(forest)
        forest.count()

        # Merge components: hash-min fixpoint over selected edges between
        # current component labels.
        sel_comp = (
            per_comp.join(lab_s, SRC).join(lab_d, DST)
            .select(F.col("c1").alias("a"), F.col("c2").alias("b"))
        )
        sel_und = sel_comp.union(
            sel_comp.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct().persist()
        sel_und.count()
        cmap = materialize(
            labels.select(F.col("comp").alias("a")).distinct()
            .select(F.col("a"), F.col("a").alias("new"))
        )
        while True:
            nbr = cmap.select(F.col("a").alias("_b2"), F.col("new").alias("bn"))
            mins = sel_und.join(nbr, sel_und["b"] == nbr["_b2"]).groupBy(
                sel_und["a"].alias("a")
            ).agg(F.min("bn").alias("mn"))
            nxt = materialize(
                cmap.join(mins, "a", "left").select(
                    F.col("a"),
                    F.least(F.col("new"), F.coalesce(F.col("mn"), F.col("new"))).alias("new"),
                    (F.coalesce(F.col("mn"), F.col("new")) < F.col("new")).alias("_chg"),
                )
            )
            changed = nxt.where(F.col("_chg")).count()
            supersteps += 1
            cmap = nxt.select("a", "new")
            if changed == 0:
                break
        labels = materialize(
            labels.join(cmap, labels["comp"] == cmap["a"])
            .select(labels[ID], F.col("new").alias("comp"))
            .repartition(p, F.col(ID))
        )
        labels.count()
        sel_und.unpersist()
        per_comp.unpersist()

    canon.unpersist()
    state = (
        forest.select(SRC, DST, "weight")
        if forest is not None
        else spark.createDataFrame([], f"{SRC} long, {DST} long, weight double")
    )
    return RunResult(
        state=state,
        supersteps=supersteps,
        converged=history[-1]["converged"] if history else True,
        history=history,
    )
