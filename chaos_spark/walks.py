"""Deterministic distributed random walks — the embedding-corpus
generator of a training-data pipeline (DeepWalk / node2vec-style walk
sequences feed skip-gram embedding training; Perozzi et al. KDD'14).

Every "random" choice derives from Spark's ``xxhash64`` — the same
collect-free determinism move as the seeded graph generators
(generators.py): at step t, a walk started at vertex s standing on
vertex u hops to the ``pmod(xxhash64(s, t, seed, u), outdeg(u))``-th
out-neighbor in dst-ascending order. No RNG state rides the executors,
any parallelism produces the identical corpus, and a retried task
recomputes identical rows. Because the choice hash is pure integer
math, DuckDB reproduces the whole corpus BIT-FOR-BIT via the XXH64
limb-math image (genoracle.py) — the ``random_walks_l4`` driver query
is value-verified, not just shape-checked.

Execution shape (scale review): the ranked adjacency (one row_number
window over the deduped edges, shuffled by src ONCE) and the degree
pre-pass are static and persisted; each step shuffles only the live
WALK FRONTIER (≤ one row per walk) against them — hash joins on the
walk's current vertex, the same per-superstep shape as BFS. Dangling
vertices terminate their walks (inner join against the out-degree
table), so the frontier only shrinks. L steps = L joins; states are
materialized per step so the final union of L+1 frames carries no
compounding lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .engine import choose_num_partitions, materialize, superstep_conf
from .graph import DST, ID, SRC, dedup_edges, out_degrees, vertices_from_edges

WALK, STEP, CUR = "walk_id", "step", "cur"


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int,
    seed: int = 42,
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
    num_walks: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Generate ``num_walks`` walks of ``length`` hops from every start
    vertex (default starts: every vertex — the DeepWalk corpus shape,
    typically num_walks≈10–80 per node in the literature).

    Returns ``(walk_id, step, id)``: walk_id = ``start * num_walks + j``
    (j in [0, num_walks); for num_walks=1, walk_id == the start vertex),
    step = 0..length, id = the vertex visited at that step. Distinct j
    give independent trajectories because walk_id seeds the choice hash.
    A walk reaching a dangling vertex terminates (no more rows).
    Deterministic for a given (edge set, length, seed, num_walks) at any
    parallelism; choice recurrence documented in the module docstring
    and mirrored by the DuckDB oracle (harness.random_walks_sql). ANSI
    mode raises loudly if ``start * num_walks`` would overflow int64.

    ``weight_col``: WEIGHTED walks — the hop picks neighbor e with
    probability w(e)/W(u): the same choice hash maps to a uniform
    ``u = pmod(hash, 2^53)/2^53`` (the generator-oracle construction)
    and the walk takes the neighbor whose cumulative-weight range
    [cumw, cumw+w) in dst order contains ``u·W(u)`` (the last range is
    closed, so a pick that rounds to exactly W(u) still lands).
    Duplicate (src, dst) weights are summed; weights must be strictly
    positive. Exact cross-engine value parity (and exact
    any-parallelism determinism of the aggregate W) holds when weights
    are integer-representable doubles — float64 sums of such values
    are association-free; arbitrary float weights stay deterministic
    for a fixed Spark configuration but their aggregate sums are
    association-sensitive in the last bits.
    """
    if length < 0:
        raise ValueError("length must be >= 0")
    if num_walks < 1:
        raise ValueError("num_walks must be >= 1")
    if weight_col is not None:
        return _weighted_walks(
            spark, edges, length, seed, starts, num_partitions,
            num_walks, weight_col,
        )
    e = dedup_edges(edges)
    p = num_partitions or choose_num_partitions(spark, e.count())
    with superstep_conf(spark, p):
        # Ranked adjacency: the idx-th out-neighbor of src in dst order.
        adj = materialize(
            e.withColumn(
                "idx",
                F.row_number().over(
                    Window.partitionBy(SRC).orderBy(DST)
                ) - F.lit(1),
            ).repartition(p, F.col(SRC))
        )
        deg = materialize(out_degrees(e).repartition(p, F.col(ID)))
        if starts is None:
            starts = vertices_from_edges(e)
        seed_rows = starts.select(F.col(ID).alias(CUR))
        if num_walks > 1:
            # Tiny k-row side: Catalyst broadcasts the nested-loop join.
            seed_rows = seed_rows.crossJoin(
                spark.range(num_walks).select(F.col("id").alias("_j"))
            ).select(
                (F.col(CUR) * F.lit(num_walks) + F.col("_j")).alias(WALK),
                CUR,
            )
        else:
            seed_rows = seed_rows.select(F.col(CUR).alias(WALK), CUR)
        state = materialize(seed_rows.repartition(p, F.col(WALK)))
        frames = [state.select(WALK, F.lit(0).cast("long").alias(STEP),
                               F.col(CUR).alias(ID))]
        for t in range(1, length + 1):
            hop = state.join(deg, state[CUR] == deg[ID]).select(
                state[WALK],
                state[CUR],
                F.pmod(
                    F.xxhash64(
                        state[WALK], F.lit(t - 1), F.lit(seed), state[CUR]
                    ),
                    F.col("out_degree"),
                ).alias("_idx"),
            )
            state = materialize(
                hop.join(
                    adj,
                    (hop[CUR] == adj[SRC]) & (hop["_idx"] == adj["idx"]),
                ).select(hop[WALK], adj[DST].alias(CUR))
            )
            frames.append(
                state.select(WALK, F.lit(t).cast("long").alias(STEP),
                             F.col(CUR).alias(ID))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


_TWO53 = 1 << 53


def _weighted_walks(
    spark, edges, length, seed, starts, num_partitions, num_walks,
    weight_col,
) -> DataFrame:
    """Weight-proportional hops (see random_walks docstring): static
    cumulative-weight adjacency built once, each step joins the walk
    frontier against the out-strength table, maps the choice hash to a
    uniform double, and range-matches u·W(u) into the neighbor ranges
    (filter after an equi-join on the current vertex — the candidate
    set per walk is deg(cur), the same row volume one scatter superstep
    touches)."""
    e = (
        edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
        .groupBy(SRC, DST)
        .agg(F.sum("w").alias("w"))
    )
    bad = e.where(F.col("w").isNull() | (F.col("w") <= 0)).first()
    if bad is not None:
        raise ValueError(
            f"weighted walks require strictly positive non-NULL weights; "
            f"offending edge: {bad.asDict()}"
        )
    p = num_partitions or choose_num_partitions(spark, e.count())
    with superstep_conf(spark, p):
        win = Window.partitionBy(SRC).orderBy(DST)
        wadj = materialize(
            e.select(
                SRC, DST, "w",
                (F.sum("w").over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                ) - F.col("w")).alias("cumw"),
                (F.row_number().over(
                    Window.partitionBy(SRC).orderBy(F.desc(DST))
                ) == 1).alias("is_last"),
            ).repartition(p, F.col(SRC))
        )
        strength = materialize(
            e.groupBy(F.col(SRC).alias(ID)).agg(F.sum("w").alias("sw"))
            .repartition(p, F.col(ID))
        )
        if starts is None:
            starts = vertices_from_edges(e)
        seed_rows = starts.select(F.col(ID).alias(CUR))
        if num_walks > 1:
            seed_rows = seed_rows.crossJoin(
                spark.range(num_walks).select(F.col("id").alias("_j"))
            ).select(
                (F.col(CUR) * F.lit(num_walks) + F.col("_j")).alias(WALK),
                CUR,
            )
        else:
            seed_rows = seed_rows.select(F.col(CUR).alias(WALK), CUR)
        state = materialize(seed_rows.repartition(p, F.col(WALK)))
        frames = [state.select(WALK, F.lit(0).cast("long").alias(STEP),
                               F.col(CUR).alias(ID))]
        for t in range(1, length + 1):
            hop = state.join(strength, state[CUR] == strength[ID]).select(
                state[WALK],
                state[CUR],
                (
                    F.pmod(
                        F.xxhash64(
                            state[WALK], F.lit(t - 1), F.lit(seed),
                            state[CUR],
                        ),
                        F.lit(_TWO53),
                    ).cast("double") / F.lit(float(_TWO53))
                    * F.col("sw")
                ).alias("_x"),
            )
            state = materialize(
                hop.join(wadj, hop[CUR] == wadj[SRC])
                .where(
                    (F.col("cumw") <= F.col("_x"))
                    & (
                        (F.col("_x") < F.col("cumw") + F.col("w"))
                        | F.col("is_last")
                    )
                )
                .select(hop[WALK], wadj[DST].alias(CUR))
            )
            frames.append(
                state.select(WALK, F.lit(t).cast("long").alias(STEP),
                             F.col(CUR).alias(ID))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    length: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    starts: DataFrame | None = None,
    num_partitions: int | None = None,
    num_walks: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Second-order biased walks (node2vec; Grover & Leskovec KDD'16):
    the first hop is the plain (weighted) first-order pick; from then on
    a candidate edge (cur -> x, w) is re-weighted by the search bias
    ``1/p`` if x == prev (return), ``1`` if the edge prev -> x exists
    (stay in prev's neighborhood), else ``1/q`` (explore), and the hop
    range-matches ``u·W'`` into the biased cumulative ranges exactly
    like the weighted first-order walk.

    Same determinism story as random_walks (the u uniform comes from the
    same xxhash64 chain); exact cross-engine oracle parity additionally
    needs 1/p and 1/q to be exactly-representable doubles (powers of two
    in the driver query) so the biased sums stay association-free. Each
    step costs two equi-joins (candidates on cur; membership on
    (prev, x)) plus per-walk window sums over the candidate set —
    deg(cur) rows per walk, the scatter-superstep volume.

    Returns ``(walk_id, step, id)`` with the random_walks conventions
    (walk_id = start*num_walks + j, dangling terminates)."""
    if length < 0:
        raise ValueError("length must be >= 0")
    if num_walks < 1:
        raise ValueError("num_walks must be >= 1")
    if p <= 0 or q <= 0:
        raise ValueError("p and q must be > 0")
    if weight_col is not None:
        e = (
            edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
            .groupBy(SRC, DST)
            .agg(F.sum("w").alias("w"))
        )
        bad = e.where(F.col("w").isNull() | (F.col("w") <= 0)).first()
        if bad is not None:
            raise ValueError(
                f"weighted walks require strictly positive non-NULL weights; "
                f"offending edge: {bad.asDict()}"
            )
    else:
        e = dedup_edges(edges).withColumn("w", F.lit(1.0))
    np_ = num_partitions or choose_num_partitions(spark, e.count())
    ret_b, exp_b = 1.0 / p, 1.0 / q
    with superstep_conf(spark, np_):
        win = Window.partitionBy(SRC).orderBy(DST)
        wadj = materialize(
            e.select(
                SRC, DST, "w",
                (F.sum("w").over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                ) - F.col("w")).alias("cumw"),
                (F.row_number().over(
                    Window.partitionBy(SRC).orderBy(F.desc(DST))
                ) == 1).alias("is_last"),
            ).repartition(np_, F.col(SRC))
        )
        strength = materialize(
            e.groupBy(F.col(SRC).alias(ID)).agg(F.sum("w").alias("sw"))
            .repartition(np_, F.col(ID))
        )
        mem = materialize(
            e.select(F.col(SRC).alias("_ms"), F.col(DST).alias("_md"))
            .repartition(np_, F.col("_ms"))
        )
        if starts is None:
            starts = vertices_from_edges(e)
        seed_rows = starts.select(F.col(ID).alias(CUR))
        if num_walks > 1:
            seed_rows = seed_rows.crossJoin(
                spark.range(num_walks).select(F.col("id").alias("_j"))
            ).select(
                (F.col(CUR) * F.lit(num_walks) + F.col("_j")).alias(WALK),
                CUR,
            )
        else:
            seed_rows = seed_rows.select(F.col(CUR).alias(WALK), CUR)
        state0 = materialize(seed_rows.repartition(np_, F.col(WALK)))
        frames = [state0.select(WALK, F.lit(0).cast("long").alias(STEP),
                                F.col(CUR).alias(ID))]

        def uniform(df, t):
            return (
                F.pmod(
                    F.xxhash64(df[WALK], F.lit(t - 1), F.lit(seed), df[CUR]),
                    F.lit(_TWO53),
                ).cast("double") / F.lit(float(_TWO53))
            )

        # First hop: first-order weighted pick (no prev yet).
        hop = state0.join(strength, state0[CUR] == strength[ID]).select(
            state0[WALK], state0[CUR],
            (uniform(state0, 1) * F.col("sw")).alias("_x"),
        )
        state = materialize(
            hop.join(wadj, hop[CUR] == wadj[SRC])
            .where(
                (F.col("cumw") <= F.col("_x"))
                & ((F.col("_x") < F.col("cumw") + F.col("w"))
                   | F.col("is_last"))
            )
            .select(hop[WALK], hop[CUR].alias("prev"), wadj[DST].alias(CUR))
        )
        if length >= 1:
            frames.append(
                state.select(WALK, F.lit(1).cast("long").alias(STEP),
                             F.col(CUR).alias(ID))
            )
        for t in range(2, length + 1):
            cand = (
                state.withColumn("_u", uniform(state, t))
                .join(wadj, state[CUR] == wadj[SRC])
                .join(
                    mem,
                    (state["prev"] == F.col("_ms"))
                    & (wadj[DST] == F.col("_md")),
                    "left",
                )
                .select(
                    state[WALK], state["prev"], state[CUR],
                    wadj[DST].alias("_nxt"), F.col("_u"),
                    (
                        F.col("w")
                        * F.when(wadj[DST] == state["prev"], F.lit(ret_b))
                        .when(F.col("_ms").isNotNull(), F.lit(1.0))
                        .otherwise(F.lit(exp_b))
                    ).alias("_wb"),
                )
            )
            wwin = Window.partitionBy(WALK).orderBy("_nxt")
            ranked = cand.select(
                WALK, "prev", CUR, "_nxt", "_u", "_wb",
                (F.sum("_wb").over(
                    wwin.rowsBetween(Window.unboundedPreceding, 0)
                ) - F.col("_wb")).alias("_cum"),
                F.sum("_wb").over(Window.partitionBy(WALK)).alias("_tot"),
                (F.row_number().over(
                    Window.partitionBy(WALK).orderBy(F.desc("_nxt"))
                ) == 1).alias("_last"),
            )
            state = materialize(
                ranked.where(
                    (F.col("_cum") <= F.col("_u") * F.col("_tot"))
                    & (
                        (F.col("_u") * F.col("_tot")
                         < F.col("_cum") + F.col("_wb"))
                        | F.col("_last")
                    )
                ).select(
                    WALK, F.col(CUR).alias("prev"), F.col("_nxt").alias(CUR)
                )
            )
            frames.append(
                state.select(WALK, F.lit(t).cast("long").alias(STEP),
                             F.col(CUR).alias(ID))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
