"""SpMV — one scatter+gather superstep: y = A^T x ([X13] §5.2 `spmv.hpp`).

``y(dst) = sum over edges (src,dst) of w(e) * x(src)``. This is the unit
test for the engine core: a single join + groupBy.agg with map-side
partial aggregation, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graph import DST, ID, SRC


def spmv(
    spark: SparkSession,
    edges: DataFrame,
    x: DataFrame,
    weight_col: str | None = None,
    x_col: str = "x",
) -> DataFrame:
    """``x`` is ``(id, <x_col>)``; returns ``(id, y)`` for every dst that
    receives mass. ``weight_col=None`` -> unweighted (w = 1)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(SRC, DST, w.alias("_w"))
    xs = x.select(F.col(ID).alias("_xid"), F.col(x_col).cast("double").alias("_x"))
    return (
        e.join(xs, e[SRC] == xs["_xid"])
        .groupBy(F.col(DST).alias(ID))
        .agg(F.sum(F.col("_w") * F.col("_x")).alias("y"))
    )
