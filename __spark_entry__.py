"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (PageRank to 1e-6 convergence on
the customer->supplier graph derived from sf0.001). ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 as
fixed-k superstep jobs with programmatically unrolled DuckDB CTE oracles —
see chaos_spark/harness.py for the full registry and the float-rounding /
fixed-point-equivalence notes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chaos_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus-shaped graph job end-to-end — PageRank to 1e-6
    convergence over the customer->supplier edge view at sf0.001."""
    return harness.q_pagerank_converged(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(harness.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(harness.ORACLES)
