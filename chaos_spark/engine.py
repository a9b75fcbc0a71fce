"""The superstep runner — Chaos's scatter/shuffle/gather loop, driver-side.

Chaos executes supersteps as {scatter phase -> shuffler -> gather phase ->
barrier} over streaming partitions ([X13] §3.2, [C15] §3). In Spark the
per-superstep *logical plan* is scatter (join) -> shuffle (exchange from
groupBy) -> gather/apply (agg + join), and the *action* that materializes
the new state is the barrier. What Catalyst cannot do — iteration, lineage
truncation, convergence tests, durable checkpoints — lives here.

Each algorithm supplies a ``step_fn(state, superstep) -> (new_state,
stats)`` where ``new_state`` MUST already be materialized (use
:func:`materialize`, i.e. ``localCheckpoint(eager=True)`` — the action is
the superstep barrier AND the lineage truncation; plans otherwise grow
unboundedly across iterations) and ``stats`` must contain ``converged:
bool`` plus anything else (delta, changed rows, message counts) for the
metrics trail. The runner durably checkpoints every ``checkpoint_every``
supersteps through a :class:`chaos_spark.checkpoint.CheckpointManager`
(resume-able) and records per-superstep wall time (supersteps/sec is the
north-star throughput metric). Old states' cached blocks are released by
Spark's ContextCleaner once the driver drops the reference.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from .checkpoint import CheckpointManager

StepFn = Callable[[DataFrame, int], tuple[DataFrame, dict[str, Any]]]


def materialize(df: DataFrame) -> DataFrame:
    """Superstep barrier: eagerly materialize and truncate lineage."""
    return df.localCheckpoint(eager=True)


def choose_num_partitions(
    spark,
    num_vertices: int,
    bytes_per_row: int = 64,
    target_partition_bytes: int = 64 << 20,
    min_factor: int = 2,
) -> int:
    """X-Stream's streaming-partition autotuner, as a formula ([X13] §4).

    P = max(parallelism x small factor, state bytes / target partition
    bytes): enough partitions that every core has work, and no partition's
    vertex sub-array outgrows the per-task memory budget.
    """
    parallelism = spark.sparkContext.defaultParallelism
    by_mem = math.ceil(num_vertices * bytes_per_row / target_partition_bytes)
    return max(parallelism * min_factor, by_mem, 1)


@dataclass
class RunResult:
    state: DataFrame
    supersteps: int
    converged: bool
    history: list[dict[str, Any]] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(h["seconds"] for h in self.history)


def run_supersteps(
    state: DataFrame,
    step_fn: StepFn,
    max_iters: int,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    start_superstep: int = 0,
) -> RunResult:
    """Drive ``step_fn`` to convergence or ``max_iters``.

    ``state`` must already be materialized (cached/checkpointed) by the
    caller for superstep ``start_superstep``.
    """
    history: list[dict[str, Any]] = []
    converged = False
    superstep = start_superstep
    while superstep < max_iters:
        t0 = time.time()
        new_state, stats = step_fn(state, superstep)
        seconds = time.time() - t0
        superstep += 1
        stats = dict(stats)
        stats.update({"superstep": superstep, "seconds": round(seconds, 4)})
        history.append(stats)
        converged = bool(stats.get("converged", False))
        if checkpointer and (converged or superstep % checkpoint_every == 0):
            checkpointer.save(new_state, superstep, metrics=stats)
        state = new_state
        if converged:
            break
    return RunResult(state=state, supersteps=superstep, converged=converged, history=history)


def resume_or_init(
    spark,
    checkpointer: CheckpointManager | None,
    init_fn: Callable[[], DataFrame],
) -> tuple[DataFrame, int]:
    """Return (state, start_superstep): last complete checkpoint if one
    matches the config, else a fresh init at superstep 0."""
    if checkpointer is not None:
        manifest = checkpointer.latest()
        if manifest is not None:
            return checkpointer.load(spark, manifest), int(manifest["superstep"])
    return init_fn(), 0
