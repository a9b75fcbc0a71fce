"""CSR fast path — partition-parallel sparse gather-scatter in numpy.

This is the north-star mechanism [BJ north_star]: replace the per-superstep
join+groupBy with per-partition CSR-block kernels built in Arrow-backed
pandas UDFs, the 1:1 Spark image of an X-Stream streaming partition
([X13] §3.2): a vertex interval, the edge block whose ``src`` falls in the
interval, and the update stream routed to it.

Layout (built ONCE per graph, reused every superstep):
- vertices are assigned a partition ``part = pmod(xxhash64(id), P)``;
- edges carry ``part(src)`` and are repartitioned + persisted on it;
- per (graph, partition) the Python worker memoizes the sorted edge arrays
  and the CSC-style gather index (``dst_unique``, ``dst_inverse``) —
  Spark reuses Python workers (``spark.python.worker.reuse``), so across
  supersteps the "CSR block" behaves like X-Stream's on-disk edge file:
  written once, streamed every iteration.  A cache miss only costs a
  rebuild, never correctness.

Per superstep the cogroup kernel receives (edge block, local vertex state),
computes every edge message in vectorized numpy, PRE-AGGREGATES per ``dst``
inside the partition (np.bincount / np.fmin.at — X-Stream's in-buffer
pre-aggregation), and emits only ``(dst, partial)`` rows.  The only shuffle
per superstep is that partial stream — |shuffle| is bounded by
P x |distinct dst per partition|, not |E|.

Equivalence contract (SURVEY §3.2): identical supersteps and results vs the
join path — exact for CC (min is order-independent), allclose for PageRank
(float summation order differs).  Property-tested in tests/test_csr.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import (
    RunResult,
    choose_num_partitions,
    materialize,
    run_supersteps,
    superstep_conf,
)
from .graph import DST, ID, SRC, dedup_edges, out_degrees, symmetrize, vertices_from_edges

# Per-Python-worker memo of immutable per-partition edge blocks.
# key: (graph_token, part) -> dict(src, dst_unique, dst_inverse)
# BYTES-capped LRU (default 256 MB/worker, env CHAOS_BLOCK_CACHE_BYTES):
# Spark schedules tasks onto workers nondeterministically, so an unbounded
# cache costs O(workers x blocks) memory (measured: 64-entry cap at 32
# workers on a 64M-edge graph thrashed the whole host); a bytes budget also
# keeps the capacity comparable across parallelism levels (fewer workers
# each own more partitions and need proportionally more slots).
import os as _os

_BLOCK_CACHE: dict[tuple[str, int], dict[str, np.ndarray]] = {}
_BLOCK_CACHE_BYTES = int(_os.environ.get("CHAOS_BLOCK_CACHE_BYTES", 256 * 1024 * 1024))
_cache_bytes = 0


def _cache_put(key, blk: dict[str, np.ndarray]) -> None:
    global _cache_bytes
    nbytes = sum(int(a.nbytes) for a in blk.values())
    if nbytes > _BLOCK_CACHE_BYTES:
        return
    while _BLOCK_CACHE and _cache_bytes + nbytes > _BLOCK_CACHE_BYTES:
        old = _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))  # FIFO eviction
        _cache_bytes -= sum(int(a.nbytes) for a in old.values())
    _BLOCK_CACHE[key] = blk
    _cache_bytes += nbytes


def _edge_block(token: str, part: int, pdf_edges: pd.DataFrame) -> dict[str, np.ndarray]:
    key = (token, part)
    blk = _BLOCK_CACHE.get(key)
    if blk is not None and len(blk["src"]) == len(pdf_edges):
        return blk
    src = pdf_edges[SRC].to_numpy(dtype=np.int64)
    dst = pdf_edges[DST].to_numpy(dtype=np.int64)
    dst_unique, dst_inverse = np.unique(dst, return_inverse=True)
    blk = {"src": src, "dst_unique": dst_unique, "dst_inverse": dst_inverse}
    _cache_put(key, blk)
    return blk


def _lookup(state_ids: np.ndarray, order: np.ndarray, values: np.ndarray, src: np.ndarray):
    """values[src] via sorted-id binary search; src ids absent from state
    (can't happen when state covers all vertices) would map arbitrarily, so
    callers guarantee coverage."""
    ids_sorted = state_ids[order]
    idx = np.searchsorted(ids_sorted, src)
    return values[order[np.clip(idx, 0, len(order) - 1)]]


# -- packed blocks: X-Stream's fixed-size packed records, one blob per
#    streaming partition. Built ONCE; per superstep the blob rides the
#    Arrow boundary as a single binary cell (12 B/edge: i64 src + u32
#    dst_inverse) instead of 20 B/edge of row-oriented (src, dst, part).
#    MEASURED REGRESSION (64M edges, local[32]): cache-miss supersteps cost
#    ~30x rows-mode (Spark's cogroup sort + shuffle handles 12 MB-wide rows
#    far worse than 1M narrow rows), so packed stays opt-in (packed=False
#    default) until the wide-row path is understood.

def _pack_block(pdf_edges: pd.DataFrame) -> tuple[bytes, int, int]:
    src = pdf_edges[SRC].to_numpy(dtype=np.int64)
    dst = pdf_edges[DST].to_numpy(dtype=np.int64)
    dst_unique, dst_inverse = np.unique(dst, return_inverse=True)
    blob = (
        src.tobytes()
        + dst_inverse.astype(np.uint32).tobytes()
        + dst_unique.tobytes()
    )
    return blob, len(src), len(dst_unique)


def _unpack_block(token: str, part: int, blob: bytes, n: int, nu: int) -> dict[str, np.ndarray]:
    key = (token, part)
    blk = _BLOCK_CACHE.get(key)
    if blk is not None and len(blk["src"]) == n:
        return blk
    b = memoryview(blob)
    o1, o2 = 8 * n, 8 * n + 4 * n
    blk = {
        "src": np.frombuffer(b[:o1], dtype=np.int64),
        "dst_inverse": np.frombuffer(b[o1:o2], dtype=np.uint32).astype(np.int64),
        "dst_unique": np.frombuffer(b[o2:], dtype=np.int64),
    }
    _cache_put(key, blk)
    return blk


class CsrGraph:
    """Edges partitioned once on ``part(src)`` for cogroup kernels."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        num_partitions: int | None = None,
        undirected: bool = False,
        token: str | None = None,
        packed: bool = False,
    ):
        from .shipping import ensure_shipped

        ensure_shipped(spark)  # kernels reference module fns on executors
        e = dedup_edges(edges)
        if undirected:
            e = symmetrize(e)
        self.spark = spark
        self.num_edges = e.count()
        self.p = num_partitions or choose_num_partitions(spark, self.num_edges)
        self.packed = packed
        # Unique per CsrGraph: worker caches are reused across the many
        # supersteps of one run (the case that matters); a fresh graph gets
        # a fresh token so stale blocks can never be read.
        import uuid

        self.token = token or f"g-{uuid.uuid4().hex}-{self.num_edges}-{self.p}"
        self.edges = (
            e.withColumn("part", F.pmod(F.xxhash64(F.col(SRC)), F.lit(self.p)).cast("int"))
            .repartition(self.p, F.col("part"))
            .persist()
        )
        self.edges.count()
        self.verts = vertices_from_edges(self.edges).persist()
        self.num_vertices = self.verts.count()
        # Degree pre-pass while the row layout is cached (PageRank init).
        self.out_deg = out_degrees(self.edges).persist()
        self.out_deg.count()
        self.blocks = None
        if packed:
            def pack_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
                blob, n, nu = _pack_block(pdf)
                return pd.DataFrame(
                    {"part": [int(key[0])], "n": [n], "nu": [nu], "blob": [blob]}
                )

            self.blocks = self.edges.groupby("part").applyInPandas(
                pack_kernel, schema="part int, n long, nu long, blob binary"
            ).persist()
            self.blocks.count()
            # the packed blobs supersede the row layout for supersteps
            self.edges.unpersist()

    def part_col(self, col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.p)).cast("int")

    def grouped_edges(self):
        return (self.blocks if self.packed else self.edges).groupby("part")

    def unpersist(self) -> None:
        self.edges.unpersist()
        self.verts.unpersist()
        self.out_deg.unpersist()
        if self.blocks is not None:
            self.blocks.unpersist()


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    num_partitions: int | None = None,
    packed: bool = False,
    token: str | None = None,
) -> RunResult:
    """PageRank via the CSR kernel; same semantics as algos.pagerank
    (dangling mass redistributed, L-inf convergence). ``token``: pass a
    stable value ONLY when repeated calls use the identical edge set and
    partition count — lets worker block caches survive across calls."""
    g = CsrGraph(spark, edges, num_partitions, packed=packed, token=token)
    with superstep_conf(spark, g.p):
        res = _pagerank_csr(spark, g, damping, tol, max_iters)
    g.unpersist()
    return res


def _resolve_block(token: str, pdf_left: pd.DataFrame) -> dict[str, np.ndarray]:
    """Edge block from either layout: packed blob row or raw edge rows."""
    if "blob" in pdf_left.columns:
        row = pdf_left.iloc[0]
        return _unpack_block(
            token, int(row["part"]), row["blob"], int(row["n"]), int(row["nu"])
        )
    return _edge_block(token, int(pdf_left["part"].iloc[0]), pdf_left)


def _pagerank_csr(spark, g: CsrGraph, damping, tol, max_iters) -> RunResult:
    n = g.num_vertices
    deg = g.out_deg
    state = materialize(
        g.verts.join(deg, ID, "left")
        .select(
            F.col(ID),
            F.coalesce(F.col("out_degree"), F.lit(0)).alias("out_degree"),
            F.lit(1.0 / n).alias("rank"),
        )
        .withColumn("part", g.part_col(ID))
        .repartition(g.p, F.col("part"))
    )
    row = state.agg(
        F.sum(F.when(F.col("out_degree") == 0, F.col("rank")).otherwise(0.0)).alias("dm")
    ).first()
    dangling = {"mass": float(row["dm"] or 0.0)}
    token = g.token

    def kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edges_pdf) == 0 or len(state_pdf) == 0:
            return pd.DataFrame({DST: pd.Series([], dtype="int64"),
                                 "partial": pd.Series([], dtype="float64")})
        blk = _resolve_block(token, edges_pdf)
        ids = state_pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        od = state_pdf["out_degree"].to_numpy(dtype=np.float64)
        rank = state_pdf["rank"].to_numpy(dtype=np.float64)
        m = np.where(od > 0, rank / np.where(od > 0, od, 1.0), 0.0)
        m_edge = _lookup(ids, order, m, blk["src"])
        partial = np.bincount(blk["dst_inverse"], weights=m_edge,
                              minlength=len(blk["dst_unique"]))
        return pd.DataFrame({DST: blk["dst_unique"], "partial": partial})

    def step(cur: DataFrame, superstep: int):
        dm = dangling["mass"]
        partials = g.grouped_edges().cogroup(cur.groupby("part")).applyInPandas(
            kernel, schema=f"{DST} long, partial double"
        )
        contribs = partials.groupBy(DST).agg(F.sum("partial").alias("contrib"))
        new = cur.join(contribs, cur[ID] == contribs[DST], "left").select(
            cur[ID],
            cur["out_degree"],
            cur["part"],
            cur["rank"].alias("_prev"),
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dm / n))
            ).alias("rank"),
        )
        new = materialize(new, superstep)
        stats_row = new.agg(
            F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta"),
            F.sum(
                F.when(F.col("out_degree") == 0, F.col("rank")).otherwise(0.0)
            ).alias("dm"),
        ).first()
        dangling["mass"] = float(stats_row["dm"] or 0.0)
        delta = float(stats_row["delta"])
        return new, {"converged": delta < tol, "delta": delta}

    result = run_supersteps(state, step, max_iters)
    result.state = result.state.select(ID, "out_degree", "rank")
    return result


# ---------------------------------------------------------------------------
# Connected components (hash-min)
# ---------------------------------------------------------------------------

def cc_csr(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 100,
    num_partitions: int | None = None,
    packed: bool = False,
    token: str | None = None,
) -> RunResult:
    """Hash-min connected components via the CSR kernel; exact same
    fixed point as algos.connected_components (min is order-free)."""
    g = CsrGraph(
        spark, edges, num_partitions, undirected=True, packed=packed, token=token
    )
    with superstep_conf(spark, g.p):
        res = _cc_csr(spark, g, max_iters)
    g.unpersist()
    return res


def _cc_csr(spark, g: CsrGraph, max_iters) -> RunResult:
    state = materialize(
        g.verts.select(F.col(ID), F.col(ID).alias("label"))
        .withColumn("part", g.part_col(ID))
        .repartition(g.p, F.col("part"))
    )
    state.count()
    token = g.token + ":cc"

    def kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edges_pdf) == 0 or len(state_pdf) == 0:
            return pd.DataFrame({DST: pd.Series([], dtype="int64"),
                                 "ml": pd.Series([], dtype="int64")})
        blk = _resolve_block(token, edges_pdf)
        ids = state_pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        labels = state_pdf["label"].to_numpy(dtype=np.int64)
        lab_edge = _lookup(ids, order, labels, blk["src"])
        out = np.full(len(blk["dst_unique"]), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(out, blk["dst_inverse"], lab_edge)
        return pd.DataFrame({DST: blk["dst_unique"], "ml": out})

    def step(cur: DataFrame, superstep: int):
        partials = g.grouped_edges().cogroup(cur.groupby("part")).applyInPandas(
            kernel, schema=f"{DST} long, ml long"
        )
        mins = partials.groupBy(DST).agg(F.min("ml").alias("ml"))
        new = cur.join(mins, cur[ID] == mins[DST], "left").select(
            cur[ID],
            cur["part"],
            F.least(cur["label"], F.coalesce(F.col("ml"), cur["label"])).alias("label"),
            (F.coalesce(F.col("ml"), cur["label"]) < cur["label"]).alias("_chg"),
        )
        new = materialize(new, superstep)
        changed = new.agg(F.sum(F.col("_chg").cast("long")).alias("c")).first()["c"]
        return new, {"converged": int(changed or 0) == 0, "changed": int(changed or 0)}

    result = run_supersteps(state, step, max_iters)
    result.state = result.state.select(ID, "label")
    return result
