"""CSR fast path — partition-parallel sparse gather-scatter in numpy.

This is the north-star mechanism [BJ north_star]: replace the per-superstep
join+groupBy with per-partition CSR-block kernels built in Arrow-backed
pandas UDFs, the 1:1 Spark image of an X-Stream streaming partition
([X13] §3.2): a vertex interval, the edge block whose ``src`` falls in the
interval, and the update stream routed to it.

Three block layouts; ``layout="disk"`` is the default (round 2):

- **disk** — the X-Stream edge-file image done right. Edges are hash-
  partitioned ONCE by Spark's own ``repartition(p, src)``, sorted by
  ``dst`` within the partition, and each physical partition's CSR arrays
  are written to ONE block directory of mmap-able .npy files, named by
  partition index. Per superstep only the (small) vertex state flows
  JVM->Python through ``mapInPandas``; the kernel MEMORY-MAPS its block
  via ``TaskContext.partitionId()`` — written once, faulted from the
  shared page cache every iteration, no locality assumption (the block
  dir is shared storage on a real cluster: Chaos's slipstore model,
  [C15] §4). Round-1's cogroup layout re-shipped + re-sorted ALL edge
  rows JVM->Python every superstep, which made the CSR path 2.3x SLOWER
  than the join path; disk layout ships zero edge bytes per superstep.

  Block format v4 (round 4): the src->state-row gather POSITIONS are
  computed at build time and stored in the block, against the sorted
  per-partition vertex-id vector ``ids`` (also stored). The id set of a
  state partition is fully determined by the graph + the Murmur3 pmod
  partitioner, so positions never depend on which Python worker serves
  the task — r4 diagnosed the v2 per-worker position cache at a 78%
  MISS rate under Spark's nondeterministic task placement (16 workers x
  64 blocks), each miss costing ~500 ms of searchsorted against ~24 ms
  for the whole hit-path kernel; build-time positions make every task a
  hit from superstep 1 on every worker. Edges are stored sorted by
  (dst-bucket, dst) — dst-bucket being the Murmur3 pmod partition of the
  dst's state row — so per-dst accumulation is a streaming
  ufunc.reduceat over build-time segment ``starts`` (bit-identical to
  the v4 bincount, without re-reading a per-edge dst_inverse stream),
  and each TARGET partition's update slice is contiguous: the v5 block
  doubles as the slipstore update-stream routing table that
  chaos_spark.stream's fused superstep rides. Blocks are MEMORY-MAPPED, not
  read: all workers on a host share one physical copy of each block
  (the v2 scheme measured 90-870 ms read-and-widen loads per cold
  (worker, block) pair and duplicated blocks into every worker's cache).
  Alignment contract: state is hash(id, p)-partitioned with the SAME
  Murmur3 pmod as the edge build, AQE is pinned off inside the run so no
  re-planning changes partition counts, and the kernel verifies the
  state partition's sorted id vector EQUALS the block's stored ``ids``
  (raises loudly on misalignment — a wrong-but-silent gather is the one
  failure mode this design must not have).

- **rows** — round-1 cogroup of raw edge rows with worker-memoized blocks
  (kept for A/B tests).

- **packed** — round-1 packed-blob cogroup (measured 30x regression on
  cache misses; kept opt-in for the record).

Per superstep the kernel computes every edge message in vectorized numpy,
PRE-AGGREGATES per ``dst`` inside the partition (np.bincount / np.minimum
.at — X-Stream's in-buffer pre-aggregation), and emits only
``(dst, partial)`` rows.  The only shuffle per superstep is that partial
stream — |shuffle| is bounded by P x |distinct dst per partition|, not |E|.

Equivalence contract (SURVEY §3.2): identical supersteps and results vs the
join path — exact for CC (min is order-independent), allclose for PageRank
(float summation order differs).  Property-tested in tests/test_csr.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .checkpoint import CheckpointManager
from .engine import (
    RunResult,
    choose_num_partitions,
    materialize,
    materialize_stats,
    resume_or_init,
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


def _blk_nbytes(blk: dict[str, np.ndarray]) -> int:
    # memmapped members are shared page-cache, not worker RSS — account
    # them at a nominal fd/VMA overhead so the byte cap governs only
    # arrays this worker actually materialized.
    return sum(
        4096 if isinstance(a, np.memmap) else int(a.nbytes) for a in blk.values()
    )


def _cache_put(key, blk: dict[str, np.ndarray]) -> None:
    global _cache_bytes
    nbytes = _blk_nbytes(blk)
    if nbytes > _BLOCK_CACHE_BYTES:
        return
    while _BLOCK_CACHE and _cache_bytes + nbytes > _BLOCK_CACHE_BYTES:
        old = _BLOCK_CACHE.pop(next(iter(_BLOCK_CACHE)))  # FIFO eviction
        _cache_bytes -= _blk_nbytes(old)
    _BLOCK_CACHE[key] = blk
    _cache_bytes += nbytes


def _edge_block(token: str, part: int, pdf_edges: pd.DataFrame) -> dict[str, np.ndarray]:
    from .shipping import worker_fastpath

    worker_fastpath()  # kill the per-task zip-directory re-read tax
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


def _check_aligned(blk: dict[str, np.ndarray], ids_sorted: np.ndarray) -> None:
    """The disk kernels' misalignment guard: the state partition's sorted
    id vector must EQUAL the block's build-time ``ids`` — the block's
    stored gather positions index into exactly that vector. An AQE
    re-plan, a parquet round trip, or a partitioner change silently
    altering the state layout must fail loudly, never gather from the
    wrong rows. Vectorized compare over |V|/p int64s, ~0.05 ms."""
    if not np.array_equal(blk["ids"], ids_sorted):
        inter = len(np.intersect1d(blk["ids"], ids_sorted, assume_unique=True))
        raise RuntimeError(
            "CSR disk block misaligned with state partitioning: block has "
            f"{len(blk['ids'])} ids, state partition {len(ids_sorted)}, "
            f"{inter} common"
        )


_DISK_BLOCK_BASE = _os.environ.get("CHAOS_CSR_BLOCK_DIR", "/tmp/chaos_csr_blocks")

# Join-vs-CSR crossover (measured, BENCH/SCALING_ANALYSIS.md §3c): below
# ~1M edges the per-partition blocks are ~tens-of-k edges and the Python
# worker round trip is pure overhead — the JVM join path wins (sf0.1:
# join 14.7 s vs CSR 17.0 s iterate). At 64M edges the paths are at
# per-superstep parity and CSR wins on scaling + amortized setup. The
# ``mode="auto"`` default in pagerank_csr/cc_csr/lpa_csr encodes that
# crossover so callers never run the measured-slower path by default.
#
# That 1M figure was measured against the CLASSIC kernel. The fused
# stream path amortizes much earlier because its per-superstep cost is
# 3-6x lower than the join path's even at sf0.1 (scripts/sf01_path_ab.py,
# BENCH/sf01_path_ab.json — cold, fresh block dir, local[32]):
#   pagerank conv 587k edges, 31 steps: join 11.6 s, stream COLD 5.9 s
#   lpa 10 steps, 294k edges:           join  7.3 s, stream COLD 3.0 s
#   cc  ~5 steps, 294k edges:           join  4.4 s, stream COLD 5.6 s
#                                        (stream warm-blocks 2.1 s)
# and at sf0.01 (~5k edges) the two are a wash (driver record: 2.3 s vs
# 2.4 s — fixed Spark job cost dominates either path). So the many-
# superstep algorithms (PageRank, LPA) route to the stream path from
# 100k edges; CC — few, cheap supersteps, so the one-time block build
# isn't amortized from cold at ~300k — keeps the conservative 1M
# crossover (block reuse via the _BUILT fingerprint makes warm CC calls
# win anyway whenever another algorithm already built the layout).
CSR_AUTO_MIN_EDGES = int(_os.environ.get("CHAOS_CSR_MIN_EDGES", 1_000_000))
STREAM_AUTO_MIN_EDGES = int(
    _os.environ.get("CHAOS_STREAM_MIN_EDGES", 100_000)
)
# CC's cold stream crossover (r6): CC runs few, cheap supersteps, so the
# one-time block build must itself beat the join path's setup+iterate for
# cold routing to pay. Starts at the conservative classic crossover;
# re-measured after the v6 single-shuffle build landed (see
# OPTIMIZATION_r06.md) — algos.connected_components reads this.
CC_STREAM_MIN_EDGES = int(
    _os.environ.get("CHAOS_CC_STREAM_MIN_EDGES", 1_000_000)
)

# ---------------------------------------------------------------------------
# Warm-block registry — in-process analogue of Chaos's cross-algorithm
# partition reuse ([C15] §4: the storage subsystem's partitioned edge data
# outlives one computation). v5 disk blocks are algorithm-agnostic (CC and
# LPA share undirected blocks; PageRank's directed blocks serve any
# scatter-sum), so a graph built for one algorithm should serve the next
# WITHOUT rebuilding and without every caller hand-threading tokens.
#
# Keyed by the edges DataFrame's Catalyst SEMANTIC hash (same analyzed
# logical plan ⇒ same data, zero extra Spark jobs to probe) plus the block
# flavor (undirected/weight_col/num_partitions). Correctness never rests
# on the key: adoption only picks a token, and CsrGraph.__init__ always
# re-validates the on-disk _BUILT marker against the freshly computed
# |E| + content fingerprint — a hash collision or regenerated source data
# rebuilds instead of serving stale blocks. Registered dirs are kept for
# the process lifetime (capped: graphs above _WARM_KEEP_MAX_EDGES keep the
# ephemeral-cleanup behavior; campaign-scale graphs pin tokens anyway).
_WARM_BLOCKS: dict[tuple, tuple[str, str]] = {}
_WARM_KEEP_MAX_EDGES = int(
    _os.environ.get("CHAOS_WARM_KEEP_MAX_EDGES", 16_000_000)
)


def _warm_key(
    edges: DataFrame,
    undirected: bool,
    weight_col: str | None,
    num_partitions: int | None,
) -> tuple | None:
    """Registry key for ``edges`` + block flavor; None when the semantic
    hash is unavailable (e.g. Spark Connect — registry silently off)."""
    try:
        h = int(edges._jdf.queryExecution().analyzed().semanticHash())
    except Exception:  # py4j absent/shape change: feature off, never fatal
        return None
    return (h, bool(undirected), weight_col, num_partitions)


def _warm_blocks_ready(key: tuple | None) -> str | None:
    """Token of already-built blocks for ``key``, or None. Drops the entry
    if the block dir vanished underneath (e.g. /tmp cleaner)."""
    ent = _WARM_BLOCKS.get(key) if key is not None else None
    if ent is None:
        return None
    token, block_dir = ent
    if _os.path.exists(_os.path.join(block_dir, "_BUILT")):
        return token
    _WARM_BLOCKS.pop(key, None)
    return None


def _auto_route(
    edges: DataFrame,
    mode: str,
    num_edges: int | None,
    token: str | None,
    layout: str | None,
    packed: bool = False,
    min_edges: int = CSR_AUTO_MIN_EDGES,
    warm_key: tuple | None = None,
) -> tuple[str, int | None]:
    """Shared auto-mode router: ``("join", |E|)`` below the crossover,
    ``("stream", None)`` at scale, ``("csr", None)`` when the caller pins
    the classic kernel. The scale default moved from the classic CSR
    kernel to the fused slipstore stream path in round 5 on measured
    evidence: 5.8–8.4× faster per superstep on the 64M-edge bench graph
    (local[16] 2.79 s → 0.48 s) and 455M edges/s sustained at 512M edges
    (BENCH/BASELINE.md); at sf0.1 with blocks built, stream supersteps
    are also ~4–6× faster (BENCH_r05 extras *_stream_forced_iter_sec) —
    the join path only wins cold below the per-algorithm ``min_edges``
    crossover where block build dominates (see the constants above:
    100k for the many-superstep algorithms, 1M for CC). Explicit
    ``mode="stream"`` pins the stream path (token forwarded for block
    reuse); explicit classic-kernel knobs (token/layout/packed or
    ``mode="csr"``) pin the classic kernel — tests and block-reusing
    callers mean that path.

    ``warm_key``: when the warm-block registry already holds built v5
    blocks for this exact edges-plan + flavor, the cold-build argument
    behind the join crossover is void — route stream even below
    ``min_edges`` (measured: CC at sf0.1 join 4.4 s vs stream
    warm-blocks 2.1 s, BENCH/sf01_path_ab.json)."""
    if mode == "stream":
        return "stream", None
    if mode == "csr" or token is not None or layout is not None or packed:
        return "csr", None
    if mode != "auto":
        raise ValueError(
            f"unknown mode {mode!r} (expected 'auto', 'csr' or 'stream')"
        )
    ne = num_edges if num_edges is not None else edges.count()
    if ne < min_edges:
        if _warm_blocks_ready(warm_key) is not None:
            return "stream", None
        return "join", ne
    return "stream", None


_BLOCK_MEMBERS = ("ids", "pos", "du", "di", "starts", "boff", "w")
_BLOCK_KEYS = {"du": "dst_unique", "di": "dst_inverse"}


def _load_disk_block(token: str, pid: int, block_dir: str):
    """Worker-side block fetch: MEMORY-MAPPED .npy members from the
    block's directory. Returns None when the partition holds no edges
    (no directory written).

    v5 block members (edge-order = sorted by (dst-bucket, dst), where
    dst-bucket is the Murmur3 pmod partition of dst — the SAME routing
    Spark's repartition(p, id) gives the vertex state, so a block's
    per-dst output is contiguous per TARGET PARTITION):
      ids    — sorted vertex ids of state partition pid (alignment anchor)
      pos    — int32 build-time gather positions: edge src -> row in ids
      du     — unique dst in (bucket, dst) order; di — MONOTONE int64
               dst_inverse into du
      starts — int64 edge offsets where each du segment begins (first
               element 0): per-dst aggregation = ufunc.reduceat(msg,
               starts), streaming, identical accumulation order to the
               v4 bincount but WITHOUT re-reading the 8-byte-per-edge
               di stream every superstep
      boff   — int64 (p+1) offsets into du delimiting each dst-bucket's
               slice — the slipstore update-stream routing table
               ([C15] §4: updates are appended per target streaming
               partition; here the slice boundaries are computed once
               at build)
      w      — float64 edge weights (type-2 blocks only)

    mmap, not read: on tmpfs (and on a warm page cache anywhere) every
    worker process shares ONE physical copy of each block — r4 measured
    the v2 read-into-RAM scheme paying 90-870 ms npz loads per
    (worker, block) cold pair under Spark's nondeterministic task
    placement, and duplicating up to the full block set into EVERY
    worker's byte-capped cache. A memmap "load" is ~5 file opens; the
    kernel's reads fault straight onto the shared pages. The worker
    cache therefore only accounts the tiny mmap overhead, not the
    mapped bytes (see _cache_put)."""
    from .shipping import worker_fastpath

    worker_fastpath()  # kill the per-task zip-directory re-read tax
    key = (token, pid)
    blk = _BLOCK_CACHE.get(key)
    if blk is not None:
        return blk
    d = _os.path.join(block_dir, f"part-{pid}")
    if not _os.path.isdir(d):
        return None
    blk = {}
    for name in _BLOCK_MEMBERS:
        p = _os.path.join(d, f"{name}.npy")
        if name == "w" and not _os.path.exists(p):
            continue
        blk[_BLOCK_KEYS.get(name, name)] = np.load(p, mmap_mode="r")
    _cache_put(key, blk)
    return blk


_APPLY_MEMBERS = ("apos", "aoff", "soff", "iod", "ids")


def _load_apply_plan(token: str, q: int, block_dir: str):
    """Worker-side fetch of vertex partition q's slipstore APPLY PLAN
    (build pass 3): mmap'd {apos, aoff, soff, iod, ids}. Same shared
    page-cache story as _load_disk_block; cached under a namespaced key
    so block and plan entries never collide."""
    from .shipping import worker_fastpath

    worker_fastpath()  # kill the per-task zip-directory re-read tax
    key = (f"{token}#apply", q)
    plan = _BLOCK_CACHE.get(key)
    if plan is not None:
        return plan
    d = _os.path.join(block_dir, f"apply-{q}")
    if not _os.path.isdir(d):
        return None
    plan = {
        name: np.load(_os.path.join(d, f"{name}.npy"), mmap_mode="r")
        for name in _APPLY_MEMBERS
    }
    _cache_put(key, plan)
    return plan


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
    """Per-partition CSR edge blocks built once (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        num_partitions: int | None = None,
        undirected: bool = False,
        token: str | None = None,
        packed: bool = False,
        layout: str | None = None,
        weight_col: str | None = None,
    ):
        from .shipping import ensure_shipped

        ensure_shipped(spark)  # kernels reference module fns on executors
        if layout is None:
            layout = "packed" if packed else "disk"
        if layout not in ("disk", "rows", "packed"):
            raise ValueError(f"unknown CSR layout {layout!r}")
        # Type-2 (weighted) edges ([X13] §5.1): blocks gain a float64 ``w``
        # array; duplicate (src,dst) weights are SUMMED (same prep as the
        # join paths). Disk layout only — it is the scale path, and the
        # r1 cogroup layouts exist for A/B tests, not new features.
        self.weighted = weight_col is not None
        if self.weighted:
            if undirected or layout != "disk":
                raise ValueError(
                    "weighted CSR supports the directed disk layout only"
                )
            e = (
                edges.select(SRC, DST, F.col(weight_col).cast("double").alias("w"))
                .groupBy(SRC, DST)
                .agg(F.sum("w").alias("w"))
            )
        else:
            e = dedup_edges(edges)
        if undirected:
            e = symmetrize(e)
        self.spark = spark
        # Build-time cache: the deduped table feeds FOUR one-time consumers
        # (count, block build, vertex pre-pass, degree pre-pass); uncached,
        # each re-ran the distinct shuffle (round 2 billed ~4x the dedup
        # cost to every CSR build). Released at the end of __init__ — the
        # supersteps never touch the row table in disk layout.
        e = e.persist()
        # One action: |E| + an order-independent content fingerprint
        # (xor-fold of xxhash64(src,dst) over the deduped edge SET). The
        # fingerprint goes into the _BUILT marker and the worker-cache
        # namespace so a pinned token whose data was REGENERATED with the
        # same edge count (same-scale re-gen, permuted edges) can never be
        # served stale blocks — ADVICE r3: the count-only marker missed
        # exactly that case. xor, not sum: no ANSI overflow, order-free.
        fp_cols = [F.col(SRC), F.col(DST)] + ([F.col("w")] if self.weighted else [])
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*fp_cols)).alias("fp"),
        ).first()
        self.num_edges = int(row["n"])
        self.edge_fp = int(row["fp"] or 0)
        self.p = num_partitions or choose_num_partitions(spark, self.num_edges)
        self.layout = layout
        self.packed = layout == "packed"
        # Unique per CsrGraph: worker caches are reused across the many
        # supersteps of one run (the case that matters); a fresh graph gets
        # a fresh token so stale blocks can never be read. A caller-pinned
        # token (same edges + p only!) additionally reuses disk blocks and
        # worker caches across runs (bench warmup -> timed run).
        import uuid

        # Warm-block adoption: an un-tokened disk-layout graph whose edges
        # plan + flavor matches a registered build reuses that token (and
        # thus its block dir). Always safe: the _BUILT marker below is
        # validated against THIS instance's freshly computed |E| + content
        # fingerprint, so a semantic-hash collision or regenerated source
        # rebuilds instead of reading stale blocks.
        self._warm_key = (
            _warm_key(edges, undirected, weight_col, num_partitions)
            if layout == "disk"
            else None
        )
        warm_tok = _warm_blocks_ready(self._warm_key) if token is None else None
        self.token = (
            token or warm_tok
            or f"g-{uuid.uuid4().hex}-{self.num_edges}-{self.p}"
        )
        # Worker-cache namespace: includes the edge count AND the content
        # fingerprint so a pinned token whose underlying data changed
        # (marker-triggered block REBUILD, see _build_disk_blocks) can
        # never serve stale in-memory blocks cached by a still-alive
        # Python worker from the previous epoch — even when the
        # regenerated data has the same |E|.
        self.cache_token = f"{self.token}#{self.num_edges}:{self.edge_fp:x}"
        self.block_dir = None
        self.blocks = None
        self._ephemeral_blocks = token is None and warm_tok is None
        if layout == "disk":
            # Vertex pre-pass FIRST: the v3 block build stores build-time
            # gather positions against each partition's sorted id vector,
            # which is derived from the full vertex set (src ∪ dst).
            self.verts = vertices_from_edges(e).persist()
            self.num_vertices = self.verts.count()
            if self.weighted:
                # Out-STRENGTH W(u) = Σw — the weighted degree pre-pass;
                # the state's out_degree column is then a double.
                self.out_deg = (
                    e.groupBy(F.col(SRC).alias(ID))
                    .agg(F.sum("w").alias("out_degree"))
                    .persist()
                )
            else:
                self.out_deg = out_degrees(e).persist()
            self.out_deg.count()
            self._build_disk_blocks(e)  # needs verts + out_deg (apply pass)
            # Register the built (or marker-validated) blocks for warm
            # reuse by the next algorithm over the same edges plan; the
            # dir is then retained past unpersist() for the process
            # lifetime. Capped so campaign-scale ephemeral graphs keep
            # their cleanup (pinned-token campaigns retain dirs anyway).
            if (
                self._warm_key is not None
                and self.num_edges <= _WARM_KEEP_MAX_EDGES
            ):
                _WARM_BLOCKS[self._warm_key] = (self.token, self.block_dir)
                self._ephemeral_blocks = False
            self.edges = e  # logical only; supersteps never touch it
            e.unpersist()  # build-time cache done; verts/degrees stay
            return
        self.edges = (
            e.withColumn("part", F.pmod(F.xxhash64(F.col(SRC)), F.lit(self.p)).cast("int"))
            .repartition(self.p, F.col("part"))
            .persist()
        )
        self.edges.count()
        e.unpersist()  # build-time cache superseded by the row layout
        self.verts = vertices_from_edges(self.edges).persist()
        self.num_vertices = self.verts.count()
        # Degree pre-pass while the row layout is cached (PageRank init).
        self.out_deg = out_degrees(self.edges).persist()
        self.out_deg.count()
        if layout == "packed":
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

    def _build_disk_blocks(self, e: DataFrame) -> None:
        """Two jobs, both bounded by partition count on the driver side:

        1. vertex pass — hash-partition the vertex set by id (the SAME
           ``repartition(p, col)`` Murmur3 layout align_state gives the
           running state) and write each partition's SORTED id vector to
           ``ids-{pid}.npy``.
        2. edge pass — hash-partition edges by src, sort each partition's
           edges by (dst-bucket, dst) (stable; dst-bucket = the Murmur3
           pmod partition the dst's STATE row lives in, computed by
           Spark's own ``hash()`` so it is the repartition routing by
           construction), and write one v5 block DIRECTORY per partition
           (part-{pid}/{ids,pos,du,di,starts,boff,w}.npy — plain .npy so
           the kernels can MEMORY-MAP them): the partition's ids,
           BUILD-TIME gather positions (searchsorted of src into ids —
           strict-checked here, once, instead of per task per worker),
           unique dst + monotone dst_inverse + per-dst segment starts,
           and the per-bucket slice offsets. The whole directory is
           renamed into place atomically — idempotent under task
           retry/speculation, and no torn multi-file block can ever
           be observed (a concurrent attempt's rename onto an existing
           block fails and discards its temp dir; both attempts hold
           identical content up to same-dst edge order, which reduceat/
           LPA-count results do not depend on... but gather positions
           and weights DO pair per-edge, hence the all-or-nothing
           directory swap).
        3. apply pass — for each VERTEX partition q, precompute the
           slipstore apply plan: the positions of every block's bucket-q
           du slice within q's sorted id vector (``apos``, int32, concat
           in block order; ``aoff``, int64 p+1 block offsets) plus the
           aligned inverse out-degree vector ``iod`` (1/W(u), 0 for
           dangling). Written to apply-{q}/ atomically. This is what
           lets the stream path's fused superstep apply 20M+ incoming
           partials with ONE bincount and zero per-superstep searches.

        The ids .npy intermediates are removed after the marker write."""
        import glob as _glob
        import hashlib

        safe = hashlib.md5(self.token.encode()).hexdigest()[:16]
        self.block_dir = _os.path.join(_DISK_BLOCK_BASE, f"{safe}-p{self.p}")
        marker = _os.path.join(self.block_dir, "_BUILT")
        if _os.path.exists(marker):
            # Validate the marker before trusting cached blocks: a caller-
            # pinned token whose underlying edge data changed (regenerated
            # parquet at the same path) must trigger a rebuild, not a
            # silent gather over a stale graph. The marker records
            # "{num_edges}:{p}:{content_fp}" — the xor-fold fingerprint
            # catches same-count-different-edges regeneration too; any
            # mismatch (or an old-format marker, e.g. v2) wipes and
            # rebuilds.
            try:
                with open(marker) as f:
                    stored = f.read().strip()
            except OSError:
                stored = ""
            if stored == f"v5:{self.num_edges}:{self.p}:{self.edge_fp:x}":
                return
            import shutil

            shutil.rmtree(self.block_dir, ignore_errors=True)
        _os.makedirs(self.block_dir, exist_ok=True)
        bd = self.block_dir

        def write_ids(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            parts = [pdf[ID].to_numpy(dtype=np.int64) for pdf in batches]
            ids = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
            if len(ids):
                tmp = _os.path.join(bd, f".ids-{pid}.{_os.getpid()}.tmp")
                with open(tmp, "wb") as f:
                    np.save(f, ids)
                _os.replace(tmp, _os.path.join(bd, f"ids-{pid}.npy"))
            yield pd.DataFrame({"part": [pid], "n": [len(ids)]})

        vcount = (
            self.verts.repartition(self.p, F.col(ID))
            .mapInPandas(write_ids, schema="part int, n long")
            .collect()  # p rows
        )
        assert sum(r["n"] for r in vcount) == self.num_vertices

        weighted = self.weighted
        p = self.p

        def build(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            srcs, dsts, bkts, ws = [], [], [], []
            for pdf in batches:
                srcs.append(pdf[SRC].to_numpy(dtype=np.int64))
                dsts.append(pdf[DST].to_numpy(dtype=np.int64))
                bkts.append(pdf["dbkt"].to_numpy(dtype=np.int64))
                if weighted:
                    ws.append(pdf["w"].to_numpy(dtype=np.float64))
            n = 0
            if srcs:
                src = np.concatenate(srcs)
                dst = np.concatenate(dsts)
                bkt = np.concatenate(bkts)
                n = len(src)
            if n:
                # Stable (bucket, dst) sort: per-dst edge order is
                # preserved, so per-dst reduceat sums are BIT-identical to
                # the v2 bincount, accumulation is streaming, and each
                # TARGET partition's output slice is contiguous (the
                # slipstore update-stream layout).
                o = np.lexsort((dst, bkt))
                src, dst, bkt = src[o], dst[o], bkt[o]
                seg = np.empty(n, dtype=bool)
                seg[0] = True
                np.not_equal(dst[1:], dst[:-1], out=seg[1:])
                starts = np.flatnonzero(seg)
                du = dst[seg]
                di = np.cumsum(seg) - 1
                boff = np.searchsorted(bkt[seg], np.arange(p + 1))
                ids = np.load(_os.path.join(bd, f"ids-{pid}.npy"))
                idx = np.searchsorted(ids, src)
                pos = np.clip(idx, 0, max(len(ids) - 1, 0))
                if len(ids) == 0 or not np.array_equal(ids[pos], src):
                    raise RuntimeError(
                        f"CSR block build: partition {pid} has edge src ids "
                        "outside its vertex partition — partitioner mismatch"
                    )
                arrays = {
                    "ids": ids,
                    "pos": pos.astype(np.int32),  # |ids| < 2^31 always
                    "du": du,
                    # int64 on disk: np.bincount/reduceat need intp and
                    # the kernels read it straight off the mmap
                    "di": di.astype(np.int64, copy=False),
                    "starts": starts.astype(np.int64, copy=False),
                    "boff": boff.astype(np.int64, copy=False),
                }
                if weighted:
                    arrays["w"] = np.concatenate(ws)[o]
                tmp = _os.path.join(bd, f".part-{pid}.{_os.getpid()}.tmp")
                _os.makedirs(tmp, exist_ok=True)
                for name, arr in arrays.items():
                    with open(_os.path.join(tmp, f"{name}.npy"), "wb") as f:
                        np.save(f, arr)
                final = _os.path.join(bd, f"part-{pid}")
                try:
                    _os.rename(tmp, final)
                except OSError:
                    import shutil

                    shutil.rmtree(tmp, ignore_errors=True)  # lost the race
            yield pd.DataFrame({"part": [pid], "n": [n]})

        built = (
            # dbkt via Spark's own Murmur3 hash(): EXACTLY the routing
            # repartition(p, id) gives the vertex state — the update
            # stream's target-partition ids come from the partitioner
            # itself, never a reimplementation of it.
            e.withColumn("dbkt", F.pmod(F.hash(F.col(DST)), F.lit(self.p)))
            .repartition(self.p, F.col(SRC))
            .mapInPandas(build, schema="part int, n long")
            .collect()  # p rows — bounded by partition count, not |E|
        )
        assert sum(r["n"] for r in built) == self.num_edges

        def build_apply(batches):
            from pyspark import TaskContext

            q = TaskContext.get().partitionId()
            pdfs = [pdf for pdf in batches]
            if not pdfs:
                return
            pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
            ids = pdf[ID].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids_sorted = ids[order]
            od = pdf["out_degree"].to_numpy(dtype=np.float64)[order]
            iod = np.where(od > 0, 1.0 / np.where(od > 0, od, 1.0), 0.0)
            apos_parts = []
            aoff = np.zeros(p + 1, dtype=np.int64)
            soff = np.full(p, -1, dtype=np.int64)
            for b in range(p):
                d = _os.path.join(bd, f"part-{b}")
                ap = None
                if _os.path.isdir(d):
                    bdu = np.load(_os.path.join(d, "du.npy"), mmap_mode="r")
                    bo = np.load(_os.path.join(d, "boff.npy"), mmap_mode="r")
                    sl = np.asarray(bdu[bo[q]:bo[q + 1]])
                    if len(sl):
                        ap = np.searchsorted(ids_sorted, sl)
                        ap = np.clip(ap, 0, max(len(ids_sorted) - 1, 0))
                        if not np.array_equal(ids_sorted[ap], sl):
                            raise RuntimeError(
                                f"CSR apply build: block {b} routes dst ids to "
                                f"partition {q} that are not in its vertex "
                                "partition — partitioner mismatch"
                            )
                        apos_parts.append(ap.astype(np.int32))
                        soff[b] = int(bo[q])
                aoff[b + 1] = aoff[b] + (0 if ap is None else len(ap))
            apos = (np.concatenate(apos_parts) if apos_parts
                    else np.empty(0, np.int32))
            arrays = {"apos": apos, "aoff": aoff, "soff": soff, "iod": iod,
                      "ids": ids_sorted}
            tmp = _os.path.join(bd, f".apply-{q}.{_os.getpid()}.tmp")
            _os.makedirs(tmp, exist_ok=True)
            for name, arr in arrays.items():
                with open(_os.path.join(tmp, f"{name}.npy"), "wb") as f:
                    np.save(f, arr)
            final = _os.path.join(bd, f"apply-{q}")
            try:
                _os.rename(tmp, final)
            except OSError:
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)  # lost the race
            yield pd.DataFrame({"part": [q], "n": [len(ids)]})

        applied = (
            self.verts.join(self.out_deg, ID, "left")
            .select(
                F.col(ID),
                F.coalesce(F.col("out_degree"), F.lit(0)).alias("out_degree"),
            )
            .repartition(self.p, F.col(ID))
            .mapInPandas(build_apply, schema="part int, n long")
            .collect()  # p rows
        )
        assert sum(r["n"] for r in applied) == self.num_vertices
        with open(marker, "w") as f:
            f.write(f"v5:{self.num_edges}:{self.p}:{self.edge_fp:x}")
        for pth in _glob.glob(_os.path.join(bd, "ids-*.npy")):
            _os.remove(pth)

    def part_col(self, col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.p)).cast("int")

    def grouped_edges(self):
        return (self.blocks if self.packed else self.edges).groupby("part")

    def align_state(self, df: DataFrame) -> DataFrame:
        """Hash(id, p)-partition state to match the disk-block layout."""
        return df.repartition(self.p, F.col(ID))

    def unpersist(self) -> None:
        if self.layout != "disk":
            self.edges.unpersist()
        self.verts.unpersist()
        self.out_deg.unpersist()
        if self.blocks is not None:
            self.blocks.unpersist()
        if self.block_dir is not None and self._ephemeral_blocks:
            import shutil

            shutil.rmtree(self.block_dir, ignore_errors=True)


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
    layout: str | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    mode: str = "auto",
    num_edges: int | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
) -> RunResult:
    """PageRank via the CSR kernel; same semantics as algos.pagerank
    (dangling mass redistributed, L-inf convergence). ``token``: pass a
    stable value ONLY when repeated calls use the identical edge set,
    weighting, and partition count — lets worker block caches (and disk
    blocks) survive across calls. ``checkpointer``: durable resume every
    ``checkpoint_every`` supersteps (disk layout only); the post-restore
    ``realign`` hook re-establishes the hash(id, p) partitioning the
    block routing depends on.

    ``weight_col``: weighted PageRank over type-2 blocks — duplicate
    (src,dst) weights summed, out-strength normalization, messages scaled
    by the block's float64 ``w`` array; same weight-domain validation as
    algos.pagerank (positive, non-NULL).

    ``mode="auto"`` (default): below STREAM_AUTO_MIN_EDGES (100k; CC
    uses the conservative 1M CSR_AUTO_MIN_EDGES) the call is served by
    the measured-faster JOIN path (identical semantics, same oracle);
    at or above it by the fused slipstore STREAM path (measured
    5.8–8.4× faster per superstep than the classic kernel, same oracle —
    see _auto_route). ``mode="csr"`` or any explicit token/layout/packed
    pins the classic kernel; ``mode="stream"`` pins the stream path.
    ``num_edges``: caller-known |E| skips the dispatch count."""
    route, ne = _auto_route(
        edges, mode, num_edges, token, layout, packed,
        min_edges=STREAM_AUTO_MIN_EDGES,
        warm_key=_warm_key(edges, False, weight_col, num_partitions),
    )
    if route == "join":
        from .algos.pagerank import pagerank as _pr_join

        return _pr_join(
            spark, edges, damping=damping, tol=tol, max_iters=max_iters,
            num_partitions=num_partitions, checkpointer=checkpointer,
            checkpoint_every=checkpoint_every, num_edges=ne,
            weight_col=weight_col, init_ranks=init_ranks,
        )
    if route == "stream":
        from .stream import pagerank_stream as _pr_stream

        return _pr_stream(
            spark, edges, damping=damping, tol=tol, max_iters=max_iters,
            num_partitions=num_partitions, token=token,
            weight_col=weight_col, checkpointer=checkpointer,
            checkpoint_every=checkpoint_every, init_ranks=init_ranks,
        )
    if weight_col is not None:
        from .algos.pagerank import _validate_weights

        _validate_weights(edges, weight_col)
    g = CsrGraph(
        spark, edges, num_partitions, packed=packed, token=token, layout=layout,
        weight_col=weight_col,
    )
    # AQE pinned off: the disk layout's state->block routing is by physical
    # partition index; AQE coalescing would change partition counts mid-run
    # (the kernel's strict check would catch it, but don't invite it).
    with superstep_conf(spark, g.p, adaptive=False):
        if g.layout == "disk":
            res = _pagerank_csr_disk(
                spark, g, damping, tol, max_iters, checkpointer,
                checkpoint_every, init_ranks,
            )
        else:
            res = _pagerank_csr(spark, g, damping, tol, max_iters, init_ranks)
    g.unpersist()
    return res


def _rank_seed(g: "CsrGraph", n: int, init_ranks) -> DataFrame:
    """Initial ``(id, out_degree, rank)`` frame — delegates to the ONE
    warm-start contract definition, algos.pagerank.seed_ranks."""
    from .algos.pagerank import seed_ranks

    return seed_ranks(g.verts, g.out_deg, n, init_ranks)


def _pagerank_csr_disk(
    spark, g: CsrGraph, damping, tol, max_iters,
    checkpointer: CheckpointManager | None = None, checkpoint_every: int = 5,
    init_ranks=None,
) -> RunResult:
    n = g.num_vertices

    def init() -> DataFrame:
        return _rank_seed(g, n, init_ranks)

    raw, start = resume_or_init(spark, checkpointer, init)
    # Fresh init and checkpoint-loaded parquet both go through align_state:
    # the kernel routes state rows to disk blocks by physical partition
    # index, so the hash(id, p) layout is a hard precondition either way.
    state = materialize(g.align_state(raw))
    row = state.agg(
        F.sum(F.when(F.col("out_degree") == 0, F.col("rank")).otherwise(0.0)).alias("dm")
    ).first()
    dangling = {"mass": float(row["dm"] or 0.0)}
    token, block_dir = g.cache_token, g.block_dir

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = list(batches)
        blk = _load_disk_block(token, pid, block_dir)
        if blk is None or not pdfs:
            return
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        ids = pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        od = pdf["out_degree"].to_numpy(dtype=np.float64)
        rank = pdf["rank"].to_numpy(dtype=np.float64)
        m = np.where(od > 0, rank / np.where(od > 0, od, 1.0), 0.0)
        _check_aligned(blk, ids[order])
        m_edge = m[order][blk["pos"]]
        if "w" in blk:  # type-2 block: message = rank(u)/W(u) * w(e)
            m_edge = m_edge * blk["w"]
        # v5: per-dst sums via reduceat over the build-time segment
        # starts — identical left-to-right accumulation order to the v4
        # bincount (bit-exact), but the kernel no longer streams the
        # 8-byte-per-edge dst_inverse from the block every superstep.
        partial = np.add.reduceat(m_edge, blk["starts"])
        yield pd.DataFrame({DST: blk["dst_unique"], "partial": partial})

    def step(cur: DataFrame, superstep: int):
        dm = dangling["mass"]
        partials = cur.mapInPandas(kernel, schema=f"{DST} long, partial double")
        contribs = partials.groupBy(DST).agg(F.sum("partial").alias("contrib"))
        # shuffle_hash hint: without it Catalyst's propagated size estimate
        # auto-BROADCASTs contribs (|V| rows!) — a per-superstep driver
        # collect + rebuild that serializes and grows with parallelism
        # (r3's stage timeline shows the broadcast stages). Both sides are
        # already hash-partitioned p on the join key, so SHJ joins in
        # place: zero extra exchange, no SMJ sort, fully parallel.
        new = cur.join(
            contribs.hint("shuffle_hash"), cur[ID] == contribs[DST], "left"
        ).select(
            cur[ID],
            cur["out_degree"],
            cur["rank"].alias("_prev"),
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dm / n))
            ).alias("rank"),
        )
        new, m = materialize_stats(
            new,
            [
                F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta"),
                F.sum(
                    F.when(F.col("out_degree") == 0, F.col("rank")).otherwise(0.0)
                ).alias("dm"),
            ],
            keep=[ID, "out_degree", "rank"],
        )
        dangling["mass"] = float(m["dm"] or 0.0)
        delta = float(m["delta"] or 0.0)
        return new, {"converged": delta < tol, "delta": delta}

    result = run_supersteps(
        state, step, max_iters, checkpointer, checkpoint_every,
        start_superstep=start, realign=g.align_state,
    )
    result.state = result.state.select(ID, "out_degree", "rank")
    return result


def _resolve_block(token: str, pdf_left: pd.DataFrame) -> dict[str, np.ndarray]:
    """Edge block from either layout: packed blob row or raw edge rows."""
    if "blob" in pdf_left.columns:
        row = pdf_left.iloc[0]
        return _unpack_block(
            token, int(row["part"]), row["blob"], int(row["n"]), int(row["nu"])
        )
    return _edge_block(token, int(pdf_left["part"].iloc[0]), pdf_left)


def _pagerank_csr(
    spark, g: CsrGraph, damping, tol, max_iters, init_ranks=None
) -> RunResult:
    n = g.num_vertices
    state = materialize(
        _rank_seed(g, n, init_ranks)
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
        new = cur.join(
            contribs.hint("shuffle_hash"), cur[ID] == contribs[DST], "left"
        ).select(
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
        new, m = materialize_stats(
            new,
            [
                F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("delta"),
                F.sum(
                    F.when(F.col("out_degree") == 0, F.col("rank")).otherwise(0.0)
                ).alias("dm"),
            ],
            keep=[ID, "out_degree", "part", "rank"],
        )
        dangling["mass"] = float(m["dm"] or 0.0)
        delta = float(m["delta"] or 0.0)
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
    layout: str | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    mode: str = "auto",
    num_edges: int | None = None,
) -> RunResult:
    """Hash-min connected components via the CSR kernel; exact same
    fixed point as algos.connected_components (min is order-free).
    ``checkpointer``: durable resume (disk layout only).
    ``mode``/``num_edges``: join/stream/CSR dispatch, see pagerank_csr.
    CC keeps the conservative 1M cold crossover (few cheap supersteps
    don't amortize a cold block build) but routes stream below it when
    the warm-block registry already holds this graph's undirected blocks
    (e.g. LPA ran first: sf0.1 join 4.4 s vs warm stream 2.1 s)."""
    route, ne = _auto_route(
        edges, mode, num_edges, token, layout, packed,
        warm_key=_warm_key(edges, True, None, num_partitions),
    )
    if route == "join":
        from .algos.cc import connected_components as _cc_join

        return _cc_join(
            spark, edges, max_iters=max_iters, num_partitions=num_partitions,
            checkpointer=checkpointer, checkpoint_every=checkpoint_every,
            num_edges=ne,
        )
    if route == "stream":
        from .stream_algos import cc_stream as _cc_stream

        return _cc_stream(
            spark, edges, max_iters=max_iters, num_partitions=num_partitions,
            token=token, checkpointer=checkpointer,
            checkpoint_every=checkpoint_every,
        )
    g = CsrGraph(
        spark, edges, num_partitions, undirected=True, packed=packed,
        token=token, layout=layout,
    )
    with superstep_conf(spark, g.p, adaptive=False):
        if g.layout == "disk":
            res = _cc_csr_disk(spark, g, max_iters, checkpointer, checkpoint_every)
        else:
            res = _cc_csr(spark, g, max_iters)
    g.unpersist()
    return res


def _cc_csr_disk(
    spark, g: CsrGraph, max_iters,
    checkpointer: CheckpointManager | None = None, checkpoint_every: int = 5,
) -> RunResult:
    def init() -> DataFrame:
        return g.verts.select(F.col(ID), F.col(ID).alias("label"))

    raw, start = resume_or_init(spark, checkpointer, init)
    state = materialize(g.align_state(raw))
    state.count()
    token, block_dir = g.cache_token, g.block_dir

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = list(batches)
        blk = _load_disk_block(token, pid, block_dir)
        if blk is None or not pdfs:
            return
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        ids = pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        labels = pdf["label"].to_numpy(dtype=np.int64)
        _check_aligned(blk, ids[order])
        lab_edge = labels[order][blk["pos"]]
        # v5: per-dst min via reduceat over the build-time segment starts
        # (min is order-free; skips the per-edge dst_inverse stream)
        out = np.minimum.reduceat(lab_edge, blk["starts"])
        yield pd.DataFrame({DST: blk["dst_unique"], "ml": out})

    def step(cur: DataFrame, superstep: int):
        partials = cur.mapInPandas(kernel, schema=f"{DST} long, ml long")
        mins = partials.groupBy(DST).agg(F.min("ml").alias("ml"))
        new = cur.join(
            mins.hint("shuffle_hash"), cur[ID] == mins[DST], "left"
        ).select(
            cur[ID],
            F.least(cur["label"], F.coalesce(F.col("ml"), cur["label"])).alias("label"),
            (F.coalesce(F.col("ml"), cur["label"]) < cur["label"]).alias("_chg"),
        )
        new, m = materialize_stats(
            new,
            [F.sum(F.col("_chg").cast("long")).alias("c")],
            keep=[ID, "label"],
        )
        changed = int(m["c"] or 0)
        return new, {"converged": changed == 0, "changed": changed}

    result = run_supersteps(
        state, step, max_iters, checkpointer, checkpoint_every,
        start_superstep=start, realign=g.align_state,
    )
    result.state = result.state.select(ID, "label")
    return result


# ---------------------------------------------------------------------------
# Label propagation (most-frequent neighbor label, min-label ties)
# ---------------------------------------------------------------------------

def lpa_csr(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 10,
    num_partitions: int | None = None,
    token: str | None = None,
    checkpointer: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    mode: str = "auto",
    num_edges: int | None = None,
) -> RunResult:
    """Synchronous LPA via the CSR disk-block kernel; exact same fixed
    point as algos.label_propagation (deterministic min-label ties).

    The per-partition kernel pre-aggregates (dst, label) COUNTS with a
    lexsort + run-length pass — X-Stream's in-buffer pre-aggregation for
    the two-level LPA fold; the JVM side then sums partial counts and
    picks max_by(label, (cnt, -label)) per dst. The north star names LPA
    among the CSR-path algorithms [BJ north_star].
    ``mode``/``num_edges``: join/stream/CSR dispatch, see pagerank_csr."""
    route, ne = _auto_route(
        edges, mode, num_edges, token, None,
        min_edges=STREAM_AUTO_MIN_EDGES,
        warm_key=_warm_key(edges, True, None, num_partitions),
    )
    if route == "join":
        from .algos.lpa import label_propagation as _lpa_join

        return _lpa_join(
            spark, edges, max_iters=max_iters, num_partitions=num_partitions,
            checkpointer=checkpointer, checkpoint_every=checkpoint_every,
            num_edges=ne,
        )
    if route == "stream":
        from .stream_algos import lpa_stream as _lpa_stream

        return _lpa_stream(
            spark, edges, max_iters=max_iters, num_partitions=num_partitions,
            token=token, checkpointer=checkpointer,
            checkpoint_every=checkpoint_every,
        )
    g = CsrGraph(spark, edges, num_partitions, undirected=True, token=token)
    with superstep_conf(spark, g.p, adaptive=False):
        res = _lpa_csr_disk(spark, g, max_iters, checkpointer, checkpoint_every)
    g.unpersist()
    return res


def _lpa_csr_disk(
    spark, g: CsrGraph, max_iters,
    checkpointer: CheckpointManager | None = None, checkpoint_every: int = 5,
) -> RunResult:
    def init() -> DataFrame:
        return g.verts.select(F.col(ID), F.col(ID).alias("label"))

    raw, start = resume_or_init(spark, checkpointer, init)
    state = materialize(g.align_state(raw))
    state.count()
    token, block_dir = g.cache_token, g.block_dir

    def kernel(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdfs = list(batches)
        blk = _load_disk_block(token, pid, block_dir)
        if blk is None or not pdfs:
            return
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        ids = pdf[ID].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        labels = pdf["label"].to_numpy(dtype=np.int64)
        _check_aligned(blk, ids[order])
        lab_edge = labels[order][blk["pos"]]
        di = blk["dst_inverse"]
        if len(di) == 0:
            return
        # partial count per (dst, label). Fast path: pack (dst_inverse,
        # label) into ONE int64 key — di < 2^31 slots, labels (vertex
        # ids) in [0, 2^31) — and np.sort it directly: no argsort
        # permutation gather, no two-key lexsort. Measured 9.3x over the
        # lexsort on the bench block shape (37 vs 348 ms/block), and the
        # sort was LPA's dominant kernel cost. Labels outside the packable
        # domain fall back to the lexsort (identical output).
        if (
            len(blk["dst_unique"]) < 2**31
            and lab_edge.min() >= 0
            and lab_edge.max() < 2**31
        ):
            key = (di << np.int64(31)) | lab_edge
            key.sort()  # di is monotone already (v3) — near-sorted input
            d_s = key >> np.int64(31)
            l_s = key & np.int64(2**31 - 1)
        else:
            o = np.lexsort((lab_edge, di))
            d_s, l_s = di[o], lab_edge[o]
        boundary = np.empty(len(d_s), dtype=bool)
        boundary[0] = True
        boundary[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(boundary)
        cnt = np.diff(np.append(starts, len(d_s)))
        yield pd.DataFrame({
            DST: blk["dst_unique"][d_s[starts]],
            "label": l_s[starts],
            "cnt": cnt.astype(np.int64),
        })

    def step(cur: DataFrame, superstep: int):
        partials = cur.mapInPandas(kernel, schema=f"{DST} long, label long, cnt long")
        counts = partials.groupBy(DST, "label").agg(F.sum("cnt").alias("cnt"))
        best = counts.groupBy(DST).agg(
            F.max_by("label", F.struct(F.col("cnt"), -F.col("label"))).alias("_nl")
        )
        new = cur.join(
            best.hint("shuffle_hash"), cur[ID] == best[DST], "left"
        ).select(
            cur[ID],
            F.coalesce(F.col("_nl"), cur["label"]).alias("label"),
            (F.coalesce(F.col("_nl"), cur["label"]) != cur["label"]).alias("_chg"),
        )
        new, m = materialize_stats(
            new,
            [F.sum(F.col("_chg").cast("long")).alias("c")],
            keep=[ID, "label"],
        )
        changed = int(m["c"] or 0)
        return new, {"converged": changed == 0, "changed": changed}

    result = run_supersteps(
        state, step, max_iters, checkpointer, checkpoint_every,
        start_superstep=start, realign=g.align_state,
    )
    result.state = result.state.select(ID, "label")
    return result


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
        new = cur.join(
            mins.hint("shuffle_hash"), cur[ID] == mins[DST], "left"
        ).select(
            cur[ID],
            cur["part"],
            F.least(cur["label"], F.coalesce(F.col("ml"), cur["label"])).alias("label"),
            (F.coalesce(F.col("ml"), cur["label"]) < cur["label"]).alias("_chg"),
        )
        new, m = materialize_stats(
            new,
            [F.sum(F.col("_chg").cast("long")).alias("c")],
            keep=[ID, "part", "label"],
        )
        changed = int(m["c"] or 0)
        return new, {"converged": changed == 0, "changed": changed}

    result = run_supersteps(state, step, max_iters)
    result.state = result.state.select(ID, "label")
    return result
