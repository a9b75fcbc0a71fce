"""Approximate nearest-neighbor search over embedding columns.

Two paths over ``embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>)``:

- :func:`brute_topk` — exact cosine top-k, all math JVM-side
  (zip_with/aggregate); the correctness baseline and the right choice
  when the query set is small (broadcast query, one scan of the corpus).
- :func:`lsh_topk` — the scale path: random-hyperplane (SimHash) bucket
  signatures; candidates = vectors sharing at least one of the ``tables``
  signatures with the query; exact cosine re-ranking on candidates only.
  At 100 TB this turns an all-pairs scan into a bucket join whose fan-in
  is |corpus| / 2^bits per table; hyperplanes are deterministic
  (hash-derived), so signatures are reproducible across runs/cluster
  sizes.
- :func:`build_signature_table` — ONE corpus scan -> (vec_id, tbl, sig);
  persist/write it bucketed by (tbl, sig) and pass it to lsh_topk /
  embedding_near_dup_pairs_lsh so per-query cost is a bucket join, never
  a corpus scan.
- :func:`embedding_near_dup_pairs_lsh` — pairwise near-dup at scale:
  bucket self-join for candidates, exact cosine re-rank; replaces the
  O(n^2) cross join in textops.embedding_near_dup_pairs beyond toy sizes.

Recall is tested against brute force in tests/test_textops_ann.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .textops import cosine


def _hyperplane(dim: int, bit: int, table: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d is a splitmix64-
    style hash of (d, bit, table) mapped to [-0.5, 0.5) — portable,
    seed-free, reproducible. (Round-1 used a linear-congruential formula
    whose ``table * 1000003 % 1000003`` term was identically ZERO — every
    table had the SAME planes, and the 97·bit offset left bits nearly
    parallel, so multi-table recall never materialized; measured 0.29
    where the banding math says 0.79.)"""
    mask = (1 << 64) - 1
    out = []
    for d in range(dim):
        x = (
            d * 0x9E3779B97F4A7C15
            + bit * 0xBF58476D1CE4E5B9
            + table * 0x94D049BB133111EB
            + 0x2545F4914F6CDD1D
        ) & mask
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & mask
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & mask
        x ^= x >> 31
        out.append(x / float(1 << 64) - 0.5)
    return out


def signature_col(vec: Column, dim: int, bits: int, table: int) -> Column:
    """SimHash signature of ``vec`` under ``bits`` deterministic
    hyperplanes — an integer bucket id. The plane dot product is rounded
    to 9 decimals before the sign test so a DuckDB oracle evaluating the
    identical formula buckets identically (same trick as every float
    oracle in harness.py)."""
    sig = F.lit(0)
    v = F.transform(vec, lambda x: x.cast("double"))
    for b in range(bits):
        plane = _hyperplane(dim, b, table)
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(F.round(dot, 9) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig.cast("long")


def signature_sql(vec_sql: str, dim: int, bits: int, table: int) -> str:
    """The DuckDB rendering of :func:`signature_col` — same planes, same
    ROUND(·, 9) sign test, so both engines compute identical buckets."""
    terms = []
    for b in range(bits):
        plane = _hyperplane(dim, b, table)
        arr = "[" + ", ".join(repr(p) for p in plane) + "]"
        terms.append(
            f"(CASE WHEN ROUND(list_dot_product({vec_sql}, {arr}), 9) > 0"
            f" THEN {1 << b} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def build_signature_table(
    emb: DataFrame, dim: int, bits: int = 8, tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ONE scan of the corpus -> ``(vec_id, tbl, sig)`` — one row per
    (vector, table). Persist or write this bucketed by (tbl, sig); every
    ANN query and near-dup pass then joins against it instead of
    recomputing 6·dim-term signature expressions over the whole corpus
    per query (the round-1 anti-pattern: ``tables`` full scans/query)."""
    sigs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.array(
            *[signature_col(F.col(vec_col), dim, bits, t) for t in range(tables)]
        ).alias("_sigs"),
    )
    return sigs.select("vec_id", F.posexplode("_sigs").alias("tbl", "sig"))


def brute_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector:
    ``(vec_id, cos_sim)`` ordered desc, ties by vec_id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    nq = math.sqrt(sum(float(x) ** 2 for x in query_vec))
    sim = F.round(cosine(F.col(vec_col), q) * F.lit(1.0), 6)
    # cosine() normalizes both sides; fold the query norm manually to keep
    # the expression identical to the DuckDB oracle's formula
    return (
        emb.select(F.col(id_col).alias("vec_id"), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _round_half_up_9(x: float) -> float:
    """Round to 9 decimals, half AWAY from zero — the exact rounding of
    both Spark ``F.round`` (BigDecimal HALF_UP on the double's exact
    decimal value) and DuckDB ``ROUND``. Python's builtin ``round`` is
    banker's (half-to-even): a plane dot landing exactly on a 5e-10
    boundary would bucket the query differently from the corpus side,
    silently costing recall. Decimal, not ``floor(|x|*1e9+0.5)``: the
    binary multiply by 1e9 can itself round a value sitting at the
    boundary differently than the decimal expansion does (ADVICE r3)."""
    import decimal

    d = decimal.Decimal(x).quantize(
        decimal.Decimal("1e-9"), rounding=decimal.ROUND_HALF_UP
    )
    return float(d)


def _query_signatures(query_vec: list[float], bits: int, tables: int) -> list[int]:
    """Driver-side signature of the query vector — pure Python mirror of
    signature_col (same planes, same HALF_UP round-9 sign test)."""
    dim = len(query_vec)
    out = []
    for t in range(tables):
        sig = 0
        for b in range(bits):
            plane = _hyperplane(dim, b, t)
            dot = 0.0
            for x, p in zip(query_vec, plane):
                dot += float(x) * p
            if _round_half_up_9(dot) > 0:
                sig |= 1 << b
        out.append(sig)
    return out


def lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    bits: int = 8, tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sig_table: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share >= 1 of ``tables`` SimHash
    signatures with the query; exact re-rank on candidates.
    Returns ``(vec_id, cos_sim)`` (approximate top-k: may miss true
    neighbors whose signatures all differ).

    ``sig_table``: a precomputed :func:`build_signature_table` frame
    (persisted/bucketed; its build MUST have used the same ``bits``/
    ``tables`` — the query signature is computed from them either way)
    — the scale path: candidate lookup is ONE join
    of the signature table against ``tables`` literal (tbl, sig) rows +
    one semi-join of the corpus, instead of ``tables`` full corpus scans
    each evaluating the signature expressions per query. Built on the
    fly (one scan) when not supplied."""
    dim = len(query_vec)
    spark = emb.sparkSession
    if sig_table is None:
        sig_table = build_signature_table(emb, dim, bits, tables, id_col, vec_col)
    q_sigs = _query_signatures(query_vec, bits, tables)
    wanted = spark.createDataFrame(
        [(t, s) for t, s in enumerate(q_sigs)], "tbl int, sig long"
    )
    cand_ids = (
        sig_table.join(F.broadcast(wanted), ["tbl", "sig"])
        .select(F.col("vec_id").alias(id_col))
        .distinct()
    )
    cand = emb.join(cand_ids, id_col, "semi")
    return brute_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs_lsh(
    emb: DataFrame, threshold: float, bits: int = 6, tables: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int | None = None, sig_table: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) via banded hyperplane
    LSH — the scale form of textops.embedding_near_dup_pairs, which is an
    O(n^2) cross join. Candidates = pairs sharing >= 1 (tbl, sig) bucket
    (self-join of the signature table on the bucket key — never
    all-pairs; fan-in per bucket ~ n/2^bits per table); exact cosine
    re-rank on candidates only. Approximate by construction: pairs whose
    signatures differ in all tables are missed (recall vs the brute-force
    baseline is property-tested; the driver oracle evaluates the SAME
    buckets in SQL via signature_sql, so the check is exact)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    if sig_table is None:
        sig_table = build_signature_table(emb, dim, bits, tables, id_col, vec_col)
    a, b = sig_table.alias("a"), sig_table.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    from .textops import cosine as _cos

    ea = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_sim", F.round(_cos(F.col("_va"), F.col("_vb")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )
