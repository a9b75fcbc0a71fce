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
  sizes and can be precomputed once and stored as a bucketed table.

Recall is tested against brute force in tests/test_textops_ann.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .textops import cosine


def _hyperplane(dim: int, bit: int, table: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component d is a
    hash-derived value in [-0.5, 0.5) — portable, seed-free, reproducible."""
    out = []
    for d in range(dim):
        v = (d * 2654435761 + bit * 97 + table * 1000003 + 12345) % 1000003
        out.append(v / 1000003.0 - 0.5)
    return out


def signature_col(vec: Column, dim: int, bits: int, table: int) -> Column:
    """SimHash signature of ``vec`` under ``bits`` deterministic
    hyperplanes — an integer bucket id."""
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
        sig = sig + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig.cast("long")


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


def lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    bits: int = 8, tables: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: candidates share >= 1 of ``tables`` SimHash
    signatures with the query; exact re-rank on candidates.
    Returns ``(vec_id, cos_sim)`` (approximate top-k: may miss true
    neighbors whose signatures all differ)."""
    dim = len(query_vec)
    spark = emb.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col} array<double>")
    q_sigs = qdf.select(
        *[signature_col(F.col(vec_col), dim, bits, t).alias(f"s{t}")
          for t in range(tables)]
    ).first()

    cand = None
    for t in range(tables):
        sel = emb.where(
            signature_col(F.col(vec_col), dim, bits, t) == int(q_sigs[f"s{t}"])
        )
        cand = sel if cand is None else cand.union(sel)
    cand = cand.dropDuplicates([id_col])
    return brute_topk(cand, query_vec, k, id_col, vec_col)
