"""Training-data pipeline operators over document tables.

Beyond the reference's graph suite, a 100 TB corpus engine needs the
standard text-curation operators (dedup, similarity, quality, language).
Everything here is pure Spark SQL expressions (JVM-side, whole-stage
codegen — no Python in the hot path), built around one PORTABLE hash both
Spark and DuckDB evaluate identically so every operator has an exact
driver oracle:

    H(s)        = int64 of the first 8 hex chars of md5(s)          (32-bit)
    perm_k(h)   = (h * (2k+1) + k * 40503) mod 2147483647

Operators:
- minhash signatures + banded LSH candidate pairs (near-dup detection;
  the band self-join is the scale path — no all-pairs product)
- n-gram Jaccard verification on the candidate pairs
- SimHash (16-bit) document signatures
- winnowing-style char-8-gram fingerprints
- stopword-ratio language identification
- embedding near-dup pairs (cosine threshold)

At 100 TB the LSH band join and the (dst-bucketed) group-bys are the only
shuffles; signatures are fixed-width and tiny relative to text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PRIME = 2147483647
B_PERM = 40503
NUM_PERMS = 16
BAND_ROWS = 4  # 16 perms / 4 rows = 4 bands


# ---------------------------------------------------------------------------
# Portable hash + shingles — Spark side
# ---------------------------------------------------------------------------

def h32(col: Column) -> Column:
    """First 8 hex chars of md5 as int64 — identical in DuckDB via
    CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def perm(h: Column, k: int) -> Column:
    return (h * F.lit(2 * k + 1) + F.lit(k * B_PERM)) % F.lit(PRIME)


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles; whole doc as one shingle when < n tokens."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array(F.concat_ws(" ", t))
    )


def char_shingles(text_col: str, n: int = 8, prefix: int = 200) -> Column:
    """Char n-grams of the first ``prefix`` chars (fingerprinting).
    Dynamic-start substring needs the SQL expr form of transform."""
    s = F.substring(F.col(text_col), 1, prefix)
    grams = F.expr(
        f"transform(sequence(1, length(substring({text_col}, 1, {prefix})) - {n} + 1), "
        f"i -> substring(substring({text_col}, 1, {prefix}), i, {n}))"
    )
    return F.when(F.length(s) >= n, grams).otherwise(F.array(s))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perms: int = NUM_PERMS,
) -> DataFrame:
    """Long-form signatures ``(doc_id, perm, minhash)`` — num_perms rows per
    doc, each the min over shingles of a permuted 32-bit hash.

    r6: the hashed-shingle array is PROJECTED ONCE (``_hs``) and the 16
    permutation mins read that column — previously each of the 16 min
    columns re-inlined the whole shingle+md5 transform chain, so every
    shingle was tokenized and md5-hashed 16x per row and the expression
    tree was 16x larger (codegen blowup): measured 13.8 s -> 0.4 s for
    the Spark side of minhash_sigs at sf0.01. CollapseProject keeps the
    two projections separate because ``_hs`` is non-cheap and referenced
    more than once, so the single evaluation survives optimization."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(word_shingles(F.col(text_col)), lambda s: h32(s)).alias("_hs"),
    )
    cols = [
        F.array_min(
            F.transform(F.col("_hs"), lambda h: perm(h, k))
        ).alias(f"_m{k}")
        for k in range(num_perms)
    ]
    wide = hashed.select("doc_id", *cols)
    pairs = F.array(*[
        F.struct(F.lit(k).alias("perm"), F.col(f"_m{k}").alias("minhash"))
        for k in range(num_perms)
    ])
    return wide.select("doc_id", F.explode(pairs).alias("pm")).select(
        "doc_id", F.col("pm.perm").alias("perm"), F.col("pm.minhash").alias("minhash")
    )


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perms: int = NUM_PERMS, band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Near-dup candidates ``(doc_a, doc_b)`` via banded MinHash-LSH:
    docs agreeing on all rows of at least one band collide. The self-join
    is on (band, bucket) — never an all-pairs product."""
    sig = minhash_signatures(docs, text_col, id_col, num_perms)
    buckets = (
        sig.withColumn("band", (F.col("perm") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
                ",",
            ).alias("bucket")
        )
    )
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given candidate pairs:
    ``(doc_a, doc_b, jaccard)`` rounded to 6 decimals."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("g"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs
        .join(sh.select(F.col("doc_id").alias("doc_a"), "g"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("_g")),
              "doc_b")
        .where(F.col("g") == F.col("_g"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sb")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("sa") + F.col("sb") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """16-bit SimHash over distinct tokens: bit b of the signature is the
    sign of sum over tokens of (bit b of H(token) ? +1 : -1)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).withColumn("h", h32(F.col("tok")))
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*aggs)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# Fingerprints, language id, quality
# ---------------------------------------------------------------------------

def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_perms: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprints: min permuted hash of char
    8-grams of the doc prefix, one row per permutation
    ``(doc_id, perm, fp)`` — robust to small edits anywhere past the
    changed window, the classic rolling-hash fingerprint."""
    # Same single-evaluation shape as minhash_signatures (r6): hash the
    # char-shingle array once, then take the per-permutation mins.
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(char_shingles(text_col), lambda s: h32(s)).alias("_hs"),
    )
    cols = [
        F.array_min(
            F.transform(F.col("_hs"), lambda h: perm(h, k))
        ).alias(f"_f{k}")
        for k in range(num_perms)
    ]
    wide = hashed.select("doc_id", *cols)
    pairs = F.array(*[
        F.struct(F.lit(k).alias("perm"), F.col(f"_f{k}").alias("fp"))
        for k in range(num_perms)
    ])
    return wide.select("doc_id", F.explode(pairs).alias("pf")).select(
        "doc_id", F.col("pf.perm").alias("perm"), F.col("pf.fp").alias("fp")
    )


STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "que"],
    "es": ["el", "los", "y", "que", "en", "de", "la", "es", "un", "una"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie priority


def lang_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-count language id: ``(doc_id, pred_lang)``; ties broken by
    the fixed LANG_ORDER priority. 'zh' additionally counts CJK chars
    since Chinese rarely whitespace-tokenizes."""
    t = tokens(F.col(text_col))
    counts = {}
    for lang in LANG_ORDER:
        words = STOPWORDS[lang]
        c = F.size(F.filter(t, lambda x: x.isin(words)))
        if lang == "zh":
            cjk = F.length(F.regexp_replace(F.col(text_col), "[^一-鿿]", ""))
            c = c + cjk
        counts[lang] = c
    d = docs.select(F.col(id_col).alias("doc_id"),
                    *[counts[lang].alias(f"_c_{lang}") for lang in LANG_ORDER])
    pred = F.lit("unknown")
    # reverse priority: earlier langs win ties because applied last with >=
    best = None
    for lang in reversed(LANG_ORDER):
        c = F.col(f"_c_{lang}")
        if best is None:
            pred = F.when(c > 0, F.lit(lang)).otherwise(pred)
            best = c
        else:
            pred = F.when((c > 0) & (c >= best), F.lit(lang)).otherwise(pred)
            best = F.greatest(c, best)
    return d.select("doc_id", pred.alias("pred_lang"))


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------

def cosine(a: Column, b: Column) -> Column:
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold: ``(vec_a, vec_b, cos_sim)``.
    Brute-force O(n^2) — the small-scale correctness baseline ONLY; the
    scale path is :func:`chaos_spark.ann.embedding_near_dup_pairs_lsh`
    (banded hyperplane buckets -> candidate self-join -> exact re-rank),
    which this function's results property-test against."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )
