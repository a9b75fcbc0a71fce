"""Training-data pipeline operators: MinHash-LSH / SimHash / Jaccard /
fingerprints / lang-id / embedding near-dup / ANN / multimodal plumbing.

Near-dup semantics are validated on a corpus with PLANTED duplicates
(the driver's documents table has none); the harness oracles then check
Spark<->DuckDB parity on the real tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from chaos_spark import textops
from chaos_spark.ann import brute_topk, lsh_topk
from chaos_spark.multimodal import decode_image, frame_sample, synthesize_media

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE + " indeed"  # one appended word (verified to collide in >=1
# band under the fixed portable hashes; a mid-text word swap at ~0.76
# Jaccard genuinely may not collide with 4x4 LSH — that's the tuning
# curve, not a bug)
OTHER = (
    "completely different text about spark shuffles partitions and the "
    "catalyst optimizer rewriting logical plans into physical stages"
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [BASE, NEAR, OTHER, BASE],  # 4 = exact dup of 1
        }
    )
    return spark.createDataFrame(pdf)


def test_minhash_signatures_shape_and_determinism(spark, docs):
    sig = textops.minhash_signatures(docs).collect()
    assert len(sig) == 4 * textops.NUM_PERMS
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["perm"]] = r["minhash"]
    # exact dup -> identical signature
    assert by_doc[1] == by_doc[4]
    # near dup -> most perms agree (>= half)
    agree = sum(1 for k in by_doc[1] if by_doc[1][k] == by_doc[2][k])
    assert agree >= textops.NUM_PERMS // 2
    # unrelated -> mostly disagree
    agree_o = sum(1 for k in by_doc[1] if by_doc[1][k] == by_doc[3][k])
    assert agree_o <= textops.NUM_PERMS // 4


def test_lsh_candidates_find_planted_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textops.lsh_candidate_pairs(docs).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near dup collides in >=1 band
    assert (1, 3) not in pairs and (2, 3) not in pairs  # unrelated never


def test_ngram_jaccard_hand_computed(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d", "a b c e"]})
    d = spark.createDataFrame(pdf)
    pairs = spark.createDataFrame(pd.DataFrame({"doc_a": [1], "doc_b": [2]}))
    out = textops.ngram_jaccard_pairs(d, pairs).collect()
    # shingles: {abc, bcd} vs {abc, bce} -> 1 / 3
    assert len(out) == 1
    assert abs(out[0]["jaccard"] - 1 / 3) < 1e-6  # rounded to 6 decimals


def test_simhash_distances(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in textops.simhash(docs).collect()}
    assert sh[1] == sh[4]
    ham_near = bin(sh[1] ^ sh[2]).count("1")
    ham_far = bin(sh[1] ^ sh[3]).count("1")
    assert ham_near <= 4
    assert ham_far > ham_near


def test_fingerprints_prefix_stability(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            # same 200-char prefix, different tail
            "text": ["x" * 50 + BASE + " TAIL_A", "x" * 50 + BASE + " TAIL_B"],
        }
    )
    d = spark.createDataFrame(pdf)
    fp = textops.fingerprints(d).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], {})[r["perm"]] = r["fp"]
    assert by_doc[1] == by_doc[2]


def test_lang_id_heuristic(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat is in the garden and it is warm",
                "der Hund ist nicht in das Haus und die Katze",
                "le chat est dans la maison et les oiseaux",
                "el perro y los gatos que viven en la casa",
                "我在这里的时候他就不说话了",
            ],
        }
    )
    got = {r["doc_id"]: r["pred_lang"]
           for r in textops.lang_id(spark.createDataFrame(pdf)).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh"}


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = [
        (0, base.tolist()),
        (1, (base + rng.normal(scale=0.01, size=8)).tolist()),  # near dup
        (2, rng.normal(size=8).tolist()),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = textops.embedding_near_dup_pairs(emb, threshold=0.99).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in out} == {(0, 1)}
    assert out[0]["cos_sim"] > 0.99


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_topk_self_is_top(spark, embeddings):
    qv = [float(x) for x in embeddings.where("vec_id = 0").first()["embedding"]]
    top = brute_topk(embeddings, qv, k=5).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-6
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall(spark, embeddings):
    qv = [float(x) for x in embeddings.where("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"] for r in brute_topk(embeddings, qv, k=10).collect()]
    approx = [r["vec_id"] for r in
              lsh_topk(embeddings, qv, k=10, bits=4, tables=8).collect()]
    assert approx[0] == 0  # identical vector shares every signature
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.4, f"LSH recall@10 = {recall}"


def test_lsh_topk_precomputed_sig_table_same_result(spark, embeddings):
    """The persisted-signature-table path returns the identical result to
    the build-on-the-fly path (same buckets, same candidates)."""
    from chaos_spark.ann import build_signature_table

    qv = [float(x) for x in embeddings.where("vec_id = 0").first()["embedding"]]
    st = build_signature_table(embeddings, dim=len(qv), bits=4, tables=8).persist()
    st.count()
    a = [(r["vec_id"], r["cos_sim"]) for r in
         lsh_topk(embeddings, qv, k=10, bits=4, tables=8).collect()]
    b = [(r["vec_id"], r["cos_sim"]) for r in
         lsh_topk(embeddings, qv, k=10, bits=4, tables=8, sig_table=st).collect()]
    st.unpersist()
    assert a == b


def test_embedding_near_dup_lsh_recall_and_precision(spark, embeddings):
    """LSH near-dup pairs vs brute force: every reported pair must be a
    true pair (exact re-rank => precision 1.0) and recall must clear the
    banding math for these parameters."""
    from chaos_spark.ann import embedding_near_dup_pairs_lsh
    from chaos_spark.textops import embedding_near_dup_pairs

    thr = 0.45
    exact = {(r["vec_a"], r["vec_b"])
             for r in embedding_near_dup_pairs(embeddings, thr).collect()}
    approx = {(r["vec_a"], r["vec_b"])
              for r in embedding_near_dup_pairs_lsh(
                  embeddings, thr, bits=4, tables=8).collect()}
    assert approx <= exact, "LSH reported a pair brute force rejects"
    if exact:
        recall = len(approx & exact) / len(exact)
        # banding math at the threshold boundary: (1-acos(.45)/pi)^4 = .18
        # per table, 1-(1-.18)^8 = .79 for any-of-8; assert with margin
        assert recall >= 0.5, f"LSH near-dup recall = {recall}"


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_pipeline(spark, docs):
    media = synthesize_media(docs)
    rows = media.collect()
    assert len(rows) == 4
    assert {r["media_type"] for r in rows} <= {"image", "audio", "video"}
    assert all(isinstance(bytes(r["payload"]), bytes) and len(r["payload"]) > 0
               for r in rows)
    # determinism
    again = {r["doc_id"]: bytes(r["payload"]) for r in synthesize_media(docs).collect()}
    assert {r["doc_id"]: bytes(r["payload"]) for r in rows} == again

    feats = decode_image(media).collect()
    assert len(feats) == 4
    for f in feats:
        assert f["byte_len"] > 0
        assert 0 <= f["byte_mean"] <= 255
        assert len(f["hist"]) == 16
        assert sum(f["hist"]) == f["byte_len"]

    with pytest.raises(NotImplementedError):
        decode_image(media, fake=False)

    frames = frame_sample(media, every_n=5).collect()
    vids = [r for r in rows if r["media_type"] == "video"]
    expect = sum(len(range(0, r["n_frames"], 5)) for r in vids)
    assert len(frames) == expect
