"""Deterministic random walks (chaos_spark/walks.py).

Contract: one walk per start vertex, every hop =
pmod(xxhash64(start, step, seed, cur), outdeg(cur))-th dst-ranked
out-neighbor, dangling terminates — bit-reproducible at any parallelism
and by the pure-Python XXH64 references (the same three-layer proof as
the generator oracles)."""

import pandas as pd
import pytest

from chaos_spark.fixtures import g4_powerlaw
from chaos_spark.genoracle import xxh64_int_py, xxh64_long_py
from chaos_spark.walks import random_walks


def _collect(df):
    return {(r["walk_id"], r["step"], r["id"]) for r in df.collect()}


def _simulate(pdf: pd.DataFrame, length: int, seed: int):
    adj: dict[int, list[int]] = {}
    for s, d in sorted(set(zip(pdf["src"], pdf["dst"]))):
        adj.setdefault(int(s), []).append(int(d))
    want = set()
    for v in sorted(set(pdf["src"]) | set(pdf["dst"])):
        v = int(v)
        cur = v
        want.add((v, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = xxh64_long_py(v, 42)
            h = xxh64_int_py(t - 1, h)
            h = xxh64_int_py(seed, h)
            h = xxh64_long_py(cur, h)
            hs = h - (1 << 64) if h >= (1 << 63) else h
            cur = nbrs[hs % len(nbrs)]
            want.add((v, t, cur))
    return want


def test_walks_match_python_simulation(spark):
    pdf = g4_powerlaw(scale=8, num_edges=1500)
    got = _collect(random_walks(spark, spark.createDataFrame(pdf), 5, seed=7))
    assert got == _simulate(pdf, 5, 7)


def test_walks_deterministic_across_runs_and_partitioning(spark):
    pdf = g4_powerlaw(scale=8, num_edges=1500)
    edges = spark.createDataFrame(pdf)
    a = _collect(random_walks(spark, edges, 4))
    b = _collect(random_walks(spark, edges.repartition(7), 4,
                              num_partitions=2))
    assert a == b


def test_walks_follow_edges_and_terminate_at_dangling(spark):
    # 1 -> 2 -> 3 (3 dangling): the only walk from 1 is 1,2,3 then stop.
    pdf = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    got = _collect(random_walks(spark, spark.createDataFrame(pdf), 10))
    assert got == {
        (1, 0, 1), (1, 1, 2), (1, 2, 3),
        (2, 0, 2), (2, 1, 3),
        (3, 0, 3),
    }


def test_walks_seed_changes_corpus(spark):
    pdf = g4_powerlaw(scale=8, num_edges=1500)
    edges = spark.createDataFrame(pdf)
    a = _collect(random_walks(spark, edges, 4, seed=1))
    b = _collect(random_walks(spark, edges, 4, seed=2))
    assert a != b


def test_walks_rejects_negative_length(spark):
    pdf = pd.DataFrame({"src": [1], "dst": [2]})
    with pytest.raises(ValueError, match="length"):
        random_walks(spark, spark.createDataFrame(pdf), -1)


def test_multi_walks_per_vertex_diverge_and_match_simulation(spark):
    pdf = g4_powerlaw(scale=8, num_edges=1500)
    k = 3
    got = _collect(random_walks(spark, spark.createDataFrame(pdf), 4,
                                seed=7, num_walks=k))
    # python simulation with walk_id = v*k + j
    adj: dict[int, list[int]] = {}
    for s, d in sorted(set(zip(pdf["src"], pdf["dst"]))):
        adj.setdefault(int(s), []).append(int(d))
    want = set()
    for v in sorted(set(pdf["src"]) | set(pdf["dst"])):
        for j in range(k):
            wid = int(v) * k + j
            cur = int(v)
            want.add((wid, 0, cur))
            for t in range(1, 5):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = xxh64_long_py(wid, 42)
                h = xxh64_int_py(t - 1, h)
                h = xxh64_int_py(7, h)
                h = xxh64_long_py(cur, h)
                hs = h - (1 << 64) if h >= (1 << 63) else h
                cur = nbrs[hs % len(nbrs)]
                want.add((wid, t, cur))
    assert got == want
    # trajectories for different j actually diverge somewhere
    by_walk = {}
    for wid, step, vid in got:
        by_walk.setdefault(wid, {})[step] = vid
    starts = {wid // k for wid in by_walk}
    assert any(
        by_walk.get(v * k) != by_walk.get(v * k + 1) for v in starts
    )


def test_walks_rejects_bad_num_walks(spark):
    pdf = pd.DataFrame({"src": [1], "dst": [2]})
    with pytest.raises(ValueError, match="num_walks"):
        random_walks(spark, spark.createDataFrame(pdf), 2, num_walks=0)


def test_weighted_walks_match_simulation_and_prefer_heavy_edges(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "src": rng.integers(1, 40, 300), "dst": rng.integers(1, 40, 300),
    })
    pdf["weight"] = (1 + (pdf["src"] + pdf["dst"]) % 5).astype(float)
    got = _collect(random_walks(
        spark, spark.createDataFrame(pdf), 3, weight_col="weight"
    ))

    TWO53 = 1 << 53
    agg = pdf.groupby(["src", "dst"], as_index=False)["weight"].sum()
    adj: dict[int, list[tuple[int, float]]] = {}
    for s, d, w in agg.sort_values(["src", "dst"]).itertuples(index=False):
        adj.setdefault(int(s), []).append((int(d), float(w)))
    want = set()
    for v in sorted(set(pdf["src"]) | set(pdf["dst"])):
        v = int(v)
        cur = v
        want.add((v, 0, v))
        for t in range(1, 4):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            sw = sum(w for _, w in nbrs)  # integer-valued: exact
            h = xxh64_long_py(v, 42)
            h = xxh64_int_py(t - 1, h)
            h = xxh64_int_py(42, h)
            h = xxh64_long_py(cur, h)
            hs = h - (1 << 64) if h >= (1 << 63) else h
            x = (((hs % TWO53) + TWO53) % TWO53) / TWO53 * sw
            cumw, pick = 0.0, None
            for i, (d, w) in enumerate(nbrs):
                if cumw <= x and (x < cumw + w or i == len(nbrs) - 1):
                    pick = d
                    break
                cumw += w
            cur = pick
            want.add((v, t, cur))
    assert got == want
    # heavy-edge preference: a 2-neighbor vertex with weights 1 vs 99
    # sends nearly all of many walks down the heavy edge
    skew = pd.DataFrame({
        "src": [1, 1], "dst": [2, 3], "weight": [1.0, 99.0],
    })
    walks = random_walks(
        spark, spark.createDataFrame(skew), 1, weight_col="weight",
        num_walks=50,
    )
    picks = [r["id"] for r in walks.where("step = 1").collect()]
    assert picks.count(3) > 40


def test_weighted_walks_reject_bad_weights(spark):
    pdf = pd.DataFrame({"src": [1], "dst": [2], "weight": [0.0]})
    with pytest.raises(ValueError, match="positive"):
        random_walks(spark, spark.createDataFrame(pdf), 2,
                     weight_col="weight")


def _n2v_simulate(pdf, length, p, q, seed):
    TWO53 = 1 << 53
    eset = set(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    adj: dict[int, list[int]] = {}
    for s, d in sorted(eset):
        adj.setdefault(s, []).append(d)

    def unif(wid, t, cur):
        h = xxh64_long_py(wid, 42)
        h = xxh64_int_py(t - 1, h)
        h = xxh64_int_py(seed, h)
        h = xxh64_long_py(cur, h)
        hs = h - (1 << 64) if h >= (1 << 63) else h
        return (((hs % TWO53) + TWO53) % TWO53) / TWO53

    want = set()
    for v in sorted(set(pdf["src"]) | set(pdf["dst"])):
        v = int(v)
        cur, prev = v, None
        want.add((v, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            if t == 1:
                ws = [1.0] * len(nbrs)
            else:
                ws = [
                    (1.0 / p if x == prev
                     else (1.0 if (prev, x) in eset else 1.0 / q))
                    for x in nbrs
                ]
            x_val = unif(v, t, cur) * sum(ws)
            cum, pick = 0.0, None
            for i, (d, w) in enumerate(zip(nbrs, ws)):
                if cum <= x_val and (x_val < cum + w or i == len(nbrs) - 1):
                    pick = d
                    break
                cum += w
            prev, cur = cur, pick
            want.add((v, t, cur))
    return want


def test_node2vec_matches_simulation(spark):
    from chaos_spark.walks import node2vec_walks

    pdf = g4_powerlaw(scale=8, num_edges=1500)
    got = _collect(node2vec_walks(
        spark, spark.createDataFrame(pdf), 4, p=2.0, q=0.5, seed=7
    ))
    assert got == _n2v_simulate(pdf, 4, 2.0, 0.5, 7)


def test_node2vec_return_bias_steers_walks(spark):
    from chaos_spark.walks import node2vec_walks

    # Star with center 0 <-> leaves: from a leaf the only move is back
    # to the center; from the center, tiny p makes returning to the
    # arrival leaf overwhelmingly likely, huge p makes it vanishingly so.
    import pandas as pd

    leaves = list(range(1, 9))
    pdf = pd.DataFrame({
        "src": [0] * 8 + leaves, "dst": leaves + [0] * 8,
    })
    edges = spark.createDataFrame(pdf)

    def returns(p, q):
        rows = node2vec_walks(
            spark, edges, 3, p=p, q=q, seed=11, num_walks=16,
            starts=spark.createDataFrame([(0,)], "id long"),
        ).collect()
        by = {}
        for r in rows:
            by.setdefault(r["walk_id"], {})[r["step"]] = r["id"]
        return sum(1 for w in by.values() if w.get(1) == w.get(3))

    # p = 1/1024: bias to return ~1024x; p = 1024: bias ~1/1024.
    assert returns(1.0 / 1024, 1.0) >= 14
    assert returns(1024.0, 1.0) <= 2


def test_node2vec_rejects_bad_pq(spark):
    from chaos_spark.walks import node2vec_walks

    pdf = pd.DataFrame({"src": [1], "dst": [2]})
    with pytest.raises(ValueError, match="p and q"):
        node2vec_walks(spark, spark.createDataFrame(pdf), 2, p=0.0)
