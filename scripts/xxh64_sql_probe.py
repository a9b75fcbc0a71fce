"""Dev probe: validate the DuckDB limb-math image of Spark's XXH64.

Spark's ``xxhash64(...)`` chains XXH64.hashLong / hashInt / hashUnsafeBytes
per column with the running hash as the seed (seed 42 at the head). The
generator oracles (harness.rmat_sql / er_sql) must reproduce those hashes
bit-for-bit in DuckDB. This probe checks three layers without a JVM:

1. pure-Python reference of XXH64.hashLong/hashInt/1-byte-string vs
   the DuckDB SQL emitted by harness._xxh64_* — bit equality over a
   range of adversarial inputs (negative longs, high bits set);
2. a pure-Python simulation of rmat_edges_spark / erdos_renyi_edges_spark
   (same hash chain, same pmod/double arithmetic) vs the full rmat_sql /
   er_sql CTEs — exact (src, dst) equality per edge id.

Layer 3 (Python reference vs the actual Spark expression) lives in
tests/test_generator_oracles.py — it needs a SparkSession.
"""

from __future__ import annotations

import duckdb

from chaos_spark.genoracle import (
    _xxh64_int,
    _xxh64_long,
    _xxh64_str1,
    er_sql,
    rmat_sql,
    xxh64_int_py,
    xxh64_long_py,
    xxh64_str1_py,
)

M64 = (1 << 64) - 1


def check_scalar_parity() -> None:
    con = duckdb.connect()
    longs = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789123456789,
             -987654321987654321, 2**32, 2**53 + 7]
    seeds = [42, 0, -5, 2**63 - 1, 7777777777777]
    bad = 0
    for v in longs:
        for s in seeds:
            want = xxh64_long_py(v, s)
            got = con.execute(
                f"SELECT {_xxh64_long(f'CAST({v & M64} AS UBIGINT)', f'CAST({s & M64} AS UBIGINT)')}"
            ).fetchone()[0]
            if int(got) != want & M64:
                print(f"hashLong({v}, {s}): want {want & M64:x} got {int(got):x}")
                bad += 1
    for v in [0, 1, -1, 5, 2**31 - 1, -(2**31), 42]:
        for s in seeds:
            want = xxh64_int_py(v, s)
            got = con.execute(
                f"SELECT {_xxh64_int(v, f'CAST({s & M64} AS UBIGINT)')}"
            ).fetchone()[0]
            if int(got) != want & M64:
                print(f"hashInt({v}, {s}): want {want & M64:x} got {int(got):x}")
                bad += 1
    for ch in [b"s", b"d", b"x"]:
        for s in seeds:
            want = xxh64_str1_py(ch, s)
            got = con.execute(
                f"SELECT {_xxh64_str1(ch[0], f'CAST({s & M64} AS UBIGINT)')}"
            ).fetchone()[0]
            if int(got) != want & M64:
                print(f"hashStr1({ch}, {s}): want {want & M64:x} got {int(got):x}")
                bad += 1
    print(f"scalar parity: {'OK' if bad == 0 else f'{bad} MISMATCHES'}")


def _sim_rmat(scale: int, num_edges: int, seed: int,
              probs=(0.57, 0.19, 0.19, 0.05)):
    """Pure-Python simulation of generators.rmat_edges_spark."""
    a, b_, c, _ = probs
    c1, c2, c3 = a, a + b_, a + b_ + c
    out = []
    for i in range(num_edges):
        src = dst = 0
        for bit in range(scale):
            h = 42
            h = xxh64_long_py(i, h)
            h = xxh64_int_py(bit, h)
            h = xxh64_int_py(seed, h)
            hs = h - (1 << 64) if h & (1 << 63) else h
            u = float(((hs % (1 << 53)) + (1 << 53)) % (1 << 53)) / float(1 << 53)
            quad = 0 if u < c1 else (1 if u < c2 else (2 if u < c3 else 3))
            src += (quad >> 1) << bit
            dst += (quad & 1) << bit
        out.append((i, src, dst))
    return out


def _sim_er(num_vertices: int, num_edges: int, seed: int):
    out = []
    for i in range(num_edges):
        hs_ = xxh64_str1_py(b"s", xxh64_long_py(i, 42))
        hd_ = xxh64_str1_py(b"d", xxh64_long_py(i, 42))
        hs = xxh64_int_py(seed, hs_)
        hd = xxh64_int_py(seed, hd_)
        def signed(x):
            return x - (1 << 64) if x & (1 << 63) else x
        src = ((signed(hs) % num_vertices) + num_vertices) % num_vertices
        dst = ((signed(hd) % num_vertices) + num_vertices) % num_vertices
        out.append((i, src, dst))
    return out


def check_generator_parity() -> None:
    con = duckdb.connect()
    want = _sim_rmat(8, 512, 7)
    got = con.execute(
        rmat_sql(scale=8, num_edges=512, seed=7) + " ORDER BY id"
    ).fetchall()
    ok = [tuple(map(int, r)) for r in got] == want
    print(f"rmat_sql parity (scale=8, 512 edges): {'OK' if ok else 'MISMATCH'}")
    if not ok:
        for w, g in zip(want, got):
            if tuple(map(int, g)) != w:
                print("  first diff:", w, tuple(map(int, g)))
                break
    want = _sim_er(100, 512, 7)
    got = con.execute(er_sql(num_vertices=100, num_edges=512, seed=7)
                      + " ORDER BY id").fetchall()
    ok = [tuple(map(int, r)) for r in got] == want
    print(f"er_sql parity (100 verts, 512 edges): {'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    check_scalar_parity()
    check_generator_parity()
