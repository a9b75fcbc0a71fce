"""DuckDB value-oracles for the seeded graph generators (SURVEY §2.3).

The generators (generators.py) derive every random choice from Spark's
``xxhash64`` so they are deterministic and collect-free at any
parallelism. To VALUE-verify them the oracle must reproduce those hashes
bit-for-bit in DuckDB — the same move the r4 ``hyperanf_k3`` oracle made
for the murmur finalizer, extended to the full XXH64 block hash.

Spark's ``xxhash64(c1, c2, …)`` (catalyst XxHash64, seed 42) chains the
XXH64 primitives per column with the running hash as the seed:
``hashLong`` for LONG columns, ``hashInt`` for INT literals, and the
byte-tail path of ``hashUnsafeBytes`` for short strings. All three are
pure 64-bit wrapping integer math; DuckDB has no wrapping multiply, so
products run in HUGEINT (int128) space split into 32-bit limbs
(harness._mulmod64's trick), and each hash stage is one LATERAL COLUMN
ALIAS in a flat SELECT — no expression blow-up, no recursive CTE.

Three-layer parity proof:
1. pure-Python references (xxh64_*_py below) mirror the published XXH64
   reference implementation / Spark's XXH64.java semantics;
2. scripts/xxh64_sql_probe.py checks the SQL emitters against the Python
   references bit-for-bit, and the full rmat_sql/er_sql CTEs against a
   Python simulation of the generators — no JVM needed;
3. tests/test_generator_oracles.py checks the Python references against
   Spark's actual ``xxhash64`` and the full oracle SQL against the actual
   generator DataFrames (the driver-grade check).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1
_TWO64 = 1 << 64


# ---------------------------------------------------------------------------
# Pure-Python references (Spark XXH64 semantics, wrapping 64-bit math)
# ---------------------------------------------------------------------------

def _rotl_py(x: int, r: int) -> int:
    x &= _M64
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix_py(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long_py(v: int, seed: int) -> int:
    """XXH64.hashLong(v, seed) — one 8-byte block."""
    h = ((seed & _M64) + _P5 + 8) & _M64
    k1 = (_rotl_py((v & _M64) * _P2 & _M64, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl_py(h, 27) * _P1 + _P4) & _M64
    return _fmix_py(h)


def xxh64_int_py(c: int, seed: int) -> int:
    """XXH64.hashInt(c, seed) — one 4-byte word."""
    h = ((seed & _M64) + _P5 + 4) & _M64
    h ^= ((c & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl_py(h, 23) * _P2 + _P3) & _M64
    return _fmix_py(h)


def xxh64_str1_py(b: bytes, seed: int) -> int:
    """XXH64.hashUnsafeBytes over ONE byte (the generators' "s"/"d" string
    literals): no word blocks, the single tail byte, then the avalanche."""
    h = ((seed & _M64) + _P5 + 1) & _M64
    h ^= (b[0] * _P5) & _M64
    h = (_rotl_py(h, 11) * _P1) & _M64
    return _fmix_py(h)


# ---------------------------------------------------------------------------
# SQL emitters (UBIGINT columns; products via HUGEINT 32-bit limbs)
# ---------------------------------------------------------------------------

def _mulmod(a: str, b: int) -> str:
    """(a * b) mod 2^64, a = UBIGINT SQL expr, b = 64-bit constant."""
    bl, bh = b & 0xFFFFFFFF, b >> 32
    return (
        f"CAST(((CAST({a} AS HUGEINT) * {bl}) % {_TWO64}"
        f" + ((CAST({a} AS HUGEINT) % 4294967296) * {bh} % 4294967296)"
        f" * 4294967296) % {_TWO64} AS UBIGINT)"
    )


def _rotl(x: str, r: int) -> str:
    return (
        f"CAST(((CAST({x} AS HUGEINT) * {1 << r}) % {_TWO64}"
        f" + (CAST({x} AS HUGEINT) >> {64 - r})) AS UBIGINT)"
    )


def _addmod(a: str, c: int) -> str:
    return f"CAST((CAST({a} AS HUGEINT) + {c % _TWO64}) % {_TWO64} AS UBIGINT)"


def _fmix_steps(h: str, out: str, tag: str) -> list[tuple[str, str]]:
    return [
        (f"{tag}f1", f"xor({h}, {h} >> 33)"),
        (f"{tag}f2", _mulmod(f"{tag}f1", _P2)),
        (f"{tag}f3", f"xor({tag}f2, {tag}f2 >> 29)"),
        (f"{tag}f4", _mulmod(f"{tag}f3", _P3)),
        (out, f"xor({tag}f4, {tag}f4 >> 32)"),
    ]


def _hash_long_steps(v: str, seed: str, out: str, tag: str) -> list[tuple[str, str]]:
    """Lateral-alias steps computing XXH64.hashLong(v, seed) AS ``out``."""
    return [
        (f"{tag}a1", _addmod(seed, _P5 + 8)),
        (f"{tag}k1", _mulmod(v, _P2)),
        (f"{tag}k2", _rotl(f"{tag}k1", 31)),
        (f"{tag}k3", _mulmod(f"{tag}k2", _P1)),
        (f"{tag}a2", f"xor({tag}a1, {tag}k3)"),
        (f"{tag}a3", _rotl(f"{tag}a2", 27)),
        (f"{tag}a4", _addmod(_mulmod(f"{tag}a3", _P1), _P4)),
        *_fmix_steps(f"{tag}a4", out, tag),
    ]


def _hash_int_steps(c: int, seed: str, out: str, tag: str) -> list[tuple[str, str]]:
    m = ((c & 0xFFFFFFFF) * _P1) & _M64
    return [
        (f"{tag}a1", _addmod(seed, _P5 + 4)),
        (f"{tag}a2", f"xor({tag}a1, CAST({m} AS UBIGINT))"),
        (f"{tag}a3", _rotl(f"{tag}a2", 23)),
        (f"{tag}a4", _addmod(_mulmod(f"{tag}a3", _P2), _P3)),
        *_fmix_steps(f"{tag}a4", out, tag),
    ]


def _hash_str1_steps(byte: int, seed: str, out: str, tag: str) -> list[tuple[str, str]]:
    m = (byte * _P5) & _M64
    return [
        (f"{tag}a1", _addmod(seed, _P5 + 1)),
        (f"{tag}a2", f"xor({tag}a1, CAST({m} AS UBIGINT))"),
        (f"{tag}a3", _rotl(f"{tag}a2", 11)),
        (f"{tag}a4", _mulmod(f"{tag}a3", _P1)),
        *_fmix_steps(f"{tag}a4", out, tag),
    ]


def _steps_from(inner: str, carry: list[str], steps: list[tuple[str, str]],
                tag: str) -> str:
    """Chain the steps as NESTED PROJECTION layers (one subquery per
    step). Lateral column aliases would also work syntactically, but
    DuckDB inlines an alias's expression into every later reference —
    with each hash step referencing its predecessor 2-3x, a 15-step
    chain explodes to millions of expression nodes at plan time
    (measured: minutes of planning). A real projection layer makes each
    reference a column ref; the optimizer prunes unused columns."""
    cur = inner
    known = list(carry)
    for i, (name, expr) in enumerate(steps):
        cur = f"(SELECT {', '.join(known)}, {expr} AS {name} FROM {cur} _{tag}{i})"
        known.append(name)
    return cur


def _signed(h: str) -> str:
    """UBIGINT -> two's-complement BIGINT (Spark hashes are signed longs)."""
    return (
        f"CAST(CAST({h} AS HUGEINT) - CASE WHEN {h} >= {1 << 63}"
        f" THEN CAST({_TWO64} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )


# Scalar single-expression forms for the probe.
def _scalar(steps: list[tuple[str, str]], out: str) -> str:
    rel = _steps_from("(SELECT 1 AS _one)", ["_one"], steps, "sc")
    return f"(SELECT {out} FROM {rel} _fin)"


def _xxh64_long(v_sql: str, seed_sql: str) -> str:
    return _scalar(_hash_long_steps(v_sql, seed_sql, "hout", "s"), "hout")


def _xxh64_int(c: int, seed_sql: str) -> str:
    return _scalar(_hash_int_steps(c, seed_sql, "hout", "s"), "hout")


def _xxh64_str1(byte: int, seed_sql: str) -> str:
    return _scalar(_hash_str1_steps(byte, seed_sql, "hout", "s"), "hout")


# ---------------------------------------------------------------------------
# Full generator oracles
# ---------------------------------------------------------------------------

def rmat_sql(
    scale: int,
    num_edges: int,
    seed: int = 42,
    probs: tuple[float, float, float, float] = (0.57, 0.19, 0.19, 0.05),
) -> str:
    """Exact SQL image of generators.rmat_edges_spark: per edge id and bit
    level, quadrant = the SAME xxhash64(id, bit, seed)-derived uniform
    compared against the SAME Python-computed cumulative probabilities
    (repr round-trips the identical doubles). One MATERIALIZED CTE per
    bit — linear evaluation, never exponential CTE re-inlining."""
    a, b_, c, _ = probs
    c1, c2, c3 = a, a + b_, a + b_ + c
    two53 = 1 << 53
    parts = [
        f"g0 AS MATERIALIZED (SELECT range::BIGINT AS id,"
        f" CAST(0 AS BIGINT) AS src, CAST(0 AS BIGINT) AS dst"
        f" FROM range({num_edges}))"
    ]
    for bit in range(scale):
        steps = [
            *_hash_long_steps("CAST(id AS UBIGINT)",
                              f"CAST(42 AS UBIGINT)", "h1", "x"),
            *_hash_int_steps(bit, "h1", "h2", "y"),
            *_hash_int_steps(seed, "h2", "h3", "z"),
            ("hs", _signed("h3")),
            ("u", f"CAST(((hs % {two53}) + {two53}) % {two53} AS DOUBLE)"
                  f" / {float(two53)!r}"),
            ("quad", f"CASE WHEN u < {c1!r} THEN 0 WHEN u < {c2!r} THEN 1"
                     f" WHEN u < {c3!r} THEN 2 ELSE 3 END"),
        ]
        rel = _steps_from(f"g{bit}", ["id", "src", "dst"], steps, f"b{bit}_")
        parts.append(
            f"""g{bit + 1} AS MATERIALIZED (
  SELECT id, src + CAST(quad >> 1 AS BIGINT) * {1 << bit} AS src,
         dst + CAST(quad % 2 AS BIGINT) * {1 << bit} AS dst
  FROM {rel} _q{bit}
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, src, dst FROM g{scale}"
    )


def er_sql(num_vertices: int, num_edges: int, seed: int = 42) -> str:
    """Exact SQL image of generators.erdos_renyi_edges_spark:
    src = pmod(xxhash64(id, 's', seed), V), dst likewise with 'd'."""
    steps = [
        *_hash_long_steps("CAST(id AS UBIGINT)", "CAST(42 AS UBIGINT)",
                          "hl", "x"),
        *_hash_str1_steps(ord("s"), "hl", "hs1", "a"),
        *_hash_int_steps(seed, "hs1", "hs2", "b"),
        *_hash_str1_steps(ord("d"), "hl", "hd1", "c"),
        *_hash_int_steps(seed, "hd1", "hd2", "d"),
        ("ss", _signed("hs2")),
        ("sd", _signed("hd2")),
    ]
    rel = _steps_from("g0", ["id"], steps, "er")
    return (
        f"""WITH g0 AS MATERIALIZED (SELECT range::BIGINT AS id FROM range({num_edges}))
SELECT id, ((ss % {num_vertices}) + {num_vertices}) % {num_vertices} AS src,
       ((sd % {num_vertices}) + {num_vertices}) % {num_vertices} AS dst
FROM {rel} _q"""
    )
