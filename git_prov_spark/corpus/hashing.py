"""Portable (Spark ≡ DuckDB) deterministic hashing for dedup/LSH operators.

All near-dup operators (MinHash, SimHash, LSH bucketing, fingerprints) need a
string→int64 hash that both engines compute identically so the driver's
DuckDB oracle can value-hash-compare results. xxhash64/murmur differ between
engines; md5 does not:

    H(s)  = int64 of the first 15 hex chars of md5(s)        (60 bits, ≥ 0)
    Spark : conv(substring(md5(s), 1, 15), 16, 10) :: bigint
    DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

Permutations for MinHash are the classic (a*h + b) mod p family with
p = 2^31 - 1 (Mersenne). h is first reduced mod p so a*h never overflows
int64 (a < 2^31, h' < 2^31 → product < 2^62).

Constants are fixed (seeded once, hardcoded) — determinism across runs and
across parallelism levels is a north_rule requirement.
"""

from __future__ import annotations

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# 16 fixed (a, b) permutation pairs, odd multipliers, generated once with
# random.Random(42); hardcoded so Spark exprs and DuckDB SQL share them.
MINHASH_PERMS: list[tuple[int, int]] = [
    (1303377493, 243548399), (1948126061, 1423722703), (514968155, 1051889721),
    (1668118397, 976709927), (1239103397, 1024718857), (181856861, 275249505),
    (1060638127, 681083523), (850319071, 459756869), (1494547629, 753893097),
    (1118843021, 2043941029), (654455459, 1655226761), (1807697719, 696974022),
    (954277147, 1366832623), (972445191, 273622567), (1479068815, 1200692207),
    (717642139, 1706922499),
]

N_MINHASH = len(MINHASH_PERMS)
LSH_BANDS = 4          # 4 bands × 4 rows over the 16-sig
LSH_ROWS = N_MINHASH // LSH_BANDS

# Production-size MinHash: 128 permutations banded 16×8. The S-curve
# P(candidate) = 1-(1-s^8)^16 crosses 0.5 near s≈0.72 — a real near-dup
# threshold, unlike the oracle-parity 16-perm config above (kept as the
# compact demo). Pairs are hash-derived (not RNG) so both engines and any
# re-run mint identical constants.
LSH_BANDS_WIDE = 16
LSH_ROWS_WIDE = 8
N_MINHASH_WIDE = LSH_BANDS_WIDE * LSH_ROWS_WIDE  # 128

# 64-bit SimHash: 32 bits from the token's base hash, 32 from a suffixed
# re-hash ('#hi' contains a space, which whitespace tokens never do, so the
# two hash families can't collide on crafted inputs). Banded into 4x16 bits:
# any pair at hamming <= SIMHASH64_BANDS-1 = 3 shares at least one intact
# band (pigeonhole), so the banded equi-join has perfect recall at <=3.
SIMHASH64_BITS = 64
SIMHASH64_BANDS = 4
SIMHASH64_BAND_BITS = SIMHASH64_BITS // SIMHASH64_BANDS
SIMHASH_HI_SUFFIX = " #hi"

# Random-hyperplane LSH for embeddings: weight(plane, dim) derived from the
# portable hash so both engines mint identical hyperplanes.
ANN_PLANES = 4         # → 16 buckets (compact demo; in-bucket join is 1/16)
ANN_PLANES_WIDE = 16   # → 65,536 buckets: the production default — in-bucket
                       # candidate mass is ~1/65536 of the corpus; recall is
                       # recovered by multi-probing the hamming-1 neighborhood
                       # (17 probes) instead of coarser buckets
EMBED_DIM = 64


def spark_h64(expr: str) -> str:
    """Spark SQL expr: portable 60-bit hash of a string expression."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def duck_h64(expr: str) -> str:
    """DuckDB SQL: identical value to :func:`spark_h64`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def spark_hmod(expr: str) -> str:
    return f"({spark_h64(expr)} % {MERSENNE_P})"


def duck_hmod(expr: str) -> str:
    return f"({duck_h64(expr)} % {MERSENNE_P})"


def perm_expr(h_expr: str, a: int, b: int) -> str:
    """(a*h' + b) mod p — same source text works in both dialects."""
    return f"(({a} * {h_expr} + {b}) % {MERSENNE_P})"


def py_h64(s: str) -> int:
    """Python twin of spark_h64/duck_h64 — used to pre-fold constants
    (e.g. LSH hyperplane weights) into literals at plan-build time instead
    of shipping md5() calls into the expression tree."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def lsh_weight_int(plane: int, dim: int) -> int:
    """Integer numerator of the hyperplane weight: weight = w/1000 ∈ [-1, 1]."""
    return (py_h64(f"{plane}_{dim}") % MERSENNE_P) % 2001 - 1000


def _wide_perm(i: int) -> tuple[int, int]:
    """Hash-derived (a, b) permutation pair: a ∈ [1, p-1], b ∈ [0, p-1]."""
    a = py_h64(f"minhash_wide_a_{i}") % (MERSENNE_P - 1) + 1
    b = py_h64(f"minhash_wide_b_{i}") % MERSENNE_P
    return a, b


MINHASH_PERMS_WIDE: list[tuple[int, int]] = [
    _wide_perm(i) for i in range(N_MINHASH_WIDE)
]
