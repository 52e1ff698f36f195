"""sketches.py: deterministic HyperLogLog — exact parity with a
pure-Python reference (third implementation beside the DuckDB twin),
the merge = bucket-wise-max union law, accuracy sanity, and bit
invariance under repartitioning."""
from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.hashing import py_h64
from git_prov_spark.corpus.sketches import (
    HLL_HASH_BITS,
    HLL_P,
    hll_estimate,
    hll_registers,
    merge_registers,
)


def _py_registers(values, p=HLL_P):
    vbits = HLL_HASH_BITS - p
    regs = {}
    for v in values:
        if v is None:
            continue
        h = py_h64(str(v))
        bucket, w = h >> vbits, h & ((1 << vbits) - 1)
        rho = vbits + 1 if w == 0 else vbits - (w.bit_length() - 1)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(values, p=HLL_P):
    m = 1 << p
    regs = _py_registers(values, p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = 0.0
    for b in sorted(regs):
        s += 1.0 / (1 << regs[b])
    return alpha * float(m * m) / (s + float(m - len(regs)))


def _ids(spark, n, stride=1):
    return spark.range(0, n * stride, stride).selectExpr("id AS k")


def test_registers_match_python_reference(spark):
    vals = list(range(0, 3000, 3))
    got = {r.bucket: r.rho
           for r in hll_registers(_ids(spark, 1000, 3), "k").collect()}
    assert got == _py_registers(vals)


def test_estimate_matches_python_bitwise(spark):
    vals = list(range(0, 3000, 3))
    row = hll_estimate(_ids(spark, 1000, 3), "k").collect()[0]
    assert row.raw_est == _py_estimate(vals)  # exact float equality
    assert row.exact_distinct == 1000
    assert row.m == 256 and row.n_present + row.n_zero == 256


def test_estimate_accuracy(spark):
    """p=8 → ~6.5% std error; 20% is > 3 sigma for 5000 distinct."""
    row = hll_estimate(_ids(spark, 5000), "k").collect()[0]
    assert abs(row.raw_est - 5000) / 5000 < 0.20
    assert row.err_bp < 2000


def test_merge_is_union(spark):
    """Registers of the union == bucket-wise max of the parts — the
    mergeability that makes per-day sketches roll up without rescans."""
    a, b = _ids(spark, 800), spark.range(500, 1500).selectExpr("id AS k")
    merged = {r.bucket: r.rho for r in merge_registers(
        hll_registers(a, "k"), hll_registers(b, "k")).collect()}
    union = {r.bucket: r.rho
             for r in hll_registers(a.unionByName(b), "k").collect()}
    assert merged == union


def test_partitioning_invariant(spark):
    df = _ids(spark, 2000)
    a = hll_estimate(df, "k").collect()[0]
    b = hll_estimate(df.repartition(13), "k").collect()[0]
    assert a == b  # bit-for-bit, incl. the folded double


def test_nulls_ignored(spark):
    df = spark.sql("SELECT CASE WHEN id % 2 = 0 THEN id END AS k "
                   "FROM range(100)")
    row = hll_estimate(df, "k").collect()[0]
    assert row.exact_distinct == 50


# -- Count-Min ----------------------------------------------------------------

from git_prov_spark.corpus.hashing import MERSENNE_P, MINHASH_PERMS  # noqa: E402
from git_prov_spark.corpus.sketches import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_counters,
    cms_estimates,
    merge_counters,
)


def _py_cms(values, d=CMS_D, w=CMS_W):
    cells = {}
    for v in values:
        if v is None:
            continue
        h = py_h64(str(v)) % MERSENNE_P
        for i in range(d):
            a, b = MINHASH_PERMS[i]
            idx = ((a * h + b) % MERSENNE_P) % w
            cells[(i, idx)] = cells.get((i, idx), 0) + 1
    return cells


def _py_cms_est(values, v, cells, d=CMS_D, w=CMS_W):
    h = py_h64(str(v)) % MERSENNE_P
    return min(
        cells[(i, ((MINHASH_PERMS[i][0] * h + MINHASH_PERMS[i][1])
                   % MERSENNE_P) % w)]
        for i in range(d))


def _skewed(spark, n=4000):
    # Zipf-ish: value = floor(sqrt(id)) → small values very frequent
    return spark.range(n).selectExpr(
        "CAST(floor(sqrt(CAST(id AS DOUBLE))) AS BIGINT) AS k")


def test_cms_counters_match_python(spark):
    import math
    vals = [int(math.floor(math.sqrt(float(i)))) for i in range(4000)]
    got = {(r.hrow, r.idx): r.cnt
           for r in cms_counters(_skewed(spark), "k").collect()}
    assert got == _py_cms(vals)


def test_cms_never_undercounts_and_tops_match(spark):
    import math
    vals = [int(math.floor(math.sqrt(float(i)))) for i in range(4000)]
    cells = _py_cms(vals)
    rows = cms_estimates(_skewed(spark), "k", k=20).collect()
    exact = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    for r in rows:
        assert r.est_cnt >= r.exact_cnt          # conservative
        assert r.overcount == r.est_cnt - r.exact_cnt
        assert r.exact_cnt == exact[r.value]
        assert r.est_cnt == _py_cms_est(vals, r.value, cells)
    # the true heaviest value (63: ids 3969..3999 plus sqrt band) is present
    assert rows[0].est_cnt == max(r.est_cnt for r in rows)


def test_cms_merge_is_sum(spark):
    a, b = _skewed(spark, 1500), _skewed(spark, 2500)
    merged = {(r.hrow, r.idx): r.cnt for r in merge_counters(
        cms_counters(a, "k"), cms_counters(b, "k")).collect()}
    union = {(r.hrow, r.idx): r.cnt
             for r in cms_counters(a.unionByName(b), "k").collect()}
    assert merged == union


def test_cms_partitioning_invariant(spark):
    df = _skewed(spark)
    x = sorted(map(tuple, cms_estimates(df, "k", k=30).collect()))
    y = sorted(map(tuple, cms_estimates(df.repartition(11), "k",
                                        k=30).collect()))
    assert x == y


# ---------------------------------------------------------------------------
# Bloom filter


def _py_bloom_pos(v, m=16384, k=4):
    from git_prov_spark.corpus.hashing import MERSENNE_P, MINHASH_PERMS

    h = py_h64(str(v)) % MERSENNE_P
    return [((MINHASH_PERMS[i][0] * h + MINHASH_PERMS[i][1]) % MERSENNE_P) % m
            for i in range(k)]


def _py_bloom_words(values, m=16384, k=4):
    words = {}
    for v in values:
        if v is None:
            continue
        for pos in _py_bloom_pos(v, m, k):
            w, b = pos // 64, pos % 64
            bits = words.get(w, 0) | (1 << b)
            # Spark bit_or is signed 64-bit — wrap bit 63
            words[w] = bits - (1 << 64) if bits >= (1 << 63) else bits
    return words


def test_bloom_bits_match_python(spark):
    from git_prov_spark.corpus.sketches import bloom_bits

    vals = list(range(0, 5000, 5))
    got = {r.word_idx: r.bits
           for r in bloom_bits(_ids(spark, 1000, 5), "k").collect()}
    assert got == _py_bloom_words(vals)


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from git_prov_spark.corpus.sketches import bloom_bits, bloom_contains

    inserted = _ids(spark, 2000)
    bloom = bloom_bits(inserted, "k")
    # every inserted key must hit
    hits = {r.value: r.hit
            for r in bloom_contains(bloom, inserted, "k").collect()}
    assert all(hits.values()) and len(hits) == 2000
    # disjoint probes: measured FPR must be below 4x the analytic bound
    probes = spark.range(10_000_000, 10_002_000).selectExpr("id AS k")
    miss = [r.hit for r in bloom_contains(bloom, probes, "k").collect()]
    fp = sum(miss)
    # m=16384, k=4, n=2000 -> (1-exp(-kn/m))^k ~ 0.023
    assert fp / len(miss) < 0.10


def test_bloom_merge_is_union(spark):
    from git_prov_spark.corpus.sketches import bloom_bits, merge_blooms

    a, b = _ids(spark, 800), _ids(spark, 1500, 3)
    merged = {(r.word_idx, r.bits) for r in merge_blooms(
        bloom_bits(a, "k"), bloom_bits(b, "k")).collect()}
    union = {(r.word_idx, r.bits)
             for r in bloom_bits(a.unionByName(b), "k").collect()}
    assert merged == union


def test_bloom_partitioning_invariant(spark):
    from git_prov_spark.corpus.sketches import bloom_bits

    df = _ids(spark, 3000, 7)
    x = sorted(map(tuple, bloom_bits(df, "k").collect()))
    y = sorted(map(tuple, bloom_bits(df.repartition(13), "k").collect()))
    assert x == y


# ---------------------------------------------------------------------------
# Log2 histogram


def _py_hist(values):
    cells = {}
    for v in values:
        if v is None or v < 0:
            continue
        b = (v + 1).bit_length() - 1
        cells[b] = cells.get(b, 0) + 1
    return cells


def test_hist_matches_python_with_bounds(spark):
    from git_prov_spark.corpus.sketches import hist_log2

    vals = [0, 1, 2, 3, 7, 8, 100, 1000, 1023, 1024, 65535]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = hist_log2(df, "x").collect()
    assert {r.bucket: r.cnt for r in rows} == _py_hist(vals)
    for r in rows:
        assert r.lo == (1 << r.bucket) - 1
        assert r.hi == (1 << (r.bucket + 1)) - 2
        assert all(r.lo <= v <= r.hi
                   for v in vals if (v + 1).bit_length() - 1 == r.bucket)


def test_hist_merge_is_sum_and_negative_null_dropped(spark):
    from git_prov_spark.corpus.sketches import hist_log2, merge_hists

    a = spark.createDataFrame([(v,) for v in [1, 5, None, -3]], "x long")
    b = spark.createDataFrame([(v,) for v in [5, 500]], "x long")
    merged = {(r.bucket, r.cnt) for r in merge_hists(
        hist_log2(a, "x"), hist_log2(b, "x")).collect()}
    union = {(r.bucket, r.cnt)
             for r in hist_log2(a.unionByName(b), "x").collect()}
    assert merged == union
    assert sum(c for _, c in union) == 4  # null and negative dropped


def test_hist_quantiles_readout(spark):
    from git_prov_spark.corpus.sketches import hist_quantiles

    # 100 values: 50 small (bucket 1: v=2), 40 mid (bucket 6: v=100),
    # 10 large (bucket 13: v=10000)
    vals = [2] * 50 + [100] * 40 + [10000] * 10
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    r = hist_quantiles(df, "x").collect()[0]
    assert r.n_total == 100
    assert r.p50_bucket == 1 and r.p50_hi == (1 << 2) - 2
    assert r.p90_bucket == 6 and r.p90_hi == (1 << 7) - 2
    assert r.p99_bucket == 13 and r.p99_hi == (1 << 14) - 2
    # the readout is rank-based (smallest bucket whose cumulative count
    # reaches p%), so each p-th smallest value is bounded by p{p}_hi
    s = sorted(vals)
    assert s[49] <= r.p50_hi and s[89] <= r.p90_hi and s[98] <= r.p99_hi


def test_hist_partitioning_invariant(spark):
    from git_prov_spark.corpus.sketches import hist_log2

    df = _ids(spark, 4000, 3)
    x = sorted(map(tuple, hist_log2(df, "k").collect()))
    y = sorted(map(tuple, hist_log2(df.repartition(9), "k").collect()))
    assert x == y


# ---------------------------------------------------------------------------
# grouped HLL


def test_hll_by_group_slices_match_per_group_build(spark):
    from git_prov_spark.corpus.sketches import hll_by_group, hll_registers

    df = spark.createDataFrame(
        [(i % 3, i * 7) for i in range(900)], "g int, k long")
    grouped = hll_by_group(df, "g", "k")
    for g in range(3):
        slice_regs = sorted(
            (r.bucket, r.rho)
            for r in grouped.where(F.col("g") == g).select(
                "bucket", "rho").collect())
        solo = sorted(map(tuple, hll_registers(
            df.where(F.col("g") == g), "k").collect()))
        assert slice_regs == solo


def test_hll_by_group_merges_to_global(spark):
    from git_prov_spark.corpus.sketches import (
        hll_by_group,
        hll_registers,
        merge_registers,
    )

    df = spark.createDataFrame(
        [(i % 4, i * 3) for i in range(1200)], "g int, k long")
    merged = sorted(map(tuple, merge_registers(
        hll_by_group(df, "g", "k").drop("g")).collect()))
    direct = sorted(map(tuple, hll_registers(df, "k").collect()))
    assert merged == direct


def test_hist_by_group_slices_and_rollup(spark):
    from git_prov_spark.corpus.sketches import (
        hist_by_group,
        hist_log2,
        merge_hists,
    )

    df = spark.createDataFrame(
        [(i % 3, (i * 13) % 2000) for i in range(600)], "g int, x long")
    grouped = hist_by_group(df, "g", "x")
    for g in range(3):
        got = sorted((r.bucket, r.cnt)
                     for r in grouped.where(F.col("g") == g).collect())
        solo = sorted((r.bucket, r.cnt) for r in hist_log2(
            df.where(F.col("g") == g), "x").collect())
        assert got == solo
    rolled = sorted(map(tuple, merge_hists(grouped.drop("g")).collect()))
    direct = sorted((r.bucket, r.cnt)
                    for r in hist_log2(df, "x").collect())
    assert rolled == direct
