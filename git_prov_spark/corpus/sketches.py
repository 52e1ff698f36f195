"""Deterministic HyperLogLog distinct-count sketches (Flajolet et al.
2007) — the mergeable counting structure a 100 TB pipeline uses where an
exact COUNT(DISTINCT) would shuffle the full key set: per-source
cardinality dashboards, dedup-rate monitoring across ingestion days,
join-cardinality estimation before planning.

Why hand-rolled instead of `approx_count_distinct`: Spark's HLL++ is
neither cross-engine reproducible nor exposed as a mergeable register
table. This one is BOTH — the hash is the repo's portable 60-bit md5
hash (hashing.spark_h64 / duck_h64 / py_h64), every register is exact
integer arithmetic (leading-zero rank via the length(bin(x)) trick —
curate.flog2's — never float log), and the estimate is one sorted left
fold of power-of-two reciprocals (exact doubles), so Spark, DuckDB, and
the pure-Python reference produce bit-identical registers AND estimate.

Scale (100 TB): the register build is ONE hash-aggregate whose map-side
partials collapse to ≤2^p rows per partition before the shuffle — the
reduce side sees at most (n_partitions × 2^p) narrow (int, int) rows
regardless of corpus size. Sketches MERGE by bucket-wise max (union
semantics), so per-day / per-source register tables roll up without
touching raw data — `merge_registers` is that one aggregate. The
estimate step folds ≤2^p rows on the driver side of a collect_list —
bounded by the sketch width, never by the data.

No bias correction / linear-counting switch is applied to `raw_est`:
both corrections need ln(), whose last ulp differs between libm and the
JVM — the gate demands bit-exact doubles. The register table carries
everything needed to apply any estimator offline; `n_zero` is provided
so callers can see when they are in the linear-counting regime.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import spark_h64

HLL_P = 8                     # 2^8 = 256 registers (±6.5% std error)
HLL_HASH_BITS = 60            # spark_h64 yields a 60-bit hash


def _alpha(m: int) -> float:
    # the standard HLL alpha_m constant; embedded via repr() into both
    # engines' plans so the doubles agree bit-for-bit
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """(bucket, rho): the sketch itself. bucket = top p hash bits; rho =
    1 + leading-zero count of the remaining bits (integer-exact via
    length(bin(w))). Buckets no value hashed into are absent (rho 0)."""
    vbits = HLL_HASH_BITS - p
    h = spark_h64(f"cast({col} as string)")
    w = f"({h} & {(1 << vbits) - 1})"
    rho = (f"CASE WHEN {w} = 0 THEN {vbits + 1} "
           f"ELSE {vbits} - (length(bin({w})) - 1) END")
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.expr(f"cast(shiftright({h}, {vbits}) as int)").alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("bucket").agg(F.max("rho").cast("int").alias("rho"))
    )


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Union semantics: bucket-wise max over any number of register
    tables — how per-day / per-source sketches roll up without rescans."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").cast("int").alias("rho"))


def hll_estimate(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """One row: (m, n_present, n_zero, raw_est, exact_distinct,
    err_bp). raw_est is the uncorrected HLL estimate
    alpha_m · m² / (Σ 2^-rho + n_zero); the Σ folds in bucket order
    (sorted fold — double addition is not associative) and every 2^-rho
    is an exact power-of-two reciprocal, so the double is bit-identical
    across engines and partitionings. exact_distinct (one extra
    aggregate — fine at gate scale, optional at 100 TB) and the
    floor()ed basis-point error make the row self-evaluating."""
    m = 1 << p
    regs = hll_registers(df, col, p)
    alpha = _alpha(m)
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        # SQL-expr form: pyspark's F.shiftleft only takes a literal shift
        # width, but the SQL function shifts by a column just fine
        F.expr(
            "aggregate(sort_array(collect_list(struct(bucket, rho))), "
            "cast(0.0 as double), (acc, x) -> acc + cast(1.0 as double) "
            "/ cast(shiftleft(cast(1 as bigint), x.rho) as double))"
        ).alias("s_present"),
    )
    exact = df.where(F.col(col).isNotNull()).agg(
        F.count_distinct(F.col(col)).alias("exact_distinct"))
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(m).cast("long").alias("m"),
            "n_present",
            (F.lit(m) - F.col("n_present")).cast("long").alias("n_zero"),
            (F.lit(alpha) * F.lit(float(m * m))
             / (F.col("s_present")
                + (F.lit(m) - F.col("n_present")).cast("double")))
            .alias("raw_est"),
            F.col("exact_distinct").cast("long"),
        )
        .withColumn(
            "err_bp",
            F.floor(
                F.abs(F.col("raw_est") - F.col("exact_distinct"))
                * F.lit(10000.0) / F.col("exact_distinct")
            ).cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): the frequency twin of
# the HLL cardinality sketch — heavy-hitter monitoring over 100 TB token
# streams in d×w integers. Counters are mergeable by cell-wise ADDITION
# (per-day rollup, like HLL's bucket-wise max); point estimates are the
# min over d rows and NEVER undercount (conservative property, tested).
# Same determinism discipline: portable md5 hash + the MinHash (a,b)
# permutation constants, integer arithmetic end to end.

CMS_D = 4
CMS_W = 256


def _cms_idx_exprs(col: str, d: int, w: int) -> list[str]:
    from .hashing import MINHASH_PERMS, perm_expr, spark_hmod

    h = spark_hmod(f"cast({col} as string)")
    return [
        f"cast(({perm_expr(h, *MINHASH_PERMS[i])}) % {w} as int)"
        for i in range(d)
    ]


def cms_counters(df: DataFrame, col: str,
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(hrow, idx, cnt): the d×w counter table. ONE pass — the d-way
    explode is map-side and the hash-aggregate's partials collapse to
    ≤d·w rows per partition before the shuffle, so the reduce side is
    sketch-sized regardless of corpus size."""
    structs = ", ".join(
        f"struct({i} as hrow, {e} as idx)"
        for i, e in enumerate(_cms_idx_exprs(col, d, w)))
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.expr(f"array({structs})")).alias("cell"))
        .select("cell.hrow", "cell.idx")
        .groupBy("hrow", "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def merge_counters(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — CMS union semantics."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("hrow", "idx").agg(F.sum("cnt").alias("cnt"))


def cms_estimates(df: DataFrame, col: str, k: int = 50,
                  d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(value, exact_cnt, est_cnt, overcount) for the top-k values by
    (est_cnt DESC, value) — the heavy-hitter readout, with the exact
    count alongside so the gate also checks the never-undercount
    property and the collision overcounts. The counter table broadcasts
    (≤d·w rows); the per-value probe is map-side hashing + one
    broadcast join + a sketch-row min."""
    counters = cms_counters(df, col, d, w)
    exact = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    structs = ", ".join(
        f"struct({i} as hrow, {e} as idx)"
        for i, e in enumerate(_cms_idx_exprs("value", d, w)))
    cells = exact.select(
        "value", "exact_cnt",
        F.explode(F.expr(f"array({structs})")).alias("cell"),
    ).select("value", "exact_cnt", "cell.hrow", "cell.idx")
    return (
        cells.join(F.broadcast(counters), ["hrow", "idx"])
        .groupBy("value", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "value", "exact_cnt", "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("est_cnt").desc(), "value")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): the membership sketch completing the family
# (HLL = cardinality, CMS = frequency, Bloom = membership) — the "have we
# already ingested this key / url / sha" structure a 100 TB pipeline
# keeps per shard. Bits pack 64-per-row into BIGINT words; filters merge
# by word-wise bit OR; everything is integer, so cross-engine hash-exact.

BLOOM_M = 1 << 14   # 16,384 bits = 256 BIGINT words
BLOOM_K = 4


def _bloom_pos_exprs(col: str, m: int, k: int) -> list[str]:
    from .hashing import MINHASH_PERMS, perm_expr, spark_hmod

    h = spark_hmod(f"cast({col} as string)")
    return [f"(({perm_expr(h, *MINHASH_PERMS[i])}) % {m})" for i in range(k)]


def bloom_bits(df: DataFrame, col: str,
               m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """(word_idx, bits): the filter as ≤m/64 packed BIGINT words. ONE
    pass — k map-side positions per row, bit_or partials collapse to
    ≤m/64 words per partition before the shuffle."""
    arr = ", ".join(_bloom_pos_exprs(col, m, k))
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.expr(f"array({arr})")).alias("pos"))
        .select(
            F.expr("cast(pos div 64 as int)").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
            .alias("mask"),
        )
        .groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))
    )


def merge_blooms(*filters: DataFrame) -> DataFrame:
    """Word-wise OR — Bloom union semantics."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(bloom: DataFrame, probes: DataFrame, col: str,
                   m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """(value, hit): probe each value against the filter — hit iff all k
    bits are set. The filter broadcasts (≤m/64 rows); probing is
    map-side hashing + one broadcast join + a per-value count."""
    arr = ", ".join(_bloom_pos_exprs("value", m, k))
    cells = (
        probes.where(F.col(col).isNotNull())
        .select(F.col(col).alias("value"))
        .distinct()
        .select("value", F.explode(F.expr(f"array({arr})")).alias("pos"))
        .select(
            "value",
            F.expr("cast(pos div 64 as int)").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
            .alias("mask"),
        )
    )
    return (
        cells.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "value",
            F.expr("(coalesce(bits, cast(0 as bigint)) & mask) = mask")
            .alias("set_"),
        )
        .groupBy("value")
        .agg((F.count(F.lit(1)) == F.sum(F.when(F.col("set_"), 1)
                                         .otherwise(0))).alias("hit"))
    )


def bloom_fpr(df: DataFrame, col: str, probes: DataFrame,
              m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """One row: (m, k, n_inserted, n_probes, n_false_pos, fpr_bp) — build
    the filter from `df`, probe with `probes` (caller guarantees
    disjointness), and report the measured false-positive rate in
    integer basis points. Self-evaluating and all-integer."""
    bloom = bloom_bits(df, col, m, k)
    hits = bloom_contains(bloom, probes, col, m, k)
    n_ins = df.where(F.col(col).isNotNull()).select(col).distinct().count()
    return hits.agg(
        F.lit(m).cast("long").alias("m"),
        F.lit(k).cast("long").alias("k"),
        F.lit(n_ins).cast("long").alias("n_inserted"),
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long")
        .alias("n_false_pos"),
    ).withColumn(
        # integer div — Spark casts double→long by truncation but DuckDB
        # CAST rounds, so a float division here would diverge at .5
        "fpr_bp",
        F.expr("(n_false_pos * 10000) div n_probes").cast("long"),
    )


# ---------------------------------------------------------------------------
# Log2-bucket histogram: the quantile/distribution sketch beside HLL
# (cardinality), CMS (frequency), and Bloom (membership). Buckets are
# flog2(x+1) — pure integer, so cells are hash-exact across engines and
# partitionings; sketches merge by cell-wise SUM; quantile readout folds
# the ≤64-cell table, giving p50/p90/p99 value bounds within one power
# of two (the resolution a 100 TB length/size distribution report needs,
# with none of approx_percentile's nondeterminism).


def hist_log2(df: DataFrame, col: str) -> DataFrame:
    """(bucket, cnt, lo, hi): bucket = flog2(x+1) over the non-negative
    values of ``col``; [lo, hi] are the bucket's inclusive value bounds.
    ONE hash-aggregate whose map-side partials collapse to ≤64 (long,
    long) cells per partition — distribution profiling at any corpus
    size without shuffling values."""
    from .curate import flog2

    return (
        df.where(F.col(col).isNotNull() & (F.col(col) >= 0))
        .select(flog2(F.col(col) + 1).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket", "cnt",
            (F.expr("shiftleft(cast(1 as bigint), cast(bucket as int))")
             - 1).alias("lo"),
            (F.expr("shiftleft(cast(1 as bigint), cast(bucket as int) + 1)")
             - 2).alias("hi"),
        )
    )


def merge_hists(*hists: DataFrame) -> DataFrame:
    """Cell-wise SUM — per-day/per-source rollup without rescans."""
    out = hists[0].select("bucket", "cnt")
    for h in hists[1:]:
        out = out.unionByName(h.select("bucket", "cnt"))
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(df: DataFrame, col: str,
                   ps: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """One row: (n_total, p{p}_bucket, p{p}_hi ...) — for each requested
    percentile, the first bucket whose cumulative count reaches p% and
    that bucket's inclusive upper value bound. The readout is a sorted
    fold over the ≤64-cell sketch (the HLL-estimate precedent: a
    literal-keyed hash-aggregate collects the cells — never an Exchange
    SinglePartition window), integer end to end."""
    hist = hist_log2(df, col)
    row = (
        hist.groupBy(F.lit(1).alias("_k"))
        .agg(
            F.sort_array(F.collect_list(F.struct("bucket", "cnt")))
            .alias("_cells"),
            F.sum("cnt").alias("n_total"),
        )
        .drop("_k")
    )
    cols = [F.col("n_total").cast("long").alias("n_total")]
    for p in ps:
        fold = (
            "aggregate(_cells, "
            "struct(cast(0 as bigint) AS cum, cast(-1 as bigint) AS b), "
            "(acc, x) -> struct(acc.cum + x.cnt, "
            f"IF(acc.b = -1 AND (acc.cum + x.cnt) * 100 >= {p} * n_total, "
            "x.bucket, acc.b)), acc -> acc.b)"
        )
        cols.append(F.expr(fold).cast("long").alias(f"p{p}_bucket"))
        cols.append(
            F.expr(f"shiftleft(cast(1 as bigint), cast(({fold}) as int) + 1)"
                   " - 2").cast("long").alias(f"p{p}_hi"))
    return row.select(*cols)


def hll_by_group(df: DataFrame, group: str, col: str,
                 p: int = HLL_P) -> DataFrame:
    """(group, bucket, rho) — one HLL register table PER GROUP in a
    single hash-aggregate on (group, bucket): the per-source/per-day
    cardinality dashboard shape. Partials collapse to ≤groups·2^p rows
    per partition; any slice of groups merges into a coarser sketch
    with merge_registers (drop the group column first) — the rollup
    lattice (per-day → per-week → global) costs one sketch-sized
    aggregate per level, never a rescan."""
    vbits = HLL_HASH_BITS - p
    h = spark_h64(f"cast({col} as string)")
    w = f"({h} & {(1 << vbits) - 1})"
    rho = (f"CASE WHEN {w} = 0 THEN {vbits + 1} "
           f"ELSE {vbits} - (length(bin({w})) - 1) END")
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(group).alias("grp"),
            F.expr(f"cast(shiftright({h}, {vbits}) as int)").alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("grp", "bucket").agg(F.max("rho").cast("int").alias("rho"))
        .select(F.col("grp").alias(group), "bucket", "rho")
    )


def hist_by_group(df: DataFrame, group: str, col: str) -> DataFrame:
    """(group, bucket, cnt) — one log2 histogram PER GROUP in a single
    (group, bucket) hash-aggregate: the per-source length-distribution
    dashboard. Slices merge into coarser sketches via merge_hists
    (drop the group column) — the same rollup lattice as
    hll_by_group."""
    from .curate import flog2

    return (
        df.where(F.col(col).isNotNull() & (F.col(col) >= 0))
        .select(F.col(group).alias("grp"),
                flog2(F.col(col) + 1).alias("bucket"))
        .groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("grp").alias(group), "bucket", "cnt")
    )
