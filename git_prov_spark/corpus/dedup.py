"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale notes (the 100 TB story for each):

* **exact** — one hash-aggregate on sha2(text); map-side partial agg, AQE
  coalesces. The only full-corpus shuffle is on the 32-byte digest, never the
  text itself.
* **n-gram Jaccard** — explode distinct shingles → self-join on shingle →
  count. Pair explosion is bounded by per-shingle document frequency; at
  production scale a `HAVING df(shingle) < cap` filter (standard "stopword
  shingle" cut) bounds the join; implemented via `max_df`.
* **MinHash+LSH** — all permutation minima in ONE groupBy (no multi-pass
  scan), banded; candidate pairs come from equi-joins on (band, signature)
  — never an all-pairs product. This is the linear-ish scale path for
  near-dedup. Two configs: compact 16-perm/4×4 (oracle-parity demo) and
  production 128-perm/16×8 (`lsh_candidate_pairs_wide`, S-curve midpoint
  at Jaccard ≈ 0.72).
* **SimHash** — 64-bit signature (64 bit-sums in ONE aggregate), banded
  into 4×16 bits: candidate pairs from an equi-join on any shared band
  (perfect recall for hamming ≤ 3 by pigeonhole), exact hamming verified
  with bit_count(xor). Never an all-pairs product; 64 bits keep unrelated
  docs from colliding at corpus scale (a 16-bit hash has only 65,536
  values — birthday-saturated by any real corpus).
* **embedding cosine** — brute-force all-pairs is the correctness baseline
  (quadratic — small inputs only); the scale path is LSH bucketing in
  `similarity.py` (bucket-join instead of cross-join).

All hashes are the portable md5-based family (`hashing.py`) so the DuckDB
oracle reproduces values bit-for-bit; all thresholds are integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import (
    LSH_BANDS,
    LSH_BANDS_WIDE,
    LSH_ROWS,
    LSH_ROWS_WIDE,
    MERSENNE_P,
    MINHASH_PERMS,
    MINHASH_PERMS_WIDE,
    SIMHASH64_BAND_BITS,
    SIMHASH64_BANDS,
    SIMHASH64_BITS,
    SIMHASH_HI_SUFFIX,
    perm_expr,
    spark_h64,
    spark_hmod,
)
from .text import with_tokens


def exact_dupes(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact dedup groups: (content_sha, canonical_doc_id=min id, n_copies)."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def span_exact_dupes(
    df: DataFrame, id_col: str = "doc_id", text: str = "text",
    min_len: int = 1, sep: str = "\n",
) -> DataFrame:
    """Cross-document exact SPAN dedup (boilerplate/footer detection, the
    span-level companion of whole-doc exact_dupes): split text into spans
    on `sep`, hash each span, return spans occurring in more than one doc:
    (span_sha, n_docs, n_occurrences, canonical_doc_id).

    Scale shape: explode → hash-aggregate on the 64-hex sha (map-side
    partial agg); the text itself never shuffles. min_len drops trivial
    spans ('' between consecutive separators)."""
    spans = df.select(
        F.col(id_col), F.explode(F.split(F.col(text), sep)).alias("span")
    ).where(F.length("span") >= min_len)
    return (
        spans.groupBy(F.sha2(F.col("span"), 256).alias("span_sha"))
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min(id_col).alias("canonical_doc_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def substring_dupes(
    df: DataFrame, id_col: str = "doc_id", text: str = "text",
    window: int = 50, stride: int = 1,
) -> DataFrame:
    """Token-granularity exact-substring dedup — the Lee-et-al-style
    companion pass real LLM pipelines run alongside MinHash (their 50-token
    threshold is the `window` default): slide a `window`-token window over
    each document (`stride` tokens apart), hash the window's exact token
    span, and emit one row per window whose span also occurs in a LOWER-id
    document:

        (doc_id, span_start, match_doc)

    span_start is the 0-based token index; match_doc the smallest other
    document containing the identical span (the canonical copy itself is
    not flagged — Lee et al. keep the first occurrence and drop the rest).

    Scale shape: the window fan-out is MAP-SIDE (sequence + slice over the
    token array, sha2 immediately — the text never shuffles); matching is
    one hash-aggregate keyed on the 64-hex sha producing (sha, min_doc,
    n_docs), then one equi-join of the narrow (doc, pos, sha) rows back on
    the sha. No pair self-join anywhere, so a boilerplate span shared by D
    documents costs D rows, never D² — the same reason the banded LSH path
    survives 100 TB. stride=1 is the paper's exact semantics (rows ≈ token
    count); widen it to trade recall granularity for fan-out at scale."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    toks = with_tokens(df, text).select(F.col(id_col), "tokens")
    starts = (
        f"case when size(tokens) >= {window} then "
        f"sequence(1, size(tokens) - {window} + 1, {stride}) "
        "else cast(array() as array<int>) end"
    )
    wins = (
        toks.select(F.col(id_col), F.col("tokens"),
                    F.explode(F.expr(starts)).alias("start1"))
        .select(
            F.col(id_col),
            (F.col("start1") - 1).cast("long").alias("span_start"),
            F.sha2(
                F.concat_ws(
                    " ", F.expr(f"slice(tokens, start1, {window})")),
                256,
            ).alias("win_sha"),
        )
    )
    canon = (
        wins.groupBy("win_sha")
        .agg(F.min(id_col).alias("match_doc"),
             F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select("win_sha", "match_doc")
    )
    return (
        wins.join(canon, "win_sha")
        .where(F.col(id_col) > F.col("match_doc"))
        .select(F.col(id_col), "span_start", "match_doc")
    )


def shingle_expr(n: int) -> str:
    """Spark SQL expr producing the word n-gram shingle array of a
    `tokens` column — THE shared shingle definition (dedup plus doc- and
    span-level decontamination compile this one string, so the DuckDB
    twins stay in sync with a single site). 1-based element_at keeps the
    expr portable to the oracle's list_extract; the size guard matters
    because sequence(1, 0) in Spark is [1, 0] (descending), not empty."""
    parts = ", ".join(f"element_at(tokens, i + {j})" for j in range(n))
    return (
        f"case when size(tokens) >= {n} then "
        f"transform(sequence(1, size(tokens) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})) "
        f"else cast(array() as array<string>) end"
    )


def shingles(df: DataFrame, n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    expr = shingle_expr(n)
    return (
        with_tokens(df)
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("shingle"))
        .distinct()
    )


# Shingles appearing in more docs than this are dropped before the pair
# self-join (the standard "stopword shingle" cut). A shingle shared by D docs
# contributes D^2 candidate rows — unbounded, the hottest shingle dominates
# the join at corpus scale. The default is far above any real near-dup
# signal's df and far below corpus size; callers wanting the unbounded exact
# semantics must opt in with max_df=None.
DEFAULT_NGRAM_MAX_DF = 100_000


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 4,
    min_pct: int = 60,
    id_col: str = "doc_id",
    max_df: int | None = DEFAULT_NGRAM_MAX_DF,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ min_pct% (integer-exact compare:
    100*|A∩B| >= min_pct*|A∪B|). `max_df` drops shingles appearing in more
    than that many docs (bounds the self-join at scale); None disables the
    cap (exact, unbounded join — small inputs only)."""
    sh = shingles(df, n=n, id_col=id_col)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("df_"))
            .where(F.col("df_") <= max_df).select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_inter"))
    )
    sz1 = sizes.select(F.col(id_col).alias("d1"), F.col("n_shingles").alias("n1"))
    sz2 = sizes.select(F.col(id_col).alias("d2"), F.col("n_shingles").alias("n2"))
    return (
        inter.join(sz1, "d1").join(sz2, "d2")
        .withColumn("n_union", F.col("n1") + F.col("n2") - F.col("n_inter"))
        .where(F.col("n_inter") * 100 >= F.lit(min_pct) * F.col("n_union"))
        .select("d1", "d2", "n_inter", "n_union")
    )


def minhash_signatures(
    df: DataFrame, n: int = 4, id_col: str = "doc_id",
    perms: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """(doc_id, mh0..mhK): one groupBy computing ALL permutation minima over
    the shingle hashes — single shuffle, map-side partial min, regardless of
    how many permutations (16 compact / 128 wide)."""
    perms = MINHASH_PERMS if perms is None else perms
    sh = shingles(df, n=n, id_col=id_col).withColumn(
        "h", F.expr(spark_hmod("shingle"))
    )
    aggs = [
        F.min(F.expr(perm_expr("h", a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(
    df: DataFrame, n: int = 4, id_col: str = "doc_id",
    perms: list[tuple[int, int]] | None = None,
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
) -> DataFrame:
    """(doc_id, band, sig): the banded MinHash signature rows — the
    persisted unit of an LSH dedup INDEX. An ingest pipeline materializes
    this once over the corpus (`lsh_bands(corpus).write.parquet(ix)`),
    then each arriving batch probes it (`lsh_index_matches`) and appends
    its own bands (`.write.mode("append")`) — signatures are computed
    exactly once per document, ever."""
    sigs = minhash_signatures(df, n=n, id_col=id_col, perms=perms)
    band_cols = []
    for band in range(bands):
        cols = [f"mh{band * rows + r}" for r in range(rows)]
        band_cols.append(
            F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))
            .alias(f"band{band}")
        )
    banded = sigs.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"band{i}").alias("sig"))
                for i in range(bands)
            ])
        ).alias("bs"),
    ).select(F.col(id_col), F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


# A band bucket of k docs emits k²/2 candidate pairs: one viral boilerplate
# cluster (100k near-identical docs) would dominate the whole job with 10^10
# pairs from a single (band, sig) key. Buckets above this cap are dropped —
# the degenerate clusters they represent are exact-dedup's job (identical
# docs) or span-dedup's (shared boilerplate), and a genuinely-near pair
# inside a dropped bucket almost always collides again in one of the other
# bands. Far above any honest bucket: at this size the bucket IS the dup
# cluster, not a candidate set.
DEFAULT_LSH_MAX_BUCKET = 10_000


def lsh_candidate_pairs(
    df: DataFrame, n: int = 4, id_col: str = "doc_id",
    perms: list[tuple[int, int]] | None = None,
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
    max_bucket: int | None = DEFAULT_LSH_MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing ≥1 banded signature.
    Output (d1, d2, n_shared_bands) with d1 < d2. Candidates come from
    equi-joins on (band, signature) — never an all-pairs product; buckets
    larger than `max_bucket` are dropped before the join (see the constant
    above — pass None to disable)."""
    stacked = lsh_bands(df, n=n, id_col=id_col, perms=perms, bands=bands, rows=rows)
    stacked = _cap_buckets(stacked, max_bucket)
    a = stacked.select(F.col(id_col).alias("d1"), "band", "sig")
    b = stacked.select(F.col(id_col).alias("d2"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def _cap_buckets(stacked: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop (band, sig) buckets with more than max_bucket members — one
    map-side-combined count + a semi-equi-join, no extra full shuffle of
    the band rows beyond the (band, sig) key they already join on."""
    if max_bucket is None:
        return stacked
    ok = (
        stacked.groupBy("band", "sig")
        .agg(F.count("*").alias("_bsz"))
        .where(F.col("_bsz") <= max_bucket)
        .select("band", "sig")
    )
    return stacked.join(ok, ["band", "sig"])


def lsh_index_matches(
    new_docs: DataFrame, index: DataFrame, n: int = 4, id_col: str = "doc_id",
    perms: list[tuple[int, int]] | None = None,
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
    max_bucket: int | None = DEFAULT_LSH_MAX_BUCKET,
    max_broadcast_keys: int = 5_000_000,
) -> DataFrame:
    """Ingest-time near-dup gate: (new_id, match_id, n_shared_bands) for
    every NEW document colliding with anything already in the band
    `index` (a `lsh_bands` DataFrame, usually read back from parquet) OR
    with another document of the same incoming batch.

    This is the incremental dedup companion to streaming.IncrementalKG:
    per batch it hashes only the new documents and equi-joins their bands
    against the index — cost scales with |batch| and bucket hit sizes,
    never |corpus|: the batch's (band, sig) keys broadcast, so the index
    is map-side FILTERED to hit rows before anything shuffles (no
    O(|corpus|) aggregation per batch). Probed buckets above `max_bucket`
    are then dropped like in lsh_candidate_pairs (a hot bucket would emit
    |batch-hits|×|bucket| matches for what is a degenerate dup cluster);
    unprobed buckets never need counting. New-new collisions surface in
    both directions (each new doc reports its match); self-pairs are
    excluded, so re-ingesting an already-indexed doc_id reports only
    genuine other-doc matches."""
    nb = lsh_bands(new_docs, n=n, id_col=id_col, perms=perms, bands=bands, rows=rows)
    probe_keys = nb.select("band", "sig").distinct()
    # broadcast guard: any sane micro-batch fits (|batch| × bands keys of
    # 2 ints), but a bulk "batch" the size of a corpus would OOM the
    # driver — above the cap, fall back to a shuffled equi-join (same
    # result, costs one exchange of the index's hit candidates). The
    # bound is counted on the RAW batch (cheap scan, ≤ cap+1 rows pulled),
    # since |probe keys| ≤ |batch| × bands.
    batch_cap = max(1, max_broadcast_keys // bands)
    if new_docs.limit(batch_cap + 1).count() <= batch_cap:
        probe_keys = F.broadcast(probe_keys)
    hits = (
        index.unionByName(nb)
        .join(probe_keys, ["band", "sig"])
        # a re-ingested doc_id sits on BOTH sides of the union with
        # identical band rows — without the dedup its partners would
        # double-count n_shared_bands (asymmetric, oracle-divergent)
        .distinct()
    )
    hits = _cap_buckets(hits, max_bucket)
    a = nb.select(F.col(id_col).alias("new_id"), "band", "sig")
    b = hits.select(F.col(id_col).alias("match_id"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("new_id") != F.col("match_id"))
        .groupBy("new_id", "match_id")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def lsh_candidate_pairs_wide(
    df: DataFrame, n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Production-size MinHash-LSH: 128 permutations banded 16×8 — the
    S-curve P = 1-(1-s^8)^16 gives sharp selectivity around Jaccard ≈ 0.72
    (the 16-perm config is kept as the compact oracle-parity demo)."""
    return lsh_candidate_pairs(
        df, n=n, id_col=id_col, perms=MINHASH_PERMS_WIDE,
        bands=LSH_BANDS_WIDE, rows=LSH_ROWS_WIDE,
    )


def near_dup_groups(
    df: DataFrame, n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH candidate pairs → connected
    components → (doc_id, canonical_doc_id = min doc in the cluster).

    This is the composition a dedup pipeline actually ships: pairs alone
    over-count (A~B, B~C gives two pairs but one keep-decision); the
    component's canonical doc is the keeper, everything else drops. Only
    docs appearing in ≥1 candidate pair are emitted (singletons keep
    themselves implicitly). Same min-label-propagation machinery as the
    KG's agent alias merge (operators.connected_components).
    """
    from ..operators import connected_components

    pairs = lsh_candidate_pairs(df, n=n, id_col=id_col)
    comps = connected_components(pairs, a="d1", b="d2")
    return comps.select(
        F.col("node").alias(id_col),
        F.col("component").alias("canonical_doc_id"),
    )


def simhash64_bands(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, b0..b3): 64-bit SimHash split into four 16-bit bands.

    Bit j is set when the majority of the doc's tokens have bit j set in
    their portable hash (sum of ±1 > 0). Bits 0-31 come from the base token
    hash, 32-63 from a suffixed re-hash — both md5-derived so the DuckDB
    oracle reproduces them bit-for-bit. All 64 bit-sums run in ONE groupBy
    (map-side partial agg, single shuffle of the token explosion).
    """
    tok = (
        with_tokens(df)
        .select(F.col(id_col), F.explode("tokens").alias("tok"))
        .withColumn("hlo", F.expr(spark_h64("tok")))
        .withColumn(
            "hhi", F.expr(spark_h64(f"concat(tok, '{SIMHASH_HI_SUFFIX}')"))
        )
    )
    bit_sums = []
    for j in range(SIMHASH64_BITS):
        src, shift = ("hlo", j) if j < 32 else ("hhi", j - 32)
        bit_sums.append(
            F.sum(
                F.when(
                    F.shiftright(F.col(src), shift).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{j}")
        )
    agg = tok.groupBy(id_col).agg(*bit_sums)
    band_cols = []
    for b in range(SIMHASH64_BANDS):
        band = None
        for r in range(SIMHASH64_BAND_BITS):
            j = b * SIMHASH64_BAND_BITS + r
            bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << r)).otherwise(F.lit(0))
            band = bit if band is None else band + bit
        band_cols.append(band.cast("long").alias(f"b{b}"))
    return agg.select(F.col(id_col), *band_cols)


def simhash64_near_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs at SimHash hamming distance ≤ max_hamming.

    Candidates come from an equi-join on any shared 16-bit band — never an
    all-pairs product; with 4 bands, recall is EXACT for hamming ≤ 3
    (pigeonhole: ≤3 flipped bits leave ≥1 band intact). max_hamming > 3
    would need more/wider bands for full recall. Exact hamming is then
    verified with bit_count(xor) over the four bands.
    Output: (d1, d2, hamming), d1 < d2.
    """
    bands = simhash64_bands(df, id_col=id_col)
    stacked = bands.select(
        F.col(id_col),
        F.inline(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"), F.col(f"b{b}").alias("val")
                )
                for b in range(SIMHASH64_BANDS)
            ])
        ),
    )
    a = stacked.select(F.col(id_col).alias("d1"), "band", "val")
    b = stacked.select(F.col(id_col).alias("d2"), "band", "val")
    cands = (
        a.join(b, ["band", "val"])
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    b1 = bands.select(
        F.col(id_col).alias("d1"),
        *[F.col(f"b{i}").alias(f"x{i}") for i in range(SIMHASH64_BANDS)],
    )
    b2 = bands.select(
        F.col(id_col).alias("d2"),
        *[F.col(f"b{i}").alias(f"y{i}") for i in range(SIMHASH64_BANDS)],
    )
    hamming = None
    for i in range(SIMHASH64_BANDS):
        h = F.bit_count(F.col(f"x{i}").bitwiseXOR(F.col(f"y{i}")))
        hamming = h if hamming is None else hamming + h
    return (
        cands.join(b1, "d1")
        .join(b2, "d2")
        .withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def cosine_expr(col_a: str, col_b: str) -> str:
    """Sequential-fold cosine similarity between two array<float> columns,
    computed in double. Same fold order as the DuckDB oracle's list_reduce →
    bit-identical doubles."""
    dot = (
        f"aggregate(zip_with({col_a}, {col_b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = (
        f"aggregate({col_a}, cast(0.0 as double),"
        f" (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )
    nb = (
        f"aggregate({col_b}, cast(0.0 as double),"
        f" (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def embedding_dupe_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force cosine near-dup pairs (correctness baseline; quadratic —
    use similarity.lsh_buckets + in-bucket join at scale)."""
    a = emb.select(F.col(id_col).alias("v1"), F.col("embedding").alias("e1"))
    b = emb.select(F.col(id_col).alias("v2"), F.col("embedding").alias("e2"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .withColumn("cos", F.expr(cosine_expr("e1", "e2")))
        .where(F.col("cos") >= threshold)
        .select("v1", "v2", F.round("cos", 4).alias("cos_r"))
    )


# -- canonical-URL dedup ----------------------------------------------------
#
# Web-crawl pipelines dedup by CANONICAL URL before any content pass: the
# same page is fetched as http/https, with/without www., default ports,
# trailing slashes, fragments, tracking params, and shuffled query order.
# Everything here is pure column expressions (regexp + array built-ins) —
# map-side, codegen, zero shuffle for canonicalization; the dedup itself is
# the exact_dupes shape (ONE hash-aggregate on the canonical string + a
# narrow join back). Reference scope note: the git-prov reference has no
# crawl layer; this is part of the prompt-mandated LLM-pipeline suite.

#: query params that never identify content (stripped during
#: canonicalization; extend per deployment)
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref|referrer)="


def canonical_url(url: F.Column) -> F.Column:
    """Canonical form of a URL column, step by step: lowercase scheme and
    host, strip a leading 'www.', strip default :80/:443 ports, drop the
    fragment, strip trailing path slashes ('' path → '/'), drop tracking
    query params (TRACKING_PARAM_RE) and SORT the survivors (query order
    never identifies content). Scheme-relative inputs and bare hosts
    canonicalize too (missing scheme kept missing — this is a KEY, not a
    fetchable address)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    authority = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    authority = F.regexp_replace(authority, r"^www\.", "")
    authority = F.regexp_replace(authority, r":(80|443)$", "")
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    ))
    canon_q = F.array_join(params, "&")
    return F.concat(
        F.when(scheme == "", F.lit("")).otherwise(F.concat(scheme, F.lit("://"))),
        authority,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def url_dupes(df: DataFrame, id_col: str = "doc_id",
              url: str = "url") -> DataFrame:
    """Docs whose canonical URL already appeared under a lower id:
    (doc_id, canon_url, canonical_id). The exact_dupes scale shape — the
    canonical string is computed map-side, aggregated once (min id per
    canon), and joined back on the canon key; raw URLs never shuffle
    beyond their canonical form."""
    canon = df.select(
        F.col(id_col), canonical_url(F.col(url)).alias("canon_url")
    )
    first = canon.groupBy("canon_url").agg(F.min(id_col).alias("canonical_id"))
    return (
        canon.join(first, "canon_url")
        .where(F.col(id_col) > F.col("canonical_id"))
        .select(id_col, "canon_url", "canonical_id")
    )


def containment_pairs(
    df: DataFrame,
    n: int = 4,
    min_pct: int = 80,
    id_col: str = "doc_id",
    max_df: int | None = DEFAULT_NGRAM_MAX_DF,
) -> DataFrame:
    """(d1, d2, n_inter, n_small, containment_bp) — doc-in-doc detection:
    containment = |A∩B| / min(|A|, |B|) over distinct n-gram shingles,
    kept when ≥ min_pct%. The subset case resemblance misses: a doc
    quoted whole inside a 10× larger one has Jaccard ≤ ~10% but
    containment 100% — the signal Dolma/RefinedWeb-style pipelines gate
    on alongside MinHash. Integer-exact compare (100·inter ≥ pct·min)
    and basis-point readout (exact long div).

    Scale shape is ngram_jaccard_pairs' exactly: candidate pairs from
    the shingle equi-join with the max_df hot-shingle cap bounding the
    per-shingle fan-out; sizes join back narrow. The LSH scale twin
    stands upstream (band join proposes, containment disposes)."""
    sh = shingles(df, n=n, id_col=id_col)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle").agg(F.count("*").alias("df_"))
            .where(F.col("df_") <= max_df).select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("d1"), "shingle")
    b = sh.select(F.col(id_col).alias("d2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_inter"))
    )
    sz1 = sizes.select(F.col(id_col).alias("d1"),
                       F.col("n_shingles").alias("n1"))
    sz2 = sizes.select(F.col(id_col).alias("d2"),
                       F.col("n_shingles").alias("n2"))
    return (
        inter.join(sz1, "d1").join(sz2, "d2")
        .withColumn("n_small", F.least("n1", "n2"))
        .where(F.col("n_inter") * 100 >= F.lit(min_pct) * F.col("n_small"))
        .select(
            "d1", "d2", "n_inter",
            F.col("n_small").cast("long").alias("n_small"),
            F.expr("(n_inter * 10000) div n_small").cast("long")
            .alias("containment_bp"),
        )
    )


def editdist_verify(
    df: DataFrame,
    max_dist: int = 20,
    cap: int = 200,
    n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(d1, d2, dist, is_dup) — character-level verification of LSH
    candidate pairs: levenshtein over length-capped text prefixes
    (edit distance is O(len²) per pair — the cap bounds it; real fuzzy
    matchers verify on a prefix or a sketch for the same reason).
    Propose-then-verify: the LSH banding proposes O(collisions) pairs,
    the edit distance disposes — never an all-pairs product; the texts
    join back onto the narrow pair relation by id, so full documents
    ride exactly two narrow joins. Spark's levenshtein and DuckDB's
    agree (unit-cost Wagner-Fischer), keeping the distance hash-exact."""
    cands = lsh_candidate_pairs(df, n=n, id_col=id_col)
    txt = df.select(F.col(id_col),
                    F.expr(f"left(coalesce(text, ''), {cap})").alias("_t"))
    return (
        cands
        .join(txt.select(F.col(id_col).alias("d1"),
                         F.col("_t").alias("_t1")), "d1")
        .join(txt.select(F.col(id_col).alias("d2"),
                         F.col("_t").alias("_t2")), "d2")
        .select(
            "d1", "d2",
            F.levenshtein("_t1", "_t2").cast("long").alias("dist"),
        )
        .withColumn("is_dup", F.col("dist") <= max_dist)
    )


def near_dup_keep_best(
    df: DataFrame, n: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id, keep) — near-dup clusters with the keeper
    chosen by QUALITY rather than by id: within each component the
    longest document wins (n_chars of the normalized text; ties by
    smaller id). The policy real curation ships — when a scrape and its
    truncated mirror collide, keep the complete one, not whichever
    crawled first. cluster_id stays the component minimum (stable
    naming); `keep` marks the winner.

    Scale: near_dup_groups does the heavy lifting (LSH bands →
    components over candidate pairs only); this adds one broadcast-size
    join of cluster members against their integer lengths and one
    window bounded by cluster size — cluster cardinality is tiny next
    to the corpus, so the added cost is O(|clustered docs|)."""
    from pyspark.sql import Window

    from .text import norm_text

    groups = near_dup_groups(df, n=n, id_col=id_col)
    lens = df.select(F.col(id_col),
                     F.length(norm_text()).cast("long").alias("n_chars"))
    j = groups.join(lens, id_col)
    w = Window.partitionBy("canonical_doc_id").orderBy(
        F.desc("n_chars"), F.asc(id_col))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .select(F.col(id_col),
                F.col("canonical_doc_id").alias("cluster_id"),
                (F.col("_rk") == 1).alias("keep"))
    )
