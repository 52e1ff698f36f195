"""Text-analysis operators over a document corpus (documents table).

Language-ID (stopword n-gram heuristic), quality signals, token counting,
and document fingerprinting (polynomial rolling hash) — all with Spark
built-ins (whole-stage codegen; zero Python in the hot path). Thresholds use
integer arithmetic (``n_hits * 20 >= n_tokens`` instead of ``ratio >= 0.05``)
so the DuckDB oracle comparison is exact, never float-boundary-dependent.

At 100 TB these are narrow map-side transforms: no shuffle, no UDF — they
scan, project, and keep whatever filter the caller adds pushed to parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MERSENNE_P, spark_hmod

# fixed English stopword sample for the stopword-ratio language heuristic
EN_STOPWORDS = [
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for",
    "with", "as", "at", "by", "it", "be", "or", "are", "was", "this",
]

PUNCT_REGEX = r"[^.,;:!?'\"()\-]"  # negated: strip non-punct, count remainder

FP_BASE = 1_000_003  # polynomial rolling-hash base


def norm_text(text: str = "text") -> Column:
    """NULL text normalized to '' — every operator here treats a null
    document as empty, matching curate.training_manifest's gates (without
    this, non-ANSI size(split(NULL)) yields -1 and degenerate counts)."""
    return F.coalesce(F.col(text), F.lit(""))


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokenization; empty/blank/NULL text → empty array (not [''])."""
    t = norm_text(text)
    return F.when(F.trim(t) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(t), r"\s+")
    )


def with_tokens(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens_col(text))


def _n_stop() -> Column:
    return F.size(F.filter(F.col("tokens"), lambda t: t.isin(*EN_STOPWORDS)))


def vocabulary(df: DataFrame, id_col: str = "doc_id", text: str = "text",
               top_k: int | None = None, min_total: int = 1) -> DataFrame:
    """(token, n_total, n_docs) global term statistics — the corpus-wide
    counting pass tokenizer/BPE training and stopword mining start from.

    Scale: the explode is map-side; counting is ONE hash-aggregate whose
    map-side partials collapse hard (token cardinality ≪ token
    occurrences — Zipf); ``top_k`` lowers to TakeOrderedAndProject
    (per-partition heaps, K rows to the driver merge — never a full
    sort). n_docs rides the same aggregate as a distinct-count expand.
    Ties on n_total break by token, so top-K is deterministic."""
    tok = with_tokens(df, text).select(
        F.col(id_col), F.explode("tokens").alias("token"))
    out = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct(F.col(id_col)).alias("n_docs"))
    if min_total > 1:
        out = out.where(F.col("n_total") >= min_total)
    if top_k is not None:
        out = out.orderBy(F.col("n_total").desc(), "token").limit(top_k)
    return out


def token_counts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars_actual) — whitespace + regex tokenizer."""
    return with_tokens(df).select(
        F.col(id_col),
        F.size("tokens").alias("n_tokens"),
        F.length(norm_text()).alias("n_chars_actual"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Stopword-ratio language heuristic: ≥5% English stopwords → 'en'.

    Integer-exact threshold: 20*hits >= n_tokens (n_tokens > 0).
    """
    toks = with_tokens(df)
    hits = _n_stop()
    return toks.select(
        F.col(id_col),
        F.size("tokens").alias("n_tokens"),
        hits.alias("n_stop_hits"),
        F.when(
            (F.size("tokens") > 0) & (hits * 20 >= F.size("tokens")), F.lit("en")
        ).otherwise(F.lit("other")).alias("lang_pred"),
    )


def quality_signals(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / mean-token-length quality signals."""
    toks = with_tokens(df)
    n_tokens = F.size("tokens")
    n_punct = F.length(F.regexp_replace(norm_text(), PUNCT_REGEX, ""))
    sum_tok_len = F.aggregate(
        F.col("tokens"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return toks.select(
        F.col(id_col),
        F.length(norm_text()).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        _n_stop().alias("n_stop"),
        n_punct.alias("n_punct"),
        F.when(n_tokens > 0, F.round(sum_tok_len / n_tokens, 4))
        .otherwise(F.lit(0.0)).alias("avg_token_len"),
    )


# BPE-style pretokenizer: letter runs / digit runs / punctuation runs —
# the shape subword tokenizers pre-split on (contractions split off, digits
# separate from words). Verified to produce IDENTICAL token lists in Spark
# (Java regex) and DuckDB (RE2) across unicode/emoji/NBSP adversarial cases
# (tests/test_driver_contract.py) — no lookarounds, so both engines agree.
BPE_TOKEN_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def bpe_tokens_col(text: str = "text") -> Column:
    return F.expr(
        f"regexp_extract_all(coalesce({text}, ''), r'{BPE_TOKEN_PATTERN}', 0)"
    )


def bpe_token_counts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe_tokens, n_alpha, n_num, n_punct): BPE-ish token
    counting — the subword-budget estimator a training pipeline runs before
    the real tokenizer (which needs its merges table; this regex pre-split
    is the universal prefix of BPE/WordPiece pipelines). Zero shuffle."""
    toks = df.withColumn("_bt", bpe_tokens_col())
    def n_matching(pat: str) -> Column:
        return F.size(F.filter(F.col("_bt"), lambda t: t.rlike(pat)))
    return toks.select(
        F.col(id_col),
        F.size("_bt").cast("long").alias("n_bpe_tokens"),
        n_matching(r"^\p{L}").cast("long").alias("n_alpha"),
        n_matching(r"^\p{N}").cast("long").alias("n_num"),
        n_matching(r"^[^\p{L}\p{N}]").cast("long").alias("n_punct"),
    )


def repetition_signals(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_lines, n_distinct_lines, max_line_freq): duplicate-line
    repetition — the boilerplate/spam quality signal. Expression-only
    (per-doc line counts; no shuffle): max_line_freq is computed with a
    per-distinct-line count fold, quadratic in DISTINCT lines per doc —
    bounded by document size, never by corpus size."""
    lines = F.split(norm_text(), "\n")
    distinct = F.array_distinct(lines)
    max_freq = F.array_max(
        F.transform(distinct, lambda d: F.size(F.filter(lines, lambda x: x == d)))
    )
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(distinct).cast("long").alias("n_distinct_lines"),
        max_freq.cast("long").alias("max_line_freq"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive document fingerprint: left-fold polynomial rolling hash
    of the portable token hashes, mod 2^31-1. Two docs share a fingerprint iff
    their token sequences match (mod collisions)."""
    fold_expr = (
        f"aggregate(tokens, cast(0 as bigint), "
        f"(acc, t) -> (acc * {FP_BASE} + {spark_hmod('t')}) % {MERSENNE_P})"
    )
    return with_tokens(df).select(F.col(id_col), F.expr(fold_expr).alias("fingerprint"))


def chunk_documents(
    df: DataFrame, window: int = 512, overlap: int = 64,
    id_col: str = "doc_id", text: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — fixed token windows with
    overlap, the pretraining sequence-packing precursor.

    Chunk i covers tokens [i*stride, i*stride + window) with
    stride = window - overlap; every start below the doc's token count
    emits a chunk (the tail may be short), zero-token docs emit nothing.
    Map-side only: tokenize → sequence(0, n-1, stride) → posexplode →
    slice — no shuffle, no UDF, stays in whole-stage codegen; the
    downstream shuffle (if any) is the caller's groupBy/repartition on
    chunks, which is size-balanced by construction.
    """
    if not (0 <= overlap < window):
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap
    toks = with_tokens(df, text=text)
    n = F.size("tokens")
    exploded = (
        toks.where(n > 0)
        .select(
            F.col(id_col),
            F.col("tokens"),
            F.posexplode(F.sequence(F.lit(0), n - 1, F.lit(stride)))
            .alias("chunk_idx", "start"),
        )
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("tokens"), F.col("start") + 1, window), " "
        ).alias("chunk_text"),
        F.least(F.lit(window), F.size("tokens") - F.col("start"))
        .cast("long").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame, target_tokens: int = 2048,
    id_col: str = "doc_id", idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """chunks + (bin_id, bin_offset) — greedy cross-document packing of
    chunk_documents output into ≈target_tokens training sequences.

    Semantics: concatenate all chunks in (doc_id, chunk_idx) order and cut
    at target boundaries; a chunk belongs to the bin its FIRST token falls
    into (bin_offset = its start within the bin). Bins are therefore
    deterministic, dense (mean fill → target as chunk << target), and may
    overflow target by at most one chunk — the standard streaming-packing
    approximation; exact next-fit needs a sequential fold.

    The global running token count comes from operators.global_cumsum
    (range partition + prefix offsets), so no single-partition exchange:
    the plan holds at corpus scale, unlike a naive
    sum().over(Window.orderBy(...)).
    """
    from ..operators import global_cumsum

    cum = global_cumsum(chunks, [id_col, idx_col], tok_col, out_col="_cum")
    start = F.col("_cum") - F.col(tok_col)
    return cum.select(
        F.col(id_col), F.col(idx_col), F.col(tok_col),
        F.floor(start / target_tokens).cast("long").alias("bin_id"),
        (start % target_tokens).cast("long").alias("bin_offset"),
    )


# --------------------------------------------------------------------------
# PII scrubbing (regex redaction — the pre-training privacy gate)
# --------------------------------------------------------------------------

# Patterns chosen to be Java-regex / RE2 portable (no lookarounds, no
# backreferences) so the DuckDB oracle matches token-for-token.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_LONGNUM = r"[0-9]{9,}"


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_longnums, scrubbed, scrubbed_sha):
    redact emails → [EMAIL], IPv4s → [IP], then 9+-digit runs → [NUM].

    Counting happens on the progressively scrubbed text (emails counted
    first, then IPs on the email-scrubbed text, then digit runs on the
    IP-scrubbed text) so a digit-heavy email or an IP inside a URL is
    never double-counted. Pure expressions — map-side, zero shuffle, and
    whole-stage-codegen'd like the other text signals."""
    t0 = norm_text(text)
    n_emails = F.size(F.regexp_extract_all(t0, F.lit(PII_EMAIL), F.lit(0)))
    t1 = F.regexp_replace(t0, PII_EMAIL, "[EMAIL]")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(PII_IPV4), F.lit(0)))
    t2 = F.regexp_replace(t1, PII_IPV4, "[IP]")
    n_longnums = F.size(F.regexp_extract_all(t2, F.lit(PII_LONGNUM), F.lit(0)))
    t3 = F.regexp_replace(t2, PII_LONGNUM, "[NUM]")
    return df.select(
        F.col(id_col),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_longnums.cast("long").alias("n_longnums"),
        t3.alias("scrubbed"),
        F.sha2(t3, 256).alias("scrubbed_sha"),
    )


# Gopher-style quality-gate thresholds (integer-exact so the DuckDB twin
# compares bit-for-bit; the published rules use ratios — each is rewritten
# as a cross-multiplied integer inequality)
GATE_MIN_WORDS = 20
GATE_MAX_WORDS = 100_000
GATE_MIN_MEAN_LEN = 4    # 4 <= sum_len / n_tokens  <=>  4*n_tokens <= sum_len
GATE_MAX_MEAN_LEN = 10
GATE_MAX_PUNCT_PCT = 10  # n_punct / n_chars <= 10%  <=>  10*n_punct <= n_chars
GATE_MIN_STOP_HITS = 2


def quality_gate(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, r_wordcount, r_meanlen, r_symbol, r_stopword, r_dupline,
    keep) — a Gopher/C4-style composite quality rule bundle: five
    per-rule booleans plus the conjunction, the filter shape every
    LLM-data pipeline runs before training (Rae et al. 2021 §A1.1 rules
    re-expressed over this engine's signals). One map-side projection —
    every rule is a Spark built-in over the same normalized text, no
    shuffle, no Python; at 100 TB this is a scan that keeps whatever
    pushdown the caller's source filter provides, and `keep` is the
    column downstream curation joins on."""
    toks = with_tokens(df)
    n_tokens = F.size("tokens").cast("long")
    sum_len = F.aggregate(
        F.col("tokens"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_chars = F.length(norm_text()).cast("long")
    n_punct = F.length(F.regexp_replace(norm_text(), PUNCT_REGEX, "")).cast("long")
    n_stop = _n_stop().cast("long")
    lines = F.split(norm_text(), "\n")
    distinct_lines = F.array_distinct(lines)
    max_line_freq = F.array_max(
        F.transform(distinct_lines,
                    lambda d: F.size(F.filter(lines, lambda x: x == d)))
    ).cast("long")
    n_lines = F.size(lines).cast("long")

    r_wordcount = (n_tokens >= GATE_MIN_WORDS) & (n_tokens <= GATE_MAX_WORDS)
    r_meanlen = (n_tokens > 0) & (GATE_MIN_MEAN_LEN * n_tokens <= sum_len) \
        & (sum_len <= GATE_MAX_MEAN_LEN * n_tokens)
    r_symbol = GATE_MAX_PUNCT_PCT * n_punct <= n_chars
    r_stopword = n_stop >= GATE_MIN_STOP_HITS
    # no single line may make up more than half the doc's lines (the
    # duplicate-line boilerplate rule); single-line docs pass vacuously
    r_dupline = (n_lines <= 1) | (max_line_freq * 2 <= n_lines)
    return toks.select(
        F.col(id_col),
        r_wordcount.alias("r_wordcount"),
        r_meanlen.alias("r_meanlen"),
        r_symbol.alias("r_symbol"),
        r_stopword.alias("r_stopword"),
        r_dupline.alias("r_dupline"),
        (r_wordcount & r_meanlen & r_symbol & r_stopword & r_dupline)
        .alias("keep"),
    )


def bigram_stats(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                 top_k: int = 200, min_total: int = 2) -> DataFrame:
    """(pair, n_total, n_docs) — adjacent BPE-pretoken pair statistics:
    the counting step of a BPE merge round (and the collocation table a
    corpus report wants). Pairs are minted map-side with
    transform-over-sequence on the pretoken array (pretokens never
    contain whitespace, so ' ' joins unambiguously), then ONE
    hash-aggregate with map-side partials; min_total prunes the long
    tail before the deterministic (count desc, pair) top-K so the
    ordered limit never sees singleton pairs. At 100 TB the aggregate
    keys are pair strings — bounded by vocabulary², in practice Zipfian,
    and the min_total filter keeps the reduce side narrow."""
    toks = df.withColumn("_bt", bpe_tokens_col(text)).where(F.size("_bt") >= 2)
    pairs = toks.select(
        F.col(id_col),
        F.explode(F.expr(
            "transform(sequence(0, size(_bt) - 2), "
            "i -> concat(_bt[i], ' ', _bt[i + 1]))"
        )).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    if min_total > 1:
        out = out.where(F.col("n_total") >= min_total)
    return out.orderBy(F.col("n_total").desc(), "pair").limit(top_k)


def tfidf_terms(df: DataFrame, id_col: str = "doc_id", text: str = "text",
                k: int = 3) -> DataFrame:
    """(doc_id, token, tf, df_docs, score) — top-k keyword extraction per
    document by integer-quantized TF-IDF.

    IDF is quantized to whole bits — flog2(n_docs // df_docs), computed
    with length(bin(x))-1 (see curate.flog2) — because float log() differs
    in the last ulp between the JVM and libm, and the cross-engine hash
    gate demands bit-exact values. A token appearing in more than half
    the corpus gets 0 bits (score 0): exactly the stopword-suppression
    TF-IDF exists for. score = tf * idf_bits; ties and zero scores rank
    deterministically by token. Docs with < k distinct tokens emit what
    they have; empty docs emit nothing.

    Scale: tf is ONE hash-aggregate over (doc, token) — map-side partials
    collapse repeated tokens before the shuffle; df derives from tf by a
    second aggregate of already-distinct (doc, token) rows (narrow);
    n_docs is a scalar broadcast; the top-k window partitions by doc_id —
    bounded by a single document's vocabulary, never corpus-wide. Text
    never shuffles.
    """
    from pyspark.sql import Window

    from .curate import flog2

    if k < 1:
        raise ValueError("k must be >= 1")
    tf = (
        with_tokens(df, text)
        .select(F.col(id_col), F.explode("tokens").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    # literal-keyed so the final merge never plans Exchange SinglePartition;
    # the 1-row broadcast is declared in tools/plan_audit.py
    n_docs = (df.groupBy(F.lit(1).alias("_k"))
              .agg(F.count(F.lit(1)).alias("_n_docs")).drop("_k"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            # `div` = exact long division — a double `/` would round past
            # 2^53 and break the cross-engine bit-exactness contract
            F.col("tf") * flog2(F.expr("_n_docs div df_docs")))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.asc("token"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(F.col(id_col), "token",
                F.col("tf").cast("long").alias("tf"),
                F.col("df_docs").cast("long").alias("df_docs"),
                F.col("score").cast("long").alias("score"))
    )


# sentinel avg-surprisal for empty documents: larger than any real value
# (max possible bits-per-token is ~62, so 62 * SURPRISAL_FIXED_POINT is the
# true ceiling) — empty docs sort last (most surprising) in both engines
# without NULL-ordering divergence (Spark asc = NULLS FIRST, DuckDB ASC =
# NULLS LAST; a sentinel sidesteps the mismatch entirely).
SURPRISAL_FIXED_POINT = 1_000_000
SURPRISAL_EMPTY = 1 << 40


def surprisal_buckets(df: DataFrame, id_col: str = "doc_id",
                      text: str = "text", n_buckets: int = 3) -> DataFrame:
    """(doc_id, n_tokens, sum_bits, avg_q, bucket) — CCNet-style
    perplexity-proxy quality bucketing: score every document by its mean
    token surprisal under a unigram LM trained on the corpus itself, then
    split the corpus into equal-population buckets (bucket 0 = most
    fluent / lowest perplexity ... n_buckets-1 = tail).

    The LM is integer-quantized: surprisal(token) = flog2(T) - flog2(ct)
    bits (T = total token occurrences, ct = the token's count) ≈ -log2 p
    within one bit — float log() is banned for cross-engine bit-exactness
    (see curate.flog2). A doc's score is the exact long sum of its
    tokens' bits; avg_q = sum_bits * 1e6 // n_tokens is fixed-point
    micro-bits-per-token (integer division — no float ever materializes).
    Empty docs get the SURPRISAL_EMPTY sentinel and land in the tail.

    Bucketing is rank-exact, not percentile-approximate: a global rank
    over (avg_q, doc_id) — computed by the range-partitioned
    global_row_number operator, never a single-partition window — and
    bucket = (rank-1) * n_buckets // N. Deterministic at any parallelism.

    Scale: unigram counts are ONE Zipf-collapsing hash-aggregate; the
    per-token surprisal join shuffles narrow (doc, token) rows on token;
    the per-doc sum regroups by doc_id; the global rank moves P partition
    counts to the driver, never data. Text never shuffles.
    """
    from ..operators import global_row_number
    from .curate import flog2

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    tok = with_tokens(df, text).select(
        F.col(id_col), F.explode("tokens").alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("_ct"))
    # literal-keyed scalar (see tfidf_terms) — also the better degenerate
    # form: an all-empty corpus yields zero rows here, not one null row
    # whose flog2(NULL) would poison every bit score downstream
    total = (counts.groupBy(F.lit(1).alias("_k"))
             .agg(F.sum("_ct").alias("_T")).drop("_k"))
    bits = (
        counts.crossJoin(F.broadcast(total))
        .select("token",
                (flog2(F.col("_T")) - flog2(F.col("_ct"))).alias("_bits"))
    )
    per_doc = (
        tok.join(bits, "token")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum("_bits").alias("sum_bits"))
    )
    scored = (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long")
            .alias("sum_bits"),
        )
        .withColumn(
            "avg_q",
            F.when(F.col("n_tokens") > 0,
                   # exact long division: sum_bits * 1e6 overflows double
                   # precision (2^53) for ~10^9-token docs; `div` does not
                   F.expr(f"(sum_bits * {SURPRISAL_FIXED_POINT})"
                          " div n_tokens"))
            .otherwise(F.lit(SURPRISAL_EMPTY)).cast("long"))
    )
    n_total = df.count()
    if n_total == 0:
        return scored.withColumn("bucket", F.lit(None).cast("int"))
    ranked = global_row_number(scored, ["avg_q", id_col], out_col="_rank")
    return ranked.select(
        id_col, "n_tokens", "sum_bits", "avg_q",
        F.expr(f"cast(((_rank - 1) * {n_buckets}) div {n_total} as int)")
        .alias("bucket"),
    )


def novelty_scores(df: DataFrame, n: int = 4, id_col: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """(doc_id, n_shingles, n_novel, novel_pct) — per-doc n-gram novelty:
    the share of a document's distinct word n-grams that appear in NO
    other document. Low novelty = boilerplate/template/mirror content
    (the long tail near-dedup's pairwise threshold never catches); high
    novelty = fresh text. The standard diversity signal a curation
    report wants next to the dedup verdicts.

    A shingle is "novel" iff its document frequency is exactly 1.
    novel_pct is integer basis points of 100 (exact long `div`); docs
    with fewer than ``n`` tokens have no shingles and get NULL pct
    (0/0 — no evidence either way), with n_shingles = 0 to disambiguate.

    Scale: distinct (doc, shingle) from dedup.shingles (one shuffle),
    document frequency is ONE hash-aggregate over it, the join back is
    narrow (shingle, df) rows on the same key the distinct already
    partitioned by, and the per-doc rollup regroups by doc_id. Text
    never shuffles; no pair join anywhere — cost is linear in total
    shingle occurrences, unlike the O(D²-per-hot-shingle) pairwise path.
    """
    from .dedup import shingles

    # shingles() reads the conventional "text" column; aliasing (rather
    # than renaming) also covers a df that already carries an unrelated
    # "text" column next to the requested one
    sh = shingles(df.select(F.col(id_col), F.col(text).alias("text")),
                  n=n, id_col=id_col)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shingles"),
             F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
             .alias("n_novel"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long")
            .alias("n_shingles"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long")
            .alias("n_novel"),
            F.when(F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
                   F.expr("(n_novel * 100) div n_shingles"))
            .cast("long").alias("novel_pct"),
        )
    )


# ---------------------------------------------------------------------------
# Blocklist curation (C4/RefinedWeb-style): drop documents from blocked
# sources (domain blocklists run to millions of entries — a BROADCAST
# anti-dim, never a literal IN) and documents with too many blocked
# words (word lists are small — a literal array, map-side intersect).

BLOCKED_SOURCES = ["src3", "src7", "src13"]
BAD_WORDS = ["slow", "stale", "skew"]


def blocklist_filter(df: DataFrame, id_col: str = "doc_id",
                     source: str = "source", text: str = "text",
                     blocked_sources: list[str] | None = None,
                     bad_words: list[str] | None = None,
                     max_hits: int = 1) -> DataFrame:
    """(doc_id, source, src_blocked, n_tokens, n_bad_hits, keep) — the
    crawl-curation blocklist pass: keep iff the source is not on the
    domain blocklist AND at most ``max_hits`` blocked-word occurrences.

    Scale shape: the source blocklist joins as a BROADCAST left-semi
    marker (real domain blocklists are 10^6 rows — too big for a
    literal IN, trivial for a broadcast hash join; the corpus never
    shuffles); the word list intersects map-side as a literal array
    (word blocklists are 10^2-10^3 entries). Both signals are integer/
    boolean — the keep decision is bit-exact across engines.
    """
    blocked_sources = (BLOCKED_SOURCES if blocked_sources is None
                       else blocked_sources)
    bad_words = BAD_WORDS if bad_words is None else bad_words
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(s,) for s in blocked_sources], f"{source} string"
    ).withColumn("_blk", F.lit(True))
    words = ", ".join("'%s'" % w.replace("'", "''") for w in bad_words)
    toks = with_tokens(df, text).join(F.broadcast(dim), source, "left")
    return toks.select(
        F.col(id_col),
        F.col(source),
        F.coalesce(F.col("_blk"), F.lit(False)).alias("src_blocked"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.expr(
            f"filter(tokens, t -> array_contains(array({words}), t))"
        )).cast("long").alias("n_bad_hits"),
        (F.coalesce(F.col("_blk"), F.lit(False)) == F.lit(False))
        .__and__(F.size(F.expr(
            f"filter(tokens, t -> array_contains(array({words}), t))"
        )) <= F.lit(max_hits)).alias("keep"),
    )


def pmi_collocations(df: DataFrame, id_col: str = "doc_id",
                     text: str = "text", top_k: int = 100,
                     min_count: int = 5) -> DataFrame:
    """(w1, w2, n_ab, n_a, n_b, pmi_bits) — top-k collocations by
    integer-bit pointwise mutual information over adjacent whitespace
    token pairs: pmi_bits = flog2(n_ab) + flog2(N) - flog2(n_a) -
    flog2(n_b), within ±2 bits of true log2 PMI (each flog2 floors
    once; the sum form never overflows — n_ab·N as a product would
    pass 2^63 at corpus scale). Margins n_a/n_b are the bigram table's
    own row sums (left-word and right-word occurrence counts), so PMI
    is exactly the bigram model's; ``min_count`` prunes the rare-pair
    tail PMI is notorious for before the top-k.

    Scale: ONE corpus-sized pass (map-side pair explode → hash-agg);
    everything after is vocabulary-sized — two margin hash-aggs of the
    pair table, narrow joins back on the word keys, N as a literal-
    keyed 1-row aggregate broadcast (the DSIR scalar precedent). The
    ordered top-k is TakeOrderedAndProject, never a global sort.
    """
    from .curate import flog2

    toks = with_tokens(df, text).where(F.size("tokens") >= 2)
    big = toks.select(F.explode(F.expr(
        "transform(sequence(0, size(tokens) - 2), "
        "i -> struct(tokens[i] AS w1, tokens[i + 1] AS w2))"
    )).alias("bg")).select("bg.w1", "bg.w2")
    pair = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    left = pair.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    right = pair.groupBy("w2").agg(F.sum("n_ab").alias("n_b"))
    tot = (pair.groupBy(F.lit(1).alias("_k"))
           .agg(F.sum("n_ab").alias("_n")).drop("_k"))
    scored = (
        pair.where(F.col("n_ab") >= min_count)
        .join(left, "w1").join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (flog2(F.col("n_ab")) + flog2(F.col("_n"))
             - flog2(F.col("n_a")) - flog2(F.col("n_b")))
            .cast("long").alias("pmi_bits"),
        )
    )
    return scored.orderBy(
        F.col("pmi_bits").desc(), F.col("n_ab").desc(), "w1", "w2"
    ).limit(top_k)


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text: str = "text", k: int = 3,
                        w: int = 4) -> DataFrame:
    """(doc_id, pos, fp) — winnowing fingerprints (Schleimer, Wilkerson &
    Aiken 2003, the MOSS algorithm): hash every token ``k``-gram, slide a
    window of ``w`` consecutive hashes, and select each window's minimum.
    Guarantees: any shared run of ``w + k - 1`` tokens between two
    documents yields at least one shared (fp) selection — the local
    fingerprinting property full-document hashes (text.fingerprints)
    lack. Ties select the LEFTMOST minimal hash in the window (the
    deterministic variant; MOSS's rightmost rule is an arbitrary density
    choice — documented divergence), and overlapping windows selecting
    the same (pos, fp) collapse via the per-doc distinct.

    Scale: entirely map-side per document — the k-gram hashes, the
    window minima, and the position recovery are one nested
    transform-over-sequence expression (whole-stage codegen, zero
    Python); the only shuffle is the final distinct on narrow
    (doc_id, pos, fp) rows. Fingerprint density is ~2/(w+1) per token —
    the index a plagiarism/overlap detector joins on is a bounded
    fraction of corpus token count."""
    from .hashing import spark_h64

    parts = ", ".join(f"element_at(tokens, i + {j})" for j in range(k))
    gram_hash = spark_h64(f"concat_ws(' ', {parts})")
    hashes = (
        f"case when size(tokens) >= {k} then "
        f"transform(sequence(1, size(tokens) - {k - 1}), "
        f"i -> {gram_hash}) "
        "else cast(array() as array<bigint>) end"
    )
    # per window j (1-based over the hash array): leftmost position of
    # the window minimum, as struct(pos, fp)
    sels = (
        f"case when size(_h) >= {w} then "
        f"transform(sequence(1, size(_h) - {w - 1}), "
        f"j -> struct(j + array_position(slice(_h, j, {w}), "
        f"array_min(slice(_h, j, {w}))) - 1 AS pos, "
        f"array_min(slice(_h, j, {w})) AS fp)) "
        "else cast(array() as array<struct<pos: bigint, fp: bigint>>) end"
    )
    return (
        with_tokens(df, text)
        .withColumn("_h", F.expr(hashes))
        .select(F.col(id_col), F.explode(F.expr(sels)).alias("sel"))
        .select(F.col(id_col), F.col("sel.pos").alias("pos"),
                F.col("sel.fp").alias("fp"))
        .distinct()
    )


BACKOFF_PENALTY_BITS = 4   # charged when a bigram is unseen in the LM
OOV_BITS_EXTRA = 8         # charged on top of flog2(T+1) for OOV tokens


def bigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """(doc_id, n_scored, sum_bits, mean_microbits) — CCNet-style LM
    perplexity scoring: train a bigram LM on the corpus's 'en' slice
    (the stopword-ratio predicate — the DSIR target-domain precedent;
    CCNet trains on Wikipedia and scores the crawl), then score every
    document's token transitions in integer bits:

      bigram seen:   flog2(c(prev)) - flog2(c(prev,cur))    (≈ -log2 p)
      unigram only:  BACKOFF_PENALTY + flog2(T+1) - flog2(c(cur))
      OOV:           flog2(T+1) + OOV_BITS_EXTRA

    All-integer (flog2 = length(bin(x))-1, never float log), so scores
    are bit-exact across engines; mean_microbits = (sum·10^6) div n is
    the per-doc quality signal (low = fluent under the LM), NULL for
    docs with <2 tokens.

    Scale: LM tables are vocabulary-sized hash-aggregates of the train
    slice; scoring explodes each doc into (prev, cur) transitions —
    narrow rows — and equi-joins the bigram table on the pair key and
    the unigram table on each word key (shuffles carry token keys and
    longs, never text); T broadcasts as the DSIR 1-row scalar; the
    per-doc rollup regroups by doc_id."""
    from .curate import flog2

    train = with_tokens(df.where(
        (F.size(tokens_col(text)) > 0)
        & (F.size(F.filter(tokens_col(text),
                           lambda t: t.isin(*EN_STOPWORDS))) * 20
           >= F.size(tokens_col(text)))), text)
    uni = (train.select(F.explode("tokens").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c_w")))
    big = (train.where(F.size("tokens") >= 2)
           .select(F.explode(F.expr(
               "transform(sequence(0, size(tokens) - 2), "
               "i -> struct(tokens[i] AS w1, tokens[i + 1] AS w2))"
           )).alias("bg")).select("bg.w1", "bg.w2")
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_b")))
    tot = (uni.groupBy(F.lit(1).alias("_k"))
           .agg(F.sum("c_w").alias("_t")).drop("_k"))

    trans = (with_tokens(df, text).where(F.size("tokens") >= 2)
             .select(F.col(id_col), F.explode(F.expr(
                 "transform(sequence(0, size(tokens) - 2), "
                 "i -> struct(tokens[i] AS w1, tokens[i + 1] AS w2))"
             )).alias("bg")).select(id_col, "bg.w1", "bg.w2"))
    scored = (
        trans
        .join(big, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1")
              .withColumnRenamed("c_w", "c_prev"), "w1", "left")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("c_w", "c_cur"), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(id_col),
            F.when(
                F.col("c_b").isNotNull(),
                flog2(F.col("c_prev")) - flog2(F.col("c_b")),
            ).when(
                F.col("c_cur").isNotNull(),
                F.lit(BACKOFF_PENALTY_BITS)
                + flog2(F.col("_t") + 1) - flog2(F.col("c_cur")),
            ).otherwise(
                flog2(F.col("_t") + 1) + F.lit(OOV_BITS_EXTRA)
            ).cast("long").alias("_bits"),
        )
    )
    per_doc = (scored.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_scored"),
                    F.sum("_bits").cast("long").alias("sum_bits")))
    return (
        df.select(F.col(id_col)).join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_scored"), F.lit(0)).cast("long")
            .alias("n_scored"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long")
            .alias("sum_bits"),
            F.when(F.coalesce(F.col("n_scored"), F.lit(0)) > 0,
                   F.expr("(sum_bits * 1000000) div n_scored"))
            .cast("long").alias("mean_microbits"),
        )
    )


def nfc_normalize(df: DataFrame, id_col: str = "doc_id",
                  text: str = "text") -> DataFrame:
    """(doc_id, n_chars_raw, n_chars_nfc, changed, sha_nfc) — Unicode
    NFC normalization (UAX #15): the canonical-composition pass a crawl
    corpus takes before any hashing/dedup (the same text arrives both
    precomposed and decomposed from different origins; without NFC,
    exact dedup misses byte-different equal strings).

    Spark has no normalization built-in, so this is one of the repo's
    few HONEST Python paths: an Arrow-batched pandas_udf over
    unicodedata.normalize — vectorized batch transfer, no per-row
    Python UDF. Determinism is cross-engine because CPython's
    unicodedata and DuckDB's nfc_normalize both implement UAX #15
    canonical composition (verified byte-for-byte in the gate). The
    projection emits lengths, a changed flag, and the sha of the
    normalized text — narrow rows; the normalized text itself stays
    out of the shuffle."""
    from pyspark.sql.functions import pandas_udf

    # no pd.Series annotations: this module runs under
    # `from __future__ import annotations`, which stringifies them and
    # breaks pandas_udf's signature inference — the returnType plus
    # bare signature is the supported spelling
    @pandas_udf("string")
    def _nfc(s):
        import unicodedata

        return s.fillna("").map(lambda x: unicodedata.normalize("NFC", x))

    raw = norm_text(text)
    return (
        df.select(F.col(id_col), raw.alias("_raw"))
        .withColumn("_nfc", _nfc(F.col("_raw")))
        .select(
            F.col(id_col),
            F.length("_raw").cast("long").alias("n_chars_raw"),
            F.length("_nfc").cast("long").alias("n_chars_nfc"),
            (F.col("_raw") != F.col("_nfc")).alias("changed"),
            F.sha2(F.col("_nfc"), 256).alias("sha_nfc"),
        )
    )


def bm25_topk(df: DataFrame, query_terms: list[str],
              id_col: str = "doc_id", text: str = "text",
              k: int = 20) -> DataFrame:
    """(doc_id, bm25) — top-k retrieval for a bag of query terms under
    BM25 with k1 = 1.2, b = 0.75, in CROSS-ENGINE-EXACT arithmetic.

    BM25's fractions are cleared to integers before the one IEEE step:
    with k1 = 6/5 and b = 3/4 and corpus totals N docs / S tokens
    (avgdl = S/N), the per-term saturation

        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    multiplied through by 10·S becomes  22·S·tf / (10·S·tf + 3·S + 9·dl·N)
    — exact longs on both sides of ONE double division (the
    triangle-count lcc trick). IDF is bit-quantized like tfidf_terms:
    flog2((2N − 2df + 1) div (2df + 1)) — the Robertson idf's argument
    (N − df + ½)/(df + ½) scaled by 2 to stay integral; terms in more
    than half the corpus get 0 bits. Per-doc scores fold the ≤|query|
    term values SORTED BY TOKEN (double addition is not associative;
    the ordered fold is what the DuckDB twin reproduces bit-exactly).

    Scale (100 TB): the isin(query) filter lands BEFORE the tf
    aggregate — only matching (doc, term) rows shuffle, never the
    corpus vocabulary; dl is a map-side size(); N/S/df are scalar or
    |query|-row broadcasts; top-k is TakeOrderedAndProject (per-
    partition heaps), never a global sort."""
    from .curate import flog2

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = with_tokens(df, text).select(
        F.col(id_col), F.size("tokens").cast("long").alias("dl"),
        "tokens")
    stats = toks.groupBy(F.lit(1).alias("_k")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("s_tokens")).drop("_k")
    tf = (
        toks.select(F.col(id_col), "dl", F.explode("tokens").alias("token"))
        .where(F.col("token").isin(*query_terms))
        .groupBy(id_col, "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    v = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf_bits", flog2(F.expr(
            "(2 * n_docs - 2 * df_docs + 1) div (2 * df_docs + 1)")))
        .withColumn("v", F.expr(
            "CAST(idf_bits * 22 * s_tokens * tf AS DOUBLE) / "
            "CAST(10 * s_tokens * tf + 3 * s_tokens "
            "+ 9 * dl * n_docs AS DOUBLE)"))
    )
    scored = (
        v.groupBy(id_col)
        .agg(F.aggregate(
            F.array_sort(F.collect_list(F.struct("token", "v"))),
            F.lit(0.0),
            lambda acc, x: acc + x["v"]).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)
