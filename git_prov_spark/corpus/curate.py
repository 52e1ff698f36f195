"""End-to-end training-corpus curation: one manifest, four gates.

Composes the individually-oracled corpus operators into the decision a
training-data pipeline actually ships — for every document, keep it or name
the first gate that rejects it:

    exact_dup  – another doc with identical text has a smaller doc_id
                 (dedup.exact_dupes: 32-byte sha shuffle, map-side partials)
    near_dup   – MinHash-LSH candidate pairs → connected components; the
                 cluster's min doc_id is the keeper (dedup.near_dup_groups)
    lang       – stopword-ratio language gate (text.lang_id)
    quality    – too few tokens, or punctuation-heavy (text.quality_signals;
                 integer-exact thresholds so the DuckDB twin matches bit-for-bit)

Gate order is fixed and first-match-wins, so `reason` partitions the corpus.

Keeper invariant (tested): a cluster canonical is never itself rejected by a
dedup gate — identical docs always share an LSH cluster, so the cluster min
is also its sha-group min.

Plan shape at scale: the four gate tables derive independently (two are pure
map-side; exact dedup shuffles only (sha, id); LSH is the banded equi-join
path) and meet in joins on doc_id — co-partitioned by the join key, no
broadcast needed, no driver participation. At 100 TB the LSH stage dominates,
exactly as in a standalone near-dedup run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import lsh_index_matches, near_dup_groups
from .text import lang_id, quality_signals


def training_manifest(
    documents: DataFrame,
    min_tokens: int = 5,
    max_punct_pct: int = 20,
    n: int = 4,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(doc_id, reason, keep) — keep=1 iff every gate passes.

    `max_punct_pct` rejects when n_punct * 100 > max_punct_pct * n_chars
    (integer arithmetic: exact across engines). NULL text is normalized to
    '' so such docs flow through the gates (rejected as quality/exact_dup)
    instead of vanishing from the manifest through null join keys — the
    reason column must partition the INPUT. (The DuckDB twins assume
    non-null text, which the fixtures guarantee.)
    """
    documents = documents.withColumn(text, F.coalesce(F.col(text), F.lit("")))
    doc_sha = documents.select(
        F.col(id_col), F.sha2(F.col(text), 256).alias("content_sha")
    )
    # exact canonical straight from doc_sha: one hash pass over the full
    # text, one narrow (sha, id) shuffle — not a second exact_dupes scan
    ex = doc_sha.groupBy("content_sha").agg(
        F.min(id_col).alias("exact_canonical")
    )
    ex_canon = doc_sha.join(ex, "content_sha").select(id_col, "exact_canonical")
    near = near_dup_groups(documents, n=n, id_col=id_col).select(
        F.col(id_col), F.col("canonical_doc_id").alias("near_canonical")
    )
    lang = lang_id(documents, id_col=id_col).select(id_col, "lang_pred")
    qual = quality_signals(documents, id_col=id_col).select(
        id_col, "n_tokens", "n_punct", "n_chars"
    )
    m = (
        documents.select(id_col)
        .join(ex_canon, id_col)
        .join(near, id_col, "left")
        .join(lang, id_col)
        .join(qual, id_col)
    )
    reason = (
        F.when(F.col("exact_canonical") != F.col(id_col), F.lit("exact_dup"))
        .when(
            F.col("near_canonical").isNotNull()
            & (F.col("near_canonical") != F.col(id_col)),
            F.lit("near_dup"),
        )
        .when(F.col("lang_pred") != "en", F.lit("lang"))
        .when(
            (F.col("n_tokens") < min_tokens)
            | (F.col("n_punct") * 100 > max_punct_pct * F.col("n_chars")),
            F.lit("quality"),
        )
        .otherwise(F.lit("kept"))
    )
    return m.withColumn("reason", reason).select(
        F.col(id_col),
        F.col("reason"),
        (F.col("reason") == "kept").cast("long").alias("keep"),
    )


def incremental_manifest(
    new_docs: DataFrame,
    index: DataFrame,
    known_shas: DataFrame,
    min_tokens: int = 5,
    max_punct_pct: int = 20,
    n: int = 4,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Ingest-time curation: gate an arriving BATCH against the persisted
    corpus state — same (doc_id, reason, keep) schema and gate order as
    `training_manifest`, but cost scales with |batch|, never |corpus|.

    Corpus state, both read back from storage:
    * `index`      – `dedup.lsh_bands` rows of the already-curated corpus
                     (the batch probes it via `lsh_index_matches`, then the
                     caller appends the batch's own bands);
    * `known_shas` – one `content_sha` column of the existing documents.

    Gate deltas vs the batch pipeline:
    * exact_dup – sha already known to the corpus, or a batch-internal copy
      whose smaller-id twin is the keeper;
    * near_dup  – any LSH collision with an INDEXED doc rejects the new doc
      (the corpus doc is always the keeper); batch-internal collisions use
      the smaller-id-direct-match rule. Unlike `training_manifest` there is
      no transitive closure at ingest — a batch chain a<b<c with pairs
      (a,b),(b,c) keeps {a, c} here, while the batch pipeline's components
      keep {a} only. That is the standard ingest/compaction split: the
      periodic batch run (or `near_dup_groups` over kept docs) tightens
      chains the gate let through.

    NULL text normalizes to '' exactly as in training_manifest.
    """
    new_docs = new_docs.withColumn(text, F.coalesce(F.col(text), F.lit("")))
    doc_sha = new_docs.select(
        F.col(id_col), F.sha2(F.col(text), 256).alias("content_sha")
    )
    known = (
        known_shas.select("content_sha").distinct()
        .withColumn("known", F.lit(1))
    )
    batch_min = doc_sha.groupBy("content_sha").agg(
        F.min(id_col).alias("batch_min")
    )
    ex = (
        doc_sha.join(known, "content_sha", "left")
        .join(batch_min, "content_sha")
        .select(id_col, "known", "batch_min")
    )
    matches = lsh_index_matches(new_docs, index, n=n, id_col=id_col)
    batch_ids = new_docs.select(
        F.col(id_col).alias("match_id"), F.lit(1).alias("match_in_batch")
    )
    near_hits = (
        matches.join(batch_ids, "match_id", "left")
        .where(
            F.col("match_in_batch").isNull()          # indexed corpus doc
            | (F.col("match_id") < F.col("new_id"))   # smaller batch twin
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
        .withColumn("near_hit", F.lit(1))
    )
    lang = lang_id(new_docs, id_col=id_col).select(id_col, "lang_pred")
    qual = quality_signals(new_docs, id_col=id_col).select(
        id_col, "n_tokens", "n_punct", "n_chars"
    )
    m = (
        new_docs.select(id_col)
        .join(ex, id_col)
        .join(near_hits, id_col, "left")
        .join(lang, id_col)
        .join(qual, id_col)
    )
    reason = (
        F.when(
            F.col("known").isNotNull()
            | (F.col("batch_min") != F.col(id_col)),
            F.lit("exact_dup"),
        )
        .when(F.col("near_hit").isNotNull(), F.lit("near_dup"))
        .when(F.col("lang_pred") != "en", F.lit("lang"))
        .when(
            (F.col("n_tokens") < min_tokens)
            | (F.col("n_punct") * 100 > max_punct_pct * F.col("n_chars")),
            F.lit("quality"),
        )
        .otherwise(F.lit("kept"))
    )
    return m.withColumn("reason", reason).select(
        F.col(id_col),
        F.col("reason"),
        (F.col("reason") == "kept").cast("long").alias("keep"),
    )


def dataset_splits(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, split) — deterministic train/val/test assignment by portable
    md5 bucketing of (salt, doc_id).

    `weights` maps split name → share in basis points (must sum to 10 000);
    default {"train": 9800, "val": 100, "test": 100}. Properties a
    `rand()`-based split lacks, all load-bearing for a training corpus:

    * stable under re-runs, re-partitioning, and executor count (pure
      function of the id — north_rule determinism);
    * stable under corpus growth: an arriving doc never moves an existing
      doc's split (no global count involved);
    * leakage-auditable: membership is recomputable from (salt, doc_id)
      alone, no assignment table to lose;
    * re-splittable: a new salt is a fresh independent assignment.

    Map-side only — no shuffle; the hash matches DuckDB bit-for-bit
    (hashing.spark_h64 ≡ duck_h64), so the oracle can verify every row.
    """
    from .hashing import spark_h64

    if weights is None:
        weights = {"train": 9800, "val": 100, "test": 100}
    if sum(weights.values()) != 10_000 or not weights:
        raise ValueError("weights must be basis points summing to 10000")
    bucket = F.expr(
        spark_h64(f"concat('{salt}', ':', cast({id_col} as string))")
    ) % 10_000
    expr = None
    cum = 0
    for name, share in weights.items():
        cum += share
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return documents.select(F.col(id_col), expr.alias("split"))


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int],
    salt: str = "mix-v1",
    id_col: str = "doc_id",
    stratum_col: str = "stratum",
    default_rate: int = 0,
) -> DataFrame:
    """(doc_id, stratum, sampled) — deterministic per-stratum Bernoulli
    sampling: the training-MIX constructor (keep all of stratum A,
    downsample stratum B to 25 %, drop C), the step that turns a curated
    pool into a dataset with chosen composition.

    `rates` maps stratum value → keep-rate in basis points (10 000 = keep
    all); strata not listed get `default_rate`. The keep decision is
    portable-md5(salt:id) % 10000 < rate — the same machinery as
    dataset_splits, with the same load-bearing properties: re-run/
    growth-stable (a new doc never flips an old doc's fate), executor-
    count-independent, auditable from (salt, id) alone, and re-mixable
    under a fresh salt. Map-side only, no shuffle; bit-exact in the
    DuckDB oracle (oracles.sql_stratified_sample).
    """
    from .hashing import spark_h64

    if not rates or any(not (0 <= r <= 10_000) for r in rates.values()):
        raise ValueError("rates are basis points in [0, 10000]")
    bucket = F.expr(
        spark_h64(f"concat('{salt}', ':', cast({id_col} as string))")
    ) % 10_000
    rate = None
    for name, share in rates.items():
        cond = F.col(stratum_col) == name
        rate = F.when(cond, share) if rate is None else rate.when(cond, share)
    rate = rate.otherwise(F.lit(default_rate))
    return documents.select(
        F.col(id_col),
        F.col(stratum_col),
        (bucket < rate).alias("sampled"),
    )


def _hash_lottery_cap(narrow: DataFrame, key_col: str, quota: int,
                      id_col: str) -> DataFrame:
    """(id_col, _win=True) for the `quota` winners per key: the rows with
    the smallest (_h, id) pairs within each key_col group. `narrow` must
    carry (id_col, key_col, _h). Two-phase skew-safe ranking — phase 1
    ranks within (shuffle-partition, key) so a hot key spreads across all
    partitions and discards everything past `quota` per partition (a
    semantics-preserving superset of the winners); phase 2 ranks the
    ≤ quota·P survivors per key globally."""
    from pyspark.sql import Window

    pre_w = Window.partitionBy("_pid", key_col).orderBy(
        F.asc("_h"), F.asc(id_col))
    survivors = (
        narrow.withColumn("_pid", F.spark_partition_id())
        .withColumn("_pr", F.row_number().over(pre_w))
        .where(F.col("_pr") <= quota)
        .drop("_pid", "_pr")
    )
    fin_w = Window.partitionBy(key_col).orderBy(F.asc("_h"), F.asc(id_col))
    return (
        survivors.withColumn("_r", F.row_number().over(fin_w))
        .where(F.col("_r") <= quota)
        .select(F.col(id_col), F.lit(True).alias("_win"))
    )


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int,
    id_col: str = "vec_id",
    salt: str = "cbs-v1",
    centroids: list[list[float]] | None = None,
    corpus_size: int | None = None,
    n_centroids: int | None = None,
    source_path: str | None = None,
    cache_dir: str | None = None,
) -> DataFrame:
    """(vec_id, cluster, kept) — semantic cluster-balanced subsampling:
    the diversification step of D4 (Tirumala et al. 2023,
    arXiv:2308.12284) — assign every embedding to its trained IVF
    centroid, then cap each semantic cluster at `per_cluster` members, so
    over-represented regions of embedding space (boilerplate, template
    spam) are downsampled while the diversity tail survives intact.

    Winners per cluster are the `per_cluster` smallest portable-hash
    values (hash(salt:id), ties by id) — the same deterministic lottery
    as `source_quota`, with the same properties: re-run-stable, executor-
    count-independent, auditable from (salt, id) alone, re-drawable under
    a fresh salt. The same skew story applies (one mega-cluster from a
    degenerate centroid must not funnel through one window task), so the
    ranking is the shared two-phase `_hash_lottery_cap`.

    Index amortization: pass `centroids` + `corpus_size`, or
    `source_path` to reuse the persisted fingerprint-keyed quantizer AND
    its persisted assignment — the sampling run then launches zero
    training and zero assignment jobs. A cold assignment is the broadcast
    argmax-cosine plan of `similarity.ivf_assign` (K-fan-out per row,
    linear in the corpus, never pairwise).
    """
    from .hashing import spark_h64
    from .similarity import (
        _index_key,
        ivf_assign,
        load_or_build_assignment,
        load_or_train_centroids,
    )

    if per_cluster < 0:
        raise ValueError("per_cluster must be >= 0")
    explicit = centroids
    if centroids is not None:
        if corpus_size is None:
            raise ValueError("corpus_size is required with precomputed centroids")
    else:
        centroids, _ = load_or_train_centroids(
            emb, id_col, n_centroids, source_path=source_path,
            cache_dir=cache_dir)
    if source_path is not None:
        assign = load_or_build_assignment(
            emb, id_col, centroids,
            _index_key(source_path, n_centroids, explicit), cache_dir)
    else:
        assign = ivf_assign(emb, id_col, centroids)
    h = F.expr(spark_h64(f"concat('{salt}', ':', cast({id_col} as string))"))
    winners = _hash_lottery_cap(
        assign.select(F.col(id_col), F.col("cluster"), h.alias("_h")),
        "cluster", per_cluster, id_col,
    )
    return (
        assign.join(winners, id_col, "left")
        .select(F.col(id_col), F.col("cluster"),
                F.coalesce(F.col("_win"), F.lit(False)).alias("kept"))
    )


def source_quota(
    documents: DataFrame,
    quota: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """(doc_id, source, kept) — hard per-source cap: keep at most `quota`
    docs per source/domain (the anti-spam quota every web-corpus pipeline
    applies before mixing — one viral domain must not dominate the
    training set). Winners are the `quota` smallest portable-hash values
    (hash(salt:id), ties by id) — a deterministic lottery: re-run-stable,
    auditable from (salt, id) alone, and re-drawable under a fresh salt.

    Skew story (the reason this is not one `row_number` over source): a
    hot domain at 10^12-doc scale would funnel its entire row set through
    ONE window task — see `_hash_lottery_cap`, which both this op and
    `cluster_balanced_sample` rank through. Both phases move only
    (id, source, hash) rows; the verdict joins back on id, so document
    text never shuffles.
    """
    from .hashing import spark_h64

    if quota < 0:
        raise ValueError("quota must be >= 0")
    h = F.expr(spark_h64(f"concat('{salt}', ':', cast({id_col} as string))"))
    narrow = documents.select(F.col(id_col), F.col(source_col), h.alias("_h"))
    winners = _hash_lottery_cap(narrow, source_col, quota, id_col)
    return (
        narrow.join(winners, id_col, "left")
        .select(F.col(id_col), F.col(source_col),
                F.coalesce(F.col("_win"), F.lit(False)).alias("kept"))
    )


def training_order(documents: DataFrame, id_col: str = "doc_id",
                   seed: int = 0, n_shards: int = 64) -> DataFrame:
    """(doc_id, shard, pos) — deterministic training-order shuffle: the
    epoch-order randomization every LLM training run applies before the
    data loader reads.

    Each doc gets a seed-keyed portable 60-bit hash; ``shard`` is that
    hash mod n_shards, ``pos`` its rank within the shard (hash, then id
    as a total-order tiebreak). Reproducible across runs, retries and
    parallelism levels (north_rule determinism); a new ``seed`` is a
    fresh epoch permutation.

    Scale: one narrow (id, hash) projection and ONE window partitioned
    by shard — never a global single-partition sort; shards are
    hash-balanced so no window task sees more than ~corpus/n_shards
    rows. A loader consumes shard files in pos order.
    """
    from .hashing import spark_h64

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    h = F.expr(spark_h64(
        f"concat('shuffle:{seed}:', cast({id_col} as string))"))
    w = Window.partitionBy("shard").orderBy(F.asc("_h"), F.asc(id_col))
    return (
        documents.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def flog2(col: F.Column) -> F.Column:
    """Integer floor(log2(x)) for a positive integral column, computed as
    length(bin(x)) - 1 — pure string/int built-ins that Spark and DuckDB
    evaluate identically (verified: 1→0, 8→3, 1023→9, 1024→10, 2^63-1→62).
    Float log() is NOT used anywhere in the importance pipeline: libm/JVM
    transcendentals are only 1-ulp-accurate, so a cross-engine value-hash
    gate cannot depend on them."""
    return (F.length(F.bin(col.cast("long"))) - 1).cast("long")


def importance_sample(
    documents: DataFrame,
    target_col: str,
    n_buckets: int = 256,
    cap: int = 24,
    salt: str = "dsir-v1",
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(doc_id, logw_bits, deficit, keep) — DSIR-style importance
    resampling (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): reweight a raw crawl toward a target domain
    using hashed n-gram features, then sample each document with
    probability proportional to its importance weight.

    ``target_col`` is a boolean column on ``documents`` marking the
    target-domain subset (e.g. high-quality or in-language docs). Model:

    - every token hashes into one of ``n_buckets`` feature buckets
      (portable md5 hash — identical in Spark, DuckDB and Python);
    - the bucket's log-likelihood ratio is quantized to INTEGER bits:
      L[b] = flog2(ct[b]+1) - flog2(cr[b]+1) where ct/cr are the bucket's
      token counts in the target subset / full corpus (+1 = add-one
      smoothing, so empty buckets are defined). Power-of-two quantization
      is the price of bit-exact cross-engine determinism — float log()
      would differ in the last ulp between JVM and libm (see flog2);
    - a document's importance score is the exact integer sum
      logw_bits = Σ_tokens L[bucket(token)] (long addition — associative,
      so any partitioning/aggregation order yields identical bits; a doc
      with no tokens scores 0, the empty product);
    - sampling: deficit = min(max_logw - logw_bits, cap) and the doc is
      kept iff hash(salt:id) % 2^deficit == 0 — i.e. with probability
      2^-deficit ∝ 2^logw_bits, the importance-resampling acceptance rule
      with power-of-two-quantized weights. The top-weight doc is always
      kept (2^0 = 1); ``cap`` bounds the acceptance odds so the sampled
      set stays non-degenerate.

    Deterministic end-to-end: re-runs, retries, any executor count, and
    the DuckDB oracle all produce identical rows — no RNG, no floats.

    Scale (100 TB): the token explode is map-side; the (doc, bucket)
    count is ONE hash-aggregate with map-side partials (keys bounded by
    docs × n_buckets, no hot key beyond a doc's own size); bucket stats
    are ≤ n_buckets rows — broadcast back; the per-doc sum regroups the
    already-narrow (doc, bucket, n) rows by doc_id; max_logw is a scalar
    aggregate broadcast into the final map-side keep expression. The raw
    text never shuffles.
    """
    from .hashing import spark_h64

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    if not (0 <= cap <= 40):
        raise ValueError("cap must be in [0, 40]")
    from ..corpus.text import with_tokens

    ids = documents.select(F.col(id_col))
    tok = (
        with_tokens(documents, text)
        .select(F.col(id_col), F.col(target_col).alias("_tgt"),
                F.explode("tokens").alias("_token"))
        .withColumn("_bucket",
                    F.expr(spark_h64("_token")) % F.lit(n_buckets))
    )
    db = tok.groupBy(id_col, "_tgt", "_bucket").agg(
        F.count(F.lit(1)).alias("_n_db"))
    stats = db.groupBy("_bucket").agg(
        F.sum("_n_db").alias("_cr"),
        F.sum(F.when(F.col("_tgt"), F.col("_n_db")).otherwise(0)).alias("_ct"),
    ).select(
        "_bucket",
        (flog2(F.col("_ct") + 1) - flog2(F.col("_cr") + 1)).alias("_L"),
    )
    per_doc = (
        db.join(F.broadcast(stats), "_bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n_db") * F.col("_L")).alias("logw_bits"))
    )
    scored = (
        ids.join(per_doc, id_col, "left")
        .select(F.col(id_col),
                F.coalesce(F.col("logw_bits"), F.lit(0)).cast("long")
                .alias("logw_bits"))
    )
    # scalar max as a literal-keyed hash-aggregate (NOT a global agg whose
    # final merge plans Exchange SinglePartition) broadcast to every row —
    # the 1-row BroadcastNestedLoopJoin is Spark's own scalar-subquery
    # shape, cost O(N), declared in tools/plan_audit.py
    lmax = (scored.groupBy(F.lit(1).alias("_k"))
            .agg(F.max("logw_bits").alias("_lmax")).drop("_k"))
    h = F.expr(spark_h64(f"concat('{salt}', ':', cast({id_col} as string))"))
    return (
        scored.crossJoin(F.broadcast(lmax))
        .withColumn(
            "deficit",
            F.least(F.col("_lmax") - F.col("logw_bits"), F.lit(cap))
            .cast("int"))
        .select(
            F.col(id_col), "logw_bits", "deficit",
            (h % F.expr("shiftleft(cast(1 as bigint), deficit)") == 0)
            .alias("keep"),
        )
    )


def source_report(documents: DataFrame, id_col: str = "doc_id",
                  text: str = "text", source: str = "source") -> DataFrame:
    """(source, n_docs, n_tokens, n_chars, n_unique, dup_bp, n_en, en_bp,
    mean_tokens) — the per-source health dashboard a corpus operator
    reads before mixing: volume, exact-duplicate rate, language share,
    and mean document length, each integer-exact (rates in basis points
    via long `div`, no float ratios).

    Scale: one map-side per-doc projection (tokens size, sha, stopword
    hits — no intermediate materialization), then ONE hash-aggregate on
    source; the duplicate rate rides the same aggregate as a
    count_distinct expand on the 32-byte sha — text itself never
    shuffles. Source cardinality is small (10^2-10^5), so the reduce
    side is dashboard-sized at any corpus size."""
    from .text import EN_STOPWORDS, tokens_col

    toks = tokens_col(text)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    per_doc = documents.select(
        F.col(source).alias("source"),
        F.size(toks).cast("long").alias("_nt"),
        F.length(F.coalesce(F.col(text), F.lit(""))).cast("long")
        .alias("_nc"),
        F.sha2(F.coalesce(F.col(text), F.lit("")), 256).alias("_sha"),
        ((F.size(toks) > 0) & (stop_hits * 20 >= F.size(toks)))
        .cast("long").alias("_en"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_chars"),
            F.count_distinct("_sha").cast("long").alias("n_unique"),
            F.sum("_en").cast("long").alias("n_en"),
        )
        .select(
            "source", "n_docs", "n_tokens", "n_chars", "n_unique",
            F.expr("((n_docs - n_unique) * 10000) div n_docs")
            .cast("long").alias("dup_bp"),
            "n_en",
            F.expr("(n_en * 10000) div n_docs").cast("long")
            .alias("en_bp"),
            F.expr("n_tokens div n_docs").cast("long")
            .alias("mean_tokens"),
        )
    )


def topk_per_group(df: DataFrame, group: str, order_col: str,
                   k: int = 2, id_col: str = "doc_id") -> DataFrame:
    """(group, rank, id, order_col) — top-k rows per group by
    (order_col DESC, id) — the per-partition representative-picking
    shape (longest docs per source, best-scoring per cluster). ONE
    partitioned window (hash-balanced across groups — never the
    single-partition global variety plan_audit bans) + the rank
    filter; deterministic tie-break on id."""
    w = Window.partitionBy(group).orderBy(
        F.col(order_col).desc(), F.col(id_col))
    return (
        df.select(group, id_col, order_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group, F.col("rank").cast("long").alias("rank"),
                id_col, order_col)
    )


def ntile_per_group(df: DataFrame, group: str, order_col: str,
                    n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """(group, id, order_col, bucket) — exact n-tile of each row within
    its group by (order_col, id): the relative-rank feature (length
    quartile within source, score decile within cluster) quality
    filters threshold on. ONE partitioned window; the id tie-break
    makes the bucket assignment deterministic where raw NTILE over
    ties is not. Both engines' NTILE split remainders identically
    (first buckets get the extra rows — SQL standard)."""
    w = Window.partitionBy(group).orderBy(F.col(order_col), F.col(id_col))
    return (
        df.select(group, id_col, order_col)
        .withColumn("bucket", F.ntile(n).over(w).cast("long"))
    )


def split_leakage_report(documents: DataFrame,
                         weights: dict[str, int] | None = None,
                         salt: str = "split-v1",
                         id_col: str = "doc_id") -> DataFrame:
    """(split_lo, split_hi, n_pairs, n_shas) — exact-duplicate LEAKAGE
    between dataset splits: pairs of distinct docs with identical
    content sha landing in two splits (split_lo < split_hi rows are the
    leaks; split_lo = split_hi rows are benign intra-split dupes, kept
    for context). The audit every train/val/test cut needs BEFORE
    evaluation numbers mean anything — hash-based splits are stable but
    content-blind, so exact copies with different ids can straddle the
    cut.

    Scale: one sha aggregate + a self-equi-join ON THE SHA (bounded by
    dup-group sizes, the dedup_exact shape — never all-pairs), then a
    hash-aggregate over the tiny split×split space."""
    from .text import norm_text

    sp = dataset_splits(documents, weights=weights, salt=salt,
                        id_col=id_col)
    sh = documents.select(
        F.col(id_col), F.sha2(norm_text(), 256).alias("sha"))
    j = sh.join(sp, id_col)
    a = j.select(F.col(id_col).alias("ida"), F.col("sha"),
                 F.col("split").alias("sa"))
    b = j.select(F.col(id_col).alias("idb"), F.col("sha").alias("shb"),
                 F.col("split").alias("sb"))
    pairs = a.join(b, (a["sha"] == b["shb"]) & (a["ida"] < b["idb"]))
    return (
        pairs.groupBy(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.count_distinct("sha").alias("n_shas"))
    )
