"""training_manifest: planted corpus hits every gate with the right reason,
first-match-wins ordering holds, and the cluster-canonical keeper invariant
(a doc other docs are deduped against is never itself rejected by a dedup
gate) is observable."""

from __future__ import annotations

import pytest

from git_prov_spark.corpus.curate import training_manifest

BASE = (
    "the quick brown fox jumps over the lazy dog and then the fox runs "
    "to the hills where the water is cold and the sun is warm today"
)

DOCS = [
    (1, BASE),                                   # kept (and cluster canonical)
    (2, BASE),                                   # exact_dup of 1
    (3, BASE.rsplit(" ", 1)[0]),                 # near_dup: last token dropped
    (4, "zzz qqq vvv kkk mmm nnn ppp rrr"),      # lang: zero stopwords
    (5, "the cat!!!"),                           # quality: n_tokens < 5
    (6, "the cat sat on the mat !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"),  # quality: punct
]


@pytest.fixture(scope="module")
def manifest(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r.doc_id: (r.reason, r.keep)
            for r in training_manifest(df).collect()}


def test_every_gate_fires_with_its_reason(manifest):
    assert manifest == {
        1: ("kept", 1),
        2: ("exact_dup", 0),
        3: ("near_dup", 0),
        4: ("lang", 0),
        5: ("quality", 0),
        6: ("quality", 0),
    }


def test_exact_precedes_near(manifest):
    # doc 2 is BOTH an exact copy and (trivially) a near-dup of doc 1;
    # the fixed gate order must label it exact_dup
    assert manifest[2][0] == "exact_dup"


def test_keeper_invariant(manifest):
    # doc 1 anchors the {1,2,3} cluster and the {1,2} sha group — the
    # canonical every rejection points at must itself be kept
    assert manifest[1] == ("kept", 1)


BASE2 = (
    "a second english document where the cat and the dog walk to the "
    "house and then the bird sings in the tree by the river all day"
)


def test_incremental_manifest_gates(spark):
    """Batch gating against persisted corpus state: known-sha reject,
    index near-dup reject, batch-internal exact/near rejects with the
    smaller-id keeper, fresh docs kept."""
    from git_prov_spark.corpus.curate import incremental_manifest
    from git_prov_spark.corpus.dedup import lsh_bands
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(1, BASE), (4, "zzz qqq vvv kkk mmm nnn ppp rrr")],
        "doc_id long, text string",
    )
    index = lsh_bands(corpus, n=4)
    known = corpus.select(F.sha2(F.col("text"), 256).alias("content_sha"))
    batch = spark.createDataFrame(
        [
            (10, BASE),                        # exact_dup: sha known to corpus
            (11, BASE.rsplit(" ", 1)[0]),      # near_dup: collides with index
            (12, BASE2),                       # kept (fresh)
            (13, BASE2),                       # exact_dup: batch twin, 12 < 13
            (14, BASE2.rsplit(" ", 1)[0]),     # near_dup: batch twin, 12 < 14
            (15, "xxx yyy uuu www ttt sss hhh jjj"),  # lang
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.reason, r.keep)
           for r in incremental_manifest(batch, index, known).collect()}
    assert got == {
        10: ("exact_dup", 0),
        11: ("near_dup", 0),
        12: ("kept", 1),
        13: ("exact_dup", 0),
        14: ("near_dup", 0),
        15: ("lang", 0),
    }


def test_dataset_splits_properties(spark):
    """Determinism, growth-stability, proportions, and validation for the
    hash-based splitter."""
    import pytest
    from git_prov_spark.corpus.curate import dataset_splits

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in dataset_splits(docs).collect()}
    b = {r.doc_id: r.split for r in dataset_splits(docs).collect()}
    assert a == b  # deterministic across runs
    # growth-stable: a prefix corpus assigns identically
    small = {r.doc_id: r.split
             for r in dataset_splits(docs.where("doc_id < 1000")).collect()}
    assert all(a[k] == v for k, v in small.items())
    # proportions near 98/1/1 (binomial tolerance at n=5000)
    from collections import Counter
    c = Counter(a.values())
    assert 0.97 < c["train"] / 5000 < 0.99
    assert 0 < c["val"] / 5000 < 0.025 and 0 < c["test"] / 5000 < 0.025
    # a different salt reshuffles some assignments
    resalted = {r.doc_id: r.split
                for r in dataset_splits(docs, salt="split-v2").collect()}
    assert resalted != a
    with pytest.raises(ValueError):
        dataset_splits(docs, weights={"train": 5000})  # not 10000


def test_lsh_hot_bucket_cap(spark):
    """A degenerate cluster (many identical docs) must not explode the
    candidate-pair join: with the cap it contributes nothing (exact
    dedup's job), while a genuine near-dup pair in a small bucket
    survives."""
    from git_prov_spark.corpus.dedup import lsh_candidate_pairs

    hot = [(i, "zz yy xx ww vv uu tt ss rr qq") for i in range(50)]
    near = [(100, BASE), (101, BASE.rsplit(" ", 1)[0])]
    df = spark.createDataFrame(hot + near, "doc_id long, text string")
    capped = lsh_candidate_pairs(df, n=4, max_bucket=10)
    pairs = {(r.d1, r.d2) for r in capped.collect()}
    assert (100, 101) in pairs                     # small bucket survives
    assert not any(d1 < 50 and d2 < 50 for d1, d2 in pairs)  # hot dropped
    uncapped = lsh_candidate_pairs(df, n=4, max_bucket=None)
    assert uncapped.where("d1 < 50 AND d2 < 50").count() == 50 * 49 // 2


def test_lsh_bucket_cap_above_testdata(spark):
    """The default cap must sit far above any honest bucket in the
    augmented sf0.01 corpus, so every shipped oracle is unaffected."""
    from git_prov_spark.corpus.dedup import DEFAULT_LSH_MAX_BUCKET, lsh_bands
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "text")
    aug = docs.unionByName(
        docs.where("doc_id % 10 = 0")
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    )
    top = (
        lsh_bands(aug, n=4).groupBy("band", "sig").count()
        .agg(F.max("count").alias("mx")).collect()[0].mx
    )
    assert top * 20 < DEFAULT_LSH_MAX_BUCKET, top


def test_chunk_documents_windows(spark):
    """Exact windows on a hand corpus + coverage/count invariants."""
    import pytest
    from git_prov_spark.corpus.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three tokens"),
            (3, ""),                                     # no chunks
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
           for r in chunk_documents(docs, window=4, overlap=1).collect()}
    # stride 3: starts 0,3,6,9 for doc 1
    assert got[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert got[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert got[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert got[(1, 3)] == ("t9", 1)                      # short tail
    assert got[(2, 0)] == ("only three tokens", 3)
    assert all(d != 3 for d, _ in got)                   # empty doc: nothing
    assert len(got) == 5
    # consecutive chunks overlap by exactly `overlap` tokens
    assert got[(1, 0)][0].split()[-1:] == got[(1, 1)][0].split()[:1]
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, overlap=4)


def test_null_text_gets_a_reason(spark):
    """NULL text must not vanish from the manifest through null join keys —
    it normalizes to '' and is rejected by a gate like any other doc."""
    from git_prov_spark.corpus.curate import training_manifest

    docs = spark.createDataFrame(
        [(1, BASE), (2, None), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r.reason for r in training_manifest(docs).collect()}
    assert set(got) == {1, 2, 3}          # full coverage of the input
    assert got[1] == "kept"
    assert got[2] in ("quality", "lang")  # '' fails a content gate...
    assert got[3] == "exact_dup"          # ...and the second NULL is a dup


def test_reingested_doc_counts_bands_once(spark):
    """A doc_id present in BOTH the index and the batch must not double its
    partners' n_shared_bands through the union."""
    from git_prov_spark.corpus.dedup import lsh_bands, lsh_index_matches

    x = (1, BASE)
    corpus = spark.createDataFrame([x], "doc_id long, text string")
    index = lsh_bands(corpus, n=4)
    batch = spark.createDataFrame(
        [x, (2, BASE.rsplit(" ", 1)[0])], "doc_id long, text string"
    )
    m = {(r.new_id, r.match_id): r.n_shared_bands
         for r in lsh_index_matches(batch, index, n=4).collect()}
    assert m[(2, 1)] == m[(1, 2)]  # symmetric, not inflated


def test_stratified_sample_rates_and_determinism(spark):
    from git_prov_spark.corpus.curate import stratified_sample

    rows = [(i, "en" if i % 3 else "other") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    got = stratified_sample(
        df, rates={"en": 10_000, "other": 2_500}
    ).toPandas().set_index("doc_id")
    en = got[got.stratum == "en"]
    other = got[got.stratum == "other"]
    assert en.sampled.all()                       # rate 10000 keeps all
    frac = other.sampled.mean()
    assert 0.18 <= frac <= 0.32, frac             # ~25 % of 'other'
    # deterministic: identical on re-run; unlisted strata get default_rate
    again = stratified_sample(
        df, rates={"en": 10_000, "other": 2_500}
    ).toPandas().set_index("doc_id")
    assert (got.sampled == again.sampled).all()
    df2 = spark.createDataFrame([(1, "zz")], "doc_id long, stratum string")
    r = stratified_sample(df2, rates={"en": 10_000}).collect()[0]
    assert r.sampled is False
    # growth-stable: adding docs never flips an existing decision
    grown = spark.createDataFrame(
        rows + [(i, "en") for i in range(3000, 4000)],
        "doc_id long, stratum string",
    )
    g2 = stratified_sample(
        grown, rates={"en": 10_000, "other": 2_500}
    ).toPandas().set_index("doc_id")
    assert (g2.loc[got.index].sampled == got.sampled).all()


def test_stratified_sample_is_map_side(spark):
    from git_prov_spark.corpus.curate import stratified_sample

    df = spark.createDataFrame(
        [(i, "en") for i in range(50)], "doc_id long, stratum string"
    )
    plan = (
        stratified_sample(df, rates={"en": 5_000})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_source_report_hand_computed(spark):
    from git_prov_spark.corpus.curate import source_report

    df = spark.createDataFrame(
        [
            (1, "the a and of to in is on for with", "s1"),  # en, 10 toks
            (2, "xyz qrs", "s1"),
            (3, "xyz qrs", "s1"),            # exact dup of 2
            (4, None, "s2"),                  # null text -> empty
            (5, "solo", "s2"),
        ],
        "doc_id long, text string, source string")
    out = {r.source: r for r in source_report(df).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.n_tokens, s1.n_unique) == (3, 14, 2)
    assert s1.dup_bp == 3333          # 1 of 3 duplicated
    assert s1.n_en == 1 and s1.en_bp == 3333
    assert s1.mean_tokens == 4        # 14 div 3
    s2 = out["s2"]
    assert (s2.n_docs, s2.n_tokens, s2.n_unique) == (2, 1, 2)
    assert s2.dup_bp == 0 and s2.n_en == 0


def test_source_report_repartition_invariant(spark):
    from git_prov_spark.corpus.curate import source_report

    rows = [(i, f"w{i % 7} the a of", f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    x = sorted(map(tuple, source_report(df).collect()))
    y = sorted(map(tuple, source_report(df.repartition(11)).collect()))
    assert x == y


def test_split_leakage_report_detects_planted_leak(spark):
    from git_prov_spark.corpus.curate import dataset_splits, split_leakage_report

    # 40 unique docs + exact copies under different ids: at a 50/50 cut
    # some copy pairs must straddle it (and the report must say so)
    docs = spark.createDataFrame(
        [(i, f"text number {i % 40}") for i in range(80)],
        "doc_id long, text string")
    w = {"train": 5000, "val": 5000}
    rep = {(r.split_lo, r.split_hi): (r.n_pairs, r.n_shas)
           for r in split_leakage_report(docs, weights=w).collect()}
    # cross-split pairs reported exactly = hand count from the split fn
    sp = {r.doc_id: r.split for r in dataset_splits(docs, weights=w).collect()}
    cross = sum(1 for i in range(40) if sp[i] != sp[i + 40])
    same = 40 - cross
    assert cross > 0, "50/50 cut should leak on this fixture"
    assert rep.get(("train", "val"), (0, 0))[0] == cross
    assert rep.get(("train", "train"), (0, 0))[0] \
        + rep.get(("val", "val"), (0, 0))[0] == same
