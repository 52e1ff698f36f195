"""DSIR importance resampling + integer TF-IDF + surprisal buckets (r5):
Spark ops vs their DuckDB twins AND hand-computed golden properties on
small in-memory corpora — planted target-domain docs, stopword-free docs,
empty docs, repartition invariance (north_rule determinism)."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from git_prov_spark.corpus import curate, oracles
from git_prov_spark.corpus import text as ctext


@pytest.fixture(scope="module")
def docs(spark):
    # 4 clearly-EN docs (stopword-dense), 4 clearly-other (no stopwords),
    # one empty, one null — a bimodal corpus so the importance weights of
    # the two populations separate.
    en = [
        "the cat is on the mat and it is warm",
        "this is a tale of the sea and the wind",
        "it was the best of times for a walk in the park",
        "the quick brown fox jumps over the lazy dog at dawn",
    ]
    other = [
        "zorp blix quang vemth kroz",
        "blix zorp zorp kroz nuvix",
        "quang vemth nuvix blix kroz zorp",
        "kroz kroz kroz blix quang",
    ]
    rows = [(i, t) for i, t in enumerate(en + other)]
    rows += [(8, ""), (9, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pdf(docs):
    return docs.toPandas()


def _compare(sdf, sql, pdf, order_cols):
    got = sdf.toPandas().sort_values(order_cols).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(sql).fetchdf().sort_values(order_cols).reset_index(
        drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    for c in sorted(got.columns):
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    return got


def _tagged(docs):
    tgt = ctext.lang_id(docs).select(
        "doc_id", (F.col("lang_pred") == "en").alias("_is_en"))
    return docs.join(tgt, "doc_id")


class TestImportanceSample:
    def test_matches_duckdb_twin(self, docs):
        out = curate.importance_sample(_tagged(docs), "_is_en")
        _compare(out, oracles.sql_importance_sample("documents"),
                 _pdf(docs), ["doc_id"])

    def test_target_docs_outweigh_offdomain(self, docs):
        rows = {r["doc_id"]: r for r in
                curate.importance_sample(_tagged(docs), "_is_en").collect()}
        en_w = [rows[i]["logw_bits"] for i in range(4)]
        other_w = [rows[i]["logw_bits"] for i in range(4, 8)]
        assert min(en_w) > max(other_w)

    def test_max_weight_doc_always_kept(self, docs):
        rows = curate.importance_sample(_tagged(docs), "_is_en").collect()
        top = max(rows, key=lambda r: r["logw_bits"])
        assert top["deficit"] == 0 and top["keep"]

    def test_empty_doc_scores_zero(self, docs):
        rows = {r["doc_id"]: r for r in
                curate.importance_sample(_tagged(docs), "_is_en").collect()}
        assert rows[8]["logw_bits"] == 0
        assert rows[9]["logw_bits"] == 0  # null text ≡ empty

    def test_repartition_invariant(self, docs):
        a = sorted(map(tuple,
                   curate.importance_sample(_tagged(docs), "_is_en")
                   .collect()))
        b = sorted(map(tuple,
                   curate.importance_sample(_tagged(docs.repartition(7)),
                                            "_is_en").collect()))
        assert a == b

    def test_validation(self, docs):
        with pytest.raises(ValueError):
            curate.importance_sample(_tagged(docs), "_is_en", n_buckets=1)
        with pytest.raises(ValueError):
            curate.importance_sample(_tagged(docs), "_is_en", cap=99)


class TestFlog2:
    def test_matches_python_floor_log2(self, spark):
        vals = [1, 2, 3, 7, 8, 1023, 1024, 2**40, 2**62, 2**63 - 1]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {r["x"]: r["y"] for r in
               df.select("x", curate.flog2(F.col("x")).alias("y")).collect()}
        assert got == {v: v.bit_length() - 1 for v in vals}


class TestTfidf:
    def test_matches_duckdb_twin(self, docs):
        out = ctext.tfidf_terms(docs, k=3)
        _compare(out, oracles.sql_tfidf_terms("documents", k=3),
                 _pdf(docs), ["doc_id", "token"])

    def test_ubiquitous_token_scores_zero(self, spark):
        # 'the' in every doc → n_docs // df == 1 → 0 bits → score 0
        df = spark.createDataFrame(
            [(0, "the alpha alpha"), (1, "the beta"), (2, "the gamma"),
             (3, "the delta")],
            "doc_id long, text string")
        rows = ctext.tfidf_terms(df, k=4).collect()
        the = [r for r in rows if r["token"] == "the"]
        assert the and all(r["score"] == 0 for r in the)
        # the planted distinctive term ranks first for doc 0
        doc0 = sorted((r for r in rows if r["doc_id"] == 0),
                      key=lambda r: (-r["score"], r["token"]))
        assert doc0[0]["token"] == "alpha" and doc0[0]["score"] > 0

    def test_empty_doc_emits_nothing(self, docs):
        ids = {r["doc_id"] for r in ctext.tfidf_terms(docs, k=3).collect()}
        assert 8 not in ids and 9 not in ids


class TestSurprisal:
    def test_matches_duckdb_twin(self, docs):
        out = ctext.surprisal_buckets(docs)
        _compare(out, oracles.sql_surprisal_buckets("documents"),
                 _pdf(docs), ["doc_id"])

    def test_empty_docs_land_in_tail(self, docs):
        rows = {r["doc_id"]: r for r in
                ctext.surprisal_buckets(docs).collect()}
        assert rows[8]["avg_q"] == ctext.SURPRISAL_EMPTY
        assert rows[8]["bucket"] == 2 and rows[9]["bucket"] == 2

    def test_buckets_equal_population(self, docs):
        rows = ctext.surprisal_buckets(docs).collect()
        from collections import Counter

        sizes = Counter(r["bucket"] for r in rows)
        assert sorted(sizes.values()) == [3, 3, 4]  # 10 docs over 3 buckets

    def test_repartition_invariant(self, docs):
        a = sorted(map(tuple, ctext.surprisal_buckets(docs).collect()))
        b = sorted(map(tuple,
                   ctext.surprisal_buckets(docs.repartition(5)).collect()))
        assert a == b


class TestNovelty:
    def test_matches_duckdb_twin(self, docs):
        out = ctext.novelty_scores(docs)
        _compare(out, oracles.sql_novelty("documents"),
                 _pdf(docs), ["doc_id"])

    def test_shared_passage_lowers_novelty(self, spark):
        shared = "alpha beta gamma delta epsilon zeta"
        df = spark.createDataFrame(
            [(0, shared + " unique0 only0 here0 now0"),
             (1, shared + " unique1 only1 here1 now1"),
             (2, "completely different words without any overlap at all")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ctext.novelty_scores(df).collect()}
        # docs 0/1 share the 6-token passage's shingles; doc 2 shares nothing
        assert rows[2]["novel_pct"] == 100
        assert rows[0]["novel_pct"] < 100 and rows[1]["novel_pct"] < 100
        assert rows[0]["n_novel"] < rows[0]["n_shingles"]

    def test_short_doc_null_pct(self, spark):
        df = spark.createDataFrame(
            [(0, "one two three"), (1, "the quick brown fox jumps")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ctext.novelty_scores(df).collect()}
        # 3 tokens < n=4 → no shingles → NULL pct, zero counts
        assert rows[0]["n_shingles"] == 0 and rows[0]["novel_pct"] is None
        assert rows[1]["n_shingles"] == 2 and rows[1]["novel_pct"] == 100
