"""Gopher-style quality gate + BPE bigram stats (r5): Spark ops vs their
DuckDB twins on adversarial in-memory docs — null/empty text, single-line
vs repeated-line docs, threshold-boundary word counts and mean lengths."""
from __future__ import annotations

import duckdb
import pytest

from git_prov_spark.corpus import oracles
from git_prov_spark.corpus import text as ctext


@pytest.fixture(scope="module")
def gate_docs(spark):
    long_ok = " ".join(["the quick brown lamp over rivers"] * 5)  # 30 words
    short = "tiny doc here"                                       # < 20 words
    shouty = " ".join(["a"] * 25)                                 # mean len 1
    punct = ("the " * 24) + "!!!!....;;;;::::????" * 3            # punct-heavy
    dup_lines = "\n".join(["the same line of this doc"] * 4 + ["the unique one"])
    varied_lines = "\n".join(
        f"the line number {i} of doc is on for with" for i in range(6))
    return spark.createDataFrame(
        [(0, None), (1, ""), (2, long_ok), (3, short), (4, shouty),
         (5, punct), (6, dup_lines), (7, varied_lines)],
        "doc_id long, text string",
    )


def _compare(sdf, sql, pdf, order_cols):
    got = sdf.toPandas().sort_values(order_cols).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(sql).fetchdf().sort_values(order_cols).reset_index(
        drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(got.columns):
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    return got


def test_quality_gate_matches_oracle(gate_docs):
    got = _compare(ctext.quality_gate(gate_docs),
                   oracles.sql_quality_gate("documents"),
                   gate_docs.toPandas(), ["doc_id"])
    by_id = got.set_index("doc_id")
    # empty/null docs fail (word count + stopwords)
    assert not by_id.loc[0, "keep"] and not by_id.loc[1, "keep"]
    assert bool(by_id.loc[2, "keep"])
    assert not by_id.loc[3, "r_wordcount"]          # too short
    assert not by_id.loc[4, "r_meanlen"]            # mean token length 1
    assert not by_id.loc[5, "r_symbol"]             # punctuation-heavy
    assert not by_id.loc[6, "r_dupline"]            # one line is 4/5 of doc
    assert bool(by_id.loc[7, "r_dupline"])          # all lines distinct
    # keep is exactly the conjunction
    rules = ["r_wordcount", "r_meanlen", "r_symbol", "r_stopword", "r_dupline"]
    assert (got["keep"] == got[rules].all(axis=1)).all()


def test_bigram_stats_matches_oracle(spark):
    docs = spark.createDataFrame(
        [(0, "to be or not to be"), (1, "to be is to do"),
         (2, "do be do be do"), (3, None), (4, "single"), (5, "")],
        "doc_id long, text string",
    )
    got = _compare(ctext.bigram_stats(docs, min_total=2, top_k=50),
                   oracles.sql_bigram_stats("documents", top_k=50, min_total=2),
                   docs.toPandas(), ["n_total", "pair"])
    pairs = dict(zip(got["pair"], got["n_total"]))
    # "to be" appears twice in doc 0 and once in doc 1; "do be"/"be do" twice
    assert pairs["to be"] == 3
    assert pairs["be do"] == 2 and pairs["do be"] == 2
    n_docs = dict(zip(got["pair"], got["n_docs"]))
    assert n_docs["to be"] == 2      # distinct docs, not occurrences
    # min_total pruned singletons ("not to", "be or", ...)
    assert (got["n_total"] >= 2).all()


def test_bigram_stats_topk_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta alpha beta gamma delta") for i in range(4)],
        "doc_id long, text string",
    )
    a = ctext.bigram_stats(docs, top_k=2).toPandas()
    b = ctext.bigram_stats(docs, top_k=2).toPandas()
    assert a.values.tolist() == b.values.tolist()
    # ties broken lexicographically: "alpha beta" (8) then "beta alpha" (4)
    # vs "beta gamma" (4) — "beta alpha" < "beta gamma"
    assert a["pair"].tolist() == ["alpha beta", "beta alpha"]
