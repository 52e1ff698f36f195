"""text.blocklist_filter and text.pmi_collocations: deterministic small
fixtures with hand-computed expectations, null/edge handling, and the
broadcast-join plan shape for the source blocklist."""
from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.text import blocklist_filter, pmi_collocations


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


def test_blocklist_verdicts(spark):
    df = _docs(spark, [
        (1, "clean text here", "good"),
        (2, "one bad word here", "good"),
        (3, "bad bad words", "good"),
        (4, "clean text", "evil"),
        (5, None, "good"),
    ])
    out = {r.doc_id: r for r in blocklist_filter(
        df, blocked_sources=["evil"], bad_words=["bad"],
        max_hits=1).collect()}
    assert out[1].keep and out[1].n_bad_hits == 0
    assert out[2].keep and out[2].n_bad_hits == 1      # at the threshold
    assert not out[3].keep and out[3].n_bad_hits == 2  # over it
    assert not out[4].keep and out[4].src_blocked
    assert out[5].keep and out[5].n_tokens == 0        # null text = empty


def test_blocklist_broadcasts_source_dim(spark):
    df = _docs(spark, [(1, "x", "good")])
    plan = (blocklist_filter(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pmi_hand_computed(spark):
    # corpus: "a b" x8, "c d" x2, plus "a d" x2 noise
    rows = [(i, "a b", "s") for i in range(8)]
    rows += [(10 + i, "c d", "s") for i in range(2)]
    rows += [(20 + i, "a d", "s") for i in range(2)]
    out = pmi_collocations(_docs(spark, rows), min_count=2).collect()
    got = {(r.w1, r.w2): r for r in out}
    # margins: n(a,*)=10, n(*,b)=8, n(c,*)=2, n(*,d)=4, N=12
    ab = got[("a", "b")]
    assert (ab.n_ab, ab.n_a, ab.n_b) == (8, 10, 8)
    # flog2(8)+flog2(12)-flog2(10)-flog2(8) = 3+3-3-3 = 0
    assert ab.pmi_bits == 0
    cd = got[("c", "d")]
    assert (cd.n_ab, cd.n_a, cd.n_b) == (2, 2, 4)
    # flog2(2)+flog2(12)-flog2(2)-flog2(4) = 1+3-1-2 = 1
    assert cd.pmi_bits == 1
    # c d is the stronger collocation despite 4x fewer occurrences
    assert out[0].w1 == "c" and out[0].w2 == "d"


def test_pmi_min_count_prunes_and_short_docs_skipped(spark):
    rows = [(1, "x y", "s"), (2, "solo", "s"), (3, "", "s")]
    out = pmi_collocations(_docs(spark, rows), min_count=2).collect()
    assert out == []  # (x,y) count 1 pruned; 1-token/empty docs no pairs


def test_pmi_repartition_invariant(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{i % 3}", "s")
            for i in range(200)]
    df = _docs(spark, rows)
    x = [tuple(r) for r in pmi_collocations(df).collect()]
    y = [tuple(r) for r in pmi_collocations(df.repartition(7)).collect()]
    assert x == y
