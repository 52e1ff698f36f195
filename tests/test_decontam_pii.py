"""Decontamination (n-gram overlap vs an eval set) and PII scrubbing:
hand-crafted goldens + the broadcast / map-side plan invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.decontam import contamination_report, decontaminate
from git_prov_spark.corpus.text import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_report_golden(spark):
    train = _docs(spark, [
        (1, "a b c d e f"),          # shares 'a b c d' + 'b c d e' + 'c d e f'
        (2, "x y z w q r"),          # disjoint
        (3, "c d e f zz"),           # shares 'c d e f'
        (4, None),                   # null text → zero shingles
    ])
    eval_df = _docs(spark, [(100, "a b c d e f g")])
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in contamination_report(train, eval_df, n=4).collect()
    }
    assert got == {1: (3, True), 2: (0, False), 3: (1, True), 4: (0, False)}


def test_decontaminate_drops_flagged_rows_only(spark):
    train = _docs(spark, [
        (1, "a b c d e f"), (2, "x y z w q r"), (3, "c d e f zz"),
    ])
    eval_df = _docs(spark, [(100, "a b c d e f g")])
    kept = decontaminate(train, eval_df, n=4)
    assert {r.doc_id for r in kept.collect()} == {2}
    assert kept.columns == train.columns  # all columns pass through


def test_contamination_eval_side_broadcasts(spark):
    """The scale invariant: eval shingles broadcast, the corpus side joins
    map-side — no shuffle of the training shingles, no cartesian."""
    train = _docs(spark, [(i, f"w{i} a b c d w{i+1}") for i in range(50)])
    eval_df = _docs(spark, [(100, "a b c d")])
    plan = (
        contamination_report(train, eval_df, n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_scrub_goldens(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "card 1234567890123456 short 12345678"),
        (4, "alice@ex.io from 8.8.8.8 ref 999999999"),
        (5, None),
        (6, "no pii here"),
    ]
    got = {r.doc_id: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (got[1].n_emails, got[1].n_ips, got[1].n_longnums) == (1, 0, 0)
    assert got[1].scrubbed == "mail [EMAIL] now"
    assert (got[2].n_emails, got[2].n_ips, got[2].n_longnums) == (0, 2, 0)
    assert got[2].scrubbed == "server [IP] and [IP] up"
    # 16-digit card matches the 9+ run once; 8-digit stays
    assert (got[3].n_emails, got[3].n_ips, got[3].n_longnums) == (0, 0, 1)
    assert got[3].scrubbed == "card [NUM] short 12345678"
    assert (got[4].n_emails, got[4].n_ips, got[4].n_longnums) == (1, 1, 1)
    assert got[4].scrubbed == "[EMAIL] from [IP] ref [NUM]"
    assert got[5].scrubbed == "" and got[5].n_emails == 0
    assert got[6].scrubbed == "no pii here"


def test_pii_scrub_no_double_counting(spark):
    """A digit-heavy email and an IP must each be counted once, in their
    own class — the progressive-scrub order guarantees it."""
    rows = [(1, "123456789012@digits.example.com at 10.20.30.40")]
    r = pii_scrub(_docs(spark, rows)).collect()[0]
    assert (r.n_emails, r.n_ips, r.n_longnums) == (1, 1, 0)
    assert r.scrubbed == "[EMAIL] at [IP]"


def test_pii_scrub_is_map_side(spark):
    rows = [(i, f"user{i}@x.io") for i in range(20)]
    plan = (
        pii_scrub(_docs(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffle


# -- semantic (embedding-level) decontamination ------------------------------

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _unit(seed, dim=64):
    """Deterministic pseudo-random unit-ish vector (no RNG)."""
    return [((seed * 31 + i * 17) % 97 - 48) / 48.0 for i in range(dim)]


def test_semantic_contamination_catches_exact_leak(spark):
    from git_prov_spark.corpus.decontam import semantic_contamination

    leak = _unit(7)
    train = _vecs(spark, [(1, leak), (2, _unit(11)), (3, _unit(23))])
    eval_df = _vecs(spark, [(100, leak)])  # identical vector leaked
    got = {r.vec_id: r for r in
           semantic_contamination(train, eval_df, threshold=0.95).collect()}
    # identical vector: same bucket (mask 0 probe), cosine 1.0
    assert got[1].contaminated and got[1].n_hits == 1
    assert abs(got[1].max_cos_r - 1.0) < 1e-9
    assert not got[2].contaminated and got[2].max_cos_r is None
    assert not got[3].contaminated


def test_semantic_contamination_near_dup_crosses_one_bit(spark):
    """A slightly perturbed leak may flip ONE hyperplane sign — the
    hamming-1 probe expansion still catches it."""
    from git_prov_spark.corpus.decontam import semantic_contamination

    base = _unit(7)
    near = list(base)
    near[0] += 0.05  # small perturbation: cosine stays ~1
    train = _vecs(spark, [(1, near), (2, _unit(41))])
    eval_df = _vecs(spark, [(100, base)])
    got = {r.vec_id: r for r in
           semantic_contamination(train, eval_df, threshold=0.9).collect()}
    assert got[1].contaminated and got[1].max_cos_r > 0.99


def test_semantic_contamination_eval_side_broadcasts(spark):
    from git_prov_spark.corpus.decontam import semantic_contamination

    train = _vecs(spark, [(i, _unit(i)) for i in range(30)])
    eval_df = _vecs(spark, [(100, _unit(3))])
    plan = (
        semantic_contamination(train, eval_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_decontaminate_surgical(spark):
    """A doc with one contaminated window keeps its clean windows —
    where doc-level decontam drops the whole doc."""
    from git_prov_spark.corpus.decontam import (
        contamination_report, span_decontaminate)

    leak = "secret eval answer key"
    clean = " ".join(f"w{i}" for i in range(8))
    train = spark.createDataFrame(
        [(1, clean + " " + leak), (2, clean)],
        "doc_id long, text string")
    ev = spark.createDataFrame([(9, leak)], "doc_id long, text string")
    spans = {(r.doc_id, r.chunk_idx): r.keep
             for r in span_decontaminate(train, ev, window=8, overlap=0,
                                         n=4).collect()}
    # doc 1: window 0 = w0..w7 clean; window 1 = leak → dropped
    assert spans[(1, 0)] is True and spans[(1, 1)] is False
    assert spans[(2, 0)] is True
    # doc-level would reject doc 1 wholesale
    doc = {r.doc_id: r.contaminated
           for r in contamination_report(train, ev, n=4).collect()}
    assert doc[1] is True and doc[2] is False


def test_span_cleaned_corpus_excision(spark):
    from git_prov_spark.corpus.decontam import span_cleaned_corpus

    leak = "secret eval answer key"
    clean8 = " ".join(f"w{i}" for i in range(8))
    tail = "t0 t1 t2"
    train = spark.createDataFrame(
        [(1, clean8 + " " + leak + " " + clean8 + " " + tail),
         (2, clean8)],
        "doc_id long, text string")
    ev = spark.createDataFrame([(9, leak)], "doc_id long, text string")
    got = {r.doc_id: (r.cleaned_text, r.n_tokens_kept, r.n_chunks_dropped)
           for r in span_cleaned_corpus(train, ev, window=8, overlap=0,
                                        n=4).collect()}
    # doc 1: windows of 8 tokens; the leak window drops, the rest rejoin
    text1, kept1, dropped1 = got[1]
    assert dropped1 == 1
    assert leak.split()[0] not in text1.split()
    assert text1.startswith(clean8) and text1.endswith(tail)
    assert kept1 == len(text1.split())
    # doc 2 untouched
    assert got[2] == (clean8, 8, 0)
