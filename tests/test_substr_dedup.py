"""Token-granularity exact-substring dedup (dedup.substring_dupes — the
Lee-et-al 50-token companion pass): planted shared passages are found at
exact token offsets, one-token near-misses are NOT matched (exactness), the
canonical (lowest-id) copy is never flagged, and the plan is aggregate+join
shaped (no pair self-join / cartesian)."""

from __future__ import annotations

import pytest

from git_prov_spark.corpus.dedup import substring_dupes

PASSAGE = " ".join(f"tok{i}" for i in range(50))          # 50 shared tokens
NEAR = " ".join(("tokX" if i == 25 else f"tok{i}") for i in range(50))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1: passage at token offset 3
        (1, "alpha beta gamma " + PASSAGE + " tail1 tail2"),
        # doc 7: same passage at token offset 0
        (7, PASSAGE + " coda"),
        # doc 9: near-miss (token 25 differs) — must not match
        (9, NEAR),
        # doc 12: unrelated
        (12, " ".join(f"word{i}" for i in range(80))),
        # doc 15: passage again at offset 1 (three-way share)
        (15, "intro " + PASSAGE),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_passages_found_at_exact_offsets(corpus):
    got = {(r.doc_id, r.span_start, r.match_doc)
           for r in substring_dupes(corpus).collect()}
    assert (7, 0, 1) in got
    assert (15, 1, 1) in got
    # canonical copy (doc 1) never flagged; near-miss and unrelated absent
    assert not any(d == 1 for d, _s, _m in got)
    assert not any(d in (9, 12) for d, _s, _m in got)
    # all matches point at the smallest sharing doc
    assert all(m == 1 for _d, _s, m in got)


def test_window_exactness_one_token_breaks_match(corpus):
    # at window=50 the near-miss shares no complete window with the passage
    got = substring_dupes(corpus).where("doc_id = 9").count()
    assert got == 0
    # at window=25 the near-miss's intact halves DO match (sanity: the
    # operator is window-exact, not doc-exact)
    got25 = substring_dupes(corpus, window=25).where("doc_id = 9").count()
    assert got25 > 0


def test_stride_subsamples_starts(corpus):
    all_starts = {(r.doc_id, r.span_start)
                  for r in substring_dupes(corpus, window=10).collect()}
    strided = {(r.doc_id, r.span_start)
               for r in substring_dupes(corpus, window=10,
                                        stride=5).collect()}
    assert strided < all_starts
    assert all(s % 5 == 0 for _d, s in strided)


def test_no_pair_selfjoin_in_plan(corpus):
    plan = substring_dupes(corpus)._jdf.queryExecution() \
        .executedPlan().toString().lower()
    assert "cartesianproduct" not in plan
    assert "broadcastnestedloop" not in plan


def test_validation(corpus):
    with pytest.raises(ValueError):
        substring_dupes(corpus, window=0)
    with pytest.raises(ValueError):
        substring_dupes(corpus, stride=0)


# ---------------------------------------------------------------------------
# containment


def test_containment_catches_subset_jaccard_misses(spark):
    from git_prov_spark.corpus.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    inner = " ".join(f"q{i}" for i in range(8))            # 8 tokens
    host = " ".join(f"h{i}" for i in range(40)) + " " + inner
    rows = [(1, inner), (2, host), (3, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = containment_pairs(df, n=4, min_pct=80).collect()
    assert [(r.d1, r.d2) for r in cont] == [(1, 2)]
    assert cont[0].containment_bp == 10000          # fully contained
    # resemblance at 60% finds nothing — the signal only containment has
    assert ngram_jaccard_pairs(df, n=4, min_pct=60).collect() == []


def test_containment_threshold_and_direction_symmetry(spark):
    from git_prov_spark.corpus.dedup import containment_pairs

    # half of doc 1's shingles appear in doc 2 -> containment 50%
    a = " ".join(f"s{i}" for i in range(8))          # shingles s0..s4 (5)
    b = " ".join(f"s{i}" for i in range(4)) + " " + \
        " ".join(f"z{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string")
    assert containment_pairs(df, n=4, min_pct=80).collect() == []
    low = containment_pairs(df, n=4, min_pct=20).collect()
    assert len(low) == 1 and low[0].n_small == 5


def test_editdist_verify_propose_then_verify(spark):
    from git_prov_spark.corpus.dedup import editdist_verify

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tok7x")          # 1 char apart
    far = " ".join(f"zz{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    out = {(r.d1, r.d2): r for r in editdist_verify(df, max_dist=5).collect()}
    assert (1, 2) in out
    # 1 edit for the inserted char + 1 at the 200-char cap boundary
    # (the insertion shifts the truncation window by one character)
    assert out[(1, 2)].dist == 2 and out[(1, 2)].is_dup
    # doc 3 shares no shingles -> never proposed by LSH at all
    assert not any(3 in k for k in out)


def test_near_dup_keep_best_prefers_longest(spark):
    from git_prov_spark.corpus.dedup import near_dup_keep_best

    # doc 1 (short mirror, smaller id) vs doc 2 (complete, larger id):
    # min-id canonical would keep 1; quality keeper must keep 2
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " iota kappa"), (50, "unrelated words only")],
        "doc_id long, text string")
    got = {(r.doc_id, r.cluster_id, r.keep)
           for r in near_dup_keep_best(docs, n=4).collect()}
    assert got == {(1, 1, False), (2, 1, True)}
