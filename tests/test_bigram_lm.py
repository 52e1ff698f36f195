"""text.bigram_surprisal: hand-computed LM bits on a tiny corpus where
the train slice, seen/backoff/OOV branches, and div-floor means are all
pinned; plus repartition invariance."""
from __future__ import annotations

from git_prov_spark.corpus.text import (
    BACKOFF_PENALTY_BITS,
    OOV_BITS_EXTRA,
    bigram_surprisal,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def flog2(x):
    return x.bit_length() - 1


def test_branches_hand_computed(spark):
    # train slice = docs passing the 20*stop >= n rule:
    #   doc 1: "the cat the cat" (2 'the' of 4 -> en)
    #   doc 2: "the cat sat" (1 of 3 -> en)
    # LM: uni c(the)=3, c(cat)=3, c(sat)=1, T=7
    # big: (the,cat)=3, (cat,the)=1, (cat,sat)=1
    rows = [
        (1, "the cat the cat"),
        (2, "the cat sat"),
        (3, "cat zzz"),          # not en -> scored only
        (4, "solo"),             # <2 tokens -> unscored
    ]
    out = {r.doc_id: r for r in bigram_surprisal(_docs(spark, rows)).collect()}
    # doc 2 transitions: (the,cat) seen: flog2(3)-flog2(3)=0;
    # (cat,sat) seen: flog2(3)-flog2(1)=1 -> sum 1, n 2
    assert (out[2].n_scored, out[2].sum_bits) == (2, 1)
    assert out[2].mean_microbits == 500000
    # doc 3: (cat,zzz) unseen bigram, zzz OOV:
    # bits = flog2(T+1) + OOV = 3 + 8 = 11
    assert (out[3].n_scored, out[3].sum_bits) == (1, flog2(8) + OOV_BITS_EXTRA)
    # doc 4 unscored -> zeros and NULL mean
    assert (out[4].n_scored, out[4].sum_bits) == (0, 0)
    assert out[4].mean_microbits is None


def test_backoff_branch(spark):
    # train: "the a x" (2 stop of 3 -> en): uni x=1,the=1,a=1, T=3.
    # scoring doc 5 "x x" (no stopwords -> NOT in the train slice):
    # bigram (x,x) unseen, 'x' in vocab ->
    # backoff: 4 + flog2(T+1) - flog2(c(x)) = 4 + 2 - 0 = 6
    rows = [(1, "the a x"), (5, "x x")]
    out = {r.doc_id: r for r in bigram_surprisal(_docs(spark, rows)).collect()}
    assert out[5].sum_bits == BACKOFF_PENALTY_BITS + 2


def test_repartition_invariant(spark):
    rows = [(i, f"the w{i % 9} of w{(i + 2) % 9} a w{i % 4}")
            for i in range(120)]
    df = _docs(spark, rows)
    x = sorted(map(tuple, bigram_surprisal(df).collect()))
    y = sorted(map(tuple, bigram_surprisal(df.repartition(13)).collect()))
    assert x == y
