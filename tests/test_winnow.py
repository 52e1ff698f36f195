"""text.winnow_fingerprints: the winnowing guarantee (any shared run of
w+k-1 tokens yields a shared fingerprint), edge cases, determinism."""
from __future__ import annotations

import random

from git_prov_spark.corpus.text import winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_guarantee_shared_run(spark):
    # k=3, w=4 -> any shared run of 6 tokens must share >= 1 fingerprint
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(50)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    rows = []
    for d in range(8):
        pre = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9)))
        post = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9)))
        rows.append((d, " ".join(x for x in (pre, shared, post) if x)))
    out = winnow_fingerprints(_docs(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    common = set.intersection(*(by_doc[d] for d in range(8)))
    assert common, "every doc embeds the 6-token run; fps must intersect"


def test_disjoint_docs_share_nothing(spark):
    rows = [(1, " ".join(f"a{i}" for i in range(30))),
            (2, " ".join(f"b{i}" for i in range(30)))]
    out = winnow_fingerprints(_docs(spark, rows)).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert not (fps[1] & fps[2])


def test_short_and_null_docs_emit_nothing(spark):
    # < k tokens -> no grams; k..k+w-2 grams -> no full window
    rows = [(1, "a b"), (2, "a b c d e"), (3, None), (4, "")]
    out = winnow_fingerprints(_docs(spark, rows)).collect()
    assert out == []


def test_minimum_emitting_doc_and_positions(spark):
    # exactly w+k-1 = 6 tokens -> exactly one window, one fingerprint
    out = winnow_fingerprints(
        _docs(spark, [(1, "p q r s t u")])).collect()
    assert len(out) == 1
    r = out[0]
    assert 1 <= r.pos <= 4  # a position within the single window


def test_density_and_repartition_invariance(spark):
    rng = random.Random(11)
    rows = [(d, " ".join(rng.choice("abcdefghij") for _ in range(200)))
            for d in range(20)]
    df = _docs(spark, rows)
    x = sorted(map(tuple, winnow_fingerprints(df).collect()))
    y = sorted(map(tuple, winnow_fingerprints(df.repartition(5)).collect()))
    assert x == y
    # selection density: distinct positions per doc ~ 2/(w+1) of windows,
    # loosely bounded: never more than the window count
    from collections import Counter
    per_doc = Counter(r[0] for r in x)
    for d in range(20):
        assert 1 <= per_doc[d] <= 200 - 3 + 1 - 3
