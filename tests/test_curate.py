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
