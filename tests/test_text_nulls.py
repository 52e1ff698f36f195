"""NULL-text normalization: every corpus text operator treats a null
document exactly like an empty one (curate.training_manifest's convention),
and the DuckDB oracles agree — no size(split(NULL)) = -1 degeneracy."""
from __future__ import annotations

import duckdb
import pytest

from git_prov_spark.corpus import oracles
from git_prov_spark.corpus import text as ctext


@pytest.fixture(scope="module")
def null_docs(spark):
    return spark.createDataFrame(
        [(0, None), (1, ""), (2, "one two the a of in is on for to")],
        "doc_id long, text string",
    )


CASES = [
    (ctext.token_counts, oracles.sql_token_counts),
    (ctext.lang_id, oracles.sql_lang_id),
    (ctext.quality_signals, oracles.sql_quality),
    (ctext.bpe_token_counts, oracles.sql_bpe_token_counts),
    (ctext.repetition_signals, oracles.sql_repetition_signals),
    (ctext.fingerprints, oracles.sql_fingerprints),
]


@pytest.mark.parametrize("spark_fn,sql_fn", CASES, ids=[f.__name__ for f, _ in CASES])
def test_null_text_matches_oracle(null_docs, spark_fn, sql_fn):
    got = spark_fn(null_docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", null_docs.toPandas())
    want = con.execute(sql_fn("documents")).fetchdf().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(got.columns):
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c
    # and no degenerate negative counts anywhere
    for c in got.columns:
        if got[c].dtype.kind in "if":
            assert (got[c] >= 0).all(), c


# ---------------------------------------------------------------------------
# NFC normalization


def test_nfc_composes_decomposed_forms(spark):
    import unicodedata

    from git_prov_spark.corpus.text import nfc_normalize

    rows = [
        (1, "café"),          # decomposed -> composed, 5 -> 4 chars
        (2, "café"),           # already NFC
        (3, None),                   # null -> ''
        (4, "Å ascii ẍ"),  # Å and ẍ decomposed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in nfc_normalize(df).collect()}
    assert out[1].changed and (out[1].n_chars_raw, out[1].n_chars_nfc) == (5, 4)
    assert not out[2].changed and out[2].n_chars_nfc == 4
    # docs 1 and 2 normalize to the SAME text -> same sha (the dedup win)
    assert out[1].sha_nfc == out[2].sha_nfc
    assert not out[3].changed and out[3].n_chars_nfc == 0
    assert out[4].changed
    assert out[4].n_chars_nfc == len(
        unicodedata.normalize("NFC", rows[3][1]))


def test_nfc_repartition_invariant(spark):
    from git_prov_spark.corpus.text import nfc_normalize

    rows = [(i, f"w{i} é" * (i % 4)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    x = sorted(map(tuple, nfc_normalize(df).collect()))
    y = sorted(map(tuple, nfc_normalize(df.repartition(7)).collect()))
    assert x == y


def test_bm25_saturation_and_idf(spark):
    """BM25 semantics on a hand-computable corpus: rare terms outrank
    stopwords, tf saturates, longer docs penalized."""
    from git_prov_spark.corpus.text import bm25_topk

    # 9 docs, 'rare' in 2 → idf_bits = flog2((18-4+1)//5) = 1;
    # 'common' in 7/9 → 0 bits (stopword suppression)
    docs = spark.createDataFrame(
        [(1, "rare common common common"),
         (2, "rare rare common common"),
         (3, "common common common common common common common common"),
         (4, "other words entirely"),
         (5, None)] + [(i, "common filler") for i in range(6, 10)],
        "doc_id long, text string")
    res = {r.doc_id: r.bm25
           for r in bm25_topk(docs, ["rare", "common"], k=5).collect()}
    # 'common' is in >half the docs → 0 idf bits; 'rare' in 2/5 → >0 bits
    assert res[1] > 0 and res[2] > 0
    assert res[3] == 0.0            # only stopword hits
    assert 4 not in res and 5 not in res   # no query term / empty
    assert res[2] > res[1]          # higher tf, same dl → higher score
