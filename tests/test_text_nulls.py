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
