"""Driver-contract edge cases: queries() vs oracle_sql() parity on synthetic
tables the real testdata doesn't cover (empty docs, whitespace-only docs).

Mirrors the driver's compare (tools/check_queries.py): sorted columns,
order-insensitive exact values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("∅")
            elif isinstance(v, float):
                row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return rows


def compare_entry(spark, sf_dir: str, name: str) -> None:
    """Run one queries() entry on Spark and its oracle on DuckDB; assert
    identical columns + values (the driver's gate, locally)."""
    import __spark_entry__ as entrymod

    spdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark writes a directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(spdf.columns) == sorted(odf.columns)
    assert _normalize(spdf) == _normalize(odf), name


@pytest.fixture(scope="module")
def edge_docs_dir(spark, tmp_path_factory):
    """documents table with empty / whitespace-only / normal texts adjacent to
    each other so every consecutive diff pair shape is exercised."""
    d = str(tmp_path_factory.mktemp("edge") / "docs")
    rows = [
        (0, "s0", "en", "alpha beta gamma"),
        (1, "s0", "en", ""),                  # normal -> empty
        (2, "s0", "en", ""),                  # empty -> empty
        (3, "s0", "en", "   "),               # empty -> whitespace-only
        (4, "s0", "en", "alpha beta"),        # whitespace -> normal
        (5, "s0", "en", "alpha beta delta"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_diffstats_oracle_empty_docs(spark, edge_docs_dir):
    compare_entry(spark, edge_docs_dir, "udf_diffstats")


def test_text_oracles_empty_docs(spark, edge_docs_dir):
    for name in ("text_tokens", "text_quality", "text_fingerprint",
                 "text_tokens_bpe", "text_repetition", "dedup_spans"):
        compare_entry(spark, edge_docs_dir, name)


def test_bpe_regex_cross_engine_adversarial(spark):
    """The BPE-ish pretokenizer regex must produce the IDENTICAL token list
    in Spark (Java regex) and DuckDB (RE2) — unicode letters, emoji,
    non-breaking space, mixed-script digits."""
    import duckdb
    from pyspark.sql import functions as F

    from git_prov_spark.corpus.text import BPE_TOKEN_PATTERN

    cases = [
        "hello world", "don't stop", "a1b2 c3", "café 中文 text",
        "x...y!!z", "  spaced  out  ", "", "h0ß", "emoji \U0001f600 here",
        "tab\tsep\nnewline", "num 1234 mix12mix", "рус abc",
        "\xa0nbsp\xa0tok", "mixed١٢arabic digits",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = {
        r.t: r.toks
        for r in df.select(
            "t",
            F.expr(f"regexp_extract_all(t, r'{BPE_TOKEN_PATTERN}', 0)").alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    for c in cases:
        want = con.execute(
            "SELECT regexp_extract_all(?, ?)", [c, BPE_TOKEN_PATTERN]
        ).fetchone()[0]
        assert got[c] == want, repr(c)


def test_ngram_df_cap_above_testdata_df():
    """The default stopword-shingle cap must not change results on the
    bench/correctness corpora: max shingle df there is far below the cap."""
    from git_prov_spark.corpus.dedup import DEFAULT_NGRAM_MAX_DF
    from git_prov_spark.corpus.oracles import shingles_cte, toks_cte

    for sf in ("sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
        max_df = con.execute(
            f"WITH toks AS ({toks_cte('documents')}), sh AS ({shingles_cte(4)}) "
            "SELECT max(c) FROM (SELECT count(*) AS c FROM sh GROUP BY shingle)"
        ).fetchone()[0]
        assert max_df < DEFAULT_NGRAM_MAX_DF, (sf, max_df)
