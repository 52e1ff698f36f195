"""Canonical-URL dedup (r5): canonicalization goldens over the documented
normalization steps, and the url_dupes aggregate+join shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.dedup import canonical_url, url_dupes


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonicalization_goldens(spark):
    got = _canon(spark, [
        # scheme+host lowercase, www. stripped, default port stripped,
        # fragment dropped, trailing slash stripped, tracking params
        # dropped, survivors sorted — PATH CASE PRESERVED (case-sensitive)
        "HTTP://WWW.Example.COM:80/Path/?utm_source=a&b=2&a=1#x",
        "https://example.com",               # empty path -> '/'
        "https://example.com:8080/x",        # non-default port kept
        "https://example.com/x?utm_source=a&fbclid=1&gclid=2&ref=z",
        "example.com/x/",                    # scheme-less stays a key
        "  https://example.com/x  ",         # trimmed
        "https://example.com//a//b///",      # only TRAILING runs stripped
    ])
    assert got == [
        "http://example.com/Path?a=1&b=2",
        "https://example.com/",
        "https://example.com:8080/x",
        "https://example.com/x",
        "example.com/x",
        "https://example.com/x",
        "https://example.com//a//b",
    ]


def test_equivalent_spellings_collapse(spark):
    spellings = [
        "https://www.site.com/a/b?utm_source=x&q=1",
        "HTTPS://site.com:443/a/b/?q=1&utm_campaign=y",
        "https://site.com/a/b?q=1#section",
        "https://site.com/a/b?q=1",
    ]
    assert len(set(_canon(spark, spellings))) == 1
    # and a genuinely different page does NOT collapse
    assert len(set(_canon(spark, ["https://site.com/a/b?q=1",
                                  "https://site.com/a/b?q=2",
                                  "http://site.com/a/b?q=1"]))) == 3


def test_url_dupes_shape_and_keeper(spark):
    df = spark.createDataFrame(
        [(1, "https://www.a.com/x/"), (2, "https://a.com/x"),
         (3, "HTTP://b.org/y#f"), (4, "http://b.org/y"),
         (5, "https://c.net/z")],
        "doc_id long, url string")
    got = {(r.doc_id, r.canonical_id) for r in url_dupes(df).collect()}
    assert got == {(2, 1), (4, 3)}
    plan = url_dupes(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
