"""Diff-stats pandas UDF (A4) vs hand-computed goldens and the oracle fn."""

from __future__ import annotations

from git_prov_spark.oracle import diff_counts
from git_prov_spark.pipeline.diffstats import diff_stats_udf
from pyspark.sql import functions as F

CASES = [
    ("a\nb\nc", "a\nb\nc", 0, 0),
    ("a\nb\nc", "a\nx\nc", 1, 1),          # one line replaced
    ("a\nb", "a\nb\nc\nd", 2, 0),          # two added
    ("a\nb\nc", "a", 0, 2),                # two deleted
    ("", "x", 1, 1),                        # empty -> one line ('' counts as a line)
    ("x", "", 1, 1),
    ("a\na\nb", "a\nb", 0, 1),             # multiset: one duplicate removed
]


def test_python_goldens():
    for old, new, a, d in CASES:
        assert diff_counts(old, new) == (a, d), (old, new)


def test_udf_matches_python(spark):
    df = spark.createDataFrame(
        [(old, new) for old, new, _, _ in CASES], "old string, new string"
    )
    rows = df.select("old", "new", diff_stats_udf("old", "new").alias("s")).collect()
    for r in rows:
        a, d = diff_counts(r.old, r.new)
        assert (r.s.additions, r.s.deletions, r.s.changes) == (a, d, a + d)


def test_sql_path_matches_python(spark):
    """The built-in (explode + full-outer + agg) path in with_diff_stats must
    reproduce the UDF/oracle multiset semantics exactly."""
    from git_prov_spark.pipeline.diffstats import with_diff_stats

    blob_rows = []
    event_rows = []
    for i, (old, new, _, _) in enumerate(CASES):
        blob_rows += [(f"old{i}", old), (f"new{i}", new)]
        event_rows.append((f"r{i}", f"p{i}", f"new{i}", f"old{i}"))
    blobs = spark.createDataFrame(blob_rows, "content_sha string, content string")
    events = spark.createDataFrame(
        event_rows, "repo string, path string, content_sha string, prev_content_sha string"
    )
    out = {
        (r.repo): (r.additions, r.deletions, r.changes)
        for r in with_diff_stats(events, blobs).collect()
    }
    assert len(out) == len(CASES)
    for i, (old, new, _, _) in enumerate(CASES):
        a, d = diff_counts(old, new)
        assert out[f"r{i}"] == (a, d, a + d), (old, new)


def test_sql_path_property_random(spark):
    """Randomized cross-check: SQL path == python oracle on arbitrary
    line-multiset contents (dupes, empties, shared lines)."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "", "x y", "z"]
    cases = []
    for _ in range(25):
        old = "\n".join(rng.choice(vocab) for _ in range(rng.randrange(0, 8)))
        new = "\n".join(rng.choice(vocab) for _ in range(rng.randrange(0, 8)))
        cases.append((old, new))
    from git_prov_spark.pipeline.diffstats import with_diff_stats

    blob_rows, event_rows = [], []
    for i, (old, new) in enumerate(cases):
        blob_rows += [(f"o{i}", old), (f"n{i}", new)]
        event_rows.append((f"r{i}", "p", f"n{i}", f"o{i}"))
    blobs = spark.createDataFrame(blob_rows, "content_sha string, content string")
    events = spark.createDataFrame(
        event_rows, "repo string, path string, content_sha string, prev_content_sha string"
    )
    out = {
        r.repo: (r.additions, r.deletions)
        for r in with_diff_stats(events, blobs).collect()
    }
    for i, (old, new) in enumerate(cases):
        assert out[f"r{i}"] == diff_counts(old, new), (old, new)
