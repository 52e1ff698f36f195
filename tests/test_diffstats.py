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
