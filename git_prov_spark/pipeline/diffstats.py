"""Diff statistics (SURVEY.md §2.4 A4) — Arrow-batched pandas UDF.

Replaces the GitHub-API-provided additions/changes/deletions
(ProvenanceService.java:178,499-501). `changes = additions + deletions`
(GitHub's definition). Diff algorithm: multiset line diff (DESIGN.md §4
Derivation) — additions = lines in new not in old, deletions = the converse;
with the fixture's unique-line contents this equals git-style counts.

Vectorization note: string diffing is inherently per-row; the win from the
pandas UDF is Arrow batch transfer + one Python invocation per ~2048 rows
instead of per row (input_hint: "no per-row Python" = no row-at-a-time UDFs).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DIFF_SCHEMA = T.StructType(
    [
        T.StructField("additions", T.IntegerType()),
        T.StructField("deletions", T.IntegerType()),
        T.StructField("changes", T.IntegerType()),
    ]
)


@pandas_udf(DIFF_SCHEMA)
def diff_stats_udf(old: pd.Series, new: pd.Series) -> pd.DataFrame:
    adds, dels = [], []
    for o, n in zip(old.tolist(), new.tolist()):
        oc = Counter(("" if o is None else o).split("\n"))
        nc = Counter(("" if n is None else n).split("\n"))
        adds.append(sum((nc - oc).values()))
        dels.append(sum((oc - nc).values()))
    return pd.DataFrame(
        {"additions": adds, "deletions": dels,
         "changes": [a + d for a, d in zip(adds, dels)]}
    )


def line_counts(blob_df: DataFrame) -> DataFrame:
    """Per-(content_sha, line) multiplicities — the multiset each blob's
    content forms. The only place content strings are opened; emitted rows
    are slim (sha, line, cnt) and distribute over (sha, line)."""
    return (
        blob_df.select(
            "content_sha",
            F.explode(F.split(F.coalesce(F.col("content"), F.lit("")), "\n")).alias(
                "line"
            ),
        )
        .groupBy("content_sha", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def with_diff_stats(modified_events: DataFrame, blob_df: DataFrame) -> DataFrame:
    """Diff stats per DISTINCT (new_sha, old_sha) pair, joined back to events.

    Pure built-in formulation of the multiset line diff (same semantics as
    diff_stats_udf, property-tested for equality):

        additions = sum over lines of max(0, cnt_new - cnt_old)
        deletions = sum over lines of max(0, cnt_old - cnt_new)

    via explode -> per-(sha, line) counts -> full-outer join per pair ->
    hash agg. Everything stays JVM-side / whole-stage codegen: no content
    string ever crosses to python or rides an Arrow batch (a 2048-row batch
    of MB-sized files is GBs of executor heap — the UDF variant OOMs 20 GB
    executors at bench scale; see tools/kg_job.py runs).

    Cost scales with distinct content-version pairs x lines-per-file, not
    with event rows — identical edits (forks, replicated repos,
    cherry-picks) are diffed once. The event-side join carries just shas +
    three ints.
    """
    pairs = modified_events.select("content_sha", "prev_content_sha").distinct()
    counts = line_counts(blob_df)
    new_side = pairs.join(counts, "content_sha").select(
        "content_sha", "prev_content_sha", "line", F.col("cnt").alias("n_cnt")
    )
    old_side = pairs.join(
        counts.withColumnRenamed("content_sha", "prev_content_sha"),
        "prev_content_sha",
    ).select(
        "content_sha", "prev_content_sha", "line", F.col("cnt").alias("o_cnt")
    )
    per_line = new_side.join(
        old_side, ["content_sha", "prev_content_sha", "line"], "full_outer"
    )
    n = F.coalesce(F.col("n_cnt"), F.lit(0))
    o = F.coalesce(F.col("o_cnt"), F.lit(0))
    pair_stats = (
        per_line.groupBy("content_sha", "prev_content_sha")
        .agg(
            F.sum(F.greatest(n - o, F.lit(0))).cast("int").alias("additions"),
            F.sum(F.greatest(o - n, F.lit(0))).cast("int").alias("deletions"),
        )
        .withColumn("changes", (F.col("additions") + F.col("deletions")))
    )
    # no broadcast hint: pair_stats is tiny when edits repeat (AQE broadcasts
    # it at runtime) but can be |modifications|-sized in the worst case
    return modified_events.join(pair_stats, ["content_sha", "prev_content_sha"])
