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


def with_diff_stats(modified_events: DataFrame, blob_df: DataFrame) -> DataFrame:
    """Diff stats per DISTINCT (new_sha, old_sha) pair, joined back to events.

    The UDF cost scales with distinct content-version pairs, not with event
    rows — identical edits (forks, replicated repos, cherry-picks) are diffed
    once. Content strings only flow through the tiny distinct-pair join; the
    event-side join carries just shas + three ints."""
    pairs = modified_events.select("content_sha", "prev_content_sha").distinct()
    new_blobs = blob_df.select(
        "content_sha", F.col("content").alias("new_content")
    )
    old_blobs = blob_df.select(
        F.col("content_sha").alias("prev_content_sha"),
        F.col("content").alias("old_content"),
    )
    pair_stats = (
        pairs.join(new_blobs, "content_sha")
        .join(old_blobs, "prev_content_sha")
        .withColumn("diff", diff_stats_udf(F.col("old_content"), F.col("new_content")))
        .select(
            "content_sha", "prev_content_sha",
            F.col("diff.additions").alias("additions"),
            F.col("diff.deletions").alias("deletions"),
            F.col("diff.changes").alias("changes"),
        )
    )
    # no broadcast hint: pair_stats is tiny when edits repeat (AQE broadcasts
    # it at runtime) but can be |modifications|-sized in the worst case
    return modified_events.join(pair_stats, ["content_sha", "prev_content_sha"])
