"""Version chains (SURVEY.md §2.5 W1-W3) over change events.

The reference's `entityVersions` map (ProvenanceService.java:92,294-299,548-551)
is a per-path insertion-ordered sha list appended for EVERY change-set status
(quirk §5.3.3). Its lookup `getParentCommitSha` == lag(commit) over the ordered
change events — one window, keyed like the changelog window so Catalyst reuses
the partitioning when stages align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_version_chain(events: DataFrame) -> DataFrame:
    """Add parent_commit (W1) and is_first_version (W3) to change events."""
    w = Window.partitionBy("repo", "path").orderBy("commit_seq")
    return events.select(
        "*",
        F.lag("commit").over(w).alias("parent_commit"),
        (F.row_number().over(w) == 1).alias("is_first_version"),
    )


def ensure_commit_seq(commits: DataFrame) -> DataFrame:
    """Mint commit_seq when the source lacks it (W2): oldest-first order, ties
    broken by sha — the reference's Collections.reverse order
    (ProvenanceService.java:128)."""
    if "commit_seq" in commits.columns:
        return commits
    w = Window.partitionBy("repo").orderBy("authored_at", "commit")
    return commits.withColumn("commit_seq", F.row_number().over(w) - 1)
