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


def asof_snapshot(files: DataFrame, commits: DataFrame,
                  seq: int) -> DataFrame:
    """(repo, path, commit, content_sha) — the repository tree as of
    commit sequence `seq`. The time-travel query a provenance KG exists
    to answer ("what did the repo look like at commit T").

    The files relation is SNAPSHOT-form (one row per path PRESENT in a
    commit; absence at the next seq is how changelog.py detects
    removals), so the as-of tree is exactly the file set of ONE commit:
    the newest commit_seq <= seq per repo. That makes the plan a
    broadcast semi-join of the files scan against a per-repo winning
    (repo, commit) pair — no shuffle of file rows at all, deletions
    handled by construction (a deleted path simply has no row in the
    winning snapshot). content_sha carries the per-row sha256 invariant
    (BASELINE.json input_hint) computed map-side on the pruned scan;
    content itself never leaves the mappers.

    Repos whose history starts after `seq` (no commit_seq <= seq)
    contribute nothing — the repo did not exist yet."""
    seqd = ensure_commit_seq(commits).select("repo", "commit", "commit_seq")
    win = (
        seqd.where(F.col("commit_seq") <= seq)
        .groupBy("repo").agg(F.max("commit_seq").alias("commit_seq"))
    )
    chosen = seqd.join(win, ["repo", "commit_seq"]).select("repo", "commit")
    return (
        files.join(F.broadcast(chosen), ["repo", "commit"])
        .select("repo", "path", "commit",
                F.sha2(F.col("content"), 256).alias("content_sha"))
    )
