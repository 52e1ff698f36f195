"""Change-log derivation (SURVEY.md §2.3 J4) + blob dedup — window-based, one shuffle.

The reference gets per-commit change sets from the GitHub API
(ProvenanceService.java:161,167); we derive them from snapshot rows. Instead of
the naive full-outer self-join of consecutive snapshots (two shuffles of the fat
table), we shuffle *slim* rows (content replaced by its sha) once into a window
over (repo, path) ordered by commit_seq — DESIGN.md §6.3:

  - lag(seq) null or < seq-1            -> "added"  (first sighting / re-add after gap)
  - lag(seq) == seq-1 and sha changed   -> "modified"
  - sha unchanged                       -> not in the change set (GitHub semantics)
  - removal: present at seq with next present seq > seq+1 (or none, while the
    repo has commits beyond seq) -> "removed" at seq+1

(repo, path) is a fine-grained shuffle key, so hot repos spread across
partitions naturally; AQE skew-join handles residual skew on the commits join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHANGE_EVENT_COLS = [
    "repo", "path", "commit", "commit_seq", "status",
    "content_sha", "prev_content_sha",
]


def slim_files(files: DataFrame) -> DataFrame:
    """Project snapshots to slim rows; content -> sha256 map-side (F8), no shuffle."""
    return files.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("content_sha")
    )


def blobs(files: DataFrame) -> DataFrame:
    """Distinct content payloads keyed by sha (DESIGN.md §6.2).

    groupBy+first has map-side partial aggregation: at most one payload per sha
    per input partition crosses the shuffle — the result is |distinct versions|,
    orders of magnitude smaller than the snapshot table.
    """
    return (
        files.select(F.sha2(F.col("content"), 256).alias("content_sha"), "content")
        .groupBy("content_sha")
        .agg(F.first("content").alias("content"))
    )


def with_commit_seq(slim: DataFrame, commits: DataFrame) -> DataFrame:
    """Attach commit_seq from the commits dim (equi-join, AQE picks broadcast)."""
    seq_map = commits.select("repo", "commit", "commit_seq")
    return slim.join(seq_map, ["repo", "commit"])


def change_events(files: DataFrame, commits: DataFrame) -> DataFrame:
    """Snapshot rows -> change-event rows (repo, path, commit, commit_seq,
    status, content_sha, prev_content_sha)."""
    return events_from_slim(with_commit_seq(slim_files(files), commits), commits)


def events_from_slim(
    slim: DataFrame, commits: DataFrame, max_seq: DataFrame | None = None
) -> DataFrame:
    """Change events over already-slimmed snapshot rows (repo, path, commit,
    commit_seq, content_sha).

    `max_seq` (repo, max_seq) bounds removal detection: a path last present
    at seq s is "removed at s+1" only when s < max_seq(repo). Batch callers
    leave it None (derived from the full commits dim); the incremental
    builder (streaming.py) passes its per-repo processed watermark instead —
    commits that exist in the dim but have not streamed through yet must not
    trigger removals."""
    w = Window.partitionBy("repo", "path").orderBy("commit_seq")
    annotated = slim.select(
        "repo", "path", "commit", "commit_seq", "content_sha",
        F.lag("commit_seq").over(w).alias("prev_seq"),
        F.lag("content_sha").over(w).alias("prev_sha"),
        F.lead("commit_seq").over(w).alias("next_seq"),
    )

    if max_seq is None:
        max_seq = commits.groupBy("repo").agg(F.max("commit_seq").alias("max_seq"))
    annotated = annotated.join(max_seq, "repo")  # tiny, broadcast by AQE

    present_status = F.when(
        F.col("prev_seq").isNull() | (F.col("prev_seq") < F.col("commit_seq") - 1),
        F.lit("added"),
    ).when(F.col("prev_sha") != F.col("content_sha"), F.lit("modified"))

    add_mod = annotated.select(
        "repo", "path", "commit", "commit_seq",
        present_status.alias("status"),
        "content_sha",
        # prev content sha only meaningful for modified (same-run predecessor)
        F.when(present_status == "modified", F.col("prev_sha")).alias(
            "prev_content_sha"
        ),
    ).where(F.col("status").isNotNull())

    # removal events live at seq+1, whose commit sha needs the commits dim
    removed_at = (
        annotated.where(
            (
                F.col("next_seq").isNull()
                & (F.col("commit_seq") < F.col("max_seq"))
            )
            | (F.col("next_seq") > F.col("commit_seq") + 1)
        )
        .select(
            "repo", "path",
            (F.col("commit_seq") + 1).alias("commit_seq"),
            F.lit("removed").alias("status"),
            F.lit(None).cast("string").alias("content_sha"),
            F.col("content_sha").alias("prev_content_sha"),
        )
        .join(commits.select("repo", "commit", "commit_seq"), ["repo", "commit_seq"])
    )

    return add_mod.select(*CHANGE_EVENT_COLS).unionByName(
        removed_at.select(*CHANGE_EVENT_COLS)
    )
