"""Change-log derivation (J4) against the FIXTURES.md §3 scenarios."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.fixtures import commit_sha
from git_prov_spark.pipeline.changelog import change_events
from git_prov_spark.pipeline.versions import with_version_chain

HOT = "org0/hot"


def _events(spark_tables, repo, path):
    files, commits, contributors = spark_tables
    ev = change_events(files, commits)
    rows = (
        ev.where((F.col("repo") == repo) & (F.col("path") == path))
        .orderBy("commit_seq")
        .collect()
    )
    return [(r.commit_seq, r.status) for r in rows]


def test_linear_chain(spark_tables):
    # add@0, modify@2, modify@5; sha-equal snapshots in between are NOT events
    assert _events(spark_tables, HOT, "src/main/App.java") == [
        (0, "added"), (2, "modified"), (5, "modified"),
    ]


def test_remove_then_readd(spark_tables):
    assert _events(spark_tables, HOT, "win\\path.txt") == [
        (2, "added"), (4, "removed"), (6, "added"), (8, "modified"),
    ]


def test_rename_emits_add_remove_only(spark_tables):
    # identical content sha at the new path: no modified edges anywhere
    assert _events(spark_tables, HOT, "old name.txt") == [(1, "added"), (7, "removed")]
    assert _events(spark_tables, HOT, "new name.txt") == [(7, "added")]


def test_whitespace_only_change_is_modified(spark_tables):
    assert _events(spark_tables, HOT, "empty.txt") == [(0, "added"), (9, "modified")]


def test_version_chain_crosses_removed(spark_tables):
    # parent of the modify@8 is the re-add@6; parent of re-add is removal@4
    files, commits, contributors = spark_tables
    ev = with_version_chain(change_events(files, commits))
    rows = {
        r.commit_seq: r
        for r in ev.where(
            (F.col("repo") == HOT) & (F.col("path") == "win\\path.txt")
        ).collect()
    }
    assert rows[8].parent_commit == commit_sha(HOT, 6)
    assert rows[6].parent_commit == commit_sha(HOT, 4)  # crosses the removal
    assert rows[2].parent_commit is None
    assert rows[2].is_first_version and not rows[4].is_first_version


def test_no_event_for_unchanged_snapshots(spark_tables):
    files, commits, contributors = spark_tables
    ev = change_events(files, commits)
    n_pairs = ev.groupBy("repo", "path", "commit").count().where(F.col("count") > 1)
    assert n_pairs.isEmpty(), "duplicate change events for one (path, commit)"


def test_content_sha256_invariant(spark_tables, fixture_tables):
    """input_hint / BASELINE.md: per-row content sha256 equality vs the
    source table — Spark's sha2() minting must match python hashlib on
    every (repo, path, commit) row, and the blob store must be keyed by
    exactly those digests."""
    import hashlib

    from git_prov_spark.pipeline.changelog import blobs, slim_files

    files, _, _ = spark_tables
    files_pd, _, _ = fixture_tables

    expected = {
        (r.repo, r.path, r.commit): hashlib.sha256(
            r.content.encode()
        ).hexdigest()
        for r in files_pd.itertuples()
    }
    got = {
        (r.repo, r.path, r.commit): r.content_sha
        for r in slim_files(files).collect()
    }
    assert got == expected  # 100%, not approximate

    for r in blobs(files).collect():
        assert hashlib.sha256(r.content.encode()).hexdigest() == r.content_sha


def test_changelog_property_random(spark):
    """Randomized equivalence: the window-based change_events formulation ==
    a brute-force consecutive-snapshot diff, over arbitrary per-path
    presence/content patterns (gaps, re-adds, tail removals, sha-equal
    no-ops)."""
    import random

    rng = random.Random(20260817)
    n_commits = 7
    repos = ["rA", "rB"]
    rows = []  # (repo, path, commit, content)
    commit_rows = []
    for repo in repos:
        for s in range(n_commits):
            commit_rows.append((repo, f"{repo}_c{s}", s))
        for p in range(8):
            path = f"f{p}.txt"
            version = 0
            present_prev = False
            content = None
            for s in range(n_commits):
                action = rng.random()
                if not present_prev:
                    present = action < 0.55
                    if present:
                        version += 1
                        content = f"{path} v{version}"
                else:
                    if action < 0.2:
                        present = False
                    else:
                        present = True
                        if action < 0.6:  # modify
                            version += 1
                            content = f"{path} v{version}"
                        # else keep identical content (sha-equal no-op)
                if present:
                    rows.append((repo, path, f"{repo}_c{s}", content))
                present_prev = present

    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    commits = spark.createDataFrame(
        commit_rows, "repo string, commit string, commit_seq int"
    )

    got = {
        (r.repo, r.path, r.commit_seq, r.status)
        for r in change_events(files, commits).collect()
    }

    # brute-force oracle: diff consecutive snapshots per repo
    snap = {}  # (repo, seq) -> {path: content}
    for repo, path, commit, content in rows:
        seq = int(commit.rsplit("c", 1)[1])
        snap.setdefault((repo, seq), {})[path] = content
    expected = set()
    for repo in repos:
        prev = {}
        for s in range(n_commits):
            cur = snap.get((repo, s), {})
            for path, content in cur.items():
                if path not in prev:
                    expected.add((repo, path, s, "added"))
                elif prev[path] != content:
                    expected.add((repo, path, s, "modified"))
            for path in prev:
                if path not in cur:
                    expected.add((repo, path, s, "removed"))
            prev = cur

    assert got == expected, (
        f"missing={sorted(expected - got)[:10]} extra={sorted(got - expected)[:10]}"
    )
