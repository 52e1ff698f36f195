"""Flagship correctness gate: Spark pipeline triples vs pure-Python oracle.

BASELINE.md: P/R >= 0.95 required, target 1.0 on fixtures. The oracle
(git_prov_spark/oracle.py) independently re-implements the reference loop
(ProvenanceService.java:116-189) via literal snapshot-dict diffs, so agreement
validates the window-based J4/W1-W3 dataflow end to end.
"""

from __future__ import annotations

from collections import Counter

from git_prov_spark.oracle import oracle_triples, precision_recall
from git_prov_spark.pipeline.build import build_triples


def _report_diff(actual, expected, limit=12):
    lines = []
    missing = expected - actual
    extra = actual - expected
    lines.append(f"missing (expected, not produced): {len(missing)}")
    lines.extend(f"  - {t}" for t in sorted(missing)[:limit])
    lines.append(f"extra (produced, not expected): {len(extra)}")
    lines.extend(f"  + {t}" for t in sorted(extra)[:limit])
    by_pred_m = Counter(t[2] for t in missing)
    by_pred_e = Counter(t[2] for t in extra)
    lines.append(f"missing by pred: {dict(by_pred_m)}")
    lines.append(f"extra by pred: {dict(by_pred_e)}")
    return "\n".join(lines)


def test_pipeline_matches_oracle(spark_tables, fixture_tables):
    files, commits, contributors = spark_tables
    files_pd, commits_pd, contrib_pd = fixture_tables

    triples = build_triples(files, commits, contributors)
    actual = {
        (r.repo, r.subj, r.pred, r.obj, r.obj_type) for r in triples.collect()
    }
    expected = oracle_triples(files_pd, commits_pd, contrib_pd)

    p, r = precision_recall(actual, expected)
    assert p >= 0.95 and r >= 0.95, (
        f"P={p:.4f} R={r:.4f}\n" + _report_diff(actual, expected)
    )
    # target on fixtures is exact parity
    assert actual == expected, (
        f"P={p:.4f} R={r:.4f} (>=0.95 but not exact)\n"
        + _report_diff(actual, expected)
    )


def test_triples_deterministic_across_runs(spark_tables):
    files, commits, contributors = spark_tables
    a = {tuple(r) for r in build_triples(files, commits, contributors).collect()}
    b = {tuple(r) for r in build_triples(files, commits, contributors).collect()}
    assert a == b


def test_parity_on_random_fixture(spark):
    """End-to-end randomized parity: arbitrary histories (gaps, re-adds,
    merges, sha-equal no-ops) with randomized author metadata (null logins,
    name-match fallback, null-name agents) — Spark pipeline triple set must
    equal the pure-Python reference oracle exactly."""
    import random
    from datetime import datetime, timedelta

    import pandas as pd

    from tests.conftest import COMMITS_SCHEMA, CONTRIB_SCHEMA, FILES_SCHEMA

    rng = random.Random(414243)
    t0 = datetime(2023, 5, 1)
    file_rows, commit_rows, contrib_rows = [], [], []
    for repo in ("own1/ra", "own1/rb", "own2/rc"):
        logins = [f"u{i}_{repo[-2:]}" for i in range(3)]
        names = [f"Name {login}" for login in logins]
        for i, login in enumerate(logins):
            contrib_rows.append({
                "repo": repo, "login": login, "type": "User",
                # one null-name agent per repo (always-true predicate branch)
                "name": None if i == 0 else names[i],
                "email": None if i == 2 else f"{login}@x.org",
                "avatar_url": f"https://a/{login}",
            })
        n_commits = rng.randrange(4, 8)
        shas = [f"{repo.replace('/', '_')}_s{s:02d}" + "0" * 8 for s in range(n_commits)]
        for s in range(n_commits):
            has_login = rng.random() < 0.6
            parents = [] if s == 0 else [shas[s - 1]]
            if s >= 2 and rng.random() < 0.3:
                parents.append(shas[rng.randrange(0, s - 1)])  # merge
            commit_rows.append({
                "repo": repo, "commit": shas[s], "parents": parents,
                "author_login": rng.choice(logins) if has_login else None,
                # sometimes a name that matches no agent -> null-name fallback
                "author_name": rng.choice(names + ["Drive By"]),
                "author_email": f"c{s}@x.org" if rng.random() < 0.8 else None,
                "authored_at": t0 + timedelta(hours=s),
                "message": f"commit {s} of {repo}",
                "commit_seq": s,
            })
        for p in range(5):
            path = rng.choice([f"src/m {p}.py", f"a\\b{p}.txt", f"d.{p}/f.md"])
            present, version = False, 0
            for s in range(n_commits):
                r = rng.random()
                if not present:
                    present = r < 0.6
                    if present:
                        version += 1
                else:
                    if r < 0.2:
                        present = False
                    elif r < 0.6:
                        version += 1
                if present:
                    file_rows.append({
                        "repo": repo, "path": path, "commit": shas[s],
                        "lang": "py",
                        "content": f"{path}\nv{version}\n" + "x\n" * version,
                    })

    files_pd = pd.DataFrame(file_rows)
    commits_pd = pd.DataFrame(commit_rows)
    contrib_pd = pd.DataFrame(contrib_rows)

    expected = oracle_triples(files_pd, commits_pd, contrib_pd)
    files = spark.createDataFrame(files_pd, schema=FILES_SCHEMA)
    commits = spark.createDataFrame(commits_pd, schema=COMMITS_SCHEMA)
    contributors = spark.createDataFrame(contrib_pd, schema=CONTRIB_SCHEMA)
    actual = {
        (r.repo, r.subj, r.pred, r.obj, r.obj_type)
        for r in build_triples(files, commits, contributors).collect()
    }
    assert actual == expected, _report_diff(actual, expected)
