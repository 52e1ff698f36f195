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
