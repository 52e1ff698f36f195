"""dq.py: every rule type against planted violations, plus the
all-clean case and the broadcast plan shape for foreign keys."""
from __future__ import annotations

from git_prov_spark import dq


def test_rules_catch_planted_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 99), (None, 5), (4, -3)],
        "k int, v int")
    parent = spark.createDataFrame([(10,), (5,)], "pk int")
    report = {r.rule: r for r in dq.dq_report([
        dq.rule_not_null(child, "k"),
        dq.rule_unique(child, ["k"]),
        dq.rule_range(child, "v", 0, 50),
        dq.rule_foreign_key(child, "v", parent, "pk"),
    ]).collect()}
    nn = report["not_null(k)"]
    assert (nn.n_checked, nn.n_violations, nn.passed) == (5, 1, False)
    uq = report["unique(k)"]
    assert (uq.n_checked, uq.n_violations) == (5, 1)   # k=2 twice
    rg = report["range(v, 0, 50)"]
    assert (rg.n_checked, rg.n_violations) == (5, 2)   # 99 and -3
    fk = report["fk(v -> pk)"]
    assert (fk.n_checked, fk.n_violations) == (5, 2)   # 99 and -3 orphan


def test_all_clean_passes(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "k int, v int")
    rows = dq.dq_report([
        dq.rule_not_null(df, "k"),
        dq.rule_unique(df, ["k"]),
        dq.rule_range(df, "v", 0, 10),
        dq.rule_foreign_key(df, "v", df, "k"),
    ]).collect()
    assert all(r.passed for r in rows)
    assert all(r.n_violations == 0 for r in rows)


def test_fk_broadcasts_parent(spark):
    child = spark.createDataFrame([(1,)], "k int")
    parent = spark.createDataFrame([(1,)], "pk int")
    plan = (dq.rule_foreign_key(child, "k", parent, "pk")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
