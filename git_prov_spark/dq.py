"""Data-quality assertions over any DataFrame — the dbt-test/Deequ-style
contract checks a 100 TB ingest runs before anything downstream trusts a
table: null checks, uniqueness, value ranges, referential integrity.

Each rule compiles to ONE aggregate (or one broadcast-anti-join +
aggregate for foreign keys) producing a single (rule, n_checked,
n_violations, passed) row; `dq_report` unions the rows into the report
relation a scheduler alerts on. Nothing collects on the driver; the
report is as wide as the rule list, not the data. All counts are exact
longs — the report is engine-exact, so it gates like every other oracle
entry.

Scale notes: not_null/range are map-side partial aggregates (no
shuffle beyond the 1-row final merge); unique is one hash-aggregate on
the key columns; foreign_key broadcasts the parent key set when the
parent is dimension-sized (the common case — orders→customer,
fact→dim) and falls back to a shuffle anti-join automatically when
Spark's threshold says otherwise.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row(rule: str, checked: F.Column, violations: F.Column,
         df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(rule).alias("rule"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    ).withColumn("passed", F.col("n_violations") == 0)


def rule_not_null(df: DataFrame, col: str, rule: str | None = None) -> DataFrame:
    return _row(
        rule or f"not_null({col})",
        F.count(F.lit(1)),
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
        df,
    )


def rule_unique(df: DataFrame, cols: list[str],
                rule: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per key (NULL keys count as
    ordinary values, matching GROUP BY semantics in both engines)."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    return _row(
        rule or f"unique({', '.join(cols)})",
        F.sum("_c"),
        F.sum(F.col("_c") - 1),
        per_key,
    )


def rule_range(df: DataFrame, col: str, lo, hi,
               rule: str | None = None) -> DataFrame:
    """NULLs do not violate a range rule (pair with rule_not_null)."""
    c = F.col(col)
    return _row(
        rule or f"range({col}, {lo}, {hi})",
        F.count(F.lit(1)),
        F.sum(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1)
              .otherwise(0)),
        df,
    )


def rule_foreign_key(child: DataFrame, col: str, parent: DataFrame,
                     pcol: str, rule: str | None = None) -> DataFrame:
    """Non-null child keys with no parent row. The parent key set joins
    as a (usually broadcast) semi marker; violations = unmatched."""
    keys = parent.select(F.col(pcol).alias(col)).distinct() \
        .withColumn("_hit", F.lit(True))
    marked = (child.where(F.col(col).isNotNull())
              .select(col).join(F.broadcast(keys), col, "left"))
    return _row(
        rule or f"fk({col} -> {pcol})",
        F.count(F.lit(1)),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)),
        marked,
    )


def dq_report(rules: list[DataFrame]) -> DataFrame:
    """Union the rule rows into the report relation."""
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out
