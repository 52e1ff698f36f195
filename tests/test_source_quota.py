"""Per-source quota cap (curate.source_quota).

Pins: exact cap per source, deterministic winner set (re-run equality and
two-phase ≡ single global rank), quota larger than any source keeps all,
quota 0 drops all, and salt re-draws change the lottery but not the cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from git_prov_spark.corpus import curate
from git_prov_spark.corpus.hashing import spark_h64


@pytest.fixture()
def docs(spark):
    # skewed sources: src0 x 40, src1 x 7, src2 x 1
    rows = [(i, "src0") for i in range(40)]
    rows += [(100 + i, "src1") for i in range(7)]
    rows += [(200, "src2")]
    return spark.createDataFrame(rows, "doc_id long, source string").repartition(8)


def test_cap_is_exact_and_total(docs, spark):
    out = curate.source_quota(docs, quota=5).collect()
    assert len(out) == 48  # one verdict row per doc
    kept = {}
    for r in out:
        kept.setdefault(r["source"], []).append(r["kept"])
    assert sum(kept["src0"]) == 5
    assert sum(kept["src1"]) == 5
    assert sum(kept["src2"]) == 1  # under quota: all kept


def test_two_phase_equals_global_rank(docs, spark):
    """The partition-then-global cap must pick exactly the quota smallest
    (hash, id) per source — the single global window's winner set."""
    out = {(r["doc_id"]): r["kept"]
           for r in curate.source_quota(docs, quota=5).collect()}
    h = F.expr(spark_h64("concat('quota-v1', ':', cast(doc_id as string))"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    expect = {
        r["doc_id"]: r["rk"] <= 5
        for r in docs.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert out == expect


def test_rerun_stable(docs):
    a = sorted(map(tuple, curate.source_quota(docs, quota=3).collect()))
    b = sorted(map(tuple, curate.source_quota(docs, quota=3).collect()))
    assert a == b


def test_salt_redraws_but_keeps_cap(docs):
    a = {r["doc_id"]: r["kept"]
         for r in curate.source_quota(docs, quota=5, salt="a").collect()}
    b = {r["doc_id"]: r["kept"]
         for r in curate.source_quota(docs, quota=5, salt="b").collect()}
    assert sum(a.values()) == sum(b.values()) == 11
    assert a != b  # a fresh salt draws a different lottery (40C5 odds)


def test_quota_zero_and_negative(docs):
    out = curate.source_quota(docs, quota=0).collect()
    assert not any(r["kept"] for r in out)
    with pytest.raises(ValueError):
        curate.source_quota(docs, quota=-1)
