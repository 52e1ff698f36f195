"""Vocabulary extraction + deterministic training-order shuffle (r5):
goldens, determinism-across-parallelism, and plan shape (TakeOrdered
top-K, shard-partitioned window — never a single-partition sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from git_prov_spark.corpus.curate import training_order
from git_prov_spark.corpus.text import vocabulary


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat"),
         (3, "   "),            # blank → zero tokens
         (4, None),             # NULL → zero tokens
         (5, "cat cat cat")],
        "doc_id long, text string")


def test_vocabulary_counts_and_topk(spark):
    df = _docs(spark)
    full = {r.token: (r.n_total, r.n_docs)
            for r in vocabulary(df).collect()}
    assert full["the"] == (3, 2)     # 2× doc1 + 1× doc2
    assert full["cat"] == (4, 2)     # 1× doc1 + 3× doc5
    assert full["sat"] == (2, 2)
    assert full["mat"] == (1, 1)
    assert "" not in full            # blank/NULL docs contribute nothing
    # top-K: count desc, token asc tiebreak — deterministic
    top = [r.token for r in vocabulary(df, top_k=3).collect()]
    assert top == ["cat", "the", "sat"]
    # min_total prunes the tail
    kept = {r.token for r in vocabulary(df, min_total=2).collect()}
    assert kept == {"cat", "the", "sat"}
    # plan: the top-K lowers to TakeOrderedAndProject, not a global sort
    plan = vocabulary(df, top_k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_training_order_deterministic(spark):
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    a = training_order(df, seed=7, n_shards=8)
    rows = {r.doc_id: (r.shard, r.pos) for r in a.collect()}
    assert len(rows) == 200
    # exactly a permutation: within each shard, pos is 1..n_shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in rows.values():
        by_shard.setdefault(shard, []).append(pos)
    assert sum(len(v) for v in by_shard.values()) == 200
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # identical assignment at a different parallelism (north_rule)
    b = training_order(df.repartition(13), seed=7, n_shards=8)
    assert {r.doc_id: (r.shard, r.pos) for r in b.collect()} == rows
    # a different seed is a different epoch permutation
    c = training_order(df, seed=8, n_shards=8)
    assert {r.doc_id: (r.shard, r.pos) for r in c.collect()} != rows
    # plan: the window is PARTITIONED BY shard, never Exchange SinglePartition
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    with pytest.raises(ValueError):
        training_order(df, n_shards=0)
