"""spread() decisions come from scan file metadata, not an RDD hop
(VERDICT r4 next-round #7): a narrow scan gains the round-robin exchange, a
wide-enough scan's plan is IDENTICAL to the un-spread plan (no-op), and the
same holds with the split estimate driven by spark.sql.files.maxPartitionBytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.corpus.similarity import _parse_bytes, spread


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parse_bytes_forms():
    assert _parse_bytes("134217728b") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4096") == 4096


def test_narrow_scan_gains_exchange(spark, tmp_path):
    p = str(tmp_path / "one_file")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert "roundrobin" in _plan(spread(df)).lower()


def test_wide_scan_is_identical_plan(spark, tmp_path):
    p = str(tmp_path / "tiny_splits")
    spark.range(10000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).coalesce(1).write.parquet(p)
    # shrink the split size so the single file estimates to >= cores splits
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
    try:
        df = spark.read.parquet(p)
        assert _plan(spread(df)) == _plan(df)  # no-op: zero exchange added
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_no_file_scan_falls_back(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "id int")
    out = spread(df)  # must not raise; decision via the RDD fallback
    assert out.count() == 8
