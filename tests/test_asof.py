"""asof_snapshot — time-travel tree reconstruction over snapshot-form
files, including deletion semantics (a removed path is simply absent
from the winning snapshot) and pre-history repos."""
from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.pipeline.changelog import change_events
from git_prov_spark.pipeline.versions import asof_snapshot, ensure_commit_seq


def test_asof_equals_commit_snapshot(spark, spark_tables):
    files, commits, _ = spark_tables
    seqd = ensure_commit_seq(commits)
    top = seqd.groupBy("repo").agg(F.max("commit_seq").alias("m"))
    max_seq = top.agg(F.max("m")).first()[0]
    snap = asof_snapshot(files, commits, max_seq)
    # every repo's tree at its own final commit
    expect = (
        files.join(seqd.select("repo", "commit", "commit_seq"),
                   ["repo", "commit"])
        .join(top.withColumnRenamed("m", "commit_seq"),
              ["repo", "commit_seq"])
        .select("repo", "path", "commit",
                F.sha2("content", 256).alias("content_sha"))
    )
    assert {tuple(r) for r in snap.collect()} \
        == {tuple(r) for r in expect.collect()}


def test_asof_removed_path_absent(spark, spark_tables):
    files, commits, _ = spark_tables
    ev = change_events(files, commits)
    rem = ev.where(F.col("status") == "removed") \
        .orderBy("repo", "path", "commit_seq").first()
    assert rem is not None, "fixtures are expected to contain a removal"
    before = asof_snapshot(files, commits, rem.commit_seq - 1)
    after = asof_snapshot(files, commits, rem.commit_seq)
    def has(df):
        return df.where((F.col("repo") == rem.repo)
                        & (F.col("path") == rem.path)).count()
    assert has(before) == 1 and has(after) == 0


def test_asof_prehistory_empty(spark, spark_tables):
    files, commits, _ = spark_tables
    assert asof_snapshot(files, commits, -1).count() == 0
