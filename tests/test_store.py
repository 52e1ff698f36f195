"""Store layer: partitioned sink/scan, resume manifest, RDF serialization."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from git_prov_spark.pipeline.build import build_triples
from git_prov_spark.store import (
    completed_buckets,
    list_repos,
    materialize_resumable,
    ntriples_lines,
    read_repo,
    turtle_text,
    write_triples,
)


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory, triples_df):
    d = str(tmp_path_factory.mktemp("triples_store"))
    write_triples(triples_df, d, n_buckets=8)
    return d


def test_roundtrip_and_pruned_repo_read(spark, store_dir, triples_df):
    total = spark.read.parquet(store_dir).count()
    assert total == triples_df.count()
    one = read_repo(spark, store_dir, "org1/alpha", n_buckets=8)
    assert one.count() == triples_df.where(F.col("repo") == "org1/alpha").count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "repo_bucket" in plan


def test_list_repos(spark, store_dir):
    repos = {r.repo for r in list_repos(spark.read.parquet(store_dir)).collect()}
    assert repos == {"org0/hot", "org1/alpha", "org2/beta"}


def test_ntriples_wellformed(triples_df):
    lines = ntriples_lines(triples_df)
    assert lines.count() == triples_df.count()
    pat = re.compile(r'^<[^>]+> <[^>]+> (<[^>]+>|"(\\.|[^"\\])*"(\^\^<[^>]+>)?) \.$')
    sample = lines.take(300)
    bad = [r.line for r in sample if not pat.match(r.line)]
    assert not bad, bad[:5]
    # multi-line literal must be escaped into one physical line
    multi = [r.line for r in lines.collect() if "multi" in r.line and "line message" in r.line]
    assert multi and all("\n" not in line and "\\n" in line for line in multi)


def test_turtle_single_repo(triples_df):
    ttl = turtle_text(triples_df, "org2/beta")
    assert "@prefix gitprov: <gitprov://org2/beta#> ." in ttl
    assert "prov:wasGeneratedBy" in ttl


def test_resumable_materialize(spark, spark_tables, tmp_path):
    files, commits, contributors = spark_tables
    out = str(tmp_path / "kg")
    n_buckets, group_size = 8, 3

    runs: list[list[int]] = []
    stats = materialize_resumable(
        build_triples, files, commits, contributors, out,
        n_buckets=n_buckets, group_size=group_size,
        on_group_done=lambda g, m: runs.append(g),
    )
    assert completed_buckets(out) == set(range(n_buckets))
    full = spark.read.parquet(out).drop("repo_bucket")
    expected = build_triples(files, commits, contributors)
    assert full.count() == expected.count()
    assert full.select(*expected.columns).exceptAll(expected).isEmpty()

    # resume: nothing pending -> no groups run
    runs.clear()
    stats2 = materialize_resumable(
        build_triples, files, commits, contributors, out,
        n_buckets=n_buckets, group_size=group_size,
        on_group_done=lambda g, m: runs.append(g),
    )
    assert runs == [] and stats2["resumed_skipped"] == list(range(n_buckets))

    # simulate a crash that lost one group's manifest -> only that group re-runs
    import os

    done_dir = os.path.join(out, "_done")
    victim = sorted(os.listdir(done_dir))[0]
    os.remove(os.path.join(done_dir, victim))
    lost = completed_buckets(out)
    missing = sorted(set(range(n_buckets)) - lost)
    runs.clear()
    materialize_resumable(
        build_triples, files, commits, contributors, out,
        n_buckets=n_buckets, group_size=group_size,
        on_group_done=lambda g, m: runs.append(g),
    )
    assert runs == [missing]
    # output still exactly correct after the partial re-run (idempotent overwrite)
    full2 = spark.read.parquet(out).drop("repo_bucket")
    assert full2.count() == expected.count()
    assert full2.select(*expected.columns).exceptAll(expected).isEmpty()


def test_resumable_survives_static_overwrite_session(spark, spark_tables, tmp_path):
    """Under a plain spark-submit session, partitionOverwriteMode defaults to
    STATIC — the resumable writer must still only replace its own group's
    partitions (regression: a session-conf-dependent overwrite deleted the
    whole store, earlier groups and _done manifest included)."""
    files, commits, contributors = spark_tables
    out = str(tmp_path / "kg_static")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        materialize_resumable(
            build_triples, files, commits, contributors, out,
            n_buckets=8, group_size=3,
        )
        assert completed_buckets(out) == set(range(8))
        full = spark.read.parquet(out).drop("repo_bucket")
        expected = build_triples(files, commits, contributors)
        assert full.count() == expected.count()
        assert full.select(*expected.columns).exceptAll(expected).isEmpty()
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_table_sink_contract(spark, triples_df, tmp_path):
    """write_triples_table: whichever branch this environment has (Iceberg
    runtime present -> partitioned table; absent -> parquet fallback) must
    expose the SAME pruning keys — bucket(repo) and pred — and prune
    per-repo/per-pred scans at the source."""
    import os

    from git_prov_spark.store import (
        iceberg_available,
        read_repo,
        write_triples_table,
    )

    out = str(tmp_path / "kg_table")
    branch = write_triples_table(
        triples_df, spark, path=out, n_buckets=8, replace=True
    )
    if iceberg_available(spark):
        assert branch == "iceberg"
        scanned = spark.table("kg.triples").where(
            (F.col("repo") == "org1/alpha") & (F.col("pred") == "rdf:type")
        )
        plan = scanned._jdf.queryExecution().executedPlan().toString()
        assert "pred" in plan  # iceberg scan carries the partition filter
    else:
        assert branch == "parquet"
        # layout contract: exactly the two partition key levels, both named
        top = {d.split("=")[0] for d in os.listdir(out) if "=" in d}
        assert top == {"repo_bucket"}
        one_bucket = next(d for d in os.listdir(out) if d.startswith("repo_bucket="))
        second = {
            d.split("=")[0]
            for d in os.listdir(os.path.join(out, one_bucket))
            if "=" in d
        }
        assert second == {"pred"}
        # pruning contract: per-repo read hits only its bucket + pred dirs
        scanned = read_repo(spark, out, "org1/alpha", n_buckets=8).where(
            F.col("pred") == "rdf:type"
        )
        plan = scanned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "repo_bucket" in plan and "pred" in plan
        expected = triples_df.where(
            (F.col("repo") == "org1/alpha") & (F.col("pred") == "rdf:type")
        ).count()
        assert scanned.count() == expected

    # incremental (non-replace) write of ONE repo must leave others intact
    one_repo = triples_df.where(F.col("repo") == "org2/beta")
    write_triples_table(one_repo, spark, path=out, n_buckets=8, replace=False)
    if not iceberg_available(spark):
        total = spark.read.parquet(out).count()
        assert total == triples_df.count()  # idempotent partition overwrite


def test_compact_store_layout_only(spark, tmp_path):
    from git_prov_spark.store import compact_store, write_triples

    t = spark.createDataFrame(
        [("r%d" % (i % 5), "s%d" % i, "p%d" % (i % 3), "o%d" % i, "iri")
         for i in range(2000)],
        "repo string, subj string, pred string, obj string, obj_type string")
    path = str(tmp_path / "frag")
    # fragment hard: max salt fan-out
    write_triples(t, path, n_buckets=4, salt_files=8)
    before_rows = {tuple(r) for r in spark.read.parquet(path)
                   .drop("repo_bucket").collect()}
    stats = compact_store(spark, path, target_bytes=1 << 30)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] == 2000
    after = spark.read.parquet(path)
    assert {tuple(r) for r in after.drop("repo_bucket").collect()} \
        == before_rows
    # pruning keys survive
    assert "repo_bucket" in after.columns and "pred" in after.columns
    # one file per (bucket, pred) dir at this tiny size
    import glob, os
    dirs = {os.path.dirname(f) for f in glob.glob(
        f"{path}/**/*.parquet", recursive=True)}
    for d in dirs:
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
