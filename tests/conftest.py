from __future__ import annotations

import pandas as pd
import pytest

from git_prov_spark.fixtures import FixtureParams, gen_tables
from git_prov_spark.session import get_spark

COMMITS_SCHEMA = (
    "repo string, commit string, parents array<string>, author_login string, "
    "author_name string, author_email string, authored_at timestamp, "
    "message string, commit_seq int"
)
CONTRIB_SCHEMA = (
    "repo string, login string, type string, name string, email string, "
    "avatar_url string"
)
FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark_prov_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_tables():
    return gen_tables(FixtureParams())


@pytest.fixture(scope="session")
def triples_df(spark, spark_tables):
    from git_prov_spark.pipeline.build import build_triples

    files, commits, contributors = spark_tables
    t = build_triples(files, commits, contributors).persist()
    t.count()
    return t


@pytest.fixture(scope="session")
def oracle_set(fixture_tables):
    from git_prov_spark.oracle import oracle_triples

    files_pd, commits_pd, contrib_pd = fixture_tables
    return oracle_triples(files_pd, commits_pd, contrib_pd)


@pytest.fixture(scope="session")
def spark_tables(spark, fixture_tables):
    files_pd, commits_pd, contrib_pd = fixture_tables
    # object-null columns -> None (Arrow chokes on NaN in string cols)
    commits_pd = commits_pd.where(pd.notnull(commits_pd), None)
    contrib_pd = contrib_pd.where(pd.notnull(contrib_pd), None)
    files = spark.createDataFrame(files_pd, schema=FILES_SCHEMA)
    commits = spark.createDataFrame(commits_pd, schema=COMMITS_SCHEMA)
    contributors = spark.createDataFrame(contrib_pd, schema=CONTRIB_SCHEMA)
    return files, commits, contributors
