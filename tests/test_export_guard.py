"""Driver-side export guard (VERDICT r4 'What's wrong #1'): the per-repo
convenience exports (turtle_text / rdfxml_text / every provdoc document
format) refuse politely past max_triples instead of OOMing the driver on a
Linux-kernel-shaped repo, while the distributed sharded twins
(write_ntriples / write_rdfxml / prov_document_parts) handle the same graph
unguarded."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from git_prov_spark import provdoc
from git_prov_spark.store import (
    ExportTooLarge,
    rdfxml_text,
    turtle_text,
    write_ntriples,
)


@pytest.fixture(scope="module")
def big_repo(spark):
    """A synthetic single-repo graph big enough to trip a small guard."""
    return spark.range(500).select(
        F.lit("org/huge").alias("repo"),
        F.concat(F.lit("gitprov:e"), F.col("id").cast("string")).alias("subj"),
        F.lit("prov:wasDerivedFrom").alias("pred"),
        F.concat(F.lit("gitprov:e"), (F.col("id") + 1).cast("string")).alias("obj"),
        F.lit("iri").alias("obj_type"),
    )


def test_turtle_refuses_past_guard(big_repo):
    with pytest.raises(ExportTooLarge, match="turtle_text"):
        turtle_text(big_repo, "org/huge", max_triples=100)


def test_rdfxml_refuses_past_guard(big_repo):
    with pytest.raises(ExportTooLarge, match="rdfxml_text"):
        rdfxml_text(big_repo, "org/huge", max_triples=100)


def test_provdoc_exports_refuse_past_guard(big_repo):
    with pytest.raises(ExportTooLarge, match="document export"):
        provdoc._collect_graph(big_repo, "org/huge", max_triples=100)


def test_guard_disabled_and_under_threshold_pass(big_repo):
    # under the threshold: normal output
    ttl = turtle_text(big_repo, "org/huge", max_triples=500)
    assert "prov:wasDerivedFrom" in ttl
    # None disables the guard entirely
    ttl2 = turtle_text(big_repo, "org/huge", max_triples=None)
    assert ttl2 == ttl


def test_sharded_twin_handles_the_same_graph(big_repo, tmp_path):
    out = str(tmp_path / "nt")
    write_ntriples(big_repo, out)
    back = big_repo.sparkSession.read.text(out)
    assert back.count() == 500
