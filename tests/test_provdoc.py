"""PROV-N / PROV-JSON / PROV-XML / DOT document exporters: structural
validity + cross-format statement-count consistency against the triple set."""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from git_prov_spark.provdoc import dot_text, provjson_text, provn_text, provxml_text

HOT = "org0/hot"

EDGE_PREDS = [
    "prov:wasGeneratedBy", "prov:wasInvalidatedBy", "prov:used",
    "prov:wasAssociatedWith", "prov:wasInformedBy", "prov:specializationOf",
    "prov:wasDerivedFrom",
]


def _counts(triples_df):
    hot = triples_df.where(F.col("repo") == HOT)
    out = {}
    for p in EDGE_PREDS:
        out[p] = hot.where(F.col("pred") == p).count()
    for t in ("prov:Entity", "prov:Activity", "prov:Agent"):
        out[t] = hot.where(
            (F.col("pred") == "rdf:type") & (F.col("obj") == t)
        ).select("subj").distinct().count()
    return out


def test_provn_structure_and_counts(triples_df):
    text = provn_text(triples_df, HOT)
    lines = text.splitlines()
    assert lines[0] == "document" and lines[-1] == "endDocument"
    assert any(line.startswith("prefix gitprov <gitprov://org0/hot#>")
               for line in lines)
    kinds = {}
    stmt_re = re.compile(r"^(\w+)\(")
    for line in lines[1:-1]:
        m = stmt_re.match(line)
        if m:
            kinds[m.group(1)] = kinds.get(m.group(1), 0) + 1
    want = _counts(triples_df)
    assert kinds["entity"] == want["prov:Entity"]
    assert kinds["activity"] == want["prov:Activity"]
    assert kinds["agent"] == want["prov:Agent"]
    assert kinds["wasGeneratedBy"] == want["prov:wasGeneratedBy"]
    assert kinds["used"] == want["prov:used"]
    assert kinds["wasDerivedFrom"] == want["prov:wasDerivedFrom"]
    assert kinds["specializationOf"] == want["prov:specializationOf"]
    # generation times inlined from the qualified nodes
    assert re.search(r"wasGeneratedBy\(\S+, \S+, \d{4}-\d{2}-\d{2}T", text)
    # derivations carry the diff-stat attributes with their xsd type
    assert re.search(r"wasDerivedFrom\(.*gitprov:additions=\"\d+\" %% xsd:int", text)


def test_provjson_structure_and_counts(triples_df):
    doc = json.loads(provjson_text(triples_df, HOT))
    want = _counts(triples_df)
    assert set(doc["prefix"]) >= {"prov", "xsd", "gitprov"}
    assert len(doc["entity"]) == want["prov:Entity"]
    assert len(doc["activity"]) == want["prov:Activity"]
    assert len(doc["agent"]) == want["prov:Agent"]
    assert len(doc["wasGeneratedBy"]) == want["prov:wasGeneratedBy"]
    assert len(doc["wasDerivedFrom"]) == want["prov:wasDerivedFrom"]
    # typed attribute values keep their xsd type
    some_agent = next(iter(doc["agent"].values()))
    contribs = some_agent["gitprov:contributions"][0]
    assert contribs["type"] == "xsd:int"


def test_provxml_parses_and_counts(triples_df):
    text = provxml_text(triples_df, HOT)
    root = ET.fromstring(text)
    prov = "{" + "http://www.w3.org/ns/prov#" + "}"
    want = _counts(triples_df)
    assert len(root.findall(f"{prov}entity")) == want["prov:Entity"]
    assert len(root.findall(f"{prov}activity")) == want["prov:Activity"]
    assert len(root.findall(f"{prov}agent")) == want["prov:Agent"]
    assert len(root.findall(f"{prov}wasGeneratedBy")) == want["prov:wasGeneratedBy"]
    gen = root.find(f"{prov}wasGeneratedBy")
    refs = [el.attrib["{http://www.w3.org/ns/prov#}ref"] for el in gen
            if el.tag != f"{prov}time"]
    assert all(r.startswith("gitprov:") for r in refs)


def test_dot_edges(triples_df):
    text = dot_text(triples_df, HOT)
    hot = triples_df.where(F.col("repo") == HOT)
    n_iri_edges = hot.where(
        (F.col("obj_type") == "iri") & (F.col("pred") != "rdf:type")
    ).count()
    edge_lines = [line for line in text.splitlines() if " -> " in line]
    assert len(edge_lines) == n_iri_edges
    assert text.startswith('digraph "org0/hot" {') and text.endswith("}")


def test_prov_documents_distributed_matches_driver(triples_df):
    """The applyInPandas bulk exporter must produce, for EVERY repo at once,
    byte-identical documents to the per-repo driver-side exporters."""
    from git_prov_spark.provdoc import prov_documents

    repos = [r.repo for r in triples_df.select("repo").distinct().collect()]
    assert len(repos) >= 2  # fixtures carry a multi-repo corpus
    from git_prov_spark.provdoc import html_text, pdf_text, svg_text

    driver_fn = {"provn": provn_text, "provjson": provjson_text,
                 "provxml": provxml_text, "dot": dot_text,
                 "svg": svg_text, "pdf": pdf_text, "html": html_text}
    for fmt, fn in driver_fn.items():
        got = {r.repo: r.doc
               for r in prov_documents(triples_df, fmt).collect()}
        assert set(got) == set(repos), fmt
        for repo in repos:
            assert got[repo] == fn(triples_df, repo), (fmt, repo)


def test_prov_documents_rejects_unknown_fmt(triples_df):
    import pytest
    from git_prov_spark.provdoc import prov_documents

    with pytest.raises(ValueError):
        prov_documents(triples_df, "png")  # raster stays out of scope


def test_prov_document_parts_hot_repo_bounded_and_byte_exact(spark, triples_df):
    """Hot-repo scale guard (VERDICT r2 #5): a repo ~100x the others must
    export through bounded part cells — streamed group input (small Arrow
    batches force the iterator path to fold many batches) and chunked
    emission — with reassembly byte-identical to the one-cell exporter."""
    import pandas as pd

    from git_prov_spark.provdoc import prov_document_parts, prov_documents

    base = triples_df.select("repo", "subj", "pred", "obj", "obj_type")
    n_hot = base.where(F.col("repo") == HOT).count()
    fan = (
        base.where(F.col("repo") == HOT)
        .crossJoin(spark.range(100).select(F.col("id").alias("_i")))
        .select(
            F.lit("org9/mega").alias("repo"),
            F.concat_ws("-", F.col("subj"), F.col("_i")).alias("subj"),
            "pred",
            F.concat_ws("-", F.col("obj"), F.col("_i")).alias("obj"),
            "obj_type",
        )
    )
    skewed = base.unionByName(fan)
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        for fmt in ("provn", "provxml", "dot", "provjson"):
            # dot: the driver surface's 50k-edge guard is exactly what the
            # parts path outgrows — raise it through fmt_kwargs
            kw = {"max_edges": 10_000_000} if fmt == "dot" else {}
            parts = prov_document_parts(skewed, fmt, part_lines=5_000, **kw)
            pdf = parts.toPandas()
            # one-cell exporter for parity: dot's mega repo exceeds its
            # guard by design, so compare dot on the un-skewed repos only
            parity_src = skewed if fmt != "dot" else base
            docs = {
                r.repo: r.doc
                for r in prov_documents(parity_src, fmt).collect()
            }
            by_repo = {}
            for repo, grp in pdf.groupby("repo"):
                ordered = grp.sort_values("part_idx")
                assert list(ordered["part_idx"]) == list(range(len(grp)))
                by_repo[repo] = "\n".join(ordered["part"])
                # every cell is bounded: ≤ part_lines emitted lines (the
                # XML header "line" embeds one extra newline itself)
                assert all(p.count("\n") <= 5_000 for p in grp["part"])
            for repo, doc in docs.items():
                assert by_repo[repo] == doc, (fmt, repo)
            # the mega repo really went through multiple bounded parts
            if fmt != "provjson":
                assert len(pdf[pdf.repo == "org9/mega"]) >= (
                    n_hot // 5_000
                ), fmt
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
