"""RDFS closure (ρdf fragment) and owl:sameAs canonicalization —
semantic unit tests on hand-built graphs where the expected entailments
are enumerable, plus a DuckDB twin parity check on the same input.

Reference parity note: the reference serves entailed triples through
Jena's reasoner at query time (services/SparqlService.java:16-31); this
engine materializes the closure as a batch stage (inference.py header).
"""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from git_prov_spark import inference
from git_prov_spark.graph import bfs_levels, sql_bfs_levels

T_SCHEMA = "repo string, subj string, pred string, obj string, obj_type string"


def _df(spark, rows):
    return spark.createDataFrame(rows, T_SCHEMA)


@pytest.fixture(scope="module")
def closed(spark):
    inst = _df(spark, [
        ("g", "alice", "ex:authored", "doc1", "iri"),
        ("g", "doc1", "rdf:type", "ex:Draft", "iri"),
        ("g", "doc1", "ex:title", "Intro", "string"),   # literal object
        ("g", "bob", "ex:reviewed", "doc1", "iri"),
    ])
    sch = _df(spark, [
        ("s", "ex:Draft", "rdfs:subClassOf", "ex:Document", "iri"),
        ("s", "ex:Document", "rdfs:subClassOf", "ex:Work", "iri"),
        ("s", "ex:Work", "rdfs:subClassOf", "ex:Thing", "iri"),
        ("s", "ex:authored", "rdfs:subPropertyOf", "ex:contributedTo", "iri"),
        ("s", "ex:contributedTo", "rdfs:subPropertyOf", "ex:relatedTo", "iri"),
        ("s", "ex:authored", "rdfs:domain", "ex:Person", "iri"),
        ("s", "ex:authored", "rdfs:range", "ex:Draft", "iri"),
    ])
    out = inference.rdfs_closure(inst, sch)
    return {(r.subj, r.pred, r.obj) for r in out.collect()}, out


def test_subclass_transitive_types(closed):
    got, _ = closed
    # doc1: Draft (asserted) → Document → Work → Thing (rdfs9 over sc+)
    for cls in ("ex:Draft", "ex:Document", "ex:Work", "ex:Thing"):
        assert ("doc1", "rdf:type", cls) in got


def test_subproperty_chain(closed):
    got, _ = closed
    assert ("alice", "ex:contributedTo", "doc1") in got
    assert ("alice", "ex:relatedTo", "doc1") in got
    # sp applies only to ex:authored — bob's ex:reviewed gains nothing
    assert ("bob", "ex:contributedTo", "doc1") not in got


def test_domain_range_typing(closed):
    got, _ = closed
    assert ("alice", "rdf:type", "ex:Person") in got
    # range typing lands on the OBJECT, and then sc+ lifts it
    assert ("doc1", "rdf:type", "ex:Draft") in got
    assert ("doc1", "rdf:type", "ex:Thing") in got
    # domain/range attach to ex:authored only, not to its superproperties
    assert ("bob", "rdf:type", "ex:Person") not in got


def test_closed_schema_emitted(closed):
    got, _ = closed
    assert ("ex:Draft", "rdfs:subClassOf", "ex:Thing") in got      # sc+
    assert ("ex:authored", "rdfs:subPropertyOf", "ex:relatedTo") in got


def test_literals_untouched_and_distinct(closed):
    got, out = closed
    assert ("doc1", "ex:title", "Intro") in got
    rows = out.collect()
    assert len(rows) == len({tuple(r) for r in rows})  # distinct output


INST_SQL = (
    "SELECT 'g' AS repo, s AS subj, p AS pred, o AS obj, t AS obj_type "
    "FROM (VALUES ('alice','ex:authored','doc1','iri'),"
    "('doc1','rdf:type','ex:Draft','iri'),"
    "('doc1','ex:title','Intro','string'),"
    "('bob','ex:reviewed','doc1','iri')) v(s,p,o,t)"
)
SCH_SQL = (
    "SELECT 's' AS repo, s AS subj, p AS pred, o AS obj, 'iri' AS obj_type "
    "FROM (VALUES ('ex:Draft','rdfs:subClassOf','ex:Document'),"
    "('ex:Document','rdfs:subClassOf','ex:Work'),"
    "('ex:Work','rdfs:subClassOf','ex:Thing'),"
    "('ex:authored','rdfs:subPropertyOf','ex:contributedTo'),"
    "('ex:contributedTo','rdfs:subPropertyOf','ex:relatedTo'),"
    "('ex:authored','rdfs:domain','ex:Person'),"
    "('ex:authored','rdfs:range','ex:Draft')) v(s,p,o)"
)


def test_duckdb_twin_parity(closed):
    _, out = closed
    ora = duckdb.connect().execute(
        inference.sql_rdfs_closure(INST_SQL, SCH_SQL)).fetchall()
    spark_rows = {tuple(r) for r in out.collect()}
    assert spark_rows == set(map(tuple, ora))


def test_sameas_rewrite(spark):
    triples = _df(spark, [
        ("g", "u1", "ex:knows", "u2", "iri"),
        ("g", "u2", "ex:knows", "u3", "iri"),
        ("g", "u3", "ex:name", "Ada", "string"),
        ("g", "u9", "ex:knows", "u1", "iri"),
    ])
    # chain u1≡u2≡u3: canonical = min = u1; u9 unaliased
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u3", "u2")], "src string, dst string")
    got = {(r.subj, r.pred, r.obj, r.obj_type)
           for r in inference.sameas_canonicalize(triples, pairs).collect()}
    assert got == {
        ("u1", "ex:knows", "u1", "iri"),   # both rows collapse; dedup
        ("u1", "ex:name", "Ada", "string"),  # literal obj NOT rewritten
        ("u9", "ex:knows", "u1", "iri"),
    }


def test_sameas_literal_matching_alias_name(spark):
    # a literal whose VALUE equals an alias node id must not be rewritten
    triples = _df(spark, [("g", "u2", "ex:tag", "u2", "string")])
    pairs = spark.createDataFrame([("u1", "u2")], "src string, dst string")
    got = inference.sameas_canonicalize(triples, pairs).collect()
    assert [(r.subj, r.obj) for r in got] == [("u1", "u2")]


def test_bfs_levels_chain_and_cycle(spark):
    # chain a→b→c→d plus a 2-cycle x↔y reachable from d; seed {a, x}
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "x"),
         ("x", "y"), ("y", "x")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {(r.node, r.level) for r in bfs_levels(edges, seeds).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2), ("d", 3),
                   ("x", 4), ("y", 5)}
    # hop bound: nothing past n_iter
    got2 = {(r.node, r.level)
            for r in bfs_levels(edges, seeds, n_iter=2).collect()}
    assert got2 == {("a", 0), ("b", 1), ("c", 2)}


def test_bfs_levels_duckdb_twin(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    got = {(r.node, r.level) for r in bfs_levels(edges, seeds).collect()}
    e_sql = ("SELECT s AS src, d AS dst FROM (VALUES ('a','b'),('b','c'),"
             "('c','a'),('c','d')) v(s,d)")
    s_sql = "SELECT n AS node FROM (VALUES ('a'),('d')) v(n)"
    ora = duckdb.connect().execute(sql_bfs_levels(e_sql, s_sql)).fetchall()
    assert got == {(n, int(l)) for n, l in ora}


def test_shacl_report_all_constraint_kinds(spark):
    tr = _df(spark, [
        ("g", "d1", "rdf:type", "ex:Doc", "iri"),
        ("g", "d2", "rdf:type", "ex:Doc", "iri"),
        ("g", "d3", "rdf:type", "ex:Doc", "iri"),
        ("g", "x1", "rdf:type", "ex:Author", "iri"),
        # d1 is fully valid
        ("g", "d1", "ex:by", "x1", "iri"),
        ("g", "d1", "ex:title", "T1", "xsd:string"),
        # d2: two titles (maxCount), author untyped (class), title ok
        ("g", "d2", "ex:by", "x9", "iri"),
        ("g", "d2", "ex:title", "T2a", "xsd:string"),
        ("g", "d2", "ex:title", "T2b", "xsd:string"),
        # d3: no author (minCount), literal author value on second pred
        # (nodeKind via ex:by literal), title mistyped
        ("g", "d3", "ex:title", "T3", "string"),
        # non-target node: never checked
        ("g", "z", "ex:title", "zz", "iri"),
    ])
    shapes = spark.createDataFrame(
        [("s_min", "ex:Doc", "ex:by", "minCount", "1"),
         ("s_max", "ex:Doc", "ex:title", "maxCount", "1"),
         ("s_cls", "ex:Doc", "ex:by", "class", "ex:Author"),
         ("s_kind", "ex:Doc", "ex:by", "nodeKind", "iri"),
         ("s_dt", "ex:Doc", "ex:title", "datatype", "xsd:string")],
        inference.SHACL_SHAPE_COLS)
    got = {(r.shape, r.focus, r.constraint, r.node, r.actual)
           for r in inference.shacl_report(tr, shapes).collect()}
    assert got == {
        ("s_min", "d3", "minCount", None, "0"),
        ("s_max", "d2", "maxCount", None, "2"),
        ("s_cls", "d2", "class", "x9", "iri"),       # untyped IRI value
        ("s_dt", "d3", "datatype", "T3", "string"),
    }


def test_shacl_clean_graph_empty_report(spark):
    tr = _df(spark, [
        ("g", "d1", "rdf:type", "ex:Doc", "iri"),
        ("g", "d1", "ex:title", "T", "xsd:string"),
    ])
    shapes = spark.createDataFrame(
        [("s", "ex:Doc", "ex:title", "minCount", "1")],
        inference.SHACL_SHAPE_COLS)
    assert inference.shacl_report(tr, shapes).count() == 0


def test_shacl_duckdb_twin(spark):
    tr_rows = [
        ("g", "d1", "rdf:type", "ex:Doc", "iri"),
        ("g", "d2", "rdf:type", "ex:Doc", "iri"),
        ("g", "d1", "ex:by", "x1", "iri"),
        ("g", "x1", "rdf:type", "ex:Author", "iri"),
        ("g", "d2", "ex:by", "lit", "string"),
    ]
    tr = _df(spark, tr_rows)
    shapes_rows = [("s_cls", "ex:Doc", "ex:by", "class", "ex:Author"),
                   ("s_kind", "ex:Doc", "ex:by", "nodeKind", "iri")]
    shapes = spark.createDataFrame(shapes_rows, inference.SHACL_SHAPE_COLS)
    got = {tuple(r) for r in inference.shacl_report(tr, shapes).collect()}
    tr_sql = ("SELECT * FROM (VALUES " + ", ".join(
        str(t) for t in tr_rows) + ") v(repo, subj, pred, obj, obj_type)")
    sh_sql = ("SELECT * FROM (VALUES " + ", ".join(
        str(t) for t in shapes_rows)
        + ') v(shape, target_class, path, "constraint", value)')
    ora = duckdb.connect().execute(
        inference.sql_shacl_report(tr_sql, sh_sql)).fetchall()
    assert got == set(map(tuple, ora))


def test_schema_summary(spark):
    tr = _df(spark, [
        ("g", "a1", "rdf:type", "ex:B", "iri"),
        ("g", "a1", "rdf:type", "ex:A", "iri"),     # sig sorts: A|B
        ("g", "a2", "rdf:type", "ex:A", "iri"),
        ("g", "a1", "ex:to", "a2", "iri"),
        ("g", "a2", "ex:to", "zz", "iri"),          # untyped target
        ("g", "a1", "ex:name", "lit", "string"),    # literal: excluded
    ])
    got = {(r.src_sig, r.pred, r.dst_sig, r.n)
           for r in inference.schema_summary(tr).collect()}
    assert got == {
        ("ex:A|ex:B", "ex:to", "ex:A", 1),
        ("ex:A", "ex:to", "(untyped)", 1),
    }
    ora = duckdb.connect().execute(inference.sql_schema_summary(
        "SELECT * FROM (VALUES "
        "('g','a1','rdf:type','ex:B','iri'),"
        "('g','a1','rdf:type','ex:A','iri'),"
        "('g','a2','rdf:type','ex:A','iri'),"
        "('g','a1','ex:to','a2','iri'),"
        "('g','a2','ex:to','zz','iri'),"
        "('g','a1','ex:name','lit','string')"
        ") v(repo,subj,pred,obj,obj_type)")).fetchall()
    assert got == set(map(tuple, ora))


def test_store_delta(spark):
    old = _df(spark, [
        ("g", "a", "p", "x", "iri"),
        ("g", "b", "p", "y", "iri"),
    ])
    new = _df(spark, [
        ("g", "a", "p", "x", "iri"),        # unchanged
        ("g", "b", "p", "y", "string"),     # obj_type change = remove+add
        ("g", "c", "p", "z", "iri"),        # added
    ])
    got = {(r.change, r.subj, r.obj, r.obj_type)
           for r in inference.store_delta(old, new).collect()}
    assert got == {
        ("added", "b", "y", "string"),
        ("added", "c", "z", "iri"),
        ("removed", "b", "y", "iri"),
    }


def test_rdfs_closure_delta_linear_path(spark):
    sch = _df(spark, [
        ("s", "ex:Draft", "rdfs:subClassOf", "ex:Document", "iri"),
        ("s", "ex:authored", "rdfs:domain", "ex:Person", "iri"),
    ])
    old = _df(spark, [("g", "doc1", "rdf:type", "ex:Draft", "iri")])
    delta = _df(spark, [
        ("g", "alice", "ex:authored", "doc2", "iri"),
        ("g", "doc2", "rdf:type", "ex:Draft", "iri"),
    ])
    base_closed = inference.rdfs_closure(old, sch)
    new = {(r.subj, r.pred, r.obj)
           for r in inference.rdfs_closure_delta(
               base_closed, delta, sch).collect()}
    # Δ's own assertions + their entailments appear...
    assert ("alice", "rdf:type", "ex:Person") in new
    assert ("doc2", "rdf:type", "ex:Document") in new
    assert ("alice", "ex:authored", "doc2") in new
    # ...but nothing the old closure already held
    assert ("doc1", "rdf:type", "ex:Document") not in new
    assert ("ex:Draft", "rdfs:subClassOf", "ex:Document") not in new
    # and it equals the definition: closure(old ∪ Δ) \ closure(old)
    full = inference.rdfs_closure(old.unionByName(delta), sch)
    defn = {(r.subj, r.pred, r.obj)
            for r in full.join(base_closed,
                               ["repo", "subj", "pred", "obj", "obj_type"],
                               "left_anti").collect()}
    assert new == defn


def test_negative_samples_determinism_and_validity(spark):
    tr = _df(spark, [
        ("g", "a", "p", "e1", "iri"),
        ("g", "b", "p", "e2", "iri"),
        ("g", "c", "q", "lit", "string"),   # literal obj: never corrupted
    ])
    ents = spark.createDataFrame(
        [("e1",), ("e2",), ("e3",), ("e4",)], "entity string")
    r1 = {tuple(r) for r in inference.negative_samples(tr, ents).collect()}
    r2 = {tuple(r) for r in inference.negative_samples(tr, ents).collect()}
    assert r1 == r2 and r1                       # deterministic, nonempty
    for subj, pred, obj, neg, idx in r1:
        assert neg != obj and neg in {"e1", "e2", "e3", "e4"}
        assert subj in {"a", "b"}                # literal triple excluded
    # a different salt is an independent draw
    r3 = {tuple(r) for r in inference.negative_samples(
        tr, ents, salt="neg-v2").collect()}
    assert r3 != r1 or len(r1) == 0


def test_characteristic_sets(spark):
    tr = _df(spark, [
        ("g", "a", "p", "x", "iri"),
        ("g", "a", "q", "y", "iri"),
        ("g", "a", "q", "z", "iri"),     # multiplicity counts in n_triples
        ("g", "b", "p", "x", "iri"),
        ("g", "b", "q", "x", "iri"),
        ("g", "c", "p", "x", "iri"),
    ])
    got = {(r.sig, r.n_subjects, r.n_triples)
           for r in inference.characteristic_sets(tr).collect()}
    assert got == {("p|q", 2, 5), ("p", 1, 1)}
    ora = duckdb.connect().execute(inference.sql_characteristic_sets(
        "SELECT * FROM (VALUES ('g','a','p','x','iri'),"
        "('g','a','q','y','iri'),('g','a','q','z','iri'),"
        "('g','b','p','x','iri'),('g','b','q','x','iri'),"
        "('g','c','p','x','iri')) v(repo,subj,pred,obj,obj_type)"
    )).fetchall()
    assert got == set(map(tuple, ora))


def test_star_cardinality_estimate_vs_actual(spark):
    # sig p|q: subj a has 2 p's and 1 q (correlated), subj b has 1+1 →
    # estimate n_p*n_q/n_subj = 3*2/2 = 3 (num 6 / den 2); actual = 2+1
    tr = _df(spark, [
        ("g", "a", "p", "x1", "iri"), ("g", "a", "p", "x2", "iri"),
        ("g", "a", "q", "y1", "iri"),
        ("g", "b", "p", "x3", "iri"), ("g", "b", "q", "y2", "iri"),
        ("g", "c", "p", "x4", "iri"),   # lacks q: filtered out
    ])
    got = {tuple(r)
           for r in inference.star_cardinality(tr, "p", "q").collect()}
    assert got == {("p|q", 2, 3, 2, 6, 2, 3)}
    ora = duckdb.connect().execute(inference.sql_star_cardinality(
        "SELECT * FROM (VALUES ('g','a','p','x1','iri'),"
        "('g','a','p','x2','iri'),('g','a','q','y1','iri'),"
        "('g','b','p','x3','iri'),('g','b','q','y2','iri'),"
        "('g','c','p','x4','iri')) v(repo,subj,pred,obj,obj_type)",
        "p", "q")).fetchall()
    assert got == set(map(tuple, ora))
