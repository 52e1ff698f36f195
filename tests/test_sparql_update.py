"""SPARQL UPDATE subset — INSERT/DELETE DATA, DELETE WHERE, and
DELETE/INSERT WHERE over the (repo, subj, pred, obj, obj_type) store.

Reference parity note: the reference's store mutates through Jena on
re-translation (services/StoreService.java); here UPDATE is pure set
algebra over an immutable relation (sparql.py UPDATE section).
"""
from __future__ import annotations

import pytest

from git_prov_spark.sparql import SparqlError, update

T_SCHEMA = "repo string, subj string, pred string, obj string, obj_type string"


def _store(spark):
    return spark.createDataFrame([
        ("g1", "ex:u1", "ex:knows", "ex:u2", "iri"),
        ("g1", "ex:u2", "ex:knows", "ex:u3", "iri"),
        ("g1", "ex:u1", "ex:name", "ex:u2", "string"),   # literal sharing lexical!
        ("g1", "ex:u3", "ex:age", "41", "xsd:int"),
        ("g2", "ex:u1", "ex:knows", "ex:u2", "iri"),
    ], T_SCHEMA)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_insert_data_graph_block(spark):
    out = update(_store(spark), """
        INSERT DATA { GRAPH "g1" { ex:u4 ex:knows ex:u1 . ex:u4 ex:name "Dora" } }
    """)
    got = _rows(out)
    assert ("g1", "ex:u4", "ex:knows", "ex:u1", "iri") in got
    assert ("g1", "ex:u4", "ex:name", "Dora", "xsd:string") in got
    assert len(got) == 7


def test_insert_data_repo_scope_and_idempotence(spark):
    st = _store(spark)
    out = update(st, 'INSERT DATA { ex:u1 ex:knows ex:u2 }', repo="g1")
    assert _rows(out) == _rows(st)          # set semantics: no dup
    with pytest.raises(SparqlError):
        update(st, "INSERT DATA { ex:u9 ex:knows ex:u1 }")  # no graph anywhere


def test_insert_data_typed_literal(spark):
    out = update(_store(spark),
                 'INSERT DATA { ex:u1 ex:age "39"^^xsd:int }', repo="g1")
    assert ("g1", "ex:u1", "ex:age", "39", "xsd:int") in _rows(out)


def test_delete_data_term_exact(spark):
    # deletes the IRI row only — the lexically-equal literal row survives
    out = update(_store(spark),
                 "DELETE DATA { ex:u1 ex:knows ex:u2 }", repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u1", "ex:knows", "ex:u2", "iri") not in got
    assert ("g1", "ex:u1", "ex:name", "ex:u2", "string") in got
    assert ("g2", "ex:u1", "ex:knows", "ex:u2", "iri") in got   # other graph kept


def test_delete_where_scoped(spark):
    out = update(_store(spark),
                 "DELETE WHERE { ?a ex:knows ?b }", repo="g1")
    got = _rows(out)
    assert got == {
        ("g1", "ex:u1", "ex:name", "ex:u2", "string"),
        ("g1", "ex:u3", "ex:age", "41", "xsd:int"),
        ("g2", "ex:u1", "ex:knows", "ex:u2", "iri"),
    }


def test_delete_where_cross_graph(spark):
    out = update(_store(spark), "DELETE WHERE { ?a ex:knows ex:u2 }")
    got = _rows(out)
    assert all(not (p == "ex:knows" and o == "ex:u2") for _, _, p, o, _ in got)
    assert ("g1", "ex:u2", "ex:knows", "ex:u3", "iri") in got


def test_delete_where_term_exact_variable(spark):
    # ?o binds ex:u2 twice in g1: once as iri, once as string — each matched
    # row deletes with ITS OWN term identity, so both go; ex:u3's iri row and
    # the int row survive
    out = update(_store(spark), "DELETE WHERE { ex:u1 ?p ?o }", repo="g1")
    assert _rows(out) == {
        ("g1", "ex:u2", "ex:knows", "ex:u3", "iri"),
        ("g1", "ex:u3", "ex:age", "41", "xsd:int"),
        ("g2", "ex:u1", "ex:knows", "ex:u2", "iri"),
    }


def test_modify_rename_predicate(spark):
    out = update(_store(spark), """
        DELETE { ?a ex:knows ?b } INSERT { ?a ex:met ?b }
        WHERE { ?a ex:knows ?b }
    """, repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u1", "ex:met", "ex:u2", "iri") in got
    assert ("g1", "ex:u2", "ex:met", "ex:u3", "iri") in got
    assert all(p != "ex:knows" for g, _, p, _, _ in got if g == "g1")
    assert ("g2", "ex:u1", "ex:knows", "ex:u2", "iri") in got


def test_insert_where_with_filter_and_literal_object(spark):
    out = update(_store(spark), """
        INSERT { ?a ex:reaches "far" } WHERE {
          ?a ex:knows ?b . FILTER(?b != ex:u2)
        }
    """, repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u2", "ex:reaches", "far", "xsd:string") in got
    assert ("g1", "ex:u1", "ex:reaches", "far", "xsd:string") not in got


def test_insert_where_requires_repo(spark):
    with pytest.raises(SparqlError):
        update(_store(spark),
               "INSERT { ?a ex:x ?b } WHERE { ?a ex:knows ?b }")


def test_delete_insert_computed_against_original(spark):
    # spec §3.1.3: INSERT sees the pre-delete store — the inserted edge
    # derives from a solution whose triple the DELETE also removes
    out = update(_store(spark), """
        DELETE { ?a ex:knows ?b } INSERT { ?b ex:knownBy ?a }
        WHERE { ?a ex:knows ?b }
    """, repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u2", "ex:knownBy", "ex:u1", "iri") in got
    assert ("g1", "ex:u3", "ex:knownBy", "ex:u2", "iri") in got


def test_data_block_rejects_vars_and_bad_forms(spark):
    st = _store(spark)
    with pytest.raises(SparqlError):
        update(st, "INSERT DATA { ?x ex:y ex:u1 }", repo="g1")
    with pytest.raises(SparqlError):
        update(st, "DELETE WHERE { ?a ex:p ?b . FILTER(?b != ex:u1) }",
               repo="g1")
    with pytest.raises(SparqlError):
        update(st, "SELECT ?a WHERE { ?a ex:p ?b }", repo="g1")


def test_prefix_resolution_in_update(spark):
    st = spark.createDataFrame(
        [("g1", "ex:u1", "foo:p", "ex:u2", "iri")], T_SCHEMA)
    out = update(st, """
        PREFIX foo: <http://example.org/foo#>
        DELETE WHERE { ?a <http://example.org/foo#p> ?b }
    """, repo="g1")
    assert out.count() == 0


def test_modify_graph_var_routing(spark):
    # per-solution graph routing: inserts land in the graph each
    # solution's triple came from, deletes scope to it too
    st = _store(spark)
    out = update(st, """
        DELETE { GRAPH ?g { ?a ex:knows ?b } }
        INSERT { GRAPH ?g { ?b ex:knownBy ?a } }
        WHERE { GRAPH ?g { ?a ex:knows ?b } }
    """)
    got = _rows(out)
    assert ("g1", "ex:u2", "ex:knownBy", "ex:u1", "iri") in got
    assert ("g2", "ex:u2", "ex:knownBy", "ex:u1", "iri") in got
    assert ("g1", "ex:u3", "ex:knownBy", "ex:u2", "iri") in got
    assert all(p != "ex:knows" for _, _, p, _, _ in got)


def test_insert_constant_graph_block_template(spark):
    out = update(_store(spark), """
        INSERT { GRAPH "audit" { ?a ex:seen ?b } }
        WHERE { GRAPH "g2" { ?a ex:knows ?b } }
    """)
    assert ("audit", "ex:u1", "ex:seen", "ex:u2", "iri") in _rows(out)


def test_modify_where_with_property_path(spark):
    # UPDATE WHERE groups compile through the full engine — property
    # paths included: mark every node reachable from ex:u1 via ex:knows+
    st = _store(spark)
    out = update(st, """
        INSERT { ?b ex:reachedFromU1 "yes" }
        WHERE { ex:u1 ex:knows+ ?b }
    """, repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u2", "ex:reachedFromU1", "yes", "xsd:string") in got
    assert ("g1", "ex:u3", "ex:reachedFromU1", "yes", "xsd:string") in got
    assert ("g2", "ex:u2", "ex:reachedFromU1", "yes", "xsd:string") not in got


def test_graph_management_forms(spark):
    st = _store(spark)
    # CLEAR drops g1's triples, keeps g2
    got = _rows(update(st, 'CLEAR GRAPH "g1"'))
    assert got == {("g2", "ex:u1", "ex:knows", "ex:u2", "iri")}
    # COPY replaces the destination with the source
    got = _rows(update(st, 'COPY GRAPH "g1" TO GRAPH "g2"'))
    assert ("g2", "ex:u2", "ex:knows", "ex:u3", "iri") in got
    assert ("g2", "ex:u3", "ex:age", "41", "xsd:int") in got
    assert len([r for r in got if r[0] == "g2"]) == 4
    assert len([r for r in got if r[0] == "g1"]) == 4  # source intact
    # MOVE also drops the source
    got = _rows(update(st, 'MOVE "g1" TO "g2"'))
    assert not [r for r in got if r[0] == "g1"]
    assert len([r for r in got if r[0] == "g2"]) == 4
    # ADD unions (set semantics: g2's row already exists in g1's copy)
    got = _rows(update(st, 'ADD "g2" TO "g1"'))
    assert len(got) == 5  # g2's single row already present in g1
    # DROP is CLEAR
    assert _rows(update(st, 'DROP SILENT GRAPH "g2"')) \
        == {r for r in _rows(st) if r[0] != "g2"}


def test_update_parser_garbage_fails_loudly():
    """Any malformed update must raise SparqlError — never an internal
    IndexError/KeyError/AttributeError — so callers can catch one type."""
    import random

    from git_prov_spark.sparql import SparqlError, parse_update

    rng = random.Random(20260821)
    frags = ["INSERT", "DELETE", "DATA", "WHERE", "GRAPH", "{", "}", ".",
             "?x", "ex:p", '"lit"', "<http://e/x>", "FILTER", "(", ")",
             "COPY", "TO", "SILENT", ";", "^^xsd:int", "@en", "PREFIX"]
    n_bad = 0
    for _ in range(400):
        s = " ".join(rng.choice(frags)
                     for _ in range(rng.randrange(1, 12)))
        try:
            parse_update(s, repo="g")
        except SparqlError:
            n_bad += 1
        # anything else propagates and fails the test
    assert n_bad > 300   # the vast majority of random soup is malformed


def test_update_with_not_exists_filter(spark):
    # the full FILTER grammar (incl. bracketed NOT EXISTS —
    # the engine's documented constraint form) works in UPDATE WHERE
    out = update(_store(spark), """
        INSERT { ?a ex:leaf "yes" } WHERE {
          ?x ex:knows ?a .
          FILTER(NOT EXISTS { ?a ex:knows ?y })
        }
    """, repo="g1")
    got = _rows(out)
    assert ("g1", "ex:u3", "ex:leaf", "yes", "xsd:string") in got
    assert ("g1", "ex:u2", "ex:leaf", "yes", "xsd:string") not in got


def test_delete_where_repeated_variable_self_loops(spark):
    st = spark.createDataFrame([
        ("g1", "ex:a", "ex:knows", "ex:a", "iri"),     # self-loop
        ("g1", "ex:a", "ex:knows", "ex:b", "iri"),
        ("g1", "ex:b", "ex:knows", "ex:b", "iri"),     # self-loop
    ], T_SCHEMA)
    out = update(st, "DELETE WHERE { ?x ex:knows ?x }", repo="g1")
    assert _rows(out) == {("g1", "ex:a", "ex:knows", "ex:b", "iri")}
