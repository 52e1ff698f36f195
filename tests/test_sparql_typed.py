"""First-class typed literal terms (r5): language tags and datatypes flow
through solutions via hidden term-metadata companion columns (queries.bgp
typed mode) — typed pattern constants match term-exactly, variable joins are
term-correct, DATATYPE/LANG work in projection expressions and ORDER BY
without a BIND hoist, STRLANG/STRDT construct tagged terms, and
FILTER-inside-OPTIONAL referencing outer variables compiles to the left
join's ON condition (SPARQL §8.3 LeftJoin(expr), what ARQ gives the
reference via services/SparqlService.java:26).

The graph mixes SAME-LEXICAL terms under different datatypes/tags — the
cases the legacy all-string model conflated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from git_prov_spark.sparql import SparqlError, execute


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def typed_graph(spark):
    """Terms deliberately colliding on the lexical form:
      item-1 ev:val "5"^^xsd:int      item-1 ev:alt "5"^^xsd:string
      item-2 ev:val "5"^^xsd:string   item-2 ev:alt "5"^^xsd:int
      item-3 ev:val "x"@en            item-3 ev:alt "x"@fr
      item-4 ev:val "x"^^xsd:string   item-4 ev:alt "x"@en
      item-5 ev:val item-1 (IRI)      item-5 ev:alt "item-1"^^xsd:string
    """
    rows = [
        ("demo", "item-1", "ev:val", "5", "xsd:int"),
        ("demo", "item-1", "ev:alt", "5", "xsd:string"),
        ("demo", "item-2", "ev:val", "5", "xsd:string"),
        ("demo", "item-2", "ev:alt", "5", "xsd:int"),
        ("demo", "item-3", "ev:val", "x", "@en"),
        ("demo", "item-3", "ev:alt", "x", "@fr"),
        ("demo", "item-4", "ev:val", "x", "xsd:string"),
        ("demo", "item-4", "ev:alt", "x", "@en"),
        ("demo", "item-5", "ev:val", "item-1", "iri"),
        ("demo", "item-5", "ev:alt", "item-1", "xsd:string"),
    ]
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, "
              "obj_type string")


def test_typed_constant_matches_term_exactly(typed_graph):
    got = _rows(execute(typed_graph,
                        'SELECT ?s WHERE { ?s ev:val "5"^^xsd:int }'))
    assert got == [("item-1",)]
    got = _rows(execute(typed_graph,
                        'SELECT ?s WHERE { ?s ev:val "x"@en }'))
    assert got == [("item-3",)]
    # plain constants keep the legacy lexical matching (compatibility rule)
    got = _rows(execute(typed_graph,
                        'SELECT ?s WHERE { ?s ev:val "5" }'))
    assert got == [("item-1",), ("item-2",)]


def test_variable_joins_are_term_correct(typed_graph):
    # ?v must be the SAME TERM in both patterns: item-3's "x"@en vs "x"@fr
    # and item-1/2's int-vs-string "5" no longer join; item-5's IRI object
    # does not join its string spelling
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:val ?v . ?s ev:alt ?v }"))
    assert got == []
    # cross-subject join: item-1 val "5"^^xsd:int = item-2 alt "5"^^xsd:int
    got = _rows(execute(
        typed_graph,
        "SELECT ?a ?b WHERE { ?a ev:val ?v . ?b ev:alt ?v . "
        "FILTER(?a != ?b) }"))
    assert got == [("item-1", "item-2"), ("item-2", "item-1"),
                   ("item-3", "item-4")]


def test_datatype_in_projection_and_order_by(typed_graph):
    got = execute(typed_graph, """
        SELECT ?s (DATATYPE(?v) AS ?dt) WHERE { ?s ev:val ?v }
        ORDER BY DATATYPE(?v) ?s
    """).collect()
    assert [tuple(r) for r in got] == [
        ("item-5", None),           # IRI term: DATATYPE unbound — and
        ("item-3", "rdf:langString"),   # unbound sorts lowest (§15.1)
        ("item-1", "xsd:int"),
        ("item-2", "xsd:string"),
        ("item-4", "xsd:string"),
    ]


def test_lang_and_langmatches_on_real_tags(typed_graph):
    got = _rows(execute(typed_graph, """
        SELECT ?s (LANG(?v) AS ?lg) WHERE { ?s ev:alt ?v .
          FILTER(LANGMATCHES(LANG(?v), "*")) }
    """))
    assert got == [("item-3", "fr"), ("item-4", "en")]


def test_isnumeric_isliteral_isiri_row_predicates(typed_graph):
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:val ?v . "
                        "FILTER(isNumeric(?v)) }"))
    assert got == [("item-1",)]
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:val ?v . "
                        "FILTER(isIRI(?v)) }"))
    assert got == [("item-5",)]
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:val ?v . "
                        "FILTER(!isLiteral(?v)) }"))
    assert got == [("item-5",)]


def test_sameterm_and_term_equality_filters(typed_graph):
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:val ?a . ?s ev:alt ?b .
          FILTER(SAMETERM(?a, ?b)) }
    """))
    assert got == []
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:val ?v . "
                        'FILTER(?v = "x"@en) }'))
    assert got == [("item-3",)]
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:alt ?v . "
                        'FILTER(?v != "x"@en) }'))
    assert got == [("item-1",), ("item-2",), ("item-3",), ("item-5",)]
    # numeric-typed constants take VALUE comparison (§17.1 promotion):
    # non-numeric lexicals are type errors and those rows drop
    got = _rows(execute(typed_graph,
                        "SELECT ?s WHERE { ?s ev:alt ?v . "
                        'FILTER(?v != "4"^^xsd:int) }'))
    assert got == [("item-1",), ("item-2",)]


def test_distinct_is_term_level(typed_graph):
    # four distinct TERMS spell the lexical "x"/"5" pairs: DISTINCT ?v keeps
    # one row per term, not per lexical
    got = execute(typed_graph,
                  "SELECT DISTINCT ?v WHERE { ?s ev:val ?v }")
    assert got.count() == 5  # 5^^int, 5^^string, x@en, x^^string, item-1 iri
    assert got.columns == ["v"]  # metadata companion never leaks


def test_typed_constant_numeric_filter(typed_graph):
    # numeric-typed constants compare numerically per §17.1
    got = _rows(execute(typed_graph,
                        "SELECT ?s ?v WHERE { ?s ev:val ?v . "
                        'FILTER(?v >= "4"^^xsd:int && isNumeric(?v)) }'))
    assert got == [("item-1", "5")]


def test_optional_filter_with_outer_var_is_join_condition(typed_graph):
    # §8.3: the filter references ?v (outer) and ?w (block) — evaluated as
    # the left join's ON condition, keeping non-matching rows as unbound
    got = _rows(execute(typed_graph, """
        SELECT ?s ?v ?w WHERE {
          ?s ev:val ?v .
          OPTIONAL { ?s ev:alt ?w . FILTER(STRLEN(?w) + STRLEN(?v) <= 2) }
        }
    """))
    assert got == [
        ("item-1", "5", "5"), ("item-2", "5", "5"),
        ("item-3", "x", "x"), ("item-4", "x", "x"),
        ("item-5", "item-1", None),   # 6+6 fails the ON condition
    ]
    # term-aware ON condition: LANG of the block var resolves through the
    # renamed metadata companion
    got = _rows(execute(typed_graph, """
        SELECT ?s ?w WHERE {
          ?s ev:val ?v .
          OPTIONAL { ?s ev:alt ?w . FILTER(LANG(?w) != LANG(?v)) }
        }
    """))
    assert ("item-3", "x") in got        # @fr vs @en: differs → kept
    assert ("item-1", None) in got       # "" vs "": equal → unbound
    assert ("item-4", "x") in got        # @en vs "": differs → kept


def test_optional_filter_outer_only_vars(typed_graph):
    # the famous corner: a filter referencing ONLY outer vars still guards
    # the join (rows failing it keep the OPTIONAL side unbound)
    got = _rows(execute(typed_graph, """
        SELECT ?s ?w WHERE {
          ?s ev:val ?v .
          OPTIONAL { ?s ev:alt ?w . FILTER(?s = "item-3") }
        }
    """))
    assert ("item-3", "x") in got
    assert ("item-1", None) in got and ("item-4", None) in got


def test_optional_block_only_filter_still_prejoin(typed_graph):
    got = _rows(execute(typed_graph, """
        SELECT ?s ?w WHERE {
          ?s ev:val ?v .
          OPTIONAL { ?s ev:alt ?w . FILTER(isNumeric(?w)) }
        }
    """))
    assert ("item-2", "5") in got and ("item-1", None) in got


def test_seeded_now_rand_uuid(typed_graph):
    got = execute(typed_graph, """
        SELECT ?s (NOW() AS ?t) (RAND() AS ?r) (STRUUID() AS ?u)
        WHERE { ?s ev:val ?v } ORDER BY ?s
    """, now="2026-08-19T00:00:00Z", seed=42)
    rows = [tuple(r) for r in got.collect()]
    assert all(t == "2026-08-19T00:00:00Z" for _s, t, _r, _u in rows)
    assert all(0.0 <= r < 1.0 for _s, _t, r, _u in rows)
    assert len({r for _s, _t, r, _u in rows}) == len(rows)  # per-solution
    import re

    assert all(re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}", u)
        for _s, _t, _r, u in rows)
    # deterministic across runs
    again = [tuple(r) for r in execute(typed_graph, """
        SELECT ?s (NOW() AS ?t) (RAND() AS ?r) (STRUUID() AS ?u)
        WHERE { ?s ev:val ?v } ORDER BY ?s
    """, now="2026-08-19T00:00:00Z", seed=42).collect()]
    assert again == rows


def test_unseeded_nondet_builtins_still_reject(typed_graph):
    for q in ("SELECT ?s WHERE { ?s ev:val ?v . FILTER(RAND() < 1) }",
              "SELECT (NOW() AS ?t) WHERE { ?s ev:val ?v }",
              "SELECT (UUID() AS ?u) WHERE { ?s ev:val ?v }"):
        with pytest.raises(SparqlError, match="nondeterministic"):
            execute(typed_graph, q)


def test_projection_expression_general(typed_graph):
    got = _rows(execute(typed_graph, """
        SELECT ?s (CONCAT(UCASE(STR(?v)), "!") AS ?shout)
        WHERE { ?s ev:val ?v . FILTER(?s = "item-3") }
    """))
    assert got == [("item-3", "X!")]


def test_typed_literals_in_in_lists(typed_graph):
    """§17.4.1.9: each typed IN member routes through the = compile, so
    non-numeric typed members are TERM-exact while plain members keep the
    legacy value-level isin."""
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:alt ?v .
                          FILTER(?v IN ("x"@fr, "x"@en)) }"""))
    assert got == [("item-3",), ("item-4",)]
    # mixed plain + typed members: plain "item-1" matches item-5's IRI
    # object value-level, "x"@en matches item-3's ev:val term-exactly
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:val ?v .
                          FILTER(?v IN ("x"@en, "item-1")) }"""))
    assert got == [("item-3",), ("item-5",)]
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:alt ?v .
                          FILTER(?v NOT IN ("x"@fr, "x"@en)) }"""))
    assert got == [("item-1",), ("item-2",), ("item-5",)]


def test_typed_literals_in_values(typed_graph):
    """An all-typed VALUES column joins term-exactly via its hidden
    companion; a plain column keeps value-level matching; mixing plain
    and typed in one column is rejected."""
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:val ?v . VALUES ?v { "5"^^xsd:int "x"@en } }
    """))
    assert got == [("item-1",), ("item-3",)]
    # plain column: legacy value-level (both "5" terms match)
    got = _rows(execute(typed_graph, """
        SELECT ?s WHERE { ?s ev:val ?v . VALUES ?v { "5" } }"""))
    assert got == [("item-1",), ("item-2",)]
    with pytest.raises(SparqlError, match="mixes"):
        execute(typed_graph, """
            SELECT ?s WHERE { ?s ev:val ?v . VALUES ?v { "5"^^xsd:int "x" } }
        """)


def test_values_introduces_typed_terms(typed_graph):
    """A VALUES-introduced typed term carries its metadata into downstream
    builtins (LANG/DATATYPE read the companion, no pattern needed)."""
    got = _rows(execute(typed_graph, """
        SELECT ?lg ?dt WHERE {
          VALUES (?v ?w) { ("hello"@en-GB "7"^^xsd:int) } .
          BIND(LANG(?v) AS ?lg) . BIND(DATATYPE(?w) AS ?dt)
        }"""))
    assert got == [("en-gb", "xsd:int")]


def test_bare_frame_degrades_to_lexical(spark):
    """Frames without obj_type keep the legacy value-level behavior."""
    t = spark.createDataFrame(
        [("demo", "a", "ev:p", "b"), ("demo", "b", "ev:q", "b")],
        "repo string, subj string, pred string, obj string")
    got = _rows(execute(t, "SELECT ?x WHERE { ?x ev:p ?v . ?v ev:q ?v }"))
    assert got == [("a",)]


def test_canned_bgp_unchanged(spark, typed_graph):
    """queries.bgp default (typed=False) binds values only — canned PROV
    shapes keep their schema."""
    from git_prov_spark.queries import bgp

    df = bgp(typed_graph, [("?s", "ev:val", "?v")], repo="demo")
    assert df.columns == ["s", "v"]


def test_group_by_is_term_level(typed_graph):
    """GROUP BY splits same-lexical keys by term metadata (r5): the five
    ev:val objects are five distinct TERMS even though only three lexical
    forms exist — the projected key column repeats the lexical."""
    got = _rows(execute(typed_graph, """
        SELECT ?v (COUNT(*) AS ?n) WHERE { ?s ev:val ?v } GROUP BY ?v
    """))
    assert got == [("5", 1), ("5", 1), ("item-1", 1), ("x", 1), ("x", 1)]


def test_count_distinct_is_term_level(typed_graph):
    # ungrouped: 5 terms over 3 lexical forms
    got = _rows(execute(typed_graph, """
        SELECT (COUNT(DISTINCT ?v) AS ?n) WHERE { ?s ev:val ?v }
    """))
    assert got == [(5,)]
    # grouped by subject over both predicates: every item holds two
    # same-lexical-different-meta terms (the conflation cases)
    got = _rows(execute(typed_graph, """
        SELECT ?s (COUNT(DISTINCT ?v) AS ?n) WHERE { ?s ?p ?v } GROUP BY ?s
    """))
    assert got == [("item-1", 2), ("item-2", 2), ("item-3", 2),
                   ("item-4", 2), ("item-5", 2)]


def test_group_by_degrades_to_value_level_without_meta(spark):
    t = spark.createDataFrame(
        [("demo", "a", "ev:p", "5"), ("demo", "b", "ev:p", "5")],
        "repo string, subj string, pred string, obj string")
    got = _rows(execute(t, """
        SELECT ?v (COUNT(*) AS ?n) WHERE { ?s ev:p ?v } GROUP BY ?v
    """))
    assert got == [("5", 2)]


def test_aggregate_over_expressions(spark):
    """r5: aggregate arguments may be full value expressions, compiled
    map-side into the same single hash-aggregate."""
    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g1", "ev:n", "10", "xsd:int"),
         ("demo", "g2", "ev:n", "3", "xsd:int")],
        "repo string, subj string, pred string, obj string, obj_type string")
    got = _rows(execute(t, """
        SELECT ?g (SUM(?v * ?v) AS ?ss) (MIN(STRLEN(?v)) AS ?lo)
               (COUNT(DISTINCT CONCAT(?v, "x")) AS ?n)
        WHERE { ?g ev:n ?v } GROUP BY ?g"""))
    assert got == [("g1", 104.0, 1, 2), ("g2", 9.0, 1, 1)]
    got = _rows(execute(t, """
        SELECT (SUM(STRLEN(?v)) AS ?n) WHERE { ?g ev:n ?v }"""))
    assert got == [(4.0,)]
    # plain-var args keep their parse shape (the meta-aware fast path)
    from git_prov_spark.sparql import parse
    q = parse("SELECT ?g (COUNT(DISTINCT ?v) AS ?n) "
              "WHERE { ?g ev:n ?v } GROUP BY ?g")
    assert q.aggregates[0].var == "v" and q.aggregates[0].expr is None


def test_having_inline_aggregates(spark):
    """r5: HAVING may compare an INLINE aggregate — computed as a hidden
    column of the same hash-aggregate — including with no aggregate in
    the projection at all."""
    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g1", "ev:n", "10", "xsd:int"),
         ("demo", "g2", "ev:n", "3", "xsd:int")],
        "repo string, subj string, pred string, obj string, obj_type string")
    got = _rows(execute(t, """
        SELECT ?g WHERE { ?g ev:n ?v } GROUP BY ?g HAVING (COUNT(*) > 1)"""))
    assert got == [("g1",)]
    got = _rows(execute(t, """
        SELECT ?g (COUNT(*) AS ?n) WHERE { ?g ev:n ?v }
        GROUP BY ?g HAVING (SUM(?v * ?v) >= 100)"""))
    assert got == [("g1", 2)]
    # alias-based HAVING unchanged; hidden columns never leak
    df = execute(t, """
        SELECT ?g (SUM(?v) AS ?s) WHERE { ?g ev:n ?v }
        GROUP BY ?g HAVING (?s > 5) HAVING (COUNT(*) > 1)""")
    assert df.columns == ["g", "s"]
    assert _rows(df) == [("g1", 12.0)]


def test_order_by_inline_aggregates(spark):
    """r5: ORDER BY may sort on an INLINE aggregate (hidden column of the
    same hash-aggregate, dropped after the sort), with or without a
    projection aggregate; rejected without GROUP BY and under DISTINCT."""
    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g1", "ev:n", "10", "xsd:int"),
         ("demo", "g2", "ev:n", "3", "xsd:int"),
         ("demo", "g2", "ev:n", "4", "xsd:int"),
         ("demo", "g2", "ev:n", "5", "xsd:int"),
         ("demo", "g3", "ev:n", "30", "xsd:int")],
        "repo string, subj string, pred string, obj string, obj_type string")
    got = execute(t, """
        SELECT ?g WHERE { ?g ev:n ?v }
        GROUP BY ?g ORDER BY DESC(COUNT(*)) ?g""")
    assert got.columns == ["g"]
    assert [r[0] for r in got.collect()] == ["g2", "g1", "g3"]
    # squares: g3=900 > g1=104 > g2=50; hidden col never leaks
    df = execute(t, """
        SELECT ?g (SUM(?v) AS ?s) WHERE { ?g ev:n ?v }
        GROUP BY ?g ORDER BY DESC(SUM(?v * ?v))""")
    assert df.columns == ["g", "s"]
    assert [tuple(r) for r in df.collect()] == [
        ("g3", 30.0), ("g1", 12.0), ("g2", 12.0)]
    # inline agg sort changes WHICH rows survive a LIMIT
    got = execute(t, """
        SELECT ?g (COUNT(*) AS ?n) WHERE { ?g ev:n ?v }
        GROUP BY ?g HAVING (COUNT(*) > 1) ORDER BY SUM(?v * ?v) LIMIT 1""")
    assert [tuple(r) for r in got.collect()] == [("g2", 3)]
    with pytest.raises(SparqlError, match="requires GROUP BY"):
        execute(t, "SELECT ?g ?v WHERE { ?g ev:n ?v } ORDER BY COUNT(*)")
    with pytest.raises(SparqlError, match="DISTINCT"):
        execute(t, """SELECT DISTINCT ?g WHERE { ?g ev:n ?v }
                      GROUP BY ?g ORDER BY COUNT(*)""")


def test_distinct_non_count_aggregates(spark):
    """r5: DISTINCT on SUM/AVG/GROUP_CONCAT collapses the solution
    multiset to the distinct value set (no-op on MIN/MAX). The ev:a fan
    duplicates each ?v binding twice, so plain vs DISTINCT differ."""
    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g1", "ev:n", "10", "xsd:int"),
         ("demo", "g1", "ev:a", "x1", "xsd:string"),
         ("demo", "g1", "ev:a", "x2", "xsd:string"),
         ("demo", "g2", "ev:n", "3", "xsd:int"),
         ("demo", "g2", "ev:a", "x1", "xsd:string")],
        "repo string, subj string, pred string, obj string, obj_type string")
    df = execute(t, """
        SELECT ?g (SUM(?v) AS ?s) (SUM(DISTINCT ?v) AS ?sd)
               (AVG(DISTINCT ?v) AS ?ad) (MIN(DISTINCT ?v) AS ?lo)
               (GROUP_CONCAT(DISTINCT ?v; SEPARATOR=",") AS ?cs)
        WHERE { ?g ev:a ?x . ?g ev:n ?v } GROUP BY ?g ORDER BY ?g""")
    assert [tuple(r) for r in df.collect()] == [
        ("g1", 24.0, 12.0, 6.0, "10", "10,2"),
        ("g2", 3.0, 3.0, 3.0, "3", "3")]


def test_seeded_builtins_all_query_forms(spark):
    """r5: the seeded now/seed parameters pass through construct/ask/
    describe and the query() dispatcher — not just execute()."""
    from git_prov_spark.sparql import ask, construct, query

    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g2", "ev:n", "3", "xsd:int")],
        "repo string, subj string, pred string, obj string, obj_type string")
    out = construct(t, """CONSTRUCT { ?s ev:r ?r }
                          WHERE { ?s ev:n ?o . BIND(RAND() AS ?r) }""",
                    seed=3)
    rows = sorted(tuple(r) for r in out.collect())
    assert len(rows) == 2 and all(p == "ev:r" for _, p, _ in rows)
    # deterministic: same seed → same graph; different seed → different
    again = construct(t, """CONSTRUCT { ?s ev:r ?r }
                            WHERE { ?s ev:n ?o . BIND(RAND() AS ?r) }""",
                      seed=3)
    assert sorted(tuple(r) for r in again.collect()) == rows
    assert ask(t, "ASK { ?s ev:n ?o FILTER(?o > RAND()) }", seed=1) in (
        True, False)  # executes without the unseeded-rejection error
    via = query(t, """CONSTRUCT { ?s ev:r ?r }
                      WHERE { ?s ev:n ?o . BIND(RAND() AS ?r) }""", seed=3)
    assert sorted(tuple(r) for r in via.collect()) == rows


def test_construct_where_shorthand(spark):
    """r5: CONSTRUCT WHERE { BGP } (§10.2.2) uses the BGP as template;
    ORDER BY/LIMIT/OFFSET cut the solution sequence pre-template (§16.2);
    non-BGP shorthand bodies and grouping forms are loud errors."""
    from git_prov_spark.sparql import construct, parse

    t = spark.createDataFrame(
        [("demo", "g1", "ev:n", "2", "xsd:int"),
         ("demo", "g1", "ev:m", "9", "xsd:int"),
         ("demo", "g2", "ev:n", "3", "xsd:int"),
         ("demo", "g3", "ev:n", "7", "xsd:int")],
        "repo string, subj string, pred string, obj string, obj_type string")
    got = construct(t, "CONSTRUCT WHERE { ?s ev:n ?o }")
    assert sorted(tuple(r) for r in got.collect()) == [
        ("g1", "ev:n", "2"), ("g2", "ev:n", "3"), ("g3", "ev:n", "7")]
    got = construct(t, """CONSTRUCT { ?s ev:top ?o } WHERE { ?s ev:n ?o }
                          ORDER BY DESC(?o) LIMIT 2""")
    assert sorted(tuple(r) for r in got.collect()) == [
        ("g2", "ev:top", "3"), ("g3", "ev:top", "7")]
    got = construct(t, """CONSTRUCT WHERE { ?s ev:n ?o }
                          ORDER BY ?o OFFSET 1 LIMIT 1""")
    assert [tuple(r) for r in got.collect()] == [("g2", "ev:n", "3")]
    with pytest.raises(SparqlError, match="plain *BGP"):
        parse("CONSTRUCT WHERE { ?s ev:n ?o OPTIONAL { ?s ev:m ?m } }")
    with pytest.raises(SparqlError, match="not allowed in"):
        parse("CONSTRUCT { ?s ev:x ?o } WHERE { ?s ev:n ?o } GROUP BY ?s")
