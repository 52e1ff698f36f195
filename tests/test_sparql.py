"""SPARQL SELECT (subset) frontend: parse goldens, execution vs the oracle
triple set, equivalence of CURIE / full-IRI / `a` spellings, filters,
modifiers, and rejection of out-of-subset queries."""

from __future__ import annotations

import pytest

from git_prov_spark.sparql import SparqlError, execute, parse

HOT = "org0/hot"


def _expected(oracle_set, repo, pred):
    return {(s, o) for r, s, p, o, _ in oracle_set if r == repo and p == pred}


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------

def test_parse_golden():
    q = parse(
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        SELECT DISTINCT ?c ?label
        WHERE {
          ?c a prov:Activity .
          ?c <http://www.w3.org/2000/01/rdf-schema#label> ?label .
          FILTER(?label = "Initial commit")
        }
        ORDER BY DESC(?c) LIMIT 10
        """
    )
    assert q.distinct and q.variables == ["c", "label"]
    assert q.patterns == [
        ("?c", "rdf:type", "prov:Activity"),
        ("?c", "rdfs:label", "?label"),
    ]
    assert q.filters == [
        ("cmp", "=", ("var", "label"), ("const", "Initial commit"))
    ]
    assert q.order_by == [("c", False)] and q.limit == 10


def test_parse_star_and_user_prefix():
    q = parse(
        'PREFIX ex: <http://example.org/x#> '
        'SELECT * WHERE { ?s ex:knows ?o . ?o <http://example.org/x#age> "7"^^ex:int }'
    )
    assert q.variables is None
    assert q.patterns == [("?s", "ex:knows", "?o"), ("?o", "ex:age", "7")]


@pytest.mark.parametrize(
    "bad",
    [
        "INSERT { ?s ?p ?o } WHERE { ?s ?p ?o }",      # update form
        "SELECT ?s WHERE { ?s ?p }",                   # truncated pattern
        "SELECT ?s WHERE { ?s ?p ?o . FILTER(NOW() > ?s) }",   # unsupported fn
        "SELECT WHERE { ?s ?p ?o }",                   # no projection
        "SELECT ?s WHERE { ?s ?p ?o } LIMIT x",        # bad limit
        "SELECT ?s WHERE { ?s ?p ?o } garbage",        # trailing input
    ],
)
def test_parse_rejects_out_of_subset(bad):
    with pytest.raises(SparqlError):
        parse(bad)


# --------------------------------------------------------------------------
# Execution over the fixture graph (vs the independent python oracle)
# --------------------------------------------------------------------------

def test_execute_activities_with_labels(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?c ?label WHERE { ?c a prov:Activity . ?c rdfs:label ?label }
        """,
        repo=HOT,
    )
    types = _expected(oracle_set, HOT, "rdf:type")
    labels = _expected(oracle_set, HOT, "rdfs:label")
    activities = {s for s, o in types if o == "prov:Activity"}
    expected = {(c, lbl) for c, lbl in labels if c in activities}
    assert {(r.c, r.label) for r in got.collect()} == expected
    assert len(expected) > 0


def test_execute_full_iri_equals_curie(triples_df):
    curie = execute(
        triples_df,
        "SELECT ?c ?p WHERE { ?c prov:wasInformedBy ?p }",
        repo=HOT,
    )
    full = execute(
        triples_df,
        "SELECT ?c ?p WHERE { ?c <http://www.w3.org/ns/prov#wasInformedBy> ?p }",
        repo=HOT,
    )
    assert {tuple(r) for r in curie.collect()} == {tuple(r) for r in full.collect()}


def test_execute_filter_and_projection(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        SELECT ?e WHERE {
          ?e prov:wasGeneratedBy ?c .
          FILTER(?c != "gitprov:commit-nonexistent")
        }
        """,
        repo=HOT,
    )
    gen = _expected(oracle_set, HOT, "prov:wasGeneratedBy")
    assert {r.e for r in got.collect()} == {e for e, _ in gen}


def test_execute_gitprov_full_iri(triples_df, oracle_set):
    """Per-repo gitprov namespace resolves in full-IRI constants."""
    gen = _expected(oracle_set, HOT, "prov:wasGeneratedBy")
    some_commit = sorted(c for _, c in gen)[0]  # e.g. gitprov:commit-<sha>
    local = some_commit.split(":", 1)[1]
    got = execute(
        triples_df,
        f"SELECT ?e WHERE {{ ?e prov:wasGeneratedBy <gitprov://{HOT}#{local}> }}",
        repo=HOT,
    )
    expected = {e for e, c in gen if c == some_commit}
    assert {r.e for r in got.collect()} == expected
    assert len(expected) > 0


def test_execute_order_by_limit(triples_df):
    got = execute(
        triples_df,
        "SELECT ?c WHERE { ?c a prov:Activity } ORDER BY ASC(?c) LIMIT 3",
        repo=HOT,
    ).collect()
    vals = [r.c for r in got]
    assert len(vals) == 3 and vals == sorted(vals)


def test_execute_unbound_select_raises(triples_df):
    with pytest.raises(SparqlError):
        execute(triples_df, "SELECT ?nope WHERE { ?c a prov:Activity }", repo=HOT)


def test_parse_fuzz_grammar_roundtrip():
    """Property fuzz: queries GENERATED from the supported grammar must
    parse back to exactly the structures they were generated from."""
    import random

    rng = random.Random(77)
    PREFIXES = {"prov": "http://www.w3.org/ns/prov#",
                "ex": "http://example.org/x#"}
    VARS = ["s", "p", "o", "x", "y"]

    for trial in range(150):
        pats_src, pats_want = [], []
        n_pat = rng.randrange(1, 4)
        for i in range(n_pat):
            triple_src, triple_want = [], []
            for pos in range(3):
                choice = rng.choice(["var", "curie", "iri", "lit", "a"])
                if choice == "a" and pos != 1:
                    choice = "var"
                if choice == "lit" and pos != 2:
                    choice = "curie"
                if choice == "var":
                    v = rng.choice(VARS)
                    triple_src.append(f"?{v}")
                    triple_want.append(f"?{v}")
                elif choice == "curie":
                    p = rng.choice(list(PREFIXES))
                    t = f"{p}:t{rng.randrange(5)}"
                    triple_src.append(t)
                    triple_want.append(t)
                elif choice == "iri":
                    p = rng.choice(list(PREFIXES))
                    local = f"t{rng.randrange(5)}"
                    triple_src.append(f"<{PREFIXES[p]}{local}>")
                    triple_want.append(f"{p}:{local}")
                elif choice == "lit":
                    triple_src.append('"v w"')
                    triple_want.append("v w")
                else:  # a
                    triple_src.append("a")
                    triple_want.append("rdf:type")
            pats_src.append(" ".join(triple_src))
            pats_want.append(tuple(triple_want))
        sel_vars = sorted({t[1:] for p in pats_want for t in p
                           if t.startswith("?")})
        proj = " ".join(f"?{v}" for v in sel_vars) if sel_vars else "*"
        if proj == "*":
            sel_vars = None
        prologue = "".join(
            f"PREFIX {p}: <{ns}> " for p, ns in PREFIXES.items()
        )
        src = (prologue + f"SELECT {proj} WHERE {{ "
               + " . ".join(pats_src) + " }")
        q = parse(src)
        assert q.patterns == pats_want, src
        if sel_vars is None:
            assert q.variables is None
        else:
            assert q.variables == sel_vars


def test_parse_optional_and_in():
    q = parse(
        """
        SELECT ?e ?d WHERE {
          ?e a prov:Entity .
          OPTIONAL { ?e prov:wasDerivedFrom ?d } .
          FILTER(?e IN ("gitprov:a", "gitprov:b"))
        }
        """
    )
    assert q.patterns == [("?e", "rdf:type", "prov:Entity")]
    from git_prov_spark.sparql import Group
    assert q.optionals == [
        Group(patterns=[("?e", "prov:wasDerivedFrom", "?d")])
    ]
    assert q.filters == [
        ("in", ("var", "e"), ["gitprov:a", "gitprov:b"], False)
    ]


def test_execute_optional_left_join(triples_df, oracle_set):
    """Entities keep their row when the OPTIONAL derivation is absent
    (null ?d), and bind it when present — SPARQL OPTIONAL semantics."""
    got = execute(
        triples_df,
        """
        SELECT ?e ?d WHERE {
          ?e a prov:Entity .
          OPTIONAL { ?e prov:wasDerivedFrom ?d }
        }
        """,
        repo=HOT,
    )
    rows = {(r.e, r.d) for r in got.collect()}
    types = _expected(oracle_set, HOT, "rdf:type")
    entities = {s for s, o in types if o == "prov:Entity"}
    derived = _expected(oracle_set, HOT, "prov:wasDerivedFrom")
    expected = set()
    for e in entities:
        ds = {d for s, d in derived if s == e}
        if ds:
            expected |= {(e, d) for d in ds}
        else:
            expected.add((e, None))
    assert rows == expected
    assert any(d is None for _, d in rows)      # some underived entities
    assert any(d is not None for _, d in rows)  # some derived ones


def test_execute_filter_in(triples_df, oracle_set):
    gen = _expected(oracle_set, HOT, "prov:wasGeneratedBy")
    commits = sorted({c for _, c in gen})[:2]
    quoted = ", ".join(f'"{c}"' for c in commits)
    got = execute(
        triples_df,
        f"SELECT ?e ?c WHERE {{ ?e prov:wasGeneratedBy ?c . "
        f"FILTER(?c IN ({quoted})) }}",
        repo=HOT,
    )
    expected = {(e, c) for e, c in gen if c in commits}
    assert {(r.e, r.c) for r in got.collect()} == expected
    assert len(expected) > 0


def test_optional_without_shared_var_raises(triples_df):
    with pytest.raises(SparqlError):
        execute(
            triples_df,
            "SELECT ?c WHERE { ?c a prov:Activity . "
            "OPTIONAL { ?x prov:wasDerivedFrom ?y } }",
            repo=HOT,
        )


# --------------------------------------------------------------------------
# Aggregates (GROUP BY / COUNT / SUM / MIN / MAX)
# --------------------------------------------------------------------------

def test_parse_aggregates():
    q = parse(
        """
        SELECT ?u (COUNT(DISTINCT ?c) AS ?n) (SUM(?x) AS ?total)
        WHERE { ?u ex:did ?c . ?c ex:weight ?x }
        GROUP BY ?u ORDER BY DESC(?n) LIMIT 3
        """
    )
    assert q.variables == ["u"] and q.group_by == ["u"]
    assert q.select_order == ["u", "n", "total"]
    assert [(a.func, a.var, a.distinct, a.alias) for a in q.aggregates] == [
        ("count", "c", True, "n"),
        ("sum", "x", False, "total"),
    ]
    assert q.order_by == [("n", False)] and q.limit == 3


def test_execute_count_group_by(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        SELECT ?c (COUNT(?e) AS ?n_used)
        WHERE { ?c prov:used ?e }
        GROUP BY ?c
        """,
        repo=HOT,
    )
    used = _expected(oracle_set, HOT, "prov:used")
    expected = {}
    for c, e in used:
        expected[c] = expected.get(c, 0) + 1
    assert {(r.c, r.n_used) for r in got.collect()} == set(expected.items())
    assert len(expected) > 0


def test_execute_global_count_star(triples_df, oracle_set):
    got = execute(
        triples_df,
        "SELECT (COUNT(*) AS ?n) WHERE { ?c a prov:Activity }",
        repo=HOT,
    )
    types = _expected(oracle_set, HOT, "rdf:type")
    n_activities = sum(1 for _, o in types if o == "prov:Activity")
    rows = got.collect()
    assert len(rows) == 1 and rows[0].n == n_activities > 0


def test_execute_sum_numeric_lexical(triples_df, oracle_set):
    got = execute(
        triples_df,
        "SELECT (SUM(?a) AS ?total) (MAX(?a) AS ?hi) (AVG(?a) AS ?mean) "
        "WHERE { ?d gitprov:additions ?a }",
        repo=HOT,
    )
    adds = [float(o) for _, o in _expected(oracle_set, HOT, "gitprov:additions")]
    # additions repeat across derivations; oracle_set is a SET of (s,o) pairs,
    # and so is the triple store — sums agree because subjects are distinct
    rows = got.collect()
    assert rows[0].total == sum(adds)
    assert float(rows[0].hi) == max(adds)
    assert abs(rows[0].mean - sum(adds) / len(adds)) < 1e-9
    assert len(adds) > 0


def test_execute_count_skips_unbound_optional(triples_df, oracle_set):
    """COUNT(?v) over an OPTIONAL variable counts only bound solutions,
    COUNT(*) counts all of them — the SPARQL null-skipping distinction."""
    got = execute(
        triples_df,
        """
        SELECT ?c (COUNT(?prev) AS ?n_parents) (COUNT(*) AS ?n_rows)
        WHERE { ?c a prov:Activity .
                OPTIONAL { ?c prov:wasInformedBy ?prev } }
        GROUP BY ?c
        """,
        repo=HOT,
    )
    types = _expected(oracle_set, HOT, "rdf:type")
    informed = _expected(oracle_set, HOT, "prov:wasInformedBy")
    activities = {s for s, o in types if o == "prov:Activity"}
    parents = {}
    for c, p in informed:
        parents[c] = parents.get(c, 0) + 1
    expected = {(c, parents.get(c, 0), max(parents.get(c, 0), 1))
                for c in activities}
    assert {(r.c, r.n_parents, r.n_rows) for r in got.collect()} == expected
    # root commit(s): present with n_parents=0 — the OPTIONAL must not drop them
    assert any(n == 0 for _, n, _ in expected)


def test_execute_agg_validation(triples_df):
    with pytest.raises(SparqlError):   # projected var missing from GROUP BY
        execute(triples_df,
                "SELECT ?c ?e (COUNT(?e) AS ?n) WHERE { ?c prov:used ?e } "
                "GROUP BY ?c", repo=HOT)
    # SUM(DISTINCT ?v) is SUPPORTED since r5 (see
    # tests/test_sparql_typed.py::test_distinct_non_count_aggregates) —
    # only MIN/MAX/SAMPLE treat DISTINCT as a no-op, nothing raises here
    with pytest.raises(SparqlError):   # aggregate over unbound variable
        execute(triples_df,
                "SELECT (COUNT(?zz) AS ?n) WHERE { ?c a prov:Activity }",
                repo=HOT)


def test_execute_having(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        SELECT ?c (COUNT(?e) AS ?n_used)
        WHERE { ?c prov:used ?e }
        GROUP BY ?c HAVING(?n_used >= 2)
        """,
        repo=HOT,
    )
    used = _expected(oracle_set, HOT, "prov:used")
    counts = {}
    for c, _ in used:
        counts[c] = counts.get(c, 0) + 1
    expected = {(c, n) for c, n in counts.items() if n >= 2}
    assert {(r.c, r.n_used) for r in got.collect()} == expected
    assert 0 < len(expected) < len(counts)  # the filter actually cuts


def test_having_validation(triples_df):
    with pytest.raises(SparqlError):   # HAVING without aggregates
        execute(triples_df, "SELECT ?s WHERE { ?s ?p ?o } HAVING(?s > 1)",
                repo=HOT)
    with pytest.raises(SparqlError):   # HAVING on an unknown column
        execute(triples_df,
                "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING(?m > 1)",
                repo=HOT)
    with pytest.raises(SparqlError):   # non-numeric rhs
        parse('SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o } HAVING(?n > "x")')


def test_sparql_over_store_prunes_pred_partitions(triples_df, spark, tmp_path_factory):
    """A SPARQL string whose patterns carry constant predicates, run over the
    partitioned store, must reach the scan as PartitionFilters on `pred`
    (partition column) and PushedFilters on `repo` — the store layout and the
    BGP compiler compose without any manual pruning."""
    from git_prov_spark.store import read_triples, write_triples

    d = str(tmp_path_factory.mktemp("sparql_store"))
    write_triples(triples_df, d, n_buckets=8)
    stored = read_triples(spark, d)
    df = execute(
        stored,
        "SELECT ?c ?e (COUNT(?e) AS ?n) WHERE { ?c prov:used ?e } "
        "GROUP BY ?c ?e",
        repo=HOT,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan, plan
    assert any("pred" in ln for ln in scan), plan
    assert "PushedFilters: [" in plan and "repo" in plan.split("PushedFilters")[1], plan
    assert df.count() > 0


# --------------------------------------------------------------------------
# CONSTRUCT
# --------------------------------------------------------------------------

def test_construct_basic(triples_df, oracle_set):
    from git_prov_spark.sparql import construct

    got = construct(
        triples_df,
        "CONSTRUCT { ?e gitprov:touchedBy ?c } "
        "WHERE { ?e prov:wasGeneratedBy ?c }",
        repo=HOT,
    )
    gen = _expected(oracle_set, HOT, "prov:wasGeneratedBy")
    assert got.columns == ["subj", "pred", "obj"]
    assert {(r.subj, r.pred, r.obj) for r in got.collect()} == {
        (e, "gitprov:touchedBy", c) for e, c in gen
    }


def test_construct_multi_template_skips_unbound(triples_df, oracle_set):
    """Two templates; the one referencing the OPTIONAL var is skipped for
    solutions where it is unbound (root commits have no parent)."""
    from git_prov_spark.sparql import construct

    got = construct(
        triples_df,
        """
        PREFIX ex: <http://example.org/x#>
        CONSTRUCT { ?c ex:parent ?p . ?c ex:seen "1" }
        WHERE { ?c a prov:Activity . OPTIONAL { ?c prov:wasInformedBy ?p } }
        """,
        repo=HOT,
    )
    types = _expected(oracle_set, HOT, "rdf:type")
    informed = _expected(oracle_set, HOT, "prov:wasInformedBy")
    activities = {s for s, o in types if o == "prov:Activity"}
    expected = {(c, "ex:parent", p) for c, p in informed} | {
        (c, "ex:seen", "1") for c in activities
    }
    assert {(r.subj, r.pred, r.obj) for r in got.collect()} == expected
    # roots exist: some activities have no ex:parent triple
    with_parent = {c for c, p in informed}
    assert activities - with_parent


def test_construct_validation(triples_df):
    from git_prov_spark.sparql import construct

    with pytest.raises(SparqlError):   # template var unbound in WHERE
        construct(triples_df,
                  "CONSTRUCT { ?c gitprov:x ?nope } "
                  "WHERE { ?c a prov:Activity }", repo=HOT)
    with pytest.raises(SparqlError):   # SELECT via construct()
        construct(triples_df, "SELECT ?c WHERE { ?c a prov:Activity }",
                  repo=HOT)
    with pytest.raises(SparqlError):   # CONSTRUCT via execute()
        execute(triples_df,
                "CONSTRUCT { ?c gitprov:x ?c } WHERE { ?c a prov:Activity }",
                repo=HOT)
    # solution modifiers on CONSTRUCT are SUPPORTED since r5 (§16.2 cuts
    # the solution sequence pre-template — see
    # tests/test_sparql_typed.py::test_construct_solution_modifiers)
    q = parse("CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o } LIMIT 5")
    assert q.limit == 5 and q.form == "construct"
    with pytest.raises(SparqlError):   # empty template
        parse("CONSTRUCT { } WHERE { ?s ?p ?o }")


# --------------------------------------------------------------------------
# UNION
# --------------------------------------------------------------------------

def test_execute_union_shared_vars(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        SELECT ?e ?c WHERE {
          { ?e prov:wasGeneratedBy ?c } UNION { ?e prov:wasInvalidatedBy ?c }
        }
        """,
        repo=HOT,
    )
    gen = _expected(oracle_set, HOT, "prov:wasGeneratedBy")
    inv = _expected(oracle_set, HOT, "prov:wasInvalidatedBy")
    assert {(r.e, r.c) for r in got.collect()} == gen | inv
    assert gen and inv and gen != inv


def test_execute_union_disjoint_vars_null_pad(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        SELECT ?c ?e ?a WHERE {
          { ?c prov:used ?e } UNION { ?c prov:wasAssociatedWith ?a }
        }
        """,
        repo=HOT,
    )
    used = _expected(oracle_set, HOT, "prov:used")
    assoc = _expected(oracle_set, HOT, "prov:wasAssociatedWith")
    expected = {(c, e, None) for c, e in used} | {(c, None, a) for c, a in assoc}
    assert {(r.c, r.e, r.a) for r in got.collect()} == expected


def test_execute_union_joined_with_pattern(triples_df, oracle_set):
    got = execute(
        triples_df,
        """
        SELECT ?c ?x WHERE {
          ?c a prov:Activity .
          { ?c prov:wasInformedBy ?x } UNION { ?c prov:wasAssociatedWith ?x }
        }
        """,
        repo=HOT,
    )
    types = _expected(oracle_set, HOT, "rdf:type")
    acts = {s for s, o in types if o == "prov:Activity"}
    informed = _expected(oracle_set, HOT, "prov:wasInformedBy")
    assoc = _expected(oracle_set, HOT, "prov:wasAssociatedWith")
    expected = {(c, x) for c, x in informed | assoc if c in acts}
    assert {(r.c, r.x) for r in got.collect()} == expected


def test_union_validation(triples_df):
    with pytest.raises(SparqlError):   # lone braced group
        parse("SELECT ?s WHERE { { ?s ?p ?o } }")
    with pytest.raises(SparqlError):   # empty branch
        execute(triples_df,
                "SELECT ?s WHERE { { ?s ?p ?o } UNION { } }", repo=HOT)
    with pytest.raises(SparqlError):   # branch missing the join variable
        execute(triples_df,
                "SELECT ?c WHERE { ?c a prov:Activity . "
                "{ ?c prov:used ?e } UNION { ?x prov:used ?e } }", repo=HOT)


# --------------------------------------------------------------------------
# ASK / DESCRIBE — the remaining SPARQL query forms
# --------------------------------------------------------------------------

def test_ask(triples_df):
    from git_prov_spark.sparql import ask

    assert ask(triples_df, "ASK { ?c a prov:Activity }", repo=HOT) is True
    assert ask(triples_df,
               'ASK WHERE { ?c rdfs:label "no such label anywhere" }',
               repo=HOT) is False


def test_describe(triples_df, oracle_set):
    from git_prov_spark.sparql import describe

    types = _expected(oracle_set, HOT, "rdf:type")
    commit = sorted(s for s, o in types if o == "prov:Activity")[0]
    got = describe(triples_df, f"DESCRIBE {commit}", repo=HOT)
    expected = {(s, p, o) for r, s, p, o, _ in oracle_set
                if r == HOT and s == commit}
    assert {(r.subj, r.pred, r.obj) for r in got.collect()} == expected
    assert len(expected) > 3  # a commit has type, label, time, edges


def test_query_form_dispatch(triples_df):
    from git_prov_spark.sparql import ask, describe

    with pytest.raises(SparqlError):
        ask(triples_df, "SELECT ?c WHERE { ?c a prov:Activity }", repo=HOT)
    with pytest.raises(SparqlError):
        describe(triples_df, "ASK { ?s ?p ?o }", repo=HOT)
    with pytest.raises(SparqlError):
        execute(triples_df, "ASK { ?s ?p ?o }", repo=HOT)
    with pytest.raises(SparqlError):   # DESCRIBE ?var REQUIRES a WHERE
        parse("DESCRIBE ?x")
    q = parse("DESCRIBE gitprov:x ?y WHERE { ?y a prov:Entity }")
    assert (q.describe_terms, q.describe_vars, q.describe_where) == (
        ["gitprov:x"], ["y"], True)


def test_describe_with_where(triples_df, oracle_set):
    """DESCRIBE ?a WHERE { ... } (§16.4): describes every resource the var
    binds to — here all activities — via one semi join, no collected list."""
    from git_prov_spark.sparql import describe

    got = describe(triples_df,
                   "DESCRIBE ?c WHERE { ?c a prov:Activity }", repo=HOT)
    commits = {s for r, s, p, o, _ in oracle_set
               if r == HOT and p == "rdf:type" and o == "prov:Activity"}
    expected = {(s, p, o) for r, s, p, o, _ in oracle_set
                if r == HOT and s in commits}
    assert {(r.subj, r.pred, r.obj) for r in got.collect()} == expected
    # unbound describe var is a loud error
    with pytest.raises(SparqlError, match="unbound"):
        describe(triples_df,
                 "DESCRIBE ?nope WHERE { ?c a prov:Activity }", repo=HOT)


def test_parse_fuzz_aggregates_unions_roundtrip():
    """Grammar fuzz over the round-2 constructs: UNION chains, aggregate
    projections, GROUP BY / HAVING / ORDER BY / LIMIT — generated queries
    must parse back to exactly the generated structures."""
    import random

    rng = random.Random(99)
    FUNCS = ["COUNT", "SUM", "MIN", "MAX", "AVG"]
    OPS = ["=", "!=", "<", "<=", ">", ">="]

    for trial in range(150):
        src = "SELECT ?g "
        want_aggs = []
        for i in range(rng.randrange(1, 4)):
            fn = rng.choice(FUNCS)
            distinct = fn == "COUNT" and rng.random() < 0.3
            star = fn == "COUNT" and not distinct and rng.random() < 0.3
            arg = "*" if star else ("DISTINCT ?v" if distinct else "?v")
            src += f"({fn}({arg}) AS ?a{i}) "
            want_aggs.append(
                (fn.lower(), None if star else "v", distinct, f"a{i}")
            )
        n_br = rng.randrange(0, 3)
        if n_br >= 2:
            union_src = " UNION ".join(
                f"{{ ?g ex:p{b} ?v }}" for b in range(n_br)
            )
            src += f"WHERE {{ ?g ex:k ?v . {union_src} }} "
            from git_prov_spark.sparql import Group
            want_unions = [
                [Group(patterns=[("?g", f"ex:p{b}", "?v")])
                 for b in range(n_br)]
            ]
        else:
            src += "WHERE { ?g ex:k ?v } "
            want_unions = []
        src += "GROUP BY ?g "
        want_having = []
        if rng.random() < 0.5:
            op = rng.choice(OPS)
            num = rng.randrange(0, 9)
            src += f"HAVING(?a0 {op} {num}) "
            want_having = [("a0", op, float(num))]
        want_order = []
        if rng.random() < 0.5:
            asc = rng.random() < 0.5
            src += f"ORDER BY {'ASC' if asc else 'DESC'}(?a0) "
            want_order = [("a0", asc)]
        want_limit = None
        if rng.random() < 0.5:
            want_limit = rng.randrange(1, 100)
            src += f"LIMIT {want_limit}"

        q = parse(src)
        assert q.variables == ["g"], src
        assert [(a.func, a.var, a.distinct, a.alias) for a in q.aggregates] \
            == want_aggs, src
        assert q.unions == want_unions, src
        assert q.group_by == ["g"], src
        assert q.having == want_having, src
        assert q.order_by == want_order, src
        assert q.limit == want_limit, src


def test_filter_var_var_inequality(triples_df, oracle_set):
    """FILTER(?a != ?b) over a self-join: distinct click pairs per commit
    — the dedup-pair idiom."""
    got = execute(
        triples_df,
        """
        PREFIX prov: <http://www.w3.org/ns/prov#>
        SELECT ?c ?e1 ?e2 WHERE {
          ?c prov:used ?e1 .
          ?c prov:used ?e2 .
          FILTER(?e1 != ?e2)
        }
        """,
        repo=HOT,
    )
    used = _expected(oracle_set, HOT, "prov:used")
    expected = {(c, a, b) for c, a in used for c2, b in used
                if c == c2 and a != b}
    assert {(r.c, r.e1, r.e2) for r in got.collect()} == expected
    assert len(expected) > 0


def test_filter_literal_question_mark_is_not_a_var(triples_df):
    """A quoted literal that happens to start with '?' stays a constant."""
    got = execute(
        triples_df,
        'SELECT ?c WHERE { ?c a prov:Activity . ?c rdfs:label ?l . '
        'FILTER(?l = "?e1") }',
        repo=HOT,
    )
    assert got.collect() == []  # no commit message is literally "?e1"


def test_filter_var_var_unbound_raises(triples_df):
    with pytest.raises(SparqlError):
        execute(triples_df,
                "SELECT ?c WHERE { ?c a prov:Activity . FILTER(?c != ?zz) }",
                repo=HOT)


def test_execute_fuzz_vs_python_reference(spark):
    """Execution-level property fuzz: random small triple sets + random
    BGP/projection/inequality-filter queries, Spark plans vs an
    independent nested-loop evaluator written from the SPARQL spec."""
    import random

    rng = random.Random(1234)

    def py_match(triples, pat):
        sols = []
        for (s, p, o) in triples:
            b, ok = {}, True
            for term, val in ((pat[0], s), (pat[1], p), (pat[2], o)):
                if term.startswith("?"):
                    v = term[1:]
                    if v in b and b[v] != val:
                        ok = False
                        break
                    b[v] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                sols.append(b)
        return sols

    def py_join(A, B):
        return [{**a, **b} for a in A for b in B
                if all(a[k] == b[k] for k in a.keys() & b.keys())]

    for trial in range(12):
        triples = {(f"ex:s{rng.randrange(4)}", f"ex:p{rng.randrange(3)}",
                    f"ex:o{rng.randrange(4)}")
                   for _ in range(rng.randrange(6, 20))}
        tdf = spark.createDataFrame(
            [("x", s, p, o, "iri") for s, p, o in triples],
            "repo string, subj string, pred string, obj string, obj_type string",
        )
        pats = []
        for _ in range(rng.randrange(1, 4)):
            pat = []
            for pos in range(3):
                r = rng.random()
                if r < 0.55:
                    pat.append("?" + rng.choice("abcd"))
                elif pos == 0:
                    pat.append(f"ex:s{rng.randrange(4)}")
                elif pos == 1:
                    pat.append(f"ex:p{rng.randrange(3)}")
                else:
                    pat.append(f"ex:o{rng.randrange(4)}")
            pats.append(tuple(pat))
        bound = sorted({t[1:] for p in pats for t in p if t.startswith("?")})
        if not bound:
            continue
        sols = [{}]
        for p in pats:
            sols = py_join(sols, py_match(triples, p))
        flt = None
        if len(bound) >= 2 and rng.random() < 0.5:
            flt = tuple(rng.sample(bound, 2))
            sols = [b for b in sols if b[flt[0]] != b[flt[1]]]
        expected = {tuple(b[v] for v in bound) for b in sols}

        src = ("SELECT " + " ".join(f"?{v}" for v in bound)
               + " WHERE { " + " . ".join(" ".join(t) for t in pats) + " ")
        if flt:
            src += f". FILTER(?{flt[0]} != ?{flt[1]}) "
        src += "}"
        got = execute(tdf, src)
        assert {tuple(r[v] for v in bound) for r in got.collect()} \
            == expected, (src, sorted(triples))


def test_execute_offset(triples_df):
    all_c = execute(
        triples_df,
        "SELECT ?c WHERE { ?c a prov:Activity } ORDER BY ASC(?c)",
        repo=HOT,
    ).collect()
    page = execute(
        triples_df,
        "SELECT ?c WHERE { ?c a prov:Activity } ORDER BY ASC(?c) "
        "LIMIT 3 OFFSET 2",
        repo=HOT,
    ).collect()
    assert [r.c for r in page] == [r.c for r in all_c][2:5]
    # OFFSET before LIMIT parses too (SPARQL allows either order)
    q = parse("SELECT ?c WHERE { ?c a prov:Activity } OFFSET 2 LIMIT 3")
    assert q.offset == 2 and q.limit == 3


# --------------------------------------------------------------------------
# Property paths (pred+)
# --------------------------------------------------------------------------

def _py_closure(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out = set()
    for start in adj:
        stack, seen = [start], set()
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):
                if (start, nxt) not in out:
                    out.add((start, nxt))
                    if nxt not in seen:
                        seen.add(nxt)
                        stack.append(nxt)
    return out


def test_path_plus_commit_ancestry(triples_df, oracle_set):
    got = execute(
        triples_df,
        "SELECT ?a ?b WHERE { ?a prov:wasInformedBy+ ?b }",
        repo=HOT,
    )
    informed = _expected(oracle_set, HOT, "prov:wasInformedBy")
    expected = _py_closure(informed)
    assert {(r.a, r.b) for r in got.collect()} == expected
    assert len(expected) > len(informed)  # chains longer than one hop exist


def test_path_plus_constant_endpoint_and_join(triples_df, oracle_set):
    informed = _expected(oracle_set, HOT, "prov:wasInformedBy")
    closure = _py_closure(informed)
    tip = sorted({a for a, _ in informed} - {b for _, b in informed})[0]
    got = execute(
        triples_df,
        f"""
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        SELECT ?b ?label WHERE {{
          {tip} prov:wasInformedBy+ ?b .
          ?b rdfs:label ?label
        }}
        """,
        repo=HOT,
    )
    labels = dict(_expected(oracle_set, HOT, "rdfs:label"))
    expected = {(b, labels[b]) for a, b in closure if a == tip}
    assert {(r.b, r.label) for r in got.collect()} == expected
    assert len(expected) > 1


def test_path_plus_validation():
    with pytest.raises(SparqlError):   # variable predicate path
        parse("SELECT ?a WHERE { ?a ?p+ ?b }")
    from git_prov_spark.sparql import PathPlus, PathPred

    q = parse("SELECT ?a ?b WHERE { ?a prov:wasInformedBy+ ?b }")
    assert q.patterns == [] and q.path_patterns == [
        ("?a", PathPlus(PathPred("prov:wasInformedBy")), "?b")
    ]


def test_iri_ending_in_plus_is_not_a_path(triples_df, spark):
    """A constant full-IRI predicate that happens to end in '+' is a plain
    pattern, not a property path (path-ness is out of band)."""
    pre = "PREFIX ex: <http://example.org/x#> "
    q = parse(pre + "SELECT ?s ?o WHERE { ?s <http://example.org/x#p+> ?o }")
    assert q.path_patterns == [] and q.patterns == [("?s", "ex:p+", "?o")]
    t = spark.createDataFrame(
        [("x", "a", "ex:p+", "b", "iri"), ("x", "b", "ex:p+", "c", "iri")],
        "repo string, subj string, pred string, obj string, obj_type string",
    )
    got = execute(
        t, pre + "SELECT ?s ?o WHERE { ?s <http://example.org/x#p+> ?o }"
    )
    # plain match only — no closure pair (a, c)
    assert {(r.s, r.o) for r in got.collect()} == {("a", "b"), ("b", "c")}


def test_query_dispatch_all_forms(triples_df):
    """The single query() entry point routes every form to its executor."""
    from git_prov_spark.sparql import query

    sel = query(triples_df, "SELECT ?c WHERE { ?c a prov:Activity }", repo=HOT)
    assert "c" in sel.columns and sel.count() > 0
    con = query(triples_df,
                "CONSTRUCT { ?c gitprov:seen ?c } WHERE { ?c a prov:Activity }",
                repo=HOT)
    assert con.columns == ["subj", "pred", "obj"]
    assert query(triples_df, "ASK { ?c a prov:Activity }", repo=HOT) is True
    d = query(triples_df, "DESCRIBE gitprov:alice", repo=HOT)
    assert set(d.columns) == {"subj", "pred", "obj", "obj_type"}


def test_literal_escapes():
    q = parse('SELECT ?s WHERE { ?s rdfs:label "a\\nb\\t\\"c\\\\" }')
    assert q.patterns == [("?s", "rdfs:label", 'a\nb\t"c\\')]
    with pytest.raises(SparqlError):
        parse('SELECT ?s WHERE { ?s rdfs:label "bad\\q" }')


# --------------------------------------------------------------------------
# Round-3 surface: property-path operators, seeded closure, FILTER
# inequality/regex, BIND / VALUES / MINUS, UNION bag-semantics aggregates
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def chain_triples(spark):
    rows = [
        ("r", "a", "ev:next", "b", "iri"), ("r", "b", "ev:next", "c", "iri"),
        ("r", "c", "ev:next", "d", "iri"), ("r", "a", "ev:tag", "x1", "iri"),
        ("r", "d", "ev:tag", "x2", "iri"), ("r", "a", "ev:n", "3", "xsd:int"),
        ("r", "b", "ev:n", "7", "xsd:int"),
    ]
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_path_seeded_subject(chain_triples):
    got = _rows(execute(chain_triples, 'SELECT ?b WHERE { "a" ev:next+ ?b }'))
    assert got == [("b",), ("c",), ("d",)]


def test_path_seeded_object(chain_triples):
    got = _rows(execute(chain_triples, 'SELECT ?a WHERE { ?a ev:next+ "d" }'))
    assert got == [("a",), ("b",), ("c",)]


def test_path_seeded_skips_full_closure(chain_triples, monkeypatch):
    """A constant-endpoint `+` must pre-filter via seeded reachability —
    never materialize the whole graph's closure."""
    import git_prov_spark.operators as ops

    def boom(*a, **k):
        raise AssertionError("full transitive_closure called on a seeded path")

    monkeypatch.setattr(ops, "transitive_closure", boom)
    got = _rows(execute(chain_triples, 'SELECT ?b WHERE { "a" ev:next+ ?b }'))
    assert got == [("b",), ("c",), ("d",)]
    with pytest.raises(AssertionError):  # var-var still needs the closure
        execute(chain_triples, "SELECT ?a ?b WHERE { ?a ev:next+ ?b }").collect()


def test_path_star_identity(chain_triples):
    got = _rows(execute(chain_triples, 'SELECT ?b WHERE { "b" ev:next* ?b }'))
    assert got == [("b",), ("c",), ("d",)]
    # var-var star: closure pairs + one identity row per graph term
    pairs = _rows(execute(chain_triples, "SELECT ?a ?b WHERE { ?a ev:next* ?b }"))
    terms = {"a", "b", "c", "d", "x1", "x2", "3", "7"}
    assert set(pairs) == {("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                          ("b", "d"), ("c", "d")} | {(t, t) for t in terms}


def test_path_sequence_inverse_alternation(chain_triples):
    assert _rows(execute(chain_triples,
                         "SELECT ?a ?x WHERE { ?a ev:next/ev:tag ?x }")) == \
        [("c", "x2")]
    assert _rows(execute(chain_triples,
                         'SELECT ?b WHERE { ?b ^ev:next "a" }')) == [("b",)]
    assert _rows(execute(chain_triples,
                         "SELECT ?a ?x WHERE { ?a (ev:tag|ev:n) ?x }")) == \
        [("a", "3"), ("a", "x1"), ("b", "7"), ("d", "x2")]
    assert _rows(execute(chain_triples,
                         'SELECT ?x WHERE { "a" ev:next+/ev:tag ?x }')) == \
        [("x2",)]


def test_path_ask_both_constant(chain_triples):
    from git_prov_spark.sparql import ask

    assert ask(chain_triples, 'ASK { "a" ev:next+ "d" }') is True
    assert ask(chain_triples, 'ASK { "d" ev:next+ "a" }') is False
    assert ask(chain_triples, 'ASK { "d" ev:next* "d" }') is True


def test_filter_inequality_and_regex(chain_triples):
    assert _rows(execute(chain_triples,
                         "SELECT ?s ?n WHERE { ?s ev:n ?n . FILTER(?n > 5) }")) == \
        [("b", "7")]
    assert _rows(execute(chain_triples,
                         "SELECT ?s ?n WHERE { ?s ev:n ?n . FILTER(?n <= 3) }")) == \
        [("a", "3")]
    assert _rows(execute(
        chain_triples,
        'SELECT ?s WHERE { ?s ev:tag ?x . FILTER(regex(?x, "2$")) }')) == [("d",)]


def test_bind_values_minus(chain_triples):
    assert _rows(execute(
        chain_triples,
        'SELECT ?c WHERE { ?s ev:n ?n . BIND(CONCAT(?s, "#", STR(?n)) AS ?c) }'
    )) == [("a#3",), ("b#7",)]
    assert _rows(execute(
        chain_triples,
        "SELECT ?s ?p WHERE { ?s ?p ?o . VALUES ?p { ev:tag } }"
    )) == [("a", "ev:tag"), ("d", "ev:tag")]
    assert _rows(execute(
        chain_triples,
        "SELECT ?s WHERE { ?s ev:next ?o . MINUS { ?s ev:tag ?x } }"
    )) == [("b",), ("c",)]
    # multi-var VALUES joins like inline data
    assert _rows(execute(
        chain_triples,
        'SELECT ?s ?o WHERE { ?s ev:next ?o . VALUES (?s ?o) { ("a" "b") ("z" "z") } }'
    )) == [("a", "b")]


def test_union_aggregate_bag_semantics(spark):
    # one solution produced by BOTH branches counts twice (ARQ multiset UNION)
    rows = [("r", "s", "ev:p", "o", "iri"), ("r", "s", "ev:q", "o", "iri")]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )
    got = execute(t, """
        SELECT ?s (COUNT(*) AS ?n)
        WHERE { { ?s ev:p ?o } UNION { ?s ev:q ?o } } GROUP BY ?s
    """).collect()
    assert [(r["s"], r["n"]) for r in got] == [("s", 2)]
    # non-aggregate SELECT is bag-correct too: the solution appears once
    # per branch, and DISTINCT is what collapses it
    sel = _rows(execute(
        t, "SELECT ?s ?o WHERE { { ?s ev:p ?o } UNION { ?s ev:q ?o } }"
    ))
    assert sel == [("s", "o"), ("s", "o")]
    dis = _rows(execute(
        t,
        "SELECT DISTINCT ?s ?o WHERE { { ?s ev:p ?o } UNION { ?s ev:q ?o } }",
    ))
    assert dis == [("s", "o")]


def test_reachable_from_operator(spark):
    from git_prov_spark.operators import reachable_from

    edges = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(40)] + [("40", "0")],  # cycle
        "src string, dst string",
    )
    got = {r.dst for r in reachable_from(edges, "5").collect()}
    assert got == {str(i) for i in range(41)}  # whole cycle incl. the seed
    assert reachable_from(edges.where("src = '-1'"), "99").count() == 0


# --------------------------------------------------------------------------
# Round-3 FILTER expression grammar: ||/&&/!, string fns, bound, EXISTS
# --------------------------------------------------------------------------

def _mini_graph(spark):
    rows = [
        ("r", "e1", "ev:type", "purchase", "xsd:string"),
        ("r", "e1", "ev:by", "u1", "xsd:string"),
        ("r", "e2", "ev:type", "error", "xsd:string"),
        ("r", "e2", "ev:by", "u1", "xsd:string"),
        ("r", "e3", "ev:type", "purchase", "xsd:string"),
        ("r", "e3", "ev:by", "u2", "xsd:string"),
        ("r", "e4", "ev:type", "signup", "xsd:string"),
        ("r", "e4", "ev:by", "u3", "xsd:string"),
        ("r", "e2", "ev:note", "bad", "xsd:string"),
    ]
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )


def test_filter_bool_connectives_and_string_fns(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e ?t WHERE {
          ?e ev:type ?t .
          FILTER( (STRSTARTS(UCASE(?t), "P") || CONTAINS(?t, "rror"))
                  && !(?t = "signup") )
          FILTER(STRLEN(?t) >= 5)
        }
    """))
    assert got == [("e1", "purchase"), ("e2", "error"), ("e3", "purchase")]


def test_filter_not_in_and_string_inequality(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?t WHERE { ?e ev:type ?t .
          FILTER(?t NOT IN ("error")) FILTER(?t > "p") }
    """))
    # codepoint string ordering, like ARQ on simple literals; bag
    # semantics: one row per matching event, so "purchase" appears twice
    assert got == [("purchase",), ("purchase",), ("signup",)]


def test_filter_bound_with_optional(spark):
    t = _mini_graph(spark)
    # only e2 carries ev:note — bound(?n) is true exactly for solutions
    # where the OPTIONAL matched, and !bound selects the rest
    got = _rows(execute(t, """
        SELECT ?e WHERE {
          ?e ev:by ?u . OPTIONAL { ?e ev:note ?n } . FILTER(bound(?n))
        }
    """))
    assert got == [("e2",)]
    got = _rows(execute(t, """
        SELECT ?e WHERE {
          ?e ev:by ?u . OPTIONAL { ?e ev:note ?n } . FILTER(!bound(?n))
        }
    """))
    assert got == [("e1",), ("e3",), ("e4",)]


def test_filter_exists_and_not_exists(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e ?u WHERE {
          ?e ev:type "purchase" . ?e ev:by ?u .
          FILTER(EXISTS { ?x ev:by ?u . ?x ev:type "error" })
        }
    """))
    assert got == [("e1", "u1")]
    got = _rows(execute(t, """
        SELECT ?e ?u WHERE {
          ?e ev:type "purchase" . ?e ev:by ?u .
          FILTER(NOT EXISTS { ?x ev:by ?u . ?x ev:type "error" })
        }
    """))
    assert got == [("e3", "u2")]


def test_filter_exists_compiles_to_semi_anti_join(spark):
    """Scale invariant: [NOT] EXISTS is ONE semi/anti join, not a per-row
    subquery and not a cartesian anything."""
    t = _mini_graph(spark)
    for kw, node in (("EXISTS", "LeftSemi"), ("NOT EXISTS", "LeftAnti")):
        df = execute(t, f"""
            SELECT ?e WHERE {{ ?e ev:by ?u .
              FILTER({kw} {{ ?x ev:by ?u . ?x ev:type "error" }}) }}
        """)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert node.lower() in plan.lower(), (kw, plan)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_filter_exists_requires_shared_var(spark):
    t = _mini_graph(spark)
    with pytest.raises(SparqlError):
        execute(t, """
            SELECT ?e WHERE { ?e ev:type "purchase" .
              FILTER(EXISTS { ?x ev:type "error" }) }
        """).collect()


def test_filter_exists_nested_in_or_rejected(spark):
    t = _mini_graph(spark)
    with pytest.raises(SparqlError):
        execute(t, """
            SELECT ?e WHERE { ?e ev:by ?u .
              FILTER(bound(?u) || EXISTS { ?x ev:by ?u }) }
        """).collect()


def test_bind_lcase_ucase_strlen(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?t ?up ?n WHERE { ?e ev:type ?t .
          BIND(UCASE(?t) AS ?up) . BIND(STRLEN(?t) AS ?n) .
          FILTER(?t = "error") }
    """))
    assert got == [("error", "ERROR", 5)]


def test_subquery_joins_outer(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e ?u ?n WHERE {
          ?e ev:type "purchase" . ?e ev:by ?u .
          { SELECT ?u (COUNT(*) AS ?n) WHERE { ?x ev:by ?u } GROUP BY ?u }
          FILTER(?n >= 2)
        }
    """))
    # u1 owns e1+e2 (n=2); only its purchase e1 survives
    assert got == [("e1", "u1", 2)]


def test_subquery_limit_evaluates_bottom_up(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?u WHERE {
          { SELECT ?u WHERE { ?x ev:by ?u } ORDER BY ASC(?u) LIMIT 1 }
        }
    """))
    assert got == [("u1",)]


def test_group_concat_and_sample(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?u (GROUP_CONCAT(?tp; SEPARATOR="|") AS ?types)
               (SAMPLE(?x) AS ?one)
        WHERE { ?x ev:by ?u . ?x ev:type ?tp } GROUP BY ?u
        ORDER BY ASC(?u)
    """))
    assert got == [
        ("u1", "error|purchase", "e1"),
        ("u2", "purchase", "e3"),
        ("u3", "signup", "e4"),
    ]


def test_filter_inside_optional_block(spark):
    """Block-scoped FILTER: applies to the OPTIONAL's own solutions before
    the left join (SPARQL group scoping) — bound() then distinguishes
    matched from unmatched rows."""
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e WHERE {
          ?e ev:by ?u .
          OPTIONAL { ?e ev:type ?tp . FILTER(?tp = "error") } .
          FILTER(bound(?tp))
        }
    """))
    assert got == [("e2",)]


def test_filter_inside_union_branches(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?x ?v WHERE {
          { ?x ev:type ?v . FILTER(?v = "error") }
          UNION
          { ?x ev:note ?v . FILTER(STRSTARTS(?v, "b")) }
        }
    """))
    assert got == [("e2", "bad"), ("e2", "error")]


def test_filter_inside_exists_block(spark):
    t = _mini_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e ?u WHERE {
          ?e ev:by ?u .
          FILTER(EXISTS { ?x ev:by ?u . ?x ev:type ?tp .
                          FILTER(?tp = "error") })
        }
    """))
    assert got == [("e1", "u1"), ("e2", "u1")]


def test_filter_rejected_in_construct_template():
    with pytest.raises(SparqlError):
        parse("""
            CONSTRUCT { ?s ev:x ?o . FILTER(?o = "y") }
            WHERE { ?s ev:p ?o }
        """)


def test_arithmetic_in_filter_and_bind(spark):
    rows = [("r", f"e{i}", "ev:v", str(i), "xsd:int") for i in range(10)]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )
    got = _rows(execute(t, """
        SELECT ?e ?twice WHERE {
          ?e ev:v ?n .
          BIND(?n * 2 AS ?twice) .
          FILTER((?n + 1) * 2 > 14 && !(?n - 8 >= 1))
        }
    """))
    # (n+1)*2 > 14 → n > 6; n-8 >= 1 → n >= 9 excluded → n in {7, 8}
    assert got == [("e7", 14.0), ("e8", 16.0)]


def test_path_inside_optional_and_union(spark):
    # chain a -> b -> c via ev:next; d isolated
    rows = [
        ("r", "a", "ev:next", "b", "iri"), ("r", "b", "ev:next", "c", "iri"),
        ("r", "a", "ev:tag", "root", "xsd:string"),
        ("r", "d", "ev:tag", "lone", "xsd:string"),
    ]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )
    got = _rows(execute(t, """
        SELECT ?s ?far WHERE {
          ?s ev:tag ?tag . OPTIONAL { ?s ev:next+ ?far }
        }
    """))
    assert got == [("a", "b"), ("a", "c"), ("d", None)]
    got = _rows(execute(t, """
        SELECT ?x ?y WHERE {
          { ?x ev:next+ ?y . FILTER(?y = "c") } UNION { ?x ev:tag ?y }
        }
    """))
    assert got == [("a", "c"), ("a", "root"), ("b", "c"), ("d", "lone")]


def test_path_inside_exists(spark):
    rows = [
        ("r", "a", "ev:next", "b", "iri"), ("r", "b", "ev:next", "c", "iri"),
        ("r", "a", "ev:tag", "root", "xsd:string"),
        ("r", "d", "ev:tag", "lone", "xsd:string"),
    ]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )
    got = _rows(execute(t, """
        SELECT ?s WHERE {
          ?s ev:tag ?tag . FILTER(EXISTS { ?s ev:next+ ?z })
        }
    """))
    assert got == [("a",)]


def test_construct_template_rejects_paths():
    with pytest.raises(SparqlError):
        parse("CONSTRUCT { ?s ev:x+ ?o } WHERE { ?s ev:p ?o }")


# --------------------------------------------------------------------------
# Round-4 widening: scalar builtins, path ?/!(), GRAPH, ORDER BY exprs,
# isIRI/isLiteral
# --------------------------------------------------------------------------

def _r4_graph(spark):
    rows = [
        ("g1", "u:a", "ev:next", "u:b", "iri"),
        ("g1", "u:b", "ev:next", "u:c", "iri"),
        ("g1", "u:a", "ev:knows", "u:c", "iri"),
        ("g1", "u:a", "rdfs:label", "alice", "xsd:string"),
        ("g1", "u:a", "ev:when", "2024-03-05T10:20:30Z", "xsd:dateTime"),
        ("g2", "u:x", "ev:next", "u:y", "iri"),
        ("g2", "u:x", "rdfs:label", "xavier", "xsd:string"),
    ]
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )


def test_bind_if_coalesce(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?s ?v ?c WHERE {
          ?s rdfs:label ?l .
          OPTIONAL { ?s ev:missing ?m } .
          BIND(IF(STRLEN(?l) > 5, "long", "short") AS ?v) .
          BIND(COALESCE(?m, "fallback") AS ?c)
        }
    """))
    assert got == [("u:a", "short", "fallback"), ("u:x", "long", "fallback")]


def test_bind_strbefore_strafter_edge_semantics(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?b ?a ?be ?ae ?bm ?am WHERE {
          "u:a" rdfs:label ?l .
          BIND(STRBEFORE(?l, "i") AS ?b) . BIND(STRAFTER(?l, "i") AS ?a) .
          BIND(STRBEFORE(?l, "") AS ?be) . BIND(STRAFTER(?l, "") AS ?ae) .
          BIND(STRBEFORE(?l, "zz") AS ?bm) . BIND(STRAFTER(?l, "zz") AS ?am)
        }
    """))
    # SPARQL §17.4.3.7/8: empty sep -> ("", whole string); missing -> ("","")
    assert got == [("al", "ce", "", "alice", "", "")]


def test_bind_substr_replace(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?s2 ?s3 ?r WHERE {
          "u:a" rdfs:label ?l .
          BIND(SUBSTR(?l, 2) AS ?s2) . BIND(SUBSTR(?l, 2, 3) AS ?s3) .
          BIND(REPLACE(?l, "[aeiou]", "_") AS ?r)
        }
    """))
    assert got == [("lice", "lic", "_l_c_")]


def test_datetime_accessors(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?yr ?mo ?dd ?hh ?mi ?ss WHERE {
          ?s ev:when ?d .
          BIND(YEAR(?d) AS ?yr) . BIND(MONTH(?d) AS ?mo) .
          BIND(DAY(?d) AS ?dd) . BIND(HOURS(?d) AS ?hh) .
          BIND(MINUTES(?d) AS ?mi) . BIND(SECONDS(?d) AS ?ss) .
          FILTER(YEAR(?d) >= 2020)
        }
    """))
    assert got == [(2024, 3, 5, 10, 20, 30)]


def test_lang_is_empty(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?l ?g WHERE { ?s rdfs:label ?l . BIND(LANG(?l) AS ?g) .
                             FILTER(LANG(?l) = "") }
    """))
    assert got == [("alice", ""), ("xavier", "")]


def test_tz_timezone_langmatches(spark):
    t = _r4_graph(spark)
    # store dateTimes carry Z: TZ = "Z", TIMEZONE = "PT0S"
    got = _rows(execute(t, """
        SELECT ?tz ?dur WHERE { ?s ev:when ?d .
          BIND(TZ(?d) AS ?tz) . BIND(TIMEZONE(?d) AS ?dur) }
    """))
    assert got == [("Z", "PT0S")]
    # general lexical forms, via BIND-constructed strings
    got = _rows(execute(t, """
        SELECT ?tz ?dur WHERE { ?s ev:when ?d .
          BIND(CONCAT("2024-01-01T00:00:00", "+05:30") AS ?v) .
          BIND(TZ(?v) AS ?tz) . BIND(TIMEZONE(?v) AS ?dur) }
    """))
    assert got == [("+05:30", "PT5H30M")]
    got = _rows(execute(t, """
        SELECT ?tz WHERE { ?s ev:when ?d .
          BIND(CONCAT("2024-01-01T00:00:00", "-05:00") AS ?v) .
          BIND(TIMEZONE(?v) AS ?tz) }
    """))
    assert got == [("-PT5H",)]
    # canonical duration edges: all-zero offset is PT0S, zero hours omitted
    got = _rows(execute(t, """
        SELECT ?z ?m WHERE { ?s ev:when ?d .
          BIND(TIMEZONE(CONCAT("2024-01-01T00:00:00", "+00:00")) AS ?z) .
          BIND(TIMEZONE(CONCAT("2024-01-01T00:00:00", "-00:30")) AS ?m) }
    """))
    assert got == [("PT0S", "-PT30M")]
    # no timezone suffix: TZ = "", TIMEZONE unbound (NULL)
    rows = execute(t, """
        SELECT ?tz ?dur WHERE { ?s ev:when ?d .
          BIND(STRBEFORE(?d, "Z") AS ?v) .
          BIND(TZ(?v) AS ?tz) . BIND(TIMEZONE(?v) AS ?dur) }
    """).collect()
    assert [(r.tz, r.dur) for r in rows] == [("", None)]
    # LANGMATCHES over this store's empty tags is false for every range
    got = _rows(execute(t, """
        SELECT ?l WHERE { ?s rdfs:label ?l .
                          FILTER(!LANGMATCHES(LANG(?l), "*")) }
    """))
    assert got == [("alice",), ("xavier",)]
    assert _rows(execute(t, """
        SELECT ?l WHERE { ?s rdfs:label ?l .
                          FILTER(LANGMATCHES(LANG(?l), "en")) }
    """)) == []
    # generic RFC 4647 compile: literal ranges against literal tags
    got = _rows(execute(t, """
        SELECT ?m WHERE { ?s ev:when ?d .
          BIND(LANGMATCHES("en-GB", "en") AS ?m) }
    """))
    assert got == [(True,)]


def test_strlang_strdt_construct_tagged_terms(spark):
    """STRLANG/STRDT build the tag/datatype into the variable's hidden
    term-metadata companion: LANG()/DATATYPE() read it back, and the value
    column stays the plain lexical (r5 typed-term model)."""
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?x ?lg ?dt WHERE { ?s rdfs:label ?l .
          BIND(STRLANG(?l, "en") AS ?x) .
          BIND(LANG(?x) AS ?lg) . BIND(DATATYPE(?x) AS ?dt) } LIMIT 1
    """))
    assert len(got) == 1
    x, lg, dt = got[0]
    assert lg == "en" and dt == "rdf:langString" and not x.startswith('"')
    got = _rows(execute(t, """
        SELECT ?dt WHERE { ?s rdfs:label ?l .
          BIND(STRDT(?l, xsd:token) AS ?x) .
          BIND(DATATYPE(?x) AS ?dt) } LIMIT 1
    """))
    assert got == [("xsd:token",)]


def test_strlang_nested_rejected(spark):
    """Nested STRLANG/STRDT would lose the constructed tag (only a BIND /
    projection expression can carry the metadata column) — loud error."""
    t = _r4_graph(spark)
    import pytest as _pytest

    from git_prov_spark.sparql import SparqlError

    with _pytest.raises(SparqlError, match="top-level"):
        execute(t, 'SELECT ?x WHERE { ?s rdfs:label ?l . '
                   'BIND(UCASE(STRLANG(?l, "en")) AS ?x) }')


def test_path_zero_or_one(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, 'SELECT ?b WHERE { "u:a" ev:next? ?b }'))
    assert got == [("u:a",), ("u:b",)]


def test_path_negated_property_set(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, 'SELECT ?o WHERE { "u:a" !(ev:next|rdfs:label) ?o }'))
    assert got == [("2024-03-05T10:20:30Z",), ("u:c",)]
    # inverse member: reversed edges whose pred is not ev:next
    got = _rows(execute(t, 'SELECT ?o WHERE { "u:c" !(^ev:next) ?o }'))
    assert got == [("u:a",)]  # only via reversed ev:knows


def test_path_negated_set_inverted_swaps(spark):
    t = _r4_graph(spark)
    a = _rows(execute(t, 'SELECT ?o WHERE { "u:c" ^!(ev:knows) ?o }'))
    b = _rows(execute(t, 'SELECT ?o WHERE { "u:c" !(^ev:knows) ?o }'))
    assert a == b == [("u:b",)]  # forward-not-knows edges into u:c, reversed


def test_graph_var_binds_and_same_graph_join(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?g ?s ?l WHERE { GRAPH ?g { ?s rdfs:label ?l } }
    """))
    assert got == [("g1", "u:a", "alice"), ("g2", "u:x", "xavier")]
    # same-graph join: label + next must come from ONE graph
    got = _rows(execute(t, """
        SELECT ?g ?s ?n WHERE { GRAPH ?g { ?s rdfs:label ?l . ?s ev:next ?n } }
    """))
    assert got == [("g1", "u:a", "u:b"), ("g2", "u:x", "u:y")]


def test_graph_constant_scopes(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t, """
        SELECT ?s ?l WHERE { GRAPH "g2" { ?s rdfs:label ?l } }
    """))
    assert got == [("u:x", "xavier")]


def test_graph_var_rejects_paths(spark):
    t = _r4_graph(spark)
    with pytest.raises(SparqlError):
        execute(t, 'SELECT ?g ?b WHERE { GRAPH ?g { "u:a" ev:next+ ?b } }')


def test_order_by_expression(spark):
    t = _r4_graph(spark)
    got = [tuple(r) for r in execute(t, """
        SELECT ?l WHERE { ?s rdfs:label ?l }
        ORDER BY DESC(STRLEN(?l)) LIMIT 1
    """).collect()]
    assert got == [("xavier",)]


def test_isiri_isliteral(spark):
    t = _r4_graph(spark)
    got = _rows(execute(t,
        'SELECT ?o WHERE { "u:a" ?p ?o . FILTER(isIRI(?o)) }'))
    assert got == [("u:b",), ("u:c",)]
    got = _rows(execute(t,
        'SELECT ?o WHERE { "u:a" ?p ?o . FILTER(isLiteral(?o)) }'))
    assert got == [("2024-03-05T10:20:30Z",), ("alice",)]


def test_isiri_under_or_is_row_predicate(spark):
    """r5 typed-term model: isIRI/isLiteral/isNumeric over a metadata-
    carrying variable compile as row predicates, so they nest under
    ||/!/IF (the r4 top-level-conjunct-only restriction is gone)."""
    t = _r4_graph(spark)
    got = _rows(execute(t, 'SELECT ?o WHERE { ?s ?p ?o . '
                           'FILTER(isIRI(?o) || ?o = "alice") }'))
    assert got == [("alice",), ("u:b",), ("u:c",), ("u:c",), ("u:y",)]


def test_const_const_path_marker_not_leaked(spark):
    t = _r4_graph(spark)
    df = execute(t, """
        SELECT ?s ?o WHERE { "u:a" ev:next+ "u:c" . ?s ev:knows ?o }
    """)
    assert df.columns == ["s", "o"]
    assert _rows(df) == [("u:a", "u:c")]


# --------------------------------------------------------------------------
# Round-4 widening, second batch: numeric/hash/encode builtins, DATATYPE,
# isNumeric/isBlank
# --------------------------------------------------------------------------

def _r4_numeric_graph(spark):
    rows = [
        ("g1", "e1", "ev:count", "3", "xsd:int"),
        ("g1", "e1", "ev:name", "a b~* c", "xsd:string"),
        ("g1", "e2", "ev:count", "-5", "xsd:int"),
        ("g1", "e2", "ev:name", "zz", "xsd:string"),
        ("g1", "e2", "ev:ref", "e1", "iri"),
    ]
    return spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string"
    )


def test_bind_numeric_builtins_xpath_semantics(spark):
    t = _r4_numeric_graph(spark)
    got = _rows(execute(t, """
        SELECT ?s ?a ?ce ?fl ?ro WHERE {
          ?s ev:count ?c .
          BIND(ABS(?c) AS ?a) . BIND(CEIL(?c / 2) AS ?ce) .
          BIND(FLOOR(?c / 2) AS ?fl) . BIND(ROUND(?c / 2) AS ?ro)
        }
    """))
    # fn:round ties go toward +INF: round(-2.5) = -2 (not -3)
    assert got == [("e1", 3.0, 2.0, 1.0, 2.0),
                   ("e2", 5.0, -2.0, -3.0, -2.0)]


def test_bind_hash_builtins_match_hashlib(spark):
    import hashlib

    t = _r4_numeric_graph(spark)
    got = _rows(execute(t, """
        SELECT ?m ?s1 ?s256 ?s512 WHERE {
          "e2" ev:name ?n .
          BIND(MD5(?n) AS ?m) . BIND(SHA1(?n) AS ?s1) .
          BIND(SHA256(?n) AS ?s256) . BIND(SHA512(?n) AS ?s512)
        }
    """))
    assert got == [(hashlib.md5(b"zz").hexdigest(),
                    hashlib.sha1(b"zz").hexdigest(),
                    hashlib.sha256(b"zz").hexdigest(),
                    hashlib.sha512(b"zz").hexdigest())]


def test_bind_encode_for_uri_rfc3986(spark):
    t = _r4_numeric_graph(spark)
    got = _rows(execute(t, """
        SELECT ?e WHERE { "e1" ev:name ?n . BIND(ENCODE_FOR_URI(?n) AS ?e) }
    """))
    # space -> %20 (not '+'), '~' kept, '*' -> %2A (RFC 3986 unreserved only)
    assert got == [("a%20b~%2A%20c",)]


def test_bind_iri_uri_are_str(spark):
    t = _r4_numeric_graph(spark)
    got = _rows(execute(t, """
        SELECT ?u ?v WHERE {
          ?s ev:ref ?o . BIND(IRI(?o) AS ?u) . BIND(URI(?s) AS ?v)
        }
    """))
    assert got == [("e1", "e2")]


def test_bind_datatype_literal_iri_unknown(spark):
    t = _r4_numeric_graph(spark)
    got = _rows(execute(t, """
        SELECT ?s ?dc ?dn ?dr WHERE {
          ?s ev:count ?c . ?s ev:name ?n .
          OPTIONAL { ?s ev:ref ?r } .
          BIND(DATATYPE(?c) AS ?dc) . BIND(DATATYPE(?n) AS ?dn) .
          BIND(DATATYPE(?r) AS ?dr)
        }
    """))
    # IRI term ('e1' via ev:ref) and unbound both -> NULL datatype
    assert got == [("e1", "xsd:int", "xsd:string", None),
                   ("e2", "xsd:int", "xsd:string", None)]


def test_datatype_nested_bind_and_filter(spark):
    t = _r4_numeric_graph(spark)
    # nested inside a larger BIND expression (hoisted to one left join)
    got = _rows(execute(t, 'SELECT ?s ?d WHERE { ?s ev:count ?c . '
                           'BIND(CONCAT(DATATYPE(?c), "x") AS ?d) }'))
    assert got == [("e1", "xsd:intx"), ("e2", "xsd:intx")]
    # FILTER operand: keep only xsd:int-typed objects
    got = _rows(execute(t, 'SELECT ?s ?o WHERE { ?s ?p ?o . '
                           'FILTER(DATATYPE(?o) = "xsd:int") }'))
    assert got == [("e1", "3"), ("e2", "-5")]
    # IRI terms have NULL datatype → the comparison is a type error and
    # the row drops, even under !=
    assert _rows(execute(t, 'SELECT ?s WHERE { ?s ev:ref ?r . '
                            'FILTER(DATATYPE(?r) != "xsd:int") }')) == []
    # the hoisted temp column never leaks into the solution schema
    df = execute(t, 'SELECT * WHERE { ?s ev:count ?c . '
                    'FILTER(DATATYPE(?c) = "xsd:int") }')
    assert all(not c.startswith("__dt__") for c in df.columns)


def test_datatype_in_order_by_and_projection(spark):
    """r5 typed-term model: DATATYPE over a metadata-carrying variable is a
    map-side expression — usable in ORDER BY and (expr AS ?alias)
    projection directly (the r4 BIND-hoist requirement is gone)."""
    t = _r4_numeric_graph(spark)
    df = execute(t, "SELECT ?s (DATATYPE(?c) AS ?dt) "
                    "WHERE { ?s ev:count ?c } ORDER BY DATATYPE(?c) ?s")
    assert [tuple(r) for r in df.collect()] == [
        ("e1", "xsd:int"), ("e2", "xsd:int")]


def test_filter_isnumeric_is_term_typed(spark):
    t = _r4_numeric_graph(spark)
    # '3' and '-5' are numeric-typed; names and IRIs are not
    got = _rows(execute(t,
        "SELECT ?o WHERE { ?s ?p ?o . FILTER(isNumeric(?o)) }"))
    assert got == [("-5",), ("3",)]
    # lexical digits with a non-numeric datatype stay excluded
    t2 = t.unionByName(t.sparkSession.createDataFrame(
        [("g1", "e3", "ev:name", "42", "xsd:string")], t.schema))
    got2 = _rows(execute(t2,
        "SELECT ?o WHERE { ?s ?p ?o . FILTER(isNumeric(?o)) }"))
    assert got2 == [("-5",), ("3",)]


def test_filter_isblank_constant_false(spark):
    t = _r4_numeric_graph(spark)
    assert _rows(execute(t,
        "SELECT ?s WHERE { ?s ev:count ?c . FILTER(isBlank(?s)) }")) == []
    got = _rows(execute(t,
        "SELECT ?s WHERE { ?s ev:count ?c . FILTER(!isBlank(?s)) }"))
    assert got == [("e1",), ("e2",)]


def test_order_by_numeric_expression(spark):
    # expression sort keys see the projected solution set (the engine is
    # set-semantics, so — like SPARQL's SELECT DISTINCT rule, §15.1 note —
    # ORDER BY may only use projected variables)
    t = _r4_numeric_graph(spark)
    df = execute(t, """
        SELECT ?s ?c WHERE { ?s ev:count ?c } ORDER BY DESC(ABS(?c))
    """)
    assert [r.s for r in df.collect()] == ["e2", "e1"]


# --------------------------------------------------------------------------
# Round-5 surface: path quantifiers {n} {n,m} {n,} {,m} (ARQ extension)
# --------------------------------------------------------------------------

def test_path_quantifier_fixed(chain_triples):
    # a->b->c->d chain: exactly two hops
    got = _rows(execute(chain_triples,
                        "SELECT ?a ?b WHERE { ?a ev:next{2} ?b }"))
    assert got == [("a", "c"), ("b", "d")]
    # {1} is the plain predicate
    assert _rows(execute(chain_triples,
                         "SELECT ?a ?b WHERE { ?a ev:next{1} ?b }")) == \
        [("a", "b"), ("b", "c"), ("c", "d")]


def test_path_quantifier_bounded_range(chain_triples):
    got = _rows(execute(chain_triples,
                        "SELECT ?a ?b WHERE { ?a ev:next{2,3} ?b }"))
    assert got == [("a", "c"), ("a", "d"), ("b", "d")]


def test_path_quantifier_open_range(chain_triples):
    # {2,} = at least two hops
    got = _rows(execute(chain_triples,
                        "SELECT ?a ?b WHERE { ?a ev:next{2,} ?b }"))
    assert got == [("a", "c"), ("a", "d"), ("b", "d")]
    # {1,} desugars to + : seeded fast path still applies from a constant
    got = _rows(execute(chain_triples,
                        'SELECT ?b WHERE { "a" ev:next{1,} ?b }'))
    assert got == [("b",), ("c",), ("d",)]


def test_path_quantifier_zero_lower(chain_triples):
    # {,1} == ? : zero-or-one, zero-length over every graph term
    got = _rows(execute(chain_triples,
                        'SELECT ?b WHERE { "b" ev:next{,1} ?b }'))
    assert got == [("b",), ("c",)]
    # {0,} == * from a constant subject
    got = _rows(execute(chain_triples,
                        'SELECT ?b WHERE { "b" ev:next{0,} ?b }'))
    assert got == [("b",), ("c",), ("d",)]
    # {0,2}: identity + one + two hops, deduped like ? / *
    got = _rows(execute(chain_triples,
                        'SELECT ?b WHERE { "a" ev:next{0,2} ?b }'))
    assert got == [("a",), ("b",), ("c",)]


def test_path_quantifier_composed(chain_triples):
    # quantifier over a parenthesized path, then a tag hop
    got = _rows(execute(chain_triples,
                        'SELECT ?x WHERE { "a" ev:next{3}/ev:tag ?x }'))
    assert got == [("x2",)]
    # inverse of a quantified path
    got = _rows(execute(chain_triples,
                        'SELECT ?a WHERE { ?a ^ev:next{2} "a" }'))
    assert got == [("c",)]


def test_path_quantifier_validation():
    for bad in ("{0}", "{}", "{3,2}", "{,}"):
        with pytest.raises(SparqlError):
            parse("SELECT ?a ?b WHERE { ?a ev:next%s ?b }" % bad)


# --------------------------------------------------------------------------
# Round-5 surface: GROUP BY (expr AS ?alias) keys
# --------------------------------------------------------------------------

def test_group_by_expression_key(spark):
    rows = [("r", f"e{i}", "ev:n", str(v), "xsd:int")
            for i, v in enumerate([3, 7, 12, 15, 20, 21])]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string")
    df = execute(t, """
        SELECT ?decade (COUNT(?s) AS ?n) (SUM(?v) AS ?total)
        WHERE { ?s ev:n ?v }
        GROUP BY (FLOOR(?v / 10) AS ?decade) ORDER BY ?decade
    """)
    assert [(r.decade, r.n, r.total) for r in df.collect()] == [
        (0.0, 2, 10.0), (1.0, 2, 27.0), (2.0, 2, 41.0)]


def test_group_by_expression_mixed_with_plain_key(spark):
    rows = [("r", f"e{i}", "ev:n", str(v), "xsd:int")
            for i, v in enumerate([3, 7, 12, 15])]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string")
    df = execute(t, """
        SELECT ?p ?len (COUNT(?s) AS ?n)
        WHERE { ?s ?p ?v } GROUP BY ?p (STRLEN(?v) AS ?len) ORDER BY ?len
    """)
    assert [(r.p, r.len, r.n) for r in df.collect()] == [
        ("ev:n", 1, 2), ("ev:n", 2, 2)]


def test_group_by_expression_validation(spark):
    rows = [("r", "e0", "ev:n", "3", "xsd:int")]
    t = spark.createDataFrame(
        rows, "repo string, subj string, pred string, obj string, obj_type string")
    # alias may not rebind a WHERE variable
    with pytest.raises(SparqlError):
        execute(t, "SELECT ?v (COUNT(?s) AS ?n) WHERE { ?s ev:n ?v } "
                   "GROUP BY (STRLEN(?v) AS ?v)").collect()
    # alias must be a variable
    with pytest.raises(SparqlError):
        parse('SELECT ?x WHERE { ?s ev:n ?v } GROUP BY (STRLEN(?v) AS "x")')
