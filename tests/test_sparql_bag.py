"""SPARQL bag semantics (§18.5) — solution multiplicity, ARQ-parity.

Plain SELECT keeps one row per WHERE solution; DISTINCT (and only it)
dedups; UNION concatenates branch multisets; fixed-length property paths
carry route multiplicity; `+` `*` `?` closures and CONSTRUCT stay sets per
spec; cross-repo (repo=None) queries run over the set-union MERGE of the
per-repo graphs. Reference behavior: Jena ARQ over the per-repo model
(services/SparqlService.java:16-31).
"""

from __future__ import annotations

from collections import Counter

from git_prov_spark.sparql import ask, execute


def _tdf(spark, rows, repo="x"):
    return spark.createDataFrame(
        [(repo, s, p, o, "iri") for s, p, o in rows],
        "repo string, subj string, pred string, obj string, obj_type string",
    )


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


def test_projection_keeps_solution_multiplicity(spark):
    tdf = _tdf(spark, [
        ("u1", "p:click", "e1"), ("u1", "p:click", "e2"),
        ("u1", "p:click", "e3"), ("u2", "p:click", "e4"),
    ])
    got = _bag(execute(tdf, "SELECT ?u WHERE { ?u p:click ?e }"))
    assert got == Counter({("u1",): 3, ("u2",): 1})


def test_distinct_is_the_only_projection_dedup(spark):
    tdf = _tdf(spark, [
        ("u1", "p:click", "e1"), ("u1", "p:click", "e2"), ("u2", "p:click", "e3"),
    ])
    got = _bag(execute(tdf, "SELECT DISTINCT ?u WHERE { ?u p:click ?e }"))
    assert got == Counter({("u1",): 1, ("u2",): 1})


def test_select_star_distinct(spark):
    tdf = _tdf(spark, [
        ("u1", "p:click", "e1"), ("u1", "p:buy", "e1"),
    ])
    # two preds both matched by ?p — full-solution rows are distinct, and
    # DISTINCT * must not error on the star projection
    got = _bag(execute(tdf, "SELECT DISTINCT * WHERE { ?u ?p ?e }"))
    assert sum(got.values()) == 2


def test_union_concatenates_multisets(spark):
    tdf = _tdf(spark, [
        ("u1", "p:click", "e1"), ("u1", "p:view", "e2"),
    ])
    # first branch: clicks; second: ANY edge (includes the click) — the
    # click solution appears in both branches, so twice in the result
    got = _bag(execute(
        tdf,
        "SELECT ?u ?e WHERE { { ?u p:click ?e } UNION { ?u ?p ?e } }",
    ))
    assert got == Counter({("u1", "e1"): 2, ("u1", "e2"): 1})


def test_sequence_path_route_multiplicity(spark):
    # diamond: a→m1→b and a→m2→b — two routes, (a,b) twice (§9.1: the
    # fresh middle variable projects away without dedup)
    tdf = _tdf(spark, [
        ("a", "p:n", "m1"), ("a", "p:n", "m2"),
        ("m1", "p:n", "b"), ("m2", "p:n", "b"),
    ])
    got = _bag(execute(tdf, "SELECT ?x ?y WHERE { ?x p:n/p:n ?y }"))
    assert got == Counter({("a", "b"): 2})


def test_alternation_path_counts_both_branches(spark):
    tdf = _tdf(spark, [
        ("a", "p:p1", "b"), ("a", "p:p2", "b"),
    ])
    got = _bag(execute(tdf, "SELECT ?x ?y WHERE { ?x p:p1|p:p2 ?y }"))
    assert got == Counter({("a", "b"): 2})


def test_closure_paths_stay_sets(spark):
    # cycle a→b→a: `+` reaches each pair once regardless of the infinitely
    # many walks (ALP set semantics, §18.4); `?` dedups the self-loop
    # against the identity component
    tdf = _tdf(spark, [("a", "p:n", "b"), ("b", "p:n", "a"), ("a", "p:s", "a")])
    plus = _bag(execute(tdf, "SELECT ?x ?y WHERE { ?x p:n+ ?y }"))
    assert plus == Counter({("a", "b"): 1, ("b", "a"): 1,
                            ("a", "a"): 1, ("b", "b"): 1})
    opt = _bag(execute(tdf, "SELECT ?x ?y WHERE { ?x p:s? ?y }"))
    assert opt[("a", "a")] == 1  # self-loop edge ∪ identity — still once


def test_negated_set_two_directions_concatenate(spark):
    # symmetric pair under a pred outside both member sets: forward and
    # inverse NPS scans each contribute (a,b) once → multiplicity 2
    tdf = _tdf(spark, [("a", "p:x", "b"), ("b", "p:x", "a")])
    got = _bag(execute(tdf, "SELECT ?s ?o WHERE { ?s !(p:q|^p:r) ?o }"))
    assert got == Counter({("a", "b"): 2, ("b", "a"): 2})


def test_cross_repo_default_graph_is_set_union(spark):
    # the same triple stored in two repos counts ONCE queried cross-repo
    # (merged default graph), and path edges never count repo copies
    rows = [("x", "a", "p:n", "b"), ("y", "a", "p:n", "b"),
            ("y", "b", "p:n", "c")]
    tdf = spark.createDataFrame(
        [(r, s, p, o, "iri") for r, s, p, o in rows],
        "repo string, subj string, pred string, obj string, obj_type string",
    )
    got = _bag(execute(tdf, "SELECT ?s WHERE { ?s p:n ?o }"))
    assert got == Counter({("a",): 1, ("b",): 1})
    seq = _bag(execute(tdf, "SELECT ?s ?o WHERE { ?s p:n/p:n ?o }"))
    assert seq == Counter({("a", "c"): 1})


def test_repo_scoped_needs_no_dedup_shuffle(spark):
    # with a constant repo scope the per-pattern relations are already
    # sets — the compiled plan must not contain an Aggregate (dedup)
    tdf = _tdf(spark, [("u1", "p:click", "e1"), ("u1", "p:view", "e2")])
    df = execute(tdf, "SELECT ?u ?e WHERE { ?u p:click ?e }", repo="x")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan
    assert _bag(df) == Counter({("u1", "e1"): 1})


def test_aggregates_count_bag_solutions(spark):
    tdf = _tdf(spark, [
        ("u1", "p:click", "e1"), ("u1", "p:click", "e2"), ("u1", "p:view", "e3"),
    ])
    rows = execute(
        tdf,
        'SELECT ?u (COUNT(*) AS ?n) WHERE { '
        '{ ?u p:click ?e } UNION { ?u ?p ?e } } GROUP BY ?u',
    ).collect()
    # 2 click solutions + 3 any-edge solutions
    assert [(r.u, r.n) for r in rows] == [("u1", 5)]


def test_ask_unaffected_by_multiplicity(spark):
    tdf = _tdf(spark, [("u1", "p:click", "e1"), ("u1", "p:click", "e2")])
    assert ask(tdf, "ASK { ?u p:click ?e }")
    assert not ask(tdf, "ASK { ?u p:buy ?e }")


def test_fuzz_projection_multiplicity_vs_reference(spark):
    """Property fuzz at the bag level: random triple sets + random BGPs,
    projecting a random SUBSET of the bound variables, compared as
    MULTISETS against a nested-loop evaluator written from the spec."""
    import random

    rng = random.Random(987)

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

    for _trial in range(10):
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
        proj = sorted(rng.sample(bound, rng.randrange(1, len(bound) + 1)))
        sols = [{}]
        for p in pats:
            sols = py_join(sols, py_match(triples, p))
        expected = Counter(tuple(b[v] for v in proj) for b in sols)

        src = ("SELECT " + " ".join(f"?{v}" for v in proj)
               + " WHERE { " + " . ".join(" ".join(t) for t in pats) + " }")
        got = Counter(
            tuple(r[v] for v in proj)
            for r in execute(tdf, src).collect()
        )
        assert got == expected, (src, sorted(triples))
