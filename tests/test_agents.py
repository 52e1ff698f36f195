"""Author entity-linking (J1), contributions (A1), alias merge (CC extra)."""

from __future__ import annotations

from pyspark.sql import functions as F

from git_prov_spark.pipeline.agents import (
    alias_components,
    contributions,
    resolve_authors,
)


def test_direct_login_used_even_if_not_contributor(spark_tables):
    files, commits, contributors = spark_tables
    resolved = resolve_authors(commits, contributors)
    ghost = resolved.where(F.col("author_login") == "ghost").select("resolved_login")
    rows = ghost.distinct().collect()
    assert rows and rows[0].resolved_login == "ghost"


def test_null_login_name_match_wins_when_before_noname(spark_tables):
    # seq%20==7: author_name="Alice A" matches alice (order 0) < carol (null-name)
    files, commits, contributors = spark_tables
    resolved = resolve_authors(commits, contributors)
    r = resolved.where(
        F.col("author_login").isNull() & (F.col("author_name") == "Alice A")
    ).select("resolved_login").distinct().collect()
    assert [x.resolved_login for x in r] == ["alice"]


def test_null_login_unknown_name_falls_to_first_noname(spark_tables):
    # seq%20==17: unknown name -> carol (first agent with no name attribute)
    files, commits, contributors = spark_tables
    resolved = resolve_authors(commits, contributors)
    r = resolved.where(
        F.col("author_login").isNull() & (F.col("author_name") == "Nobody Known")
    ).select("resolved_login").distinct().collect()
    assert [x.resolved_login for x in r] == ["carol"]


def test_ambiguous_name_prefers_min_order_vs_noname(spark_tables):
    # "Dave D" matches dan(3) and dave(4); carol(2, null-name) precedes both ->
    # reference first-match semantics pick carol (the always-true predicate).
    files, commits, contributors = spark_tables
    resolved = resolve_authors(commits, contributors)
    r = resolved.where(
        F.col("author_login").isNull() & (F.col("author_name") == "Dave D")
    ).select("resolved_login").distinct().collect()
    assert all(x.resolved_login == "carol" for x in r)


def test_contributions_counts_match_resolved(spark_tables):
    files, commits, contributors = spark_tables
    resolved = resolve_authors(commits, contributors)
    contribs = contributions(resolved, contributors)
    total_assoc = resolved.where(F.col("resolved_login").isNotNull()).count()
    ghost_assoc = resolved.where(F.col("resolved_login") == "ghost").count()
    sum_contrib = contribs.agg(F.sum("contributions")).collect()[0][0]
    # ghost has no contributor row, so its commits are not counted anywhere
    assert sum_contrib == total_assoc - ghost_assoc
    z = contribs.where(F.col("contributions") == 0)
    assert z.count() >= 0  # zero-count agents allowed


def test_alias_components_merge_shared_email(spark_tables):
    files, commits, contributors = spark_tables
    cc = alias_components(commits, contributors)
    rows = {
        (r.repo, r.login): r.canonical_login
        for r in cc.collect()
    }
    # dan and dave share shared@x.io -> same canonical login (dan, the min)
    assert rows[("org0/hot", "dan")] == rows[("org0/hot", "dave")] == "dan"
    # alice stays alone
    assert rows[("org0/hot", "alice")] == "alice"


def test_canonicalize_wiring_merges_agents(spark_tables):
    """build_triples(canonicalize_agents=True): dan/dave (shared email)
    collapse to one canonical agent; associations rewrite; contributions
    roll up to the component."""
    from git_prov_spark.pipeline.build import build_triples

    files, commits, contributors = spark_tables
    t = build_triples(files, commits, contributors, canonicalize_agents=True)
    hot = t.where(F.col("repo") == "org0/hot")
    agents = {
        r.subj
        for r in hot.where(
            (F.col("pred") == "rdf:type") & (F.col("obj") == "prov:Agent")
        ).collect()
    }
    assert "gitprov:dan" in agents and "gitprov:dave" not in agents
    assoc = {r.obj for r in hot.where(
        F.col("pred") == "prov:wasAssociatedWith").collect()}
    assert "gitprov:dave" not in assoc
    # contributions of the merged agent = dan's + dave's resolved commits
    plain = build_triples(files, commits, contributors)
    def contrib(df, who):
        rows = df.where(
            (F.col("repo") == "org0/hot")
            & (F.col("pred") == "gitprov:contributions")
            & (F.col("subj") == who)
        ).collect()
        return sum(int(r.obj) for r in rows)
    assert contrib(t, "gitprov:dan") == (
        contrib(plain, "gitprov:dan") + contrib(plain, "gitprov:dave")
    )


def test_canonicalize_default_off_is_identical(spark_tables):
    """The default-off path must stay byte-identical to the reference
    semantics (same triple set with and without the flag present)."""
    from git_prov_spark.pipeline.build import build_triples

    files, commits, contributors = spark_tables
    a = {tuple(r) for r in build_triples(files, commits, contributors).collect()}
    b = {
        tuple(r)
        for r in build_triples(
            files, commits, contributors, canonicalize_agents=False
        ).collect()
    }
    assert a == b


def test_fuzzy_agent_links_blocking_and_threshold(spark):
    from git_prov_spark.pipeline.agents import fuzzy_agent_links

    d = spark.createDataFrame(
        [(1, "J. Smith", "x"), (2, "J Smith", "x"), (3, "J. Smyth", "x"),
         (4, "Completely Different", "x"),
         (5, "J. Smith", "y")],   # same name, other block: never paired
        "id long, nm string, blk string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in fuzzy_agent_links(d, "id", "nm", "blk",
                                      max_dist=2).collect()}
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 2)}
    # composition: the links feed the same components machinery
    from git_prov_spark.operators import connected_components
    pairs = fuzzy_agent_links(d, "id", "nm", "blk", max_dist=2) \
        .selectExpr("CAST(id_a AS STRING) a", "CAST(id_b AS STRING) b")
    comp = {(r.node, r.component)
            for r in connected_components(pairs, a="a", b="b").collect()}
    assert comp == {("1", "1"), ("2", "1"), ("3", "1")}
