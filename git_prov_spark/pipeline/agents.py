"""Author entity-linking (SURVEY.md §2.3 J1), contributions (A1), alias merge.

Reference semantics (ProvenanceService.java:138-153): a commit with a GitHub
author object uses its login directly (even when absent from contributors); a
commit without one falls back to the FIRST agent, in list order, whose foaf:name
equals the commit author name — where the filter predicate returns `true` for
agents lacking a name attribute, so null-name agents are always candidates.
Agent order = ascending login (DESIGN.md §5).

All joins here are dim-side joins (contributors is tiny; commits is the small
side of the pipeline) — AQE picks broadcast. The fan-out to snapshot-scale data
never touches this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_agents(contributors: DataFrame) -> DataFrame:
    w = Window.partitionBy("repo").orderBy("login")
    return contributors.withColumn("agent_ord", F.row_number().over(w))


def resolve_authors(commits: DataFrame, contributors: DataFrame) -> DataFrame:
    """commits + `resolved_login` (nullable only when no candidate exists)."""
    agents = ordered_agents(contributors)

    with_login = commits.where(F.col("author_login").isNotNull()).withColumn(
        "resolved_login", F.col("author_login")
    )

    nulls = commits.where(F.col("author_login").isNull())

    # first null-name agent per repo (always-true predicate branch)
    noname = (
        agents.where(F.col("name").isNull())
        .groupBy("repo")
        .agg(F.min(F.struct("agent_ord", "login")).alias("nn"))
    )

    # min-order name match per (repo, author_name)
    name_match = (
        nulls.select("repo", "commit", "author_name")
        .join(
            agents.select("repo", F.col("name").alias("author_name"), "agent_ord", "login"),
            ["repo", "author_name"],
            "left",
        )
        .groupBy("repo", "commit")
        .agg(F.min(F.struct("agent_ord", "login")).alias("nm"))
    )

    resolved_nulls = (
        nulls.join(name_match, ["repo", "commit"], "left")
        .join(noname, "repo", "left")
        .withColumn(
            "resolved_login",
            F.when(
                F.col("nm").isNotNull()
                & (F.col("nn").isNull() | (F.col("nm.agent_ord") < F.col("nn.agent_ord"))),
                F.col("nm.login"),
            ).otherwise(F.col("nn.login")),
        )
        .drop("nm", "nn")
    )

    return with_login.unionByName(resolved_nulls)


def contributions(resolved_commits: DataFrame, contributors: DataFrame) -> DataFrame:
    """contributors + computed `contributions` count (SURVEY.md §1.3: groupBy
    count of resolved associations, not API-trusted; zero allowed)."""
    counts = (
        resolved_commits.where(F.col("resolved_login").isNotNull())
        .groupBy("repo", F.col("resolved_login").alias("login"))
        .agg(F.count("*").alias("n_contrib"))
    )
    return contributors.join(counts, ["repo", "login"], "left").withColumn(
        "contributions", F.coalesce(F.col("n_contrib"), F.lit(0)).cast("int")
    ).drop("n_contrib")


# --------------------------------------------------------------------------
# Alias canonicalization (north_star extra; DESIGN.md §7)
# --------------------------------------------------------------------------

def canonicalize_logins(resolved_commits: DataFrame, alias_map: DataFrame) -> DataFrame:
    """Rewrite resolved_login through the alias component map (left join +
    coalesce: logins outside any component keep themselves). alias_map is
    component-count-sized — AQE broadcasts it."""
    return (
        resolved_commits.join(
            alias_map.select(
                "repo",
                F.col("login").alias("resolved_login"),
                "canonical_login",
            ),
            ["repo", "resolved_login"],
            "left",
        )
        .withColumn(
            "resolved_login",
            F.coalesce(F.col("canonical_login"), F.col("resolved_login")),
        )
        .drop("canonical_login")
    )


def canonicalize_contributors(contributors: DataFrame, alias_map: DataFrame) -> DataFrame:
    """One contributor row per alias component: every login rewrites to its
    canonical, then the component keeps its min-original-login row's
    attributes (deterministic representative). Logins outside any component
    pass through unchanged."""
    j = (
        contributors.join(alias_map.select("repo", "login", "canonical_login"),
                          ["repo", "login"], "left")
        .withColumn("canonical_login",
                    F.coalesce(F.col("canonical_login"), F.col("login")))
    )
    w = Window.partitionBy("repo", "canonical_login").orderBy("login")
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "login")
        .withColumnRenamed("canonical_login", "login")
    )


def alias_components(commits: DataFrame, contributors: DataFrame,
                     max_iters: int = 12) -> DataFrame:
    """Connected components over the login↔email bipartite graph.

    DataFrame-native min-label propagation (no driver union-find): labels
    converge to the component's minimum node id in O(graph diameter)
    iterations — alias chains are shallow, so this terminates in 2-4 rounds.
    Returns (repo, login, canonical_login).
    """
    pairs = (
        commits.where(F.col("author_login").isNotNull() & F.col("author_email").isNotNull())
        .select("repo", "author_login", "author_email")
        .unionByName(
            contributors.where(F.col("email").isNotNull()).select(
                "repo",
                F.col("login").alias("author_login"),
                F.col("email").alias("author_email"),
            )
        )
        .distinct()
        .select(
            "repo",
            F.concat(F.lit("L:"), "author_login").alias("a"),
            F.concat(F.lit("E:"), "author_email").alias("b"),
        )
    )
    edges = pairs.unionByName(
        pairs.select("repo", F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()

    labels = edges.select("repo", F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()

    for _ in range(max_iters):
        neighbor_min = (
            edges.join(
                labels.select("repo", F.col("node").alias("b"), F.col("label").alias("nl")),
                ["repo", "b"],
            )
            .groupBy("repo", F.col("a").alias("node"))
            .agg(F.min("nl").alias("neighbor_label"))
        )
        new_labels = (
            labels.join(neighbor_min, ["repo", "node"], "left")
            .select(
                "repo", "node",
                F.least("label", "neighbor_label").alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), ["repo", "node"])
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    # map component label -> canonical login (min login node in the component)
    canon = (
        labels.where(F.col("node").startswith("L:"))
        .groupBy("repo", "label")
        .agg(F.min("node").alias("canonical_node"))
    )
    result = (
        labels.where(F.col("node").startswith("L:"))
        .join(canon, ["repo", "label"])
        .select(
            "repo",
            F.expr("substring(node, 3)").alias("login"),
            F.expr("substring(canonical_node, 3)").alias("canonical_login"),
        )
    )
    edges.unpersist()
    return result


def fuzzy_agent_links(directory: DataFrame, id_col: str, name_col: str,
                      block_col: str, max_dist: int = 2) -> DataFrame:
    """(block, id_a, id_b, dist) — BLOCKED fuzzy candidate links for
    agent entity resolution: within each blocking key (email domain,
    organization, phonetic bucket — whatever the caller projects),
    every id-ordered pair whose names are within `max_dist` edit
    distance. The fuzzy complement of alias_components' exact
    login↔email graph: feed these pairs into the same min-label
    components to merge near-identical agent records ("J. Smith" /
    "J Smith"), exactly the salted-broadcast + union-find linking pass
    the north rule names.

    Scale: the block key is what makes this survive 10^12 rows — the
    self-join is an equi-join on block (never all-pairs), cost
    Σ|block|². A viral block (one hosting domain) is the skew case:
    route through operators.salted_join or pre-cap blocks like the LSH
    bucket guard. levenshtein runs JVM-side (whole-stage codegen), and
    its integer distances are engine-exact — the DuckDB twin
    hash-matches with no tolerance."""
    a = directory.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a"))
    b = directory.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b"))
    return (
        a.join(b, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("block", "id_a", "id_b", "dist")
    )
