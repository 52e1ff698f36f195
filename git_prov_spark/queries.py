"""Graph query layer (SURVEY.md §2.11 Q1) — SPARQL-shaped queries over triples.

The reference answers SPARQL SELECT via Jena ARQ over a per-repo model
(SparqlService.java:16-31). Capability parity here: a basic-graph-pattern
compiler that turns triple patterns into Catalyst self-joins — each pattern is
a filtered scan of the (partition-pruned) triples table, shared variables become
equi-join keys, so Catalyst does the BGP join ordering/pushdown that ARQ does —
plus canned PROV query shapes built on it.

Pattern syntax: a (s, p, o) string triple; "?name" marks a variable, anything
else is matched as a constant against subj/pred/obj.

Raw SPARQL SELECT strings are accepted by the frontend in `sparql.py`
(sparql.execute), which parses a documented subset and compiles to bgp().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

#: suffix of the hidden term-metadata companion column a typed-mode bgp()
#: binds next to each variable's value column ("?x" → columns `x` + `x#m`).
#: '#' cannot appear in a SPARQL variable name (grammar [166]), so the
#: companion can never collide with a user variable. The metadata value is
#: the store's obj_type vocabulary: 'iri', a datatype CURIE ('xsd:int'), or
#: '@tag' for a language-tagged literal (rdf:langString with tag `tag` —
#: the engine's store-level lang encoding; the KG emitter itself writes
#: none, mirroring the reference, but the query engine honors them).
TERM_META = "#m"


def term_meta(var: str) -> str:
    """Name of the hidden term-metadata column for variable `var`."""
    return var + TERM_META


class TypedLit(str):
    """A literal constant parsed with an EXPLICIT datatype ("5"^^xsd:int)
    or language tag ("x"@en). Subclasses str as the bare lexical form, so
    every consumer that ignores typing behaves exactly as before; typed-
    aware compile sites read `.meta` ('xsd:int' / '@en') to match the term
    exactly against the store's obj_type. Constants WITHOUT explicit typing
    deliberately keep the engine's legacy lexical matching (compatibility
    rule, module doc in sparql.py)."""

    meta: str

    def __new__(cls, value: str, meta: str) -> "TypedLit":
        o = super().__new__(cls, value)
        o.meta = meta
        return o


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp(
    triples: DataFrame, patterns: list[Pattern], repo: str | None = None,
    typed: bool = False,
) -> DataFrame:
    """Compile a basic graph pattern into a DataFrame of variable bindings.

    SELECT-star semantics: output columns = all distinct variables. Constants
    filter; repeated variables join (across patterns) or equate (within one).

    Multiplicity is SPARQL's (bag, §18.5): each pattern's relation is a SET
    (a pattern's variable bindings plus its constants determine the matched
    triple, and the graph is a triple set), so the equi-join's multiplicity
    — the number of distinct triple combinations producing a full binding —
    is exactly the spec's BGP solution multiplicity of 1 per mapping, with
    no dedup shuffle anywhere in the plan. With `repo=None` over a
    multi-repo frame the queried graph is the MERGE (set-union) of the
    per-repo named graphs, so each pattern relation dedups after projecting
    the repo column away — per-pattern `distinct` on ≤3 narrow columns,
    equivalent to deduping the merged graph first (the projection is
    injective on a pattern's matched triples).

    `typed=True` (the SPARQL frontend's mode, when the frame carries
    obj_type): every variable additionally binds its hidden term-metadata
    column (term_meta(v)) — obj_type for object positions, 'iri' for
    subject/predicate positions. Because the companion shares its name
    across patterns, the existing shared-column equi-join makes variable
    joins TERM-correct for free: ?v bound to "5"^^xsd:int in one pattern no
    longer joins ?v bound to "5"^^xsd:string (or to an IRI) in another.
    TypedLit constants in object position filter obj AND obj_type; a
    TypedLit in subject/predicate position matches nothing (a literal is
    never a subject/predicate term). Plain constants keep lexical matching.
    """
    if not patterns:
        raise ValueError("empty pattern list")
    typed = typed and "obj_type" in triples.columns
    cross_repo = repo is None and "repo" in triples.columns
    result: DataFrame | None = None
    for s, p, o in patterns:
        df = triples
        if repo is not None:
            df = df.where(F.col("repo") == repo)
        cols: dict[str, str] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                name = term[1:]
                if name in cols:  # repeated var within one pattern
                    df = df.where(F.col(col) == F.col(cols[name]))
                    if typed and "obj" in (col, cols[name]) \
                            and col != cols[name]:
                        # subject/predicate = object as TERMS: the object
                        # must be an IRI (a literal never equals an IRI
                        # term, however the lexicals compare)
                        df = df.where(F.col("obj_type") == "iri")
                else:
                    cols[name] = col
            else:
                df = df.where(F.col(col) == term)
                if typed and isinstance(term, TypedLit):
                    # explicitly-typed constant: term-exact match
                    df = (df.where(F.col("obj_type") == term.meta)
                          if col == "obj" else df.where(F.lit(False)))
        proj_cols = [F.col(c).alias(v) for v, c in cols.items()]
        if typed:
            proj_cols += [
                (F.col("obj_type") if c == "obj" else F.lit("iri"))
                .alias(term_meta(v))
                for v, c in cols.items()
            ]
        proj = df.select(*proj_cols)
        if cross_repo:
            # all-constant pattern: a 0-column existence relation — ≤1 row
            # by limit (distinct over zero columns is degenerate)
            proj = proj.limit(1) if not cols else proj.distinct()
        if result is None:
            result = proj
        else:
            # shared columns include the term-metadata companions, so the
            # equi-join is term-level in typed mode with no extra logic
            shared = [c for c in proj.columns if c in result.columns]
            result = result.join(proj, shared) if shared else result.crossJoin(proj)
    assert result is not None
    return result


# --------------------------------------------------------------------------
# Canned PROV shapes (the reference README's example queries, SPARQL-free)
# --------------------------------------------------------------------------

def files_by_author(triples: DataFrame, repo: str, login_curie: str) -> DataFrame:
    """File-version entities generated by commits the agent authored."""
    return bgp(
        triples,
        [
            ("?commit", "prov:wasAssociatedWith", login_curie),
            ("?entity", "prov:wasGeneratedBy", "?commit"),
            ("?entity", "rdfs:label", "?path"),
        ],
        repo=repo,
    )


def commit_dag(triples: DataFrame, repo: str) -> DataFrame:
    """(child, parent) activity edges — the wasInformedBy DAG."""
    return bgp(triples, [("?child", "prov:wasInformedBy", "?parent")], repo=repo)


def version_chain(triples: DataFrame, repo: str, path_label: str) -> DataFrame:
    """All versions of a file (by label) with their generating commits."""
    return bgp(
        triples,
        [
            ("?base", "rdfs:label", path_label),
            ("?version", "prov:specializationOf", "?base"),
            ("?version", "prov:wasGeneratedBy", "?commit"),
        ],
        repo=repo,
    )


def derivation_closure(
    triples: DataFrame, repo: str, entity_curie: str, max_hops: int = 16
) -> DataFrame:
    """Transitive wasDerivedFrom ancestors of an entity (iterative driver loop
    with early exit — hop count is bounded by the file's version count)."""
    edges = (
        triples.where((F.col("repo") == repo) & (F.col("pred") == "prov:wasDerivedFrom"))
        .select(F.col("subj").alias("child"), F.col("obj").alias("parent"))
        .persist()
    )
    frontier = edges.where(F.col("child") == entity_curie).select(
        F.col("parent"), F.lit(1).alias("hops")
    )
    seen = frontier
    for _ in range(max_hops - 1):
        step = edges.select(
            F.col("child").alias("parent"), F.col("parent").alias("grandparent")
        )
        frontier = (
            frontier.join(step, "parent")
            .select(F.col("grandparent").alias("parent"), (F.col("hops") + 1).alias("hops"))
            .join(seen.select("parent"), "parent", "left_anti")
            .distinct()
        )
        if frontier.isEmpty():
            break
        seen = seen.unionByName(frontier)
    edges.unpersist()
    return seen


def agent_activity_summary(triples: DataFrame, repo: str) -> DataFrame:
    """Commits per agent (the contributions view, answered from the graph)."""
    return (
        bgp(triples, [("?commit", "prov:wasAssociatedWith", "?agent")], repo=repo)
        .groupBy("agent")
        .agg(F.count("*").alias("n_commits"))
    )


def blame(triples: DataFrame, repo: str | None = None) -> DataFrame:
    """(version, commit, agent) — every file version attributed to the
    agent of its generating activity: the KG-native `git blame` at
    version granularity, and the shape the north_star's
    prov:wasAttributedTo edges exist to answer. Two BGP equi-joins
    (version →wasGeneratedBy→ commit →wasAssociatedWith→ agent); with
    repo=None it runs across every named graph (the merged-graph BGP
    semantics, distinct per pattern)."""
    return bgp(
        triples,
        [
            ("?version", "prov:wasGeneratedBy", "?commit"),
            ("?commit", "prov:wasAssociatedWith", "?agent"),
        ],
        repo=repo,
    ).select("version", "commit", "agent")
