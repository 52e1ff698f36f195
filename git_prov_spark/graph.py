"""Graph analytics over an edge relation (src, dst) — degree statistics
and a deterministic distributed PageRank.

The KG this engine builds is a graph; the reference exposes it only
through SPARQL (services/SparqlService.java:26), but any serious KG
deployment also wants whole-graph analytics (degree profiles for schema
sanity, centrality for entity ranking). These run over ANY (src, dst)
edge DataFrame: the built triples (subj, obj of IRI type), the near-dup
similarity graph, or an interaction graph.

Scale notes (100 TB):
- degree_stats is two hash-aggregates + one shuffle join on node — all
  narrow (node, count) rows.
- pagerank is n_iter rounds of (edges ⋈ ranks) + one hash-aggregate per
  round; edges are pre-joined with out-degree ONCE so the loop shuffles
  only (src, dst, out_deg, rank). Per-destination contributions are
  collected, SORTED BY SOURCE, then left-folded — double addition is not
  associative, and a plan-order `sum()` would make the result depend on
  partitioning; the sorted fold is bit-identical on any cluster size and
  lets a DuckDB twin reproduce it exactly (`list(x ORDER BY src)` +
  `list_reduce`). The list per node is bounded by in-degree; a hub node
  with 10^8 in-edges would need the same salted two-phase fold the
  repo's chunk packer uses (operators.py) — documented, not needed at
  the tested scales.
- Every node is required to have at least one out-edge (no dangling
  mass): callers with bipartite or sink-bearing graphs symmetrize first
  (add reverse edges), which is also what keeps the chain strongly
  connected and the iteration convergent.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg, degree) for every node of the edge bag.

    Multi-edges count multiply (pass edges.distinct() for simple-graph
    semantics). Two partial-aggregated counts and one full-outer join on
    the node key — no row ever carries more than (string, long, long)."""
    out_d = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0)))
            .alias("degree"),
        )
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes): the degree distribution — the one-line schema
    sanity check a KG build gets eyeballed with. One extra aggregate over
    degree_stats' output."""
    return (
        degree_stats(edges)
        .groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def pagerank(edges: DataFrame, n_iter: int = PAGERANK_ITERS,
             damping: float = PAGERANK_DAMPING) -> DataFrame:
    """(node, rank) after `n_iter` synchronous PageRank iterations from a
    uniform start — bit-deterministic across cluster sizes AND engines.

    rank_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_k(u) / out_deg(u)

    The Σ is evaluated as a left fold over the (src-sorted) contribution
    list, never a plan-order sum — see module docstring. Requires every
    node to have ≥1 out-edge (callers symmetrize; loudly unchecked here
    because the check would cost a full anti-join per call — pagerank_demo
    in __spark_entry__ shows the symmetrized construction)."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one bounded driver scalar (node count), reused below
    base = (1.0 - damping) / n  # python double; oracle embeds repr() of same
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    fat_edges = edges.join(out_deg, "src")  # (src, dst, out_deg), loop-invariant
    fat_edges = fat_edges.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contribs = fat_edges.join(
            ranks, fat_edges["src"] == ranks["node"]
        ).select(
            "src", "dst",
            (F.col("rank") / F.col("out_deg").cast("double")).alias("contrib"),
        )
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("src", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("s")
        )
        ranks = nodes.join(
            summed, nodes["node"] == summed["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0)))
            .alias("rank"),
        )
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, degree, n_tri, lcc) — exact per-node triangle counts and
    local clustering coefficient over the SIMPLE undirected graph induced
    by the edge bag (self-loops dropped, direction and multiplicity
    ignored; `degree` is the distinct-neighbor count).

    Algorithm: degree-ordered orientation (Ortmann/Brandes; the
    node-iterator++ every distributed triangle counter uses). Each
    undirected edge is oriented from its (degree, node)-smaller endpoint
    to its larger one, making the orientation a DAG under a total order —
    every triangle {a ≺ b ≺ c} is enumerated exactly once as the wedge
    (a→b, a→c) closed by the oriented edge b→c.

    Scale (100 TB): orientation bounds every node's out-degree by
    O(sqrt(m)) on arbitrary (even power-law) graphs, so the wedge
    self-join — the only superlinear step — generates
    Σ C(outdeg, 2) = O(m^1.5) rows worst-case instead of the hub-degree
    blowup a naive neighbor join suffers; both the wedge join (on u) and
    the closing join (on the (v, w) pair) are equi-joins, never
    cartesian. lcc is one IEEE division of exact longs — bit-identical
    across engines and cluster sizes; NULL for degree-1 nodes (no
    possible wedge, 0/0)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    # und is canonical (a < b), so the tie on equal degrees breaks to a.
    low_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
    o = (
        und.join(da, "a").join(db, "b")
        .select(
            F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(low_first, F.col("_db")).otherwise(F.col("_da"))
            .alias("dv"),
        )
    )
    wedge_lt = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    wedges = (
        o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
        .join(o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2")),
              "u")
        .where(wedge_lt)
        .select("u", "v1", "v2")
    )
    tri = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"])
    per_node = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node", "degree",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("degree") >= 2,
                (F.coalesce("n_tri", F.lit(0)) * 2).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            ).alias("lcc"),
        )
    )


def sql_degree_stats(edges_sql: str) -> str:
    """DuckDB twin of degree_stats over `edges_sql` (a SELECT producing
    src, dst)."""
    return (
        f"WITH e AS ({edges_sql}), "
        "o AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY 1), "
        "i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY 1) "
        "SELECT COALESCE(o.node, i.node) AS node, "
        "COALESCE(out_deg, 0) AS out_deg, COALESCE(in_deg, 0) AS in_deg, "
        "COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS degree "
        "FROM o FULL OUTER JOIN i ON o.node = i.node"
    )


def sql_pagerank(edges_sql: str, n_iter: int = PAGERANK_ITERS,
                 damping: float = PAGERANK_DAMPING) -> str:
    """DuckDB twin of pagerank: the same sorted-fold per destination
    (`list(contrib ORDER BY src)` + `list_reduce`), iterations unrolled
    as chained CTEs — bit-identical doubles to the Spark plan."""
    parts = [
        f"WITH e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        ("fe AS (SELECT e.src, e.dst, o.out_deg FROM e JOIN "
         "(SELECT src, COUNT(*) AS out_deg FROM e GROUP BY 1) o "
         "ON o.src = e.src)"),
        # CAST(... AS DOUBLE) throughout: DuckDB parses bare decimal
        # literals as exact DECIMALs, whose arithmetic would diverge from
        # the IEEE doubles the Spark plan computes (1.0 - 0.85 is
        # 0.15000000000000002 in both engines only when both are binary64)
        ("r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n AS rank "
         "FROM nodes CROSS JOIN nn)"),
    ]
    fold = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list(r.rank / CAST(fe.out_deg AS DOUBLE) ORDER BY fe.src)), "
            "(acc, x) -> acc + x)")
    for k in range(1, n_iter + 1):
        parts.append(
            f"c{k} AS (SELECT fe.dst AS node, {fold} AS s "
            f"FROM fe JOIN r{k-1} r ON r.node = fe.src GROUP BY fe.dst)"
        )
        parts.append(
            f"r{k} AS (SELECT nodes.node, "
            f"(CAST(1.0 AS DOUBLE) - CAST({damping!r} AS DOUBLE)) / nn.n "
            f"+ CAST({damping!r} AS DOUBLE) * COALESCE(c{k}.s, "
            "CAST(0.0 AS DOUBLE)) AS rank FROM nodes CROSS JOIN nn "
            f"LEFT JOIN c{k} ON c{k}.node = nodes.node)"
        )
    return ", ".join(parts) + f" SELECT node, rank FROM r{n_iter}"


def sql_triangles(edges_sql: str) -> str:
    """DuckDB twin of triangle_counts: the same canonicalization,
    degree-ordered orientation, wedge join, and single-division lcc —
    exact longs throughout, bit-identical doubles."""
    return (
        f"WITH e0 AS ({edges_sql}), "
        "und AS (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e0 WHERE src <> dst), "
        "deg AS (SELECT node, COUNT(*) AS degree FROM "
        "(SELECT a AS node FROM und UNION ALL SELECT b FROM und) "
        "GROUP BY 1), "
        "o AS (SELECT CASE WHEN da.degree < db.degree OR "
        "(da.degree = db.degree AND a < b) THEN a ELSE b END AS u, "
        "CASE WHEN da.degree < db.degree OR "
        "(da.degree = db.degree AND a < b) THEN b ELSE a END AS v, "
        "CASE WHEN da.degree < db.degree OR "
        "(da.degree = db.degree AND a < b) THEN db.degree ELSE da.degree "
        "END AS dv FROM und "
        "JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b), "
        "w AS (SELECT o1.u, o1.v AS v1, o2.v AS v2 FROM o o1 "
        "JOIN o o2 ON o1.u = o2.u WHERE o1.dv < o2.dv OR "
        "(o1.dv = o2.dv AND o1.v < o2.v)), "
        "tri AS (SELECT w.u, w.v1, w.v2 FROM w "
        "JOIN o ON o.u = w.v1 AND o.v = w.v2), "
        "pn AS (SELECT node, COUNT(*) AS n_tri FROM "
        "(SELECT u AS node FROM tri UNION ALL SELECT v1 FROM tri "
        "UNION ALL SELECT v2 FROM tri) GROUP BY 1) "
        "SELECT deg.node, deg.degree, "
        "CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri, "
        "CASE WHEN deg.degree >= 2 THEN "
        "CAST(COALESCE(pn.n_tri, 0) * 2 AS DOUBLE) / "
        "CAST(deg.degree * (deg.degree - 1) AS DOUBLE) "
        "ELSE NULL END AS lcc "
        "FROM deg LEFT JOIN pn USING (node)"
    )


CORENESS_ITERS = 8


def coreness(edges: DataFrame, n_iter: int = CORENESS_ITERS) -> DataFrame:
    """(node, coreness) — k-core decomposition by the h-index iteration
    (Lü, Chen, Ren, Zhang, Zhou & Stanley 2016): initialize every node's
    value to its degree, then repeatedly replace it with the H-index of
    its neighbors' values (the largest h such that ≥h neighbors have
    value ≥h). The sequence is monotonically non-increasing and its
    fixed point is EXACTLY the node's coreness. A fixed ``n_iter`` keeps
    the operator deterministic and lets the DuckDB twin unroll the same
    rounds; real graphs converge in a few iterations (tests assert the
    fixed point against an exact peel), and callers can raise it.

    Why this formulation and not the textbook min-degree peel: peeling
    is inherently sequential (each round depends on a global "remove
    all minimum-degree nodes" step whose phase lengths vary), while the
    h-index update is a uniform per-node recomputation — n_iter rounds
    of (edge ⋈ value) + one partitioned window + one hash-aggregate,
    the same shuffle shape as PageRank, with `localCheckpoint` per
    round to keep lineage flat. All-integer, hash-exact.

    The simple undirected graph is induced exactly as triangle_counts
    does it: self-loops dropped, direction and multiplicity ignored.
    """
    from pyspark.sql import Window

    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    # checkpoint the symmetrized edge list ONCE: every round's neighbor
    # join re-evaluates `sym`, and for derived graphs (e.g. the co-supply
    # self-join) that re-runs the whole edge derivation per round —
    # measured 17 s -> ~4 s at sf0.1 for 8 rounds
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    vals = (sym.groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True))
    # H-index of the neighbor values as ONE sorted fold inside the same
    # hash-aggregate (values sorted descending; h = max_i min(i, v_i)) —
    # a partitioned row_number window would plan a second Exchange+Sort
    # per round; the fold keeps each round at exactly one shuffle. The
    # per-node list is bounded by degree (the pagerank caveat applies to
    # 10^8-degree hubs; documented there).
    hfold = (
        "aggregate(sort_array(collect_list(_cn), false), "
        "struct(cast(0 as bigint) AS i, cast(0 as bigint) AS best), "
        "(acc, x) -> struct(acc.i + 1, "
        "greatest(acc.best, least(acc.i + 1, x))), acc -> acc.best)"
    )
    for _ in range(n_iter):
        nbr = (
            sym.join(vals.select(F.col("node").alias("b"),
                                 F.col("c").alias("_cn")), "b")
            .select(F.col("a").alias("node"), "_cn")
        )
        vals = (
            nbr.groupBy("node")
            .agg(F.expr(hfold).cast("long").alias("c"))
            .localCheckpoint(eager=True)
        )
    return vals.select("node", F.col("c").alias("coreness"))


def sql_coreness(edges_sql: str, n_iter: int = CORENESS_ITERS) -> str:
    """DuckDB twin of :func:`coreness` — the identical h-index rounds
    unrolled as chained CTEs (the BPE-oracle precedent)."""
    ctes = [
        f"e0 AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e0 WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT a, b FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "c0 AS MATERIALIZED (SELECT a AS node, "
        "CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY 1)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"c{i} AS MATERIALIZED (SELECT node, "
            "CAST(MAX(LEAST(r, cn)) AS BIGINT) "
            "AS c FROM (SELECT s.a AS node, p.c AS cn, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY s.a "
            "ORDER BY p.c DESC, s.b) AS BIGINT) AS r "
            f"FROM sym s JOIN c{i - 1} p ON s.b = p.node) GROUP BY node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, c AS coreness FROM c{n_iter}"
    )


COMPONENTS_ITERS = 8


def components_sync(edges: DataFrame,
                    n_iter: int = COMPONENTS_ITERS) -> DataFrame:
    """(node, label) — synchronous min-label propagation, FIXED rounds:
    after round i every node holds the minimum node id within graph
    distance i. At convergence label = connected-component id.

    This is the gate-twin form: a fixed iteration count makes the result
    a pure function both engines compute identically round for round —
    converged or not — so the DuckDB twin can unroll the same rounds as
    chained CTEs. The SCALE path for huge diameters is
    operators.connected_components (pointer jumping, O(log d) rounds,
    data-dependent early exit — correct but not SQL-twinnable); this
    synchronous form costs one (edge ⋈ label) equi-join + one
    hash-aggregate per round and is what you run when the diameter is
    known small (e.g. near-dup clusters after LSH banding).
    """
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    # same once-only checkpoint of the edge list as coreness() — the
    # per-round joins must not re-derive the input graph
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(n_iter):
        nbr_min = (
            sym.join(labels.select(F.col("node").alias("b"),
                                   F.col("label").alias("_nl")), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("_nl").alias("_nm"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select("node", F.least("label", "_nm").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def sql_components_sync(edges_sql: str,
                        n_iter: int = COMPONENTS_ITERS) -> str:
    """DuckDB twin of :func:`components_sync` — identical unrolled
    rounds. Each round references the previous one TWICE (node side and
    neighbor side), so every CTE is MATERIALIZED — without it DuckDB
    inlines the references and the plan tree doubles per round (2^n
    copies of round 0; measured 200+ s at n=8 vs ~1 s materialized)."""
    ctes = [
        f"e0 AS MATERIALIZED ({edges_sql})",
        "und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM e0 WHERE src <> dst)",
        "sym AS MATERIALIZED (SELECT a, b FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label "
        "FROM sym)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"l{i} AS MATERIALIZED (SELECT l.node, "
            "LEAST(l.label, MIN(p.label)) AS label "
            f"FROM l{i - 1} l JOIN sym s ON s.a = l.node "
            f"JOIN l{i - 1} p ON s.b = p.node "
            "GROUP BY l.node, l.label)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, label FROM l{n_iter}"
    )


def pagerank_personalized(edges: DataFrame, seeds: list[str],
                          n_iter: int = PAGERANK_ITERS,
                          damping: float = PAGERANK_DAMPING) -> DataFrame:
    """(node, rank) — personalized PageRank from a seed set: the restart
    mass (1-d) teleports to the seeds (uniformly) instead of to every
    node, so rank measures proximity to the seeds through the edge
    structure — the "entities related to X" ranking a KG serves.
    Identical iteration scheme, determinism discipline (src-sorted
    contribution folds, bit-identical doubles at any partitioning and
    in the DuckDB twin), and out-edge requirement as :func:`pagerank`;
    the uniform start over seeds keeps round-k values a pure function
    of the graph and seed list."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = len(seeds)
    seed_col = F.col("node").isin(*seeds)
    base = (1.0 - damping) / s
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    fat_edges = edges.join(out_deg, "src").localCheckpoint(eager=False)
    ranks = nodes.select(
        "node",
        F.when(seed_col, F.lit(1.0 / s)).otherwise(F.lit(0.0))
        .alias("rank"))
    for _ in range(n_iter):
        contribs = fat_edges.join(
            ranks, fat_edges["src"] == ranks["node"]
        ).select(
            "src", "dst",
            (F.col("rank") / F.col("out_deg").cast("double"))
            .alias("contrib"),
        )
        summed = contribs.groupBy("dst").agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("src", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("s")
        )
        ranks = nodes.join(
            summed, nodes["node"] == summed["dst"], "left"
        ).select(
            "node",
            (F.when(seed_col, F.lit(base)).otherwise(F.lit(0.0))
             + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias("rank"),
        )
    return ranks


def sql_pagerank_personalized(edges_sql: str, seeds: list[str],
                              n_iter: int = PAGERANK_ITERS,
                              damping: float = PAGERANK_DAMPING) -> str:
    """DuckDB twin of :func:`pagerank_personalized` — same unrolled
    sorted-fold rounds with the seed-restricted restart vector."""
    s = len(seeds)
    seed_list = "[" + ", ".join(f"'{x}'" for x in seeds) + "]"

    def in_seeds(ref: str) -> str:
        return f"list_contains({seed_list}, CAST({ref} AS VARCHAR))"

    parts = [
        f"WITH e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        ("fe AS (SELECT e.src, e.dst, o.out_deg FROM e JOIN "
         "(SELECT src, COUNT(*) AS out_deg FROM e GROUP BY 1) o "
         "ON o.src = e.src)"),
        (f"r0 AS (SELECT node, CASE WHEN {in_seeds('node')} THEN "
         f"CAST(1.0 AS DOUBLE) / {s} ELSE CAST(0.0 AS DOUBLE) END "
         "AS rank FROM nodes)"),
    ]
    fold = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list(r.rank / CAST(fe.out_deg AS DOUBLE) ORDER BY fe.src)), "
            "(acc, x) -> acc + x)")
    base = (f"(CAST(1.0 AS DOUBLE) - CAST({damping!r} AS DOUBLE)) "
            f"/ {s}")
    for k in range(1, n_iter + 1):
        parts.append(
            f"c{k} AS (SELECT fe.dst AS node, {fold} AS s "
            f"FROM fe JOIN r{k-1} r ON r.node = fe.src GROUP BY fe.dst)"
        )
        parts.append(
            f"r{k} AS (SELECT nodes.node, "
            f"CASE WHEN {in_seeds('nodes.node')} "
            f"THEN {base} ELSE CAST(0.0 AS DOUBLE) END "
            f"+ CAST({damping!r} AS DOUBLE) * COALESCE(c{k}.s, "
            "CAST(0.0 AS DOUBLE)) AS rank FROM nodes "
            f"LEFT JOIN c{k} ON c{k}.node = nodes.node)"
        )
    return ", ".join(parts) + f" SELECT node, rank FROM r{n_iter}"


BFS_ROUNDS = 8


def bfs_levels(edges: DataFrame, seeds: DataFrame,
               n_iter: int = BFS_ROUNDS) -> DataFrame:
    """(node, level) — directed BFS hop distance from a seed set,
    bounded at `n_iter` hops; nodes farther than the bound (or
    unreachable) are absent.

    The multi-source shortest-hop query a KG build answers constantly:
    derivation depth of a file version from its root
    (prov:wasDerivedFrom chains), blast radius of an entity, lineage
    horizon checks. Synchronous frontier expansion — round i joins the
    distance-(i-1) FRONTIER (not the whole visited set) against the
    edge list, then a min-aggregate folds re-discoveries; per-round cost
    is one equi-join + one hash-aggregate, intermediates bounded by the
    frontier fan-out, never the closure (contrast
    operators.transitive_closure, which materializes all PAIRS — this
    keeps one row per NODE). The hop bound is the point at 100 TB: an
    unbounded BFS on a social-scale graph floods everything by round ~6;
    a lineage query wants "within k hops" anyway, and k rounds is k
    shuffles of (node, level) rows.

    `seeds` is a single-column (node) DataFrame; seed nodes report
    level 0 even when re-reachable by a longer path (min-fold)."""
    lv = (seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
          .withColumn("level", F.lit(0))
          .localCheckpoint(eager=True))
    e = (edges.select("src", "dst").where(
            F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().localCheckpoint(eager=True))
    frontier = lv
    for i in range(1, n_iter + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.lit(i).alias("level"))
        )
        merged = (
            lv.unionByName(nxt)
            .groupBy("node").agg(F.min("level").alias("level"))
            .localCheckpoint(eager=True)
        )
        # the true frontier: nodes whose final level IS i (first seen now)
        frontier = merged.where(F.col("level") == i)
        if frontier.isEmpty():
            lv = merged
            break
        lv = merged
    return lv


def sql_bfs_levels(edges_sql: str, seeds_sql: str,
                   n_iter: int = BFS_ROUNDS) -> str:
    """DuckDB twin of :func:`bfs_levels` — a depth-bounded recursive CTE
    (UNION dedups (node, lvl) pairs per step; cycles terminate via the
    lvl < bound guard) folded by MIN(lvl). The early frontier exit in
    the Spark loop is a pure optimization — both compute min hop
    distance ≤ bound, so the relations agree regardless."""
    return f"""
WITH RECURSIVE
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) be
                   WHERE src IS NOT NULL AND dst IS NOT NULL),
s AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_sql}) bs),
r(node, lvl) AS (
  SELECT node, 0 FROM s
  UNION
  SELECT e.dst, r.lvl + 1 FROM r JOIN e ON e.src = r.node
  WHERE r.lvl < {n_iter})
SELECT node, MIN(lvl) AS level FROM r GROUP BY node
"""
