"""graph.py: degree stats and deterministic PageRank — exact parity with
an in-test pure-Python reference, and bit-stability across partitionings
(the property the sorted-fold aggregation exists to provide)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from git_prov_spark.graph import (
    PAGERANK_DAMPING,
    degree_histogram,
    degree_stats,
    pagerank,
)

# a small asymmetric digraph where every node has an out-edge
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "d"), ("c", "e"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def _py_pagerank(edges, n_iter, damping=PAGERANK_DAMPING):
    """Reference PageRank with the SAME fold order (contributions added
    in src-sorted order) so doubles are comparable bit-for-bit."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        incoming = {v: [] for v in nodes}
        for s, d in edges:
            incoming[d].append((s, rank[s] / float(out_deg[s])))
        nxt = {}
        for v in nodes:
            acc = 0.0
            for _, c in sorted(incoming[v]):
                acc += c
            nxt[v] = base + damping * acc
        rank = nxt
    return rank


def test_degree_stats(edges_df):
    got = {r.node: (r.out_deg, r.in_deg, r.degree)
           for r in degree_stats(edges_df).collect()}
    assert got == {
        "a": (2, 2, 4), "b": (1, 1, 2), "c": (2, 3, 5),
        "d": (2, 1, 3), "e": (1, 1, 2),
    }


def test_degree_histogram(edges_df):
    got = {r.degree: r.n_nodes for r in degree_histogram(edges_df).collect()}
    assert got == {2: 2, 3: 1, 4: 1, 5: 1}


def test_pagerank_matches_reference_bitwise(edges_df):
    want = _py_pagerank(EDGES, n_iter=5)
    got = {r.node: r["rank"] for r in pagerank(edges_df, n_iter=5).collect()}
    assert got == want  # exact float equality, not approx


def test_pagerank_partitioning_invariant(edges_df):
    """Re-partitioning must not change a single bit of any rank — the
    reason contributions fold in src-sorted order instead of sum()."""
    a = sorted(pagerank(edges_df, n_iter=4).collect())
    b = sorted(pagerank(edges_df.repartition(7), n_iter=4).collect())
    assert a == b


def test_pagerank_mass_conserved(edges_df):
    """Every node has an out-edge, so total rank stays ~1 (up to fp)."""
    total = sum(r["rank"] for r in pagerank(edges_df, n_iter=5).collect())
    assert abs(total - 1.0) < 1e-9


def test_pagerank_ranks_sinks_lower(spark):
    # hub: everything points at h; h spreads its mass back over all three
    # (if h pointed at only one node, that node would inherit h's entire
    # rank and could top it)
    rows = [("a", "h"), ("b", "h"), ("c", "h"),
            ("h", "a"), ("h", "b"), ("h", "c"),
            ("b", "a"), ("c", "b")]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r.node: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    assert got["h"] == max(got.values())


# -- triangle counting --------------------------------------------------------

from git_prov_spark.graph import triangle_counts  # noqa: E402

# K4 minus edge {a,d}, plus pendant e: triangles {a,b,c} and {b,c,d}
TRI_EDGES = [("a", "b"), ("a", "c"), ("b", "c"),
             ("b", "d"), ("c", "d"), ("d", "e")]


def _py_triangles(edges):
    """Brute-force third implementation: simple undirected graph, count
    triangles per node by neighbor-set intersection."""
    nbr = {}
    for s, d in edges:
        if s == d:
            continue
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    out = {}
    for v, ns in nbr.items():
        t = sum(len(nbr[a] & nbr[b]) > 0 and b in nbr[a]
                for i, a in enumerate(sorted(ns))
                for b in sorted(ns)[i + 1:])
        deg = len(ns)
        lcc = 2.0 * t / (deg * (deg - 1)) if deg >= 2 else None
        out[v] = (deg, t, lcc)
    return out


def test_triangle_counts_known_graph(spark):
    df = spark.createDataFrame(TRI_EDGES, "src string, dst string")
    got = {r.node: (r.degree, r.n_tri, r.lcc)
           for r in triangle_counts(df).collect()}
    assert got == {
        "a": (2, 1, 1.0), "b": (3, 2, 2.0 / 3.0), "c": (3, 2, 2.0 / 3.0),
        "d": (3, 1, 1.0 / 3.0), "e": (1, 0, None),
    }


def test_triangle_counts_matches_bruteforce(spark):
    """Pseudo-random graph (hash-derived, no RNG) vs the pure-Python
    neighbor-intersection reference."""
    edges = [(f"n{(i * 7) % 23}", f"n{(i * i + 3) % 23}")
             for i in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    want = _py_triangles(edges)
    got = {r.node: (r.degree, r.n_tri, r.lcc)
           for r in triangle_counts(df).collect()}
    assert got == want


def test_triangle_counts_ignores_direction_multiplicity_loops(spark):
    noisy = TRI_EDGES + [("b", "a"), ("a", "b"), ("c", "c"), ("d", "c")]
    a = sorted(triangle_counts(
        spark.createDataFrame(TRI_EDGES, "src string, dst string")).collect())
    b = sorted(triangle_counts(
        spark.createDataFrame(noisy, "src string, dst string")).collect())
    assert a == b


def test_triangle_counts_partitioning_invariant(spark):
    df = spark.createDataFrame(TRI_EDGES * 3, "src string, dst string")
    a = sorted(triangle_counts(df).collect())
    b = sorted(triangle_counts(df.repartition(7)).collect())
    assert a == b


def test_triangle_counts_no_cartesian(spark):
    df = spark.createDataFrame(TRI_EDGES, "src string, dst string")
    plan = (triangle_counts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# coreness


def _py_coreness(edge_list):
    """Exact coreness by the textbook min-degree peel: repeatedly pop a
    minimum-degree node; its coreness is the running maximum of the
    degrees seen at pop time (k never decreases along the peel)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    core, k = {}, 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


def test_coreness_known_graph(spark):
    from git_prov_spark.graph import coreness

    # K4 (coreness 3 each) + a path attached (coreness 1) + pendant
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
             ("b", "d"), ("c", "d"),            # K4
             ("d", "e"), ("e", "f"),            # path
             ("g", "a")]                        # pendant on the core
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.coreness for r in coreness(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3,
                   "e": 1, "f": 1, "g": 1}


def test_coreness_matches_exact_peel_random(spark):
    import random

    from git_prov_spark.graph import coreness

    rng = random.Random(23)
    edges = list({tuple(sorted((rng.randrange(40), rng.randrange(40))))
                  for _ in range(160)})
    edges = [(f"n{a}", f"n{b}") for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.coreness for r in coreness(df).collect()}
    assert got == _py_coreness(edges)


def test_coreness_direction_multiplicity_selfloop_invariant(spark):
    from git_prov_spark.graph import coreness

    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [("b", "a"), ("a", "b"), ("a", "a")]
    x = sorted(map(tuple, coreness(
        spark.createDataFrame(base, "src string, dst string")).collect()))
    y = sorted(map(tuple, coreness(
        spark.createDataFrame(noisy, "src string, dst string")).collect()))
    assert x == y == [("a", 2), ("b", 2), ("c", 2)]


def test_components_sync_exact_on_small_graph(spark):
    from git_prov_spark.graph import components_sync

    edges = [("a", "b"), ("b", "c"),            # comp min a
             ("x", "y"),                         # comp min x
             ("p", "q"), ("q", "r"), ("r", "p"),  # comp min p
             ("z", "z")]                         # self-loop only: dropped
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.label for r in components_sync(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x",
                   "p": "p", "q": "p", "r": "p"}


def test_components_sync_matches_pointer_jumping(spark):
    import random

    from git_prov_spark.graph import components_sync
    from git_prov_spark.operators import connected_components

    rng = random.Random(31)
    edges = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
             for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    sync = {r.node: r.label for r in components_sync(df, 16).collect()}
    jump = {r.node: r.component for r in connected_components(
        df, a="src", b="dst").collect()}
    assert sync == jump


def test_ppr_concentrates_mass_near_seeds(spark):
    from git_prov_spark.graph import pagerank_personalized

    # two 3-cliques joined by one bridge edge; seed in clique 1
    edges = []
    for grp, names in ((1, ["a", "b", "c"]), (2, ["x", "y", "z"])):
        for i in names:
            for j in names:
                if i != j:
                    edges.append((i, j))
    edges += [("c", "x"), ("x", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r["rank"] for r in pagerank_personalized(
        df, ["a"], n_iter=8).collect()}
    # every clique-1 node outranks every clique-2 node
    assert min(got["a"], got["b"], got["c"]) > max(
        got["x"], got["y"], got["z"])
    # seed holds the maximum
    assert got["a"] == max(got.values())


def test_ppr_mass_conserved_and_partition_invariant(spark):
    from git_prov_spark.graph import pagerank_personalized

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = pagerank_personalized(df, ["a", "d"], n_iter=6)
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-9  # every node has an out-edge
    x = sorted(map(tuple, ranks.collect()))
    y = sorted(map(tuple, pagerank_personalized(
        df.repartition(5), ["a", "d"], n_iter=6).collect()))
    assert x == y
