"""global_row_number: value parity with the naive global window + plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from git_prov_spark.operators import global_row_number


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, id long")


def test_matches_naive_global_window(spark):
    import random

    rng = random.Random(11)
    rows = [(f"k{i % 7}", rng.randrange(0, 50), i) for i in range(500)]
    df = _mk(spark, rows)

    got = {
        (r.id): r.seq
        for r in global_row_number(df, ["ts", "id"], "seq").collect()
    }
    w = Window.orderBy("ts", "id")
    want = {
        r.id: r.seq
        for r in df.select("id", F.row_number().over(w).cast("long").alias("seq")).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(1, 501))


def test_deterministic_across_partitionings(spark):
    rows = [("a", i % 13, i) for i in range(300)]
    a = global_row_number(_mk(spark, rows).repartition(3), ["ts", "id"]).collect()
    b = global_row_number(_mk(spark, rows).repartition(11), ["ts", "id"], num_partitions=5).collect()
    assert {(r.id, r.seq) for r in a} == {(r.id, r.seq) for r in b}


def test_empty_input(spark):
    df = _mk(spark, []).where(F.lit(False))
    assert global_row_number(df, ["ts", "id"]).count() == 0


def test_no_single_partition_window(spark):
    df = _mk(spark, [("a", i, i) for i in range(64)])
    out = global_row_number(df, ["ts", "id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan


def test_connected_components_vs_union_find(spark):
    """Property: min-label propagation == classic union-find on random
    graphs (chains, stars, cliques, singleton-free edge soup)."""
    import random

    from git_prov_spark.operators import connected_components

    rng = random.Random(13)
    # 2 trials only: every label-propagation round is a Spark job, so the
    # test budget is rounds (graph diameter), not graph size — one sparse
    # soup (long chains, high diameter) and one dense one (big components)
    for trial, (n_nodes, n_edges) in enumerate([(60, 35), (40, 80)]):
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # union-find oracle
        parent = list(range(n_nodes))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {}
        for x in touched:
            comp = min(y for y in touched if find(y) == find(x))
            want[x] = comp
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.node: r.component
            for r in connected_components(df).collect()
        }
        assert got == want, (trial, edges)


# ---------------------------------------------------------------------------
# z-order


def _py_z(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python(spark):
    from git_prov_spark.operators import z_value_expr

    rows = [(a, b) for a in (0, 1, 7, 255, 65535)
            for b in (0, 2, 64, 40000)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.selectExpr(
        "a", "b", f"cast({z_value_expr('a', 'b')} as bigint) AS z"
    ).collect()}
    assert got == {(a, b): _py_z(a, b) for a, b in rows}


def test_z_value_locality(spark):
    """The property the key exists for: sorting by z clusters BOTH
    dimensions — within any run of consecutive z values, the value
    ranges of a and b are both bounded (unlike a sort on a alone,
    which leaves b unordered)."""
    from git_prov_spark.operators import z_value_expr

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    ordered = df.selectExpr(
        "a", "b", f"cast({z_value_expr('a', 'b')} as bigint) AS z"
    ).orderBy("z").collect()
    # split the z-sorted sequence into 16 equal chunks (the row-group
    # analogy): every chunk must span at most half of each dimension
    chunk = len(ordered) // 16
    for c in range(16):
        part = ordered[c * chunk:(c + 1) * chunk]
        assert max(r.a for r in part) - min(r.a for r in part) <= 16
        assert max(r.b for r in part) - min(r.b for r in part) <= 16


def test_salted_join_equals_plain_join_and_splits_salts(spark):
    from git_prov_spark.operators import salted_join

    # one hot key (90% of rows) + tail keys
    rows = [(i, "hot" if i % 10 else f"k{i}") for i in range(500)]
    left = spark.createDataFrame(rows, "rid long, k string")
    right = (left.select("k").distinct()
             .withColumn("v", F.length("k")))
    got = sorted(map(tuple, salted_join(
        left, right, "k", "rid", n_salt=8).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want
    # the hot key's rows really do spread across many salts
    from git_prov_spark.corpus.hashing import spark_h64
    salts = (left.where(F.col("k") == "hot")
             .selectExpr(f"cast({spark_h64('cast(rid as string)')} % 8 "
                         "as int) AS s")
             .distinct().count())
    assert salts >= 6


def test_ntile_deterministic_under_ties(spark):
    from git_prov_spark.corpus.curate import ntile_per_group

    # all order values equal -> buckets decided purely by id tie-break
    rows = [(f"s{i % 2}", i, 7) for i in range(16)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    a = sorted(map(tuple, ntile_per_group(
        df, "source", "n_chars").collect()))
    b = sorted(map(tuple, ntile_per_group(
        df.repartition(5), "source", "n_chars").collect()))
    assert a == b
    # each group of 8 splits 2/2/2/2
    from collections import Counter
    c = Counter((r[0], r[3]) for r in a)
    assert all(v == 2 for v in c.values())
