"""Distributed general-purpose operators that Spark has no single primitive for.

`global_row_number` — a global 1..N sequence over a total order WITHOUT the
textbook scale-killer `row_number().over(Window.orderBy(...))` (which plans as
Exchange SinglePartition: every row through one task). Instead:

  1. `repartitionByRange(P, *order)` — sampling-based equal-frequency range
     partitioning: partition i holds a contiguous slice of the total order.
  2. one tiny job counts rows per range partition (P numbers to the driver —
     P is the parallelism level, not data-sized).
  3. cumulative offsets per partition are broadcast back; the final sequence
     is offset[pid] + row_number within the partition — a window PARTITIONED
     by pid, so every partition ranks in parallel.

Cost: one range shuffle + one pid-hash shuffle + a P-row driver exchange.
No stage sees more than one partition's rows in one task, so the plan holds
at any scale (the audit in tools/plan_audit.py rejects partition-less
windows in every shipped query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_grn_pid"


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iters: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in `edges` — component =
    the minimum node id reachable through the undirected edge set.

    DataFrame-native min-label propagation with pointer jumping (no driver
    union-find): each round every node takes the min of (its label, its
    neighbors' labels, its label's label). The neighbor step moves the min
    one hop; the label-of-label step then doubles the distance already
    covered, so convergence is O(log diameter) rounds instead of O(diameter)
    — long alias/near-dup chains cost shuffles logarithmically. Each round
    is two equi-joins + one groupBy on node ids: the plan scales with
    |edges|, never |nodes|².

    Every round ends in an eager `localCheckpoint`: iterative DataFrame
    algorithms otherwise grow the logical plan exponentially (each round
    embeds two copies of the last), and Catalyst analysis time — not the
    data — becomes the bottleneck within ~10 rounds. Checkpointing resets
    the lineage so per-round planning cost is constant. (On a real cluster
    with flaky executors, swap localCheckpoint for a reliable
    `checkpoint()` against the checkpoint dir — same semantics, fault
    tolerant.)
    """
    und = (
        edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .unionByName(edges.select(F.col(b).alias("a"), F.col(a).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            und.join(
                labels.select(F.col("node").alias("b"), F.col("label").alias("nl")),
                "b",
            )
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("nl").alias("neighbor_label"))
        )
        cand = labels.join(neighbor_min, "node", "left").select(
            "node", F.least("label", "neighbor_label").alias("label")
        )
        # pointer jump: label(label(x)) — doubles covered distance per round
        jumped = cand.alias("c").join(
            cand.select(
                F.col("node").alias("label"), F.col("label").alias("ll")
            ).alias("j"),
            "label",
            "left",
        ).select("node", F.least("label", "ll").alias("label"))
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def global_row_number(
    df: DataFrame,
    order_by: list[str],
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + a global 1..N `out_col` following the total order `order_by`.

    `order_by` must be a total order (ties would make the sequence
    nondeterministic — pass a unique tiebreaker column last). The ranged
    input is persisted between the count job and the final job so both see
    the identical partition assignment, then unpersisted lazily.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.asc(c) for c in order_by]
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    # P rows to the driver — bounded by parallelism, never by data size
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long")).where(F.lit(False))
    off_df = spark.createDataFrame(offsets, f"{_PID} int, _grn_offset long")
    w = Window.partitionBy(_PID).orderBy(*cols)
    # the cache stays alive for the returned plan's execution (unpersisting
    # here would recompute `ranged` in the final job; range boundaries are
    # deterministically sampled so that would still be CORRECT with a total
    # order, but pays the input scan twice). Spark's ContextCleaner reclaims
    # the blocks once the plan is garbage-collected.
    return (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(
            out_col,
            (F.col("_grn_offset") + F.row_number().over(w)).cast("long"),
        )
        .drop(_PID, "_grn_offset")
    )


def transitive_closure(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iters: int = 20
) -> DataFrame:
    """(src, dst) for every pair connected by a DIRECTED path of ≥ 1 edges —
    the one-or-more property-path relation (SPARQL `pred+`, commit
    ancestry, derivation chains).

    Path doubling: closure₀ = edges; closureₖ₊₁ = closureₖ ∪ (closureₖ ∘
    closureₖ), so a path of length L is covered after ⌈log₂ L⌉ rounds —
    shuffles scale logarithmically in chain length, never linearly. Each
    round is one self-equi-join + distinct, lineage-truncated with an eager
    localCheckpoint (same rationale as connected_components above); the
    fixpoint test compares counts, one lightweight action per round.

    Size analysis, worth stating precisely: the OUTPUT is O(|closure|) —
    already quadratic in chain length (a 1500-commit line has 1.1 M
    ancestor pairs; that is the relation, not a plan artifact). The
    doubling JOIN's intermediate is Σ_j in(j)·out(j) — cubic on one long
    line (~N³/6 rows pre-dedup; measured: a single 1500-node chain costs
    minutes where 15 chains of 100 cost seconds). This is the classical
    dense-closure trade-off (Valiant): log rounds buy fat intermediates.
    Provenance graphs in practice are MANY moderate chains (per-repo
    histories), where both terms stay small. Callers needing
    reachability-from-a-seed on a deep graph should pre-filter `edges`
    to the seed's weakly-connected region, or iterate delta∘edges
    (linear rounds, flat intermediates) — the SPARQL compiler's constant
    endpoints post-filter the closure and inherit this trade-off.
    """
    closure = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = closure.count()
    for _ in range(max_iters):
        doubled = (
            closure.alias("l")
            .join(
                closure.alias("r"),
                F.col("l.dst") == F.col("r.src"),
            )
            .select(F.col("l.src").alias("src"), F.col("r.dst").alias("dst"))
            .unionByName(closure)
            .distinct()
            .localCheckpoint(eager=True)
        )
        m = doubled.count()
        closure = doubled
        if m == n:
            return closure
        n = m
    raise RuntimeError(
        f"transitive_closure did not converge in {max_iters} doubling rounds "
        f"(covers paths up to length 2^{max_iters})"
    )


def reachable_from(
    edges: DataFrame,
    seed: str,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 100_000,
    hops_per_round: int = 8,
) -> DataFrame:
    """Nodes reachable from the constant `seed` via ≥ 1 directed edges —
    single-column DataFrame (`dst`).

    Semi-naive delta iteration (frontier ∘ edges), NOT path doubling: when
    one endpoint of a `pred+` query is bound, materializing the closure of
    the whole graph to answer a single-seed question is the classical
    scale-killer (transitive_closure's doubling intermediate is ~N³/6 on
    one long chain; its OUTPUT alone is quadratic). Here every intermediate
    is bounded by |reachable(seed)| and the edge relation is only ever
    probed by equi-join on the frontier — at 100 TB that is an
    index-lookup-shaped plan, the same reason Jena ARQ evaluates property
    paths from bound endpoints outward (reference capability:
    services/SparqlService.java:26).

    Rounds are linear in path depth divided by `hops_per_round`: each round
    composes the frontier `hops_per_round` times in ONE lazy plan — the
    frontier side of every hop join is broadcast (a frontier is bounded by
    the reachable set; raise hops_per_round / drop the broadcast for graphs
    whose frontiers outgrow executor memory), so a round is hops_per_round
    map-side joins + ONE shuffle (the round-end dedup + anti-join against
    the reached set) + one checkpoint job. A depth-100 chain costs ~13
    round-trips, each a handful of small stages — not 100 shuffles.
    Reversed queries (constant OBJECT: ancestors) pass the transposed edge
    relation. In-plan multiplicity between round boundaries is bounded by
    out-degree^hops_per_round per frontier node (deduped at the round end);
    keep hops_per_round modest on high-fan-out graphs.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        e.where(F.col("src") == seed).select("dst").distinct()
        .localCheckpoint(eager=True)
    )
    # `reached` accumulates INCREMENTALLY, checkpointed once per round: its
    # lazy plan stays one node deep however many rounds run. Rebuilding it
    # from a list of per-round frontiers made both the anti-join input and
    # the final union grow linearly in round count (quadratic total plan
    # work on deep graphs).
    reached = frontier
    hops = 1
    while hops < max_hops and frontier.take(1):
        batch = frontier
        grown = batch
        for _ in range(min(hops_per_round, max_hops - hops)):
            batch = (
                F.broadcast(batch.alias("f"))
                .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
                .select(F.col("e.dst").alias("dst"))
            )
            grown = grown.unionByName(batch)
            hops += 1
        frontier = (
            grown.distinct()
            .join(reached, "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        reached = (
            reached.unionByName(frontier).localCheckpoint(eager=True)
        )
    return reached.select(F.col("dst").alias(dst))


def global_cumsum(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + the global running sum of `value_col` (inclusive) following the
    total order `order_by` — the same range-partition + per-partition-total
    prefix-offset pattern as global_row_number, so no Exchange
    SinglePartition ever appears: partition totals (P numbers) go to the
    driver, broadcast back as offsets, and each partition cumsums in
    parallel under a pid-partitioned window."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.asc(c) for c in order_by]
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    totals = {
        r[_PID]: r["tot"]
        for r in ranged.groupBy(_PID)
        .agg(F.sum(value_col).alias("tot"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += int(totals[pid] or 0)
    if not offsets:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long")).where(F.lit(False))
    off_df = spark.createDataFrame(offsets, f"{_PID} int, _gcs_offset long")
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        ranged.join(F.broadcast(off_df), _PID)
        .withColumn(
            out_col,
            (F.col("_gcs_offset")
             + F.sum(value_col).over(w)).cast("long"),
        )
        .drop(_PID, "_gcs_offset")
    )


def z_value_expr(c1: str, c2: str, bits: int = 16) -> str:
    """Spark SQL expression interleaving the low ``bits`` bits of two
    non-negative int expressions into a Z-order (Morton) value — the
    multi-dimensional clustering key: sorting the sink by z keeps rows
    close in BOTH dimensions close in file order, so parquet row-group
    min/max pruning works for range predicates on EITHER column (the
    Delta/Iceberg OPTIMIZE ZORDER technique, as a plain column). Built
    as a fixed sum of shift/mask terms — whole-stage codegen, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(
            f"shiftleft(shiftright(cast({c1} as bigint), {i}) & 1, {2 * i})")
        terms.append(
            f"shiftleft(shiftright(cast({c2} as bigint), {i}) & 1, "
            f"{2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def z_value_sql(c1: str, c2: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`z_value_expr` (operator spellings differ:
    `x >> n` / `x << n` instead of shiftright/shiftleft)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({c1} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(
            f"(((CAST({c2} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_col: str, n_salt: int = 8) -> DataFrame:
    """Skew-proof equi-join: a plain shuffle join funnels every row of
    a hot LEFT (fact) key through one reducer task; salting splits each
    key's rows across ``n_salt`` sub-partitions — the salt hashes a
    ROW-DISTINGUISHING column (``salt_col``, e.g. the fact row id;
    hashing the join key itself would give a hot key one salt and
    split nothing) — while the RIGHT (dim) side replicates each row
    n_salt ways, so the join key becomes (key, salt) and no task sees
    more than ~1/n_salt of any hot key. Deterministic (portable hash —
    re-runs place rows identically) and semantically IDENTICAL to
    left.join(right, key): the gate asserts equality. Use when AQE's
    skew-join split can't see the skew (same-stage skew, non-AQE
    sinks); cost = dim side × n_salt, the classic trade."""
    from .corpus.hashing import spark_h64

    salt = F.expr(
        f"cast({spark_h64(f'cast({salt_col} as string)')} "
        f"% {n_salt} as int)")
    lf = left.withColumn("_salt", salt)
    rt = right.withColumn(
        "_salt",
        F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return lf.join(rt, [key, "_salt"]).drop("_salt")
