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
