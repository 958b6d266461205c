"""Distributed global ranking — row_number/ntile without a global sort.

Spark executes ``Window.orderBy(...)`` with no partition key as a SINGLE
task holding the whole input; fine over calendar- or distinct-value-sized
frames, fatal over an entity dimension (10⁸–10⁹ customers/users at
100 TB). These helpers produce the identical rank numbers with only
scalable machinery:

1. ``repartitionByRange`` on the order key — a range exchange whose
   boundaries come from a distributed sample; partition p holds keys
   strictly below partition p+1's,
2. a per-partition ``row_number`` (hash-partitioned window over the
   range-partition id — every task ranks only its own slice),
3. a broadcast of the per-partition row counts, prefix-summed into rank
   offsets (a P-row window — P = number of partitions, never data-sized),
4. ``global rank = partition offset + local rank``.

The order key must be a TOTAL order (add a unique tiebreak column —
bare metrics tie run-dependently) so the rank is well-defined no matter
where the range sampler drops partition boundaries.

ntile(k) is then a closed form of the global rank: SQL ntile gives the
first ``N mod k`` buckets ``ceil(N/k)`` rows and the rest ``floor(N/k)``
(ISO/IEC 9075; Spark and DuckDB agree), reproduced exactly by
``ntile_from_rank`` — so quartile/decile segmentation over an entity
dimension never pays a one-task sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFF = "__rank_off"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rk",
    num_partitions: int = 32,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` — same numbers, no
    single-task WindowExec. ``order_cols`` must define a total order
    (unique tiebreak included); ties across a range boundary would
    otherwise rank nondeterministically."""
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    # spark_partition_id() is projected BEFORE the window's hash exchange,
    # so it captures the range-partition id each row landed in. The
    # tagged frame feeds TWO consumers (the local window and the
    # per-partition counts) and Catalyst does not CSE unpersisted
    # subtrees — without materialization the whole upstream pipeline
    # (scan + aggregate + range exchange) executes twice per rank, and a
    # caller ranking three metrics paid NINE fact scans (measured on
    # rfm_customer_segments' plan). Checkpointing also freezes the
    # range-partition assignment, making the pid column immune to
    # re-evaluation nondeterminism.
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    local = tagged.withColumn(_LOCAL, F.row_number().over(w_local))
    counts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID, F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, (F.col(_OFF) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFF)
    )


def global_running_max_prev(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out: str,
    num_partitions: int = 32,
) -> DataFrame:
    """``max(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — the strictly-preceding running max
    (the sweep-line primitive under skyline/Pareto queries) without a
    single-task WindowExec: range-partition on the order key, run the
    intra-partition running max per slice, and stitch across slices with
    a cumulative max over the P per-partition maxima (a P-row window).
    Rows in partition p all order strictly after partition p-1's (the
    order key must be UNIQUE per row — range boundaries between equal
    keys would otherwise leak a same-key value into the "strictly
    preceding" carry). First global row gets NULL, like the empty frame.
    """
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    # same two-consumer materialization rationale as global_row_number
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = tagged.withColumn("_loc", F.max(value_col).over(w_local))
    summ = tagged.groupBy(_PID).agg(F.max(value_col).alias("_pm"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    carry = summ.select(_PID, F.max("_pm").over(w_off).alias("_carry"))
    return (
        local.join(F.broadcast(carry), _PID)
        # greatest() skips NULLs: first slice has NULL carry, first row
        # of a slice has NULL local max — NULL only when both are (the
        # true empty-preceding-frame case)
        .withColumn(out, F.greatest(F.col("_loc"), F.col("_carry")))
        .drop(_PID, "_loc", "_carry")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out: str,
    num_partitions: int = 32,
) -> DataFrame:
    """``sum(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW)`` without a single-task WindowExec — the
    cumulative-distribution primitive (equi-depth boundaries, CDF
    sampling). Same stitch as global_running_max_prev, with the slice
    carry ADDED to the inclusive intra-slice prefix sum. Order key must
    be unique per row. NULL values are skipped exactly like ``sum()
    OVER`` skips them: a row whose global prefix holds no non-NULL value
    gets NULL; otherwise NULLs contribute 0 (so an all-NULL intra-slice
    prefix still surfaces the carry from earlier slices)."""
    ranged = df.repartitionByRange(num_partitions, *order_cols)
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged.withColumn("_loc", F.sum(value_col).over(w_local))
    summ = tagged.groupBy(_PID).agg(F.sum(value_col).alias("_ps"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    # carry stays NULL when NO preceding slice has a non-NULL value —
    # needed to reproduce sum() OVER's "NULL until the first value" edge
    carry = summ.select(_PID, F.sum("_ps").over(w_off).alias("_carry"))
    return (
        local.join(F.broadcast(carry), _PID)
        # NULL iff both sides are NULL (empty-of-values global prefix);
        # else NULLs act as 0, exactly the skip-NULLs window semantics
        .withColumn(
            out,
            F.when(
                F.col("_loc").isNull() & F.col("_carry").isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(F.col("_loc"), F.lit(0))
                + F.coalesce(F.col("_carry"), F.lit(0))
            ),
        )
        .drop(_PID, "_loc", "_carry")
    )


def ntile_from_rank(rk: Column, n_total: Column, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` as a closed form of the 1-based global rank:
    with q = N div tiles and r = N mod tiles, buckets 1..r hold q+1 rows
    and buckets r+1..tiles hold q. Matches Spark and DuckDB bit-for-bit
    (both implement the standard's front-loaded remainder)."""
    q = (n_total / tiles).cast("long")
    r = n_total % tiles
    head = r * (q + 1)  # rows living in the q+1-sized buckets
    return (
        F.when(rk <= head, ((rk - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rk - head - 1) / F.greatest(q, F.lit(1))).cast("long") + 1)
        .cast("long")
    )
