"""Interval/range join via bin bucketing: point-in-interval matching as
an equi-join instead of a BroadcastNestedLoopJoin.

A naive ``points JOIN intervals ON p.ts >= i.lo AND p.ts < i.hi`` has no
equi-condition, so Spark plans a nested-loop join — O(|points| ×
|intervals|), catastrophic at 100 TB. The standard fix (used by
Databricks' range-join hints and DuckDB's IEJoin) is binning:

1. choose ``bin_width`` ≥ the maximum interval length;
2. each point lands in exactly one bin (``floor(epoch / width)``);
3. each interval explodes into its covered bins (≤ 2 rows when the
   width ≥ the interval length);
4. hash equi-join on the bin id, then re-check the exact range.

Each (interval, point) match surfaces exactly once (the point's single
bin meets one exploded interval row), so no dedup pass is needed. The
join is a plain shuffled hash join on an integer key: partition-
parallel, AQE-skew-handled, whole-stage codegen. Cost is
O(points + intervals·bins_per_interval + matches).

``bin_width`` trades shuffle fan-out (exploded interval rows) against
post-filter selectivity: width ≈ max interval length is optimal when
interval lengths are uniform; for heavily mixed lengths, split
intervals by length class and union the per-class bin joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bin_range_join", "interval_concurrency_peak"]


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bin_width_seconds: int,
) -> DataFrame:
    """All (interval, point) pairs with ``lo <= point_ts < hi``.

    Correct for ANY interval length (``sequence(lo_bin, hi_bin)``
    explodes every covered bin); ``bin_width_seconds`` is purely a
    tuning knob — set it near the typical interval length so most
    intervals explode into ≤ 2 rows.

    Returns the intervals' columns joined with the points' columns
    (callers project/aggregate afterwards).
    """
    width_us = F.lit(1_000_000 * int(bin_width_seconds))
    p = points.withColumn("__bin", F.floor(F.unix_micros(F.col(point_ts)) / width_us))
    lo_bin = F.floor(F.unix_micros(F.col(lo)) / width_us)
    hi_bin = F.floor(F.unix_micros(F.col(hi)) / width_us)
    iv = intervals.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    joined = iv.join(p, on="__bin").filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
    )
    return joined.drop("__bin")


def interval_concurrency_peak(
    intervals: DataFrame,
    *,
    group_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per group, via the
    classic sweep line — the capacity question ("how many orders were
    open at once per priority class?") that a self-join on overlap
    would answer in O(n²).

    Each interval is open on ``[start, end)`` — it contributes +1 at
    ``start_col`` and −1 at ``end_col`` (end-exclusive, so an interval
    closing exactly when another opens does not overlap it; callers
    wanting inclusive ends pass ``end + 1 unit``). Boundaries reduce
    to one row per (group,
    timestamp) BEFORE the ordered window, so the prefix-sum window
    sorts #distinct-boundaries rows, not #intervals. Peak and its
    FIRST attainment time come from one ``max(struct)`` argmax (the
    struct orders by (concurrency, -epoch), so the max carries the
    earliest timestamp among peak rows).

    One union + one hash aggregate + one range shuffle on the group;
    the argmax re-aggregates the (tiny) per-boundary table. Output:
    ``(group_col, peak_open, peak_at)``.
    """
    opens = intervals.select(
        F.col(group_col).alias("__g"),
        F.col(start_col).alias("__t"),
        F.lit(1).cast("bigint").alias("__d"),
    )
    closes = intervals.select(
        F.col(group_col).alias("__g"),
        F.col(end_col).alias("__t"),
        F.lit(-1).cast("bigint").alias("__d"),
    )
    deltas = (
        opens.unionByName(closes)
        .groupBy("__g", "__t")
        .agg(F.sum("__d").alias("__delta"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn(
        "__open", F.sum("__delta").over(w).cast("bigint")
    )
    best = F.max(
        F.struct(
            F.col("__open").alias("o"),
            (-F.unix_micros(F.col("__t").cast("timestamp"))).alias("neg_us"),
        )
    )
    return running.groupBy("__g").agg(
        best.getField("o").alias("peak_open"),
        F.timestamp_micros(-best.getField("neg_us")).alias("peak_at"),
    ).select(
        F.col("__g").alias(group_col), "peak_open", "peak_at"
    )
