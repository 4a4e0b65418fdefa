"""Streaming Markov transition counting — the incremental twin of
``operators/sequence.py:transition_matrix``.

The batch operator needs every event of a key in one frame to lag
over; a live pipeline sees the stream in micro-batches, so the
transition that straddles a batch boundary (key's last event of batch
N → first event of batch N+1) is invisible to any within-batch window.
This module keeps one row of state per key — the latest event's state
value — and seeds each batch's lag with it, so boundary transitions
are counted exactly once.

Protocol (the versioned-parquet exactly-once discipline of
``streaming/dimension.py``, same as ``streaming/locf.py``):

- STATE: one row per key (``__last_state``), written as
  ``__version = batch_id + 1`` partitions; an absent store means "no
  history", which is exactly batch 0's seed.
- OUTPUT: per-batch transition COUNTS (``prev_state, next_state, n``)
  land in the batch's own version partition via dynamic partition
  overwrite — a replayed batch atomically replaces its own counts and
  re-reads its parent state, so the total is exactly-once without a
  table format. Counts are written pre-aggregated because the final
  result only ever sums them; the per-batch partition is
  |states|²-bounded, not row-bounded.
- RESULT: sum the per-batch counts and derive row probabilities with
  the SAME integer-ppm arithmetic as the batch operator.

Determinism contract: if micro-batch boundaries respect the order
columns (a time-split file stream), every (prev, next) adjacency of
the full stream is seen exactly once — within a batch by the lag
window, across the boundary by the seed join — so the streamed counts
are bit-identical to the batch ``transition_matrix``, which is how
the declared query shares its hash oracle.

Scale: state is one row per key; each batch pays one key-window
shuffle plus a broadcast seed join (state is #keys rows); the output
write is |states|² rows per batch. Nothing accumulates beyond key
cardinality.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.streaming.dimension import (
    _latest_version_below,
    _versions,
    _write_version,
    _VERSION_COL,
)

__all__ = [
    "transitions_apply_batch",
    "transitions_foreach_batch",
    "transition_counts_result",
]


def transitions_apply_batch(
    batch: DataFrame,
    *,
    state_path: str,
    out_path: str,
    key_col: str,
    state_col: str,
    order_cols: tuple[str, ...],
    batch_id: int,
) -> int:
    """Count one micro-batch's transitions (boundary-seeded) and
    advance the per-key last-state store; returns the version written
    (``batch_id + 1``). Replaying the same ``batch_id`` re-reads the
    same parent state and overwrites the same output and state
    partitions — idempotent under ``foreachBatch`` replay."""
    spark = batch.sparkSession
    target = int(batch_id) + 1
    try:
        parent = _latest_version_below(spark, state_path, target)
        state = (
            spark.read.parquet(state_path)
            .filter(F.col(_VERSION_COL) == parent)
            .select(key_col, "__last_state")
        )
    except FileNotFoundError:
        # No committed state version: correct for batch 0. As with any
        # streaming state backend the store must live on durable
        # storage; a vanished store degrades to "no history" rather
        # than failing — the same contract as a lost checkpoint.
        state = None

    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    lagged = batch.withColumn("__prev_in_batch", F.lag(F.col(state_col)).over(w))
    if state is not None:
        lagged = lagged.join(F.broadcast(state), key_col, "left")
    else:
        state_type = batch.select(F.col(state_col)).schema[0].dataType
        lagged = lagged.withColumn("__last_state", F.lit(None).cast(state_type))
    # Within-batch rows lag normally; each key's FIRST batch row seeds
    # from the store (NULL there too on a never-seen key = no edge).
    counts = (
        lagged.select(
            F.coalesce(F.col("__prev_in_batch"), F.col("__last_state")).alias(
                "prev_state"
            ),
            F.col(state_col).alias("next_state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    _write_version(counts, out_path, target)

    # Advance state: per key, the state value at the greatest order —
    # deterministic when (key, order_cols) is unique, map-side
    # combinable; keys silent this batch carry their old row forward.
    ordered = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(state_col).alias("__v"),
    )
    batch_state = (
        batch.groupBy(key_col)
        .agg(F.max(ordered).alias("__s"))
        .select(key_col, F.col("__s.__v").alias("__last_state"))
    )
    if state is not None:
        carried = state.join(batch_state.select(key_col), key_col, "left_anti")
        batch_state = batch_state.unionByName(carried)
    _write_version(batch_state, state_path, target)
    return target


def transitions_foreach_batch(
    *,
    state_path: str,
    out_path: str,
    key_col: str,
    state_col: str,
    order_cols: tuple[str, ...],
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper around :func:`transitions_apply_batch`."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        transitions_apply_batch(
            batch_df,
            state_path=state_path,
            out_path=out_path,
            key_col=key_col,
            state_col=state_col,
            order_cols=order_cols,
            batch_id=batch_id,
        )

    return apply


def transition_counts_result(
    spark: SparkSession,
    out_path: str,
    *,
    empty_schema: str = "prev_state string, next_state string, n bigint",
) -> DataFrame:
    """Total transition counts across every committed batch plus the
    integer-ppm row probabilities — the exact output contract (and
    arithmetic) of the batch ``transition_matrix``.

    A stream whose every batch carried zero transitions (single-event
    keys only) commits no readable partition — dynamic partition
    overwrite writes nothing for an empty frame — so the store has no
    schema to infer; ``empty_schema`` declares the frame returned in
    that legal-but-empty case (override it for non-string states)."""
    if not _versions(spark, out_path):
        per_batch = spark.createDataFrame([], empty_schema)
    else:
        per_batch = spark.read.parquet(out_path).drop(_VERSION_COL)
    totals = per_batch.groupBy("prev_state", "next_state").agg(
        F.sum("n").cast("bigint").alias("transitions")
    )
    return totals.withColumn(
        "prob_ppm",
        F.expr(
            "(transitions * 1000000) DIV sum(transitions)"
            " OVER (PARTITION BY prev_state)"
        ).cast("bigint"),
    )
