"""Streaming mergeable per-key rollup — the incremental twin of any
``groupBy(key).agg(count/sum/max/min)`` census.

A live pipeline can maintain every DECOMPOSABLE aggregate with one
state row per key: count and sum merge by addition, max/min by
greatest/least — so each micro-batch costs one map-combined batch
aggregate plus one key-join against the store, and the store never
grows past key cardinality. This is the streaming half of censuses
like RFM (``inventory_pipeline.q_customer_rfm``): the batch query's
per-customer aggregate is exactly a (count, max, sum) triple, so the
streamed state after the last batch is bit-identical to the batch
aggregate — which is how the declared twin query SHARES the batch
oracle.

Protocol: the versioned-parquet exactly-once discipline of
``streaming/dimension.py`` (same as ``streaming/locf.py`` and
``streaming/transitions.py``): state lands in ``__version =
batch_id + 1`` partitions via dynamic partition overwrite; a replayed
batch re-reads its parent version and atomically rewrites its own, so
the rollup is exactly-once without a table format. Batch-boundary
placement CANNOT change the result — the merges are commutative and
associative — which is a strictly stronger determinism contract than
the order-respecting split the transition counter needs.

Scale: state is one row per key; each batch pays one map-combined
aggregate over the batch plus a key-partitioned merge join (the state
side is read back from its own partition layout). Nothing accumulates
beyond key cardinality, and no window appears anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.streaming.dimension import (
    _latest_version_below,
    _write_version,
    _VERSION_COL,
)

__all__ = [
    "rollup_apply_batch",
    "rollup_foreach_batch",
    "rollup_state_result",
]

# spec: (out_col, kind, sql_expr) — kind governs both the per-batch
# aggregate and the cross-batch merge.
_KINDS = ("count", "sum", "max", "min")


def _batch_agg(kind: str, expr: str, out: str):
    col = F.expr(expr)
    if kind == "count":
        return F.count(col).cast("bigint").alias(out)
    if kind == "sum":
        return F.sum(col).cast("bigint").alias(out)
    if kind == "max":
        return F.max(col).cast("bigint").alias(out)
    if kind == "min":
        return F.min(col).cast("bigint").alias(out)
    raise ValueError(f"unknown rollup kind {kind!r} (expected {_KINDS})")


def _merge(kind: str, out: str):
    a, b = F.col(f"__new_{out}"), F.col(f"__old_{out}")
    if kind in ("count", "sum"):
        return (
            F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        ).cast("bigint").alias(out)
    if kind == "max":
        return F.greatest(a, b).alias(out)  # greatest() skips NULLs
    if kind == "min":
        return F.least(a, b).alias(out)
    raise ValueError(f"unknown rollup kind {kind!r}")


def _integral_exprs(batch: DataFrame, specs: list[tuple[str, str, str]]) -> bool:
    """True when every spec expression resolves to an integral type on
    ``batch`` (schema-only analysis, no job). Integral inputs make the
    per-row union merge below bit-identical to the historical
    aggregate-then-join merge; fractional/decimal inputs could round
    differently (cast-after-sum vs per-row cast), so they keep the
    join path."""
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    try:
        dtypes = batch.select(
            *[F.expr(expr) for _o, _k, expr in specs]
        ).schema.fields
    except Exception:  # unresolvable here -> let the join path report it
        return False
    return all(isinstance(f.dataType, integral) for f in dtypes)


def _row_contrib(kind: str, expr: str, out: str):
    """Per-row partial for the union merge — chosen so that one
    ``groupBy(key)`` over (batch rows ∪ state rows) reproduces the
    aggregate-then-merge result EXACTLY for integral inputs:
    ``count``/``sum`` merge with NULL→0 coalescing (as ``_merge``
    does), ``max``/``min`` via NULL-skipping max/least semantics."""
    col = F.expr(expr)
    zero = F.lit(0).cast("bigint")
    if kind == "count":
        return (
            F.when(col.isNotNull(), F.lit(1).cast("bigint"))
            .otherwise(zero)
            .alias(out)
        )
    if kind == "sum":
        return F.coalesce(col.cast("bigint"), zero).alias(out)
    if kind in ("max", "min"):
        return col.cast("bigint").alias(out)
    raise ValueError(f"unknown rollup kind {kind!r} (expected {_KINDS})")


def _merge_agg(kind: str, out: str):
    col = F.col(out)
    if kind in ("count", "sum"):
        return F.sum(col).cast("bigint").alias(out)
    if kind == "max":
        return F.max(col).cast("bigint").alias(out)
    if kind == "min":
        return F.min(col).cast("bigint").alias(out)
    raise ValueError(f"unknown rollup kind {kind!r}")


def rollup_apply_batch(
    batch: DataFrame,
    *,
    state_path: str,
    key_col: str,
    specs: list[tuple[str, str, str]],
    batch_id: int,
) -> int:
    """Merge one micro-batch into the per-key rollup store; returns the
    version written (``batch_id + 1``). Replaying the same ``batch_id``
    re-reads the same parent state and overwrites the same state
    partition — idempotent under ``foreachBatch`` replay.

    Plan shape (r13, guide §2.4): for integral spec expressions the
    merge is ONE union + ONE map-combined ``groupBy(key)`` — batch rows
    become per-row partials, state rows ride along as already-merged
    partials — one Exchange per micro-batch instead of the historical
    three (batch pre-aggregate + both SortMergeJoin FullOuter sides).
    Map-side combine still collapses each task to key cardinality
    before the exchange, so the shuffled bytes are unchanged at scale;
    only the extra shuffle rounds go. A NULL-key group merges
    correctly because groupBy has exactly one NULL group (the property
    the old path needed ``eqNullSafe`` for). Non-integral expressions
    keep the aggregate-then-join path: per-row bigint casts could
    round differently than cast-after-sum."""
    spark = batch.sparkSession
    target = int(batch_id) + 1
    out_cols = [out for out, _k, _e in specs]
    try:
        parent = _latest_version_below(spark, state_path, target)
    except FileNotFoundError:
        # No committed state version: correct for batch 0 (and the
        # lost-checkpoint degradation every streaming state backend
        # shares — absent durable state means "no history").
        merged = batch.groupBy(key_col).agg(
            *[_batch_agg(kind, expr, out) for out, kind, expr in specs]
        )
        _write_version(merged, state_path, target)
        return target
    state = spark.read.parquet(state_path).filter(
        F.col(_VERSION_COL) == parent
    )
    if _integral_exprs(batch, specs):
        # State rows join the union with count/sum values coalesced to
        # 0 (a stored NULL means "nothing accumulated", exactly what
        # _merge's coalesce did); max/min keep NULL so the NULL-skip
        # semantics match greatest/least.
        zero = F.lit(0).cast("bigint")
        state_part = state.select(
            F.col(key_col),
            *[
                (
                    F.coalesce(F.col(out), zero).alias(out)
                    if kind in ("count", "sum")
                    else F.col(out).cast("bigint").alias(out)
                )
                for out, kind, _e in specs
            ],
        )
        batch_part = batch.select(
            F.col(key_col),
            *[_row_contrib(kind, expr, out) for out, kind, expr in specs],
        )
        merged = batch_part.unionByName(state_part).groupBy(key_col).agg(
            *[_merge_agg(kind, out) for out, kind, _e in specs]
        )
    else:
        batch_state = batch.groupBy(key_col).agg(
            *[_batch_agg(kind, expr, f"__new_{out}") for out, kind, expr in specs]
        )
        old = state.select(
            F.col(key_col).alias("__old_key"),
            *[F.col(c).alias(f"__old_{c}") for c in out_cols],
        )
        # NULL-SAFE key equality: a plain equi-join never matches
        # NULL == NULL, so a null-key group would duplicate instead of
        # merging (one partial state row per null-bearing batch) and
        # break the bit-identical-to-batch contract — the batch
        # groupBy has ONE null group.
        merged = batch_state.join(
            old,
            batch_state[key_col].eqNullSafe(F.col("__old_key")),
            "full_outer",
        ).select(
            F.coalesce(batch_state[key_col], F.col("__old_key")).alias(
                key_col
            ),
            *[_merge(kind, out) for out, kind, _e in specs],
        )
    _write_version(merged, state_path, target)
    return target


def rollup_foreach_batch(
    *,
    state_path: str,
    key_col: str,
    specs: list[tuple[str, str, str]],
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` adapter for :func:`rollup_apply_batch`."""

    def inner(batch: DataFrame, batch_id: int) -> None:
        rollup_apply_batch(
            batch,
            state_path=state_path,
            key_col=key_col,
            specs=specs,
            batch_id=batch_id,
        )

    return inner


def rollup_state_result(spark: SparkSession, state_path: str) -> DataFrame:
    """The latest committed per-key rollup — after the final batch,
    bit-identical to the batch ``groupBy(key).agg(...)`` over the full
    stream (the merges are commutative+associative, so batch-boundary
    placement cannot matter)."""
    from prioritizing_event_processing_with_apache_kafka_spark.streaming.dimension import (
        _versions,
    )

    versions = _versions(spark, state_path)
    if not versions:
        raise FileNotFoundError(f"no committed rollup versions under {state_path}")
    return (
        spark.read.parquet(state_path)
        .filter(F.col(_VERSION_COL) == versions[-1])
        .drop(_VERSION_COL)
    )
