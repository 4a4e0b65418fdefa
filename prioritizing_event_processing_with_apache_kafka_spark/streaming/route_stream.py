"""Streaming producer path: route a live stream onto topic partitions.

Two shapes, mirroring ``operators/routing.py``'s modes:

- ``route_stream`` — fully **stateless** routing (``spread`` / ``hash``
  modes): pure column expressions, legal in any streaming query plan,
  no state store, no trigger coupling. This is the 100 TB-rate default:
  each task round-robins (or key-hashes) independently, exactly like N
  parallel instances of the reference's partitioner.
- ``routed_foreach_batch`` — **exact per-batch round-robin**: wraps a
  sink function in ``foreachBatch`` and applies ``mode='exact'`` inside
  each micro-batch, so within a batch the distribution is the
  reference's bit-exact counter sequence (counter restarts per batch —
  SURVEY.md §7 "hard parts" #1: same uniformity guarantee, different
  absolute sequence across batches).

The output contract matches Spark's Kafka sink: a ``partition`` column
(plus ``key``/``value``) on the written DataFrame routes each record;
NULL partition delegates to the sink's own partitioner — precisely the
reference's ``UNKNOWN_PARTITION`` fall-through.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from prioritizing_event_processing_with_apache_kafka_spark.operators.routing import route
from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    BucketPriorityConfig,
)

__all__ = ["route_stream", "routed_foreach_batch"]


def route_stream(
    stream_df: DataFrame,
    config: BucketPriorityConfig,
    num_partitions: int,
    *,
    key_col: str = "key",
    topic_col: str | None = None,
    seq_col: str | None = "event_id",
    mode: str = "spread",
) -> DataFrame:
    """Stateless streaming routing (``spread``/``hash`` only — ``exact``
    needs a window, which a continuous stream can't give you without
    ``foreachBatch``).

    ``spread`` mode on a stream needs ``seq_col``, an existing monotonic
    per-source-partition sequence (the Kafka source's ``offset`` column
    is the natural choice) — ``monotonically_increasing_id`` is illegal
    in streaming plans.
    """
    if mode == "exact":
        raise ValueError(
            "mode='exact' requires a bounded batch; use routed_foreach_batch() "
            "for per-micro-batch exact round-robin"
        )
    if mode == "spread" and seq_col is None:
        raise ValueError(
            "mode='spread' on a stream requires seq_col (e.g. the Kafka "
            "source's 'offset' column); use mode='hash' for key-sticky routing"
        )
    return route(
        stream_df,
        config,
        num_partitions,
        key_col=key_col,
        topic_col=topic_col,
        order_col=seq_col if mode == "spread" else None,
        mode=mode,
    )


def routed_foreach_batch(
    config: BucketPriorityConfig,
    num_partitions: int | Callable[[], int],
    sink: Callable[[DataFrame, int], None],
    *,
    key_col: str = "key",
    topic_col: str | None = None,
    order_col: str = "event_id",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper: exact round-robin within each
    micro-batch, then hand the routed batch to ``sink(batch, batch_id)``.

    ``num_partitions`` may be a callable evaluated **per batch** — the
    engine's analog of the reference's layout invalidation on partition-
    count change (``BucketPriorityPartitioner.java:84-94``, P8): point
    it at live topic metadata (e.g. a Kafka AdminClient lookup) and a
    topic scale-out is picked up at the next micro-batch, with the
    memoized layout kernel recomputing only when the count actually
    changes.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        current = num_partitions() if callable(num_partitions) else num_partitions
        routed = route(
            batch_df,
            config,
            current,
            key_col=key_col,
            topic_col=topic_col,
            order_col=order_col,
            mode="exact",
        )
        try:
            sink(routed, batch_id)
        finally:
            # The exact path persists a midframe for the batch's
            # lifetime; a long-running stream would otherwise accrete
            # one cache entry per micro-batch.
            cached = getattr(routed, "_peps_exact_cache", None)
            if cached is not None:
                cached.unpersist()

    return write
