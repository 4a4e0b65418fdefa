"""Event-time telemetry over (routed) streams.

Batch/stream-unified transformations — each function takes a DataFrame
that may be batch or streaming and returns the transformed frame; the
same expressions power the oracle-checked batch analogs in the query
inventory (Structured Streaming's unified semantics make that a real
equivalence, not a coincidence).

Watermarks are applied only when the input is actually streaming, so
the batch twin stays byte-identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bucket_throughput",
    "user_sessions",
    "dedup_within_watermark",
    "interval_join",
]


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    if df.isStreaming and delay is not None:
        return df.withWatermark(ts_col, delay)
    return df


def bucket_throughput(
    routed: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-bucket event counts over tumbling (or sliding) event-time
    windows — the priority dashboard's live feed. Late data beyond the
    watermark is dropped (streaming only)."""
    df = _maybe_watermark(routed, ts_col, watermark)
    win = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        df.groupBy(win.alias("w"), F.col("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "bucket", "n_events")
    )


def user_sessions(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Session windows per user with an inactivity ``gap`` — the
    streaming-native form of the batch sessionization query."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("session_events"))
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "session_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "30 minutes",
    lookahead: str = "0 seconds",
    watermark: str | None = "2 hours",
    right_suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: pair each left row with the right rows
    sharing ``on`` whose timestamp falls in
    ``[left_ts - lookback, left_ts + lookahead]``.

    Batch/stream-unified like the rest of this module. On two streams
    this is a genuine stream-stream join: both sides are watermarked and
    the range predicate doubles as the time-bound condition Structured
    Streaming needs to expire join state — state per key is bounded by
    ``watermark + lookback``, so the join runs indefinitely at
    production rates. Right-side columns are suffixed (self-join safe).
    """
    l_side = _maybe_watermark(left, left_ts, watermark)
    r_side = _maybe_watermark(right, right_ts, watermark)
    r_side = r_side.select(
        *(F.col(c).alias(c + right_suffix) for c in r_side.columns)
    )
    rts = F.col(right_ts + right_suffix)
    lts = F.col(left_ts)
    cond = (
        (F.col(on) == F.col(on + right_suffix))
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
        & (rts <= lts + F.expr(f"INTERVAL {lookahead}"))
    )
    return l_side.join(r_side, cond, how)


def dedup_within_watermark(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming dedup: drop records whose key was already seen
    within the watermark horizon (exactly-once-per-key downstream).
    Falls back to plain ``dropDuplicates`` on batch input."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
