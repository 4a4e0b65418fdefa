"""Sequence mining over keyed event streams: Markov transition matrix.

User behavior models (churn prediction, funnel repair, session
simulators) start from the first-order Markov chain of event types:
how often does `view` lead to `purchase` vs `error`? This operator
builds the empirical transition-count matrix and its row-normalized
probabilities from the raw event log.

Shape: one window shuffle on the sequence key (lag(event_type) over
(ts, id)) followed by a groupBy on (prev, next) — both standard
hash-partitioned steps with map-side partial aggregation; the output
is |event_type|² rows regardless of input volume, so the result is
broadcast-sized at any scale.

Probabilities are reported as integer parts-per-million computed with
pure INTEGER arithmetic (``count * 1_000_000 DIV row_total``) — no
float division anywhere, so any engine replaying the same counts
matches bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_matrix", "session_paths", "last_touch_attribution"]


def transition_matrix(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Empirical first-order transition counts and ppm-probabilities
    of ``state_col`` per ``key_col`` sequence (ordered by
    ``order_cols``; each key's first event has no predecessor and is
    excluded). Returns ``(prev_state, next_state, transitions,
    prob_ppm)``."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    steps = (
        df.select(
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .filter(F.col("prev_state").isNotNull())
    )
    counts = steps.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("transitions")
    )
    # The per-prev total re-windows over the already-tiny counts table
    # (|states|² rows), so this second window is driver-cheap while
    # keeping the whole computation declarative.
    return counts.withColumn(
        "prob_ppm",
        F.expr(
            "(transitions * 1000000) DIV sum(transitions)"
            " OVER (PARTITION BY prev_state)"
        ).cast("bigint"),
    )


def session_paths(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    gap_minutes: int = 30,
    max_len: int = 5,
    sep: str = ">",
) -> DataFrame:
    """Frequent session paths: sessionize each key's stream by an
    inactivity gap, render each session's first ``max_len`` states as
    a delimited path string, and count sessions per path — the
    behavioral fingerprint ("view>view>click>purchase") funnels and
    session simulators are built from, one step up from the memoryless
    transition matrix.

    Shape: the gap flag (lag) and the session id (running sum of
    flags) share ONE ``partitionBy(key).orderBy(order)`` exchange; the
    per-session path is a bounded ``slice(sort_array(collect_list(
    struct(order..., state))), 1, max_len)`` — memory per session is
    capped by the session's row count and the output by ``max_len``
    — and the final count is a hash aggregate over path strings whose
    cardinality is |states|^max_len at worst, in practice tiny.
    Truncation to ``max_len`` is explicit and deliberate: paths are a
    reporting artifact, and an unbounded concat over a crawler session
    with 10⁶ events would put the whole session in one string.

    Returns ``(path, n_sessions)``.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.asc(c) for c in order_cols])
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(F.col(ts_col)).over(w)
    )
    new_session = F.when(
        gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    session_id = F.sum(new_session).over(
        Window.partitionBy(key_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.col(state_col).alias("__v"),
    )
    per_session = (
        df.withColumn("__session", session_id)
        .groupBy(key_col, "__session")
        .agg(F.sort_array(F.collect_list(ordered)).alias("__steps"))
        .select(
            F.concat_ws(
                sep,
                F.expr(f"transform(slice(__steps, 1, {int(max_len)}), s -> s.__v)"),
            ).alias("path")
        )
    )
    return per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )


def last_touch_attribution(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    conversion: str = "purchase",
    lookback_days: int = 7,
) -> DataFrame:
    """Last-touch attribution: each ``conversion`` event credits the
    key's most recent NON-conversion event within ``lookback_days``,
    else ``'none'`` — the marketing primitive behind "what drives
    checkout".

    Two ignore-nulls ``last()`` columns (touch type and touch time)
    over ONE key window — both are filled from the same qualifying
    row, so they cannot disagree — then a constant-time lookback test
    on the microsecond lattice. One key exchange total; the returned
    frame is one row per conversion event.

    Returns the conversion rows with ``attributed_to`` added.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(state_col) != F.lit(conversion)
    touch_type = F.last(F.when(is_touch, F.col(state_col)), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    touched = (
        df.withColumn("__lt_type", touch_type)
        .withColumn("__lt_ts", touch_ts)
        .filter(F.col(state_col) == F.lit(conversion))
    )
    within = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__lt_ts"))
    ) <= F.lit(int(lookback_days) * 86_400 * 1_000_000)
    return touched.withColumn(
        "attributed_to",
        F.when(F.col("__lt_ts").isNotNull() & within, F.col("__lt_type")).otherwise(
            F.lit("none")
        ),
    ).drop("__lt_type", "__lt_ts")
