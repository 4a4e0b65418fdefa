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

__all__ = ["transition_matrix"]


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
