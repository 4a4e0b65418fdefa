"""As-of (point-in-time) join: for each left row, the latest right row
at-or-before (backward) or earliest at-or-after (forward) its timestamp,
per key.

Spark has no native as-of join; the naive encodings are an inequality
join (BroadcastNestedLoopJoin — quadratic, driver-melting at scale) or a
per-key ``applyInPandas`` merge_asof (Python hot path). This operator is
the scale-correct composition instead:

1. union the two sides into one frame, tagged with a side marker;
2. one shuffle: ``Window.partitionBy(keys).orderBy(ts, side)``;
3. ``last(right_col, ignorenulls=True)`` over the running frame carries
   the most recent right-side values forward onto each left row.

Cost is a single hash shuffle on the join keys plus a per-key sort —
the same price as one sort-merge join, with **zero** join explosion and
no Python. The side marker's sort position at equal timestamps encodes
inclusive/strict semantics exactly (see ``_side_order``).

At 100 TB the shuffle is on the as-of key (e.g. user_id), so skew
follows key skew — salting does not apply (the window needs the whole
key ordered), but AQE's skew handling and a high shuffle-partition
count keep tasks bounded; per-key state is just the carried right
columns (O(1) memory, unlike a join buffer).

DuckDB's native ``ASOF JOIN`` replays the same semantics for the
oracle. Determinism: when several right rows share (key, ts), the
carried values are the ones from the last row in ``right_tie`` order
(callers supply a unique tie column for a fully deterministic result;
the matched timestamp itself is always deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _side_order(allow_exact: bool) -> tuple[int, int]:
    """(left_marker, right_marker) sort values at equal timestamps.

    Both directions scan with the "match candidates sort at-or-before
    the left row" frame (backward: ts asc; forward: ts desc), so the
    equal-ts rule is direction-independent: inclusive → rights first
    (visible to a left at the same ts), strict → lefts first.
    """
    return (1, 0) if allow_exact else (0, 1)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    right_tie: str | None = None,
    tolerance_seconds: float | None = None,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    timestamp (``matched_ts_col``) and ``right_cols`` values (NULL when
    no right row qualifies — LEFT-join semantics).

    ``tolerance_seconds`` nulls out matches farther than the given gap,
    mirroring pandas ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or []

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    l_side, r_side = _side_order(allow_exact)

    left_types = dict(left.dtypes)
    right_types = dict(right.dtypes)
    if right_tie is not None and right_tie not in right_types:
        raise ValueError(f"right_tie column {right_tie!r} not in right frame")
    # Order by the raw tie column (any orderable type) — casting to a
    # fixed numeric type would silently NULL a string tie column and
    # lose the promised determinism.
    tie_type = right_types[right_tie] if right_tie is not None else "double"
    tie_col = F.col(right_tie) if right_tie is not None else F.lit(0.0).cast("double")
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *[F.col(c).alias(f"__l_{c}") for c in left_payload],
        # Right payload rides along only on right rows.
        *[F.lit(None).cast(right_types[c]).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right_types[right_ts]).alias("__r_ts"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(0).alias("__is_left"),
        tie_col.alias("__tie"),
        *[F.lit(None).cast(left_types[c]).alias(f"__l_{c}") for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
    )

    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    asc = direction == "backward"
    order = [
        F.col("__ts").asc() if asc else F.col("__ts").desc(),
        F.col("__side").asc(),
        F.col("__tie").asc_nulls_last(),
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last("__r_ts", ignorenulls=True).over(w).alias(matched_ts_col)] + [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols
    ]
    out = (
        unioned.select(
            *keys,
            "__ts",
            "__is_left",
            *[f"__l_{c}" for c in left_payload],
            *carried,
        )
        .filter(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *[F.col(f"__l_{c}").alias(c) for c in left_payload],
            matched_ts_col,
            *right_cols,
        )
    )
    # SQL join semantics: NULL never equals NULL. Window partitioning
    # groups NULL keys together, so a NULL-keyed left row would pick up
    # NULL-keyed right rows' values — null the carried columns instead
    # (LEFT-join no-match shape, matching the DuckDB ASOF oracle and
    # pandas merge_asof).
    null_key = F.lit(False)
    for k in keys:
        null_key = null_key | F.col(k).isNull()
    out = out.withColumn(matched_ts_col, F.when(~null_key, F.col(matched_ts_col)))
    for c in right_cols:
        out = out.withColumn(c, F.when(~null_key, F.col(c)))
    if tolerance_seconds is not None:
        gap: Column = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(matched_ts_col))
        ) / F.lit(1_000_000.0)
        within = gap <= F.lit(float(tolerance_seconds))
        out = out.withColumn(
            matched_ts_col,
            F.when(within, F.col(matched_ts_col)),
        )
        for c in right_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out
