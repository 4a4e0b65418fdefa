"""As-of (point-in-time) join: for each left row, the latest right row
at-or-before (backward) or earliest at-or-after (forward) its timestamp,
per key.

Spark has no native as-of join; the naive encodings are an inequality
join (BroadcastNestedLoopJoin — quadratic, driver-melting at scale) or a
per-key ``applyInPandas`` merge_asof (Python hot path). This operator is
the scale-correct composition instead:

1. union the two sides into one frame, tagged with a side marker;
2. one shuffle: ``Window.partitionBy(keys).orderBy(ts, side)``;
3. one ``last(struct(right_ts, right_cols), ignorenulls=True)`` over
   the running frame carries the most recent right ROW forward onto
   each left row (a single struct, not per-column carries — those
   would mix values from different right rows when a right column is
   legitimately NULL).

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
    # Output columns are keys + left columns + matched_ts_col +
    # right_cols: a collision would emit duplicate names and fail (or
    # mislabel) downstream — reject it up front.
    collisions = [
        c
        for c in [matched_ts_col, *right_cols]
        if c in left_payload or c == left_ts or c in keys
    ]
    if collisions:
        raise ValueError(
            f"output column collision with the left frame: {collisions}; "
            "rename via matched_ts_col/right-side aliases"
        )
    # A NULL right timestamp can never qualify as an as-of match, but
    # nulls-first ordering would let such a row's payload be carried
    # onto left rows — drop them before the union.
    right = right.filter(F.col(right_ts).isNotNull())
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
    # The right payload travels as ONE struct per right row, carried by
    # a single last(ignorenulls=True): per-column carries would mix
    # values from DIFFERENT right rows whenever a right column is
    # legitimately NULL (the most recent non-null of each column
    # independently — a row that never existed; pandas merge_asof and
    # DuckDB ASOF both return the matched row's NULL instead).
    r_struct = F.struct(
        F.col(right_ts).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_struct_type = right.select(r_struct.alias("x")).schema[0].dataType
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *[F.col(c).alias(f"__l_{c}") for c in left_payload],
        # Right payload rides along only on right rows.
        F.lit(None).cast(r_struct_type).alias("__r_all"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(0).alias("__is_left"),
        tie_col.alias("__tie"),
        *[F.lit(None).cast(left_types[c]).alias(f"__l_{c}") for c in left_payload],
        r_struct.alias("__r_all"),
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
    match = F.last("__r_all", ignorenulls=True).over(w)
    out = (
        unioned.select(
            *keys,
            "__ts",
            "__is_left",
            *[f"__l_{c}" for c in left_payload],
            match.alias("__m"),
        )
        .filter(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *[F.col(f"__l_{c}").alias(c) for c in left_payload],
            F.col("__m.__rt").alias(matched_ts_col),
            *[F.col(f"__m.{c}").alias(c) for c in right_cols],
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
