"""Skew-mitigation utilities: salted two-stage aggregation.

A ``groupBy(bucket)`` over a 3-bucket config at 100 TB concentrates the
final merge into 3 reducer tasks. Salting splits each hot key into
``salt_buckets`` sub-keys for the first (parallel) aggregation stage
and re-merges in a second, tiny stage: shuffle 1 carries
``#keys × salt_buckets`` rows per map task (map-side partial agg), and
shuffle 2 only ``#keys × salt_buckets`` rows total.

The salt is ``spark_partition_id() % salt_buckets`` — deterministic for
a fixed partitioning, never touches row values, and needs no unique
column. Only algebraic aggregates (sum/count/min/max) can re-merge;
``salted_agg`` enforces that.

(For joins, AQE's skew-join splitting — on by default in this engine's
sessions — already handles the join-side equivalent at runtime.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

_MERGEABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → ``(input_column, fn)`` with fn in
    {count, sum, min, max}. ``count`` counts rows (input column ignored
    beyond null-safety: use ``"*"``).
    """
    for out, (_, fn) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(
                f"aggregate {fn!r} for {out!r} is not salt-mergeable "
                f"(supported: {sorted(_MERGEABLE)})"
            )
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets)).alias("__salt")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *(
            _MERGEABLE[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        )
    )
    return stage1.groupBy(*keys).agg(
        *(
            _MERGEABLE[fn][1](F.col(f"__p_{out}")).alias(out)
            for out, (_, fn) in aggs.items()
        )
    )
