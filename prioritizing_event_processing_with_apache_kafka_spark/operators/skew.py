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
sessions — already handles the join-side equivalent at runtime;
``salted_join`` below is the explicit fallback for the cases AQE can't
split: one key so hot a single sort-merge partition still drowns, or
a session forced to run without AQE.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "key_concentration"]

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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit salted equi-join: split every hot key of the (large,
    skewed) ``left`` side into ``salt_buckets`` shuffle sub-keys and
    replicate the (smaller) ``right`` side once per sub-key, so no
    single reducer carries a whole hot key.

    The salt comes from ``spark_partition_id() % salt_buckets`` — rows
    of one key scatter across sub-keys in proportion to where they
    already live, no unique column needed. ANY salt assignment yields
    the identical join result (the salt only co-partitions; each left
    row still meets every matching right row exactly once via the
    replica carrying its salt value), so the operator is oracle-exact
    against the plain join.

    Cost model: shuffle volume grows by ``salt_buckets ×`` the right
    side only — the deliberate trade when the right side is modest and
    the left side's hot key is the bottleneck. Supported ``how``:
    ``inner`` and ``left`` (the replicated side must be the lookup
    side; right/full-outer would duplicate unmatched right rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (right side is "
            f"replicated), got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    replicated = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt_buckets - 1})"))
    )
    return salted_left.join(replicated, [*keys, "__salt"], how).drop("__salt")


def key_concentration(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Per-group key-concentration report: Herfindahl–Hirschman index
    plus the single largest key's share — the MEASUREMENT side of skew
    mitigation (``salted_agg``/``salted_join`` above are the cure; this
    tells you which groups need it, and whether a routing config sends
    one user's firehose into one priority bucket).

    Shares are integer parts-per-million (``cnt * 1e6 DIV total``) and
    the HHI is the sum of their squares — parts-per-trillion on a pure
    BIGINT lattice (max 1e12 when one key owns the whole group), so the
    report hash-matches across engines. HHI reading: 1e12 = monopoly,
    1e12 / n = perfectly even over n keys.

    Two hash aggregations — ``(group, key)`` then ``group`` — both with
    map-side partial combine; the second input is already one row per
    distinct key, so no hot-key reducer exists even when the underlying
    data is maximally skewed. Output is one row per group.

    Returns ``(group_col, n_rows, n_keys, top_share_ppm, hhi_pptr)``.
    """
    per_key = df.groupBy(group_col, key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    shared = per_key.withColumn(
        "__share_ppm",
        F.expr(f"__cnt * 1000000 DIV sum(__cnt) OVER (PARTITION BY {group_col})"),
    )
    return shared.groupBy(group_col).agg(
        F.sum("__cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("__share_ppm").cast("bigint").alias("top_share_ppm"),
        F.sum(F.col("__share_ppm") * F.col("__share_ppm"))
        .cast("bigint")
        .alias("hhi_pptr"),
    )
