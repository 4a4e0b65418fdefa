"""Declarative data-quality constraint audit (Deequ-style).

A training-data pipeline gates every ingest batch on a constraint
suite — completeness, uniqueness, referential integrity, ranges,
domain membership — before the batch is allowed downstream (the
pattern popularized by AWS Deequ / Great Expectations). This module
evaluates a whole suite in ONE pass over the fact table plus one
anti-join per referential constraint, and returns a long-format
verdict table the caller can alert on or join into a run ledger.

Scale design: every scalar metric folds into a single ``agg`` over
the scanned table — Catalyst computes all of them in one job with
map-side partial aggregation, so the audit costs one scan regardless
of how many constraints it carries. Referential-integrity counts are
LEFT ANTI joins aggregated to one row (shuffle on the key, no data
movement beyond the keys at the exchange). Nothing collects to the
driver; the result is a DataFrame of one row per constraint.

Monetary/double metrics are reported on the integer-micros lattice
(``CAST(FLOOR(x * 1e6) AS BIGINT)``) so the verdict table is
hash-comparable across engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``name`` labels the output row, ``observed``
    is an aggregate Column producing a BIGINT metric, and
    ``max_allowed`` is the inclusive bound — the audit derives
    ``passed = observed <= max_allowed`` post-aggregation."""

    name: str
    observed: Column
    max_allowed: int


def micros(col: Column) -> Column:
    """Project a double onto the integer-micros lattice (floor)."""
    return F.floor(col * F.lit(1_000_000.0)).cast("bigint")


def violation_count(predicate: Column) -> Column:
    """Aggregate: number of rows where ``predicate`` holds (the
    constraint VIOLATION predicate — 0 means the check passes)."""
    return F.coalesce(
        F.sum(F.when(predicate, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
    ).cast("bigint")


def constraint_audit(
    df: DataFrame,
    checks: list[Check],
    anti_joins: list[tuple[str, DataFrame, str, str]] = (),
) -> DataFrame:
    """Evaluate ``checks`` in one aggregation pass over ``df`` plus one
    LEFT ANTI join per referential constraint in ``anti_joins`` (each a
    ``(name, dim_df, fact_key, dim_key)`` tuple counting fact rows whose
    key has no match in the dimension). Returns a DataFrame
    ``(check, observed, passed)`` with one row per constraint, ordered
    as given (scalar checks first, then anti-joins)."""
    aggs = [c.observed.alias(c.name) for c in checks]
    scalar = df.agg(*aggs)
    ref_rows = []
    for name, dim, fact_key, dim_key in anti_joins:
        orphans = (
            df.select(F.col(fact_key).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                dim.select(F.col(dim_key).alias("__k")),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
        )
        ref_rows.append((name, orphans))

    # Stack the single scalar row into long format: one struct per
    # check, exploded — stays a narrow one-row shuffle.
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(c.name).alias("observed"),
                (F.col(c.name) <= F.lit(c.max_allowed)).alias("passed"),
            )
            for c in checks
        ]
    )
    out = scalar.select(F.explode(pairs).alias("r")).select(
        "r.check", "r.observed", "r.passed"
    )
    for name, orphans in ref_rows:
        out = out.unionByName(
            orphans.select(
                F.lit(name).alias("check"),
                F.col("observed"),
                (F.col("observed") <= F.lit(0)).alias("passed"),
            )
        )
    return out
