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


def k_anonymity_audit(
    df: DataFrame,
    *,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity census over a quasi-identifier column set — the
    data-governance audit run before a dataset (or its aggregates)
    leaves a trust boundary: a row is re-identifiable when its
    equivalence class (rows sharing ALL quasi-identifier values) has
    fewer than ``k`` members.

    Two hash aggregates, nothing else: ``GROUP BY qi_cols`` to class
    sizes (map-side combined — the only row-count-scaled exchange),
    then a global fold of the class-size table to one verdict row::

        n_rows           bigint  rows scanned
        n_classes        bigint  distinct quasi-identifier combinations
        min_class_size   bigint  smallest equivalence class
        max_class_size   bigint  largest equivalence class
        classes_at_risk  bigint  classes with size < k
        rows_at_risk     bigint  rows in those classes
        at_risk_ppm      bigint  rows_at_risk·10⁶ DIV n_rows

    NULL is a quasi-identifier value like any other (both engines
    group NULLs together, so the census is engine-exact). The global
    fold is one row via partial aggregation — no funnel: the wide
    shuffle is the class-size aggregate, whose key count is the
    anonymity structure itself.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("__cls_n")
    )
    risky = F.col("__cls_n") < F.lit(int(k))
    return (
        classes.agg(
            F.sum("__cls_n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.min("__cls_n").cast("bigint").alias("min_class_size"),
            F.max("__cls_n").cast("bigint").alias("max_class_size"),
            F.coalesce(F.sum(F.when(risky, 1)), F.lit(0))
            .cast("bigint")
            .alias("classes_at_risk"),
            F.coalesce(F.sum(F.when(risky, F.col("__cls_n"))), F.lit(0))
            .cast("bigint")
            .alias("rows_at_risk"),
        )
        .withColumn(
            "at_risk_ppm",
            F.expr("rows_at_risk * 1000000 DIV n_rows").cast("bigint"),
        )
    )


# Benford expected first-digit shares, parts-per-million: round(log10(1+1/d)·10⁶).
# Fixed public constants (Benford 1938), identical literals in the oracle.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(df: DataFrame, *, value_col: str) -> DataFrame:
    """First-significant-digit census against Benford's law — the
    classic fraud/synthetic-data screen for magnitude-spanning
    positive amounts (a fabricated or truncated feed shows up as a
    first-digit histogram far from ``log10(1 + 1/d)``).

    Rows with ``value >= 1`` participate (sub-unit and non-positive
    values have no stable first digit on the integer path and are
    excluded by contract on both engines). The digit is extracted
    engine-exactly — ``substring(cast(cast(floor(value) as bigint) as
    string), 1, 1)`` — no float log10 anywhere. One hash aggregate to
    the 9-row digit table (map-side combined; the ONLY row-scaled
    exchange), then a 9-row window derives shares.

    Returns one row per observed digit: ``(digit, n, obs_ppm,
    benford_ppm, dev_ppm)`` where ``obs_ppm = n·10⁶ DIV total`` and
    ``dev_ppm = |obs_ppm − benford_ppm|``.
    """
    from pyspark.sql import Window

    digit = F.substring(
        F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(value_col) >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    exp_ppm = F.element_at(
        F.array(*[F.lit(BENFORD_PPM[d]) for d in range(1, 10)]),
        F.col("digit"),
    ).cast("bigint")
    return (
        counts.withColumn("__total", total)
        .withColumn("obs_ppm", F.expr("n * 1000000 DIV __total").cast("bigint"))
        .withColumn("benford_ppm", exp_ppm)
        .withColumn(
            "dev_ppm", F.abs(F.col("obs_ppm") - F.col("benford_ppm")).cast("bigint")
        )
        .select("digit", "n", "obs_ppm", "benford_ppm", "dev_ppm")
    )


def winsorized_stats(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    lo_p: int = 1,
    hi_p: int = 99,
) -> DataFrame:
    """Per-group winsorization report: clip values to the group's exact
    ``percentile_disc`` fences and compare the raw vs winsorized mean —
    the robust-preprocessing step (and its audit) a feature pipeline
    runs before statistics that outliers would dominate.

    The fences come from :func:`..sketches.exact_group_percentiles` —
    the histogram-lattice exact order statistics whose shuffles are
    sized by DISTINCT values, not rows — broadcast back onto the fact
    scan (the fence table is one row per group). Means are reported on
    the integer-micros lattice (``Σ⌊x·10⁶⌋ DIV n``), so the whole
    report is engine-hashable; the fences themselves are actual data
    values (``percentile_disc`` semantics), echoed as micros too.

    Returns one row per group::

        n                bigint  rows with non-NULL value
        lo_cut_micros    bigint  the p{lo_p} fence
        hi_cut_micros    bigint  the p{hi_p} fence
        n_clipped_low    bigint  values below the low fence
        n_clipped_high   bigint  values above the high fence
        mean_micros      bigint  raw mean
        wins_mean_micros bigint  mean after clipping
    """
    if not (0 <= lo_p < hi_p <= 100):
        raise ValueError(f"need 0 <= lo_p < hi_p <= 100, got {lo_p}, {hi_p}")
    from .sketches import exact_group_percentiles

    fences = exact_group_percentiles(
        df, group_col=group_col, value_col=value_col, percentiles=(lo_p, hi_p)
    ).select(
        group_col,
        F.floor(F.col(f"disc_p{lo_p}") * 1_000_000.0)
        .cast("bigint")
        .alias("__lo"),
        F.floor(F.col(f"disc_p{hi_p}") * 1_000_000.0)
        .cast("bigint")
        .alias("__hi"),
    )
    vm = F.floor(F.col(value_col) * 1_000_000.0).cast("bigint")
    clipped = F.least(F.greatest(vm, F.col("__lo")), F.col("__hi"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__vm", vm)
        .join(F.broadcast(fences), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__lo").cast("bigint").alias("lo_cut_micros"),
            F.min("__hi").cast("bigint").alias("hi_cut_micros"),
            F.coalesce(F.sum(F.when(F.col("__vm") < F.col("__lo"), 1)), F.lit(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.coalesce(F.sum(F.when(F.col("__vm") > F.col("__hi"), 1)), F.lit(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.expr("sum(__vm) DIV count(1)").cast("bigint").alias("mean_micros"),
            F.sum(clipped).alias("__wsum"),
        )
        .withColumn(
            "wins_mean_micros", F.expr("__wsum DIV n").cast("bigint")
        )
        .drop("__wsum")
    )


def decile_drift(
    df: DataFrame,
    *,
    group_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Early-vs-late value-distribution drift per group, PSI-style but
    integer-exact: bin the value column by the EARLY half's exact
    decile fences and compare each bin's share across halves — the
    monitoring query that catches a metric's distribution moving under
    a model (new client version, sensor recalibration, fraud wave)
    even when its mean holds still.

    Halves split at the per-group time midpoint ``(min+max) DIV 2`` on
    the micros lattice (deterministic). Fences are the early half's
    exact ``percentile_disc`` p10..p90 — the histogram-lattice path
    (:func:`..sketches.exact_group_percentiles`), so the fence subtree
    is sized by distinct values. Fences come back as one ORDERED
    9-element array per group, broadcast onto a second scan; each row's
    bin is ``Σ 1[v ≥ fence]`` (0..9) via a higher-order fold — no
    windows, no per-row joins. One (group, half, bin) aggregate and a
    group-sized share window later, each row reports both halves'
    parts-per-million share and the signed gap.

    Returns ``(group_col, bin, early_n, late_n, early_ppm, late_ppm,
    gap_ppm)`` with ``gap_ppm = late_ppm − early_ppm``; Σ|gap| per
    group is the drift score (the oracle replays every step, so the
    whole report is hash-exact).
    """
    from .sketches import exact_group_percentiles

    pts = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    mids = pts.groupBy(group_col).agg(
        F.expr(
            f"(min(unix_micros({ts_col})) + max(unix_micros({ts_col}))) DIV 2"
        ).alias("__mid")
    )
    halved = pts.join(F.broadcast(mids), group_col).withColumn(
        "__half",
        F.when(
            F.expr(f"unix_micros({ts_col})") <= F.col("__mid"), F.lit("early")
        ).otherwise(F.lit("late")),
    )
    early = halved.filter(F.col("__half") == "early")
    fences = exact_group_percentiles(
        early,
        group_col=group_col,
        value_col=value_col,
        percentiles=(10, 20, 30, 40, 50, 60, 70, 80, 90),
    ).select(
        group_col,
        F.array(*[F.col(f"disc_p{p}") for p in range(10, 100, 10)]).alias(
            "__fences"
        ),
    )
    binned = halved.join(F.broadcast(fences), group_col).withColumn(
        "__bin",
        F.aggregate(
            "__fences",
            F.lit(0),
            lambda acc, f: acc
            + F.when(F.col(value_col) >= f, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    counts = binned.groupBy(group_col, "__bin").agg(
        F.coalesce(
            F.sum(F.when(F.col("__half") == "early", 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("early_n"),
        F.coalesce(
            F.sum(F.when(F.col("__half") == "late", 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("late_n"),
    )
    from pyspark.sql import Window

    wg = Window.partitionBy(group_col)
    return (
        counts.withColumn("__te", F.sum("early_n").over(wg))
        .withColumn("__tl", F.sum("late_n").over(wg))
        .select(
            group_col,
            F.col("__bin").cast("int").alias("bin"),
            "early_n",
            "late_n",
            F.expr("early_n * 1000000 DIV __te").cast("bigint").alias("early_ppm"),
            F.expr("late_n * 1000000 DIV __tl").cast("bigint").alias("late_ppm"),
            F.expr(
                "late_n * 1000000 DIV __tl - early_n * 1000000 DIV __te"
            )
            .cast("bigint")
            .alias("gap_ppm"),
        )
    )


def two_proportion_audit(
    df: DataFrame,
    *,
    arm_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test between exactly two experiment arms — the
    A/B-test readout (is arm B's conversion rate a real lift or
    noise?). ``success_col`` is a boolean column; the input must carry
    exactly TWO distinct arm values (raises post-aggregation
    otherwise via the NULL-armed output contract below).

    One map-combined aggregate to the 2-row arm table, folded to a
    single verdict row (arms ordered by label so the sign of the lift
    is deterministic). Counts stay integers end-to-end; the pooled
    z-statistic is the textbook expression evaluated ONCE over those
    integers —

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

    — the identical IEEE double expression the oracle replays (round
    6), so the verdict is hash-comparable. Rates are also reported as
    exact ppm integers.

    Returns one row: ``(arm_a, arm_b, n_a, n_b, conv_a, conv_b,
    rate_a_ppm, rate_b_ppm, z_score, significant)`` with
    ``significant = |z| ≥ 1.959964`` (two-sided 5%).
    """
    arms = df.groupBy(F.col(arm_col).alias("__arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(F.when(F.col(success_col), 1)), F.lit(0))
        .cast("bigint")
        .alias("__c"),
    )
    row = F.struct(F.col("__arm"), F.col("__n"), F.col("__c"))
    folded = arms.agg(
        F.min(row).alias("__a"),
        F.max(row).alias("__b"),
        F.count(F.lit(1)).alias("__k"),
    )
    z = F.expr(
        "(CAST(__a.__c AS DOUBLE) / __a.__n - CAST(__b.__c AS DOUBLE) / __b.__n)"
        " / sqrt((CAST(__a.__c + __b.__c AS DOUBLE) / (__a.__n + __b.__n))"
        " * (1.0D - CAST(__a.__c + __b.__c AS DOUBLE) / (__a.__n + __b.__n))"
        " * (1.0D / __a.__n + 1.0D / __b.__n))"
    )
    return folded.select(
        F.when(F.col("__k") == 2, F.col("__a.__arm")).alias("arm_a"),
        F.when(F.col("__k") == 2, F.col("__b.__arm")).alias("arm_b"),
        F.col("__a.__n").alias("n_a"),
        F.col("__b.__n").alias("n_b"),
        F.col("__a.__c").alias("conv_a"),
        F.col("__b.__c").alias("conv_b"),
        F.expr("__a.__c * 1000000 DIV __a.__n").cast("bigint").alias("rate_a_ppm"),
        F.expr("__b.__c * 1000000 DIV __b.__n").cast("bigint").alias("rate_b_ppm"),
        F.when(F.col("__k") == 2, F.round(z, 6)).alias("z_score"),
        F.when(F.col("__k") == 2, F.abs(F.round(z, 6)) >= 1.959964).alias(
            "significant"
        ),
    )
