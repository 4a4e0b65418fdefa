"""Keyed time-series features: windowed EWMA and rolling z-score.

Event streams feeding a prioritized pipeline need per-key smoothing
(EWMA load/latency features) and anomaly flags (is this hour's volume
out of line with the trailing day?). Both are single-pass window
computations — one range-shuffle per key, no iteration, no state
outside the window frame — so they scale like any other window
aggregate.

Bit-reproducibility: both operators avoid engine-internal streaming
aggregates whose intermediate float order is unspecified
(``stddev``/``avg`` over doubles). The z-score works from *integer*
window sums (exact, order-independent) with one double division and
one sqrt (both IEEE-exact); the EWMA folds an ordered frame list with
powers of α=1/2 (exact binary scalings) in a fixed sequential order.
A DuckDB oracle replaying the same expressions matches hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "windowed_ewma",
    "rolling_zscore",
    "gap_fill_interpolate",
    "rolling_median",
    "time_weighted_mean",
    "cusum_alarm",
    "grouped_ols_trend",
    "m4_downsample",
    "binned_acf",
    "sliding_distinct_counts",
]


def windowed_ewma(
    df: DataFrame,
    *,
    partition_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 10,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average over the trailing
    ``window`` rows per key: ``ewma_t = Σ_k (1/2)^k x_{t-k} / Σ_k (1/2)^k``
    for lag ``k = 0..min(window-1, t)``.

    α is fixed at 1/2 so every weight is an exact binary scaling —
    multiplying a double by 2^-k is lossless, which (with the fixed
    left-to-right fold over the frame list) makes the result
    bit-identical across engines and partitionings. The frame list is
    at most ``window`` elements, so memory per row is bounded.
    ``order_cols`` must be unique per key for a deterministic frame.

    NULL values: rows stay in the frame (a bare ``collect_list``
    would silently DROP them and shift every older value onto the
    wrong lag weight), contribute nothing to numerator or
    denominator, and the remaining weights renormalize — the EWMA of
    the *observed* values at their true lags. A frame of only NULLs
    yields NULL.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    # struct-wrap: collect_list skips NULL elements but keeps structs
    # with a NULL field, preserving lag alignment
    frame = F.collect_list(
        F.struct(F.col(value_col).cast("double").alias("v"))
    ).over(w)
    # element i of the frame (0-based, oldest first) has lag n-1-i
    ewma = F.expr(
        "aggregate(zip_with(__peps_fr, sequence(size(__peps_fr) - 1, 0, -1), "
        "(x, k) -> if(x.v is null, 0.0D, x.v * pow(0.5D, k))), 0.0D, (a, v) -> a + v)"
        " / nullif(aggregate(zip_with(__peps_fr, "
        "sequence(size(__peps_fr) - 1, 0, -1), "
        "(x, k) -> if(x.v is null, 0.0D, pow(0.5D, k))), 0.0D, (a, v) -> a + v), 0.0D)"
    )
    return (
        df.withColumn("__peps_fr", frame)
        .withColumn(out_col, F.round(ewma, 6))
        .drop("__peps_fr")
    )


def rolling_zscore(
    df: DataFrame,
    *,
    partition_col: str = "bucket",
    order_col: str = "hour",
    value_col: str = "n_events",
    window: int = 24,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing z-score per key over an *integer* value column: how far
    is this row's value from the mean of the previous ``window`` rows,
    in units of their population standard deviation?

    The trailing frame **excludes the current row** (the anomaly must
    not influence its own baseline). Variance comes from exact integer
    window sums — ``var = (n·Σx² − (Σx)²) / n²`` — evaluated with one
    double division, so results don't depend on the engine's internal
    stddev accumulation order. Rows are scored only when a full
    ``window`` of history exists and the baseline has nonzero variance
    (a constant baseline has no scale for "how anomalous"); earlier /
    degenerate rows pass through with NULL ``zscore`` and ``anomalous
    = false``.

    Adds ``zscore`` (round 6) and ``anomalous`` (|z| ≥ ``z_threshold``).
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.asc(order_col))
        .rowsBetween(-window, -1)
    )
    x = F.col(value_col).cast("long")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(x).over(w)
    # Squares in DECIMAL, not long: x*x overflows int64 silently (in
    # non-ANSI sessions) once x exceeds ~3e9. decimal(19,0) holds any
    # long; its square is exact up to the decimal(38) cap — beyond
    # that Spark raises/NULLs instead of wrapping, a loud failure.
    xd = x.cast("decimal(19,0)")
    s2 = F.sum(xd * xd).over(w)
    s1d = s1.cast("decimal(19,0)")
    mean = s1.cast("double") / n.cast("double")
    var = (n.cast("decimal(19,0)") * s2 - s1d * s1d).cast("double") / (
        n * n
    ).cast("double")
    z: Column = (x.cast("double") - mean) / F.sqrt(var)
    scored = F.when((n == window) & (var > 0), F.round(z, 6))
    return df.withColumn("zscore", scored).withColumn(
        "anomalous",
        F.coalesce(F.abs(F.col("zscore")) >= F.lit(z_threshold), F.lit(False)),
    )


def gap_fill_interpolate(
    hourly: DataFrame,
    *,
    partition_col: str = "event_type",
    hour_col: str = "hour",
    count_col: str = "n_events",
    value_col: str = "value_cents",
) -> DataFrame:
    """Resample a keyed hourly aggregate onto a dense hour spine and
    fill the gaps: counts become 0, values linearly interpolate between
    the nearest observed neighbors.

    Sparse hourly rollups (only hours with traffic appear) break
    everything downstream that assumes a regular grid — rolling windows
    silently span gaps, EWMA lags misalign, anomaly baselines shrink.
    This is the densify step: per key, the spine runs from that key's
    first to last observed hour (``sequence(min, max, interval 1
    hour)`` exploded — no extrapolation beyond observed support, so
    every gap has both neighbors by construction), a left join marks
    the gaps, and two ignore-nulls windows fetch the bracketing
    observations:

        filled = prev + (next - prev) * (step / gap_hours)

    evaluated in exactly that double order (``value_col`` must be an
    exact integer lattice — cents/micros — so both engines interpolate
    from identical inputs; the lone division is IEEE-exact given
    identical operands, and the result is rounded to 6 places).

    Scale: the spine is bounded by wall-clock span, not data volume
    (a year is 8 760 rows/key), generated map-side from one tiny
    min/max aggregate; the fill windows shuffle once on ``partition_
    col`` — same exchange any per-key rollup already pays. Nothing
    here grows with the 100 TB event count except the upstream hourly
    aggregate, which has already collapsed it.

    Output: ``partition_col, hour, n_events (0 on gaps), filled
    (double), is_gap``.
    """
    mn, mx = F.min(F.col(hour_col)), F.max(F.col(hour_col))
    spine = (
        hourly.groupBy(partition_col)
        .agg(mn.alias("__mn"), mx.alias("__mx"))
        .select(
            partition_col,
            F.explode(
                F.expr("sequence(__mn, __mx, interval 1 hour)")
            ).alias(hour_col),
        )
    )
    joined = spine.join(hourly, [partition_col, hour_col], "left")
    v = F.col(value_col)
    back = (
        Window.partitionBy(partition_col)
        .orderBy(F.asc(hour_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(partition_col)
        .orderBy(F.asc(hour_col))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed_hour = F.when(v.isNotNull(), F.col(hour_col))
    with_brackets = (
        joined.withColumn("__prev_v", F.last(v, ignorenulls=True).over(back))
        .withColumn("__prev_h", F.last(observed_hour, ignorenulls=True).over(back))
        .withColumn("__next_v", F.first(v, ignorenulls=True).over(fwd))
        .withColumn("__next_h", F.first(observed_hour, ignorenulls=True).over(fwd))
    )
    step = F.expr(f"timestampdiff(HOUR, __prev_h, {hour_col})").cast("double")
    gap = F.expr("timestampdiff(HOUR, __prev_h, __next_h)").cast("double")
    prev_d = F.col("__prev_v").cast("double")
    next_d = F.col("__next_v").cast("double")
    filled = F.when(v.isNotNull(), v.cast("double")).otherwise(
        prev_d + (next_d - prev_d) * (step / gap)
    )
    return with_brackets.select(
        partition_col,
        hour_col,
        F.coalesce(F.col(count_col), F.lit(0)).cast("bigint").alias(count_col),
        F.round(filled, 6).alias("filled"),
        v.isNull().alias("is_gap"),
    )


def rolling_median(
    df: DataFrame,
    *,
    partition_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 5,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact trailing-``window`` median of ``value_col`` per key — the
    robust (outlier-immune) counterpart to the EWMA feature; median
    smoothing is the standard despiker for sensor/metric streams.

    The median is computed EXPLICITLY — sort the frame's values and
    index the middle (averaging the two middles for even frames) —
    rather than through an engine ``median``/``percentile`` aggregate,
    so the result is defined by IEEE arithmetic alone and any engine
    (the DuckDB oracle replays the same sorted-list indexing) matches
    bit-exact. The frame is a bounded ROWS window (<= ``window``
    doubles), so materializing it as an array is O(window) per row —
    the same cost an exact windowed median needs in any engine.

    NULL contract: the frame is the trailing ``window`` ROWS, but NULL
    values inside it do NOT participate in the median — the median is
    taken over the frame's non-null values (Spark's ``collect_list``
    drops NULL elements; the DuckDB oracle mirrors this with an
    explicit ``list_filter``). A frame whose values are all NULL
    yields a NULL median. This is stated, not accidental: a despiker
    should ignore missing samples, not let one NULL shift the index.

    One range-shuffle on ``partition_col``; no iteration, no state.
    """
    frame = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    # collect_list drops NULL elements by definition — that IS the
    # documented contract (non-null values of the trailing frame).
    vals = F.sort_array(F.collect_list(F.col(value_col)).over(frame))
    n = F.size(vals)
    mid_hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    odd = F.element_at(vals, ((n + 1) / 2).cast("int"))
    even = (F.element_at(vals, (n / 2).cast("int")) + mid_hi) / F.lit(2.0)
    return df.withColumn(
        out_col,
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, odd)
        .otherwise(even),
    )


def time_weighted_mean(
    df: DataFrame,
    *,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
) -> DataFrame:
    """Per-key time-weighted mean of ``value_col`` — each observation
    weighted by how long it REMAINED the latest one (seconds until the
    key's next event; the key's final observation carries zero holding
    time and only contributes if it is the only one). This is the TWAP
    aggregation feature stores use when raw event means would
    over-weight bursts.

    Exactness: holding times are integer epoch-second differences and
    values enter as integer micros, so numerator and denominator are
    exact BIGINTs; the returned table exposes both (the caller — and
    the oracle — divides on whatever lattice it wants). Rows for keys
    with a single event degenerate to weight 0 and are reported with
    NULL mean.

    One window shuffle (lead) + one groupBy on the same key — AQE
    coalesces the second exchange since partitioning is unchanged.

    Returns ``(partition_col, weighted_micros, held_seconds,
    twap_micros)``.
    """
    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    # Hold time = floor of the MICROSECOND difference to the next
    # event, not a difference of per-timestamp second truncations —
    # the two disagree whenever events straddle a second boundary
    # (0.9s -> 1.1s holds 0 whole seconds, not 1). The floor is
    # integer DIV, never float division + cast (inexact doubles can
    # round across an integer boundary).
    us = F.unix_micros(F.col(ts_col))
    v_micros = F.floor(F.col(value_col) * F.lit(1_000_000.0)).cast("bigint")
    per_row = (
        df.select(
            F.col(partition_col),
            v_micros.alias("__vm"),
            F.coalesce(F.lead(us).over(w) - us, F.lit(0)).alias("__hold_us"),
        )
        .withColumn("__h", F.expr("__hold_us DIV 1000000"))
        .select(
            partition_col,
            (F.col("__vm") * F.col("__h")).alias("__wv"),
            F.col("__h"),
        )
    )
    agg = per_row.groupBy(partition_col).agg(
        F.sum("__wv").cast("bigint").alias("weighted_micros"),
        F.sum("__h").cast("bigint").alias("held_seconds"),
    )
    # Integer division, NOT double-divide-then-cast: Spark's double->
    # bigint cast truncates while DuckDB's rounds, so the ratio must
    # stay on the integer lattice end-to-end (DIV here, // there).
    twap = F.when(
        F.col("held_seconds") > 0,
        F.expr("weighted_micros DIV held_seconds"),
    )
    return agg.select(
        partition_col, "weighted_micros", "held_seconds",
        twap.alias("twap_micros"),
    )


def cusum_alarm(
    df: DataFrame,
    *,
    partition_col: str = "bucket",
    order_col: str = "hour",
    value_col: str = "n_events",
    reference_col: str = "ref_level",
    alarm_threshold_col: str = "alarm_h",
) -> DataFrame:
    """One-sided (upward) CUSUM change-point statistic per key — the
    sequential drift detector behind "this bucket's volume stepped up
    and STAYED up", which a rolling z-score (a point-anomaly flag)
    structurally cannot see.

    The textbook recurrence ``S_t = max(0, S_{t-1} + (x_t - k))`` looks
    iterative, but it has a closed form over prefix sums: with
    ``P_t = Σ_{i<=t} (x_i - k)`` and ``P_0 = 0``,

        ``S_t = P_t - min(0, min_{j<=t} P_j)``

    (the running reset floor is the lowest prefix ever seen, clamped at
    the empty prefix 0). Both pieces are ordinary cumulative window
    aggregates over ONE ``partitionBy(key).orderBy(t)`` sort — a single
    range shuffle, no iteration, no state, valid at any history length.

    ``reference_col`` carries the per-row allowance ``k`` and
    ``alarm_threshold_col`` the decision bound ``h`` (both computed by
    the caller on the integer lattice — e.g. ``k = mean + slack`` from
    a calibration window), so when ``x``, ``k``, ``h`` are integers the
    whole statistic is exact BIGINT arithmetic and hash-comparable.

    Adds ``cusum`` (=S_t) and ``alarm`` (S_t > h) to the input rows.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.col(value_col) - F.col(reference_col)
    prefix = F.sum(dev).over(w)
    # min(prefix) OVER the same frame needs prefix materialized first
    # (nested window functions are illegal), so stage it as a column;
    # the running-min window is the SAME spec `w`.
    staged = df.withColumn("__p", prefix.cast("bigint"))
    return (
        staged.withColumn(
            "__floor",
            F.least(F.lit(0).cast("bigint"), F.min("__p").over(w)),
        )
        .withColumn("cusum", (F.col("__p") - F.col("__floor")).cast("bigint"))
        .withColumn("alarm", F.col("cusum") > F.col(alarm_threshold_col))
        .drop("__p", "__floor")
    )


def grouped_ols_trend(
    df: DataFrame,
    *,
    partition_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key least-squares trend of ``value_col`` over time — the
    "is this user's spend drifting up or down" feature, fitted exactly
    from four integer moments instead of an iterative solver.

    x is whole DAYS since the key's own first event (keying x to the
    group keeps the moments small and the arithmetic overflow-safe;
    the slope is translation-invariant so the answer is unchanged),
    y is integer cents. The OLS slope is the exact rational

        ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``

    and both halves are emitted as BIGINTs, plus ``slope_ppm`` =
    ``num * 1e6 DIV den`` (truncated integer division — Spark ``DIV``
    and DuckDB ``//`` agree on negatives, both toward zero) so a
    downward drift is an exact negative integer, not a float. Keys
    with fewer than 2 distinct days have no time spread (den = 0) and
    report NULL slope.

    One window exchange on the key (the per-key epoch min) feeding a
    groupBy on the SAME key — the moments reduce map-side. Overflow
    envelope: |num| ≤ n²·max_day·max_cents — int64-safe past 10⁶ rows
    × 10⁴ days × 10⁴ cents per key; beyond that, coarsen x upstream.

    Returns ``(partition_col, n, sum_x, sum_y, sxy_num, sxx_den,
    slope_ppm)``.
    """
    staged = df.select(
        F.col(partition_col),
        F.expr(
            f"(unix_micros({ts_col}) - min(unix_micros({ts_col}))"
            f" OVER (PARTITION BY {partition_col})) DIV {86_400 * 1_000_000}"
        ).alias("__x"),
        F.floor(F.col(value_col) * F.lit(100.0)).cast("bigint").alias("__y"),
    )
    agg = staged.groupBy(partition_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("sum_x"),
        F.sum("__y").cast("bigint").alias("sum_y"),
        F.sum(F.col("__x") * F.col("__y")).cast("bigint").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("__sxx"),
    )
    num = (F.col("n") * F.col("__sxy") - F.col("sum_x") * F.col("sum_y")).cast(
        "bigint"
    )
    den = (F.col("n") * F.col("__sxx") - F.col("sum_x") * F.col("sum_x")).cast(
        "bigint"
    )
    return agg.select(
        partition_col,
        "n",
        "sum_x",
        "sum_y",
        num.alias("sxy_num"),
        den.alias("sxx_den"),
    ).withColumn(
        "slope_ppm",
        F.when(
            F.col("sxx_den") > 0,
            F.expr("(sxy_num * 1000000) DIV sxx_den"),
        ).cast("bigint"),
    )


def m4_downsample(
    df: DataFrame,
    *,
    series_col: str,
    ts_col: str,
    value_col: str,
    bin_minutes: int = 60,
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    (series, time bin) keep the four value-defining anchor points —
    first, last, min, max — which is exactly the set a line-chart
    renderer needs for a pixel-error-free drawing of the full series.

    One ``groupBy`` aggregate with map-side partial combine — the
    canonical scale shape: a 100 TB series collapses to
    ``n_series × n_bins`` rows in a single exchange. Anchor points are
    selected with min/max over ``struct`` columns so every tie is
    broken deterministically (first/last: by ts then value — equal
    timestamps resolve to the smaller/larger value; min/max: by value
    then ts — the earliest row attaining the min, the latest attaining
    the max), making the output a pure function of the data and
    hash-oracle-able in any engine.

    NULL values are excluded from the frame (the NULL contract is
    explicit — both the operator and its oracle filter them, so the
    bin statistics describe observed points only). Bins are labeled by
    their start on the integer-micros lattice.

    Returns ``(series_col, bin_start, n_rows, first_ts, first_value,
    last_ts, last_value, min_value, min_ts, max_value, max_ts)``.
    """
    if bin_minutes < 1:
        raise ValueError(f"bin_minutes must be >= 1, got {bin_minutes}")
    bin_us = int(bin_minutes) * 60_000_000
    ts = F.col(ts_col)
    v = F.col(value_col)
    pts = df.filter(v.isNotNull() & ts.isNotNull()).select(
        F.col(series_col),
        F.timestamp_micros(
            F.expr(f"unix_micros({ts_col}) DIV {bin_us} * {bin_us}")
        ).alias("bin_start"),
        ts.alias("__ts"),
        v.alias("__v"),
    )
    by_ts = F.struct(F.col("__ts"), F.col("__v"))
    by_v = F.struct(F.col("__v"), F.col("__ts"))
    return pts.groupBy(series_col, "bin_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(by_ts).getField("__ts").alias("first_ts"),
        F.min(by_ts).getField("__v").alias("first_value"),
        F.max(by_ts).getField("__ts").alias("last_ts"),
        F.max(by_ts).getField("__v").alias("last_value"),
        F.min(by_v).getField("__v").alias("min_value"),
        F.min(by_v).getField("__ts").alias("min_ts"),
        F.max(by_v).getField("__v").alias("max_value"),
        F.max(by_v).getField("__ts").alias("max_ts"),
    )


def binned_acf(
    df: DataFrame,
    *,
    series_col: str,
    ts_col: str,
    value_col: str,
    bin_minutes: int = 60,
    lags: tuple[int, ...] = (1, 2, 3, 24),
) -> DataFrame:
    """Sample autocorrelation of each series at the given lags, computed
    over the time-binned mean signal — the seasonality/persistence
    detector a metrics platform runs to decide forecast models and
    alert baselines (lag-24 on hourly bins = daily seasonality).

    Two-stage plan with the M4 shape: the ONLY row-count-scaled
    exchange is the (series, bin) hash aggregate (map-side combined)
    producing each bin's integer-micros mean ``v = Σ⌊value·10⁶⌋ DIV n``
    — everything after is bin-count-sized (bounded by the time horizon,
    not the data volume). Per series the bins form an ordered signal;
    the standard sample ACF at lag k is read off exactly:

        acf_k = Σᵢ (vᵢ − μ)(vᵢ₋ₖ − μ) / Σᵢ (vᵢ − μ)²

    with μ = S/n the true mean. Multiplying through by n² clears the
    rational: each term becomes ``(n·vᵢ − S)·(n·vᵢ₋ₖ − S)`` — exact
    integer arithmetic carried in ``decimal(38,0)`` (Spark) / HUGEINT
    (the oracle), immune to float summation order. The result is
    reported as ``acf{k}_ppm = num·10⁶ DIV den`` (both engines truncate
    integer division toward zero, verified), in [−10⁶, 10⁶].

    Missing bins are NOT gap-filled: the signal is the sequence of
    OBSERVED bins in time order (documented contract; compose with
    ``gap_fill_interpolate`` upstream when calendar spacing matters).
    Series with zero variance (den = 0) report NULL acf.

    Returns one row per series: ``(series_col, n_bins, plus one
    acf{k}_ppm column per lag)``.
    """
    if bin_minutes < 1:
        raise ValueError(f"bin_minutes must be >= 1, got {bin_minutes}")
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lags must be positive, got {lags!r}")
    bin_us = int(bin_minutes) * 60_000_000
    bins = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            F.col(series_col),
            F.expr(f"unix_micros({ts_col}) DIV {bin_us}").alias("__bin"),
        )
        .agg(
            F.expr(
                f"sum(floor({value_col} * 1000000.0)) DIV count(1)"
            ).alias("__v")
        )
    )
    ws = Window.partitionBy(series_col)
    wo = Window.partitionBy(series_col).orderBy("__bin")
    dec = "decimal(38,0)"
    staged = (
        bins.withColumn("__n", F.count(F.lit(1)).over(ws))
        .withColumn("__s", F.sum("__v").over(ws))
        .withColumn(
            "__c",
            (F.col("__n") * F.col("__v") - F.col("__s")).cast(dec),
        )
    )
    for k in lags:
        staged = staged.withColumn(f"__lag{k}", F.lag("__c", k).over(wo))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.col("__c") * F.col("__c")).alias("__den"),
    ]
    for k in lags:
        aggs.append(F.sum(F.col("__c") * F.col(f"__lag{k}")).alias(f"__num{k}"))
    out = staged.groupBy(series_col).agg(*aggs)
    for k in lags:
        out = out.withColumn(
            f"acf{k}_ppm",
            F.when(
                F.col("__den") > 0,
                F.expr(f"CAST((__num{k} * 1000000) DIV __den AS BIGINT)"),
            ).cast("bigint"),
        )
    return out.select(
        series_col, "n_bins", *[f"acf{k}_ppm" for k in lags]
    )


def sliding_distinct_counts(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    bin_minutes: int = 60,
    window_bins: int = 24,
) -> DataFrame:
    """EXACT distinct keys per sliding window ("active users in the
    trailing 24 h, hourly") — the op naive plans get catastrophically
    wrong at scale: a distinct-count window aggregate buffers every
    key per frame, re-scanning per window is W scans, and even the
    textbook presence fan-out multiplies the shuffle by W (measured
    6x wall at 100x before this design).

    This is the interval-delta (sweep-line) formulation, O(presence)
    with NO W-factor anywhere:

    1. collapse the fact table to the DISTINCT (key, bin) presence
       table — the only row-scaled exchange, map-side combinable;
    2. per key, each presence covers the window interval
       ``[bin, bin+W−1]``; consecutive presences closer than W overlap,
       so a per-key ordered window merges them into disjoint covered
       intervals (gap-flag cumulative — one key-partitioned window over
       presence-sized data);
    3. each merged interval emits two delta rows (``start:+1``,
       ``end+1:−1``); one bin-sized aggregate nets them, and a single
       cumulative sum over the bin spine (bounded by the time horizon,
       not data volume) reads off every window's exact count.

    The DuckDB oracle deliberately replays the NAIVE fan-out spec
    (presence × W, dedup, count) — hash equality proves the sweep-line
    plan computes exactly the textbook definition.

    Windows are labeled by their END bin start (micros lattice) and
    reported only inside observed support (``window_end ≤ max bin``,
    count > 0); a window's frame is bins ``[end−W+1, end]``.

    Returns ``(window_end timestamp, active_keys bigint)`` — the exact
    ground truth its HLL twin (``sketches.py:hll_sliding_distinct``)
    is audited against.
    """
    if bin_minutes < 1:
        raise ValueError(f"bin_minutes must be >= 1, got {bin_minutes}")
    if window_bins < 1:
        raise ValueError(f"window_bins must be >= 1, got {window_bins}")
    bin_us = int(bin_minutes) * 60_000_000
    W = int(window_bins)
    presence = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("__k"),
            F.expr(f"unix_micros({ts_col}) DIV {bin_us}").alias("__bin"),
        )
        .distinct()
    )
    wk = Window.partitionBy("__k").orderBy("__bin")
    grouped = presence.withColumn(
        "__new",
        F.when(
            F.col("__bin") - F.lag("__bin").over(wk) >= W, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("__grp", F.sum("__new").over(wk))
    intervals = grouped.groupBy("__k", "__grp").agg(
        F.min("__bin").alias("__s"),
        (F.max("__bin") + F.lit(W - 1)).alias("__e"),
    )
    bounds = presence.agg(
        F.min("__bin").alias("__mn"), F.max("__bin").alias("__mx")
    )
    deltas = (
        intervals.join(F.broadcast(bounds))
        .select(
            F.col("__s").alias("__win"),
            F.lit(1).alias("__d"),
            "__mx",
        )
        .unionByName(
            intervals.join(F.broadcast(bounds)).select(
                (F.least(F.col("__e"), F.col("__mx")) + 1).alias("__win"),
                F.lit(-1).alias("__d"),
                "__mx",
            )
        )
        .filter(F.col("__win") <= F.col("__mx"))
        .groupBy("__win")
        .agg(F.sum("__d").cast("bigint").alias("__net"))
    )
    # Cumulative sum over the bin spine: bounded by the horizon (a year
    # of hourly bins is 8 760 rows), so the single-partition window is
    # a deliberate, sized choice — not a data-scaled funnel.
    spine = bounds.select(
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("__win")
    )
    wcum = Window.orderBy("__win").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(deltas, "__win", "left")
        .withColumn(
            "active_keys",
            F.sum(F.coalesce(F.col("__net"), F.lit(0))).over(wcum),
        )
        .filter(F.col("active_keys") > 0)
        .select(
            F.timestamp_micros(F.expr(f"__win * {bin_us}")).alias(
                "window_end"
            ),
            F.col("active_keys").cast("bigint").alias("active_keys"),
        )
    )
