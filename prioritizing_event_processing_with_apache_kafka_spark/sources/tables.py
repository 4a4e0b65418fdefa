"""Fixture-table loaders for the driver's synthetic TPC-H-ish corpus.

Tables (one parquet file per table under ``/root/testdata/sf*/``):
``region nation customer supplier part orders lineitem events
documents embeddings`` — see /root/repo/TESTDATA.md.

``with_routing_key`` applies the corpus rule from /root/repo/FIXTURES.md
§6: each event gets a routing key ``<bucket>-<event_id>`` with the fixed
event_type→bucket map (error→Platinum, purchase→Gold, rest→Standard),
so bucket-priority queries and relational queries share one corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "TABLE_NAMES",
    "EVENT_TYPE_BUCKET",
    "load_table",
    "load_tables",
    "spread",
    "with_routing_key",
]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# FIXTURES.md §6: priority class per event type.
EVENT_TYPE_BUCKET = {"error": "Platinum", "purchase": "Gold"}
DEFAULT_BUCKET = "Standard"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing timestamp precision.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. We read it as a raw long
    (``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable) and
    truncate to microseconds with exact integer division, matching what
    DuckDB's parquet reader does on the oracle side.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the cluster's parallelism before
    per-row-expensive expressions (higher-order lambdas, shingling,
    per-pair folds).

    Parquet splits at row-group boundaries, so a small input (or one
    written with large row groups) can scan as a single task and
    serialize all downstream per-row work onto one core. At real scale
    the scan yields thousands of splits and this is a **no-op** — only
    when the scan's partition count is below the cluster's parallelism
    (where the corpus is by definition small and the shuffle trivially
    cheap) does it inject a round-robin repartition.

    An explicit ``min_partitions`` is honored verbatim (``0``/``1``
    disables the fan-out rather than silently falling back to the
    cluster default). Both probes (``sparkContext.defaultParallelism``
    and ``df.rdd.getNumPartitions``) are classic-mode APIs with no
    Spark Connect equivalent: under Connect an explicit target
    repartitions unconditionally (the repartition this function exists
    to inject — AQE coalesces it away when the input is already wide),
    and with no explicit target the function is a no-op rather than
    guessing the cluster's parallelism.
    """
    if min_partitions is None:
        try:
            target = df.sparkSession.sparkContext.defaultParallelism
        except Exception:  # Spark Connect: no sparkContext on the client
            return df
    else:
        target = min_partitions
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no RDD bridge on the client
        return df.repartition(target)
    if current < target:
        return df.repartition(target)
    return df


def bucket_for_event_type(event_type_col) -> Column:
    """Native CASE expression for the event_type→bucket map."""
    col = F.col(event_type_col) if isinstance(event_type_col, str) else event_type_col
    expr = F.lit(DEFAULT_BUCKET)
    for event_type, bucket in EVENT_TYPE_BUCKET.items():
        expr = F.when(col == event_type, F.lit(bucket)).otherwise(expr)
    return expr


def with_routing_key(events: DataFrame) -> DataFrame:
    """events + ``key`` = ``<bucket>-<event_id>`` (FIXTURES.md §6)."""
    return events.withColumn(
        "key",
        F.concat_ws("-", bucket_for_event_type("event_type"), F.col("event_id").cast("string")),
    )
