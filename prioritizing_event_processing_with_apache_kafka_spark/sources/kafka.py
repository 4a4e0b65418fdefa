"""Kafka source/sink wrappers for the routed-event path.

No broker ships in the test container, so these builders stop at the
DataFrame/options boundary (unit-testable); against a real cluster they
are the complete produce/consume surface:

- ``kafka_sink_frame`` shapes a routed DataFrame into the Kafka sink
  contract (``key``/``value``/``partition`` columns — Spark's Kafka
  sink honors an explicit ``partition`` column, which is how the
  reference's custom ``Partitioner`` becomes a plain column). Starved
  records (partition -1) are dropped, matching the reference's behavior
  of a -1 partition producing nothing; unroutable records keep a NULL
  partition so the broker-side default partitioner decides, or are
  dropped under ``on_unroutable='discard'`` (already filtered by
  ``route``).
- ``read_bucket_stream`` opens one prioritized per-bucket reader using
  the consumption plan's ``assign`` pruning (``streaming/consume.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    BucketPriorityConfig,
)
from prioritizing_event_processing_with_apache_kafka_spark.streaming.consume import (
    BucketReaderSpec,
    kafka_reader_options,
)

__all__ = [
    "kafka_sink_frame",
    "write_routed_stream",
    "read_bucket_stream",
    "read_bucket_files",
    "use_scheduler_pool",
]


def kafka_sink_frame(
    routed: DataFrame,
    config: BucketPriorityConfig,
    *,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Project a routed DataFrame onto the Kafka sink schema."""
    kept = routed.filter(
        F.col("partition").isNull() | (F.col("partition") >= 0)
    )
    return kept.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
        F.lit(config.topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
    )


def write_routed_stream(
    sink_frame: DataFrame,
    *,
    bootstrap_servers: str,
    checkpoint_location: str,
):
    """``writeStream`` builder for the routed stream (caller ``.start()``s)."""
    return (
        sink_frame.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_location)
    )


def read_bucket_stream(
    spark: SparkSession,
    spec: BucketReaderSpec,
    config: BucketPriorityConfig,
    *,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """One bucket's prioritized reader: Kafka source with the bucket's
    ``assign`` partition list.

    NOTE on scheduler pools: streaming queries capture the thread's
    ``spark.scheduler.pool`` local property at ``.start()`` time, not
    at DataFrame-build time — so this builder deliberately does NOT set
    it (building three bucket readers and then starting them would put
    every query in the last bucket's pool). Call
    ``use_scheduler_pool(spark, spec)`` immediately before each
    query's ``.start()`` instead.
    """
    reader = spark.readStream.format("kafka")
    for key, value in kafka_reader_options(
        spec, config, bootstrap_servers=bootstrap_servers, starting_offsets=starting_offsets
    ).items():
        reader = reader.option(key, value)
    return reader.load()


def use_scheduler_pool(spark: SparkSession, spec: BucketReaderSpec) -> None:
    """Assign the *next* query started from this thread to the bucket's
    fair-scheduler pool — call right before ``.start()`` (see
    ``read_bucket_stream`` note on why the two steps are separate)."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", spec.scheduler_pool)


def read_bucket_files(
    spark: SparkSession,
    spec: BucketReaderSpec,
    config: BucketPriorityConfig,
    *,
    topic_path: str,
    schema: str | None = None,
    streaming: bool = False,
) -> DataFrame:
    """File-backed twin of :func:`read_bucket_stream`: a topic staged as
    hive-partitioned parquet (``partition=N/...`` directories, one per
    Kafka partition) is read through the SAME ``assign`` contract the
    Kafka reader ships to a broker.

    The partition list is parsed back OUT of ``spec.assign_json`` — the
    literal option string ``kafka_reader_options`` would send — and
    applied as a filter on the ``partition`` column. Because that
    column is the dataset's hive-partition key, Catalyst turns the
    filter into PARTITION PRUNING: non-assigned partitions' files never
    enter the scan (the plan's ``PartitionFilters`` carries the in-list
    and the executed FileSourceScan's ``numPartitions`` metric counts
    only assigned directories — ``tests/test_streaming.py`` asserts
    both; note ``df.inputFiles()`` is NOT the proof, it lists the
    relation's full file index before pruning). This is exactly what
    ``assign`` does on a broker: a bucket's query never opens other
    buckets' partitions (``BucketPriorityAssignor.java:92-149`` gives
    each consumer only its bucket's partitions; here the pruning
    happens at plan time instead of subscription time).
    """
    import json as _json

    assign = _json.loads(spec.assign_json(config.topic))
    partitions = assign[config.topic]
    if streaming:
        if schema is None:
            raise ValueError("streaming file source requires an explicit schema")
        df = spark.readStream.schema(schema).parquet(topic_path)
    else:
        df = spark.read.parquet(topic_path)
    return df.filter(F.col("partition").isin(partitions))
