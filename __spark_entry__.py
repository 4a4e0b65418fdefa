"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship routing query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the declared inventory from
``prioritizing_event_processing_with_apache_kafka_spark.inventory``
(each Spark query paired with a DuckDB-runnable ANSI-SQL oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prioritizing_event_processing_with_apache_kafka_spark import (
    inventory,
    inventory_pipeline,
    inventory_tpch,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: route sf0.001 events through the bucket-priority
    engine and report the per-(bucket, partition) distribution."""
    return inventory.q_route_distribution(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        **inventory.QUERIES,
        **inventory_tpch.TPCH_QUERIES,
        **inventory_pipeline.PIPELINE_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted for engine-specific
    sketches and other non-SQL-expressible ops → rows-only check)."""
    return {
        **inventory.ORACLES,
        **inventory_tpch.TPCH_ORACLES,
        **inventory_pipeline.PIPELINE_ORACLES,
    }
