"""Reusable native Column expression builders (JVM-side, no Python UDFs)."""

from prioritizing_event_processing_with_apache_kafka_spark.functions.keys import (
    extract_bucket,
)

__all__ = ["extract_bucket"]
