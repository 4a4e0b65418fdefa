"""Sources & sinks: fixture tables, Kafka option builders."""

from prioritizing_event_processing_with_apache_kafka_spark.sources.tables import (
    EVENT_TYPE_BUCKET,
    load_table,
    load_tables,
    with_routing_key,
)

__all__ = ["EVENT_TYPE_BUCKET", "load_table", "load_tables", "with_routing_key"]
