"""Driver-side plan construction: bucket layout kernel and configuration."""

from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    BucketPriorityConfig,
    ConfigException,
    InvalidConfigurationException,
)
from prioritizing_event_processing_with_apache_kafka_spark.plans.layout import (
    BucketRange,
    compute_layout,
)

__all__ = [
    "BucketPriorityConfig",
    "BucketRange",
    "ConfigException",
    "InvalidConfigurationException",
    "compute_layout",
]
