"""Prioritized consumption: per-bucket streaming query planning.

The reference's consumer-side pattern — "run more consumers on the
higher-priority buckets" (``README.md:11-17``) — maps to Spark as **one
streaming query per bucket**, each reading *only* its bucket's
partitions via the Kafka source ``assign`` option. Priority becomes:

- **partition pruning**: a bucket query never reads (or even opens)
  other buckets' partitions — the contiguous ranges from the layout
  kernel make the ``assign`` lists dense;
- **throughput weighting**: ``maxOffsetsPerTrigger`` is split across
  bucket queries proportionally to allocation, so under backpressure
  the Platinum query drains proportionally more offsets per trigger;
- **scheduler weighting**: each query is tagged with a fair-scheduler
  pool (``spark.scheduler.pool``) named after its bucket so cluster
  slots follow priority when queries contend;
- **parallelism**: ``minPartitions`` per query lets a hot bucket fan
  its few Kafka partitions out to more executor cores.

``consume_plan`` is a pure function (unit-testable without a broker);
``kafka_reader_options`` renders one spec into ``readStream`` options.
Not consuming a bucket = simply not launching its query — the analog of
a rebalance where a bucket has zero consumers and its partitions go
unassigned (``BucketPriorityAssignorTest.java:294-341``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    BucketPriorityConfig,
)
from prioritizing_event_processing_with_apache_kafka_spark.plans.layout import compute_layout

__all__ = ["BucketReaderSpec", "consume_plan", "kafka_reader_options"]


@dataclass(frozen=True)
class BucketReaderSpec:
    """Plan for one bucket's streaming query."""

    bucket: str
    allocation: int
    priority_rank: int
    partitions: tuple[int, ...]
    max_offsets_per_trigger: int | None
    min_partitions: int | None
    scheduler_pool: str

    def assign_json(self, topic: str) -> str:
        """Kafka source ``assign`` option value for this bucket."""
        return json.dumps({topic: list(self.partitions)})


def consume_plan(
    config: BucketPriorityConfig,
    num_partitions: int,
    *,
    total_offsets_per_trigger: int | None = None,
    cores_total: int | None = None,
    buckets: list[str] | None = None,
) -> list[BucketReaderSpec]:
    """One reader spec per (consumed) bucket.

    ``total_offsets_per_trigger`` is divided by allocation percentage —
    the streaming analog of giving a bucket X% of the processing
    capacity. ``cores_total`` similarly sizes ``minPartitions`` so a
    bucket's partitions spread over its fair share of cores. Starved
    buckets (no partitions) get no spec — there is nothing to read.
    """
    layout = compute_layout(
            num_partitions, config.buckets_with_allocation(), topic=config.topic
        )
    wanted = set(buckets) if buckets is not None else None
    specs: list[BucketReaderSpec] = []
    for r in layout:
        if wanted is not None and r.bucket not in wanted:
            continue
        if not r.partitions:
            continue
        max_offsets = (
            max(1, total_offsets_per_trigger * r.allocation // 100)
            if total_offsets_per_trigger
            else None
        )
        min_parts = (
            max(len(r.partitions), cores_total * r.allocation // 100)
            if cores_total
            else None
        )
        specs.append(
            BucketReaderSpec(
                bucket=r.bucket,
                allocation=r.allocation,
                priority_rank=r.priority_rank,
                partitions=r.partitions,
                max_offsets_per_trigger=max_offsets,
                min_partitions=min_parts,
                scheduler_pool=f"bucket-{r.bucket}",
            )
        )
    return specs


def kafka_reader_options(
    spec: BucketReaderSpec,
    config: BucketPriorityConfig,
    *,
    bootstrap_servers: str,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """``spark.readStream.format('kafka')`` options for one bucket query.

    The ``assign`` JSON is the engine's partition pruning: this query
    subscribes to exactly the bucket's partitions, nothing else.
    """
    options = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "assign": spec.assign_json(config.topic),
        "startingOffsets": starting_offsets,
    }
    if spec.max_offsets_per_trigger is not None:
        options["maxOffsetsPerTrigger"] = str(spec.max_offsets_per_trigger)
    if spec.min_partitions is not None:
        options["minPartitions"] = str(spec.min_partitions)
    return options
