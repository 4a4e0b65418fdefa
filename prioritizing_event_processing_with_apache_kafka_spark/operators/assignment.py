"""Consumer-side partition assignment — the prioritized-consumption plan.

Re-expression of the reference's ``ConsumerPartitionAssignor``
(``BucketPriorityAssignor.java:92-149``) as a pure driver-side planning
function: given topic metadata and consumer subscriptions, produce the
partition set each consumer owns. In the Spark engine this plan becomes
per-bucket Structured Streaming queries (``streaming/consume.py``) whose
Kafka ``assign`` option is exactly the bucket's partition list — Spark
never even reads other buckets' partitions (the engine's Kafka-source
partition pruning).

Semantics ported (cites into /root/reference):

- Consumers advertise the bucket they serve; only consumers subscribed
  to the configured topic do so (``BucketPriorityAssignor.java:78-89``).
- Buckets are processed in allocation-descending order; within each
  bucket, partitions round-robin over that bucket's consumers using one
  counter **shared across buckets** (``BucketPriorityAssignor.java:125-139``).
- A consumer naming an unknown bucket appears in the result with zero
  partitions (``BucketPriorityAssignor.java:104-124``). The reference
  would NPE on a *missing* (null) bucket advertisement — we deliberately
  treat that as unroutable-consumer instead (SURVEY.md §2.A P12 note).
- Buckets with no consumers leave their partitions unassigned
  (``BucketPriorityAssignorTest.java:294-341``).
- Consumers subscribed to *other* topics are assigned by the fallback
  assignor — default range semantics, matching Kafka's ``RangeAssignor``
  (``BucketPriorityConfig.java:56``); a consumer on both the bucket
  topic and others is treated as bucket-only
  (``BucketPriorityAssignor.java:103-123``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    BucketPriorityConfig,
)
from prioritizing_event_processing_with_apache_kafka_spark.plans.layout import compute_layout

__all__ = ["Subscription", "assign", "range_assign"]


@dataclass(frozen=True)
class Subscription:
    """One consumer's rebalance-time advertisement."""

    consumer: str
    topics: tuple[str, ...]
    bucket: str | None = None

    def __init__(self, consumer: str, topics, bucket: str | None = None) -> None:
        object.__setattr__(self, "consumer", consumer)
        object.__setattr__(self, "topics", tuple(topics))
        object.__setattr__(self, "bucket", bucket)


def range_assign(
    partitions_per_topic: dict[str, int], subscriptions: list[Subscription]
) -> dict[str, list[tuple[str, int]]]:
    """Kafka ``RangeAssignor`` semantics (the default fallback): per
    topic, consumers sorted by id get contiguous chunks of
    ``ceil``/``floor`` size, earlier consumers absorbing the remainder."""
    out: dict[str, list[tuple[str, int]]] = {s.consumer: [] for s in subscriptions}
    for topic, num_partitions in sorted(partitions_per_topic.items()):
        members = sorted(s.consumer for s in subscriptions if topic in s.topics)
        if not members:
            continue
        quota, extra = divmod(num_partitions, len(members))
        start = 0
        for i, consumer in enumerate(members):
            take = quota + (1 if i < extra else 0)
            out[consumer].extend((topic, p) for p in range(start, start + take))
            start += take
    return out


def assign(
    partitions_per_topic: dict[str, int],
    subscriptions: list[Subscription],
    config: BucketPriorityConfig,
) -> dict[str, list[tuple[str, int]]]:
    """Full group assignment: bucket-priority on the configured topic,
    fallback range assignment on every other subscribed topic."""
    bucket_subs = [s for s in subscriptions if config.topic in s.topics]
    other_subs = [s for s in subscriptions if config.topic not in s.topics]

    assignments: dict[str, list[tuple[str, int]]] = {
        s.consumer: [] for s in subscriptions
    }

    if bucket_subs:
        layout = compute_layout(
            partitions_per_topic[config.topic], config.buckets_with_allocation()
        )
        consumers_per_bucket: dict[str, list[str]] = {r.bucket: [] for r in layout}
        for s in sorted(bucket_subs, key=lambda s: s.consumer):
            # unknown or missing bucket ⇒ consumer stays in the result
            # with zero partitions (no NPE-parity, see module docstring)
            if s.bucket in consumers_per_bucket:
                consumers_per_bucket[s.bucket].append(s.consumer)
        counter = -1
        for r in layout:  # allocation-descending order
            members = consumers_per_bucket[r.bucket]
            if not members:
                continue  # bucket partitions left unassigned
            for partition in r.partitions:
                counter += 1
                owner = members[counter % len(members)]
                assignments[owner].append((config.topic, partition))

    other_topics = {
        t: n for t, n in partitions_per_topic.items() if t != config.topic
    }
    if other_subs and other_topics:
        for consumer, pairs in range_assign(other_topics, other_subs).items():
            assignments[consumer].extend(pairs)
    return assignments
