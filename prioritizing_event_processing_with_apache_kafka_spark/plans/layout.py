"""Bucket layout kernel — the one pure function that must be bit-exact.

Maps ``(num_partitions, [(bucket, allocation%), ...])`` to the
partition range owned by each bucket. Semantics mirror the reference
implementation exactly (parity notes cite reference files under
/root/reference):

1. **Priority order** — buckets are processed in *allocation-descending*
   order; equal allocations keep declaration order
   (``Bucket.java:31-40`` comparator + stable ``LinkedHashMap`` rebuild,
   ``BucketPriorityPartitioner.java:44-58``).
2. **Sizing** — ``size = Math.round(allocation / 100f * numPartitions)``
   (``Bucket.java:46-48``). Java ``Math.round(float)`` is
   ``floor(x + 0.5)`` evaluated in float32, *not* banker's rounding —
   e.g. 5% of 10 partitions → 0.5 → **1**, while 5% of 5 → 0.25 → **0**.
   We replay the arithmetic in numpy float32 to be bit-identical.
3. **Remainder redistribution** — if the rounded sizes undershoot,
   leftover partitions are handed out one at a time, round-robin over
   buckets in priority order (``BucketPriorityPartitioner.java:120-139``).
4. **Contiguous carve-up with truncation** — partitions 0..n-1 are
   assigned contiguously: highest-priority bucket first. If rounding
   *overshot*, the carve-up simply stops when partition ids run out, so
   the lowest-priority buckets can end up with **no partitions at all**
   (``BucketPriorityPartitioner.java:140-153``; asserted by
   ``BucketPriorityPartitionerTest.java:186-341``).

The kernel is driver-side only and O(num_buckets + num_partitions);
executors never see it — they see the tiny broadcastable layout table
built from its output (see ``operators/routing.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

from prioritizing_event_processing_with_apache_kafka_spark.plans.config import (
    InvalidConfigurationException,
)

__all__ = ["BucketRange", "compute_layout", "bucket_size"]


@dataclass(frozen=True)
class BucketRange:
    """One bucket's slice of the topic's partition space.

    ``partitions`` is always the contiguous run
    ``[partition_lo, .., partition_hi]``; empty for starved buckets
    (then ``partition_lo``/``partition_hi`` are ``None``).
    ``priority_rank`` is 0 for the highest-allocation bucket.
    """

    bucket: str
    allocation: int
    priority_rank: int
    partitions: tuple[int, ...] = field(default_factory=tuple)

    @property
    def partition_lo(self) -> int | None:
        return self.partitions[0] if self.partitions else None

    @property
    def partition_hi(self) -> int | None:
        return self.partitions[-1] if self.partitions else None

    @property
    def size(self) -> int:
        return len(self.partitions)


def bucket_size(allocation: int, num_partitions: int) -> int:
    """Partition count for a bucket, replaying Java float32 arithmetic.

    ``Math.round(allocation / 100f * numPartitions)`` with float math:
    float32 divide, float32 multiply, then floor(x + 0.5). Python's
    built-in ``round`` (banker's) would give 0 for the 0.5 case — wrong.
    """
    x = np.float32(allocation) / np.float32(100.0) * np.float32(num_partitions)
    return int(math.floor(float(x) + 0.5))


def _layout(
    num_partitions: int,
    buckets: tuple[tuple[str, int], ...],
    topic: str | None = None,
) -> tuple[BucketRange, ...]:
    if num_partitions < len(buckets):
        # Byte-identical to the reference's lazily-raised message
        # (BucketPriorityPartitioner.java:98-105, BucketPriorityAssignor.java:151-159).
        raise InvalidConfigurationException(
            f"The number of partitions available for the topic '{topic}' is "
            f"incompatible with the number of buckets. It needs to be at "
            f"least {len(buckets)}."
        )
    # Priority order: allocation descending; Python's sort is stable, so
    # ties keep declaration order (same net effect as the reference's
    # comparator + merge-keeps-first rebuild).
    ordered = sorted(buckets, key=lambda item: -item[1])
    sizes = {name: bucket_size(alloc, num_partitions) for name, alloc in ordered}

    # Undershoot: hand out leftovers round-robin in priority order.
    leftover = num_partitions - sum(sizes.values())
    rr = 0
    while leftover > 0:
        sizes[ordered[rr % len(ordered)][0]] += 1
        leftover -= 1
        rr += 1

    # Contiguous carve-up from partition 0; overshoot silently truncates,
    # starving the lowest-priority tail.
    ranges: list[BucketRange] = []
    next_pid = 0
    for rank, (name, alloc) in enumerate(ordered):
        take = min(sizes[name], num_partitions - next_pid)
        pids = tuple(range(next_pid, next_pid + take))
        next_pid += take
        ranges.append(BucketRange(name, alloc, rank, pids))
    return tuple(ranges)


# Memoized on (num_partitions, buckets) — the reference caches its layout
# keyed on the live partition count and rebuilds when the topic grows
# (BucketPriorityPartitioner.java:84-94). lru_cache gives the same
# "recompute only on metadata change" behavior.
_layout_cached = lru_cache(maxsize=256)(_layout)


def compute_layout(
    num_partitions: int,
    buckets: list[tuple[str, int]] | tuple[tuple[str, int], ...],
    topic: str | None = None,
) -> tuple[BucketRange, ...]:
    """Compute the bucket→partition layout for a topic.

    Args:
        num_partitions: current partition count of the topic.
        buckets: ``(name, allocation_percent)`` pairs in declaration
            order. Caller is responsible for config-level validation
            (see ``BucketPriorityConfig``); this function only enforces
            the lazily-checked ``num_partitions >= num_buckets`` rule.
        topic: topic name, used only to render the too-few-partitions
            error with the reference's exact message text.

    Returns:
        ``BucketRange`` tuple in priority (allocation-descending) order.
    """
    if not buckets:
        # reachable without a config object (which would have rejected
        # it); the round-robin below would otherwise die on % by zero
        raise InvalidConfigurationException(
            "at least one bucket is required to compute a layout"
        )
    return _layout_cached(
        int(num_partitions),
        tuple((str(n), int(a)) for n, a in buckets),
        None if topic is None else str(topic),
    )
