"""Property-based layout-kernel tests (hypothesis).

The golden cases pin the reference's exact outputs; these properties
pin the kernel's structural invariants over the whole input space —
any random valid configuration must yield a well-formed carve-up.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from prioritizing_event_processing_with_apache_kafka_spark.plans.layout import (
    bucket_size,
    compute_layout,
)


@st.composite
def valid_configs(draw):
    n_buckets = draw(st.integers(min_value=1, max_value=8))
    # random positive allocations summing to 100
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=99),
                min_size=n_buckets - 1,
                max_size=n_buckets - 1,
                unique=True,
            )
        )
    )
    allocs = [b - a for a, b in zip([0] + cuts, cuts + [100])]
    num_partitions = draw(st.integers(min_value=n_buckets, max_value=256))
    buckets = [(f"b{i}", a) for i, a in enumerate(allocs)]
    return num_partitions, buckets


@given(valid_configs())
@settings(max_examples=300, deadline=None)
def test_layout_invariants(cfg):
    num_partitions, buckets = cfg
    layout = compute_layout(num_partitions, buckets)

    # every configured bucket appears exactly once, priority-ordered
    assert sorted(r.bucket for r in layout) == sorted(name for name, _ in buckets)
    allocs = [r.allocation for r in layout]
    assert allocs == sorted(allocs, reverse=True)
    assert [r.priority_rank for r in layout] == list(range(len(buckets)))

    # assigned partitions form one contiguous run from 0, no overlap,
    # never exceeding the topic's partition count
    assigned = [p for r in layout for p in r.partitions]
    assert assigned == list(range(len(assigned)))
    assert len(assigned) <= num_partitions

    # every non-starved bucket's range is contiguous and matches lo/hi
    for r in layout:
        if r.partitions:
            assert list(r.partitions) == list(range(r.partition_lo, r.partition_hi + 1))
        else:
            assert r.partition_lo is None and r.partition_hi is None

    # sizing never under-uses when rounding undershoots: the remainder
    # loop tops buckets up until all partitions are placed, unless
    # rounding overshoots (then truncation may leave none for the tail,
    # but the head is fully packed)
    rounded_total = sum(bucket_size(a, num_partitions) for _, a in buckets)
    if rounded_total <= num_partitions:
        assert len(assigned) == num_partitions


@given(
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=1, max_value=10_000),
)
@settings(max_examples=300, deadline=None)
def test_bucket_size_matches_float32_reference_semantics(alloc, n):
    import math

    import numpy as np

    expected = int(
        math.floor(float(np.float32(alloc) / np.float32(100.0) * np.float32(n)) + 0.5)
    )
    assert bucket_size(alloc, n) == expected
    # and stays within one partition of the exact real-valued share
    assert abs(bucket_size(alloc, n) - alloc / 100 * n) <= 1
