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


def _brute_force_layout(num_partitions, buckets):
    """Independent transliteration of the reference semantics
    (BucketPriorityPartitioner.java:44-58 + Bucket.java:31-40): stable
    allocation-descending order, float32 Math.round sizing, priority
    round-robin leftover top-up, contiguous carve-up with tail
    truncation. Kept deliberately simple — lists and loops only — as
    the cross-check oracle for the production kernel."""
    import math

    import numpy as np

    ordered = sorted(buckets, key=lambda t: -t[1])  # stable: ties keep order
    sizes = [
        int(
            math.floor(
                float(
                    np.float32(a) / np.float32(100.0) * np.float32(num_partitions)
                )
                + 0.5
            )
        )
        for _, a in ordered
    ]
    leftover = num_partitions - sum(sizes)
    i = 0
    while leftover > 0:
        sizes[i % len(sizes)] += 1
        leftover -= 1
        i += 1
    out, nxt = [], 0
    for (name, alloc), sz in zip(ordered, sizes):
        take = min(sz, num_partitions - nxt)
        out.append((name, alloc, tuple(range(nxt, nxt + take))))
        nxt += take
    return out


@st.composite
def tied_or_large_configs(draw):
    """Configs the original generator can't reach: allocation TIES
    (duplicate values, where only sort stability fixes the order) and
    >100-bucket fleets (allocations no longer sum to 100 — the
    reference never validates the sum, so neither may the kernel)."""
    n_buckets = draw(st.integers(min_value=2, max_value=150))
    allocs = draw(
        st.lists(
            st.integers(min_value=0, max_value=100),
            min_size=n_buckets,
            max_size=n_buckets,
        )
    )
    num_partitions = draw(st.integers(min_value=n_buckets, max_value=2000))
    return num_partitions, [(f"b{i}", a) for i, a in enumerate(allocs)]


@given(tied_or_large_configs())
@settings(max_examples=200, deadline=None)
def test_layout_matches_brute_force_reference(cfg):
    num_partitions, buckets = cfg
    got = [
        (r.bucket, r.allocation, tuple(r.partitions))
        for r in compute_layout(num_partitions, buckets)
    ]
    assert got == _brute_force_layout(num_partitions, buckets)


def test_allocation_ties_keep_declaration_order():
    # All-equal allocations: the carve-up must follow declaration
    # order exactly (stable sort), and the leftover round-robin tops
    # up from the first-declared bucket.
    buckets = [(f"b{i}", 10) for i in range(7)]
    layout = compute_layout(10, buckets)
    assert [r.bucket for r in layout] == [f"b{i}" for i in range(7)]
    # float32 round(10% of 10) = 1 each -> 7 placed, 3 leftover to
    # b0..b2; so sizes are [2, 2, 2, 1, 1, 1, 1].
    assert [r.size for r in layout] == [2, 2, 2, 1, 1, 1, 1]
    assert [r.partitions[0] for r in layout] == [0, 2, 4, 6, 7, 8, 9]


def test_over_100_buckets_carve_and_truncate():
    # 120 buckets at 1% of 130 partitions: float32 round(1.3) = 1
    # each, 10 leftover round-robin to the first 10 — declaration
    # order, since all allocations tie.
    buckets = [(f"b{i:03d}", 1) for i in range(120)]
    layout = compute_layout(130, buckets)
    assert [r.size for r in layout] == [2] * 10 + [1] * 110
    assigned = [p for r in layout for p in r.partitions]
    assert assigned == list(range(130))
    assert got_equal_brute(130, buckets, layout)


def got_equal_brute(num_partitions, buckets, layout):
    return [
        (r.bucket, r.allocation, tuple(r.partitions)) for r in layout
    ] == _brute_force_layout(num_partitions, buckets)
