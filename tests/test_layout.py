"""Layout-kernel golden tests.

Every case replays a distribution the reference's JUnit suite asserts
(file:line cites are to /root/reference). These are the non-negotiable
bit-exact behaviors: float32 Math.round sizing, remainder round-robin,
contiguous carve-up with truncation, allocation-descending priority.
"""

from __future__ import annotations

import pytest

from prioritizing_event_processing_with_apache_kafka_spark import (
    BucketPriorityConfig,
    ConfigException,
    InvalidConfigurationException,
    compute_layout,
)
from prioritizing_event_processing_with_apache_kafka_spark.plans.layout import bucket_size


def as_dict(layout):
    return {r.bucket: list(r.partitions) for r in layout}


class TestGoldenLayouts:
    def test_even_split_10_50_30_20(self):
        # BucketPriorityPartitionerTest.java:110-183
        layout = as_dict(compute_layout(10, [("B1", 50), ("B2", 30), ("B3", 20)]))
        assert layout == {"B1": [0, 1, 2, 3, 4], "B2": [5, 6, 7], "B3": [8, 9]}

    def test_starved_bucket_10_55_40_5(self):
        # 5.5→6, 4.0→4, 0.5→1 ⇒ overshoot ⇒ B3 truncated to ∅
        # BucketPriorityPartitionerTest.java:186-262
        layout = as_dict(compute_layout(10, [("B1", 55), ("B2", 40), ("B3", 5)]))
        assert layout == {"B1": [0, 1, 2, 3, 4, 5], "B2": [6, 7, 8, 9], "B3": []}

    def test_starved_bucket_5_55_40_5(self):
        # 2.75→3, 2.0→2, 0.25→0 — BucketPriorityPartitionerTest.java:265-341
        layout = as_dict(compute_layout(5, [("B1", 55), ("B2", 40), ("B3", 5)]))
        assert layout == {"B1": [0, 1, 2], "B2": [3, 4], "B3": []}

    def test_80_20_over_10(self):
        # BucketPriorityPartitionerTest.java:344-419
        layout = as_dict(compute_layout(10, [("B1", 80), ("B2", 20)]))
        assert layout == {"B1": list(range(8)), "B2": [8, 9]}

    def test_80_20_over_20_partition_increase(self):
        # post-increase layout — BucketPriorityPartitionerTest.java:498-563
        layout = as_dict(compute_layout(20, [("B1", 80), ("B2", 20)]))
        assert layout == {"B1": list(range(16)), "B2": [16, 17, 18, 19]}

    def test_readme_platinum_gold(self):
        # README.md:11 — 6 partitions, 70%/30%
        layout = as_dict(compute_layout(6, [("Platinum", 70), ("Gold", 30)]))
        assert layout == {"Platinum": [0, 1, 2, 3], "Gold": [4, 5]}

    def test_remainder_round_robin(self):
        # 34/33/33 over 10: sizes 3/3/3, leftover 1 goes to highest bucket
        layout = as_dict(compute_layout(10, [("A", 33), ("B", 33), ("C", 34)]))
        assert layout == {"C": [0, 1, 2, 3], "A": [4, 5, 6], "B": [7, 8, 9]}

    def test_priority_order_and_ranks(self):
        layout = compute_layout(10, [("low", 20), ("high", 50), ("mid", 30)])
        assert [r.bucket for r in layout] == ["high", "mid", "low"]
        assert [r.priority_rank for r in layout] == [0, 1, 2]

    def test_tie_keeps_declaration_order(self):
        layout = compute_layout(10, [("first", 50), ("second", 50)])
        assert [r.bucket for r in layout] == ["first", "second"]
        assert as_dict(layout) == {"first": [0, 1, 2, 3, 4], "second": [5, 6, 7, 8, 9]}

    def test_range_accessors(self):
        layout = compute_layout(10, [("B1", 55), ("B2", 40), ("B3", 5)])
        b1, b2, b3 = layout
        assert (b1.partition_lo, b1.partition_hi, b1.size) == (0, 5, 6)
        assert (b2.partition_lo, b2.partition_hi, b2.size) == (6, 9, 4)
        assert (b3.partition_lo, b3.partition_hi, b3.size) == (None, None, 0)


class TestBucketSize:
    @pytest.mark.parametrize(
        "alloc,n,expected",
        [
            (5, 10, 1),    # 0.5 rounds UP (Java Math.round), not banker's 0
            (5, 5, 0),     # 0.25 rounds down
            (55, 10, 6),   # 5.5 → 6
            (50, 10, 5),
            (70, 6, 4),    # 4.2 → 4
            (30, 6, 2),    # 1.8 → 2
            (25, 10, 3),   # 2.5 → 3 (banker's would say 2)
            (100, 7, 7),
            (1, 1000, 10),
        ],
    )
    def test_java_float_round(self, alloc, n, expected):
        assert bucket_size(alloc, n) == expected


class TestLayoutValidation:
    def test_fewer_partitions_than_buckets_raises(self):
        # lazily enforced — BucketPriorityPartitionerTest.java:88-107
        with pytest.raises(InvalidConfigurationException, match="number of partitions"):
            compute_layout(1, [("B1", 50), ("B2", 50)])


class TestConfigValidation:
    def test_missing_topic(self):
        with pytest.raises(ConfigException, match="topic"):
            BucketPriorityConfig(buckets=["B1"], allocation=[100])

    def test_missing_buckets(self):
        with pytest.raises(ConfigException, match="buckets"):
            BucketPriorityConfig(topic="orders", allocation=[100])

    def test_missing_allocation(self):
        with pytest.raises(ConfigException, match="allocation"):
            BucketPriorityConfig(topic="orders", buckets=["B1"])

    def test_count_mismatch(self):
        # BucketPriorityPartitionerTest.java:54-68
        with pytest.raises(InvalidConfigurationException, match="match"):
            BucketPriorityConfig(topic="orders", buckets=["B1", "B2"], allocation=["100%"])

    def test_sum_not_100(self):
        # BucketPriorityPartitionerTest.java:71-85
        with pytest.raises(InvalidConfigurationException, match="100"):
            BucketPriorityConfig(topic="orders", buckets=["B1", "B2"], allocation=["70%", "20%"])

    def test_percent_suffix_and_whitespace(self):
        cfg = BucketPriorityConfig(
            topic="orders", buckets=["B1", "B2"], allocation=[" 70% ", "30"]
        )
        assert cfg.allocation == (70, 30)

    def test_comma_separated_strings(self):
        cfg = BucketPriorityConfig(topic="orders", buckets="B1, B2", allocation="70%,30%")
        assert cfg.buckets == ("B1", "B2")
        assert cfg.allocation == (70, 30)

    def test_from_kafka_style_options(self):
        cfg = BucketPriorityConfig.from_options(
            {
                "bucket.priority.topic": "orders",
                "bucket.priority.buckets": "Platinum,Gold",
                "bucket.priority.allocation": "70%,30%",
                "bucket.priority.delimiter": "_",
            }
        )
        assert cfg.topic == "orders"
        assert cfg.buckets == ("Platinum", "Gold")
        assert cfg.delimiter == "_"

    def test_documented_fallback_partitioner_key_maps_to_discard(self):
        # README.md:79-84 documents bucket.priority.fallback.partitioner
        # (the reference never wires it); we honor the documented intent.
        cfg = BucketPriorityConfig.from_options(
            {
                "bucket.priority.topic": "orders",
                "bucket.priority.buckets": "B1",
                "bucket.priority.allocation": "100%",
                "bucket.priority.fallback.partitioner":
                    "code.buildon.aws.streaming.kafka.DiscardPartitioner",
            }
        )
        assert cfg.on_unroutable == "discard"

    def test_bad_allocation_value(self):
        with pytest.raises(InvalidConfigurationException, match="allocation"):
            BucketPriorityConfig(topic="orders", buckets=["B1"], allocation=["abc"])

    def test_bad_on_unroutable(self):
        with pytest.raises(InvalidConfigurationException, match="on_unroutable"):
            BucketPriorityConfig(
                topic="orders", buckets=["B1"], allocation=[100], on_unroutable="explode"
            )


class TestMessageParity:
    """Error-message strings byte-identical to the reference's
    InvalidConfigurationException texts."""

    def test_count_mismatch_message(self):
        # BucketPriorityPartitioner.java:34-37
        with pytest.raises(InvalidConfigurationException) as exc:
            BucketPriorityConfig(topic="orders", buckets=["B1", "B2"], allocation=["100%"])
        assert str(exc.value) == (
            "The bucket allocation doesn't match with the number of buckets configured."
        )

    def test_sum_message(self):
        # BucketPriorityPartitioner.java:38-42
        with pytest.raises(InvalidConfigurationException) as exc:
            BucketPriorityConfig(topic="orders", buckets=["B1", "B2"], allocation=["70%", "20%"])
        assert str(exc.value) == (
            "The bucket allocation is incorrect. The sum of all buckets needs to be 100."
        )

    def test_too_few_partitions_message(self):
        # BucketPriorityPartitioner.java:98-105 (same text in
        # BucketPriorityAssignor.java:151-159), topic name interpolated.
        with pytest.raises(InvalidConfigurationException) as exc:
            compute_layout(1, [("B1", 50), ("B2", 50)], topic="orders")
        assert str(exc.value) == (
            "The number of partitions available for the topic 'orders' is "
            "incompatible with the number of buckets. It needs to be at least 2."
        )

    def test_bad_fallback_assignor_message(self):
        # BucketPriorityAssignor.java:52-59, raised at configure time.
        with pytest.raises(InvalidConfigurationException) as exc:
            BucketPriorityConfig(
                topic="orders", buckets=["B1"], allocation=[100],
                fallback_assignor="com.riskfuel.NotAnAssignor",
            )
        assert str(exc.value) == "The fallback assignor configured is invalid."
