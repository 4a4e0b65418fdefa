"""Assignment tests replaying the reference's assignor scenarios
(``BucketPriorityAssignorTest``, cited per test)."""

from __future__ import annotations

from prioritizing_event_processing_with_apache_kafka_spark import BucketPriorityConfig
from prioritizing_event_processing_with_apache_kafka_spark.operators.assignment import (
    Subscription,
    assign,
    range_assign,
)

CFG = BucketPriorityConfig(topic="orders", buckets=["B1", "B2"], allocation=[80, 20])


def owned_partitions(result, consumer, topic="orders"):
    return sorted(p for t, p in result[consumer] if t == topic)


class TestBucketAssignment:
    def test_per_bucket_consumer_assignment(self):
        # BucketPriorityAssignorTest.java:154-223 — 10 partitions 80/20,
        # 8 B1 + 2 B2 consumers: everyone gets >= 1 partition, and only
        # from their own bucket.
        subs = [Subscription(f"c{i}", ["orders"], "B1") for i in range(8)]
        subs += [Subscription(f"c{i}", ["orders"], "B2") for i in (8, 9)]
        result = assign({"orders": 10}, subs, CFG)
        b1_owned = set()
        for i in range(8):
            owned = owned_partitions(result, f"c{i}")
            assert len(owned) == 1 and owned[0] in range(8)
            b1_owned.update(owned)
        assert b1_owned == set(range(8))
        b2_owned = set()
        for i in (8, 9):
            owned = owned_partitions(result, f"c{i}")
            assert len(owned) == 1 and owned[0] in (8, 9)
            b2_owned.update(owned)
        assert b2_owned == {8, 9}

    def test_dead_bucket_leaves_partitions_unassigned(self):
        # BucketPriorityAssignorTest.java:294-341 — B2 consumers gone:
        # B1's 8 partitions spread over 6 survivors, [8, 9] go nowhere.
        subs = [Subscription(f"c{i}", ["orders"], "B1") for i in range(6)]
        result = assign({"orders": 10}, subs, CFG)
        all_owned = sorted(p for pairs in result.values() for _, p in pairs)
        assert all_owned == list(range(8))
        assert all(len(owned_partitions(result, f"c{i}")) >= 1 for i in range(6))

    def test_multi_topic_fallback(self):
        # BucketPriorityAssignorTest.java:114-152 — 2 bucket-topic + 2
        # regular-topic consumers over 2 topics x 6 partitions: all four
        # receive > 0 partitions; the regular topic goes through the
        # fallback (range) assignor.
        subs = [
            Subscription("b0", ["orders"], "B1"),
            Subscription("b1", ["orders"], "B2"),
            Subscription("r0", ["clicks"]),
            Subscription("r1", ["clicks"]),
        ]
        result = assign({"orders": 6, "clicks": 6}, subs, CFG)
        assert all(len(result[c]) > 0 for c in ("b0", "b1", "r0", "r1"))
        assert owned_partitions(result, "r0", "clicks") == [0, 1, 2]
        assert owned_partitions(result, "r1", "clicks") == [3, 4, 5]
        # layout (6, 80/20) -> B1=[0..4], B2=[5]
        assert owned_partitions(result, "b0") == [0, 1, 2, 3, 4]
        assert owned_partitions(result, "b1") == [5]

    def test_unknown_bucket_consumer_gets_nothing(self):
        # BucketPriorityAssignor.java:104-124 — present in result, owns 0.
        subs = [
            Subscription("good", ["orders"], "B1"),
            Subscription("weird", ["orders"], "Silver"),
            Subscription("silent", ["orders"], None),
        ]
        result = assign({"orders": 10}, subs, CFG)
        assert result["weird"] == [] and result["silent"] == []
        assert len(result["good"]) == 8

    def test_bucket_topic_wins_over_other_topics(self):
        # BucketPriorityAssignor.java:103-123 — dual-subscribed consumer
        # is treated as bucket-only.
        subs = [
            Subscription("dual", ["orders", "clicks"], "B1"),
            Subscription("r0", ["clicks"]),
        ]
        result = assign({"orders": 10, "clicks": 4}, subs, CFG)
        assert all(t == "orders" for t, _ in result["dual"])
        assert owned_partitions(result, "r0", "clicks") == [0, 1, 2, 3]

    def test_shared_counter_spreads_across_buckets(self):
        # One counter across buckets (BucketPriorityAssignor.java:125-139):
        # with 2 consumers per bucket over (10, 80/20), B1's 8 partitions
        # alternate c0/c1 ending at counter=7; B2 starts at counter=8 → c2.
        subs = [
            Subscription("c0", ["orders"], "B1"),
            Subscription("c1", ["orders"], "B1"),
            Subscription("c2", ["orders"], "B2"),
            Subscription("c3", ["orders"], "B2"),
        ]
        result = assign({"orders": 10}, subs, CFG)
        assert owned_partitions(result, "c0") == [0, 2, 4, 6]
        assert owned_partitions(result, "c1") == [1, 3, 5, 7]
        assert owned_partitions(result, "c2") == [8]
        assert owned_partitions(result, "c3") == [9]


class TestRangeAssign:
    def test_range_semantics(self):
        subs = [Subscription("a", ["t"]), Subscription("b", ["t"]), Subscription("c", ["t"])]
        result = range_assign({"t": 7}, subs)
        assert result["a"] == [("t", 0), ("t", 1), ("t", 2)]
        assert result["b"] == [("t", 3), ("t", 4)]
        assert result["c"] == [("t", 5), ("t", 6)]
