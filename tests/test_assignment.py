"""Assignment tests replaying the reference's assignor scenarios
(``BucketPriorityAssignorTest``, cited per test)."""

from __future__ import annotations

from prioritizing_event_processing_with_apache_kafka_spark import BucketPriorityConfig
from prioritizing_event_processing_with_apache_kafka_spark.operators.assignment import (
    Subscription,
    assign,
    decode_user_data,
    encode_user_data,
    range_assign,
    roundrobin_assign,
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


class TestUserDataBytes:
    """Byte-level rebalance-protocol parity (BucketPriorityAssignor.java:78-89,108-120)."""

    def test_encode_only_for_bucket_topic(self):
        # subscriptionUserData encodes iff subscribed to the bucket topic.
        cfg = BucketPriorityConfig(
            topic="orders", buckets=["B1", "B2"], allocation=[80, 20], bucket="B1"
        )
        assert encode_user_data(["orders", "clicks"], cfg) == b"B1"
        assert encode_user_data(["clicks"], cfg) is None

    def test_utf8_round_trip(self):
        cfg = BucketPriorityConfig(
            topic="orders", buckets=["Prémium", "B2"], allocation=[80, 20],
            bucket="Prémium",
        )
        raw = encode_user_data(["orders"], cfg)
        assert raw == "Prémium".encode("utf-8") and len(raw) == 8
        assert decode_user_data(raw) == "Prémium"

    def test_assignment_through_encoded_bytes(self):
        # BucketPriorityAssignorTest.java:154-223 driven end-to-end
        # through the encoded userData bytes instead of the dataclass
        # convenience field: 10 partitions 80/20, 8 B1 + 2 B2 consumers,
        # every consumer lands >= 1 partition inside its own bucket.
        def sub(name, bucket):
            cfg = BucketPriorityConfig(
                topic="orders", buckets=["B1", "B2"], allocation=[80, 20],
                bucket=bucket,
            )
            return Subscription(name, ["orders"], user_data=encode_user_data(["orders"], cfg))

        subs = [sub(f"consumer-{i}", "B1") for i in range(8)]
        subs += [sub(f"consumer-{i}", "B2") for i in (8, 9)]
        result = assign({"orders": 10}, subs, CFG)
        assert len(result) == 10
        assert all(len(v) > 0 for v in result.values())
        b1 = {c for c, pairs in result.items() if any(p <= 7 for _, p in pairs)}
        b2 = {c for c, pairs in result.items() if any(p >= 8 for _, p in pairs)}
        assert b1 == {f"consumer-{i}" for i in range(8)}
        assert b2 == {"consumer-8", "consumer-9"}

    def test_missing_user_data_gets_zero_partitions(self):
        # Documented divergence from the reference's NPE at
        # BucketPriorityAssignor.java:110 — a bucket-topic consumer
        # advertising no userData stays in the result with nothing.
        subs = [
            Subscription("mute", ["orders"], user_data=None),
            Subscription("ok", ["orders"], user_data=b"B1"),
        ]
        result = assign({"orders": 10}, subs, CFG)
        assert result["mute"] == []
        assert len(result["ok"]) == 8


class TestFallbackAssignors:
    def test_roundrobin_semantics(self):
        subs = [Subscription("a", ["t"]), Subscription("b", ["t"]), Subscription("c", ["t"])]
        result = roundrobin_assign({"t": 7}, subs)
        assert result["a"] == [("t", 0), ("t", 3), ("t", 6)]
        assert result["b"] == [("t", 1), ("t", 4)]
        assert result["c"] == [("t", 2), ("t", 5)]

    def test_roundrobin_skips_unsubscribed(self):
        subs = [
            Subscription("a", ["t1", "t2"]),
            Subscription("b", ["t2"]),
        ]
        # The ring advances while skipping unsubscribed consumers
        # (Kafka RoundRobinAssignor's peek/next behavior), so after b is
        # skipped for t1 the deal continues from a.
        result = roundrobin_assign({"t1": 2, "t2": 2}, subs)
        assert result["a"] == [("t1", 0), ("t1", 1), ("t2", 1)]
        assert result["b"] == [("t2", 0)]

    def test_configured_fallback_is_used(self):
        cfg = BucketPriorityConfig(
            topic="orders", buckets=["B1", "B2"], allocation=[80, 20],
            fallback_assignor="roundrobin",
        )
        subs = [
            Subscription("b0", ["orders"], "B1"),
            Subscription("r0", ["clicks"]),
            Subscription("r1", ["clicks"]),
        ]
        result = assign({"orders": 10, "clicks": 3}, subs, cfg)
        assert result["r0"] == [("clicks", 0), ("clicks", 2)]
        assert result["r1"] == [("clicks", 1)]


class TestSubscriptionOrderParity:
    def test_caller_order_drives_round_robin(self):
        # BucketPriorityAssignor.java:104-124 iterates the subscription
        # map in the order it is handed — no sorting. Non-alphabetical
        # arrival order must shift ownership accordingly.
        subs = [
            Subscription("c2", ["orders"], "B1"),
            Subscription("c1", ["orders"], "B1"),
        ]
        result = assign({"orders": 10}, subs, CFG)
        # B1 = partitions [0..7]; shared counter deals 0 to c2 first
        assert owned_partitions(result, "c2") == [0, 2, 4, 6]
        assert owned_partitions(result, "c1") == [1, 3, 5, 7]
