"""Unit tests for the drain-schedule operator and its golden consumer
map (fixture parity is covered by the oracle harness; these pin the
poll-model semantics on hand-computable inputs)."""

from __future__ import annotations

import pytest

from prioritizing_event_processing_with_apache_kafka_spark.inventory import (
    DRAIN_FLEET,
    EVENTS_CONFIG,
    EVENTS_NUM_PARTITIONS,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.assignment import (
    Subscription,
    assign,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.drain import (
    consumer_map_table,
    drain_schedule,
)

# The 12-row ownership golden hardcoded in SQL_PRIORITY_DRAIN_SCHEDULE.
# Kept literal HERE TOO (not derived from assign()) so the oracle stays
# independent: if the assignment kernel drifts, this test fails loudly
# instead of the oracle silently following the drift.
GOLDEN_MAP = {
    (0, "p0", 2, 0), (1, "p1", 2, 0), (2, "p2", 2, 0),
    (3, "p0", 2, 1), (4, "p1", 2, 1), (5, "p2", 2, 1),
    (6, "g0", 2, 0), (7, "g1", 2, 0),
    (8, "g0", 2, 1), (9, "g1", 2, 1),
    (10, "s0", 2, 0), (11, "s0", 2, 1),
}


class TestConsumerMap:
    def test_canonical_fleet_matches_sql_golden(self, spark):
        subs = [Subscription(c, ["events"], b) for c, b in DRAIN_FLEET]
        plan = assign({"events": EVENTS_NUM_PARTITIONS}, subs, EVENTS_CONFIG)
        rows = {
            (r.partition, r.consumer, r.owned, r.poll_idx)
            for r in consumer_map_table(spark, plan, topic="events").collect()
        }
        assert rows == GOLDEN_MAP

    def test_other_topic_partitions_ignored(self, spark):
        plan = {"c0": [("events", 3), ("clicks", 0), ("events", 1)]}
        rows = {
            (r.partition, r.consumer, r.owned, r.poll_idx)
            for r in consumer_map_table(spark, plan, topic="events").collect()
        }
        # poll order is partition-id ascending regardless of plan order
        assert rows == {(1, "c0", 2, 0), (3, "c0", 2, 1)}


class TestDrainSchedule:
    def _routed(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, bucket string, partition int"
        )

    def test_single_consumer_interleaves_partitions(self, spark):
        # c0 owns partitions 0 and 1 (2 events each): poll cycle
        # 0,1,0,1 -> ticks 1,2,3,4 alternating partitions.
        routed = self._routed(
            spark,
            [(10, "B", 0), (11, "B", 0), (20, "B", 1), (21, "B", 1)],
        )
        cmap = consumer_map_table(
            spark, {"c0": [("t", 0), ("t", 1)]}, topic="t"
        )
        out = {
            r.event_id: r.drain_tick
            for r in drain_schedule(routed, cmap, allow_small_scale=True).collect()
        }
        assert out == {10: 1, 20: 2, 11: 3, 21: 4}

    def test_dedicated_consumer_drains_faster(self, spark):
        # Same per-partition depth; the bucket whose consumer owns ONE
        # partition finishes in half the ticks of the two-partition
        # consumer — the pattern's value proposition in miniature.
        rows = [(i, "hi", 0) for i in range(4)]
        rows += [(100 + i, "lo", p) for p in (1, 2) for i in range(4)]
        routed = self._routed(spark, rows)
        cmap = consumer_map_table(
            spark,
            {"fast": [("t", 0)], "slow": [("t", 1), ("t", 2)]},
            topic="t",
        )
        sched = drain_schedule(routed, cmap, allow_small_scale=True).collect()
        last = {}
        for r in sched:
            last[r.bucket] = max(last.get(r.bucket, 0), r.drain_tick)
        assert last == {"hi": 4, "lo": 8}

    def test_unowned_partition_events_have_no_tick(self, spark):
        routed = self._routed(spark, [(1, "B", 0), (2, "B", 7)])
        cmap = consumer_map_table(spark, {"c0": [("t", 0)]}, topic="t")
        out = drain_schedule(routed, cmap, allow_small_scale=True).collect()
        assert [(r.event_id, r.drain_tick) for r in out] == [(1, 1)]

    def test_pos_col_path_matches_window_path(self, spark):
        # The zero-exchange arithmetic path (seq div bucket_size + 1,
        # precomputed) must produce the identical schedule as the
        # row_number fallback. One bucket, 2 partitions, 3 rows each.
        rows = []
        for seq, eid in enumerate([7, 11, 13, 17, 19, 23]):
            rows.append((eid, "B", seq % 2, seq // 2 + 1))
        routed = spark.createDataFrame(
            rows, "event_id long, bucket string, partition int, pos long"
        )
        cmap = consumer_map_table(
            spark, {"c0": [("t", 0)], "c1": [("t", 1)]}, topic="t"
        )
        via_pos = {
            r.event_id: r.drain_tick
            for r in drain_schedule(routed, cmap, pos_col="pos").collect()
        }
        via_window = {
            r.event_id: r.drain_tick
            for r in drain_schedule(
                routed.drop("pos"),
                cmap,
                order_col="event_id",
                allow_small_scale=True,
            ).collect()
        }
        assert via_pos == via_window

    def test_fallback_window_requires_opt_in(self, spark):
        # The no-pos_col path windows on <= #partitions keys — a
        # reducer funnel at scale — so it must be an explicit opt-in.
        routed = self._routed(spark, [(1, "B", 0)])
        cmap = consumer_map_table(spark, {"c0": [("t", 0)]}, topic="t")
        with pytest.raises(ValueError, match="allow_small_scale"):
            drain_schedule(routed, cmap)

    def test_order_col_not_arrival_order(self, spark):
        routed = self._routed(spark, [(5, "B", 0), (3, "B", 0)])
        cmap = consumer_map_table(spark, {"c0": [("t", 0)]}, topic="t")
        out = {
            r.event_id: r.drain_tick
            for r in drain_schedule(routed, cmap, allow_small_scale=True).collect()
        }
        assert out == {3: 1, 5: 2}
