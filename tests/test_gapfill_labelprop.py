"""Unit tests for gap-fill interpolation and semi-supervised label
propagation (fixture parity is covered by the oracle harness; these pin
the semantics on hand-computable inputs)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.graph import (
    label_propagation,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.timeseries import (
    gap_fill_interpolate,
)


def _h(hour: int) -> datetime:
    return datetime(2024, 1, 1, hour)


class TestGapFill:
    SCHEMA = "event_type string, hour timestamp, n_events long, value_cents long"

    def test_linear_interpolation_across_gap(self, spark):
        hourly = spark.createDataFrame(
            [("a", _h(0), 2, 100), ("a", _h(3), 1, 400)], self.SCHEMA
        )
        out = {
            r.hour.hour: (r.n_events, r.filled, r.is_gap)
            for r in gap_fill_interpolate(hourly).collect()
        }
        assert out == {
            0: (2, 100.0, False),
            1: (0, 200.0, True),
            2: (0, 300.0, True),
            3: (1, 400.0, False),
        }

    def test_no_extrapolation_beyond_observed_span(self, spark):
        # Spine is bounded per KEY: key b observed only at hours 1-2
        # must not inherit key a's 0-4 span.
        hourly = spark.createDataFrame(
            [
                ("a", _h(0), 1, 10), ("a", _h(4), 1, 50),
                ("b", _h(1), 1, 70), ("b", _h(2), 1, 90),
            ],
            self.SCHEMA,
        )
        out = gap_fill_interpolate(hourly).collect()
        spans = {}
        for r in out:
            lo, hi = spans.get(r.event_type, (99, -1))
            spans[r.event_type] = (min(lo, r.hour.hour), max(hi, r.hour.hour))
        assert spans == {"a": (0, 4), "b": (1, 2)}
        assert sum(1 for r in out if r.event_type == "a" and r.is_gap) == 3
        assert not any(r.is_gap for r in out if r.event_type == "b")

    def test_uneven_gap_fractions(self, spark):
        # prev=0 at h0, next=300 at h4: gaps at 1/2/3 -> 75/150/225.
        hourly = spark.createDataFrame(
            [("a", _h(0), 1, 0), ("a", _h(4), 1, 300)], self.SCHEMA
        )
        filled = {
            r.hour.hour: r.filled for r in gap_fill_interpolate(hourly).collect()
        }
        assert filled == {0: 0.0, 1: 75.0, 2: 150.0, 3: 225.0, 4: 300.0}

    def test_single_observation_key_has_no_gaps(self, spark):
        hourly = spark.createDataFrame([("a", _h(5), 3, 42)], self.SCHEMA)
        out = gap_fill_interpolate(hourly).collect()
        assert len(out) == 1
        assert (out[0].n_events, out[0].filled, out[0].is_gap) == (3, 42.0, False)


EDGES = "x long, y long"
SEEDS = "node long, label string"


class TestLabelPropagation:
    def test_majority_vote_and_tiebreak(self, spark):
        # node 10 has labeled neighbors en, en, fr -> en (majority);
        # node 20 has de, fr (tie) -> de (smallest label).
        edges = spark.createDataFrame(
            [(10, 1), (10, 2), (10, 3), (20, 4), (20, 5)], EDGES
        )
        seeds = spark.createDataFrame(
            [(1, "en"), (2, "en"), (3, "fr"), (4, "de"), (5, "fr")], SEEDS
        )
        out = {
            r.node: (r.label, r.round_assigned)
            for r in label_propagation(edges, seeds, rounds=1).collect()
        }
        assert out[10] == ("en", 1)
        assert out[20] == ("de", 1)

    def test_second_round_spreads_from_first(self, spark):
        # chain: seed 1 -- 2 -- 3; round 1 labels 2, round 2 labels 3.
        edges = spark.createDataFrame([(1, 2), (2, 3)], EDGES)
        seeds = spark.createDataFrame([(1, "en")], SEEDS)
        out = {
            r.node: (r.label, r.round_assigned)
            for r in label_propagation(edges, seeds, rounds=2).collect()
        }
        assert out == {1: ("en", 0), 2: ("en", 1), 3: ("en", 2)}

    def test_seeds_are_immutable(self, spark):
        # seed 1 (en) is surrounded by fr seeds; it must keep en.
        edges = spark.createDataFrame([(1, 2), (1, 3)], EDGES)
        seeds = spark.createDataFrame(
            [(1, "en"), (2, "fr"), (3, "fr")], SEEDS
        )
        out = {
            r.node: r.label
            for r in label_propagation(edges, seeds, rounds=2).collect()
        }
        assert out[1] == "en"

    def test_unreached_nodes_absent(self, spark):
        # 4--5 is a separate unlabeled component: no row comes back.
        edges = spark.createDataFrame([(1, 2), (4, 5)], EDGES)
        seeds = spark.createDataFrame([(1, "en")], SEEDS)
        nodes = {r.node for r in label_propagation(edges, seeds, rounds=2).collect()}
        assert nodes == {1, 2}

    def test_null_label_seeds_dropped(self, spark):
        # A NULL-label seed carries nothing to spread; letting it
        # through would win every struct-min tie and poison rounds.
        edges = spark.createDataFrame([(1, 2)], EDGES)
        seeds = spark.createDataFrame([(1, None), (2, "en")], SEEDS)
        out = {
            r.node: (r.label, r.round_assigned)
            for r in label_propagation(edges, seeds, rounds=1).collect()
        }
        # node 1 is NOT an immutable NULL seed — it gets labeled from 2.
        assert out == {2: ("en", 0), 1: ("en", 1)}

    def test_isolated_seed_kept(self, spark):
        edges = spark.createDataFrame([(4, 5)], EDGES)
        seeds = spark.createDataFrame([(9, "en"), (4, "fr")], SEEDS)
        out = {
            r.node: (r.label, r.round_assigned)
            for r in label_propagation(edges, seeds, rounds=1).collect()
        }
        assert out[9] == ("en", 0)
        assert out[5] == ("fr", 1)
