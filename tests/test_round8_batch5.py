"""Round-8 batch-5 operator semantics: k-core peeling, source overlap
census, decile drift (fixture parity is covered by the oracle harness;
these pin hand-computable cases and the properties the oracles can't
express — peel cascades deeper than the oracle unroll, convergence
failure, per-group fence isolation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.dedup import (
    source_overlap_matrix,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.graph import (
    ConvergenceError,
    kcore,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.quality import (
    decile_drift,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "x long, y long")


class TestKcore:
    def test_triangle_plus_tail(self, spark):
        # Triangle 1-2-3 plus a tail 3-4: 4 has degree 1 and peels;
        # after the peel 1,2,3 all keep degree 2.
        out = kcore(_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]), k=2)
        rows = {r["node"]: r["core_degree"] for r in out.collect()}
        assert rows == {1: 2, 2: 2, 3: 2}

    def test_cascading_peel(self, spark):
        # Path 1-2-3-4-5 with k=2: endpoints peel, exposing new
        # endpoints — cascades to an empty core (deeper than one
        # round, the case the unrolled oracle depth must cover).
        out = kcore(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), k=2)
        assert out.count() == 0

    def test_k1_keeps_everything_with_an_edge(self, spark):
        out = kcore(_edges(spark, [(1, 2), (3, 4)]), k=1)
        assert out.count() == 4

    def test_two_cliques_both_survive(self, spark):
        tri1 = [(1, 2), (2, 3), (1, 3)]
        tri2 = [(7, 8), (8, 9), (7, 9)]
        out = kcore(_edges(spark, tri1 + tri2 + [(3, 7)]), k=2)
        assert out.count() == 6

    def test_convergence_error(self, spark):
        # A 6-path with k=2 peels one endpoint pair per round — more
        # rounds than max_rounds=1 allows.
        with pytest.raises(ConvergenceError):
            kcore(
                _edges(spark, [(i, i + 1) for i in range(1, 7)]),
                k=2,
                max_rounds=1,
            )

    def test_validation(self, spark):
        e = _edges(spark, [(1, 2)])
        with pytest.raises(ValueError, match="k must"):
            kcore(e, k=0)
        with pytest.raises(ValueError, match="max_rounds"):
            kcore(e, k=2, max_rounds=0)


class TestSourceOverlapMatrix:
    def test_unordered_fold_and_mean(self, spark):
        docs = spark.createDataFrame(
            [(1, "A"), (2, "B"), (3, "A"), (4, "B")],
            "doc_id long, source string",
        )
        # pairs (1,2) A-B j=0.5, (2,3) B-A j=0.7, (1,3) A-A j=1.0:
        # A-B folds both directions: n=2, mean = (500000+700000) DIV 2.
        pairs = spark.createDataFrame(
            [(1, 2, 0.5), (2, 3, 0.7), (1, 3, 1.0)],
            "x long, y long, jaccard double",
        )
        out = {
            (r["source_a"], r["source_b"]): r
            for r in source_overlap_matrix(pairs, docs).collect()
        }
        assert out[("A", "B")]["n_pairs"] == 2
        assert out[("A", "B")]["mean_jaccard_ppm"] == 600_000
        assert out[("A", "A")]["n_pairs"] == 1
        assert out[("A", "A")]["mean_jaccard_ppm"] == 1_000_000

    def test_empty_pairs(self, spark):
        docs = spark.createDataFrame([(1, "A")], "doc_id long, source string")
        pairs = spark.createDataFrame([], "x long, y long, jaccard double")
        assert source_overlap_matrix(pairs, docs).count() == 0


class TestDecileDrift:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "g string, ts string, value double"
        ).select("g", F.col("ts").cast("timestamp").alias("ts"), "value")

    def test_identical_halves_have_zero_gap(self, spark):
        rows = []
        for h, half in ((0, "early"), (12, "late")):
            for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0]):
                rows.append(("g", f"2024-01-01 {h + i % 12:02d}:00:00", v))
        out = decile_drift(
            self._df(spark, rows), group_col="g", ts_col="ts", value_col="value"
        )
        assert out.filter("gap_ppm != 0").count() == 0

    def test_shifted_late_half_flags_gap(self, spark):
        rows = [("g", f"2024-01-01 0{i}:00:00", float(i + 1)) for i in range(5)]
        rows += [
            ("g", f"2024-01-01 2{i}:00:00", float(i + 100)) for i in range(4)
        ]
        out = decile_drift(
            self._df(spark, rows), group_col="g", ts_col="ts", value_col="value"
        ).collect()
        # every late value lands above the early p90 fence: the top bin
        # holds all the late mass.
        top = [r for r in out if r["bin"] == 9][0]
        assert top["late_ppm"] == 1_000_000
        assert sum(r["late_n"] for r in out) == 4

    def test_bins_span_zero_to_nine(self, spark):
        rows = [
            ("g", f"2024-01-01 {i:02d}:30:00", float(i)) for i in range(20)
        ]
        out = decile_drift(
            self._df(spark, rows), group_col="g", ts_col="ts", value_col="value"
        )
        bins = [r["bin"] for r in out.collect()]
        # bin 0 holds values strictly below the p10 disc fence — the
        # minimum early value IS that fence, so the occupied range here
        # is 1..9 (9 fences -> 10 possible bins, top bin reachable).
        assert max(bins) == 9 and len(set(bins)) >= 8

    def test_groups_use_their_own_fences(self, spark):
        # Group h's values are 100x group g's; if fences leaked across
        # groups every h row would pile into bin 9 / g into bin 0.
        rows = [
            (g, f"2024-01-01 {i:02d}:30:00", float(i) * mult)
            for g, mult in (("g", 1.0), ("h", 100.0))
            for i in range(1, 11)
        ]
        out = decile_drift(
            self._df(spark, rows), group_col="g", ts_col="ts", value_col="value"
        )
        per_group_bins = (
            out.groupBy("g").agg(F.countDistinct("bin").alias("nb")).collect()
        )
        assert all(r["nb"] > 1 for r in per_group_bins)
