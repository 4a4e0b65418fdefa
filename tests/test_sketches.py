"""Mergeable-sketch operators: estimates stay within their published
error bounds and merging cell sketches agrees with single-pass
sketching — the property that makes the rollup pattern trustworthy."""

from __future__ import annotations

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators import sketches as S


class TestHllRollup:
    def test_rollup_estimate_matches_exact_within_bound(self, spark):
        # 10k keys across 20 cells in 2 groups; lgk=14 keeps HLL in
        # sparse mode at this cardinality so the estimate is near-exact,
        # but assert only the published ~1.6% bound (3 sigma).
        df = spark.range(10_000).select(
            (F.col("id") % 2).cast("string").alias("g"),
            (F.col("id") % 10).alias("cell"),
            F.col("id").alias("k"),
        )
        out = S.hll_distinct_rollup(df, key_col="k", group_col="g", cell_col="cell")
        rows = {r["g"]: r for r in out.collect()}
        assert set(rows) == {"0", "1"}
        for r in rows.values():
            assert r["exact_distinct"] == 5_000
            assert abs(r["rel_error_pct"]) <= 5.0
            # id%2 fixes parity, so each group hits only the 5 matching
            # id%10 cells
            assert r["n_cells"] == 5

    def test_merged_rollup_equals_single_pass(self, spark):
        # Splitting into cells then merging must estimate the same set
        # as sketching the group in one pass.
        df = spark.range(8_000).select(
            F.lit("g").alias("g"),
            (F.col("id") % 16).alias("cell"),
            (F.col("id") % 3_000).alias("k"),  # duplicate keys across cells
        )
        rollup = S.hll_distinct_rollup(
            df, key_col="k", group_col="g", cell_col="cell"
        ).collect()[0]
        single = (
            df.agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(F.col("k"), F.lit(14))
                ).alias("est")
            ).collect()[0]["est"]
        )
        assert abs(rollup["est_distinct"] - single) / single <= 0.02
        assert rollup["exact_distinct"] == 3_000


class TestThetaOverlap:
    def test_known_overlap_exact_at_small_cardinality(self, spark):
        # A = {0..599}, B = {400..999} → overlap 200, union 1000,
        # A-only 400. Theta sketches are exact below the sampling
        # threshold, and the audit columns must agree.
        rows = [(k, "a") for k in range(600)] + [(k, "b") for k in range(400, 1000)]
        df = spark.createDataFrame(rows, "k long, s string")
        out = S.theta_set_overlap(
            df, key_col="k", set_col="s", left_value="a", right_value="b"
        ).collect()[0]
        assert out["exact_overlap"] == 200
        assert out["exact_union"] == 1_000
        assert out["exact_left_only"] == 400
        assert out["est_overlap"] == 200
        assert out["est_union"] == 1_000
        assert out["est_left_only"] == 400

    def test_empty_population_is_zero_not_null(self, spark):
        # theta_sketch_agg over zero rows yields a NULL sketch; the
        # operator must degrade it to the empty set (0s), not NULL-
        # poison the set algebra. Three cases: right empty, left
        # empty, both empty.
        rows = [(k, "a") for k in range(100)]
        df = spark.createDataFrame(rows, "k long, s string")
        right_empty = S.theta_set_overlap(
            df, key_col="k", set_col="s", left_value="a", right_value="zzz"
        ).collect()[0]
        assert right_empty["est_overlap"] == 0
        assert right_empty["est_union"] == 100
        assert right_empty["est_left_only"] == 100
        assert right_empty["exact_overlap"] == 0
        assert right_empty["exact_union"] == 100
        assert right_empty["exact_left_only"] == 100
        left_empty = S.theta_set_overlap(
            df, key_col="k", set_col="s", left_value="zzz", right_value="a"
        ).collect()[0]
        assert left_empty["est_overlap"] == 0
        assert left_empty["est_union"] == 100
        assert left_empty["est_left_only"] == 0
        both_empty = S.theta_set_overlap(
            df, key_col="k", set_col="s", left_value="x", right_value="y"
        ).collect()[0]
        assert both_empty["est_overlap"] == 0
        assert both_empty["est_union"] == 0
        assert both_empty["est_left_only"] == 0
        assert both_empty["exact_overlap"] == 0
        assert both_empty["exact_union"] == 0
        assert both_empty["exact_left_only"] == 0


class TestKllQuantiles:
    def test_quantiles_within_rank_tolerance(self, spark):
        # Uniform 0..9999 → p50 ≈ 5000, p90 ≈ 9000. KLL k=200 gives
        # ~1.65% normalized rank error; on a uniform distribution rank
        # error ≈ value error, so 3% is a safe bound.
        df = spark.range(10_000).select(
            F.lit("g").alias("g"),
            (F.col("id") % 8).alias("cell"),
            F.col("id").cast("double").alias("v"),
        )
        out = S.kll_value_quantiles(
            df, value_col="v", group_col="g", cell_col="cell"
        ).collect()[0]
        assert abs(out["est_p50"] - out["exact_p50"]) <= 300
        assert abs(out["est_p90"] - out["exact_p90"]) <= 300
        assert out["n_cells"] == 8

    def test_single_cell_group_merges(self, spark):
        # The fold's slice(…, 2, size-1) edge case: one cell → slice is
        # empty and the init sketch alone must survive.
        df = spark.range(100).select(
            F.lit("g").alias("g"), F.lit(0).alias("cell"),
            F.col("id").cast("double").alias("v"),
        )
        out = S.kll_value_quantiles(
            df, value_col="v", group_col="g", cell_col="cell"
        ).collect()[0]
        assert out["n_cells"] == 1
        assert out["est_p50"] is not None
