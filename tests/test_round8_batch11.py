"""Round-8 batch-11 semantics: ABC classification edges, join-skew
arithmetic, duplicate screen algebra (fixture parity is covered by the
oracle harness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
    q_join_skew_diagnosis,
    q_orders_dup_screen,
    q_part_abc_analysis,
)


class TestPartAbc:
    def test_classes_partition_revenue(self, spark):
        rows = q_part_abc_analysis(spark, "/root/testdata/sf0.001").collect()
        assert {r["abc_class"] for r in rows} <= {"A", "B", "C"}
        total_share = sum(r["share_ppm"] for r in rows)
        # floored shares: sum in (1e6 - 3, 1e6]
        assert 1_000_000 - 3 <= total_share <= 1_000_000
        by = {r["abc_class"]: r for r in rows}
        # Pareto shape: A holds <= 80% + one part's worth, and A's
        # per-part revenue dominates C's
        if "A" in by and "C" in by:
            assert (
                by["A"]["revenue_cents"] * by["C"]["n_parts"]
                > by["C"]["revenue_cents"] * by["A"]["n_parts"]
            )

    def test_part_count_conserved(self, spark):
        rows = q_part_abc_analysis(spark, "/root/testdata/sf0.001").collect()
        import duckdb

        n = duckdb.sql(
            "select count(distinct l_partkey) from "
            "'/root/testdata/sf0.001/lineitem.parquet'"
        ).fetchone()[0]
        assert sum(r["n_parts"] for r in rows) == n


class TestJoinSkewDiagnosis:
    def test_totals_reconcile_with_tables(self, spark):
        out = q_join_skew_diagnosis(spark, "/root/testdata/sf0.001")
        agg = out.agg(
            F.sum("left_rows").alias("l"),
            F.sum("right_rows").alias("r"),
            F.sum("est_pairs").alias("p"),
        ).first()
        import duckdb

        no = duckdb.sql(
            "select count(*) from '/root/testdata/sf0.001/orders.parquet'"
        ).fetchone()[0]
        nl = duckdb.sql(
            "select count(*) from '/root/testdata/sf0.001/lineitem.parquet'"
        ).fetchone()[0]
        true_pairs = duckdb.sql(
            "select count(*) from '/root/testdata/sf0.001/orders.parquet' o "
            "join '/root/testdata/sf0.001/lineitem.parquet' l "
            "on l.l_orderkey = o.o_orderkey"
        ).fetchone()[0]
        assert agg["l"] == no and agg["r"] == nl
        # est_pairs is EXACT join output size (sum of per-key products)
        assert agg["p"] == true_pairs

    def test_bucket_domain(self, spark):
        out = q_join_skew_diagnosis(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert all(0 <= r["bucket"] < 32 for r in rows)
        for r in rows:
            if r["top_key_ppm"] is not None:
                assert 0 < r["top_key_ppm"] <= 1_000_000


class TestOrdersDupScreen:
    def test_algebra(self, spark):
        r = q_orders_dup_screen(spark, "/root/testdata/sf0.001").first()
        import duckdb

        n_orders = duckdb.sql(
            "select count(*) from '/root/testdata/sf0.001/orders.parquet'"
        ).fetchone()[0]
        assert r["n_groups"] + r["excess_orders"] == n_orders
        assert r["dup_groups"] <= r["excess_orders"] or r["dup_groups"] == 0
        assert r["max_clone_group"] >= 1
