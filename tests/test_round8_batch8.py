"""Round-8 batch-8 query semantics: RFM quintile scoring, dedup-aware
corpus sizing, ship-SLA flags (fixture parity is covered by the oracle
harness; these pin hand-computable scoring edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
    q_customer_rfm,
    q_effective_corpus_size,
    q_supplier_ship_sla,
)


class TestCustomerRfm:
    def test_census_partitions_all_customers(self, spark):
        out = q_customer_rfm(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        import duckdb

        n_cust = duckdb.sql(
            "select count(distinct o_custkey) from "
            "'/root/testdata/sf0.001/orders.parquet'"
        ).fetchone()[0]
        assert sum(r["n_customers"] for r in rows) == n_cust
        for r in rows:
            assert 1 <= r["r_score"] <= 5
            assert 1 <= r["f_score"] <= 5
            assert 1 <= r["m_score"] <= 5

    def test_monetary_total_conserved(self, spark):
        out = q_customer_rfm(spark, "/root/testdata/sf0.001")
        total = out.agg(F.sum("total_monetary_cents")).first()[0]
        import duckdb

        expected = duckdb.sql(
            "select sum(cast(floor(o_totalprice * 100) as bigint)) from "
            "'/root/testdata/sf0.001/orders.parquet'"
        ).fetchone()[0]
        assert total == expected


class TestEffectiveCorpusSize:
    def test_invariants(self, spark):
        r = q_effective_corpus_size(spark, "/root/testdata/sf0.001").first()
        # reweighted <= canonical <= raw; clusters <= docs; all positive.
        assert 0 < r["reweighted_tokens"] <= r["canonical_tokens"] <= r["raw_tokens"]
        assert 0 < r["n_clusters"] <= r["n_docs"]

    def test_no_dups_means_all_equal(self, spark):
        # At sf0.001 if every doc is its own cluster the three counts
        # coincide; otherwise canonical < raw strictly. Either way the
        # relation n_docs - n_clusters = extra copies holds.
        r = q_effective_corpus_size(spark, "/root/testdata/sf0.001").first()
        extra = r["n_docs"] - r["n_clusters"]
        if extra == 0:
            assert r["canonical_tokens"] == r["raw_tokens"]
        else:
            assert r["canonical_tokens"] < r["raw_tokens"]


class TestSupplierShipSla:
    def test_every_supplier_reported_once(self, spark):
        out = q_supplier_ship_sla(spark, "/root/testdata/sf0.001")
        assert out.count() == out.select("l_suppkey").distinct().count()
        bad = out.filter(
            (F.col("p95_lag_days") < F.col("mean_lag_days") - 10000)
            | (F.col("late_ppm") < 0)
            | (F.col("late_ppm") > 1_000_000)
        )
        assert bad.count() == 0

    def test_flag_consistent_with_fleet(self, spark):
        rows = q_supplier_ship_sla(spark, "/root/testdata/sf0.001").collect()
        total = sum(r["n_shipments"] for r in rows)
        late = sum(r["late_ppm"] * r["n_shipments"] for r in rows)
        # fleet ppm reconstructed from the report (integer tolerance:
        # per-supplier ppm is floored, so the reconstruction is <= true)
        approx_fleet = late // total
        for r in rows:
            if r["late_ppm"] > approx_fleet + 1000:
                assert r["worse_than_fleet"]
