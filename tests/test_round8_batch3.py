"""Round-8 batch-3 operator semantics: sequence packing, weighted
sampling, k-anonymity, M4 downsampling, vocabulary drift (fixture
parity is covered by the oracle harness; these pin hand-computable
cases and the properties the oracles can't express)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.packing import (
    pack_stats,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.quality import (
    k_anonymity_audit,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.sampling import (
    hash_u31,
    weighted_hash_sample,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.text import (
    vocab_drift,
)
from prioritizing_event_processing_with_apache_kafka_spark.operators.timeseries import (
    m4_downsample,
)


class TestPackStats:
    def test_hand_computed_single_shard(self, spark):
        # One shard, seq_len 4. Docs (id, tokens): (0,3),(8,2),(16,4)
        # stream: [0,3) [3,5) [5,9); boundaries at 4, 8:
        #   doc0 [0,3) within seq0; doc8 [3,5) crosses 4; doc16 [5,9)
        #   crosses 8. total=9, n_seq=3, tail_waste=3, fill=9e6//12
        df = spark.createDataFrame(
            [(0, "a b c"), (8, "d e"), (16, "f g h i")],
            "doc_id long, text string",
        )
        row = pack_stats(df, n_shards=8, seq_len=4).filter("shard = 0").first()
        assert row["n_docs"] == 3
        assert row["total_tokens"] == 9
        assert row["n_sequences"] == 3
        assert row["boundary_docs"] == 2
        assert row["tail_waste"] == 3
        assert row["fill_ppm"] == 9 * 1_000_000 // 12

    def test_exact_fit_has_no_waste(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c d"), (8, "e f g h")], "doc_id long, text string"
        )
        row = pack_stats(df, n_shards=8, seq_len=4).filter("shard = 0").first()
        assert row["tail_waste"] == 0
        assert row["boundary_docs"] == 0
        assert row["fill_ppm"] == 1_000_000

    def test_sharding_is_id_mod(self, spark):
        df = spark.createDataFrame(
            [(i, "x") for i in range(16)], "doc_id long, text string"
        )
        out = pack_stats(df, n_shards=8, seq_len=4)
        assert out.count() == 8
        assert out.agg(F.sum("n_docs")).first()[0] == 16

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_shards"):
            pack_stats(df, n_shards=0)
        with pytest.raises(ValueError, match="seq_len"):
            pack_stats(df, seq_len=0)


class TestWeightedHashSample:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "k long, w long, g string")

    def test_exactly_n_per_stratum_and_deterministic(self, spark):
        rows = [(i, 1 + i % 7, "g%d" % (i % 3)) for i in range(300)]
        df = self._docs(spark, rows)
        out1 = weighted_hash_sample(
            df, key="k", weight_col="w", strata_col="g", n=10
        )
        got1 = sorted((r["g"], r["k"]) for r in out1.collect())
        assert len(got1) == 30
        got2 = sorted(
            (r["g"], r["k"])
            for r in weighted_hash_sample(
                df.repartition(7), key="k", weight_col="w", strata_col="g", n=10
            ).collect()
        )
        assert got1 == got2  # partitioning-invariant

    def test_threshold_plan_equals_naive_rank(self, spark):
        # The scalable threshold path must select the exact rows the
        # naive full window would (the oracle replays the naive form).
        rows = [(i, 1 + (i * 13) % 50, "s") for i in range(500)]
        df = self._docs(spark, rows)
        out = sorted(
            r["k"]
            for r in weighted_hash_sample(
                df, key="k", weight_col="w", strata_col="g", n=15
            ).collect()
        )
        from pyspark.sql import Window

        score = F.floor(
            hash_u31("k").cast("double")
            / F.greatest(F.lit(1).cast("long"), F.col("w"))
        ).cast("long")
        naive = sorted(
            r["k"]
            for r in df.withColumn("s", score)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("g").orderBy("s", "k")
                ),
            )
            .filter("rn <= 15")
            .collect()
        )
        assert out == naive

    def test_weight_monotonicity(self, spark):
        # Two interleaved weight classes: heavy rows (w=1000) must be
        # overrepresented vs light rows (w=1) in the winner set.
        rows = [(i, 1000 if i % 2 == 0 else 1, "s") for i in range(2000)]
        out = weighted_hash_sample(
            self._docs(spark, rows), key="k", weight_col="w", strata_col="g", n=50
        ).collect()
        heavy = sum(1 for r in out if r["k"] % 2 == 0)
        assert heavy >= 45  # p(heavy) ~ 1000/1001 per slot

    def test_small_stratum_returns_all(self, spark):
        out = weighted_hash_sample(
            self._docs(spark, [(1, 5, "tiny"), (2, 5, "tiny")]),
            key="k", weight_col="w", strata_col="g", n=10,
        )
        assert out.count() == 2

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="n must be"):
            weighted_hash_sample(
                self._docs(spark, [(1, 1, "a")]),
                key="k", weight_col="w", strata_col="g", n=0,
            )


class TestKAnonymityAudit:
    def test_hand_computed(self, spark):
        # classes: (a,1)x3, (a,2)x1, (b,1)x2 → k=3: at-risk classes
        # {(a,2):1, (b,1):2} → rows_at_risk=3 of 6
        df = spark.createDataFrame(
            [("a", 1)] * 3 + [("a", 2)] + [("b", 1)] * 2, "q1 string, q2 int"
        )
        row = k_anonymity_audit(df, qi_cols=["q1", "q2"], k=3).first()
        assert row["n_rows"] == 6
        assert row["n_classes"] == 3
        assert row["min_class_size"] == 1
        assert row["max_class_size"] == 3
        assert row["classes_at_risk"] == 2
        assert row["rows_at_risk"] == 3
        assert row["at_risk_ppm"] == 500000

    def test_null_is_a_qi_value(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", None), ("a", 1)], "q1 string, q2 int"
        )
        row = k_anonymity_audit(df, qi_cols=["q1", "q2"], k=2).first()
        assert row["n_classes"] == 2
        assert row["rows_at_risk"] == 1  # only the ("a",1) singleton

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "q1 string")
        with pytest.raises(ValueError, match="k must be"):
            k_anonymity_audit(df, qi_cols=["q1"], k=1)
        with pytest.raises(ValueError, match="qi_cols"):
            k_anonymity_audit(df, qi_cols=[], k=5)


class TestM4Downsample:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "s string, ts timestamp, v double"
        )

    def test_anchors_and_ties(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def at(sec):
            return t0 + dt.timedelta(seconds=sec)

        # one bin; min value 1.0 attained at sec 10 and 40 → min_ts is
        # the EARLIEST; max 9.0 at 20 and 50 → max_ts the LATEST.
        rows = [
            ("s", at(10), 1.0), ("s", at(20), 9.0), ("s", at(30), 5.0),
            ("s", at(40), 1.0), ("s", at(50), 9.0),
        ]
        row = m4_downsample(
            self._df(spark, rows), series_col="s", ts_col="ts",
            value_col="v", bin_minutes=60,
        ).first()
        assert row["n_rows"] == 5
        assert row["first_ts"] == at(10) and row["first_value"] == 1.0
        assert row["last_ts"] == at(50) and row["last_value"] == 9.0
        assert row["min_value"] == 1.0 and row["min_ts"] == at(10)
        assert row["max_value"] == 9.0 and row["max_ts"] == at(50)
        assert row["bin_start"] == t0

    def test_null_values_excluded(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [("s", t0, None), ("s", t0 + dt.timedelta(seconds=1), 2.0)]
        row = m4_downsample(
            self._df(spark, rows), series_col="s", ts_col="ts",
            value_col="v", bin_minutes=60,
        ).first()
        assert row["n_rows"] == 1 and row["min_value"] == 2.0

    def test_bins_split_series(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("s", t0 + dt.timedelta(minutes=m), float(m)) for m in (0, 30, 61)
        ]
        out = m4_downsample(
            self._df(spark, rows), series_col="s", ts_col="ts",
            value_col="v", bin_minutes=60,
        )
        assert out.count() == 2

    def test_validation(self, spark):
        df = self._df(spark, [])
        with pytest.raises(ValueError, match="bin_minutes"):
            m4_downsample(
                df, series_col="s", ts_col="ts", value_col="v", bin_minutes=0
            )


class TestVocabDrift:
    def test_identical_halves_full_overlap(self, spark):
        # ids 0..3, mid=(0+3)//2=1 → early {0,1}, late {2,3}; same text
        # in both halves → overlap = vocabulary, jaccard 1e6.
        df = spark.createDataFrame(
            [(i, "alpha beta gamma", "s1") for i in range(4)],
            "doc_id long, text string, source string",
        )
        row = vocab_drift(df, top_k=5).first()
        assert row["n_early"] == 3 and row["n_late"] == 3
        assert row["overlap"] == 3
        assert row["jaccard_ppm"] == 1_000_000

    def test_disjoint_halves_zero_overlap(self, spark):
        df = spark.createDataFrame(
            [(0, "aa bb", "s1"), (1, "aa bb", "s1"),
             (2, "cc dd", "s1"), (3, "cc dd", "s1")],
            "doc_id long, text string, source string",
        )
        row = vocab_drift(df, top_k=5).first()
        assert row["overlap"] == 0 and row["jaccard_ppm"] == 0

    def test_top_k_is_count_then_term_ordered(self, spark):
        # early: zz×3, aa×1, bb×1 — with top_k=2 the set is {zz, aa}
        # (count desc, then term asc breaks the aa/bb tie).
        df = spark.createDataFrame(
            [(0, "zz zz zz aa bb", "s1"), (9, "zz aa cc", "s1")],
            "doc_id long, text string, source string",
        )
        row = vocab_drift(df, top_k=2).first()
        # early top2 {zz, aa}; late top2 of zz,aa,cc (all ×1) → {aa, cc}
        assert row["overlap"] == 1  # aa
        assert row["n_early"] == 2 and row["n_late"] == 2

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(0, "x", "s")], "doc_id long, text string, source string"
        )
        with pytest.raises(ValueError, match="top_k"):
            vocab_drift(df, top_k=0)
