"""Round-10 fixes: negative-key normalization in the arithmetic-hash
sketch family (ADVICE r9: a negative key made the SQL ``%`` remainder
negative, so the Bloom probe's ``element_at`` silently read a word
from the END of the dense array — possible false negatives), plus the
inventory-totals drift guard (ADVICE r9: docs/COVERAGE.md totals aged
when rows were added; derive them from the registries instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
    cms_topk_audit,
)


class TestNegativeKeySketches:
    def test_bloom_no_false_negatives_on_negative_keys(self, spark):
        # Keys spanning both signs, including the minimum-ish range a
        # signed delta/diff column produces.
        members = spark.createDataFrame(
            [(-(10**12),), (-7919,), (-1,), (0,), (1,), (37,), (10**12,)],
            "k bigint",
        )
        bloom = bloom_build(members, key_col="k", bits=1 << 12, hashes=3)
        flagged = bloom_might_contain(
            members, bloom, key_col="k", bits=1 << 12, hashes=3
        )
        misses = flagged.filter(~F.col("bloom_pass")).count()
        assert misses == 0  # no false negatives, whatever the sign

    def test_bloom_bit_indices_in_range(self, spark):
        # The build side must never emit a negative word index (a
        # negative ``%`` remainder would); the whole bitmap fits in
        # [0, bits/32).
        members = spark.createDataFrame(
            [(-(10**15),), (-12345,), (98765,)], "k bigint"
        )
        bloom = bloom_build(members, key_col="k", bits=1 << 10, hashes=3)
        rows = bloom.agg(
            F.min("word_idx").alias("lo"), F.max("word_idx").alias("hi")
        ).first()
        assert rows["lo"] >= 0 and rows["hi"] < (1 << 10) // 32

    def test_cms_never_undercounts_negative_keys(self, spark):
        # CMS estimates are structurally >= exact — the contract that
        # broke if build and probe hashed a negative key differently.
        rows = [(k,) for k in (-5, -5, -5, -2, -2, 3, 3, 3, 3) * 10]
        df = spark.createDataFrame(rows, "user_id bigint")
        audit = cms_topk_audit(df, key_col="user_id", k=3)
        bad = audit.filter(F.col("over_n") < 0).count()
        assert bad == 0
        assert audit.count() == 3

    def test_positive_keys_bitmap_unchanged(self, spark):
        # The normalization is the identity for non-negative keys: the
        # word table equals the hand-computed pre-fix bitmap, so every
        # existing hash oracle stays bit-identical.
        keys = [3, 17, 4096]
        df = spark.createDataFrame([(k,) for k in keys], "k bigint")
        bloom = bloom_build(df, key_col="k", bits=1 << 8, hashes=3)
        got = {
            r["word_idx"]: r["word"] for r in bloom.collect()
        }
        expect: dict[int, int] = {}
        for k in keys:
            for j in range(3):
                bit = ((37 + 61 * j) * k + 13 + 7919 * j) % 1_000_000_007 % (
                    1 << 8
                )
                expect[bit // 32] = expect.get(bit // 32, 0) | (
                    1 << (bit % 32)
                )
        assert got == expect


class TestInventoryTotalsDrift:
    def test_coverage_totals_match_registries(self):
        # docs/COVERAGE.md's totals paragraph must carry the live
        # counts (ADVICE r9: it drifted to 208/195/13 while the
        # registries held 220/206/14). The regenerator writes the
        # numbers; this test pins them to the registries so adding a
        # query without regenerating the doc fails loudly.
        import os
        import re

        import __spark_entry__ as entry

        n_q = len(entry.queries())
        n_o = len(entry.oracle_sql())
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs",
            "COVERAGE.md",
        )
        text = open(path).read()
        m = re.search(
            r"Totals: \*\*(\d+) declared queries — (\d+) oracle-checked"
            r".*?(\d+)\s+hard-checked",
            text,
            re.S,
        )
        assert m, "COVERAGE.md totals paragraph not found"
        assert int(m.group(1)) == n_q, (
            f"COVERAGE.md says {m.group(1)} queries, registries hold {n_q}"
        )
        assert int(m.group(2)) == n_o
        assert int(m.group(3)) == n_q - n_o

    def test_driver_head_is_all_oracled(self):
        # VERDICT r9 ask #1: the ~50-entry driver draw window must hold
        # ONLY hash-oracled queries — audit-only queries live behind it
        # (their evidence is CORRECTNESS_full.json). Window size per
        # observed driver behavior: first 50 entries of queries().
        import __spark_entry__ as entry

        oracled = set(entry.oracle_sql())
        window = list(entry.queries())[:50]
        missing = [n for n in window if n not in oracled]
        assert missing == [], f"audit-only queries inside the draw window: {missing}"
