"""Streaming mergeable Misra-Gries state (streaming/mgstate.py): merge
algebra, crash-replay idempotence, split invariance of the final
answer, the truncation/decrement path at tiny capacity, and the MG
completeness/weight invariants. The twin contract itself (fixture hash
parity of `stream_heavy_hitters` vs the shared batch
`heavy_hitter_users` oracle) is enforced by the oracle harness."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from prioritizing_event_processing_with_apache_kafka_spark.streaming.mgstate import (
    mg_apply_batch,
    mg_state_candidates,
    mg_state_meta,
)


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "state")


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k bigint")


def _cands(spark, store):
    return {
        r.k: r.mg_weight for r in mg_state_candidates(spark, store).collect()
    }


def _meta(spark, store):
    row = mg_state_meta(spark, store).first()
    return row.err_bound, row.total_rows


# Skewed synthetic stream: key 0 dominates, a long uniform tail.
KEYS = [0] * 120 + [1] * 40 + [2] * 25 + list(range(3, 60)) * 3


class TestMgAlgebra:
    def test_exact_when_capacity_covers_cardinality(self, spark, store):
        mg_apply_batch(
            _df(spark, KEYS[:100]), state_path=store, key_col="k",
            capacity=1024, batch_id=0,
        )
        mg_apply_batch(
            _df(spark, KEYS[100:]), state_path=store, key_col="k",
            capacity=1024, batch_id=1,
        )
        err, rows = _meta(spark, store)
        assert err == 0 and rows == len(KEYS)
        assert _cands(spark, store) == dict(Counter(KEYS))

    def test_split_invariance_of_candidates_plus_bound(self, spark, store):
        # Different batch boundaries may shift individual weights, but
        # the MG INVARIANT (true - err <= w <= true; every key with
        # true > err is a candidate) must hold for every split.
        true = Counter(KEYS)
        for i, split in enumerate((50, 137, 200)):
            s = f"{store}-{i}"
            mg_apply_batch(
                _df(spark, KEYS[:split]), state_path=s, key_col="k",
                capacity=16, batch_id=0,
            )
            mg_apply_batch(
                _df(spark, KEYS[split:]), state_path=s, key_col="k",
                capacity=16, batch_id=1,
            )
            err, rows = _meta(spark, s)
            cands = _cands(spark, s)
            assert rows == len(KEYS)
            assert len(cands) <= 16
            for k, w in cands.items():
                assert w <= true[k]
                assert true[k] - w <= err
            for k, t in true.items():
                if t > err:
                    assert k in cands, (k, t, err)

    def test_truncation_bounds_state_size(self, spark, store):
        # 57 distinct keys through capacity 8: every version's kept-key
        # count stays <= 8 and the decrement total surfaces.
        mg_apply_batch(
            _df(spark, KEYS), state_path=store, key_col="k",
            capacity=8, batch_id=0,
        )
        mg_apply_batch(
            _df(spark, KEYS), state_path=store, key_col="k",
            capacity=8, batch_id=1,
        )
        cands = _cands(spark, store)
        err, rows = _meta(spark, store)
        assert len(cands) <= 8
        assert err > 0
        assert rows == 2 * len(KEYS)
        # the dominant key must survive truncation (240 > any possible
        # decrement of this 484-row stream at capacity 8)
        assert 0 in cands

    def test_crash_replay_idempotent(self, spark, store):
        mg_apply_batch(
            _df(spark, KEYS[:100]), state_path=store, key_col="k",
            capacity=16, batch_id=0,
        )
        mg_apply_batch(
            _df(spark, KEYS[100:]), state_path=store, key_col="k",
            capacity=16, batch_id=1,
        )
        before = (_cands(spark, store), _meta(spark, store))
        # foreachBatch is at-least-once: replaying batch 1 re-reads the
        # same parent version and rewrites the same partition.
        mg_apply_batch(
            _df(spark, KEYS[100:]), state_path=store, key_col="k",
            capacity=16, batch_id=1,
        )
        after = (_cands(spark, store), _meta(spark, store))
        assert before == after

    def test_null_keys_ignored(self, spark, store):
        df = spark.createDataFrame(
            [(None,), (1,), (1,), (2,)], "k bigint"
        )
        mg_apply_batch(
            df, state_path=store, key_col="k", capacity=8, batch_id=0
        )
        assert _cands(spark, store) == {1: 2, 2: 1}
        err, rows = _meta(spark, store)
        # NULL keys never enter the summary or the row accounting
        # (misra_gries_partial drops them before counting)
        assert err == 0 and rows == 3

    def test_capacity_validation(self, spark, store):
        with pytest.raises(ValueError, match="capacity"):
            mg_apply_batch(
                _df(spark, [1]), state_path=store, key_col="k",
                capacity=0, batch_id=0,
            )
