"""Round-11 fixes: the MG exactness certificate (ADVICE r10 — a true
top-k key dropped by decrements must never go silently missing; the
readout now certifies against the decrement bound and falls back to a
full exact recount), the JPEG AC-refinement band-overrun guard (ADVICE
r10 — refuse, don't silently drop a pending coefficient), the FLAC
escape-cost model (ADVICE r10 — the escape partition pays a 5-bit
width field the Rice partition doesn't), and the registry-derived
pinned-fingerprint count (VERDICT r10 "what's wrong" #2)."""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFingerprintCountDerived:
    def test_coverage_fingerprint_count_matches_registry(self):
        # The round-10 commit message hand-wrote "131 pinned" while the
        # registry held 129. The count now lives in docs/COVERAGE.md and
        # is pinned here to len(tests/plan_fingerprints.json) so it can
        # never drift from the registry again.
        n = len(json.load(open(os.path.join(REPO, "tests", "plan_fingerprints.json"))))
        text = open(os.path.join(REPO, "docs", "COVERAGE.md")).read()
        m = re.search(r"(\d+) pinned plan fingerprints", text)
        assert m, "COVERAGE.md fingerprint-count sentence not found"
        assert int(m.group(1)) == n, (
            f"COVERAGE.md says {m.group(1)} pinned fingerprints, "
            f"tests/plan_fingerprints.json holds {n}"
        )


class TestJpegRefinementGuard:
    def test_ac_refinement_run_past_band_end_raises(self):
        # Hand-built refinement scan: symbol 0xF1 (zero-run 15, one
        # newly-significant coefficient) against an all-zero-history
        # band of width 3 — the run overruns the band with the
        # coefficient still pending. The decoder must refuse (like the
        # AC-first pass's 'AC run past band end'), not drop it.
        from prioritizing_event_processing_with_apache_kafka_spark.operators.jpeg import (
            _decode_prog_scan,
        )

        coefs = {1: np.zeros((1, 64), dtype=np.int32)}
        htables = {(1, 0): {(1, 0): 0xF1}}  # 1-bit code 0 -> (r=15, s=1)
        with pytest.raises(ValueError, match="refinement run past band end"):
            _decode_prog_scan(
                b"\x00\x00\x00",  # code bit 0, sign bit 0, padding
                [(1, 0, 0)],
                coefs,
                {},
                htables,
                ss=1,
                se=3,
                ah=1,
                al=0,
            )

    def test_ac_refinement_in_band_still_decodes(self):
        # Control: the same symbol with enough band left places the
        # coefficient (run 0 via symbol 0x01 -> immediate placement).
        from prioritizing_event_processing_with_apache_kafka_spark.operators.jpeg import (
            _decode_prog_scan,
        )

        coefs = {1: np.zeros((1, 64), dtype=np.int32)}
        # 1-bit code 0 -> (r=0, s=1): place +/-1 at k=ss immediately,
        # then an EOB symbol would be needed; band of width 1 ends the
        # block right after placement.
        htables = {(1, 0): {(1, 0): 0x01}}
        _decode_prog_scan(
            b"\x40",  # code bit 0 selects 0x01; next bit 1 -> val = +1
            [(1, 0, 0)],
            coefs,
            {},
            htables,
            ss=1,
            se=1,
            ah=1,
            al=0,
        )
        assert coefs[1][0, 1] == 1


class TestFlacEscapeCost:
    def test_cost_model_includes_width_field(self):
        # The in-between regime: Rice total within 5 bits above the raw
        # total used to flip to escape even though escape's 5-bit width
        # field made it the WIDER encoding. Whatever the chooser picks,
        # the round trip must stay exact — and for a deliberately
        # high-entropy signal (escape regime) and a smooth signal (Rice
        # regime) both paths are exercised.
        from prioritizing_event_processing_with_apache_kafka_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        rng = np.random.default_rng(11)
        noisy = rng.integers(-32768, 32767, 4096, dtype=np.int16)
        smooth = (
            (np.sin(np.arange(4096) / 50.0) * 12000).round().astype(np.int16)
        )
        for sig in (noisy, smooth):
            rate, out = decode_flac(encode_flac(sig, sample_rate=8000))
            assert rate == 8000
            np.testing.assert_array_equal(out, sig)


class TestMgExactTopkCertificate:
    def test_fallback_recovers_decremented_heavy_hitter(self, spark, tmp_path):
        # capacity=2 over 12 distinct keys: the summary decrements
        # aggressively (err_bound > 0) and the candidates-only recount
        # is NOT certifiably complete — the readout must fall back to
        # the full exact recount and still return the true top-k.
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.mgstate import (
            mg_apply_batch,
            mg_exact_topk,
            mg_state_meta,
        )

        rows = []
        # near-uniform noise: keys 100..110, 5 each
        for k in range(100, 111):
            rows += [(k,)] * 5
        # the true heavy hitter, only modestly above the noise floor
        rows += [(7,)] * 8
        src = spark.createDataFrame(rows, "user_id bigint")
        state = str(tmp_path / "state")
        mg_apply_batch(
            src, state_path=state, key_col="user_id", capacity=2, batch_id=0
        )
        err = mg_state_meta(spark, state).collect()[0]["err_bound"]
        assert err > 0, "fixture must exercise the decrement path"
        got = mg_exact_topk(
            spark, state, src, key_col="user_id", k=3
        ).collect()
        expect = (
            src.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy(F.desc("n_events"), F.asc("user_id"))
            .limit(3)
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in expect]

    def test_certified_path_skips_full_recount(self, spark, tmp_path):
        # capacity >= distinct keys: zero decrements, err_bound 0, the
        # candidates-only recount is certified and must equal the exact
        # answer without any fallback.
        from prioritizing_event_processing_with_apache_kafka_spark.streaming.mgstate import (
            mg_apply_batch,
            mg_exact_topk,
            mg_state_meta,
        )

        rows = [(k,) for k in (1, 1, 1, 2, 2, 3)]
        src = spark.createDataFrame(rows, "user_id bigint")
        state = str(tmp_path / "state")
        mg_apply_batch(
            src, state_path=state, key_col="user_id", capacity=64, batch_id=0
        )
        assert mg_state_meta(spark, state).collect()[0]["err_bound"] == 0
        got = mg_exact_topk(spark, state, src, key_col="user_id", k=2).collect()
        assert [(r["user_id"], r["n_events"]) for r in got] == [(1, 3), (2, 2)]


class TestBenchAdjudication:
    """bench.py's self-adjudication vs the committed reference series
    (VERDICT r10 item 1): the r10 driver artifact read 1.32x the solo
    series from machine contention alone, and the explanation lived
    only in builder forensics — the adjudicator now produces it at
    measurement time. Per-query ratios are normalized by the FLEET
    median ratio first (r11 observed the whole VM run ~1.7x slower
    than the reference epoch — untouched trivial queries shifted
    exactly like heavy ones), so a machine-wide shift reads
    ambient_slowdown instead of mass per-query drift."""

    def _bench(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(REPO, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_within_band(self):
        b = self._bench()
        ref = {"round": "rX", "queries": {"a": 1.0, "b": 2.0}}
        adj = b.adjudicate(
            {"a": 1.02, "b": 2.05}, {"a": [1.0, 1.1], "b": [2.0, 2.1]}, ref
        )
        assert adj["verdict"] == "within_band"
        assert adj["common"] == 2 and adj["divergent"] == {}

    def test_ambient_slowdown_when_fleet_shifts_together(self):
        # the r11 shape: EVERY query ~1.7x its reference — the machine
        # moved, not the plans; no per-query flag survives the fleet
        # normalization
        b = self._bench()
        ref = {"round": "rX", "queries": {f"q{i}": 1.0 + i * 0.2 for i in range(10)}}
        adj = b.adjudicate(
            {f"q{i}": (1.0 + i * 0.2) * 1.7 for i in range(10)},
            {f"q{i}": [(1.0 + i * 0.2) * 1.6, (1.0 + i * 0.2) * 1.8] for i in range(10)},
            ref,
        )
        assert adj["verdict"] == "ambient_slowdown"
        assert adj["divergent"] == {}
        assert abs(adj["fleet_median_ratio"] - 1.7) < 0.01

    def test_contention_suspected_when_minima_recover(self):
        # fleet steady, two queries spike 2-3x but their same-session
        # minima still reach historical speed — load, not shape
        b = self._bench()
        q = {f"s{i}": 1.0 for i in range(8)}
        q.update({"a": 2.0, "b": 1.5})
        now = {f"s{i}": 1.02 for i in range(8)}
        now.update({"a": 5.0, "b": 4.3})
        spreads = {f"s{i}": [1.0, 1.1] for i in range(8)}
        spreads.update({"a": [2.1, 5.5], "b": [1.6, 4.8]})
        adj = b.adjudicate(now, spreads, {"round": "rX", "queries": q})
        assert adj["verdict"] == "contention_suspected_plans_unchanged"
        assert set(adj["divergent"]) == {"a", "b"}

    def test_plan_drift_when_minimum_never_recovers(self):
        b = self._bench()
        q = {f"s{i}": 1.0 for i in range(8)}
        q["a"] = 2.0
        now = {f"s{i}": 1.0 for i in range(8)}
        now["a"] = 5.0
        spreads = {f"s{i}": [0.95, 1.1] for i in range(8)}
        spreads["a"] = [4.8, 5.5]
        adj = b.adjudicate(now, spreads, {"round": "rX", "queries": q})
        assert adj["verdict"] == "plan_drift_suspected"

    def test_absolute_floor_ignores_subsecond_noise(self):
        # 3x on a 0.1 s query is scheduler noise, not divergence
        b = self._bench()
        ref = {"round": "rX", "queries": {"a": 0.1, "b": 10.0, "c": 5.0}}
        adj = b.adjudicate(
            {"a": 0.3, "b": 10.1, "c": 5.05},
            {"a": [0.1, 0.4], "b": [9.9, 10.3], "c": [5.0, 5.2]},
            ref,
        )
        assert adj["divergent"] == {}

    def test_reference_artifact_is_committed_and_coherent(self):
        path = os.path.join(REPO, "docs", "artifacts", "bench_reference.json")
        ref = json.load(open(path))
        assert ref["sf"] == 0.1 and len(ref["queries"]) >= 100
        # every reference query must still be a declared bench headline
        # (a renamed/dropped headline would silently shrink the common
        # set the adjudication reads)
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(REPO, "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        missing = [n for n in ref["queries"] if n not in mod.HEADLINE]
        assert missing == [], f"reference queries not in HEADLINE: {missing}"
