"""FLAC codec subset (operators/flac.py): exact round trips across
signal shapes, entropy-coding paths (Rice + escape), validation seams
(CRCs, MD5, truncation), and compression sanity. The Spark-side query
contract (hash parity of `multimodal_flac_roundtrip` against the
shared arithmetic oracle) is enforced by the oracle harness."""

from __future__ import annotations

import numpy as np
import pytest

from prioritizing_event_processing_with_apache_kafka_spark.operators.flac import (
    decode_flac,
    encode_flac,
)


def _synth(doc_id: int) -> np.ndarray:
    n = 64 + doc_id % 65
    i = np.arange(n, dtype=np.int64)
    return ((doc_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)


class TestRoundTrip:
    def test_synth_lattice_exact(self):
        for doc_id in (0, 1, 7, 64, 999, 123456):
            s = _synth(doc_id)
            rate, out = decode_flac(encode_flac(s, sample_rate=8000))
            assert rate == 8000
            assert np.array_equal(out, s)

    def test_signal_shapes_exact(self):
        rng = np.random.default_rng(5)
        cases = [
            np.arange(100, dtype=np.int16),            # ramp (order-1 wins)
            np.full(50, -1234, dtype=np.int16),        # CONSTANT subframe
            rng.integers(-32768, 32768, 500).astype(np.int16),  # noise
            (np.sin(np.linspace(0, 20, 300)) * 30000).astype(np.int16),
            np.array([32767, -32768] * 64, dtype=np.int16),  # max residuals
            np.zeros(16, dtype=np.int16),              # minimum blocksize
        ]
        for i, s in enumerate(cases):
            rate, out = decode_flac(encode_flac(s, sample_rate=44100))
            assert rate == 44100
            assert np.array_equal(out, s), f"case {i}"

    def test_compresses_predictable_signals(self):
        # the point of the fixed predictors: a linear ramp Rice-codes
        # far below raw PCM; full-range noise escapes to ~raw width
        ramp = np.arange(1000, dtype=np.int16)
        assert len(encode_flac(ramp)) < 1000 * 2 // 4
        rng = np.random.default_rng(9)
        noise = rng.integers(-32768, 32768, 1000).astype(np.int16)
        assert len(encode_flac(noise)) < 1000 * 2 * 1.25

    def test_deterministic(self):
        s = _synth(42)
        assert encode_flac(s) == encode_flac(s)

    def test_multi_frame_streams_exact(self):
        # long signals split into fixed-blocksize frames (last one
        # short), exercising the decoder's frame loop, per-frame CRCs,
        # and multi-byte UTF-8 frame numbers (3125 frames at bs=16)
        rng = np.random.default_rng(11)
        s = (np.cumsum(rng.integers(-50, 51, 50000)) % 30000).astype(
            np.int16
        )
        for bs in (16, 257, 4096):
            rate, out = decode_flac(
                encode_flac(s, sample_rate=22050, block_size=bs)
            )
            assert rate == 22050
            assert np.array_equal(out, s), bs
        # exact multiple of the block size (no short last frame)
        s2 = np.arange(8192, dtype=np.int16)
        assert np.array_equal(
            decode_flac(encode_flac(s2, block_size=2048))[1], s2
        )


class TestValidationSeams:
    def test_not_flac_raises(self):
        with pytest.raises(ValueError, match="fLaC"):
            decode_flac(b"RIFFnope")

    def test_frame_corruption_detected(self):
        s = (np.sin(np.linspace(0, 20, 300)) * 30000).astype(np.int16)
        payload = bytearray(encode_flac(s))
        # flip a bit inside the entropy-coded frame body: the CRC-16
        # (or the MD5 / a structural check) must refuse
        payload[60] ^= 0x40
        with pytest.raises((ValueError, NotImplementedError)):
            decode_flac(bytes(payload))

    def test_truncation_detected(self):
        payload = encode_flac(_synth(3))
        with pytest.raises(ValueError):
            decode_flac(payload[: len(payload) // 2])

    def test_input_validation(self):
        # int32 now means 24-bit (r12); unsupported dtypes still refuse
        with pytest.raises(ValueError, match="int16"):
            encode_flac(np.zeros(32, dtype=np.int8))
        with pytest.raises(ValueError, match="blocksize"):
            encode_flac(np.zeros(8, dtype=np.int16))

    def test_corrupted_subframe_type_refuses(self):
        # patch the subframe type bits to LPC order 1 (0b100000): the
        # LPC path now DECODES (r11 — the seam closed), so the patched
        # stream misparses into garbage the validation chain must
        # refuse (structural check or frame CRC-16), never return wrong
        s = np.arange(64, dtype=np.int16)
        payload = bytearray(encode_flac(s))
        # frame starts after fLaC(4) + block header(4) + streaminfo(34)
        # = byte 42; header is 14+1+1+4+4+4+3+1 bits = 4 bytes, then
        # 1 byte frame number, 2 bytes blocksize-1, 1 byte CRC-8 →
        # subframe header byte at 42+8 = 50
        sub = 50
        assert payload[sub] >> 7 == 0
        payload[sub] = 0b0100000 << 1 | (payload[sub] & 1)
        with pytest.raises((NotImplementedError, ValueError)):
            decode_flac(bytes(payload))

    def test_remaining_envelope_guards(self):
        # the honest seams left after r11: >2 channels and non-16-bit
        # sample sizes — patch STREAMINFO's channel field to 3ch (bits
        # 100-102 of the 34-byte block starting at byte 8)
        s = np.arange(64, dtype=np.int16)
        payload = bytearray(encode_flac(s))
        # STREAMINFO byte 12 within block (offset 8+12=20) holds
        # rate[3:0] | chan[2:0] | bps[4]; chan bits are 3:1
        payload[20] = (payload[20] & ~0b1110) | (0b010 << 1)  # 3 channels
        with pytest.raises(NotImplementedError, match="mono/stereo"):
            decode_flac(bytes(payload))


def _synth_stereo(doc_id: int) -> np.ndarray:
    from prioritizing_event_processing_with_apache_kafka_spark.operators.multimodal import (
        _synth_stereo_samples,
    )

    return _synth_stereo_samples(doc_id)


class TestStereoAndLpc:
    def test_fixture_roundtrip_exact_and_exercises_lpc_stereo(self):
        # The declared `multimodal_flac_lpc_roundtrip` fixture must not
        # just round-trip — it must actually DRIVE the new decode
        # paths: LPC subframes and a decorrelated channel assignment.
        total = {"lpc": 0}
        decor = 0
        for doc_id in (0, 1, 7, 64, 999, 123456):
            src = _synth_stereo(doc_id)
            stats: dict = {}
            rate, out = decode_flac(
                encode_flac(src, sample_rate=16000), stats
            )
            assert rate == 16000
            assert np.array_equal(out, src)
            total["lpc"] += stats["subframe_types"].get("lpc", 0)
            decor += sum(
                n for c, n in stats["chan_codes"].items() if c >= 0b1000
            )
        assert total["lpc"] > 0, "fixture never chose an LPC subframe"
        assert decor > 0, "fixture never chose a decorrelated assignment"

    def test_all_channel_assignments_roundtrip(self):
        # Force each assignment by signal construction: independent
        # (uncorrelated noise), left/side & mid/side (tiny side), and
        # right/side (right much cheaper than left).
        rng = np.random.default_rng(21)
        n = 400
        smooth = (np.sin(np.arange(n) / 9.0) * 14000).astype(np.int64)
        noise = rng.integers(-32768, 32768, n, dtype=np.int64)
        small = (np.arange(n) % 17 - 8).astype(np.int64)
        cases = {
            "independent": np.stack([noise, -noise[::-1]], axis=1),
            "tiny_side": np.stack([smooth, smooth - small], axis=1),
            "right_cheap": np.stack([noise // 2 + smooth, smooth], axis=1),
            "extremes": np.stack(
                [
                    np.where(np.arange(n) % 2 == 0, 32767, -32768),
                    np.where(np.arange(n) % 2 == 0, -32768, 32767),
                ],
                axis=1,
            ),
        }
        seen = set()
        for name, sig in cases.items():
            sig16 = np.clip(sig, -32768, 32767).astype(np.int16)
            stats: dict = {}
            rate, out = decode_flac(encode_flac(sig16), stats)
            assert np.array_equal(out, sig16), name
            seen |= set(stats["chan_codes"])
        # at least three distinct assignments across the shapes,
        # including one decorrelated mode
        assert len(seen) >= 3 and any(c >= 0b1000 for c in seen), seen

    def test_mid_side_parity_bit_exact(self):
        # mid/side drops the sum's low bit into the side channel's
        # parity; odd L+R sums are the reconstruction's edge case.
        l = np.array([1, 2, -3, 5] * 100, dtype=np.int64)
        r = np.array([0, -1, 4, 2] * 100, dtype=np.int64)  # odd sums
        sig = np.stack([l, r], axis=1).astype(np.int16)
        rate, out = decode_flac(encode_flac(sig))
        assert np.array_equal(out, sig)

    def test_stereo_multiframe_and_random(self):
        rng = np.random.default_rng(17)
        sig = rng.integers(-32768, 32768, (5000, 2)).astype(np.int16)
        for bs in (64, 999):
            rate, out = decode_flac(encode_flac(sig, block_size=bs))
            assert np.array_equal(out, sig), bs

    def test_stereo_compresses_correlated_signals(self):
        # the point of decorrelation + LPC: a correlated stereo pair
        # codes far below raw PCM
        t = np.arange(4000)
        l = (np.sin(t / 4.0) * 12000).astype(np.int64)
        sig = np.stack([l, l - (t % 13 - 6)], axis=1).astype(np.int16)
        payload = encode_flac(sig, block_size=1024)
        assert len(payload) < sig.size * 2 // 3

    def test_lpc_mono_roundtrip(self):
        # mono signals can pick LPC too (the planner is channel-blind)
        sig = _synth_stereo(123)[:, 0].copy()
        stats: dict = {}
        rate, out = decode_flac(encode_flac(sig), stats)
        assert np.array_equal(out, sig)
        assert stats["subframe_types"].get("lpc", 0) > 0

    def test_input_shape_validation(self):
        with pytest.raises(ValueError, match="shape"):
            encode_flac(np.zeros((32, 3), dtype=np.int16))


class Test24Bit:
    """Round-12 stretch (VERDICT r11 item 8): the 24-bit sample
    lattice — int32 input, 0b110 sample-size code, 25-bit side-channel
    warmups, 3-byte little-endian MD5 packing."""

    def _synth24(self, doc_id: int) -> np.ndarray:
        from prioritizing_event_processing_with_apache_kafka_spark.operators.multimodal import (
            _synth_stereo24_samples,
        )

        return _synth_stereo24_samples(doc_id)

    def test_fixture_roundtrip_exact_and_exercises_lpc_stereo(self):
        tot: dict = {}
        for doc_id in (0, 3, 17, 96, 500):
            src = self._synth24(doc_id)
            stats: dict = {}
            rate, out = decode_flac(
                encode_flac(src, sample_rate=48000), stats
            )
            assert rate == 48000
            assert out.dtype == np.int32
            assert np.array_equal(out, src)
            for k, v in stats.get("subframe_types", {}).items():
                tot[k] = tot.get(k, 0) + v
            for c in stats.get("chan_codes", {}):
                tot[f"chan{c}"] = 1
        assert tot.get("lpc", 0) > 0, tot  # genuinely drives 24-bit LPC
        assert any(k in tot for k in ("chan8", "chan9", "chan10")), tot

    def test_full_range_extremes_exact(self):
        lim = 1 << 23
        sig = np.array([-lim, lim - 1, -lim, lim - 1] * 512, dtype=np.int32)
        rate, out = decode_flac(encode_flac(sig))
        assert np.array_equal(out, sig)

    def test_random_24bit_mono_and_stereo(self):
        rng = np.random.default_rng(24)
        mono = rng.integers(-(1 << 23), 1 << 23, 4096, dtype=np.int32)
        rate, out = decode_flac(encode_flac(mono, block_size=777))
        assert np.array_equal(out, mono)
        st = rng.integers(-(1 << 23), 1 << 23, (3000, 2), dtype=np.int32)
        rate, out = decode_flac(encode_flac(st, block_size=512))
        assert np.array_equal(out, st)

    def test_true_24bit_content_in_low_byte(self):
        # content below the 16-bit lattice (odd low bytes) survives —
        # the decode is not a shifted 16-bit path
        sig = (np.arange(2048, dtype=np.int32) * 255 + 1) % (1 << 23)
        rate, out = decode_flac(encode_flac(sig.astype(np.int32)))
        assert np.array_equal(out, sig)

    def test_out_of_range_int32_refused(self):
        with pytest.raises(ValueError, match="24-bit"):
            encode_flac(np.full(64, 1 << 23, dtype=np.int32))
        with pytest.raises(ValueError, match="24-bit"):
            encode_flac(np.full(64, -(1 << 23) - 1, dtype=np.int32))

    def test_md5_packing_is_three_bytes_le(self):
        # a 24-bit stream's MD5 must be over 3-byte LE samples; verify
        # by construction against the reference packing
        import hashlib

        from prioritizing_event_processing_with_apache_kafka_spark.operators.flac import (
            _pack_samples_le,
        )

        sig = np.array([1, -1, 0x7FFFFF, -0x800000], dtype=np.int32)
        packed = _pack_samples_le(sig, 24)
        assert len(packed) == 12
        assert packed == bytes.fromhex("010000" + "ffffff" + "ffff7f" + "000080")
        payload = encode_flac(np.repeat(sig, 16))
        md5 = hashlib.md5(
            _pack_samples_le(np.repeat(sig, 16), 24)
        ).digest()
        assert md5 in payload  # STREAMINFO carries exactly this digest

    def test_unsupported_bit_depth_guards_remain(self):
        s = np.arange(64, dtype=np.int16)
        payload = bytearray(encode_flac(s))
        # STREAMINFO bps field: low bit of byte 20 + high 4 bits of
        # byte 21 — set bps-1 = 19 (20-bit) => guard must raise
        payload[20] = (payload[20] & ~1) | ((19 >> 4) & 1)
        payload[21] = (payload[21] & 0x0F) | ((19 & 0x0F) << 4)
        with pytest.raises(NotImplementedError, match="16/24-bit"):
            decode_flac(bytes(payload))
        with pytest.raises(ValueError, match="int16 .* or int32"):
            encode_flac(np.zeros(64, dtype=np.float32))
