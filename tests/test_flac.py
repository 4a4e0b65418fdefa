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
        with pytest.raises(ValueError, match="int16"):
            encode_flac(np.zeros(32, dtype=np.int32))
        with pytest.raises(ValueError, match="blocksize"):
            encode_flac(np.zeros(8, dtype=np.int16))

    def test_lpc_seam_raises_not_implemented(self):
        # patch the subframe type bits to LPC order 1 (0b100000): the
        # decoder must refuse through the documented seam, not misparse
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
