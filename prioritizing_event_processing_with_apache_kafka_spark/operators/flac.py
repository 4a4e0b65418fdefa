"""FLAC codec subset — pure numpy/stdlib, no codec library.

Closes part of the VERDICT "entropy-coded codec families" seam with a
LOSSLESS entropy-coded format (the others — MP3/AAC/H.264 — need
psychoacoustic/DSP machinery this container has no libraries for, and
are lossy anyway). Rice/Golomb coding IS entropy coding: residuals
get variable-length codes sized to their magnitude distribution, so
this exercises the same bit-serial machinery as the JPEG Huffman path
— but because FLAC is lossless, the round trip is EXACT and the
carrying query is hash-oracled (DuckDB replays the synth lattice
arithmetically), a strictly stronger check than the lossy codecs'
error-envelope audits.

Implemented from the public FLAC format specification (xiph.org /
RFC 9639):

- ``encode_flac``: mono 16-bit, one frame per ``block_size`` samples
  (fixed blocking strategy, UTF-8-coded frame numbers). fLaC marker +
  STREAMINFO (with the spec's MD5 of the unencoded samples), fixed-
  blocksize frames with CRC-8-guarded headers and CRC-16-guarded
  bodies, one subframe per frame: CONSTANT for flat signals, else the best
  FIXED predictor (orders 0–4, chosen by summed residual magnitude —
  the standard encoder heuristic) with partitioned-Rice residual
  coding (partition order 0, optimal 4-bit Rice parameter, escape to
  raw bits when Rice would be wider).
- ``decode_flac``: parses the marker, STREAMINFO, skips other
  metadata blocks, validates frame-header CRC-8, frame CRC-16 and the
  stream MD5, and reconstructs CONSTANT / VERBATIM / FIXED subframes
  (LPC subframes and stereo channel assignments raise through the
  explicit ``NotImplementedError`` seam rather than decoding wrong).

Determinism: everything is integer arithmetic with a fixed operation
order, so encode and decode are bit-reproducible across runs and
partitions. The codec runs inside Arrow-batched ``mapInPandas``
(``multimodal.py``), partition-parallel with zero driver involvement.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac", "decode_flac"]

# Fixed-predictor coefficients (FLAC spec §Fixed Predictors): residual
# r[i] = x[i] - Σ coef_j · x[i-1-j].
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x^1 + x^0 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + x^0 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    """MSB-first bit writer (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of the NEXT byte to load
        self.acc = 0
        self.nbits = 0

    def read(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= length
        v = (self.acc >> self.nbits) & ((1 << length) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        # drop any partial bits (they must be zero padding)
        self.acc &= (1 << self.nbits) - 1

    def byte_pos(self) -> int:
        return self.pos - self.nbits // 8


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _utf8_code(value: int) -> bytes:
    """The UTF-8-style frame-number coding FLAC frame headers use."""
    if value < 0x80:
        return bytes([value])
    if value < 0x800:
        return bytes([0xC0 | (value >> 6), 0x80 | (value & 0x3F)])
    if value < 0x10000:
        return bytes(
            [
                0xE0 | (value >> 12),
                0x80 | ((value >> 6) & 0x3F),
                0x80 | (value & 0x3F),
            ]
        )
    raise ValueError(f"frame number {value} not encodable here")


def encode_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    block_size: int = 65535,
) -> bytes:
    """Encode a mono int16 sample vector as a FLAC stream — one frame
    per ``block_size`` samples (fixed blocking strategy; the last
    frame may be shorter, per the format). Lossless:
    ``decode_flac(encode_flac(s)) == s`` exactly."""
    if samples.dtype != np.int16:
        raise ValueError(f"int16 samples required, got {samples.dtype}")
    n = len(samples)
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size {block_size} outside 16..65535")
    if n < 16:
        raise ValueError(f"blocksize {n} outside the supported 16..65535")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"sample_rate {sample_rate} not encodable")
    bs = min(block_size, n)

    # --- stream header: fLaC marker + STREAMINFO (last metadata block)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    si = _BitWriter()
    si.write(bs, 16)  # min blocksize (fixed strategy: last frame exempt)
    si.write(bs, 16)  # max blocksize
    si.write(0, 24)  # min framesize (unknown)
    si.write(0, 24)  # max framesize (unknown)
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1 (mono)
    si.write(15, 5)  # bits per sample - 1 (16-bit)
    si.write(n, 36)  # total samples
    streaminfo = si.bytes() + md5
    assert len(streaminfo) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34])  # last-block flag | type 0, len 34
    out += streaminfo
    for frame_no, start in enumerate(range(0, n, bs)):
        out += _encode_frame(
            samples[start : start + bs].astype(np.int64), frame_no
        )
    return bytes(out)


def _encode_frame(x: np.ndarray, frame_no: int) -> bytes:
    """One fixed-blocking-strategy frame: CRC-8-guarded header, one
    mono subframe, zero-padding to alignment, CRC-16 footer."""
    n = len(x)
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)  # sync
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed blocksize strategy
    hdr.write(0b0111, 4)  # blocksize: 16-bit value at header end
    hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.write(0b0000, 4)  # channel assignment: mono
    hdr.write(0b100, 3)  # sample size: 16 bits
    hdr.write(0, 1)  # reserved
    for b in _utf8_code(frame_no):
        hdr.write(b, 8)
    hdr.write(n - 1, 16)  # blocksize - 1
    hdr_bytes = hdr.bytes()
    frame = _BitWriter()
    for b in hdr_bytes:
        frame.write(b, 8)
    frame.write(_crc8(hdr_bytes), 8)

    # --- one subframe (mono)
    if np.all(x == x[0]):
        frame.write(0, 1)
        frame.write(0b000000, 6)  # CONSTANT
        frame.write(0, 1)  # no wasted bits
        frame.write(int(x[0]), 16)
    else:
        # best fixed order by summed residual magnitude (orders whose
        # warmup would consume the whole block are skipped)
        best_order, best_res, best_cost = 0, x, int(np.abs(x).sum())
        for order in range(1, 5):
            if order >= n:
                break
            res = _fixed_residual(x, order)
            cost = int(np.abs(res).sum())
            if cost < best_cost:
                best_order, best_res, best_cost = order, res, cost
        order, res = best_order, best_res
        frame.write(0, 1)
        frame.write(0b001000 | order, 6)  # FIXED, order
        frame.write(0, 1)  # no wasted bits
        for i in range(order):
            frame.write(int(x[i]), 16)
        # residual: 4-bit partitioned Rice, partition order 0
        frame.write(0b00, 2)
        frame.write(0, 4)
        u = _zigzag(res)
        # optimal k in 0..14: minimize Σ (u >> k) + k (plus the unary
        # stop bits, constant across k)
        best_k, best_bits = 0, None
        for k in range(15):
            cost = int((u >> k).sum()) + k * len(u)
            if best_bits is None or cost < best_bits:
                best_k, best_bits = k, cost
        # raw width must cover the widest residual (order-4 residuals
        # of a full-range int16 signal reach ~21 bits); 5-bit field
        # caps the escape width at 31
        raw_bits = min(31, max(2, int(np.abs(res).max()).bit_length() + 1))
        # Faithful cost model: the escape partition spends 5 extra bits
        # on its width field that the Rice partition doesn't (both spend
        # the same 4-bit parameter field).
        if best_bits + len(u) > raw_bits * len(u) + 5:
            # Rice wider than raw: escape partition (0b1111 + 5-bit
            # width + fixed-width signed residuals)
            frame.write(0b1111, 4)
            frame.write(raw_bits, 5)
            for r in res:
                frame.write(int(r), raw_bits)
        else:
            frame.write(best_k, 4)
            for uv in u:
                frame.write_unary(int(uv) >> best_k)
                frame.write(int(uv), best_k)
    frame.align()
    frame_bytes = frame.bytes()
    return frame_bytes + struct.pack(">H", _crc16(frame_bytes))


def _read_streaminfo(body: bytes) -> tuple[int, int, int, int, bytes]:
    br = _BitReader(body)
    br.read(16)  # min blocksize
    br.read(16)  # max blocksize
    br.read(24)
    br.read(24)
    rate = br.read(20)
    channels = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    return rate, channels, bps, total, body[18:34]


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC payload to ``(sample_rate, int16 samples)``.
    Supports the mono 16-bit fixed-predictor envelope (CONSTANT /
    VERBATIM / FIXED subframes, partitioned-Rice residuals incl. the
    escape mode, multiple frames); LPC subframes and stereo raise
    ``NotImplementedError`` (the documented seam). Validates the
    frame-header CRC-8, frame CRC-16 and stream MD5."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if hdr & 0x7F == 0:
            streaminfo = _read_streaminfo(body)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total, md5_expect = streaminfo
    if channels != 1 or bps != 16:
        raise NotImplementedError(
            f"only mono 16-bit supported, got {channels}ch {bps}-bit"
        )

    samples: list[np.ndarray] = []
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(payload, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        if chan != 0:
            raise NotImplementedError(
                f"channel assignment {chan} unsupported (mono only)"
            )
        if ss_code != 0b100:
            raise NotImplementedError("only 16-bit sample size supported")
        # UTF-8 frame/sample number: 1-7 bytes, same scheme as UTF-8
        lead = br.read(8)
        extra = 0
        if lead >= 0x80:
            mask = 0x40
            while lead & mask:
                extra += 1
                mask >>= 1
            if extra == 0:
                raise ValueError("bad UTF-8 frame number")
        for _ in range(extra):
            br.read(8)
        if bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        elif bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code in (0b1100, 0b1101, 0b1110):
            width = {0b1100: 8, 0b1101: 16, 0b1110: 16}[sr_code]
            br.read(width)
        hdr_end = br.byte_pos()
        if br.nbits % 8:
            raise ValueError("frame header not byte-aligned")
        if _crc8(payload[frame_start:hdr_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")

        # subframe
        if br.read(1) != 0:
            raise ValueError("subframe padding bit set")
        sub_type = br.read(6)
        wasted = 0
        if br.read(1):
            wasted = 1 + br.read_unary()
        eff_bps = 16 - wasted
        if sub_type == 0:  # CONSTANT
            v = br.read(eff_bps)
            if v >= 1 << (eff_bps - 1):
                v -= 1 << eff_bps
            x = np.full(blocksize, v, dtype=np.int64)
        elif sub_type == 1:  # VERBATIM
            x = np.empty(blocksize, dtype=np.int64)
            for i in range(blocksize):
                v = br.read(eff_bps)
                if v >= 1 << (eff_bps - 1):
                    v -= 1 << eff_bps
                x[i] = v
        elif 8 <= sub_type <= 12:  # FIXED, order = sub_type - 8
            order = sub_type - 8
            warm = np.empty(order, dtype=np.int64)
            for i in range(order):
                v = br.read(eff_bps)
                if v >= 1 << (eff_bps - 1):
                    v -= 1 << eff_bps
                warm[i] = v
            method = br.read(2)
            if method not in (0, 1):
                raise ValueError(f"reserved residual method {method}")
            pwidth = 4 if method == 0 else 5
            porder = br.read(4)
            nparts = 1 << porder
            if blocksize % nparts:
                raise ValueError("partition order does not divide block")
            res = np.empty(blocksize - order, dtype=np.int64)
            ri = 0
            for p in range(nparts):
                count = (blocksize >> porder) - (order if p == 0 else 0)
                if count <= 0:
                    raise ValueError("predictor order exceeds partition")
                k = br.read(pwidth)
                if k == (1 << pwidth) - 1:  # escape: raw residuals
                    rb = br.read(5)
                    for _ in range(count):
                        v = br.read(rb) if rb else 0
                        if rb and v >= 1 << (rb - 1):
                            v -= 1 << rb
                        res[ri] = v
                        ri += 1
                else:
                    for _ in range(count):
                        q = br.read_unary()
                        u = (q << k) | br.read(k)
                        res[ri] = (u >> 1) ^ -(u & 1)
                        ri += 1
            coefs = _FIXED_COEFS[order]
            x = np.empty(blocksize, dtype=np.int64)
            x[:order] = warm
            for i in range(order, blocksize):
                x[i] = res[i - order] + sum(
                    c * x[i - 1 - j] for j, c in enumerate(coefs)
                )
        elif 32 <= sub_type <= 63:
            raise NotImplementedError(
                "LPC subframes unsupported (fixed-predictor envelope)"
            )
        else:
            raise ValueError(f"reserved subframe type {sub_type}")
        if wasted:
            x <<= wasted
        br.align()
        frame_end = br.byte_pos()
        if frame_end + 2 > len(payload):
            raise ValueError("truncated FLAC frame (missing CRC-16)")
        (crc_got,) = struct.unpack_from(">H", payload, frame_end)
        if _crc16(payload[frame_start:frame_end]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = frame_end + 2
        samples.append(x)
        got += blocksize

    all_x = np.concatenate(samples) if samples else np.empty(0, np.int64)
    if len(all_x) != total:
        raise ValueError(f"decoded {len(all_x)} samples, expected {total}")
    out = all_x.astype(np.int16)
    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("stream MD5 mismatch")
    return rate, out
