"""FLAC codec subset — pure numpy/stdlib, no codec library.

Closes part of the VERDICT "entropy-coded codec families" seam with a
LOSSLESS entropy-coded format (the others — MP3/AAC/H.264 — need
psychoacoustic/DSP machinery this container has no libraries for, and
are lossy anyway). Rice/Golomb coding IS entropy coding: residuals
get variable-length codes sized to their magnitude distribution, so
this exercises the same bit-serial machinery as the JPEG Huffman path
— but because FLAC is lossless, the round trip is EXACT and the
carrying queries are hash-oracled (DuckDB replays the synth lattices
arithmetically), a strictly stronger check than the lossy codecs'
error-envelope audits.

Implemented from the public FLAC format specification (xiph.org /
RFC 9639):

- ``encode_flac``: mono ``(n,)`` or stereo ``(n, 2)`` input at
  16-bit (int16) or 24-bit (int32, r12 — the wider sample lattice
  reuses the same machinery with ``eff_bps`` rebased and the MD5
  packed as 3-byte little-endian), one frame per ``block_size``
  samples (fixed blocking
  strategy, UTF-8-coded frame numbers). fLaC marker + STREAMINFO
  (with the spec's MD5 of the unencoded interleaved samples),
  fixed-blocksize frames with CRC-8-guarded headers and CRC-16-guarded
  bodies. Per subframe the encoder plans CONSTANT (flat signals), the
  best FIXED predictor (orders 0–4), or a quantized LPC predictor
  (Levinson-Durbin on the rectangular-window autocorrelation, orders
  up to 8, 12-bit coefficients) — chosen by exact Rice bit cost plus
  header/warmup overhead — with partitioned-Rice residual coding
  (partition order 0, optimal 4-bit Rice parameter, escape to raw
  bits when Rice would be wider, the escape's 5-bit width field
  charged faithfully). Stereo frames pick the cheapest of the four
  spec channel assignments (independent / left-side / right-side /
  mid-side) per frame by the same cost model.
- ``decode_flac``: parses the marker, STREAMINFO, skips other
  metadata blocks, validates frame-header CRC-8, frame CRC-16 and the
  stream MD5, and reconstructs CONSTANT / VERBATIM / FIXED / LPC
  subframes under all four channel assignments. Remaining envelope
  guards (raised, never misparsed): sample sizes other than 16/24-bit
  and channel counts above 2.

Determinism: everything after the one float Levinson-Durbin solve is
integer arithmetic with a fixed operation order, and the solve's
output only selects coefficients that are then applied exactly the
same way by encoder and decoder — so encode and decode are
bit-reproducible across runs and partitions, and the round trip is
exact regardless of coefficient quality. The codec runs inside
Arrow-batched ``mapInPandas`` (``multimodal.py``), partition-parallel
with zero driver involvement.
"""

from __future__ import annotations

import hashlib
import math
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

_MAX_LPC_ORDER = 8
_LPC_PRECISION = 12


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

    def read_signed(self, length: int) -> int:
        v = self.read(length)
        if v >= 1 << (length - 1):
            v -= 1 << length
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


# ---------------------------------------------------------------------------
# Subframe planning: exact Rice bit cost over CONSTANT / FIXED / LPC
# ---------------------------------------------------------------------------


def _rice_plan(res: np.ndarray) -> tuple[int, int, int]:
    """Optimal partition-order-0 residual coding for ``res``: returns
    ``(best_k, rice_bits, raw_bits)`` where ``rice_bits`` is the exact
    Rice cost (quotient + stop + k low bits per value) at the optimal
    4-bit parameter and ``raw_bits`` the escape width."""
    u = _zigzag(res)
    best_k, best_bits = 0, None
    for k in range(15):
        cost = int((u >> k).sum()) + (k + 1) * len(u)
        if best_bits is None or cost < best_bits:
            best_k, best_bits = k, cost
    raw_bits = min(31, max(2, int(np.abs(res).max(initial=0)).bit_length() + 1))
    return best_k, best_bits, raw_bits


def _residual_cost(res: np.ndarray) -> int:
    """Bits the residual partition will occupy (4-bit parameter + the
    cheaper of Rice and the escape with its 5-bit width field)."""
    _k, rice_bits, raw_bits = _rice_plan(res)
    return 4 + min(rice_bits, raw_bits * len(res) + 5)


def _lpc_quantized(
    x: np.ndarray, order: int, precision: int = _LPC_PRECISION
) -> tuple[list[int], int] | None:
    """Levinson-Durbin on the rectangular-window autocorrelation, then
    uniform quantization to ``precision``-bit signed coefficients with
    a non-negative shift. Returns ``(qcoefs, shift)`` or None for
    degenerate signals. Coefficient quality only affects compression —
    the residual is computed (and re-integrated) with the QUANTIZED
    coefficients, so the round trip is exact either way."""
    n = len(x)
    if n <= order:
        return None
    xf = x.astype(np.float64)
    ac = np.empty(order + 1)
    for lag in range(order + 1):
        ac[lag] = float(np.dot(xf[: n - lag], xf[lag:]))
    if ac[0] <= 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= a[j] * ac[i - j]
        if err <= 0:
            break
        k = acc / err
        new_a = a.copy()
        new_a[i] = k
        for j in range(i):
            new_a[j] = a[j] - k * a[i - 1 - j]
        a = new_a
        err *= 1.0 - k * k
    cmax = float(np.max(np.abs(a)))
    if cmax == 0 or not math.isfinite(cmax):
        return None
    shift = precision - 1 - (math.floor(math.log2(cmax)) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(a * (1 << shift)).astype(np.int64), -lim, lim - 1)
    if not q.any():
        return None
    return [int(v) for v in q], shift


def _lpc_residual(x: np.ndarray, q: list[int], shift: int) -> np.ndarray:
    """r[i] = x[i] − ((Σ q_j · x[i−1−j]) >> shift) — the spec's exact
    integer prediction (arithmetic shift), vectorized over samples."""
    order = len(q)
    n = len(x)
    pred = np.zeros(n - order, dtype=np.int64)
    for j, c in enumerate(q):
        pred += c * x[order - 1 - j : n - 1 - j]
    return x[order:] - (pred >> shift)


def _plan_subframe(x: np.ndarray, eff_bps: int) -> tuple:
    """Choose the cheapest subframe encoding for ``x`` by exact bit
    cost. Returns one of ``("const", value)``, ``("fixed", order,
    res)``, ``("lpc", qcoefs, shift, res)`` tagged with its cost:
    ``(kind_tuple, total_bits)``."""
    n = len(x)
    if np.all(x == x[0]):
        return ("const", int(x[0])), 8 + eff_bps
    best: tuple | None = None
    best_cost = None
    for order in range(5):
        if order >= n:
            break
        res = _fixed_residual(x, order)
        cost = 8 + order * eff_bps + 2 + 4 + _residual_cost(res)
        if best_cost is None or cost < best_cost:
            best, best_cost = ("fixed", order, res), cost
    for order in (2, 4, _MAX_LPC_ORDER):
        if order >= n or order > 32:
            continue
        ql = _lpc_quantized(x, order)
        if ql is None:
            continue
        q, shift = ql
        res = _lpc_residual(x, q, shift)
        # Self-review guard: a pathologically unstable quantized filter
        # (shift 0, near-max coefficients) can push residuals past the
        # 31-bit escape width, which write() would silently truncate
        # into an undecodable stream (the MD5 would catch it at decode,
        # but the encoder must never emit it). FIXED predictors bound
        # their residuals at ~2^21, so skipping LPC here always leaves
        # a safe plan.
        if int(np.abs(res).max(initial=0)) >= 1 << 30:
            continue
        cost = (
            8
            + order * eff_bps
            + 4
            + 5
            + order * _LPC_PRECISION
            + 2
            + 4
            + _residual_cost(res)
        )
        if cost < best_cost:
            best, best_cost = ("lpc", q, shift, res), cost
    return best, best_cost


def _write_residual(frame: _BitWriter, res: np.ndarray) -> None:
    """Partition-order-0 coded residual: 2-bit method (4-bit Rice), 4-bit
    partition order 0, then the Rice partition or the raw escape —
    whichever the faithful cost model says is narrower."""
    frame.write(0b00, 2)
    frame.write(0, 4)
    u = _zigzag(res)
    best_k, rice_bits, raw_bits = _rice_plan(res)
    # Faithful cost model: the escape partition spends 5 extra bits on
    # its width field that the Rice partition doesn't (both spend the
    # same 4-bit parameter field). rice_bits already includes the
    # per-value stop bits.
    if rice_bits > raw_bits * len(u) + 5:
        frame.write(0b1111, 4)
        frame.write(raw_bits, 5)
        for r in res:
            frame.write(int(r), raw_bits)
    else:
        frame.write(best_k, 4)
        for uv in u:
            frame.write_unary(int(uv) >> best_k)
            frame.write(int(uv), best_k)


def _write_subframe(frame: _BitWriter, x: np.ndarray, eff_bps: int, plan: tuple) -> None:
    """Serialize one planned subframe (header byte, warmup, predictor
    parameters, residual)."""
    frame.write(0, 1)  # padding
    if plan[0] == "const":
        frame.write(0b000000, 6)
        frame.write(0, 1)  # no wasted bits
        frame.write(plan[1], eff_bps)
        return
    if plan[0] == "fixed":
        _kind, order, res = plan
        frame.write(0b001000 | order, 6)
        frame.write(0, 1)
        for i in range(order):
            frame.write(int(x[i]), eff_bps)
        _write_residual(frame, res)
        return
    _kind, q, shift, res = plan
    order = len(q)
    frame.write(0b100000 | (order - 1), 6)
    frame.write(0, 1)
    for i in range(order):
        frame.write(int(x[i]), eff_bps)
    frame.write(_LPC_PRECISION - 1, 4)
    frame.write(shift, 5)
    for c in q:
        frame.write(c, _LPC_PRECISION)
    _write_residual(frame, res)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _pack_samples_le(samples: np.ndarray, bps: int) -> bytes:
    """The spec's MD5 input: channel-interleaved little-endian samples,
    ``bps/8`` bytes each (24-bit = the low 3 bytes of the int32 LE
    two's-complement representation)."""
    if bps == 16:
        return samples.astype("<i2").tobytes()
    flat = np.ascontiguousarray(samples.reshape(-1).astype("<i4"))
    return (
        np.frombuffer(flat.tobytes(), dtype=np.uint8)
        .reshape(-1, 4)[:, :3]
        .tobytes()
    )


def encode_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    block_size: int = 65535,
) -> bytes:
    """Encode a sample array — mono ``(n,)`` or stereo ``(n, 2)`` — as
    a FLAC stream, one frame per ``block_size`` samples (fixed
    blocking strategy; the last frame may be shorter, per the format).
    The sample size follows the dtype: int16 encodes 16-bit, int32
    encodes 24-bit (values must fit the 24-bit signed range; the int32
    lattice IS the spec's 24-bit sample lattice — the stream carries
    exactly 24 bits per sample). Lossless:
    ``decode_flac(encode_flac(s)) == s`` exactly, including the stereo
    decorrelation round trip."""
    if samples.dtype == np.int16:
        bps = 16
    elif samples.dtype == np.int32:
        bps = 24
        lim = 1 << 23
        if samples.size and (
            int(samples.min()) < -lim or int(samples.max()) >= lim
        ):
            raise ValueError(
                "int32 samples encode as 24-bit and must fit "
                f"[-2^23, 2^23), got [{samples.min()}, {samples.max()}]"
            )
    else:
        raise ValueError(
            f"int16 (16-bit) or int32 (24-bit) samples required, "
            f"got {samples.dtype}"
        )
    if samples.ndim == 1:
        channels = 1
    elif samples.ndim == 2 and samples.shape[1] == 2:
        channels = 2
    else:
        raise ValueError(
            f"expected shape (n,) or (n, 2), got {samples.shape}"
        )
    n = len(samples)
    if not 16 <= block_size <= 65535:
        raise ValueError(f"block_size {block_size} outside 16..65535")
    if n < 16:
        raise ValueError(f"blocksize {n} outside the supported 16..65535")
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError(f"sample_rate {sample_rate} not encodable")
    bs = min(block_size, n)

    # --- stream header: fLaC marker + STREAMINFO (last metadata block)
    # MD5 per the spec: interleaved little-endian samples
    md5 = hashlib.md5(_pack_samples_le(samples, bps)).digest()
    si = _BitWriter()
    si.write(bs, 16)  # min blocksize (fixed strategy: last frame exempt)
    si.write(bs, 16)  # max blocksize
    si.write(0, 24)  # min framesize (unknown)
    si.write(0, 24)  # max framesize (unknown)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)  # bits per sample - 1
    si.write(n, 36)  # total inter-channel samples
    streaminfo = si.bytes() + md5
    assert len(streaminfo) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34])  # last-block flag | type 0, len 34
    out += streaminfo
    for frame_no, start in enumerate(range(0, n, bs)):
        block = samples[start : start + bs].astype(np.int64)
        if channels == 1:
            out += _encode_frame([block], 0b0000, frame_no, bps=bps)
        else:
            out += _encode_stereo_frame(
                block[:, 0], block[:, 1], frame_no, bps=bps
            )
    return bytes(out)


# Frame-header sample-size codes (FLAC spec): the two lattices the
# codec encodes. The 8/12/20-bit entries exist only so a frame whose
# code disagrees with STREAMINFO raises the mismatch error with the
# real bit width named — decode_flac rejects any STREAMINFO bps
# outside {16, 24} up front, so those widths are never decoded
# (ADVICE r12).
_SS_CODE = {16: 0b100, 24: 0b110}
_SS_BITS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def _frame_header(n: int, chan_code: int, frame_no: int, bps: int = 16) -> bytes:
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)  # sync
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed blocksize strategy
    hdr.write(0b0111, 4)  # blocksize: 16-bit value at header end
    hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.write(chan_code, 4)  # channel assignment
    hdr.write(_SS_CODE[bps], 3)  # sample size
    hdr.write(0, 1)  # reserved
    for b in _utf8_code(frame_no):
        hdr.write(b, 8)
    hdr.write(n - 1, 16)  # blocksize - 1
    return hdr.bytes()


def _encode_frame(
    subchans: list[np.ndarray],
    chan_code: int,
    frame_no: int,
    plans: list | None = None,
    bps: int = 16,
) -> bytes:
    """One fixed-blocking-strategy frame: CRC-8-guarded header, the
    given per-channel subframe signals (already decorrelated where the
    assignment says so), zero-padding to alignment, CRC-16 footer.
    ``plans`` (one per subchannel) reuses subframe plans the caller
    already computed during candidate costing; when absent each
    subchannel is planned here."""
    n = len(subchans[0])
    hdr_bytes = _frame_header(n, chan_code, frame_no, bps)
    frame = _BitWriter()
    for b in hdr_bytes:
        frame.write(b, 8)
    frame.write(_crc8(hdr_bytes), 8)
    for idx, x in enumerate(subchans):
        eff_bps = bps + _side_bit(chan_code, idx)
        if plans is not None:
            plan = plans[idx]
        else:
            plan, _cost = _plan_subframe(x, eff_bps)
        _write_subframe(frame, x, eff_bps, plan)
    frame.align()
    frame_bytes = frame.bytes()
    return frame_bytes + struct.pack(">H", _crc16(frame_bytes))


def _side_bit(chan_code: int, subframe_idx: int) -> int:
    """The spec's one extra sample bit for the SIDE subframe: second
    subframe under left-side (0b1000) and mid-side (0b1010), first
    under right-side (0b1001)."""
    if chan_code == 0b1000 or chan_code == 0b1010:
        return 1 if subframe_idx == 1 else 0
    if chan_code == 0b1001:
        return 1 if subframe_idx == 0 else 0
    return 0


def _encode_stereo_frame(
    left: np.ndarray, right: np.ndarray, frame_no: int, bps: int = 16
) -> bytes:
    """Pick the cheapest of the four spec channel assignments for this
    frame by exact planned bit cost, then serialize it."""
    side = left - right
    mid = (left + right) >> 1
    candidates = [
        (0b0001, [left, right]),
        (0b1000, [left, side]),
        (0b1001, [side, right]),
        (0b1010, [mid, side]),
    ]
    # Distinct (signal, eff_bps) pairs across the four candidates:
    # left@16, right@16, mid@16, side@17 — plan each ONCE and hand the
    # winner's plans straight to the serializer instead of re-running
    # autocorrelation + Levinson-Durbin + Rice scans on the winning
    # channels (ADVICE r11: ~25% redundant planning per stereo frame).
    plan_cache: dict[tuple[int, int], tuple] = {}

    def planned(x: np.ndarray, eff_bps: int) -> tuple:
        key = (id(x), eff_bps)
        if key not in plan_cache:
            plan_cache[key] = _plan_subframe(x, eff_bps)
        return plan_cache[key]

    best_code, best_chans, best_plans, best_cost = None, None, None, None
    for code, chans in candidates:
        cost = 0
        plans = []
        for idx, x in enumerate(chans):
            plan, c = planned(x, bps + _side_bit(code, idx))
            plans.append(plan)
            cost += c
        if best_cost is None or cost < best_cost:
            best_code, best_chans, best_plans, best_cost = (
                code,
                chans,
                plans,
                cost,
            )
    return _encode_frame(
        best_chans, best_code, frame_no, plans=best_plans, bps=bps
    )


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


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


_SUBFRAME_KIND = (
    lambda t: "const"
    if t == 0
    else "verbatim"
    if t == 1
    else "fixed"
    if 8 <= t <= 12
    else "lpc"
    if 32 <= t <= 63
    else "reserved"
)


def _decode_subframe(
    br: _BitReader, blocksize: int, bps: int, stats: dict | None = None
) -> np.ndarray:
    """One subframe (CONSTANT / VERBATIM / FIXED / LPC) to its raw
    int64 signal."""
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    sub_type = br.read(6)
    if stats is not None:
        kinds = stats.setdefault("subframe_types", {})
        kind = _SUBFRAME_KIND(sub_type)
        kinds[kind] = kinds.get(kind, 0) + 1
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff_bps = bps - wasted
    if sub_type == 0:  # CONSTANT
        x = np.full(blocksize, br.read_signed(eff_bps), dtype=np.int64)
    elif sub_type == 1:  # VERBATIM
        x = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            x[i] = br.read_signed(eff_bps)
    elif 8 <= sub_type <= 12:  # FIXED, order = sub_type - 8
        order = sub_type - 8
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            warm[i] = br.read_signed(eff_bps)
        res = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            x[i] = res[i - order] + sum(
                c * x[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif 32 <= sub_type <= 63:  # LPC, order = low 5 bits + 1
        order = (sub_type & 31) + 1
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            warm[i] = br.read_signed(eff_bps)
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid qlp precision code 15")
        shift = br.read(5)
        if shift >= 16:
            # 5-bit two's complement: negative shifts are spec-reserved
            raise ValueError("negative qlp shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        x = np.empty(blocksize, dtype=np.int64)
        x[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(x[i - 1 - j])
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {sub_type}")
    if wasted:
        x <<= wasted
    return x


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
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
    return res


def decode_flac(
    payload: bytes, stats: dict | None = None
) -> tuple[int, np.ndarray]:
    """Decode a FLAC payload to ``(sample_rate, int16 samples)`` —
    mono streams return shape ``(n,)``, stereo ``(n, 2)``. Supports
    16-bit CONSTANT / VERBATIM / FIXED / LPC subframes, partitioned-
    Rice residuals incl. the escape mode, multiple frames, and all
    four channel assignments; other sample sizes or >2 channels raise
    through the explicit seam rather than decoding wrong. Validates
    the frame-header CRC-8, frame CRC-16 and stream MD5.

    Pass a dict as ``stats`` to collect what the stream actually
    exercised: ``subframe_types`` (const/verbatim/fixed/lpc counts)
    and ``chan_codes`` (frame channel-assignment counts) — the test
    evidence that a fixture really drives the LPC / stereo paths."""
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
    if channels not in (1, 2) or bps not in (16, 24):
        raise NotImplementedError(
            f"only mono/stereo 16/24-bit supported, got {channels}ch {bps}-bit"
        )

    blocks: list[np.ndarray] = []
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
        if chan <= 0b0111:
            n_sub = chan + 1
        elif chan in (0b1000, 0b1001, 0b1010):
            n_sub = 2
        else:
            raise ValueError(f"reserved channel assignment {chan}")
        if n_sub != channels:
            raise ValueError(
                f"frame channel assignment {chan} disagrees with "
                f"STREAMINFO ({channels}ch)"
            )
        if _SS_BITS.get(ss_code) != bps:
            raise NotImplementedError(
                f"frame sample-size code {ss_code:#05b} disagrees with "
                f"STREAMINFO ({bps}-bit)"
            )
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

        if stats is not None:
            codes = stats.setdefault("chan_codes", {})
            codes[chan] = codes.get(chan, 0) + 1
        subchans = [
            _decode_subframe(br, blocksize, bps + _side_bit(chan, idx), stats)
            for idx in range(n_sub)
        ]
        br.align()
        frame_end = br.byte_pos()
        if frame_end + 2 > len(payload):
            raise ValueError("truncated FLAC frame (missing CRC-16)")
        (crc_got,) = struct.unpack_from(">H", payload, frame_end)
        if _crc16(payload[frame_start:frame_end]) != crc_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = frame_end + 2

        if channels == 1:
            blocks.append(subchans[0])
        else:
            if chan == 0b1000:  # left/side: R = L - S
                left, right = subchans[0], subchans[0] - subchans[1]
            elif chan == 0b1001:  # right/side: L = R + S
                left, right = subchans[1] + subchans[0], subchans[1]
            elif chan == 0b1010:  # mid/side
                m, s = subchans[0], subchans[1]
                mid2 = (m << 1) | (s & 1)
                left, right = (mid2 + s) >> 1, (mid2 - s) >> 1
            else:  # independent
                left, right = subchans[0], subchans[1]
            blocks.append(np.stack([left, right], axis=1))
        got += blocksize

    all_x = (
        np.concatenate(blocks)
        if blocks
        else np.empty((0,) if channels == 1 else (0, 2), np.int64)
    )
    if len(all_x) != total:
        raise ValueError(f"decoded {len(all_x)} samples, expected {total}")
    out = all_x.astype(np.int16 if bps == 16 else np.int32)
    if hashlib.md5(_pack_samples_le(out, bps)).digest() != md5_expect:
        raise ValueError("stream MD5 mismatch")
    return rate, out
