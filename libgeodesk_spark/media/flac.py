"""FLAC codec — spec-level RFC 9639 (the IETF FLAC standard), dependency-free.

The audio analog of the real PNG/BMP/JPEG image codecs and the WAV/AVI
containers (media/codec.py, media/jpeg.py, media/multimodal.py): the
dominant *lossless* compressed audio format for training corpora,
implemented straight from the public spec so streams written here play in
external tools and externally-produced FLACs decode here.

Scope (the honest-boundary policy shared by every codec in this package):

* **Encode**: streamable subset — fLaC magic + STREAMINFO (incl. the
  unencoded-audio MD5), fixed 4096-sample blocks, per-block choice of
  stereo decorrelation (independent / left-side / right-side / mid-side
  by measured cost), per-subframe choice of constant / verbatim / fixed
  predictor order 0-4 / LPC (Levinson-Durbin, quantized coefficients)
  by measured Rice cost, Rice residual coding (method 0, partition
  order 0, escape codes when residuals outstrip Rice). Bit-exact
  lossless round trip by construction; CRC-8/CRC-16 per spec.
* **Decode**: the full coded-stream feature set a baseline decoder
  needs — all block-size/sample-rate/sample-size header codes, UTF-8
  coded frame/sample numbers, both blocking strategies, all four
  channel assignments, constant / verbatim / fixed 0-4 / LPC 1-32
  subframes, wasted bits, Rice methods 0 AND 1 at any partition order,
  escape partitions, CRC-8 + CRC-16 verification, MD5 check against
  STREAMINFO. Non-subset exotica (sample size from out-of-band,
  variable streams beyond 36-bit sample numbers) raise ValueError.

Performance shape: everything is numpy-vectorized per block —
prediction/decorrelation/MD5 (fixed-order reconstruction is k-fold
cumsum), AND the Rice entropy layer: encode assembles each partition in
O(k) bit-plane passes (`_write_residual`), decode walks unary
terminators via an amortized-O(1) pointer over the file's 1-bit index
and gathers remainders in k vector passes (`_read_residual`). Only
general-LPC sample reconstruction remains a per-sample loop (a true
IIR recurrence). Batch loops live in Arrow UDF wrappers; this module is
the per-clip interchange boundary.

Reference parity: libgeodesk treats media payloads as opaque blobs with
typed metadata; this codec exists so the engine's audio columns hold
real-world bytes, mirroring how the reference's OGR/GEOS bridge makes
its geometry columns hold real-world WKB (reference: GolBuilder import
pipeline), not to port any reference code (the reference has no audio).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"
BLOCK_SIZE = 4096

# fixed-predictor coefficient rows, order 0..4 (RFC 9639 §9.2.2):
# residual[i] = sample[i] - sum(coef[j] * sample[i-1-j])
FIXED_COEFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]


def _crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _crc8_table()
_CRC16 = _crc16_table()


def _crc16_word_table() -> np.ndarray:
    """65536-entry table T16[v] = (v · x^16) mod poly, derived from the
    byte table by linearity (T8[b] = (b · x^16) mod poly): split
    v = vh·x^8 + vl, then T16[v] = T8[vl] ^ ((T8[vh]·x^8) mod poly),
    and (u·x^8) mod poly = T8[u>>8] ^ ((u&0xFF)<<8). Lets the frame CRC
    absorb TWO bytes per Python iteration with one lookup (the 16-bit
    recurrence c' = T16[c ^ w] is exact because 16 message bits shift
    the whole register out)."""
    v = np.arange(1 << 16, dtype=np.uint16)
    lo = _CRC16[v & 0xFF]
    u = _CRC16[v >> 8]
    hi = _CRC16[u >> 8] ^ ((u & 0xFF).astype(np.uint16) << 8)
    return lo ^ hi


_CRC16_W = _crc16_word_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    if len(data) % 2:
        c = int(_CRC16[data[0]])
        data = data[1:]
    t = _CRC16_W
    for w in np.frombuffer(data, dtype=">u2").tolist():
        c = int(t[c ^ w])
    return c


class _BitWriter:
    """MSB-first bit accumulator (no byte stuffing in FLAC)."""

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
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)          # q zeros then the terminating 1

    def write_bits(self, bits: np.ndarray) -> None:
        """Bulk MSB-first append of a 0/1 uint8 array (np.packbits on
        whole bytes; the <8-bit tail re-enters the accumulator)."""
        if self.nbits:
            prefix = np.array(
                [(self.acc >> (self.nbits - 1 - i)) & 1
                 for i in range(self.nbits)], dtype=np.uint8)
            bits = np.concatenate([prefix, bits])
            self.acc = 0
            self.nbits = 0
        n_full = (len(bits) // 8) * 8
        if n_full:
            self.out += np.packbits(bits[:n_full]).tobytes()
        for b in bits[n_full:]:
            self.write(int(b), 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    """MSB-first reader over the whole buffer; byte-aligned access to the
    underlying position for CRC spans."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos                # next unread byte
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC stream truncated mid-frame")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index, up to 36
    bits) — RFC 9639 §9.1.5."""
    if n < 0x80:
        return bytes([n])
    for nbytes, first_max in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << first_max):
            out = bytearray()
            lead_bits = 7 - nbytes
            out.append((0xFF << (lead_bits + 1)) & 0xFF
                       | (n >> (6 * (nbytes - 1))))
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(f"coded number {n} exceeds 36 bits")


def _read_utf8_coded(rd: _BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError(f"bad UTF-8 coded number lead byte {b0:#x}")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = rd.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _zigzag(res: np.ndarray) -> np.ndarray:
    """Signed residual -> unsigned Rice symbol (RFC 9639 §9.2.7)."""
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1)


def _rice_param(u: np.ndarray) -> int:
    """Cost-optimal-ish parameter: smallest k with mean(u) < 2^k (the
    standard estimator); clamped to the 4-bit method's 0..14 range."""
    if u.size == 0:
        return 0
    mean = float(u.mean())
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + u.size * (k + 1)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coeffs(x: np.ndarray, order: int) -> np.ndarray | None:
    """Levinson-Durbin on the block autocorrelation (public-textbook
    algorithm); returns float predictor coefficients or None if the
    block is degenerate (zero energy / unstable)."""
    f = x.astype(np.float64)
    f = f * np.hanning(len(f)) if len(f) > 1 else f
    ac = np.array([np.dot(f[:len(f) - lag], f[lag:]) for lag in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        if err <= 0:
            return None
        kref = acc / err
        a[:i], a[i] = a[:i] - kref * a[:i][::-1], kref
        err *= (1.0 - kref * kref)
    return a


def _quantize_lpc(a: np.ndarray, precision: int = 15) -> tuple[np.ndarray, int] | None:
    """Quantize float coefficients to `precision`-bit ints + shift
    (RFC 9639 §9.2.3 coefficient layout)."""
    cmax = float(np.abs(a).max())
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = (1 << (precision - 1)) - 1
    q = np.clip(q, -lim - 1, lim)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    xx = x.astype(np.int64)
    # prediction[i] = (sum q[j] * x[i-1-j]) >> shift  for i >= order
    pred = np.zeros(len(xx) - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * xx[order - 1 - j:len(xx) - 1 - j]
    return xx[order:] - (pred >> shift)


def _write_residual(wr: _BitWriter, res: np.ndarray) -> None:
    """Rice method 0, partition order 0, with the 4-bit escape when the
    raw width beats Rice (RFC 9639 §9.2.7.1)."""
    wr.write(0b00, 2)                  # coding method 0 (4-bit params)
    wr.write(0, 4)                     # partition order 0
    u = _zigzag(res)
    k = _rice_param(u)
    raw_bits = int(np.abs(res).max()).bit_length() + 1 if res.size else 1
    if res.size and _rice_cost(u, k) > raw_bits * res.size + 5:
        wr.write(0b1111, 4)            # escape: raw residuals
        wr.write(raw_bits, 5)
        for v in res.tolist():
            wr.write(int(v) & ((1 << raw_bits) - 1), raw_bits)
        return
    wr.write(k, 4)
    # vectorized Rice bit assembly: per-sample layout is q zeros, a one,
    # then k remainder bits. Loop over the k bit-planes (k <= 14), not
    # the samples — the whole partition packs in O(k) numpy passes.
    q = u >> k
    lens = q + 1 + k
    starts = np.cumsum(lens) - lens
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    bits[starts + q] = 1
    for j in range(k):
        bits[starts + q + 1 + j] = (u >> (k - 1 - j)) & 1
    wr.write_bits(bits)


def _subframe_cost(x: np.ndarray) -> tuple[int, tuple]:
    """Pick the cheapest subframe for one channel block. Returns
    (cost_bits, plan) where plan is ('constant', v) | ('verbatim',) |
    ('fixed', order, res) | ('lpc', q, shift, res)."""
    bits = int(np.abs(x.astype(np.int64)).max()).bit_length() + 1 if x.size else 1
    if np.all(x == x[0]):
        return 8 + bits, ("constant", int(x[0]))
    best_cost, best = 8 + len(x) * 32, ("verbatim",)
    for order in range(5):
        if order >= len(x):
            break
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        cost = 8 + order * 32 + 6 + _rice_cost(u, _rice_param(u))
        if cost < best_cost:
            best_cost, best = cost, ("fixed", order, res)
    lpc_order = min(8, len(x) - 1)
    if lpc_order >= 1:
        a = _lpc_coeffs(x, lpc_order)
        qs = _quantize_lpc(a) if a is not None else None
        if qs is not None:
            q, shift = qs
            res = _lpc_residual(x, q, shift)
            u = _zigzag(res)
            cost = (8 + lpc_order * 32 + 4 + 5 + lpc_order * 15 + 6
                    + _rice_cost(u, _rice_param(u)))
            if cost < best_cost:
                best_cost, best = cost, ("lpc", q, shift, res)
    return best_cost, best


def _write_subframe(wr: _BitWriter, x: np.ndarray, plan: tuple,
                    bits: int) -> None:
    wr.write(0, 1)                     # mandatory zero pad bit
    kind = plan[0]
    if kind == "constant":
        wr.write(0b000000, 6)
        wr.write(0, 1)                 # no wasted bits
        wr.write(int(plan[1]) & ((1 << bits) - 1), bits)
    elif kind == "verbatim":
        wr.write(0b000001, 6)
        wr.write(0, 1)
        for v in x.tolist():
            wr.write(int(v) & ((1 << bits) - 1), bits)
    elif kind == "fixed":
        order, res = plan[1], plan[2]
        wr.write(0b001000 | order, 6)
        wr.write(0, 1)
        for v in x[:order].tolist():   # warmup samples
            wr.write(int(v) & ((1 << bits) - 1), bits)
        _write_residual(wr, res)
    else:                              # lpc
        q, shift, res = plan[1], plan[2], plan[3]
        order = len(q)
        wr.write(0b100000 | (order - 1), 6)
        wr.write(0, 1)
        for v in x[:order].tolist():
            wr.write(int(v) & ((1 << bits) - 1), bits)
        wr.write(15 - 1, 4)            # coefficient precision 15
        wr.write(shift, 5)             # shift (5-bit, non-negative)
        for c in q.tolist():
            wr.write(int(c) & 0x7FFF, 15)
        _write_residual(wr, res)


def encode_flac(samples: np.ndarray, sample_rate: int,
                stereo_mode: str = "auto") -> bytes:
    """float32 [-1, 1] (n,) or (n, ch) → FLAC bytes (16-bit, lossless
    over the same int16 quantization grid as :func:`encode_wav`, so
    WAV→FLAC transcode is bit-exact).

    ``stereo_mode``: 'auto' picks per block among independent /
    left-side / right-side / mid-side by measured cost (stereo input
    only); 'independent' forces plain channels.
    """
    if stereo_mode not in ("auto", "independent"):
        raise ValueError(f"stereo_mode must be auto|independent, got "
                         f"{stereo_mode!r}")
    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not (1 <= ch <= 8):
        raise ValueError(f"FLAC supports 1-8 channels, got {ch}")
    if n == 0:
        raise ValueError("empty audio")
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError(f"sample rate {sample_rate} out of STREAMINFO range")
    # float32 product, like encode_wav — so WAV<->FLAC transcode lands
    # on the identical int16 grid sample-for-sample
    q = np.clip(np.rint(s * 32767), -32768, 32767).astype(np.int32)
    bits = 16
    md5 = hashlib.md5(
        np.ascontiguousarray(q.astype("<i2")).tobytes()).digest()

    frames = bytearray()
    for fi, start in enumerate(range(0, n, BLOCK_SIZE)):
        blk = q[start:start + BLOCK_SIZE]
        frames += _encode_frame(blk, fi, bits, stereo_mode)

    streaminfo = _pack_streaminfo(
        min_block=max(16, min(BLOCK_SIZE, n)),
        max_block=max(16, min(BLOCK_SIZE, n)),
        sample_rate=sample_rate, channels=ch, bits=bits, total=n, md5=md5)
    header = (MAGIC
              + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
              + streaminfo)             # 0x80: last-metadata-block, type 0
    return bytes(header) + bytes(frames)


def _pack_streaminfo(min_block, max_block, sample_rate, channels, bits,
                     total, md5) -> bytes:
    wr = _BitWriter()
    wr.write(min_block, 16)
    wr.write(max_block, 16)
    wr.write(0, 24)                    # min frame size unknown
    wr.write(0, 24)                    # max frame size unknown
    wr.write(sample_rate, 20)
    wr.write(channels - 1, 3)
    wr.write(bits - 1, 5)
    wr.write(total & ((1 << 36) - 1), 36)
    return bytes(wr.out) + md5


def _encode_frame(blk: np.ndarray, frame_no: int, bits: int,
                  stereo_mode: str) -> bytes:
    bs, ch = blk.shape
    # choose channel layout
    chans: list[np.ndarray]
    if ch == 2 and stereo_mode != "independent":
        left = blk[:, 0].astype(np.int64)
        right = blk[:, 1].astype(np.int64)
        side = left - right
        mid = (left + right) >> 1
        cand = {
            ch - 1: [left, right],          # independent
            8: [left, side],                # left/side
            9: [side, right],               # right/side
            10: [mid, side],                # mid/side
        }
        best_assign, best_cost, best_plans = None, None, None
        for cand_assign, parts in cand.items():
            cost, plans = 0, []
            for part in parts:
                c, p = _subframe_cost(part)
                cost += c
                plans.append(p)
            if best_cost is None or cost < best_cost:
                best_assign, best_cost, best_plans = cand_assign, cost, plans
        assign, plans = best_assign, best_plans
        chans = cand[assign]
    else:
        assign = ch - 1
        chans = [blk[:, i].astype(np.int64) for i in range(ch)]
        plans = [_subframe_cost(c)[1] for c in chans]

    wr = _BitWriter()
    wr.write(0b11111111111110, 14)     # sync
    wr.write(0, 1)                     # reserved
    wr.write(0, 1)                     # blocking strategy: fixed
    wr.write(0b0111, 4)                # block size: 16-bit at end
    wr.write(0b0000, 4)                # sample rate: from STREAMINFO
    wr.write(assign, 4)
    wr.write(0b100, 3)                 # sample size: 16-bit
    wr.write(0, 1)                     # reserved
    for b in _utf8_coded(frame_no):
        wr.write(b, 8)
    wr.write(bs - 1, 16)
    wr.write(crc8(bytes(wr.out)), 8)

    for i, (x, plan) in enumerate(zip(chans, plans)):
        # side channels carry one extra bit (RFC 9639 §9.1.3)
        extra = 1 if (assign == 8 and i == 1) or (assign == 9 and i == 0) \
            or (assign == 10 and i == 1) else 0
        _write_subframe(wr, x, plan, bits + extra)
    wr.align()
    body = bytes(wr.out)
    return body + struct.pack(">H", crc16(body))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BLOCK_SIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLE_RATE_TABLE = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SAMPLE_SIZE_TABLE = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                      0b110: 24, 0b111: 32}


def decode_flac(data: bytes, verify_md5: bool = True,
                _scalar_rice: bool = False) -> tuple[np.ndarray, int]:
    """FLAC → (float32 samples in [-1, 1], sample_rate). Mono stays
    (n,); multi-channel returns (n, ch) — the same contract as
    :func:`multimodal.decode_wav`. CRC-8/CRC-16 are verified per frame;
    the STREAMINFO MD5 is verified when present (all-zero = unset)."""
    buf = bytes(data)
    if buf[:4] != MAGIC:
        raise ValueError("not a FLAC stream (fLaC magic missing)")
    pos = 4
    info = None
    # metadata blocks
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        size = int.from_bytes(buf[pos + 1:pos + 4], "big")
        payload = buf[pos + 4:pos + 4 + size]
        if len(payload) != size:
            raise ValueError("truncated metadata block")
        if btype == 0:
            info = _parse_streaminfo(payload)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    sr, channels, bits, total, md5 = info

    # vectorized-Rice mode: residual partitions decode over BOUNDED bit
    # windows unpacked on demand (never the whole file — a 25 MB track
    # would otherwise materialize gigabytes of bit/index state), walking
    # unary terminators via an amortized-O(1) pointer and gathering
    # remainders in k numpy passes — the decode-side mirror of the
    # encoder's O(k) bit-plane assembly (see _read_residual).
    ctx = None if _scalar_rice else True   # reference path: tests run both

    out_chunks = []
    while pos < len(buf):
        blk, pos = _decode_frame(buf, pos, info, ctx)
        out_chunks.append(blk)
    pcm = (np.concatenate(out_chunks, axis=0) if out_chunks
           else np.zeros((0, channels), dtype=np.int64))
    if total:
        pcm = pcm[:total]
    if verify_md5 and md5 != b"\x00" * 16:
        if bits == 16:
            raw = np.ascontiguousarray(pcm.astype("<i2")).tobytes()
        elif bits == 8:
            raw = np.ascontiguousarray(pcm.astype(np.int8)).tobytes()
        elif bits == 24:
            le = np.ascontiguousarray(pcm.astype("<i4")).tobytes()
            raw = b"".join(le[i:i + 3] for i in range(0, len(le), 4))
        elif bits == 32:
            raw = np.ascontiguousarray(pcm.astype("<i4")).tobytes()
        else:
            raw = None                 # 12/20-bit packing not byte-aligned
        if raw is not None and hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC MD5 mismatch: decoded audio corrupt")
    scale = float((1 << (bits - 1)) - 1)
    s = pcm.astype(np.float32) / scale
    return (s[:, 0] if channels == 1 else s), sr


def _parse_streaminfo(payload: bytes):
    if len(payload) < 34:
        raise ValueError("short STREAMINFO")
    rd = _BitReader(payload)
    rd.read(16)                        # min block
    rd.read(16)                        # max block
    rd.read(24)                        # min frame
    rd.read(24)                        # max frame
    sr = rd.read(20)
    channels = rd.read(3) + 1
    bits = rd.read(5) + 1
    total = rd.read(36)
    md5 = payload[18:34]
    if sr == 0:
        raise ValueError("STREAMINFO sample rate 0")
    return sr, channels, bits, total, md5


def _decode_frame(buf: bytes, pos: int, info, ctx=None):
    sr0, channels0, bits0, _total, _md5 = info
    frame_start = pos
    rd = _BitReader(buf, pos)
    sync = rd.read(14)
    if sync != 0b11111111111110:
        raise ValueError(f"bad frame sync at byte {pos}")
    if rd.read(1):
        raise ValueError("reserved frame-header bit set")
    rd.read(1)                         # blocking strategy (both accepted)
    bs_code = rd.read(4)
    sr_code = rd.read(4)
    assign = rd.read(4)
    ss_code = rd.read(3)
    if rd.read(1):
        raise ValueError("reserved frame-header bit set")
    _read_utf8_coded(rd)               # frame / sample number
    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    elif bs_code == 0b0110:
        bs = rd.read(8) + 1
    elif bs_code == 0b0111:
        bs = rd.read(16) + 1
    else:
        bs = _BLOCK_SIZE_TABLE[bs_code]
    if sr_code == 0:
        sr = sr0
    elif sr_code in _SAMPLE_RATE_TABLE:
        sr = _SAMPLE_RATE_TABLE[sr_code]
    elif sr_code == 0b1100:
        sr = rd.read(8) * 1000
    elif sr_code == 0b1101:
        sr = rd.read(16)
    elif sr_code == 0b1110:
        sr = rd.read(16) * 10
    else:
        raise ValueError("invalid sample rate code 0b1111")
    if ss_code == 0:
        bits = bits0
    elif ss_code in _SAMPLE_SIZE_TABLE:
        bits = _SAMPLE_SIZE_TABLE[ss_code]
    else:
        raise ValueError(f"reserved sample size code {ss_code:#b}")
    if bits != bits0:
        # decode_flac scales and MD5-packs at the STREAMINFO depth; a
        # frame legally overriding it would decode at the wrong
        # amplitude — reject like the channel-count check (ADVICE r5)
        raise ValueError(
            f"frame sample size {bits} != STREAMINFO {bits0}")
    header_end = rd.pos                # reader is byte-aligned here
    expect_crc8 = rd.read(8)
    if crc8(buf[frame_start:header_end]) != expect_crc8:
        raise ValueError("frame header CRC-8 mismatch")

    if assign <= 7:
        nch = assign + 1
        extra = [0] * nch
    elif assign == 8:                  # left/side
        nch, extra = 2, [0, 1]
    elif assign == 9:                  # right/side
        nch, extra = 2, [1, 0]
    elif assign == 10:                 # mid/side
        nch, extra = 2, [0, 1]
    else:
        raise ValueError(f"reserved channel assignment {assign}")
    if nch != channels0:
        raise ValueError("frame channel count != STREAMINFO")

    chans = [_decode_subframe(rd, bs, bits + extra[i], ctx)
             for i in range(nch)]
    rd.align()
    frame_end = rd.pos
    expect_crc16 = rd.read(16)
    if crc16(buf[frame_start:frame_end]) != expect_crc16:
        raise ValueError("frame CRC-16 mismatch")

    if assign <= 7:
        blk = np.stack(chans, axis=1)
    elif assign == 8:
        left, side = chans
        blk = np.stack([left, left - side], axis=1)
    elif assign == 9:
        side, right = chans
        blk = np.stack([right + side, right], axis=1)
    else:                              # mid/side
        mid, side = chans
        lr = (mid << 1) | (side & 1)
        blk = np.stack([(lr + side) >> 1, (lr - side) >> 1], axis=1)
    return blk, rd.pos


def _decode_subframe(rd: _BitReader, bs: int, bits: int,
                     ctx=None) -> np.ndarray:
    if rd.read(1):
        raise ValueError("subframe pad bit set")
    t = rd.read(6)
    wasted = 0
    if rd.read(1):                     # wasted-bits flag: unary count-1
        wasted = rd.read_unary() + 1
    eff = bits - wasted
    if t == 0b000000:                  # constant
        v = rd.read_signed(eff)
        x = np.full(bs, v, dtype=np.int64)
    elif t == 0b000001:                # verbatim
        x = np.array([rd.read_signed(eff) for _ in range(bs)], dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:    # fixed, order 0-4
        order = t & 0x07
        warm = [rd.read_signed(eff) for _ in range(order)]
        res = _read_residual(rd, bs, order, ctx)
        x = _reconstruct_fixed(warm, res, order)
    elif t >= 0b100000:                # LPC, order 1-32
        order = (t & 0x1F) + 1
        warm = [rd.read_signed(eff) for _ in range(order)]
        prec = rd.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 0b1111")
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [rd.read_signed(prec) for _ in range(order)]
        res = _read_residual(rd, bs, order, ctx)
        x = _reconstruct_lpc(warm, coefs, shift, res)
    else:
        raise ValueError(f"reserved subframe type {t:#08b}")
    if len(x) != bs:
        raise ValueError("subframe sample count mismatch")
    return x << wasted


def _resync(rd: _BitReader, bitpos: int) -> None:
    """Point the byte-oriented reader at an absolute bit position."""
    rd.pos = bitpos >> 3
    rd.acc = 0
    rd.nbits = 0
    if bitpos & 7:
        rd.read(bitpos & 7)


def _read_residual(rd: _BitReader, bs: int, order: int,
                   ctx=None) -> list[int]:
    """Rice-coded residual. With ``ctx`` = (bit array, 1-bit positions)
    from :func:`decode_flac`, each partition decodes in numpy: the
    terminator of sample i is the first 1-bit at/after its start, found
    by an amortized-O(1) pointer walk over the 1-bit index (remainder
    bits are skipped by jumping k+1 past each terminator), then all
    quotients come from one vector subtraction and all remainders from
    k bit-plane gathers — the decode-side mirror of the encoder's
    O(k)-pass assembly. Without ctx, a per-sample bit-reader loop (kept
    as the obviously-spec-shaped reference path; tests run both)."""
    method = rd.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = rd.read(4)
    nparts = 1 << porder
    if bs % nparts or (bs >> porder) <= order:
        raise ValueError("invalid residual partition order")
    if ctx is None:
        res: list[int] = []
        for p in range(nparts):
            count = (bs >> porder) - (order if p == 0 else 0)
            k = rd.read(pbits)
            if k == escape:
                raw = rd.read(5)
                if raw == 0:
                    res.extend([0] * count)
                else:
                    res.extend(rd.read_signed(raw) for _ in range(count))
            else:
                for _ in range(count):
                    q = rd.read_unary()
                    u = (q << k) | rd.read(k)
                    res.append((u >> 1) ^ -(u & 1))   # un-zigzag
        return res

    buf = rd.data
    nbits_total = len(buf) * 8
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        count = (bs >> porder) - (order if p == 0 else 0)
        k = rd.read(pbits)
        if k == escape:
            raw = rd.read(5)
            pos = rd.pos * 8 - rd.nbits
            if raw == 0:
                out[w:w + count] = 0
            else:
                end = pos + raw * count
                if end > nbits_total:
                    raise ValueError("FLAC stream truncated mid-frame")
                b0, b1 = pos >> 3, -(-end // 8)
                seg = np.unpackbits(
                    np.frombuffer(buf, np.uint8, b1 - b0, b0)
                )[pos - b0 * 8:][:raw * count].reshape(count, raw)
                vals = np.zeros(count, dtype=np.int64)
                for j in range(raw):
                    vals = (vals << 1) | seg[:, j]
                vals[vals >= (1 << (raw - 1))] -= (1 << raw)
                out[w:w + count] = vals
                pos = end
            _resync(rd, pos)
        else:
            pos = rd.pos * 8 - rd.nbits
            # unpack a bounded window starting at pos; grow it in the
            # (rare) case a partition's unary runs outstrip the estimate
            win_bits = max(4096, count * (k + 4) * 2)
            if pos >= nbits_total:
                raise ValueError("FLAC stream truncated mid-frame")
            while True:
                b0 = pos >> 3
                b1 = min(len(buf), -(-(pos + win_bits) // 8))
                bits = np.unpackbits(
                    np.frombuffer(buf, np.uint8, b1 - b0, b0))
                base = b0 * 8
                ones = np.flatnonzero(bits).tolist()
                ts_l: list[int] = []
                append = ts_l.append
                p_ = pos - base
                idx = 0
                n_ones = len(ones)
                ok = True
                try:
                    for _ in range(count):
                        t = ones[idx]
                        while t < p_:         # a remainder 1-bit: skip
                            idx += 1
                            t = ones[idx]
                        append(t)
                        p_ = t + 1 + k
                        idx += 1
                except IndexError:
                    ok = False
                if ok and p_ <= len(bits):
                    break
                if b1 >= len(buf):
                    raise ValueError("FLAC stream truncated mid-frame")
                win_bits *= 4                  # grow and redo partition
            ts = np.array(ts_l, dtype=np.int64)
            starts = np.empty(count, dtype=np.int64)
            starts[0] = pos - base
            starts[1:] = ts[:-1] + 1 + k
            u = (ts - starts) << k
            if k:
                rem = np.zeros(count, dtype=np.int64)
                for j in range(k):
                    rem = (rem << 1) | bits[ts + 1 + j]
                u |= rem
            out[w:w + count] = (u >> 1) ^ -(u & 1)
            _resync(rd, base + p_)
        w += count
    return out.tolist()


def _reconstruct_fixed(warm: list[int], res: list[int], order: int
                       ) -> np.ndarray:
    """Order-k fixed prediction inverts to k cumulative sums — the
    residual IS the k-th finite difference (RFC 9639 §9.2.2), so
    reconstruction is numpy-vectorized integration, no sample loop.

    Invariant per level: if x holds the level-th differences at indices
    [level..bs-1], prepending the warmup's (level-1)-th difference at
    index level-1 (``diffs[level-1][0]``) and cumsum-ing yields the
    (level-1)-th differences at [level-1..bs-1]; after ``order`` levels
    x is the full sample block."""
    r = np.array(res, dtype=np.int64)
    if order == 0:
        return r
    w = np.array(warm, dtype=np.int64)
    diffs = [w]
    for _ in range(order - 1):
        diffs.append(np.diff(diffs[-1]))
    x = r
    for level in range(order, 0, -1):
        x = np.cumsum(np.concatenate([diffs[level - 1][:1], x]))
    return x


def _reconstruct_lpc(warm: list[int], coefs: list[int], shift: int,
                     res: list[int]) -> np.ndarray:
    """True IIR recurrence — inherently per-sample; the order-8 case
    (what the engine's own encoder emits) is unrolled to one Python
    statement per sample."""
    order = len(coefs)
    x = list(warm) + [0] * len(res)
    i = order
    if order == 8:
        c0, c1, c2, c3, c4, c5, c6, c7 = coefs
        for r in res:
            x[i] = r + ((c0 * x[i - 1] + c1 * x[i - 2] + c2 * x[i - 3]
                         + c3 * x[i - 4] + c4 * x[i - 5] + c5 * x[i - 6]
                         + c6 * x[i - 7] + c7 * x[i - 8]) >> shift)
            i += 1
    else:
        for r in res:
            pred = 0
            for j in range(order):
                pred += coefs[j] * x[i - 1 - j]
            x[i] = r + (pred >> shift)
            i += 1
    return np.array(x, dtype=np.int64)
