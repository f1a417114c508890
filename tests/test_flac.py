"""Real FLAC codec tests (media/flac.py).

Two independent cross-checks, mirroring tests/test_jpeg.py:

1. `_naive_decode`: an INDEPENDENT test-side RFC 9639 decoder
   (bit-at-a-time reader, dict-free Huffman-less Rice, per-sample
   Python predictors, bitwise — not table-driven — CRCs) that must
   reproduce the engine's decoded samples bit-exactly from
   engine-emitted streams.
2. `_craft_stream`: a test-side stream BUILDER that emits coded-stream
   features the engine encoder never produces (Rice method 1, partition
   order > 0, wasted bits, 8-bit block-size code) so the engine
   decoder's full surface is exercised against known samples.
"""

import hashlib
import struct

import numpy as np
import pytest

from libgeodesk_spark.media import flac, multimodal


def _q16(x):
    """The same int16 grid encode_flac/encode_wav quantize onto
    (float32 product, rint, clip)."""
    return np.clip(np.rint(np.asarray(x, np.float32) * 32767),
                   -32768, 32767).astype(np.int64)


# ---------------------------------------------------------------------------
# independent bitwise CRCs (loop-per-bit, unlike the engine's tables)
# ---------------------------------------------------------------------------

def _crc8_bitwise(data):
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_bitwise(data):
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


# ---------------------------------------------------------------------------
# independent naive decoder
# ---------------------------------------------------------------------------

class _Bits:
    def __init__(self, data, pos=0):
        self.d = data
        self.i = pos * 8

    def bit(self):
        b = (self.d[self.i >> 3] >> (7 - (self.i & 7))) & 1
        self.i += 1
        return b

    def read(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sread(self, n):
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self):
        q = 0
        while self.bit() == 0:
            q += 1
        return q

    def align(self):
        while self.i & 7:
            self.i += 1


_BS_TAB = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512,
           10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}


def _naive_subframe(br, bs, bits):
    assert br.bit() == 0
    t = br.read(6)
    wasted = 0
    if br.bit():
        wasted = br.unary() + 1
    eff = bits - wasted
    if t == 0:
        x = [br.sread(eff)] * bs
    elif t == 1:
        x = [br.sread(eff) for _ in range(bs)]
    elif 8 <= t <= 12:
        order = t - 8
        x = [br.sread(eff) for _ in range(order)]
        res = _naive_residual(br, bs, order)
        # per-sample python predictor straight from the spec table
        coefs = [[], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1]][order]
        for r in res:
            x.append(r + sum(c * x[-1 - j] for j, c in enumerate(coefs)))
    elif t >= 32:
        order = (t & 31) + 1
        x = [br.sread(eff) for _ in range(order)]
        prec = br.read(4) + 1
        shift = br.sread(5)
        coefs = [br.sread(prec) for _ in range(order)]
        res = _naive_residual(br, bs, order)
        for r in res:
            p = sum(c * x[-1 - j] for j, c in enumerate(coefs))
            x.append(r + (p >> shift))
    else:
        raise AssertionError(f"unexpected subframe type {t}")
    return [v << wasted for v in x]


def _naive_residual(br, bs, order):
    method = br.read(2)
    pbits = {0: 4, 1: 5}[method]
    porder = br.read(4)
    out = []
    for p in range(1 << porder):
        n = (bs >> porder) - (order if p == 0 else 0)
        k = br.read(pbits)
        if k == (1 << pbits) - 1:           # escape
            raw = br.read(5)
            out += [br.sread(raw) if raw else 0 for _ in range(n)]
        else:
            for _ in range(n):
                q = br.unary()
                u = (q << k) | br.read(k)
                out.append(u // 2 if u % 2 == 0 else -(u + 1) // 2)
    return out


def _naive_decode(blob):
    assert blob[:4] == b"fLaC"
    i = 4
    sr = ch = bits = total = None
    while True:
        last, btype = blob[i] & 0x80, blob[i] & 0x7F
        size = int.from_bytes(blob[i + 1:i + 4], "big")
        if btype == 0:
            si = _Bits(blob, i + 4)
            si.read(16); si.read(16); si.read(24); si.read(24)
            sr = si.read(20)
            ch = si.read(3) + 1
            bits = si.read(5) + 1
            total = si.read(36)
        i += 4 + size
        if last:
            break
    out = [[] for _ in range(ch)]
    while i < len(blob) and len(out[0]) < total:
        hdr_start = i
        br = _Bits(blob, i)
        assert br.read(14) == 0b11111111111110
        br.read(1)
        br.read(1)
        bsc = br.read(4)
        src = br.read(4)
        assign = br.read(4)
        ssc = br.read(3)
        br.read(1)
        b0 = br.read(8)                      # UTF-8 coded number
        extra_bytes = 0
        if b0 >= 0x80:
            m = 0x80
            while b0 & m:
                extra_bytes += 1
                m >>= 1
            extra_bytes -= 1
            for _ in range(extra_bytes):
                br.read(8)
        bs = _BS_TAB.get(bsc)
        if bsc == 6:
            bs = br.read(8) + 1
        elif bsc == 7:
            bs = br.read(16) + 1
        if src in (12, 13, 14):
            br.read(8 if src == 12 else 16)
        fbits = {0: bits, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ssc]
        hdr_end = br.i // 8
        assert _crc8_bitwise(blob[hdr_start:hdr_end]) == br.read(8)
        if assign <= 7:
            extra = [0] * (assign + 1)
        else:
            extra = {8: [0, 1], 9: [1, 0], 10: [0, 1]}[assign]
        subs = [_naive_subframe(br, bs, fbits + e) for e in extra]
        br.align()
        frame_end = br.i // 8
        assert _crc16_bitwise(blob[hdr_start:frame_end]) == br.read(16)
        i = br.i // 8
        if assign <= 7:
            chans = subs
        elif assign == 8:
            chans = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
        elif assign == 9:
            chans = [[r + s for s, r in zip(subs[0], subs[1])], subs[1]]
        else:
            chans = []
            left, right = [], []
            for m_, s_ in zip(subs[0], subs[1]):
                lr = (m_ << 1) | (s_ & 1)
                left.append((lr + s_) >> 1)
                right.append((lr - s_) >> 1)
            chans = [left, right]
        for c in range(ch):
            out[c] += chans[c]
    arr = np.array(out, dtype=np.int64).T[:total]
    return arr, sr, bits


# ---------------------------------------------------------------------------
# test-side stream builder for decode-only features
# ---------------------------------------------------------------------------

class _W:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def unary(self, q):
        self.bits += [0] * q + [1]

    def bytes(self):
        assert len(self.bits) % 8 == 0
        return bytes(int("".join(map(str, self.bits[i:i + 8])), 2)
                     for i in range(0, len(self.bits), 8))


def _craft_stream(samples, *, method=1, porder=2, wasted=0, bs_code8=False):
    """Mono 16-bit single-frame stream with a fixed-order-0 subframe,
    exercising Rice method 1 / partition order > 0 / wasted bits /
    the 8-bit block-size header code — none of which the engine's
    encoder emits."""
    x = [int(v) for v in samples]
    bs = len(x)
    assert bs % (1 << porder) == 0
    sw = _W()
    sw.w(max(16, bs), 16); sw.w(max(16, bs), 16)
    sw.w(0, 24); sw.w(0, 24)
    sw.w(8000, 20); sw.w(0, 3); sw.w(15, 5); sw.w(bs, 36)
    streaminfo = sw.bytes() + b"\x00" * 16     # md5 unset
    head = (b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
            + streaminfo)

    fw = _W()
    fw.w(0b11111111111110, 14); fw.w(0, 1); fw.w(0, 1)
    fw.w(0b0110 if bs_code8 else 0b0111, 4)    # 8- or 16-bit size at end
    fw.w(0, 4)                                 # rate from STREAMINFO
    fw.w(0, 4)                                 # mono
    fw.w(0b100, 3); fw.w(0, 1)                 # 16-bit, reserved
    fw.w(0, 8)                                 # frame number 0
    fw.w(bs - 1, 8 if bs_code8 else 16)
    hdr = fw.bytes()
    hdr += bytes([_crc8_bitwise(hdr)])

    bw = _W()
    bw.w(0, 1); bw.w(0b001000, 6)              # fixed order 0
    if wasted:
        bw.w(1, 1); bw.unary(wasted - 1)
        shifted = [v >> wasted for v in x]
        assert all(s << wasted == v for s, v in zip(shifted, x))
        enc = shifted
    else:
        bw.w(0, 1)
        enc = x
    bw.w(method, 2)
    bw.w(porder, 4)
    pbits = 4 if method == 0 else 5
    npart = 1 << porder
    for p in range(npart):
        part = enc[p * (bs // npart):(p + 1) * (bs // npart)]
        k = 3
        bw.w(k, pbits)
        for v in part:
            u = 2 * v if v >= 0 else -2 * v - 1
            bw.unary(u >> k)
            bw.w(u & ((1 << k) - 1), k)
    while len(bw.bits) % 8:
        bw.bits.append(0)
    body = hdr + bw.bytes()
    return head + body + struct.pack(">H", _crc16_bitwise(body))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestPrimitives:
    def test_crc8_crc16_match_bitwise(self):
        for data in (b"", b"\x00", b"hello flac", bytes(range(256))):
            assert flac.crc8(data) == _crc8_bitwise(data)
            assert flac.crc16(data) == _crc16_bitwise(data)

    def test_utf8_coded_roundtrip(self):
        for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
                  (1 << 21) - 1, 1 << 21, (1 << 31) + 12345, (1 << 36) - 1]:
            enc = flac._utf8_coded(n)
            rd = flac._BitReader(enc)
            assert flac._read_utf8_coded(rd) == n
        with pytest.raises(ValueError):
            flac._utf8_coded(1 << 36)

    def test_fixed_reconstruction_inverts_residual(self):
        rng = np.random.default_rng(3)
        x = rng.integers(-30000, 30000, 200)
        for order in range(5):
            res = flac._fixed_residual(x, order)
            back = flac._reconstruct_fixed(list(x[:order]), res.tolist(), order)
            assert np.array_equal(back, x)

    def test_zigzag(self):
        r = np.array([0, -1, 1, -2, 2, 100, -100])
        assert flac._zigzag(r).tolist() == [0, 1, 2, 3, 4, 200, 199]


class TestRoundTrip:
    @pytest.mark.parametrize("n", [1, 17, 4095, 4096, 4097, 10000])
    def test_mono_lossless(self, n):
        a = multimodal.synth_audio(n, n)
        out, sr = flac.decode_flac(flac.encode_flac(a, 16000))
        assert sr == 16000
        assert out.dtype == np.float32 and out.shape == (n,)
        assert np.array_equal((out * 32767).round().astype(np.int64), _q16(a))

    @pytest.mark.parametrize("mode", ["auto", "independent"])
    def test_stereo_lossless(self, mode):
        a = np.stack([multimodal.synth_audio(1, 9000),
                      multimodal.synth_audio(2, 9000)], axis=1)
        out, sr = flac.decode_flac(flac.encode_flac(a, 44100, stereo_mode=mode))
        assert out.shape == (9000, 2) and sr == 44100
        assert np.array_equal((out * 32767).round().astype(np.int64), _q16(a))

    def test_multichannel(self):
        a = np.stack([multimodal.synth_audio(i, 3000) for i in range(5)], axis=1)
        out, _ = flac.decode_flac(flac.encode_flac(a, 8000))
        assert np.array_equal((out * 32767).round().astype(np.int64), _q16(a))

    def test_noise_survives_escape_path(self):
        a = np.random.default_rng(0).uniform(-1, 1, 6000).astype(np.float32)
        out, _ = flac.decode_flac(flac.encode_flac(a, 8000))
        assert np.array_equal((out * 32767).round().astype(np.int64), _q16(a))

    def test_compresses_tonal_audio(self):
        t = np.arange(20000, dtype=np.float32) / 16000
        a = (0.7 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        blob = flac.encode_flac(a, 16000)
        assert len(blob) < 0.55 * 2 * len(a)   # LPC must beat PCM16 by 2x

    def test_determinism(self):
        a = multimodal.synth_audio(5, 5000)
        assert flac.encode_flac(a, 16000) == flac.encode_flac(a, 16000)

    def test_wav_flac_transcode_bit_exact(self):
        """FLAC quantizes onto the same int16 grid as encode_wav, so a
        WAV->FLAC->WAV transcode preserves every sample bit."""
        a = multimodal.synth_audio(9, 7000)
        via_wav, _ = multimodal.decode_wav(multimodal.encode_wav(a, 16000))
        via_flac, _ = flac.decode_flac(flac.encode_flac(a, 16000))
        assert np.array_equal(via_wav, via_flac)


class TestStructure:
    def test_streaminfo_fields_and_md5(self):
        a = np.stack([multimodal.synth_audio(3, 5000),
                      multimodal.synth_audio(4, 5000)], axis=1)
        blob = flac.encode_flac(a, 48000)
        assert blob[:4] == b"fLaC"
        assert blob[4] == 0x80                 # STREAMINFO, last-metadata
        si = _Bits(blob, 8)
        si.read(16); si.read(16); si.read(24); si.read(24)
        assert si.read(20) == 48000
        assert si.read(3) + 1 == 2
        assert si.read(5) + 1 == 16
        assert si.read(36) == 5000
        md5 = blob[8 + 18:8 + 34]
        q = _q16(a).astype("<i2")
        assert md5 == hashlib.md5(np.ascontiguousarray(q).tobytes()).digest()

    def test_frame_sync_and_count(self):
        a = multimodal.synth_audio(2, 3 * flac.BLOCK_SIZE + 100)
        blob = flac.encode_flac(a, 16000)
        meta_end = 8 + int.from_bytes(blob[5:8], "big")
        assert blob[meta_end] == 0xFF and blob[meta_end + 1] & 0xFC == 0xF8


class TestIndependentCrossCheck:
    @pytest.mark.parametrize("seed,n", [(1, 5000), (2, 4096), (3, 9001)])
    def test_mono_vs_naive(self, seed, n):
        a = multimodal.synth_audio(seed, n)
        blob = flac.encode_flac(a, 16000)
        engine, sr = flac.decode_flac(blob)
        naive, nsr, nbits = _naive_decode(blob)
        assert nsr == sr and nbits == 16
        assert np.array_equal((engine * 32767).round().astype(np.int64),
                              naive[:, 0])

    @pytest.mark.parametrize("mode", ["auto", "independent"])
    def test_stereo_vs_naive(self, mode):
        rng = np.random.default_rng(11)
        base = multimodal.synth_audio(6, 6000)
        # near-identical channels push the encoder into side modes
        a = np.stack([base, base + rng.normal(0, 0.001, 6000)], axis=1) \
            .astype(np.float32)
        blob = flac.encode_flac(a, 44100, stereo_mode=mode)
        engine, _ = flac.decode_flac(blob)
        naive, _, _ = _naive_decode(blob)
        assert np.array_equal((engine * 32767).round().astype(np.int64), naive)

    def test_auto_picks_a_side_mode_for_correlated_stereo(self):
        base = multimodal.synth_audio(6, 6000)
        a = np.stack([base, base], axis=1)
        auto = flac.encode_flac(a, 44100, stereo_mode="auto")
        ind = flac.encode_flac(a, 44100, stereo_mode="independent")
        assert len(auto) < len(ind)            # side coding must win


class TestDecodeOnlyFeatures:
    """Engine decoder vs hand-crafted streams with features the engine
    encoder never writes."""

    def _check(self, samples, **kw):
        blob = _craft_stream(samples, **kw)
        out, sr = flac.decode_flac(blob)
        assert sr == 8000
        assert np.array_equal((out * 32767).round().astype(np.int64),
                              np.asarray(samples, dtype=np.int64))

    def test_rice_method1_partitions(self):
        rng = np.random.default_rng(0)
        self._check(rng.integers(-40, 40, 64), method=1, porder=2)

    def test_rice_method0_partitions(self):
        rng = np.random.default_rng(1)
        self._check(rng.integers(-40, 40, 128), method=0, porder=3)

    def test_wasted_bits(self):
        rng = np.random.default_rng(2)
        self._check(rng.integers(-30, 30, 64) << 4, wasted=4)

    def test_8bit_blocksize_code(self):
        rng = np.random.default_rng(3)
        self._check(rng.integers(-40, 40, 32), bs_code8=True)


class TestErrors:
    def test_not_flac(self):
        with pytest.raises(ValueError, match="fLaC"):
            flac.decode_flac(b"RIFFxxxxWAVE")

    def test_header_crc8_corruption(self):
        blob = bytearray(flac.encode_flac(multimodal.synth_audio(1, 2000), 16000))
        meta_end = 8 + int.from_bytes(blob[5:8], "big")
        blob[meta_end + 2] ^= 0x04             # flip a frame-header bit
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(blob))

    def test_frame_crc16_or_md5_catches_payload_corruption(self):
        blob = bytearray(flac.encode_flac(multimodal.synth_audio(1, 2000), 16000))
        blob[-40] ^= 0x10                      # flip a bit late in the scan
        with pytest.raises(ValueError):
            flac.decode_flac(bytes(blob))

    def test_truncation(self):
        blob = flac.encode_flac(multimodal.synth_audio(1, 2000), 16000)
        with pytest.raises(ValueError):
            flac.decode_flac(blob[:len(blob) // 2])

    def test_empty_and_bad_args(self):
        with pytest.raises(ValueError):
            flac.encode_flac(np.zeros((0,), np.float32), 16000)
        with pytest.raises(ValueError):
            flac.encode_flac(np.zeros((10, 9), np.float32), 16000)
        with pytest.raises(ValueError):
            flac.encode_flac(np.zeros(10, np.float32), 16000, stereo_mode="ms")


class TestDispatch:
    def test_decode_audio_dispatches_flac(self):
        a = multimodal.synth_audio(4, 3000)
        out, sr = multimodal.decode_audio(flac.encode_flac(a, 16000))
        assert sr == 16000
        assert np.array_equal((out * 32767).round().astype(np.int64), _q16(a))

    def test_lossy_still_stubbed(self):
        with pytest.raises(NotImplementedError, match="mp3/ogg"):
            multimodal.decode_audio(b"ID3\x04" + b"\x00" * 64)

    def test_audio_features_codec_invariant(self, spark):
        """The Spark audio pipeline (mapInPandas over decode_audio) must
        produce identical features whether a clip arrives as WAV or as
        FLAC — the container is transparent to the engine."""
        clips = [(i, multimodal.synth_audio(i, 2000 + 100 * i)) for i in range(6)]
        rows_wav = [(f"c{i}", bytearray(multimodal.encode_wav(a, 16000)),
                     16000, len(a), 1, "wav") for i, a in clips]
        rows_flac = [(f"c{i}", bytearray(flac.encode_flac(a, 16000)),
                      16000, len(a), 1, "flac") for i, a in clips]
        fw = multimodal.audio_features(
            spark.createDataFrame(rows_wav, multimodal.AUDIO_SCHEMA)) \
            .orderBy("clip_id").toPandas()
        ff = multimodal.audio_features(
            spark.createDataFrame(rows_flac, multimodal.AUDIO_SCHEMA)) \
            .orderBy("clip_id").toPandas()
        assert fw.columns.tolist() == ff.columns.tolist()
        for col in fw.columns:
            if fw[col].dtype == object:
                assert (fw[col] == ff[col]).all()
            else:
                np.testing.assert_allclose(fw[col], ff[col], rtol=1e-5)
