"""Multimodal payload plumbing: audio / video as opaque binary columns with
typed metadata, processed in Arrow batches.

Per the build instructions: the container has no real audio/video codecs,
so the DECODE step is stubbed — either a clearly-marked
``NotImplementedError`` (real-codec mode) or a deterministic fake — while
the Spark-side plumbing (schemas, batching, partitioning, UDF signatures)
is real and tested. Swapping in a real decoder later means replacing one
function, not re-architecting.

Schemas follow the image table's pattern (input_hint): payload bytes are
opaque; metadata columns are typed and queryable without touching bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_samples", T.IntegerType(), False),
    T.StructField("channels", T.IntegerType(), False),
    T.StructField("codec", T.StringType(), False),
])

VIDEO_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType(), False),
    T.StructField("bytes", T.BinaryType(), True),
    T.StructField("w", T.IntegerType(), False),
    T.StructField("h", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("fps", T.IntegerType(), False),
    T.StructField("codec", T.StringType(), False),
])

MAGIC_AUD = b"FAUD"
MAGIC_VID = b"FVID"

REAL_CODECS = False   # flip when libsndfile/ffmpeg-class decoders exist
                      # (WAV/RIFF PCM below is always real — parsed here,
                      # dependency-free; the flag gates mp3/flac/ogg/video)


# -- REAL container: WAV (RIFF) PCM — dependency-free ------------------------
#
# The audio path's non-fake mode (VERDICT r3 'Next round' #5): standard
# RIFF/WAVE with PCM16 (format 1) or IEEE float32 (format 3) payloads,
# chunk-walked per spec (unknown chunks skipped, odd-size padding
# honored), so real-world WAVs — incl. ones carrying LIST/INFO metadata
# chunks — decode without any external library.

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1, 1] (n,) or (n, ch) → RIFF/WAVE PCM16 bytes.
    Quantization matches the fake codec (rint, clip) so the two paths
    share round-trip semantics."""
    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    q = np.clip(np.rint(s * 32767), -32768, 32767).astype("<i2")
    data = np.ascontiguousarray(q).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block, block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:                       # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (float32 samples in [-1, 1], sample_rate). Mono stays
    (n,); multi-channel returns (n, ch). Accepts PCM 8/16/32-bit
    (format 1) and IEEE float32 (format 3); walks and skips any other
    chunk (LIST, fact, cue, ...)."""
    buf = bytes(data)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, end = 12, 8 + struct.unpack("<I", buf[4:8])[0]
    end = min(end, len(buf))
    fmt_code = channels = rate = bits = None
    raw = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        payload = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate, _bps, _ba, bits = \
                struct.unpack("<HHIIHH", payload[:16])
            if fmt_code == 0xFFFE and size >= 40:   # WAVE_FORMAT_EXTENSIBLE
                fmt_code = struct.unpack("<H", payload[24:26])[0]
        elif cid == b"data":
            raw = payload
        pos += 8 + size + (size & 1)        # word-aligned chunk boundary
    if fmt_code is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code == 1 and bits == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    elif fmt_code == 1 and bits == 8:       # 8-bit PCM is UNSIGNED per spec
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 127.0
    elif fmt_code == 1 and bits == 32:
        s = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483647.0
    elif fmt_code == 3 and bits == 32:
        s = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    else:
        raise NotImplementedError(
            f"WAV format {fmt_code}/{bits}-bit needs libsndfile — only "
            f"PCM 8/16/32 and float32 decode here")
    if channels > 1:
        s = s[:len(s) - len(s) % channels].reshape(-1, channels)
    return s, rate


# -- deterministic fake codec (the container form is real; samples are
#    procedurally generated) -------------------------------------------------

def synth_audio(seed: int, n_samples: int, sample_rate: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    t = np.arange(n_samples, dtype=np.float32) / sample_rate
    freq = 110.0 * (1 + (seed % 16))
    return (0.8 * np.sin(2 * np.pi * freq * t)
            + 0.05 * rng.standard_normal(n_samples).astype(np.float32)) \
        .astype(np.float32)   # headroom below ±1 so int16 encode never clips


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    q = np.clip(np.rint(samples * 32767), -32768, 32767).astype(np.int16)
    return (MAGIC_AUD + struct.pack("<IIH", sample_rate, len(q), 1)
            + zlib.compress(q.tobytes(), 6))


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Container-dispatching audio decode: real RIFF/WAVE PCM decodes
    via :func:`decode_wav` (no stub, no dependency); the deterministic
    fake container (MAGIC_AUD) stays for gates; anything else (mp3/
    flac/ogg) is the remaining REAL_CODECS stub."""
    head = bytes(data[:4])
    if head == b"RIFF":
        return decode_wav(data)
    if head == MAGIC_AUD:
        sr, n, _ch = struct.unpack("<IIH", bytes(data[4:14]))
        q = np.frombuffer(zlib.decompress(bytes(data[14:])), dtype=np.int16)
        return (q.astype(np.float32) / 32767.0)[:n], sr
    raise NotImplementedError(
        "non-WAV compressed audio (mp3/flac/ogg) requires libsndfile/"
        "ffmpeg — not in this container (REAL_CODECS gate)")


def synth_video(seed: int, w: int, h: int, n_frames: int) -> np.ndarray:
    from libgeodesk_spark.media.codec import synth_pixels
    frames = [synth_pixels(seed * 131 + i, w, h) for i in range(n_frames)]
    return np.stack(frames)


def encode_video(frames: np.ndarray, fps: int = 8) -> bytes:
    n, h, w, _ = frames.shape
    return (MAGIC_VID + struct.pack("<HHHH", w, h, n, fps)
            + zlib.compress(np.ascontiguousarray(frames).tobytes(), 3))


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    if REAL_CODECS:
        raise NotImplementedError("real video decode requires ffmpeg")
    assert bytes(data[:4]) == MAGIC_VID
    w, h, n, fps = struct.unpack("<HHHH", bytes(data[4:12]))
    raw = zlib.decompress(bytes(data[12:]))
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3), fps


# -- Spark plumbing (Arrow batch transforms) ---------------------------------

def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip features via one Arrow pass: RMS (×1e6, int), zero-crossing
    count, duration_ms — the feature-extraction UDF shape."""
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("rms_ppm", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
    ])

    def feats(batches):
        for pdf in batches:
            rows = []
            for cid, blob in zip(pdf["clip_id"], pdf["bytes"]):
                s, sr = decode_audio(blob)
                rows.append({
                    "clip_id": cid,
                    "rms_ppm": int(round(float(np.sqrt(np.mean(s * s))) * 1e6)),
                    "zero_crossings": int(np.sum(np.abs(np.diff(np.signbit(s))))),
                    "duration_ms": int(len(s) * 1000 / sr),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(feats, schema=out_schema)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: explode each video into every_n-th frame re-encoded as
    the image codec — the video→image bridge (one Arrow pass)."""
    from libgeodesk_spark.media import codec
    out_schema = T.StructType([
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_png", T.BinaryType(), False),
    ])

    def sample(batches):
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf["video_id"], pdf["bytes"]):
                frames, _fps = decode_video(blob)
                for i in range(0, len(frames), every_n):
                    rows.append({"video_id": vid, "frame_no": i,
                                 "frame_png": codec.encode(frames[i], "png")})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(sample, schema=out_schema)


def resize_images(df: DataFrame, target: int = 16,
                  bytes_col: str = "bytes") -> DataFrame:
    """Nearest-neighbor resize of image payloads to target×target (the
    resize UDF shape; schema preserved, fmt preserved)."""
    from libgeodesk_spark.media import codec
    schema = df.schema

    def rs(batches):
        for pdf in batches:
            out = []
            for blob in pdf[bytes_col]:
                px, fmt = codec.decode(blob)
                h, w = px.shape[:2]
                yi = (np.arange(target) * h // target)
                xi = (np.arange(target) * w // target)
                out.append(codec.encode(px[yi][:, xi], fmt))
            pdf = pdf.copy()
            pdf[bytes_col] = out
            if "w" in pdf.columns:
                pdf["w"] = np.int32(target)
            if "h" in pdf.columns:
                pdf["h"] = np.int32(target)
            yield pdf

    return df.mapInPandas(rs, schema=schema)
