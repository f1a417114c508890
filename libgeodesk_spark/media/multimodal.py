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
    if REAL_CODECS:
        raise NotImplementedError(
            "real audio decode requires libsndfile/ffmpeg — not in this "
            "container; fake codec path is active instead")
    assert bytes(data[:4]) == MAGIC_AUD
    sr, n, _ch = struct.unpack("<IIH", bytes(data[4:14]))
    q = np.frombuffer(zlib.decompress(bytes(data[14:])), dtype=np.int16)
    return (q.astype(np.float32) / 32767.0)[:n], sr


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
