"""Deterministic self-contained image codec (fake but honest).

The container has no PIL/libjpeg, so image decode/encode is implemented as
a deterministic stand-in codec with REAL lossless/lossy semantics (per the
build instructions: stub the codec, keep the Spark-side plumbing real):

* ``bmp``  — raw RGB bytes (lossless)
* ``png``  — zlib-compressed RGB (lossless)
* ``jpeg`` — uniform quantization (step Q=6) + zlib (LOSSY: decoded pixels
  differ from the source; PSNR ≈ 43 dB > the 40 dB gate), mirroring a
  quality-ladder JPEG in spirit: encode is deterministic and idempotent
  (re-encoding already-quantized pixels is the identity, like re-saving a
  JPEG with the same quant tables).

All functions are numpy-vectorized per image; batch loops live in Arrow
UDF wrappers (operators/tileagg.py), never per-pixel Python.

Container format (little-endian):
  magic[4] = b'FBMP' | b'FPNG' | b'FJPG', then uint16 w, uint16 h,
  (jpeg only: uint8 q), then payload bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_BMP = b"FBMP"
MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"

JPEG_Q = 6  # quantization step -> MSE ~ (Q^2-1)/12 ~ 2.9 -> PSNR ~ 43.5 dB

FORMATS = ("png", "jpeg", "bmp")


_GRADIENT_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _gradient(w: int, h: int) -> np.ndarray:
    base = _GRADIENT_CACHE.get((w, h))
    if base is None:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ], axis=-1).astype(np.int16)
        _GRADIENT_CACHE[(w, h)] = base
    return base


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic procedural image: gradient + seeded noise (FIXTURES.md).
    The gradient base depends only on (w, h) and is cached per worker —
    the seeded noise carries all the per-image variation.

    In-place add/clip into the noise buffer: the codec path is
    memory-bandwidth-bound at full thread count (BENCH/BASELINE.md
    hardware controls), so every avoided intermediate array is direct
    throughput."""
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    acc = rng.integers(-32, 33, size=(h, w, 3), dtype=np.int16)
    acc += _gradient(w, h)
    np.clip(acc, 0, 255, out=acc)
    return acc.astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape[:2]
    u8 = np.ascontiguousarray(pixels, dtype=np.uint8)
    if fmt == "bmp":
        return MAGIC_BMP + struct.pack("<HH", w, h) + u8.tobytes()
    if fmt == "png":
        return MAGIC_PNG + struct.pack("<HH", w, h) + zlib.compress(u8.tobytes(), 6)
    if fmt == "jpeg":
        q = JPEG_Q
        # uint8-native quantization: (255//6)*6+3 = 255, so no overflow
        # and no clip — bit-identical to the int16+clip formulation but
        # without the 16-bit round-trip (2 fewer full-image copies)
        quant = (u8 // q) * q + (q // 2)
        return (MAGIC_JPG + struct.pack("<HHB", w, h, q)
                + zlib.compress(quant.tobytes(), 6))
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes) -> tuple[np.ndarray, str]:
    magic = bytes(data[:4])
    if magic == MAGIC_BMP:
        w, h = struct.unpack("<HH", bytes(data[4:8]))
        px = np.frombuffer(data, dtype=np.uint8, offset=8).reshape(h, w, 3)
        return px, "bmp"
    if magic == MAGIC_PNG:
        w, h = struct.unpack("<HH", bytes(data[4:8]))
        raw = zlib.decompress(bytes(data[8:]))
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), "png"
    if magic == MAGIC_JPG:
        w, h, _q = struct.unpack("<HHB", bytes(data[4:9]))
        raw = zlib.decompress(bytes(data[9:]))
        return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), "jpeg"
    raise ValueError(f"bad magic {magic!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    Identical arrays short-circuit on a byte compare (1 read pass) before
    paying the float64 conversion (8x the memory traffic) — the common
    case on lossless formats and idempotent jpeg re-encodes."""
    if a.shape == b.shape and np.array_equal(a, b):
        return float("inf")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def reencode(data: bytes, target_fmt: str | None = None) -> bytes:
    """Decode + re-encode (same format unless target given). Idempotent for
    jpeg (quantization of quantized pixels is the identity)."""
    px, fmt = decode(data)
    return encode(px, target_fmt or fmt)
