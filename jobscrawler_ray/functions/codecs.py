"""Self-contained deterministic image codecs + fidelity metrics.

No Pillow / libjpeg / cv2 in this environment (SURVEY.md §7), so the
engine defines its own byte formats for the ``bytes`` column of the
image+caption output table (``BASELINE.json`` ``input_hint``):

- ``raw``  : uncompressed RGB8, little 8-byte header.
- ``pngz`` : zlib-deflate of the raw pixel buffer (lossless).
- ``qjpg`` : deterministic lossy codec — per-channel quantization to a
  step of 8 (reconstructed at bin centers) then zlib. Worst-case
  per-pixel error is 4, giving PSNR ≈ 40.7 dB on uniform error — just
  above the 40 dB conformance bar, so the PSNR check has real teeth.

All functions are numpy-vectorized; decode returns ``(h, w, 3) uint8``.

Header layout (9 bytes): magic u8 {0=raw,1=pngz,2=qjpg}, w u32le, h u32le.
"""

from __future__ import annotations

import zlib

import numpy as np

MAGIC = {"raw": 0, "pngz": 1, "qjpg": 2}
FMT_OF_MAGIC = {v: k for k, v in MAGIC.items()}
_QSTEP = 8


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an ``(h, w, 3) uint8`` array into the named format."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    head = bytes([MAGIC[fmt]]) + int(w).to_bytes(4, "little") + int(h).to_bytes(4, "little")
    if fmt == "raw":
        return head + pixels.tobytes()
    if fmt == "pngz":
        return head + zlib.compress(pixels.tobytes(), 6)
    if fmt == "qjpg":
        q = (pixels >> 3).astype(np.uint8)  # 5-bit planes
        return head + zlib.compress(q.tobytes(), 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(buf: bytes) -> tuple[np.ndarray, str]:
    """Decode any of the three formats; returns ``(pixels, fmt)``."""
    magic = buf[0]
    w = int.from_bytes(buf[1:5], "little")
    h = int.from_bytes(buf[5:9], "little")
    fmt = FMT_OF_MAGIC[magic]
    body = buf[9:]
    if fmt == "raw":
        arr = np.frombuffer(body, dtype=np.uint8)
    elif fmt == "pngz":
        arr = np.frombuffer(zlib.decompress(body), dtype=np.uint8)
    else:  # qjpg: reconstruct at bin centers
        q = np.frombuffer(zlib.decompress(body), dtype=np.uint8)
        arr = (q.astype(np.uint16) * _QSTEP + _QSTEP // 2).clip(0, 255).astype(np.uint8)
    return arr.reshape(h, w, 3), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images;
    ``inf`` for identical images."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash (average-hash over an 8×8 block-mean
    downsample of the grayscale image). Signed int64 for the Arrow
    ``phash:int64`` column. Deterministic, numpy-only."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # pad to multiples of 8 by edge replication, then block-mean to 8x8
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    bh, bw = gray.shape[0] // 8, gray.shape[1] // 8
    small = gray.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return int(np.int64(np.uint64(v)))


def gen_pixels(seed64: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic image: seeded PRNG pixels with a low-freq
    gradient so phash/PSNR behave like natural images (not pure noise)."""
    rng = np.random.default_rng(seed64 & 0xFFFF_FFFF_FFFF_FFFF)
    noise = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    yy, xx = np.meshgrid(np.linspace(0, 255, h), np.linspace(0, 255, w), indexing="ij")
    grad = np.stack([xx, yy, (xx + yy) / 2], axis=2)
    return ((noise.astype(np.float64) + grad) / 2).clip(0, 255).astype(np.uint8)
