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
    if fmt == "png":  # STANDARD format, native (std_codecs.py)
        from . import std_codecs

        return std_codecs.encode_png(pixels)
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
    """Decode any of the three self-built formats — or a STANDARD one
    (PNG natively, JPEG via the Pillow-guarded branch; see
    functions/std_codecs.py): returns ``(pixels, fmt)``. The standard
    magics (0x89 'PNG', 0xff JPEG SOI) don't collide with the
    one-byte self-built magics {0,1,2}."""
    from . import std_codecs

    ext = std_codecs.sniff_image(buf)
    if ext is not None:
        return std_codecs.decode_image_external(buf, ext), ext
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
    """64-bit perceptual hash: average-hash over an 8×8 area downsample
    of the grayscale image, with *proportional* block edges (i·h/8) so
    the same image at different resolutions partitions into the same
    relative blocks — which is what makes the hash resize-robust.
    Signed int64 for the Arrow ``phash:int64`` column. numpy-only."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    acc = np.add.accumulate(np.add.accumulate(gray, 0), 1)
    acc = np.pad(acc, ((1, 0), (1, 0)))
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(9) * w) // 8
    y0, y1 = ye[:-1], ye[1:]
    x0, x1 = xe[:-1], xe[1:]
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = (
        acc[y1[:, None], x1[None, :]]
        - acc[y0[:, None], x1[None, :]]
        - acc[y1[:, None], x0[None, :]]
        + acc[y0[:, None], x0[None, :]]
    )
    small = s / np.maximum(area, 1)
    bits = (small > small.mean()).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(v)))


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: an 8×9 proportional box-mean grid of the
    grayscale image, bit = (block mean > its right neighbor) — a
    horizontal-GRADIENT hash, structurally independent of the
    average-hash ``phash64`` (the second detector a production image
    dedup pass cross-checks against, imagehash-style). Shares phash's
    proportional block edges, hence its resize robustness. Signed
    int64 for the Arrow column. numpy-only."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    acc = np.add.accumulate(np.add.accumulate(gray, 0), 1)
    acc = np.pad(acc, ((1, 0), (1, 0)))
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(10) * w) // 9
    y0, y1 = ye[:-1], ye[1:]
    x0, x1 = xe[:-1], xe[1:]
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = (
        acc[y1[:, None], x1[None, :]]
        - acc[y0[:, None], x1[None, :]]
        - acc[y1[:, None], x0[None, :]]
        + acc[y0[:, None], x0[None, :]]
    )
    small = s / np.maximum(area, 1)  # (8, 9)
    bits = (small[:, :-1] > small[:, 1:]).flatten()  # 8×8 diffs
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(v)))


def gen_pixels(seed64: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic image: a per-seed low-frequency structure
    (upsampled 6×6 random grid — what phash responds to) plus noise, so
    perceptual hashes are discriminative across images while remaining
    robust to resize/quantization."""
    rng = np.random.default_rng(seed64 & 0xFFFF_FFFF_FFFF_FFFF)
    low = rng.integers(0, 256, size=(6, 6, 3)).astype(np.float64)
    yi = (np.arange(h) * 6 // max(h, 1)).clip(0, 5)
    xi = (np.arange(w) * 6 // max(w, 1)).clip(0, 5)
    structure = low[yi[:, None], xi[None, :]]
    noise = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
    return (0.72 * structure + 0.28 * noise).clip(0, 255).astype(np.uint8)
