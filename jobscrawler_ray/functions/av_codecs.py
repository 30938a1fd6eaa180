"""Self-contained deterministic audio/video container codecs.

No soundfile/ffmpeg/PyAV in this environment (SURVEY.md §7), so —
exactly like the image codecs in ``codecs.py`` — the repo defines its
own byte formats for opaque ``binary`` media columns. This makes the
audio/video stages in ``stages/multimodal.py`` REAL end-to-end
(decode, feature-extract, frame-sample run on actual bytes) while the
stage keeps a magic-dispatch seam: buffers in an external format
(wav/mp4/...) still raise ``NotImplementedError`` until a real decoder
is plugged in.

- ``jaud``: 16-bit mono PCM. Header ``JAUD`` + sample_rate u32le +
  n_samples u32le; body = zlib of the sample-to-sample delta stream
  (uint16 wraparound), which compresses smooth waveforms well.
- ``jvid``: frame container. Header ``JVID`` + n_frames u32le; body =
  per frame (length u32le + an image buffer in any ``codecs.py``
  format). Frames decode independently, so a real frame-sampler can
  skip without decoding what it drops.

Everything is numpy-vectorized and bit-deterministic.
"""

from __future__ import annotations

import zlib

import numpy as np

from . import codecs

AUDIO_MAGIC = b"JAUD"
VIDEO_MAGIC = b"JVID"


# -- audio ------------------------------------------------------------------


def encode_audio(wave: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 mono waveform."""
    if wave.dtype != np.int16 or wave.ndim != 1:
        raise ValueError(f"expected 1-D int16, got {wave.shape} {wave.dtype}")
    head = (AUDIO_MAGIC + int(sample_rate).to_bytes(4, "little")
            + int(wave.size).to_bytes(4, "little"))
    delta = np.diff(wave.view(np.uint16), prepend=np.uint16(0))
    return head + zlib.compress(delta.astype("<u2").tobytes(), 6)


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode ``jaud`` → ``(int16 waveform, sample_rate)``."""
    if buf[:4] != AUDIO_MAGIC:
        raise ValueError("not a jaud buffer")
    sample_rate = int.from_bytes(buf[4:8], "little")
    n = int.from_bytes(buf[8:12], "little")
    delta = np.frombuffer(zlib.decompress(buf[12:]), dtype="<u2")
    if delta.size != n:
        raise ValueError(f"jaud length mismatch: header {n}, body {delta.size}")
    # uint16 wraparound cumsum inverts the delta stream exactly
    return np.cumsum(delta, dtype=np.uint16).view(np.int16), sample_rate


# -- video ------------------------------------------------------------------


def encode_video(frames: list[np.ndarray], fmt: str = "qjpg") -> bytes:
    """Encode a list of ``(h, w, 3) uint8`` frames."""
    parts = [VIDEO_MAGIC + len(frames).to_bytes(4, "little")]
    for fr in frames:
        body = codecs.encode(fr, fmt)
        parts.append(len(body).to_bytes(4, "little") + body)
    return b"".join(parts)


def decode_video(buf: bytes) -> list[np.ndarray]:
    """Decode ``jvid`` → list of ``(h, w, 3) uint8`` frames."""
    return [fr for _, fr in sample_video(buf, every_n=1)]


def sample_video(buf: bytes, every_n: int) -> list[tuple[int, np.ndarray]]:
    """Walk the length-prefixed frame table and decode ONLY every
    ``every_n``-th frame — dropped frames are skipped by offset, never
    decompressed (what makes frame-sampling cheap on long videos).
    Returns ``[(frame_idx, pixels), ...]``."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not a jvid buffer")
    n = int.from_bytes(buf[4:8], "little")
    out, off = [], 8
    for i in range(n):
        ln = int.from_bytes(buf[off:off + 4], "little")
        off += 4
        if i % every_n == 0:
            out.append((i, codecs.decode(buf[off:off + ln])[0]))
        off += ln
    if off != len(buf):
        raise ValueError("jvid trailing bytes")
    return out


# -- deterministic synthesis (tests / synthetic media columns) --------------


def gen_wave(seed64: int, sample_rate: int = 16000) -> np.ndarray:
    """Deterministic int16 clip: two-tone sine mix, per-seed duration
    (0.25–1.125 s) and frequencies — discriminative RMS/duration across
    seeds, smooth enough that the delta codec compresses."""
    rng = np.random.default_rng(seed64 & 0xFFFF_FFFF_FFFF_FFFF)
    dur_steps = int(rng.integers(2, 10))  # × 0.125 s
    n = dur_steps * sample_rate // 8
    f1 = 110.0 * float(rng.integers(1, 25))
    f2 = 110.0 * float(rng.integers(1, 25))
    amp = 0.35 + 0.4 * float(rng.random())
    t = np.arange(n, dtype=np.float64) / sample_rate
    a = 0.65 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
    return np.round(a * amp * 32767.0).astype(np.int16)


def gen_speech_wave(seed64: int, sample_rate: int = 16000) -> np.ndarray:
    """Deterministic "speech-like" int16 clip: the two-tone mix of
    :func:`gen_wave` gated by a per-seed on/off pattern of 125 ms
    frames — voiced runs separated by TRUE silence, so an
    energy-threshold VAD has real segments to find. 1–2 s per clip;
    at least one voiced and one silent frame guaranteed."""
    rng = np.random.default_rng(
        (seed64 ^ 0x5EED_0F5E_6A4D_517E) & 0xFFFF_FFFF_FFFF_FFFF)
    n_frames = int(rng.integers(8, 17))  # × 0.125 s
    gate = rng.random(n_frames) < 0.55
    if gate.all():
        gate[int(rng.integers(0, n_frames))] = False
    if not gate.any():
        gate[int(rng.integers(0, n_frames))] = True
    f1 = 110.0 * float(rng.integers(1, 25))
    f2 = 110.0 * float(rng.integers(1, 25))
    amp = 0.35 + 0.4 * float(rng.random())
    spf = sample_rate // 8  # samples per 125 ms gate frame
    t = np.arange(n_frames * spf, dtype=np.float64) / sample_rate
    a = 0.65 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
    a *= np.repeat(gate.astype(np.float64), spf)
    return np.round(a * amp * 32767.0).astype(np.int16)


def gen_scene_frames(seed64: int, w: int = 16, h: int = 16) -> list[np.ndarray]:
    """Deterministic MULTI-SCENE frame sequence: 2–4 scenes of 4–8
    frames each; within a scene frames drift from the scene's own base
    image (near-dups, like :func:`gen_frames`), and a scene switch
    jumps to an unrelated base — what a real cut detector sees."""
    rng = np.random.default_rng(
        (seed64 ^ 0x5CE7E_C075) & 0xFFFF_FFFF_FFFF_FFFF)
    n_scenes = int(rng.integers(2, 5))
    frames: list[np.ndarray] = []
    for s in range(n_scenes):
        base = codecs.gen_pixels(
            (seed64 * 1_000_003 + s * 97 + 11) & 0xFFFF_FFFF_FFFF_FFFF,
            w, h).astype(np.int16)
        n = int(rng.integers(4, 9))
        frames += [(base + 6 * i).clip(0, 255).astype(np.uint8)
                   for i in range(n)]
    return frames


def gen_frames(seed64: int, w: int = 16, h: int = 16) -> list[np.ndarray]:
    """Deterministic frame sequence (8–16 frames): each frame is the
    seed's base image with a per-frame brightness drift, so consecutive
    frames are near-dups (what a real sampler sees) while distinct
    seeds stay far apart."""
    rng = np.random.default_rng((seed64 ^ 0x9E3779B97F4A7C15) & 0xFFFF_FFFF_FFFF_FFFF)
    n = int(rng.integers(8, 17))
    base = codecs.gen_pixels(seed64, w, h).astype(np.int16)
    return [
        (base + 6 * i).clip(0, 255).astype(np.uint8)
        for i in range(n)
    ]
