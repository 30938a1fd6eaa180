"""Multimodal stages: decode / resize / feature-extract / frame-sample
over opaque binary columns (the training-data-pipeline extensions).

Images are real end-to-end: this repo ships its own deterministic
codecs (functions/codecs.py — raw/pngz/qjpg), and resize is a numpy
nearest-neighbor kernel, so the decode→resize→re-encode path runs for
real with no Pillow/cv2.

Audio decode and video frame-sampling are STUBS: the media libraries
are absent in this sandbox, so the stages define the real Ray-side
contract (schema in/out, actor signature, small batch sizes for wide
binary rows) and raise ``NotImplementedError`` at the codec call —
swap ``_decode_audio`` / ``_decode_video`` for soundfile/PyAV in a
real deployment. The plumbing is tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, (h,w,3) uint8 → (out_h,out_w,3)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi[:, None], xi[None, :]]


def resize_area(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area (box-filter) resize: each output pixel is the mean of its
    source box — the downsampling a thumbnailer actually wants (noise
    averages out, so perceptual hashes stay stable)."""
    h, w = pixels.shape[:2]
    y_edges = (np.arange(out_h + 1) * h) // out_h
    x_edges = (np.arange(out_w + 1) * w) // out_w
    acc = np.add.accumulate(np.add.accumulate(pixels.astype(np.float64), 0), 1)
    acc = np.pad(acc, ((1, 0), (1, 0), (0, 0)))
    ys0, ys1 = y_edges[:-1], y_edges[1:]
    xs0, xs1 = x_edges[:-1], x_edges[1:]
    # upscaling produces empty boxes — widen them to one source pixel
    ys1 = np.minimum(np.maximum(ys1, ys0 + 1), h)
    ys0 = np.minimum(ys0, ys1 - 1)
    xs1 = np.minimum(np.maximum(xs1, xs0 + 1), w)
    xs0 = np.minimum(xs0, xs1 - 1)
    area = (ys1 - ys0)[:, None] * (xs1 - xs0)[None, :]
    s = (
        acc[ys1[:, None], xs1[None, :]]
        - acc[ys0[:, None], xs1[None, :]]
        - acc[ys1[:, None], xs0[None, :]]
        + acc[ys0[:, None], xs0[None, :]]
    )
    return (s / area[..., None]).round().clip(0, 255).astype(np.uint8)


class DecodeImages:
    """Actor-pool stage: binary → decoded metadata + phash. Setup (codec
    tables) once per actor; small batches — wide binary rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, ws, hs, fmts, phashes = [], [], [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
            px, fmt = codecs.decode(buf)
            ids.append(iid)
            ws.append(px.shape[1])
            hs.append(px.shape[0])
            fmts.append(fmt)
            phashes.append(codecs.phash64(px))
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "phash": pa.array(phashes, type=pa.int64()),
        })


class ResizeImages:
    """Actor-pool stage: decode → nearest-neighbor thumbnail →
    re-encode (pngz). Real compute, deterministic."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bufs, phashes = [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
            px, _ = codecs.decode(buf)
            thumb = resize_area(px, self.out_w, self.out_h)
            ids.append(iid)
            bufs.append(codecs.encode(thumb, "pngz"))
            phashes.append(codecs.phash64(thumb))
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "thumb": pa.array(bufs, type=pa.binary()),
            "w": pa.array([self.out_w] * len(ids), type=pa.int32()),
            "h": pa.array([self.out_h] * len(ids), type=pa.int32()),
            "thumb_phash": pa.array(phashes, type=pa.int64()),
        })


def _decode_audio(buf: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio codec not available in this sandbox; plug soundfile/ffmpeg "
        "here — the stage contract below is real and tested"
    )


def _decode_video(buf: bytes):
    raise NotImplementedError(
        "video codec not available in this sandbox; plug PyAV/ffmpeg "
        "here — the stage contract below is real and tested"
    )


class AudioFeatures:
    """STUB stage (contract only): binary audio column →
    (clip_id, sample_rate, duration_s, rms). Raises at the codec seam."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"clip_id": [], "sample_rate": [], "duration_s": [], "rms": []}
        for cid, buf in zip(t["clip_id"].to_pylist(), t["bytes"].to_pylist()):
            wave = _decode_audio(buf)  # NotImplementedError in sandbox
            out["clip_id"].append(cid)
            out["sample_rate"].append(16000)
            out["duration_s"].append(len(wave) / 16000.0)
            out["rms"].append(float(np.sqrt(np.mean(wave**2))))
        return pa.table(out)


class FrameSample:
    """STUB stage (contract only): binary video column → one row per
    sampled frame (video_id, frame_idx, frame_bytes). Raises at the
    codec seam."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"video_id": [], "frame_idx": [], "frame_bytes": []}
        for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            frames = _decode_video(buf)  # NotImplementedError in sandbox
            for i, fr in enumerate(frames):
                if i % self.every_n == 0:
                    out["video_id"].append(vid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(codecs.encode(fr, "pngz"))
        return pa.table(out)
