"""Multimodal stages: decode / resize / feature-extract / frame-sample
over opaque binary columns (the training-data-pipeline extensions).

Images are real end-to-end: this repo ships its own deterministic
codecs (functions/codecs.py — raw/pngz/qjpg), and resize is a numpy
nearest-neighbor kernel, so the decode→resize→re-encode path runs for
real with no Pillow/cv2.

Audio and video are real too, over this repo's own container formats
(``functions/av_codecs.py``: ``jaud`` delta-PCM, ``jvid`` per-frame
image container) — decode, RMS/duration features, and frame-sampling
all run on actual bytes. ``_decode_audio`` / ``_decode_video`` keep a
magic-dispatch seam to STANDARD formats (functions/std_codecs.py):
WAV PCM16 and PNG decode natively (stdlib), while jpeg/flac/mp4 route
through import-guarded Pillow/soundfile/PyAV branches that raise
``NotImplementedError`` with remediation until the lib exists — the
one seam a real deployment swaps, same pattern as the fetch backend
registry. The plumbing and codecs are tested (tests/test_multimodal_embed.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import av_codecs, codecs, std_codecs
from ..functions.urlnorm import hash64


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


def _decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-dispatch decode seam → ``(int16 waveform, sample_rate)``.
    ``jaud`` and STANDARD WAV (RIFF/WAVE PCM16, stdlib ``wave``) decode
    natively; flac/ogg go through the soundfile-guarded branch
    (functions/std_codecs.py) and raise NotImplementedError with
    remediation until the lib exists."""
    if buf[:4] == av_codecs.AUDIO_MAGIC:
        return av_codecs.decode_audio(buf)
    return std_codecs.decode_audio_external(buf)


def _decode_video(buf: bytes) -> list[np.ndarray]:
    """Magic-dispatch decode seam → list of ``(h, w, 3) uint8`` frames.
    This repo's own ``jvid`` decodes natively; mp4/webm go through the
    PyAV-guarded branch (functions/std_codecs.py)."""
    if buf[:4] == av_codecs.VIDEO_MAGIC:
        return av_codecs.decode_video(buf)
    if std_codecs.is_external_video(buf):
        return std_codecs.decode_video_external(buf)
    raise NotImplementedError(
        "unrecognized video container: native = jvid, PyAV handles "
        "mp4/webm off-sandbox"
    )


def audio_rms(wave: np.ndarray) -> float:
    """RMS of an int16 waveform in [-1, 1] units, rounded for stable
    cross-engine hashing (single sequential reduction per clip — no
    partition-order dependence)."""
    x = wave.astype(np.float64) / 32768.0
    return round(float(np.sqrt(np.mean(x * x))), 6)


class AudioFeatures:
    """Actor-pool stage: binary audio column →
    (clip_id, sample_rate, duration_s, rms). Small batches — wide
    binary rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"clip_id": [], "sample_rate": [], "duration_s": [], "rms": []}
        for cid, buf in zip(t["clip_id"].to_pylist(), t["bytes"].to_pylist()):
            wave, sr = _decode_audio(buf)
            out["clip_id"].append(cid)
            out["sample_rate"].append(sr)
            out["duration_s"].append(round(len(wave) / sr, 6))
            out["rms"].append(audio_rms(wave))
        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.int64()),
            "sample_rate": pa.array(out["sample_rate"], type=pa.int64()),
            "duration_s": pa.array(out["duration_s"], type=pa.float64()),
            "rms": pa.array(out["rms"], type=pa.float64()),
        })


_PATCH_P = 8            # ViT-style patch side (pixels)
_PATCH_FLAT_VAR = 400.0  # luma variance below which a patch is "flat"


class DhashRows:
    """Actor-pool stage: per image emit (pid, dhash) for the ORIGINAL
    and its 32×32 area-resize thumbnail — the dual-variant row stream
    the banded Hamming detector consumes. One decode per image feeds
    both variants (vs two separate decode stages)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        pids, hashes = [], []
        for iid, buf in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            px, _ = codecs.decode(buf)
            pids.append(iid)
            hashes.append(codecs.dhash64(px))
            thumb = resize_area(px, self.out_w, self.out_h)
            pids.append(f"{iid}#thumb")
            hashes.append(codecs.dhash64(thumb))
        return pa.table({
            "pid": pa.array(pids, type=pa.string()),
            "dhash": pa.array(hashes, type=pa.int64()),
        })


class ImagePatches:
    """Actor-pool stage: decode binary images, emit ViT-style
    fixed-grid patch statistics per image — patch count, flat
    (low-detail) patch count, and cropped mean luma. The patch grid is
    the unit a vision-transformer tokenizes; flat-patch fraction is
    the standard low-information gate for image curation. Vectorized:
    one reshape→transpose→var(axis) per image, no per-patch loop."""

    def __init__(self, p: int = _PATCH_P,
                 flat_var: float = _PATCH_FLAT_VAR):
        self.p, self.flat_var = p, flat_var

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_p, n_f, ml = [], [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            px, _ = codecs.decode(buf)
            lum = px.astype(np.float64) @ [0.299, 0.587, 0.114]
            hp, wp = lum.shape[0] // self.p, lum.shape[1] // self.p
            crop = lum[:hp * self.p, :wp * self.p]
            v = crop.reshape(hp, self.p, wp, self.p) \
                .transpose(0, 2, 1, 3).reshape(hp * wp, -1).var(axis=1)
            ids.append(iid)
            n_p.append(hp * wp)
            n_f.append(int((v < self.flat_var).sum()))
            ml.append(round(float(crop.mean()), 4))
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "n_patches": pa.array(n_p, type=pa.int64()),
            "n_flat": pa.array(n_f, type=pa.int64()),
            "mean_luma": pa.array(ml, type=pa.float64()),
        })


_ASR_CHUNK_S = 0.25  # fixed ASR inference window
_ASR_HOP_S = 0.20    # hop (0.05 s overlap tail carried into next chunk)


class AsrChunks:
    """Actor-pool stage: binary audio → fixed-window chunk rows for
    batched ASR inference (the Whisper-style fixed window + hop an
    ASR pipeline feeds its model): one row per chunk with
    (clip_id, chunk_idx, start_s, dur_s, rms). Map-only — no shuffle
    at any corpus size; the last chunk may be shorter (tail kept)."""

    def __init__(self, chunk_s: float = _ASR_CHUNK_S,
                 hop_s: float = _ASR_HOP_S):
        self.chunk_s, self.hop_s = chunk_s, hop_s

    def __call__(self, t: pa.Table) -> pa.Table:
        out: dict[str, list] = {"clip_id": [], "chunk_idx": [],
                                "start_s": [], "dur_s": [], "rms": []}
        for cid, buf in zip(t["clip_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            wave, sr = _decode_audio(buf)
            cl = int(round(self.chunk_s * sr))
            hop = int(round(self.hop_s * sr))
            for k, s in enumerate(range(0, len(wave), hop)):
                seg = wave[s:s + cl]
                out["clip_id"].append(cid)
                out["chunk_idx"].append(k)
                out["start_s"].append(round(s / sr, 6))
                out["dur_s"].append(round(len(seg) / sr, 6))
                out["rms"].append(audio_rms(seg))
        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.int64()),
            "chunk_idx": pa.array(out["chunk_idx"], type=pa.int64()),
            "start_s": pa.array(out["start_s"], type=pa.float64()),
            "dur_s": pa.array(out["dur_s"], type=pa.float64()),
            "rms": pa.array(out["rms"], type=pa.float64()),
        })


_ROLLOFF_FRAC = 0.85


def spectral_stats(wave: np.ndarray, sr: int) -> tuple[float, float, float]:
    """Magnitude-spectrum summary of an int16 clip: spectral centroid,
    bandwidth (magnitude-weighted std around the centroid) and the
    85% rolloff frequency, all in Hz rounded to 3 — the shared leaf of
    the engine stage and its golden twin (the audio_rms precedent)."""
    x = wave.astype(np.float64) / 32768.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    total = mag.sum()
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(np.sqrt((mag * (freqs - centroid) ** 2).sum()
                              / total))
    rolloff = float(freqs[np.searchsorted(np.cumsum(mag),
                                          _ROLLOFF_FRAC * total)])
    return round(centroid, 3), round(bandwidth, 3), round(rolloff, 3)


class AudioSpectral:
    """Actor-pool stage: binary audio → per-clip spectral summary
    (centroid / bandwidth / rolloff Hz) — the frequency-domain
    complement of AudioFeatures' time-domain RMS; what an audio
    curation gate filters on (hiss, hum, band-limited clips)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"clip_id": [], "centroid_hz": [], "bandwidth_hz": [],
               "rolloff_hz": []}
        for cid, buf in zip(t["clip_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            wave, sr = _decode_audio(buf)
            c, b, r = spectral_stats(wave, sr)
            out["clip_id"].append(cid)
            out["centroid_hz"].append(c)
            out["bandwidth_hz"].append(b)
            out["rolloff_hz"].append(r)
        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.int64()),
            "centroid_hz": pa.array(out["centroid_hz"],
                                    type=pa.float64()),
            "bandwidth_hz": pa.array(out["bandwidth_hz"],
                                     type=pa.float64()),
            "rolloff_hz": pa.array(out["rolloff_hz"],
                                   type=pa.float64()),
        })


class ImageColorHist:
    """Actor-pool stage: decode binary images, emit a 4×4×4 RGB
    histogram summary per image — dominant-color bin (tie → lowest
    index) and color entropy in bits, the palette-diversity gate an
    image curation pass filters on (flat logos vs photographs)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, npx, top, ent = [], [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            px, _ = codecs.decode(buf)
            q = px.reshape(-1, 3) // 64
            idx = q[:, 0] * 16 + q[:, 1] * 4 + q[:, 2]
            hist = np.bincount(idx, minlength=64)
            n = int(hist.sum())
            p = hist[hist > 0] / n
            ids.append(iid)
            npx.append(n)
            top.append(int(np.argmax(hist)))
            ent.append(round(float(-(p * np.log2(p)).sum()), 4))
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "n_px": pa.array(npx, type=pa.int64()),
            "top_bin": pa.array(top, type=pa.int64()),
            "entropy": pa.array(ent, type=pa.float64()),
        })


class FrameSample:
    """Actor-pool stage: binary video column → one row per sampled
    frame (video_id, frame_idx, frame_bytes, frame_phash). The ``jvid``
    container stores frames length-prefixed, so real sampling skips
    undecoded frames."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"video_id": [], "frame_idx": [], "frame_bytes": [], "frame_phash": []}
        for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            if buf[:4] == av_codecs.VIDEO_MAGIC:
                sampled = av_codecs.sample_video(buf, self.every_n)
            else:  # external formats decode fully at the seam
                sampled = [(i, fr) for i, fr in enumerate(_decode_video(buf))
                           if i % self.every_n == 0]
            for i, fr in sampled:
                out["video_id"].append(vid)
                out["frame_idx"].append(i)
                out["frame_bytes"].append(codecs.encode(fr, "pngz"))
                out["frame_phash"].append(codecs.phash64(fr))
        return pa.table({
            "video_id": pa.array(out["video_id"], type=pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], type=pa.int64()),
            "frame_bytes": pa.array(out["frame_bytes"], type=pa.binary()),
            "frame_phash": pa.array(out["frame_phash"], type=pa.int64()),
        })


class VadSegments:
    """Actor-pool stage: binary audio column → one row per VOICED
    segment (clip_id, seg_idx, start_s, end_s, seg_rms) via
    energy-threshold voice-activity detection: 25 ms frames → per-frame
    RMS → threshold mask → contiguous voiced runs (vectorized
    ``np.flatnonzero(np.diff(mask))`` run detection per clip — no
    per-sample Python). Segmentation is per-clip, so the stage is
    map-only at any corpus size; wide binary rows keep batches small.

    The reference has no audio path — this is the training-data
    multimodal extension (speech corpora are VAD-segmented before
    transcription/packing)."""

    FRAME_S = 0.025
    RMS_THRESHOLD = 500.0  # int16 units; gated synth silence is exact 0

    def __call__(self, t: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "clip_id": [], "seg_idx": [], "start_s": [], "end_s": [],
            "seg_rms": []}
        for cid, buf in zip(t["clip_id"].to_pylist(), t["bytes"].to_pylist()):
            wave, sr = _decode_audio(buf)
            flen = int(round(sr * self.FRAME_S))
            n_frames = len(wave) // flen
            if n_frames == 0:
                continue
            x = wave[:n_frames * flen].astype(np.float64).reshape(
                n_frames, flen)
            frame_rms = np.sqrt(np.mean(x * x, axis=1))
            mask = frame_rms > self.RMS_THRESHOLD
            # contiguous voiced runs: transitions of the padded mask
            edges = np.flatnonzero(np.diff(
                np.concatenate(([False], mask, [False])).astype(np.int8)))
            starts, ends = edges[0::2], edges[1::2]  # [start, end) frames
            for k, (s, e) in enumerate(zip(starts, ends)):
                seg = wave[s * flen:e * flen]
                out["clip_id"].append(cid)
                out["seg_idx"].append(k)
                out["start_s"].append(round(s * self.FRAME_S, 6))
                out["end_s"].append(round(e * self.FRAME_S, 6))
                out["seg_rms"].append(audio_rms(seg))
        return pa.table({
            "clip_id": pa.array(out["clip_id"], type=pa.int64()),
            "seg_idx": pa.array(out["seg_idx"], type=pa.int64()),
            "start_s": pa.array(out["start_s"], type=pa.float64()),
            "end_s": pa.array(out["end_s"], type=pa.float64()),
            "seg_rms": pa.array(out["seg_rms"], type=pa.float64()),
        })


def _frame_diffs(frames: list[np.ndarray]) -> np.ndarray:
    """Consecutive-frame mean-absolute pixel deltas — ONE kernel shared
    by SceneCuts (boundaries) and SceneClips (spans) so the two can
    never desynchronize. Empty for clips under 2 frames."""
    if len(frames) < 2:
        return np.array([], dtype=np.float64)
    stack = np.stack(frames).astype(np.float64)
    return np.mean(np.abs(stack[1:] - stack[:-1]), axis=(1, 2, 3))


class SceneCuts:
    """Actor-pool stage: binary video column → one row per detected
    scene cut (video_id, cut_idx, frame_diff): decode, stack frames,
    mean absolute pixel delta between consecutive frames (one
    vectorized reduction per clip), cut where the delta exceeds the
    threshold. ``cut_idx`` is the first frame of the NEW scene.

    Per-clip and map-only — consecutive-frame deltas never cross clip
    boundaries, so there is no shuffle at any corpus size. At real
    video lengths the full decode would be replaced by the
    keyframe-stride decode ``av_codecs.sample_video`` already provides;
    frames here are short synthetic clips."""

    DIFF_THRESHOLD = 30.0  # within-scene drift is 6/frame; cuts ~85

    def __call__(self, t: pa.Table) -> pa.Table:
        out: dict[str, list] = {"video_id": [], "cut_idx": [], "frame_diff": []}
        for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            diffs = _frame_diffs(_decode_video(buf))
            for i in np.flatnonzero(diffs > self.DIFF_THRESHOLD):
                out["video_id"].append(vid)
                out["cut_idx"].append(int(i) + 1)
                out["frame_diff"].append(round(float(diffs[i]), 4))
        return pa.table({
            "video_id": pa.array(out["video_id"], type=pa.int64()),
            "cut_idx": pa.array(out["cut_idx"], type=pa.int64()),
            "frame_diff": pa.array(out["frame_diff"], type=pa.float64()),
        })


class SceneClips:
    """Actor-pool stage: binary video column → one row per SCENE span
    (video_id, scene_idx, start_frame, end_frame, n_frames) — the
    clip-sampling units a video training pipeline cuts AFTER shot
    detection. Shares SceneCuts' consecutive-frame delta kernel; spans
    are the complement of the cut set ([start, end) frame ranges)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out: dict[str, list] = {"video_id": [], "scene_idx": [],
                                "start_frame": [], "end_frame": [],
                                "n_frames": []}
        thr = SceneCuts.DIFF_THRESHOLD
        for vid, buf in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            frames = _decode_video(buf)
            n = len(frames)
            if n == 0:
                continue
            cuts = np.flatnonzero(_frame_diffs(frames) > thr) + 1
            edges = np.concatenate(([0], cuts, [n]))
            for k in range(len(edges) - 1):
                s, e = int(edges[k]), int(edges[k + 1])
                out["video_id"].append(vid)
                out["scene_idx"].append(k)
                out["start_frame"].append(s)
                out["end_frame"].append(e)
                out["n_frames"].append(e - s)
        return pa.table({
            "video_id": pa.array(out["video_id"], type=pa.int64()),
            "scene_idx": pa.array(out["scene_idx"], type=pa.int64()),
            "start_frame": pa.array(out["start_frame"], type=pa.int64()),
            "end_frame": pa.array(out["end_frame"], type=pa.int64()),
            "n_frames": pa.array(out["n_frames"], type=pa.int64()),
        })


class ClipAlign:
    """CLIP-style image-caption alignment scorer (two-tower cosine) —
    the LAION-style curation signal (reference has no CLIP stage; this
    is a training-data-pipeline extension). The towers are
    deterministic stand-ins (no torch in this sandbox — the seam
    mirrors stages/embed.py's guarded real-model branch): the text
    tower hashes caption words into a fixed seeded projection, the
    image tower area-resamples the decoded pixels to one 8×8 block
    through another. Both projections build ONCE per actor in
    ``__init__``; ``__call__`` scores a batch (decode dominates the
    per-row loop, the DecodeImages idiom).

    Float determinism: the text tower sums projection rows in sorted
    bucket order (take + axis-0 sum — never a shape-varying gemm) and
    the image tower is a fixed-shape (192,)@(192,D) gemv, so a row's
    score is identical regardless of batch composition — the
    sequential golden reproduces scores bit-for-bit."""

    DIM = 64
    TXT_BUCKETS = 4096

    def __init__(self, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.tproj = rng.standard_normal((self.TXT_BUCKETS, self.DIM))
        self.iproj = rng.standard_normal((8 * 8 * 3, self.DIM))

    def text_vec(self, caption: str) -> np.ndarray:
        idx = np.sort(np.fromiter(
            (hash64(tok) % self.TXT_BUCKETS for tok in caption.split(" ")),
            dtype=np.int64))
        v = (self.tproj[idx].sum(axis=0) if idx.size
             else np.zeros(self.DIM))
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def img_vec(self, buf: bytes) -> np.ndarray:
        px, _ = codecs.decode(buf)
        block = resize_area(px, 8, 8).astype(np.float64).ravel() / 255.0
        v = block @ self.iproj
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def score(self, buf: bytes, caption: str) -> float:
        return float(np.dot(self.img_vec(buf), self.text_vec(caption)))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        scores = [self.score(b, c) for b, c in
                  zip(t["bytes"].to_pylist(), t["caption"].to_pylist())]
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "raw_score": pa.array(scores, type=pa.float64()),
        })
