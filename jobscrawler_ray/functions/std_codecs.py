"""STANDARD-format codec adapters (VERDICT r4 item 3): the bridge from
this repo's self-built formats (codecs.py raw/pngz/qjpg, av_codecs.py
jaud/jvid) to the formats a real corpus arrives in.

Two tiers, matching the fetch-backend registry pattern:

- NATIVE (always available, stdlib-only, tested in-sandbox):
  * PNG  — a real encoder/decoder over ``zlib``: 8-bit RGB/RGBA,
    non-interlaced, all five scanline filters on decode (filter 0 on
    encode), CRC-checked chunks on the way out. This is the actual
    PNG wire format — output opens in any viewer.
  * WAV  — RIFF/WAVE PCM16 via the stdlib ``wave`` module.
- IMPORT-GUARDED (libs absent in this sandbox; branch raises
  ``NotImplementedError`` with remediation until they exist):
  * JPEG and exotic PNGs (16-bit/interlaced/paletted) → Pillow.
  * FLAC / OGG → soundfile.
  * MP4 / WebM → PyAV.

The reference stores scraped payloads as opaque DB text/bytea
(``src/crawler.py``); byte-level image handling is this engine's
extension, so there is no reference file to cite for the formats
themselves — PNG follows RFC 2083, WAV the RIFF/WAVE spec.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8\xff"
RIFF_SIG = b"RIFF"
FLAC_SIG = b"fLaC"
OGG_SIG = b"OggS"
MKV_SIG = b"\x1aE\xdf\xa3"  # matroska / webm EBML


def sniff_image(buf: bytes) -> str | None:
    """Magic-sniff an external image format (None = not external —
    the self-built codecs' one-byte magics don't collide with these)."""
    if buf[:8] == PNG_SIG:
        return "png"
    if buf[:3] == JPEG_SIG:
        return "jpeg"
    return None


# ---------------------------------------------------------------- PNG

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → real PNG bytes (8-bit RGB, filter 0 rows).
    Deterministic (fixed zlib level), viewable anywhere."""
    h, w = pixels.shape[:2]
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png wants (h, w, 3) uint8")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    # one filter byte (0 = None) per scanline, then the raw row
    raster = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raster[:, 0] = 0
    raster[:, 1:] = pixels.reshape(h, w * 3)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raster.tobytes(), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    return b if pb_ <= pc_ else c


def decode_png(buf: bytes) -> np.ndarray:
    """Real PNG decode: 8-bit RGB / RGBA (alpha dropped), greyscale
    widened, non-interlaced, all five filters. Anything fancier
    (16-bit, palette, interlace) falls through to the Pillow branch."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        return _pillow_decode(buf, "png (16-bit/palette/interlaced)")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filt, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filt[y]), data[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: cumulative per byte-lane
            rec = (line.reshape(w, ch).astype(np.int64).cumsum(0) % 256
                   ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = line + prior  # uint8 wraps mod 256, as the spec wants
        elif f in (3, 4):  # Average / Paeth — sequential in x, so this
            # is the one unavoidable Python loop; it runs on plain-int
            # lists (numpy scalar indexing was ~8× slower per byte) and
            # only for adaptive-filtered EXTERNAL PNGs when Pillow is
            # absent — decode_image_external prefers Pillow when it
            # imports, and our own encoder emits filter 0.
            ln, pr = line.tolist(), prior.tolist()
            rc = [0] * stride
            if f == 3:
                for x in range(stride):
                    left = rc[x - ch] if x >= ch else 0
                    rc[x] = (ln[x] + ((left + pr[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = rc[x - ch] if x >= ch else 0
                    ul = pr[x - ch] if x >= ch else 0
                    up = pr[x]
                    p = left + up - ul
                    pa = p - left
                    if pa < 0:
                        pa = -pa
                    pb = p - up
                    if pb < 0:
                        pb = -pb
                    pc = p - ul
                    if pc < 0:
                        pc = -pc
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    rc[x] = (ln[x] + pred) & 0xFF
            rec = np.asarray(rc, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y], prior = rec, rec
    px = out.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def _pillow_decode(buf: bytes, what: str) -> np.ndarray:
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            f"external image format ({what}) needs Pillow — "
            "pip install pillow off-sandbox; PNG RGB8 decodes natively"
        ) from e
    img = Image.open(io.BytesIO(buf)).convert("RGB")  # pragma: no cover
    return np.asarray(img, dtype=np.uint8)  # pragma: no cover


def decode_image_external(buf: bytes, fmt: str) -> np.ndarray:
    """Dispatch an externally-formatted image buffer → (h, w, 3)."""
    if fmt == "png":
        try:
            # Pillow's C filter reconstruction beats the native path on
            # adaptive-filtered (Average/Paeth) rows; same pixels either
            # way — PNG decode is lossless.
            return _pillow_decode(buf, "png")
        except NotImplementedError:
            return decode_png(buf)
    return _pillow_decode(buf, fmt)  # jpeg and friends


# ---------------------------------------------------------------- WAV

def encode_wav(wave_i16: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 waveform → RIFF/WAVE PCM bytes (stdlib ``wave``)."""
    import wave as _wave

    bio = io.BytesIO()
    with _wave.open(bio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(int(sample_rate))
        f.writeframes(np.asarray(wave_i16, dtype="<i2").tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (mono int16 waveform, sample_rate). Multi-
    channel input is averaged to mono (the feature stages are mono)."""
    import wave as _wave

    try:
        f = _wave.open(io.BytesIO(buf), "rb")
    except _wave.Error:
        # stdlib wave only speaks PCM containers — IEEE-float (format
        # tag 3) and compressed WAVs land here, on the guarded seam.
        return _soundfile_decode(buf, "wav (non-PCM format tag)")
    with f:
        nch, width, sr = f.getnchannels(), f.getsampwidth(), f.getframerate()
        if width != 2:
            return _soundfile_decode(buf, f"wav pcm{width * 8}")
        data = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    if nch > 1:
        data = data.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return data.astype(np.int16), sr


def _soundfile_decode(buf: bytes, what: str) -> tuple[np.ndarray, int]:
    try:
        import soundfile as sf
    except ImportError as e:
        raise NotImplementedError(
            f"external audio format ({what}) needs soundfile — "
            "pip install soundfile off-sandbox; WAV PCM16 decodes natively"
        ) from e
    data, sr = sf.read(io.BytesIO(buf), dtype="int16")  # pragma: no cover
    if data.ndim > 1:  # pragma: no cover
        data = data.mean(axis=1).astype(np.int16)
    return data, int(sr)  # pragma: no cover


def decode_audio_external(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-dispatch an external audio buffer."""
    if buf[:4] == RIFF_SIG and buf[8:12] == b"WAVE":
        return decode_wav(buf)
    if buf[:4] in (FLAC_SIG, OGG_SIG):
        return _soundfile_decode(buf, buf[:4].decode("latin1").strip())
    raise NotImplementedError(
        "unrecognized audio container: native = jaud/wav, "
        "soundfile handles flac/ogg off-sandbox")


# -------------------------------------------------------------- video

def is_external_video(buf: bytes) -> bool:
    return buf[4:8] == b"ftyp" or buf[:4] == MKV_SIG


def decode_video_external(buf: bytes) -> list[np.ndarray]:
    """MP4 / WebM → RGB frames via PyAV when present."""
    try:
        import av
    except ImportError as e:
        raise NotImplementedError(
            "external video format (mp4/webm) needs PyAV — "
            "pip install av off-sandbox; jvid decodes natively"
        ) from e
    frames = []  # pragma: no cover
    with av.open(io.BytesIO(buf)) as container:  # pragma: no cover
        for frame in container.decode(video=0):
            frames.append(frame.to_ndarray(format="rgb24"))
    return frames  # pragma: no cover
