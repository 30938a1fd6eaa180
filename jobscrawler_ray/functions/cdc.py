"""Content-defined chunking (CDC) over opaque binary blobs.

The blob-level dedup primitive (FastCDC/LBFS lineage: cut a byte
stream where a rolling hash of the trailing window hits a mask, so
chunk boundaries survive insertions/deletions and identical content
re-chunks identically regardless of how blobs are framed). At 100 TB
this is what turns "same image re-crawled under a new URL" into a
storage no-op: chunk hashes dedup globally while boundaries stay
local to each blob — the op is map-only by construction.

The rolling hash is a degree-(W-1) polynomial in the FNV-64 prime over
the trailing W bytes, mod 2^64 (uint64 wraparound):

    H_i = sum_{j=0..W-1}  b[i-j] * P^j

computed FULLY VECTORIZED as W shifted multiply-adds over the whole
buffer (no per-byte Python). The sequential twin in
``pipelines/goldens.py`` uses the sliding recurrence
``H_i = (H_{i-1} - b[i-W]*P^(W-1))*P + b[i]`` instead — an independent
route to the same values.
"""

from __future__ import annotations

import hashlib

import numpy as np

P = 0x100000001B3  # FNV-64 prime (odd → full-period mod 2^64)
WINDOW = 16
MASK_BITS = 5  # expected chunk length 2^5 = 32 bytes between cuts
MIN_LEN = 32
MAX_LEN = 256


def window_hashes(data: np.ndarray, window: int = WINDOW) -> np.ndarray:
    """uint64 rolling hash of every trailing ``window``-byte run:
    position i (i >= window-1) holds the hash of bytes
    ``data[i-window+1 : i+1]``; earlier positions are 0."""
    if data.dtype != np.uint8:
        raise ValueError(f"expected uint8 bytes, got {data.dtype}")
    n = data.size
    out = np.zeros(n, dtype=np.uint64)
    if n < window:
        return out
    b = data.astype(np.uint64)
    pw = 1
    for j in range(window):
        out[window - 1:] += b[window - 1 - j:n - j] * np.uint64(pw)
        pw = (pw * P) & 0xFFFF_FFFF_FFFF_FFFF
    return out


def cdc_boundaries(buf: bytes, mask_bits: int = MASK_BITS,
                   min_len: int = MIN_LEN, max_len: int = MAX_LEN,
                   window: int = WINDOW) -> list[tuple[int, int]]:
    """Chunk a buffer → ``[(offset, length), ...]`` covering it exactly.
    A cut lands after byte i when the window hash has ``mask_bits``
    trailing zero bits, subject to ``min_len``/``max_len`` (oversize
    runs force cuts at ``max_len``). Candidate detection is one
    vectorized pass; the enforcement walk is over the (sparse)
    candidate list, not the bytes."""
    n = len(buf)
    if n == 0:
        return []
    h = window_hashes(np.frombuffer(buf, dtype=np.uint8), window)
    mask = np.uint64((1 << mask_bits) - 1)
    cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER byte i
    cand = cand[cand >= window]  # full windows only
    out: list[tuple[int, int]] = []
    start = 0
    for c in cand:
        c = int(c)
        while c - start > max_len:
            out.append((start, max_len))
            start += max_len
        if c - start < min_len:
            continue
        out.append((start, c - start))
        start = c
    while n - start > max_len:
        out.append((start, max_len))
        start += max_len
    if n > start:
        out.append((start, n - start))
    return out


def chunk_hash64(chunk: bytes) -> int:
    """int64 chunk fingerprint: first 8 bytes of SHA-1, big-endian,
    signed — the dedup key a chunk store would index on."""
    return int.from_bytes(hashlib.sha1(chunk).digest()[:8], "big",
                          signed=True)
