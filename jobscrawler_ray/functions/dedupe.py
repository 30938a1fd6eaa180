"""Near-duplicate detection kernels: MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine. Pure numpy; the distributed wiring (shingle →
minhash per batch → band explode → ``groupby(band)`` → candidate pairs →
verify) lives in pipelines/queries.py.

All public-knowledge constructions: MinHash (Broder 1997), LSH banding
(Mining of Massive Datasets ch.3), SimHash (Charikar 2002),
winnowing-style shingling.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    d = hashlib.sha1(s.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles, hashed to int64 (sorted unique)."""
    toks = text.split(" ")
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    out = {_stable_hash64(g) for g in grams}
    return np.array(sorted(out), dtype=np.int64)


class MinHasher:
    """num_perm universal-hash permutations h_i(x) = (a_i x + b_i) mod p
    over 32-bit shingle hashes. With x < 2^32 and a < 2^29 the product
    fits in uint64 exactly, so the whole signature is one vectorized
    numpy expression (no object math). Deterministic given seed; built
    once per actor/process."""

    def __init__(self, num_perm: int = 64, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 29, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.int64)
        x = (shingles.astype(np.uint64) & np.uint64(0xFFFF_FFFF))[:, None]
        vals = (x * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0).astype(np.int64)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """LSH banding: hash each band of rows_per_band signature values."""
        r = self.num_perm // bands
        keys = []
        for b in range(bands):
            chunk = sig[b * r : (b + 1) * r].tobytes()
            d = hashlib.sha1(bytes([b]) + chunk).digest()
            keys.append(int.from_bytes(d[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF)
        return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted int64 shingle arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(tokens: list[str]) -> int:
    """Charikar SimHash over token hashes (unit weights)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = _stable_hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return int(np.int64(np.uint64(v)))


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """``simhash64(text.split(" "))`` for a whole batch, bit-identical,
    with each distinct token hashed ONCE per batch — the per-token sha1
    dominates the naive loop (natural text repeats tokens heavily). The
    ±1 accumulation is a per-doc gather-sum over the bits matrix for
    typical docs, switching to counts @ bits when a doc has more token
    occurrences than the batch vocabulary (bounds the transient at
    O(vocab × 64) instead of O(doc_len × 64))."""
    uniq: dict[str, int] = {}
    doc_tokens: list[np.ndarray] = []
    for t in texts:
        toks = t.split(" ")  # NB "" → [""]: the empty token hashes,
        idx = np.empty(len(toks), dtype=np.int64)  # exactly like the
        # scalar call sites do
        for i, tok in enumerate(toks):
            j = uniq.get(tok)
            if j is None:
                j = len(uniq)
                uniq[tok] = j
            idx[i] = j
        doc_tokens.append(idx)
    if uniq:
        hs = np.array([_stable_hash64(t) for t in uniq], dtype=np.uint64)
        # (U, 64) matrix of ±1 bit contributions
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64) * 2 - 1
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    out = np.empty(len(texts), dtype=np.int64)
    for d, idx in enumerate(doc_tokens):
        if idx.size == 0:
            out[d] = 0
            continue
        if idx.size > len(uniq):
            acc = np.bincount(idx, minlength=len(uniq)).astype(np.int64) @ bits
        else:
            acc = bits[idx].sum(axis=0)
        out[d] = np.int64(((acc > 0) * weights).sum(dtype=np.uint64))
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


_SWAR_M1 = np.uint64(0x5555_5555_5555_5555)
_SWAR_M2 = np.uint64(0x3333_3333_3333_3333)
_SWAR_M4 = np.uint64(0x0F0F_0F0F_0F0F_0F0F)
_SWAR_H01 = np.uint64(0x0101_0101_0101_0101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; Hacker's Delight 5-2) — this
    numpy predates ``np.bitwise_count``. int64 inputs are reinterpreted
    as their two's-complement bit patterns, matching DuckDB's
    ``bit_count(BIGINT)``."""
    if x.dtype == np.int64:
        x = x.view(np.uint64)
    x = x.astype(np.uint64) if x.dtype != np.uint64 else x.copy()
    x -= (x >> np.uint64(1)) & _SWAR_M1
    x = (x & _SWAR_M2) + ((x >> np.uint64(2)) & _SWAR_M2)
    x = (x + (x >> np.uint64(4))) & _SWAR_M4
    return ((x * _SWAR_H01) >> np.uint64(56)).astype(np.int64)


def hamming_pairs(pids: np.ndarray, hashes: np.ndarray, max_d: int = 8,
                  block: int = 2048) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i < j) index pairs with Hamming(hashes[i], hashes[j]) ≤
    ``max_d``, emitted as (pids[i], pids[j], distance). The distance
    matrix is blocked on BOTH axes, so transient memory is O(block²)
    regardless of the input length (one long run must not allocate a
    block × n matrix)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    m = len(hashes)
    for r in range(0, m, block):
        hr = hashes[r:r + block]
        for c in range(r, m, block):
            d = popcount64(np.bitwise_xor(hr[:, None],
                                          hashes[c:c + block][None, :]))
            ii, jj = np.nonzero(d <= max_d)
            gi, gj = ii + r, jj + c
            keep = gj > gi  # strict upper triangle in global indices
            out_a.append(pids[gi[keep]])
            out_b.append(pids[gj[keep]])
            out_d.append(d[ii[keep], jj[keep]].astype(np.int64))
    if not out_a:
        return (np.array([], dtype=pids.dtype), np.array([], dtype=pids.dtype),
                np.array([], dtype=np.int64))
    return np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_d)


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int,
                round_decimals: int = 6) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: (Q,d)×(N,d) → (Q,k) ids + scores.
    One numpy matmul per batch against the broadcast query matrix; scores
    rounded before ranking so cross-engine ties break identically by id."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    cn = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    sims = np.round(qn @ cn.T, round_decimals)  # (Q, N)
    # stable sort on -score → ties resolve to the lower corpus id
    order = np.argsort(-sims, axis=1, kind="stable")
    top = order[:, :k]
    return top, np.take_along_axis(sims, top, axis=1)
