"""Cuckoo filter: the approximate-membership core of the URL-seen set.

Replaces the reference's per-link ``SELECT EXISTS`` round-trip to
Postgres (``src/utils/handy.py:11-22`` — its main throughput ceiling)
with an in-memory, serializable, false-positive-bounded filter. One
filter per host-hash shard (see ``state/seen.py``); at 10^10-URL scale
each shard holds its slice of the keyspace and persists to the
checkpoint directory between waves.

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public paper):
4-slot buckets, 16-bit fingerprints, alternate bucket
``i2 = (i1 ^ hash(fp)) % n``, bounded eviction kicks. ~98% load factor,
false-positive rate ≈ 4·2/2^16 ≈ 1.2e-4 at full load.

Vectorized batch ``contains_many`` (numpy gather + compare); inserts
loop only over genuinely-new keys. Serialization = the raw bucket array
(npz), restored on resume.
"""

from __future__ import annotations

import io

import numpy as np

_FP_MULT = np.uint64(0x5BD1E995)
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        # round buckets up to a power of two >= capacity/4 / 0.95
        nb = 1
        need = max(8, int(capacity / 4 / 0.95) + 1)
        while nb < need:
            nb <<= 1
        self.nbuckets = nb
        self.mask = np.uint64(nb - 1)
        self.buckets = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self.seed = seed

    # -- hashing ---------------------------------------------------------
    def _fp(self, h: np.ndarray) -> np.ndarray:
        """16-bit fingerprint in 1..65535 (0 = empty slot)."""
        fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint64)
        return np.where(fp == 0, np.uint64(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64) & self.mask).astype(np.uint64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return ((i1 ^ (fp * _FP_MULT)) & self.mask).astype(np.uint64)

    # -- batch ops -------------------------------------------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test for an int64/uint64 key-hash array."""
        h = hashes.astype(np.uint64)
        fp = self._fp(h).astype(np.uint16)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp.astype(np.uint64))
        b1 = self.buckets[i1.astype(np.int64)]  # (n,4)
        b2 = self.buckets[i2.astype(np.int64)]
        fpc = fp[:, None]
        return ((b1 == fpc).any(axis=1)) | ((b2 == fpc).any(axis=1))

    def _hash_parts(self, h: np.ndarray):
        """(fp, i1, i2) for a key array, as plain-int lists — the insert
        loop runs on Python ints (per-key numpy scalar construction cost
        ~30µs/key and dominated seen-set finalize at bench scale)."""
        fp = self._fp(h)
        i1 = (h & self.mask).astype(np.uint64)
        i2 = ((i1 ^ (fp * _FP_MULT)) & self.mask)
        return fp.tolist(), i1.tolist(), i2.tolist()

    def _slot_insert(self, fp: int, i1: int, i2: int, h: int) -> bool:
        """Place fp in a free slot of bucket i1/i2, else evict-insert."""
        B = self.buckets
        for i in (i1, i2):
            row = B[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    self.count += 1
                    return True
        return self._evict_insert(h, fp, i1, i2)

    def add_many(self, hashes: np.ndarray) -> int:
        """Insert every key-hash; returns number actually inserted
        (pre-existing fingerprints in their buckets are skipped, which is
        exactly the first-wins dedup semantics)."""
        h = hashes.astype(np.uint64)
        present = self.contains_many(h)
        new = h[~present]
        if not len(new):
            return 0
        fps, i1s, i2s = self._hash_parts(new)
        inserted = 0
        for hv, fp, i1, i2 in zip(new.tolist(), fps, i1s, i2s):
            if self._slot_insert(fp, i1, i2, hv):
                inserted += 1
        return inserted

    def contains_and_add_many(self, hashes: np.ndarray) -> np.ndarray:
        """The anti-join primitive: returns a boolean ``seen_before`` mask
        and inserts every unseen key. Duplicates *within* the batch are
        resolved first-wins in input order."""
        h = hashes.astype(np.uint64)
        out = np.zeros(len(h), dtype=bool)
        # fast path: batch-level pre-check
        pre = self.contains_many(h)
        out |= pre
        # loop only over the (few) unseen; handles intra-batch dups
        unseen = np.flatnonzero(~pre)
        if not len(unseen):
            return out
        hu = h[unseen]
        fps, i1s, i2s = self._hash_parts(hu)
        B = self.buckets
        for k, idx in enumerate(unseen.tolist()):
            fp, i1, i2 = fps[k], i1s[k], i2s[k]
            if (B[i1] == fp).any() or (B[i2] == fp).any():
                out[idx] = True  # intra-batch duplicate (earlier row won)
            else:
                self._slot_insert(fp, i1, i2, int(hu[k]))
        return out

    # -- scalar ops ------------------------------------------------------
    def _contains_one(self, h: np.uint64) -> bool:
        fp = np.uint16(self._fp(np.array([h], dtype=np.uint64))[0])
        i1 = int(h & self.mask)
        i2 = int((np.uint64(i1) ^ (np.uint64(fp) * _FP_MULT)) & self.mask)
        return bool((self.buckets[i1] == fp).any() or (self.buckets[i2] == fp).any())

    def _insert_one(self, h: np.uint64) -> bool:
        fp = int(self._fp(np.array([h], dtype=np.uint64))[0])
        i1 = int(h & self.mask)
        i2 = int((np.uint64(i1) ^ (np.uint64(fp) * _FP_MULT)) & self.mask)
        return self._slot_insert(fp, i1, i2, int(h))

    def _evict_insert(self, h: int, fp: int, i1: int, i2: int) -> bool:
        """Deterministic pseudo-random eviction walk seeded from the key
        (both target buckets full — rare below ~95% load)."""
        rng = np.random.default_rng(int(h) ^ self.seed)
        i = int(rng.choice((i1, i2)))
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(0, 4))
            cur, self.buckets[i, slot] = int(self.buckets[i, slot]), cur
            i = int((np.uint64(i) ^ (np.uint64(cur) * _FP_MULT)) & self.mask)
            row = self.buckets[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        raise RuntimeError(
            f"cuckoo filter over capacity (count={self.count}, nbuckets={self.nbuckets})"
        )

    def delete_many(self, hashes: np.ndarray) -> int:
        """Remove one fingerprint copy per present key; returns removed count."""
        removed = 0
        for hv in hashes.astype(np.uint64):
            fp = np.uint16(self._fp(np.array([hv], dtype=np.uint64))[0])
            i1 = int(hv & self.mask)
            i2 = int((np.uint64(i1) ^ (np.uint64(fp) * _FP_MULT)) & self.mask)
            for i in (i1, i2):
                hit = np.flatnonzero(self.buckets[i] == fp)
                if len(hit):
                    self.buckets[i, hit[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed

    # -- persistence (checkpoint/resume) ---------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(
            buf, buckets=self.buckets, count=np.int64(self.count), seed=np.int64(self.seed)
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        with np.load(io.BytesIO(data)) as z:
            buckets = z["buckets"]
            obj = cls.__new__(cls)
            obj.buckets = buckets
            obj.nbuckets = buckets.shape[0]
            obj.mask = np.uint64(obj.nbuckets - 1)
            obj.count = int(z["count"])
            obj.seed = int(z["seed"])
        return obj
