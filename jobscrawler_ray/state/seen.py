"""Sharded URL-seen set (north_rule; replaces SURVEY.md §2.3 T3, §2.4 J1).

The reference dedups with one synchronous ``SELECT EXISTS`` per link
(``src/utils/handy.py:11-22``). Here the durable seen set is K cuckoo
filter shards, each a plain Ray actor addressed by
``hash64(host) % K`` — host-hash partitioning isolates hot hosts
(skew) and keeps one shard's filter local to one process/node. Calls are
batched: the crawl wave routes candidates with a ``groupby(shard)`` and
issues ONE ``check_and_add`` RPC per shard per wave (vs per-record
round-trips in the reference).

First-wins determinism: within a call the shard resolves duplicates in
the given order; the caller sorts candidates by the frontier ``seq`` key
first, so the surviving row is exactly the one the sequential reference
would have kept (page order → DOM order).

Each shard optionally keeps an exact hash-set sidecar — used at test
scale to verify the filter's false-positive behavior and for
exact-membership conformance; at bench/100TB scale the sidecar is off
and the cuckoo filter alone bounds memory (16 bits/URL ≈ 20 GB per
10^10 URLs across all shards).
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter


class _SeenShard:
    """One shard of the URL-seen set. Run as a Ray actor."""

    def __init__(self, capacity: int, seed: int, exact_sidecar: bool):
        self.filter = CuckooFilter(capacity, seed=seed)
        # sidecar keys are the full SHA1 hex strings (true exactness); the
        # filter indexes the first-8-bytes hash64 of the same SHA1
        self.exact: set[str] | None = set() if exact_sidecar else None

    def check_and_add(self, hashes: np.ndarray, keys: list[str] | None = None) -> np.ndarray:
        """Anti-join primitive: bool mask ``seen_before`` (first-wins in
        input order); unseen keys are inserted."""
        hashes = np.asarray(hashes)
        if self.exact is not None and keys is not None:
            out = np.empty(len(keys), dtype=bool)
            for i, k in enumerate(keys):
                if k in self.exact:
                    out[i] = True
                else:
                    out[i] = False
                    self.exact.add(k)
            # keep the filter in sync so both paths stay exercised
            self.filter.contains_and_add_many(hashes)
            return out
        return self.filter.contains_and_add_many(hashes)

    def contains(self, hashes: np.ndarray, keys: list[str] | None = None) -> np.ndarray:
        if self.exact is not None and keys is not None:
            return np.fromiter((k in self.exact for k in keys), dtype=bool, count=len(keys))
        return self.filter.contains_many(np.asarray(hashes))

    def dump_exact(self) -> list[str]:
        return sorted(self.exact) if self.exact is not None else []

    # -- shuffle-free wave protocol (offer → finalize → verdicts) --------
    #
    # Replaces the groupby(shard)-shuffle gate: map tasks push their
    # candidate keys (exec C), the driver triggers one deterministic
    # first-wins resolution per shard (finalize, sorted by global gseq),
    # and a second map pass labels rows via the cached verdict table
    # (exec D). Actor transiently holds one wave's candidates — bounded
    # by the politeness budget, not the frontier.

    def offer_candidates(self, wave: int, colpack: tuple) -> bool:
        """colpack: column-wise tuple of 9 parallel lists — (url_sha1,
        gseq, kind, follow_link, canon_url, host, priority, rate, seq).
        The last four feed the admitted rows' politeness demand for
        wave+1 (computed in finalize, so the whole anti-join + next-wave
        demand needs no extra pass). Column-wise transport pickles ~3×
        faster than row tuples at 100k+ candidates per wave."""
        buf = getattr(self, "_offer_buf", None)
        if buf is None or getattr(self, "_offer_wave", None) != wave:
            self._offer_buf = buf = []
            self._offer_wave = wave
        buf.extend(zip(*colpack))
        return True

    def finalize(self, wave: int) -> int:
        """First-wins in global gseq order (site rank → page → DOM);
        admitted records also claim their derived image URL here, so the
        derived-image emission in the labeling pass is pre-authorized."""
        import hashlib

        from ..functions.priority import pack_priority

        rows = sorted(getattr(self, "_offer_buf", []) or [], key=lambda r: (r[1], r[2]))
        # verdict = (label, winning_gseq): rows of the same key with a
        # later gseq are intra-wave duplicates → "dup" (first-wins).
        # Vectorized: one bulk filter probe up front, one bulk insert at
        # the end; the loop only touches python sets.
        verdicts: dict[str, tuple[str, int]] = {}
        emit_image: dict[str, bool] = {}
        # per-host demand of the rows this wave ADMITS (they are the next
        # wave's frontier): host -> [count, sorted-prio-list, rate]
        demand: dict[str, list] = {}

        def _demand(host: str, prio: int, rate: float):
            d = demand.setdefault(host, [0, [], float(rate)])
            d[0] += 1
            d[1].append(int(prio))

        n = len(rows)
        if n:
            h64 = np.fromiter(
                (int(r[0][:16], 16) & 0x7FFF_FFFF_FFFF_FFFF for r in rows),
                dtype=np.uint64, count=n,
            )
            pre = self.filter.contains_many(h64)
            new_h: list[int] = []
            new_h_set: set[int] = set()  # distinct keys sharing an h64
            #   (hash collision) need only one fingerprint — inserting
            #   every copy would overflow its two buckets
            new_keys: list[str] = []
            img_pending: list[tuple[str, str, str, float, int]] = []
            for i, (sha, gseq, kind, follow, canon, host, prio, rate, seq) in enumerate(rows):
                if sha in verdicts:
                    continue  # intra-wave duplicate; first occurrence won
                if self.exact is not None:
                    seen_before = sha in self.exact
                else:
                    seen_before = bool(pre[i])
                if seen_before:
                    verdicts[sha] = ("dup", int(gseq))
                    continue
                if self.exact is not None:
                    self.exact.add(sha)
                hv = int(h64[i])
                if hv not in new_h_set:
                    new_h_set.add(hv)
                    new_h.append(hv)
                new_keys.append(sha)
                if kind != "candidate":
                    # image → image_frontier, detail2 → detail2_frontier
                    verdicts[sha] = (f"{kind}_frontier", int(gseq))
                    _demand(host, prio, rate)
                elif follow:
                    verdicts[sha] = ("detail", int(gseq))
                    _demand(host, prio, rate)
                else:
                    verdicts[sha] = ("record", int(gseq))
                    img_sha = hashlib.sha1((canon + "/image").encode()).hexdigest()
                    img_pending.append((sha, img_sha, host, rate, int(seq)))
            if new_h:
                self.filter.add_many(np.array(new_h, dtype=np.uint64))
            if img_pending:
                ih = np.fromiter(
                    (int(s[:16], 16) & 0x7FFF_FFFF_FFFF_FFFF for _, s, _, _, _ in img_pending),
                    dtype=np.uint64, count=len(img_pending),
                )
                ipre = self.filter.contains_many(ih)
                add_h: list[int] = []
                for j, (cand_sha, img_sha, host, rate, seq) in enumerate(img_pending):
                    if self.exact is not None:
                        dup = img_sha in self.exact
                    else:
                        dup = bool(ipre[j])
                    emit_image[cand_sha] = not dup
                    if not dup:
                        if self.exact is not None:
                            self.exact.add(img_sha)
                        add_h.append(int(ih[j]))
                        # derived image fetch joins the next wave too
                        _demand(host, int(pack_priority(0, 2, 0, seq + 1)), rate)
                if add_h:
                    self.filter.add_many(np.array(add_h, dtype=np.uint64))
        for d in demand.values():
            d[1].sort()
        self._verdicts = verdicts
        self._emit_image = emit_image
        self._admit_demand = demand
        self._final_wave = wave
        self._offer_buf = []
        counts: dict[str, int] = {}
        for label, _ in verdicts.values():
            counts[label] = counts.get(label, 0) + 1
        return counts

    def verdicts(self, wave: int) -> tuple[dict, dict]:
        assert wave == getattr(self, "_final_wave", None)
        return self._verdicts, self._emit_image

    # label codes for the array-transport verdicts (verdict_arrays)
    LABELS = ("dup", "detail", "detail2_frontier", "image_frontier", "record")
    _LABEL_CODE = {name: i for i, name in enumerate(LABELS)}

    def verdict_arrays(self, wave: int):
        """Verdicts as sorted numpy arrays — (keys:S40, label_code:int8,
        win_gseq:int64, emit_keys:S40, emit_vals:bool) — built once on
        the actor per wave. Worker processes label candidate batches
        with np.searchsorted over the concatenated shard arrays:
        ~17 bytes/key instead of Python-dict entries (a 1M-key verdict
        table as dicts cost ~600 MB per worker process and measurably
        flattened wave throughput through memory pressure)."""
        assert wave == getattr(self, "_final_wave", None)
        if getattr(self, "_arr_wave", None) != wave:
            items = sorted(self._verdicts.items())
            n = len(items)
            keys = np.array([k for k, _ in items], dtype="S40")
            labs = np.fromiter((self._LABEL_CODE[v[0]] for _, v in items),
                               dtype=np.int8, count=n)
            wins = np.fromiter((v[1] for _, v in items),
                               dtype=np.int64, count=n)
            eitems = sorted(self._emit_image.items())
            ekeys = np.array([k for k, _ in eitems], dtype="S40")
            evals = np.fromiter((bool(v) for _, v in eitems),
                                dtype=bool, count=len(eitems))
            self._arrays = (keys, labs, wins, ekeys, evals)
            self._arr_wave = wave
        return self._arrays

    def admitted_demand(self, wave: int) -> dict:
        """Per-host politeness demand of the rows this finalize admitted
        — the driver forwards it to the politeness shards for wave+1."""
        assert wave == getattr(self, "_final_wave", None)
        return {h: (d[0], d[1][: int(2 * d[2]) + 2], d[2])
                for h, d in self._admit_demand.items()}

    def count(self) -> int:
        return len(self.exact) if self.exact is not None else self.filter.count

    def snapshot(self, path: str) -> str:
        """Persist shard state for checkpoint/resume (atomic rename).
        Includes the last finalized wave's verdicts, so a resumed run can
        label that wave's candidates (they are the next frontier)."""
        import json

        tmp = path + ".tmp"
        exact = (
            np.array(sorted(self.exact), dtype="U40")
            if self.exact is not None
            else np.array([], dtype="U40")
        )
        state = {
            "final_wave": getattr(self, "_final_wave", None),
            "verdicts": getattr(self, "_verdicts", {}),
            "emit_image": getattr(self, "_emit_image", {}),
        }
        blob = np.frombuffer(json.dumps(state).encode("utf-8"), dtype=np.uint8)
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f,
                buckets=self.filter.buckets,
                count=np.int64(self.filter.count),
                seed=np.int64(self.filter.seed),
                has_exact=np.bool_(self.exact is not None),
                exact=exact,
                wave_state=blob,
            )
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        import json

        with np.load(path) as z:
            f = CuckooFilter.__new__(CuckooFilter)
            f.buckets = z["buckets"].copy()
            f.nbuckets = f.buckets.shape[0]
            f.mask = np.uint64(f.nbuckets - 1)
            f.count = int(z["count"])
            f.seed = int(z["seed"])
            self.filter = f
            self.exact = set(z["exact"].tolist()) if bool(z["has_exact"]) else None
            if "wave_state" in z.files:
                st = json.loads(bytes(z["wave_state"].tobytes()).decode("utf-8"))
                self._final_wave = st["final_wave"]
                self._verdicts = {k: tuple(v) for k, v in st["verdicts"].items()}
                self._emit_image = st["emit_image"]
        return self.count()


SeenShard = ray.remote(num_cpus=0)(_SeenShard)


class SeenSet:
    """Driver-side facade over the shard actors."""

    def __init__(self, num_shards: int, capacity_per_shard: int, seed: int = 0,
                 exact_sidecar: bool = True):
        self.num_shards = num_shards
        self.shards = [
            SeenShard.remote(capacity_per_shard, seed + i, exact_sidecar)
            for i in range(num_shards)
        ]

    def handles(self) -> list:
        return list(self.shards)

    def total_count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))

    def finalize(self, wave: int) -> None:
        ray.get([s.finalize.remote(wave) for s in self.shards])

    def membership(self) -> set[str]:
        """Exact membership (sidecar mode only) — conformance tests."""
        out: set[str] = set()
        for part in ray.get([s.dump_exact.remote() for s in self.shards]):
            out.update(part)
        return out

    def snapshot(self, ckpt_dir: str, wave: int) -> list[str]:
        os.makedirs(ckpt_dir, exist_ok=True)
        paths = [
            os.path.join(ckpt_dir, f"seen_w{wave:04d}_s{i:03d}.bin")
            for i in range(self.num_shards)
        ]
        return ray.get(
            [s.snapshot.remote(p) for s, p in zip(self.shards, paths)]
        )

    def restore(self, paths: list[str]) -> int:
        return sum(ray.get([s.restore.remote(p) for s, p in zip(self.shards, paths)]))

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []
