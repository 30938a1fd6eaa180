"""The distributed URL-frontier + fetch scheduler (the north-star pipeline).

Replaces the reference's single-process asyncio loop
(``src/main.py:25-42`` + ``src/crawler.py:320-377``) with a
driver-controlled *wave* loop over ``ray.data.Dataset`` stages:

    pol.finalize(k)    # token grants from demand piggybacked by wave k-1
    THE wave execution (one fused map-only chain):
        [wave k-1 candidates labeled lazily against the finalized
         verdicts → admitted rows become detail/detail2/image fetches,
         pass-through records, derived image rows]  ∪  deferred rows
          → threshold gate → fetch+parse
          → write parsed/, hive-partitioned by out_kind.
        Piggybacks: seen-set offers for this wave's new candidates;
        politeness demand (wave k+1) for deferred rows. Every real
        fetch also emits a compact fetchlog row.
    seen.finalize(k)   # cuckoo anti-join, first-wins in global gseq
                       # order; also computes the admitted rows'
                       # politeness demand, forwarded driver-side
    manifest (checkpoint; next frontier = defer ∪ candidate dirs;
              seen snapshots carry the verdicts so a resumed run can
              label wave k's candidates)

    (Cold start — wave 0 or resume — runs one extra frontier scan to
    rebuild the politeness demand the previous wave would have
    piggybacked.)

Every wave stage is map-only: the politeness and seen gates use an
offer → finalize → cached-lookup protocol against the shard actors
instead of a groupby shuffle — on this Ray build each AllToAll
(sort/repartition) barrier costs ~10s wall regardless of data size and
caps wave parallelism at the key count, which flattened 8→32-CPU
scaling. Reads split into balanced blocks via override_num_blocks (a
repartition would itself be an AllToAll). Every intermediate is a
hive-partitioned parquet directory, so (a) the frontier never lives in
driver RAM (north_rule: 10^10-URL frontier spills between waves), (b)
each wave is resumable from its manifest, and (c) record/image/error
splits are plain subdirectory reads with zero re-filtering work.

Ordering conformance (SURVEY.md §7.4): the reference's realized order is
sequential per site — listing page p, then each surviving job's
follow-link fetch, then page p+1 (``async_bs4.py:318-368``). The engine
reproduces that order *per host* through the packed priority key: a
listing at page-index ``i`` gets ``seq = i·(2J+2)``, its jobs
``seq+1+2s``, their images ``seq+2+2s`` — so the engine's fetch log
sorted by (host, gseq, depth) equals the oracle's sequential per-host
fetch sequence, while cross-host interleaving is free (first-wins dedup
makes it order-insensitive; the seen gate resolves intra-wave duplicates
in global ``gseq`` order — site rank → page → DOM — and earlier waves
always win, which per host coincides with the reference's page→DOM
order).

Dedup-before-follow (the reference checks the DB *before* the
follow-link fetch, ``async_bs4.py:154-167``) maps to the two-phase wave:
listing parse emits candidates, the seen gate admits them, and wave k+1
fetches only survivors.

Scale notes (100 TB / 256-node design intent):
- fetch+parse is a stateless ``map_batches`` over Arrow batches; the
  deterministic world backend is cached once per worker *process* (an
  actor pool would re-spawn per wave execution; long-lived state that
  must survive the run — seen set, politeness — lives in real actors).
- the two shuffles per wave are keyed by host-hash (politeness shard,
  seen shard): hot hosts are isolated per shard, and politeness budgets
  cap per-host wave contribution, turning skew into deferral.
- wave size is bounded by the politeness budget, not frontier size; the
  un-admitted frontier is parquet on disk.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import astuple, dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions import codecs
from ..functions.priority import pack_priority
from ..functions.urlnorm import canonicalize, hash64, host_of, sha1_hex
from ..stages.parse import parse_apply_link, parse_detail, parse_listing, whole_page_text
from ..state.checkpoint import WaveManifest, ckpt_dir, latest_manifest, write_manifest
from ..state.politeness import PolitenessPool
from ..state.seen import SeenSet
from ..synth.world import World, WorldParams

# --------------------------------------------------------------------------
# Wire schemas (int64 everywhere internally; the published image table
# narrows to the input_hint's int32 w/h at the sink)
# --------------------------------------------------------------------------

FRONTIER_FIELDS: list[tuple[str, pa.DataType]] = [
    ("url", pa.string()),
    ("canon_url", pa.string()),
    ("url_sha1", pa.string()),
    ("host", pa.string()),
    ("host_hash", pa.int64()),
    ("shard", pa.int64()),
    ("pol_shard", pa.int64()),
    ("depth", pa.int64()),
    ("seq", pa.int64()),   # site-local order key (page→DOM→depth)
    ("gseq", pa.int64()),  # global order key: site_rank·span + seq (dedup ties)
    ("fairness_round", pa.int64()),
    ("priority", pa.int64()),
    ("site_id", pa.string()),
    ("strategy", pa.string()),
    ("kind", pa.string()),  # listing | detail | image | candidate
    ("follow_link", pa.bool_()),
    ("two_hop", pa.bool_()),
    ("inner_link_tag", pa.string()),
    ("politeness_rps", pa.float64()),
    ("elements_path", pa.string()),  # JSON; carried on listing rows only
    ("title", pa.string()),
    ("link", pa.string()),
    ("location", pa.string()),
    ("description", pa.string()),
    ("image_id", pa.string()),
    ("wave", pa.int64()),
]
FRONTIER_COLS = [n for n, _ in FRONTIER_FIELDS]

PARSED_EXTRA: list[tuple[str, pa.DataType]] = [
    ("status", pa.int64()),
    ("out_kind", pa.string()),  # candidate | frontier_image | record | image | error
    ("img_bytes", pa.binary()),
    ("w", pa.int64()),
    ("h", pa.int64()),
    ("fmt", pa.string()),
    ("phash", pa.int64()),
    ("error", pa.string()),
]
PARSED_FIELDS = FRONTIER_FIELDS + PARSED_EXTRA

RECORD_COLS = [
    "site_id", "strategy", "title", "link", "canon_url", "url_sha1", "host",
    "host_hash", "description", "location", "depth", "seq", "gseq", "wave",
]
IMAGE_COLS = [
    "image_id", "img_bytes", "w", "h", "fmt", "phash", "description",
    "site_id", "strategy", "host", "host_hash", "url_sha1", "seq", "wave",
]


def _defaults_for(fields) -> dict:
    out = {}
    for name, typ in fields:
        if typ == pa.string():
            out[name] = ""
        elif typ == pa.binary():
            out[name] = b""
        elif typ == pa.bool_():
            out[name] = False
        elif typ == pa.float64():
            out[name] = 0.0
        else:
            out[name] = 0
    return out


_PARSED_DEFAULTS = _defaults_for(PARSED_FIELDS)


def _arrow_out(df: pd.DataFrame) -> pa.Table:
    """pandas → metadata-free Arrow. Pandas-converted blocks embed a
    ``pandas`` schema-metadata dict that makes ``pa.Schema`` unhashable,
    defeating Ray's schema dedup ('Failed to hash the schemas' spam)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


class _Emitter:
    """Column-dict accumulator for parse outputs (the reference's
    column-dict of parallel lists, ``src/crawler.py:335-345``, kept
    rectangular by construction)."""

    def __init__(self, fields):
        self.fields = fields
        self.cols = {n: [] for n, _ in fields}
        self.defaults = _defaults_for(fields)

    def emit(self, **kw):
        for name, _ in self.fields:
            self.cols[name].append(kw.get(name, self.defaults[name]))

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(self.cols, schema=pa.schema(self.fields))


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------


@dataclass
class CrawlConfig:
    num_seen_shards: int = 8
    num_pol_shards: int = 4
    seen_capacity_per_shard: int = 1 << 16
    exact_sidecar: bool = True
    fetch_batch_size: int = 512
    max_waves: int = 64
    out_buckets: int = 16  # output partition count (resumable layout)
    crawl_ts: str = "2026-01-01T00:00:00"  # per-run stamp (M18 determinism)
    assemble: bool = True  # False: wave loop only (scaling bench measures
    #                        fetch+dedup throughput, the north_rule metric)
    wave_blocks: int = 64  # uniform block count for the fetch stage
    #   (breaks straggler skew from uneven upstream partition files)


# --------------------------------------------------------------------------
# Deterministic world cache (per worker process)
# --------------------------------------------------------------------------

_WORLD_CACHE: dict[tuple, World] = {}


def get_world(params: WorldParams) -> World:
    key = astuple(params)
    w = _WORLD_CACHE.get(key)
    if w is None:
        w = World(params)
        _WORLD_CACHE[key] = w
    return w


# --------------------------------------------------------------------------
# Seeding
# --------------------------------------------------------------------------


def seed_frontier_table(world: World, cfg: CrawlConfig) -> pa.Table:
    """Wave-0 frontier: every site's listing-page URLs (S3 pagination,
    ``async_bs4.py:349-350``) with order-conformant seq keys."""
    em = _Emitter(FRONTIER_FIELDS)
    span = world.site_span()
    for rank, site in enumerate(world.sites):
        stride = 2 * site.jobs_per_page + 2
        for idx, page in enumerate(
            range(site.start_point, site.start_point + site.pages_to_crawl)
        ):
            url = site.url if site.strategy == "rss" else f"{site.url}{page}"
            canon = canonicalize(url)
            host = host_of(canon)
            seq = idx * stride
            em.emit(
                url=url,
                canon_url=canon,
                url_sha1=sha1_hex(canon),
                host=host,
                host_hash=hash64(host),
                shard=hash64(host) % cfg.num_seen_shards,
                pol_shard=hash64(host) % cfg.num_pol_shards,
                depth=0,
                seq=seq,
                gseq=rank * span + seq,
                priority=int(pack_priority(0, 0, 0, seq)),
                site_id=site.site_id,
                strategy=site.strategy,
                kind="listing",
                follow_link=site.follow_link,
                two_hop=site.two_hop,
                inner_link_tag=site.inner_link_tag,
                politeness_rps=float(site.politeness_rps),
                elements_path=json.dumps(site.elements_path),
                wave=0,
            )
    return em.table()


# --------------------------------------------------------------------------
# Stages
# --------------------------------------------------------------------------


def _offer_id(wave: int, shard: int, hosts, prios) -> int:
    """Stable identity for one task's politeness offer: a content hash of
    the offered (host, priority) multiset. A retried/reconstructed Ray
    task re-offers exactly the same rows, so its id repeats and the shard
    ignores it — offers stay idempotent under task retries (offers are
    side effects inside map tasks, which Ray may re-execute)."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    h.update(f"{wave}|{shard}".encode())
    for host, p in sorted(zip(hosts, prios)):
        h.update(f"{host}:{p}|".encode())
    return int.from_bytes(h.digest(), "big")


def _offer_pol_demand(pol_handles: list, wave: int, hosts, pol_shards, prios, rates):
    """Piggybacked politeness demand: offer (count, top-k priorities,
    rate) per host for a FUTURE wave, grouped by politeness shard."""
    df = pd.DataFrame({"host": hosts, "pol_shard": pol_shards,
                       "priority": prios, "politeness_rps": rates})
    if df.empty:
        return
    for shard, g in df.groupby("pol_shard", sort=False):
        d = {}
        for host, hg in g.groupby("host", sort=False):
            rate = float(hg["politeness_rps"].iloc[0])
            cap = int(2 * rate) + 1
            p = np.sort(hg["priority"].to_numpy())[: cap + 1]
            d[host] = (int(len(hg)), p.tolist(), rate)
        oid = _offer_id(wave, int(shard), g["host"].tolist(), g["priority"].tolist())
        ray.get(pol_handles[int(shard)].offer.remote(wave, d, offer_id=oid))


def _offer_seen_candidates(seen_handles: list, wave: int, cols: dict, idxs: list[int]):
    """Piggybacked seen-set offers for the candidate rows just parsed.
    Rows carry (host, priority, rate, seq) so finalize can also compute
    the admitted rows' politeness demand for wave+1."""
    if not idxs:
        return
    by_shard: dict[int, list[tuple]] = {}
    for i in idxs:
        kind = cols["kind"][i]
        by_shard.setdefault(int(cols["shard"][i]), []).append(
            (cols["url_sha1"][i], int(cols["gseq"][i]), kind,
             bool(cols["follow_link"][i]), cols["canon_url"][i],
             cols["host"][i], int(cols["priority"][i]),
             float(cols["politeness_rps"][i]), int(cols["seq"][i]))
        )
    ray.get([
        seen_handles[s].offer_candidates.remote(wave, rows)
        for s, rows in by_shard.items()
    ])


def make_fetch_parse_fn(world_params: WorldParams, wave: int, cfg: CrawlConfig,
                        pol_handles: list | None = None,
                        seen_handles: list | None = None):
    """Fused fetch+parse batch stage. Stateless tasks + per-process world
    cache (see module docstring); the parse dispatch is the M3 registry.
    When handles are given, the stage also piggybacks the wave protocol's
    offers — seen-set candidates for THIS wave, politeness demand for the
    deferred rows' NEXT wave — so no separate scan executions are needed."""

    def _derived_url_fields(link: str):
        canon = canonicalize(link)
        host = host_of(canon)
        return {
            "url": link,
            "canon_url": canon,
            "url_sha1": sha1_hex(canon),
            "host": host,
            "host_hash": hash64(host),
            "shard": hash64(host) % cfg.num_seen_shards,
            "pol_shard": hash64(host) % cfg.num_pol_shards,
        }

    def fetch_parse(batch: pa.Table) -> pa.Table:
        world = get_world(world_params)
        em = _Emitter(PARSED_FIELDS)
        for r in batch.to_pylist():
            base = {k: v for k, v in r.items() if k in _PARSED_DEFAULTS}
            base["wave"] = wave
            gate = r.get("gate", "allow")
            if gate == "defer":
                em.emit(**{**base, "out_kind": "deferred"})
                continue
            if gate == "block":
                em.emit(**{**base, "out_kind": "blocked"})
                continue
            if r["kind"] == "record_passthrough":
                # admitted non-follow candidate: record completes with
                # its listing description — no fetch, no fetchlog
                em.emit(**{**base, "out_kind": "record"})
                continue
            status, payload = world.fetch(r["canon_url"])
            # compact fetch-log row: the conformance ordering projection
            em.emit(**{**base, "out_kind": "fetchlog", "status": status,
                       "title": "", "link": "", "location": "", "description": "",
                       "elements_path": ""})
            kind = r["kind"]
            if kind == "listing":
                if status != 200:
                    em.emit(**{**base, "out_kind": "error", "status": status,
                               "error": f"listing fetch status {status}"})
                    continue
                try:
                    cands = parse_listing(
                        payload.decode("utf-8", "replace"),
                        r["strategy"],
                        json.loads(r["elements_path"]),
                        "https://" + r["host"],  # absolutization prefix (cfg.name)
                    )
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    em.emit(**{**base, "out_kind": "error", "status": status,
                               "error": f"{type(e).__name__}: {e}"})
                    continue
                for slot, c in enumerate(cands):
                    em.emit(**{
                        **base,
                        **_derived_url_fields(c["link"]),
                        "out_kind": "candidate",
                        "kind": "candidate",
                        "status": status,
                        "depth": 1,
                        "seq": r["seq"] + 1 + 2 * slot,
                        "gseq": r["gseq"] + 1 + 2 * slot,
                        "priority": int(pack_priority(0, 1, 0, r["seq"] + 1 + 2 * slot)),
                        "fairness_round": 0,
                        "title": c["title"],
                        "link": c["link"],
                        "location": c["location"],
                        "description": c["description"],
                        "elements_path": "",
                    })
            elif kind == "detail":
                text = payload.decode("utf-8", "replace")
                if r["two_hop"]:
                    # M10: detail page → apply link → strip /apply; the
                    # stripped URL's whole-page text is the description
                    apply = parse_apply_link(text, status)
                    if apply is not None:
                        hop = _derived_url_fields("https://" + r["host"] + apply)
                        em.emit(**{
                            **base, **hop,
                            "out_kind": "frontier_detail2",
                            "kind": "detail2",
                            "status": status,
                            "depth": 2,
                            "priority": int(pack_priority(0, 2, 0, r["seq"])),
                            "image_id": r["url_sha1"],  # parent record identity
                        })
                        continue
                    desc = r["description"]  # no apply link → default
                else:
                    desc = parse_detail(
                        text, status, r["inner_link_tag"], default=r["description"],
                    )
                em.emit(**{**base, "out_kind": "record", "status": status,
                           "description": desc})
                img = _derived_url_fields(r["canon_url"] + "/image")
                em.emit(**{
                    **base, **img,
                    "out_kind": "frontier_image",
                    "kind": "image",
                    "status": status,
                    "depth": 2,
                    "seq": r["seq"] + 1,
                    "gseq": r["gseq"] + 1,
                    "priority": int(pack_priority(0, 2, 0, r["seq"] + 1)),
                    "description": desc,
                    "image_id": r["url_sha1"],
                })
            elif kind == "detail2":
                # M10 second hop: whole-page text; the record keeps the
                # JOB link identity (carried in link/image_id)
                desc = whole_page_text(
                    payload.decode("utf-8", "replace"), status, r["description"],
                )
                job = _derived_url_fields(r["link"])
                em.emit(**{**base, **job, "out_kind": "record", "status": status,
                           "depth": 2, "description": desc})
                img = _derived_url_fields(job["canon_url"] + "/image")
                em.emit(**{
                    **base, **img,
                    "out_kind": "frontier_image",
                    "kind": "image",
                    "status": status,
                    "depth": 3,
                    "seq": r["seq"] + 1,
                    "gseq": r["gseq"] + 1,
                    "priority": int(pack_priority(0, 3, 0, r["seq"] + 1)),
                    "description": desc,
                    "image_id": job["url_sha1"],
                })
            elif kind == "image":
                if status != 200 or not payload:
                    em.emit(**{**base, "out_kind": "error", "status": status,
                               "error": f"image fetch status {status}"})
                    continue
                pixels, fmt = codecs.decode(payload)
                em.emit(**{
                    **base,
                    "out_kind": "image",
                    "status": status,
                    "img_bytes": payload,
                    "w": pixels.shape[1],
                    "h": pixels.shape[0],
                    "fmt": fmt,
                    "phash": codecs.phash64(pixels),
                })
            else:
                em.emit(**{**base, "out_kind": "error", "status": status,
                           "error": f"unknown kind {kind}"})
        cols = em.cols
        if seen_handles is not None:
            cand_idx = [
                i for i, ok in enumerate(cols["out_kind"])
                if ok in ("candidate", "frontier_image", "frontier_detail2")
            ]
            _offer_seen_candidates(seen_handles, wave, cols, cand_idx)
        if pol_handles is not None:
            # deferred rows re-enter wave+1 with a fairness bump; offer
            # their bumped priority so the next finalize sees what the
            # next gate will compare
            didx = [i for i, ok in enumerate(cols["out_kind"]) if ok == "deferred"]
            if didx:
                bumped = [
                    int(pack_priority(cols["fairness_round"][i] + 1,
                                      cols["depth"][i], 0, cols["seq"][i]))
                    for i in didx
                ]
                _offer_pol_demand(
                    pol_handles, wave + 1,
                    [cols["host"][i] for i in didx],
                    [cols["pol_shard"][i] for i in didx],
                    bumped,
                    [cols["politeness_rps"][i] for i in didx],
                )
        return em.table()

    return fetch_parse


# --------------------------------------------------------------------------
# Shuffle-free gate protocol (offer → finalize → cached lookup)
#
# A sort-based groupby gate worked but its all-to-all barrier dominated
# wave wall-time (5-10s per shuffle at sandbox scale, regardless of
# CPUs) and capped wave parallelism at the shard count. The protocol
# replaces each shuffle with two cheap map passes around a driver-side
# finalize RPC: map tasks push per-host top-k summaries / candidate keys
# to the shard actors, the actors resolve deterministically, and a
# second map pass reads the cached verdicts. Actors see O(hosts·cap)
# integers (politeness) / one politeness-bounded wave of keys (seen),
# never the frontier rows.
# --------------------------------------------------------------------------

_ACTOR_CACHE: dict[tuple, Any] = {}


def _cached_rpc(handle, method: str, wave: int):
    """One read-only RPC per (actor, wave) per worker process. Entries
    for older waves of the same (actor, method) are evicted on insert —
    worker processes outlive waves, and the cached verdict tables are
    full per-wave sha1 maps that would otherwise accumulate unboundedly
    over a long crawl."""
    key = (handle._actor_id.hex(), method, wave)
    if key not in _ACTOR_CACHE:
        stale = [k for k in _ACTOR_CACHE if k[:2] == key[:2] and k[2] < wave]
        for k in stale:
            del _ACTOR_CACHE[k]
        _ACTOR_CACHE[key] = ray.get(getattr(handle, method).remote(wave))
    return _ACTOR_CACHE[key]


def make_demand_fn(pol_handles: list, wave: int):
    """Exec A: per batch, per politeness shard, offer each host's row
    count + smallest cap+1 priorities (distributed top-k merge)."""

    def demand(df: pd.DataFrame) -> pd.DataFrame:
        # pass-through records never fetch: offering their demand would
        # debit tokens for rows that bypass the gate, making a resumed
        # run's wave accounting diverge from the warm path (which
        # excludes them in SeenShard.finalize's admitted_demand)
        df = df[df["kind"] != "record_passthrough"]
        if not df.empty:
            for shard, g in df.groupby("pol_shard", sort=False):
                d = {}
                for host, hg in g.groupby("host", sort=False):
                    rate = float(hg["politeness_rps"].iloc[0])
                    cap = int(2 * rate) + 1
                    prios = np.sort(hg["priority"].to_numpy())[: cap + 1]
                    d[host] = (int(len(hg)), prios.tolist(), rate)
                oid = _offer_id(wave, int(shard), g["host"].tolist(),
                                g["priority"].tolist())
                ray.get(pol_handles[int(shard)].offer.remote(wave, d, offer_id=oid))
        return pd.DataFrame({"n": [len(df)]})

    return demand


def _gate_labels(df: pd.DataFrame, pol_handles: list, wave: int) -> np.ndarray:
    """Vectorized allow/defer/block labels from the finalized per-host
    thresholds (priority ≤ threshold ⇒ allowed; priorities are unique
    per host so exactly k rows pass)."""
    from ..state.politeness import _PolitenessShard

    thr: dict[str, int] = {}
    for shard in df["pol_shard"].unique():
        thr.update(_cached_rpc(pol_handles[int(shard)], "thresholds", wave))
    t = df["host"].map(thr).fillna(-1).to_numpy(dtype=np.int64)
    pr = df["priority"].to_numpy()
    return np.where(
        t == _PolitenessShard.BLOCK, "block", np.where(pr <= t, "allow", "defer")
    )


def make_cands_to_frontier_fn(seen_handles: list, prev_wave: int, cfg: CrawlConfig):
    """Frontier source: label the previous wave's candidate rows from
    the finalized verdicts (cached read-only RPC) and convert the
    admitted ones into this wave's frontier rows — detail/detail2/image
    fetches, pass-through records (completed without a fetch), and the
    pre-authorized derived image rows. Dups drop here. This replaces a
    whole labeling execution: the conversion fuses into the wave's
    single gate→fetch→parse chain."""

    _KIND = {"detail": "detail", "detail2_frontier": "detail2",
             "image_frontier": "image", "record": "record_passthrough"}

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        verd: dict[str, tuple[str, int]] = {}
        emit_img: dict[str, bool] = {}
        for shard in df["shard"].unique():
            v, e = _cached_rpc(seen_handles[int(shard)], "verdicts", prev_wave)
            verd.update(v)
            emit_img.update(e)
        lab = df["url_sha1"].map(lambda s: verd.get(s, ("dup", -1)))
        # only the winning gseq carries the verdict; later intra-wave
        # duplicates of the same key are "dup" (first-wins)
        df = df.assign(label=[
            l if g == win_g else "dup"
            for (l, win_g), g in zip(lab, df["gseq"].astype(int))
        ])
        keep = df[df["label"].isin(list(_KIND))].copy()
        keep["kind"] = keep["label"].map(_KIND)
        rec = keep[keep["label"] == "record"]
        rec = rec[rec["url_sha1"].map(emit_img).fillna(False)]
        out = [keep.drop(columns=["label"])]
        # A "dup" verdict on a detail2 (stripped-apply) URL means the
        # intermediate fetch is redundant — NOT that the job is a dup
        # (reachable via cuckoo false positives, or two jobs sharing an
        # apply target). The reference would still emit the record with
        # the default (listing) description; convert to a pass-through
        # record keyed by the JOB link instead of silently dropping it.
        dup2 = df[(df["label"] == "dup") & (df["kind"] == "detail2")]
        if len(dup2):
            rec2 = dup2.drop(columns=["label"]).copy()
            canon = rec2["link"].map(canonicalize)
            host = canon.map(host_of)
            hh = host.map(hash64)
            rec2["url"] = rec2["link"]
            rec2["canon_url"] = canon
            rec2["url_sha1"] = canon.map(sha1_hex)
            rec2["host"] = host
            rec2["host_hash"] = hh
            rec2["shard"] = hh % cfg.num_seen_shards
            rec2["pol_shard"] = hh % cfg.num_pol_shards
            rec2["kind"] = "record_passthrough"
            out.append(rec2)
        if len(rec):
            img = rec.drop(columns=["label"]).copy()
            img["image_id"] = rec["url_sha1"]
            img["canon_url"] = rec["canon_url"] + "/image"
            img["url"] = img["canon_url"]
            img["url_sha1"] = img["canon_url"].map(sha1_hex)
            img["depth"] = 2
            img["seq"] = rec["seq"] + 1
            img["gseq"] = rec["gseq"] + 1
            img["priority"] = [int(pack_priority(0, 2, 0, s)) for s in img["seq"]]
            img["kind"] = "image"
            out.append(img)
        return pd.concat(out, ignore_index=True)

    return convert


# --------------------------------------------------------------------------
# IO helpers
# --------------------------------------------------------------------------


def dir_num_rows(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    if not glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        return 0
    return pads.dataset(path, format="parquet", partitioning="hive").count_rows()


def _subdir(base: str, col: str, value: str) -> str:
    return os.path.join(base, f"{col}={value}")


def _existing(paths: list[str]) -> list[str]:
    return [p for p in paths if dir_num_rows(p) > 0]


def _parquet_files(dirs: list[str]) -> list[str]:
    """Expand directories to their parquet files (ray.data's path lists
    want files, not directories)."""
    out: list[str] = []
    for d in dirs:
        out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return out


def _site_counts(paths: list[str], extra_col: str | None = None) -> dict:
    """Per-site metric rollup from small columns of hive subdirs (the
    subdir name is the label). At cluster scale this becomes a groupby
    aggregate over the label column."""
    out: dict = {}
    for p in paths:
        if dir_num_rows(p) == 0:
            continue
        label = os.path.basename(p).split("=", 1)[-1]
        t = pads.dataset(p, format="parquet").to_table(columns=["site_id"])
        for s in t["site_id"].to_pylist():
            out.setdefault(s, {}).setdefault(label, 0)
            out[s][label] += 1
    return out


def _normalize(schema_fields):
    """map_batches fn casting a batch to the canonical frontier schema
    (pandas round trips widen/narrow ints; parquet subdirs drop hive cols)."""
    schema = pa.schema(schema_fields)

    def fn(batch: pa.Table) -> pa.Table:
        cols = []
        for f in schema:
            if f.name in batch.column_names:
                cols.append(batch[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(len(batch), f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    return fn


# --------------------------------------------------------------------------
# The wave loop
# --------------------------------------------------------------------------


def run_crawl(
    world_params: WorldParams,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
) -> dict:
    """Run (or resume) a full crawl; returns a summary with paths +
    metrics. Ray must already be initialised by the caller (driver
    contract)."""
    cfg = cfg or CrawlConfig()
    world = World(world_params)
    os.makedirs(out_dir, exist_ok=True)

    seen = SeenSet(cfg.num_seen_shards, cfg.seen_capacity_per_shard,
                   seed=world_params.seed, exact_sidecar=cfg.exact_sidecar)
    pol = PolitenessPool(cfg.num_pol_shards, world_params)

    start_wave = 0
    seed_dir = os.path.join(out_dir, "waves", "w0000", "frontier")
    frontier_spec: dict | None = {"seed": [seed_dir], "defer": [], "detail": [], "image": []}

    prior = latest_manifest(out_dir) if resume else None
    if prior is not None:
        seen.restore(prior.seen_paths)
        if prior.frontier_path is None:
            summary = _assemble(out_dir, cfg)  # crawl already complete
            summary["resumed_complete"] = True
            if cfg.exact_sidecar:
                summary["seen_membership"] = seen.membership()
            seen.shutdown()
            pol.shutdown()
            return summary
        pol.load_states(prior.politeness_states)
        start_wave = prior.wave + 1
        frontier_spec = prior.frontier_path
    else:
        os.makedirs(seed_dir, exist_ok=True)
        pq.write_table(seed_frontier_table(world, cfg),
                       os.path.join(seed_dir, "seed.parquet"))

    wave = start_wave
    while wave < cfg.max_waves and frontier_spec is not None:
        m = _run_wave(out_dir, wave, frontier_spec, seen, pol, world_params, cfg,
                      cold_start=(wave == start_wave))
        write_manifest(out_dir, m)
        frontier_spec = m.frontier_path
        wave += 1

    if cfg.assemble:
        summary = _assemble(out_dir, cfg)
    else:
        summary = {
            "job_records": sum(
                dir_num_rows(p)
                for p in glob.glob(os.path.join(out_dir, "waves", "w*", "parsed", "out_kind=record"))
            ),
            "image_caption": sum(
                dir_num_rows(p)
                for p in glob.glob(os.path.join(out_dir, "waves", "w*", "parsed", "out_kind=image"))
            ),
        }
    summary["waves"] = wave
    summary["seen_total"] = seen.total_count()
    if cfg.exact_sidecar:
        summary["seen_membership"] = seen.membership()
    seen.shutdown()
    pol.shutdown()
    return summary


def _load_frontier(spec: dict, num_blocks: int | None = None,
                   seen_handles: list | None = None,
                   prev_wave: int | None = None,
                   cfg: CrawlConfig | None = None):
    """Build the wave's input Dataset from the previous wave's hive
    partitions: seed dirs + deferred rows (fairness bump) + the previous
    wave's candidate rows labeled lazily against the finalized seen-set
    verdicts ("cands" source — fuses what used to be a whole labeling
    execution into this wave's chain). All lazy — one execution consumes
    them. ``num_blocks`` splits the read into balanced tasks up front
    (override_num_blocks) — an explicit repartition would be an AllToAll
    barrier costing ~10s wall regardless of data size."""
    parts = []
    norm = _normalize(FRONTIER_FIELDS)

    def _requeue(batch: pa.Table) -> pa.Table:
        t = norm(batch)
        fr = pc.add(t["fairness_round"], 1)
        pr = pa.array(
            pack_priority(
                fr.to_numpy(zero_copy_only=False),
                t["depth"].to_numpy(zero_copy_only=False),
                0,
                t["seq"].to_numpy(zero_copy_only=False),
            )
        )
        t = t.set_column(t.column_names.index("fairness_round"), "fairness_round", fr.cast(pa.int64()))
        return t.set_column(t.column_names.index("priority"), "priority", pr)

    def _as_kind(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            t = norm(batch)
            k = pa.array([kind] * len(t), type=pa.string())
            return t.set_column(t.column_names.index("kind"), "kind", k)
        return fn

    if spec.get("seed"):
        paths = _existing(spec["seed"])
        if paths:
            parts.append(
                rd.read_parquet(_parquet_files(paths), override_num_blocks=num_blocks)
                .map_batches(norm, batch_format="pyarrow")
            )
    for key, fn in (("defer", _requeue), ("detail", _as_kind("detail")),
                    ("detail2", _as_kind("detail2")), ("image", _as_kind("image"))):
        paths = _existing(spec.get(key, []))
        if paths:
            parts.append(
                rd.read_parquet(_parquet_files(paths), columns=FRONTIER_COLS,
                                override_num_blocks=num_blocks)
                .map_batches(fn, batch_format="pyarrow")
            )
    cand_paths = _existing(spec.get("cands", []))
    if cand_paths:
        assert seen_handles is not None and prev_wave is not None
        parts.append(
            rd.read_parquet(_parquet_files(cand_paths), columns=FRONTIER_COLS,
                            override_num_blocks=num_blocks)
            .map_batches(norm, batch_format="pyarrow")
            .map_batches(
                make_cands_to_frontier_fn(seen_handles, prev_wave, cfg),
                batch_format="pandas",
            )
            .map_batches(norm, batch_format="pyarrow")
        )
    if not parts:
        return None
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _run_wave(
    out_dir: str,
    wave: int,
    frontier_spec: dict,
    seen: SeenSet,
    pol: PolitenessPool,
    world_params: WorldParams,
    cfg: CrawlConfig,
    cold_start: bool = True,
) -> WaveManifest:
    wdir = os.path.join(out_dir, "waves", f"w{wave:04d}")
    parsed_dir = os.path.join(wdir, "parsed")
    os.makedirs(parsed_dir, exist_ok=True)
    seen_handles = seen.handles()
    pol_handles = pol.handles()

    def _load(num_blocks=None):
        return _load_frontier(frontier_spec, num_blocks=num_blocks,
                              seen_handles=seen_handles, prev_wave=wave - 1,
                              cfg=cfg)

    frontier = _load()
    if frontier is None:
        return WaveManifest(wave=wave, frontier_path=None,
                            seen_paths=seen.snapshot(ckpt_dir(out_dir), wave),
                            politeness_states=pol.states())

    # Cold start (seed wave / resume): the politeness demand for this
    # wave wasn't piggybacked by a previous wave — scan the frontier
    # once. Warm waves skip this: wave k-1's exec + finalize offered it.
    if cold_start:
        (
            _load()
            .map_batches(make_demand_fn(pol_handles, wave), batch_format="pandas")
            .count()
        )
    pol.finalize(wave)

    # THE wave execution (map-only, fused): previous wave's candidates
    # labeled against the finalized verdicts → threshold gate →
    # fetch+parse → hive write. Piggybacks the seen-set offers for this
    # wave's candidates and the deferred rows' politeness demand (wave+1).
    def gate_label(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        if len(df):
            g = _gate_labels(df, pol_handles, wave)
            # pass-through records were already admitted and need no
            # fetch — politeness does not apply
            df["gate"] = np.where(df["kind"] == "record_passthrough", "allow", g)
        else:
            df["gate"] = []
        return _arrow_out(df)

    (
        _load(num_blocks=cfg.wave_blocks)
        .map_batches(gate_label, batch_format="pandas")
        .map_batches(
            make_fetch_parse_fn(world_params, wave, cfg,
                                pol_handles=pol_handles,
                                seen_handles=seen_handles),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
        )
        .write_parquet(parsed_dir, partition_cols=["out_kind"])
    )

    # seen finalize (anti-join, first-wins in global gseq order) + the
    # admitted rows' politeness demand for wave+1, forwarded driver-side
    cand_dirs = _existing([
        _subdir(parsed_dir, "out_kind", "candidate"),
        _subdir(parsed_dir, "out_kind", "frontier_image"),
        _subdir(parsed_dir, "out_kind", "frontier_detail2"),
    ])
    seen_counts: dict = {}
    if cand_dirs:
        seen_counts = seen.finalize(wave)
        # one batched round-trip for all shards' demands, one batched
        # offer round per politeness shard (a sequential per-shard loop
        # here serialized ~64 RPCs per wave and flattened scaling)
        demands = ray.get([s.admitted_demand.remote(wave) for s in seen_handles])
        by_pol: dict[int, dict] = {}
        for demand in demands:
            for host, d in demand.items():
                by_pol.setdefault(hash64(host) % pol.num_shards, {})[host] = d
        ray.get([
            pol_handles[s].offer.remote(wave + 1, dd)
            for s, dd in by_pol.items()
        ])

    # next frontier = deferred rows ∪ this wave's candidate dirs (labeled
    # lazily next wave against the verdicts snapshotted below)
    defer_dirs = _existing([_subdir(parsed_dir, "out_kind", "deferred")])
    next_spec = None
    if defer_dirs or cand_dirs:
        next_spec = {"seed": [], "defer": defer_dirs, "cands": cand_dirs}

    # metrics + manifest (records/images/errors are hive subdirs)
    records_paths = _existing([_subdir(parsed_dir, "out_kind", "record")])
    images_paths = _existing([_subdir(parsed_dir, "out_kind", "image")])
    errors_paths = _existing([_subdir(parsed_dir, "out_kind", "error")])
    metrics = {
        "gate": {
            "allow": dir_num_rows(_subdir(parsed_dir, "out_kind", "fetchlog")),
            "defer": dir_num_rows(_subdir(parsed_dir, "out_kind", "deferred")),
            "block": dir_num_rows(_subdir(parsed_dir, "out_kind", "blocked")),
        },
        "parse": _site_counts([
            _subdir(parsed_dir, "out_kind", v)
            for v in ("candidate", "frontier_image", "record", "image", "error")
        ]),
        "seen": seen_counts,
        "fetched": dir_num_rows(_subdir(parsed_dir, "out_kind", "fetchlog")),
        "deferred": dir_num_rows(_subdir(parsed_dir, "out_kind", "deferred")),
        "records": sum(dir_num_rows(p) for p in records_paths),
        "images": sum(dir_num_rows(p) for p in images_paths),
        "errors": sum(dir_num_rows(p) for p in errors_paths),
    }
    return WaveManifest(
        wave=wave,
        frontier_path=next_spec,
        records_paths=records_paths,
        images_paths=images_paths,
        errors_paths=errors_paths,
        seen_paths=seen.snapshot(ckpt_dir(out_dir), wave),
        politeness_states=pol.states(),
        metrics=metrics,
        lineage={
            "parent_wave": wave - 1,
            "frontier_spec": frontier_spec,
            "world_seed": world_params.seed,
            "n_sites": world_params.n_sites,
        },
    )


def fetch_log(out_dir: str) -> pd.DataFrame:
    """Every URL the engine actually fetched (gate == allow), with its
    ordering keys — the conformance projection: sorted by
    (host, gseq, depth) this equals the sequential oracle's per-host
    fetch sequence (see module docstring)."""
    frames = []
    for allow in sorted(glob.glob(os.path.join(out_dir, "waves", "w*", "parsed", "out_kind=fetchlog"))):
        if dir_num_rows(allow) == 0:
            continue
        t = pads.dataset(allow, format="parquet").to_table(
            columns=["host", "seq", "gseq", "depth", "canon_url", "kind", "wave"]
        )
        frames.append(t.to_pandas())
    if not frames:
        return pd.DataFrame(
            columns=["host", "seq", "gseq", "depth", "canon_url", "kind", "wave"]
        )
    return pd.concat(frames, ignore_index=True)


# --------------------------------------------------------------------------
# Final assembly: records → clean → location tags; images → captions
# --------------------------------------------------------------------------


def _assemble(out_dir: str, cfg: CrawlConfig) -> dict:
    from ..stages.clean import CleanRecords

    import shutil

    job_dir = os.path.join(out_dir, "job_records")
    cap_dir = os.path.join(out_dir, "image_caption")
    # derived artifacts: rebuilt in full from the wave partitions, so a
    # resumed run replaces any partial assembly from the interrupted one
    for d in (job_dir, cap_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    summary: dict = {"job_records_path": job_dir, "image_caption_path": cap_dir}

    rec_dirs = _existing(
        sorted(glob.glob(os.path.join(out_dir, "waves", "w*", "parsed", "out_kind=record")))
    )
    img_dirs = _existing(
        sorted(glob.glob(os.path.join(out_dir, "waves", "w*", "parsed", "out_kind=image")))
    )

    if rec_dirs:
        recs = rd.read_parquet(_parquet_files(rec_dirs), columns=RECORD_COLS)
        # resume idempotency (D4): a replayed wave may duplicate records.
        # Dedup on a coarse hash bucket (256 groups), vectorized within
        # each group — a per-key groupby would spawn one tiny task per
        # distinct URL.
        recs = _dedup_by_sha(recs, ["wave", "gseq"])

        clean = CleanRecords()

        def _clean_tag_stamp(df: pd.DataFrame) -> pd.DataFrame:
            # fused clean (M11) + location tags (M12-M14) + stamps (M18);
            # one stage so the pool doesn't starve the shuffle at small
            # CPU counts — tagger state is process-cached
            df = clean(df)
            df = _get_tagger()(df)
            ts = pd.Timestamp(cfg.crawl_ts)
            df["pubdate"] = ts.date()
            df["timestamp"] = ts
            df["bucket"] = (df["host_hash"] % cfg.out_buckets).astype(np.int64)
            return df

        recs.map_batches(_clean_tag_stamp, batch_format="pandas").write_parquet(
            job_dir, partition_cols=["bucket"]
        )
    summary["job_records"] = dir_num_rows(job_dir) if rec_dirs else 0

    if img_dirs:
        imgs = rd.read_parquet(_parquet_files(img_dirs), columns=IMAGE_COLS)
        imgs = _dedup_by_sha(imgs, ["wave", "seq"])

        def _to_caption(batch: pa.Table) -> pa.Table:
            from ..functions.textclean import clean_caption

            caption = clean_caption(batch["description"].to_pylist())
            bucket = pa.array(
                np.asarray(batch["host_hash"].to_numpy(zero_copy_only=False))
                % cfg.out_buckets
            )
            return pa.table(
                {
                    "image_id": batch["image_id"].cast(pa.string()),
                    "bytes": batch["img_bytes"].cast(pa.binary()),
                    "w": batch["w"].cast(pa.int32()),
                    "h": batch["h"].cast(pa.int32()),
                    "fmt": batch["fmt"].cast(pa.string()),
                    "caption": pa.array(caption, type=pa.string()),
                    "phash": batch["phash"].cast(pa.int64()),
                    "bucket": bucket,
                }
            )

        imgs.map_batches(_to_caption, batch_format="pyarrow").write_parquet(
            cap_dir, partition_cols=["bucket"]
        )
    summary["image_caption"] = dir_num_rows(cap_dir) if img_dirs else 0
    return summary


def _dedup_by_sha(ds, order_cols: list[str]):
    """First-wins dedup on url_sha1: hash-bucket the keys (256 coarse
    groups → a real shuffle but no per-key task explosion), then a
    vectorized sort + drop_duplicates inside each bucket."""

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df["dedup_bucket"] = [int(s[:2], 16) for s in df["url_sha1"]]
        return _arrow_out(df)

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url_sha1", *order_cols], kind="stable")
        return g.drop_duplicates(subset="url_sha1", keep="first").drop(
            columns=["dedup_bucket"]
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("dedup_bucket", num_partitions=32)
        .map_groups(first_per_key, batch_format="pandas")
    )


_TAGGER = None


def _get_tagger():
    """Per-process LocationTagger (alias map built once — J2 broadcast)."""
    global _TAGGER
    if _TAGGER is None:
        from ..stages.location import LocationTagger

        _TAGGER = LocationTagger()
    return _TAGGER
