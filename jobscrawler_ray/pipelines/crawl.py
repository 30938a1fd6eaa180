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

    (Cold start: wave 0 offers its politeness demand driver-side from
    the in-memory seed table; a RESUME runs one extra frontier scan to
    rebuild the demand the previous wave would have piggybacked.)

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
import shutil
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
from ..functions.arrowio import arrow_out as _arrow_out
from ..functions.priority import AGE_MASK, pack_priority
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
_PARSED_SCHEMA = pa.schema(PARSED_FIELDS)

_HASH64_CACHE: dict[str, int] = {}


def _h64(host: str) -> int:
    """hash64 with a per-process host cache — host cardinality is tiny
    next to row count, and profiling showed repeated hash64(host) calls
    dominating candidate emission."""
    v = _HASH64_CACHE.get(host)
    if v is None:
        v = hash64(host)
        _HASH64_CACHE[host] = v
    return v


def _parsed_table(out_kind: str, wave: int, n: int,
                  base: pa.Table | None = None,
                  overrides: dict | None = None) -> pa.Table:
    """Build a PARSED-schema table column-wise: ``overrides`` supplies
    per-row lists/arrays or scalar constants; remaining columns copy
    from ``base`` (same row order) or fill with defaults. All fills are
    Arrow kernels (pa.repeat / cast) — no per-row Python."""
    ov = overrides or {}
    cols = {}
    for name, typ in PARSED_FIELDS:
        if name == "out_kind":
            arr = pa.repeat(pa.scalar(out_kind, pa.string()), n)
        elif name == "wave":
            arr = pa.repeat(pa.scalar(wave, pa.int64()), n)
        elif name in ov:
            v = ov[name]
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                arr = v if v.type == typ else v.cast(typ)
            elif isinstance(v, (list, np.ndarray)):
                arr = pa.array(v, type=typ)
            else:
                arr = pa.repeat(pa.scalar(v, typ), n)
        elif base is not None and name in base.column_names:
            col = base[name]
            arr = col if col.type == typ else col.cast(typ)
        else:
            arr = pa.repeat(pa.scalar(_PARSED_DEFAULTS[name], typ), n)
        cols[name] = arr
    return pa.table(cols, schema=_PARSED_SCHEMA)





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
    fetch_batch_size: int | None = None  # None = one batch per block
    #   (task granularity = override_num_blocks). A fixed batch_size
    #   COALESCES small blocks: 1024-row bundling collapsed the 64-block
    #   seed wave into ~4 tasks, flattening 8→32-CPU scaling.
    max_waves: int = 64
    out_buckets: int = 16  # output partition count (resumable layout)
    crawl_ts: str = "2026-01-01T00:00:00"  # per-run stamp (M18 determinism)
    assemble: bool = True  # False: wave loop only (scaling bench measures
    #                        fetch+dedup throughput, the north_rule metric)
    wave_blocks: int = 64  # uniform block count for the fetch stage
    #   (breaks straggler skew from uneven upstream partition files)
    detailed_metrics: bool = True  # per-site parse rollups + per-kind row
    #   counts in the manifest; driver-side reads that don't scale with
    #   CPUs — benches turn them off (the counts aren't load-bearing)
    checkpoint_every: int = 1  # seen-shard snapshot cadence (waves).
    #   >1 trades resume granularity (re-run up to k-1 waves) for less
    #   checkpoint IO; the final wave always snapshots.
    fetch_backend: str = "synthetic"  # sources/fetch_backends.py registry
    #   key; "synthetic" = the deterministic world (tests/benches),
    #   "http" = the real-network client (UA rotation, non-200 body
    #   passthrough) — unusable in this no-network sandbox.
    notify_webhook: str | None = None  # S12 seam: POST the run summary
    #   to this webhook URL on completion (sources/notify.py;
    #   Discord-compatible payload, loopback-tested). Best-effort —
    #   failures warn, never abort the crawl.
    proxies: tuple[str, ...] | None = None  # S11 seam: rotating proxy
    #   pool for the "http" backend (sources/fetch_backends.ProxyPool).
    #   A tuple (not list) so the config stays hashable for the
    #   per-process backend cache key. Ignored by other backends.
    out_min_rows_per_file: int | None = None  # assembly-sink file-size
    out_max_rows_per_file: int | None = None
    #   targeting: forwarded to write_parquet(min/max_rows_per_file)
    #   on the image_caption + job_records sinks. At 100 TB an
    #   image-heavy bucket would otherwise emit one file per output
    #   block (thousand-file sprays) or, after coalescing, multi-GB
    #   blocks; bound both ends instead. None = Ray's block-per-file
    #   default (right for the small worlds tests/bench run).


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


_BACKEND_CACHE: dict[tuple, Any] = {}


def get_fetch_backend(name: str, world_params: WorldParams,
                      proxies: tuple[str, ...] | None = None):
    """Per-process fetch backend (sources/fetch_backends.py seam). The
    synthetic backend shares the process World cache; other backends
    are constructed once per process (session reuse). ``proxies``
    (CrawlConfig.proxies) reaches the "http" backend's rotating
    ProxyPool (S11); backends exposing ``close()`` (browser/session
    teardown) are released at process exit so a real Selenium driver
    never leaks one browser per actor."""
    if name == "synthetic":
        return get_world(world_params)
    # accept a list too — the cache key must stay hashable
    proxies = tuple(proxies) if proxies else None
    key = (name, astuple(world_params), proxies)
    b = _BACKEND_CACHE.get(key)
    if b is None:
        from ..sources.fetch_backends import FETCH_BACKENDS

        # each backend's opt-in flag differs: HTTP must be told the
        # network is allowed, the browser seam that a driver is wanted
        kwargs = {"http": {"allow_network": True,
                           "proxies": list(proxies) if proxies else None},
                  "browser": {"allow_browser": True}}.get(name, {})
        b = FETCH_BACKENDS[name](**kwargs)
        if hasattr(b, "close"):
            import atexit

            atexit.register(b.close)
        _BACKEND_CACHE[key] = b
    return b


# --------------------------------------------------------------------------
# Seeding
# --------------------------------------------------------------------------


def seed_frontier_table(world: World, cfg: CrawlConfig,
                        ages: dict[str, int] | None = None) -> pa.Table:
    """Wave-0 frontier: every site's listing-page URLs (S3 pagination,
    ``async_bs4.py:349-350``) with order-conformant seq keys.

    ``ages`` (recrawl mode): url_sha1 → generations since last fetch.
    The age field packs as ``AGE_MASK - age`` so STALER pages sort
    earlier (smaller key = higher priority) — the standard freshness
    ordering for recrawl scheduling. Listings absent from ``ages``
    (brand-new pages) default to maximum staleness, i.e. top priority.
    A fresh crawl (``ages=None``) packs a uniform 0, leaving the
    (depth, seq) order untouched."""
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
            sha = sha1_hex(canon)
            age_key = 0 if ages is None else (
                AGE_MASK - min(int(ages.get(sha, AGE_MASK)), AGE_MASK)
            )
            em.emit(
                url=url,
                canon_url=canon,
                url_sha1=sha,
                host=host,
                host_hash=hash64(host),
                shard=hash64(host) % cfg.num_seen_shards,
                pol_shard=hash64(host) % cfg.num_pol_shards,
                depth=0,
                seq=seq,
                gseq=rank * span + seq,
                priority=int(pack_priority(0, 0, age_key, seq)),
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


def _offer_id(wave: int, shard: int, sha1s) -> int:
    """Stable identity for one task's politeness offer: a content hash of
    the offered rows' url_sha1s. A retried/reconstructed Ray task
    re-offers exactly the same rows, so its id repeats and the shard
    ignores it — offers stay idempotent under task retries (offers are
    side effects inside map tasks, which Ray may re-execute). Hashing
    row IDENTITIES (not the derived host/priority summary) means two
    different tasks can never collide: each frontier row exists in
    exactly one task."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    h.update(f"{wave}|{shard}".encode())
    for s in sorted(sha1s):
        h.update(s.encode())
        h.update(b"|")
    return int.from_bytes(h.digest(), "big")


def _offer_pol_demand(pol_handles: list, wave: int, hosts, pol_shards, prios, rates,
                      sha1s, wait: bool = True):
    """Piggybacked politeness demand: offer (count, top-k priorities,
    rate) per host for a FUTURE wave, grouped by politeness shard. All
    shard RPCs are issued async and awaited once — a sequential
    per-shard ray.get serializes num_shards round-trips per task.

    ``wait=False`` is safe ONLY from the driver: Ray orders actor tasks
    per caller, so the driver's later ``finalize`` RPC is guaranteed to
    run after its own offers. Inside map tasks the ray.get is
    load-bearing — the driver finalizes from a different caller, so a
    task must not report done before its offers are processed."""
    df = pd.DataFrame({"host": hosts, "pol_shard": pol_shards,
                       "priority": prios, "politeness_rps": rates,
                       "url_sha1": sha1s})
    if df.empty:
        return
    futs = []
    for shard, g in df.groupby("pol_shard", sort=False):
        d = {}
        for host, hg in g.groupby("host", sort=False):
            rate = float(hg["politeness_rps"].iloc[0])
            cap = int(2 * rate) + 1
            p = np.sort(hg["priority"].to_numpy())[: cap + 1]
            d[host] = (int(len(hg)), p.tolist(), rate)
        oid = _offer_id(wave, int(shard), g["url_sha1"].tolist())
        futs.append(pol_handles[int(shard)].offer.remote(wave, d, offer_id=oid))
    if wait:
        ray.get(futs)


def _offer_seen_candidates(seen_handles: list, wave: int, cols: dict, idxs: list[int]):
    """Piggybacked seen-set offers for the candidate rows just parsed.
    Rows carry (host, priority, rate, seq) so finalize can also compute
    the admitted rows' politeness demand for wave+1. Sent column-wise
    (9 lists per shard, not 100k row tuples) — row-tuple pickling was a
    measurable, CPU-count-independent cost in the fetch stage."""
    if not idxs:
        return
    by_shard: dict[int, list[int]] = {}
    for i in idxs:
        by_shard.setdefault(int(cols["shard"][i]), []).append(i)
    futs = []
    for s, ii in by_shard.items():
        colpack = (
            [cols["url_sha1"][i] for i in ii],
            [int(cols["gseq"][i]) for i in ii],
            [cols["kind"][i] for i in ii],
            [bool(cols["follow_link"][i]) for i in ii],
            [cols["canon_url"][i] for i in ii],
            [cols["host"][i] for i in ii],
            [int(cols["priority"][i]) for i in ii],
            [float(cols["politeness_rps"][i]) for i in ii],
            [int(cols["seq"][i]) for i in ii],
        )
        futs.append(seen_handles[s].offer_candidates.remote(wave, colpack))
    ray.get(futs)


def make_fetch_parse_fn(world_params: WorldParams, wave: int, cfg: CrawlConfig,
                        pol_handles: list | None = None,
                        seen_handles: list | None = None):
    """Fused fetch+parse batch stage. Stateless tasks + per-process world
    cache (see module docstring); the parse dispatch is the M3 registry.
    When handles are given, the stage also piggybacks the wave protocol's
    offers — seen-set candidates for THIS wave, politeness demand for the
    deferred rows' NEXT wave — so no separate scan executions are needed.

    Emission is COLUMN-WISE: gate/pass-through kinds are Arrow
    ``take`` + constant-override table builds (zero per-row Python);
    the per-URL fetch loop is inherent, but its emissions accumulate
    into per-field column lists (per-listing list comprehensions, one
    vectorized pack_priority per page, host-hash cache) instead of
    per-row dict merges — profiling showed the dict-merge emitter and
    repeated hash64 calls costing more than the actual fetch+parse."""
    nss, nps = cfg.num_seen_shards, cfg.num_pol_shards

    # per-row column lists for NEW frontier rows (candidate /
    # frontier_image / frontier_detail2) — every other PARSED field is
    # a constant or default filled at table build
    _NEW_FIELDS = (
        "url", "canon_url", "url_sha1", "host", "host_hash", "shard",
        "pol_shard", "depth", "seq", "gseq", "fairness_round", "priority",
        "site_id", "strategy", "kind", "follow_link", "two_hop",
        "inner_link_tag", "politeness_rps", "title", "link", "location",
        "description", "image_id", "status",
    )

    class _NewRows:
        __slots__ = ("c",)

        def __init__(self):
            self.c = {k: [] for k in _NEW_FIELDS}

    def fetch_parse(batch: pa.Table):
        world = get_fetch_backend(cfg.fetch_backend, world_params,
                                  cfg.proxies)
        if batch.num_rows == 0:
            return
        gate = np.asarray(batch["gate"].to_pylist())
        kind_arr = np.asarray(batch["kind"].to_pylist())
        outs: list[pa.Table] = []

        def passthrough(mask, out_kind: str):
            idx = np.flatnonzero(mask)
            if not len(idx):
                return None
            sub = batch.take(pa.array(idx))
            outs.append(_parsed_table(out_kind, wave, len(idx), base=sub))
            return sub

        defer_tbl = passthrough(gate == "defer", "deferred")
        passthrough(gate == "block", "blocked")
        # admitted non-follow candidates: record completes with its
        # listing description — no fetch, no fetchlog
        passthrough((gate == "allow") & (kind_arr == "record_passthrough"),
                    "record")

        fidx = np.flatnonzero((gate == "allow") & (kind_arr != "record_passthrough"))
        cand = _NewRows()   # new candidate rows (listing parses)
        frontier = _NewRows()  # frontier_image + frontier_detail2 rows
        frontier_out: list[str] = []  # parallel out_kind per frontier row
        if len(fidx):
            ftbl = batch.take(pa.array(fidx))
            F = {
                name: ftbl[name].to_pylist()
                for name in ("canon_url", "url_sha1", "host", "kind", "strategy",
                             "elements_path", "inner_link_tag", "two_hop",
                             "follow_link", "site_id", "seq", "gseq", "depth",
                             "fairness_round", "description", "link", "location",
                             "title", "politeness_rps")
            }
            nf = len(fidx)
            statuses = [0] * nf
            err_idx: list[int] = []
            err_status: list[int] = []
            err_msg: list[str] = []
            rec_idx: list[int] = []       # detail records (identity = row)
            rec_desc: list[str] = []
            rec_status: list[int] = []
            img_idx: list[int] = []       # final image rows
            img_bytes: list[bytes] = []
            img_w: list[int] = []
            img_h: list[int] = []
            img_fmt: list[str] = []
            img_ph: list[int] = []
            d2rec = _NewRows()            # detail2 records (identity = job link)
            d2rec_base: list[int] = []    # parallel base-row index

            def new_frontier_row(out_kind, i, url, kind, depth, seq, gseq,
                                 priority, desc, image_id, status):
                canon = canonicalize(url)
                host = host_of(canon)
                hh = _h64(host)
                c = frontier.c
                c["url"].append(url)
                c["canon_url"].append(canon)
                c["url_sha1"].append(sha1_hex(canon))
                c["host"].append(host)
                c["host_hash"].append(hh)
                c["shard"].append(hh % nss)
                c["pol_shard"].append(hh % nps)
                c["depth"].append(depth)
                c["seq"].append(seq)
                c["gseq"].append(gseq)
                c["fairness_round"].append(F["fairness_round"][i])
                c["priority"].append(priority)
                c["site_id"].append(F["site_id"][i])
                c["strategy"].append(F["strategy"][i])
                c["kind"].append(kind)
                c["follow_link"].append(F["follow_link"][i])
                c["two_hop"].append(F["two_hop"][i])
                c["inner_link_tag"].append(F["inner_link_tag"][i])
                c["politeness_rps"].append(F["politeness_rps"][i])
                c["title"].append(F["title"][i])
                c["link"].append(F["link"][i])
                c["location"].append(F["location"][i])
                c["description"].append(desc)
                c["image_id"].append(image_id)
                c["status"].append(status)
                frontier_out.append(out_kind)

            for i in range(nf):
                status, payload = world.fetch(F["canon_url"][i])
                statuses[i] = status
                kind = F["kind"][i]
                if kind == "listing":
                    if status != 200:
                        err_idx.append(i)
                        err_status.append(status)
                        err_msg.append(f"listing fetch status {status}")
                        continue
                    try:
                        cands = parse_listing(
                            payload.decode("utf-8", "replace"),
                            F["strategy"][i],
                            json.loads(F["elements_path"][i]),
                            "https://" + F["host"][i],  # absolutization (cfg.name)
                        )
                    except (ValueError, KeyError, json.JSONDecodeError) as e:
                        err_idx.append(i)
                        err_status.append(status)
                        err_msg.append(f"{type(e).__name__}: {e}")
                        continue
                    k = len(cands)
                    links = [c["link"] for c in cands]
                    canon = [canonicalize(l) for l in links]
                    hosts = [host_of(cn) for cn in canon]
                    hh = [_h64(h) for h in hosts]
                    seq0, gseq0 = F["seq"][i], F["gseq"][i]
                    seqs = [seq0 + 1 + 2 * s for s in range(k)]
                    prios = pack_priority(0, 1, 0, np.asarray(seqs, dtype=np.int64))
                    c = cand.c
                    c["url"].extend(links)
                    c["canon_url"].extend(canon)
                    c["url_sha1"].extend(sha1_hex(cn) for cn in canon)
                    c["host"].extend(hosts)
                    c["host_hash"].extend(hh)
                    c["shard"].extend(h % nss for h in hh)
                    c["pol_shard"].extend(h % nps for h in hh)
                    c["depth"].extend([1] * k)
                    c["seq"].extend(seqs)
                    c["gseq"].extend(gseq0 + 1 + 2 * s for s in range(k))
                    c["fairness_round"].extend([0] * k)
                    c["priority"].extend(prios.tolist())
                    c["site_id"].extend([F["site_id"][i]] * k)
                    c["strategy"].extend([F["strategy"][i]] * k)
                    c["kind"].extend(["candidate"] * k)
                    c["follow_link"].extend([F["follow_link"][i]] * k)
                    c["two_hop"].extend([F["two_hop"][i]] * k)
                    c["inner_link_tag"].extend([F["inner_link_tag"][i]] * k)
                    c["politeness_rps"].extend([F["politeness_rps"][i]] * k)
                    c["title"].extend(cd["title"] for cd in cands)
                    c["link"].extend(links)
                    c["location"].extend(cd["location"] for cd in cands)
                    c["description"].extend(cd["description"] for cd in cands)
                    c["image_id"].extend([""] * k)
                    c["status"].extend([status] * k)
                elif kind == "detail":
                    text = payload.decode("utf-8", "replace")
                    if F["two_hop"][i]:
                        # M10: detail page → apply link → strip /apply; the
                        # stripped URL's whole-page text is the description
                        apply = parse_apply_link(text, status)
                        if apply is not None:
                            new_frontier_row(
                                "frontier_detail2", i,
                                "https://" + F["host"][i] + apply, "detail2",
                                2, F["seq"][i], F["gseq"][i],
                                int(pack_priority(0, 2, 0, F["seq"][i])),
                                F["description"][i],
                                F["url_sha1"][i],  # parent record identity
                                status,
                            )
                            continue
                        desc = F["description"][i]  # no apply link → default
                    else:
                        desc = parse_detail(text, status, F["inner_link_tag"][i],
                                            default=F["description"][i])
                    rec_idx.append(i)
                    rec_desc.append(desc)
                    rec_status.append(status)
                    new_frontier_row(
                        "frontier_image", i, F["canon_url"][i] + "/image",
                        "image", 2, F["seq"][i] + 1, F["gseq"][i] + 1,
                        int(pack_priority(0, 2, 0, F["seq"][i] + 1)),
                        desc, F["url_sha1"][i], status,
                    )
                elif kind == "detail2":
                    # M10 second hop: whole-page text; the record keeps
                    # the JOB link identity (carried in link/image_id)
                    desc = whole_page_text(payload.decode("utf-8", "replace"),
                                           status, F["description"][i])
                    job_url = F["link"][i]
                    job_canon = canonicalize(job_url)
                    job_sha = sha1_hex(job_canon)
                    jh = host_of(job_canon)
                    jhh = _h64(jh)
                    c = d2rec.c
                    c["url"].append(job_url)
                    c["canon_url"].append(job_canon)
                    c["url_sha1"].append(job_sha)
                    c["host"].append(jh)
                    c["host_hash"].append(jhh)
                    c["shard"].append(jhh % nss)
                    c["pol_shard"].append(jhh % nps)
                    c["depth"].append(2)
                    c["seq"].append(F["seq"][i])
                    c["gseq"].append(F["gseq"][i])
                    c["fairness_round"].append(F["fairness_round"][i])
                    c["priority"].append(0)
                    c["site_id"].append(F["site_id"][i])
                    c["strategy"].append(F["strategy"][i])
                    c["kind"].append(F["kind"][i])
                    c["follow_link"].append(F["follow_link"][i])
                    c["two_hop"].append(F["two_hop"][i])
                    c["inner_link_tag"].append(F["inner_link_tag"][i])
                    c["politeness_rps"].append(F["politeness_rps"][i])
                    c["title"].append(F["title"][i])
                    c["link"].append(F["link"][i])
                    c["location"].append(F["location"][i])
                    c["description"].append(desc)
                    c["image_id"].append(F["url_sha1"][i])
                    c["status"].append(status)
                    d2rec_base.append(i)
                    new_frontier_row(
                        "frontier_image", i, job_canon + "/image", "image",
                        3, F["seq"][i] + 1, F["gseq"][i] + 1,
                        int(pack_priority(0, 3, 0, F["seq"][i] + 1)),
                        desc, job_sha, status,
                    )
                elif kind == "image":
                    if status != 200 or not payload:
                        err_idx.append(i)
                        err_status.append(status)
                        err_msg.append(f"image fetch status {status}")
                        continue
                    pixels, fmt = codecs.decode(payload)
                    img_idx.append(i)
                    img_bytes.append(payload)
                    img_w.append(pixels.shape[1])
                    img_h.append(pixels.shape[0])
                    img_fmt.append(fmt)
                    img_ph.append(codecs.phash64(pixels))
                else:
                    err_idx.append(i)
                    err_status.append(status)
                    err_msg.append(f"unknown kind {kind}")

            # compact fetch-log rows: the conformance ordering projection
            outs.append(_parsed_table(
                "fetchlog", wave, nf, base=ftbl,
                overrides={"status": statuses, "title": "", "link": "",
                           "location": "", "description": "",
                           "elements_path": ""},
            ))
            if err_idx:
                sub = ftbl.take(pa.array(err_idx))
                outs.append(_parsed_table(
                    "error", wave, len(err_idx), base=sub,
                    overrides={"status": err_status, "error": err_msg},
                ))
            if rec_idx:
                sub = ftbl.take(pa.array(rec_idx))
                outs.append(_parsed_table(
                    "record", wave, len(rec_idx), base=sub,
                    overrides={"status": rec_status, "description": rec_desc},
                ))
            if d2rec_base:
                outs.append(_parsed_table(
                    "record", wave, len(d2rec_base),
                    overrides={k: v for k, v in d2rec.c.items() if k != "priority"},
                ))
            if img_idx:
                sub = ftbl.take(pa.array(img_idx))
                outs.append(_parsed_table(
                    "image", wave, len(img_idx), base=sub,
                    overrides={"status": [statuses[i] for i in img_idx],
                               "img_bytes": img_bytes, "w": img_w, "h": img_h,
                               "fmt": img_fmt, "phash": img_ph},
                ))
            if cand.c["url"]:
                outs.append(_parsed_table(
                    "candidate", wave, len(cand.c["url"]),
                    overrides={**cand.c, "elements_path": ""},
                ))
            if frontier.c["url"]:
                fo = frontier_out
                c = frontier.c
                n_f = len(fo)
                # split by out_kind (frontier_image vs frontier_detail2)
                for okind in ("frontier_image", "frontier_detail2"):
                    sel = [j for j in range(n_f) if fo[j] == okind]
                    if not sel:
                        continue
                    outs.append(_parsed_table(
                        okind, wave, len(sel),
                        overrides={k: [v[j] for j in sel] for k, v in c.items()},
                    ))

        # piggybacked offers
        if seen_handles is not None:
            offer_cols = {k: list(cand.c[k]) for k in
                          ("url_sha1", "gseq", "kind", "follow_link", "canon_url",
                           "host", "priority", "politeness_rps", "seq", "shard")}
            for k in offer_cols:
                offer_cols[k].extend(frontier.c[k])
            if offer_cols["url_sha1"]:
                _offer_seen_candidates(
                    seen_handles, wave, offer_cols,
                    list(range(len(offer_cols["url_sha1"]))),
                )
        if pol_handles is not None and defer_tbl is not None:
            # deferred rows re-enter wave+1 with a fairness bump; offer
            # their bumped priority so the next finalize sees what the
            # next gate will compare
            bumped = pack_priority(
                np.asarray(defer_tbl["fairness_round"].to_pylist()) + 1,
                np.asarray(defer_tbl["depth"].to_pylist()), 0,
                np.asarray(defer_tbl["seq"].to_pylist()),
            )
            _offer_pol_demand(
                pol_handles, wave + 1,
                defer_tbl["host"].to_pylist(),
                defer_tbl["pol_shard"].to_pylist(),
                bumped.tolist(),
                defer_tbl["politeness_rps"].to_pylist(),
                defer_tbl["url_sha1"].to_pylist(),
            )
        yield from outs

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
_VERDICT_BCAST_CACHE: dict[int, Any] = {}  # driver-side: wave -> ObjectRef


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

    def demand(t: pa.Table) -> pa.Table:
        # pass-through records never fetch: offering their demand would
        # debit tokens for rows that bypass the gate, making a resumed
        # run's wave accounting diverge from the warm path (which
        # excludes them in SeenShard.finalize's admitted_demand).
        # Arrow in; only the 5 offer columns drop to pandas for the
        # grouping (the wide frontier never converts).
        t = t.filter(pc.not_equal(t["kind"], "record_passthrough"))
        if t.num_rows:
            df = t.select(["pol_shard", "host", "politeness_rps",
                           "priority", "url_sha1"]).to_pandas()
            for shard, g in df.groupby("pol_shard", sort=False):
                d = {}
                for host, hg in g.groupby("host", sort=False):
                    rate = float(hg["politeness_rps"].iloc[0])
                    cap = int(2 * rate) + 1
                    prios = np.sort(hg["priority"].to_numpy())[: cap + 1]
                    d[host] = (int(len(hg)), prios.tolist(), rate)
                oid = _offer_id(wave, int(shard), g["url_sha1"].tolist())
                ray.get(pol_handles[int(shard)].offer.remote(wave, d, offer_id=oid))
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    return demand


def _gate_labels(host: np.ndarray, priority: np.ndarray,
                 pol_shard: np.ndarray, pol_handles: list,
                 wave: int) -> np.ndarray:
    """Vectorized allow/defer/block labels from the finalized per-host
    thresholds (priority ≤ threshold ⇒ allowed; priorities are unique
    per host so exactly k rows pass). Takes plain numpy columns so the
    caller can stay Arrow-native."""
    from ..state.politeness import _PolitenessShard

    thr: dict[str, int] = {}
    for shard in np.unique(pol_shard):
        thr.update(_cached_rpc(pol_handles[int(shard)], "thresholds", wave))
    t = pd.Series(host).map(thr).fillna(-1).to_numpy(dtype=np.int64)
    return np.where(
        t == _PolitenessShard.BLOCK, "block",
        np.where(priority <= t, "allow", "defer"))


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

    # Driver-side: fetch every shard's sorted verdict arrays in ONE
    # parallel RPC round, merge, and BROADCAST via ray.put — workers
    # read the plasma buffers zero-copy. (Per-worker fetching cost ~9 s
    # on each process's first batch: 32 processes × 16 sequential RPCs
    # serialized on 16 single-threaded actors.) Cached per wave so the
    # wave's two _load() calls don't merge twice.
    actors_key = tuple(h._actor_id.hex() for h in seen_handles)
    vref = _VERDICT_BCAST_CACHE.get((actors_key, prev_wave))
    if vref is None:
        # one parallel RPC round, then broadcast the PER-SHARD sorted
        # arrays as-is — no driver-side concatenate/argsort (a global
        # re-sort of ~1M S40 keys cost ~2s of serial driver time per
        # wave, which the fast scaling leg paid disproportionately).
        # Workers route lookups by each row's shard column, the same
        # hash64(host) % K routing the offers used.
        parts = ray.get([h.verdict_arrays.remote(prev_wave) for h in seen_handles])
        vref = ray.put(parts)
        # keyed by the ACTOR SET + wave: a wave number alone would leak
        # verdicts across run_crawl invocations in one driver process
        for k in [k for k in _VERDICT_BCAST_CACHE
                  if k[0] != actors_key or k[1] < prev_wave]:
            del _VERDICT_BCAST_CACHE[k]
        _VERDICT_BCAST_CACHE[(actors_key, prev_wave)] = vref

    def _shard_arrays():
        """ray.get the broadcast ONCE per worker process (zero-copy
        plasma-backed numpy; ~17 bytes/key — a dict representation of
        the same table cost ~600 MB per process)."""
        key = ("merged_verdicts", actors_key, prev_wave)
        hit = _ACTOR_CACHE.get(key)
        if hit is None:
            stale = [k for k in _ACTOR_CACHE
                     if k[0] == "merged_verdicts" and k[1:] != (actors_key, prev_wave)]
            for k in stale:
                del _ACTOR_CACHE[k]
            hit = ray.get(vref)
            _ACTOR_CACHE[key] = hit
        return hit

    from ..state.seen import _SeenShard

    _LABEL_NAMES = np.array(_SeenShard.LABELS)

    def _lookup(sorted_keys: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(found_mask, clipped_index) of q in sorted_keys (exact S40)."""
        if len(sorted_keys) == 0:
            return np.zeros(len(q), dtype=bool), np.zeros(len(q), dtype=np.int64)
        idx = np.clip(np.searchsorted(sorted_keys, q), 0, len(sorted_keys) - 1)
        return sorted_keys[idx] == q, idx

    def _with_cols(base: pa.Table, **repl) -> pa.Table:
        """Copy of ``base`` with named columns replaced, preserving
        column order (so the per-segment tables concat cleanly). A
        replacement whose name is not in ``base`` would otherwise be
        silently dropped — fail loudly instead."""
        missing = set(repl) - set(base.column_names)
        if missing:
            raise KeyError(
                f"_with_cols: replacement column(s) {sorted(missing)} "
                f"not in base schema {base.column_names}")
        cols = {name: repl.get(name, base[name])
                for name in base.column_names}
        return pa.table(cols)

    def convert(t: pa.Table) -> pa.Table:
        # Arrow-native end to end: verdict lookups are numpy over
        # zero-copy columns, segments are built with filter +
        # column-replace — no full-frontier pandas round trip (the
        # vecstress lesson: that paid per-row list materialization on
        # both sides of every batch boundary).
        if t.num_rows == 0:
            return t
        parts = _shard_arrays()
        q = np.asarray(t["url_sha1"].to_numpy(zero_copy_only=False),
                       dtype="S40")
        sh = t["shard"].to_numpy(zero_copy_only=False)
        n = t.num_rows
        code = np.zeros(n, dtype=np.int8)   # 0 = "dup" (missing)
        win = np.full(n, -1, dtype=np.int64)
        for s in np.unique(sh):
            m = sh == s
            keys, labs, wins = parts[int(s)][:3]
            if len(keys) == 0:  # empty shard (abnormal: resume with a
                continue        # different shard count) — rows stay "dup"
            found, idx = _lookup(keys, q[m])
            code[m] = np.where(found, labs[idx], 0)
            win[m] = np.where(found, wins[idx], -1)
        # only the winning gseq carries the verdict; later intra-wave
        # duplicates of the same key are "dup" (first-wins)
        lab = _LABEL_NAMES[code]
        gseq = t["gseq"].to_numpy(zero_copy_only=False)
        label = np.where(gseq == win, lab, "dup")

        keep_mask = np.isin(label, list(_KIND))
        kept = t.filter(pa.array(keep_mask))
        klabel = label[keep_mask]
        kind = np.empty(len(klabel), dtype=object)
        for k, v in _KIND.items():
            kind[klabel == k] = v
        kept = _with_cols(kept, kind=pa.array(kind, type=pa.string()))
        out = [kept]

        rec_mask = klabel == "record"
        if rec_mask.any():
            rq = q[keep_mask][rec_mask]
            rs = sh[keep_mask][rec_mask]
            rkeep = np.zeros(len(rq), dtype=bool)
            for s in np.unique(rs):
                m = rs == s
                ekeys, evals = parts[int(s)][3:]
                if len(ekeys) == 0:  # empty shard — nothing evaluable
                    continue
                ef, ei = _lookup(ekeys, rq[m])
                rkeep[m] = np.where(ef, evals[ei], False)
            rec_sel = rec_mask.copy()
            rec_sel[rec_mask] = rkeep
        else:
            rec_sel = rec_mask

        # A "dup" verdict on a detail2 (stripped-apply) URL means the
        # intermediate fetch is redundant — NOT that the job is a dup
        # (reachable via cuckoo false positives, or two jobs sharing an
        # apply target). The reference would still emit the record with
        # the default (listing) description; convert to a pass-through
        # record keyed by the JOB link instead of silently dropping it.
        kind_in = t["kind"].to_numpy(zero_copy_only=False)
        dup2_mask = (label == "dup") & (kind_in == "detail2")
        if dup2_mask.any():
            base2 = t.filter(pa.array(dup2_mask))
            links = base2["link"].to_pylist()
            canon = [canonicalize(x) for x in links]
            hosts = [host_of(c) for c in canon]
            hh = np.fromiter((hash64(h) for h in hosts), dtype=np.int64,
                             count=len(hosts))
            out.append(_with_cols(
                base2,
                url=base2["link"],
                canon_url=pa.array(canon, type=pa.string()),
                url_sha1=pa.array([sha1_hex(c) for c in canon],
                                  type=pa.string()),
                host=pa.array(hosts, type=pa.string()),
                host_hash=pa.array(hh, type=pa.int64()),
                shard=pa.array(hh % cfg.num_seen_shards, type=pa.int64()),
                pol_shard=pa.array(hh % cfg.num_pol_shards, type=pa.int64()),
                kind=pa.array(["record_passthrough"] * len(links),
                              type=pa.string()),
            ))

        if rec_sel.any():
            base = kept.filter(pa.array(rec_sel))
            canon2 = pc.binary_join_element_wise(
                base["canon_url"].combine_chunks(), "/image", "")
            seq1 = base["seq"].to_numpy(zero_copy_only=False) + 1
            out.append(_with_cols(
                base,
                image_id=base["url_sha1"],
                canon_url=canon2,
                url=canon2,
                url_sha1=pa.array([sha1_hex(c) for c in canon2.to_pylist()],
                                  type=pa.string()),
                depth=pa.array(np.full(base.num_rows, 2, dtype=np.int64)),
                seq=pa.array(seq1, type=pa.int64()),
                gseq=pa.array(
                    base["gseq"].to_numpy(zero_copy_only=False) + 1,
                    type=pa.int64()),
                priority=pa.array(
                    pack_priority(0, 2, 0, seq1).astype(np.int64)),
                kind=pa.array(["image"] * base.num_rows, type=pa.string()),
            ))
        return pa.concat_tables(out).combine_chunks()

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
    subdir name is the label), via an Arrow value_counts kernel. At
    cluster scale this becomes a groupby aggregate over the label
    column."""
    out: dict = {}
    for p in paths:
        if dir_num_rows(p) == 0:
            continue
        label = os.path.basename(p).split("=", 1)[-1]
        t = pads.dataset(p, format="parquet").to_table(columns=["site_id"])
        for vc in pc.value_counts(t["site_id"]).to_pylist():
            out.setdefault(vc["values"], {}).setdefault(label, 0)
            out[vc["values"]][label] += int(vc["counts"])
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


def _write_seed_and_demand(seed_tbl: pa.Table, seed_dir: str,
                           pol: PolitenessPool, cfg: CrawlConfig,
                           start_wave: int) -> None:
    """Write the wave-0 seed frontier and file its politeness demand.

    - robots prefetch is fire-and-forget: fills each politeness shard's
      robots cache (and forces its process spawn) while the driver
      writes the seed files — off wave-0's critical path.
    - the seed splits across ``wave_blocks`` FILES: a single parquet
      file reads as ONE task whose SplitBlocks generator paces all
      downstream task launches (measured ~1.6× effective concurrency
      regardless of CPUs); separate files read as independent tasks.
    - wave-0 politeness demand is offered straight from the in-memory
      seed table — running a whole Ray execution just to scan the seed
      built one line ago paid a full worker-pool spin-up before the
      first wave. (Resume still uses the frontier-scan cold start: its
      frontier is parquet on disk, not in memory.)
    - the seed dir is cleared first: a reused out_dir (fresh run or a
      later recrawl generation with a smaller budget) must not leave
      stale higher-index seed files for wave 0 / the refetched-set
      rebuild to glob."""
    shutil.rmtree(seed_dir, ignore_errors=True)
    os.makedirs(seed_dir, exist_ok=True)
    pol.warm_robots(seed_tbl["host"].to_pylist())
    per = max(1, (seed_tbl.num_rows + cfg.wave_blocks - 1) // cfg.wave_blocks)
    for i in range(0, cfg.wave_blocks):
        sl = seed_tbl.slice(i * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(seed_dir, f"seed_{i:04d}.parquet"))
    if seed_tbl.num_rows:
        _offer_pol_demand(
            pol.handles(), start_wave,
            seed_tbl["host"].to_pylist(),
            seed_tbl["pol_shard"].to_pylist(),
            seed_tbl["priority"].to_pylist(),
            seed_tbl["politeness_rps"].to_pylist(),
            seed_tbl["url_sha1"].to_pylist(),
            wait=False,  # driver-side: actor queue orders offer < finalize
        )


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
            _notify(cfg, summary)  # resumed-complete still alerts S12
            return summary
        pol.load_states(prior.politeness_states)
        start_wave = prior.wave + 1
        frontier_spec = prior.frontier_path
    seed_tbl: pa.Table | None = None
    if prior is None:
        _clear_stale_state(out_dir)
        seed_tbl = seed_frontier_table(world, cfg)
        _write_seed_and_demand(seed_tbl, seed_dir, pol, cfg, start_wave)

    return _drive(world_params, out_dir, cfg, seen, pol, frontier_spec,
                  start_wave, seed_in_memory=seed_tbl is not None)


def _clear_stale_state(out_dir: str) -> None:
    """Fresh-run hygiene for a reused out_dir: drop prior checkpoint
    manifests/snapshots and wave outputs. Without this, a prior run's
    HIGHER-wave manifest outranks the new run's in ``latest_manifest``
    (resume/chaining would restore the earlier run's seen/politeness
    state), and stale ``waves/w*/parsed`` outputs from a prior world
    with more waves would inflate assembly. The recrawl bookkeeping
    goes too: a fresh run must not inherit an earlier generation's
    ``recrawl_meta.json`` (its last_fetch map describes outputs this
    clear just deleted). Resume paths never call this — they chain
    from the existing state on purpose."""
    shutil.rmtree(os.path.join(out_dir, "ckpt"), ignore_errors=True)
    shutil.rmtree(os.path.join(out_dir, "waves"), ignore_errors=True)
    try:
        os.remove(os.path.join(out_dir, RECRAWL_META))
    except FileNotFoundError:
        pass


def _drive(
    world_params: WorldParams,
    out_dir: str,
    cfg: CrawlConfig,
    seen: SeenSet,
    pol: PolitenessPool,
    frontier_spec: dict | None,
    start_wave: int,
    seed_in_memory: bool,
) -> dict:
    """Shared wave loop + assembly + summary (run_crawl / run_recrawl).
    Owns the seen/politeness pools: shuts them down before returning."""
    wave = start_wave
    if frontier_spec is None and latest_manifest(out_dir) is None:
        # zero-seed run (e.g. recrawl with budget=0): the wave loop never
        # executes, but the next generation still chains from this
        # out_dir's manifests — checkpoint the imported state now
        write_manifest(out_dir, WaveManifest(
            wave=wave, frontier_path=None,
            seen_paths=seen.snapshot(ckpt_dir(out_dir), wave),
            politeness_states=pol.states()))
    while wave < cfg.max_waves and frontier_spec is not None:
        # checkpoint cadence: snapshot + manifest every k-th wave (and
        # always on the terminal wave). Skipped waves replay on resume —
        # wave outputs are idempotent (assembly dedups by url_sha1; seen/
        # politeness offers dedup by key/offer-id).
        want_ckpt = (wave - start_wave) % cfg.checkpoint_every == 0
        m = _run_wave(out_dir, wave, frontier_spec, seen, pol, world_params, cfg,
                      cold_start=(wave == start_wave and not seed_in_memory),
                      do_checkpoint=want_ckpt)
        if m.metrics.get("checkpointed", True):
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
    _notify(cfg, summary)
    return summary


def _notify(cfg: CrawlConfig, summary: dict) -> None:
    """S12 seam: ship the run summary to the configured webhook
    (reference: src/logs_in_discord.py posts log summaries to Discord).
    Alerting never fails the crawl — errors degrade to a warning."""
    if not cfg.notify_webhook:
        return
    from ..sources.notify import WebhookNotifier

    try:
        WebhookNotifier(cfg.notify_webhook).send_summary(
            "crawl summary",
            {k: v for k, v in summary.items() if k != "seen_membership"})
    except Exception as e:  # noqa: BLE001 — alerting is best-effort
        import warnings

        warnings.warn(f"webhook notify failed: {e}", stacklevel=2)


RECRAWL_META = "recrawl_meta.json"


def _load_recrawl_meta(out_dir: str) -> dict:
    p = os.path.join(out_dir, RECRAWL_META)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    # a plain crawl output: everything it fetched belongs to generation 0
    return {"generation": 0, "last_fetch": {}}


def run_recrawl(
    world_params: WorldParams,
    prior_out_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    budget: int | None = None,
    resume: bool = False,
) -> dict:
    """Incremental recrawl: re-fetch listing pages against a PRIOR
    crawl's seen state, discovering only the delta.

    The reference has no true incremental crawl — a re-run fetches
    everything and relies on DB conflict-skip to no-op known rows
    (``src/crawler.py:172-244``); its only incremental surface is the
    embedding watermark (``src/embeddings/embed_latest_crawled_data.py:
    135-177``). Here the recrawl IS incremental end-to-end:

    - wave-0 re-seeds every listing page with an age-packed priority
      (generations since last refetch → stalest-first; see
      ``seed_frontier_table``). Listings never seen before rank first.
    - ``budget`` caps how many listing pages this generation refetches
      (a real recrawl scheduler's per-cycle fetch budget). Deferred
      listings accumulate age and win later generations, so coverage
      rotates without any per-site scheduling state.
    - discovered child URLs flow through the normal seen gate against
      the IMPORTED seen snapshot: an unchanged site costs exactly its
      listing fetches (zero detail/image fetches); a changed site
      yields exactly its new jobs. Assembly over ``out_dir`` is
      therefore a delta-only job/image table.

    Generation bookkeeping lives in ``<out_dir>/recrawl_meta.json``
    (per-listing last-refetched generation), so recrawls chain:
    ``crawl → recrawl → recrawl`` each reading the previous run's
    out_dir as ``prior_out_dir``.

    ``resume=True`` continues an interrupted recrawl from ``out_dir``'s
    own wave manifests (the snapshots already carry the imported seen
    state), re-entering the wave loop exactly like ``run_crawl`` resume
    — and rewrites ``recrawl_meta.json`` from the on-disk seed frontier,
    so a crash after the waves but before the meta write is also
    recovered.
    """
    cfg = cfg or CrawlConfig()
    world = World(world_params)
    prior = latest_manifest(prior_out_dir)
    if prior is None:
        raise ValueError(
            f"run_recrawl needs a completed prior crawl; no checkpoint "
            f"manifests under {prior_out_dir!r}"
        )
    os.makedirs(out_dir, exist_ok=True)

    meta = _load_recrawl_meta(prior_out_dir)
    gen = int(meta["generation"]) + 1
    last_fetch = {k: int(v) for k, v in meta["last_fetch"].items()}
    ages = {sha: gen - g for sha, g in last_fetch.items()}
    seed_all = seed_frontier_table(world, cfg, ages=ages)

    seen = SeenSet(cfg.num_seen_shards, cfg.seen_capacity_per_shard,
                   seed=world_params.seed, exact_sidecar=cfg.exact_sidecar)
    pol = PolitenessPool(cfg.num_pol_shards, world_params)
    seed_dir = os.path.join(out_dir, "waves", "w0000", "frontier")

    mid = latest_manifest(out_dir) if resume else None
    if mid is not None:
        # resume this recrawl from its OWN manifests: snapshots already
        # carry the imported seen state (no prior_out_dir restore)
        seen.restore(mid.seen_paths)
        frontier_spec: dict | None = mid.frontier_path
        if frontier_spec is not None:
            pol.load_states(mid.politeness_states)
        summary = _drive(world_params, out_dir, cfg, seen, pol, frontier_spec,
                         start_wave=mid.wave + 1, seed_in_memory=False)
    else:
        if os.path.realpath(out_dir) != os.path.realpath(prior_out_dir):
            # reused out_dir from an EARLIER generation: its manifests
            # would outrank this generation's (or, for budget=0, stand
            # in for a checkpoint never written). In-place recrawl
            # (out_dir == prior_out_dir) keeps them — they ARE the
            # prior state being chained from.
            _clear_stale_state(out_dir)
        if budget is not None and seed_all.num_rows > budget:
            # stalest-first within the fetch budget: the packed priority
            # key already orders by (age desc, seq) for depth-0 listings
            order = pc.sort_indices(
                seed_all,
                sort_keys=[("priority", "ascending"), ("gseq", "ascending")],
            )
            seed_tbl = seed_all.take(order.slice(0, budget))
        else:
            seed_tbl = seed_all
        seen.restore(prior.seen_paths)
        frontier_spec = {"seed": [seed_dir], "defer": [], "detail": [], "image": []}
        if seed_tbl.num_rows:
            _write_seed_and_demand(seed_tbl, seed_dir, pol, cfg, 0)
        else:
            frontier_spec = None  # budget=0: nothing to refetch this cycle
            shutil.rmtree(seed_dir, ignore_errors=True)  # stale seeds from
            # a prior generation in this out_dir must not count as refetched
        summary = _drive(world_params, out_dir, cfg, seen, pol, frontier_spec,
                         start_wave=0, seed_in_memory=True)

    # rebuild the refetched set from the on-disk seed frontier (works
    # for fresh, resumed, and crashed-before-meta runs alike)
    refetched: set[str] = set()
    for f in sorted(glob.glob(os.path.join(seed_dir, "seed_*.parquet"))):
        refetched.update(pq.read_table(f, columns=["url_sha1"])["url_sha1"].to_pylist())
    current = set(seed_all["url_sha1"].to_pylist())
    new_last = {sha: (gen if sha in refetched else last_fetch.get(sha, 0))
                for sha in current}  # prune listings gone from the world
    tmp = os.path.join(out_dir, RECRAWL_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"generation": gen, "last_fetch": new_last}, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, RECRAWL_META))

    summary["recrawl_generation"] = gen
    summary["listings_refetched"] = len(refetched)
    summary["listings_deferred"] = seed_all.num_rows - len(refetched)
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
                batch_format="pyarrow",
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
    do_checkpoint: bool = True,
) -> WaveManifest:
    import time as _time

    timing: dict[str, float] = {}
    _t0 = _time.perf_counter()

    def _mark(key: str):
        nonlocal _t0
        now = _time.perf_counter()
        timing[key] = round(timing.get(key, 0.0) + (now - _t0), 3)
        _t0 = now

    wdir = os.path.join(out_dir, "waves", f"w{wave:04d}")
    parsed_dir = os.path.join(wdir, "parsed")
    # a wave replayed on resume (checkpoint_every>1, or a crash mid-wave)
    # must start from a CLEAN output directory — appending next to the
    # interrupted run's files would double candidate rows downstream and
    # inflate non-deduped outputs (error rows, fetchlog, metrics). Only
    # parsed/ is this wave's output (w0000 also holds the seed frontier).
    shutil.rmtree(parsed_dir, ignore_errors=True)
    os.makedirs(parsed_dir, exist_ok=True)
    seen_handles = seen.handles()
    pol_handles = pol.handles()

    def _load(num_blocks=None):
        return _load_frontier(frontier_spec, num_blocks=num_blocks,
                              seen_handles=seen_handles, prev_wave=wave - 1,
                              cfg=cfg)

    frontier = _load()
    if frontier is None:
        m = WaveManifest(wave=wave, frontier_path=None,
                         seen_paths=seen.snapshot(ckpt_dir(out_dir), wave),
                         politeness_states=pol.states())
        m.metrics["checkpointed"] = True
        return m

    # Cold start (seed wave / resume): the politeness demand for this
    # wave wasn't piggybacked by a previous wave — scan the frontier
    # once. Warm waves skip this: wave k-1's exec + finalize offered it.
    if cold_start:
        (
            _load()
            .map_batches(make_demand_fn(pol_handles, wave),
                         batch_format="pyarrow")
            .count()
        )
    pol.finalize(wave)
    _mark("gate_finalize")

    # THE wave execution (map-only, fused): previous wave's candidates
    # labeled against the finalized verdicts → threshold gate →
    # fetch+parse → hive write. Piggybacks the seen-set offers for this
    # wave's candidates and the deferred rows' politeness demand (wave+1).
    # Arrow-native: the gate reads three columns and appends one — a
    # pandas round trip here paid per-row list materialization on both
    # sides of every batch boundary (the vecstress lesson).
    def gate_label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("gate", pa.array([], type=pa.string()))
        g = _gate_labels(
            t["host"].to_numpy(zero_copy_only=False),
            t["priority"].to_numpy(zero_copy_only=False),
            t["pol_shard"].to_numpy(zero_copy_only=False),
            pol_handles, wave)
        # pass-through records were already admitted and need no
        # fetch — politeness does not apply
        kind = t["kind"].to_numpy(zero_copy_only=False)
        gate = np.where(kind == "record_passthrough", "allow", g)
        return t.append_column("gate", pa.array(gate, type=pa.string()))

    (
        _load(num_blocks=cfg.wave_blocks)
        .map_batches(gate_label, batch_format="pyarrow")
        .map_batches(
            make_fetch_parse_fn(world_params, wave, cfg,
                                pol_handles=pol_handles,
                                seen_handles=seen_handles),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
        )
        .write_parquet(parsed_dir, partition_cols=["out_kind"])
    )
    _mark("exec")

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
    _mark("seen_finalize")

    # metrics + manifest (records/images/errors are hive subdirs). The
    # detailed rollups are driver-side metadata/column reads that don't
    # scale with CPUs — benches disable them (not load-bearing).
    records_paths = _existing([_subdir(parsed_dir, "out_kind", "record")])
    images_paths = _existing([_subdir(parsed_dir, "out_kind", "image")])
    errors_paths = _existing([_subdir(parsed_dir, "out_kind", "error")])
    metrics: dict = {"seen": seen_counts}
    if cfg.detailed_metrics:
        metrics.update({
            "gate": {
                "allow": dir_num_rows(_subdir(parsed_dir, "out_kind", "fetchlog")),
                "defer": dir_num_rows(_subdir(parsed_dir, "out_kind", "deferred")),
                "block": dir_num_rows(_subdir(parsed_dir, "out_kind", "blocked")),
            },
            "parse": _site_counts([
                _subdir(parsed_dir, "out_kind", v)
                for v in ("candidate", "frontier_image", "record", "image", "error")
            ]),
            "fetched": dir_num_rows(_subdir(parsed_dir, "out_kind", "fetchlog")),
            "deferred": dir_num_rows(_subdir(parsed_dir, "out_kind", "deferred")),
            "records": sum(dir_num_rows(p) for p in records_paths),
            "images": sum(dir_num_rows(p) for p in images_paths),
            "errors": sum(dir_num_rows(p) for p in errors_paths),
        })
    _mark("metrics")

    do_ckpt = do_checkpoint or next_spec is None  # terminal wave: always
    seen_paths = seen.snapshot(ckpt_dir(out_dir), wave) if do_ckpt else []
    metrics["checkpointed"] = do_ckpt
    _mark("snapshot")
    metrics["timing"] = timing
    return WaveManifest(
        wave=wave,
        frontier_path=next_spec,
        records_paths=records_paths,
        images_paths=images_paths,
        errors_paths=errors_paths,
        seen_paths=seen_paths,
        politeness_states=pol.states() if do_ckpt else [],
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
            return _arrow_out(df)

        recs.map_batches(_clean_tag_stamp, batch_format="pandas").write_parquet(
            job_dir, partition_cols=["bucket"],
            min_rows_per_file=cfg.out_min_rows_per_file,
            max_rows_per_file=cfg.out_max_rows_per_file,
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
            cap_dir, partition_cols=["bucket"],
            min_rows_per_file=cfg.out_min_rows_per_file,
            max_rows_per_file=cfg.out_max_rows_per_file,
        )
    summary["image_caption"] = dir_num_rows(cap_dir) if img_dirs else 0
    return summary


# all 256 two-char lowercase hex prefixes, in value order — index_in
# against this set IS int(s[:2], 16), fully inside Arrow
_HEX2_PREFIXES = pa.array([f"{i:02x}" for i in range(256)])


def _dedup_by_sha(ds, order_cols: list[str]):
    """First-wins dedup on url_sha1: hash-bucket the keys (256 coarse
    groups → a real shuffle but no per-key task explosion), then a
    vectorized sort + drop_duplicates inside each bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        # Arrow-native bucket derivation (the old per-row
        # [int(s[:2], 16) ...] loop was the only row-Python in the
        # assembly path): slice the first two code units and look them
        # up in the ordered prefix set — the match index equals the
        # hex value
        pref = pc.utf8_slice_codeunits(t["url_sha1"], 0, 2)
        bucket = pc.cast(pc.index_in(pref, value_set=_HEX2_PREFIXES),
                         pa.int64())
        return t.append_column("dedup_bucket", bucket)

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url_sha1", *order_cols], kind="stable")
        return g.drop_duplicates(subset="url_sha1", keep="first").drop(
            columns=["dedup_bucket"]
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
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
