"""Sequential reference-semantics oracle (SURVEY.md §5 test strategy).

Reimplements the reference's exact traversal — config order → page
order → DOM order, dedup-first-wins before the follow-link fetch,
follow-link substitution with status fallbacks, clean pipeline, location
tagging — as one single-threaded loop over the same deterministic
synthetic world, extended with the graft's image fetch per record.

The engine's distributed wave pipeline must reproduce, row for row:
- final record table (title/link/description/location/location_tags)
- final URL-seen membership (SHA1 hex set)
- per-host fetch order (the oracle's sequence == engine log sorted by
  (host, seq, depth))
- the image table: exact caption equality + decoded-pixel PSNR ≥ 40 dB
  (lossy) / identical (lossless) vs ground-truth pixels

Leaf parse/clean/tag functions are shared with the engine (they are
definitionally the same transforms); what this oracle independently
exercises is the *orchestration*: ordering, dedup, politeness/robots
interaction, error fallbacks, resume idempotency.

Traversal mirrors ``src/crawler.py:320-361`` + per-strategy crawlers;
divergences (documented in SURVEY.md §2.4 J4, §4): record-level error
isolation, robots honored, seen-gate before follow fetch.
"""

from __future__ import annotations

import pandas as pd

from ..functions import codecs
from ..functions.textclean import CLEAN_COLUMNS, clean_caption, clean_location, strip_html_chars
from ..functions.urlnorm import canonicalize, host_of, sha1_hex
from ..stages.location import build_alias_map, tag_location
from ..stages.parse import parse_apply_link, parse_detail, parse_listing, whole_page_text
from ..synth.locations_full import WORLD_LOCATIONS_FULL
from ..synth.world import World, WorldParams


def run_oracle(world_params: WorldParams, crawl_ts: str = "2026-01-01T00:00:00") -> dict:
    world = World(world_params)
    seen: set[str] = set()
    records: list[dict] = []
    images: list[dict] = []
    fetch_order: list[dict] = []
    ground_pixels: dict[str, object] = {}  # image_id -> ndarray
    span = world.site_span()

    def log_fetch(host: str, seq: int, gseq: int, depth: int, canon: str, kind: str):
        fetch_order.append(
            {"host": host, "seq": seq, "gseq": gseq, "depth": depth,
             "canon_url": canon, "kind": kind}
        )

    for rank, site in enumerate(world.sites):
        host = host_of(canonicalize(site.name))
        if world.host_blocked(host):
            continue  # engine's robots gate drops the whole host
        stride = 2 * site.jobs_per_page + 2
        for idx, page in enumerate(
            range(site.start_point, site.start_point + site.pages_to_crawl)
        ):
            url = site.url if site.strategy == "rss" else f"{site.url}{page}"
            canon = canonicalize(url)
            pseq = idx * stride
            status, payload = world.fetch(canon)
            log_fetch(host, pseq, rank * span + pseq, 0, canon, "listing")
            if status != 200:
                continue
            try:
                cands = parse_listing(
                    payload.decode("utf-8", "replace"),
                    site.strategy,
                    site.elements_path,
                    "https://" + host,
                )
            except (ValueError, KeyError) as e:
                continue
            for slot, c in enumerate(cands):
                cseq = pseq + 1 + 2 * slot
                cgseq = rank * span + cseq
                link_canon = canonicalize(c["link"])
                link_sha = sha1_hex(link_canon)
                link_host = host_of(link_canon)
                if link_sha in seen:
                    continue  # first-wins (J1/D3)
                seen.add(link_sha)
                desc = c["description"]
                img_depth = 2
                if site.follow_link:
                    dstatus, dpayload = world.fetch(link_canon)
                    log_fetch(link_host, cseq, cgseq, 1, link_canon, "detail")
                    dtext = dpayload.decode("utf-8", "replace")
                    if site.two_hop:
                        # M10: apply link → strip /apply → whole-page text
                        apply = parse_apply_link(dtext, dstatus)
                        if apply is not None:
                            hop_url = canonicalize("https://" + link_host + apply)
                            hop_sha = sha1_hex(hop_url)
                            if hop_sha not in seen:
                                seen.add(hop_sha)
                                hstatus, hpayload = world.fetch(hop_url)
                                log_fetch(host_of(hop_url), cseq, cgseq, 2,
                                          hop_url, "detail2")
                                desc = whole_page_text(
                                    hpayload.decode("utf-8", "replace"), hstatus, desc,
                                )
                                img_depth = 3
                    else:
                        desc = parse_detail(
                            dtext, dstatus, site.inner_link_tag, default=desc,
                        )
                records.append(
                    {
                        "site_id": site.site_id,
                        "strategy": site.strategy,
                        "title": c["title"],
                        "link": c["link"],
                        "canon_url": link_canon,
                        "url_sha1": link_sha,
                        "host": link_host,
                        "description": desc,
                        "location": c["location"],
                        "seq": cseq,
                    }
                )
                # graft: every record's image fetch (depth 2)
                img_url = link_canon + "/image"
                img_sha = sha1_hex(img_url)
                if img_sha in seen:
                    continue
                seen.add(img_sha)
                istatus, ipayload = world.fetch(img_url)
                log_fetch(host_of(img_url), cseq + 1, cgseq + 1, img_depth, img_url, "image")
                if istatus != 200 or not ipayload:
                    continue
                pixels, fmt = codecs.decode(ipayload)
                images.append(
                    {
                        "image_id": link_sha,
                        "bytes": ipayload,
                        "w": pixels.shape[1],
                        "h": pixels.shape[0],
                        "fmt": fmt,
                        "caption": desc,  # cleaned below
                        "phash": codecs.phash64(pixels),
                    }
                )
                jid = link_canon.rsplit("/jobs/", 1)[-1]
                site_idx = world.by_host.get(link_host)
                if site_idx is not None:
                    ground_pixels[link_sha] = world.image_pixels(site_idx, jid)

    # clean (M11) + location tags (M12-M14), per strategy mask
    rec_df = pd.DataFrame(records)
    if not rec_df.empty:
        for strategy in rec_df["strategy"].unique():
            mask = rec_df["strategy"] == strategy
            for col in CLEAN_COLUMNS[strategy]:
                vals = rec_df.loc[mask, col].tolist()
                rec_df.loc[mask, col] = (
                    clean_location(vals) if col == "location" else strip_html_chars(vals)
                )
        alias = build_alias_map(WORLD_LOCATIONS_FULL)
        locs, tags = [], []
        for v in rec_df["location"].tolist():
            j, u = tag_location(v, alias)
            locs.append(j)
            tags.append(u)
        rec_df["location"] = locs
        rec_df["location_tags"] = tags
        ts = pd.Timestamp(crawl_ts)
        rec_df["pubdate"] = ts.date()
        rec_df["timestamp"] = ts

    img_df = pd.DataFrame(images)
    if not img_df.empty:
        img_df["caption"] = clean_caption(img_df["caption"].tolist())

    return {
        "records": rec_df,
        "images": img_df,
        "seen": seen,
        "fetch_order": pd.DataFrame(fetch_order),
        "ground_pixels": ground_pixels,
    }
