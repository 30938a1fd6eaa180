"""Deterministic synthetic web (FIXTURES.md §3) — the fetch seam's backend.

No network exists in this sandbox, so the engine's FetchActor resolves
URLs against a pure function of ``(seed, url)``: the same URL always
returns the same payload, in any process, on any node — which is what
makes conformance (engine vs sequential oracle) and resume testable.

The generated sites mirror the reference's three source families and
their configs (``src/resources/{bs4,api,rss}_resources/*.json``):

- ``html_main``      — one element per job (``async_bs4.py:96-180``)
- ``html_container`` — parallel column lists zipped (``async_bs4.py:183-272``)
- ``api_dict`` / ``api_list`` — JSON shapes (``async_api.py:69-84``)
- ``rss``            — feed entries (``async_rss.py:19-71``)

Payload quirks deliberately exercised: duplicate job links across pages
(first-wins dedup), missing API location keys (``location_default``
fallback, ``async_api.py:140-143``), missing RSS location attrs (the
hasattr quirk, ``async_rss.py:36-63``), deterministic 403/500 on detail
pages (follow-link default fallback, ``FollowLink.py:28-39``), HTML
tags + salary strings + ISO dates + camelCase in descriptions (the M11
clean chain), robots.txt-blocked hosts.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from ..functions import codecs
from ..functions.urlnorm import hash64

STRATEGIES = ("html_main", "html_container", "api_dict", "api_list", "rss")

_ROLES = ("Engineer", "Designer", "Analyst", "Scientist", "Manager", "Developer")
_LEVELS = ("Senior", "Junior", "Staff", "Lead", "Principal")
_LOCATIONS = (
    "Remote",
    "remote",
    "New York",
    "LONDON",
    "Berlin Germany",
    "United States",
    "Worldwide",
    "Madrid",
    "Paris France",
    "Tokyo",
    "Remote Job",
    "Sao Paulo - Brazil",
    "Austin/Texas",
    "NEW YORK",
    "Remote with frequent travel",
)
_FMT_CYCLE = ("raw", "pngz", "qjpg")


@dataclass
class SiteConfig:
    site_id: str
    name: str  # URL prefix for link absolutization (reference cfg.name)
    url: str  # listing/page URL prefix
    strategy: str
    pages_to_crawl: int
    start_point: int
    follow_link: bool
    two_hop: bool  # echojobs-style: detail page → apply link → stripped URL's whole-page text
    inner_link_tag: str
    elements_path: dict
    politeness_rps: int
    jobs_per_page: int

    def to_row(self) -> dict:
        d = asdict(self)
        d["elements_path"] = json.dumps(d["elements_path"])
        return d


@dataclass
class WorldParams:
    seed: int = 42
    n_sites: int = 3
    pages_per_site: int = 2
    jobs_per_page: int = 5
    fail_pct: int = 4  # % of detail pages answering 403/500
    blocked_pct: int = 0  # % of hosts whose robots.txt disallows everything
    politeness_rps: int = 0  # 0 = generous (site finishes in one wave/kind)
    rss_missing_loc: bool = True  # exercise the reference's hasattr quirk
    img_min: int = 16  # image dimension range (bench raises for compute density)
    img_max: int = 64
    two_hop: bool = True  # enable the echojobs-style two-hop follow sites


class World:
    """Pure deterministic site universe. Cheap to construct — built once
    per fetch actor in ``__init__`` (SURVEY.md §2.3 T5)."""

    def __init__(self, params: WorldParams):
        self.p = params
        self.sites = [self._make_site(i) for i in range(params.n_sites)]
        self.by_host = {self._host(i): i for i in range(params.n_sites)}

    # -- site construction ----------------------------------------------
    def _host(self, i: int) -> str:
        return f"site-{i:04d}.test"

    def _make_site(self, i: int) -> SiteConfig:
        strategy = STRATEGIES[i % len(STRATEGIES)]
        host = self._host(i)
        base = f"https://{host}"
        h = hash64(f"{self.p.seed}|site|{i}")
        follow = strategy == "rss" or (h % 2 == 0)
        # M10 parity: some follow-mode API sites use the two-hop pattern
        # mirrors the reference: echojobs is the api_dict site with the
        # two-link pattern (async_api.py:122-128)
        two_hop = bool(self.p.two_hop and follow and strategy == "api_dict")
        rps = self.p.politeness_rps or (2 * self.p.jobs_per_page + 4)
        pages = 1 if strategy == "rss" else self.p.pages_per_site
        if strategy in ("html_main", "html_container"):
            elements = {
                "jobs_path": ".job" if strategy == "html_main" else ".board",
                "title_path": ".title",
                "link_path": ".joblink",
                "location_path": ".location",
                "description_path": ".desc",
            }
            url = f"{base}/list?page="
        elif strategy in ("api_dict", "api_list"):
            elements = {
                "dict_tag": "result" if strategy == "api_dict" else "",
                "title_tag": "title",
                "link_tag": "url",
                "description_tag": "description",
                "pubdate_tag": "created_at",
                "location_tag": "location",
                "location_default": "NaN",
            }
            url = f"{base}/api?page="
        else:  # rss
            elements = {
                "title_tag": "title",
                "link_tag": "link",
                "description_tag": "description",
                "location_tag": "location",
            }
            url = f"{base}/feed.rss"
        return SiteConfig(
            site_id=f"{strategy}-{i:04d}",
            name=base,
            url=url,
            strategy=strategy,
            pages_to_crawl=pages,
            start_point=1,
            follow_link=follow,
            two_hop=two_hop,
            inner_link_tag=".inner-desc",
            elements_path=elements,
            politeness_rps=rps,
            jobs_per_page=self.p.jobs_per_page,
        )

    def config_rows(self) -> list[dict]:
        return [s.to_row() for s in self.sites]

    def site_span(self) -> int:
        """Global-seq stride between consecutive sites: larger than any
        site-local seq, so ``gseq = rank·span + seq`` orders first by
        site config order — the oracle's sequential processing order."""
        mx = 1
        for s in self.sites:
            stride = 2 * s.jobs_per_page + 2
            mx = max(mx, (s.pages_to_crawl + 1) * stride)
        return mx

    # -- job synthesis ---------------------------------------------------
    def _job_id(self, site_idx: int, page: int, slot: int) -> str:
        h = hash64(f"{self.p.seed}|dup|{site_idx}|{page}|{slot}")
        # ~10% of slots on page>1 re-list the previous page's job → dedup
        if page > 1 and h % 10 == 7:
            page = page - 1
        return f"j{site_idx:04d}x{page}x{slot}"

    def _job_fields(self, site_idx: int, jid: str) -> dict:
        h = hash64(f"{self.p.seed}|job|{site_idx}|{jid}")
        title = f"{_LEVELS[h % 5]} {_ROLES[h % 6]} {jid}"
        if h % 7 == 0:
            title = f"<b>{title}</b> {{urgent}}"
        loc = _LOCATIONS[h % len(_LOCATIONS)]
        short = f"Short pitch for {jid}: great team, USD100-200/yr"
        detail = (
            f"<p>Full description for {jid}.</p> We offer <i>flexibility</i> "
            f"and camelCase perks, posted 2024-03-15, the the salary is "
            f"GBP90-180/yr. 'Apply' now [fast]."
        )
        return {"title": title, "location": loc, "short": short, "detail": detail}

    def _detail_status(self, site_idx: int, jid: str) -> int:
        h = hash64(f"{self.p.seed}|status|{site_idx}|{jid}")
        if h % 100 < self.p.fail_pct:
            return 403 if h % 2 == 0 else 500
        return 200

    def host_blocked(self, host: str) -> bool:
        if host not in self.by_host:
            return False
        h = hash64(f"{self.p.seed}|robots|{host}")
        return (h % 100) < self.p.blocked_pct

    # -- payload generation ---------------------------------------------
    def fetch(self, url: str) -> tuple[int, bytes]:
        """(status, payload) for any URL in the universe; unknown → 404."""
        if "://" not in url:
            return 404, b""
        rest = url.split("://", 1)[1]
        host, _, path = rest.partition("/")
        host = host.lower()
        if host not in self.by_host:
            return 404, b""
        i = self.by_host[host]
        site = self.sites[i]
        path = "/" + path
        if path == "/robots.txt":
            if self.host_blocked(host):
                return 200, b"User-agent: *\nDisallow: /\n"
            return 200, b"User-agent: *\nDisallow: /private/\n"
        if path.startswith("/list?page="):
            page = int(path.rsplit("=", 1)[1])
            return 200, self._listing_html(i, page).encode()
        if path.startswith("/api?page="):
            page = int(path.rsplit("=", 1)[1])
            return 200, self._listing_json(i, page).encode()
        if path == "/feed.rss":
            return 200, self._listing_rss(i).encode()
        if path.startswith("/jobs/") and path.endswith("/image"):
            jid = path[len("/jobs/") : -len("/image")]
            return 200, self._image_bytes(i, jid)
        if path.startswith("/jobs/") and path.endswith("/full"):
            jid = path[len("/jobs/") : -len("/full")]
            f = self._job_fields(i, jid)
            body = (
                f"<html><body>Full posting for {jid}. {f['detail']} "
                f"Contact: jobs@{host}</body></html>"
            )
            return 200, body.encode()
        if path.startswith("/jobs/"):
            jid = path[len("/jobs/") :]
            status = self._detail_status(i, jid)
            if status != 200:
                return status, b""
            f = self._job_fields(i, jid)
            if site.two_hop:
                body = (
                    f'<html><body><p>See full posting</p>'
                    f'<a class="apply" href="/jobs/{jid}/full/apply">apply</a></body></html>'
                )
            else:
                body = (
                    f'<html><body><div class="inner-desc">{f["detail"]}</div>'
                    f'<a class="imglink" href="/jobs/{jid}/image">img</a></body></html>'
                )
            return 200, body.encode()
        return 404, b""

    def _slots(self, i: int, page: int) -> list[tuple[str, dict]]:
        out = []
        for s in range(self.p.jobs_per_page):
            jid = self._job_id(i, page, s)
            out.append((jid, self._job_fields(i, jid)))
        return out

    def _listing_html(self, i: int, page: int) -> str:
        site = self.sites[i]
        slots = self._slots(i, page)
        if site.strategy == "html_main":
            jobs = []
            for jid, f in slots:
                jobs.append(
                    f'<div class="job"><h2 class="title">{f["title"]}</h2>'
                    f'<a class="joblink" href="/jobs/{jid}">view</a>'
                    f'<span class="location">{f["location"]}</span>'
                    f'<p class="desc">{f["short"]}</p></div>'
                )
            return "<html><body>" + "".join(jobs) + "</body></html>"
        # container: parallel column lists inside one board div
        titles = "".join(f'<h2 class="title">{f["title"]}</h2>' for _, f in slots)
        links = "".join(
            f'<a class="joblink" href="/jobs/{jid}">view</a>' for jid, _ in slots
        )
        descs = "".join(f'<p class="desc">{f["short"]}</p>' for _, f in slots)
        locs = "".join(
            f'<span class="location">{f["location"]}</span>' for _, f in slots
        )
        return (
            '<html><body><div class="board">'
            + titles
            + links
            + descs
            + locs
            + "</div></body></html>"
        )

    def _listing_json(self, i: int, page: int) -> str:
        site = self.sites[i]
        entries = []
        for jid, f in self._slots(i, page):
            h = hash64(f"{self.p.seed}|apiloc|{i}|{jid}")
            e = {
                "title": f["title"],
                "url": f"{site.name}/jobs/{jid}",
                "description": f["short"],
                "created_at": "2024-03-15",
            }
            if h % 11 != 3:  # ~9% omit location → location_default fallback
                e["location"] = f["location"]
            entries.append(e)
        if site.strategy == "api_dict":
            return json.dumps({"result": entries, "total": len(entries)})
        return json.dumps(entries)

    def _listing_rss(self, i: int) -> str:
        site = self.sites[i]
        items = []
        for jid, f in self._slots(i, 1):
            h = hash64(f"{self.p.seed}|rssloc|{i}|{jid}")
            missing = self.p.rss_missing_loc and h % 13 == 5
            loc = (
                f"<location>{f['location']}</location>" if not missing else ""
            )  # missing attr → the reference's hasattr quirk
            items.append(
                f"<item><title>{f['title']}</title>"
                f"<link>{site.name}/jobs/{jid}</link>"
                f"<description>{f['short']}</description>{loc}</item>"
            )
        return (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            + "".join(items)
            + "</channel></rss>"
        )

    def _image_meta(self, i: int, jid: str) -> tuple[int, int, int, str]:
        h = hash64(f"{self.p.seed}|img|{i}|{jid}")
        span = self.p.img_max - self.p.img_min + 1
        w = self.p.img_min + (h % span)
        ih = self.p.img_min + ((h >> 8) % span)
        fmt = _FMT_CYCLE[h % 3]
        return h, w, ih, fmt

    def image_pixels(self, i: int, jid: str):
        h, w, ih, _ = self._image_meta(i, jid)
        return codecs.gen_pixels(h, w, ih)

    def _image_bytes(self, i: int, jid: str) -> bytes:
        h, w, ih, fmt = self._image_meta(i, jid)
        return codecs.encode(codecs.gen_pixels(h, w, ih), fmt)
