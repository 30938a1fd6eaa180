"""Parse operators (SURVEY.md §2.2 M1-M6, §2.10 registry).

Pluggable parse operators for the three source families the reference
supports — HTML-selector (main + container zip semantics,
``src/crawlers/async_bs4.py:96-272``), API-JSON (dict/list shapes,
``src/crawlers/async_api.py:69-154``), RSS
(``src/crawlers/async_rss.py:19-71``) — plus the follow-link detail
parser (``src/utils/FollowLink.py:8-39``).

bs4/feedparser are not installed in this sandbox, so HTML/RSS parsing is
a minimal class-attribute selector engine. Element extents are found by
a tag-balance scan (nested same-tag elements are handled correctly, and
nested matching elements are all returned — bs4 ``select`` semantics);
the remaining assumption is well-formed markup (every open tag closed).
A real deployment would register bs4-backed operators through the same
``PARSER_REGISTRY`` seam — the registry is the user-extension surface
(reference: ``async_bs4.py:301-304`` strategy_map).

Faithful quirks preserved (and asserted by the conformance oracle):
- container strategy zips parallel column selects positionally
  (``async_bs4.py:240``).
- API ``location`` falls back to ``location_default`` when the key is
  missing OR falsy (``async_api.py:140-143``).
- RSS guards title/link/description on ``hasattr(entry, location_tag)``
  — entries missing the location field yield all-"NaN" records
  (``async_rss.py:36-63``).

Documented divergence from the reference: parse errors are isolated per
record/page (error rows → metrics sink) instead of aborting the whole
site batch (SURVEY.md §4 "error isolation").
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

_TAG_STRIP = re.compile(r"<[^>]+>")
_HREF = re.compile(r'href="([^"]*)"')
_SELECTOR_CACHE: dict[str, re.Pattern] = {}


@dataclass
class Element:
    tag: str
    attrs: str
    inner: str

    @property
    def text(self) -> str:
        return _TAG_STRIP.sub("", self.inner)

    @property
    def href(self) -> str | None:
        m = _HREF.search(self.attrs)
        return m.group(1) if m else None


_TAG_SCAN_CACHE: dict[str, re.Pattern] = {}


def _pattern_for(selector: str) -> re.Pattern:
    """Opening tags whose class attribute contains the selector's class."""
    cls = re.escape(selector.lstrip("."))
    pat = _SELECTOR_CACHE.get(cls)
    if pat is None:
        pat = re.compile(
            rf'<(\w+)((?=[^>]*class="[^"]*(?<![\w-]){cls}(?![\w-])[^"]*")[^>]*)>'
        )
        _SELECTOR_CACHE[cls] = pat
    return pat


def _tag_scan(tag: str) -> re.Pattern:
    pat = _TAG_SCAN_CACHE.get(tag)
    if pat is None:
        pat = re.compile(rf'<{tag}\b[^>]*>|</{tag}\s*>')
        _TAG_SCAN_CACHE[tag] = pat
    return pat


def _balanced_end(html: str, tag: str, start: int) -> int:
    """Start index of the close tag matching the open tag that ends at
    ``start``, counting nested same-tag opens (a plain ``.*?</tag>``
    regex would truncate at the first close and mangle nested markup).
    Self-closing ``<tag .../>`` doesn't nest. -1 if unbalanced."""
    depth = 1
    for t in _tag_scan(tag).finditer(html, start):
        tok = t.group(0)
        if tok.startswith("</"):
            depth -= 1
            if depth == 0:
                return t.start()
        elif not tok.endswith("/>"):
            depth += 1
    return -1


def mini_select(html: str, selector: str) -> list[Element]:
    """All elements whose class attribute contains the selector's class
    (including elements nested inside other matches — bs4 semantics)."""
    out = []
    for m in _pattern_for(selector).finditer(html):
        end = _balanced_end(html, m.group(1), m.end())
        if end >= 0:
            out.append(Element(m.group(1), m.group(2), html[m.end():end]))
    return out


def mini_select_one(html: str, selector: str) -> Element | None:
    m = _pattern_for(selector).search(html)
    if m is None:
        return None
    end = _balanced_end(html, m.group(1), m.end())
    return Element(m.group(1), m.group(2), html[m.end():end]) if end >= 0 else None


# --------------------------------------------------------------------------
# Listing parsers: payload -> list of candidate dicts in DOM order.
# Candidate keys: title, link (absolutized), location, description (default).
# --------------------------------------------------------------------------


def parse_html_main(payload: str, elements_path: dict, name: str) -> list[dict]:
    ep = elements_path
    jobs = mini_select(payload, ep["jobs_path"])
    if not jobs:
        raise ValueError(f"No jobs found with selector {ep['jobs_path']}")
    out = []
    for job in jobs:
        title_el = mini_select_one(job.inner, ep["title_path"])
        if title_el is None:
            raise ValueError(f"No titles found with selector {ep['title_path']}")
        link_el = mini_select_one(job.inner, ep["link_path"])
        if link_el is None:
            raise ValueError(f"No links found with selector {ep['link_path']}")
        desc_el = mini_select_one(job.inner, ep["description_path"])
        loc_el = mini_select_one(job.inner, ep["location_path"])
        out.append(
            {
                "title": title_el.text,
                "link": name + str(link_el.href),
                "description": desc_el.text if desc_el else "NaN",
                "location": loc_el.text if loc_el else "NaN",
            }
        )
    return out


def parse_html_container(payload: str, elements_path: dict, name: str) -> list[dict]:
    ep = elements_path
    container = mini_select_one(payload, ep["jobs_path"])
    if container is None:
        raise ValueError(f"No elements found for 'container' {ep['jobs_path']}")
    cols = {
        "title": mini_select(container.inner, ep["title_path"]),
        "link": mini_select(container.inner, ep["link_path"]),
        "description": mini_select(container.inner, ep["description_path"]),
        "location": mini_select(container.inner, ep["location_path"]),
    }
    for key, els in cols.items():
        if not els:
            raise ValueError(f"No elements found for '{key}'")
    out = []
    # positional zip — the reference's column-alignment semantics
    for t, l, d, loc in zip(cols["title"], cols["link"], cols["description"], cols["location"]):
        out.append(
            {
                "title": t.text.strip() or "NaN",
                "link": name + (l.href or "NaN"),
                "description": d.text.strip() or "NaN",
                "location": loc.text.strip() or "NaN",
            }
        )
    return out


def parse_api_json(payload: str, elements_path: dict, name: str, class_json: str) -> list[dict]:
    data = json.loads(payload)
    ep = elements_path
    if class_json == "dict":
        jobs = data[ep["dict_tag"]]
    elif class_json == "list":
        jobs = data
    else:
        raise ValueError("The class json is unknown.")
    out = []
    for job in jobs:
        out.append(
            {
                "title": job.get(ep["title_tag"], "NaN"),
                "link": job.get(ep["link_tag"], "NaN"),
                "description": job.get(ep["description_tag"], "NaN"),
                "location": job.get(ep["location_tag"], "NaN") or ep["location_default"],
            }
        )
    return out


_RSS_ITEM = re.compile(r"<item>(.*?)</item>", re.DOTALL)


def _rss_field(item: str, tag: str) -> str | None:
    m = re.search(rf"<{re.escape(tag)}>(.*?)</{re.escape(tag)}>", item, re.DOTALL)
    return m.group(1) if m else None


def parse_rss(payload: str, elements_path: dict, name: str) -> list[dict]:
    ep = elements_path
    out = []
    for m in _RSS_ITEM.finditer(payload):
        item = m.group(1)
        has_loc = _rss_field(item, ep["location_tag"]) is not None
        # the reference guards every field on hasattr(entry, location_tag)
        out.append(
            {
                "title": (_rss_field(item, ep["title_tag"]) or "NaN") if has_loc else "NaN",
                "link": (_rss_field(item, ep["link_tag"]) or "NaN") if has_loc else "NaN",
                "description": (_rss_field(item, ep["description_tag"]) or "NaN")
                if has_loc
                else "NaN",
                "location": (_rss_field(item, ep["location_tag"]) or "NaN") if has_loc else "NaN",
            }
        )
    return out


def parse_detail(payload: str, status: int, inner_link_tag: str, default: str) -> str:
    """Follow-link semantics: 200 + tag found → replace description; any
    other status or missing tag → default (``FollowLink.py:20-39``)."""
    if status != 200:
        return default
    el = mini_select_one(payload, inner_link_tag)
    return el.text if el is not None else default


def parse_detail_title_description(
    payload: str, status: int, inner_link_tag: str, title_inner_link_tag: str,
    default: str,
) -> tuple[str, str]:
    """M9 (``FollowLink.py:42-72``): follow-link variant returning both
    title and description from the followed page; unused by the main
    path in the reference, exposed here for registry parity."""
    if status != 200:
        return default, default
    t = mini_select_one(payload, title_inner_link_tag)
    d = mini_select_one(payload, inner_link_tag)
    return (t.text if t else default), (d.text if d else default)


_APPLY_SUFFIX = re.compile(r"/apply$")


def parse_apply_link(payload: str, status: int, apply_selector: str = ".apply") -> str | None:
    """M10 first hop (``AsyncFollowTwoLinks.py:12-60``): find the apply
    link on the detail page and strip the trailing ``/apply`` — the
    result is the URL whose whole-page text becomes the description."""
    if status != 200:
        return None
    el = mini_select_one(payload, apply_selector)
    if el is None or not el.href:
        return None
    return _APPLY_SUFFIX.sub("", el.href)


def whole_page_text(payload: str, status: int, default: str) -> str:
    """M10 second hop: the stripped-URL page's full text (tag-stripped)."""
    if status != 200:
        return default
    return _TAG_STRIP.sub("", payload)


ListingParser = "Callable[(payload, elements_path, name, class_json?) -> list[dict]]"

PARSER_REGISTRY = {
    "html_main": lambda payload, ep, name: parse_html_main(payload, ep, name),
    "html_container": lambda payload, ep, name: parse_html_container(payload, ep, name),
    "api_dict": lambda payload, ep, name: parse_api_json(payload, ep, name, "dict"),
    "api_list": lambda payload, ep, name: parse_api_json(payload, ep, name, "list"),
    "rss": lambda payload, ep, name: parse_rss(payload, ep, name),
}


def parse_listing(payload: str, strategy: str, elements_path: dict, name: str) -> list[dict]:
    fn = PARSER_REGISTRY.get(strategy)
    if fn is None:
        raise ValueError(f"Unknown strategy {strategy!r}")
    return fn(payload, elements_path, name)
