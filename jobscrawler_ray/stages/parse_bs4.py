"""bs4-backed parse operators (import-guarded registry extension).

The built-in ``mini_select`` engine handles well-formed markup with
nested same-tag elements (tag-balance scan), but real pages need a
forgiving parser. The reference uses ``BeautifulSoup(html, "lxml")``
(``src/crawlers/async_bs4.py:330``). When bs4 is importable this module
registers drop-in strategies through the same ``PARSER_REGISTRY`` seam
(§2.10 extension surface) under the SAME strategy names semantics:
call ``register()`` to override ``html_main`` / ``html_container`` with
the bs4 implementations, or use the ``*_bs4`` names side by side.

bs4 is absent in this sandbox — ``HAVE_BS4`` is False and ``register``
raises with a clear message; the registry seam itself is covered by
tests either way.
"""

from __future__ import annotations

from .parse import PARSER_REGISTRY

try:  # pragma: no cover - bs4 absent in this sandbox
    from bs4 import BeautifulSoup  # type: ignore

    HAVE_BS4 = True
except Exception:
    BeautifulSoup = None
    HAVE_BS4 = False


def _soup(payload: str):  # pragma: no cover - needs bs4
    # lxml when present (reference parity), else the stdlib parser
    try:
        return BeautifulSoup(payload, "lxml")
    except Exception:
        return BeautifulSoup(payload, "html.parser")


def parse_html_main_bs4(payload: str, elements_path: dict, name: str) -> list[dict]:  # pragma: no cover
    ep = elements_path
    soup = _soup(payload)
    jobs = soup.select(ep["jobs_path"])
    if not jobs:
        raise ValueError(f"No jobs found with selector {ep['jobs_path']}")
    out = []
    for job in jobs:
        title_el = job.select_one(ep["title_path"])
        if title_el is None:
            raise ValueError(f"No titles found with selector {ep['title_path']}")
        link_el = job.select_one(ep["link_path"])
        if link_el is None:
            raise ValueError(f"No links found with selector {ep['link_path']}")
        desc_el = job.select_one(ep["description_path"])
        loc_el = job.select_one(ep["location_path"])
        out.append({
            "title": title_el.get_text(),
            # reference indexes link_element["href"] directly
            # (async_bs4.py:152): a missing href raises KeyError, which
            # surfaces as a parse-error row — never a fake '.../None' URL
            "link": name + link_el["href"],
            "description": desc_el.get_text() if desc_el else "NaN",
            "location": loc_el.get_text() if loc_el else "NaN",
        })
    return out


def parse_html_container_bs4(payload: str, elements_path: dict, name: str) -> list[dict]:  # pragma: no cover
    ep = elements_path
    soup = _soup(payload)
    container = soup.select_one(ep["jobs_path"])
    if container is None:
        raise ValueError(f"No elements found for 'container' {ep['jobs_path']}")
    cols = {
        "title": container.select(ep["title_path"]),
        "link": container.select(ep["link_path"]),
        "description": container.select(ep["description_path"]),
        "location": container.select(ep["location_path"]),
    }
    for key, els in cols.items():
        if not els:
            raise ValueError(f"No elements found for '{key}'")
    out = []
    # positional zip — the reference's column-alignment semantics
    for t, l, d, loc in zip(cols["title"], cols["link"],
                            cols["description"], cols["location"]):
        out.append({
            "title": t.get_text().strip() or "NaN",
            "link": name + (l.get("href") or "NaN"),
            "description": d.get_text().strip() or "NaN",
            "location": loc.get_text().strip() or "NaN",
        })
    return out


def register(override: bool = False) -> list[str]:
    """Register the bs4 strategies into PARSER_REGISTRY. With
    ``override=True`` they replace the regex engine under the stock
    names (what a real deployment wants); otherwise they sit alongside
    as ``*_bs4``. Returns the registered names."""
    if not HAVE_BS4:
        raise ImportError(
            "bs4 is not installed — the built-in mini_select engine stays "
            "active (install beautifulsoup4+lxml and call register())"
        )
    names = []  # pragma: no cover - needs bs4
    for base, fn in (("html_main", parse_html_main_bs4),
                     ("html_container", parse_html_container_bs4)):
        key = base if override else f"{base}_bs4"
        PARSER_REGISTRY[key] = fn
        names.append(key)
    return names
