"""The shared string-normalization pipeline (SURVEY.md §2.2 M11).

Faithful re-expression of the reference's three near-identical pandas
cleaners — ``clean_postgre_bs4`` (``src/crawlers/async_bs4.py:39-94``),
``clean_postgre_api`` (``src/crawlers/async_api.py:30-67``),
``clean_postgre_rss`` (``src/crawlers/async_rss.py:75-101``) — as one
vectorized transform with a per-strategy column mask:

- bs4: ``title`` and ``description`` get the HTML/char strip; ``location``
  gets the full chain.
- api / rss: ``description`` gets the strip; ``location`` the full chain.
- rss / bs4 additionally ``drop_duplicates()`` full-row first (handled by
  the caller; see pipelines/crawl.py exact-dedup stage).

The repeated-word regex ``\\b(\\w+)\\s+\\1\\b`` uses a backreference —
not expressible in RE2/pyarrow.compute — so this stage is Python ``re``
over a list of strings (still vectorized at the batch level: one
compiled-pattern pass per column, no per-row Python dispatch beyond
``re.sub``). Benchmark note: ~1 µs/short-string per pattern; fine for the
caption column, and the chain is applied once per record, not per wave.
"""

from __future__ import annotations

import re

_STRIP_HTML_CHARS = re.compile(r'<.*?>|[{}[\]\'",]')
_REPEATED_WORD = re.compile(r"\b(\w+)\s+\1\b")
_ISO_DATE = re.compile(r"\d{4}-\d{2}-\d{2}")
_SALARY = re.compile(r"(USD|GBP)\d+-\d+/yr")
_DASH_SLASH = re.compile(r"[-/]")
_CAMEL_BOUNDARY = re.compile(r"(?<=[a-z])(?=[A-Z])")
_REMOTE_PHRASES = re.compile(
    r"(?i)\bRemote Job\b|\bRemote Work\b|\bRemote Office\b|\bRemote Global\b|"
    r"\bRemote with frequent travel\b"
)
_REMOTE_EXACT = re.compile(r"(?i)^remote$")

# which columns each strategy family cleans (reference column masks)
CLEAN_COLUMNS = {
    "html_main": ("title", "description", "location"),
    "html_container": ("title", "description", "location"),
    "api_dict": ("description", "location"),
    "api_list": ("description", "location"),
    "rss": ("description", "location"),
}


def strip_html_chars(values: list[str]) -> list[str]:
    """The light cleaner applied to title/description columns."""
    return [_STRIP_HTML_CHARS.sub("", str(v)) for v in values]


def clean_location(values: list[str]) -> list[str]:
    """The full location chain, in the reference's exact order."""
    out = []
    for v in values:
        s = _STRIP_HTML_CHARS.sub("", str(v))
        s = _REPEATED_WORD.sub(r"\1", s)
        s = _ISO_DATE.sub("", s)
        s = _SALARY.sub("", s)
        s = _DASH_SLASH.sub(" ", s)
        s = _CAMEL_BOUNDARY.sub(" ", s)
        s = _REMOTE_PHRASES.sub("Worldwide", s)
        s = _REMOTE_EXACT.sub("Worldwide", s)
        out.append(s.strip())
    return out


def clean_record_columns(
    cols: dict[str, list[str]], strategy: str
) -> dict[str, list[str]]:
    """Apply the per-strategy column mask to a column-dict. Returns only
    the cleaned columns (caller merges)."""
    mask = CLEAN_COLUMNS[strategy]
    out: dict[str, list[str]] = {}
    for name in mask:
        if name not in cols:
            continue
        if name == "location":
            out[name] = clean_location(cols[name])
        else:
            out[name] = strip_html_chars(cols[name])
    return out


def clean_caption(values: list[str]) -> list[str]:
    """Caption for the image table = the description after its strategy
    clean. Captions come from the description column, whose cleaner is
    the same for every strategy family."""
    return strip_html_chars(values)
