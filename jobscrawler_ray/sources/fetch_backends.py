"""Pluggable fetch backends (S2: the reference's HTTP stack seam).

The engine fetches through one seam: ``backend.fetch(url) -> (status,
payload_bytes)``. The deterministic synthetic world implements it for
tests/benches; ``HttpFetcher`` is the real-network backend mirroring
the reference's client behavior:

- rotating User-Agent pool, one pick per request
  (``src/constants.py:2-18``, picked at ``src/crawler.py:309``)
- non-200 responses return their body instead of raising
  (``src/crawler.py:313-317`` passes the body through so parse-time
  defaults apply)
- one session per actor/process, reused across requests
  (``src/crawler.py:369-370`` keeps one aiohttp session per engine)

This sandbox has no network, so ``HttpFetcher`` is import-guarded and
exercised only at the contract level (UA rotation, interface shape);
swapping it in is ``CrawlConfig``-level wiring, not an engine change.
"""

from __future__ import annotations

import itertools
from typing import Protocol

# Public, generic browser UA strings (not copied from the reference's
# pool — any standard UA list works; the behavior under test is the
# rotation, not the strings).
USER_AGENTS: list[str] = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 "
    "Firefox/121.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
]


class FetchBackend(Protocol):
    def fetch(self, url: str) -> tuple[int, bytes]: ...


class SyntheticFetcher:
    """The deterministic world as a backend (tests/benches)."""

    def __init__(self, world_params):
        from ..synth.world import World

        self.world = World(world_params)

    def fetch(self, url: str) -> tuple[int, bytes]:
        return self.world.fetch(url)


class UserAgentPool:
    """Deterministic round-robin UA rotation (the reference picks
    randomly; round-robin gives the same anti-blocking spread while
    keeping replays reproducible)."""

    def __init__(self, agents: list[str] | None = None):
        self.agents = list(agents or USER_AGENTS)
        self._it = itertools.cycle(self.agents)

    def next(self) -> str:
        return next(self._it)


class ProxyPool:
    """Deterministic round-robin proxy rotation (S11: the reference
    scrapes a free-proxy list into a rotating pool —
    ``src/resources/proxies/GetProxies.py:1-19``; here the pool is a
    config-time list and the engine concern is the per-request
    rotation). One pre-built opener per proxy — installing a
    ProxyHandler per request would rebuild connection state every
    fetch."""

    def __init__(self, proxies: list[str]):
        import urllib.request

        if not proxies:
            raise ValueError("ProxyPool needs at least one proxy URL")
        self.proxies = list(proxies)
        self._openers = itertools.cycle([
            urllib.request.build_opener(
                urllib.request.ProxyHandler({"http": p, "https": p}))
            for p in self.proxies
        ])

    def next_opener(self):
        return next(self._openers)


class HttpFetcher:
    """Real-network backend: stdlib urllib with a per-instance opener
    (one instance per actor/process = session reuse), UA rotation,
    optional per-request proxy rotation (S11), and non-200 body
    passthrough. Instantiable only when a network stack is
    meaningful — guarded so the sandbox never constructs it by accident.
    """

    def __init__(self, timeout: float = 30.0,
                 agents: list[str] | None = None,
                 proxies: list[str] | None = None,
                 allow_network: bool = False):
        if not allow_network:
            raise RuntimeError(
                "HttpFetcher requires allow_network=True (no network in "
                "this sandbox; use SyntheticFetcher)"
            )
        import urllib.request

        self.timeout = timeout
        self.ua = UserAgentPool(agents)
        self.proxies = ProxyPool(proxies) if proxies else None
        self.opener = urllib.request.build_opener()  # pragma: no cover

    def _opener(self):
        return self.proxies.next_opener() if self.proxies else self.opener

    def fetch(self, url: str) -> tuple[int, bytes]:  # pragma: no cover
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": self.ua.next()})
        try:
            with self._opener().open(req, timeout=self.timeout) as resp:
                return int(resp.status), resp.read()
        except urllib.error.HTTPError as e:
            # reference behavior: non-200 bodies pass through so the
            # parse stage applies its defaults (src/crawler.py:313-317)
            return int(e.code), e.read() or b""
        except urllib.error.URLError:
            return 0, b""


class BrowserFetcher:
    """Browser-rendered backend (S7): the reference keeps a fully
    written-but-disabled Selenium crawler (``src/crawlers/async_sel.py:
    1-296``) whose semantics are: navigate, let the engine render, hand
    the rendered DOM's HTML to the SAME bs4 main/container strategies.
    This seam mirrors that: ``fetch`` navigates a driver and returns
    ``(200, page_source_bytes)`` so the downstream parse operators are
    identical to the HTTP path's.

    ``driver_factory`` is injectable for tests (any object with
    ``get(url)``, ``page_source`` and ``quit()``); without one, a real
    Selenium driver is constructed lazily and import-guarded — this
    sandbox has neither selenium nor a browser, so construction raises
    a clear error rather than failing mid-crawl."""

    def __init__(self, driver_factory=None, allow_browser: bool = False):
        if driver_factory is None and not allow_browser:
            raise RuntimeError(
                "BrowserFetcher requires allow_browser=True or an "
                "injected driver_factory (no browser in this sandbox)"
            )
        self._factory = driver_factory or self._selenium_factory
        self._driver = None

    @staticmethod
    def _selenium_factory():  # pragma: no cover — no browser in sandbox
        try:
            from selenium import webdriver
        except ImportError as e:
            raise RuntimeError(
                "BrowserFetcher needs the selenium package (reference: "
                "src/crawlers/async_sel.py uses webdriver.Chrome)"
            ) from e
        opts = webdriver.ChromeOptions()
        opts.add_argument("--headless=new")
        return webdriver.Chrome(options=opts)

    def _ensure(self):
        # one browser per actor/process — the reference reuses one
        # driver across a site's pages (async_sel.py session shape)
        if self._driver is None:
            self._driver = self._factory()
        return self._driver

    def fetch(self, url: str) -> tuple[int, bytes]:
        # construction failures (selenium/Chrome absent) must surface
        # loudly, not degrade into empty fetches — keep _ensure OUTSIDE
        # the navigation try
        d = self._ensure()
        try:
            d.get(url)
            html = d.page_source
            return 200, html.encode("utf-8", "replace")
        except Exception:
            # navigation/render failure ≈ connection failure in the
            # HTTP backend: (0, b"") lets parse-time defaults apply
            return 0, b""

    def close(self) -> None:
        if self._driver is not None:
            try:
                self._driver.quit()
            finally:
                self._driver = None


FETCH_BACKENDS = {
    "synthetic": SyntheticFetcher,
    "http": HttpFetcher,
    "browser": BrowserFetcher,
}
