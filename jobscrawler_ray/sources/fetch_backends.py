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


class HttpFetcher:
    """Real-network backend: stdlib urllib with a per-instance opener
    (one instance per actor/process = session reuse), UA rotation, and
    non-200 body passthrough. Instantiable only when a network stack is
    meaningful — guarded so the sandbox never constructs it by accident.
    """

    def __init__(self, timeout: float = 30.0,
                 agents: list[str] | None = None,
                 allow_network: bool = False):
        if not allow_network:
            raise RuntimeError(
                "HttpFetcher requires allow_network=True (no network in "
                "this sandbox; use SyntheticFetcher)"
            )
        import urllib.request

        self.timeout = timeout
        self.ua = UserAgentPool(agents)
        self.opener = urllib.request.build_opener()  # pragma: no cover

    def fetch(self, url: str) -> tuple[int, bytes]:  # pragma: no cover
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": self.ua.next()})
        try:
            with self.opener.open(req, timeout=self.timeout) as resp:
                return int(resp.status), resp.read()
        except urllib.error.HTTPError as e:
            # reference behavior: non-200 bodies pass through so the
            # parse stage applies its defaults (src/crawler.py:313-317)
            return int(e.code), e.read() or b""
        except urllib.error.URLError:
            return 0, b""


FETCH_BACKENDS = {
    "synthetic": SyntheticFetcher,
    "http": HttpFetcher,
}
