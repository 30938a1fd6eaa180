"""Per-host politeness: token buckets + robots.txt caches (north_rule).

The reference's only anti-blocking measures are a rotating User-Agent
pool (``src/constants.py:2-18``, picked at ``src/crawler.py:309``) and
commented-out random sleeps (``src/utils/FollowLink.py:105-109``). The
engine replaces them with explicit per-host token buckets and a robots
cache, held in a pool of shard actors addressed by
``hash64(host) % num_shards`` — the same host-hash partitioning as the
seen set, so a hot host's politeness state lives on exactly one actor.

Determinism: buckets refill per *wave tick*, not per wall-clock second,
so a conformance run at any parallelism grants the same per-host fetch
budget in the same order (the caller sorts each host's rows by priority
before asking). Robots verdicts come from fetching ``/robots.txt``
through the same deterministic fetch seam, once per host, cached for
the actor's lifetime.
"""

from __future__ import annotations

import ray

from ..synth.world import World, WorldParams


def _robots_disallows_all(payload: bytes) -> bool:
    """Minimal robots.txt evaluation: a bare ``Disallow: /`` under
    ``User-agent: *`` blocks the host. (Path-level rules beyond "/" are
    honored as allow-all here; the synthetic world only emits the two
    forms.)"""
    ua_all = False
    for line in payload.decode("utf-8", "replace").splitlines():
        line = line.strip()
        if line.lower().startswith("user-agent:"):
            ua_all = line.split(":", 1)[1].strip() == "*"
        elif ua_all and line.lower().startswith("disallow:"):
            if line.split(":", 1)[1].strip() == "/":
                return True
    return False


class _PolitenessShard:
    """One shard of politeness state. Run as a Ray actor.

    Shuffle-free admission protocol (per wave):

    1. ``offer(wave, demand)`` — each map task sends, for each of its
       hosts, the total row count + the smallest ``cap+1`` priorities it
       holds. Offers are commutative (distributed top-k merge), so task
       order doesn't matter.
    2. ``finalize(wave)`` — the driver triggers the token-bucket grant:
       per host, ``k = min(count, ⌊tokens⌋)`` and the admission
       *threshold* = k-th smallest offered priority (priorities are
       unique per host, so exactly k rows pass). Robots-blocked hosts
       get the BLOCK sentinel. Tokens are debited here, once per wave.
    3. ``thresholds(wave)`` — read-only lookup, cached per worker
       process, used by the fetch stage to label rows
       allow/defer/block with a vectorized comparison.

    This replaces a groupby(host)-shuffle gate: the actor only ever sees
    O(hosts × cap) integers per wave, not the frontier rows.
    """

    BLOCK = -2

    def __init__(self, world_params: WorldParams):
        self.world = World(world_params)
        self.tokens: dict[str, float] = {}
        self.robots_blocked: dict[str, bool] = {}
        self.last_wave: dict[str, int] = {}
        # per-wave accumulation
        self._counts: dict[str, int] = {}
        self._prios: dict[str, list[int]] = {}
        self._rates: dict[str, float] = {}
        self._thresholds: dict[str, int] = {}
        self._final_wave: int = -1
        self._offer_ids: dict[int, int] = {}  # offer_id -> wave offered for

    def _robots(self, host: str) -> bool:
        if host not in self.robots_blocked:
            status, payload = self.world.fetch(f"https://{host}/robots.txt")
            self.robots_blocked[host] = status == 200 and _robots_disallows_all(payload)
        return self.robots_blocked[host]

    def warm_robots(self, hosts: list[str]) -> int:
        """Pre-fill the robots cache (fire-and-forget from the driver
        right after the seed is built) so wave-0 finalize doesn't pay
        the per-host robots fetches on the critical path; also forces
        the actor process to spawn while the driver writes seed files."""
        for h in hosts:
            self._robots(h)
        return len(hosts)

    def offer(self, wave: int, demand: dict[str, tuple[int, list[int], float]],
              offer_id: int | None = None) -> bool:
        """demand: host -> (count, smallest cap+1 priorities, rate).

        ``offer_id`` is a stable content hash of the offering task's rows:
        a retried/reconstructed Ray map task re-offers the same id and is
        ignored, keeping per-host counts and the top-k merge idempotent
        under task re-execution (offers are side effects inside map
        tasks). An offer for an ALREADY-FINALIZED wave is rejected
        outright: the driver only finalizes after the offering stage
        completed, so such an offer can only be a re-execution whose
        demand was already counted — applying it would double-count it
        into the NEXT wave's budget."""
        if wave <= self._final_wave:
            return False
        if offer_id is not None and offer_id in self._offer_ids:
            return False
        for host, (n, prios, rate) in demand.items():
            self._counts[host] = self._counts.get(host, 0) + int(n)
            cap = int(2 * rate) + 1
            merged = self._prios.get(host, [])
            merged.extend(prios)
            merged.sort()
            self._prios[host] = merged[: cap + 1]
            self._rates[host] = float(rate)
        # record the id only after the demand loop fully applied, so an
        # exception mid-loop can't leave a half-applied offer marked done
        if offer_id is not None:
            self._offer_ids[offer_id] = wave
        return True

    def finalize(self, wave: int) -> int:
        """Grant tokens and compute thresholds; returns #hosts granted."""
        out: dict[str, int] = {}
        for host, n in self._counts.items():
            if self._robots(host):
                out[host] = self.BLOCK
                continue
            rate = self._rates.get(host, 8.0)
            cap = 2.0 * rate
            last = self.last_wave.get(host)
            tok = self.tokens.get(host, cap)
            if last is not None and wave > last:
                tok = min(cap, tok + rate * (wave - last))
            k = min(n, int(tok))
            self.tokens[host] = tok - k
            self.last_wave[host] = wave
            prios = self._prios.get(host, [])
            out[host] = prios[k - 1] if k > 0 and k <= len(prios) else (
                prios[-1] if k > len(prios) and prios else -1
            )
            if k >= n:  # everything admitted — use an open threshold
                out[host] = (1 << 62)
        self._thresholds = out
        self._final_wave = wave
        self._counts, self._prios, self._rates = {}, {}, {}
        # ids offered for waves ≤ this finalize can never be applied again
        # (offer() rejects finalized waves before the id matters), so the
        # retained set stays bounded by the in-flight waves only
        self._offer_ids = {k: w for k, w in self._offer_ids.items() if w > wave}
        return len(out)

    def thresholds(self, wave: int) -> dict[str, int]:
        assert wave == self._final_wave, f"thresholds for wave {wave} not finalized"
        return self._thresholds

    def state(self) -> dict:
        return {
            "tokens": dict(self.tokens),
            "last_wave": dict(self.last_wave),
            "robots_blocked": dict(self.robots_blocked),
        }

    def load_state(self, st: dict) -> None:
        self.tokens = dict(st["tokens"])
        self.last_wave = dict(st["last_wave"])
        self.robots_blocked = dict(st["robots_blocked"])


PolitenessShard = ray.remote(num_cpus=0)(_PolitenessShard)


class PolitenessPool:
    def __init__(self, num_shards: int, world_params: WorldParams):
        self.num_shards = num_shards
        self.shards = [PolitenessShard.remote(world_params) for _ in range(num_shards)]

    def handles(self) -> list:
        return list(self.shards)

    def warm_robots(self, hosts) -> None:
        """Async robots prefetch, routed by the same host-hash the
        offers use; NOT waited on — the per-caller actor queue orders it
        before the next finalize."""
        from ..functions.urlnorm import hash64

        by_shard: dict[int, list[str]] = {}
        for h in set(hosts):
            by_shard.setdefault(hash64(h) % self.num_shards, []).append(h)
        for s, hs in by_shard.items():
            self.shards[s].warm_robots.remote(hs)

    def finalize(self, wave: int) -> None:
        ray.get([s.finalize.remote(wave) for s in self.shards])

    def states(self) -> list[dict]:
        return ray.get([s.state.remote() for s in self.shards])

    def load_states(self, states: list[dict]) -> None:
        ray.get([s.load_state.remote(st) for s, st in zip(self.shards, states)])

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []
