"""Incremental recrawl (pipelines/crawl.py run_recrawl).

The reference's only incremental path is DB conflict-skip on a full
re-run (src/crawler.py:172-244). run_recrawl is incremental for real:
re-seed listings stalest-first against an imported seen snapshot and
fetch only the delta. Assertions:

- unchanged world → zero new records/images (listing fetches only)
- evolved world (jobs_per_page 4→5 keeps all old job ids, adds one
  slot per page) → delta == full-crawl(B) − full-crawl(A) by url_sha1
- fetch budget rotates stalest-first across chained generations:
  disjoint budget sets, full listing coverage in ceil(n/budget) cycles
- budget=0 no-ops cleanly
"""

import glob
import json
import os

import duckdb
import pytest

from jobscrawler_ray.pipelines.crawl import CrawlConfig, run_crawl, run_recrawl
from jobscrawler_ray.synth.world import WorldParams

A = WorldParams(seed=5, n_sites=6, pages_per_site=2, jobs_per_page=4)
B = WorldParams(seed=5, n_sites=6, pages_per_site=2, jobs_per_page=5)
CFG = CrawlConfig(num_seen_shards=2, num_pol_shards=2)


def _record_shas(out_dir: str) -> set[str]:
    files = glob.glob(os.path.join(out_dir, "job_records", "*", "*.parquet"))
    if not files:
        return set()
    rows = duckdb.sql(
        f"SELECT DISTINCT url_sha1 FROM read_parquet({files!r}, union_by_name=true)"
    ).fetchall()
    return {r[0] for r in rows}


@pytest.fixture(scope="module")
def crawl_a(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("recrawl_base"))
    summary = run_crawl(A, out, CFG)
    return out, summary


class TestRecrawl:
    def test_unchanged_world_zero_delta(self, crawl_a, tmp_path):
        prior, _ = crawl_a
        out = str(tmp_path / "same")
        s = run_recrawl(A, prior, out, CFG)
        assert s["job_records"] == 0
        assert s["image_caption"] == 0
        assert s["recrawl_generation"] == 1
        assert s["listings_deferred"] == 0
        # seen set unchanged: nothing new was admitted
        assert s["seen_total"] == crawl_a[1]["seen_total"]

    def test_evolved_world_exact_delta(self, crawl_a, ray_session, tmp_path):
        prior, _ = crawl_a
        delta_dir = str(tmp_path / "delta")
        full_b_dir = str(tmp_path / "full_b")
        s = run_recrawl(B, prior, delta_dir, CFG)
        run_crawl(B, full_b_dir, CFG)
        expected = _record_shas(full_b_dir) - _record_shas(prior)
        got = _record_shas(delta_dir)
        assert got == expected
        assert s["job_records"] == len(expected) > 0

    def test_budget_rotates_stalest_first(self, crawl_a, ray_session, tmp_path):
        prior, _ = crawl_a
        fetched: list[set[str]] = []
        n_listings = None
        for g in range(1, 4):
            out = str(tmp_path / f"r{g}")
            s = run_recrawl(A, prior, out, CFG, budget=4)
            meta = json.load(open(os.path.join(out, "recrawl_meta.json")))
            assert s["recrawl_generation"] == g
            assert s["listings_refetched"] == min(4, len(meta["last_fetch"]))
            fetched.append({k for k, v in meta["last_fetch"].items() if v == g})
            n_listings = len(meta["last_fetch"])
            prior = out
        # disjoint budget sets until every listing has been refetched
        # once: gen3 takes the 3 never-refetched listings (stalest) and
        # backfills 1 from gen1, so the union covers all 11
        assert fetched[0].isdisjoint(fetched[1])
        never = set.union(*[set()], *fetched[:2])
        assert len(fetched[2] - never) == n_listings - 8
        assert len(fetched[0] | fetched[1] | fetched[2]) == n_listings == 11

    def test_budget_zero_noop(self, crawl_a, ray_session, tmp_path):
        prior, _ = crawl_a
        out = str(tmp_path / "zero")
        s = run_recrawl(A, prior, out, CFG, budget=0)
        assert s["job_records"] == 0
        assert s["listings_refetched"] == 0
        assert s["listings_deferred"] == 11

    def test_budget_zero_chains(self, crawl_a, ray_session, tmp_path):
        """A budget=0 generation still writes a checkpoint manifest, so
        the next generation can chain from its out_dir (zero-seed runs
        skip the wave loop entirely)."""
        prior, _ = crawl_a
        zero = str(tmp_path / "zero")
        run_recrawl(A, prior, zero, CFG, budget=0)
        nxt = str(tmp_path / "next")
        s = run_recrawl(A, zero, nxt, CFG, budget=4)
        assert s["recrawl_generation"] == 2
        assert s["listings_refetched"] == 4

    def test_out_dir_reuse_clears_stale_seeds(self, crawl_a, ray_session,
                                              tmp_path):
        """Reusing an out_dir for a smaller-budget generation must not
        leave higher-index seed files behind: the stale seeds would both
        exceed the budget in wave 0 and mark never-scheduled listings as
        refetched in recrawl_meta.json."""
        prior, _ = crawl_a
        out = str(tmp_path / "reuse")
        run_recrawl(A, prior, out, CFG)  # full: 11 seed files
        s = run_recrawl(A, prior, out, CFG, budget=3)  # reuse, small budget
        assert s["listings_refetched"] == 3
        meta = json.load(open(os.path.join(out, "recrawl_meta.json")))
        assert sum(1 for v in meta["last_fetch"].values() if v == 1) == 3
        # budget=0 reuse clears the seed dir outright
        s0 = run_recrawl(A, prior, out, CFG, budget=0)
        assert s0["listings_refetched"] == 0

    def test_out_dir_reuse_clears_stale_manifests(self, crawl_a, ray_session,
                                                  tmp_path):
        """A reused out_dir must not keep the EARLIER generation's
        checkpoint manifests: a budget=0 rerun into it writes its own
        zero-seed checkpoint (wave 0) rather than leaving the prior
        generation's higher-wave manifests to answer resume/chaining."""
        from jobscrawler_ray.state.checkpoint import latest_manifest

        prior, _ = crawl_a
        out = str(tmp_path / "reuse_m")
        run_recrawl(A, prior, out, CFG)  # full generation: waves 0..k
        assert latest_manifest(out).wave > 0
        run_recrawl(A, prior, out, CFG, budget=0)
        m = latest_manifest(out)
        assert m.wave == 0 and m.frontier_path is None
        # and the zero-seed checkpoint chains: next generation == 2
        nxt = str(tmp_path / "next_m")
        s = run_recrawl(A, out, nxt, CFG, budget=4)
        assert s["recrawl_generation"] == 2

    def test_requires_completed_prior(self, ray_session, tmp_path):
        with pytest.raises(ValueError):
            run_recrawl(A, str(tmp_path / "nope"), str(tmp_path / "out"), CFG)

    def test_resume_interrupted_recrawl(self, crawl_a, ray_session, tmp_path):
        """max_waves=1 recrawl (interrupted mid-flight) resumed with
        resume=True equals a one-shot recrawl: same delta records, and
        recrawl_meta.json is written on the resume leg."""
        prior, _ = crawl_a
        oneshot = str(tmp_path / "oneshot")
        part = str(tmp_path / "part")
        s_full = run_recrawl(B, prior, oneshot, CFG)
        run_recrawl(B, prior, part, CrawlConfig(**{**CFG.__dict__, "max_waves": 1}))
        s_res = run_recrawl(B, prior, part, CFG, resume=True)
        assert _record_shas(part) == _record_shas(oneshot)
        assert s_res["job_records"] == s_full["job_records"]
        m_full = json.load(open(os.path.join(oneshot, "recrawl_meta.json")))
        m_res = json.load(open(os.path.join(part, "recrawl_meta.json")))
        assert m_full == m_res
