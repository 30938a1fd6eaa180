"""Conformance: the distributed wave engine vs the sequential
reference-semantics oracle (SURVEY.md §5 items 2-4).

Asserts, row for row under the same seed list + politeness budget:
- final record table equality (title/link/description/location/tags)
- image table: exact caption equality, w/h/fmt/phash equality, and
  decoded-pixel fidelity vs ground truth (identical for lossless,
  PSNR ≥ 40 dB for the lossy qjpg codec)
- final URL-seen membership equality
- per-host fetch order equality (engine log sorted by (host,gseq,depth)
  == oracle sequential order)
- resume-from-checkpoint produces the identical final tables
"""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from jobscrawler_ray.functions import codecs
from jobscrawler_ray.pipelines.crawl import CrawlConfig, fetch_log, run_crawl
from jobscrawler_ray.pipelines.oracle import run_oracle
from jobscrawler_ray.synth.world import WorldParams

T2 = WorldParams(seed=42, n_sites=8, pages_per_site=3, jobs_per_page=6)
CFG = CrawlConfig(num_seen_shards=4, num_pol_shards=2)


def _read_dir(path: str) -> pd.DataFrame:
    df = pads.dataset(path, format="parquet", partitioning="hive").to_table().to_pandas()
    return df.drop(columns=[c for c in ("bucket",) if c in df.columns])


@pytest.fixture(scope="module")
def crawl_and_oracle(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl_t2"))
    summary = run_crawl(T2, out, CFG)
    oracle = run_oracle(T2)
    return out, summary, oracle


class TestConformance:
    def test_record_table_equality(self, crawl_and_oracle):
        out, summary, oracle = crawl_and_oracle
        eng = _read_dir(os.path.join(out, "job_records")).sort_values("url_sha1").reset_index(drop=True)
        ora = oracle["records"].sort_values("url_sha1").reset_index(drop=True)
        assert len(eng) == len(ora) > 0
        for col in ["url_sha1", "site_id", "strategy", "title", "link",
                    "description", "location", "host"]:
            assert eng[col].tolist() == ora[col].tolist(), f"mismatch in {col}"
        assert [list(x) for x in eng["location_tags"]] == [
            list(x) for x in ora["location_tags"]
        ]
        assert (pd.to_datetime(eng["timestamp"]) == pd.to_datetime(ora["timestamp"])).all()

    def test_image_table_and_fidelity(self, crawl_and_oracle):
        out, summary, oracle = crawl_and_oracle
        eng = _read_dir(os.path.join(out, "image_caption")).sort_values("image_id").reset_index(drop=True)
        ora = oracle["images"].sort_values("image_id").reset_index(drop=True)
        assert len(eng) == len(ora) > 0
        for col in ["image_id", "caption", "w", "h", "fmt", "phash"]:
            assert eng[col].tolist() == ora[col].tolist(), f"mismatch in {col}"
        # per-row decoded-pixel fidelity vs ground truth (input_hint invariant)
        for _, row in eng.iterrows():
            pixels, fmt = codecs.decode(row["bytes"])
            truth = oracle["ground_pixels"][row["image_id"]]
            if fmt == "qjpg":
                assert codecs.psnr(truth, pixels) >= 40.0
            else:
                assert np.array_equal(truth, pixels)

    def test_two_hop_descriptions(self, crawl_and_oracle):
        """M10: the two-hop (echojobs-style) site's records carry the
        whole-page text of the stripped apply URL — in both engines."""
        out, summary, oracle = crawl_and_oracle
        eng = _read_dir(os.path.join(out, "job_records"))
        two = eng[eng["site_id"] == "api_dict-0007"]
        assert len(two) > 0
        hit = two["description"].str.contains("Full posting")
        # all except the deterministic 403/500 detail pages (default desc)
        assert hit.mean() > 0.8
        assert (~hit).sum() <= max(1, int(0.1 * len(two)))

    def test_seen_membership(self, crawl_and_oracle):
        out, summary, oracle = crawl_and_oracle
        assert set(summary["seen_membership"]) == oracle["seen"]

    def test_fetch_order_per_host(self, crawl_and_oracle):
        out, summary, oracle = crawl_and_oracle
        eng = fetch_log(out).sort_values(["host", "gseq", "depth"]).reset_index(drop=True)
        ora = oracle["fetch_order"].sort_values(["host", "gseq", "depth"]).reset_index(drop=True)
        assert len(eng) == len(ora) > 0
        assert eng["canon_url"].tolist() == ora["canon_url"].tolist()
        assert eng["kind"].tolist() == ora["kind"].tolist()
        # oracle's log is temporally sequential per host: per-host gseq is
        # monotone, so sorted == temporal order (module docstring argument)
        for _, g in oracle["fetch_order"].groupby("host"):
            assert g["gseq"].is_monotonic_increasing


class TestResume:
    def test_resume_equivalence(self, ray_session, tmp_path):
        full_dir = str(tmp_path / "full")
        part_dir = str(tmp_path / "part")
        wp = WorldParams(seed=7, n_sites=4, pages_per_site=2, jobs_per_page=4)
        run_crawl(wp, full_dir, CFG)
        # interrupt after wave 0, then resume to completion
        run_crawl(wp, part_dir, CrawlConfig(**{**CFG.__dict__, "max_waves": 1}))
        run_crawl(wp, part_dir, CFG, resume=True)
        for sub in ("job_records", "image_caption"):
            a = _read_dir(os.path.join(full_dir, sub))
            b = _read_dir(os.path.join(part_dir, sub))
            key = "url_sha1" if sub == "job_records" else "image_id"
            a = a.sort_values(key).reset_index(drop=True)
            b = b.sort_values(key).reset_index(drop=True)
            assert len(a) == len(b) > 0
            cols = [c for c in a.columns if c != "location_tags"]
            for col in cols:
                assert a[col].tolist() == b[col].tolist(), f"{sub}.{col}"


class TestCheckpointCadence:
    def test_checkpoint_every_resume_replay(self, ray_session, tmp_path):
        """checkpoint_every=2 writes manifests/snapshots only every 2nd
        wave; a run interrupted between checkpoints resumes from the
        last one, REPLAYS the skipped wave idempotently, and produces
        the same final tables as an uninterrupted run."""
        full_dir = str(tmp_path / "full")
        part_dir = str(tmp_path / "part")
        # needs a ≥3-wave world (follow-link sites) so wave 1 is
        # neither checkpointed nor terminal
        wp = WorldParams(seed=5, n_sites=6, pages_per_site=2, jobs_per_page=4)
        cfg2 = CrawlConfig(**{**CFG.__dict__, "checkpoint_every": 2})
        run_crawl(wp, full_dir, CFG)
        # interrupt after wave 1 — wave 0 is the last checkpointed wave
        # (wave 1 wrote no manifest), so resume replays wave 1
        run_crawl(wp, part_dir, CrawlConfig(**{**cfg2.__dict__, "max_waves": 2}))
        from jobscrawler_ray.state.checkpoint import latest_manifest

        assert latest_manifest(part_dir).wave == 0  # wave 1 skipped
        run_crawl(wp, part_dir, cfg2, resume=True)
        # the replayed wave must start from a CLEAN output dir: the
        # non-deduped fetch log would otherwise double wave 1's rows
        from jobscrawler_ray.pipelines.crawl import fetch_log

        assert len(fetch_log(part_dir)) == len(fetch_log(full_dir))
        for sub in ("job_records", "image_caption"):
            a = _read_dir(os.path.join(full_dir, sub))
            b = _read_dir(os.path.join(part_dir, sub))
            key = "url_sha1" if sub == "job_records" else "image_id"
            a = a.sort_values(key).reset_index(drop=True)
            b = b.sort_values(key).reset_index(drop=True)
            assert len(a) == len(b) > 0
            cols = [c for c in a.columns if c != "location_tags"]
            for col in cols:
                assert a[col].tolist() == b[col].tolist(), f"{sub}.{col}"


class TestPolitenessAndRobots:
    def test_constrained_budget_defers_but_converges(self, ray_session, tmp_path):
        wp = WorldParams(seed=11, n_sites=4, pages_per_site=4, jobs_per_page=4,
                         politeness_rps=3, rss_missing_loc=False)
        out = str(tmp_path / "slow")
        summary = run_crawl(wp, out, CrawlConfig(**{**CFG.__dict__, "max_waves": 64}))
        oracle = run_oracle(wp)
        assert summary["waves"] > 3  # deferral actually happened
        eng = _read_dir(os.path.join(out, "job_records")).sort_values("url_sha1")
        ora = oracle["records"].sort_values("url_sha1")
        assert eng["url_sha1"].tolist() == ora["url_sha1"].tolist()
        assert eng["description"].tolist() == ora["description"].tolist()
        assert set(summary["seen_membership"]) == oracle["seen"]
        # per-host realized fetch order still monotone in gseq per depth class
        log = fetch_log(out)
        assert len(log) == len(oracle["fetch_order"])

    def test_robots_blocked_hosts_dropped(self, ray_session, tmp_path):
        wp = WorldParams(seed=13, n_sites=8, pages_per_site=2, jobs_per_page=3,
                         blocked_pct=40)
        out = str(tmp_path / "robots")
        summary = run_crawl(wp, out, CFG)
        oracle = run_oracle(wp)
        eng = _read_dir(os.path.join(out, "job_records"))
        ora = oracle["records"]
        assert sorted(eng["url_sha1"]) == sorted(ora["url_sha1"])
        assert set(summary["seen_membership"]) == oracle["seen"]
        from jobscrawler_ray.synth.world import World

        world = World(wp)
        blocked = {h for h in world.by_host if world.host_blocked(h)}
        assert blocked, "seed should block at least one host"
        assert not set(eng["host"]) & blocked


class TestCombinedConstraints:
    def test_politeness_robots_twohop_combined(self, ray_session, tmp_path):
        """Interaction coverage: tight budget + robots-blocked hosts +
        two-hop sites in one world, still oracle-equal."""
        wp = WorldParams(seed=23, n_sites=10, pages_per_site=3, jobs_per_page=4,
                         politeness_rps=4, blocked_pct=20, rss_missing_loc=False)
        out = str(tmp_path / "combo")
        summary = run_crawl(wp, out, CrawlConfig(**{**CFG.__dict__, "max_waves": 64}))
        oracle = run_oracle(wp)
        eng = _read_dir(os.path.join(out, "job_records")).sort_values("url_sha1")
        ora = oracle["records"].sort_values("url_sha1")
        assert eng["url_sha1"].tolist() == ora["url_sha1"].tolist()
        assert eng["description"].tolist() == ora["description"].tolist()
        assert set(summary["seen_membership"]) == oracle["seen"]

    def test_fully_blocked_world_empty_outputs(self, ray_session, tmp_path):
        wp = WorldParams(seed=3, n_sites=3, pages_per_site=1, jobs_per_page=2,
                         blocked_pct=100)
        out = str(tmp_path / "blocked")
        summary = run_crawl(wp, out, CFG)
        assert summary["job_records"] == 0
        assert summary["image_caption"] == 0
        assert len(summary["seen_membership"]) == 0
