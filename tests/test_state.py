"""Unit tests for the stateful layer: seen-set protocol (offer →
finalize → verdicts), politeness thresholds, checkpoint manifests."""

import json
import os

import numpy as np
import pytest

from jobscrawler_ray.state.checkpoint import (
    WaveManifest,
    all_manifests,
    latest_manifest,
    write_manifest,
)



def _pack(rows):
    """row tuples -> column-wise transport (offer_candidates format)."""
    return tuple(list(c) for c in zip(*rows))

class TestSeenShardProtocol:
    def _shard(self, exact=True):
        from jobscrawler_ray.state.seen import _SeenShard

        return _SeenShard(capacity=10000, seed=1, exact_sidecar=exact)

    def test_first_wins_by_gseq(self):
        s = self._shard()
        # same key offered twice, out of order: lower gseq must win
        rows = [
            ("a" * 40, 20, "candidate", False, "https://h.test/jobs/1", "h.test", 20, 8.0, 20),
            ("a" * 40, 10, "candidate", False, "https://h.test/jobs/1", "h.test", 10, 8.0, 10),
        ]
        s.offer_candidates(0, _pack(rows))
        s.finalize(0)
        verd, emit = s.verdicts(0)
        assert verd["a" * 40] == ("record", 10)
        assert emit["a" * 40] is True

    def test_cross_wave_dup(self):
        s = self._shard()
        s.offer_candidates(0, _pack([("b" * 40, 5, "candidate", True, "https://h.test/x", "h.test", 5, 8.0, 5)]))
        s.finalize(0)
        assert s.verdicts(0)[0]["b" * 40] == ("detail", 5)
        s.offer_candidates(1, _pack([("b" * 40, 99, "candidate", True, "https://h.test/x", "h.test", 99, 8.0, 99)]))
        s.finalize(1)
        assert s.verdicts(1)[0]["b" * 40] == ("dup", 99)

    def test_image_claim(self):
        s = self._shard()
        s.offer_candidates(0, _pack([("c" * 40, 1, "candidate", False, "https://h.test/jobs/9", "h.test", 1, 8.0, 1)]))
        s.finalize(0)
        _, emit = s.verdicts(0)
        assert emit["c" * 40] is True
        # replay (resume): record is dup now, image not re-emitted
        s.offer_candidates(1, _pack([("c" * 40, 1, "candidate", False, "https://h.test/jobs/9", "h.test", 1, 8.0, 1)]))
        s.finalize(1)
        verd, emit2 = s.verdicts(1)
        assert verd["c" * 40] == ("dup", 1)
        assert "c" * 40 not in emit2

    def test_filter_only_mode(self):
        s = self._shard(exact=False)
        rows = [(f"{i:040x}", i, "candidate", True, f"https://h.test/{i}", "h.test", i, 8.0, i) for i in range(200)]
        s.offer_candidates(0, _pack(rows))
        s.finalize(0)
        verd, _ = s.verdicts(0)
        assert all(v[0] == "detail" for v in verd.values())
        s.offer_candidates(1, _pack(rows))
        s.finalize(1)
        verd2, _ = s.verdicts(1)
        assert all(v[0] == "dup" for v in verd2.values())


class TestPolitenessThresholds:
    def _shard(self):
        from jobscrawler_ray.state.politeness import _PolitenessShard
        from jobscrawler_ray.synth.world import WorldParams

        return _PolitenessShard(WorldParams(seed=1, n_sites=2))

    def test_grant_threshold(self):
        s = self._shard()
        # 10 rows, rate 3 → cap 6 tokens initially → grant 6: threshold
        # = 6th smallest priority
        prios = list(range(100, 110))
        s.offer(0, {"site-0000.test": (10, prios[:8], 3.0)})
        s.offer(0, {"site-0000.test": (0, prios[8:], 3.0)})  # merged top-k
        s.finalize(0)
        thr = s.thresholds(0)["site-0000.test"]
        assert thr == 105  # 6th smallest of 100..109

    def test_refill_over_waves(self):
        s = self._shard()
        s.offer(0, {"site-0000.test": (6, [1, 2, 3, 4, 5, 6], 3.0)})
        s.finalize(0)  # grants 6, tokens 0
        s.offer(1, {"site-0000.test": (6, [7, 8, 9, 10, 11, 12], 3.0)})
        s.finalize(1)  # refill 3 → grant 3 → threshold = 9
        assert s.thresholds(1)["site-0000.test"] == 9

    def test_all_admitted_open_threshold(self):
        s = self._shard()
        s.offer(0, {"site-0000.test": (2, [5, 9], 100.0)})
        s.finalize(0)
        assert s.thresholds(0)["site-0000.test"] == (1 << 62)

    def test_robots_block(self):
        from jobscrawler_ray.state.politeness import _PolitenessShard
        from jobscrawler_ray.synth.world import WorldParams

        s = _PolitenessShard(WorldParams(seed=13, n_sites=8, blocked_pct=40))
        blocked = [h for h in s.world.by_host if s.world.host_blocked(h)]
        assert blocked
        s.offer(0, {blocked[0]: (3, [1, 2, 3], 5.0)})
        s.finalize(0)
        assert s.thresholds(0)[blocked[0]] == _PolitenessShard.BLOCK


    def test_offer_id_dedup_under_retries(self):
        """A retried map task re-offers the same content hash; the shard
        must count it once (idempotent side effects under Ray task
        re-execution)."""
        from jobscrawler_ray.state.politeness import _PolitenessShard
        from jobscrawler_ray.synth.world import WorldParams

        sh = _PolitenessShard(WorldParams(seed=3, n_sites=2, pages_per_site=1,
                                          jobs_per_page=2, politeness_rps=1))
        host = "site-0000.test"
        demand = {host: (3, [1, 2, 3], 1.0)}
        assert sh.offer(0, demand, offer_id=99) is True
        assert sh.offer(0, demand, offer_id=99) is False  # retry ignored
        assert sh._counts[host] == 3  # not 6
        sh.finalize(0)
        # a STALE retry arriving after finalize re-offers for ITS wave
        # (baked into the task closure) — rejected by the wave guard, so
        # its demand can never leak into the NEXT wave's budget
        assert sh.offer(0, demand, offer_id=99) is False
        assert sh.offer(0, demand, offer_id=100) is False  # even unseen ids
        assert host not in sh._counts
        # fresh offers for the next (unfinalized) wave are accepted
        assert sh.offer(1, demand) is True

class TestCheckpoint:
    def test_manifest_roundtrip(self, tmp_path):
        out = str(tmp_path)
        m = WaveManifest(wave=0, frontier_path={"seed": [], "defer": ["x"],
                                                "detail": [], "image": []},
                         metrics={"records": 5})
        write_manifest(out, m)
        m2 = WaveManifest(wave=1, frontier_path=None)
        write_manifest(out, m2)
        latest = latest_manifest(out)
        assert latest.wave == 1 and latest.frontier_path is None
        assert [x.wave for x in all_manifests(out)] == [0, 1]
        assert all_manifests(out)[0].frontier_path["defer"] == ["x"]

    def test_latest_none_when_empty(self, tmp_path):
        assert latest_manifest(str(tmp_path)) is None


class TestStorageSeam:
    def test_parquet_fallback_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from jobscrawler_ray.sources.storage import (
            HAVE_LANCE,
            IMAGE_CAPTION_SCHEMA,
            read_table,
            site_config_table,
            write_table,
        )
        from jobscrawler_ray.synth.world import World, WorldParams

        assert not HAVE_LANCE  # sandbox: documented parquet fallback
        ds = rd.from_items([
            {"image_id": "a", "bytes": b"x", "w": 1, "h": 1, "fmt": "raw",
             "caption": "c", "phash": 7, "bucket": 0},
        ])
        p = write_table(ds, str(tmp_path / "t"), partition_cols=["bucket"])
        back = read_table(p).to_pandas()
        assert back["image_id"].tolist() == ["a"]
        assert set(IMAGE_CAPTION_SCHEMA.names) <= set(back.columns) | {"bucket"}

        cfg = site_config_table(World(WorldParams(seed=1, n_sites=4))).to_pandas()
        assert len(cfg) == 4
        assert {"site_id", "strategy", "elements_path", "politeness_rps"} <= set(cfg.columns)
