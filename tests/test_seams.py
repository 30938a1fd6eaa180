"""Contract tests for the real-deployment seams (fetch backend, bs4
registry extension, durable sinks) — pure unit tests, no Ray session."""

import pyarrow as pa
import pytest

from jobscrawler_ray.sources.db_sink import ParquetRecordSink, retry
from jobscrawler_ray.sources.fetch_backends import (
    FETCH_BACKENDS,
    HttpFetcher,
    SyntheticFetcher,
    UserAgentPool,
)
from jobscrawler_ray.synth.world import WorldParams


class TestFetchBackends:
    def test_synthetic_backend_contract(self):
        f = SyntheticFetcher(WorldParams(seed=3, n_sites=2, pages_per_site=1,
                                         jobs_per_page=2))
        url = f.world.sites[0].url + "1"
        status, payload = f.fetch(url)
        assert isinstance(status, int) and isinstance(payload, bytes)
        assert status == 200 and payload

    def test_ua_pool_rotates_deterministically(self):
        pool = UserAgentPool(["a", "b", "c"])
        assert [pool.next() for _ in range(7)] == ["a", "b", "c", "a", "b", "c", "a"]

    def test_http_fetcher_guarded_in_sandbox(self):
        with pytest.raises(RuntimeError, match="allow_network"):
            HttpFetcher()
        assert set(FETCH_BACKENDS) == {"synthetic", "http"}


class TestBs4Seam:
    def test_register_raises_without_bs4(self):
        from jobscrawler_ray.stages import parse_bs4

        if parse_bs4.HAVE_BS4:  # pragma: no cover - not this sandbox
            names = parse_bs4.register()
            assert "html_main_bs4" in names
        else:
            with pytest.raises(ImportError, match="mini_select"):
                parse_bs4.register()


class TestParquetRecordSink:
    def _tbl(self, keys, vals):
        return pa.table({"url_sha1": keys, "title": vals})

    def test_conflict_skip_within_and_across_batches(self, tmp_path):
        sink = ParquetRecordSink(str(tmp_path / "recs"))
        n = sink.write_batch(self._tbl(["k1", "k2", "k1"], ["a", "b", "c"]))
        assert n == 2  # intra-batch dup dropped, first wins
        n = sink.write_batch(self._tbl(["k2", "k3"], ["x", "d"]))
        assert n == 1  # k2 conflicts -> DO NOTHING
        assert sink.num_rows() == 3

    def test_conflict_skip_survives_reopen(self, tmp_path):
        path = str(tmp_path / "recs")
        ParquetRecordSink(path).write_batch(self._tbl(["k1"], ["a"]))
        reopened = ParquetRecordSink(path)  # rebuilds the key index
        assert reopened.write_batch(self._tbl(["k1", "k4"], ["z", "e"])) == 1
        import pyarrow.dataset as pads

        t = pads.dataset(path, format="parquet").to_table()
        rows = dict(zip(t["url_sha1"].to_pylist(), t["title"].to_pylist()))
        assert rows == {"k1": "a", "k4": "e"}  # first write won

    def test_retry_policy(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise OSError("transient")
            return "ok"

        sleeps = []
        assert retry(flaky, sleep=sleeps.append) == "ok"
        assert calls["n"] == 3
        assert sleeps == [2.0, 4.0]  # exponential, capped at 10

        with pytest.raises(OSError):
            retry(lambda: (_ for _ in ()).throw(OSError("always")),
                  attempts=3, sleep=lambda s: None)
