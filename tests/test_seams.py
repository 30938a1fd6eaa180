"""Contract tests for the real-deployment seams (fetch backend, bs4
registry extension, durable sinks) — pure unit tests, no Ray session."""

import os
import uuid

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
        assert set(FETCH_BACKENDS) == {"synthetic", "http", "browser"}


class TestBrowserFetcherSeam:
    """S7: the reference's (disabled) Selenium crawler rendered a page
    and handed the DOM HTML to the same bs4 strategies
    (src/crawlers/async_sel.py:1-296). The seam contract: fetch()
    returns (200, page_source bytes) so downstream parse operators are
    byte-identical to the HTTP path's."""

    def test_guarded_without_driver(self):
        from jobscrawler_ray.sources.fetch_backends import BrowserFetcher

        with pytest.raises(RuntimeError, match="allow_browser"):
            BrowserFetcher()

    def test_rendered_page_parses_identically(self):
        from jobscrawler_ray.sources.fetch_backends import BrowserFetcher
        from jobscrawler_ray.stages.parse import parse_listing

        f = SyntheticFetcher(WorldParams(seed=3, n_sites=4,
                                         pages_per_site=1, jobs_per_page=3))
        site = next(s for s in f.world.sites if s.strategy == "html_main")
        url = site.url + "1"
        _, payload = f.fetch(url)

        class FakeDriver:  # any object with get/page_source/quit
            page_source = ""

            def get(self, u):
                self.page_source = payload.decode()

            def quit(self):
                pass

        bf = BrowserFetcher(driver_factory=FakeDriver)
        status, body = bf.fetch(url)
        assert (status, body) == (200, payload)
        import json as _json

        ep = _json.loads(site.elements_path) if isinstance(
            site.elements_path, str) else site.elements_path
        via_browser = parse_listing(body.decode(), site.strategy, ep,
                                    site.name)
        via_http = parse_listing(payload.decode(), site.strategy, ep,
                                 site.name)
        assert via_browser == via_http and len(via_browser) == 3
        bf.close()

    def test_navigation_failure_maps_to_zero(self):
        from jobscrawler_ray.sources.fetch_backends import BrowserFetcher

        class Boom:
            def get(self, u):
                raise OSError("render crash")

            page_source = ""

            def quit(self):
                pass

        bf = BrowserFetcher(driver_factory=Boom)
        assert bf.fetch("http://x/1") == (0, b"")

    def test_construction_failure_surfaces_loudly(self):
        """Driver-construction errors (selenium/Chrome absent) must
        raise on fetch, not degrade into empty responses that let a
        crawl 'succeed' with zero records."""
        from jobscrawler_ray.sources.fetch_backends import BrowserFetcher

        bf = BrowserFetcher(allow_browser=True)  # lazy selenium factory
        with pytest.raises(RuntimeError, match="selenium"):
            bf.fetch("http://x/1")

    def test_config_wiring_constructs(self):
        """CrawlConfig.fetch_backend='browser' must reach the backend
        with ITS opt-in kwarg (regression: the shared constructor call
        passed allow_network, a kwarg BrowserFetcher rejects)."""
        from jobscrawler_ray.pipelines.crawl import get_fetch_backend
        from jobscrawler_ray.sources.fetch_backends import BrowserFetcher
        from jobscrawler_ray.synth.world import WorldParams

        b = get_fetch_backend("browser", WorldParams(seed=3))
        assert isinstance(b, BrowserFetcher)

    def test_proxies_accepted_as_list(self):
        """The backend cache key must stay hashable when proxies
        arrive as a list (the natural type — ProxyPool/HttpFetcher
        both take list[str]); regression: TypeError in every fetch
        task."""
        from jobscrawler_ray.pipelines.crawl import get_fetch_backend
        from jobscrawler_ray.sources.fetch_backends import HttpFetcher
        from jobscrawler_ray.synth.world import WorldParams

        wp = WorldParams(seed=4)
        b = get_fetch_backend("http", wp, ["http://127.0.0.1:1/"])
        assert isinstance(b, HttpFetcher) and b.proxies is not None
        # list and tuple spellings resolve to the same cached backend
        assert get_fetch_backend("http", wp, ("http://127.0.0.1:1/",)) is b


class TestProxyPoolSeam:
    """S11: proxy rotation (reference scrapes a proxy list —
    src/resources/proxies/GetProxies.py). Loopback forward proxies
    record the absolute-URI requests urllib routes through them;
    rotation alternates per request."""

    @pytest.fixture()
    def proxy_servers(self):
        import http.server
        import threading

        servers, logs = [], []
        for _ in range(2):
            seen: list = []

            def make_handler(seen=seen):
                class H(http.server.BaseHTTPRequestHandler):
                    def do_GET(self):
                        seen.append(self.path)  # absolute URI via proxy
                        body = b"proxied"
                        self.send_response(200)
                        self.send_header("Content-Length", str(len(body)))
                        self.end_headers()
                        self.wfile.write(body)

                    def log_message(self, *a):
                        pass

                return H

            srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                                  make_handler())
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            servers.append(srv)
            logs.append(seen)
        yield [f"http://127.0.0.1:{s.server_address[1]}" for s in servers], logs
        for s in servers:
            s.shutdown()

    def test_rotation_across_proxies(self, proxy_servers):
        proxies, logs = proxy_servers
        f = HttpFetcher(allow_network=True, timeout=5.0, proxies=proxies,
                        agents=["ua"])
        for i in range(4):
            status, body = f.fetch("http://upstream.invalid/page")
            assert (status, body) == (200, b"proxied")
        # round-robin: each loopback proxy saw exactly 2 absolute-URI
        # requests for the upstream host
        assert [len(x) for x in logs] == [2, 2]
        assert all(p == "http://upstream.invalid/page"
                   for x in logs for p in x)


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


class TestHttpFetcherLoopback:
    """Drive HttpFetcher's REAL fetch path against a loopback HTTP
    server (no external network): UA rotation is observable in the
    request headers, non-200 bodies pass through, connection failures
    return (0, b'')."""

    @pytest.fixture()
    def server(self):
        import http.server
        import threading

        seen_uas = []

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                seen_uas.append(self.headers.get("User-Agent"))
                if self.path == "/missing":
                    body = b"custom 404 body"
                    self.send_response(404)
                else:
                    body = f"hello {self.path}".encode()
                    self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # keep pytest output clean
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address[1], seen_uas
        srv.shutdown()

    def test_fetch_rotation_and_passthrough(self, server):
        port, seen_uas = server
        f = HttpFetcher(allow_network=True, agents=["ua-one", "ua-two"],
                        timeout=5.0)
        status, body = f.fetch(f"http://127.0.0.1:{port}/a")
        assert (status, body) == (200, b"hello /a")
        # reference behavior: non-200 body passes through, no raise
        status, body = f.fetch(f"http://127.0.0.1:{port}/missing")
        assert (status, body) == (404, b"custom 404 body")
        assert seen_uas == ["ua-one", "ua-two"]  # rotation per request

    def test_fetch_connection_failure(self, server):
        port, _ = server
        f = HttpFetcher(allow_network=True, timeout=1.0)
        # a port with no listener → URLError → (0, b'')
        assert f.fetch("http://127.0.0.1:1/x") == (0, b"")


class TestPostgresSinksViaSqliteTwin:
    """Execute the REAL PostgresRecordSink / PgVectorEmbeddingSink
    write_batch paths (SQL build, executemany, commit,
    rollback-on-error, retry) through the sqlite DB-API twin — the
    upsert grammar is shared, only placeholders/vector binding differ."""

    def _twin(self):
        from jobscrawler_ray.sources.sqlite_twin import SqliteTwin

        twin = SqliteTwin()
        with twin.cursor() as cur:
            cur.execute("CREATE TABLE records (url TEXT UNIQUE, title TEXT)")
            cur.execute(
                "CREATE TABLE embeddings (id INTEGER PRIMARY KEY, embedding TEXT)")
        twin.commit()
        return twin

    def test_record_sink_conflict_do_nothing(self):
        from jobscrawler_ray.sources.db_sink import PostgresRecordSink

        twin = self._twin()
        sink = PostgresRecordSink(table="records", columns=["url", "title"],
                                  key_col="url", conn=twin)
        sink.write_batch(pa.table({"url": ["u1", "u2"], "title": ["a", "b"]}))
        # conflicting re-insert: DO NOTHING keeps the first write
        sink.write_batch(pa.table({"url": ["u2", "u3"], "title": ["X", "c"]}))
        with twin.cursor() as cur:
            cur.execute("SELECT url, title FROM records ORDER BY url")
            assert cur.fetchall() == [("u1", "a"), ("u2", "b"), ("u3", "c")]

    def test_record_sink_rollback_then_retry_succeeds(self):
        from jobscrawler_ray.sources.db_sink import PostgresRecordSink

        twin = self._twin()
        # target a table that doesn't exist YET: attempt 1 fails (and
        # must roll back), the "DBA" creates it, attempt 2 succeeds
        sink = PostgresRecordSink(table="pending", columns=["url", "title"],
                                  key_col="url", conn=twin)
        orig_cursor = twin.cursor
        calls = {"n": 0}

        def healing_cursor():
            calls["n"] += 1
            if calls["n"] == 2:
                with orig_cursor() as cur:
                    cur.execute(
                        "CREATE TABLE pending (url TEXT UNIQUE, title TEXT)")
                twin.commit()
            return orig_cursor()

        twin.cursor = healing_cursor
        import jobscrawler_ray.sources.db_sink as db_sink
        orig_retry = db_sink.retry
        db_sink.retry = lambda fn, **kw: orig_retry(fn, sleep=lambda s: None)
        try:
            n = sink.write_batch(pa.table({"url": ["u9"], "title": ["z"]}))
        finally:
            db_sink.retry = orig_retry
            twin.cursor = orig_cursor
        assert n == 1
        assert twin.rollbacks >= 1  # aborted txn rolled back before retry
        with twin.cursor() as cur:
            cur.execute("SELECT title FROM pending WHERE url='u9'")
            assert cur.fetchone() == ("z",)

    def test_pgvector_sink_upsert(self):
        import json

        from jobscrawler_ray.sources.db_sink import PgVectorEmbeddingSink

        twin = self._twin()
        sink = PgVectorEmbeddingSink(table="embeddings", id_col="id",
                                     vec_col="embedding", conn=twin)
        sink.write_batch(pa.table({"id": [1, 2],
                                   "embedding": [[1.0, 2.0], [3.0, 4.0]]}))
        # conflicting id → DO UPDATE overwrites with the new vector
        sink.write_batch(pa.table({"id": [1], "embedding": [[9.0, 9.0]]}))
        with twin.cursor() as cur:
            cur.execute("SELECT embedding FROM embeddings WHERE id=1")
            assert json.loads(cur.fetchone()[0]) == [9.0, 9.0]
            cur.execute("SELECT count(*) FROM embeddings")
            assert cur.fetchone() == (2,)


class TestLivePostgres:
    """OPTIONAL live-Postgres integration (reference
    ``src/crawler.py:172-244``): runs the UNMODIFIED sink grammar
    against a real database when ``JCR_PG_DSN`` is set — e.g.

        JCR_PG_DSN=postgresql://user:pw@host/db pytest -k LivePostgres

    Skips cleanly in this sandbox (no psycopg2, no DB). The sqlite
    twin above exercises the same code path; this proves it against
    genuine Postgres semantics (true ON CONFLICT, transactions)."""

    @pytest.fixture()
    def pg(self):
        dsn = os.environ.get("JCR_PG_DSN")
        if not dsn:
            pytest.skip("set JCR_PG_DSN to run live-Postgres integration")
        psycopg2 = pytest.importorskip("psycopg2")
        conn = psycopg2.connect(dsn)
        tbl = f"jcr_it_{uuid.uuid4().hex[:8]}"
        with conn.cursor() as cur:
            cur.execute(
                f"CREATE TABLE {tbl} (url TEXT UNIQUE, title TEXT)")
        conn.commit()
        try:
            yield conn, tbl
        finally:
            with conn.cursor() as cur:
                cur.execute(f"DROP TABLE IF EXISTS {tbl}")
            conn.commit()
            conn.close()

    def test_record_sink_against_live_db(self, pg):
        from jobscrawler_ray.sources.db_sink import PostgresRecordSink

        conn, tbl = pg
        sink = PostgresRecordSink(table=tbl, columns=["url", "title"],
                                  key_col="url", conn=conn)
        sink.write_batch(pa.table({"url": ["u1", "u2"],
                                   "title": ["a", "b"]}))
        # replay + one fresh row: the conflict must DO NOTHING
        sink.write_batch(pa.table({"url": ["u1", "u3"],
                                   "title": ["A2", "c"]}))
        with conn.cursor() as cur:
            cur.execute(f"SELECT url, title FROM {tbl} ORDER BY url")
            assert cur.fetchall() == [("u1", "a"), ("u2", "b"), ("u3", "c")]

    def test_pgvector_sink_against_live_db(self, pg):
        conn, _ = pg
        from jobscrawler_ray.sources.db_sink import PgVectorEmbeddingSink

        tbl = f"jcr_vec_{uuid.uuid4().hex[:8]}"
        with conn.cursor() as cur:
            try:
                cur.execute("CREATE EXTENSION IF NOT EXISTS vector")
                cur.execute(f"CREATE TABLE {tbl} "
                            f"(id integer UNIQUE, embedding vector(2))")
            except Exception:
                conn.rollback()
                pytest.skip("pgvector extension unavailable on this DB")
        conn.commit()
        try:
            sink = PgVectorEmbeddingSink(table=tbl, conn=conn)
            sink.write_batch(pa.table({"id": [1], "embedding": [[1.0, 2.0]]}))
            sink.write_batch(pa.table({"id": [1], "embedding": [[9.0, 9.0]]}))
            with conn.cursor() as cur:
                cur.execute(f"SELECT embedding FROM {tbl} WHERE id=1")
                assert "9" in str(cur.fetchone()[0])
        finally:
            with conn.cursor() as cur:
                cur.execute(f"DROP TABLE IF EXISTS {tbl}")
            conn.commit()


class TestWebhookNotifierSeam:
    """S12: the reference ships log summaries to a Discord webhook
    (src/logs_in_discord.py:55-124 — one summary message as a JSON code
    block, chunked under the 2000-char limit). Loopback server captures
    the POSTs; a real (tiny) crawl exercises the CrawlConfig wiring."""

    @pytest.fixture()
    def webhook(self):
        import http.server
        import threading

        bodies = []

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                bodies.append(self.rfile.read(n))
                self.send_response(204)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        yield f"http://127.0.0.1:{srv.server_address[1]}/hook", bodies
        srv.shutdown()

    def test_summary_single_post(self, webhook):
        import json

        from jobscrawler_ray.sources.notify import WebhookNotifier

        url, bodies = webhook
        n = WebhookNotifier(url).send_summary("crawl summary",
                                              {"job_records": 44, "waves": 3})
        assert n == 1 and len(bodies) == 1
        msg = json.loads(bodies[0])["content"]
        assert msg.startswith("**crawl summary**") and '"job_records": 44' in msg

    def test_large_summary_chunks(self, webhook):
        import json

        from jobscrawler_ray.sources import notify

        url, bodies = webhook
        big = {f"site_{i:04d}": {"records": i, "errors": 0}
               for i in range(200)}
        n = notify.WebhookNotifier(url).send_summary("big", big)
        assert n == len(bodies) and n > 1  # title + >=1 chunk
        # chunks reassemble to the full JSON body
        chunks = [json.loads(b)["content"] for b in bodies[1:]]
        joined = "".join(c.removeprefix("```json\n").removesuffix("\n```")
                         for c in chunks)
        assert json.loads(joined) == big

    def test_run_crawl_wiring_and_best_effort(self, webhook, ray_session,
                                              tmp_path):
        import json

        from jobscrawler_ray.pipelines.crawl import CrawlConfig, run_crawl
        from jobscrawler_ray.synth.world import WorldParams

        url, bodies = webhook
        params = WorldParams(seed=5, n_sites=2, pages_per_site=1,
                             jobs_per_page=2)
        s = run_crawl(params, str(tmp_path / "c1"),
                      CrawlConfig(notify_webhook=url))
        assert len(bodies) >= 1
        msg = json.loads(bodies[-1])["content"]
        assert f'"job_records": {s["job_records"]}' in msg
        assert "seen_membership" not in msg
        # best-effort: a dead webhook warns, never raises
        with pytest.warns(UserWarning, match="webhook notify failed"):
            s2 = run_crawl(params, str(tmp_path / "c2"),
                           CrawlConfig(notify_webhook="http://127.0.0.1:1/x"))
        assert s2["job_records"] == s["job_records"]
        # resumed-complete runs alert too (regression: the early-return
        # path skipped _notify)
        n_before = len(bodies)
        s3 = run_crawl(params, str(tmp_path / "c1"),
                       CrawlConfig(notify_webhook=url), resume=True)
        assert s3.get("resumed_complete") and len(bodies) > n_before
