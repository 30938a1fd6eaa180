"""CLI (`python -m jobscrawler_ray`) — the user surface mirroring the
reference's main.sh → src/main.py workflow (crawl every strategy, then
embed the latest rows, src/main.py:25-51). Runs main() in-process under
the shared Ray session; _ensure_ray must not tear that session down."""

import glob
import os

import duckdb
import pytest
import ray

from jobscrawler_ray.__main__ import main


@pytest.fixture(scope="module")
def cli_run(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "run1")
    rc = main(["run", "--out", out, "--sites", "4", "--seed", "11"])
    assert rc == 0
    return out


class TestCli:
    def test_run_crawls_and_embeds(self, cli_run):
        recs = glob.glob(os.path.join(cli_run, "job_records", "*", "*.parquet"))
        assert recs
        n_rec = duckdb.sql(
            f"SELECT count(DISTINCT url_sha1) FROM read_parquet({recs!r}, "
            "union_by_name=true)").fetchone()[0]
        embs = glob.glob(os.path.join(cli_run, "embeddings", "*.parquet"))
        assert embs
        n_emb, dim = duckdb.sql(
            f"SELECT count(DISTINCT url_sha1), min(len(embedding)) "
            f"FROM read_parquet({embs!r})").fetchone()
        # every (7-day-fresh == all, synthetic stamps are per-run) record
        # is embedded exactly once at the model's output dim
        assert n_emb == n_rec > 0
        assert dim == 64

    def test_recrawl_subcommand(self, cli_run, tmp_path):
        out2 = str(tmp_path / "run2")
        rc = main(["recrawl", "--prior", cli_run, "--out", out2,
                   "--sites", "4", "--seed", "11", "--budget", "2"])
        assert rc == 0
        assert os.path.exists(os.path.join(out2, "recrawl_meta.json"))

    def test_embed_rerun_replaces_not_accumulates(self, cli_run, tmp_path):
        emb = str(tmp_path / "emb")
        for _ in range(2):  # second run must REPLACE the landing dir
            assert main(["embed", "--crawl-out", cli_run,
                         "--out", emb]) == 0
        files = glob.glob(os.path.join(emb, "*.parquet"))
        n, d = duckdb.sql(
            f"SELECT count(*), count(DISTINCT url_sha1) "
            f"FROM read_parquet({files!r})").fetchone()
        assert n == d  # no duplicate rows per url_sha1

    def test_embed_zero_delta_is_clean(self, cli_run, tmp_path, capsys):
        """Recrawl of an unchanged world yields no job records; embed
        over that output must report 0, not crash."""
        out2 = str(tmp_path / "same")
        assert main(["recrawl", "--prior", cli_run, "--out", out2,
                     "--sites", "4", "--seed", "11"]) == 0
        assert main(["embed", "--crawl-out", out2,
                     "--out", str(tmp_path / "emb0")]) == 0
        assert "embeddings: 0" in capsys.readouterr().out

    def test_query_subcommand_writes_parquet(self, cli_run, tmp_path):
        dst = str(tmp_path / "q.parquet")
        rc = main(["query", "length_histogram",
                   "--sf-dir", "/root/testdata/sf0.001", "--out", dst])
        assert rc == 0
        assert duckdb.sql(
            f"SELECT sum(n) FROM read_parquet('{dst}')").fetchone()[0] == 500

    def test_query_stats_flag_prints_plan(self, cli_run, capsys):
        rc = main(["query", "length_histogram",
                   "--sf-dir", "/root/testdata/sf0.001", "--stats"])
        assert rc == 0
        err = capsys.readouterr().err
        # the executed plan's per-operator block, not an empty string
        assert "Operator" in err or "Stage" in err

    def test_query_unknown_name_errors(self, cli_run, capsys):
        assert main(["query", "not_a_query"]) == 2
        assert "choices" in capsys.readouterr().err

    def test_cli_leaves_shared_session_alive(self, cli_run):
        assert ray.is_initialized()
