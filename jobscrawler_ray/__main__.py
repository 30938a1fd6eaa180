"""CLI — the user surface that mirrors the reference's entry point.

The reference is driven by ``main.sh`` → ``src/main.py``: run every
crawl strategy concurrently, then embed the latest crawled rows
(``src/main.py:25-51``). Here the same workflow is subcommands over the
Ray-Data engine:

    python -m jobscrawler_ray crawl   --out /tmp/run1
    python -m jobscrawler_ray recrawl --prior /tmp/run1 --out /tmp/run2 --budget 32
    python -m jobscrawler_ray embed   --crawl-out /tmp/run1 --out /tmp/run1/embeddings
    python -m jobscrawler_ray run     --out /tmp/run1          # crawl → embed (the main.py twin)
    python -m jobscrawler_ray query   pricing_summary --sf-dir /root/testdata/sf0.01

The CLI owns the Ray session (init guarded, shutdown at exit) — library
code never calls ``ray.init`` (driver contract).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd


def _ensure_ray() -> bool:
    """Init Ray if nothing owns a session yet; True iff we started it
    (and should therefore shut it down on exit)."""
    import logging

    import ray

    started = not ray.is_initialized()
    if started:
        # honor RAY_ADDRESS so `ray job submit -- python -m
        # jobscrawler_ray ...` joins the submitting cluster; standalone
        # runs (no variable) stay a private local instance
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # a shuffle stage emitting an EMPTY partition block triggers a
    # spurious "new schema: ." divergence warning per empty block
    for noisy in ("ray.data._internal.execution.streaming_executor_state",
                  "ray.data._internal.execution.resource_manager"):
        logging.getLogger(noisy).setLevel(logging.ERROR)
    return started


def _world(args: argparse.Namespace):
    from .synth.world import WorldParams

    return WorldParams(seed=args.seed, n_sites=args.sites,
                       pages_per_site=args.pages, jobs_per_page=args.jobs)


def _add_world_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--sites", type=int, default=6)
    p.add_argument("--pages", type=int, default=2)
    p.add_argument("--jobs", type=int, default=4)


def _print_summary(s: dict) -> None:
    for k in ("job_records", "image_caption", "waves", "seen_total",
              "recrawl_generation", "listings_refetched",
              "listings_deferred"):
        if k in s:
            print(f"{k}: {s[k]}")


def cmd_crawl(args: argparse.Namespace) -> int:
    from .pipelines.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(max_waves=args.max_waves,
                      checkpoint_every=args.checkpoint_every)
    s = run_crawl(_world(args), args.out, cfg, resume=args.resume)
    _print_summary(s)
    return 0


def cmd_recrawl(args: argparse.Namespace) -> int:
    from .pipelines.crawl import CrawlConfig, run_recrawl

    cfg = CrawlConfig(max_waves=args.max_waves,
                      checkpoint_every=args.checkpoint_every)
    s = run_recrawl(_world(args), args.prior, args.out, cfg,
                    budget=args.budget, resume=args.resume)
    _print_summary(s)
    return 0


def _embed_records(crawl_out: str, out: str, since_days: int | None) -> int:
    """Embed the latest crawled job records — the Ray-Data twin of the
    reference's ``embed_data`` (``embed_latest_crawled_data.py:135-177``):
    watermark filter (max timestamp − N days), the shared e5 passage
    format (``stages/embed.py:format_passage``), 1000-token truncation,
    actor-pool batched inference. The landing dir is REPLACED per run
    (the parquet twin of ON CONFLICT UPDATE: re-embedding the same ids
    yields the same vectors, and stale rows never accumulate)."""
    import glob as _glob
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as papq
    import ray.data as rd

    from .pipelines.queries import _max_ts
    from .stages.embed import EmbedDocuments, format_passage

    shutil.rmtree(out, ignore_errors=True)  # REPLACE semantics even on
    # the zero-record path: stale rows from a prior embed must not
    # survive a zero-delta re-run
    files = sorted(_glob.glob(os.path.join(crawl_out, "job_records",
                                           "**", "*.parquet"),
                              recursive=True))
    if not files:  # zero-delta recrawl output: nothing to embed
        print(f"embeddings: 0 -> {out} (no job records under {crawl_out})")
        return 0
    ds = rd.read_parquet(files, columns=["url_sha1", "title",
                                         "description", "timestamp"])
    if since_days is not None:
        wm = _max_ts(ds, "timestamp") - pd.Timedelta(days=since_days)
        cutoff = pa.scalar(wm.to_pydatetime(), type=pa.timestamp("us"))
        ds = ds.map_batches(
            lambda t: t.filter(pc.greater(t["timestamp"], cutoff)),
            batch_format="pyarrow")

    class EmbedPassages(EmbedDocuments):
        """Same model actor, record passages instead of doc wraps."""

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vecs = self._embed([
                format_passage(ti, de)
                for ti, de in zip(df["title"], df["description"])
            ])
            return pd.DataFrame({"url_sha1": df["url_sha1"].to_numpy(),
                                 "embedding": list(vecs)})

    emb = ds.map_batches(EmbedPassages, batch_format="pandas",
                         batch_size=128, concurrency=2, num_cpus=1)
    emb.write_parquet(out)
    n = sum(
        papq.ParquetFile(os.path.join(out, f)).metadata.num_rows
        for f in os.listdir(out) if f.endswith(".parquet")
    )
    print(f"embeddings: {n} -> {out}")
    return 0


def cmd_embed(args: argparse.Namespace) -> int:
    return _embed_records(args.crawl_out, args.out, args.since_days)


def cmd_run(args: argparse.Namespace) -> int:
    """The reference ``main.py`` workflow: all crawl strategies, then
    embed the latest crawled data."""
    rc = cmd_crawl(args)
    if rc:
        return rc
    return _embed_records(args.out, os.path.join(args.out, "embeddings"),
                          args.since_days)


def cmd_query(args: argparse.Namespace) -> int:
    from .pipelines.queries import QUERIES

    res = QUERIES[args.name](args.sf_dir)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if isinstance(df, np.ndarray):  # pragma: no cover - defensive
        df = pd.DataFrame(df)
    if getattr(args, "stats", False) and hasattr(res, "stats"):
        # per-operator wall/CPU/rows of the RETURNED plan; queries
        # that execute earlier passes eagerly (centroid training, the
        # DSIR counts pass) show only their final pipeline here
        print(res.stats(), file=sys.stderr)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        df.to_parquet(args.out)
        print(f"{len(df)} rows -> {args.out}")
    else:
        with pd.option_context("display.width", 200,
                               "display.max_columns", 20):
            print(df.head(args.limit).to_string(index=False))
        print(f"({len(df)} rows)")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="jobscrawler_ray",
                                 description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("crawl", help="run a full crawl")
    p.add_argument("--out", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-waves", type=int, default=64)
    p.add_argument("--checkpoint-every", type=int, default=1)
    _add_world_args(p)
    p.set_defaults(fn=cmd_crawl)

    p = sub.add_parser("recrawl", help="incremental recrawl from a prior out dir")
    p.add_argument("--prior", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--budget", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-waves", type=int, default=64)
    p.add_argument("--checkpoint-every", type=int, default=1)
    _add_world_args(p)
    p.set_defaults(fn=cmd_recrawl)

    p = sub.add_parser("embed", help="embed the latest crawled job records")
    p.add_argument("--crawl-out", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--since-days", type=int, default=7,
                   help="watermark window (None-able via -1 = embed all)")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("run", help="crawl, then embed (the reference main.py workflow)")
    p.add_argument("--out", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-waves", type=int, default=64)
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--since-days", type=int, default=7)
    _add_world_args(p)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("query", help="run a catalog query over an sf dir")
    p.add_argument("name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None, help="write parquet instead of printing")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--stats", action="store_true",
                   help="print the returned pipeline's per-stage Ray Data "
                        "execution stats to stderr (eager pre-passes of "
                        "multi-pass queries are not included)")
    p.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    if getattr(args, "since_days", 0) == -1:
        args.since_days = None
    if args.fn is cmd_query:  # validate before paying the Ray spin-up
        from .pipelines.queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; choices:\n  "
                  + "\n  ".join(sorted(QUERIES)), file=sys.stderr)
            return 2
    started = _ensure_ray()
    try:
        return args.fn(args)
    finally:
        if started:  # never tear down a session someone else owns
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
