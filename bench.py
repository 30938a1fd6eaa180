"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "crawl": {"urls": U, "images": I, "sec": S,
               "urls_per_sec": ..., "images_per_sec": ...}}

``--scaling``: runs the crawl headline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs plus efficiency = (thr_32/thr_8)/4 (the sandbox stand-in
for the north_rule's N→4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench-tier synthetic worlds (FIXTURES.md): enough distinct hosts that
# politeness is not the scaling ceiling
BENCH_WORLD = dict(seed=42, n_sites=64, pages_per_site=6, jobs_per_page=20,
                   politeness_rps=100_000)
# scaling world: ~595k URLs / ~364k images over 4 waves so the run is
# long next to the ~5s session floor (actor spawn + first-exec worker
# pool); small images keep the single test disk (~300 MB/s, does not
# scale with CPUs) a minor fraction — on a real N→4N NODE cluster each
# node adds its own disk + memory bandwidth, which is what the
# north-rule criterion measures (see BASELINE.md machine-ceiling data)
SCALING_WORLD = dict(seed=42, n_sites=1024, pages_per_site=24, jobs_per_page=40,
                     politeness_rps=100_000, img_min=16, img_max=48)

QUERY_NAMES = [
    "pricing_summary",
    "join_orders_lineitem",
    "windowed_events",
    "exact_dedup_events",
    "quality_scores",
    "minhash_lsh",
    "knn_cosine",
    "embedding_neardup",
]


def run_crawl_bench(world: dict | None = None, assemble: bool = True) -> dict:
    from jobscrawler_ray.pipelines.crawl import CrawlConfig, run_crawl, fetch_log
    from jobscrawler_ray.synth.world import WorldParams

    out = "/tmp/bench_crawl"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    # Shard count sizes STATE distribution, not parallelism (the wave
    # loop is map-only; fetch parallelism = wave_blocks). On one node,
    # 16+16 zero-CPU actors hold 256 hosts comfortably; on a real
    # N-node cluster you'd scale shards with nodes. 128 actors cost
    # ~9s of process spawn before wave 0 — pure fixed floor.
    shards = int(os.environ.get("GRAFT_SHARDS", "16"))
    summary = run_crawl(
        WorldParams(**(world or BENCH_WORLD)),
        out,
        CrawlConfig(num_seen_shards=shards, num_pol_shards=shards,
                    exact_sidecar=False,
                    seen_capacity_per_shard=1 << 19, assemble=assemble,
                    detailed_metrics=False,
                    checkpoint_every=int(os.environ.get("GRAFT_CKPT_EVERY", "1"))),
    )
    sec = time.time() - t0
    if os.environ.get("GRAFT_TIMING"):
        from jobscrawler_ray.state.checkpoint import all_manifests

        for m in all_manifests(out):
            print(f"# wave {m.wave} timing: {m.metrics.get('timing')}",
                  file=sys.stderr)
    urls = int(fetch_log(out)["canon_url"].count())
    images = int(summary["image_caption"])
    return {
        "sec": round(sec, 2),
        "urls": urls,
        "images": images,
        "records": int(summary["job_records"]),
        "waves": summary["waves"],
        "urls_per_sec": round(urls / sec, 1),
        "images_per_sec": round(images / sec, 1),
    }


def run_queries_bench() -> dict:
    import ray.data

    from jobscrawler_ray.pipelines.queries import QUERIES

    times = {}
    for name in QUERY_NAMES:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        # consume: Datasets are lazy — materialize the (small) result
        if isinstance(res, ray.data.Dataset):
            res.to_pandas()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # warm the page cache so we measure compute + shuffle, not first read
    for name in ("lineitem", "orders", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            with open(p, "rb") as f:
                f.read()

    load_start = os.getloadavg()
    crawl = run_crawl_bench()
    queries = run_queries_bench()
    total = crawl["sec"] + sum(queries.values())
    out = {
        "metric": "crawl+queries wall seconds (crawl: synthetic frontier fetch+dedup; queries: sf tables)",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NUM_CPUS,
        "crawl": crawl,
    }
    # regression guard: per-query quiet-host budgets (BUDGETS.json,
    # refreshed each round) + the load average that contextualizes any
    # delta — this shared host inflates wall time 10-80% under load,
    # so a delta is only a REGRESSION signal when load was quiet
    out["load_avg"] = [round(x, 2) for x in load_start]
    bpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BUDGETS.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            budgets = json.load(f)
        timed = dict(queries)
        timed["crawl"] = crawl["sec"]
        delta = {
            k: round(100.0 * (timed[k] / b - 1.0), 1)
            for k, b in budgets.get("quiet_host_sec", {}).items()
            # a zero/null/negative budget entry must not crash the
            # whole bench at report time — skip it instead
            if k in timed and isinstance(b, (int, float)) and b > 0
        }
        noise = budgets.get("noise_pct", 35)
        out["budget_delta_pct"] = delta
        out["over_budget"] = sorted(
            k for k, d in delta.items() if d > noise)
    ray.shutdown()
    return out


def run_at(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
               GRAFT_CRAWL_ONLY="1")
    p = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       capture_output=True, text=True, check=True)
    return json.loads(p.stdout.strip().splitlines()[-1])


def scaling() -> None:
    # N and 4N (default 2→8); override with GRAFT_SCALE_LO/HI, e.g. 8→32.
    # 2→8 is the pair where this shared box's memory bandwidth is not
    # yet saturated, isolating ENGINE scaling from single-host hardware
    # contention (a real cluster adds bandwidth/disk per node; this box
    # does not — its own 8→32 multiprocessing ceiling is 0.66-0.83).
    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", str(4 * lo)))
    r_lo, r_hi = run_at(lo), run_at(hi)
    thr_lo = r_lo["crawl"]["urls_per_sec"]
    thr_hi = r_hi["crawl"]["urls_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"crawl throughput scaling (num_cpus {lo} vs {hi})",
        f"urls_per_sec_{lo}": thr_lo,
        f"urls_per_sec_{hi}": thr_hi,
        f"images_per_sec_{lo}": r_lo["crawl"]["images_per_sec"],
        f"images_per_sec_{hi}": r_hi["crawl"]["images_per_sec"],
        f"sec_{lo}": r_lo["crawl"]["sec"],
        f"sec_{hi}": r_hi["crawl"]["sec"],
        "scaling_efficiency": round(eff, 3),
    }))


def synth_docs(n: int, out_path: str, seed: int = 13,
               dup_every: int = 100, longtail_terms: int = 0) -> None:
    """Deterministic documents table at stress scale (same schema as
    testdata: doc_id, text, lang, source, n_chars). Every
    ``dup_every``-th doc is a 2-token mutation of its predecessor → a
    planted near-dup rate (1% default; dup_every=4 gives the realistic
    25% web rate). ``longtail_terms`` appends that many doc-unique
    tokens per doc to blow the vocabulary up to n×longtail_terms
    distinct terms (the tfidf DF-broadcast killer). Row groups are
    small enough that doc_id-pruned reads (decon bench set, LSH verify)
    skip most of the file."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(480)]
                     + ["the", "a", "of", "to", "and"] * 4)  # stopwords
    lens = rng.integers(40, 120, size=n)
    texts: list[str] = []
    for i in range(n):
        if i % dup_every == dup_every - 1 and texts:  # near-dup of pred.
            toks = texts[-1].split(" ")
            for j in rng.integers(0, len(toks), size=2):
                toks[j] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(toks))
        else:
            body = " ".join(vocab[rng.integers(0, len(vocab), size=lens[i])])
            if longtail_terms:
                body += " " + " ".join(
                    f"u{i}x{j}" for j in range(longtail_terms))
            texts.append(body)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.where(rng.random(n) < 0.6, "en", "de")),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, size=n)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pq.write_table(tbl, out_path, row_group_size=8192)


def synth_vecs(n: int, out_path: str, dim: int = 64, seed: int = 17,
               dup_every: int = 100) -> None:
    """Deterministic embeddings table at stress scale (same schema as
    testdata: vec_id, embedding FLOAT[dim], label). Every
    ``dup_every``-th vector is its predecessor plus 1% noise → a
    planted ~1/dup_every near-dup rate at cosine ≈ 0.9999 (default 1%;
    --dupstress uses 4 for a realistic 25%). Small row groups keep the
    vec_id-pruned query-side reads (kNN, IVF probes) cheap."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    dup = np.arange(dup_every - 1, n, dup_every)
    mat[dup] = mat[dup - 1] + 0.01 * rng.standard_normal(
        (dup.size, dim)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), dim).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
    })
    pq.write_table(tbl, out_path, row_group_size=8192)


def _stress(query_names: list[str], table_dir: str, metric: str,
            n: int, unit: str) -> None:
    """Shared stress-bench runner (one scaffold for the doc/vec
    variants): a Ray session over a pre-synthesized /tmp table,
    per-query wall time + row counts, one JSON line."""
    import ray
    from ray.data import DataContext

    from jobscrawler_ray.pipelines.queries import QUERIES

    only = os.environ.get("GRAFT_STRESS_ONLY")
    if only:
        pick = {s.strip() for s in only.split(",") if s.strip()}
        query_names = [q for q in query_names if q in pick]

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    times, rows = {}, {}
    for name in query_names:
        t0 = time.time()
        res = QUERIES[name](table_dir)
        rows[name] = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(res)
        times[name] = round(time.time() - t0, 2)
    ray.shutdown()
    print(json.dumps({
        "metric": metric, "num_cpus": NUM_CPUS, f"n_{unit}": n,
        "queries": times, "rows": rows,
        f"{unit}_per_sec": {k: round(n / v, 0) for k, v in times.items()},
    }))


def synth_join_tables(n: int, out_dir: str, seed: int = 7) -> None:
    """Deterministic events/orders/lineitem tables at join-stress
    scale (only the columns the two inequality joins read). Written
    as 256k-row files so the read fans out."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    us_day = 86_400_000_000
    base = np.int64(1_577_836_800_000_000)  # 2020-01-01 in epoch us
    span = np.int64(730) * us_day

    def _write(name: str, tbl: pa.Table) -> None:
        path = os.path.join(out_dir, name)
        step = 262_144
        writer = pq.ParquetWriter(path, tbl.schema)
        for lo in range(0, tbl.num_rows, step):
            writer.write_table(tbl.slice(lo, step))
        writer.close()

    ts = (base + rng.integers(0, span, size=n)).astype("datetime64[us]")
    _write("events.parquet", pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, max(n // 200, 1), size=n,
                                         dtype=np.int64)),
        # all five catalog event types (v3) so the funnel's stages are
        # populated; the as-of join's error/click slice is now 2/5 of
        # rows (was 2/3 in v1) — noted with the recorded numbers
        "event_type": pa.array(
            np.array(["view", "click", "purchase", "error", "signup"],
                     dtype=object)[rng.integers(0, 5, size=n)],
            type=pa.string()),
        "value": pa.array(np.round(rng.random(n) * 300.0, 2)),
    }))
    n_ord = max(n // 4, 1)
    n_cust = max(n_ord // 10, 1)
    # orders/lineitem live on the testdata's 1995-2001 calendar so the
    # TPC-H-shaped fixed windows (1997…) select the same ~fraction they
    # do on the driver tables; events keep their own base (its queries
    # use relative/watermark windows only).
    base_ol = np.int64(788_918_400_000_000)  # 1995-01-01 in epoch us
    span_ol = np.int64(2400) * us_day
    odate = (base_ol + (rng.integers(0, span_ol, size=n_ord) // us_day)
             * us_day).astype("datetime64[us]")
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                     "5-LOW"], dtype=object)
    _write("orders.parquet", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_orderdate": pa.array(odate),
        "o_custkey": pa.array(rng.integers(0, n_cust,
                                           size=n_ord, dtype=np.int64)),
        "o_totalprice": pa.array(
            np.round(900.0 + rng.random(n_ord) * 454100.0, 2)),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, size=n_ord)],
                                    type=pa.string()),
        "o_orderstatus": pa.array(
            np.array(["P", "O", "F"], dtype=object)[
                rng.integers(0, 3, size=n_ord)], type=pa.string()),
    }))
    seg = np.array(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING",
                    "FURNITURE"], dtype=object)
    _write("customer.parquet", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_acctbal": pa.array(
            np.round(-1000.0 + rng.random(n_cust) * 11000.0, 2)),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n_cust,
                                             dtype=np.int32)),
        "c_mktsegment": pa.array(seg[rng.integers(0, 5, size=n_cust)],
                                 type=pa.string()),
    }))
    n_part = max(n // 25, 1)
    _write("part.parquet", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_brand": pa.array(
            np.array([f"Brand#{i}" for i in range(1, 26)], dtype=object)[
                rng.integers(0, 25, size=n_part)], type=pa.string()),
        "p_type": pa.array(
            np.array(["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL",
                      "ECONOMY"], dtype=object)[
                rng.integers(0, 6, size=n_part)], type=pa.string()),
        "p_size": pa.array(rng.integers(1, 51, size=n_part,
                                        dtype=np.int32)),
    }))
    n_sup = max(n // 500, 1)
    _write("supplier.parquet", pa.table({
        "s_suppkey": pa.array(np.arange(n_sup, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_sup)],
                           type=pa.string()),
        "s_acctbal": pa.array(
            np.round(-1000.0 + rng.random(n_sup) * 11000.0, 2)),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n_sup,
                                             dtype=np.int32)),
    }))
    _write("nation.parquet", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)],
                           type=pa.string()),
        "n_regionkey": pa.array((np.arange(25, dtype=np.int32) % 5)),
    }))
    sdate = (base_ol + (rng.integers(0, span_ol, size=n) // us_day)
             * us_day).astype("datetime64[us]")
    _write("lineitem.parquet", pa.table({
        "l_shipdate": pa.array(sdate),
        "l_orderkey": pa.array(rng.integers(0, n_ord, size=n,
                                            dtype=np.int64)),
        "l_suppkey": pa.array(rng.integers(0, max(n // 500, 1), size=n,
                                           dtype=np.int64)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"], dtype=object)[
                rng.integers(0, 3, size=n)], type=pa.string()),
        "l_linestatus": pa.array(
            np.array(["F", "O"], dtype=object)[
                rng.integers(0, 2, size=n)], type=pa.string()),
        "l_extendedprice": pa.array(
            np.round(900.0 + rng.random(n) * 104100.0, 2)),
        "l_discount": pa.array(np.round(rng.random(n) * 0.1, 2)),
        "l_quantity": pa.array(
            rng.integers(1, 51, size=n).astype(np.float64)),
        "l_partkey": pa.array(rng.integers(0, max(n // 25, 1), size=n,
                                           dtype=np.int64)),
    }))


def joinstress() -> None:
    """Inequality-join stress: the as-of and banded range joins over
    ~50× the sf0.1 events table (GRAFT_JOIN_N, default 5M events, 5M
    lineitems, 1.25M orders). Reported rows/s per op → BASELINE.md."""
    n = int(os.environ.get("GRAFT_JOIN_N", "5000000"))
    # v5: + priority/status/discount + part/supplier/nation dims for the
    # TPC-H decision-support family (#117-128)
    d = f"/tmp/bench_join_{n}_v5"
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(os.path.join(d, "lineitem.parquet")):
        t0 = time.time()
        synth_join_tables(n, d)
        print(f"# synthesized join tables ({n} rows) in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
    _stress(["asof_join_clicks", "range_join_shipments",
             "pivot_events", "group_quantiles", "cube_lineitem",
             "pagerank_orders", "lag_delta_events", "funnel_conversions",
             "retention_cohorts", "custdist_orders", "small_qty_revenue",
             "large_orders_qty", "user_top_event",
             "distinct_users_per_type", "user_daily_gapfill",
             "hopping_distinct_users",
             "order_priority_counts", "priority_linecounts",
             "promo_revenue_pct", "top_supplier_revenue",
             "brand_supplier_cnt", "disjunctive_revenue",
             "waiting_suppliers", "idle_rich_customers",
             "unshipped_orders_topk", "cheapest_supplier_per_part",
             "nation_trade_matrix", "rolling_avg_user_value",
             # v6 additions: warehouse trio + graph family. NOTE the
             # synthetic parts are uniform-random, so the support>=2
             # co-purchase graph is SPARSE (~1-2k edges at 5M rows) —
             # triangle_count / bfs_reach here measure the pair-mining
             # pass (their honest dominant cost); graph-stage-heavy
             # timings live in BASELINE.md's sf0.1 notes where the
             # part dimension is dense.
             "merge_upsert_users", "pareto_customers", "part_copurchase",
             "triangle_count", "bfs_reach", "decayed_revenue",
             "price_histogram", "audience_overlap", "kcore_parts",
             # v7 additions: interval sweep + SCD2 + two-pass moments +
             # histogram-fence outliers
             "peak_concurrency", "scd2_intervals", "corr_price_qty",
             "iqr_outliers",
             # v8 additions: calendar heatmap + grouped bottom-k +
             # prefix-max drawdown scan
             "activity_heatmap", "group_bottomk_sample",
             "price_drawdown", "kmv_jaccard", "graph_walks",
             "approx_distinct_by_type", "zorder_layout",
             "geo_mean_prices",
             # v9 additions: streaming debounce + attribution + RFM +
             # A/B test + MV maintenance + zonemap planning +
             # Jaccard link prediction
             "window_dedup", "attribution_last_touch", "rfm_scores",
             "ab_test_welch", "incremental_agg_merge",
             "zonemap_prune", "copurchase_jaccard",
             "session_windows", "session_bounce_rate",
             "funnel_time_to_convert", "price_trend_by_priority",
             "ks_test", "benford_deviation", "late_event_rate"], d,
            f"inequality-join + relational-op stress ({n} rows)", n, "rows")


VECSTRESS_QUERIES = ["knn_cosine", "ann_dim_recall", "embedding_neardup_ann", "ann_ivf",
                     "kmeans_assign", "semantic_dedup",
                     "pq_encode", "ann_pq", "ann_ivfpq",
                     "class_cohesion", "bitext_mine",
                     "hard_negatives"]


def vecstress() -> None:
    """ANN-family stress: 100× the sf0.1 embeddings table
    (GRAFT_VECS_N, default 200k) at 256-d. Dim matters: cosine
    concentration for random vectors is ~1/sqrt(dim), so at the
    catalog's tau=0.4 a 64-d corpus of 200k random vectors has ~1e5
    chance cross-pairs (3.2 sigma), drowning the planted dups; at 256-d
    (6.4 sigma) the expected random-pair count is ~0 and the pair set
    is the planted near-dup rate. Reported vecs/s per op → BASELINE.md.
    The exact O(N²) blocked all-pairs is deliberately NOT in the list —
    ``embedding_neardup_ann`` is the scale path."""
    n = int(os.environ.get("GRAFT_VECS_N", "200000"))
    d = f"/tmp/bench_vecs_{n}"
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "embeddings.parquet")
    if not os.path.exists(path):
        synth_vecs(n, path, dim=256)
    _stress(VECSTRESS_QUERIES, d, f"ANN-family stress ({n} vecs x 256d)",
            n, "vecs")


def synth_images(n: int, out_dir: str, seed: int = 23,
                 dup_every: int = 100) -> None:
    """Deterministic image_caption table at stress scale (same columns
    the crawl assembles: image_id, bytes, w, h, fmt, caption, phash).
    Every ``dup_every``-th image re-renders its predecessor's structure
    seed at a DIFFERENT size → a planted near-dup rate (1% default;
    dup_every=4 gives the realistic 25% web rate) that exercises the
    resize-robustness of phash, not byte equality. Written as many
    4096-row files (a single parquet file reads as ONE task and paces
    the whole downstream pipeline)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobscrawler_ray.functions import codecs

    tbl_dir = os.path.join(out_dir, "image_caption")
    os.makedirs(tbl_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    fmts = ["raw", "pngz", "qjpg"]
    dims = rng.integers(16, 65, size=(n, 2))
    chunk: list[tuple] = []
    part = 0
    prev_seed = 0
    for i in range(n):
        if i % dup_every == dup_every - 1 and i > 0:
            s64 = prev_seed  # same structure, different size → near-dup
            w, h = int(dims[i - 1][0] // 2 + 8), int(dims[i - 1][1] // 2 + 8)
        else:
            s64 = (seed << 32) ^ i
            w, h = int(dims[i][0]), int(dims[i][1])
            prev_seed = s64
        px = codecs.gen_pixels(s64, w, h)
        fmt = fmts[i % 3]
        chunk.append((
            hashlib.sha1(f"img{i}".encode()).hexdigest(),
            codecs.encode(px, fmt), w, h, fmt,
            f"synthetic scene {i} with {i % 7 + 2} objects rendered at "
            f"quality {i % 5}",
            codecs.phash64(px),
        ))
        if len(chunk) == 4096 or i == n - 1:
            cols = list(zip(*chunk))
            pq.write_table(pa.table({
                "image_id": pa.array(cols[0], type=pa.string()),
                "bytes": pa.array(cols[1], type=pa.binary()),
                "w": pa.array(cols[2], type=pa.int32()),
                "h": pa.array(cols[3], type=pa.int32()),
                "fmt": pa.array(cols[4], type=pa.string()),
                "caption": pa.array(cols[5], type=pa.string()),
                "phash": pa.array(cols[6], type=pa.int64()),
            }), os.path.join(tbl_dir, f"part-{part:05d}.parquet"))
            part += 1
            chunk = []


IMGSTRESS_QUERIES = ["curate_image_corpus", "aspect_buckets",
                     "image_training_manifest", "clip_align",
                     "image_fidelity",
                     "phash_knn", "phash_neardup", "phash_dedup_keep",
                     "image_neardup_verified", "cdc_chunks",
                     "image_patches", "image_color_hist",
                     "dhash_neardup", "webdataset_shards"]


def imgstress() -> None:
    """Image-pipeline stress (the graft cell's payload): curation,
    bucketing, retrieval and near-dup removal over a synthetic
    image_caption table ~1000× the sf0.1 crawl output (GRAFT_IMGS_N,
    default 100k images). The image queries consume the crawl's output
    table, so the pre-synthesized table is seeded into the query
    layer's crawl cache — the queries themselves run unmodified."""
    n = int(os.environ.get("GRAFT_IMGS_N", "100000"))
    d = f"/tmp/bench_imgs_{n}"
    out = os.path.join(d, "crawl")
    if not os.path.isdir(os.path.join(out, "image_caption")):
        t0 = time.time()
        synth_images(n, out)
        print(f"# synthesized {n} images in {time.time() - t0:.1f}s",
              file=sys.stderr)
    from jobscrawler_ray.pipelines import queries as q

    q._CRAWL_CACHE[d] = out
    _stress(IMGSTRESS_QUERIES, d, f"image-pipeline stress ({n} images)",
            n, "images")


DOCSTRESS_QUERIES = ["token_counts", "quality_filter", "curate_corpus",
                     "decontaminate_docs", "dsir_weights",
                     "substring_dup_spans", "substring_dedup_rewrite",
                     "bm25_topk", "shuffle_shards",
                     "minhash_lsh", "minhash_dedup_keep", "simhash",
                     "simhash_neardup", "langid", "fingerprints",
                     "ccnet_perplexity", "weighted_sample",
                     "global_rank_docs", "bigram_lift", "kn_continuation",
                     "pii_redact", "vad_segments", "bpe_merge_pairs",
                     "line_dedup", "bpe_encode",
                     "skipgram_pairs", "minhash_dedup_best",
                     "asr_chunks", "audio_spectral",
                     "dup_cluster_sizes", "boilerplate_lines",
                     "mixture_upsample", "percent_rank_docs",
                     "bigram_lm_score", "padding_efficiency",
                     "vocab_coverage", "source_kl_divergence",
                     "dup_rate_by_source", "logreg_train_score",
                     "pairwise_js_divergence", "detector_agreement",
                     "zipf_fit", "minhash_band_curve"]


def docstress() -> None:
    """Text-pipeline stress: the curation/dedup family over a corpus
    ~40× the sf0.1 documents table (GRAFT_DOCS_N, default 200k docs /
    ~16M tokens). Reported docs/s per op → BASELINE.md."""
    n = int(os.environ.get("GRAFT_DOCS_N", "200000"))
    d = f"/tmp/bench_docs_{n}"
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "documents.parquet")
    if not os.path.exists(path):
        synth_docs(n, path)
    _stress(DOCSTRESS_QUERIES, d, f"text-pipeline stress ({n} docs)",
            n, "docs")


def dupstress() -> None:
    """Dedup-KEEP tail at a REALISTIC web near-dup rate (25% planted,
    dup_every=4) with the drop-set broadcast DISABLED — proves the
    keep path stays distributed end-to-end (no driver drop-set, no
    label dicts) with flat driver RSS at a drop volume that is
    corpus-scale. Also runs tfidf over a long-tail vocabulary (100
    doc-unique terms per doc → n×100 distinct terms, naturally above
    ``_DF_BCAST_LIMIT`` at the default 100k tfidf docs → 10M terms),
    which
    forces the distributed DF-attach path. Results are consumed with
    ``.count()`` — pulling the kept corpus to the driver would defeat
    the measurement."""
    import resource

    import ray
    from ray.data import DataContext

    n_docs = int(os.environ.get("GRAFT_DUP_DOCS_N", "200000"))
    n_imgs = int(os.environ.get("GRAFT_DUP_IMGS_N", "50000"))
    n_tfidf = int(os.environ.get("GRAFT_TFIDF_DOCS_N", "100000"))
    ddir = f"/tmp/bench_dup_docs_{n_docs}"
    os.makedirs(ddir, exist_ok=True)
    if not os.path.exists(os.path.join(ddir, "documents.parquet")):
        synth_docs(n_docs, os.path.join(ddir, "documents.parquet"),
                   dup_every=4)
    # tfidf gets its OWN table: 100 doc-unique tokens per doc → n×100
    # distinct terms (10M at the default), WITHOUT inflating the dedup
    # corpora's texts
    tdir = f"/tmp/bench_tfidf_docs_{n_tfidf}"
    os.makedirs(tdir, exist_ok=True)
    if not os.path.exists(os.path.join(tdir, "documents.parquet")):
        synth_docs(n_tfidf, os.path.join(tdir, "documents.parquet"),
                   longtail_terms=100)
    idir = f"/tmp/bench_dup_imgs_{n_imgs}"
    iout = os.path.join(idir, "crawl")
    if not os.path.isdir(os.path.join(iout, "image_caption")):
        t0 = time.time()
        synth_images(n_imgs, iout, dup_every=4)
        print(f"# synthesized {n_imgs} images in {time.time() - t0:.1f}s",
              file=sys.stderr)
    # embedding keep at 25% planted dup rate: above _EMB_KEEP_EXACT_LIMIT
    # the pair source auto-dispatches to the LSH-ANN detector — this run
    # proves the LAST all-pairs kernel is off every stress-scale path
    n_vecs = int(os.environ.get("GRAFT_DUP_VECS_N", "200000"))
    vdir = f"/tmp/bench_dup_vecs_{n_vecs}"
    os.makedirs(vdir, exist_ok=True)
    if not os.path.exists(os.path.join(vdir, "embeddings.parquet")):
        synth_vecs(n_vecs, os.path.join(vdir, "embeddings.parquet"),
                   dim=256, dup_every=4)

    from jobscrawler_ray.pipelines import queries as q

    q._CRAWL_CACHE[idir] = iout
    q._DROP_BCAST_LIMIT = 0  # force the distributed anti-join path

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    def rss_mb() -> int:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    times, rows, rss = {}, {}, {"start": rss_mb()}
    for name, sf in (("minhash_dedup_keep", ddir),
                     ("phash_dedup_keep", idir),
                     ("embedding_dedup_keep", vdir),
                     ("tfidf_top_terms", tdir)):
        t0 = time.time()
        rows[name] = int(q.QUERIES[name](sf).count())
        times[name] = round(time.time() - t0, 2)
        rss[f"after_{name}"] = rss_mb()
    ray.shutdown()
    print(json.dumps({
        "metric": "dedup-keep + tfidf at 25% planted dup rate / 10M-term "
                  "vocab, distributed paths forced",
        "num_cpus": NUM_CPUS, "n_docs": n_docs, "n_imgs": n_imgs,
        "n_vecs": n_vecs, "n_tfidf_docs": n_tfidf,
        "queries": times, "rows": rows,
        "driver_rss_mb": rss,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--docstress" in sys.argv:
        docstress()
    elif "--vecstress" in sys.argv:
        vecstress()
    elif "--dupstress" in sys.argv:
        dupstress()
    elif "--imgstress" in sys.argv:
        imgstress()
    elif "--joinstress" in sys.argv:
        joinstress()
    elif os.environ.get("GRAFT_CRAWL_ONLY"):
        import ray
        from ray.data import DataContext

        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        DataContext.get_current().enable_progress_bars = False
        import logging

        logging.getLogger("ray.data").setLevel(logging.ERROR)
        crawl = run_crawl_bench(world=SCALING_WORLD, assemble=False)
        ray.shutdown()
        print(json.dumps({
            "metric": "crawl wall seconds",
            "value": crawl["sec"],
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR.rstrip("/").split("sf")[-1],
            "num_cpus": NUM_CPUS,
            "crawl": crawl,
        }))
    else:
        print(json.dumps(main()))
