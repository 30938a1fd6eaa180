"""Query catalog: every SURVEY.md §2 operator family re-expressed
Ray-Data-first over the driver's TPC-H-ish tables, plus the
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal stubs).

Each entry is ``name -> callable(sf_dir) -> Dataset | DataFrame``;
``ORACLE_SQL[name]`` is the DuckDB-equivalent ANSI SQL the driver runs
side-by-side (row-count + schema + order-insensitive value-hash).
Column names and float rounding match the SQL exactly. Entries without
SQL (stateful/model/iterative ops) get the driver's rows-only check.

Scale discipline (100 TB intent): reads prune columns; per-batch
kernels are pyarrow.compute / numpy; aggregations pre-combine inside
``map_batches`` before the small ``groupby``; small sides broadcast via
``ray.put``; the only all-to-all exchanges are the hash joins and
groupbys that genuinely need them.
"""

from __future__ import annotations

import os
import zlib
from functools import lru_cache
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..functions import dedupe, textstats
from ..functions.urlnorm import hash64
from ..functions.arrowio import arrow_out as _arrow_out
from ..stages.location import build_alias_map, tag_location
from ..synth.locations import WORLD_LOCATIONS

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


_SCHEMA_CACHE: dict[str, pa.Schema] = {}


def _tbl(sf_dir: str, name: str, columns: list[str] | None = None,
         filter: Any = None):
    """Pruned read with an explicit metadata-FREE schema: pandas-written
    parquet embeds a ``pandas`` metadata dict that makes ``pa.Schema``
    unhashable, defeating Ray's schema dedup ('Failed to hash the
    schemas' spam at every downstream unify). Passing the stripped
    schema keeps every read block clean at the source. ``filter`` is a
    pyarrow.dataset expression pushed down to the row-group scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    full = _SCHEMA_CACHE.get(path)
    if full is None:
        full = papq.ParquetFile(path).schema_arrow.remove_metadata()
        _SCHEMA_CACHE[path] = full
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    kw = {"filter": filter} if filter is not None else {}
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)





_BCAST_CACHE: dict[bytes, Any] = {}


def _bget(ref):
    """ray.get a broadcast ObjectRef once per process (J2 pattern)."""
    key = ref.binary()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


_BCAST_SLOTS: dict[str, tuple[bytes, Any]] = {}


def _bget_slot(slot: str, ref):
    """``_bget`` with a NAMED single-entry cache slot: a query that
    broadcasts a fresh object per invocation (or per iteration, like
    the PageRank contribution vector) replaces its previous entry
    instead of accreting one cached array per run in every worker for
    the process lifetime."""
    ent = _BCAST_SLOTS.get(slot)
    key = ref.binary()
    if ent is None or ent[0] != key:
        _BCAST_SLOTS[slot] = ent = (key, ray.get(ref))
    return ent[1]


_PUSH_SHUFFLE_MIN_BYTES = int(os.environ.get("JCR_PUSH_SHUFFLE_MIN_BYTES",
                                             str(512 << 20)))


from contextlib import contextmanager  # noqa: E402


@contextmanager
def _shuffle_scaled(est_bytes: int):
    """Scope the shuffle strategy to an ESTIMATE of the exchange size:
    push-based sort shuffle above ``_PUSH_SHUFFLE_MIN_BYTES`` (512 MB —
    it moved the 200k×256d band exchange 76 → 48 s where hash_shuffle
    took 88 s), the default below it (push-based pipelining overhead
    loses on small exchanges, and most of this catalog's shuffles are
    near-dup-rate-bounded). Strategy is restored on exit so sibling
    queries keep the default. The estimate comes from parquet metadata
    row counts × row width — cheap and within a factor of 2, which is
    all a 2-way threshold needs."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    if est_bytes >= _PUSH_SHUFFLE_MIN_BYTES:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev


def _tbl_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata — no scan."""
    return papq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")).metadata.num_rows


def _max_ts(ds, col: str) -> pd.Timestamp:
    """MAX over a timestamp column via Arrow partial-max per batch + a
    tiny coalesced merge. ``Dataset.max`` routes timestamps through a
    pandas block whose day-aligned values numpy narrows to 'D'
    precision, spamming a conversion warning in every aggregate map
    task; pc.max stays in Arrow the whole way."""
    part = ds.map_batches(lambda t: pa.table({col: [pc.max(t[col])]}),
                          batch_format="pyarrow")
    final = part.map_batches(lambda t: pa.table({col: [pc.max(t[col])]}),
                             batch_format="pyarrow", batch_size=1 << 30)
    return pd.Timestamp(final.take_all()[0][col])


def _merge_topk(k: int, id_col: str = "neighbor_id",
                out_cols: tuple[str, ...] = ("query_id", "neighbor_id",
                                             "rank")):
    """Per-group merge of partial top-k rows: the oracle's total order
    (rounded score desc, id asc) then ranks 1..k. ONE helper shared by
    knn_cosine, ann_ivf and bm25_topk so their tie-break semantics
    cannot drift; ``out_cols`` may include "score" to keep the float
    column (all other outputs cast int64)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True],
                          kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1)
        return g[list(out_cols)].astype(
            {c: (np.float64 if c == "score" else np.int64)
             for c in out_cols})

    return merge


def _copart_count(n_rows: int, lo: int = 4, hi: int = 64) -> int:
    """Co-partition count for the key-hash cogroup ops (as-of/range
    joins, window analytics): one partition per ~500k rows, clamped —
    ONE formula so the partitioning contract cannot drift per query."""
    return int(min(hi, max(lo, n_rows // 500_000 + lo)))


def _append_user_part(t: pa.Table, parts: int) -> pa.Table:
    """Append the user-hash co-partition key (documented assumption of
    the cogroup family: a user's history fits its partition)."""
    u = t["user_id"].to_numpy(zero_copy_only=False)
    return t.append_column("part", pa.array(u % parts, type=pa.int64()))


def _bucket_sum(ds, key_col: str, n_col: str, parts: int = 32):
    """Coarse-hash bucket combine for HIGH-CARDINALITY (key, n)
    partial streams — ``Dataset.aggregate``'s sort-based groupby
    measured 27 s at 235k distinct string keys and 217 s at 200k int
    keys this round, where hashing keys into ``parts`` buckets and
    pandas-summing inside each takes seconds. ONE helper so every
    vocab-/pair-/line-keyed combine shares the idiom (the
    _copurchase_edges lesson, generalized)."""

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(k.astype(object))
                % parts).astype(np.int64)
        return t.append_column("bpart", pa.array(part))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_col, as_index=False)[n_col].sum()

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("bpart", num_partitions=parts)
        .map_groups(combine, batch_format="pandas")
    )


def _round_half_up(x, decimals: int):
    """SQL ROUND semantics (half away from zero) — numpy's round is
    half-to-even and disagrees with DuckDB on exact .5 ulp boundaries
    (frequent for int/int ratios)."""
    x = np.asarray(x, dtype=np.float64)
    f = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _ts_us(s) -> pa.Scalar:
    """Arrow timestamp[us] scalar for pyarrow.compute date filters."""
    return pa.scalar(pd.Timestamp(s).to_pydatetime(), type=pa.timestamp("us"))


def _dt_i64(col) -> np.ndarray:
    """timestamp[us] column → int64 microseconds (vectorized)."""
    return (col.to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64))


def _rev_cents(t: pa.Table) -> np.ndarray:
    """Discounted revenue as EXACT integer cents —
    round(l_extendedprice*(1-l_discount)*100): the pointwise double
    expression is identical in numpy and DuckDB, so integer sums match
    bit-for-bit on any partitioning."""
    ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = t["l_discount"].to_numpy(zero_copy_only=False)
    return _round_half_up(ext * (1.0 - disc) * 100.0, 0).astype(np.int64)


# --------------------------------------------------------------------------
# Aggregations / sorts / incremental (SURVEY §2.5, §2.6, §2.9)
# --------------------------------------------------------------------------


def q_source_counts(sf_dir: str):
    """A1/A3: per-source row counts (the reference's per-site union +
    before/after count report, ``src/crawler.py:190-243``)."""
    return (
        _tbl(sf_dir, "documents", ["source"])
        .groupby("source")
        .aggregate(Count(alias_name="n"))
    )


def q_source_counts_salted(sf_dir: str):
    """The hot-key (skew) pattern: `source` has few distinct values, so
    a plain groupby lands each hot key on ONE reducer. Salting splits
    every key across 8 reducers — groupby (source, salt) → partial
    sums → tiny re-aggregate — bounding any single reducer's input at
    1/8 of the hottest key. Same result as ``source_counts``."""
    salts = 8

    def add_salt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # deterministic spread: row position within the batch mod salts
        salt = pc.cast(pa.array(np.arange(n, dtype=np.int64) % salts), pa.int64())
        return pa.table({"source": t["source"], "salt": salt})

    partial = (
        _tbl(sf_dir, "documents", ["source"])
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby(["source", "salt"])
        .aggregate(Count(alias_name="n"))
    )
    return (
        partial.groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


def q_lang_frequency(sf_dir: str):
    """A6: tag-frequency analysis (notebook Counter → groupby/count)."""
    return (
        _tbl(sf_dir, "documents", ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))
    )


def q_watermark_max_ts(sf_dir: str):
    """A5/T4: the MAX(timestamp) watermark
    (``embed_latest_crawled_data.py:135-148``)."""
    v = _max_ts(_tbl(sf_dir, "events", ["ts"]), "ts")
    return pd.DataFrame({"max_ts": [v]})


def q_latest_events(sf_dir: str):
    """O2: ORDER BY ts DESC LIMIT k (latest-row lookup)."""
    return (
        _tbl(sf_dir, "events", ["event_id", "ts"])
        .sort(["ts", "event_id"], descending=[True, True])
        .limit(5)
    )


def q_incremental_since_watermark(sf_dir: str):
    """S10: incremental read — rows newer than (watermark - 7d)
    (``embed_latest_crawled_data.py:36-55``)."""
    ds = _tbl(sf_dir, "events", ["ts", "event_type"])
    wm = _max_ts(_tbl(sf_dir, "events", ["ts"]), "ts") - pd.Timedelta(days=7)
    cutoff = pa.scalar(wm.to_pydatetime(), type=pa.timestamp("us"))
    return (
        ds.map_batches(
            lambda t: t.filter(pc.greater(t["ts"], cutoff)), batch_format="pyarrow"
        )
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def q_windowed_events(sf_dir: str):
    """§2.9: tumbling 1-day window per user over the events log —
    pre-aggregated per batch, then a small groupby over partials."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].dt.floor("D"))
        g = df.groupby(["user_id", "day"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        return _arrow_out(g)

    # combiner pattern: heavy rows reduce to per-batch partials inside
    # map_batches; the merge over the (much smaller) partial set runs in
    # ONE coalesced WORKER task (giant batch_size bundles all partial
    # blocks) — never on the driver, and without an all-to-all barrier
    # (each Ray shuffle costs ~10s wall on this build regardless of
    # size). If the distinct (user, day) key space outgrew one worker's
    # heap, this one line becomes `.groupby([...]).aggregate(Sum, Sum)`.
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "day"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        out["n"] = out["n"].astype(np.int64)
        out["sum_value"] = _round_half_up(out["sum_value"], 4)
        return out[["user_id", "day", "n", "sum_value"]]

    return (
        _tbl(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_asof_join_clicks(sf_dir: str):
    """AS-OF join — the inequality join Ray Data has no operator for,
    composed per the custom-operator recipe (map_batches prune →
    ONE key-hash cogroup → vectorized per-partition kernel): each
    'error' event joins the SAME user's most recent 'click' at or
    before its timestamp. Both sides are pruned map-side to the two
    event types, co-partitioned by ``user_id % parts`` through one
    exchange (the documented partitioning assumption: a user's full
    history fits its partition), and each partition runs pandas'
    C-speed ``merge_asof(by=user_id, direction=backward)``. INNER
    semantics (errors before a user's first click drop) keep the
    output free of nullable columns; the elapsed gap is emitted as
    EXACT integer microseconds, so there is no float rounding to
    drift from the oracle (DuckDB's native ASOF JOIN)."""
    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["error", "click"])))
        return _append_user_part(t, parts)

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == "error"]
        right = df[df["event_type"] == "click"]
        if left.empty or right.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "ts": pd.Series([], dtype=df["ts"].dtype),
                "click_ts": pd.Series([], dtype=df["ts"].dtype),
                "usecs_since_click": pd.Series([], dtype=np.int64),
            })
        right = pd.DataFrame({"ts": right["ts"],
                              "user_id": right["user_id"],
                              "click_ts": right["ts"]})
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts"]].sort_values(
                "ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction="backward")
        m = m.dropna(subset=["click_ts"])
        gap = (m["ts"].values.astype("datetime64[us]").astype(np.int64)
               - m["click_ts"].values.astype("datetime64[us]").astype(
                   np.int64))
        return _arrow_out(pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64),
            "user_id": m["user_id"].astype(np.int64),
            "ts": m["ts"],
            "click_ts": m["click_ts"],
            "usecs_since_click": pd.Series(gap, index=m.index,
                                           dtype=np.int64),
        }))

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(asof, batch_format="pandas")
    )


_RJ_WIN_DAYS = 7  # range-join window width (and the bucket width)
_US_DAY = 86_400_000_000


def q_range_join_shipments(sf_dir: str):
    """RANGE join — the other inequality join the Dataset API lacks:
    count, per order, the lineitems (any order) shipped inside
    ``[o_orderdate, o_orderdate + 7 days)``. The banded shape: both
    sides hash to time buckets the width of the window, items to
    exactly ONE bucket, orders REPLICATED to the ≤2 buckets their
    window overlaps; per bucket a sorted-shipdate ``searchsorted``
    pair counts each order's in-bucket items vectorized, and the ≤2
    per-order partials merge in one coalesced task (the
    ``windowed_events`` combiner pattern). Work scales with rows ×
    window density, never all-pairs; the documented partitioning
    assumption is that one bucket's rows fit a worker. INNER
    semantics (orders with zero in-window shipments drop) — exact
    integer counts, nothing to round."""
    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    items = _tbl(sf_dir, "lineitem", ["l_shipdate"])
    bw = _RJ_WIN_DAYS * _US_DAY

    def _us(col: pa.ChunkedArray) -> np.ndarray:
        return col.cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(
            np.int64)

    def tag_items(t: pa.Table) -> pa.Table:
        ship = _us(t["l_shipdate"])
        return pa.table({
            "bucket": pa.array(ship // bw, type=pa.int64()),
            "okey": pa.nulls(t.num_rows, pa.int64()),
            "start": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "ship": pa.array(ship),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        start = _us(t["o_orderdate"])
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        b0 = start // bw
        b1 = (start + bw - 1) // bw  # last bucket the window touches
        two = b1 != b0
        bucket = np.concatenate([b0, b1[two]])
        okey = np.concatenate([okey, okey[two]])
        start = np.concatenate([start, start[two]])
        return pa.table({
            "bucket": pa.array(bucket, type=pa.int64()),
            "okey": pa.array(okey.astype(np.int64)),
            "start": pa.array(start),
            "ship": pa.nulls(len(bucket), pa.int64()),
        })

    def count_bucket(t: pa.Table) -> pa.Table:
        is_item = pc.is_valid(t["ship"])
        ship = np.sort(t.filter(is_item)["ship"].to_numpy(
            zero_copy_only=False))
        o = t.filter(pc.invert(is_item))
        start = o["start"].to_numpy(zero_copy_only=False)
        n = (np.searchsorted(ship, start + bw, "left")
             - np.searchsorted(ship, start, "left"))
        sel = n > 0
        return pa.table({
            "o_orderkey": pa.array(o["okey"].to_numpy(
                zero_copy_only=False)[sel]),
            "n": pa.array(n[sel].astype(np.int64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderkey", as_index=False).agg(
            n_shipped=("n", "sum"))
        return out.astype({"o_orderkey": np.int64,
                           "n_shipped": np.int64})

    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    with _shuffle_scaled(n_rows * 32):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders,
                                      batch_format="pyarrow"))
            .groupby("bucket", num_partitions=parts)
            .map_groups(count_bucket, batch_format="pyarrow")
            .map_batches(merge, batch_format="pandas",
                         batch_size=1 << 30)
        )


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary: the canonical pre-aggregate →
    groupby-sum pattern (partial combine inside map_batches)."""

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "qty": t["l_quantity"].to_pandas(),
                "base": t["l_extendedprice"].to_pandas(),
                "disc_price": disc_price.to_pandas(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("base", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n=("qty", "size"),
        )
        return _arrow_out(g)

    agg = (
        _tbl(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = _round_half_up(df["sum_qty"] / df["n"], 4)
        df["avg_price"] = _round_half_up(df["sum_base_price"] / df["n"], 4)
        df["sum_qty"] = _round_half_up(df["sum_qty"], 2)
        df["sum_base_price"] = _round_half_up(df["sum_base_price"], 2)
        df["sum_disc_price"] = _round_half_up(df["sum_disc_price"], 2)
        df["n"] = df["n"].astype(np.int64)
        return df

    return agg.map_batches(finish, batch_format="pandas")


def q_top_parts(sf_dir: str):
    """O-family: global top-k by sort (ties broken by key)."""
    return (
        _tbl(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(10)
    )


def q_exact_dedup_events(sf_dir: str):
    """D1/D3: exact dedup by key — hash-partition groupby, first-wins
    (min event_id per (user, type))."""
    return (
        _tbl(sf_dir, "events", ["user_id", "event_type", "event_id"])
        .groupby(["user_id", "event_type"])
        .aggregate(Min("event_id", alias_name="first_event"))
    )


# --------------------------------------------------------------------------
# Joins / lookups (SURVEY §2.4)
# --------------------------------------------------------------------------


def q_anti_join_customers(sf_dir: str):
    """J1/D3: anti-join via broadcast key set (customers with no order
    in the last 30 days) — the seen-set pattern: broadcast the key set,
    filter inside map_batches; no shuffle."""
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cutoff = _max_ts(_tbl(sf_dir, "orders", ["o_orderdate"]), "o_orderdate") - pd.Timedelta(days=30)
    sc = pa.scalar(cutoff.to_pydatetime(), type=pa.timestamp("us"))
    recent = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_orderdate"], sc)), batch_format="pyarrow"
    )
    okeys = np.array(sorted(recent.unique("o_custkey")), dtype=np.int64)
    ref = ray.put(okeys)

    def anti(t: pa.Table) -> pa.Table:
        keys = _bget(ref)
        mask = ~np.isin(t["c_custkey"].to_numpy(), keys)
        return t.filter(pa.array(mask))

    return _tbl(sf_dir, "customer", ["c_custkey"]).map_batches(anti, batch_format="pyarrow")


def q_broadcast_join_region(sf_dir: str):
    """J2: broadcast dictionary lookup (the WorldLocations pattern):
    small side ray.put once, dict lookup per batch."""
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in _tbl(sf_dir, "region").take_all()
    }
    ref = ray.put(region)

    def join(df: pd.DataFrame) -> pd.DataFrame:
        lut = _bget(ref)
        return pd.DataFrame(
            {"nation": df["n_name"], "region": df["n_regionkey"].map(lut)}
        )

    return _tbl(sf_dir, "nation", ["n_name", "n_regionkey"]).map_batches(
        join, batch_format="pandas"
    )


def q_join_orders_lineitem(sf_dir: str):
    """Large-large hash-partitioned join (Dataset.join, keyed on
    orderkey) → small groupby. Both sides too big to broadcast at
    scale; num_partitions bounds per-partition memory."""
    li = _tbl(sf_dir, "lineitem", ["l_orderkey"])
    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, "inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))
    return joined.groupby("o_orderpriority").aggregate(Count(alias_name="n"))


# --------------------------------------------------------------------------
# Scalar/string pipeline parity (SURVEY §2.2 M11, M13, M15-M17)
# --------------------------------------------------------------------------


def q_clean_pipeline(sf_dir: str):
    """M11 (RE2-expressible subset): date-strip → salary-strip →
    dash/slash→space → trim, vectorized with pyarrow.compute kernels.
    (The repeated-word backreference step is Python-re-only and is
    conformance-tested in the crawl pipeline instead.)"""

    def clean(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            t["p_name"],
            pa.array([" posted 2024-03-15 pays USD100-200/yr"] * len(t)),
            "",
        )
        s = pc.replace_substring_regex(s, r"\d{4}-\d{2}-\d{2}", "")
        s = pc.replace_substring_regex(s, r"(USD|GBP)\d+-\d+/yr", "")
        s = pc.replace_substring_regex(s, r"[-/]", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table({"p_partkey": t["p_partkey"], "cleaned": s})

    return _tbl(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        clean, batch_format="pyarrow"
    )


def q_location_tags_nation(sf_dir: str):
    """M13: the location tagger (flattened alias map + compound-word
    retry) over nation names; two-token names (UNITED STATES / UNITED
    KINGDOM) exercise the compound path."""
    alias = build_alias_map(WORLD_LOCATIONS)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        tags = [tag_location(v, alias)[1][0] for v in df["n_name"]]
        return pd.DataFrame(
            {"n_nationkey": df["n_nationkey"], "n_name": df["n_name"], "tag": tags}
        )

    return _tbl(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        tag, batch_format="pandas"
    )


# 25 real-world location probes (indexed by n_nationkey) and the tag
# the dictionary-scale tagger must produce — compound names (Sao Paulo,
# Cape Town, Buenos Aires, Saudi Arabia) exercise the adjacent-token
# retry; zones (APAC, Remote) return the token itself. The SQL oracle
# carries these expectations as a VALUES table (the tagger itself is
# not SQL-expressible; the driver's value-hash still checks the live
# engine output against the golden tags).
_FULL_LOC_PROBES: list[tuple[str, str]] = [
    ("Berlin, Germany", "GERMANY"), ("Sao Paulo", "BRAZIL"),
    ("Kuala Lumpur", "MALAYSIA"), ("NYC", "UNITED STATES"),
    ("Tbilisi", "GEORGIA"), ("APAC", "APAC"), ("Remote", "REMOTE"),
    ("Saudi Arabia", "SAUDI ARABIA"), ("Buenos Aires", "ARGENTINA"),
    ("Lagos", "NIGERIA"), ("Saigon", "VIETNAM"), ("Zurich", "SWITZERLAND"),
    ("Krakow", "POLAND"), ("Bangalore", "INDIA"), ("Cape Town", "SOUTH AFRICA"),
    ("Montreal", "CANADA"), ("Wellington", "NEW ZEALAND"),
    ("Dubai", "UNITED ARAB EMIRATES"), ("Istanbul", "TURKEY"),
    ("Reykjavik", "ICELAND"), ("Casablanca", "MOROCCO"), ("Hanoi", "VIETNAM"),
    ("Seoul", "SOUTH KOREA"), ("Lisbon", "PORTUGAL"),
    ("Edinburgh", "UNITED KINGDOM"),
]


def q_location_tags_full(sf_dir: str):
    """M13 at dictionary scale: the tagger over the full ~1k-alias world
    map (synth/locations_full.py), applied to real location strings
    selected per nation row. The tags come out of the LIVE tagger; the
    oracle holds the expected constants."""
    from ..stages.location import LocationTagger

    tagger = LocationTagger()  # full dictionary-scale map

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        locs = [_FULL_LOC_PROBES[int(k) % 25][0] for k in df["n_nationkey"]]
        tags = [tag_location(v, tagger.alias)[1][0] for v in locs]
        return pd.DataFrame(
            {"n_nationkey": df["n_nationkey"], "n_name": df["n_name"],
             "loc": locs, "tag": tags}
        )

    return _tbl(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        tag, batch_format="pandas"
    )


def q_embed_format(sf_dir: str):
    """M15/M17: the e5 text formatter — '<title>…</title> …' wrap +
    'passage: ' prefix (``embed_latest_crawled_data.py:58-81``,
    ``e5_base_v2_utils.py:85-96``)."""

    def fmt(t: pa.Table) -> pa.Table:
        n = len(t)
        sid = pc.cast(t["doc_id"], pa.string())
        s = pc.binary_join_element_wise(
            pa.array(["passage: <title>doc-"] * n), sid,
            pa.array(["</title> <description>"] * n), t["text"],
            pa.array(["</description>"] * n), "",
        )
        return pa.table({"doc_id": t["doc_id"], "passage": s})

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fmt, batch_format="pyarrow"
    )


def q_token_truncate(sf_dir: str):
    """M16: token counting + truncation at N tokens
    (``e5_base_v2_utils.py:37-51``), whitespace tokenizer."""

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "truncated": pa.array(
                    [textstats.truncate_tokens(x, 100)
                     for x in t["text"].to_pylist()],
                    type=pa.string()),
            }
        )

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        trunc, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# Text analysis (training-data ops)
# --------------------------------------------------------------------------


def q_token_counts(sf_dir: str):
    def count(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


def q_quality_scores(sf_dir: str):
    def score(t: pa.Table) -> pa.Table:
        s = textstats.quality_scores(t["text"].to_pylist())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(s["n_chars"]),
                "n_tokens": pa.array(s["n_tokens"]),
                "chars_per_token": pa.array(
                    _round_half_up(s["chars_per_token"], 4)),
                "stopword_ratio": pa.array(
                    _round_half_up(s["stopword_ratio"], 4)),
            }
        )

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


_QF_MIN_TOKENS = 30
_QF_MAX_CPT = 9.0
_QF_MIN_STOP = 0.02


def q_quality_filter(sf_dir: str):
    """Quality FILTERING — the removal op that pairs with scoring (a
    training-data pipeline keeps only docs passing heuristic gates):
    token count ≥ 30, chars/token ≤ 9, stopword ratio ≥ 2%. Pure
    map-side (one vectorized pass, no shuffle); emits the kept doc ids
    with their scores."""

    def keep(t: pa.Table) -> pa.Table:
        s = textstats.quality_scores(t["text"].to_pylist())
        cpt = _round_half_up(s["chars_per_token"], 4)
        stop = _round_half_up(s["stopword_ratio"], 4)
        m = ((s["n_tokens"] >= _QF_MIN_TOKENS)
             & (cpt <= _QF_MAX_CPT) & (stop >= _QF_MIN_STOP))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "n_tokens": pa.array(s["n_tokens"][m]),
            "chars_per_token": pa.array(cpt[m]),
            "stopword_ratio": pa.array(stop[m]),
        })

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


# PII scrub patterns — RE2 syntax, valid in BOTH Arrow (RE2) and
# DuckDB (also RE2), so the engine and the oracle run the SAME regexes
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def q_pii_redact(sf_dir: str):
    """PII redaction — the scrub pass a public-data training pipeline
    runs before tokenization: replace emails / phone numbers / IPv4
    addresses with typed placeholders and count redactions per doc.
    Pure map-side (compiled-RE2 ``pc.replace_substring_regex`` /
    ``pc.count_substring_regex`` kernels, zero-copy Arrow in/out — no
    Python loop, no shuffle, scale-free).

    The synthetic documents carry no PII, so the stage first INJECTS
    deterministic doc_id-keyed PII into a subset of rows (the same
    arithmetic the SQL oracle applies) — injection is input synthesis,
    the operator under test is the scrub."""

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        idv = ids.to_numpy(zero_copy_only=False)
        ids_s = pc.cast(ids, pa.string())
        # constant operands stay SCALARS — binary_join_element_wise /
        # if_else broadcast them with zero per-row allocation
        email = pc.if_else(
            pa.array(idv % 3 == 0),
            pc.binary_join_element_wise(
                " contact user", ids_s, "@mail.example.com", ""),
            "")
        phone = pc.if_else(
            pa.array(idv % 5 == 0),
            pc.binary_join_element_wise(
                " call 555-",
                pc.utf8_lpad(pa.array((idv % 10000).astype(str)), 4, "0"),
                ""),
            "")
        ip = pc.if_else(
            pa.array(idv % 7 == 0),
            pc.binary_join_element_wise(
                " from 10.0.", pa.array((idv % 256).astype(str)),
                ".", pa.array((idv % 100).astype(str)), ""),
            "")
        itext = pc.binary_join_element_wise(t["text"], email, phone, ip, "")
        n = pc.count_substring_regex(itext, _PII_EMAIL)
        clean = pc.replace_substring_regex(itext, _PII_EMAIL, "<EMAIL>")
        for pat, repl in ((_PII_PHONE, "<PHONE>"), (_PII_IP, "<IP>")):
            n = pc.add(n, pc.count_substring_regex(itext, pat))
            clean = pc.replace_substring_regex(clean, pat, repl)
        return pa.table({
            "doc_id": ids,
            "clean_text": clean,
            "n_pii": pc.cast(n, pa.int64()),
        })

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


def q_corpus_stats(sf_dir: str):
    """Corpus-level rollup (the report a data pipeline prints at the
    end): doc count, token sum/avg, char sum — partial sums per batch,
    one coalesced merge (single-row result, no shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        return pa.table({
            "n_docs": pa.array([t.num_rows], type=pa.int64()),
            "n_tokens": pa.array([pc.sum(toks).as_py() or 0], type=pa.int64()),
            "n_chars": pa.array(
                [pc.sum(pc.utf8_length(t["text"])).as_py() or 0], type=pa.int64()
            ),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "n_docs": [int(df["n_docs"].sum())],
            "n_tokens": [int(df["n_tokens"].sum())],
            "n_chars": [int(df["n_chars"].sum())],
        })
        out["avg_tokens"] = _round_half_up(out["n_tokens"] / out["n_docs"], 4)
        return out

    return (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_langid(sf_dir: str):
    """Language-ID heuristic (stopword/charset) — no SQL equivalent;
    rows-only check."""

    def lid(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "lang_pred": pa.array(
                    [textstats.lang_id(x) for x in t["text"].to_pylist()],
                    type=pa.string()),
            }
        )

    return _tbl(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        lid, batch_format="pyarrow"
    )


def q_fingerprints(sf_dir: str):
    """Document fingerprinting: whole-doc rolling hash + winnowing
    count — rows-only (not SQL-expressible)."""

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(
                    [textstats.fingerprint64(x) for x in texts],
                    type=pa.int64()),
                "n_winnow": pa.array(
                    [len(textstats.winnow_fingerprints(x)) for x in texts],
                    type=pa.int64()),
            }
        )

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# Dedup & similarity (training-data ops)
# --------------------------------------------------------------------------

_JACC_SUBSET = 200
_JACC_TAU = 0.9
_COS_TAU = 0.4

# shared by the distributed pipelines AND the sequential golden oracles
# (pipelines/goldens.py) so the two can't drift
_MH_PERMS, _MH_SEED, _MH_BANDS = 64, 1234, 16
_MH_SHINGLE_K, _MH_VERIFY_TAU = 3, 0.5
_ANN_BANDS, _ANN_BITS, _ANN_SEED = 16, 4, 2024
_EMB_DIM = 64  # testdata default; ops derive the real dim via _emb_dim


def _emb_dim(sf_dir: str) -> int:
    """Embedding dimensionality read from the corpus (one-row metadata
    read) — the LSH hyperplane projection must match the data, not a
    constant (a 256-d stress corpus crashes a hardcoded 64). An empty
    table falls back to the catalog default (any dim yields the same
    empty result)."""
    pf = papq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]), None)
    if batch is None or len(batch) == 0:
        return _EMB_DIM
    return len(batch["embedding"][0])


_KNN_K = 10
_IVF_K, _IVF_NLIST, _IVF_NPROBE = 10, 16, 4


def _ivf_params(n_rows: int) -> tuple[int, int]:
    """IVF (nlist, nprobe) scaled to the corpus: ~sqrt(n)/2 lists with
    a quarter probed — fixed 16 lists means each probe scans n/16
    vectors, linear again at stress scale. The floor keeps n ≤ 1024
    corpora (where the golden and recall tests run) at the catalog
    constants; above that the golden derives the same values from the
    corpus it loads, so oracle parity holds at every scale.
    ``kmeans_assign`` keeps the constant: its cluster count is a model
    hyperparameter, not an index tuning knob."""
    nlist = max(_IVF_NLIST, int(round(np.sqrt(n_rows) / 2)))
    return nlist, max(_IVF_NPROBE, nlist // 4)
_IVF_QUANT = 1 << 20  # integer quantization for order-independent sums


def q_jaccard_pairs(sf_dir: str):
    """Exact word-set Jaccard near-dup pairs over a doc subset:
    token sets broadcast once, each batch compares its rows against all
    higher-id docs (distributed over rows; pairwise work bounded by the
    subset)."""
    sub = _tbl(sf_dir, "documents", ["doc_id", "text"]).filter(
        expr=f"doc_id < {_JACC_SUBSET}"
    )
    rows = sub.take_all()
    toks = {r["doc_id"]: np.unique(np.array(r["text"].split(" "))) for r in rows}
    ref = ray.put(toks)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        lut = _bget(ref)
        ids = sorted(lut)
        out_a, out_b, out_j = [], [], []
        for a in df["doc_id"]:
            ta = lut[a]
            for b in ids:
                if b <= a:
                    continue
                tb = lut[b]
                inter = len(np.intersect1d(ta, tb, assume_unique=True))
                union = len(ta) + len(tb) - inter
                j = inter / union if union else 0.0
                # threshold the ROUNDED value — the SQL oracle filters on
                # round(j, 4) >= tau, so j in [tau - 5e-5, tau) must pass
                jr = float(_round_half_up(j, 4))
                if jr >= _JACC_TAU:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jr)
        return pd.DataFrame({"id_a": pd.Series(out_a, dtype=np.int64),
                             "id_b": pd.Series(out_b, dtype=np.int64),
                             "jacc": pd.Series(out_j, dtype=np.float64)})

    return sub.map_batches(pairs, batch_format="pandas")


def _key_runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs in a SORTED key array — the
    shared run-detection kernel behind partition-level bucket scans
    (minhash candidate pairs, ANN bucket verify)."""
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    return starts, np.r_[starts[1:], keys.size]


def q_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup detection, the full distributed shape:
    shingle+minhash per batch → explode (band_key, doc_id) → groupby
    band → candidate pairs → single coalesced dedup+verify task with a
    doc_id-pruned text fetch. No stage materializes the corpus: memory
    is bounded by the candidate-pair volume, not N. Rows-only (not
    SQL-expressible); recall vs the exact pairs is asserted in tests."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    hasher = dedupe.MinHasher(num_perm=_MH_PERMS, seed=_MH_SEED)
    bands = _MH_BANDS
    parts = 32  # coarse shuffle key: hash partition of band_key —
    # sized to keep every core busy in the run-detection stage (the
    # pair output is invariant to parts; 16 left half the box idle)

    def band_rows(t: pa.Table) -> pa.Table:
        # Arrow in/out (no pandas object Series round-trip); the
        # per-doc shingle+signature loop remains — MinHash is
        # inherently per-document, and the sha1 shingle hashing
        # dominates it, not the loop
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        keys = np.empty(len(texts) * bands, dtype=np.int64)
        for i, text in enumerate(texts):
            sig = hasher.signature(dedupe.shingle_set(text, k=_MH_SHINGLE_K))
            keys[i * bands:(i + 1) * bands] = hasher.band_keys(sig, bands)
        return pa.table({
            "band_key": pa.array(keys),
            "part": pa.array(keys % parts),
            "doc_id": pa.array(np.repeat(ids, bands)),
        })

    def partition_pairs(t: pa.Table) -> pa.Table:
        """Same-band pairs for one COARSE hash partition, via vectorized
        run detection over the whole partition. Grouping on band_key
        itself hands map_groups one pandas group per bucket — at 200k
        docs that is ~3M mostly-singleton groups whose per-group
        iteration alone cost ~100s; per-partition (16 groups) the same
        work is one lexsort + a loop over only the multi-doc runs."""
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, bk))
        bk, did = bk[order], did[order]
        starts, ends = _key_runs(bk)
        multi = (ends - starts) >= 2
        out_a: list[int] = []
        out_b: list[int] = []
        for s, e in zip(starts[multi], ends[multi]):
            ids = np.unique(did[s:e])
            for i in range(ids.size - 1):
                out_a.extend([int(ids[i])] * (ids.size - 1 - i))
                out_b.extend(ids[i + 1:].tolist())
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64())})

    # materialize the candidate PAIRS (not the corpus): the set is
    # bounded by the near-dup rate, and the checkpoint lets the
    # coalesced dedup stage consume complete blocks instead of stalling
    # the streaming executor behind the groupby barrier (measured 36s →
    # 7s at sf0.1 for the whole query). Shuffle strategy picked from
    # the exchange estimate (n_docs × bands × ~24 B rows): default at
    # stress scale, push-based past ~6M docs.
    with _shuffle_scaled(_tbl_rows(sf_dir, "documents") * bands * 24):
        cand = (
            docs.map_batches(band_rows, batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(partition_pairs, batch_format="pyarrow")
        ).materialize()

    # global pair dedup in ONE coalesced worker task (pairs are tiny
    # next to the corpus — bounded by the near-dup rate; a giant
    # batch_size bundles all pair blocks without paying a second
    # all-to-all barrier, which costs ~10s wall on this build
    # regardless of size); then PARALLEL verify batches, each fetching
    # only ITS pairs' texts via a doc_id-pruned parquet read — the
    # corpus is never broadcast or collected, and memory per task is
    # bounded by the batch's candidate set. At a candidate volume too
    # big for the dedup task, dedup becomes a bucketed groupby and the
    # text fetch a hash join.
    doc_path = os.path.join(sf_dir, "documents.parquet")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b, keep_j = [], [], []
        if len(df):
            ids = sorted(set(df["id_a"]) | set(df["id_b"]))
            t = papq.read_table(doc_path, columns=["doc_id", "text"],
                                filters=[("doc_id", "in", ids)])
            lut = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
            cache: dict[int, np.ndarray] = {}

            def sh(i):
                if i not in cache:
                    cache[i] = dedupe.shingle_set(lut[i], k=_MH_SHINGLE_K)
                return cache[i]

            for a, b in zip(df["id_a"], df["id_b"]):
                jv = dedupe.jaccard(sh(int(a)), sh(int(b)))
                if jv >= _MH_VERIFY_TAU:
                    keep_a.append(a)
                    keep_b.append(b)
                    keep_j.append(round(jv, 4))
        return pd.DataFrame({"id_a": pd.Series(keep_a, dtype=np.int64),
                             "id_b": pd.Series(keep_b, dtype=np.int64),
                             "jacc": pd.Series(keep_j, dtype=np.float64)})

    # dedup + sort by id_a (narrow doc-id range per verify batch →
    # better row-group pruning and shingle-cache reuse) + re-split into
    # 512-row blocks, all in the one coalesced task
    def dedup_split(df: pd.DataFrame):
        df = df.drop_duplicates().sort_values(["id_a", "id_b"], kind="stable")
        step = 512
        for lo in range(0, len(df), step):
            yield _arrow_out(df.iloc[lo:lo + step])

    return (
        cand.map_batches(dedup_split, batch_format="pandas", batch_size=1 << 30)
        .map_batches(verify, batch_format="pandas", batch_size=512)
    )


_CC_EMPTY = np.empty(0, dtype=np.int64)


def _cc_split_owner(key: np.ndarray, P: int, *cols: np.ndarray):
    """Sort rows by owner partition (``key % P``) and slice into P
    pieces — the one split idiom shared by the edge shuffle, the push
    shards, and the jump-request shards. Returns P tuples of
    per-column slices (key first)."""
    part = key % P
    order = np.argsort(part, kind="stable")
    key, part = key[order], part[order]
    cols = tuple(c[order] for c in cols)
    bounds = np.searchsorted(part, np.arange(P + 1))
    return [tuple(arr[bounds[q]:bounds[q + 1]] for arr in (key, *cols))
            for q in range(P)]


def _cc_propagate(ia: np.ndarray, ib: np.ndarray, n: int) -> np.ndarray:
    """Index-space min-label propagation with pointer jumping over
    edges (ia, ib) on n nodes — the local-CC kernel shared by the
    single-task solver and per-partition assembly. Returns the label
    INDEX per node."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        prev = int(lab.sum())
        np.minimum.at(lab, ia, lab[ib])
        np.minimum.at(lab, ib, lab[ia])
        lab = lab[lab]  # pointer jump
        if int(lab.sum()) == prev:
            break
    return lab


def _cc_shard_mins(dst: np.ndarray, cand: np.ndarray, P: int):
    """Pre-aggregate candidate labels to min-per-target and split by
    the target's owner partition (``dst % P``) — the combiner that
    keeps per-round message volume bounded by the node count, not the
    edge count. Returns a list of P ``(targets, mins)`` pairs."""
    if len(dst) == 0:
        return [(_CC_EMPTY, _CC_EMPTY)] * P
    order = np.lexsort((cand, dst))
    dst, cand = dst[order], cand[order]
    first = np.ones(len(dst), dtype=bool)
    first[1:] = dst[1:] != dst[:-1]
    starts = np.flatnonzero(first)
    return _cc_split_owner(dst[starts], P, cand[starts])


def _cc_apply(nodes: np.ndarray, lab: np.ndarray,
              tgt: np.ndarray, val: np.ndarray) -> bool:
    """``lab[x] = min(lab[x], val)`` for owned targets, in place;
    returns whether anything improved. Unowned targets are ignored."""
    if len(tgt) == 0 or len(nodes) == 0:
        return False
    idx = np.searchsorted(nodes, tgt)
    np.minimum(idx, len(nodes) - 1, out=idx)
    ok = nodes[idx] == tgt
    if not ok.any():
        return False
    idx, val = idx[ok], val[ok]
    before = lab[idx].copy()
    np.minimum.at(lab, idx, val)
    return bool((lab[idx] < before).any())


def _cc_apply_by_label(lab: np.ndarray, lvals: np.ndarray,
                       lmins: np.ndarray) -> bool:
    """Apply a jump reply ``lab(l) = m`` to every local node currently
    LABELED ``l`` (match on label value, not node id), in place.
    Replies lag one round, so stale ``l`` values simply stop matching
    — monotonicity makes that safe."""
    if len(lvals) == 0 or len(lab) == 0:
        return False
    order = np.argsort(lvals)
    lvals, lmins = lvals[order], lmins[order]
    idx = np.searchsorted(lvals, lab)
    np.minimum(idx, len(lvals) - 1, out=idx)
    ok = lvals[idx] == lab
    if not ok.any():
        return False
    cand = np.where(ok, lmins[idx], lab)
    if not (cand < lab).any():
        return False
    np.minimum(lab, cand, out=lab)
    return True


@ray.remote
def _cc_split_block(tab: pa.Table, P: int):
    """Map side of the ONE-TIME edge shuffle: explode a pair block
    into both directed orientations and split by owner partition
    (``src % P``). Each of the P returns is a standalone
    ``(src, dst)`` column pair."""
    a = tab["id_a"].to_numpy(zero_copy_only=False).astype(np.int64,
                                                          copy=False)
    b = tab["id_b"].to_numpy(zero_copy_only=False).astype(np.int64,
                                                          copy=False)
    return [(s.copy(), d.copy()) for s, d in
            _cc_split_owner(np.concatenate([a, b]), P,
                            np.concatenate([b, a]))]


@ray.remote(num_returns=3)
def _cc_assemble(p: int, *pieces):
    """Reduce side of the edge shuffle for partition ``p``:
    concatenate its pieces, dedup directed edges, and run LOCAL
    connected components over them so round one's first messages
    already carry partition-local minima (one free contraction step).
    Returns ``((src, dst), nodes, lab)`` — ``nodes`` are the owned
    node ids (every owned node appears as ``src`` because both edge
    orientations were emitted), ``lab`` their initial labels."""
    srcs = [x[0] for x in pieces if len(x[0])]
    if not srcs:
        return (_CC_EMPTY, _CC_EMPTY), _CC_EMPTY, _CC_EMPTY
    src = np.concatenate(srcs)
    dst = np.concatenate([x[1] for x in pieces if len(x[0])])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.ones(len(src), dtype=bool)
    keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
    src, dst = src[keep], dst[keep]
    nodes = np.unique(src)
    uni = np.unique(np.concatenate([src, dst]))
    loc = _cc_propagate(np.searchsorted(uni, src),
                        np.searchsorted(uni, dst), len(uni))
    lab = uni[loc][np.searchsorted(uni, nodes)]
    ns = src != dst  # self-loops carry nothing once nodes are known
    return (src[ns], dst[ns]), nodes, lab


@ray.remote
def _cc_wave_a(p: int, P: int, edges, nodes, lab, *replies):
    """First half of a BSP round at partition ``p``: fold in last
    round's jump replies, close partition-locally-resolvable jumps,
    then emit this round's messages. Returns
    ``[lab, changed, shard_0 … shard_{P-1}]``; each shard is
    ``(push_targets, push_mins, req_labels)`` addressed to one
    partition."""
    src, dst = edges
    lab = lab.copy()
    changed = False
    for lvals, lmins in replies:
        changed |= _cc_apply_by_label(lab, lvals, lmins)
    while len(lab):  # local jump closure: lab(x) <- lab(lab(x))
        local = lab % P == p
        if not local.any():
            break
        tgt = lab[local]
        idx = np.searchsorted(nodes, tgt)
        np.minimum(idx, len(nodes) - 1, out=idx)
        ok = nodes[idx] == tgt
        upd = np.minimum(tgt, np.where(ok, lab[idx], tgt))
        if not (upd < tgt).any():
            break
        changed = True
        lab[local] = upd
    if len(src):
        cand = lab[np.searchsorted(nodes, src)]
        pushes = _cc_shard_mins(dst, cand, P)
    else:
        pushes = [(_CC_EMPTY, _CC_EMPTY)] * P
    if len(lab):
        lv = np.unique(lab)
        reqs = [r[0] for r in _cc_split_owner(lv[lv % P != p], P)]
    else:
        reqs = [_CC_EMPTY] * P
    return [lab, changed] + [(pushes[q][0], pushes[q][1], reqs[q])
                             for q in range(P)]


@ray.remote
def _cc_wave_b(nodes, lab, *shards):
    """Second half of a BSP round: apply the min-combined neighbor
    candidates to owned nodes and answer jump requests from current
    labels. Returns ``[lab, changed, reply_0 … reply_{n-1}]``, one
    reply per INCOMING shard — routed back to the asking partition
    (plain mode, n = P) or to the asking GROUP (tree-combine mode,
    n = ceil(P/k); every group member folds the same reply, and
    ``_cc_apply_by_label`` ignores labels a member doesn't hold)."""
    lab = lab.copy()
    changed = False
    for tgt, mins, _ in shards:
        changed |= _cc_apply(nodes, lab, tgt, mins)
    replies = []
    for sh in shards:
        rq = sh[2]
        if len(rq) == 0 or len(nodes) == 0:
            replies.append((_CC_EMPTY, _CC_EMPTY))
            continue
        idx = np.searchsorted(nodes, rq)
        np.minimum(idx, len(nodes) - 1, out=idx)
        ok = nodes[idx] == rq
        replies.append((rq[ok], lab[idx][ok]))
    return [lab, changed] + replies


# Tree-combine of same-target message shards: above _CC_COMBINE_P
# partitions, the P×P per-round shard fan-out (10⁴-10⁵ objects per
# round at cluster-scale P) is merged k-ary per target BEFORE wave B —
# P²/k distinct objects, wave-B fan-in bounded by ceil(P/k), and the
# merged pushes dedup per-target minima across sources so wave B
# applies each target once instead of P times.
_CC_COMBINE_P = int(os.environ.get("JCR_CC_COMBINE_P", "32"))
_CC_COMBINE_K = int(os.environ.get("JCR_CC_COMBINE_K", "8"))


@ray.remote
def _cc_combine_shards(*shards):
    """Min-combine k same-target shards ``(push_t, push_m, req)`` into
    one: pushes keep the min candidate per target, requests union."""
    ts = [s[0] for s in shards if len(s[0])]
    if ts:
        t = np.concatenate(ts)
        m = np.concatenate([s[1] for s in shards if len(s[0])])
        order = np.lexsort((m, t))
        t, m = t[order], m[order]
        first = np.ones(len(t), dtype=bool)
        first[1:] = t[1:] != t[:-1]
        t, m = t[first], m[first]
    else:
        t = m = _CC_EMPTY
    rs = [s[2] for s in shards if len(s[2])]
    r = np.unique(np.concatenate(rs)) if rs else _CC_EMPTY
    return (t, m, r)


@ray.remote
def _cc_emit(nodes: np.ndarray, lab: np.ndarray) -> pa.Table:
    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "lab": pa.array(lab, type=pa.int64())})


# Up to this many edges, connected components run as ONE remote numpy
# task (vectorized min-label propagation with pointer jumping inside a
# single worker) — the iterative Dataset loop pays ~2 AllToAll fixed
# costs PER ROUND (~10s each on this host regardless of volume), which
# at a 215k-edge image-stress graph measured 84s for work one task
# finishes in under a second. Above the limit (realistic 25-50% web dup
# rates make the edge set corpus-scale) the distributed loop takes over.
_CC_LOCAL_EDGE_LIMIT = int(os.environ.get("JCR_CC_LOCAL_EDGE_LIMIT",
                                          "2000000"))


def _nonempty_arrow(tables) -> list[pa.Table]:
    """Normalize ``Dataset.to_arrow_refs`` blocks for the local-task
    family: a pipeline whose LAST stage ran as pandas map_groups can
    hand back EMPTY blocks still in pandas form (Ray skips converting
    them), so ``*tables`` is not guaranteed pure ``pa.Table``."""
    out = []
    for t in tables:
        if isinstance(t, pd.DataFrame):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows > 0:
            out.append(t)
    return out


@ray.remote
def _cc_local_task(*tables: pa.Table) -> pa.Table:
    """Single-task CC over materialized (id_a, id_b) pair blocks:
    index-space min-label propagation, fully vectorized
    (``np.minimum.at`` over both edge directions + a ``lab = lab[lab]``
    pointer jump per round → O(log diameter) rounds of O(E) numpy).
    Runs on a WORKER, not the driver — the bounded-size dispatch twin
    of the broadcast-vs-cogroup split in ``_keep_corpus``."""
    tabs = _nonempty_arrow(tables)
    if not tabs:
        return pa.table({"node": pa.array([], pa.int64()),
                         "lab": pa.array([], pa.int64())})
    edges = pa.concat_tables(tabs)
    a = edges["id_a"].to_numpy(zero_copy_only=False)
    b = edges["id_b"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    lab = _cc_propagate(np.searchsorted(nodes, a),
                        np.searchsorted(nodes, b), len(nodes))
    return pa.table({"node": pa.array(nodes, type=pa.int64()),
                     "lab": pa.array(nodes[lab], type=pa.int64())})


def _cc_min_labels(pairs, num_partitions: int | None = None):
    """Connected components over an (id_a, id_b) edge Dataset →
    Dataset of ``(node, lab)`` with ``lab`` = component minimum.

    Bounded edge sets (≤ ``_CC_LOCAL_EDGE_LIMIT``) solve in ONE remote
    numpy task (``_cc_local_task``). Larger sets run BSP label
    propagation over RAW Ray tasks — the one workload in this package
    where the Dataset API is deliberately bypassed: iterated min-label
    propagation needs a partitioned, MUTABLE (node → label) index that
    stays put across rounds with only messages moving. The earlier
    Dataset formulation re-shuffled the static edge set through two
    sort exchanges per round and measured 529 s on a 3M-edge graph;
    this one partitions edge blocks into the object store ONCE
    (by ``src % P``, both orientations), keeps labels as per-partition
    numpy blocks, and moves only min-combined message shards per round.

    Per round (hash-to-min with pointer jumping, Rastogi et al. 2013):
    wave A folds in last round's jump replies and closes
    locally-resolvable jumps, then emits per-target-partition shards of
    (neighbor candidate mins, distinct remote label values to resolve);
    wave B applies the candidates and answers the jump requests.
    ``_cc_assemble`` additionally runs a partition-local contraction so
    the first messages already carry local minima. Labels are monotone
    non-increasing node ids, so the fixpoint (= component minima, the
    only fixpoint of min over self ∪ neighbors ∪ label chains) is
    reached when TWO consecutive rounds apply no change anywhere —
    replies lag one round, so a single clean round could still have an
    improving reply in flight; after two, any in-flight reply is a
    repeat of one already applied. Convergence is O(log diameter)
    rounds; the 10k-round cap only guards a propagation bug and fails
    loudly."""
    pairs = pairs.materialize()
    m = pairs.count()
    if m <= _CC_LOCAL_EDGE_LIMIT:
        return rd.from_arrow_refs(
            [_cc_local_task.remote(*pairs.to_arrow_refs())])

    if num_partitions is None:
        # default cap sized to THIS box (32 CPUs; each partition holds
        # ~2m/P directed edges in one numpy block). On a multi-node
        # cluster raise it via JCR_CC_BSP_PARTS so per-partition blocks
        # stay within a worker's heap (waves are P concurrent tasks).
        num_partitions = (int(os.environ.get("JCR_CC_BSP_PARTS", "0"))
                          or int(min(32, max(4, m // 250_000 + 1))))
    P = max(2, int(num_partitions))

    if pairs.num_blocks() > 64:
        # bound the split fan-out (blocks × P intermediate objects)
        pairs = pairs.repartition(64).materialize()
    splits = [_cc_split_block.options(num_returns=P).remote(ref, P)
              for ref in pairs.to_arrow_refs()]
    asm = [_cc_assemble.remote(p, *[s[p] for s in splits])
           for p in range(P)]
    edges = [a[0] for a in asm]
    nodes = [a[1] for a in asm]
    labs = [a[2] for a in asm]

    # tree-combine grouping: above _CC_COMBINE_P partitions each
    # target's P incoming shards are merged _CC_COMBINE_K-ary first;
    # group replies are shared ObjectRefs (one per group, folded by
    # every member — safe, apply-by-label skips absent labels)
    if P > _CC_COMBINE_P:
        K = max(2, _CC_COMBINE_K)
        groups = [list(range(g, min(g + K, P))) for g in range(0, P, K)]
    else:
        groups = [[p] for p in range(P)]
    gidx = np.empty(P, dtype=np.int64)  # partition → its group index
    for j, grp in enumerate(groups):
        for s in grp:
            gidx[s] = j
    G = len(groups)

    empty = ray.put((_CC_EMPTY, _CC_EMPTY))
    replies = [[empty] * G for _ in range(P)]  # replies[q][j]: q → group j
    clean, rounds = 0, 0
    while clean < 2:
        rounds += 1
        if rounds > 10_000:
            raise RuntimeError(
                "connected-components BSP propagation did not converge")
        outa = [_cc_wave_a.options(num_returns=P + 2).remote(
            p, P, edges[p], nodes[p], labs[p],
            *[replies[q][gidx[p]] for q in range(P)]) for p in range(P)]
        labs = [o[0] for o in outa]
        shards = [o[2:] for o in outa]  # shards[p][q]: p → q
        if G < P:
            inbound = [[_cc_combine_shards.remote(
                *[shards[s][q] for s in grp]) for grp in groups]
                for q in range(P)]
        else:
            inbound = [[shards[s][q] for s in range(P)] for q in range(P)]
        outb = [_cc_wave_b.options(num_returns=G + 2).remote(
            nodes[q], labs[q], *inbound[q]) for q in range(P)]
        labs = [o[0] for o in outb]
        replies = [o[2:] for o in outb]
        ch = ray.get([o[1] for o in outa] + [o[1] for o in outb])
        clean = 0 if any(ch) else clean + 1
    return rd.from_arrow_refs([_cc_emit.remote(nodes[p], labs[p])
                               for p in range(P)])


# Above this many drop rows the keep-stage switches from a ray.put
# broadcast + per-batch is_in filter to a distributed hash anti-join:
# real web corpora run 20-50% near-dup, at which point the drop set is
# CORPUS-scale and must never be collected on the driver.
_DROP_BCAST_LIMIT = int(os.environ.get("JCR_DROP_BCAST_LIMIT", "2000000"))


def _part_keys(arr: pa.Array, parts: int) -> np.ndarray:
    """Deterministic partition key per value — int64 via modulo,
    strings via pandas' C siphash (stable across processes, unlike
    Python's seeded ``hash``)."""
    v = arr.to_numpy(zero_copy_only=False)
    if v.dtype.kind in "iu":
        return (v.astype(np.int64) % parts).astype(np.int64)
    return (pd.util.hash_array(np.asarray(v, dtype=object))
            % np.uint64(parts)).astype(np.int64)


def _cc_drop_ds(pairs, num_partitions: int | None = None):
    """Connected components over an (id_a, id_b) pair Dataset → a
    DATASET of dropped ids, column ``drop_id`` (every component member
    except its minimum) — the shared tail of the int-keyed dedup-KEEP
    ops. Stays distributed end-to-end: bounded by the pair-node set,
    which at a realistic 25-50% web dup rate is corpus-scale and must
    not be pulled through the driver."""
    labels = _cc_min_labels(pairs, num_partitions)
    return labels.map_batches(
        lambda t: pa.table(
            {"drop_id": t.filter(pc.not_equal(t["lab"], t["node"]))["node"]}),
        batch_format="pyarrow")


def _keep_corpus(corpus, id_col: str, drops):
    """Anti-join the full corpus against a drop-id Dataset. Small drop
    sets broadcast once via ``ray.put`` and filter with a vectorized
    ``is_in`` per batch (no shuffle of the corpus); above
    ``_DROP_BCAST_LIMIT`` rows both sides are coarse-hash-partitioned
    through ONE cogroup exchange and anti-filtered per partition — the
    drop set never lands on the driver. (Deliberately NOT
    ``Dataset.join('left_anti')``: Ray's hash-join aggregator crashes
    acero with a schema-less empty table whenever a partition receives
    zero blocks of one side — guaranteed here, since drop ids are a
    sparse subset of corpus ids.) Duplicate drop ids are harmless to
    both paths (anti-join is an existence test), so callers skip the
    distinct shuffle."""
    drops = drops.materialize()
    n = drops.count()
    if n == 0:
        return corpus
    if n <= _DROP_BCAST_LIMIT:
        # empty blocks come back as zero-COLUMN tables (schema lost
        # upstream of materialize) — drop them before the concat
        tbls = [t for t in ray.get(drops.to_arrow_refs()) if t.num_rows > 0]
        dref = ray.put(pa.concat_tables(tbls)["drop_id"].combine_chunks())

        def keep(t: pa.Table) -> pa.Table:
            # vectorized membership over the full-corpus scan — a
            # Python per-row `in set` loop here would be the hot path
            d = _bget(dref)
            return t.filter(pc.invert(pc.is_in(t[id_col], value_set=d)))

        return corpus.map_batches(keep, batch_format="pyarrow")

    parts = _copart_count(n, lo=8, hi=128)
    # schema captured driver-side as a plain pa.Schema — capturing the
    # Dataset itself in a UDF closure would serialize the whole plan
    base_schema = corpus.schema().base_schema

    def tag_corpus(t: pa.Table) -> pa.Table:
        t = t.append_column("_part", pa.array(_part_keys(
            t[id_col].combine_chunks(), parts), type=pa.int64()))
        return t.append_column("_isdrop", pa.array(
            np.zeros(t.num_rows, dtype=bool)))

    def tag_drops(t: pa.Table) -> pa.Table:
        # drop rows aligned to the corpus schema (typed nulls in the
        # non-id columns) so the union stays one block type
        ids = t["drop_id"].combine_chunks()
        cols: dict[str, Any] = {
            f.name: (ids if f.name == id_col else pa.nulls(len(ids), f.type))
            for f in base_schema
        }
        cols["_part"] = pa.array(_part_keys(ids, parts), type=pa.int64())
        cols["_isdrop"] = pa.array(np.ones(len(ids), dtype=bool))
        return pa.table(cols)

    def anti(t: pa.Table) -> pa.Table:
        is_drop = t["_isdrop"]
        dropped = t.filter(is_drop)[id_col].combine_chunks()
        kept = t.filter(pc.invert(is_drop))
        kept = kept.filter(
            pc.invert(pc.is_in(kept[id_col], value_set=dropped)))
        return kept.drop_columns(["_part", "_isdrop"])

    return (
        corpus.map_batches(tag_corpus, batch_format="pyarrow")
        .union(drops.map_batches(tag_drops, batch_format="pyarrow"))
        .groupby("_part", num_partitions=parts)
        .map_groups(anti, batch_format="pyarrow")
    )


def q_minhash_dedup_keep(sf_dir: str):
    """Near-dup REMOVAL — the operation a training-data pipeline
    actually runs (detection alone doesn't shrink the corpus):
    MinHash+LSH verified pairs → DISTRIBUTED connected components
    (iterated min-label propagation over the pair list, which is bounded
    by the near-dup rate, NOT the corpus — see ``_cc_min_labels``) →
    distributed drop-set (every component member but its min doc_id) →
    anti-join against the full corpus (broadcast is_in when small,
    hash left_anti join when the dup rate makes the drop set
    corpus-scale — see ``_keep_corpus``). Rows-only; keep-set
    properties asserted in tests."""
    drops = _cc_drop_ds(q_minhash_lsh(sf_dir))
    return _keep_corpus(_tbl(sf_dir, "documents", ["doc_id"]), "doc_id", drops)


# Pair-source dispatch for the embedding dedup-KEEP: up to this many
# corpus rows the EXACT blocked all-pairs kernel supplies the pairs
# (it is the oracle the driver's correctness gate compares against,
# and at bounded N its B(B+1)/2 block-pair tasks are cheap); above it
# the kernel's task count grows quadratically (~6e10 block pairs at
# 1e9 vectors), so the LSH-bucketed ANN detector — recall-tested
# against the exact kernel — takes over. Same bounded-size dispatch
# pattern as _CC_LOCAL_EDGE_LIMIT / _DROP_BCAST_LIMIT.
_EMB_KEEP_EXACT_LIMIT = int(os.environ.get("JCR_EMB_KEEP_EXACT_LIMIT",
                                           "100000"))


def q_embedding_dedup_keep(sf_dir: str):
    """Embedding-cosine near-dup REMOVAL — completes the keep/removal
    trio (minhash for text, phash for images, cosine for embeddings):
    near-dup pairs → distributed connected components over the bounded
    pair set → distributed drop-set → threshold-dispatched anti-join
    over the corpus (``_keep_corpus``). Same shape as
    ``q_minhash_dedup_keep``; the pair ids are already int64 so the CC
    runs on them directly.

    The pair SOURCE is size-dispatched (``_EMB_KEEP_EXACT_LIMIT``):
    exact blocked all-pairs (``q_embedding_neardup``) below the limit —
    that is the oracle-matching kernel — and the LSH-bucketed ANN
    detector (``q_embedding_neardup_ann``) above it, where all-pairs'
    O((N/block)²) task count is the one remaining scale-killer. ANN
    pairs are a subset of the exact pairs (precision 1.0 — within-
    bucket verification is exact cosine), so the ANN-path keep set is
    a SUPERSET of the exact keep set: nothing is over-dropped, and
    missed drops taper with the recall-tested band parameters."""
    n_rows = _tbl_rows(sf_dir, "embeddings")
    pair_src = (q_embedding_neardup if n_rows <= _EMB_KEEP_EXACT_LIMIT
                else q_embedding_neardup_ann)
    drops = _cc_drop_ds(pair_src(sf_dir))
    return _keep_corpus(_tbl(sf_dir, "embeddings", ["vec_id"]), "vec_id", drops)


def q_simhash(sf_dir: str):
    """SimHash fingerprints (rows-only; near-dup = small Hamming
    distance, asserted in tests)."""

    def sh(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(
                    dedupe.simhash64_batch(t["text"].to_pylist()),
                    type=pa.int64()),
            }
        )

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        sh, batch_format="pyarrow"
    )


_SIMHASH_TAU = 7  # ≤7 of 64 bits: EXACT recall with 8×8-bit banding


def _banded_hamming_pairs(hashed, id_col: str, hash_col: str, max_d: int,
                          id_dtype, parts: int = 32,
                          est_rows: int | None = None):
    """Shared 8-band × 8-bit Hamming near-dup pipeline (phash and
    simhash): band explode → coarse hash-partition groupby (grouping on
    the band value itself hands map_groups thousands of tiny pandas
    groups; per-partition it is one lexsort + vectorized XOR/SWAR-
    popcount run detection, the minhash_lsh lesson) → bounded
    materialize (unfuses the giant-batch dedup from the verify stage —
    fused, it pulls ALL partitions into ONE task, measured 16× slower
    on the 20k-image stress corpus) → coalesced pair dedup. EXACT at
    max_d ≤ 7 by pigeonhole (≤ 7 flipped bits leave a band intact);
    near-certain at 8. ``est_rows`` (caller's input-row estimate from
    parquet metadata) sizes the band exchange for the shuffle-strategy
    pick; None keeps the default strategy."""

    id_patype = pa.string() if id_dtype is object else pa.int64()

    def band_rows(t: pa.Table) -> pa.Table:
        # Arrow end to end (was pandas with OBJECT-dtype id tiling —
        # the object arrays then forced Python-compare lexsorts in the
        # pair stage, the docstress top cost): the ×8 repetition
        # concatenates Arrow arrays, never numpy object copies
        h = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands = np.concatenate([
            (((h >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.int64)
             + (b << 8))
            for b in range(8)
        ])
        ids = t[id_col].combine_chunks()
        h64 = t[hash_col].combine_chunks()
        return pa.table({
            "band": pa.array(bands),
            "part": pa.array(bands % parts),
            "nid": pa.concat_arrays([ids] * 8),
            "h64": pa.concat_arrays([h64] * 8),
        })

    def partition_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=id_patype),
                          "id_b": pa.array([], type=id_patype),
                          "hamming": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        # Arrow's C++ sort; string ids compare as UTF-8 bytes, which
        # preserves the codepoint order the old numpy object sort used
        t = t.sort_by([("band", "ascending"), ("nid", "ascending"),
                       ("h64", "ascending")])
        band = t["band"].to_numpy()
        nid = t["nid"].to_numpy(zero_copy_only=False)
        h = t["h64"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = _key_runs(band)
        out_a: list = []
        out_b: list = []
        out_d: list = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            a, b, dd = dedupe.hamming_pairs(nid[s:e], h[s:e], max_d=max_d)
            out_a.append(a)
            out_b.append(b)
            out_d.append(dd)
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=id_patype),
            "id_b": pa.array(np.concatenate(out_b), type=id_patype),
            "hamming": pa.array(np.concatenate(out_d), type=pa.int64()),
        })

    with _shuffle_scaled((est_rows or 0) * 8 * 70):
        banded = (
            hashed.map_batches(band_rows, batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(partition_pairs, batch_format="pyarrow")
            .materialize()
        )
    return banded.map_batches(
        lambda df: df.drop_duplicates().reset_index(drop=True),
        batch_format="pandas", batch_size=1 << 30)


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup PAIRS (Hamming ≤ 7) — completes the simhash
    family the way phash_neardup completes the image one. The 8×8-bit
    banding is EXACT at this radius (see ``_banded_hamming_pairs``), so
    the oracle is a brute-force ``bit_count(xor())`` self-join in SQL,
    not a golden recompute of the banding."""
    return _banded_hamming_pairs(q_simhash(sf_dir), "doc_id", "simhash",
                                 max_d=_SIMHASH_TAU, id_dtype=np.int64,
                                 est_rows=_tbl_rows(sf_dir, "documents"))


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _emb_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from an embedding column. Arrow list
    arrays reshape straight from the backing values buffer (no
    per-row Python lists — the difference between ~20 MB/s of
    ``np.stack(to_pylist())`` and a memcpy); plain sequences fall back
    to a stack."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:  # reshape(0, -1) raises; callers emit empty
        return np.zeros((0, 0))  # outputs before touching the matrix
    if isinstance(col, pa.Array):
        return np.asarray(col.flatten()).reshape(len(col), -1).astype(np.float64)
    return np.stack(list(col)).astype(np.float64)


def _query_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """QUERY-side load only: a row-group-pruned parquet read of the 5
    query vectors (vec_id < 5) — never the full embeddings table."""
    t = papq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 5)],
    )
    ids = t["vec_id"].to_numpy()
    return ids, _emb_matrix(t["embedding"])


def q_knn_cosine(sf_dir: str):
    """Similarity search baseline: brute-force cosine top-10 for query
    vectors (vec_id < 5) — per-batch numpy matmul against the broadcast
    query matrix, batch-local top-k in the same (rounded-score,
    neighbor_id) total order the oracle ranks by, merged with a Ray
    groupby over the tiny per-query partials (no driver pandas)."""
    k = _KNN_K
    qids, qmat = _query_vectors(sf_dir)
    qref = ray.put((qids, _norm_rows(qmat)))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        qi, qn = _bget(qref)
        cids = t["vec_id"].to_numpy()
        cn = _norm_rows(_emb_matrix(t["embedding"]))
        sims = _round_half_up(qn @ cn.T, 6)  # SQL ROUND semantics
        out = []
        for row in range(len(qi)):
            mask = cids != qi[row]
            ids_m, s_m = cids[mask], sims[row][mask]
            order = np.lexsort((ids_m, -s_m))[:k]
            out.extend(
                (int(qi[row]), int(ids_m[o]), float(s_m[o])) for o in order
            )
        return pa.table({
            "query_id": pa.array([r[0] for r in out], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in out], type=pa.int64()),
            "score": pa.array([r[2] for r in out], type=pa.float64()),
        })

    return (
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pyarrow", batch_size=512)
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pandas")
    )


_NEARDUP_BLOCK_ROWS = 4096  # target rows per spill block


def _scratch_root() -> str:
    """Spill root for intermediate blocks. On a multi-node cluster set
    ``JCR_SCRATCH`` to SHARED storage (NFS/S3-fuse) — node-local /tmp is
    only correct single-node, because peer tasks must read blocks this
    driver/other nodes wrote."""
    return os.environ.get("JCR_SCRATCH", "/tmp/jcr_scratch")


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos ≥ 0.4), EXACT — blocked
    all-pairs: embeddings spill to B hash blocks (streaming write to the
    shared scratch root), then one task per block pair (B(B+1)/2 tasks)
    loads just its two blocks and emits the qualifying (a < b) pairs.
    B scales with the corpus (ceil(N / _NEARDUP_BLOCK_ROWS), power of
    two) so per-task memory stays ~2 blocks of bounded row count; task
    count grows as (N/block)² — exact all-pairs is inherently O(N²)
    compute, the sub-quadratic approximate path is
    ``embedding_neardup_ann``. The pair result (bounded by the near-dup
    rate) is materialized before the per-invocation spill dir is
    removed, so concurrent invocations never race on the same path."""
    import shutil
    import uuid

    n_rows = papq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    B = 8
    while B * _NEARDUP_BLOCK_ROWS < n_rows:
        B *= 2
    blk_dir = os.path.join(_scratch_root(), f"neardup_blocks_{uuid.uuid4().hex}")

    def add_block(t: pa.Table) -> pa.Table:
        blk = pc.bit_wise_and(t["vec_id"], B - 1)
        return t.append_column("block", pc.cast(blk, pa.int64()))

    (
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(add_block, batch_format="pyarrow")
        .write_parquet(blk_dir, partition_cols=["block"])
    )

    def _load_block(b: int) -> tuple[np.ndarray, np.ndarray]:
        path = os.path.join(blk_dir, f"block={b}")
        if not os.path.isdir(path):  # residue class absent in the corpus
            return np.array([], dtype=np.int64), np.zeros((0, 1))
        t = papq.read_table(path, columns=["vec_id", "embedding"])
        if t.num_rows == 0:
            return np.array([], dtype=np.int64), np.zeros((0, 1))
        ids = t["vec_id"].to_numpy()
        return ids, _norm_rows(_emb_matrix(t["embedding"]))

    def compare(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for bi, bj in zip(df["bi"], df["bj"]):
            aid, amat = _load_block(int(bi))
            if bi == bj:
                bid, bmat = aid, amat
            else:
                bid, bmat = _load_block(int(bj))
            if not len(aid) or not len(bid):
                continue
            sims = amat @ bmat.T
            ii, jj = np.nonzero(sims >= _COS_TAU)
            pa_, pb_ = aid[ii], bid[jj]
            lo, hi = np.minimum(pa_, pb_), np.maximum(pa_, pb_)
            keep = lo < hi  # drop self-pairs (possible only when bi == bj)
            out_a.extend(lo[keep].tolist())
            out_b.extend(hi[keep].tolist())
        df_out = pd.DataFrame({"id_a": pd.Series(out_a, dtype=np.int64),
                               "id_b": pd.Series(out_b, dtype=np.int64)})
        # bi == bj emits both triangles of the symmetric sim matrix →
        # each unordered pair twice; cross blocks emit it once.
        # Arrow out: empty pandas blocks would otherwise survive into
        # downstream unions/sorts untouched and trip Ray's
        # one-block-type-per-dataset assertion
        return _arrow_out(df_out.drop_duplicates().reset_index(drop=True))

    specs = [{"bi": i, "bj": j} for i in range(B) for j in range(i, B)]
    try:
        res = rd.from_items(specs).map_batches(
            compare, batch_format="pandas", batch_size=1
        ).materialize()  # bounded by the near-dup rate; lets the spill go
    finally:
        # the dir is per-invocation (uuid), so a failed run would
        # otherwise orphan a full corpus copy in the scratch root
        shutil.rmtree(blk_dir, ignore_errors=True)
    return res


def _ann_bits(n_rows: int) -> int:
    """Bits per LSH band, scaled so a band bucket holds ~64 vectors:
    fixed 4 bits means within-bucket exact cosine is O((n/2^4)²) per
    band — quadratic again at stress scale. The floor keeps n ≤ 1024
    corpora (sf0.001/sf0.01, where the recall tests and the driver's
    correctness gate run) at the catalog constant; above that the
    golden oracle derives the SAME value from the corpus it loads, so
    oracle parity holds at every scale while borderline-τ recall
    tapers with rb (the near-dup operating point, cos → 1, is
    insensitive to rb)."""
    return max(_ANN_BITS, int(np.ceil(np.log2(max(n_rows / 64, 2.0)))))


def q_embedding_neardup_ann(sf_dir: str):
    """Approximate embedding near-dup (the 100 TB path): random-
    hyperplane LSH — 16 bands × corpus-scaled bits per band (seeded
    projection broadcast once), exact cosine only within band buckets.
    The verify runs INLINE per coarse hash partition: a vectorized run
    scan over bkey-sorted rows finds multi-member buckets and checks
    each with one small matmul, so (a) map_groups sees 16 partition
    groups, not one pandas group per mostly-singleton bucket, and
    (b) LSH candidate pairs — which for weakly-similar corpora can be
    ~bands × n × bucket_size/2, far more than the true near-dups —
    are verified where the vectors already are, never materialized as
    rows or re-fetched. The cost is shipping each vector once per band
    through the shuffle (×16); the candidate-pair volume, not the
    shuffle, is what kills the alternative shapes. Rows-only; recall
    vs the exact blocked all-pairs is asserted in tests."""
    nb = _ANN_BANDS
    n_rows = papq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    rb = _ann_bits(n_rows)
    dim = _emb_dim(sf_dir)
    rng = np.random.default_rng(_ANN_SEED)
    planes = rng.standard_normal((nb * rb, dim))
    pref = ray.put(planes)
    parts = 64  # fine-grained reduce tasks: ~n*nb/64 rows each

    def band_rows(t: pa.Table) -> pa.Table:
        # zero-copy Arrow end to end: the embedding ListArray's backing
        # values buffer reshapes straight into the projection matmul,
        # and the ×nb repetition concatenates ARRAYS, never Python lists
        pl = _bget(pref)
        ids = t["vec_id"].to_numpy()
        arr = t["embedding"].combine_chunks()
        mat = np.asarray(arr.flatten()).reshape(t.num_rows, -1).astype(np.float64)
        bits = (mat @ pl.T) > 0  # (n, nb*rb)
        weights = 1 << np.arange(rb)
        keys = np.concatenate([
            (bits[:, b * rb:(b + 1) * rb] @ weights).astype(np.int64) * nb + b
            for b in range(nb)
        ])
        # TOP bits of the multiplicative hash: bkey is structured
        # (chunk*nb + band), and with power-of-two moduli the low bits
        # reduce to bkey mod parts — balanced only by coincidence
        part = ((keys * _HASH_MULT) % _HASH_MOD) // (_HASH_MOD // parts)
        return pa.table({
            "bkey": pa.array(keys),
            "part": pa.array(part),
            "vec_id": pa.array(np.tile(ids, nb)),
            "embedding": pa.concat_arrays([arr] * nb),
        })

    def partition_verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], type=pa.int64()),
                             "id_b": pa.array([], type=pa.int64())})
        bk = t["bkey"].to_numpy()
        vid = t["vec_id"].to_numpy()
        mat = np.asarray(t["embedding"].combine_chunks().flatten()).reshape(
            t.num_rows, -1).astype(np.float64)
        order = np.lexsort((vid, bk))
        bk, vid, mat = bk[order], vid[order], mat[order]
        starts, ends = _key_runs(bk)
        multi = (ends - starts) >= 2
        out_a: list[int] = []
        out_b: list[int] = []
        for s, e in zip(starts[multi], ends[multi]):
            ids = vid[s:e]
            sub = _norm_rows(mat[s:e])
            sims = sub @ sub.T
            ii, jj = np.nonzero(np.triu(sims >= _COS_TAU, k=1))
            if ii.size:
                lo = np.minimum(ids[ii], ids[jj])
                hi = np.maximum(ids[ii], ids[jj])
                keep = lo < hi  # duplicate vec_id rows would self-pair
                out_a.extend(lo[keep].tolist())
                out_b.extend(hi[keep].tolist())
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64())})

    # the materialize is load-bearing twice over: (a) verified pairs
    # are tiny (near-dup-rate-bounded), (b) WITHOUT it the coalesced
    # dedup's giant batch_size fuses into the map_groups stage and
    # serializes every partition's verify matmuls into ONE task
    # (measured: 39.6s single-task vs ~3s across 64 groups at 200k).
    # The band-row shuffle is this catalog's LARGEST exchange (corpus ×
    # bands × full vector payload): strategy picked from the size
    # estimate — push-based sort shuffle engaged here at stress scale
    # (76 → 48 s at 200k×256d; hash_shuffle: 88 s), default at
    # crawl-scale corpora.
    with _shuffle_scaled(n_rows * nb * (dim * 8 + 32)):
        pairs = (
            _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(band_rows, batch_format="pyarrow", batch_size=512)
            .groupby("part", num_partitions=parts)
            .map_groups(partition_verify, batch_format="pyarrow")
        ).materialize()
    # final cross-band pair dedup in one coalesced worker task (avoids
    # a second all-to-all — see q_minhash_lsh)
    return pairs.map_batches(
        lambda df: df.drop_duplicates().reset_index(drop=True),
        batch_format="pandas", batch_size=1 << 30)


def _ivf_centroids(sf_dir: str, ds, nlist: int) -> np.ndarray:
    """Deterministic IVF centroids, distributed: seed = evenly-strided
    vec_ids (row-group-pruned read), then ONE Lloyd step where each batch
    emits per-centroid partial (count, vector-sum) — the merge is over
    nlist×num_blocks tiny rows, independent of corpus size. Partial sums
    are INT64-quantized (×2^20) so the merged centroid is bit-identical
    regardless of batch/partition order — float addition isn't
    associative, and the sequential golden oracle must reproduce this
    exactly."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = papq.ParquetFile(path).metadata.num_rows
    stride = max(1, n_rows // nlist)
    seed_ids = [i * stride for i in range(nlist)]
    t = papq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", seed_ids)])
    order = np.argsort(t["vec_id"].to_numpy())
    cent = _emb_matrix(t["embedding"])[order]
    cref = ray.put(_norm_rows(cent))

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "vsum": pa.array([], type=pa.list_(pa.int64()))})
        cn = _bget(cref)
        mat = _emb_matrix(t["embedding"])
        assign = np.argmax(_norm_rows(mat) @ cn.T, axis=1)
        quant = np.round(mat * _IVF_QUANT).astype(np.int64)
        cs, ns, vs = [], [], []
        for ci in np.unique(assign):
            m = assign == ci
            cs.append(int(ci))
            ns.append(int(m.sum()))
            vs.append(quant[m].sum(axis=0).tolist())
        return pa.table({"c": pa.array(cs, type=pa.int64()),
                         "n": pa.array(ns, type=pa.int64()),
                         "vsum": pa.array(vs, type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    # tiny merge: ≤ nlist × num_blocks rows of (id, count, d-vector)
    new_cent = cent.copy()
    for ci, g in parts.groupby("c"):
        tot = int(g["n"].sum())
        if tot:
            s = np.sum(np.stack(g["vsum"].tolist()).astype(np.int64), axis=0)
            new_cent[int(ci)] = s / (tot * _IVF_QUANT)
    return new_cent


def _probe_lists(qn: np.ndarray, cn: np.ndarray, nprobe: int) -> np.ndarray:
    """Per-query probed lists: the nprobe nearest centroids. The stable
    sort kind and the negation are parity-load-bearing (engine and
    sequential golden must break centroid ties identically) — shared by
    ann_ivf, ann_ivfpq and their goldens so the four sites cannot
    drift."""
    return np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :nprobe]


def q_ann_ivf(sf_dir: str):
    """IVF ANN as a real distributed pipeline: centroids built with a
    distributed Lloyd step (broadcast centroids, per-batch partial
    sums), then assignment in ``map_batches`` (keep only vectors in
    lists probed by any query), per-list top-k in
    ``groupby(list_id).map_groups``, final per-query merge over the
    ≤ nprobe·k partial rows. Rows-only; recall vs brute force asserted
    in tests."""
    k = _IVF_K
    n_rows = papq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    nlist, nprobe = _ivf_params(n_rows)
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = _ivf_centroids(sf_dir, ds, nlist)
    cn = _norm_rows(cent)
    qids, qmat = _query_vectors(sf_dir)
    qn = _norm_rows(qmat)
    probe_lists = _probe_lists(qn, cn, nprobe)
    probed = set(int(x) for x in probe_lists.ravel())
    bref = ray.put((cn, qids, qn, probe_lists))

    def assign_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"list_id": pa.array([], type=pa.int64()),
                             "vec_id": t["vec_id"],
                             "embedding": t["embedding"]})
        cnn, _, _, _ = _bget(bref)
        mat = _emb_matrix(t["embedding"])
        assign = np.argmax(_norm_rows(mat) @ cnn.T, axis=1)
        keep = np.isin(assign, list(probed))
        idx = pa.array(np.nonzero(keep)[0])
        return pa.table({
            "list_id": pa.array(assign[keep].astype(np.int64)),
            "vec_id": t["vec_id"].take(idx),
            "embedding": t["embedding"].take(idx),
        })

    def list_topk(t: pa.Table) -> pa.Table:
        _, qi, qnn, plists = _bget(bref)
        out: list[tuple] = []
        if t.num_rows:
            lid = t["list_id"][0].as_py()
            ids = t["vec_id"].to_numpy()
            mat = _norm_rows(_emb_matrix(t["embedding"]))
            for row in range(len(qi)):
                if lid not in plists[row]:
                    continue
                sims = np.round(mat @ qnn[row], 6)
                mask = ids != qi[row]
                ids_m, s_m = ids[mask], sims[mask]
                order = np.lexsort((ids_m, -s_m))[:k]
                out.extend((int(qi[row]), int(ids_m[o]), float(s_m[o]))
                           for o in order)
        return pa.table({
            "query_id": pa.array([r[0] for r in out], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in out], type=pa.int64()),
            "score": pa.array([r[2] for r in out], type=pa.float64()),
        })

    return (
        ds.map_batches(assign_filter, batch_format="pyarrow", batch_size=512)
        .groupby("list_id", num_partitions=8)
        .map_groups(list_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pandas")
    )


# --------------------------------------------------------------------------
# Product quantization (the memory-compression ANN path: float vectors →
# one packed int64 code; at 100 TB the PQ-coded corpus is what fits in
# RAM, with exact re-rank on the shortlist only)
# --------------------------------------------------------------------------

_PQ_M = 8       # subspaces (dim must divide by 8: 64-d testdata, 256-d stress)
_PQ_K = 16      # codes per subspace → 4 bits × 8 = one int32-range code
_PQ_SHORTLIST = 50


def _pq_codebooks(sf_dir: str, ds) -> np.ndarray:
    """Deterministic (M, K, dsub) PQ codebooks: seed = evenly-strided
    vec_ids' normalized subvectors, then ONE distributed Lloyd step per
    subspace — all M subspaces share a single partials pass. Partial
    sums are INT64-quantized (like ``_ivf_centroids``) so the merged
    codebook is bit-identical regardless of batch/partition order, which
    is what lets the sequential golden reproduce it exactly."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = papq.ParquetFile(path).metadata.num_rows
    stride = max(1, n_rows // _PQ_K)
    seed_ids = [i * stride for i in range(_PQ_K)]
    t = papq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", seed_ids)])
    order = np.argsort(t["vec_id"].to_numpy())
    seeds = _norm_rows(_emb_matrix(t["embedding"])[order])
    dim = seeds.shape[1]
    dsub = dim // _PQ_M
    cb = seeds.reshape(_PQ_K, _PQ_M, dsub).transpose(1, 0, 2).copy()
    cbref = ray.put(cb)

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "vsum": pa.array([], type=pa.list_(pa.int64()))})
        cbk = _bget(cbref)
        mat = _norm_rows(_emb_matrix(t["embedding"]))
        quant = np.round(mat * _IVF_QUANT).astype(np.int64)
        ms, cs, ns, vs = [], [], [], []
        for m in range(_PQ_M):
            sub = mat[:, m * dsub:(m + 1) * dsub]
            assign = _pq_assign_sub(sub, cbk[m])
            qsub = quant[:, m * dsub:(m + 1) * dsub]
            for ci in np.unique(assign):
                sel = assign == ci
                ms.append(m)
                cs.append(int(ci))
                ns.append(int(sel.sum()))
                vs.append(qsub[sel].sum(axis=0).tolist())
        return pa.table({"m": pa.array(ms, type=pa.int64()),
                         "c": pa.array(cs, type=pa.int64()),
                         "n": pa.array(ns, type=pa.int64()),
                         "vsum": pa.array(vs, type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    new_cb = cb.copy()
    for (m, ci), g in parts.groupby(["m", "c"]):
        tot = int(g["n"].sum())
        if tot:
            s = np.sum(np.stack(g["vsum"].tolist()).astype(np.int64), axis=0)
            new_cb[int(m)][int(ci)] = s / (tot * _IVF_QUANT)
    return new_cb


def _pq_assign_sub(sub: np.ndarray, cbm: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||² per row — computed as argmin(||c||² - 2x·c)
    (the ||x||² term is constant per row); ties take the lowest code,
    identically in the engine and the sequential golden."""
    d = np.sum(cbm * cbm, axis=1)[None, :] - 2.0 * (sub @ cbm.T)
    return np.argmin(d, axis=1)


def _pq_encode_mat(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Pack the M 4-bit code indices of each (normalized) row into one
    int64."""
    dsub = cb.shape[2]
    code = np.zeros(mat.shape[0], dtype=np.int64)
    for m in range(_PQ_M):
        a = _pq_assign_sub(mat[:, m * dsub:(m + 1) * dsub], cb[m])
        code |= a.astype(np.int64) << (4 * m)
    return code


def q_pq_encode(sf_dir: str):
    """PQ-encode the corpus: (vec_id, pq_code) with one packed int64
    code per vector — the compressed representation a 100 TB system
    actually stores (8 bytes/vector vs 256-1024). Codebook training is
    one distributed partials pass; encoding is pure map-side."""
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = _pq_codebooks(sf_dir, ds)
    cbref = ray.put(cb)

    def enc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": t["vec_id"],
                             "pq_code": pa.array([], type=pa.int64())})
        mat = _norm_rows(_emb_matrix(t["embedding"]))
        return pa.table({
            "vec_id": t["vec_id"],
            "pq_code": pa.array(_pq_encode_mat(mat, _bget(cbref))),
        })

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=512)


def _pq_search(sf_dir: str, ds, cb: np.ndarray, qids: np.ndarray,
               qn: np.ndarray, cn: np.ndarray | None = None,
               probe_lists: np.ndarray | None = None):
    """Shared PQ search: ADC scan (per-batch lookup-table sums over the
    packed codes, batch-local top-S partials — the global top-S by
    (approx score, id) is exactly the union-of-batch-top-S head, so the
    result is partition-independent) → groupby merge to the global
    shortlist → ONE pruned parquet read of the shortlist ids → exact
    cosine top-10. With ``cn``/``probe_lists`` set (IVF-PQ), each batch
    additionally assigns rows to their coarse list and scores only the
    rows inside each query's probed lists. The corpus crosses the wire
    as approx partials only."""
    k, S = _KNN_K, _PQ_SHORTLIST
    dsub = cb.shape[2]
    # ADC lookup tables: lut[q][m][c] = <q_sub_m, codebook[m][c]>
    lut = np.stack([
        np.stack([qn[r, m * dsub:(m + 1) * dsub] @ cb[m].T
                  for m in range(_PQ_M)])
        for r in range(len(qids))
    ])  # (Q, M, K)
    bref = ray.put((qids, lut, cb, cn, probe_lists))

    def adc_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "neighbor_id": pa.array([], type=pa.int64()),
                          "approx": pa.array([], type=pa.float64())})
        if t.num_rows == 0:
            return empty
        qi, lu, cbk, cnn, pl = _bget(bref)
        cids = t["vec_id"].to_numpy()
        nm = _norm_rows(_emb_matrix(t["embedding"]))
        if cnn is not None:
            # prune to the union of all queries' probed lists BEFORE
            # encoding — at scale the coarse filter is what turns the
            # per-row encode + ADC into an nprobe/nlist fraction
            assign = np.argmax(nm @ cnn.T, axis=1)
            keep = np.isin(assign, np.unique(pl))
            if not keep.any():
                return empty
            cids, nm, assign = cids[keep], nm[keep], assign[keep]
        else:
            assign = None
        codes = _pq_encode_mat(nm, cbk)
        out = []
        for r in range(len(qi)):
            mask = cids != qi[r]
            if assign is not None:
                mask &= np.isin(assign, pl[r])
            if not mask.any():
                continue
            ids_m, cm = cids[mask], codes[mask]
            # sum the M table entries in fixed m order → bit-identical
            # float accumulation in the engine and the golden
            score = np.zeros(len(ids_m))
            for m in range(_PQ_M):
                score += lu[r][m][(cm >> (4 * m)) & 0xF]
            order = np.lexsort((ids_m, -score))[:S]
            out.extend((int(qi[r]), int(ids_m[o]), float(score[o]))
                       for o in order)
        if not out:
            return empty
        return pa.table({
            "query_id": pa.array([r[0] for r in out], type=pa.int64()),
            "neighbor_id": pa.array([r[1] for r in out], type=pa.int64()),
            "approx": pa.array([r[2] for r in out], type=pa.float64()),
        })

    path = os.path.join(sf_dir, "embeddings.parquet")
    qref = ray.put((qids, qn))

    def rerank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["approx", "neighbor_id"],
                          ascending=[False, True], kind="stable").head(S)
        qi, qnn = _bget(qref)
        row = int(np.nonzero(qi == g["query_id"].iloc[0])[0][0])
        ids = sorted(int(i) for i in g["neighbor_id"])
        t = papq.read_table(path, columns=["vec_id", "embedding"],
                            filters=[("vec_id", "in", ids)])
        vid = t["vec_id"].to_numpy()
        sims = _round_half_up(_norm_rows(_emb_matrix(t["embedding"])) @ qnn[row], 6)
        order = np.lexsort((vid, -sims))[:k]
        return pd.DataFrame({
            "query_id": np.full(len(order), qi[row], dtype=np.int64),
            "neighbor_id": vid[order].astype(np.int64),
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
        })

    return (
        ds.map_batches(adc_partial, batch_format="pyarrow", batch_size=512)
        .groupby("query_id")
        .map_groups(rerank, batch_format="pandas")
    )


def q_ann_pq(sf_dir: str):
    """PQ ANN with exact re-rank (see ``_pq_search``). Rows-only +
    golden; recall vs brute force asserted in tests."""
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cb = _pq_codebooks(sf_dir, ds)
    qids, qmat = _query_vectors(sf_dir)
    return _pq_search(sf_dir, ds, cb, qids, _norm_rows(qmat))


def _ivf_pq_train(sf_dir: str, ds, nlist: int) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVF centroids AND the PQ codebooks from ONE partials
    pass (ann_ivfpq needs both; calling the standalone helpers costs a
    second full-corpus scan). Each batch emits per-centroid (raw-vector)
    and per-(subspace, code) (normalized-subvector) int64-quantized
    partial sums; both merges are order-free, so the results are
    bit-identical to ``_ivf_centroids`` / ``_pq_codebooks`` — which is
    what keeps the sequential goldens (that mirror the standalone
    helpers) exact."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = papq.ParquetFile(path).metadata.num_rows
    # IVF seeds: evenly strided raw vectors, normalized for assignment
    stride_i = max(1, n_rows // nlist)
    seeds_i = [i * stride_i for i in range(nlist)]
    t = papq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", seeds_i)])
    cent0 = _emb_matrix(t["embedding"])[np.argsort(t["vec_id"].to_numpy())]
    cn0 = _norm_rows(cent0)
    # PQ seeds: evenly strided normalized subvectors
    stride_p = max(1, n_rows // _PQ_K)
    seeds_p = [i * stride_p for i in range(_PQ_K)]
    t = papq.read_table(path, columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", seeds_p)])
    sp = _norm_rows(_emb_matrix(t["embedding"])[
        np.argsort(t["vec_id"].to_numpy())])
    dim = sp.shape[1]
    dsub = dim // _PQ_M
    cb0 = sp.reshape(_PQ_K, _PQ_M, dsub).transpose(1, 0, 2).copy()
    sref = ray.put((cn0, cb0))

    def partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], type=pa.int64()),
                          "idx": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "vsum": pa.array([], type=pa.list_(pa.int64()))})
        if t.num_rows == 0:
            return empty
        cnn, cbk = _bget(sref)
        mat = _emb_matrix(t["embedding"])
        nm = _norm_rows(mat)
        ks, xs, ns, vs = [], [], [], []
        # IVF: raw-vector sums per assigned centroid (mirrors
        # _ivf_centroids.partials)
        qraw = np.round(mat * _IVF_QUANT).astype(np.int64)
        assign = np.argmax(nm @ cnn.T, axis=1)
        for ci in np.unique(assign):
            sel = assign == ci
            ks.append(0)
            xs.append(int(ci))
            ns.append(int(sel.sum()))
            vs.append(qraw[sel].sum(axis=0).tolist())
        # PQ: normalized-subvector sums per (subspace, code) (mirrors
        # _pq_codebooks.partials)
        qnorm = np.round(nm * _IVF_QUANT).astype(np.int64)
        for m in range(_PQ_M):
            a = _pq_assign_sub(nm[:, m * dsub:(m + 1) * dsub], cbk[m])
            qsub = qnorm[:, m * dsub:(m + 1) * dsub]
            for ci in np.unique(a):
                sel = a == ci
                ks.append(1)
                xs.append(m * _PQ_K + int(ci))
                ns.append(int(sel.sum()))
                vs.append(qsub[sel].sum(axis=0).tolist())
        return pa.table({"kind": pa.array(ks, type=pa.int64()),
                         "idx": pa.array(xs, type=pa.int64()),
                         "n": pa.array(ns, type=pa.int64()),
                         "vsum": pa.array(vs, type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    cent = cent0.copy()
    cb = cb0.copy()
    for (kind, idx), g in parts.groupby(["kind", "idx"]):
        tot = int(g["n"].sum())
        if not tot:
            continue
        s = np.sum(np.stack(g["vsum"].tolist()).astype(np.int64), axis=0)
        if kind == 0:
            cent[int(idx)] = s / (tot * _IVF_QUANT)
        else:
            cb[int(idx) // _PQ_K][int(idx) % _PQ_K] = s / (tot * _IVF_QUANT)
    return cent, cb


def q_ann_ivfpq(sf_dir: str):
    """IVF-PQ — the production ANN composition (coarse quantizer prunes
    the scan to each query's nprobe lists, PQ codes stand in for the
    vectors inside them, exact re-rank on the global shortlist). One
    training pass builds centroids and codebooks together
    (``_ivf_pq_train``), then one pass over each corpus batch does
    assign → probed-list filter → PQ encode → ADC partial top-S; at
    scale the coarse filter is what turns the full-corpus encode+ADC
    into an nprobe/nlist fraction."""
    n_rows = papq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    nlist, nprobe = _ivf_params(n_rows)
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent, cb = _ivf_pq_train(sf_dir, ds, nlist)
    cn = _norm_rows(cent)
    qids, qmat = _query_vectors(sf_dir)
    qn = _norm_rows(qmat)
    return _pq_search(sf_dir, ds, cb, qids, qn, cn=cn,
                      probe_lists=_probe_lists(qn, cn, nprobe))


# --------------------------------------------------------------------------
# Crawl flagship + multimodal (rows-only; conformance in tests)
# --------------------------------------------------------------------------

_CRAWL_CACHE: dict[str, str] = {}


def crawl_world_params(sf_dir: str):
    """t1-scale deterministic crawl world — shared by the crawl-backed
    queries and the sequential golden oracle (pipelines/goldens.py) so
    the two sides always describe the same world."""
    from ..synth.world import WorldParams

    n_sites = 6 if "0.001" in sf_dir else 10
    return WorldParams(seed=42, n_sites=n_sites, pages_per_site=2, jobs_per_page=5)


def _crawl_out(sf_dir: str) -> str:
    """One cached t1-scale crawl per process (deterministic world —
    sf_dir only scales the world size)."""
    key = sf_dir
    if key not in _CRAWL_CACHE:
        import hashlib

        from .crawl import CrawlConfig, run_crawl

        # stable digest (hash() is PYTHONHASHSEED-randomized per process
        # and would leak a fresh crawl copy into /tmp per driver process)
        tag = hashlib.blake2b(key.encode(), digest_size=4).hexdigest()
        out = f"/tmp/jcr_crawl_{tag}"
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        run_crawl(
            crawl_world_params(sf_dir),
            out,
            CrawlConfig(num_seen_shards=4, num_pol_shards=2, exact_sidecar=False),
        )
        _CRAWL_CACHE[key] = out
    return _CRAWL_CACHE[key]


def q_crawl_image_caption(sf_dir: str):
    """The flagship north-star pipeline: full crawl → image+caption
    table (bytes column dropped for the driver's hash; full fidelity is
    covered by the conformance suite)."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(
        os.path.join(out, "image_caption"),
        columns=["image_id", "w", "h", "fmt", "caption", "phash"],
    )
    return ds


def q_crawl_job_records(sf_dir: str):
    out = _crawl_out(sf_dir)
    return rd.read_parquet(
        os.path.join(out, "job_records"),
        columns=["url_sha1", "site_id", "strategy", "title", "link", "location"],
    )


_RECRAWL_CACHE: dict[str, str] = {}


def _recrawl_dirs(sf_dir: str) -> tuple[str, str]:
    """Cached incremental recrawl: full crawl of the world at
    jobs_per_page−1, then ``run_recrawl`` with the standard world —
    the evolved world adds one job slot per listing page while keeping
    every existing job URL, so the recrawl output is exactly the new
    slots' records (minus deterministic fail_pct failures). Returns
    (prior crawl dir, delta dir)."""
    key = sf_dir
    if key not in _RECRAWL_CACHE:
        import hashlib
        import shutil
        from dataclasses import replace

        from .crawl import CrawlConfig, run_crawl, run_recrawl

        wp = crawl_world_params(sf_dir)
        tag = hashlib.blake2b(key.encode(), digest_size=4).hexdigest()
        prior = f"/tmp/jcr_recrawl_prior_{tag}"
        out = f"/tmp/jcr_recrawl_delta_{tag}"
        shutil.rmtree(prior, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(num_seen_shards=4, num_pol_shards=2, exact_sidecar=False)
        run_crawl(replace(wp, jobs_per_page=wp.jobs_per_page - 1), prior, cfg)
        run_recrawl(wp, prior, out, cfg)
        _RECRAWL_CACHE[key] = (prior, out)
    return _RECRAWL_CACHE[key]


def _recrawl_out(sf_dir: str) -> str:
    return _recrawl_dirs(sf_dir)[1]


def q_recrawl_delta(sf_dir: str):
    """Incremental recrawl: re-seed listing pages (stalest-first
    age-packed priorities) against the prior crawl's seen snapshot and
    fetch only never-seen child URLs — the delta-only job table. The
    reference re-crawls everything and relies on DB conflict-skip
    (src/crawler.py:172-244); here unchanged sites cost exactly their
    listing fetches."""
    out = _recrawl_out(sf_dir)
    return rd.read_parquet(
        os.path.join(out, "job_records"),
        columns=["url_sha1", "site_id", "strategy", "title", "link", "location"],
    )


class _ImageFeatures:
    """Actor-pool multimodal stage: decode binary image column, emit
    per-image features. Real Ray-side plumbing (binary batches, actor
    state); heavyweight decode libs are absent, so the codec is this
    repo's own (functions/codecs.py). A resize/model stage would slot
    in here the same way."""

    def __init__(self):
        from ..functions import codecs as _c

        self.codecs = _c

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, means, lumas = [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(), t["bytes"].to_pylist()):
            px, _ = self.codecs.decode(buf)
            ids.append(iid)
            means.append(round(float(px.mean()), 4))
            lumas.append(
                round(float((px.astype(np.float64) @ [0.299, 0.587, 0.114]).mean()), 4)
            )
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "mean_pixel": pa.array(means, type=pa.float64()),
            "mean_luma": pa.array(lumas, type=pa.float64()),
        })


def q_multimodal_features(sf_dir: str):
    """Decode + feature-extract over the binary image column — an
    actor-pool map_batches stage with small batches (wide binary rows)."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"), columns=["image_id", "bytes"])
    return ds.map_batches(
        _ImageFeatures, batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1
    )


def q_distinct_users(sf_dir: str):
    """Set op: global distinct count. Per-batch unique pre-combine →
    hash-partitioned groupby → metadata row count: only the COUNT ever
    crosses to the driver (``Dataset.unique`` would collect the full
    distinct key list — millions of rows at 100×)."""

    def batch_unique(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t["user_id"])})

    distinct = (
        _tbl(sf_dir, "events", ["user_id"])
        .map_batches(batch_unique, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Count(alias_name="c"))
    )
    return pd.DataFrame({"n": pd.Series([distinct.count()], dtype=np.int64)})


def q_supplier_regions(sf_dir: str):
    """3-way dimension join via chained broadcast lookups (supplier →
    nation → region), counts per region."""
    nation = {r["n_nationkey"]: r["n_regionkey"] for r in _tbl(sf_dir, "nation").take_all()}
    region = {r["r_regionkey"]: r["r_name"] for r in _tbl(sf_dir, "region").take_all()}
    ref = ray.put((nation, region))

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        nlut, rlut = _bget(ref)
        out = pd.DataFrame({"region": df["s_nationkey"].map(nlut).map(rlut)})
        return _arrow_out(out.groupby("region", as_index=False).agg(n=("region", "size")))

    return (
        _tbl(sf_dir, "supplier", ["s_nationkey"])
        .map_batches(lookup, batch_format="pandas")
        .groupby("region")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)), batch_format="pandas")
    )


def q_top_customers_by_spend(sf_dir: str):
    """Join + aggregate + global top-k: top 10 customers by total order
    value. Names attach AFTER the limit(10) via a key-pruned point read —
    the customer dimension is never broadcast or collected (at 100× it's
    millions of rows; only the 10 winners' names are ever needed)."""
    cust_path = os.path.join(sf_dir, "customer.parquet")

    def partial(df: pd.DataFrame):
        return _arrow_out(
            df.groupby("o_custkey", as_index=False).agg(spend=("o_totalprice", "sum"))
        )

    # round BEFORE the sort — the oracle orders by the ROUNDED spend, so
    # top-10 boundary ties must break on (rounded spend, custkey) here too
    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["spend"] = _round_half_up(df["spend"], 2)
        return df

    top = (
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("spend", alias_name="spend"))
        .map_batches(rounded, batch_format="pandas")
        .sort(["spend", "o_custkey"], descending=[True, False])
        .limit(10)
    )

    def attach_names(df: pd.DataFrame) -> pd.DataFrame:
        keys = [int(k) for k in df["o_custkey"]]
        t = papq.read_table(cust_path, columns=["c_custkey", "c_name"],
                            filters=[("c_custkey", "in", keys)])
        lut = dict(zip(t["c_custkey"].to_pylist(), t["c_name"].to_pylist()))
        df = df.copy()
        df["c_name"] = df["o_custkey"].map(lut)
        return df[["o_custkey", "c_name", "spend"]]

    return top.map_batches(attach_names, batch_format="pandas", batch_size=1 << 30)


def q_session_windows(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user — the stream-shaped
    op Ray Data lacks natively: bucket users (64 coarse groups, not one
    task per user), sessionize each user's sorted history with pandas
    inside map_groups. Ordering ties broken by event_id in both engines."""

    def add_bucket(df: pd.DataFrame):
        df = df.copy()
        df["bucket"] = (df["user_id"] % 64).astype(np.int64)
        return _arrow_out(df)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        # ONE lexsort + run masks for the whole partition (the
        # per-user pandas-groupby loop cost 107 s at 5M events via
        # session_bounce_rate; this kernel is the window_dedup idiom)
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]")
        tsi = ts.astype(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        order_ = np.lexsort((eid, tsi, u))
        us, tss = u[order_], tsi[order_]
        newu = np.ones(len(us), dtype=bool)
        newu[1:] = us[1:] != us[:-1]
        brk = newu.copy()
        brk[1:] |= (tss[1:] - tss[:-1]) > 1_800_000_000
        gid = np.cumsum(brk)
        ufirst = np.maximum.accumulate(np.where(newu, gid, 0))
        sid = gid - ufirst + 1
        starts = np.flatnonzero(brk)
        n = np.diff(np.r_[starts, len(us)])
        return pd.DataFrame({
            "user_id": us[starts],
            "sid": sid[starts].astype(np.int64),
            "n": n.astype(np.int64),
            "session_start": ts[order_][starts],
        })

    return (
        _tbl(sf_dir, "events", ["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket", num_partitions=16)
        .map_groups(sessionize, batch_format="pandas")
    )


def _df_partial(count_col: str):
    """Per-batch document-frequency partial (set-of-terms per doc),
    parameterized by the output count column — ONE kernel shared by
    ``vocab_top_terms`` and ``tfidf_top_terms`` so their tokenization
    (single-space split, set semantics) can never drift apart."""
    from collections import Counter

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(set(t.split(" ")))
        return _arrow_out(pd.DataFrame({
            "term": list(c.keys()),
            count_col: np.fromiter(c.values(), dtype=np.int64, count=len(c)),
        }))

    return partial


def q_vocab_top_terms(sf_dir: str):
    """Vocabulary building (the DF side of TF-IDF): document frequency
    per term, top-100. Per-batch partial DF counts (set-of-terms per
    doc) pre-combine before the term groupby — the shuffle moves
    (term, count) partials, never the corpus text."""
    return (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(_df_partial("doc_freq"), batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("doc_freq", alias_name="doc_freq"))
        .sort(["doc_freq", "term"], descending=[True, False])
        .limit(100)
    )


def q_kmeans_assign(sf_dir: str):
    """Document clustering: one int64-quantized Lloyd step over strided
    seed centroids (the IVF coarse quantizer as a first-class op), then
    assignment in map_batches — centroids broadcast once, the corpus
    never leaves the workers. Output (vec_id, cluster)."""
    nlist = _IVF_NLIST
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cn = _norm_rows(_ivf_centroids(sf_dir, ds, nlist))
    cref = ray.put(cn)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": t["vec_id"],
                             "cluster": pa.array([], type=pa.int64())})
        c = _bget(cref)
        mat = _emb_matrix(t["embedding"])
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": pa.array(
                np.argmax(_norm_rows(mat) @ c.T, axis=1).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=512)


# Coarse bucket count for the semantic-dedup shuffle: clusters hash
# into a FIXED number of groups (one map_groups task each holding
# whole clusters), so task count doesn't grow with nlist at scale.
_SEM_PARTS = int(os.environ.get("JCR_SEM_PARTS", "64"))


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-prune semantic dedup, per the public
    method: k-means the embedding space, drop near-identical vectors
    within each cluster): centroids from the shared distributed Lloyd
    step (``_ivf_centroids`` — strided seeds, one int64-quantized
    round, order-free partial sums), assignment map-side with
    broadcast centroids, then ONE shuffle keyed on a coarse cluster
    bucket and a per-cluster O(m²) cosine prune inside ``map_groups``
    (vector j drops when some i<j in its cluster has cosine ≥
    ``_COS_TAU``; the lowest id of every near-dup ball survives —
    deterministic on any cluster size). Σm² replaces the corpus
    O(N²): ``_ivf_params`` grows nlist as √N so expected cluster size
    stays bounded, and the bucket key (cluster % ``_SEM_PARTS``)
    keeps the group count fixed instead of one task per cluster —
    raise ``JCR_SEM_PARTS`` with the cluster count at corpus scale so
    one bucket's rows (embeddings included) fit a worker's heap.
    Output: kept (vec_id, cluster)."""
    n_rows = _tbl_rows(sf_dir, "embeddings")
    nlist, _ = _ivf_params(n_rows)
    ds = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    cn = _norm_rows(_ivf_centroids(sf_dir, ds, nlist))
    cref = ray.put(cn)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], type=pa.int64())
            return pa.table({"vec_id": e, "cluster": e, "bucket": e,
                             "embedding": t["embedding"]})
        c = _bget(cref)
        mat = _emb_matrix(t["embedding"])
        cl = np.argmax(_norm_rows(mat) @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "cluster": pa.array(cl),
                         "bucket": pa.array(cl % _SEM_PARTS),
                         "embedding": t["embedding"]})

    def prune(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = g["cluster"].to_numpy(zero_copy_only=False)
        mat = _norm_rows(_emb_matrix(g["embedding"]))
        keep_ids: list[np.ndarray] = []
        keep_cl: list[np.ndarray] = []
        for c in np.unique(cl):
            rows = np.nonzero(cl == c)[0]
            # id-sorted rows: the golden compares in the same order,
            # so the sims matrix (and the float comparisons) agree
            rows = rows[np.argsort(ids[rows], kind="stable")]
            x = mat[rows]
            drop = np.triu(x @ x.T >= _COS_TAU, k=1).any(axis=0)
            keep_ids.append(ids[rows][~drop])
            keep_cl.append(np.full(int((~drop).sum()), c, dtype=np.int64))
        return pa.table({
            "vec_id": pa.array(np.concatenate(keep_ids) if keep_ids
                               else np.array([], dtype=np.int64)),
            "cluster": pa.array(np.concatenate(keep_cl) if keep_cl
                                else np.array([], dtype=np.int64)),
        })

    return (ds.map_batches(assign, batch_format="pyarrow", batch_size=512)
            .groupby("bucket")
            .map_groups(prune, batch_format="pyarrow"))


# Knuth multiplicative hash over doc_id: deterministic, RNG-free, and
# expressible in ANSI SQL ((doc_id * 2654435761) % 2^32) so split/sample
# decisions are identical on any engine and any cluster size.
_HASH_MULT = 2654435761
_HASH_MOD = 4294967296


def q_train_split(sf_dir: str):
    """Deterministic train/val/test split (90/5/5) by multiplicative
    doc_id hash — the assignment every training pipeline needs: stable
    across runs and cluster sizes, no RNG state to coordinate. Per-batch
    count partials pre-combine before the 3-row groupby, so the shuffle
    moves 3 rows per block regardless of corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        b = (t["doc_id"].to_numpy() * _HASH_MULT) % _HASH_MOD % 100
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        u, c = np.unique(split, return_counts=True)
        return pa.table({"split": pa.array(u), "n": pa.array(c.astype(np.int64))})

    return (
        _tbl(sf_dir, "documents", ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: the 10 docs per source with
    the smallest doc_id hash — uniform-at-random in distribution yet
    reproducible bit-for-bit. Map-side partial top-10 per stratum
    bounds the shuffle at 10 × |strata| rows per block; the corpus
    text never moves (only keys are read)."""
    k = 10

    def partial(df: pd.DataFrame):
        df = df.copy()
        df["hkey"] = (df["doc_id"].to_numpy() * _HASH_MULT) % _HASH_MOD
        df = df.sort_values(["hkey", "doc_id"], kind="stable")
        return _arrow_out(df.groupby("source", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hkey", "doc_id"], kind="stable").head(k)
        return g[["source", "doc_id"]]

    return (
        _tbl(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


def q_bigram_counts(sf_dir: str):
    """N-gram statistics: top-100 word bigrams with deterministic
    boundary tie-break (count desc, bigram asc). Per-batch Counter
    partials pre-combine; the shuffle moves (bigram, count) partials,
    never the corpus text."""
    from collections import Counter

    def partial(df: pd.DataFrame):
        c: Counter = Counter()
        for t in df["text"]:
            w = t.split(" ")
            c.update(map(" ".join, zip(w, w[1:])))
        return _arrow_out(pd.DataFrame({
            "bigram": list(c.keys()),
            "n": np.fromiter(c.values(), dtype=np.int64, count=len(c)),
        }))

    return (
        _bucket_sum(_tbl(sf_dir, "documents", ["text"])
                    .map_batches(partial, batch_format="pandas"),
                    "bigram", "n")
        .sort(["n", "bigram"], descending=[True, False])
        .limit(100)
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


def q_bpe_merge_pairs(sf_dir: str):
    """First BPE training step — adjacent CHARACTER-pair counts over
    the corpus weighted by word frequency (the merge-candidate table a
    tokenizer trainer ranks every round): per-batch word-frequency
    partials via ``np.unique``, pair extraction per DISTINCT word —
    the classic BPE trick that makes the step vocab-bounded, not
    corpus-bounded — then a single coalesced combine over the tiny
    (≤alphabet²) pair space and top-50 by (n desc, pair asc)."""

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], " "))
        u, c = np.unique(words.to_numpy(zero_copy_only=False),
                         return_counts=True)
        pairs: dict[str, int] = {}
        for w, f in zip(u, c):
            f = int(f)
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                pairs[p] = pairs.get(p, 0) + f
        return pa.table({
            "pair": pa.array(list(pairs.keys()), type=pa.string()),
            "n": pa.array(np.fromiter(pairs.values(), dtype=np.int64,
                                      count=len(pairs))),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pair", as_index=False)["n"].sum()
        g = g.sort_values(["n", "pair"], ascending=[False, True]).head(50)
        return g.reset_index(drop=True).astype({"n": np.int64})

    return (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
    )


# Above this many distinct terms the TF-IDF scorer stops broadcasting
# the DF table and attaches DF via a distributed term-keyed cogroup:
# raw web text (typos, URLs, hashes) reaches 10^8+ distinct terms —
# a driver-side dict of that is a scale-killer.
_DF_BCAST_LIMIT = int(os.environ.get("JCR_DF_BCAST_LIMIT", "5000000"))


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF relevance: each document's top term under a ratio-idf
    score (tf × N / df). The ratio variant is deliberate: one exact
    int multiply + one IEEE division is bit-identical across engines,
    where log-idf would rank identically but hash-differently. DF comes
    from a distributed partial-count groupby; while the vocabulary
    stays under ``_DF_BCAST_LIMIT`` distinct terms the full DF table
    broadcasts via ``ray.put`` and scoring is pure map-side. Above the
    limit (raw web text reaches 10^8+ distinct terms) the full
    vocabulary never exists anywhere: a SEMI-JOIN PUSHDOWN first
    collects the scoring subset's term set (bounded by the subset —
    here doc_id < 50 — not the corpus), broadcasts it, and filters the
    DF partials down to those terms before the groupby, so the shuffle
    and the final DF broadcast are subset-vocabulary-sized. (A first
    cut cogrouped per-doc (term, tf) rows with the FULL 10.5M-term DF
    table instead — correct, but the full-vocab groupby + exchange
    measured 719 s at 100k docs where this pushdown needs one filtered
    corpus pass.) The dispatch itself reads an HLL distinct-term
    estimate, not an exact count — counting the vocabulary exactly
    would need the full-vocab groupby the dispatch exists to avoid.
    Scoring arithmetic and the (score desc, term asc) tie-break are
    identical on both paths. Output is restricted to doc_id < 50 by a
    pruned predicate read."""
    from collections import Counter

    n_docs = papq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows

    import pyarrow.dataset as pads
    sub = _tbl(sf_dir, "documents", ["doc_id", "text"],
               filter=pads.field("doc_id") < 50)

    # Path dispatch on an HLL distinct-term ESTIMATE (~1.6% error —
    # plenty for a threshold): one corpus pass merging 4096-register
    # partials. Counting the vocabulary exactly would need the very
    # full-vocab groupby the dispatch exists to avoid.
    from ..functions import sketch

    # ONE corpus tokenize pass: the HLL registers hash the SAME
    # per-batch distinct terms the DF partials already emit (HLL is
    # duplicate-insensitive, so partial rows repeating a term across
    # batches don't bias the estimate) — materialized so the dispatch
    # sketch and the later DF groupby both read the partial rows
    # instead of re-splitting every document.
    df_partials = _tbl(sf_dir, "documents", ["text"]).map_batches(
        _df_partial("df"), batch_format="pandas").materialize()

    def term_hll(t: pa.Table) -> pa.Table:
        terms = t["term"].to_numpy(zero_copy_only=False)
        keys = pd.util.hash_array(terms).view(np.int64)
        regs = sketch.hll_registers(keys)
        nz = np.nonzero(regs)[0]
        return pa.table({"reg": pa.array(nz, pa.int64()),
                         "rank": pa.array(regs[nz], pa.int64())})

    hll_rows = (
        df_partials.map_batches(term_hll, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
    ).to_pandas()
    regs = np.zeros(sketch.HLL_M, dtype=np.int64)
    regs[hll_rows["reg"].to_numpy(np.int64)] = \
        hll_rows["rank"].to_numpy(np.int64)
    n_terms = sketch.hll_estimate(regs)

    def make_score(ref):
        def score(df: pd.DataFrame) -> pd.DataFrame:
            dmap = _bget(ref)
            ids, terms, scores = [], [], []
            for did, txt in zip(df["doc_id"], df["text"]):
                best_t, best_s = None, -1.0
                for term, tf in Counter(txt.split(" ")).items():
                    s = (tf * n_docs) / dmap[term]
                    if s > best_s or (s == best_s and term < best_t):
                        best_t, best_s = term, s
                ids.append(int(did)); terms.append(best_t); scores.append(best_s)
            return pd.DataFrame({
                "doc_id": pd.Series(ids, dtype=np.int64),
                "term": pd.Series(terms, dtype=object),
                "score": pd.Series(scores, dtype=np.float64),
            })

        return score

    if n_terms <= _DF_BCAST_LIMIT:
        dfd = (df_partials.groupby("term")
               .aggregate(Sum("df", alias_name="df"))).to_pandas()
        ref = ray.put(dict(zip(dfd["term"], dfd["df"].astype(int))))
        return sub.map_batches(make_score(ref), batch_format="pandas")

    # ---- semi-join pushdown: subset term set → filtered DF pass ----
    def subset_terms(df: pd.DataFrame) -> pa.Table:
        terms: set[str] = set()
        for txt in df["text"]:
            terms.update(txt.split(" "))
        return pa.table({"term": pa.array(sorted(terms), type=pa.string())})

    # bounded by the SUBSET vocabulary (per-partition distinct via one
    # coalesced merge), never the corpus vocabulary
    qterm_tbls = [t for t in ray.get(
        sub.map_batches(subset_terms, batch_format="pandas")
        .materialize().to_arrow_refs()) if t.num_rows > 0]
    qterms = pc.unique(pa.concat_tables(qterm_tbls)["term"].combine_chunks())
    tref = ray.put(qterms)

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["term"], value_set=_bget(tref)))

    pruned = (
        df_partials.map_batches(prune, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    ).to_pandas()
    ref = ray.put(dict(zip(pruned["term"], pruned["df"].astype(int))))
    return sub.map_batches(make_score(ref), batch_format="pandas")


def q_length_histogram(sf_dir: str):
    """Distribution profiling: histogram of document length (200-char
    buckets, capped at bucket 9). Per-batch bincount partials → a
    ≤10-row groupby — the canonical partial-combine aggregation."""

    def partial(t: pa.Table) -> pa.Table:
        b = np.minimum(t["n_chars"].to_numpy() // 200, 9).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u), "n": pa.array(c.astype(np.int64))})

    return (
        _tbl(sf_dir, "documents", ["n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


_PRICE_HIST_BINS = 64


@lru_cache(maxsize=8)
def _price_cents_minmax(sf_dir: str) -> tuple[int, int]:
    """Global (min, max) of l_extendedprice in integer cents — the
    associative first pass shared by the histogram/quantile sketches
    (cached per table: the bounds are deterministic, so the quantile
    sketch riding the histogram does not re-scan for them)."""
    mm = _tbl(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"cents": pc.cast(
            pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())}),
        batch_format="pyarrow",
    ).aggregate(Min("cents"), Max("cents"))
    return int(mm["min(cents)"]), int(mm["max(cents)"])


def q_price_histogram(sf_dir: str):
    """Equi-width histogram SKETCH over l_extendedprice — the order-free
    mergeable distribution profile (the exact-quantile complement to
    ``group_quantiles``: at 100 TB you ship 64 counters per block, not
    values). Two linear passes over ONE pruned column: global min/max
    (associative aggregate), then per-batch ``np.bincount`` partials
    merged in a single coalesced reduce — no sort, no all-to-all.
    Binning is in integer CENTS with pure integer arithmetic, so the
    engine and the SQL oracle can never disagree on a boundary."""
    mn, mx = _price_cents_minmax(sf_dir)
    width = mx - mn + 1

    def partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
        b = (cents - mn) * _PRICE_HIST_BINS // width
        counts = np.bincount(b, minlength=_PRICE_HIST_BINS)
        return pa.table({
            "bin": pa.array(np.arange(_PRICE_HIST_BINS, dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bin", as_index=False)["n"].sum()
        out = out[out["n"] > 0]
        return out.astype({"bin": np.int64, "n": np.int64})

    return (
        _tbl(sf_dir, "lineitem", ["l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


_SKETCH_QUANTILES = (50, 90, 99)


def q_price_quantiles_sketch(sf_dir: str):
    """Approximate quantiles FROM the histogram sketch — the 100 TB
    quantile path (``group_quantiles`` is exact but ships values; this
    ships the 64 counters of ``price_histogram`` and answers p50/p90/
    p99 from them). The estimate is the LOWER EDGE of the bin holding
    the target rank, in pure integer arithmetic (``mn + ceil(b·W/64)``)
    so the engine and the SQL oracle agree bit-for-bit. Error is
    bounded by one bin width by construction."""
    hist = q_price_histogram(sf_dir).to_pandas().sort_values("bin")
    bins = hist["bin"].to_numpy(np.int64)
    counts = hist["n"].to_numpy(np.int64)
    total = int(counts.sum())
    mn, mx = _price_cents_minmax(sf_dir)
    width = mx - mn + 1
    cum = np.cumsum(counts)
    rows = []
    for q in _SKETCH_QUANTILES:
        rank = (total * q + 99) // 100  # ceil(total*q/100), 1-based
        b = int(bins[np.searchsorted(cum, rank)])
        lo = mn + (b * width + _PRICE_HIST_BINS - 1) // _PRICE_HIST_BINS
        rows.append((q, b, lo))
    return pd.DataFrame(rows, columns=["q", "bin", "est_cents"]).astype(
        {"q": np.int64, "bin": np.int64, "est_cents": np.int64})


def _split_purchase_click(df: pd.DataFrame):
    """Shared co-partitioning stage for the time joins (as-of + range):
    filter to purchase/click, coarse user bucket, purchase flag. ONE
    definition so the two joins' partitioning schemes can never
    desynchronize."""
    df = df[df["event_type"].isin(["purchase", "click"])].copy()
    df["bucket"] = (df["user_id"] % 64).astype(np.int64)
    return _arrow_out(df.drop(columns=["event_type"]).assign(
        is_purchase=(df["event_type"] == "purchase")))


def q_asof_join_events(sf_dir: str):
    """AS-OF join — the time-series operator Ray Data lacks natively:
    for every 'purchase' event, the latest 'click' by the same user at
    or before it. Both sides co-partition on a coarse user bucket (the
    session_windows partitioning), then a per-user numpy searchsorted
    merge inside map_groups — no per-row Python in the match step, no
    all-to-all beyond the single bucket groupby. Tie semantics match
    DuckDB ASOF (greatest click_ts ≤ purchase ts, equality included)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_purchase"]].sort_values("ts", kind="stable")
            c = u[~u["is_purchase"]].sort_values("ts", kind="stable")
            if p.empty or c.empty:
                continue
            cts = c["ts"].to_numpy()
            idx = np.searchsorted(cts, p["ts"].to_numpy(), side="right") - 1
            keep = idx >= 0
            out.append(pd.DataFrame({
                "event_id": p["event_id"].to_numpy()[keep],
                "ts": p["ts"].to_numpy()[keep],
                "click_ts": cts[idx[keep]],
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "click_ts": pd.Series([], dtype="datetime64[us]"),
            })
        return pd.concat(out, ignore_index=True)

    return (
        _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .map_batches(_split_purchase_click, batch_format="pandas")
        .groupby("bucket", num_partitions=16)
        .map_groups(merge, batch_format="pandas")
    )


_PACK_BUDGET = 512  # context-window token budget
_PACK_RANGE = 1024  # doc_ids per prefix-sum bucket


def q_pack_offsets(sf_dir: str):
    """Sequence packing (concat-and-chunk — how training corpora become
    fixed-length context windows): every document's [start, end) token
    offset in the doc_id-ordered concatenated token stream, plus the
    first/last context-window bin it lands in at budget 512. The
    distributed prefix-sum shape: (1) per-bucket token sums via a tiny
    groupby (buckets = doc_id // 1024, so the driver-side cumsum table
    is N/1024 rows — metadata-scale), (2) broadcast bucket base
    offsets, (3) per-bucket map_groups cumsums doc order within its
    bucket and adds the base. One bounded shuffle, no global sort."""
    budget, rng = _PACK_BUDGET, _PACK_RANGE

    def tokenize(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        bucket = pc.cast(pc.divide(t["doc_id"], rng), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n": n, "bucket": bucket})

    toks = _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        tokenize, batch_format="pyarrow"
    )
    # pass 1: bucket totals -> driver cumsum (N/1024 rows: bounded)
    sums = (
        toks.groupby("bucket").aggregate(Sum("n", alias_name="tot")).to_pandas()
    ).sort_values("bucket")
    base = dict(zip(
        sums["bucket"].to_numpy(np.int64),
        np.concatenate([[0], sums["tot"].to_numpy(np.int64).cumsum()[:-1]]),
    ))
    bref = ray.put(base)

    # pass 2: within-bucket exclusive cumsum + broadcast base offset
    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        b0 = int(_bget(bref)[int(g["bucket"].iloc[0])])
        g = g.sort_values("doc_id", kind="stable")
        n = g["n"].to_numpy(np.int64)
        start = b0 + np.concatenate([[0], n.cumsum()[:-1]])
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "start_off": start,
            "end_off": start + n,
            "bin_start": start // budget,
            "bin_end": (start + n - 1) // budget,
        })

    return toks.groupby("bucket", num_partitions=16).map_groups(
        offsets, batch_format="pandas"
    )


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct-count sketch (p=12, ~1.6% standard error) —
    the fixed-memory alternative to ``distinct_users``' exact groupby:
    4096 int registers per block instead of a hash shuffle over every
    key, the shape you want when the key domain itself won't fit a
    shuffle. Registers merge by elementwise max (order-free, so the
    estimate is bit-deterministic on any partitioning); the oracle is
    the identical sequential sketch (``functions/sketch.py`` leaf
    kernels, independently orchestrated)."""
    from ..functions import sketch

    def partial(t: pa.Table) -> pa.Table:
        regs = sketch.hll_registers(t["user_id"].to_numpy())
        nz = np.nonzero(regs)[0]
        return pa.table({"reg": pa.array(nz, pa.int64()),
                         "rank": pa.array(regs[nz], pa.int64())})

    merged = (
        _tbl(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rank", alias_name="rank"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(sketch.HLL_M, dtype=np.int64)
        regs[df["reg"].to_numpy(np.int64)] = df["rank"].to_numpy(np.int64)
        return pd.DataFrame({"n_approx": pd.Series(
            [sketch.hll_estimate(regs)], dtype=np.int64)})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=1 << 30)


_CM_PROBE_KEYS = 20  # fixed probe set: user_ids 0..19


def q_cm_counts_users(sf_dir: str):
    """Count-min point-count estimates — the companion sketch to the
    HLL distinct count: per-batch (4×4096)-cell partial tables merge by
    elementwise SUM (integer, order-free → bit-deterministic on any
    partitioning), then a fixed probe-key set reads min-over-rows
    estimates from the merged table. This is the shape for frequency
    queries over a 100 TB stream where a per-key groupby would shuffle
    every row: only sparse nonzero cells cross the network, the merged
    sketch is 128 KB regardless of input size, and estimates
    overestimate by ≤ 2N/4096 w.h.p. The oracle is the identical
    sequential sketch (shared ``functions/sketch.py`` leaves,
    independent orchestration)."""
    from ..functions import sketch

    def partial(t: pa.Table) -> pa.Table:
        tbl = sketch.cm_table(t["user_id"].to_numpy()).ravel()
        nz = np.nonzero(tbl)[0]
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "cnt": pa.array(tbl[nz], pa.int64())})

    merged = (
        _tbl(sf_dir, "events", ["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tbl = np.zeros(sketch.CM_D * sketch.CM_W, dtype=np.int64)
        tbl[df["cell"].to_numpy(np.int64)] = df["cnt"].to_numpy(np.int64)
        keys = np.arange(_CM_PROBE_KEYS, dtype=np.int64)
        est = sketch.cm_query(tbl.reshape(sketch.CM_D, sketch.CM_W), keys)
        return pd.DataFrame({"user_id": keys, "n_est": est.astype(np.int64)})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=1 << 30)


def q_range_join_events(sf_dir: str):
    """Interval (range) join — the band-join operator equi-join engines
    lack: for every purchase, the number of clicks by the same user in
    the preceding hour (exclusive lower bound, inclusive upper). Same
    co-partitioning as the as-of join (coarse user buckets), then a
    two-searchsorted count per user — no per-row Python in the match
    step, no all-to-all beyond the single bucket groupby."""

    def count_clicks(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_purchase"]]
            if p.empty:
                continue
            cts = np.sort(u.loc[~u["is_purchase"], "ts"].to_numpy())
            pts = p["ts"].to_numpy()
            hi = np.searchsorted(cts, pts, side="right")
            lo = np.searchsorted(cts, pts - np.timedelta64(1, "h"), side="right")
            out.append(pd.DataFrame({
                "event_id": p["event_id"].to_numpy(np.int64),
                "n_clicks": (hi - lo).astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "n_clicks": pd.Series([], dtype=np.int64),
            })
        return pd.concat(out, ignore_index=True)

    return (
        _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        .map_batches(_split_purchase_click, batch_format="pandas")
        .groupby("bucket", num_partitions=16)
        .map_groups(count_clicks, batch_format="pandas")
    )


def q_grouped_topk_parts(sf_dir: str):
    """Grouped top-k (the window-function shape): top 3 parts per brand
    by (retailprice desc, partkey asc). Per-batch partial top-3 per
    brand pre-combines before the small groupby — the shuffle moves at
    most 3×brands×blocks rows, never the table."""
    k = 3

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["p_retailprice", "p_partkey"],
                            ascending=[False, True], kind="stable")
        return _arrow_out(df.groupby("p_brand", sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True], kind="stable").head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["p_brand", "p_partkey", "p_retailprice", "rank"]]

    return (
        _tbl(sf_dir, "part", ["p_brand", "p_partkey", "p_retailprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(final, batch_format="pandas")
    )


_QUANTILES = (0.5, 0.9, 0.99)


def q_quantiles_lineitem(sf_dir: str):
    """EXACT distributed quantiles without a global sort: per-batch
    value-count partials → groupby(value) count-sum (cardinality = the
    distinct-value count, not the row count) → one coalesced task sorts
    the histogram and reads off discrete quantiles (1-based rank
    ceil(q·N), DuckDB's quantile_disc). For a truly continuous column
    this becomes iterative histogram refinement; l_quantity's domain is
    discrete so one pass is exact."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["l_quantity"].value_counts()
        return _arrow_out(pd.DataFrame({
            "q": vc.index.to_numpy(np.float64),
            "c": vc.to_numpy(np.int64),
        }))

    hist = (
        _tbl(sf_dir, "lineitem", ["l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .groupby("q")
        .aggregate(Sum("c", alias_name="c"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("q", kind="stable")
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = df["q"].to_numpy()
        out = {}
        for tag, q in zip(("p50", "p90", "p99"), _QUANTILES):
            rank = max(1, int(np.ceil(q * n)))
            out[tag] = [float(vals[np.searchsorted(cum, rank)])]
        return pd.DataFrame(out)

    return hist.map_batches(finish, batch_format="pandas", batch_size=1 << 30)


def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus) — per-batch partial
    counts at the finest level; ONE coalesced task derives the coarser
    levels from the (tiny) fine aggregate. 'ALL' stands in for the
    rollup NULL on both sides."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("l_returnflag", "size"))
        return _arrow_out(g)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        fine = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("n", "sum"))
        mid = fine.groupby("l_returnflag", as_index=False).agg(n=("n", "sum"))
        mid["l_linestatus"] = "ALL"
        top = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                            "n": [fine["n"].sum()]})
        out = pd.concat([fine, mid, top], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out.rename(columns={"l_returnflag": "rf", "l_linestatus": "ls"})[
            ["rf", "ls", "n"]]

    return (
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_embed_documents(sf_dir: str):
    """T1/T2: the embedding actor-pool stage (model load once per
    actor, batched inference; deterministic stand-in model — see
    stages/embed.py). Rows-only."""
    from ..stages.embed import EmbedDocuments

    ds = _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        EmbedDocuments, batch_format="pandas", batch_size=128,
        concurrency=2, num_cpus=1,
    )

    def norms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "dim": [len(v) for v in df["embedding"]],
            "norm": np.round([float(np.linalg.norm(v)) for v in df["embedding"]], 4),
        })

    return ds.map_batches(norms, batch_format="pandas")


def q_png_export(sf_dir: str):
    """STANDARD-format interchange: decode every crawled image (the
    self-built raw/pngz/qjpg codecs) and re-encode as REAL PNG
    (RFC 2083 wire bytes, functions/std_codecs.py — stdlib-native, no
    Pillow) — the export step a corpus consumer runs before handing
    images to external tooling. PNG is lossless, so the re-decoded
    pixels must be identical (``exact`` per row); the byte size is
    deterministic (fixed zlib level), golden-checked. Actor-pool-shaped
    map_batches over the binary column, small batches (wide rows)."""
    from ..functions import codecs as _c

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes"])

    def to_png(t: pa.Table) -> pa.Table:
        ids, sizes, exact = [], [], []
        for iid, buf in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            px, _ = _c.decode(buf)
            png = _c.encode(px, "png")
            back, fmt = _c.decode(png)
            ids.append(iid)
            sizes.append(len(png))
            exact.append(bool(fmt == "png" and np.array_equal(back, px)))
        return pa.table({"image_id": pa.array(ids, type=pa.string()),
                         "png_size": pa.array(sizes, type=pa.int64()),
                         "exact": pa.array(exact, type=pa.bool_())})

    return ds.map_batches(to_png, batch_format="pyarrow", batch_size=64)


def q_clip_align(sf_dir: str):
    """CLIP-score-style image-caption alignment gate (the LAION
    curation signal; a training-data-pipeline extension — the
    reference has no CLIP stage): two-tower cosine per (image,
    caption) row via an actor-pool stage (projections built once per
    actor in ``__init__``, decode dominating the per-row loop), then
    a vectorized rounding + threshold map. Map-only end to end — no
    shuffle, streams at any corpus size. The gate keeps rows whose
    ROUNDED score clears the threshold, so the engine and the
    sequential golden can never disagree in the last ulp."""
    from ..stages.multimodal import ClipAlign

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes", "caption"])

    def finish(t: pa.Table) -> pa.Table:
        s = _round_half_up(
            t["raw_score"].to_numpy(zero_copy_only=False), 6)
        return pa.table({
            "image_id": t["image_id"],
            "clip_score": pa.array(s, type=pa.float64()),
            "kept": pa.array(s >= _CLIP_THRESHOLD),
        })

    return (ds.map_batches(ClipAlign, batch_format="pyarrow",
                           batch_size=64,
                           concurrency=(2, 16), num_cpus=1)
            .map_batches(finish, batch_format="pyarrow"))


# keep/drop boundary for the stand-in CLIP gate: scores are cosines of
# independent random projections (mean ~0), so 0.0 splits the corpus
# into two non-trivial classes deterministically
_CLIP_THRESHOLD = 0.0


def q_multimodal_resize(sf_dir: str):
    """Decode → nearest-neighbor 32×32 thumbnail → re-encode, as an
    actor-pool stage over the binary image column (rows-only)."""
    from ..stages.multimodal import ResizeImages

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"), columns=["image_id", "bytes"])
    thumbs = ds.map_batches(
        ResizeImages, batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1
    )
    return thumbs.select_columns(["image_id", "w", "h", "thumb_phash"])


def _synth_audio(t: pa.Table) -> pa.Table:
    """Deterministic binary audio column keyed by doc_id (the sandbox
    has no media files; a real pipeline reads clip bytes from storage).
    Stateless task stage — the per-clip cost is the synthesis itself."""
    from ..functions import av_codecs

    ids = t["doc_id"].to_pylist()
    return pa.table({
        "clip_id": pa.array(ids, type=pa.int64()),
        "bytes": pa.array(
            [av_codecs.encode_audio(av_codecs.gen_wave(int(d)), 16000)
             for d in ids],
            type=pa.binary()),
    })


def q_audio_features(sf_dir: str):
    """Audio feature extraction over an opaque binary column: decode
    (this repo's own jaud delta-PCM codec — external formats keep a
    NotImplementedError seam) → per-clip sample_rate / duration / RMS.
    Actor-pool map_batches with small batches (wide binary rows) —
    the reference has no audio path; this is the training-data
    multimodal extension."""
    from ..stages.multimodal import AudioFeatures

    ds = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        _synth_audio, batch_format="pyarrow")
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64,
        concurrency=2, num_cpus=1)


def _synth_video(t: pa.Table) -> pa.Table:
    """Deterministic binary video column (jvid container) keyed by
    doc_id — 8-16 procedurally drifting frames per clip."""
    from ..functions import av_codecs

    ids = t["doc_id"].to_pylist()
    return pa.table({
        "video_id": pa.array(ids, type=pa.int64()),
        "bytes": pa.array(
            [av_codecs.encode_video(av_codecs.gen_frames(int(d))) for d in ids],
            type=pa.binary()),
    })


def q_video_frames(sf_dir: str):
    """Video frame-sampling over an opaque binary column: the jvid
    container is length-prefixed, so every 3rd frame decodes WITHOUT
    decompressing the dropped ones (``av_codecs.sample_video``) —
    the property a real PyAV sampler has via keyframe seeks. Pruned to
    doc_id<64 at the row-group scan (videos are the widest rows)."""
    import pyarrow.dataset as _pads

    from ..stages.multimodal import FrameSample

    ds = _tbl(sf_dir, "documents", ["doc_id"],
              filter=_pads.field("doc_id") < 64).map_batches(
        _synth_video, batch_format="pyarrow")
    frames = ds.map_batches(
        FrameSample, fn_constructor_kwargs={"every_n": 3},
        batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1)
    return frames.select_columns(["video_id", "frame_idx", "frame_phash"])


def _synth_speech(t: pa.Table) -> pa.Table:
    """Deterministic silence-gated binary audio column keyed by doc_id
    (``av_codecs.gen_speech_wave`` — voiced runs separated by true
    silence, so VAD has segments to find)."""
    from ..functions import av_codecs

    ids = t["doc_id"].to_pylist()
    return pa.table({
        "clip_id": pa.array(ids, type=pa.int64()),
        "bytes": pa.array(
            [av_codecs.encode_audio(av_codecs.gen_speech_wave(int(d)), 16000)
             for d in ids],
            type=pa.binary()),
    })


def q_vad_segments(sf_dir: str):
    """Voice-activity-detection segmentation over an opaque binary
    audio column: decode → 25 ms frame energies → threshold →
    contiguous voiced runs, one row per segment (speech corpora are
    VAD-segmented before transcription/packing). Per-clip and map-only
    — no shuffle at any corpus size; actor-pool stage with small
    batches (wide binary rows). Rows-only (golden oracle)."""
    from ..stages.multimodal import VadSegments

    ds = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        _synth_speech, batch_format="pyarrow")
    return ds.map_batches(
        VadSegments, batch_format="pyarrow", batch_size=64,
        concurrency=(2, 28), num_cpus=1)  # autoscale: Ray fuses the
    # synthesis task stage INTO this pool (the clip_align lesson) —
    # a fixed 2-actor pool would serialize synth+decode at 2 cores


def _synth_scene_video(t: pa.Table) -> pa.Table:
    """Deterministic multi-scene binary video column keyed by doc_id
    (``av_codecs.gen_scene_frames`` — 2-4 scenes with an abrupt base
    switch between them)."""
    from ..functions import av_codecs

    ids = t["doc_id"].to_pylist()
    return pa.table({
        "video_id": pa.array(ids, type=pa.int64()),
        "bytes": pa.array(
            [av_codecs.encode_video(av_codecs.gen_scene_frames(int(d)))
             for d in ids],
            type=pa.binary()),
    })


def q_scene_cuts(sf_dir: str):
    """Scene-cut detection over an opaque binary video column:
    consecutive-frame mean-absolute-delta threshold, one row per cut
    (the shot-boundary pass a video training pipeline runs before
    clip sampling). Per-clip deltas never cross clip boundaries, so
    the stage is map-only; pruned to doc_id<64 at the row-group scan
    (videos are the widest rows). Rows-only (golden oracle)."""
    import pyarrow.dataset as _pads

    from ..stages.multimodal import SceneCuts

    ds = _tbl(sf_dir, "documents", ["doc_id"],
              filter=_pads.field("doc_id") < 64).map_batches(
        _synth_scene_video, batch_format="pyarrow")
    return ds.map_batches(
        SceneCuts, batch_format="pyarrow", batch_size=16,
        concurrency=2, num_cpus=1)


def q_scene_clips(sf_dir: str):
    """Scene SPANS — the clip-sampling units a video training pipeline
    cuts after shot detection (the video analog of ``vad_segments``):
    one row per contiguous scene ([start, end) frame range), the
    complement of ``scene_cuts``' boundary set. Map-only per clip;
    same doc_id<64 row-group pruning as the other video ops.
    Rows-only (golden oracle)."""
    import pyarrow.dataset as _pads

    from ..stages.multimodal import SceneClips

    ds = _tbl(sf_dir, "documents", ["doc_id"],
              filter=_pads.field("doc_id") < 64).map_batches(
        _synth_scene_video, batch_format="pyarrow")
    return ds.map_batches(
        SceneClips, batch_format="pyarrow", batch_size=16,
        concurrency=2, num_cpus=1)


def q_phash_neardup(sf_dir: str):
    """SURVEY §2.7 D5: perceptual-hash near-dup over images — LSH-style
    banding on 16-bit phash bands → groupby band → candidate pairs →
    verify Hamming ≤ 8. Originals vs their 32×32 thumbnails give true
    positives (avg-hash is resize-robust). Rows-only."""
    from ..stages.multimodal import ResizeImages

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes", "phash"])
    thumbs = ds.map_batches(
        ResizeImages, batch_format="pyarrow", batch_size=64,
        concurrency=(2, 8), num_cpus=1  # autoscale: 2 covers crawl-scale
    )                                   # corpora, 8 the stress bench

    def orig_rows(t: pa.Table) -> pa.Table:
        return pa.table({"pid": t["image_id"], "phash": t["phash"]})

    def thumb_rows(t: pa.Table) -> pa.Table:
        ids = pc.binary_join_element_wise(t["image_id"], "#thumb", "")
        return pa.table({"pid": ids, "phash": t["thumb_phash"]})

    allhash = ds.map_batches(orig_rows, batch_format="pyarrow").union(
        thumbs.map_batches(thumb_rows, batch_format="pyarrow")
    )
    import pyarrow.dataset as pads
    est = 2 * pads.dataset(os.path.join(out, "image_caption"),
                           format="parquet").count_rows()  # orig + thumb
    return _banded_hamming_pairs(allhash, "pid", "phash", max_d=8,
                                 id_dtype=object, est_rows=est)


def q_dhash_neardup(sf_dir: str):
    """Difference-hash near-dup pairs — the SECOND perceptual detector
    a production image-dedup pass cross-checks against phash
    (gradient structure vs average luma; imagehash's dhash): one
    actor-pool decode emits (pid, dhash) rows for each original AND
    its 32×32 thumbnail, then the shared ``_banded_hamming_pairs``
    kernel (8×8-bit bands, Hamming ≤ 8) finds pairs — identical scale
    story to ``phash_neardup``. Rows-only; sequential golden in
    goldens.py."""
    from ..stages.multimodal import DhashRows

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes"])
    rows = ds.map_batches(
        DhashRows, batch_format="pyarrow", batch_size=64,
        concurrency=(2, 8), num_cpus=1)
    import pyarrow.dataset as pads
    est = 2 * pads.dataset(os.path.join(out, "image_caption"),
                           format="parquet").count_rows()
    return _banded_hamming_pairs(rows, "pid", "dhash", max_d=8,
                                 id_dtype=object, est_rows=est)


def q_phash_dedup_keep(sf_dir: str):
    """Image near-dup REMOVAL — completes the image-dedup story the
    way ``minhash_dedup_keep`` does for text: phash LSH pairs →
    DISTRIBUTED connected components → DISTRIBUTED representative
    recovery → threshold-dispatched anti-join over the combined
    image-id set. The CC runs over siphash-mapped 63-bit node ids
    (``_cc_min_labels`` needs an integer label sum for its fixpoint
    test); representative recovery stays distributed — (node→pid)
    rows joined with the CC labels, ``groupby(lab).Min(pid)`` picks
    the lexicographically-least member per component (originals sort
    before their ``#thumb`` variants, so originals win), and a second
    bounded join marks every non-representative pid as a drop. Every
    intermediate is bounded by the near-dup pair set, which at a
    20-50% web dup rate is corpus-scale — so nothing here lands on
    the driver (the drop-set broadcast dispatches through
    ``_keep_corpus``'s size threshold). The pair set is materialized
    ONCE (without it, the CC edge build and the node scan each
    re-executed the full crawl-read → resize-pool → band-shuffle
    pipeline — measured 3× the query's dominant cost). Rows-only;
    golden oracle in ``goldens.py``."""
    pairs_str = q_phash_neardup(sf_dir).materialize()  # bounded: pairs
    out = _crawl_out(sf_dir)
    ids = rd.read_parquet(os.path.join(out, "image_caption"),
                          columns=["image_id"])

    def all_ids(t: pa.Table) -> pa.Table:
        orig = t["image_id"].combine_chunks()
        thumb = pc.binary_join_element_wise(orig, "#thumb", "")
        return pa.table({"pid": pa.concat_arrays([orig, thumb])})

    return _pid_dedup_keep(
        pairs_str, ids.map_batches(all_ids, batch_format="pyarrow"))


def _pid_hash(vals) -> np.ndarray:
    # vectorized 63-bit node id per pid — pandas' C siphash (stable
    # across processes), sign-cleared so % P ownership arithmetic
    # stays nonnegative. The pair set is corpus-scale at real dup
    # rates, so a per-row Python hash loop here would be a hot-path
    # scalar stage; collision space (63-bit) and failure mode
    # (over-merged component) are identical to the scalar hash64.
    return (pd.util.hash_array(np.asarray(vals, dtype=object))
            .view(np.int64) & np.int64(0x7FFF_FFFF_FFFF_FFFF))


def _pid_dedup_keep(pairs_str, corpus, id_col: str = "pid"):
    """Dedup-KEEP tail over STRING-keyed near-dup pairs — ONE helper
    shared by ``q_phash_dedup_keep`` and ``q_caption_dedup_images`` so
    the CC/representative/anti-join semantics cannot drift. ``corpus``
    is a Dataset whose ``id_col`` holds the full pid universe (extra
    columns ride along into the kept output)."""

    def to_hashed(df: pd.DataFrame) -> pd.DataFrame:
        return _arrow_out(pd.DataFrame({
            "id_a": pd.Series(_pid_hash(df["id_a"]), dtype=np.int64),
            "id_b": pd.Series(_pid_hash(df["id_b"]), dtype=np.int64),
        }))

    labels = _cc_min_labels(
        pairs_str.map_batches(to_hashed, batch_format="pandas"))
    parts = int(min(64, max(4, pairs_str.count() // 100_000 + 4)))
    P = np.int64(parts)

    # (pid → component label) via ONE cogroup exchange on the hashed
    # node id — answers from the CC labels, queries from the pair
    # endpoints (a pid repeats once per incident pair; harmless, the
    # downstream min/anti steps are idempotent). Same acero-free shape
    # as _cc_min_labels' exchange, for the same two reasons.
    def label_answers(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(node % P, type=pa.int64()),
            "key": t["node"], "lab": t["lab"],
            "pid": pa.nulls(t.num_rows, pa.string()),
            "is_q": pa.array(np.zeros(t.num_rows, dtype=bool)),
        })

    def pid_queries(df: pd.DataFrame) -> pd.DataFrame:
        pid = pd.concat([df["id_a"], df["id_b"]], ignore_index=True)
        key = _pid_hash(pid)
        return _arrow_out(pd.DataFrame({
            "part": key % P, "key": key,
            "lab": np.zeros(len(pid), dtype=np.int64), "pid": pid,
            "is_q": np.ones(len(pid), dtype=bool),
        }))

    def compose(t: pa.Table) -> pa.Table:
        ans = t.filter(pc.invert(t["is_q"]))
        q = t.filter(t["is_q"])
        akey = ans["key"].to_numpy(zero_copy_only=False)
        alab = ans["lab"].to_numpy(zero_copy_only=False)
        order = np.argsort(akey, kind="stable")
        qkey = q["key"].to_numpy(zero_copy_only=False)
        if len(qkey) == 0:
            return pa.table({"pid": pa.array([], type=pa.string()),
                             "lab": pa.array([], type=pa.int64())})
        idx = np.searchsorted(akey[order], qkey)
        # every query key MUST have an answer in its partition (CC
        # emits a label for every pair endpoint); verify instead of
        # indexing blindly — an unmatched key would otherwise raise
        # IndexError or silently take a neighbor's label
        np.minimum(idx, max(len(akey) - 1, 0), out=idx)
        if len(akey) == 0 or not np.array_equal(akey[order][idx], qkey):
            raise RuntimeError(
                "pid label compose: query key missing from its "
                "partition's answer set (CC node emission broke)")
        return pa.table({"pid": q["pid"],
                         "lab": pa.array(alab[order][idx], type=pa.int64())})

    labeled = (
        labels.map_batches(label_answers, batch_format="pyarrow")
        .union(pairs_str.map_batches(pid_queries, batch_format="pandas"))
        .groupby("part", num_partitions=parts)
        .map_groups(compose, batch_format="pyarrow")
    )

    # representative recovery, distributed: co-locate each component's
    # members (partition on lab), then per partition the smallest pid
    # of every lab-run survives and the rest become drops
    def part_by_lab(t: pa.Table) -> pa.Table:
        lab = t["lab"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(lab % P, type=pa.int64()))

    def select_drops(t: pa.Table) -> pa.Table:
        df = (t.select(["lab", "pid"]).to_pandas()
              .drop_duplicates()
              .sort_values(["lab", "pid"], kind="stable"))
        non_rep = df.loc[df["lab"].duplicated(), "pid"]
        return pa.table({"drop_id": pa.array(
            non_rep.to_numpy(dtype=object), type=pa.string())})

    drops = (
        labeled.map_batches(part_by_lab, batch_format="pyarrow")
        .groupby("_part", num_partitions=parts)
        .map_groups(select_drops, batch_format="pyarrow")
    )

    return _keep_corpus(corpus, id_col, drops)


def q_caption_neardup(sf_dir: str):
    """Caption near-dup pairs over the crawled image table — the
    text-side dedup signal a LAION-style pipeline applies to
    image+caption corpora (template captions dominate web data; pixel
    dedup alone misses re-encoded images that share boilerplate
    captions). Same distributed shape and tunables as
    ``q_minhash_lsh``, keyed by the STRING image_id: word-shingle
    minhash → band explode → coarse band-hash partition → run-detect
    candidate pairs → parallel exact-Jaccard verify, each verify batch
    fetching only ITS pairs' captions via an image_id-pruned parquet
    read of the crawl output. Rows-only; golden oracle in
    ``goldens.py``."""
    out = _crawl_out(sf_dir)
    img_dir = os.path.join(out, "image_caption")
    imgs = rd.read_parquet(img_dir, columns=["image_id", "caption"])
    hasher = dedupe.MinHasher(num_perm=_MH_PERMS, seed=_MH_SEED)
    bands = _MH_BANDS
    parts = 32

    def band_rows(t: pa.Table) -> pa.Table:
        pids = t["image_id"].to_pylist()
        caps = t["caption"].to_pylist()
        keys = np.empty(len(caps) * bands, dtype=np.int64)
        for i, cap in enumerate(caps):
            sig = hasher.signature(
                dedupe.shingle_set(cap, k=_MH_SHINGLE_K))
            keys[i * bands:(i + 1) * bands] = hasher.band_keys(sig, bands)
        return pa.table({
            "band_key": pa.array(keys),
            "part": pa.array(keys % parts),
            "pid": pa.array(np.repeat(np.asarray(pids, dtype=object),
                                      bands), type=pa.string()),
        })

    def partition_pairs(t: pa.Table) -> pa.Table:
        # vectorized run detection per coarse partition (the
        # q_minhash_lsh shape); the pid sort inside a run is an object
        # sort, but runs are bounded by the bucket-collision rate
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        order = np.argsort(bk, kind="stable")
        bk, pid = bk[order], pid[order]
        starts, ends = _key_runs(bk)
        multi = (ends - starts) >= 2
        out_a: list[str] = []
        out_b: list[str] = []
        for s, e in zip(starts[multi], ends[multi]):
            ids = np.unique(pid[s:e])
            for i in range(ids.size - 1):
                out_a.extend([ids[i]] * (ids.size - 1 - i))
                out_b.extend(ids[i + 1:].tolist())
        return pa.table({"id_a": pa.array(out_a, type=pa.string()),
                         "id_b": pa.array(out_b, type=pa.string())})

    from .crawl import dir_num_rows

    with _shuffle_scaled(dir_num_rows(img_dir) * bands * 40):
        cand = (
            imgs.map_batches(band_rows, batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(partition_pairs, batch_format="pyarrow")
        ).materialize()

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep_a, keep_b, keep_j = [], [], []
        if len(df):
            ids = sorted(set(df["id_a"]) | set(df["id_b"]))
            t = papq.read_table(img_dir, columns=["image_id", "caption"],
                                filters=[("image_id", "in", ids)])
            lut = dict(zip(t["image_id"].to_pylist(),
                           t["caption"].to_pylist()))
            cache: dict[str, np.ndarray] = {}

            def sh(i: str) -> np.ndarray:
                if i not in cache:
                    cache[i] = dedupe.shingle_set(lut[i],
                                                  k=_MH_SHINGLE_K)
                return cache[i]

            for a, b in zip(df["id_a"], df["id_b"]):
                jv = dedupe.jaccard(sh(a), sh(b))
                if jv >= _MH_VERIFY_TAU:
                    keep_a.append(a)
                    keep_b.append(b)
                    keep_j.append(round(jv, 4))
        return pd.DataFrame({"id_a": pd.Series(keep_a, dtype=object),
                             "id_b": pd.Series(keep_b, dtype=object),
                             "jacc": pd.Series(keep_j, dtype=np.float64)})

    def dedup_split(df: pd.DataFrame):
        df = df.drop_duplicates().sort_values(["id_a", "id_b"],
                                              kind="stable")
        step = 512
        for lo in range(0, len(df), step):
            yield _arrow_out(df.iloc[lo:lo + step])

    return (
        cand.map_batches(dedup_split, batch_format="pandas",
                         batch_size=1 << 30)
        .map_batches(verify, batch_format="pandas", batch_size=512)
    )


def q_caption_dedup_images(sf_dir: str):
    """Caption near-dup REMOVAL over the image table: verified caption
    pairs → the shared string-keyed dedup-KEEP tail
    (``_pid_dedup_keep``: hashed-node CC → distributed representative
    recovery, lexicographically-least image_id survives → size-
    dispatched anti-join). The kept output carries the caption so a
    downstream trainer consumes it directly. Rows-only; golden oracle
    in ``goldens.py``."""
    pairs = q_caption_neardup(sf_dir).materialize()
    out = _crawl_out(sf_dir)
    corpus = rd.read_parquet(
        os.path.join(out, "image_caption"),
        columns=["image_id", "caption"],
    ).map_batches(
        lambda t: pa.table({"pid": t["image_id"],
                            "caption": t["caption"]}),
        batch_format="pyarrow")
    return _pid_dedup_keep(pairs, corpus)


def _image_gate_mask(t: pa.Table):
    """LAION-style gate mask (min dimension, integer-exact aspect
    ratio, caption length + word count) — ONE engine-side source of
    truth shared by ``curate_image_corpus`` and the fused
    ``image_training_manifest``. The aspect gate compares integers
    (``max(w,h) <= 2*min(w,h)``) so the SQL oracles cannot drift on
    float division."""
    w64 = pc.cast(t["w"], pa.int64())
    h64 = pc.cast(t["h"], pa.int64())
    mind = pc.min_element_wise(w64, h64)
    maxd = pc.max_element_wise(w64, h64)
    keep = pc.and_(
        pc.greater_equal(mind, 24),
        pc.less_equal(maxd, pc.multiply(mind, 2)),
    )
    cap_len = pc.utf8_length(t["caption"])
    keep = pc.and_(keep, pc.and_(pc.greater_equal(cap_len, 20),
                                 pc.less_equal(cap_len, 256)))
    n_words = pc.add(pc.count_substring(t["caption"], " "), 1)
    return pc.and_(keep, pc.greater_equal(n_words, 5))


def _aspect_idx(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Index into ``_ASPECT_BUCKETS`` by the exact-integer geometric
    midpoints (see the constant's comment) — shared by
    ``aspect_buckets`` and ``image_training_manifest``."""
    w2, h2 = w * w, h * h
    conds = [64 * w2 < 27 * h2, 4 * w2 < 3 * h2,
             3 * w2 < 4 * h2, 27 * w2 < 64 * h2]
    return np.select(conds, [0, 1, 2, 3], default=4)


def q_curate_image_corpus(sf_dir: str):
    """LAION-style image-caption curation: minimum-dimension, aspect-
    ratio, caption-length and caption-word-count gates FUSED into one
    vectorized map pass over a single pruned read (the image twin of
    ``curate_corpus`` — separate filter stages would re-scan the corpus
    once per gate). All gates are pure map-side: no shuffle, streams at
    any corpus size."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(
        os.path.join(out, "image_caption"),
        columns=["image_id", "w", "h", "fmt", "caption", "phash"],
    )

    def gates(t: pa.Table) -> pa.Table:
        return t.filter(_image_gate_mask(t))

    return ds.map_batches(gates, batch_format="pyarrow")


# SDXL-style aspect buckets ascending by ratio; target dims at a 64px
# budget. Assignment boundaries are the geometric midpoints of adjacent
# ratios, tested in EXACT integer arithmetic (w/h >= sqrt(a/b * c/d)
# <=> w²·b·d >= h²·a·c) — float log-distance argmin could disagree with
# SQL in the last ulp near a midpoint; the integer form cannot, and
# exact midpoint hits are impossible (they would need an irrational
# w/h).
_ASPECT_BUCKETS = [("9:16", 48, 80), ("3:4", 56, 72), ("1:1", 64, 64),
                   ("4:3", 72, 56), ("16:9", 80, 48)]


def q_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing for image training (SDXL-style): each
    image is assigned the bucket whose ratio is nearest in log space,
    plus that bucket's fixed target dims. Pure map-side — the grouping
    a trainer does afterwards is a groupby on the emitted bucket key."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "w", "h"])
    names = np.array([b[0] for b in _ASPECT_BUCKETS])
    tws = np.array([b[1] for b in _ASPECT_BUCKETS], dtype=np.int64)
    ths = np.array([b[2] for b in _ASPECT_BUCKETS], dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        idx = _aspect_idx(t["w"].to_numpy().astype(np.int64),
                          t["h"].to_numpy().astype(np.int64))
        return pa.table({
            "image_id": t["image_id"],
            "bucket": pa.array(names[idx]),
            "target_w": pa.array(tws[idx]),
            "target_h": pa.array(ths[idx]),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def q_image_training_manifest(sf_dir: str):
    """The image-side flagship composition: curation gates + aspect
    bucket + train/val/test split + shard assignment FUSED into ONE
    map pass over one pruned read — the manifest an image-training run
    consumes. The hash key is the image_id's first 8 hex chars as an
    integer (``CAST('0x'||substr(...) AS UBIGINT)`` in the oracle), and
    all arithmetic is uint64/UBIGINT on both sides: key × the Knuth
    multiplier exceeds int64. Deterministic, cluster-size-independent,
    zero shuffle."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(
        os.path.join(out, "image_caption"),
        columns=["image_id", "w", "h", "caption"],
    )
    names = np.array([b[0] for b in _ASPECT_BUCKETS])
    tws = np.array([b[1] for b in _ASPECT_BUCKETS], dtype=np.int64)
    ths = np.array([b[2] for b in _ASPECT_BUCKETS], dtype=np.int64)
    n_shards = 8

    def manifest(t: pa.Table) -> pa.Table:
        t = t.filter(_image_gate_mask(t))
        if t.num_rows == 0:
            return pa.table({
                "image_id": pa.array([], type=pa.string()),
                "bucket": pa.array([], type=pa.string()),
                "target_w": pa.array([], type=pa.int64()),
                "target_h": pa.array([], type=pa.int64()),
                "split": pa.array([], type=pa.string()),
                "shard": pa.array([], type=pa.int64()),
            })
        ids = t["image_id"].to_pylist()
        idx = _aspect_idx(t["w"].to_numpy().astype(np.int64),
                          t["h"].to_numpy().astype(np.int64))
        key = np.array([int(s[:8], 16) for s in ids], dtype=np.uint64)
        mixed = (key * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)
        b = (mixed % np.uint64(100)).astype(np.int64)
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        shard = (mixed // np.uint64(_HASH_MOD // n_shards)).astype(np.int64)
        return pa.table({
            "image_id": t["image_id"],
            "bucket": pa.array(names[idx]),
            "target_w": pa.array(tws[idx]),
            "target_h": pa.array(ths[idx]),
            "split": pa.array(split),
            "shard": pa.array(shard),
        })

    return ds.map_batches(manifest, batch_format="pyarrow")


_PHASH_KNN_K = 5


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking over the crawled image blobs — the
    blob-level dedup primitive (FastCDC/LBFS lineage): rolling-hash
    boundaries survive byte insertions, so identical content re-chunks
    identically under new framing and chunk hashes dedup globally
    while boundaries stay local to each blob. Map-only at any corpus
    size (per-blob work, vectorized window hash —
    ``functions/cdc.py``); emits one row per chunk
    (image_id, chunk_idx, off, length, chunk_hash). Rows-only
    (golden oracle: sequential sliding-recurrence twin)."""
    from ..functions import cdc

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes"])

    def chunks(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {"image_id": [], "chunk_idx": [],
                                 "off": [], "length": [], "chunk_hash": []}
        for iid, buf in zip(t["image_id"].to_pylist(),
                            t["bytes"].to_pylist()):
            for k, (o, ln) in enumerate(cdc.cdc_boundaries(buf)):
                rows["image_id"].append(iid)
                rows["chunk_idx"].append(k)
                rows["off"].append(o)
                rows["length"].append(ln)
                rows["chunk_hash"].append(cdc.chunk_hash64(buf[o:o + ln]))
        return pa.table({
            "image_id": pa.array(rows["image_id"], type=pa.string()),
            "chunk_idx": pa.array(rows["chunk_idx"], type=pa.int64()),
            "off": pa.array(rows["off"], type=pa.int64()),
            "length": pa.array(rows["length"], type=pa.int64()),
            "chunk_hash": pa.array(rows["chunk_hash"], type=pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=64)


def q_phash_knn(sf_dir: str):
    """Image retrieval baseline: exact Hamming top-5 over the 64-bit
    phash column for 5 probe images (the lexicographically-first
    image_ids — a deterministic, cluster-size-independent probe set).
    Probe selection is a bounded partial bottom-k (≤5 rows per block
    reach the driver); the scan is one SWAR-popcount matrix per batch
    against the broadcast probe hashes with batch-local top-k, merged
    per probe by a tiny groupby — the same partial/merge shape as
    ``knn_cosine``. Integer distances tie-break by neighbor_id, so
    ranking is bit-identical to SQL."""
    from ..functions.dedupe import popcount64

    k = _PHASH_KNN_K
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "phash"])

    def bottom5(df: pd.DataFrame) -> pd.DataFrame:
        return _arrow_out(
            df.sort_values("image_id", kind="stable").head(k))

    partials = [pd.DataFrame(b) for b in
                ds.map_batches(bottom5, batch_format="pandas").iter_batches(
                    batch_format="pandas", batch_size=None)]
    if not partials:  # empty corpus → empty typed result, not a crash
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], type=pa.string()),
            "neighbor_id": pa.array([], type=pa.string()),
            "hamming": pa.array([], type=pa.int64()),
        }))
    probes = pd.concat(partials, ignore_index=True).sort_values(
        "image_id", kind="stable").head(k)
    qids = probes["image_id"].to_numpy()
    qh = probes["phash"].to_numpy().astype(np.int64)
    qref = ray.put((qids, qh))

    def partial_topk(t: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], type=pa.string()),
                          "neighbor_id": pa.array([], type=pa.string()),
                          "hamming": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        qi, qhash = _bget(qref)
        cids = np.asarray(t["image_id"].to_pylist(), dtype=object)
        ch = t["phash"].to_numpy().astype(np.int64)
        out_rows = []
        for row in range(len(qi)):
            d = popcount64(np.bitwise_xor(qhash[row], ch))
            mask = cids != qi[row]
            ids_m, d_m = cids[mask], d[mask]
            order = np.lexsort((ids_m, d_m))[:k]
            out_rows.extend(
                (qi[row], str(ids_m[o]), int(d_m[o])) for o in order)
        if not out_rows:
            return empty
        return pa.table({
            "query_id": pa.array([r[0] for r in out_rows], type=pa.string()),
            "neighbor_id": pa.array([r[1] for r in out_rows], type=pa.string()),
            "hamming": pa.array([r[2] for r in out_rows], type=pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hamming", "neighbor_id"],
                          kind="stable").head(k)
        return g[["query_id", "neighbor_id", "hamming"]].reset_index(drop=True)

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# n-gram dedup, bloom-pruned anti-join, chunking, deterministic sampling
# --------------------------------------------------------------------------

_NGRAM_K = 5
_NGRAM_TAU = 0.8


def q_ngram_jaccard_pairs(sf_dir: str):
    """Character n-gram Jaccard near-dup pairs (k=5 shingles, the
    classic shingle family next to the word-gram ``jaccard_pairs``)
    over the bounded doc subset: gram sets broadcast once, each batch
    compares its rows against all higher-id docs. Pairwise work is
    bounded by the subset by design — at corpus scale this kernel is
    the verify stage behind ``minhash_lsh``, never a standalone
    all-pairs."""
    sub = _tbl(sf_dir, "documents", ["doc_id", "text"]).filter(
        expr=f"doc_id < {_JACC_SUBSET}"
    )
    rows = sub.take_all()
    grams = {
        r["doc_id"]: {r["text"][i:i + _NGRAM_K]
                      for i in range(len(r["text"]) - _NGRAM_K + 1)}
        for r in rows
    }
    ref = ray.put(grams)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        lut = _bget(ref)
        ids = sorted(lut)
        out_a, out_b, out_j = [], [], []
        for a in df["doc_id"]:
            ta = lut[a]
            for b in ids:
                if b <= a:
                    continue
                tb = lut[b]
                inter = len(ta & tb)
                union = len(ta) + len(tb) - inter
                j = inter / union if union else 0.0
                # threshold the ROUNDED value (SQL filters on round(j,4))
                jr = float(_round_half_up(j, 4))
                if jr >= _NGRAM_TAU:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jr)
        return _arrow_out(pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype=np.int64),
             "id_b": pd.Series(out_b, dtype=np.int64),
             "jacc": pd.Series(out_j, dtype=np.float64)}))

    return sub.map_batches(pairs, batch_format="pandas")


_BLOOM_BITS = 1 << 17  # 16 KiB bitmap
_BLOOM_K = 4


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(n, k) bit positions via double hashing (odd 64-bit multipliers,
    uint64 wraparound)."""
    with np.errstate(over="ignore"):
        k = keys.astype(np.uint64)
        h1 = k * np.uint64(0x9E3779B97F4A7C15)
        h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        j = np.arange(_BLOOM_K, dtype=np.uint64)
        return (
            (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(_BLOOM_BITS)
        ).astype(np.int64)


def _bloom_words(pos: np.ndarray) -> np.ndarray:
    words = np.zeros(_BLOOM_BITS >> 6, dtype=np.uint64)
    flat = pos.reshape(-1).astype(np.uint64)
    np.bitwise_or.at(words, (flat >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (flat & np.uint64(63)))
    return words


def _bloom_test(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    pos = _bloom_positions(keys).astype(np.uint64)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def q_bloom_anti_join(sf_dir: str):
    """J1 at 100 TB: the same "customers with no recent order"
    anti-join as ``anti_join_customers``, but the big side's key set is
    summarized as a 16 KiB Bloom bitmap instead of broadcasting every
    distinct orderer key. Per-batch partial bitmaps OR-merge in one
    coalesced task; bloom MISSES are definitive keeps (a Bloom filter
    has no false negatives), and only the bloom-POSITIVE customers
    re-scan orders (pruned to the candidate keys) for exact
    verification — so what crosses the cluster is the bitmap plus the
    candidate set (true matches + ~|misses|·2^-k false positives),
    never the orderer key domain. Result is exactly the SQL anti-join."""
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cutoff = _max_ts(
        _tbl(sf_dir, "orders", ["o_orderdate"]), "o_orderdate"
    ) - pd.Timedelta(days=30)
    sc = pa.scalar(cutoff.to_pydatetime(), type=pa.timestamp("us"))

    def partial_bloom(t: pa.Table) -> pa.Table:
        keys = t.filter(pc.greater(t["o_orderdate"], sc))["o_custkey"].to_numpy()
        if len(keys) == 0:
            return pa.table({"word": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.int64())})
        words = _bloom_words(_bloom_positions(keys))
        nz = np.nonzero(words)[0]
        return pa.table({"word": pa.array(nz, pa.int64()),
                         "bits": pa.array(words[nz].view(np.int64), pa.int64())})

    def or_merge(t: pa.Table) -> pa.Table:
        words = np.zeros(_BLOOM_BITS >> 6, dtype=np.uint64)
        np.bitwise_or.at(words, t["word"].to_numpy(),
                         t["bits"].to_numpy().view(np.uint64))
        return pa.table({"bloom": pa.array([words.tobytes()], pa.binary())})

    merged = (
        orders.map_batches(partial_bloom, batch_format="pyarrow")
        .map_batches(or_merge, batch_format="pyarrow", batch_size=1 << 30)
        .take_all()
    )
    bloom_ref = ray.put(np.frombuffer(merged[0]["bloom"], dtype=np.uint64))

    cust = _tbl(sf_dir, "customer", ["c_custkey"])

    def candidates(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy()
        if len(keys) == 0:
            return pa.table({"c_custkey": pa.array([], pa.int64())})
        hit = _bloom_test(_bget(bloom_ref), keys)
        return pa.table({"c_custkey": pa.array(keys[hit], pa.int64())})

    # bounded by |customers with a recent order| + the fp tail
    cand = cust.map_batches(candidates, batch_format="pyarrow").take_all()
    cand_ref = ray.put(np.array(sorted(r["c_custkey"] for r in cand),
                                dtype=np.int64))

    def matched(t: pa.Table) -> pa.Table:
        ck = _bget(cand_ref)
        keys = t.filter(pc.greater(t["o_orderdate"], sc))["o_custkey"].to_numpy()
        return pa.table({"k": pa.array(np.unique(keys[np.isin(keys, ck)]),
                                       pa.int64())})

    confirmed = (
        orders.map_batches(matched, batch_format="pyarrow")
        .map_batches(lambda t: pa.table({"k": pc.unique(t["k"])}),
                     batch_format="pyarrow", batch_size=1 << 30)
        .take_all()
    )
    drop_ref = ray.put(np.array(sorted(r["k"] for r in confirmed),
                                dtype=np.int64))

    def keep(t: pa.Table) -> pa.Table:
        d = _bget(drop_ref)
        keys = t["c_custkey"].to_numpy()
        return pa.table({"c_custkey": pa.array(keys[~np.isin(keys, d)],
                                               pa.int64())})

    return cust.map_batches(keep, batch_format="pyarrow")


_CHUNK_W = 64
_CHUNK_S = 48


def q_chunk_documents(sf_dir: str):
    """Context-window chunking: every doc becomes 1 (if n≤W) else
    ceil((n−W)/S)+1 overlapping token windows (W=64, stride S=48) — the
    flat_map that turns a corpus into training sequences. Pure map-side:
    token counts from an Arrow substring-count kernel, chunk rows via
    vectorized repeat/arange; output is (doc_id, chunk_id, tok_start,
    tok_end) offsets so the text itself never fans out or shuffles."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t["text"], " "), 1).to_numpy().astype(np.int64)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        nch = np.where(
            n <= _CHUNK_W,
            np.int64(1),
            np.ceil((n - _CHUNK_W) / _CHUNK_S).astype(np.int64) + 1,
        )
        doc = np.repeat(ids, nch)
        nn = np.repeat(n, nch)
        starts = np.concatenate(([0], np.cumsum(nch)[:-1]))
        ci = np.arange(int(nch.sum()), dtype=np.int64) - np.repeat(starts, nch)
        ts = ci * _CHUNK_S
        te = np.minimum(ts + _CHUNK_W, nn)
        return pa.table({"doc_id": pa.array(doc), "chunk_id": pa.array(ci),
                         "tok_start": pa.array(ts), "tok_end": pa.array(te)})

    return docs.map_batches(chunks, batch_format="pyarrow")


_DECON_GRAM = 8   # word n-gram width for benchmark-overlap removal
_DECON_BENCH = 10  # doc_id < this is the held-out "benchmark" set


def _word_grams(text: str, n: int) -> set:
    """All word n-grams of a doc — ONE kernel shared by
    ``decontaminate_docs`` and ``curate_corpus`` so their overlap
    semantics can never drift."""
    toks = text.split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _decon_bench_ref(sf_dir: str):
    """Benchmark gram set (docs < ``_DECON_BENCH``): read once
    (row-group-pruned), broadcast via ``ray.put``. At a benchmark too
    big to broadcast exactly, the set becomes a Bloom bitmap (see
    ``q_bloom_anti_join``) with exact re-check of bloom-positives."""
    import pyarrow.dataset as pads

    bench = _tbl(
        sf_dir, "documents", ["doc_id", "text"],
        filter=(pads.field("doc_id") < _DECON_BENCH),
    ).take_all()
    bset = (set().union(*(_word_grams(r["text"], _DECON_GRAM) for r in bench))
            if bench else set())
    return ray.put(bset)


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination — the pretraining hygiene step: drop
    every corpus doc sharing ANY word 8-gram with the held-out
    benchmark set (docs 0..9 stand in for an eval suite). The benchmark
    side is read once and broadcast (``_decon_bench_ref``); the corpus
    scan is pure map-side."""
    ref = _decon_bench_ref(sf_dir)

    def keep(t: pa.Table) -> pa.Table:
        bs = _bget(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(
            (i >= _DECON_BENCH and not (_word_grams(x, _DECON_GRAM) & bs)
             for i, x in zip(ids, t["text"].to_pylist())),
            dtype=bool, count=len(ids))
        return pa.table({"doc_id": pa.array(ids[mask])})

    return (
        _tbl(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(keep, batch_format="pyarrow")
    )


# Exact substring duplication (the "deduplicating training data"
# method in its word-n-gram formulation): a doc span is duplicated
# when the same _SUB_GRAM-word sequence appears in ≥2 distinct docs.
_SUB_GRAM = 8
# coarse-partition count override (0 = size from the doc count) —
# lets tests prove the statistic is partition-count invariant
_SUB_PARTS = int(os.environ.get("JCR_SUB_PARTS", "0"))
_SUB_ROLL_B = np.uint64(1099511628211)  # FNV-1a prime rolling base


# urlnorm.hash64 memoized (ONE word-hash primitive in the repo): Zipf
# word reuse means most lookups hit the cache instead of re-digesting.
# The bound stays modest — Ray workers are long-lived and shared by
# the whole catalog, so an unbounded cache would permanently tax every
# later query's heap.
_word_h64 = lru_cache(maxsize=1 << 17)(hash64)


def _sub_pos_hashes(toks: list[str]) -> np.ndarray:
    """POSITIONAL 63-bit hashes of every ``_SUB_GRAM``-word window of
    ``toks`` (entry ``p`` covers words ``[p, p+_SUB_GRAM)``). Each WORD
    is sha1-hashed once (cached); the 8-word window combines as a
    vectorized uint64 polynomial roll — ~8× less digest input than
    hashing each joined gram string, and the window combine is numpy,
    not Python."""
    m = len(toks) - _SUB_GRAM + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    wh = np.fromiter((_word_h64(w) for w in toks),
                     dtype=np.uint64, count=len(toks))
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(_SUB_GRAM):
        acc = acc * _SUB_ROLL_B + wh[j:j + m]
    return (acc & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)


def _sub_gram_hashes(text: str) -> np.ndarray:
    """Sorted DISTINCT 63-bit hashes of a doc's ``_SUB_GRAM``-word
    grams — one kernel shared by the engine and the golden so the
    duplication statistic can never drift."""
    return np.unique(_sub_pos_hashes(text.split(" ")))


def _sub_pairs_part(t: pa.Table, parts: int) -> pa.Table:
    """Doc-distinct (gram-hash, doc_id) pairs + coarse ``h % parts``
    partition key — the map-side kernel shared by the detection and
    rewrite queries (every occurrence of a gram lands in exactly one
    partition, so cross-doc duplication is decidable locally)."""
    hs, ds = [], []
    for i, x in zip(t["doc_id"].to_numpy(zero_copy_only=False),
                    t["text"].to_pylist()):
        g = _sub_gram_hashes(x)
        if g.size:
            hs.append(g)
            ds.append(np.full(g.size, int(i), dtype=np.int64))
    if not hs:
        e = pa.array([], type=pa.int64())
        return pa.table({"h": e, "doc_id": e, "part": e})
    h = np.concatenate(hs)
    return pa.table({"h": pa.array(h),
                     "doc_id": pa.array(np.concatenate(ds)),
                     "part": pa.array(h % parts)})


def _sub_rewrite_doc(text: str, dup_hs: np.ndarray) -> tuple[str, int, int]:
    """Rewrite ONE doc by deleting every word covered by a duplicated
    gram occurrence (interval cover via a vectorized difference array —
    no Python per-position loop). Returns (text_out, n_words,
    removed_words). Shared by the engine and the golden; passing a
    superset of the doc's duplicated hashes (e.g. the global dup set)
    yields the identical rewrite, since matching is by membership."""
    toks = text.split(" ")
    n = len(toks)
    seq = _sub_pos_hashes(toks)
    if seq.size == 0 or dup_hs.size == 0:
        return text, n, 0
    pos = np.flatnonzero(np.isin(seq, dup_hs))
    if pos.size == 0:
        return text, n, 0
    delta = np.zeros(n + 1, dtype=np.int64)
    delta[pos] += 1  # pos entries are unique (flatnonzero)
    np.add.at(delta, np.minimum(pos + _SUB_GRAM, n), -1)  # ends can clip
    covered = np.cumsum(delta[:-1]) > 0
    kept = np.array(toks, dtype=object)[~covered]
    return " ".join(kept.tolist()), n, int(covered.sum())


def q_substring_dup_spans(sf_dir: str):
    """Cross-doc exact substring-duplication detection: per doc, how
    many of its distinct ``_SUB_GRAM``-word grams also appear in at
    least one OTHER doc. Map-side, each doc emits per-doc-distinct
    (gram_hash, doc_id) pairs; ONE coarse hash partition on the gram
    hash co-locates every occurrence of a gram, so "seen in ≥2 docs"
    is decidable locally per partition (the minhash banding
    run-detection pattern — NOT ``Dataset.join``, which acero-crashes
    on sparse partitions, see ``_keep_corpus``, and NOT a broadcast
    dup set, which re-hashes the corpus in a second pass and measured
    2.2× slower at 200k docs); each partition emits per-doc
    (n_grams, dup_grams) bincount partials and a doc-keyed groupby of
    ≤ n_docs × parts tiny rows sums them. The corpus text is read
    once and never shuffles — only (int64, int64) gram pairs — and no
    per-gram structure ever lands on the driver. Output per doc with
    ≥1 gram: (doc_id, n_grams, dup_grams, dup_frac rounded 4);
    removal policy composes downstream (gate on dup_frac exactly like
    ``repetition_filter``)."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _tbl_rows(sf_dir, "documents")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": t["n_grams"],
            "dup_grams": t["dup_grams"],
            "dup_frac": pa.array(_round_half_up(
                t["dup_grams"].to_numpy(zero_copy_only=False)
                / t["n_grams"].to_numpy(zero_copy_only=False), 4),
                type=pa.float64()),
        })

    # parts sized so a partition (~grams/parts × 16 B) fits a worker
    # heap at scale
    parts = _SUB_PARTS or int(min(256, max(16, n_docs // 50_000 + 16)))

    def part_stats(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True,
                                return_counts=True)
        isdup = (cnt >= 2)[inv]  # pairs are doc-distinct ⇒ cnt = docs
        ud, dinv = np.unique(d, return_inverse=True)
        return pa.table({
            "doc_id": pa.array(ud),
            "dpart": pa.array(ud % parts),
            "ng": pa.array(np.bincount(dinv).astype(np.int64)),
            "dg": pa.array(np.bincount(
                dinv, weights=isdup).astype(np.int64)),
        })

    # the per-doc merge is ANOTHER coarse-key groupby + local bincount
    # combine — Ray's sort-aggregate on the raw 200k-distinct doc_id
    # key measured 289 core-s where this shape costs ~2 (the partials
    # are ≤ n_docs × parts tiny rows, so the exchange is small)
    def doc_combine(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        ud, dinv = np.unique(d, return_inverse=True)
        return finish(pa.table({
            "doc_id": pa.array(ud),
            "n_grams": pa.array(np.bincount(
                dinv, weights=t["ng"].to_numpy(
                    zero_copy_only=False)).astype(np.int64)),
            "dup_grams": pa.array(np.bincount(
                dinv, weights=t["dg"].to_numpy(
                    zero_copy_only=False)).astype(np.int64)),
        }))

    with _shuffle_scaled(n_docs * 160 * 16):  # ~grams/doc × 16 B rows
        return (
            docs.map_batches(lambda t: _sub_pairs_part(t, parts),
                             batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(part_stats, batch_format="pyarrow")
            .groupby("dpart", num_partitions=parts)
            .map_groups(doc_combine, batch_format="pyarrow")
        )


# broadcast-vs-cogroup dispatch threshold for the rewrite's per-doc
# dup-hash sets (rows of (doc_id, h) int64 pairs ≈ 16 B each)
_SUBDUP_BCAST_LIMIT = int(os.environ.get("JCR_SUBDUP_BCAST_LIMIT",
                                         "2000000"))


def q_substring_dedup_rewrite(sf_dir: str):
    """Exact substring-duplication REMOVAL (the rewrite companion of
    ``substring_dup_spans``, i.e. the "deduplicating training data"
    method's edit step in its word-n-gram formulation): every word
    covered by a gram that also appears in ≥1 OTHER doc is deleted,
    and the doc re-joined from the surviving words. Detection reuses
    the same map-side pair kernel + ONE coarse gram-hash partition;
    the per-partition step then emits only the DUPLICATED (doc_id, h)
    rows — the per-doc dup-hash sets, a small subset of the pair
    stream. Getting those sets back to the text dispatches on size
    (the ``_keep_corpus`` pattern): below ``_SUBDUP_BCAST_LIMIT`` rows
    they broadcast once via ``ray.put`` as doc-sorted arrays and the
    corpus is rewritten in a map-only second read (per doc, a
    searchsorted slice → positional re-hash → vectorized interval
    cover; the corpus text never shuffles); above it, both sides
    coarse-hash-partition on doc_id through one cogroup exchange, so
    neither the dup sets nor the corpus ever land on the driver.
    Output per doc (all docs, changed or not): (doc_id, n_words,
    removed_words, text). Within-doc-only repeats are NOT removed —
    the duplication predicate is cross-doc, matching the detection
    query."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _tbl_rows(sf_dir, "documents")
    parts = _SUB_PARTS or int(min(256, max(16, n_docs // 50_000 + 16)))

    def dup_rows(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True,
                                return_counts=True)
        sel = (cnt >= 2)[inv]  # pairs are doc-distinct ⇒ cnt = docs
        # no dpart here: the broadcast path (the common case) never
        # reads it, so materializing it would inflate the dup stream
        # and the driver pull by 50% — the cogroup path derives it in
        # tag_dups
        return pa.table({
            "doc_id": pa.array(d[sel]),
            "h": pa.array(h[sel]),
        })

    def rewrite_tbl(ids: np.ndarray, texts: list[str],
                    d_ids: np.ndarray, d_hs: np.ndarray) -> pa.Table:
        """Rewrite a run of docs against doc-sorted dup arrays."""
        outs: list[str] = []
        nws = np.empty(len(texts), dtype=np.int64)
        rms = np.empty(len(texts), dtype=np.int64)
        for k, (i, x) in enumerate(zip(ids, texts)):
            lo = np.searchsorted(d_ids, i, "left")
            hi = np.searchsorted(d_ids, i, "right")
            o, nw, rm = _sub_rewrite_doc(x, d_hs[lo:hi])
            outs.append(o)
            nws[k] = nw
            rms[k] = rm
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "n_words": pa.array(nws),
            "removed_words": pa.array(rms),
            "text": pa.array(outs, type=pa.string()),
        })

    with _shuffle_scaled(n_docs * 160 * 16):
        dups = (
            docs.map_batches(lambda t: _sub_pairs_part(t, parts),
                             batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(dup_rows, batch_format="pyarrow")
        ).materialize()
    ndup = dups.count()

    if ndup <= _SUBDUP_BCAST_LIMIT:
        tbls = [t for t in ray.get(dups.to_arrow_refs())
                if t.num_rows > 0]
        if tbls:
            dt = pa.concat_tables(tbls)
            di = dt["doc_id"].to_numpy(zero_copy_only=False)
            dh = dt["h"].to_numpy(zero_copy_only=False)
            order = np.argsort(di, kind="stable")
            dref = ray.put((di[order], dh[order]))
        else:
            e = np.empty(0, dtype=np.int64)
            dref = ray.put((e, e))

        def rewrite(t: pa.Table) -> pa.Table:
            d_ids, d_hs = _bget(dref)
            return rewrite_tbl(
                t["doc_id"].to_numpy(zero_copy_only=False),
                t["text"].to_pylist(), d_ids, d_hs)

        return docs.map_batches(rewrite, batch_format="pyarrow")

    def tag_docs(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "h": pa.nulls(t.num_rows, pa.int64()),
            "dpart": pa.array(d % parts),
        })

    def tag_dups(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pa.nulls(t.num_rows, pa.string()),
            "h": t["h"],
            "dpart": pa.array(d % parts),
        })

    def rewrite_group(t: pa.Table) -> pa.Table:
        isdoc = pc.is_valid(t["text"])
        doc_t = t.filter(isdoc)
        dup_t = t.filter(pc.invert(isdoc))
        di = dup_t["doc_id"].to_numpy(zero_copy_only=False)
        dh = dup_t["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(di, kind="stable")
        return rewrite_tbl(
            doc_t["doc_id"].to_numpy(zero_copy_only=False),
            doc_t["text"].to_pylist(), di[order], dh[order])

    with _shuffle_scaled(n_docs * 400):  # corpus text + small dup rows
        return (
            docs.map_batches(tag_docs, batch_format="pyarrow")
            .union(dups.map_batches(tag_dups, batch_format="pyarrow"))
            .groupby("dpart", num_partitions=parts)
            .map_groups(rewrite_group, batch_format="pyarrow")
        )


# BM25 retrieval (Robertson/Okapi, Lucene's +1 idf form) — the IR op a
# decontamination / data-selection pipeline needs: rank the corpus
# against a query by term relevance.
_BM25_QUERY = ("hash", "join", "merge", "sort")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 50


def _bm25_tf_dl(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc term-frequency matrix over ``_BM25_QUERY`` + doc lengths
    — ONE kernel shared by the engine and the golden so the scores are
    bit-identical. ``list.count`` is a C-speed scan; the query is a
    handful of terms, so this is T linear passes per doc, not a Python
    per-token loop."""
    n_terms = len(_BM25_QUERY)
    tf = np.zeros((len(texts), n_terms), dtype=np.float64)
    dl = np.empty(len(texts), dtype=np.float64)
    for k, x in enumerate(texts):
        toks = x.split(" ")
        dl[k] = len(toks)
        for j, term in enumerate(_BM25_QUERY):
            tf[k, j] = toks.count(term)
    return tf, dl


def _bm25_scores(tf: np.ndarray, dl: np.ndarray, n_docs: int,
                 avgdl: float, df: np.ndarray) -> np.ndarray:
    """Vectorized BM25: idf_t · tf/(tf + k1·(1-b+b·dl/avgdl)), summed
    in fixed term order (axis-1 over a width-T matrix — the summation
    order cannot vary with batching, so per-doc scores are
    batch-composition independent)."""
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
    return (idf[None, :] * tf / (tf + norm[:, None])).sum(axis=1)


def q_bm25_topk(sf_dir: str):
    """BM25 top-``_BM25_K`` retrieval over the documents table for the
    fixed ``_BM25_QUERY`` terms. Two linear passes, no corpus shuffle:
    (1) map-side partials (docs, total tokens, per-term df) reduced by
    a Sum aggregate — a handful of ints, so the global idf/avgdl
    constants are exact and identical on every worker via closure
    capture; (2) map-only scoring + batch-local top-k in the oracle's
    total order (rounded score desc, doc_id asc), merged through a
    single-group ``map_groups`` over ≤ blocks × k tiny partial rows
    (the ``knn_cosine`` shape). Scores round half-up at 6 before
    ranking so ties are decided identically everywhere."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    n_terms = len(_BM25_QUERY)

    def stats_partial(t: pa.Table) -> pa.Table:
        tf, dl = _bm25_tf_dl(t["text"].to_pylist())
        row: dict[str, list[int]] = {"n": [t.num_rows],
                                     "tl": [int(dl.sum())]}
        for j in range(n_terms):
            row[f"df{j}"] = [int((tf[:, j] > 0).sum())]
        return pa.table(row)

    agg = docs.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        Sum("n"), Sum("tl"), *(Sum(f"df{j}") for j in range(n_terms)))
    n_docs = int(agg["sum(n)"])
    avgdl = int(agg["sum(tl)"]) / n_docs
    df = np.array([float(agg[f"sum(df{j})"]) for j in range(n_terms)])

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        tf, dl = _bm25_tf_dl(t["text"].to_pylist())
        s = _round_half_up(_bm25_scores(tf, dl, n_docs, avgdl, df), 6)
        order = np.lexsort((ids, -s))[:_BM25_K]
        return pa.table({
            "q": pa.array(np.zeros(len(order), dtype=np.int64)),
            "doc_id": pa.array(ids[order].astype(np.int64)),
            "score": pa.array(s[order], type=pa.float64()),
        })

    return (
        docs.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("q")
        .map_groups(_merge_topk(_BM25_K, id_col="doc_id",
                                out_cols=("rank", "doc_id", "score")),
                    batch_format="pandas")
    )


# DSIR (data selection with importance resampling, per the public
# hashed-n-gram method): weight = target-vs-raw log-likelihood ratio
# over hashed word bigrams. crc32 (not Python hash()) keeps bucket
# ids identical across processes and PYTHONHASHSEED values.
_DSIR_BUCKETS = 4096
_DSIR_TARGET = 20  # doc_id < this is the high-quality "target" set


def _dsir_grams(text: str) -> np.ndarray:
    """Hashed word-bigram bucket ids of a doc, in text order — the
    per-doc score sums over this array on both engine and golden, so
    the float64 sums agree bit-for-bit."""
    toks = text.split(" ")
    return np.fromiter(
        (zlib.crc32(f"{a} {b}".encode()) % _DSIR_BUCKETS
         for a, b in zip(toks, toks[1:])),
        dtype=np.int64, count=max(0, len(toks) - 1))


def q_dsir_weights(sf_dir: str):
    """DSIR data selection: score every raw doc by the Laplace-
    smoothed log-likelihood ratio of a small high-quality TARGET set
    (docs < ``_DSIR_TARGET``) vs the RAW corpus, over hashed word
    bigrams. Target counts come from one row-group-pruned read
    (driver-side, tiny); raw counts are integer per-batch bincount
    partials → a ``_DSIR_BUCKETS``-row groupby → a broadcast log-ratio
    table (integer sums are order-free, so any cluster size produces
    identical counts); scoring is pure map-side. Two passes over the
    corpus by construction — DSIR needs the raw distribution before it
    can score — but both are map-only: no corpus shuffle, and only the
    4096-float ratio table ever reaches the driver. Output:
    (doc_id, dsir_w) for raw docs with ≥1 bigram, rounded 4."""
    import pyarrow.dataset as pads

    # target side is ~_DSIR_TARGET rows: plain driver-side pruned read,
    # no Ray job (the raw corpus below is where the distribution is)
    tgt = papq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"],
        filters=[("doc_id", "<", _DSIR_TARGET)])
    tgs = [g for g in (_dsir_grams(x) for x in tgt["text"].to_pylist())
           if g.size]
    tcnt = (np.bincount(np.concatenate(tgs), minlength=_DSIR_BUCKETS)
            if tgs else np.zeros(_DSIR_BUCKETS, dtype=np.int64))

    raw = _tbl(sf_dir, "documents", ["doc_id", "text"],
               filter=(pads.field("doc_id") >= _DSIR_TARGET))

    def partial(t: pa.Table) -> pa.Table:
        gs = [g for g in (_dsir_grams(x) for x in t["text"].to_pylist())
              if g.size]
        if not gs:
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        c = np.bincount(np.concatenate(gs), minlength=_DSIR_BUCKETS)
        nz = np.nonzero(c)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "n": pa.array(c[nz], type=pa.int64())})

    rcnt = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    for r in (raw.map_batches(partial, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("n", alias_name="n")).take_all()):
        rcnt[int(r["b"])] = int(r["n"])
    llr = (np.log((tcnt + 1.0) / (tcnt.sum() + _DSIR_BUCKETS))
           - np.log((rcnt + 1.0) / (rcnt.sum() + _DSIR_BUCKETS)))
    wref = ray.put(llr)

    def score(t: pa.Table) -> pa.Table:
        w = _bget(wref)
        ids, ws = [], []
        for i, x in zip(t["doc_id"].to_numpy(zero_copy_only=False),
                        t["text"].to_pylist()):
            g = _dsir_grams(x)
            if g.size == 0:
                continue
            ids.append(int(i))
            ws.append(float(_round_half_up(float(w[g].sum()), 4)))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "dsir_w": pa.array(ws, type=pa.float64())})

    return raw.map_batches(score, batch_format="pyarrow")


_REP_TAU = 0.04  # max duplicate-bigram fraction (Gopher-style gate)


def _dup_bigram_frac(toks: list) -> float:
    """Duplicate-bigram fraction of a token list (rounded like the
    SQL) — ONE kernel shared by ``repetition_filter`` and
    ``curate_corpus`` so the gate statistic can never drift. Caller
    guarantees >= 2 tokens (>= 1 bigram)."""
    nd = len(set(zip(toks, toks[1:])))
    return float(_round_half_up(1.0 - nd / (len(toks) - 1), 4))


def q_repetition_filter(sf_dir: str):
    """Repetition quality gate (the Gopher-style dup-n-gram filter):
    per doc, the fraction of repeated word bigrams; docs above the
    threshold are boilerplate/spam-shaped and dropped. Pure map-side —
    each doc's statistic needs only its own tokens, so nothing
    shuffles. Docs with fewer than two tokens have no bigrams and are
    excluded (mirrors the SQL, where they produce no bigram rows)."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ids, fracs = [], []
        for i, x in zip(t["doc_id"].to_numpy(zero_copy_only=False),
                        t["text"].to_pylist()):
            toks = x.split(" ")
            if len(toks) < 2:
                continue
            f = _dup_bigram_frac(toks)
            if f <= _REP_TAU:
                ids.append(int(i))
                fracs.append(f)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "dup_frac": pa.array(fracs, type=pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow")


def q_curate_corpus(sf_dir: str):
    """END-TO-END corpus curation — the composed manifest op a training
    run actually consumes: language gate (en), the quality heuristics
    of ``quality_filter``, the Gopher repetition gate, and benchmark
    decontamination, ALL fused into ONE map pass over a single read.
    Running the gates as separate pipeline stages would scan the corpus
    once per gate; fused, each byte of text crosses the object store
    exactly once and the only driver traffic is the broadcast benchmark
    gram set. Cheap vectorized gates (token stats, lang) run first so
    the per-doc Python gates (bigrams, 8-gram overlap) touch only
    survivors. Output: the kept (doc_id, source, n_tokens) manifest."""
    ref = _decon_bench_ref(sf_dir)

    def gate(t: pa.Table) -> pa.Table:
        bs = _bget(ref)
        texts = t["text"].to_pylist()
        s = textstats.quality_scores(texts)
        nt = s["n_tokens"]
        cpt = _round_half_up(s["chars_per_token"], 4)
        stop = _round_half_up(s["stopword_ratio"], 4)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fast = ((nt >= _QF_MIN_TOKENS) & (cpt <= _QF_MAX_CPT)
                & (stop >= _QF_MIN_STOP)
                & pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
                & (ids >= _DECON_BENCH))
        keep_idx = []
        for j in np.nonzero(fast)[0]:
            x = texts[j]
            # n_tokens >= 30 gate already ensures >= 1 bigram
            if _dup_bigram_frac(x.split(" ")) > _REP_TAU:
                continue
            if _word_grams(x, _DECON_GRAM) & bs:
                continue
            keep_idx.append(j)
        sel = pa.array(keep_idx, type=pa.int64())
        return pa.table({
            "doc_id": pc.take(t["doc_id"], sel),
            "source": pc.take(t["source"], sel),
            "n_tokens": pa.array(nt[keep_idx], type=pa.int64()),
        })

    return _tbl(sf_dir, "documents",
                ["doc_id", "text", "lang", "source"]).map_batches(
        gate, batch_format="pyarrow")


# per-source sampling rates (hash thresholds): even-numbered sources
# keep 75%, odd 25% — the "mixture weights" of a data-mixing recipe
_MIX_THR_EVEN = int(0.75 * _HASH_MOD)
_MIX_THR_ODD = int(0.25 * _HASH_MOD)


def q_mixture_sample(sf_dir: str):
    """Data mixing — per-SOURCE sampling rates (upweight curated
    sources, downsample bulk web), decided by a deterministic
    multiplicative hash of doc_id against a per-source threshold.
    Stateless and cluster-size-independent: no RNG state, no
    coordination, any worker admits any row identically — the property
    that makes the sample reproducible across runs AND resumable
    mid-corpus. Pure map-side."""

    def pick(t: pa.Table) -> pa.Table:
        h = (t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
             * _HASH_MULT) % _HASH_MOD
        suffix = pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 99),
                         pa.int64()).to_numpy(zero_copy_only=False)
        thr = np.where(suffix % 2 == 0, _MIX_THR_EVEN, _MIX_THR_ODD)
        mask = pa.array(h < thr)
        return pa.table({
            "doc_id": pc.filter(t["doc_id"], mask),
            "source": pc.filter(t["source"], mask),
        })

    return _tbl(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        pick, batch_format="pyarrow")


_SHUF_SHARDS = 8  # shard count (training output files per epoch)


def q_shuffle_shards(sf_dir: str):
    """Deterministic corpus shuffle — the last step before training:
    place every doc into one of S shard files in a seeded,
    cluster-size-independent pseudorandom order. shard = TOP bits of a
    multiplicative hash (the low bits are unmixed — h % 8 == doc_id % 8
    because the multiplier is odd, so modulo would not shuffle at all);
    pos = rank of (h, doc_id) within the shard. One groupby moves each
    row exactly once; ranking is a local argsort per shard group, never
    a global sort."""
    width = _HASH_MOD // _SHUF_SHARDS

    def key(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy().astype(np.int64) * _HASH_MULT) % _HASH_MOD
        return _arrow_out(pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "shard": (h // width).astype(np.int64),
            "h": h,
        }))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="stable").reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "shard": g["shard"].astype(np.int64),
            "pos": np.arange(len(g), dtype=np.int64),
        })

    return (
        _tbl(sf_dir, "documents", ["doc_id"])
        .map_batches(key, batch_format="pandas")
        .groupby("shard", num_partitions=_SHUF_SHARDS)
        .map_groups(rank, batch_format="pandas")
    )


_BK_K = 64


def q_bottomk_sample(sf_dir: str):
    """Deterministic uniform corpus sample: the K=64 docs with the
    smallest multiplicative doc_id hash — a cluster-size-independent
    'ORDER BY random() LIMIT k' with no RNG state to coordinate (the
    bottom-k sketch). Per-batch partial bottom-k bounds the merge input
    at K × num_blocks rows; one coalesced task takes the global
    bottom-k, so the corpus never sorts globally."""
    docs = _tbl(sf_dir, "documents", ["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        h = (ids * _HASH_MULT) % _HASH_MOD
        order = np.lexsort((ids, h))[:_BK_K]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "h": pa.array(h[order])})

    def merge(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = t["h"].to_numpy()
        order = np.lexsort((ids, h))[:_BK_K]
        return pa.table({"doc_id": pa.array(ids[order].astype(np.int64))})

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    )


_MG_CAP = 512  # Misra-Gries summary capacity (counters per summary)


def _mg_compress(terms: np.ndarray, cnts: np.ndarray,
                 m: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries compression: keep at most ``m`` counters by
    subtracting the (m+1)-th largest count from all and dropping the
    non-positive remainder. The decrement is ≤ n/(m+1) of the mass
    ``n`` summarized, so any item with true count > n/(m+1) survives
    with a positive counter."""
    if len(cnts) <= m:
        return terms, cnts
    kth = np.partition(cnts, len(cnts) - m - 1)[len(cnts) - m - 1]
    keep = cnts > kth
    return terms[keep], cnts[keep] - kth


def q_heavy_hitters_terms(sf_dir: str):
    """Exact heavy hitters over the token stream in two linear passes
    — the 100 TB shape for "which terms exceed x% of the corpus"
    where a full term groupby would shuffle every token:

    pass 1 (candidates): each batch builds an exact term-count table
    and MG-compresses it to ``_MG_CAP`` counters (undercount ≤
    n_batch/(cap+1)); one coalesced worker task sums the ≤ cap-per-
    block partials and compresses once more (undercount ≤ N/(cap+1)).
    Total undercount ≤ 2N/(cap+1), so the ≤ cap surviving terms are a
    SUPERSET of every term with true count > 2N/(cap+1).

    pass 2 (exact recount): the candidate set broadcasts via ray.put;
    a map-only pass counts ONLY candidate terms (plus the batch token
    total), and the final coalesced merge filters on the exact
    threshold n > 2N/(cap+1). Output is exact, the shuffle never sees
    the long tail, and the driver holds ≤ cap strings."""
    from collections import Counter

    docs = _tbl(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df["text"]:
            c.update(t.split(" "))
        terms = np.array(list(c.keys()), dtype=object)
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        terms, cnts = _mg_compress(terms, cnts, _MG_CAP)
        return _arrow_out(pd.DataFrame({"term": terms, "cnt": cnts}))

    def merge_candidates(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False)["cnt"].sum()
        terms, _ = _mg_compress(g["term"].to_numpy(object),
                                g["cnt"].to_numpy(np.int64), _MG_CAP)
        return pd.DataFrame({"term": terms})

    cand = (
        docs.map_batches(partial, batch_format="pandas")
        .map_batches(merge_candidates, batch_format="pandas",
                     batch_size=1 << 30)
        .to_pandas()  # ≤ _MG_CAP rows — the one small driver hop
    )
    ref = ray.put(frozenset(cand["term"]))

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        want = _bget(ref)
        c: Counter = Counter()
        total = 0
        for t in df["text"]:
            toks = t.split(" ")
            total += len(toks)
            c.update(tok for tok in toks if tok in want)
        terms = list(c.keys()) + ["\x01__total__"]
        cnts = list(c.values()) + [total]
        return _arrow_out(pd.DataFrame({
            "term": np.array(terms, dtype=object),
            "n": np.array(cnts, dtype=np.int64)}))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False)["n"].sum()
        tot = g.loc[g["term"] == "\x01__total__", "n"].iat[0]
        g = g[g["term"] != "\x01__total__"]
        g = g[g["n"] > 2.0 * tot / (_MG_CAP + 1)]
        g = g.sort_values(["n", "term"], ascending=[False, True],
                          ignore_index=True)
        g["n"] = g["n"].astype(np.int64)
        return g[["term", "n"]]

    return (
        docs.map_batches(recount, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_HOP_US = 43_200_000_000  # 12 h hop; window = 2 hops = 1 day


def q_hopping_windows(sf_dir: str):
    """Hopping (sliding) window aggregate — 1-day windows advancing
    every 12 h, so each event lands in exactly 2 overlapping windows.
    The per-batch partial replicates each row into its 2 windows and
    pre-aggregates, so the merge sees (window, type) partials — never
    the event stream — and the window fan-out multiplies only the
    partial table, not the shuffle."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["ts"].to_numpy().astype("datetime64[us]").astype(
            np.int64) // _HOP_US
        frames = []
        for off in (0, 1):
            frames.append(pd.DataFrame({
                "win": (b - off) * _HOP_US,
                "event_type": df["event_type"],
                "value": df["value"].to_numpy(np.float64),
            }))
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["win", "event_type"], as_index=False)
             .agg(n=("value", "size"), sum_value=("value", "sum")))
        return _arrow_out(g)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["win", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum"))
        return pd.DataFrame({
            "win_start": g["win"].to_numpy(np.int64).view("datetime64[us]"),
            "event_type": g["event_type"],
            "n": g["n"].to_numpy(np.int64),
            "sum_value": _round_half_up(g["sum_value"], 4),
        })

    return (
        _tbl(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_zscore_quality(sf_dir: str):
    """Per-source z-score normalization of a quality signal (n_chars)
    — the broadcast-stats pattern: a linear pass reduces to per-source
    integer moment sums (n, Σx, Σx²), the tiny stats table broadcasts
    via ray.put, and a second map-only pass standardizes every row.
    No corpus shuffle; the moments are exact int64 sums so the float
    mean/std derive bit-identically on any partitioning (the oracle
    computes the same expression from the same integer sums)."""
    stat_in = _tbl(sf_dir, "documents", ["source", "n_chars"])

    def spartial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        g = (pd.DataFrame({"source": df["source"], "s1": x, "s2": x * x})
             .groupby("source", as_index=False)
             .agg(n=("s1", "size"), s1=("s1", "sum"), s2=("s2", "sum")))
        return _arrow_out(g)

    def smerge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False).agg(
            n=("n", "sum"), s1=("s1", "sum"), s2=("s2", "sum"))

    stats = (
        stat_in.map_batches(spartial, batch_format="pandas")
        .map_batches(smerge, batch_format="pandas", batch_size=1 << 30)
        .to_pandas()  # one row per source — the broadcast side
    )
    ref = ray.put({
        r.source: (np.int64(r.n), np.int64(r.s1), np.int64(r.s2))
        for r in stats.itertuples()
    })

    def zmap(df: pd.DataFrame) -> pd.DataFrame:
        lut = _bget(ref)
        rows = df["source"].map(lut)
        n = np.array([r[0] for r in rows], dtype=np.float64)
        s1 = np.array([r[1] for r in rows], dtype=np.float64)
        s2 = np.array([r[2] for r in rows], dtype=np.float64)
        x = df["n_chars"].to_numpy(np.float64)
        # expression mirrors the oracle SQL exactly: every op is an
        # exactly-rounded IEEE op on exact integer inputs, so the two
        # float paths agree bit-for-bit before rounding
        z = (x - s1 / n) / np.sqrt((s2 - s1 * s1 / n) / (n - 1.0))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "source": df["source"],
            "z": _round_half_up(z, 4),
        })

    return _tbl(sf_dir, "documents", ["doc_id", "source", "n_chars"]
                ).map_batches(zmap, batch_format="pandas")


# --------------------------------------------------------------------------
# Relational reshapes + sampling + entity resolution (round 5 widening)
# --------------------------------------------------------------------------


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str):
    """Pivot / wide aggregate — the reshape SQL expresses as FILTERed
    aggregates: one row per day, one count column per event type plus
    the day's purchase revenue. Map-side combiner: each batch reduces
    to per-day partial rows (counts + EXACT integer cents, so the
    money sum is order-free on any partitioning), then the tiny
    per-day partial set merges in one coalesced task — no all-to-all.
    Reference anchor: the per-strategy count report
    (``src/crawler.py:376-377`` elapsed/insert logs) generalized to a
    day × event-type matrix."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        cents = _round_half_up(
            df["value"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        out = pd.DataFrame({"day": df["ts"].dt.floor("D")})
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = (et == t).astype(np.int64)
        out["purchase_cents"] = np.where(et == "purchase", cents, 0)
        return _arrow_out(out.groupby("day", as_index=False).sum())

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("day", as_index=False).sum()
        out["purchase_value"] = (
            out.pop("purchase_cents").to_numpy(np.float64) / 100.0)
        return out

    return (
        _tbl(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (sequential Poisson /
    Ohlsson ordering): each doc draws priority key u/w where u is
    the deterministic 32-bit multiplicative hash of doc_id (the same
    uniform train_split uses — cluster-size-independent, resumable)
    and w = n_chars; the k smallest keys are the sample, so inclusion
    probability is ∝ weight. Map-side per-batch bottom-k partials →
    one coalesced bottom-k merge; a single IEEE division per row, so
    engine and oracle order identically bit-for-bit (doc_id breaks
    the impossible-in-practice float tie deterministically)."""
    k = 100

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = (df["doc_id"].to_numpy(np.int64) * 2654435761) % 4294967296
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": df["n_chars"].to_numpy(np.int64),
            "skey": u.astype(np.float64)
            / df["n_chars"].to_numpy(np.float64),
        })
        return _arrow_out(
            out.sort_values(["skey", "doc_id"], kind="stable").head(k))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["skey", "doc_id"], kind="stable").head(k)

    return (
        _tbl(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


_GQ_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_group_quantiles(sf_dir: str):
    """EXACT per-group quantiles (p25..p99 of l_extendedprice per
    returnflag) without a distributed sort: map-side (flag, value)
    count partials reduce each batch to its value histogram, one
    coalesced merge sums them, and a tiny final kernel interpolates
    each flag's quantiles from the sorted (value, count) histogram
    using quantile_cont's exact lo*(1-f)+hi*f formula (verified
    bit-for-bit vs DuckDB). The merged histogram is bounded by the
    DOMAIN of the value (distinct cents), not the row count, so this
    holds at 100 TB where a per-group sort would be an all-to-all."""

    # histogram keys are the float64 BIT PATTERNS of the values: exact
    # (no decimal-precision assumption) and, for the positive prices
    # here, int64-ordered the same as the floats — so np.unique on the
    # bits IS a value sort and all merges stay pure numpy
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"f": pa.array([], type=pa.string()),
                             "vb": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        vbits = t["l_extendedprice"].to_numpy(
            zero_copy_only=False).view(np.int64)
        fs, vs, cs = [], [], []
        for f in np.unique(flags):
            u, c = np.unique(vbits[flags == f], return_counts=True)
            fs.append(np.full(len(u), f, dtype=object))
            vs.append(u)
            cs.append(c.astype(np.int64))
        return pa.table({
            "f": pa.array(np.concatenate(fs), type=pa.string()),
            "vb": pa.array(np.concatenate(vs)),
            "cnt": pa.array(np.concatenate(cs)),
        })

    def finish(t: pa.Table) -> pd.DataFrame:
        flags = t["f"].to_numpy(zero_copy_only=False)
        vbits = t["vb"].to_numpy(zero_copy_only=False)
        cnts = t["cnt"].to_numpy(zero_copy_only=False)
        rows = []
        for f in np.unique(flags):
            m = flags == f
            uq, inv = np.unique(vbits[m], return_inverse=True)
            tot = np.zeros(len(uq), dtype=np.int64)
            np.add.at(tot, inv, cnts[m])
            vals = uq.view(np.float64)
            cum = tot.cumsum()
            n = int(cum[-1])
            row = {"l_returnflag": f}
            for q in _GQ_QS:
                h_pos = (n - 1) * q
                lo = int(np.floor(h_pos))
                fr = h_pos - lo
                xlo = vals[np.searchsorted(cum, lo, side="right")]
                xhi = vals[np.searchsorted(cum, min(lo + 1, n - 1),
                                           side="right")]
                # quantile_cont's interpolation: lo*(1-f) + hi*f —
                # NOT lo + f*(hi-lo), which differs in the last ulp
                row[f"p{int(q * 100)}"] = xlo * (1.0 - fr) + xhi * fr
            rows.append(row)
        return pd.DataFrame(rows)

    return (
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


_FUZZY_JACC = 0.9


def _charset_masks(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Per-string distinct-ASCII-char presence bitmasks (2×uint64 =
    chars 0..127), the exact set DuckDB's ``jaccard()`` compares."""
    lo = np.zeros(len(names), dtype=np.uint64)
    hi = np.zeros(len(names), dtype=np.uint64)
    one = np.uint64(1)
    for i, s in enumerate(names):
        l = h = np.uint64(0)
        for b in set(s.encode()):
            if b < 64:
                l |= one << np.uint64(b)
            else:
                h |= one << np.uint64(b - 64)
        lo[i], hi[i] = l, h
    return lo, hi


def q_fuzzy_join_names(sf_dir: str):
    """Entity resolution as a BLOCKED fuzzy self-join: part pairs in
    the same brand whose name char-set Jaccard ≥ 0.9 (DuckDB's
    ``jaccard()`` semantics: distinct chars, case- and space-
    sensitive). The blocking key (brand) bounds each comparison set,
    turning the quadratic all-pairs into per-block kernels — ONE
    cogroup exchange, then a vectorized 128-bit popcount matrix per
    block (the phash/simhash SWAR kernel reused on char masks). The
    documented partitioning assumption: block sizes stay worker-
    bounded; at corpus scale the blocking key must be chosen to keep
    them so (the same contract the minhash band buckets carry)."""
    from ..functions.dedupe import popcount64

    def add_masks(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = _charset_masks(df["p_name"].astype(str).tolist())
        return _arrow_out(pd.DataFrame({
            "p_partkey": df["p_partkey"].to_numpy(np.int64),
            "p_brand": df["p_brand"],
            "mlo": lo.view(np.int64), "mhi": hi.view(np.int64),
        }))

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["p_partkey"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        lo = g["mlo"].to_numpy(np.int64)[order].view(np.uint64)
        hi = g["mhi"].to_numpy(np.int64)[order].view(np.uint64)
        inter = (popcount64(lo[:, None] & lo[None, :])
                 + popcount64(hi[:, None] & hi[None, :]))
        union = (popcount64(lo[:, None] | lo[None, :])
                 + popcount64(hi[:, None] | hi[None, :]))
        jacc = inter / union  # distinct chars ⇒ union ≥ 1
        ia, ib = np.triu_indices(len(keys), k=1)
        keep = jacc[ia, ib] >= _FUZZY_JACC
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame({
            "id_a": keys[ia], "id_b": keys[ib],
            "jacc": _round_half_up(jacc[ia, ib], 4),
        })

    return (
        _tbl(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
        .map_batches(add_masks, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(block_pairs, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# LM quality scoring + graph ranking (round 5 widening)
# --------------------------------------------------------------------------


_PPL_BUCKETS = 1 << 16


def _uni_grams(text: str) -> np.ndarray:
    """Hashed unigram bucket ids in text order (crc32, like
    ``_dsir_grams``) — per-doc scores sum over this array on both
    engine and golden, so the float64 means agree bit-for-bit."""
    toks = text.split(" ")
    return np.fromiter(
        (zlib.crc32(t.encode()) % _PPL_BUCKETS for t in toks),
        dtype=np.int64, count=len(toks))


def q_ccnet_perplexity(sf_dir: str):
    """CCNet-style LM quality scoring: train a Laplace-smoothed
    hashed-unigram LM on the in-domain slice (lang='en', row-group-
    pruned read), then score EVERY doc map-only with its per-token
    cross-entropy under that LM (low = in-domain, the public CCNet
    filter recipe with a hashed-unigram LM standing in for KenLM).
    Training counts are integer per-batch bincount partials → one
    coalesced merge (order-free ⇒ identical on any cluster size);
    only the 65536-float log-prob table reaches the driver and
    broadcasts back via ray.put. Both passes are map-only — no
    corpus shuffle at any scale. Golden oracle: sequential twin
    (goldens.golden_ccnet_perplexity) — np.log is libm-dependent, so
    SQL ln() cannot be the oracle.
    Reference anchor: the pre-embedding quality gate
    (src/embeddings/embed_latest_crawled_data.py:80-95) generalized
    to the published CCNet method."""
    import pyarrow.dataset as pads

    en = _tbl(sf_dir, "documents", ["text", "lang"],
              filter=(pads.field("lang") == "en"))

    def cpartial(t: pa.Table) -> pa.Table:
        # one bincount over the batch's concatenated grams — a
        # per-doc bincount would allocate/add a 65536-slot vector
        # per document
        gs = [g for g in (_uni_grams(x) for x in t["text"].to_pylist())
              if g.size]
        if not gs:
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        c = np.bincount(np.concatenate(gs), minlength=_PPL_BUCKETS)
        nz = np.nonzero(c)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "c": pa.array(c[nz], type=pa.int64())})

    def cmerge(t: pa.Table) -> pa.Table:
        c = np.zeros(_PPL_BUCKETS, dtype=np.int64)
        np.add.at(c, t["b"].to_numpy(zero_copy_only=False),
                  t["c"].to_numpy(zero_copy_only=False))
        return pa.table({"cnt": pa.array(c, type=pa.int64())})

    cnt_df = (
        en.map_batches(cpartial, batch_format="pyarrow")
        .map_batches(cmerge, batch_format="pyarrow", batch_size=1 << 30)
        .to_pandas()
    )
    # an empty training slice degrades to the uniform Laplace prior
    # (the golden's behavior) instead of crashing on a 0-length table
    cnt = (cnt_df["cnt"].to_numpy(np.int64) if len(cnt_df)
           else np.zeros(_PPL_BUCKETS, dtype=np.int64))
    logp = np.log((cnt + 1.0) / (int(cnt.sum()) + _PPL_BUCKETS))
    ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = _bget(ref)
        ids, ces = [], []
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            g = _uni_grams(x)
            if g.size:
                ids.append(i)
                ces.append(-np.mean(lp[g]))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ce": pa.array(_round_half_up(np.array(ces), 4),
                           type=pa.float64()),
        })

    return _tbl(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


_PR_DAMP = 0.85
_PR_ITERS = 3
_PR_Q = 1e12
# orders rows below this broadcast as a sorted-array lookup (16 B/row;
# 20M ≈ 320 MB) instead of a hash-shuffle Dataset.join — the same
# size-dispatch pattern as _DROP_BCAST_LIMIT / _SUBDUP_BCAST_LIMIT
_PR_BCAST_LIMIT = int(os.environ.get("JCR_PR_BCAST_LIMIT", "20000000"))


def q_pagerank_orders(sf_dir: str):
    """PageRank over the customer–supplier order graph (undirected
    bipartite: one edge per DISTINCT (custkey, suppkey) pair sharing
    an order; node ids 2·cust / 2·supp+1 keep the key spaces
    disjoint). Edges come from one hash join + a distinct groupby and
    materialize once (pair-bounded); each of the K=3 power iterations
    is then a MAP-ONLY pass over the edge blocks: the driver
    quantizes the per-node contribution r/deg to INT64 (×1e12, the
    Lloyd-step trick) and broadcasts it with the sorted node-id
    array, workers accumulate exact integer partial sums per node,
    and one coalesced merge returns the node-sized vector. Integer
    sums are order-free, so ranks are bit-identical on any
    partitioning/cluster size — which is what lets a sequential twin
    (goldens.golden_pagerank_orders) be the oracle. Node-vector-on-
    driver is the documented small-side assumption (nodes ≪ edges,
    ~17 B/node); past driver memory the BSP label-propagation harness
    (the _cc_* raw-task path) is the shape this swaps into.
    Reference anchor: the priority frontier's host-score recrawl
    ordering (functions/priority.py) upgraded to a link-graph rank."""
    li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    if _tbl_rows(sf_dir, "orders") <= _PR_BCAST_LIMIT:
        # broadcast path: orders is the small side (16 B/row) — one
        # sorted-array lookup per batch replaces the join's two-sided
        # hash shuffle (measured 50 → 14 s at 5M lineitems), and the
        # per-batch pair dedup shrinks the one remaining exchange
        ok = papq.read_table(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey"]).sort_by("o_orderkey")
        oref = ray.put((ok["o_orderkey"].to_numpy().astype(np.int64),
                        ok["o_custkey"].to_numpy().astype(np.int64)))

        def edge_ids(t: pa.Table) -> pa.Table:
            keys, cust = _bget(oref)
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys, lk)
            np.minimum(idx, len(keys) - 1, out=idx)
            hit = keys[idx] == lk  # inner-join semantics
            c = cust[idx[hit]]
            s = t["l_suppkey"].to_numpy(
                zero_copy_only=False)[hit].astype(np.int64)
            # the 32+32 pair packing is only sound for 32-bit keys —
            # the row-count dispatch guard does NOT bound key range,
            # so fail loudly instead of silently aliasing edges
            if len(c) and (c.max() >= 1 << 32 or c.min() < 0
                           or s.max() >= (1 << 32) - 1 or s.min() < 0):
                raise ValueError(
                    "pagerank broadcast path: cust/supp key outside "
                    "uint32 — raise JCR_PR_BCAST_LIMIT=0 to force the "
                    "join path")
            # batch-local dedup before the distinct exchange
            pair = np.unique((c.astype(np.uint64) << np.uint64(32))
                             | (s.astype(np.uint64) + np.uint64(1)))
            part = ((pair * np.uint64(0x9E3779B97F4A7C15))
                    >> np.uint64(58)).astype(np.int64)  # 64 buckets
            return pa.table({"pk": pa.array(pair.view(np.int64)),
                             "part": pa.array(part)})

        def distinct_pairs(t: pa.Table) -> pa.Table:
            pk = np.unique(
                t["pk"].to_numpy(zero_copy_only=False).view(np.uint64))
            return pa.table({
                "u": pa.array((pk >> np.uint64(32)).astype(np.int64) * 2),
                "v": pa.array((pk & np.uint64(0xFFFFFFFF)).astype(
                    np.int64) * 2 - 1),
            })

        # coarse-bucket distinct (64 hash buckets → per-group unique)
        # instead of a per-pair groupby: sorting 64 keys is far cheaper
        # than sort-aggregating ~|E| distinct 2-part keys
        edges = (
            li.map_batches(edge_ids, batch_format="pyarrow")
            .groupby("part")
            .map_groups(distinct_pairs, batch_format="pyarrow")
            .materialize()  # pair-bounded distinct edge set, reused 4×
        )
    else:
        orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        joined = li.join(orders, "inner", num_partitions=16,
                         on=("l_orderkey",), right_on=("o_orderkey",))

        def edge_ids_joined(t: pa.Table) -> pa.Table:
            c = t["o_custkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            s = t["l_suppkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({"u": pa.array(c * 2), "v": pa.array(s * 2 + 1)})

        edges = (
            joined.map_batches(edge_ids_joined, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(Count(alias_name="m"))
            .select_columns(["u", "v"])
            .materialize()  # pair-bounded distinct edge set, reused 4×
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            t["u"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False)])
        uniq, cnts = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(uniq, type=pa.int64()),
                         "d": pa.array(cnts.astype(np.int64))})

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["d"].sum()

    degdf = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .map_batches(deg_merge, batch_format="pandas", batch_size=1 << 30)
        .to_pandas().sort_values("node", kind="stable")
    )
    nodes = degdf["node"].to_numpy(np.int64)
    deg = degdf["d"].to_numpy(np.int64)
    n = len(nodes)
    r = np.full(n, 1.0 / n)

    for _ in range(_PR_ITERS):
        ref = ray.put((nodes, _round_half_up(
            r / deg * _PR_Q, 0).astype(np.int64)))

        def contrib(t: pa.Table, _ref=ref) -> pa.Table:
            # single-slot cache: each iteration's vector replaces the
            # last, so long-lived workers hold ONE node-sized array
            nd, q = _bget_slot("pagerank_orders", _ref)
            ui = np.searchsorted(nd, t["u"].to_numpy(zero_copy_only=False))
            vi = np.searchsorted(nd, t["v"].to_numpy(zero_copy_only=False))
            s = np.zeros(len(nd), dtype=np.int64)
            np.add.at(s, vi, q[ui])
            np.add.at(s, ui, q[vi])
            nz = np.nonzero(s)[0]
            return pa.table({"i": pa.array(nz, type=pa.int64()),
                             "s": pa.array(s[nz], type=pa.int64())})

        def smerge(t: pa.Table, _n=n) -> pa.Table:
            s = np.zeros(_n, dtype=np.int64)
            np.add.at(s, t["i"].to_numpy(zero_copy_only=False),
                      t["s"].to_numpy(zero_copy_only=False))
            return pa.table({"s": pa.array(s, type=pa.int64())})

        s = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .map_batches(smerge, batch_format="pyarrow", batch_size=1 << 30)
            .to_pandas()["s"].to_numpy(np.int64)
        )
        r = (1.0 - _PR_DAMP) / n + _PR_DAMP * (s.astype(np.float64) / _PR_Q)

    return pd.DataFrame({"node_id": nodes, "pr": _round_half_up(r, 8)})


def q_cube_lineitem(sf_dir: str):
    """Grouping sets / CUBE over (returnflag, linestatus): the finest-
    grain aggregate is computed ONCE with the map-side combiner, then
    all four grouping sets of the lattice derive from that tiny base
    table inside the same coalesced task — one pass over the data for
    the whole cube, where a naive engine scans once per set. Quantity
    sums ride as exact integer cents so every rollup level is
    order-free; 'ALL' is the rollup sentinel (coalesce in the
    oracle) so the key columns stay string-typed."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_up(
            df["l_quantity"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({
            "rf": df["l_returnflag"], "ls": df["l_linestatus"],
            "n": np.ones(len(df), dtype=np.int64), "cq": cents,
        })
        return _arrow_out(g.groupby(["rf", "ls"], as_index=False).sum())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        base = df.groupby(["rf", "ls"], as_index=False).sum()
        by_rf = base.groupby("rf", as_index=False)[["n", "cq"]].sum()
        by_rf["ls"] = "ALL"
        by_ls = base.groupby("ls", as_index=False)[["n", "cq"]].sum()
        by_ls["rf"] = "ALL"
        total = pd.DataFrame({
            "rf": ["ALL"], "ls": ["ALL"],
            "n": [base["n"].sum()], "cq": [base["cq"].sum()],
        })
        out = pd.concat([base, by_rf, by_ls, total], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        out["sum_qty"] = out.pop("cq").to_numpy(np.float64) / 100.0
        return out[["rf", "ls", "n", "sum_qty"]]

    return (
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                  "l_quantity"])
        .map_batches(partial, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


class _ImageFidelity:
    """Actor-pool fidelity gate — the BASELINE.json input_hint
    invariant (decoded-pixel allclose; PSNR ≥ 40 dB for lossy) as a
    first-class catalog op. Each LOSSLESSLY-stored image's decoded
    pixels are ground truth; the stage re-encodes them with the lossy
    qjpg codec and measures the round-trip PSNR against that truth
    (already-lossy rows carry no ground truth and are skipped —
    their fidelity is pinned by the crawl conformance suite against
    the oracle world's pixels instead)."""

    def __init__(self):
        from ..functions import codecs as _c

        self.codecs = _c

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, psnrs, passes = [], [], []
        for iid, buf, fmt in zip(t["image_id"].to_pylist(),
                                 t["bytes"].to_pylist(),
                                 t["fmt"].to_pylist()):
            if fmt == "qjpg":
                continue
            px, _ = self.codecs.decode(buf)
            back, _ = self.codecs.decode(self.codecs.encode(px, "qjpg"))
            # exact round-trips give inf dB; cap so the column stays a
            # finite DOUBLE the VALUES oracle can carry
            p = min(self.codecs.psnr(px, back), 99.99)
            ids.append(iid)
            psnrs.append(p)
            passes.append(bool(p >= 40.0))
        return pa.table({
            "image_id": pa.array(ids, type=pa.string()),
            "psnr_db": pa.array(_round_half_up(np.array(psnrs), 2),
                                type=pa.float64()),
            "pass_40db": pa.array(passes, type=pa.bool_()),
        })


def q_image_fidelity(sf_dir: str):
    """North-rule per-row invariant as a query: PSNR of the lossy
    re-encode of every losslessly-stored crawled image (see
    ``_ImageFidelity``). Map-only actor-pool stage over small binary
    batches; at 100 TB this is the same shape as the decode/feature
    stages — no shuffle, output rows ≪ input bytes."""
    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(_ImageFidelity, batch_format="pyarrow",
                          batch_size=64, concurrency=(2, 8), num_cpus=1)


_INV_PSNR_TAU = 30.0  # canonical-grid PSNR floor for a verified dup
_INV_CANON = 32       # canonical comparison grid (area-resample side)


class _PixelVerifyPairs:
    """Actor-pool pixel verify for ``q_image_neardup_verified``: per
    batch, a pruned parquet read fetches only the MISSING originals,
    decode+canonicalize results persist in a per-actor cache (capped),
    and pairs keep if their canonical 32×32 PSNR ≥ 30 dB. An actor
    pool, not a task lambda, for two reasons: the cache amortizes
    decode across batches, and an actor stage cannot FUSE with the
    upstream split (Ray fuses task→task MapBatches chains — the fused
    single task serialized the whole decode: measured 147 s of a
    187 s run in ``ds.stats()``)."""

    _CACHE_CAP = 8192

    def __init__(self, img_dir: str):
        from ..functions import codecs as _c
        from ..stages.multimodal import resize_area

        self.codecs = _c
        self.resize = resize_area
        self.img_dir = img_dir
        self.cache: dict[str, np.ndarray] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        a_out: list[str] = []
        b_out: list[str] = []
        p_out: list[float] = []
        if len(df):
            # thumb canon == original canon (32→32 area resample is
            # identity), so everything keys on the base image_id
            base = sorted({p.split("#", 1)[0]
                           for p in list(df["id_a"]) + list(df["id_b"])})
            if len(self.cache) > self._CACHE_CAP:
                self.cache.clear()  # BEFORE the need scan — clearing
                #                     after would evict this batch's ids
            need = [b for b in base if b not in self.cache]
            if need:
                t = papq.read_table(
                    self.img_dir, columns=["image_id", "bytes"],
                    filters=[("image_id", "in", need)])
                for iid, buf in zip(t["image_id"].to_pylist(),
                                    t["bytes"].to_pylist()):
                    px, _ = self.codecs.decode(buf)
                    self.cache[iid] = self.resize(px, _INV_CANON,
                                                  _INV_CANON)
            for a, b in zip(df["id_a"], df["id_b"]):
                p = min(self.codecs.psnr(self.cache[a.split("#", 1)[0]],
                                         self.cache[b.split("#", 1)[0]]),
                        99.99)
                if p >= _INV_PSNR_TAU:
                    a_out.append(a)
                    b_out.append(b)
                    p_out.append(float(_round_half_up(np.float64(p), 2)))
        return pd.DataFrame({
            "id_a": pd.Series(a_out, dtype=object),
            "id_b": pd.Series(b_out, dtype=object),
            "psnr_db": pd.Series(p_out, dtype=np.float64)})


def q_image_neardup_verified(sf_dir: str):
    """Two-stage image near-dup — the image-side analog of minhash's
    candidate→verify: phash banding proposes candidate pairs
    (``q_phash_neardup``), then a PARALLEL actor-pool pixel-verify
    stage fetches only ITS pairs' originals via an image_id-pruned
    parquet read, decodes, canonicalizes both sides to a 32×32
    area-resample (the resize-robust comparison grid), and keeps pairs
    whose canonical PSNR ≥ 30 dB — decoded-pixel evidence, the
    north-rule fidelity semantics applied to dedup instead of storage.
    The corpus is never broadcast or collected; per-task memory is
    bounded by the batch's candidate set (the minhash verify shape).
    A ``#thumb`` pid canonicalizes from its original (thumbnails are
    derived data — re-deriving beats storing them twice). Rows-only;
    golden twin in ``goldens.py`` (shared leaf kernels:
    ``resize_area``, ``psnr``; independent orchestration)."""
    pairs = q_phash_neardup(sf_dir)
    img_dir = os.path.join(_crawl_out(sf_dir), "image_caption")

    # sort by id_a in one coalesced task, MATERIALIZE (pair-set-
    # bounded, the same budget phash_dedup_keep pays), then a
    # shuffle-FREE repartition into ~256-pair blocks before the verify
    # pool. Both steps exist to defeat fusion/coalescing: the banding
    # tail's batch_size=1<<30 dedup is a single task and Ray fuses
    # downstream stages — even an actor pool — into it (147 s of a
    # 187 s run serialized in ds.stats()); and yielded small chunks
    # re-coalesce into one target-sized block at materialize, so only
    # an explicit repartition hands the pool parallel inputs. The
    # id_a sort makes each verify task's id range narrow for
    # row-group pruning and cache reuse.
    def sort_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["id_a", "id_b"], kind="stable")

    split = pairs.map_batches(sort_pairs, batch_format="pandas",
                              batch_size=1 << 30).materialize()
    nblk = max(8, min(4096, split.count() // 256))
    return split.repartition(nblk, shuffle=False).map_batches(
        _PixelVerifyPairs, batch_format="pandas", batch_size=256,
        concurrency=(2, 16), num_cpus=1,
        fn_constructor_kwargs={"img_dir": img_dir})


# --------------------------------------------------------------------------
# Window analytics (LAG / funnel / retention — round 5 widening)
# --------------------------------------------------------------------------


_US_WEEK = 7 * 86_400_000_000


def _week_trunc_us(ts_us: np.ndarray) -> np.ndarray:
    """Monday-truncation in exact integer microseconds — DuckDB's
    ``date_trunc('week', ts)`` (epoch day 0 = Thursday ⇒ Monday-based
    weekday is (day+3) mod 7)."""
    day = ts_us // 86_400_000_000
    return (day - (day + 3) % 7) * 86_400_000_000


def q_lag_delta_events(sf_dir: str):
    """LAG window function: per user, the exact integer-microsecond
    gap to the previous event (ordered by ts, event_id). Same
    one-exchange shape as the as-of join: user-hash co-partition →
    per-partition vectorized sort + shifted diff, first event per
    user dropped (inner semantics, no nullable column). The
    documented partitioning assumption: a user's history fits its
    partition."""
    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)

    def tag(t: pa.Table) -> pa.Table:
        return _append_user_part(t, parts)

    def lag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        delta = ts - np.roll(ts, 1)
        keep = np.zeros(len(df), dtype=bool)
        keep[1:] = uid[1:] == uid[:-1]  # same-user predecessor exists
        return _arrow_out(pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[keep],
            "user_id": uid[keep],
            "delta_us": delta[keep],
        }))

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(lag, batch_format="pandas")
    )


_FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_conversions(sf_dir: str):
    """Funnel analysis — per user, strictly-ordered stage completion
    (first view → first later click → first later purchase), counted
    per stage. ONE user-hash co-partition exchange; per partition the
    stage logic is a vectorized per-user min-reduce (ordered-dict
    pandas groupby aggregations over integer timestamps), and only
    the 3-row stage counts leave each partition. All values exact
    integers, so any partitioning gives identical counts."""
    ev = _tbl(sf_dir, "events", ["ts", "user_id", "event_type"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(list(_FUNNEL_STAGES))))
        return _append_user_part(t, parts)

    def stage_counts(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        counts = []
        # users reaching stage k: the min ts of stage-k events
        # STRICTLY after the user's stage-(k-1) completion time.
        # All-integer numpy (a float join would round µs at 2^53)
        r_users = r_ts = None
        for k, stage in enumerate(_FUNNEL_STAGES):
            m = et == stage
            u, t_ = uid[m], ts[m]
            if k:
                if len(r_users) == 0:
                    counts.append(0)
                    r_users, r_ts = u[:0], t_[:0]
                    continue
                pos = np.minimum(np.searchsorted(r_users, u),
                                 len(r_users) - 1)
                ok = (r_users[pos] == u) & (t_ > r_ts[pos])
                u, t_ = u[ok], t_[ok]
            o = np.lexsort((t_, u))
            us, ti = u[o], t_[o]
            first = np.ones(len(us), dtype=bool)
            first[1:] = us[1:] != us[:-1]
            r_users, r_ts = us[first], ti[first]  # sorted by user
            counts.append(len(r_users))
        return pd.DataFrame({
            "stage": list(_FUNNEL_STAGES),
            "n_users": pd.Series(counts, dtype=np.int64),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("stage", as_index=False, sort=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(stage_counts, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_retention_cohorts(sf_dir: str):
    """Retention cohort matrix: cohort = Monday-truncated week of the
    user's FIRST event, one output row per (cohort_week, week_offset)
    with the distinct-user count active that week. ONE user-hash
    exchange computes first-week + distinct (user, week) pairs per
    partition; the (cohort, offset) partials then merge in a
    coalesced task (cohort keys are calendar-bounded, not
    row-bounded). Exact integer weeks throughout."""
    ev = _tbl(sf_dir, "events", ["ts", "user_id"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)

    def tag(t: pa.Table) -> pa.Table:
        return _append_user_part(t, parts)

    def cohort_partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        week = _week_trunc_us(ts)
        uid = df["user_id"].to_numpy(np.int64)
        g = pd.DataFrame({"user_id": uid, "week": week}).drop_duplicates()
        first = g.groupby("user_id", as_index=False)["week"].min().rename(
            columns={"week": "cohort"})
        j = g.merge(first, on="user_id")
        j["week_offset"] = (j["week"] - j["cohort"]) // _US_WEEK
        out = j.groupby(["cohort", "week_offset"], as_index=False).agg(
            n_users=("user_id", "size"))
        return _arrow_out(out)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort", "week_offset"], as_index=False)[
            "n_users"].sum()
        return pd.DataFrame({
            "cohort_week": out["cohort"].to_numpy(
                np.int64).astype("datetime64[us]"),
            "week_offset": out["week_offset"].astype(np.int64),
            "n_users": out["n_users"].astype(np.int64),
        })

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(cohort_partial, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_global_rank_docs(sf_dir: str):
    """Global total-order ranking (row_number over ORDER BY n_chars,
    doc_id) WITHOUT a distributed sort: pass 1 reduces the corpus to a
    value histogram (domain-bounded, like group_quantiles) whose
    exclusive cumsum gives every value its global rank offset; pass 2
    co-partitions whole value-groups by value hash (coarse buckets, so
    the exchange has P keys, not |values|), sorts doc_ids within each
    value group and adds the broadcast offset. Rank arithmetic is all
    integer, so any partitioning yields the oracle's exact
    row_number()."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "n_chars"])
    parts = 32

    def hist_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["n_chars"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"v": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    def hist_merge(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(v, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, c)
        return pa.table({"v": pa.array(uq), "c": pa.array(tot)})

    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .map_batches(hist_merge, batch_format="pyarrow",
                     batch_size=1 << 30)
        .to_pandas()
    )
    vals = hist["v"].to_numpy(np.int64)
    offs = np.concatenate([[0], hist["c"].to_numpy(np.int64).cumsum()[:-1]])
    ref = ray.put((vals, offs))

    def tag(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False)
        h = (v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             >> np.uint64(32)).astype(np.int64)
        return t.append_column("part", pa.array(h % parts,
                                                type=pa.int64()))

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        v_arr, o_arr = _bget(ref)
        df = df.sort_values(["n_chars", "doc_id"], kind="stable")
        v = df["n_chars"].to_numpy(np.int64)
        base = o_arr[np.searchsorted(v_arr, v)]
        # position within the value run (runs are contiguous post-sort)
        run_start = np.zeros(len(v), dtype=bool)
        run_start[0] = True
        run_start[1:] = v[1:] != v[:-1]
        idx = np.arange(len(v), dtype=np.int64)
        pos = idx - np.maximum.accumulate(np.where(run_start, idx, 0))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "rank": base + pos + 1,
        })

    return (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(rank_group, batch_format="pandas")
    )


def q_json_extract_props(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    JSON ``props`` column with a VECTORIZED Arrow regex kernel (no
    per-row json.loads — the schema-on-read shape a log pipeline
    needs), then the map-side combined per-type aggregate. Extraction
    stays zero-copy Arrow end to end; sums are exact ints.
    Reference anchor: the API strategies' nested-JSON field pulls
    (src/crawlers/async_api.py class_json_strategy) generalized to a
    column kernel."""

    def extract(t: pa.Table) -> pa.Table:
        k = pc.cast(pc.struct_field(
            pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        g = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "n": np.ones(t.num_rows, dtype=np.int64),
            "sum_k": k.to_numpy(zero_copy_only=False),
        }).groupby("event_type", as_index=False).sum()
        return _arrow_out(g)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).sum()
        out["n"] = out["n"].astype(np.int64)
        out["sum_k"] = out["sum_k"].astype(np.int64)
        out["avg_k"] = _round_half_up(
            out["sum_k"].to_numpy(np.float64)
            / out["n"].to_numpy(np.float64), 4)
        return out

    return (
        _tbl(sf_dir, "events", ["event_type", "props"])
        .map_batches(extract, batch_format="pyarrow")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_star_join_revenue(sf_dir: str):
    """Star join (TPC-H Q5 shape): revenue per region through the
    orders → customer → nation → region dimension chain. The three
    dimension tables broadcast ONCE as a composed custkey→region
    lookup (built driver-side from the tiny dims), so the fact scan is
    map-only with a small combined groupby — no fact-side shuffle.
    Revenue rides as exact integer cents (order-free)."""
    cust = papq.read_table(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    nat = papq.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_regionkey"])
    reg = papq.read_table(os.path.join(sf_dir, "region.parquet"),
                          columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat["n_nationkey"].to_pylist(),
                   nat["n_regionkey"].to_pylist()))
    r2n = dict(zip(reg["r_regionkey"].to_pylist(),
                   reg["r_name"].to_pylist()))
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    order_ = np.argsort(ck, kind="stable")
    rname = np.array([r2n[n2r[n]] for n in
                      cust["c_nationkey"].to_pylist()], dtype=object)
    ref = ray.put((ck[order_], rname[order_]))

    def rev(t: pa.Table) -> pa.Table:
        keys, rn = _bget_slot("star_join_revenue", ref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, c)
        np.minimum(idx, len(keys) - 1, out=idx)
        if not np.array_equal(keys[idx], c):
            raise RuntimeError("star join: custkey missing from the "
                               "customer dimension")
        cents = _round_half_up(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({"region": rn[idx], "cents": cents,
                          "n": np.ones(len(c), dtype=np.int64)})
        return _arrow_out(g.groupby("region", as_index=False).sum())

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("region", as_index=False).sum()
        out["n_orders"] = out.pop("n").astype(np.int64)
        out["revenue"] = out.pop("cents").to_numpy(np.float64) / 100.0
        return out

    return (
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(rev, batch_format="pyarrow")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


# --------------------------------------------------------------------------
# Outer-join / aggregate-filter join shapes (TPC-H Q13 / Q17 / Q18) and
# grouped set ops — the classic warehouse patterns the catalog lacked
# --------------------------------------------------------------------------


def q_custdist_orders(sf_dir: str):
    """LEFT-OUTER count distribution (TPC-H Q13 shape): how many
    customers placed exactly N orders, including N = 0. No outer join
    is ever shuffled: per-batch custkey value-count partials →
    groupby(custkey) → per-batch distribution partials →
    groupby(n_orders); the zero bucket is total_customers −
    customers_with_orders, both known without touching the fact again
    (parquet footer row count + the tiny distribution itself). Relies
    on the FK invariant every o_custkey exists in customer — the same
    assumption TPC-H Q13 makes (reference analog: the per-site
    before/after row-count report, ``src/crawler.py:190-243``)."""
    n_cust = _tbl_rows(sf_dir, "customer")

    def per_cust(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["o_custkey"])
        return pa.table({"c_custkey": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    def dist_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["n_orders"])
        return pa.table({"n_orders": vc.field("values"),
                         "n_custs": pc.cast(vc.field("counts"), pa.int64())})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        zero = n_cust - int(df["n_custs"].sum())
        if zero > 0:
            df = pd.concat(
                [df, pd.DataFrame({"n_orders": [0], "n_custs": [zero]})],
                ignore_index=True)
        return df.astype({"n_orders": np.int64, "n_custs": np.int64})

    return (
        _tbl(sf_dir, "orders", ["o_custkey"])
        .map_batches(per_cust, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="n_orders"))
        .map_batches(dist_partial, batch_format="pyarrow")
        .groupby("n_orders")
        .aggregate(Sum("n_custs", alias_name="n_custs"))
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_small_qty_revenue(sf_dir: str):
    """Per-group-average filter (TPC-H Q17 shape): total revenue / 7
    from lineitems whose quantity is below 20% of their part's average
    quantity. ONE partkey exchange: the pruned 3-column fact
    co-partitions by coarse part bucket, and because every row of a
    part lands in the same bucket, the per-part average and the filter
    both run bucket-locally — no broadcast of a per-part table, no
    second fact scan, no per-part tiny map_groups. Quantities are
    integer-valued so the average is an exact int/int ratio (bit-equal
    to DuckDB's); revenue rides as exact integer cents."""
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"))

    def bucketize(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(k % parts, type=pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["l_partkey"].to_numpy(np.int64)
        qty = g["l_quantity"].to_numpy(np.float64)
        cents = _round_half_up(
            g["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        upk, inv = np.unique(pk, return_inverse=True)
        qsum = np.bincount(inv, weights=qty.astype(np.int64))
        qcnt = np.bincount(inv).astype(np.float64)
        lim = 0.2 * (qsum / qcnt)
        keep = qty < lim[inv]
        return pd.DataFrame({"cents": [int(cents[keep].sum())]})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["cents"].sum())
        return pd.DataFrame({"avg_yearly": [
            float(_round_half_up(total / 100.0 / 7.0, 2))]})

    return (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(per_bucket, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_large_orders_qty(sf_dir: str):
    """Aggregate-filter semi-join (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 300, joined back to the order header.
    The HAVING set comes from a pre-combined groupby (per-batch
    orderkey bincount partials) and is the heavy tail of the
    distribution — tiny by construction — so it broadcasts via
    ray.put and the orders scan stays map-only; the fact table is
    never re-shuffled. With a low threshold (HAVING set no longer
    small) this flips to the q_join_orders_lineitem hash-join shape —
    the same size dispatch the anti-join family uses."""
    threshold = 300
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"))

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=q).astype(np.int64)
        return pa.table({"l_orderkey": uk, "q": s,
                         "part": uk % parts})

    # coarse-bucket final sum (the pagerank distinct pattern): a
    # per-orderkey Ray aggregate sorts millions of groups; 64-ish
    # buckets + an np.unique/bincount kernel per bucket do the same
    # combine at a fraction of the exchange cost (measured 42.7 →
    # see BASELINE.md) — and the HAVING filter runs bucket-locally,
    # so only the heavy tail ever leaves the bucket.
    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g["l_orderkey"].to_numpy(np.int64)
        q = g["q"].to_numpy(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.bincount(inv, weights=q).astype(np.int64)
        m = s > threshold
        return pd.DataFrame({"l_orderkey": uk[m], "total_qty": s[m]})

    big = (
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    keys = big["l_orderkey"].to_numpy(np.int64)
    order_ = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order_],
                   big["total_qty"].to_numpy(np.int64)[order_]))

    def attach(t: pa.Table) -> pa.Table:
        keys_s, qty_s = _bget_slot("large_orders_qty", ref)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys_s, ok)
        np.minimum(idx, max(len(keys_s) - 1, 0), out=idx)
        hit = (keys_s[idx] == ok) if len(keys_s) else np.zeros(len(ok), bool)
        t = t.filter(pa.array(hit))
        return t.append_column(
            "total_qty", pa.array(qty_s[idx[hit]], type=pa.int64()))

    return (
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(attach, batch_format="pyarrow")
    )


def q_user_top_event(sf_dir: str):
    """Mode per group: each user's most frequent event type (ties →
    lexicographically smallest type). Per-batch (user, type) count
    partials pre-combine before ONE coarse user-hash exchange; the
    argmax runs bucket-locally over whole users — no per-user tiny
    map_groups, no second shuffle."""
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size"))
        g["part"] = (g["user_id"] % parts).astype(np.int64)
        return _arrow_out(g)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="stable")
        top = c.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].to_numpy(np.int64),
            "top_event": top["event_type"].to_numpy(object),
            "n": top["n"].to_numpy(np.int64)})

    return (
        _tbl(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(partial, batch_format="pandas")
        .groupby("part", num_partitions=parts)
        .map_groups(pick, batch_format="pandas")
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group: distinct users per event type.
    Two-level dedup — per-batch Arrow-distinct (type, user) pairs →
    ONE coarse user-hash exchange collapses global pair duplicates and
    emits per-type partial counts → tiny type groupby. Only per-type
    counts reach the driver; the distinct pair set itself is never
    collected (billions of rows at 100×)."""
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def pairs(t: pa.Table) -> pa.Table:
        g = t.select(["event_type", "user_id"]).group_by(
            ["event_type", "user_id"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.append_column("part", pa.array(u % parts, type=pa.int64()))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        vc = d["event_type"].value_counts()
        return pd.DataFrame({"event_type": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    return (
        _tbl(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
        .map_batches(lambda d: d.assign(n_users=d["n_users"].astype(
            np.int64)), batch_format="pandas")
    )


def q_audience_overlap(sf_dir: str):
    """Audience-overlap matrix — pairwise Jaccard between event-type
    audiences (the mixture diagnostic a training pipeline runs across
    sources/splits): per-batch Arrow-distinct (type, user) pairs → ONE
    coarse user-hash exchange (global dedup is bucket-local because
    every copy of a pair shares its user) → per-bucket user×type
    indicator matmul (a T×T partial, T = #types) → tiny final combine
    computing Jaccard from the T×T sums. The distinct pair set never
    collects; only T² counters leave each bucket."""
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def pairs(t: pa.Table) -> pa.Table:
        g = t.select(["event_type", "user_id"]).group_by(
            ["event_type", "user_id"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False)
        return g.append_column("part", pa.array(u % parts, type=pa.int64()))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        piv = pd.crosstab(d["user_id"], d["event_type"])
        m = piv.to_numpy(np.int64)
        inter = m.T @ m  # T×T: diagonal = per-type audience size
        types = list(piv.columns)
        ti, tj = np.triu_indices(len(types), k=0)
        return pd.DataFrame({
            "type_a": np.array([types[i] for i in ti], dtype=object),
            "type_b": np.array([types[j] for j in tj], dtype=object),
            "n": inter[ti, tj].astype(np.int64),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["type_a", "type_b"], as_index=False)["n"].sum()
        diag = dict(zip(agg.loc[agg["type_a"] == agg["type_b"], "type_a"],
                        agg.loc[agg["type_a"] == agg["type_b"], "n"]))
        off = agg[(agg["type_a"] != agg["type_b"]) & (agg["n"] > 0)]
        na = off["type_a"].map(diag).to_numpy(np.int64)
        nb = off["type_b"].map(diag).to_numpy(np.int64)
        nboth = off["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "type_a": off["type_a"].to_numpy(object),
            "type_b": off["type_b"].to_numpy(object),
            "n_a": na, "n_b": nb, "n_both": nboth,
            "jacc": _round_half_up(nboth / (na + nb - nboth), 4),
        })

    return (
        _tbl(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(bucket, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
    )


def q_hopping_distinct_users(sf_dir: str):
    """Windowed DISTINCT count — the sliding-window op a count partial
    can't serve (distinct doesn't pre-aggregate): 1-day windows every
    12 h, distinct users per window. Per-batch window fan-out →
    Arrow-distinct (win, user) pairs → ONE user-hash exchange (every
    copy of a pair shares its user, so dedup inside the partition IS
    global dedup) → per-window partial counts → tiny window groupby.
    The event stream itself never re-shuffles and the distinct pair
    set never collects."""
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def pairs(t: pa.Table) -> pa.Table:
        b = (t["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype(np.int64) // _HOP_US)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        win = np.concatenate([(b - 0) * _HOP_US, (b - 1) * _HOP_US])
        uu = np.concatenate([u, u])
        g = pd.DataFrame({"win": win, "user_id": uu}).drop_duplicates()
        g["part"] = (g["user_id"] % parts).astype(np.int64)
        return _arrow_out(g)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["win", "user_id"])
        vc = d["win"].value_counts()
        return pd.DataFrame({"win": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "win_start": df["win"].to_numpy(np.int64).view("datetime64[us]"),
            "n_users": df["n_users"].to_numpy(np.int64)})

    return (
        _tbl(sf_dir, "events", ["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(bucket, batch_format="pandas")
        .groupby("win")
        .aggregate(Sum("n", alias_name="n_users"))
        .map_batches(finish, batch_format="pandas")
    )


_LIFT_MIN_COUNT = 20  # collocation support floor: bounds the
#                       collected candidate set by N_tokens / 20
_LIFT_TOPK = 20


def q_bigram_lift(sf_dir: str):
    """Collocation mining: top-20 word bigrams by LIFT — count(ab)·N /
    (count(a)·count(b)) with support ≥ 20 — the PMI ranking with the
    log left off, so the score is one exact-int multiply + one IEEE
    division and bit-identical to the SQL (log-PMI ranks the same but
    hashes libm-dependently, the tfidf ratio-idf trick). ONE corpus
    scan emits prefixed unigram+bigram Counter partials into a
    key-hash coarse-bucket combine (a string-keyed Ray aggregate over
    the ~vocab² partial stream sort-shuffles tens of millions of
    strings — measured 351 s at 200k docs; 32 crc32 buckets + a
    pandas groupby per bucket is the tfidf/pagerank coarse-bucket
    pattern), materialized once (vocabulary-bounded — the corpus
    itself never materializes); the support threshold bounds the
    driver-side candidate set by N/20, and only the candidate
    bigrams' own words fetch unigram counts (semi-join pushdown)."""
    from collections import Counter

    bparts = 32

    def partial(df: pd.DataFrame) -> pa.Table:
        cu: Counter = Counter()
        cb: Counter = Counter()
        for t in df["text"]:
            w = t.split(" ")
            cu.update(w)
            cb.update(map(" ".join, zip(w, w[1:])))
        # prefix separator must NOT be "\x00": pandas' khash string
        # table truncates at an embedded NUL, so a pandas groupby
        # silently collapses distinct NUL-prefixed keys. Space is safe
        # (tokens are space-split) and "u "/"b " classes cannot collide.
        keys = ["u " + k for k in cu] + ["b " + k for k in cb]
        vals = np.fromiter(cu.values(), dtype=np.int64, count=len(cu))
        valb = np.fromiter(cb.values(), dtype=np.int64, count=len(cb))
        part = np.fromiter((zlib.crc32(k.encode()) % bparts
                            for k in keys), dtype=np.int64,
                           count=len(keys))
        return pa.table({"key": pa.array(keys, type=pa.string()),
                         "n": pa.array(np.concatenate([vals, valb])),
                         "part": pa.array(part)})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("key", as_index=False, sort=False)["n"].sum()
        return pd.DataFrame({"key": c["key"],
                             "n": c["n"].to_numpy(np.int64)})

    counts = (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("part", num_partitions=bparts)
        .map_groups(combine, batch_format="pandas")
    ).materialize()  # vocabulary-bounded, consumed three times below

    def uni_total(t: pa.Table) -> pa.Table:
        m = pc.starts_with(t["key"], "u ")
        return pa.table({"n": [pc.sum(pc.filter(t["n"], m), min_count=0)]})

    def cand_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.starts_with(t["key"], "b "),
                    pc.greater_equal(t["n"], _LIFT_MIN_COUNT))
        return t.filter(m)

    cand = counts.map_batches(cand_rows, batch_format="pyarrow").to_pandas()
    words = set()
    for k in cand["key"]:
        a, b = k[2:].split(" ", 1)
        words.add("u " + a)
        words.add("u " + b)
    wref = ray.put(words)

    def uni_rows(t: pa.Table) -> pa.Table:
        w = _bget_slot("bigram_lift_words", wref)
        m = pa.array([k in w for k in t["key"].to_pylist()])
        return t.filter(m)

    uni = counts.map_batches(uni_rows, batch_format="pyarrow").to_pandas()
    total = counts.map_batches(uni_total, batch_format="pyarrow").to_pandas()
    n_tok = int(total["n"].sum())
    ulut = dict(zip(uni["key"], uni["n"].astype(np.int64)))

    w1 = np.array([k[2:].split(" ", 1)[0] for k in cand["key"]], object)
    w2 = np.array([k[2:].split(" ", 1)[1] for k in cand["key"]], object)
    c_ab = cand["n"].to_numpy(np.int64)
    c_a = np.array([ulut["u " + w] for w in w1], dtype=np.int64)
    c_b = np.array([ulut["u " + w] for w in w2], dtype=np.int64)
    lift = _round_half_up(
        (c_ab.astype(np.float64) * np.float64(n_tok))
        / (c_a.astype(np.float64) * c_b.astype(np.float64)), 4)
    out = pd.DataFrame({"w1": w1, "w2": w2,
                        "n_pair": c_ab, "lift": lift})
    out = out.sort_values(["lift", "w1", "w2"],
                          ascending=[False, True, True],
                          kind="stable").head(_LIFT_TOPK)
    return out.reset_index(drop=True)


def q_user_daily_gapfill(sf_dir: str):
    """Calendar densification (gap-fill / resample): every user ×
    every day in the global span, zero-filled — the dimension-
    densification shape a LEFT JOIN to generate_series expresses in
    SQL. Two passes: a tiny min/max aggregate fixes the calendar
    (domain-bounded — days, not rows), then per-batch (user, day)
    count partials pre-combine before ONE user-hash exchange; each
    bucket owns whole users, so the calendar fan-out and zero-fill run
    bucket-locally. The exchange only ever moves pre-combined
    partials; the |users|×|days| output is the op's own result size,
    not an intermediate blow-up."""
    us_day = 86_400_000_000
    parts = _copart_count(_tbl_rows(sf_dir, "events"))
    ev = _tbl(sf_dir, "events", ["user_id", "ts"])

    mm = (
        ev.map_batches(lambda t: pa.table({"lo": [pc.min(t["ts"])],
                                           "hi": [pc.max(t["ts"])]}),
                       batch_format="pyarrow")
        .map_batches(lambda t: pa.table({"lo": [pc.min(t["lo"])],
                                         "hi": [pc.max(t["hi"])]}),
                     batch_format="pyarrow", batch_size=1 << 30)
        .take_all()[0]
    )
    lo = np.datetime64(mm["lo"], "us").astype(np.int64) // us_day
    hi = np.datetime64(mm["hi"], "us").astype(np.int64) // us_day
    days = np.arange(lo, hi + 1, dtype=np.int64)  # calendar-bounded

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = (t["ts"].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False).astype(np.int64) // us_day)
        g = pd.DataFrame({"user_id": u, "day": d}).groupby(
            ["user_id", "day"], as_index=False).agg(n=("day", "size"))
        g["part"] = (g["user_id"] % parts).astype(np.int64)
        return _arrow_out(g)

    def densify(g: pd.DataFrame) -> pd.DataFrame:
        # numpy scatter onto a (users × days) grid — the grid IS the
        # densified output, so zero-fill is free and there is no
        # pandas merge (measured ~2× on the 18M-row stress output)
        k = g["user_id"].to_numpy(np.int64)
        didx = g["day"].to_numpy(np.int64) - days[0]
        n = g["n"].to_numpy(np.int64)
        users, uinv = np.unique(k, return_inverse=True)
        grid = np.zeros((len(users), len(days)), dtype=np.int64)
        np.add.at(grid, (uinv, didx), n)
        return _arrow_out(pd.DataFrame({
            "user_id": np.repeat(users, len(days)),
            "day": (np.tile(days, len(users)) * us_day
                    ).astype("datetime64[us]"),
            "n": grid.ravel()}))

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(densify, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# TPC-H decision-support shapes #117-125 (Q2-Q22 gaps). The synth schema
# has no partsupp / l_commitdate / l_shipmode / p_container columns, so each
# query keeps the reference TPC-H query's JOIN + predicate SHAPE (correlated
# EXISTS, disjunctive multi-clause scan, sole-late-supplier double
# anti-semi-join, scalar-subquery anti-join, argmax-with-ties) over the
# columns the driver tables do have.
# --------------------------------------------------------------------------


def q_order_priority_counts(sf_dir: str):
    """Correlated-EXISTS semi-join (TPC-H Q4 shape): count Q1-1997
    orders per priority having at least one lineitem shipped more than
    30 days after the order date (the schema's stand-in for commitdate
    < receiptdate). Both sides shrink map-side before the ONE
    orderkey-bucket exchange: orders prune to the 3-month window,
    lineitem prunes to shipdates that could possibly qualify
    (> window_lo + 30 d) and pre-combines to one max-shipdate row per
    orderkey per batch. Per bucket the EXISTS test is one searchsorted
    probe and the result collapses to ≤5 priority-count rows, so the
    final groupby moves ~5 rows per bucket regardless of input size."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1997-04-01")
    us_30d = 30 * _US_DAY
    min_ship = pa.scalar(
        pd.Timestamp("1997-01-31").to_pydatetime(), type=pa.timestamp("us"))
    n_rows = _tbl_rows(sf_dir, "lineitem")
    parts = _copart_count(n_rows)

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "t_us": pa.array(_dt_i64(t["o_orderdate"])),
            "prio": t["o_orderpriority"],
        })

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], min_ship))
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        s = _dt_i64(t["l_shipdate"])
        uk, inv = np.unique(k, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, s)
        return pa.table({
            "part": pa.array(uk % parts, type=pa.int64()),
            "okey": pa.array(uk),
            "t_us": pa.array(mx),
            "prio": pa.array([""] * len(uk), type=pa.string()),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype=str),
            "n": pd.Series([], dtype=np.int64)})
        o = df[df["prio"] != ""]
        li = df[df["prio"] == ""]
        if o.empty or li.empty:
            return empty
        k = li["okey"].to_numpy(np.int64)
        v = li["t_us"].to_numpy(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, v)
        ok = o["okey"].to_numpy(np.int64)
        idx = np.searchsorted(uk, ok)
        np.minimum(idx, max(len(uk) - 1, 0), out=idx)
        hit = (uk[idx] == ok) & (mx[idx] > o["t_us"].to_numpy(np.int64)
                                 + us_30d)
        if not hit.any():
            return empty
        vc = o.loc[hit, "prio"].value_counts()
        return pd.DataFrame({"o_orderpriority": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    orders = _tbl(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate", "o_orderpriority"])
    items = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    with _shuffle_scaled(n_rows * 24):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("o_orderpriority")
            .aggregate(Sum("n", alias_name="n"))
        )


def q_priority_linecounts(sf_dir: str):
    """Fact-to-fact join + conditional rollup (TPC-H Q12 shape, with
    l_returnflag standing in for the missing l_shipmode): lineitems
    shipped in 1997 pick up their order's priority class through ONE
    orderkey-bucket co-partition; lineitem pre-combines to per-batch
    (orderkey, returnflag) count partials so the exchange carries
    combined counts, never raw lines; each bucket reduces to ≤3
    returnflag rows before the tiny final groupby."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1998-01-01")
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    high = pa.array(["1-URGENT", "2-HIGH"])

    def tag_orders(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        is_high = pc.is_in(t["o_orderpriority"], value_set=high)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "rf": pa.array([""] * len(k), type=pa.string()),
            "n": pa.array(is_high.to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        g = pd.DataFrame({
            "okey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "rf": t["l_returnflag"].to_pandas(),
        }).groupby(["okey", "rf"], as_index=False).agg(n=("okey", "size"))
        g["part"] = (g["okey"] % parts).astype(np.int64)
        return _arrow_out(g[["part", "okey", "rf", "n"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "l_returnflag": pd.Series([], dtype=str),
            "high_lines": pd.Series([], dtype=np.int64),
            "low_lines": pd.Series([], dtype=np.int64)})
        o = df[df["rf"] == ""]
        li = df[df["rf"] != ""]
        if o.empty or li.empty:
            return empty
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, ohigh = ok[order_], o["n"].to_numpy(np.int64)[order_]
        k = li["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        li = li[hit]
        hi_flag = ohigh[idx[hit]]
        n = li["n"].to_numpy(np.int64)
        g = pd.DataFrame({
            "l_returnflag": li["rf"].to_numpy(),
            "high_lines": np.where(hi_flag == 1, n, 0),
            "low_lines": np.where(hi_flag == 1, 0, n),
        }).groupby("l_returnflag", as_index=False).sum()
        return g.astype({"high_lines": np.int64, "low_lines": np.int64})

    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag", "l_shipdate"])
    with _shuffle_scaled(n_rows * 24):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("l_returnflag")
            .aggregate(Sum("high_lines", alias_name="high_lines"),
                       Sum("low_lines", alias_name="low_lines"))
        )


def _part_lookup(sf_dir: str, columns: list[str]):
    """Broadcast side of the part dimension: sorted partkey array plus
    the requested attribute arrays (ray.put once, searchsorted probe
    per batch). part is ~1/30 of lineitem rows — broadcastable far
    beyond bench scale; past that the co-partition join shape
    (q_priority_linecounts) is the documented size-dispatch escape."""
    pdf = _tbl(sf_dir, "part", ["p_partkey"] + columns).to_pandas()
    order_ = np.argsort(pdf["p_partkey"].to_numpy(np.int64), kind="stable")
    pk = pdf["p_partkey"].to_numpy(np.int64)[order_]
    return pk, [pdf[c].to_numpy()[order_] for c in columns]


def q_promo_revenue_pct(sf_dir: str):
    """Broadcast-dim scan + global ratio (TPC-H Q14 shape): the share
    of fall-1997 discounted revenue from PROMO-type parts. The part
    dimension broadcasts as (sorted partkey, is-promo bitmap); the
    fact scan stays map-only and emits ONE two-int partial row per
    batch (promo cents, total cents), so nothing is shuffled at all —
    the driver folds the tiny partial set and computes the exact
    int/int ratio DuckDB computes."""
    lo, hi = _ts_us("1997-09-01"), _ts_us("1997-12-01")
    pk, (ptype,) = _part_lookup(sf_dir, ["p_type"])
    promo = (ptype.astype(str) == "PROMO")
    ref = ray.put((pk, promo))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        if len(t) == 0:
            return pa.table({"promo_cents": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        pk_s, promo_s = _bget_slot("promo_revenue_pct", ref)
        cents = _rev_cents(t)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_s, k)
        np.minimum(idx, max(len(pk_s) - 1, 0), out=idx)
        is_promo = (pk_s[idx] == k) & promo_s[idx]
        return pa.table({
            "promo_cents": pa.array([int(cents[is_promo].sum())]),
            "cents": pa.array([int(cents.sum())]),
        })

    parts_df = (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    promo_c = int(parts_df["promo_cents"].sum())
    total_c = int(parts_df["cents"].sum())
    pct = float(_round_half_up(100.0 * promo_c / total_c, 4)) \
        if total_c else 0.0
    return pd.DataFrame({"promo_pct": [pct]})


def q_top_supplier_revenue(sf_dir: str):
    """Argmax-with-ties over a grouped aggregate (TPC-H Q15 shape):
    the supplier(s) with the highest Q1-1997 discounted revenue.
    Per-batch (suppkey → cents) partials pre-combine map-side; the
    supplier-cardinality groupby output is tiny (10k rows/SF), so the
    max + tie filter runs on the driver and joins names from the
    supplier dim directly. Integer cents make the tie semantics exact
    — no float argmax ambiguity."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1997-04-01")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        if len(t) == 0:
            return pa.table({"s_suppkey": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        k = t["l_suppkey"].to_numpy(zero_copy_only=False)
        cents = _rev_cents(t)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"s_suppkey": pa.array(uk), "cents": pa.array(s)})

    rev = (
        _tbl(sf_dir, "lineitem",
             ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    if rev.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=str),
                             "total_revenue": pd.Series([], dtype=np.float64)})
    best = rev[rev["cents"] == rev["cents"].max()]
    names = _tbl(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(names, on="s_suppkey")
    return pd.DataFrame({
        "s_suppkey": out["s_suppkey"].astype(np.int64),
        "s_name": out["s_name"].astype(str),
        "total_revenue": out["cents"].to_numpy(np.int64) / 100.0,
    })


def q_brand_supplier_cnt(sf_dir: str):
    """Distinct-count rollup with NOT-IN exclusion (TPC-H Q16 shape,
    lineitem standing in for partsupp): suppliers per surviving
    (brand, type, size) combo, excluding negative-balance suppliers.
    The part dim broadcasts as partkey → combo-id (combos are the
    ~|brand|×|type|×8 surviving triples — int16-sized); the bad-supplier
    set broadcasts sorted. Batches reduce to DISTINCT (combo, suppkey)
    pairs before the ONE combo-hash exchange, so the shuffle carries
    at most combos × suppliers rows no matter how big the fact is."""
    sizes = np.array([1, 5, 9, 13, 17, 21, 25, 29], dtype=np.int64)
    pk, (brand, ptype, psize) = _part_lookup(
        sf_dir, ["p_brand", "p_type", "p_size"])
    brand, ptype = brand.astype(str), ptype.astype(str)
    psize = psize.astype(np.int64)
    keep = ((brand != "Brand#4") & (ptype != "PROMO")
            & np.isin(psize, sizes))
    combos = pd.DataFrame({"p_brand": brand[keep], "p_type": ptype[keep],
                           "p_size": psize[keep]}).drop_duplicates()
    combos = combos.sort_values(
        ["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    ckey = {(b, t, s): i for i, (b, t, s) in enumerate(
        zip(combos["p_brand"], combos["p_type"], combos["p_size"]))}
    cid = np.full(len(pk), -1, dtype=np.int64)
    ki = np.nonzero(keep)[0]
    cid[ki] = [ckey[(brand[i], ptype[i], int(psize[i]))] for i in ki]
    sup = _tbl(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"]
                  .to_numpy(np.int64))
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"), hi=32)
    ref = ray.put((pk, cid, bad))

    def pairs(t: pa.Table) -> pa.Table:
        pk_s, cid_s, bad_s = _bget_slot("brand_supplier_cnt", ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_s, k)
        np.minimum(idx, max(len(pk_s) - 1, 0), out=idx)
        c = np.where(pk_s[idx] == k, cid_s[idx], -1)
        if len(bad_s):
            bidx = np.searchsorted(bad_s, sk)
            np.minimum(bidx, len(bad_s) - 1, out=bidx)
            is_bad = bad_s[bidx] == sk
        else:
            is_bad = np.zeros(len(sk), dtype=bool)
        ok = (c >= 0) & ~is_bad
        g = pd.DataFrame({"combo": c[ok], "sk": sk[ok]}).drop_duplicates()
        g["part"] = (g["combo"] % parts).astype(np.int64)
        return _arrow_out(g)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df[["combo", "sk"]].drop_duplicates()
             .groupby("combo", as_index=False).agg(supplier_cnt=("sk", "size")))
        c = g["combo"].to_numpy(np.int64)
        return pd.DataFrame({
            "p_brand": combos["p_brand"].to_numpy()[c],
            "p_type": combos["p_type"].to_numpy()[c],
            "p_size": combos["p_size"].to_numpy(np.int64)[c],
            "supplier_cnt": g["supplier_cnt"].to_numpy(np.int64),
        })

    return (
        _tbl(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(count_bucket, batch_format="pandas")
    )


def q_disjunctive_revenue(sf_dir: str):
    """Disjunctive multi-clause predicate scan (TPC-H Q19 shape):
    revenue from three OR-ed (brand, size-range, quantity-range)
    clauses. The part dim broadcasts as partkey → clause-id (brand +
    size resolve driver-side; only the quantity bound check needs the
    fact row), so the scan is ONE map-only pass with no join and a
    one-row partial per batch."""
    brands = np.array(["Brand#2", "Brand#19", "Brand#4"])
    size_hi = np.array([5, 10, 15], dtype=np.int64)
    qlo = np.array([1.0, 10.0, 20.0])
    qhi = np.array([11.0, 20.0, 30.0])
    pk, (brand, psize) = _part_lookup(sf_dir, ["p_brand", "p_size"])
    brand = brand.astype(str)
    psize = psize.astype(np.int64)
    cid = np.full(len(pk), -1, dtype=np.int64)
    for i, b in enumerate(brands):
        cid[(brand == b) & (psize >= 1) & (psize <= size_hi[i])] = i
    ref = ray.put((pk, cid))

    def partial(t: pa.Table) -> pa.Table:
        pk_s, cid_s = _bget_slot("disjunctive_revenue", ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_s, k)
        np.minimum(idx, max(len(pk_s) - 1, 0), out=idx)
        c = np.where(pk_s[idx] == k, cid_s[idx], -1)
        m = c >= 0
        cc = np.where(m, c, 0)
        sel = m & (qty >= qlo[cc]) & (qty <= qhi[cc])
        cents = _rev_cents(t)
        return pa.table({"cents": pa.array([int(cents[sel].sum())])})

    parts_df = (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame({"revenue": [int(parts_df["cents"].sum()) / 100.0]})


def q_waiting_suppliers(sf_dir: str):
    """Sole-late-supplier double anti-semi-join (TPC-H Q21 shape, with
    "late" = shipped >60 days after order date standing in for the
    missing commit/receipt dates): for finished ('F') orders with ≥2
    distinct suppliers, count per supplier the orders where it was the
    ONLY late one. Lineitem pre-combines to one (orderkey, suppkey,
    max-shipdate) row per batch; orders ship (orderkey, orderdate)
    through the same orderkey-bucket exchange; the EXISTS / NOT-EXISTS
    pair is a bucket-local vectorized groupby. Output is the tiny
    per-supplier count table → broadcast name join → top 10."""
    us_60d = 60 * _US_DAY
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "sk": pa.array(np.full(len(k), -1, dtype=np.int64)),
            "t_us": pa.array(_dt_i64(t["o_orderdate"])),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        s = _dt_i64(t["l_shipdate"])
        g = pd.DataFrame({"okey": k, "sk": sk, "t_us": s}).groupby(
            ["okey", "sk"], as_index=False).agg(t_us=("t_us", "max"))
        g["part"] = (g["okey"] % parts).astype(np.int64)
        return _arrow_out(g[["part", "okey", "sk", "t_us"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        o = df[df["sk"] < 0]
        li = df[df["sk"] >= 0]
        if o.empty or li.empty:
            return empty
        g = li.groupby(["okey", "sk"], as_index=False).agg(
            t_us=("t_us", "max"))
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, od = ok[order_], o["t_us"].to_numpy(np.int64)[order_]
        k = g["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        g = g[hit]
        late = g["t_us"].to_numpy(np.int64) > od[idx[hit]] + us_60d
        gg = pd.DataFrame({"okey": g["okey"].to_numpy(np.int64),
                           "sk": g["sk"].to_numpy(np.int64),
                           "late": late.astype(np.int64)})
        st = gg.groupby("okey").agg(nsup=("sk", "size"),
                                    nlate=("late", "sum"))
        good = st.index[(st["nsup"] >= 2) & (st["nlate"] == 1)]
        w = gg[(gg["late"] == 1) & gg["okey"].isin(good)]
        if w.empty:
            return empty
        vc = w["sk"].value_counts()
        return pd.DataFrame({"s_suppkey": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    orders = _tbl(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate", "o_orderstatus"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_shipdate"])
    with _shuffle_scaled(n_rows * 32):
        counts = (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("s_suppkey")
            .aggregate(Sum("n", alias_name="numwait"))
            .to_pandas()
        )
    names = _tbl(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(names, on="s_suppkey")
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True],
                          kind="stable").head(10)
    return pd.DataFrame({"s_name": out["s_name"].astype(str),
                         "numwait": out["numwait"].astype(np.int64)})


def q_idle_rich_customers(sf_dir: str):
    """Scalar-subquery filter + anti-join rollup (TPC-H Q22 shape,
    nation standing in for the missing phone country code): customers
    with above-positive-average balance and no orders since mid-1999
    (the synth FK gives every customer SOME order, so the anti
    condition is recency-scoped to stay non-degenerate), counted and
    summed per nation. The threshold is an exact two-int driver scalar
    (cents sum / 100 / count — the identical double expression the
    oracle computes); the recent-orderer key set broadcasts sorted (the
    documented anti-join size dispatch: above JCR_DROP_BCAST_LIMIT the
    co-partition left-anti path takes over); balances ride as exact
    cents so the per-nation sums match bit-for-bit."""
    cut = _ts_us("1999-06-01")
    def bal_partial(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal > 0
        cents = _round_half_up(bal[pos] * 100.0, 0).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())]),
                         "n": pa.array([int(pos.sum())])})

    tot = (_tbl(sf_dir, "customer", ["c_acctbal"])
           .map_batches(bal_partial, batch_format="pyarrow").to_pandas())
    n_pos = int(tot["n"].sum())
    thr = (int(tot["cents"].sum()) / 100.0) / n_pos if n_pos else 0.0
    recent = _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], cut)),
        batch_format="pyarrow")
    okeys = np.array(sorted(recent.unique("o_custkey")), dtype=np.int64)
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}
    ref = ray.put((okeys, nat))

    def partial(t: pa.Table) -> pa.Table:
        okeys_s, nat_s = _bget_slot("idle_rich_customers", ref)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        if len(okeys_s):
            idx = np.searchsorted(okeys_s, ck)
            np.minimum(idx, len(okeys_s) - 1, out=idx)
            has_order = okeys_s[idx] == ck
        else:
            has_order = np.zeros(len(ck), dtype=bool)
        sel = (bal > thr) & ~has_order
        if not sel.any():
            return pa.table({"n_name": pa.array([], type=pa.string()),
                             "numcust": pa.array([], type=pa.int64()),
                             "cents": pa.array([], type=pa.int64())})
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)[sel]
        cents = _round_half_up(bal[sel] * 100.0, 0).astype(np.int64)
        g = pd.DataFrame({"nk": nk, "cents": cents}).groupby(
            "nk", as_index=False).agg(numcust=("cents", "size"),
                                      cents=("cents", "sum"))
        return pa.table({
            "n_name": pa.array([nat_s[int(x)] for x in g["nk"]],
                               type=pa.string()),
            "numcust": pa.array(g["numcust"].to_numpy(np.int64)),
            "cents": pa.array(g["cents"].to_numpy(np.int64)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["totacctbal"] = df["cents"].to_numpy(np.int64) / 100.0
        return df[["n_name", "numcust", "totacctbal"]].astype(
            {"numcust": np.int64})

    return (
        _tbl(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("numcust", alias_name="numcust"),
                   Sum("cents", alias_name="cents"))
        .map_batches(finish, batch_format="pandas")
    )


def q_unshipped_orders_topk(sf_dir: str):
    """Segment-filtered shipping-priority top-k (TPC-H Q3 shape):
    revenue still unshipped as of 1997-06-01 for BUILDING-segment
    customers, top 10 orders. The segment key set broadcasts (customer
    is the smaller dim; the anti-join dispatch note applies); orders
    and per-batch (orderkey → cents) lineitem partials co-partition by
    orderkey bucket; every bucket emits only its local top 10, so the
    final exact sort touches ≤ 10 × buckets rows."""
    cut = _ts_us("1997-06-01")
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    bld = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"],
                                    pa.scalar("BUILDING"))),
        batch_format="pyarrow")
    bkeys = np.array(sorted(bld.unique("c_custkey")), dtype=np.int64)
    ref = ray.put(bkeys)

    def tag_orders(t: pa.Table) -> pa.Table:
        bkeys_s = _bget_slot("unshipped_orders_topk", ref)
        t = t.filter(pc.less(t["o_orderdate"], cut))
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        if len(bkeys_s):
            idx = np.searchsorted(bkeys_s, ck)
            np.minimum(idx, len(bkeys_s) - 1, out=idx)
            in_seg = bkeys_s[idx] == ck
        else:
            in_seg = np.zeros(len(ck), dtype=bool)
        t = t.filter(pa.array(in_seg))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "cents": pa.array(np.zeros(len(k), dtype=np.int64)),
            "t_us": pa.array(_dt_i64(t["o_orderdate"])),
            "prio": t["o_orderpriority"],
        })

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = _rev_cents(t)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({
            "part": pa.array(uk % parts, type=pa.int64()),
            "okey": pa.array(uk),
            "cents": pa.array(s),
            "t_us": pa.array(np.zeros(len(uk), dtype=np.int64)),
            "prio": pa.array([""] * len(uk), type=pa.string()),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "l_orderkey": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
            "od_us": pd.Series([], dtype=np.int64),
            "o_orderpriority": pd.Series([], dtype=str)})
        o = df[df["prio"] != ""]
        li = df[df["prio"] == ""]
        if o.empty or li.empty:
            return empty
        k = li["okey"].to_numpy(np.int64)
        v = li["cents"].to_numpy(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, v)
        ok = o["okey"].to_numpy(np.int64)
        idx = np.searchsorted(uk, ok)
        np.minimum(idx, max(len(uk) - 1, 0), out=idx)
        hit = uk[idx] == ok
        if not hit.any():
            return empty
        out = pd.DataFrame({
            "l_orderkey": ok[hit],
            "cents": s[idx[hit]],
            "od_us": o["t_us"].to_numpy(np.int64)[hit],
            "o_orderpriority": o["prio"].to_numpy()[hit],
        })
        return out.sort_values(["cents", "l_orderkey"],
                               ascending=[False, True],
                               kind="stable").head(10)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].astype(np.int64),
            "revenue": df["cents"].to_numpy(np.int64) / 100.0,
            "o_orderdate": df["od_us"].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "o_orderpriority": df["o_orderpriority"].astype(str),
        })

    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_orderpriority"])
    items = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])
    with _shuffle_scaled(n_rows * 24):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .sort(["cents", "l_orderkey"], descending=[True, False])
            .limit(10)
            .map_batches(finish, batch_format="pandas")
        )


def q_cheapest_supplier_per_part(sf_dir: str):
    """Argmin-with-ties per group over a join (TPC-H Q2 shape,
    lineitem unit price standing in for the missing partsupp
    supplycost): for every size-15 part, the supplier observed selling
    it at the lowest unit price (ties → lowest suppkey), with name and
    nation attached. Per-batch partials keep ONE lexicographic-min
    (price, suppkey) row per part — an order-free combine, so any
    partitioning yields the oracle's row_number()=1 row — then one
    part-bucket exchange re-reduces and the supplier/nation dims
    broadcast for the final attach. Unit price is the pointwise double
    ext/qty both engines compute, so min/tie comparisons are
    bit-identical."""
    pk, (psize,) = _part_lookup(sf_dir, ["p_size"])
    elig = np.sort(pk[psize.astype(np.int64) == 15])
    sup = _tbl(sf_dir, "supplier",
               ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}
    sup["n_name"] = sup["s_nationkey"].map(nat)
    sup = sup.sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snames = sup["s_name"].to_numpy()
    nnames = sup["n_name"].to_numpy()
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"), hi=32)
    ref = ray.put(elig)

    def _reduce(k: np.ndarray, price: np.ndarray, sk: np.ndarray):
        order_ = np.lexsort((sk, price, k))
        k, price, sk = k[order_], price[order_], sk[order_]
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        return k[first], price[first], sk[first]

    def partial(t: pa.Table) -> pa.Table:
        elig_s = _bget_slot("cheapest_supplier_eligible", ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(elig_s):
            idx = np.searchsorted(elig_s, k)
            np.minimum(idx, len(elig_s) - 1, out=idx)
            m = elig_s[idx] == k
        else:
            m = np.zeros(len(k), dtype=bool)
        k = k[m]
        price = (t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
                 / t["l_quantity"].to_numpy(zero_copy_only=False)[m])
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)[m]
        uk, up, us = _reduce(k, price, sk)
        return pa.table({"part": pa.array(uk % parts, type=pa.int64()),
                         "p_partkey": pa.array(uk),
                         "unit_price": pa.array(up),
                         "sk": pa.array(us)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        uk, up, us = _reduce(df["p_partkey"].to_numpy(np.int64),
                             df["unit_price"].to_numpy(np.float64),
                             df["sk"].to_numpy(np.int64))
        sidx = np.searchsorted(skeys, us)
        return pd.DataFrame({
            "p_partkey": uk,
            "s_name": snames[sidx].astype(str),
            "n_name": nnames[sidx].astype(str),
            "unit_price": up,
        })

    return (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(per_bucket, batch_format="pandas")
    )


def q_nation_trade_matrix(sf_dir: str):
    """Two-sided dimension attach + pair rollup (TPC-H Q7 shape):
    1997 discounted revenue between every (supplier nation, customer
    nation) pair. The supplier map broadcasts (tiny); the customer →
    nation map broadcasts onto the ORDERS scan (customer is ~1/10 of
    orders — the anti-join size-dispatch note applies); the only
    exchange is the lineitem↔orders orderkey-bucket co-partition,
    where lineitem arrives pre-combined to per-batch (orderkey,
    supplier-nation) cents partials and each bucket collapses to ≤
    |nations|² rows before the final pair groupby."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1998-01-01")
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}
    sup = _tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snat = sup["s_nationkey"].to_numpy(np.int64)
    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    cnat = cust["c_nationkey"].to_numpy(np.int64)
    ref = ray.put((skeys, snat, ckeys, cnat, nat))

    def tag_orders(t: pa.Table) -> pa.Table:
        _, _, ck_s, cn_s, _ = _bget_slot("nation_trade_matrix", ref)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cn_s[np.searchsorted(ck_s, ck)]
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "nid": pa.array(cn),
            "cents": pa.array(np.full(len(k), -1, dtype=np.int64)),
            "n": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        sk_s, sn_s, _, _, _ = _bget_slot("nation_trade_matrix", ref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sn = sn_s[np.searchsorted(sk_s,
                                  t["l_suppkey"].to_numpy(
                                      zero_copy_only=False))]
        g = pd.DataFrame({"okey": k, "nid": sn, "cents": _rev_cents(t)})
        g = g.groupby(["okey", "nid"], as_index=False).agg(
            cents=("cents", "sum"), n=("cents", "size"))
        g["part"] = (g["okey"] % parts).astype(np.int64)
        return _arrow_out(g[["part", "okey", "nid", "cents", "n"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "supp_nid": pd.Series([], dtype=np.int64),
            "cust_nid": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64)})
        o = df[df["cents"] < 0]
        li = df[df["cents"] >= 0]
        if o.empty or li.empty:
            return empty
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, ocn = ok[order_], o["nid"].to_numpy(np.int64)[order_]
        k = li["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        li = li[hit]
        g = pd.DataFrame({
            "supp_nid": li["nid"].to_numpy(np.int64),
            "cust_nid": ocn[idx[hit]],
            "cents": li["cents"].to_numpy(np.int64),
            "n_lines": li["n"].to_numpy(np.int64),
        }).groupby(["supp_nid", "cust_nid"], as_index=False).sum()
        return g.astype({"cents": np.int64, "n_lines": np.int64})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "supp_nation": df["supp_nid"].map(nat).astype(str),
            "cust_nation": df["cust_nid"].map(nat).astype(str),
            "revenue": df["cents"].to_numpy(np.int64) / 100.0,
            "n_lines": df["n_lines"].astype(np.int64),
        })

    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount", "l_shipdate"])
    with _shuffle_scaled(n_rows * 32):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby(["supp_nid", "cust_nid"])
            .aggregate(Sum("cents", alias_name="cents"),
                       Sum("n_lines", alias_name="n_lines"))
            .map_batches(finish, batch_format="pandas")
        )


def q_rolling_avg_user_value(sf_dir: str):
    """Bounded-preceding window aggregate (ROWS 6 PRECEDING): each
    event's 7-row rolling average of value over the SAME user's
    history ordered by (ts, event_id). ONE user-hash exchange (the
    asof-join partitioning assumption: a user's history fits its
    partition); inside each bucket the window is a vectorized
    segment-reset cumsum — no per-user loop, no per-row window scan.
    Values ride as exact 2-decimal cents, and the emitted average is
    the identical (cents/100)/count double expression the oracle
    computes, so the floats match bit-for-bit."""
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)
    win = 7

    def tag(t: pa.Table) -> pa.Table:
        cents = _round_half_up(
            t["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = t.append_column("cents", pa.array(cents))
        return _append_user_part(t.select(
            ["event_id", "user_id", "ts", "cents"]), parts)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "rolling_avg": pd.Series([], dtype=np.float64)})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.zeros(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = u[1:] != u[:-1]
        start = np.maximum.accumulate(np.where(seg_start, idx, 0))
        lo = np.maximum(start, idx - (win - 1))
        cs = np.concatenate([[0], np.cumsum(c)])
        wsum = cs[idx + 1] - cs[lo]
        cnt = idx - lo + 1
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "rolling_avg": (wsum / 100.0) / cnt,
        })

    return (
        _tbl(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(roll, batch_format="pandas")
    )


def q_ntile_docs(sf_dir: str):
    """NTILE(4) over a global order — composes directly on the
    global-rank operator (q_global_rank_docs: two-pass histogram
    offsets, no distributed sort): quartile boundaries are pure
    integer arithmetic on the exact rank, computed map-side. First
    N % 4 quartiles take ceil(N/4) rows — SQL NTILE semantics."""
    n = _tbl_rows(sf_dir, "documents")
    k = 4
    base, rem = divmod(n, k)

    def quartile(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False) - 1  # 0-based
        big = (base + 1) * rem
        q = np.where(r < big,
                     r // max(base + 1, 1),
                     rem + (r - big) // max(base, 1))
        return pa.table({"doc_id": t["doc_id"],
                         "quartile": pa.array(q + 1, type=pa.int64())})

    return q_global_rank_docs(sf_dir).map_batches(
        quartile, batch_format="pyarrow")


def q_forecast_revenue(sf_dir: str):
    """Filter + global scalar sum (TPC-H Q6 shape): 1997 revenue that
    WOULD have been earned without mid-band discounts —
    sum(extendedprice * discount) over quantity < 24 rows discounted
    4-6%. Purely map-only: each batch folds to one int64 cents partial
    and a trivially small merge emits the scalar; nothing shuffles.
    Discount bounds compare the SAME stored double against the SAME
    literal in both engines, and the summand rides as exact cents
    (round(ext*disc*100)), so the result is bit-identical on any
    partitioning."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1998-01-01")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = (disc >= 0.04) & (disc <= 0.06) & (qty < 24.0)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        cents = _round_half_up(ext * disc[m] * 100.0, 0).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())],
                                           type=pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        total = pc.sum(t["cents"]).as_py() or 0
        return pa.table({"revenue": pa.array([total / 100.0],
                                             type=pa.float64())})

    return (
        _tbl(sf_dir, "lineitem",
             ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    )


def q_market_share(sf_dir: str):
    """Per-year market-share ratio through a two-sided dimension star
    (TPC-H Q8 shape): NATION_7 suppliers' share of ASIA customers'
    1996-1997 ECONOMY-part revenue, per order year. Three broadcasts
    (part-eligibility bitmap, suppkey→is-NATION_7, custkey→in-ASIA via
    the composed nation→region chain) keep both fact scans map-only;
    the ONLY exchange is the lineitem↔orders orderkey co-partition
    (nation_trade_matrix's marker-row union), and each bucket collapses
    to ≤ |years| rows before the final year groupby. Numerator and
    denominator ride as exact integer cents so the final int/int
    round(.,4) matches DuckDB bit-for-bit."""
    lo, hi = _ts_us("1996-01-01"), _ts_us("1998-01-01")
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    pk, (ptype,) = _part_lookup(sf_dir, ["p_type"])
    elig = np.sort(pk[ptype.astype(str) == "ECONOMY"])
    sup = _tbl(sf_dir, "supplier",
               ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    nat = {int(r["n_nationkey"]): (r["n_name"], int(r["n_regionkey"]))
           for r in _tbl(sf_dir, "nation").take_all()}
    reg = {int(r["r_regionkey"]): r["r_name"]
           for r in _tbl(sf_dir, "region").take_all()}
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    s_is_n7 = np.array([nat[int(n)][0] == "NATION_7"
                        for n in sup["s_nationkey"]], dtype=bool)
    cust = _tbl(sf_dir, "customer",
                ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    c_in_asia = np.array([reg[nat[int(n)][1]] == "ASIA"
                          for n in cust["c_nationkey"]], dtype=bool)
    ref = ray.put((elig, skeys, s_is_n7, ckeys, c_in_asia))

    def tag_orders(t: pa.Table) -> pa.Table:
        _, _, _, ck_s, ca_s = _bget_slot("market_share", ref)
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        m = ca_s[np.searchsorted(ck_s, ck)]
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)[m]
        yr = (t["o_orderdate"].to_numpy(zero_copy_only=False)[m]
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "o_year": pa.array(yr, type=pa.int64()),
            "n7_cents": pa.array(np.full(len(k), -1, dtype=np.int64)),
            "cents": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        elig_s, sk_s, n7_s, _, _ = _bget_slot("market_share", ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(elig_s):
            idx = np.searchsorted(elig_s, k)
            np.minimum(idx, len(elig_s) - 1, out=idx)
            m = elig_s[idx] == k
        else:
            m = np.zeros(len(k), dtype=bool)
        t = t.filter(pa.array(m))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = _rev_cents(t)
        n7 = n7_s[np.searchsorted(
            sk_s, t["l_suppkey"].to_numpy(zero_copy_only=False))]
        g = pd.DataFrame({"okey": ok,
                          "n7_cents": np.where(n7, cents, 0),
                          "cents": cents})
        g = g.groupby("okey", as_index=False).sum()
        g["part"] = (g["okey"] % parts).astype(np.int64)
        g["o_year"] = np.int64(0)
        return _arrow_out(g[["part", "okey", "o_year", "n7_cents", "cents"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_year": pd.Series([], dtype=np.int64),
            "n7_cents": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64)})
        o = df[df["n7_cents"] < 0]
        li = df[df["n7_cents"] >= 0]
        if o.empty or li.empty:
            return empty
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, oyr = ok[order_], o["o_year"].to_numpy(np.int64)[order_]
        k = li["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        g = pd.DataFrame({
            "o_year": oyr[idx[hit]],
            "n7_cents": li["n7_cents"].to_numpy(np.int64)[hit],
            "cents": li["cents"].to_numpy(np.int64)[hit],
        }).groupby("o_year", as_index=False).sum()
        return g.astype({"n7_cents": np.int64, "cents": np.int64})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_year": df["o_year"].astype(np.int64),
            "mkt_share": _round_half_up(
                df["n7_cents"].to_numpy(np.float64)
                / df["cents"].to_numpy(np.float64), 4),
        })

    orders = _tbl(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"])
    with _shuffle_scaled(n_rows * 24):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("o_year")
            .aggregate(Sum("n7_cents", alias_name="n7_cents"),
                       Sum("cents", alias_name="cents"))
            .map_batches(finish, batch_format="pandas")
        )


def q_product_profit(sf_dir: str):
    """Profit rollup by (supplier nation, order year) over a
    name-filtered part family (TPC-H Q9 shape, part retailprice × 20%
    standing in for the missing partsupp supplycost): profit =
    extendedprice*(1-discount) − retailprice*quantity*0.2 for parts
    named 'red …'. Part (eligibility + retail price) and supplier
    (nation) broadcast; the orderkey co-partition attaches the order
    year exactly as in q_market_share; per-batch (okey, nation)
    combines bound what the exchange carries. Profit is ONE pointwise
    double expression rounded to cents — identical in numpy and
    DuckDB — so partial sums match bit-for-bit."""
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    pk, (pname, pretail) = _part_lookup(sf_dir, ["p_name", "p_retailprice"])
    is_red = np.array([str(s).startswith("red") for s in pname], dtype=bool)
    elig = pk[is_red]
    retail = pretail.astype(np.float64)[is_red]
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}
    sup = _tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snat = sup["s_nationkey"].to_numpy(np.int64)
    ref = ray.put((elig, retail, skeys, snat))

    def tag_orders(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        yr = (t["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "nid": pa.array(yr, type=pa.int64()),
            "cents": pa.array(np.full(len(k), 1, dtype=np.int64)),
            "is_order": pa.array(np.ones(len(k), dtype=np.int64)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        elig_s, retail_s, sk_s, sn_s = _bget_slot("product_profit", ref)
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(elig_s):
            idx = np.searchsorted(elig_s, k)
            np.minimum(idx, len(elig_s) - 1, out=idx)
            m = elig_s[idx] == k
        else:
            idx = np.zeros(len(k), dtype=np.int64)
            m = np.zeros(len(k), dtype=bool)
        t2 = t.filter(pa.array(m))
        ext = t2["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t2["l_discount"].to_numpy(zero_copy_only=False)
        qty = t2["l_quantity"].to_numpy(zero_copy_only=False)
        amount = ext * (1.0 - disc) - retail_s[idx[m]] * qty * 0.2
        cents = _round_half_up(amount * 100.0, 0).astype(np.int64)
        ok = t2["l_orderkey"].to_numpy(zero_copy_only=False)
        sn = sn_s[np.searchsorted(
            sk_s, t2["l_suppkey"].to_numpy(zero_copy_only=False))]
        g = pd.DataFrame({"okey": ok, "nid": sn, "cents": cents})
        g = g.groupby(["okey", "nid"], as_index=False).sum()
        g["part"] = (g["okey"] % parts).astype(np.int64)
        g["is_order"] = np.int64(0)
        return _arrow_out(g[["part", "okey", "nid", "cents", "is_order"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "nid": pd.Series([], dtype=np.int64),
            "o_year": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64)})
        o = df[df["is_order"] == 1]
        li = df[df["is_order"] == 0]
        if o.empty or li.empty:
            return empty
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, oyr = ok[order_], o["nid"].to_numpy(np.int64)[order_]
        k = li["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        g = pd.DataFrame({
            "nid": li["nid"].to_numpy(np.int64)[hit],
            "o_year": oyr[idx[hit]],
            "cents": li["cents"].to_numpy(np.int64)[hit],
        }).groupby(["nid", "o_year"], as_index=False).sum()
        return g.astype({"cents": np.int64})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": df["nid"].map(nat).astype(str),
            "o_year": df["o_year"].astype(np.int64),
            "sum_profit": df["cents"].to_numpy(np.int64) / 100.0,
        })

    orders = _tbl(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                  "l_extendedprice", "l_discount"])
    with _shuffle_scaled(n_rows * 24):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby(["nid", "o_year"])
            .aggregate(Sum("cents", alias_name="cents"))
            .map_batches(finish, batch_format="pandas")
        )


def q_returned_item_report(sf_dir: str):
    """Returned-item revenue top-k (TPC-H Q10 shape): the 20 customers
    losing the most Q1-1997 revenue to returns ('R' lineitems joined
    to the quarter's orders), with name and nation attached AFTER the
    limit via a key-pruned point read (top_customers_by_spend's
    attach-after-limit pattern — the customer dimension is never
    broadcast or collected). The orderkey co-partition joins the two
    filtered facts; per-bucket (custkey, cents) partials make the
    custkey groupby exchange return-rate-bounded."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1997-04-01")
    n_rows = _tbl_rows(sf_dir, "lineitem") + _tbl_rows(sf_dir, "orders")
    parts = _copart_count(n_rows)
    cust_path = os.path.join(sf_dir, "customer.parquet")
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}

    def tag_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(k % parts, type=pa.int64()),
            "okey": pa.array(k),
            "ckey": pa.array(t["o_custkey"].to_numpy(zero_copy_only=False)),
            "cents": pa.array(np.full(len(k), -1, dtype=np.int64)),
        })

    def tag_items(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"okey": k, "cents": _rev_cents(t)})
        g = g.groupby("okey", as_index=False).sum()
        g["part"] = (g["okey"] % parts).astype(np.int64)
        g["ckey"] = np.int64(-1)
        return _arrow_out(g[["part", "okey", "ckey", "cents"]])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype=np.int64),
            "cents": pd.Series([], dtype=np.int64)})
        o = df[df["cents"] < 0]
        li = df[df["cents"] >= 0]
        if o.empty or li.empty:
            return empty
        ok = o["okey"].to_numpy(np.int64)
        order_ = np.argsort(ok, kind="stable")
        ok, ock = ok[order_], o["ckey"].to_numpy(np.int64)[order_]
        k = li["okey"].to_numpy(np.int64)
        idx = np.searchsorted(ok, k)
        np.minimum(idx, max(len(ok) - 1, 0), out=idx)
        hit = ok[idx] == k
        if not hit.any():
            return empty
        g = pd.DataFrame({
            "c_custkey": ock[idx[hit]],
            "cents": li["cents"].to_numpy(np.int64)[hit],
        }).groupby("c_custkey", as_index=False).sum()
        return g.astype({"cents": np.int64})

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        keys = [int(k) for k in df["c_custkey"]]
        t = papq.read_table(cust_path,
                            columns=["c_custkey", "c_name", "c_nationkey"],
                            filters=[("c_custkey", "in", keys)])
        name = dict(zip(t["c_custkey"].to_pylist(), t["c_name"].to_pylist()))
        cn = dict(zip(t["c_custkey"].to_pylist(),
                      t["c_nationkey"].to_pylist()))
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype(np.int64),
            "c_name": df["c_custkey"].map(name).astype(str),
            "revenue": df["cents"].to_numpy(np.int64) / 100.0,
            "n_name": df["c_custkey"].map(
                lambda k: nat[int(cn[int(k)])]).astype(str),
        })

    orders = _tbl(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"])
    items = _tbl(sf_dir, "lineitem",
                 ["l_orderkey", "l_returnflag",
                  "l_extendedprice", "l_discount"])
    with _shuffle_scaled(n_rows * 16):
        return (
            items.map_batches(tag_items, batch_format="pyarrow")
            .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(per_bucket, batch_format="pandas")
            .groupby("c_custkey")
            .aggregate(Sum("cents", alias_name="cents"))
            .sort(["cents", "c_custkey"], descending=[True, False])
            .limit(20)
            .map_batches(attach, batch_format="pandas", batch_size=1 << 30)
        )


def q_important_parts(sf_dir: str):
    """Group sum vs a global-total scalar (TPC-H Q11 shape, lineitem
    revenue from NATION_3's suppliers standing in for the missing
    partsupp value): parts whose revenue share exceeds 0.1% of the
    nation's total. The supplier-nation bitmap broadcasts; one
    partkey groupby over per-batch combined partials yields the
    dimension-bounded per-part table, which MATERIALIZES (one row per
    part — safe at any fact scale) so the global total and the filter
    reuse the same pass instead of re-executing the groupby. The
    share test compares integers (cents*1000 > total_cents) — no
    float boundary."""
    sup = _tbl(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = {int(r["n_nationkey"]): r["n_name"]
           for r in _tbl(sf_dir, "nation").take_all()}
    elig = np.sort(sup["s_suppkey"].to_numpy(np.int64)[
        np.array([nat[int(n)] == "NATION_3"
                  for n in sup["s_nationkey"]], dtype=bool)])
    ref = ray.put(elig)

    def partial(t: pa.Table) -> pa.Table:
        elig_s = _bget_slot("important_parts", ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(elig_s):
            idx = np.searchsorted(elig_s, sk)
            np.minimum(idx, len(elig_s) - 1, out=idx)
            m = elig_s[idx] == sk
        else:
            m = np.zeros(len(sk), dtype=bool)
        t = t.filter(pa.array(m))
        g = pd.DataFrame({"p_partkey": t["l_partkey"].to_numpy(
            zero_copy_only=False), "cents": _rev_cents(t)})
        return _arrow_out(g.groupby("p_partkey", as_index=False).sum())

    grouped = (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_partkey")
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()
    )
    total = sum(r["cents"] for r in
                grouped.map_batches(
                    lambda t: pa.table(
                        {"cents": [pc.sum(t["cents"]).as_py() or 0]}),
                    batch_format="pyarrow").take_all())

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["cents"].to_numpy(np.int64) * 1000 > total]
        return pd.DataFrame({
            "p_partkey": df["p_partkey"].astype(np.int64),
            "value": df["cents"].to_numpy(np.int64) / 100.0,
        })

    return grouped.map_batches(keep, batch_format="pandas")


def q_promo_suppliers(sf_dir: str):
    """HAVING semi-join (TPC-H Q20 shape): suppliers who shipped more
    than 300 units of 'red …' parts during 1997 — the candidates a
    promotion would source from. The part-eligibility bitmap
    broadcasts; quantities combine per batch to (suppkey, qty int)
    partials so the suppkey groupby is supplier-dimension-bounded;
    the HAVING filter and the name attach run on that tiny grouped
    set (supplier broadcast). Quantities are integer-valued doubles
    summed as int64 — exact on any partitioning."""
    lo, hi = _ts_us("1997-01-01"), _ts_us("1998-01-01")
    pk, (pname,) = _part_lookup(sf_dir, ["p_name"])
    elig = np.sort(pk[np.array([str(s).startswith("red")
                                for s in pname], dtype=bool)])
    sup = _tbl(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sup = sup.sort_values("s_suppkey")
    skeys = sup["s_suppkey"].to_numpy(np.int64)
    snames = sup["s_name"].to_numpy()
    ref = ray.put(elig)

    def partial(t: pa.Table) -> pa.Table:
        elig_s = _bget_slot("promo_suppliers", ref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        k = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(elig_s):
            idx = np.searchsorted(elig_s, k)
            np.minimum(idx, len(elig_s) - 1, out=idx)
            m = elig_s[idx] == k
        else:
            m = np.zeros(len(k), dtype=bool)
        g = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False)[m],
            "qty": t["l_quantity"].to_numpy(
                zero_copy_only=False)[m].astype(np.int64)})
        return _arrow_out(g.groupby("s_suppkey", as_index=False).sum())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["qty"].to_numpy(np.int64) > 300]
        if df.empty:
            return pd.DataFrame({
                "s_suppkey": pd.Series([], dtype=np.int64),
                "s_name": pd.Series([], dtype=str),
                "total_qty": pd.Series([], dtype=np.int64)})
        sk = df["s_suppkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "s_suppkey": sk,
            "s_name": snames[np.searchsorted(skeys, sk)].astype(str),
            "total_qty": df["qty"].to_numpy(np.int64),
        })

    return (
        _tbl(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("qty", alias_name="qty"))
        .map_batches(finish, batch_format="pandas")
    )


_MERGE_CUTOFF = "2024-01-21"


def q_merge_upsert_users(sf_dir: str):
    """CDC MERGE-INTO (upsert) shape: a per-user latest-row snapshot
    (events before the cutoff) merged with a change stream (events at
    or after it) — matched keys take the newer row and report
    'updated', stream-only keys 'inserted', snapshot-only keys
    'unchanged'. Both sides pre-combine per batch to ONE latest row
    per user (lexmax on (ts, event_id) — order-free), so the single
    user-hash exchange carries user-bounded rows, and the per-bucket
    merge is a vectorized lexsort + run-tail pick, no per-user loop.
    This is the write-side idempotency shape of the crawl sink
    (sources/db_sink.py upsert grammar) expressed as a query."""
    cut = _ts_us(_MERGE_CUTOFF)
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def latest_partial(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less(t["ts"], cut) if side == 0
                         else pc.greater_equal(t["ts"], cut))
            u = t["user_id"].to_numpy(zero_copy_only=False)
            ev = t["event_id"].to_numpy(zero_copy_only=False)
            ts = _dt_i64(t["ts"])
            order_ = np.lexsort((ev, ts, u))
            u, ev, ts = u[order_], ev[order_], ts[order_]
            last = np.ones(len(u), dtype=bool)
            last[:-1] = u[1:] != u[:-1]
            return pa.table({
                "part": pa.array(u[last] % parts, type=pa.int64()),
                "user_id": pa.array(u[last]),
                "event_id": pa.array(ev[last]),
                "ts_us": pa.array(ts[last]),
                "side": pa.array(np.full(int(last.sum()), side,
                                         dtype=np.int64)),
            })
        return fn

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "event_id": pd.Series([], dtype=np.int64),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "status": pd.Series([], dtype=str)})
        u = df["user_id"].to_numpy(np.int64)
        ev = df["event_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        side = df["side"].to_numpy(np.int64)
        order_ = np.lexsort((ev, ts, u))
        u, ev, ts, side = u[order_], ev[order_], ts[order_], side[order_]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        has = np.zeros((len(starts), 2), dtype=bool)
        grp = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(u)]))
        has[grp, side] = True
        status = np.where(has[:, 0] & has[:, 1], "updated",
                          np.where(has[:, 1], "inserted", "unchanged"))
        return pd.DataFrame({
            "user_id": u[last],
            "event_id": ev[last],
            "ts": ts[last].astype("datetime64[us]"),
            "status": status.astype(str),
        })

    ev_cols = ["event_id", "user_id", "ts"]
    base = _tbl(sf_dir, "events", ev_cols).map_batches(
        latest_partial(0), batch_format="pyarrow")
    delta = _tbl(sf_dir, "events", ev_cols).map_batches(
        latest_partial(1), batch_format="pyarrow")
    return (
        base.union(delta)
        .groupby("part", num_partitions=parts)
        .map_groups(merge, batch_format="pandas")
    )


def q_pareto_customers(sf_dir: str):
    """2-D skyline (Pareto frontier): customers not dominated on
    (total spend, order count) — no other customer ≥ on both with one
    strict. Uses the skyline reduction identity skyline(S) ⊆
    ∪ skyline(block): per-batch local skylines over the grouped
    metrics survive every global-frontier point, so ONE tiny coalesced
    task computes the exact frontier from block-frontier survivors —
    the fact table is never collected, and the final task's input is
    bounded by Σ per-block frontier sizes, not N. Spend rides as
    exact integer cents; the frontier test is pure integer compares.
    The per-customer totals combine through a COARSE custkey-hash
    co-partition with bucket-local pandas sums — Dataset.aggregate's
    sort path measured 65.9 s at 125k distinct customers on the 5M-row
    joinstress tables where the coarse-bucket combine takes ~4 s (the
    same high-cardinality-groupby idiom as the co-purchase/DF/vocab
    family)."""
    parts = _copart_count(_tbl_rows(sf_dir, "orders"))

    def spend_partial(df: pd.DataFrame):
        cents = _round_half_up(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        g = pd.DataFrame({"c_custkey": df["o_custkey"].to_numpy(np.int64),
                          "cents": cents,
                          "n": np.ones(len(df), dtype=np.int64)})
        g = g.groupby("c_custkey", as_index=False).sum()
        g["part"] = g["c_custkey"].to_numpy(np.int64) % parts
        return _arrow_out(g)

    def _skyline(ck: np.ndarray, s: np.ndarray, n: np.ndarray):
        """Exact 2-D frontier: at each distinct spend level (desc) only
        the level's max-n points can survive, and a level survives iff
        its max n strictly exceeds every higher-spend level's."""
        order_ = np.lexsort((ck, -n, -s))
        ck, s, n = ck[order_], s[order_], n[order_]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        lvl_max = n[starts]  # sorted -n within level → first is max
        run_prev = np.r_[np.iinfo(np.int64).min,
                         np.maximum.accumulate(lvl_max)[:-1]]
        lvl_keep = lvl_max > run_prev
        grp = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(s)]))
        keep = lvl_keep[grp] & (n == lvl_max[grp])
        return ck[keep], s[keep], n[keep]

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_custkey", as_index=False)[["cents", "n"]].sum()
        ck, s, n = _skyline(g["c_custkey"].to_numpy(np.int64),
                            g["cents"].to_numpy(np.int64),
                            g["n"].to_numpy(np.int64))
        return _arrow_out(pd.DataFrame({"c_custkey": ck, "cents": s,
                                        "n": n}))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        ck, s, n = _skyline(df["c_custkey"].to_numpy(np.int64),
                            df["cents"].to_numpy(np.int64),
                            df["n"].to_numpy(np.int64))
        return pd.DataFrame({
            "c_custkey": ck,
            "total_spend": s / 100.0,
            "n_orders": n,
        })

    return (
        _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(spend_partial, batch_format="pandas")
        .groupby("part", num_partitions=parts)
        .map_groups(local_skyline, batch_format="pandas")
        .map_batches(final, batch_format="pandas", batch_size=1 << 30)
    )


def _copurchase_tag(parts_n: int):
    """The co-purchase family's shared orderkey co-partition tagger —
    ONE closure builder so ``_copurchase_edges`` and
    ``q_copurchase_jaccard`` cannot drift on the partition contract
    (an order's rows land in one bucket)."""

    def tag(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(k % parts_n, type=pa.int64()),
            "okey": pa.array(k),
            "pkey": pa.array(t["l_partkey"].to_numpy(
                zero_copy_only=False)),
        })

    return tag


def _distinct_order_part(df: pd.DataFrame) -> tuple[np.ndarray,
                                                    np.ndarray]:
    """Bucket-global distinct (okey, pkey) arrays — vectorized lexsort
    + run mask, shared by the pair kernel and the degree kernel
    (globally exact because the tagger co-partitions by order)."""
    ok = df["okey"].to_numpy(np.int64)
    pk = df["pkey"].to_numpy(np.int64)
    order_ = np.lexsort((pk, ok))
    ok, pk = ok[order_], pk[order_]
    uniq = np.ones(len(ok), dtype=bool)
    uniq[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
    return ok[uniq], pk[uniq]


def _copurchase_edges(sf_dir: str, min_support: int = 2):
    """Market-basket pair mining kernel shared by ``part_copurchase``
    and the graph ops built on its edge list (``triangle_count``,
    ``bfs_reach``): part pairs bought together in ≥ ``min_support``
    orders. ONE orderkey co-partition; inside each bucket the
    (order, part) rows dedup vectorized (lexsort + run mask) and pair
    expansion batches the orders BY BASKET SIZE — one triu gather per
    distinct size, no per-order Python — so the fan-out is bounded by
    max-basket-size² per row. Pair counts pre-combine per bucket,
    then the pair exchange is a COARSE hash co-partition with a
    bucket-local pandas sum — NOT Dataset.aggregate, whose sort-based
    path costs ~50 s at ~100k distinct groups where the coarse-bucket
    combine takes ~3 s (the same high-cardinality-groupby idiom as
    the DF/vocab family). The frequent-pair output is
    support-bounded, never materializing the pair space."""
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"))
    tag = _copurchase_tag(parts)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "pair": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "ppart": pd.Series([], dtype=np.int64)})
        ok, pk = _distinct_order_part(df)
        starts, ends = _key_runs(ok)
        lens = ends - starts
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2:
                continue
            st = starts[lens == m]
            mat = pk[st[:, None] + np.arange(m)]
            iu, ju = np.triu_indices(int(m), k=1)
            out_a.append(mat[:, iu].ravel())
            out_b.append(mat[:, ju].ravel())
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # pack the pair into ONE int64 (partkeys < 2^31) so the
        # per-bucket combine and the exchange key stay single-column
        g = pd.DataFrame({"pair": (a << np.int64(32)) | b,
                          "n_orders": np.int64(1)})
        g = g.groupby("pair", as_index=False).sum()
        g["ppart"] = (g["pair"] % parts).astype(np.int64)
        return g

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pair", as_index=False)["n_orders"].sum()
        g = g[g["n_orders"].to_numpy(np.int64) >= min_support]
        pair = g["pair"].to_numpy(np.int64)
        return pd.DataFrame({
            "part_a": pair >> np.int64(32),
            "part_b": pair & np.int64(0xFFFFFFFF),
            "n_orders": g["n_orders"].to_numpy(np.int64),
        })

    return (
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("ppart", num_partitions=parts)
        .map_groups(pair_bucket, batch_format="pandas")
    )


def q_part_copurchase(sf_dir: str):
    """Frequent co-purchase pairs (support ≥ 2) — the catalog surface
    of the shared ``_copurchase_edges`` mining kernel."""
    return _copurchase_edges(sf_dir)


# Wedge-volume ceiling for the single-task triangle path: ~10M packed
# int64 wedges ≈ 240 MB transient in one worker. Above it (or above
# the CC edge limit) the distributed wedge exchange runs instead.
_TRI_LOCAL_WEDGE_LIMIT = int(os.environ.get("JCR_TRI_LOCAL_WEDGE_LIMIT",
                                            "10000000"))


@ray.remote
def _tri_local_task(*tables: pa.Table) -> pa.Table:
    """Single-task degree-ordered triangle count over materialized
    (part_a, part_b) edge blocks — the bounded-size dispatch twin of
    ``_cc_local_task``/``_bfs_local_task``: same orientation + wedge
    expansion + packed-key membership test as the distributed path,
    minus its two small-data AllToAll exchanges (each ~10 s of fixed
    floor at 32 CPUs on graphs whose real work is milliseconds)."""
    tabs = _nonempty_arrow(tables)
    if not tabs:
        return pa.table({"n_triangles": pa.array([0], type=pa.int64())})
    edges = pa.concat_tables(tabs)
    a = edges["part_a"].to_numpy(zero_copy_only=False)
    b = edges["part_b"].to_numpy(zero_copy_only=False)
    nodes, cnt = np.unique(np.concatenate([a, b]), return_counts=True)
    rank_a = (cnt[np.searchsorted(nodes, a)] << np.int64(32)) | a
    rank_b = (cnt[np.searchsorted(nodes, b)] << np.int64(32)) | b
    swap = rank_a > rank_b
    src = np.where(swap, b, a)
    dst = np.where(swap, a, b)
    rk = np.where(swap, rank_a, rank_b)  # rank of dst
    order = np.lexsort((rk, src))
    src, dst = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    lens = np.diff(np.r_[starts, len(src)])
    packs = []
    for m in np.unique(lens):
        if m < 2:
            continue
        st = starts[lens == m]
        mat = dst[st[:, None] + np.arange(m)]
        iu, ju = np.triu_indices(int(m), k=1)
        packs.append((mat[:, iu].ravel() << np.int64(32))
                     | mat[:, ju].ravel())
    if not packs:
        return pa.table({"n_triangles": pa.array([0], type=pa.int64())})
    wedge = np.concatenate(packs)
    epack = np.sort((src << np.int64(32)) | dst)
    idx = np.searchsorted(epack, wedge)
    np.minimum(idx, len(epack) - 1, out=idx)
    n_tri = int((epack[idx] == wedge).sum())
    return pa.table({"n_triangles": pa.array([n_tri], type=pa.int64())})


def q_triangle_count(sf_dir: str):
    """Distributed triangle counting over the support≥2 co-purchase
    graph (nodes = parts, edges = ``_copurchase_edges``): the
    degree-ordered wedge-check algorithm. Every edge orients from the
    lower-(degree, node) endpoint to the higher, capping any node's
    out-degree at O(sqrt(m)) so total wedge volume is O(m^1.5)
    regardless of hub skew. SIZE-DISPATCHED: when both the edge count
    and the wedge-volume bound Σ C(min(deg, √2m), 2) fit one worker,
    a single remote numpy task (``_tri_local_task``) does the whole
    count; above, wedges and oriented edges meet in a COARSE hash
    co-partition of the packed (v, w) key and match per bucket,
    ending in a scalar sum. Node degrees broadcast via ``ray.put`` —
    the node set is the part DIMENSION (bounded far below lineitem
    scale; the co-partitioned degree join is the swap-in if the node
    table ever outgrows a broadcast). The edge list is materialized
    once (support-bounded pair output, the same boundedness argument
    as the minhash pair family) because two downstream stages consume
    it."""
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"))
    edges = _copurchase_edges(sf_dir).materialize()

    # degrees: per-batch value_counts partials over both endpoints,
    # combined in one part-dimension-bounded task
    def deg_partial(t: pa.Table) -> pa.Table:
        n = np.concatenate([t["part_a"].to_numpy(zero_copy_only=False),
                            t["part_b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, type=pa.int64()),
                         "deg": pa.array(c, type=pa.int64())})

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False)["deg"].sum()
        return g.astype(np.int64)

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .map_batches(deg_final, batch_format="pandas",
                        batch_size=1 << 30).to_pandas())
    nodes = deg["node"].to_numpy(np.int64)
    degs = deg["deg"].to_numpy(np.int64)

    m_edges = edges.count()
    cap = int(np.sqrt(2.0 * max(m_edges, 1))) + 1
    wedge_bound = float(
        (np.minimum(degs, cap).astype(np.float64) ** 2).sum()) / 2.0
    if m_edges <= _CC_LOCAL_EDGE_LIMIT and \
            wedge_bound <= _TRI_LOCAL_WEDGE_LIMIT:
        return rd.from_arrow_refs(
            [_tri_local_task.remote(*edges.to_arrow_refs())])

    ref = ray.put((nodes, degs))

    def rank_of(keys: np.ndarray) -> np.ndarray:
        """Total-order rank key (deg, node) packed into one int64 —
        strict because node ids are distinct."""
        nds, dgs = _bget_slot("triangle_count", ref)
        d = dgs[np.searchsorted(nds, keys)]
        return (d << np.int64(32)) | keys

    def orient(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        swap = rank_of(a) > rank_of(b)
        src = np.where(swap, b, a)
        dst = np.where(swap, a, b)
        return pa.table({
            "part": pa.array(src % parts, type=pa.int64()),
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        })

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        """Per src-bucket: sort out-neighbors by rank inside each src
        run, expand rank-ordered neighbor pairs batched by out-degree
        (one triu gather per distinct size — no per-node Python)."""
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        rk = rank_of(dst)
        order_ = np.lexsort((rk, src))
        src, dst = src[order_], dst[order_]
        starts, ends = _key_runs(src)
        lens = ends - starts
        packs = []
        for m in np.unique(lens):
            if m < 2:
                continue
            st = starts[lens == m]
            mat = dst[st[:, None] + np.arange(m)]
            iu, ju = np.triu_indices(int(m), k=1)
            packs.append((mat[:, iu].ravel() << np.int64(32))
                         | mat[:, ju].ravel())
        if not packs:
            return _arrow_out(pd.DataFrame(
                {"pack": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "is_edge": pd.Series([], dtype=bool),
                 "ppart": pd.Series([], dtype=np.int64)}))
        p = np.concatenate(packs)
        g = pd.DataFrame({"pack": p, "n": np.int64(1)}).groupby(
            "pack", as_index=False).sum()
        g["is_edge"] = False
        g["ppart"] = (g["pack"].to_numpy(np.int64) % parts)
        return _arrow_out(g)

    def edge_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        pk = (s << np.int64(32)) | d
        return pa.table({
            "pack": pa.array(pk, type=pa.int64()),
            "n": pa.array(np.zeros(len(pk), dtype=np.int64)),
            "is_edge": pa.array(np.ones(len(pk), dtype=bool)),
            "ppart": pa.array(pk % parts, type=pa.int64()),
        })

    def match_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["is_edge"], "pack"].to_numpy(np.int64)
        w = df.loc[~df["is_edge"]]
        hit = np.isin(w["pack"].to_numpy(np.int64), e)
        return pd.DataFrame({"n_triangles": [
            np.int64(w["n"].to_numpy(np.int64)[hit].sum())]})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_triangles": [
            np.int64(df["n_triangles"].to_numpy(np.int64).sum())]})

    oriented = edges.map_batches(orient, batch_format="pyarrow")
    wedge_ds = (oriented.groupby("part", num_partitions=parts)
                .map_groups(wedges, batch_format="pandas"))
    return (
        wedge_ds.union(oriented.map_batches(edge_rows,
                                            batch_format="pyarrow"))
        .groupby("ppart", num_partitions=parts)
        .map_groups(match_bucket, batch_format="pandas")
        .map_batches(total, batch_format="pandas", batch_size=1 << 30)
    )


@ray.remote
def _bfs_local_task(max_hop: int, *tables: pa.Table) -> pa.Table:
    """Single-task bounded BFS over materialized (part_a, part_b)
    edge blocks: CSR adjacency + fully vectorized frontier expansion
    (repeat/cumsum gather, no per-node Python). The bounded-edge-set
    dispatch twin of ``_cc_local_task`` — below the edge limit the
    3-round Dataset formulation pays ~6 tiny AllToAll exchanges whose
    fixed floor (~10 s each at 32 CPUs) dwarfs the actual work
    (measured 120.7 s → sub-second on the 5M-row joinstress graph)."""
    tabs = _nonempty_arrow(tables)
    if not tabs:
        return pa.table({"part_key": pa.array([], pa.int64()),
                         "hop": pa.array([], pa.int64())})
    edges = pa.concat_tables(tabs)
    a = edges["part_a"].to_numpy(zero_copy_only=False)
    b = edges["part_b"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([a, b]))
    src = np.searchsorted(nodes, np.concatenate([a, b]))
    dst = np.searchsorted(nodes, np.concatenate([b, a]))
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes) + 1))
    hop = np.full(len(nodes), -1, dtype=np.int64)
    hop[0] = 0  # nodes sorted → index 0 IS the min-node seed
    frontier = np.array([0], dtype=np.int64)
    for h in range(1, max_hop + 1):
        cnt = starts[frontier + 1] - starts[frontier]
        total = int(cnt.sum())
        if total == 0:
            break
        base = np.repeat(starts[frontier], cnt)
        off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        nb = dst_s[base + off]
        new = np.unique(nb[hop[nb] < 0])
        if len(new) == 0:
            break
        hop[new] = h
        frontier = new
    keep = hop >= 0
    return pa.table({"part_key": pa.array(nodes[keep], type=pa.int64()),
                     "hop": pa.array(hop[keep], type=pa.int64())})


def q_bfs_reach(sf_dir: str):
    """Bounded BFS (min-hop ≤ 3) from the seed part — the minimum
    node of the support≥2 co-purchase graph. SIZE-DISPATCHED like the
    CC family: at or under ``_CC_LOCAL_EDGE_LIMIT`` edges the whole
    reach solves in one remote numpy task (``_bfs_local_task``) —
    the Dataset round loop's ~6 tiny AllToAll exchanges cost ~2
    orders of magnitude more than the actual work there. Above the
    limit: three SYNCHRONOUS frontier rounds, each two coarse
    co-partitions: (1) frontier and directed adjacency meet on
    src-hash and emit neighbor candidates; (2) candidates and the
    visited set meet on node-hash and only UNSEEN nodes survive as
    the next frontier (so re-expansion work is pruned every round,
    the property that keeps round cost proportional to the frontier,
    not the reach set). Frontier and visited stay Datasets throughout
    — no driver-side node sets; the per-round materialize is
    frontier-bounded, and the round count is the fixed hop budget, so
    blocks cannot compound unboundedly."""
    parts = _copart_count(_tbl_rows(sf_dir, "lineitem"))
    edges = _copurchase_edges(sf_dir).materialize()
    if edges.count() <= _CC_LOCAL_EDGE_LIMIT:
        return rd.from_arrow_refs(
            [_bfs_local_task.remote(3, *edges.to_arrow_refs())])

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "part": pa.array(src % parts, type=pa.int64()),
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
            "is_f": pa.array(np.zeros(len(src), dtype=bool)),
        })

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    seed = int(adj.min("src"))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        f = df.loc[df["is_f"], "src"].to_numpy(np.int64)
        if len(f) == 0:
            return _arrow_out(pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64),
                 "part": pd.Series([], dtype=np.int64),
                 "is_new": pd.Series([], dtype=bool)}))
        e = df.loc[~df["is_f"]]
        m = np.isin(e["src"].to_numpy(np.int64), f)
        nb = np.unique(e["dst"].to_numpy(np.int64)[m])
        return _arrow_out(pd.DataFrame(
            {"node": nb, "part": nb % parts,
             "is_new": np.ones(len(nb), dtype=bool)}))

    def frontier_rows(t: pa.Table) -> pa.Table:
        n = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(n % parts, type=pa.int64()),
            "src": pa.array(n, type=pa.int64()),
            "dst": pa.array(np.full(len(n), -1, dtype=np.int64)),
            "is_f": pa.array(np.ones(len(n), dtype=bool)),
        })

    def prune(hop: int):
        def _prune(df: pd.DataFrame) -> pd.DataFrame:
            seen = df.loc[~df["is_new"], "node"].to_numpy(np.int64)
            new = np.unique(df.loc[df["is_new"], "node"].to_numpy(np.int64))
            new = new[~np.isin(new, seen)]
            return _arrow_out(pd.DataFrame(
                {"node": new, "part": new % parts,
                 "is_new": np.zeros(len(new), dtype=bool),
                 "hop": np.full(len(new), hop, dtype=np.int64)}))
        return _prune

    visited = rd.from_arrow(pa.table({
        "node": pa.array([seed], type=pa.int64()),
        "part": pa.array([seed % parts], type=pa.int64()),
        "is_new": pa.array([False]),
        "hop": pa.array([0], type=pa.int64()),
    }))
    frontier = visited
    for hop in (1, 2, 3):
        cand = (
            adj.union(frontier.map_batches(frontier_rows,
                                           batch_format="pyarrow"))
            .groupby("part", num_partitions=parts)
            .map_groups(expand, batch_format="pandas")
        )
        fresh = (
            cand.union(visited.select_columns(["node", "part", "is_new"]))
            .groupby("part", num_partitions=parts)
            .map_groups(prune(hop), batch_format="pandas")
            .materialize()
        )
        visited = visited.union(fresh).materialize()
        frontier = fresh

    return visited.select_columns(["node", "hop"]).rename_columns(
        {"node": "part_key"})


_KCORE_K = 3


@ray.remote
def _kcore_local_task(k: int, *tables: pa.Table) -> pa.Table:
    """Single-task k-core peel over materialized edge blocks — the
    bounded-size dispatch twin of ``_cc/_bfs/_tri_local_task``:
    vectorized rounds (unique+bincount degrees → drop <k nodes →
    isin-filter edges) to the fixpoint."""
    empty = pa.table({"part_key": pa.array([], type=pa.int64()),
                      "core_degree": pa.array([], type=pa.int64())})
    tabs = _nonempty_arrow(tables)
    if not tabs:
        return empty
    edges = pa.concat_tables(tabs)
    a = edges["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    while a.size:
        nodes, inv = np.unique(np.concatenate([a, b]),
                               return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        bad = nodes[deg < k]
        if bad.size == 0:
            return pa.table({
                "part_key": pa.array(nodes, type=pa.int64()),
                "core_degree": pa.array(deg.astype(np.int64)),
            })
        keep = ~(np.isin(a, bad) | np.isin(b, bad))
        a, b = a[keep], b[keep]
    return empty


def q_kcore_parts(sf_dir: str):
    """k-core decomposition (k=3) of the support≥2 co-purchase graph —
    the density filter a graph pipeline runs before community/embedding
    stages: iteratively peel nodes of degree < k until the fixpoint;
    emit surviving nodes with their in-core degree. SIZE-DISPATCHED
    like the CC/BFS/triangle family: at or under
    ``_CC_LOCAL_EDGE_LIMIT`` edges one remote numpy task peels the
    whole graph; above it, each round is a degree partial combine over
    the (dimension-bounded) node set + a broadcast bad-node filter of
    the edge Dataset — edges shrink monotonically, round count is the
    peel depth (small in practice; each round is map-only over edge
    blocks, no AllToAll)."""
    edges = _copurchase_edges(sf_dir).materialize()
    if edges.count() <= _CC_LOCAL_EDGE_LIMIT:
        return rd.from_arrow_refs(
            [_kcore_local_task.remote(_KCORE_K, *edges.to_arrow_refs())])

    def deg_partial(t: pa.Table) -> pa.Table:
        n = np.concatenate([t["part_a"].to_numpy(zero_copy_only=False),
                            t["part_b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, type=pa.int64()),
                         "deg": pa.array(c, type=pa.int64())})

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["deg"].sum().astype(
            np.int64)

    while True:
        deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
               .map_batches(deg_final, batch_format="pandas",
                            batch_size=1 << 30).to_pandas())
        if len(deg) == 0:
            # empty edge set → empty-schema frame; normalize columns
            deg = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                "deg": pd.Series([], dtype=np.int64)})
            break
        bad = deg.loc[deg["deg"] < _KCORE_K, "node"].to_numpy(np.int64)
        if len(bad) == 0:
            break
        ref = ray.put(np.sort(bad))

        def drop_bad(t: pa.Table, _ref=ref) -> pa.Table:
            # default-arg capture (the PageRank idiom): the closure must
            # pin THIS round's ref even if the loop variable moves
            bd = _bget_slot("kcore_parts", _ref)
            a = t["part_a"].to_numpy(zero_copy_only=False)
            b = t["part_b"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(a, bd) | np.isin(b, bd))
            return t.filter(pa.array(keep))

        edges = edges.map_batches(
            drop_bad, batch_format="pyarrow").materialize()
        if edges.count() == 0:
            deg = deg.iloc[0:0]
            break
    out = deg.sort_values("node").reset_index(drop=True)
    return rd.from_arrow(pa.table({
        "part_key": pa.array(out["node"].to_numpy(np.int64)),
        "core_degree": pa.array(out["deg"].to_numpy(np.int64)),
    }))


def q_kn_continuation(sf_dir: str):
    """Kneser-Ney continuation counts — the LM-smoothing statistic
    N1+(·, w): for each word, how many DISTINCT left contexts precede
    it anywhere in the corpus. Per-batch bigram extraction dedups
    locally, then ONE right-word-hash co-partition makes the
    per-bucket distinct-count exact (all (w1, w) rows for a given w
    land together); top-100 by (n_cont desc, word asc). The shuffle
    moves deduped (w1, w) pairs — never corpus text."""
    P = 16

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        w1, w2 = [], []
        for t in df["text"]:
            w = t.split(" ")
            w1.extend(w[:-1])
            w2.extend(w[1:])
        g = pd.DataFrame({"w1": w1, "w2": w2}).drop_duplicates()
        g["part"] = pd.util.hash_pandas_object(
            g["w2"], index=False).to_numpy(np.uint64) % P
        return g

    def cont(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["w1", "w2"]).groupby("w2")
             .size().reset_index(name="n_cont"))
        g = g.sort_values(["n_cont", "w2"], ascending=[False, True],
                          kind="stable").head(100)
        return pd.DataFrame({"word": g["w2"].astype(str),
                             "n_cont": g["n_cont"].to_numpy(np.int64)})

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_cont", "word"], ascending=[False, True],
                            kind="stable").head(100)
        return df.reset_index(drop=True)

    return (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(pairs, batch_format="pandas")
        .groupby("part", num_partitions=P)
        .map_groups(cont, batch_format="pandas")
        .map_batches(top, batch_format="pandas", batch_size=1 << 30)
    )


def q_decayed_revenue(sf_dir: str):
    """Time-decayed customer value: revenue weighted by a 30-day
    half-life below the corpus watermark. The weight is 0.5^k with
    INTEGER k = days-since // 30 — an exact binary power, so the
    per-row product rounds identically in numpy and the oracle and
    the only float freedom is sum order — pinned by rounding the
    per-customer sum to cents on BOTH sides (``_round_half_up`` = SQL
    ROUND semantics), the same boundary treatment the pricing family
    uses. Watermark via the Arrow partial-max helper; scoring is
    pure map-side; the custkey groupby moves one float per order."""
    maxd = _max_ts(_tbl(sf_dir, "orders", ["o_orderdate"]), "o_orderdate")
    lim = np.datetime64(maxd.to_datetime64(), "us")

    def score(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        k = ((lim - d) // np.timedelta64(1, "D")).astype(np.int64) // 30
        w = np.power(np.float64(0.5), k)
        return pa.table({
            "o_custkey": t["o_custkey"],
            "decayed": pa.array(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * w,
                type=pa.float64()),
        })

    return (
        _tbl(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("decayed", alias_name="decayed"))
        .map_batches(lambda d: d.assign(
            decayed=_round_half_up(d["decayed"], 2)),
            batch_format="pandas")
    )


def q_graph_components(sf_dir: str):
    """Connected components of the support≥2 co-purchase graph as a
    driver-checkable catalog op: the size-dispatched CC kernel
    (single remote numpy task under ``_CC_LOCAL_EDGE_LIMIT``, BSP
    raw-task min-label propagation above — see ``_cc_min_labels``)
    against a DuckDB RECURSIVE-CTE min-label-reachability oracle.
    Output: (part_key, component = component-minimum node id)."""
    edges = _copurchase_edges(sf_dir).map_batches(
        lambda t: pa.table({"id_a": t["part_a"], "id_b": t["part_b"]}),
        batch_format="pyarrow")
    return _cc_min_labels(edges).rename_columns(
        {"node": "part_key", "lab": "component"})


def q_event_paths(sf_dir: str):
    """Per-user ordered journey strings (the ORDER-BY string
    aggregate shape): each user's event types joined in (ts,
    event_id) order plus the event count. ONE user-hash co-partition
    (the cogroup family's documented per-user-locality assumption),
    then a bucket-local lexsort + groupby-join — path length is
    bounded by a user's history, never the table."""
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False, as_index=False).agg(
            path=("event_type", ",".join),
            n_events=("event_type", "size"))
        g["n_events"] = g["n_events"].astype(np.int64)
        return _arrow_out(g[["user_id", "path", "n_events"]])

    return (
        _tbl(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .map_batches(lambda t: _append_user_part(t, parts),
                     batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(paths, batch_format="pandas")
    )


# C4-style duplicate-LINE removal: docs are segmented into consecutive
# _LINE_W-word "lines" (the synthetic corpus has no sentence
# punctuation, so a fixed word window stands in for C4's
# three-sentence span); every occurrence of a line except the globally
# FIRST one (min (doc_id, idx)) is deleted and the doc re-joined.
_LINE_W = 10
# broadcast-vs-cogroup dispatch threshold for the loser (doc_id, idx)
# rows, same convention as _SUBDUP_BCAST_LIMIT
_LINEDUP_BCAST_LIMIT = int(os.environ.get("JCR_LINEDUP_BCAST_LIMIT",
                                          "2000000"))


def _line_hashes(toks: list[str]) -> np.ndarray:
    """63-bit hashes of the consecutive ``_LINE_W``-word chunks of
    ``toks`` (entry ``i`` covers words ``[i*_LINE_W, (i+1)*_LINE_W)``;
    the last chunk may be shorter). Words sha1-hash once through the
    shared ``_word_h64`` cache; full chunks combine as a column-wise
    uint64 polynomial fold (10 numpy ops over ALL full chunks at once,
    no per-chunk Python), the one ragged tail chunk folds scalar.
    Chunk-hash equality stands in for chunk-STRING equality — words
    contain no spaces, so distinct word tuples give distinct joined
    strings; 64-bit collisions are the same accepted risk documented
    for the substring family (the 100 TB remedy is a widened or
    verify-pass hash, not a different shape)."""
    n = len(toks)
    wh = np.fromiter((_word_h64(w) for w in toks),
                     dtype=np.uint64, count=n)
    full = n // _LINE_W
    n_chunks = (n + _LINE_W - 1) // _LINE_W
    acc = np.zeros(n_chunks, dtype=np.uint64)
    if full:
        m = wh[:full * _LINE_W].reshape(full, _LINE_W)
        a = np.zeros(full, dtype=np.uint64)
        for j in range(_LINE_W):
            a = a * _SUB_ROLL_B + m[:, j]
        acc[:full] = a
    if n_chunks > full:  # ragged tail — length-1 array fold so the
        # intended uint64 wraparound stays silent (numpy warns on
        # scalar overflow but not on array overflow)
        t = np.zeros(1, dtype=np.uint64)
        for v in wh[full * _LINE_W:]:
            t = t * _SUB_ROLL_B + v
        acc[full] = t[0]
    return (acc & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)


def q_line_dedup(sf_dir: str):
    """C4-style corpus-wide duplicate-line removal: split every doc
    into consecutive ``_LINE_W``-word lines, keep only the globally
    FIRST occurrence (min (doc_id, idx)) of each distinct line, and
    rewrite each doc from its surviving lines in order. Output per doc
    (all docs): (doc_id, n_lines, removed_lines, text). Detection is
    map-side line hashing (shared cached word sha1s + vectorized
    polynomial fold) into ONE coarse hash partition on the line hash —
    every occurrence of a line lands in the same partition, so the
    global first is locally decidable and only the LOSER (doc_id, idx)
    rows leave the exchange (dup-rate-bounded, not corpus-bounded).
    Losers reach the text by size dispatch exactly like
    ``substring_dedup_rewrite``: broadcast doc-sorted arrays below
    ``_LINEDUP_BCAST_LIMIT``, else a doc_id coarse cogroup so neither
    side lands on the driver. Reference anchor: C4's three-sentence
    dedup (Raffel et al.) re-expressed over the punctuation-free
    synthetic corpus."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _tbl_rows(sf_dir, "documents")
    parts = _SUB_PARTS or int(min(256, max(16, n_docs // 50_000 + 16)))

    def line_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hs: list[np.ndarray] = []
        ds: list[np.ndarray] = []
        xs: list[np.ndarray] = []
        for i, x in zip(ids, t["text"].to_pylist()):
            h = _line_hashes(x.split(" "))
            hs.append(h)
            ds.append(np.full(len(h), i, dtype=np.int64))
            xs.append(np.arange(len(h), dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.int64)
        return pa.table({
            "h": pa.array(h),
            "doc_id": pa.array(np.concatenate(ds) if ds
                               else np.empty(0, np.int64)),
            "idx": pa.array(np.concatenate(xs) if xs
                            else np.empty(0, np.int64)),
            "part": pa.array((h.view(np.uint64) % np.uint64(parts))
                             .astype(np.int64)),
        })

    def losers(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        x = t["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, d, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        lose = order[~first]
        return pa.table({"doc_id": pa.array(d[lose]),
                         "idx": pa.array(x[lose])})

    def rewrite_tbl(ids: np.ndarray, texts: list[str],
                    d_ids: np.ndarray, d_idx: np.ndarray) -> pa.Table:
        outs: list[str] = []
        nls = np.empty(len(texts), dtype=np.int64)
        rms = np.empty(len(texts), dtype=np.int64)
        for k, (i, x) in enumerate(zip(ids, texts)):
            toks = x.split(" ")
            n_chunks = (len(toks) + _LINE_W - 1) // _LINE_W
            lo = np.searchsorted(d_ids, i, "left")
            hi = np.searchsorted(d_ids, i, "right")
            drop = d_idx[lo:hi]
            nls[k] = n_chunks
            rms[k] = hi - lo
            if lo == hi:
                outs.append(x)
                continue
            keep = np.ones(n_chunks, dtype=bool)
            keep[drop] = False
            kept: list[str] = []
            for c in np.nonzero(keep)[0]:
                kept.extend(toks[c * _LINE_W:(c + 1) * _LINE_W])
            outs.append(" ".join(kept))
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "n_lines": pa.array(nls),
            "removed_lines": pa.array(rms),
            "text": pa.array(outs, type=pa.string()),
        })

    with _shuffle_scaled(n_docs * 16 * 32):
        drops = (
            docs.map_batches(line_rows, batch_format="pyarrow")
            .groupby("part", num_partitions=parts)
            .map_groups(losers, batch_format="pyarrow")
        ).materialize()
    ndrop = drops.count()

    if ndrop <= _LINEDUP_BCAST_LIMIT:
        tbls = [t for t in ray.get(drops.to_arrow_refs())
                if t.num_rows > 0]
        if tbls:
            dt = pa.concat_tables(tbls)
            di = dt["doc_id"].to_numpy(zero_copy_only=False)
            dx = dt["idx"].to_numpy(zero_copy_only=False)
            order = np.lexsort((dx, di))
            dref = ray.put((di[order], dx[order]))
        else:
            e = np.empty(0, dtype=np.int64)
            dref = ray.put((e, e))

        def rewrite(t: pa.Table) -> pa.Table:
            d_ids, d_idx = _bget(dref)
            return rewrite_tbl(
                t["doc_id"].to_numpy(zero_copy_only=False),
                t["text"].to_pylist(), d_ids, d_idx)

        return docs.map_batches(rewrite, batch_format="pyarrow")

    def tag_docs(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "idx": pa.nulls(t.num_rows, pa.int64()),
            "dpart": pa.array(d % parts),
        })

    def tag_drops(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pa.nulls(t.num_rows, pa.string()),
            "idx": t["idx"],
            "dpart": pa.array(d % parts),
        })

    def rewrite_group(t: pa.Table) -> pa.Table:
        isdoc = pc.is_valid(t["text"])
        doc_t = t.filter(isdoc)
        dup_t = t.filter(pc.invert(isdoc))
        di = dup_t["doc_id"].to_numpy(zero_copy_only=False)
        dx = dup_t["idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dx, di))
        return rewrite_tbl(
            doc_t["doc_id"].to_numpy(zero_copy_only=False),
            doc_t["text"].to_pylist(), di[order], dx[order])

    with _shuffle_scaled(n_docs * 400):
        return (
            docs.map_batches(tag_docs, batch_format="pyarrow")
            .union(drops.map_batches(tag_drops, batch_format="pyarrow"))
            .groupby("dpart", num_partitions=parts)
            .map_groups(rewrite_group, batch_format="pyarrow")
        )


# BPE tokenizer: train _BPE_MERGES merges on the corpus word-frequency
# table (bounded to the _BPE_TOPV most frequent words — the standard
# scale move: a raw-web vocabulary reaches 10^8+ distinct strings, and
# every practical trainer counts on a capped/sampled vocabulary), then
# apply them corpus-wide. Completes the loop bpe_merge_pairs starts
# (that op ranks the FIRST merge's candidates; this one trains the
# whole table and encodes).
_BPE_MERGES = 24
_BPE_TOPV = 4096


def _bpe_train(words: list[str], freqs: list[int]) -> list[tuple[str, str]]:
    """Sequential BPE trainer over a (word, freq) vocabulary — tiny
    (≤ _BPE_TOPV rows) and inherently iterative, so it runs on the
    driver; shared verbatim with the golden so the merge table cannot
    drift. Deterministic: each round picks the max-count pair, ties
    broken by lexicographically smallest pair."""
    vocab = [list(w) for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(_BPE_MERGES):
        pairs: dict[tuple[str, str], int] = {}
        for seq, f in zip(vocab, freqs):
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        mc = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mc)
        merges.append(best)
        tok = best[0] + best[1]
        for seq in vocab:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == best[0] and seq[i + 1] == best[1]:
                    seq[i:i + 2] = [tok]
                else:
                    i += 1
    return merges


def _bpe_token_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of ``word`` under the trained merge table — the
    canonical greedy BPE apply (repeatedly merge every occurrence of
    the present pair with the lowest rank). Deterministic: ranks are
    unique per pair, so the min is never a tie."""
    seq = list(word)
    while len(seq) > 1:
        best_r = 1 << 30
        best = None
        for p in zip(seq, seq[1:]):
            r = ranks.get(p, 1 << 30)
            if r < best_r:
                best_r = r
                best = p
        if best is None or best_r == 1 << 30:
            break
        tok = best[0] + best[1]
        i = 0
        while i < len(seq) - 1:
            if seq[i] == best[0] and seq[i + 1] == best[1]:
                seq[i:i + 2] = [tok]
            else:
                i += 1
    return len(seq)


def q_bpe_encode(sf_dir: str):
    """Train-and-apply BPE over the corpus: (1) a distributed exact
    word-frequency table — per-batch ``np.unique`` partials into ONE
    coarse hash partition on the word, so per-partition sums are
    global sums and each partition's top-``_BPE_TOPV`` candidates are
    globally sufficient (≤ parts × V tiny rows reach the driver, never
    the vocabulary); (2) the sequential ``_bpe_train`` on the capped
    (f desc, word asc) top-V table; (3) one broadcast of the merge
    ranks and a map-only encode pass — per batch, each DISTINCT word
    is encoded once (``np.unique`` inverse) and per-doc token counts
    come from a vectorized ``np.add.reduceat`` over the doc's word
    offsets. Output per doc: (doc_id, n_words, n_tokens)."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])
    n_docs = _tbl_rows(sf_dir, "documents")
    parts = _SUB_PARTS or int(min(64, max(8, n_docs // 100_000 + 8)))

    def wf_partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], " "))
        u, c = np.unique(words.to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({
            "word": pa.array(u, type=pa.string()),
            "f": pa.array(c.astype(np.int64)),
            "part": pa.array(
                (pd.util.hash_array(u).astype(np.uint64)
                 % np.uint64(parts)).astype(np.int64)),
        })

    def wf_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False)["f"].sum()
        g = g.sort_values(["f", "word"], ascending=[False, True],
                          kind="stable").head(_BPE_TOPV)
        return g.reset_index(drop=True).astype({"f": np.int64})

    cand = (
        docs.map_batches(wf_partial, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(wf_top, batch_format="pandas")
    ).to_pandas()
    cand = cand.sort_values(["f", "word"], ascending=[False, True],
                            kind="stable").head(_BPE_TOPV)
    merges = _bpe_train(cand["word"].tolist(), cand["f"].tolist())
    rref = ray.put({p: r for r, p in enumerate(merges)})

    def encode(t: pa.Table) -> pa.Table:
        ranks = _bget(rref)
        words = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        u, inv = np.unique(flat, return_inverse=True)
        toks = np.fromiter((_bpe_token_len(w, ranks) for w in u),
                           dtype=np.int64, count=len(u))
        per_word = toks[inv]
        off = np.zeros(t.num_rows, dtype=np.int64)
        np.cumsum(lens[:-1], out=off[1:])
        n_tok = (np.add.reduceat(per_word, off)
                 if len(per_word) else np.zeros(t.num_rows, np.int64))
        n_tok[lens == 0] = 0
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(lens.astype(np.int64)),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
        })

    return docs.map_batches(encode, batch_format="pyarrow")


# Interval-sweep family: every event holds a presence interval of
# _PEAK_SPAN_US; peak concurrency is the classic sweep-line running-sum
# max, distributed via per-day partial sweeps + a tiny cross-day
# exclusive prefix (the two-pass distributed prefix-sum pattern).
_PEAK_SPAN_US = 3_600_000_000   # 1 hour
_PEAK_DAY_US = 86_400_000_000   # sweep co-partition granularity


def q_peak_concurrency(sf_dir: str):
    """Peak concurrently-open intervals per event_type, each event
    holding [ts, ts+1h): a sweep-line running-sum max WITHOUT a global
    sort. Map side emits ±1 deltas pre-aggregated per (type, exact µs
    timestamp) — exchange volume is distinct-timestamp bounded, not
    2×rows. ONE exchange co-partitions deltas by (type, UTC day); each
    day's sweep is locally decidable up to an additive offset, so the
    per-day kernel returns just (day_total, local_running_max) — two
    scalars per (type, day). A final tiny task (types × days rows, not
    data-bounded) turns day totals into exclusive prefix offsets:
    peak = max over days of (offset + local max) — the distributed
    prefix-sum trick. Tie rule matches the oracle's ORDER BY t, d
    DESC: at equal t all +1s land before any -1, so each timestamp's
    peak candidate is prefix_before + pos. Partitioning assumption: a
    (type, day)'s distinct timestamps fit a worker — salt to hour
    buckets at 100 TB."""
    ev = _tbl(sf_dir, "events", ["ts", "event_type"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(2 * n_ev)

    def deltas(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": np.concatenate([et, et]),
            "t": np.concatenate([ts, ts + _PEAK_SPAN_US]),
        })
        sign = np.ones(2 * len(ts), dtype=np.int64)
        sign[len(ts):] = 0
        df["pos"] = sign
        df["neg"] = 1 - sign
        out = df.groupby(["event_type", "t"], sort=False,
                         as_index=False)[["pos", "neg"]].sum()
        codes, uniq = pd.factorize(out["event_type"].to_numpy())
        th = np.fromiter((zlib.crc32(s.encode()) for s in uniq),
                         dtype=np.int64, count=len(uniq))[codes]
        day = out["t"].to_numpy(np.int64) // _PEAK_DAY_US
        out["part"] = (th * np.int64(1_000_003) + day) % parts
        return _arrow_out(out)

    def day_sweep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "day": pd.Series(dtype=np.int64),
                "local_max": pd.Series(dtype=np.int64),
                "day_total": pd.Series(dtype=np.int64)})
        et = df["event_type"].to_numpy()
        t = df["t"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        neg = df["neg"].to_numpy(np.int64)
        o = np.lexsort((t, et))
        et, t, pos, neg = et[o], t[o], pos[o], neg[o]
        # merge same-(type, t) partials arriving from different batches
        new = np.ones(len(t), dtype=bool)
        new[1:] = (et[1:] != et[:-1]) | (t[1:] != t[:-1])
        seg = np.cumsum(new) - 1
        P = np.bincount(seg, pos).astype(np.int64)
        Ng = np.bincount(seg, neg).astype(np.int64)
        E, T = et[new], t[new]
        D = T // _PEAK_DAY_US
        net = P - Ng
        cum = np.concatenate([[0], np.cumsum(net)])  # cum[i] = Σ net[:i]
        gnew = np.ones(len(T), dtype=bool)
        gnew[1:] = (E[1:] != E[:-1]) | (D[1:] != D[:-1])
        gseg = np.cumsum(gnew) - 1
        base = cum[:-1][gnew]                 # cum entering each group
        cand = cum[:-1] - base[gseg] + P      # prefix-in-group + pos
        gmax = np.full(gseg[-1] + 1, np.int64(-2**62))
        np.maximum.at(gmax, gseg, cand)
        gtot = np.bincount(gseg, net).astype(np.int64)
        return pd.DataFrame({"event_type": E[gnew], "day": D[gnew],
                             "local_max": gmax, "day_total": gtot})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "day"], kind="stable")
        et = df["event_type"].to_numpy()
        lm = df["local_max"].to_numpy(np.int64)
        tot = df["day_total"].to_numpy(np.int64)
        new = np.ones(len(df), dtype=bool)
        new[1:] = et[1:] != et[:-1]
        gseg = np.cumsum(new) - 1
        cum = np.concatenate([[0], np.cumsum(tot)])
        base = cum[:-1][new]
        peak_cand = cum[:-1] - base[gseg] + lm  # exclusive day offset
        gmax = np.full(gseg[-1] + 1, np.int64(-2**62))
        np.maximum.at(gmax, gseg, peak_cand)
        return pd.DataFrame({"event_type": et[new], "peak": gmax})

    return (
        ev.map_batches(deltas, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(day_sweep, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_scd2_intervals(sf_dir: str):
    """SCD2 (slowly-changing-dimension type-2) build: per user,
    collapse the (ts, event_id)-ordered event stream into validity
    intervals of the user's CURRENT event_type — one row per change
    point, valid_from = the change's ts, valid_to = the NEXT change's
    ts; each user's final still-open interval is dropped (closed
    intervals only, so the output carries no NULLs through the value
    hash). Same one-exchange shape as the LAG/funnel family: user-hash
    co-partition, then a fully vectorized per-partition kernel (lexsort
    → change mask → shifted change timestamps). Partitioning
    assumption: a user's history fits its partition."""
    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type"])
    n_ev = _tbl_rows(sf_dir, "events")
    parts = _copart_count(n_ev)

    def tag(t: pa.Table) -> pa.Table:
        return _append_user_part(t, parts)

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((df["event_id"].to_numpy(np.int64),
                        df["ts"].to_numpy("datetime64[us]")
                        .astype(np.int64),
                        df["user_id"].to_numpy(np.int64)))
        uid = df["user_id"].to_numpy(np.int64)[o]
        ts = df["ts"].to_numpy("datetime64[us]")[o]
        et = df["event_type"].to_numpy()[o]
        ch = np.ones(len(uid), dtype=bool)
        ch[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        cu, cts, cet = uid[ch], ts[ch], et[ch]
        keep = np.zeros(len(cu), dtype=bool)
        if len(cu):
            keep[:-1] = cu[:-1] == cu[1:]  # next change is same user
        return _arrow_out(pd.DataFrame({
            "user_id": cu[keep],
            "event_type": cet[keep],
            "valid_from": cts[keep],
            "valid_to": np.roll(cts, -1)[keep],
        }))

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(intervals, batch_format="pandas")
    )


def q_corr_price_qty(sf_dir: str):
    """Per-returnflag Pearson correlation + regression slope of
    (l_quantity → l_extendedprice) via TWO linear passes with
    order-free partials — the cancellation-safe distributed moment
    kernel. Pass 1: per-flag (n, Σx, Σy) map partials → tiny coalesced
    means (3 groups, driver-free until a ≤#groups-row table). Pass 2:
    broadcast the means, map partials accumulate CENTERED products
    Σ(x-x̄)(y-ȳ), Σ(x-x̄)², Σ(y-ȳ)² — centering kills the Σxy − n·x̄·ȳ
    subtractive cancellation that makes the one-pass formula disagree
    with the oracle's streaming kernel near corr≈0 — then one tiny
    finish computes corr = sxy/√(sxx·syy) and slope = sxy/sxx, SQL
    ROUND-half-up to 4. Both passes are column-pruned reads; all
    exchanges are #groups-bounded."""
    cols = ["l_returnflag", "l_quantity", "l_extendedprice"]

    def sums(t: pa.Table) -> pa.Table:
        f = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_quantity"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(f)
        return pa.table({
            "f": pa.array(np.asarray(uniq, dtype=object),
                          type=pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sx": pa.array(np.bincount(codes, x)),
            "sy": pa.array(np.bincount(codes, y)),
        })

    means = (
        _tbl(sf_dir, "lineitem", cols)
        .map_batches(sums, batch_format="pyarrow")
        .to_pandas()  # partials: ≤ #flags rows per input block
        .groupby("f", as_index=False).sum()
    )
    mean_map = {r.f: (r.sx / r.n, r.sy / r.n) for r in
                means.itertuples(index=False)}
    ref = ray.put(mean_map)

    def centered(t: pa.Table) -> pa.Table:
        mm = _bget_slot("corr_means", ref)
        f = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_quantity"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(f)
        xm = np.array([mm[u][0] for u in uniq])
        ym = np.array([mm[u][1] for u in uniq])
        cx = x - xm[codes]
        cy = y - ym[codes]
        return pa.table({
            "f": pa.array(np.asarray(uniq, dtype=object),
                          type=pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sxy": pa.array(np.bincount(codes, cx * cy)),
            "sxx": pa.array(np.bincount(codes, cx * cx)),
            "syy": pa.array(np.bincount(codes, cy * cy)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("f", as_index=False).sum() \
            .sort_values("f", kind="stable")
        sxy = g["sxy"].to_numpy()
        sxx = g["sxx"].to_numpy()
        syy = g["syy"].to_numpy()
        return pd.DataFrame({
            "l_returnflag": g["f"].to_numpy(),
            "n": g["n"].to_numpy(np.int64),
            "corr_qty_price": _round_half_up(
                sxy / np.sqrt(sxx * syy), 4),
            "slope": _round_half_up(sxy / sxx, 4),
        })

    return (
        _tbl(sf_dir, "lineitem", cols)
        .map_batches(centered, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_IQR_FENCE = 1.5


def q_iqr_outliers(sf_dir: str):
    """Per-event_type Tukey-fence outlier counts over ``value``: exact
    q1/q3 (quantile_cont 0.25/0.75) via the group_quantiles bit-pattern
    value-histogram kernel — map-side (type, value-bits) count partials,
    ONE domain-bounded merge, per-type interpolation with
    quantile_cont's lo*(1-f)+hi*f formula — and the outlier count
    (value < q1 − 1.5·IQR or > q3 + 1.5·IQR) read from the SAME merged
    histogram (cumulative counts either side of the fences), so the
    whole op is one linear pass + a domain-bounded exchange: no second
    scan, no per-group sort. Bit-pattern keys require the value domain
    be positive (holds here: value ≥ 0.01); the fences are computed
    with the identical fp expression the oracle uses, so the floats
    compare exactly."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "vb": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        g = t["event_type"].to_numpy(zero_copy_only=False)
        vb = t["value"].to_numpy(zero_copy_only=False).view(np.int64)
        gs, vs, cs = [], [], []
        for f in np.unique(g):
            u, c = np.unique(vb[g == f], return_counts=True)
            gs.append(np.full(len(u), f, dtype=object))
            vs.append(u)
            cs.append(c.astype(np.int64))
        return pa.table({
            "g": pa.array(np.concatenate(gs), type=pa.string()),
            "vb": pa.array(np.concatenate(vs)),
            "cnt": pa.array(np.concatenate(cs)),
        })

    def finish(t: pa.Table) -> pd.DataFrame:
        g = t["g"].to_numpy(zero_copy_only=False)
        vb = t["vb"].to_numpy(zero_copy_only=False)
        cn = t["cnt"].to_numpy(zero_copy_only=False)
        rows = []
        for f in np.unique(g):
            m = g == f
            uq, inv = np.unique(vb[m], return_inverse=True)
            tot = np.zeros(len(uq), dtype=np.int64)
            np.add.at(tot, inv, cn[m])
            vals = uq.view(np.float64)
            cum = tot.cumsum()
            n = int(cum[-1])
            qs = {}
            for q, nm in ((0.25, "q1"), (0.75, "q3")):
                h_pos = (n - 1) * q
                lo = int(np.floor(h_pos))
                fr = h_pos - lo
                xlo = vals[np.searchsorted(cum, lo, side="right")]
                xhi = vals[np.searchsorted(cum, min(lo + 1, n - 1),
                                           side="right")]
                qs[nm] = xlo * (1.0 - fr) + xhi * fr
            iqr = qs["q3"] - qs["q1"]
            lo_f = qs["q1"] - _IQR_FENCE * iqr
            hi_f = qs["q3"] + _IQR_FENCE * iqr
            below = int(cum[np.searchsorted(vals, lo_f, "left") - 1]) \
                if np.searchsorted(vals, lo_f, "left") else 0
            at_hi = np.searchsorted(vals, hi_f, "right")
            above = n - (int(cum[at_hi - 1]) if at_hi else 0)
            rows.append({"event_type": f, "q1": qs["q1"],
                         "q3": qs["q3"], "n_out": below + above})
        out = pd.DataFrame(rows)
        out["n_out"] = out["n_out"].astype(np.int64)
        return out

    return (
        _tbl(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
    )


_SKIP_K = 3  # skip-gram window: unordered pairs within ±_SKIP_K words


def q_skipgram_pairs(sf_dir: str):
    """Skip-gram co-occurrence statistics (the word2vec-style window
    counts an embedding trainer consumes): unordered word pairs within
    a ±3 window, global top-50 by (count desc, pair asc). Map-side
    partials vectorize the window as THREE shifted-array passes with
    elementwise object-array min/max (no per-pair Python tuple sort)
    and pre-combine per batch via np.unique, so the exchange moves
    (pair, count) partials bounded by the distinct co-occurrence
    vocabulary — never the corpus text. Same partial→groupby→top-k
    shape as bigram_counts."""

    def partial(t: pa.Table) -> pa.Table:
        chunks: list[np.ndarray] = []
        for x in t["text"].to_pylist():
            w = np.array(x.split(" "), dtype=object)
            for off in range(1, _SKIP_K + 1):
                if len(w) <= off:
                    break
                a, b = w[:-off], w[off:]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                chunks.append(lo + " " + hi)
        if not chunks:
            return pa.table({"pair": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(np.concatenate(chunks), return_counts=True)
        return pa.table({"pair": pa.array(u, type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    return (
        _bucket_sum(_tbl(sf_dir, "documents", ["text"])
                    .map_batches(partial, batch_format="pyarrow"),
                    "pair", "n")
        .sort(["n", "pair"], descending=[True, False])
        .limit(50)
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


# rank key for the quality-canonical dedup keep: (n_tokens << 33) −
# doc_id, so Max(key) = (max n_tokens, tie → min doc_id) AND the
# winner doc_id decodes straight out of the aggregate (no second
# join). Requires doc_id < 2^33 and n_tokens < 2^30.
_BEST_KEY_SHIFT = np.int64(33)


def q_minhash_dedup_best(sf_dir: str):
    """Quality-CANONICAL near-dup removal: where ``minhash_dedup_keep``
    keeps each duplicate cluster's min doc_id, production curation
    keeps its BEST member — here the longest (max whitespace
    n_tokens, tie → min doc_id), the usual keep-the-superset policy
    for crawl dups. Shape: verified pairs → distributed CC →
    (node → rank key) attach, size-dispatched like ``_keep_corpus``
    (broadcast the node set below ``_DROP_BCAST_LIMIT`` and filter the
    corpus scan map-side; above it, emit keys for every doc and let
    the node-hash cogroup drop non-nodes) → ONE cogroup join with the
    CC labels → ``groupby(lab).Max(key)`` — the key encodes the
    winner, so winners decode from the aggregate with NO
    representative re-join — → survivors = (corpus minus all pair
    nodes) ∪ winners. Every intermediate is pair-set bounded; the
    only corpus-wide stages are map-only scans and the dispatched
    anti-join."""
    pairs = q_minhash_lsh(sf_dir).materialize()  # bounded: dup pairs
    labels = _cc_min_labels(pairs).materialize()  # (node, lab)
    n_nodes = labels.count()
    ids_only = _tbl(sf_dir, "documents", ["doc_id"])
    if n_nodes == 0:
        return ids_only
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])

    def _key_table(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nt = np.fromiter(
            (textstats.token_count_ws(x) for x in t["text"].to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return pa.table({
            "node": pa.array(ids),
            "val": pa.array((nt << _BEST_KEY_SHIFT) - ids),
        })

    if n_nodes <= _DROP_BCAST_LIMIT:
        tbls = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
        nref = ray.put(pa.concat_tables(tbls)["node"].combine_chunks())

        def keys_fn(t: pa.Table) -> pa.Table:
            return _key_table(
                t.filter(pc.is_in(t["doc_id"], value_set=_bget(nref))))
    else:  # node set is corpus-scale: ship narrow (node, key) rows
        # for every doc through the cogroup instead of a broadcast
        keys_fn = _key_table

    keys = docs.map_batches(keys_fn, batch_format="pyarrow")
    parts = _copart_count(n_nodes, lo=4, hi=64)

    def tag_lab(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t["node"], "val": t["lab"],
            "role": pa.array(np.zeros(len(node), dtype=np.int8)),
            "part": pa.array(node % parts),
        })

    def tag_key(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "role", pa.array(np.ones(len(node), dtype=np.int8))
        ).append_column("part", pa.array(node % parts))

    def join(df: pd.DataFrame) -> pd.DataFrame:
        role = df["role"].to_numpy()
        node = df["node"].to_numpy(np.int64)
        val = df["val"].to_numpy(np.int64)
        lm = role == 0
        ln, lv = node[lm], val[lm]
        kn, kv = node[~lm], val[~lm]
        if not len(ln):
            return pd.DataFrame({"lab": pd.Series(dtype=np.int64),
                                 "key": pd.Series(dtype=np.int64)})
        o = np.argsort(kn, kind="stable")
        kn, kv = kn[o], kv[o]
        idx = np.searchsorted(kn, ln)
        if len(kn) == 0 or not np.array_equal(
                kn[np.minimum(idx, len(kn) - 1)], ln):
            raise ValueError(
                "minhash_dedup_best: pair node missing from corpus")
        return pd.DataFrame({"lab": lv, "key": kv[idx]})

    joined = (
        labels.map_batches(tag_lab, batch_format="pyarrow")
        .union(keys.map_batches(tag_key, batch_format="pyarrow"))
        .groupby("part", num_partitions=parts)
        .map_groups(join, batch_format="pandas")
    )
    best = joined.groupby("lab").aggregate(Max("key", alias_name="best_key"))

    def winner(t: pa.Table) -> pa.Table:
        k = t["best_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        one = np.int64(1)
        nt = (k + (one << _BEST_KEY_SHIFT) - one) >> _BEST_KEY_SHIFT
        return pa.table({"doc_id": pa.array((nt << _BEST_KEY_SHIFT) - k)})

    winners = best.map_batches(winner, batch_format="pyarrow")
    node_drops = labels.map_batches(
        lambda t: pa.table({"drop_id": t["node"]}), batch_format="pyarrow")
    return _keep_corpus(ids_only, "doc_id", node_drops).union(winners)


def q_image_patches(sf_dir: str):
    """ViT-style patch-grid statistics over the binary image column:
    per image the 8×8-pixel patch count, the count of FLAT
    (low-detail, luma variance < 400) patches — the standard
    low-information gate for image curation — and cropped mean luma.
    Actor-pool map_batches with small batches (wide binary rows),
    map-only at any corpus size; per-image kernel is one
    reshape→var(axis) pass, no per-patch loop. Golden twin runs an
    explicit per-patch loop over the sequential oracle crawl's
    images."""
    from ..stages.multimodal import ImagePatches

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes"])
    return ds.map_batches(ImagePatches, batch_format="pyarrow",
                          batch_size=64, concurrency=(2, 16), num_cpus=1)


def q_asr_chunks(sf_dir: str):
    """ASR batching prep over binary audio: fixed 0.25 s windows at a
    0.2 s hop (Whisper-style fixed inference windows; the tail chunk
    keeps its short remainder), one row per chunk with start/duration/
    RMS. Decode + chunk + feature in ONE actor-pool map stage — no
    shuffle at any corpus size. Autoscaled pool: Ray fuses the
    upstream synthesis task stage INTO the pool (the vad_segments
    lesson), so a fixed 2-actor pool would serialize synthesis."""
    from ..stages.multimodal import AsrChunks

    ds = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        _synth_audio, batch_format="pyarrow")
    return ds.map_batches(
        AsrChunks, batch_format="pyarrow", batch_size=64,
        concurrency=(2, 16), num_cpus=1)


def q_activity_heatmap(sf_dir: str):
    """Day-of-week × hour-of-day activity heatmap over events — the
    wall-calendar usage grid every analytics dashboard draws: per
    (dow, hod) cell the event count and its share of total. Map-side
    bincount over the fixed 7×24 grid (partials are 168 ints per
    batch regardless of row count — no key exchange at ANY corpus
    size), one coalesced combine. dow matches DuckDB's dayofweek
    (Sunday=0; 1970-01-01 was a Thursday → (epoch_days+4)%7)."""

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        dow = (us // 86_400_000_000 + 4) % 7
        hod = (us // 3_600_000_000) % 24
        cnt = np.bincount(dow * 24 + hod, minlength=168)
        return pa.table({"cell": pa.array(np.arange(168, dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", as_index=False)["n"].sum()
        g = g[g["n"] > 0]
        total = float(g["n"].sum())
        cell = g["cell"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "dow": cell // 24, "hod": cell % 24, "n": n,
            "pct": _round_half_up(n / total, 4),
        })

    return (
        _tbl(sf_dir, "events", ["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_GBK_K = 5  # per-group deterministic sample size


def _group_rank(grp: np.ndarray) -> np.ndarray:
    """Within-group 0-based ranks over a GROUP-SORTED array — the one
    shared leaf of every grouped bottom-k kernel (group_bottomk_sample,
    kmv_jaccard) so their rank semantics cannot drift."""
    new = np.ones(len(grp), dtype=bool)
    new[1:] = grp[1:] != grp[:-1]
    return np.arange(len(grp)) - np.maximum.accumulate(
        np.where(new, np.arange(len(grp)), 0))


def q_group_bottomk_sample(sf_dir: str):
    """Per-GROUP deterministic uniform sample: for each event_type the
    K=5 distinct users with the smallest multiplicative user_id hash
    (tie → user_id) — the grouped bottom-k sketch, i.e. 'ORDER BY
    random() LIMIT k PER GROUP' with no RNG state and no global sort.
    Per-batch: distinct (type, user) then LOCAL bottom-k per type
    (bottom-k is a semilattice, so local-then-merge is exact); the
    merge input is bounded at K × types × blocks rows, one coalesced
    final take."""

    def bottomk(t: pa.Table) -> pa.Table:
        # local bottom-k and the final merge are the SAME kernel (the
        # semilattice property is exactly that) — one function, used
        # for both stages
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        h = (uid * _HASH_MULT) % _HASH_MOD
        o = np.lexsort((uid, h, et))
        et, uid = et[o], uid[o]
        m = _group_rank(et) < _GBK_K
        return pa.table({"event_type": pa.array(et[m], type=pa.string()),
                         "user_id": pa.array(uid[m])})

    return (
        _tbl(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(bottomk, batch_format="pyarrow")
        .map_batches(bottomk, batch_format="pyarrow", batch_size=1 << 30)
    )


_DRAWDOWN_FRAC = 0.5
_DD_MONTH_US = np.int64(2_678_400_000_000)  # 31-day bucket (fixed width)


def q_price_drawdown(sf_dir: str):
    """Running-peak drawdown count — the distributed PREFIX-MAX scan:
    per order priority, how many orders arrive (by (o_orderdate,
    o_orderkey) order) priced below half the running maximum of all
    EARLIER orders. The global ordered scan decomposes exactly like
    ``peak_concurrency``'s prefix-sum, but with max and BROADCAST
    offsets instead of a final-task prefix: a map-only pre-pass
    reduces each batch to per-time-bucket max partials (tiny — bucket
    count, not row count), one coalesced task turns them into
    per-bucket EXCLUSIVE prefix maxima, broadcast; then ONE bucket
    cogroup sorts each bucket locally, takes the within-bucket
    exclusive running max, combines it with the bucket's offset, and
    emits per-(bucket, priority) counts — so only counts leave the
    second exchange. Partitioning assumption: a time bucket's orders
    fit a worker (31-day fixed buckets here; narrow at 100 TB)."""
    cols = ["o_orderkey", "o_orderdate", "o_orderpriority",
            "o_totalprice"]

    def bucket_of(t: pa.Table) -> np.ndarray:
        us = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return us // _DD_MONTH_US

    def max_partial(t: pa.Table) -> pa.Table:
        b = bucket_of(t)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        ub = np.unique(b)
        mx = np.array([p[b == x].max() for x in ub])
        return pa.table({"bucket": pa.array(ub), "mx": pa.array(mx)})

    # tiny: one row per (bucket, batch) — collect, exclusive prefix max
    parts_df = (
        _tbl(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(max_partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts_df.groupby("bucket")["mx"].max().sort_index()
    buckets = g.index.to_numpy(np.int64)
    run = np.concatenate([[-np.inf], np.maximum.accumulate(
        g.to_numpy())])[:-1]  # exclusive: max over EARLIER buckets
    ref = ray.put({int(b): float(r) for b, r in zip(buckets, run)})

    def count_dd(df: pd.DataFrame) -> pd.DataFrame:
        # map_groups delivers ONE bucket per call: sort it, take the
        # within-bucket exclusive running max, fold in the broadcast
        # cross-bucket offset, and emit only per-priority counts.
        off = _bget_slot("drawdown_offsets", ref)
        o = np.lexsort((df["o_orderkey"].to_numpy(np.int64),
                        df["o_orderdate"].to_numpy("datetime64[us]")
                        .astype(np.int64)))
        pr = df["o_orderpriority"].to_numpy()[o]
        px = df["o_totalprice"].to_numpy()[o]
        inb = np.concatenate([[-np.inf], np.maximum.accumulate(px)])[:-1]
        run_max = np.maximum(inb, off[int(df["bucket"].iloc[0])])
        dd = px < _DRAWDOWN_FRAC * run_max  # -inf run_max → False
        out = pd.DataFrame({"o_orderpriority": pr, "dd": dd}) \
            .groupby("o_orderpriority", as_index=False) \
            .agg(n_drawdown=("dd", "sum"), n=("dd", "size"))
        out["n_drawdown"] = out["n_drawdown"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).sum()
        g["n_drawdown"] = g["n_drawdown"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        return g

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pa.array(bucket_of(t)))

    n_ord = _tbl_rows(sf_dir, "orders")
    nparts = _copart_count(n_ord)
    return (
        _tbl(sf_dir, "orders", cols)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket", num_partitions=nparts)
        .map_groups(count_dd, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
    )


_KMV_K = 256  # bottom-k sketch size (KMV / theta-sketch family)


def q_kmv_jaccard(sf_dir: str):
    """Set-overlap ESTIMATION from mergeable sketches — the KMV /
    theta-sketch completion of the sketch family (HLL = distinct
    count, count-min = point counts, this = pairwise Jaccard): per
    event_type a bottom-256 sketch of distinct multiplicative user
    hashes, built local-then-merge (bottom-k is a semilattice, so the
    merge input is K × types × blocks rows and the sketch is exact);
    the T×T pair estimate runs in ONE tiny final task over merged
    sketches. The estimate is DETERMINISTIC and the sketch-only
    combine equals the full-data definition exactly (any union-
    bottom-k element that belongs to A is necessarily in A's own
    bottom-k), so the oracle is plain SQL over all rows — no golden
    needed. jacc_est ≈ the exact audience_overlap jacc, at 1/√K
    error, from K rows per type instead of the distinct-pair
    exchange."""

    def _bk(et: np.ndarray, hv: np.ndarray) -> pa.Table:
        o = np.lexsort((hv, et))
        et, hv = et[o], hv[o]
        keep = np.ones(len(et), dtype=bool)
        keep[1:] = (et[1:] != et[:-1]) | (hv[1:] != hv[:-1])
        et, hv = et[keep], hv[keep]  # distinct (type, hash)
        m = _group_rank(et) < _KMV_K
        return pa.table({"event_type": pa.array(et[m], type=pa.string()),
                         "hv": pa.array(hv[m])})

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return _bk(et, (uid * _HASH_MULT) % _HASH_MOD)

    def combine(t: pa.Table) -> pd.DataFrame:
        bk = _bk(t["event_type"].to_numpy(zero_copy_only=False),
                 t["hv"].to_numpy(zero_copy_only=False))
        et = bk["event_type"].to_numpy(zero_copy_only=False)
        hv = bk["hv"].to_numpy(zero_copy_only=False)
        types = np.unique(et)
        sk = {x: hv[et == x] for x in types}  # each sorted ascending
        rows = []
        for i, a in enumerate(types):
            for b in types[i + 1:]:
                merged = np.union1d(sk[a], sk[b])[:_KMV_K]
                both = int((np.isin(merged, sk[a])
                            & np.isin(merged, sk[b])).sum())
                rows.append((a, b, len(merged),
                             float(_round_half_up(both / len(merged),
                                                  4))))
        return pd.DataFrame(rows, columns=["type_a", "type_b",
                                           "k_used", "jacc_est"]) \
            .astype({"k_used": np.int64, "jacc_est": np.float64})

    return (
        _tbl(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=1 << 30)
    )


def q_entity_clusters(sf_dir: str):
    """Entity resolution end-to-end — the composition the fuzzy join
    exists for: brand-blocked char-set-Jaccard pairs
    (``q_fuzzy_join_names``) → distributed connected components →
    every part labeled with its cluster representative (component min
    partkey; singletons map to themselves). The labels attach to the
    full part table through ONE node-hash cogroup (narrow int rows;
    parts without a fuzzy partner pass through rep = self), so the
    pair set stays the only dup-bounded intermediate. Golden twin:
    independent Python set-Jaccard + union-find."""
    pairs = q_fuzzy_join_names(sf_dir).materialize()  # bounded: pairs
    labels = _cc_min_labels(pairs)
    n_part = _tbl_rows(sf_dir, "part")
    parts_n = _copart_count(n_part, lo=4, hi=64)

    def tag_lab(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": t["node"], "v": t["lab"],
            "role": pa.array(np.zeros(len(node), dtype=np.int8)),
            "part": pa.array(node % parts_n),
        })

    def tag_part(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": t["p_partkey"], "v": t["p_partkey"],
            "role": pa.array(np.ones(len(k), dtype=np.int8)),
            "part": pa.array(k % parts_n),
        })

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        role = df["role"].to_numpy()
        k = df["k"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        lm = role == 0
        ln, lv = k[lm], v[lm]
        pk = k[~lm]
        if not len(pk):
            return pd.DataFrame({"p_partkey": pd.Series(dtype=np.int64),
                                 "cluster_rep": pd.Series(dtype=np.int64)})
        rep = pk.copy()
        if len(ln):
            o = np.argsort(ln, kind="stable")
            ln, lv = ln[o], lv[o]
            idx = np.searchsorted(ln, pk)
            ok = (idx < len(ln))
            ok[ok] = ln[np.minimum(idx[ok], len(ln) - 1)] == pk[ok]
            rep[ok] = lv[np.minimum(idx, len(ln) - 1)][ok]
        return pd.DataFrame({"p_partkey": pk, "cluster_rep": rep})

    return (
        labels.map_batches(tag_lab, batch_format="pyarrow")
        .union(_tbl(sf_dir, "part", ["p_partkey"])
               .map_batches(tag_part, batch_format="pyarrow"))
        .groupby("part", num_partitions=parts_n)
        .map_groups(resolve, batch_format="pandas")
    )


def q_audio_spectral(sf_dir: str):
    """Frequency-domain audio features over the binary audio column:
    per-clip spectral centroid / bandwidth / 85% rolloff (Hz) — the
    curation gates for hiss, hum and band-limited clips that pair
    with AudioFeatures' time-domain RMS. Decode + one rfft per clip in
    an autoscaled map-only actor pool (the synthesis task stage fuses
    into the pool — the vad_segments lesson); no shuffle at any
    corpus size. Golden twin shares the ``spectral_stats`` leaf with
    its own loop (the audio_rms precedent)."""
    from ..stages.multimodal import AudioSpectral

    ds = _tbl(sf_dir, "documents", ["doc_id"]).map_batches(
        _synth_audio, batch_format="pyarrow")
    return ds.map_batches(
        AudioSpectral, batch_format="pyarrow", batch_size=64,
        concurrency=(2, 16), num_cpus=1)


def q_image_color_hist(sf_dir: str):
    """Color-palette statistics over the binary image column: 4×4×4
    quantized RGB histogram per image → dominant-color bin and color
    entropy (bits) — the palette-diversity gate that separates flat
    logos/screenshots from photographs in image curation. Map-only
    autoscaled actor pool; per-image kernel is one bincount. Golden
    twin counts each of the 64 bins with explicit boolean masks over
    the sequential oracle crawl's images."""
    from ..stages.multimodal import ImageColorHist

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes"])
    return ds.map_batches(ImageColorHist, batch_format="pyarrow",
                          batch_size=64, concurrency=(2, 16), num_cpus=1)


# Deterministic walk step chooser: next = nbrs[(walk*A + cur*B +
# step*C) % deg]. Pure int64 (values < 2^33 × 1e6 < 2^53), shared with
# the golden twin so both sides pick identical steps.
_WALK_LEN = 4
_WALK_A, _WALK_B, _WALK_C = (np.int64(1_000_003), np.int64(69_069),
                             np.int64(97))


@ray.remote
def _walk_local_task(*tables: pa.Table) -> pa.Table:
    """Single-task walk kernel — the bounded-size dispatch twin of
    ``_cc_local_task``: same symmetrize/sort/step-chooser as the BSP
    path, minus its per-step AllToAll (each ~8 s of fixed floor at 32
    CPUs on graphs whose real walk work is milliseconds)."""
    tabs = _nonempty_arrow(tables)
    if not tabs:
        return pa.table({"walk_id": pa.array([], type=pa.int64()),
                         "step": pa.array([], type=pa.int64()),
                         "node": pa.array([], type=pa.int64())})
    edges = pa.concat_tables(tabs)
    a = edges["part_a"].to_numpy(zero_copy_only=False)
    b = edges["part_b"].to_numpy(zero_copy_only=False)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    us, starts = np.unique(src, return_index=True)
    deg = np.diff(np.append(starts, len(src)))
    wid = us.copy()
    cur = us.copy()
    ws, ss, ns = [wid], [np.zeros(len(us), dtype=np.int64)], [cur]
    for step in range(1, _WALK_LEN + 1):
        pos = np.searchsorted(us, cur)
        idx = (wid * _WALK_A + cur * _WALK_B
               + np.int64(step) * _WALK_C) % deg[pos]
        cur = dst[starts[pos] + idx]
        ws.append(wid)
        ss.append(np.full(len(us), step, dtype=np.int64))
        ns.append(cur)
    return pa.table({"walk_id": pa.array(np.concatenate(ws)),
                     "step": pa.array(np.concatenate(ss)),
                     "node": pa.array(np.concatenate(ns))})


def q_graph_walks(sf_dir: str):
    """Node2vec-style WALK CORPUS generation over the co-purchase
    graph — the graph-embedding prep step (DeepWalk/node2vec train on
    exactly these walk sequences): one length-4 walk per node,
    deterministic next-step choice (hash of (walk, cur, step) mod
    degree — no RNG state to coordinate across a cluster, the same
    determinism policy as every sampler here). Size-dispatched like
    the CC family: bounded edge sets run ONE remote vectorized task
    (``_walk_local_task``); above ``_CC_LOCAL_EDGE_LIMIT`` the BSP
    path runs — the symmetrized edge list materializes ONCE and each
    step is ONE node-hash cogroup of the walk frontier against the
    adjacency (frontier rows carry only (walk_id, cur)), materialized
    per step so no step's chain re-executes its predecessors. Output
    is the full corpus: (walk_id, step, node) for steps 0..4.
    Partitioning assumption (BSP path): a node's neighbor list fits
    its partition (hub salting is the 100 TB lever, as in the CC
    family)."""
    edges = q_part_copurchase(sf_dir).materialize()  # support-bounded
    if edges.count() <= _CC_LOCAL_EDGE_LIMIT:
        refs = edges.to_arrow_refs()
        return rd.from_arrow_refs([_walk_local_task.remote(*refs)])

    def sym(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    adj = edges.map_batches(sym, batch_format="pyarrow").materialize()
    parts = _copart_count(adj.count(), lo=4, hi=64)

    frontier = (
        adj.map_batches(lambda t: pa.table(
            {"node": pc.unique(t["src"])}), batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="c"))
        .map_batches(lambda t: pa.table(
            {"walk_id": t["node"], "cur": t["node"]}),
            batch_format="pyarrow")
    )

    def tag_front(t: pa.Table) -> pa.Table:
        cur = t["cur"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": t["cur"], "a": t["walk_id"],
            "role": pa.array(np.zeros(len(cur), dtype=np.int8)),
            "part": pa.array(cur % parts),
        })

    def tag_adj(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": t["src"], "a": t["dst"],
            "role": pa.array(np.ones(len(src), dtype=np.int8)),
            "part": pa.array(src % parts),
        })

    def make_step(step: int):
        def step_kernel(df: pd.DataFrame) -> pd.DataFrame:
            role = df["role"].to_numpy()
            k = df["k"].to_numpy(np.int64)
            a = df["a"].to_numpy(np.int64)
            fm = role == 0
            cur, wid = k[fm], a[fm]
            if not len(cur):
                return pd.DataFrame({
                    "walk_id": pd.Series(dtype=np.int64),
                    "cur": pd.Series(dtype=np.int64)})
            src, dst = k[~fm], a[~fm]
            o = np.lexsort((dst, src))
            src, dst = src[o], dst[o]
            us, starts = np.unique(src, return_index=True)
            deg = np.diff(np.append(starts, len(src)))
            pos = np.searchsorted(us, cur)
            if not np.array_equal(us[np.minimum(pos, len(us) - 1)], cur):
                raise ValueError("graph_walks: frontier node has no "
                                 "adjacency in its partition")
            idx = (wid * _WALK_A + cur * _WALK_B
                   + np.int64(step) * _WALK_C) % deg[pos]
            return pd.DataFrame({"walk_id": wid,
                                 "cur": dst[starts[pos] + idx]})
        return step_kernel

    tagged_adj = adj.map_batches(tag_adj, batch_format="pyarrow")
    outs = [frontier.map_batches(
        lambda t: pa.table({"walk_id": t["walk_id"],
                            "step": pa.array(np.zeros(t.num_rows,
                                                      dtype=np.int64)),
                            "node": t["cur"]}), batch_format="pyarrow")]
    for s in range(1, _WALK_LEN + 1):
        # materialize each step's frontier (one row per walk, bounded)
        # — a lazy chain would re-execute every earlier step per step
        # AND per output union (measured 128 s → 16 s at 5M rows)
        frontier = (
            frontier.map_batches(tag_front, batch_format="pyarrow")
            .union(tagged_adj)
            .groupby("part", num_partitions=parts)
            .map_groups(make_step(s), batch_format="pandas")
        ).materialize()
        step_arr = np.int64(s)
        outs.append(frontier.map_batches(
            lambda t, _s=step_arr: pa.table(
                {"walk_id": t["walk_id"],
                 "step": pa.array(np.full(t.num_rows, _s)),
                 "node": t["cur"]}), batch_format="pyarrow"))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def q_approx_distinct_by_type(sf_dir: str):
    """GROUPED HyperLogLog — the sketch-as-aggregation-state shape:
    per event_type a p=12 HLL of distinct users, register partials
    keyed (type, reg) merged by elementwise max through one
    grid-bounded groupby (types × 4096 rows max — never a key
    exchange over users). Estimates are bit-deterministic on any
    partitioning; the oracle is the identical sequential sketch per
    type (golden twin)."""
    from ..functions import sketch

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], type=pa.string()),
                "reg": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64())})
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts, rs, ks = [], [], []
        for x in np.unique(et):
            regs = sketch.hll_registers(uid[et == x])
            nz = np.nonzero(regs)[0]
            ts.append(np.full(len(nz), x, dtype=object))
            rs.append(nz)
            ks.append(regs[nz])
        return pa.table({
            "event_type": pa.array(np.concatenate(ts), type=pa.string()),
            "reg": pa.array(np.concatenate(rs).astype(np.int64)),
            "rank": pa.array(np.concatenate(ks).astype(np.int64)),
        })

    merged = (
        _tbl(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .aggregate(Max("rank", alias_name="rank"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions import sketch as sk

        rows = []
        for x, g in df.groupby("event_type"):
            regs = np.zeros(sk.HLL_M, dtype=np.int64)
            regs[g["reg"].to_numpy(np.int64)] = g["rank"].to_numpy(np.int64)
            rows.append((x, int(sk.hll_estimate(regs))))
        return pd.DataFrame(rows, columns=["event_type", "n_approx"]) \
            .astype({"n_approx": np.int64})

    return merged.map_batches(finish, batch_format="pandas",
                              batch_size=1 << 30)


_MRL_K = 10  # truncation eval: top-k overlap between full and half dims


def q_ann_dim_recall(sf_dir: str):
    """Matryoshka-style DIMENSION-TRUNCATION evaluation — the modern
    embedding-pipeline question 'can we serve at half the dims?':
    for each probe (vec_id < 5), exact cosine top-10 under FULL dims
    and under the first-HALF dims (renormalized), reported as the
    per-probe overlap count. ONE corpus pass computes both variants'
    batch-local top-k (same matmul batch, two normalized views); the
    per-(probe, variant) partials merge through the shared
    ``_merge_topk`` total order, and a tiny final task intersects the
    two lists per probe. Deterministic (rounded-score/id tie order),
    golden twin does the same two scans in numpy."""
    k = _MRL_K
    qids, qmat = _query_vectors(sf_dir)
    half = qmat.shape[1] // 2
    qref = ray.put((qids, _norm_rows(qmat), _norm_rows(qmat[:, :half])))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"qv": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        qi, qn_full, qn_half = _bget(qref)
        cids = t["vec_id"].to_numpy()
        cm = _emb_matrix(t["embedding"])
        out_qv, out_id, out_s = [], [], []
        for variant, (qn, cn) in enumerate(
                ((qn_full, _norm_rows(cm)),
                 (qn_half, _norm_rows(cm[:, :half])))):
            sims = _round_half_up(qn @ cn.T, 6)
            for row in range(len(qi)):
                mask = cids != qi[row]
                ids_m, s_m = cids[mask], sims[row][mask]
                order = np.lexsort((ids_m, -s_m))[:k]
                out_qv.extend([int(qi[row]) * 2 + variant] * len(order))
                out_id.extend(int(ids_m[o]) for o in order)
                out_s.extend(float(s_m[o]) for o in order)
        return pa.table({"qv": pa.array(out_qv, type=pa.int64()),
                         "neighbor_id": pa.array(out_id, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    merged = (
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(partial_topk, batch_format="pyarrow", batch_size=512)
        .groupby("qv")
        .map_groups(_merge_topk(k, out_cols=("qv", "neighbor_id",
                                             "rank")),
                    batch_format="pandas")
    )

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        qv = df["qv"].to_numpy(np.int64)
        nb = df["neighbor_id"].to_numpy(np.int64)
        rows = []
        for q in np.unique(qv // 2):
            full = set(nb[qv == q * 2])
            halfs = set(nb[qv == q * 2 + 1])
            rows.append((int(q), len(full & halfs)))
        return pd.DataFrame(rows, columns=["query_id", "n_overlap"]) \
            .astype({"query_id": np.int64, "n_overlap": np.int64})

    return merged.map_batches(overlap, batch_format="pandas",
                              batch_size=1 << 30)


_Z_BITS = 21       # bits per dimension in the Morton interleave
_Z_BUCKETS = 16    # top-4-bit z-range buckets


def _morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 2-D Morton (z-order) interleave of two ≤21-bit int
    columns → 42-bit code (x in even bits, y in odd)."""
    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.int64)
        v = (v | (v << 16)) & np.int64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.int64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x3333333333333333)
        v = (v | (v << 1)) & np.int64(0x5555555555555555)
        return v

    return spread(x) | (spread(y) << np.int64(1))


def q_zorder_layout(sf_dir: str):
    """Z-ORDER (Morton-curve) layout analysis — the lakehouse
    OPTIMIZE ZORDER primitive: interleave (l_partkey, l_suppkey) into
    a 42-bit Morton code, bucket rows by the code's top 4 bits (16
    z-ranges — the file boundaries a z-ordered rewrite would cut) and
    report each bucket's row count and per-dimension min/max — the
    ranges that make multi-column data skipping work. Each dimension
    is scaled to the full 21-bit range first (integer
    (v<<21)//(max+1), from a tiny max pre-pass) — raw low-cardinality
    keys would leave the top interleave bits empty and collapse every
    row into bucket 0. Map-side fixed-grid partials (16 rows per
    batch: bincount + min/max.at), one coalesced combine — no key
    exchange at any corpus size. Golden twin interleaves bits with
    per-row Python int arithmetic."""

    def maxes(t: pa.Table) -> pa.Table:
        return pa.table({
            "pkmax": pa.array([int(pc.max(t["l_partkey"]).as_py())],
                              type=pa.int64()),
            "skmax": pa.array([int(pc.max(t["l_suppkey"]).as_py())],
                              type=pa.int64()),
        })

    mx = (
        _tbl(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(maxes, batch_format="pyarrow")
        .to_pandas()  # one row per input block — tiny
    )
    pkmax, skmax = int(mx["pkmax"].max()), int(mx["skmax"].max())
    sref = ray.put((pkmax, skmax))

    def partial(t: pa.Table) -> pa.Table:
        pm, sm = _bget_slot("zorder_maxes", sref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        pq = (pk.astype(np.int64) << np.int64(_Z_BITS)) // (pm + 1)
        sq = (sk.astype(np.int64) << np.int64(_Z_BITS)) // (sm + 1)
        code = _morton2(pq, sq)
        b = (code >> np.int64(2 * _Z_BITS - 4)).astype(np.int64)
        n = np.bincount(b, minlength=_Z_BUCKETS).astype(np.int64)
        pmin = np.full(_Z_BUCKETS, np.iinfo(np.int64).max)
        pmax = np.full(_Z_BUCKETS, np.iinfo(np.int64).min)
        smin = np.full(_Z_BUCKETS, np.iinfo(np.int64).max)
        smax = np.full(_Z_BUCKETS, np.iinfo(np.int64).min)
        np.minimum.at(pmin, b, pk)
        np.maximum.at(pmax, b, pk)
        np.minimum.at(smin, b, sk)
        np.maximum.at(smax, b, sk)
        return pa.table({
            "bucket": pa.array(np.arange(_Z_BUCKETS, dtype=np.int64)),
            "n": pa.array(n), "pmin": pa.array(pmin),
            "pmax": pa.array(pmax), "smin": pa.array(smin),
            "smax": pa.array(smax),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bucket", as_index=False).agg(
            n=("n", "sum"), pk_min=("pmin", "min"), pk_max=("pmax", "max"),
            sk_min=("smin", "min"), sk_max=("smax", "max"))
        g = g[g["n"] > 0]
        return g.astype({c: np.int64 for c in g.columns})

    return (
        _tbl(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
    )


def q_dup_cluster_sizes(sf_dir: str):
    """Dedup DIAGNOSTICS — the histogram a curation run reports before
    committing a dedup policy: sizes of the minhash near-dup clusters
    (connected components over the verified pair set) as
    (cluster_size, n_clusters). Labels come from the shared
    ``_cc_min_labels``; per-cluster sizes are one pair-bounded
    groupby count, and the histogram over sizes is a second tiny
    grid-bounded combine (distinct sizes, not clusters). Everything
    after the pair set is dup-rate bounded."""
    pairs = q_minhash_lsh(sf_dir).materialize()
    sizes = (
        _cc_min_labels(pairs)
        .groupby("lab")
        .aggregate(Count(alias_name="sz"))
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(df["sz"].to_numpy(np.int64),
                         return_counts=True)
        return pd.DataFrame({"cluster_size": u,
                             "n_clusters": c.astype(np.int64)})

    return sizes.map_batches(hist, batch_format="pandas",
                             batch_size=1 << 30)


_COMPACT_TARGET = int(os.environ.get("JCR_COMPACT_TARGET",
                                     str(256 << 10)))  # 256 KiB at
# test SF (the sf0.01 tree totals ~1 MiB — a 1 MiB target packed
# every file into one bin, which tests nothing)


def q_compaction_plan(sf_dir: str):
    """Small-file COMPACTION planning over the crawl's hive-
    partitioned ``image_caption`` tree — the lakehouse OPTIMIZE
    primitive that pairs with the sink's rows_per_file targeting:
    first-fit-decreasing bin packing of the data files under a target
    bin size, reported as (bin_id, n_files, total_bytes). Planning is
    METADATA-bounded driver work by design (a compaction service
    plans over the file listing, never the data — file count scales
    with partitions, not rows); the rewrite a plan drives would be
    one map-only pass per bin. Deterministic: files sort (size desc,
    path asc) before packing. Golden twin re-packs the same listing
    with an independent loop."""
    root = os.path.join(_crawl_out(sf_dir), "image_caption")
    files = []
    for dirpath, _, names in os.walk(root):
        for nm in names:
            if nm.endswith(".parquet"):
                p = os.path.join(dirpath, nm)
                files.append((os.path.relpath(p, root),
                              os.path.getsize(p)))
    files.sort(key=lambda x: (-x[1], x[0]))
    bins: list[list[int]] = []  # [n_files, total_bytes]
    assign: list[int] = []
    for _, size in files:
        for i, b in enumerate(bins):
            if b[1] + size <= _COMPACT_TARGET:
                b[0] += 1
                b[1] += size
                assign.append(i)
                break
        else:
            bins.append([1, size])
            assign.append(len(bins) - 1)
    return pd.DataFrame({
        "bin_id": pd.Series(range(len(bins)), dtype=np.int64),
        "n_files": pd.Series([b[0] for b in bins], dtype=np.int64),
        "total_bytes": pd.Series([b[1] for b in bins], dtype=np.int64),
    })


_BOILER_TOPK = 20


def q_boilerplate_lines(sf_dir: str):
    """Boilerplate detection — the diagnostics pass that motivates
    C4-style line dedup: the top-20 most repeated ``_LINE_W``-word
    lines across the corpus ((line, n), count desc then line asc).
    Per-batch line extraction + np.unique pre-combine, ONE
    (line, count) partial exchange bounded by the distinct-line
    vocabulary — never the corpus text. At 100 TB the distinct-line
    exchange itself gets heavy; the sketch path is the existing
    Misra-Gries ``heavy_hitters_terms`` shape applied to line hashes
    (documented, not needed at bench scale)."""

    def partial(t: pa.Table) -> pa.Table:
        chunks: list[np.ndarray] = []
        for x in t["text"].to_pylist():
            w = x.split(" ")
            chunks.append(np.array(
                [" ".join(w[i:i + _LINE_W])
                 for i in range(0, len(w), _LINE_W)], dtype=object))
        if not chunks:
            return pa.table({"line": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        u, c = np.unique(np.concatenate(chunks), return_counts=True)
        return pa.table({"line": pa.array(u, type=pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    return (
        _bucket_sum(_tbl(sf_dir, "documents", ["text"])
                    .map_batches(partial, batch_format="pyarrow"),
                    "line", "n")
        .sort(["n", "line"], descending=[True, False])
        .limit(_BOILER_TOPK)
        .map_batches(lambda d: d.assign(n=d["n"].astype(np.int64)),
                     batch_format="pandas")
    )


def q_mixture_upsample(sf_dir: str):
    """Language REBALANCING by integer repetition — the data-mixing
    epoch trick (low-resource languages repeat until every language
    reaches the majority count): per-lang factor = ceil(max_n / n),
    each doc emitted with copy_idx 1..factor. One tiny lang-count
    pre-pass broadcast as a factor map; the expansion itself is
    map-only ``np.repeat`` (output bounded by factor × corpus, the
    quantity the mixing recipe chose on purpose)."""
    counts = (
        _tbl(sf_dir, "documents", ["lang"])
        .groupby("lang").aggregate(Count(alias_name="n"))
        .to_pandas()  # one row per language — tiny
    )
    mx = int(counts["n"].max())
    fac = {r.lang: int(np.ceil(mx / r.n)) for r in
           counts.itertuples(index=False)}
    ref = ray.put(fac)

    def expand(t: pa.Table) -> pa.Table:
        fm = _bget_slot("mixture_upsample_fac", ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        langs = t["lang"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(langs)
        f = np.array([fm[u] for u in uniq], dtype=np.int64)[codes]
        rep = np.repeat(ids, f)
        idx = np.concatenate([np.arange(1, k + 1) for k in f]) \
            if len(f) else np.array([], dtype=np.int64)
        return pa.table({"doc_id": pa.array(rep),
                         "copy_idx": pa.array(idx.astype(np.int64))})

    return (
        _tbl(sf_dir, "documents", ["doc_id", "lang"])
        .map_batches(expand, batch_format="pyarrow")
    )


def q_recrawl_schedule(sf_dir: str):
    """Adaptive RECRAWL SCHEDULING from observed change rates — the
    planning loop a production crawler closes (stale sites crawl less,
    churning sites crawl more): per site, the prior crawl's record
    count, the recrawl delta's new-record count, the change rate, and
    the next-crawl interval 24h/(rate+0.01) clamped to [1, 168] h.
    Both inputs are per-site count aggregates (site count is
    config-bounded, so the combine is one tiny task); the expensive
    work — the two crawls — already ran as the recrawl pipeline."""
    prior_dir, delta_dir = _recrawl_dirs(sf_dir)
    pc_ = (
        rd.read_parquet(os.path.join(prior_dir, "job_records"),
                        columns=["site_id"])
        .groupby("site_id").aggregate(Count(alias_name="n_prior"))
    )
    dc_ = (
        rd.read_parquet(os.path.join(delta_dir, "job_records"),
                        columns=["site_id"])
        .groupby("site_id").aggregate(Count(alias_name="n_new"))
    )

    def tag(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "site_id": t["site_id"],
                "n": t[col],
                "is_new": pa.array(np.full(t.num_rows, col == "n_new")),
            })
        return f

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        prior = df[~df["is_new"]].set_index("site_id")["n"]
        new = df[df["is_new"]].set_index("site_id")["n"]
        sites = prior.index.to_numpy()
        n_prior = prior.to_numpy(np.int64)
        n_new = new.reindex(prior.index, fill_value=0) \
            .to_numpy(np.int64)
        rate = n_new / n_prior
        interval = _round_half_up(
            np.minimum(168.0, np.maximum(1.0, 24.0 / (rate + 0.01))), 2)
        out = pd.DataFrame({
            "site_id": sites, "n_prior": n_prior, "n_new": n_new,
            "change_rate": _round_half_up(rate, 4),
            "interval_h": interval,
        }).sort_values("site_id", kind="stable")
        return out.astype({"n_prior": np.int64, "n_new": np.int64})

    return (
        pc_.map_batches(tag("n_prior"), batch_format="pyarrow")
        .union(dc_.map_batches(tag("n_new"), batch_format="pyarrow"))
        .map_batches(combine, batch_format="pandas", batch_size=1 << 30)
    )


def q_percent_rank_docs(sf_dir: str):
    """Global percent_rank over (n_chars, doc_id) — the normalized
    completion of ``global_rank_docs``' sort-free ranking (curriculum
    schedules consume exactly this [0, 1] position): same
    histogram-offset machinery, then pr = (rank−1)/(N−1) with N from
    parquet metadata. All the rank arithmetic is integer; only the
    final division is float, computed identically to the oracle's
    percent_rank()."""
    n = _tbl_rows(sf_dir, "documents")

    def pr(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "pct_rank": pa.array(_round_half_up(
                (r - 1) / (n - 1), 6)),
        })

    return q_global_rank_docs(sf_dir).map_batches(
        pr, batch_format="pyarrow")


def q_geo_mean_prices(sf_dir: str):
    """Geometric + harmonic mean of l_extendedprice per returnflag —
    the multiplicative/rate analytics pair arithmetic mean misstates:
    order-free map partials of (n, Σln x, Σ1/x) per flag, one tiny
    combine, gm = exp(Σln/n), hm = n/Σ(1/x), SQL-rounded to 4 (the
    log/reciprocal sums differ from the oracle's streaming
    accumulation only in last-ulp order effects, absorbed by the
    rounding — the same contract as the corr op)."""

    def partial(t: pa.Table) -> pa.Table:
        f = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(f)
        return pa.table({
            "f": pa.array(np.asarray(uniq, dtype=object),
                          type=pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sln": pa.array(np.bincount(codes, np.log(x))),
            "srec": pa.array(np.bincount(codes, 1.0 / x)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("f", as_index=False).sum() \
            .sort_values("f", kind="stable")
        n = g["n"].to_numpy(np.float64)
        return pd.DataFrame({
            "l_returnflag": g["f"].to_numpy(),
            "n": g["n"].to_numpy(np.int64),
            "geo_mean": _round_half_up(np.exp(g["sln"].to_numpy() / n),
                                       4),
            "harm_mean": _round_half_up(n / g["srec"].to_numpy(), 4),
        })

    return (
        _tbl(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_MIX_ALPHA = 0.7


def q_mixture_weights(sf_dir: str):
    """Temperature-scaled SOURCE SAMPLING WEIGHTS — the multilingual /
    multi-domain mixing formula (w_i = n_i^α / Σ n_j^α, α = 0.7) that
    upweights low-resource sources before an epoch plan is drawn:
    per source its count, weight, and the expected docs per epoch
    (N × w). The heavy side is ONE source-count groupby (source
    cardinality is config-bounded); the power/normalize math is a
    single tiny combine over that dimension-sized table."""
    counts = (
        _tbl(sf_dir, "documents", ["source"])
        .groupby("source").aggregate(Count(alias_name="n"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("source", kind="stable")
        n = df["n"].to_numpy(np.float64)
        p = np.power(n, _MIX_ALPHA)
        w = p / p.sum()
        return pd.DataFrame({
            "source": df["source"].to_numpy(),
            "n": df["n"].to_numpy(np.int64),
            "weight": _round_half_up(w, 6),
            "expected_docs": _round_half_up(n.sum() * w, 0)
            .astype(np.int64),
        })

    return counts.map_batches(finish, batch_format="pandas",
                              batch_size=1 << 30)


_COV_KS = (10, 100, 1000)


def q_vocab_coverage(sf_dir: str):
    """Tokenizer VOCABULARY COVERAGE curve — for each candidate vocab
    size K, the fraction of corpus token OCCURRENCES the top-K most
    frequent tokens cover (the curve a tokenizer budget decision reads
    off). Per-batch np.unique term-frequency partials, ONE
    vocab-bounded (term, n) groupby, then sort-desc/limit(max K) —
    top-K extraction never materializes the tail — and a single tiny
    cumsum combine. The corpus total rides the same partials (summed
    over the full vocab table map-side) so no second text scan."""
    counts = (
        _bucket_sum(_tbl(sf_dir, "documents", ["text"])
                    .map_batches(_tf_partial, batch_format="pyarrow"),
                    "w", "n")
        .materialize()  # vocab-bounded; feeds both total and top-K
    )
    total = int(counts.sum("n"))
    kmax = max(_COV_KS)
    top = counts.sort(["n", "w"], descending=[True, False]).limit(kmax)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        c = np.cumsum(df["n"].to_numpy(np.int64))
        ks = np.array(_COV_KS, dtype=np.int64)
        cov = np.array(
            [c[min(int(k), len(c)) - 1] if len(c) else 0 for k in ks],
            dtype=np.int64)
        return pd.DataFrame({
            "k": ks, "covered": cov,
            "total": np.full(len(ks), total, dtype=np.int64),
            "coverage": _round_half_up(cov / total, 6),
        })

    return top.map_batches(finish, batch_format="pandas",
                           batch_size=1 << 30)


def _tf_partial(t: pa.Table) -> pa.Table:
    """Per-batch corpus term-frequency partial: (token, count)."""
    toks: list[np.ndarray] = []
    for x in t["text"].to_pylist():
        toks.append(np.array(x.split(" "), dtype=object))
    if not toks:
        return pa.table({"w": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    u, c = np.unique(np.concatenate(toks), return_counts=True)
    return pa.table({"w": pa.array(u, type=pa.string()),
                     "n": pa.array(c.astype(np.int64))})


def q_copurchase_jaccard(sf_dir: str):
    """Neighborhood-Jaccard LINK PREDICTION over the co-purchase
    graph: for every support≥2 pair from ``_copurchase_edges``,
    jacc = co / (deg_a + deg_b − co) where deg is the part's distinct
    order count. Degrees reuse the SAME orderkey co-partition as the
    edge kernel (an order's rows land in one bucket, so the in-bucket
    dedup is globally exact) and the part-indexed degree vector is
    dimension-bounded — broadcast once via ray.put and applied to the
    support-bounded edge stream with two searchsorted lookups."""
    parts_n = _copart_count(_tbl_rows(sf_dir, "lineitem"))

    def bucket_deg(df: pd.DataFrame) -> pd.DataFrame:
        _, pk = _distinct_order_part(df)
        u, c = np.unique(pk, return_counts=True)
        return pd.DataFrame({"pkey": u, "d": c.astype(np.int64),
                             "ppart": (u % parts_n).astype(np.int64)})

    def deg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pkey", as_index=False)["d"].sum()

    # coarse part-hash co-partition + bucket-local sum — NOT
    # Dataset.aggregate, whose sort-based path measured 217 s at 200k
    # distinct parts (2.3M partial rows) where this combine takes ~2 s
    # (the _copurchase_edges pair_bucket idiom)
    deg = (
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(_copurchase_tag(parts_n), batch_format="pyarrow")
        .groupby("part", num_partitions=parts_n)
        .map_groups(bucket_deg, batch_format="pandas")
        .groupby("ppart", num_partitions=parts_n)
        .map_groups(deg_bucket, batch_format="pandas")
        .to_pandas()  # one row per part — dimension-bounded
    )
    keys = deg["pkey"].to_numpy(np.int64)
    order_ = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order_],
                   deg["d"].to_numpy(np.int64)[order_]))

    def jacc(t: pa.Table) -> pa.Table:
        dk, dv = _bget_slot("copurchase_deg", ref)
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        co = t["n_orders"].to_numpy(zero_copy_only=False)
        da = dv[np.searchsorted(dk, a)]
        db = dv[np.searchsorted(dk, b)]
        return pa.table({
            "part_a": t["part_a"], "part_b": t["part_b"],
            "n_orders": t["n_orders"],
            "jacc": pa.array(_round_half_up(co / (da + db - co), 6)),
        })

    return _copurchase_edges(sf_dir).map_batches(
        jacc, batch_format="pyarrow")


# zonemap predicate window + orderkey row-group surrogate width
_ZM_LO = "1996-03-01"
_ZM_HI = "1996-09-30"
_ZM_OK_WIDTH = 256


def q_zonemap_prune(sf_dir: str):
    """ZONE-MAP PRUNING estimate for a layout A/B decision — the scan
    planner's side of ``zorder_layout``: per candidate layout
    (natural ``l_orderkey // 256`` row groups vs 31-day shipdate
    clustering), the per-bucket min/max zonemaps of ``l_shipdate``
    and how much of the table a fixed date-range predicate would
    actually scan. ONE pruned read; per-batch (layout, bucket,
    n, min, max) partials; the combine groupby is bucket-count-
    bounded, and the prune evaluation is a tiny final pass. The
    clustered layout prunes ~90% where the natural layout prunes
    nothing — the number that justifies a re-layout job."""
    lo = np.int64(pd.Timestamp(_ZM_LO).value // 1000)
    hi = np.int64(pd.Timestamp(_ZM_HI).value // 1000)

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sd = t["l_shipdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        out = {"layout": [], "bucket": [], "n": [], "mn": [], "mx": []}
        for layout, bk in (
                ("orderkey", ok // _ZM_OK_WIDTH),
                ("shipdate", (sd // np.int64(2678400000000)))):
            # clustered surrogate: fixed 31-day epoch grid — the
            # oracle uses the identical `us // 2678400000000`
            u, inv = np.unique(bk, return_inverse=True)
            out["layout"].extend([layout] * len(u))
            out["bucket"].extend(u.tolist())
            out["n"].extend(np.bincount(inv).astype(np.int64).tolist())
            mn = np.full(len(u), np.iinfo(np.int64).max)
            np.minimum.at(mn, inv, sd)
            mx = np.full(len(u), np.iinfo(np.int64).min)
            np.maximum.at(mx, inv, sd)
            out["mn"].extend(mn.tolist())
            out["mx"].extend(mx.tolist())
        return pa.table({
            "layout": pa.array(out["layout"], type=pa.string()),
            "bucket": pa.array(out["bucket"], type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
            "mn": pa.array(out["mn"], type=pa.int64()),
            "mx": pa.array(out["mx"], type=pa.int64()),
        })

    agg = (
        _tbl(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["layout", "bucket"])
        .aggregate(Sum("n", alias_name="n"),
                   Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"))
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pruned = (df["mx"].to_numpy(np.int64) < lo) \
            | (df["mn"].to_numpy(np.int64) > hi)
        df = df.assign(pruned=pruned)
        g = df.groupby("layout", as_index=False).agg(
            n_buckets=("bucket", "size"),
            n_pruned=("pruned", "sum"),
            rows_total=("n", "sum"),
        )
        scanned = df[~df["pruned"]].groupby("layout", as_index=False) \
            .agg(rows_scanned=("n", "sum"))
        g = g.merge(scanned, on="layout", how="left")
        g["rows_scanned"] = g["rows_scanned"].fillna(0)
        return pd.DataFrame({
            "layout": g["layout"].to_numpy(),
            "n_buckets": g["n_buckets"].to_numpy(np.int64),
            "n_pruned": g["n_pruned"].to_numpy(np.int64),
            "rows_total": g["rows_total"].to_numpy(np.int64),
            "rows_scanned": g["rows_scanned"].to_numpy(np.int64),
            "scan_frac": _round_half_up(
                g["rows_scanned"].to_numpy(np.float64)
                / g["rows_total"].to_numpy(np.float64), 6),
        })

    return agg.map_batches(finish, batch_format="pandas",
                           batch_size=1 << 30)


def q_incremental_agg_merge(sf_dir: str):
    """Materialized-view DELTA MAINTENANCE — the incremental-refresh
    contract: a per-user (count, Σvalue) state aggregated over events
    at or before the watermark−14d cutoff, MERGED with the delta
    aggregated over events after it, must equal the full recompute
    (the oracle). Both legs are row-group-filter-pushed reads sharing
    one partial kernel; the merge is the order-free union of partials
    into one user-keyed groupby — the shape that lets a 100 TB MV
    refresh touch only the delta's row groups."""
    import pyarrow.dataset as pads

    wm = _max_ts(_tbl(sf_dir, "events", ["ts"]), "ts") \
        - pd.Timedelta(days=14)
    cut = wm.to_pydatetime()

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(u)
        return pa.table({
            "user_id": pa.array(np.asarray(uniq, dtype=np.int64)),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sv": pa.array(np.bincount(codes, v)),
        })

    cols = ["user_id", "value"]
    state = _tbl(sf_dir, "events", cols + ["ts"],
                 filter=pads.field("ts") <= cut) \
        .map_batches(partial, batch_format="pyarrow")
    delta = _tbl(sf_dir, "events", cols + ["ts"],
                 filter=pads.field("ts") > cut) \
        .map_batches(partial, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_events": df["n"].to_numpy(np.int64),
            "sum_value": _round_half_up(df["sv"].to_numpy(), 4),
        })

    return (
        state.union(delta)
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"))
        .map_batches(finish, batch_format="pandas")
    )


_LM_K = 0.5  # add-k smoothing


def q_bigram_lm_score(sf_dir: str):
    """TRAIN-AND-APPLY bigram language-model scoring — the quality
    signal CCNet-style pipelines compute with a real LM, here with an
    add-k bigram model so both sides are exactly derivable: train on
    even doc_ids, score odd doc_ids with per-doc mean negative log
    prob of P(w2|w1) = (c12 + k)/(c1 + kV). The count table is built
    with per-batch np.unique partials + ONE bigram-vocab-bounded
    groupby; the fitted model (sorted bigram/context arrays + V) is
    the broadcast — it IS the model, the same contract as bpe_encode's
    merge table — and scoring is map-only searchsorted lookups. At
    100 TB the count table gets a min-count prune before broadcast
    (the standard LM cutoff); the scoring pass is unchanged."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text"])

    def train_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 0))

    _BLM_PARTS = 32

    def big_partial(t: pa.Table) -> pa.Table:
        # ONE tokenize pass feeds BOTH partials: kind=1 rows are
        # (bigram, count); kind=0 rows are the batch's DISTINCT
        # unigrams (the vocab size V is all the model needs from
        # them — a separate _tf_partial scan re-read the training
        # half just for that one integer). The "\x1f" join is the
        # corpus contract the whole text family assumes: tokens are
        # space-split and carry no control characters.
        w1s: list[np.ndarray] = []
        w2s: list[np.ndarray] = []
        toks: list[np.ndarray] = []
        for x in t["text"].to_pylist():
            w = x.split(" ")
            arr = np.array(w, dtype=str)
            toks.append(arr)  # ALL tokens — V counts 1-token docs too
            if len(w) < 2:
                continue
            w1s.append(arr[:-1])
            w2s.append(arr[1:])
        if not toks:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "kind": pa.array([], type=pa.int64()),
                             "part": pa.array([], type=pa.int64())})
        uni = np.unique(np.concatenate(toks))
        if w1s:
            key = np.char.add(np.char.add(
                np.concatenate(w1s), "\x1f"), np.concatenate(w2s))
            u, c = np.unique(key, return_counts=True)
        else:
            u = np.array([], dtype=str)
            c = np.array([], dtype=np.int64)
        bgk = np.concatenate([u, uni])
        n = np.concatenate([c.astype(np.int64),
                            np.ones(len(uni), dtype=np.int64)])
        kind = np.concatenate([np.ones(len(u), dtype=np.int64),
                               np.zeros(len(uni), dtype=np.int64)])
        # coarse hash co-partition + bucket-local sum instead of
        # Dataset.aggregate — its sort-based path measured 27 s at
        # 235k distinct bigrams where the bucket combine takes ~3 s
        # (the _copurchase_edges / DF-vocab idiom)
        part = (pd.util.hash_array(bgk.astype(object))
                % _BLM_PARTS).astype(np.int64)
        return pa.table({"bg": pa.array(bgk, type=pa.string()),
                         "n": pa.array(n),
                         "kind": pa.array(kind),
                         "part": pa.array(part)})

    def bg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["kind", "bg"], as_index=False)["n"].sum()

    train = docs.map_batches(train_only, batch_format="pyarrow")
    model = (
        train.map_batches(big_partial, batch_format="pyarrow")
        .groupby("part", num_partitions=_BLM_PARTS)
        .map_groups(bg_bucket, batch_format="pandas")
        .to_pandas()  # the fitted model — bigram-vocab bounded
    )
    is_bg = model["kind"].to_numpy(np.int64) == 1
    vocab = int((~is_bg).sum())  # hash buckets partition the vocab:
    # each distinct unigram lands (deduped) in exactly one bucket
    bg = model[is_bg]
    keys = bg["bg"].to_numpy(str)
    cnt = bg["n"].to_numpy(np.int64)
    order_ = np.argsort(keys, kind="stable")
    keys, cnt = keys[order_], cnt[order_]
    # context counts c1(w1) = Σ_w2 c12, from the same table
    w1 = np.char.partition(keys, "\x1f")[:, 0]
    cu, cinv = np.unique(w1, return_inverse=True)
    c1 = np.bincount(cinv, cnt).astype(np.int64)
    ref = ray.put((keys, cnt, cu, c1, vocab))

    def score(t: pa.Table) -> pa.Table:
        # ONE vectorized lookup pass over the whole batch's bigrams
        # (the per-doc loop variant measured 32 s / 6.2k docs/s at
        # docstress; batch-level searchsorted + bincount-segmented
        # means is the same math in corpus-sized numpy calls)
        bk, bc, ck, cc_, v = _bget_slot("bigram_lm_model", ref)
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_bigrams": pa.array([], type=pa.int64()),
                          "nll": pa.array([], type=pa.float64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        w1s: list[np.ndarray] = []
        w2s: list[np.ndarray] = []
        did: list[int] = []
        nb: list[int] = []
        for did_, x in zip(ids, t["text"].to_pylist()):
            if did_ % 2 == 0:
                continue
            w = x.split(" ")
            if len(w) < 2:
                continue
            arr = np.array(w, dtype=str)
            w1s.append(arr[:-1])
            w2s.append(arr[1:])
            did.append(int(did_))
            nb.append(len(w) - 1)
        if not did:
            return empty
        w1 = np.concatenate(w1s)
        key = np.char.add(np.char.add(w1, "\x1f"), np.concatenate(w2s))
        if len(bk):
            bi = np.minimum(np.searchsorted(bk, key), len(bk) - 1)
            c12 = np.where(bk[bi] == key, bc[bi], 0)
        else:
            c12 = np.zeros(len(key), dtype=np.int64)
        if len(ck):
            ci = np.minimum(np.searchsorted(ck, w1), len(ck) - 1)
            c1v = np.where(ck[ci] == w1, cc_[ci], 0)
        else:
            c1v = np.zeros(len(key), dtype=np.int64)
        lp = np.log((c12 + _LM_K) / (c1v + _LM_K * v))
        nbv = np.array(nb, dtype=np.int64)
        seg = np.repeat(np.arange(len(did)), nbv)
        nll = -np.bincount(seg, lp) / nbv
        return pa.table({
            "doc_id": pa.array(np.array(did, dtype=np.int64)),
            "n_bigrams": pa.array(nbv),
            "nll": pa.array(_round_half_up(nll, 4)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


_BITEXT_TOPK = 4
_BITEXT_TAU = 1.05


def q_bitext_mine(sf_dir: str):
    """Margin-based BITEXT MINING (the LASER/CCMatrix alignment
    primitive): vectors split by vec_id parity into source A / target
    B; each a ∈ A takes its best cosine match b₁ ∈ B with margin =
    cos(a,b₁) / mean(cos over a's top-4), keeping pairs whose rounded
    margin ≥ 1.05. A streams through map_batches against the
    normalized broadcast B matrix (one matmul + argpartition per
    batch, map-only — no shuffle). This is the exactness-oracle
    kernel, same contract as ``embedding_neardup``: above a broadcast
    budget the in-family ANN machinery (``embedding_neardup_ann``'s
    hyperplane-LSH buckets) supplies the candidate set and this
    kernel re-ranks candidates only."""
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    bsel = ids % 2 == 1
    bids_all = ids[bsel]
    bmat_all = _norm_rows(_emb_matrix(t["embedding"])[bsel])
    border = np.argsort(bids_all, kind="stable")  # ascending target
    # ids — the tie-break below and the golden's stable row-order
    # tie pick both reduce to "first row" under this order
    bref = ray.put((bids_all[border], bmat_all[border]))

    def mine(t: pa.Table) -> pa.Table:
        bids, bmat = _bget_slot("bitext_b", bref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        asel = ids % 2 == 0
        empty = pa.table({
            "src_id": pa.array([], type=pa.int64()),
            "tgt_id": pa.array([], type=pa.int64()),
            "margin": pa.array([], type=pa.float64())})
        if not asel.any() or len(bids) < _BITEXT_TOPK:
            return empty
        amat = _norm_rows(_emb_matrix(t["embedding"]))[asel]
        sims = amat @ bmat.T
        best_sim = sims.max(axis=1)
        # tie-break: equal best cosine → smallest target id. bids are
        # ascending (sorted at broadcast), so the FIRST column hitting
        # the max IS the min-id tie winner — the same pick the
        # golden's stable descending argsort makes, for ANY tie
        # multiplicity. The top-4 mean uses partitioned VALUES, which
        # tie membership cannot change (tied members are equal).
        tgt = bids[np.argmax(sims == best_sim[:, None], axis=1)]
        top4 = np.partition(sims, -_BITEXT_TOPK,
                            axis=1)[:, -_BITEXT_TOPK:]
        margin = _round_half_up(best_sim / top4.mean(axis=1), 4)
        keep = margin >= _BITEXT_TAU
        return pa.table({
            "src_id": pa.array(ids[asel][keep]),
            "tgt_id": pa.array(tgt[keep]),
            "margin": pa.array(margin[keep]),
        })

    # batch_size bounds the per-task sims matrix (batch × |B| × 8 B):
    # 256 rows × a 100k-vector target side ≈ 200 MB transient
    return _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(mine, batch_format="pyarrow", batch_size=256)


_PAD_GRID = 64  # length-bucket grid for inference batching


def q_padding_efficiency(sf_dir: str):
    """LENGTH-BUCKETED BATCHING efficiency — the padding-waste audit
    an inference service runs before fixing its bucket grid: docs
    bucket by ceil(n_tokens / 64), and per bucket the report gives
    sequence count, true max length, the bucket cap, total padded
    tokens at that cap, and the packing efficiency. Per-batch
    np.unique partials over the fixed grid; the combine groupby is
    bucket-count bounded (≤ max_len/64 keys at any corpus size)."""

    def partial(t: pa.Table) -> pa.Table:
        ntok = np.array([len(x.split(" ")) for x in
                         t["text"].to_pylist()], dtype=np.int64)
        bk = (ntok + _PAD_GRID - 1) // _PAD_GRID
        u, inv = np.unique(bk, return_inverse=True)
        mx = np.zeros(len(u), dtype=np.int64)
        np.maximum.at(mx, inv, ntok)
        return pa.table({
            "bucket": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "st": pa.array(np.bincount(inv, ntok).astype(np.int64)),
            "mx": pa.array(mx),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bucket"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        st = df["st"].to_numpy(np.int64)
        cap = b * _PAD_GRID
        return pd.DataFrame({
            "bucket": b, "n_seqs": n,
            "max_tokens": df["mx"].to_numpy(np.int64),
            "cap": cap, "padded_tokens": n * cap - st,
            "efficiency": _round_half_up(st / (n * cap), 6),
        })

    return (
        _tbl(sf_dir, "documents", ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("st", alias_name="st"),
                   Max("mx", alias_name="mx"))
        .map_batches(finish, batch_format="pandas")
    )


def q_attribution_last_touch(sf_dir: str):
    """LAST-TOUCH REVENUE ATTRIBUTION — the marketing-analytics
    classic: every purchase credits the same user's most recent click
    at or before it, and credited revenue rolls up by the CLICK's
    day. Same custom-operator shape as ``asof_join_clicks`` (map-side
    type prune → ONE user-hash co-partition → per-partition C-speed
    ``merge_asof``), but each partition emits per-day PARTIALS so the
    final exchange is day-count bounded, not purchase-count bounded
    (the windowed_events combiner pattern). Inner semantics —
    purchases before a user's first click are unattributed and
    drop."""
    ev = _tbl(sf_dir, "events", ["ts", "user_id", "event_type",
                                 "value"])
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array(["purchase", "click"])))
        return _append_user_part(t, parts)

    def attrib(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == "purchase"]
        right = df[df["event_type"] == "click"]
        empty = pd.DataFrame({
            "click_day": pd.Series([], dtype="datetime64[us]"),
            "n": pd.Series([], dtype=np.int64),
            "sv": pd.Series([], dtype=np.float64)})
        if left.empty or right.empty:
            return _arrow_out(empty)
        right = pd.DataFrame({"ts": right["ts"],
                              "user_id": right["user_id"],
                              "click_ts": right["ts"]})
        m = pd.merge_asof(
            left[["user_id", "ts", "value"]].sort_values(
                "ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction="backward")
        m = m.dropna(subset=["click_ts"])
        if m.empty:
            return _arrow_out(empty)
        g = m.assign(click_day=m["click_ts"].dt.floor("D")) \
            .groupby("click_day", as_index=False) \
            .agg(n=("value", "size"), sv=("value", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return _arrow_out(g)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("click_day", as_index=False).agg(
            n=("n", "sum"), sv=("sv", "sum"))
        return pd.DataFrame({
            "click_day": g["click_day"],
            "n_purchases": g["n"].to_numpy(np.int64),
            "attributed_value": _round_half_up(g["sv"].to_numpy(), 4),
        })

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("part", num_partitions=parts)
        .map_groups(attrib, batch_format="pandas")
        .map_batches(merge, batch_format="pandas", batch_size=1 << 30)
    )


def q_class_cohesion(sf_dir: str):
    """LABEL-QUALITY QA over the embedding table (dataset-cartography
    style): per label, the mean cosine of its members to the class
    centroid — low cohesion flags mislabeled or heterogeneous
    classes before a training run trusts the labels. Two map-only
    passes: (1) per-batch per-label partial sums of the normalized
    vectors (the exchange is label-count × dim, never corpus-sized),
    combined and normalized on the driver, broadcast; (2) per-vector
    cosine against its own class centroid, reduced through the same
    label-bounded partial shape. Rounded 4 — the order-free float-sum
    contract the corr/geo-mean family documents."""
    d = _emb_dim(sf_dir)

    def cent_partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _norm_rows(_emb_matrix(t["embedding"]))
        codes, uniq = pd.factorize(lab)
        sums = np.zeros((len(uniq), d))
        np.add.at(sums, codes, mat)
        return pa.table({
            "label": pa.array(uniq),
            "vec": pa.array(list(sums), type=pa.list_(pa.float64())),
        })

    parts = (
        _tbl(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(cent_partial, batch_format="pyarrow")
        .to_pandas()  # label-count × dim — tiny
    )
    labs = np.sort(parts["label"].unique()).astype(np.int64)
    cents = np.zeros((len(labs), d))
    li = np.searchsorted(labs, parts["label"].to_numpy(np.int64))
    np.add.at(cents, li, np.stack(parts["vec"].to_numpy()))
    cref = ray.put((labs, _norm_rows(cents)))

    def cos_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "sc": pa.array([], type=pa.float64())})
        cl, cm = _bget_slot("class_cohesion_cents", cref)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _norm_rows(_emb_matrix(t["embedding"]))
        idx = np.searchsorted(cl, lab)
        cos = np.einsum("ij,ij->i", mat, cm[idx])
        codes, uniq = pd.factorize(lab)
        return pa.table({
            "label": pa.array(uniq),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sc": pa.array(np.bincount(codes, cos)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).agg(
            n=("n", "sum"), sc=("sc", "sum"))
        return pd.DataFrame({
            "label": g["label"].to_numpy(np.int64),
            "n": g["n"].to_numpy(np.int64),
            "cohesion": _round_half_up(
                g["sc"].to_numpy() / g["n"].to_numpy(np.float64), 4),
        })

    return (
        _tbl(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(cos_partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


# shard count: fixed for the oracle comparison at test scale; a real
# export sizes it as ceil(corpus_bytes / target_shard_bytes)
_WDS_SHARDS = int(os.environ.get("JCR_WDS_SHARDS", "8"))


def q_webdataset_shards(sf_dir: str):
    """WebDataset-style EXPORT packaging — the tar-shard layout GPU
    training jobs stream (image + caption members interleaved per
    sample key): images hash-assign to shards, each shard's members
    sort by image_id and pack into ONE deterministic tar (USTAR,
    zeroed metadata — see ``functions/wds.py``), reported as
    (shard_id, n_samples, tar_bytes, tar_sha256). One groupby to
    co-locate a shard's members; the tar build is a per-shard
    map_groups task — at 100 TB shard count scales with corpus /
    target-shard-size and each task streams one tar to object
    storage (here the report row carries the digest, not the
    archive). Rows-only; sequential golden packs the oracle crawl's
    images with independent grouping."""
    import hashlib

    from ..functions.wds import build_wds_tar

    out = _crawl_out(sf_dir)
    ds = rd.read_parquet(os.path.join(out, "image_caption"),
                         columns=["image_id", "bytes", "caption"])

    def tag(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        shard = np.array([hash64(i) % _WDS_SHARDS for i in ids],
                         dtype=np.int64)
        return t.append_column("shard", pa.array(shard))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("image_id", kind="stable")
        tar = build_wds_tar(list(zip(df["image_id"], df["bytes"],
                                     df["caption"])))
        return pd.DataFrame({
            "shard_id": pd.Series([int(df["shard"].iloc[0])],
                                  dtype=np.int64),
            "n_samples": pd.Series([len(df)], dtype=np.int64),
            "tar_bytes": pd.Series([len(tar)], dtype=np.int64),
            "tar_sha256": [hashlib.sha256(tar).hexdigest()],
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("shard", num_partitions=_WDS_SHARDS)
        .map_groups(pack, batch_format="pandas")
    )


_WDD_GAP_US = 600_000_000  # 10-minute debounce window


def q_window_dedup(sf_dir: str):
    """STREAMING DEBOUNCE dedup — the event-stream throttle (alerting
    / telemetry dedup): an event survives if it is the first of its
    (user, event_type) or arrives ≥ 10 min after the previous event
    of that key. Same cogroup shape as the asof family: user-hash
    co-partition (a user's history fits its partition — the
    documented assumption), then ONE vectorized lexsort + shifted-ts
    compare per partition; the gap test is exact integer
    microseconds. Emits the surviving event rows."""
    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type"])
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _arrow_out(pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "event_type": pd.Series([], dtype=str),
                "ts": pd.Series([], dtype="datetime64[us]")}))
        u = df["user_id"].to_numpy(np.int64)
        ty, _ = pd.factorize(df["event_type"])
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order_ = np.lexsort((eid, ts, ty, u))
        us, tys, tss = u[order_], ty[order_], ts[order_]
        new = np.ones(len(us), dtype=bool)
        new[1:] = (us[1:] != us[:-1]) | (tys[1:] != tys[:-1])
        gap = np.empty(len(us), dtype=np.int64)
        gap[0] = _WDD_GAP_US
        gap[1:] = tss[1:] - tss[:-1]
        kept = new | (gap >= _WDD_GAP_US)
        out = df.iloc[order_[kept]]
        return _arrow_out(out[["event_id", "user_id", "event_type",
                               "ts"]])

    return (
        ev.map_batches(_append_user_part_t, batch_format="pyarrow",
                       fn_args=(parts,))
        .groupby("part", num_partitions=parts)
        .map_groups(keep, batch_format="pandas")
    )


def _append_user_part_t(t: pa.Table, parts: int) -> pa.Table:
    return _append_user_part(t, parts)


def q_dup_rate_by_source(sf_dir: str):
    """Per-source DUPLICATE RATE — the 'which source is dirty'
    diagnostic a curation run reads before assigning crawl budget:
    minhash near-dup drop rate broken down by document source.
    Composes the existing scale-safe pieces end-to-end: verified pair
    set → distributed CC drop set (``_cc_drop_ds``) → size-dispatched
    anti-join (``_keep_corpus``) → source-bounded count combine of
    total vs kept. Nothing new lands on the driver; the only new
    exchange is the two dimension-bounded source groupbys."""
    drops = _cc_drop_ds(q_minhash_lsh(sf_dir).materialize())
    docs = _tbl(sf_dir, "documents", ["doc_id", "source"])

    def tag(flag: bool):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "source": t["source"],
                "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "is_kept": pa.array(np.full(t.num_rows, flag)),
            })
        return f

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "is_kept"], as_index=False)["n"] \
            .sum().pivot(index="source", columns="is_kept",
                         values="n").reset_index()
        total = g.get(False, pd.Series(0, index=g.index)) \
            .fillna(0).to_numpy(np.int64)
        kept = g.get(True, pd.Series(0, index=g.index)) \
            .fillna(0).to_numpy(np.int64)
        return pd.DataFrame({
            "source": g["source"].to_numpy(),
            "n_docs": total,
            "n_dups": total - kept,
            "dup_rate": _round_half_up((total - kept) / total, 4),
        })

    return (
        docs.map_batches(tag(False), batch_format="pyarrow")
        .union(_keep_corpus(docs, "doc_id", drops)
               .map_batches(tag(True), batch_format="pyarrow"))
        .map_batches(lambda d: d.groupby(["source", "is_kept"],
                                         as_index=False)["n"].sum(),
                     batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_RFM_K = 5


def _ntile_ranks(order_: np.ndarray, k: int) -> np.ndarray:
    """SQL NTILE(k) tiles (1-based) for rows given their sort order
    (``order_[i]`` = row index of sorted position i) — first n%k
    tiles take ceil(n/k) rows, the q_ntile_docs arithmetic shared by
    every ntile consumer."""
    n = len(order_)
    base, rem = divmod(n, k)
    big = (base + 1) * rem
    r = np.empty(n, dtype=np.int64)
    r[order_] = np.arange(n)
    return np.where(r < big, r // max(base + 1, 1),
                    rem + (r - big) // max(base, 1)) + 1


def q_rfm_scores(sf_dir: str):
    """RFM CUSTOMER SEGMENTATION — the warehouse classic: per
    customer, recency (days since their last order, vs the corpus
    max date), frequency (order count), monetary (total spend), each
    scored into NTILE(5) quintiles (1 = most recent / most frequent /
    highest spend). The fact scan folds to per-customer partials
    map-side; the quintile assignment runs in ONE coalesced batch
    over the aggregate — customer is the DIMENSION (the documented
    boundedness assumption; at 10⁸+ customers the ntile flips to the
    global-rank histogram machinery like percent_rank_docs)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(c)
        mx = np.full(len(uniq), np.iinfo(np.int64).min)
        np.maximum.at(mx, codes, d)
        return pa.table({
            "custkey": pa.array(np.asarray(uniq, dtype=np.int64)),
            "last_us": pa.array(mx),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sv": pa.array(np.bincount(codes, v)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("custkey", as_index=False).agg(
            last_us=("last_us", "max"), n=("n", "sum"),
            sv=("sv", "sum"))
        cust = g["custkey"].to_numpy(np.int64)
        last = g["last_us"].to_numpy(np.int64)
        rec = (last.max() - last) // 86_400_000_000
        freq = g["n"].to_numpy(np.int64)
        mon = _round_half_up(g["sv"].to_numpy(), 2)
        r_s = _ntile_ranks(np.lexsort((cust, rec)), _RFM_K)
        f_s = _ntile_ranks(np.lexsort((cust, -freq)), _RFM_K)
        m_s = _ntile_ranks(np.lexsort((cust, -mon)), _RFM_K)
        return pd.DataFrame({
            "custkey": cust, "recency_days": rec, "frequency": freq,
            "monetary": mon, "r_score": r_s, "f_score": f_s,
            "m_score": m_s,
        })

    return (
        _tbl(sf_dir, "orders",
             ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_ab_test_welch(sf_dir: str):
    """A/B significance testing — Welch's unequal-variance t between
    the 'click' and 'purchase' value populations (the experiment
    readout every event pipeline ends in): n/mean/t-statistic and the
    Welch–Satterthwaite df. Map-side (group, n, Σx, Σx²) partials —
    a 2×4 exchange at ANY corpus size — one tiny combine; the
    moment-based var_samp meets the oracle under the round(4)
    contract."""

    def partial(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        out = {"grp": [], "n": [], "sx": [], "sxx": []}
        for g in ("click", "purchase"):
            m = ty == g
            out["grp"].append(g)
            out["n"].append(int(m.sum()))
            out["sx"].append(float(v[m].sum()))
            out["sxx"].append(float((v[m] * v[m]).sum()))
        return pa.table({
            "grp": pa.array(out["grp"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "sx": pa.array(out["sx"]),
            "sxx": pa.array(out["sxx"]),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("grp").sum()
        na, nb = int(g.loc["click", "n"]), int(g.loc["purchase", "n"])
        ma = g.loc["click", "sx"] / na
        mb = g.loc["purchase", "sx"] / nb
        va = (g.loc["click", "sxx"] - na * ma * ma) / (na - 1)
        vb = (g.loc["purchase", "sxx"] - nb * mb * mb) / (nb - 1)
        se2 = va / na + vb / nb
        t_stat = (ma - mb) / np.sqrt(se2)
        dof = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                          + (vb / nb) ** 2 / (nb - 1))
        return pd.DataFrame({
            "n_a": pd.Series([na], dtype=np.int64),
            "n_b": pd.Series([nb], dtype=np.int64),
            "mean_a": _round_half_up(np.array([ma]), 4),
            "mean_b": _round_half_up(np.array([mb]), 4),
            "t_stat": _round_half_up(np.array([t_stat]), 4),
            "welch_df": _round_half_up(np.array([dof]), 4),
        })

    return (
        _tbl(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_KL_SMOOTH = 0.5


def q_source_kl_divergence(sf_dir: str):
    """DOMAIN-SHIFT diagnostic — per-source KL divergence of the
    add-k-smoothed unigram distribution against the corpus
    distribution (the 'how far is this source from the mix' score
    data-mixing decisions read): KL(p_s ‖ q) over the full corpus
    vocabulary. The ONE exchange is the (source, token) count
    partials — (sources × vocab)-bounded, the same contract as the
    DF/vocab family (heavy-hitter sketch is the 100 TB path) — and
    the smoothed-grid evaluation is a dense (S × V) numpy pass in
    one coalesced combine."""

    def partial(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        toks: list[np.ndarray] = []
        for s, x in zip(t["source"].to_pylist(),
                        t["text"].to_pylist()):
            w = np.array(x.split(" "), dtype=object)
            srcs.append(s)
            toks.append(w)
        if not srcs:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        src_arr = np.repeat(np.array(srcs, dtype=object),
                            [len(x) for x in toks])
        tok_arr = np.concatenate(toks)
        key = pd.DataFrame({"source": src_arr, "w": tok_arr})
        g = key.groupby(["source", "w"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "w": pa.array(g["w"], type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["n"].sum()
        scodes, suniq = pd.factorize(g["source"])
        wcodes, wuniq = pd.factorize(g["w"])
        S, V = len(suniq), len(wuniq)
        mat = np.zeros((S, V))
        mat[scodes, wcodes] += g["n"].to_numpy(np.int64)
        ns = mat.sum(axis=1, keepdims=True)
        cg = mat.sum(axis=0, keepdims=True)
        p = (mat + _KL_SMOOTH) / (ns + _KL_SMOOTH * V)
        q = (cg + _KL_SMOOTH) / (cg.sum() + _KL_SMOOTH * V)
        kl = (p * np.log(p / q)).sum(axis=1)
        order_ = np.argsort(np.asarray(suniq, dtype=object),
                            kind="stable")
        return pd.DataFrame({
            "source": np.asarray(suniq, dtype=object)[order_],
            "kl": _round_half_up(kl[order_], 4),
        })

    return (
        _tbl(sf_dir, "documents", ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_HNEG_ROUND = 4


def q_hard_negatives(sf_dir: str):
    """TRIPLET HARD-NEGATIVE MINING over the labeled embedding table
    (metric-learning data prep): for each even-id anchor, its nearest
    same-label neighbor (the positive) and nearest different-label
    neighbor (the hard negative), with both cosines — negatives that
    outscore positives flag label noise or hard training pairs.
    Anchors stream through map_batches against the broadcast
    normalized corpus (the exactness-oracle kernel, same contract as
    ``bitext_mine``: id-sorted broadcast ⇒ the argmax-first tie-break
    IS the min-id pick; the in-family ANN machinery supplies
    candidates past the broadcast budget)."""
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding", "label"])
    ids = t["vec_id"].to_numpy()
    labs = t["label"].to_numpy().astype(np.int64)
    order_ = np.argsort(ids, kind="stable")
    cref = ray.put((ids[order_], labs[order_],
                    _norm_rows(_emb_matrix(t["embedding"]))[order_]))

    def mine(t: pa.Table) -> pa.Table:
        cids, clabs, cmat = _bget_slot("hard_neg_corpus", cref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        asel = ids % 2 == 0
        empty = pa.table({
            "vec_id": pa.array([], type=pa.int64()),
            "pos_id": pa.array([], type=pa.int64()),
            "neg_id": pa.array([], type=pa.int64()),
            "s_pos": pa.array([], type=pa.float64()),
            "s_neg": pa.array([], type=pa.float64())})
        if not asel.any():
            return empty
        qids = ids[asel]
        qlabs = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[asel]
        qmat = _norm_rows(_emb_matrix(t["embedding"]))[asel]
        sims = qmat @ cmat.T
        self_col = np.searchsorted(cids, qids)
        sims[np.arange(len(qids)), self_col] = -np.inf
        same = qlabs[:, None] == clabs[None, :]
        pos_s = np.where(same, sims, -np.inf)
        neg_s = np.where(same, -np.inf, sims)
        pb, nb = pos_s.max(axis=1), neg_s.max(axis=1)
        pos_id = cids[np.argmax(pos_s == pb[:, None], axis=1)]
        neg_id = cids[np.argmax(neg_s == nb[:, None], axis=1)]
        ok = np.isfinite(pb) & np.isfinite(nb)
        return pa.table({
            "vec_id": pa.array(qids[ok]),
            "pos_id": pa.array(pos_id[ok]),
            "neg_id": pa.array(neg_id[ok]),
            "s_pos": pa.array(_round_half_up(pb[ok], _HNEG_ROUND)),
            "s_neg": pa.array(_round_half_up(nb[ok], _HNEG_ROUND)),
        })

    return _tbl(sf_dir, "embeddings",
                ["vec_id", "embedding", "label"]) \
        .map_batches(mine, batch_format="pyarrow", batch_size=256)


# logistic-regression trainer: hashed-feature dim, epochs, step,
# gradient quantization scale (the IVF int64-quantization precedent —
# per-ROW quantized residuals make the gradient an integer sum,
# order- and batching-free, so the distributed trainer is bit-equal
# to the sequential golden)
_LR_DIM = 4096
_LR_EPOCHS = 3
_LR_STEP = 0.5
_LR_QUANT = float(1 << 20)


def _lr_features(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Hashed bag-of-words features: (feature ids per token, doc
    segment ids per token). Token order is preserved — both the
    engine and the golden accumulate per-doc dots in document token
    order, so the float dot products are bit-identical."""
    hs: list[np.ndarray] = []
    for x in texts:
        toks = np.array(x.split(" "), dtype=object)
        hs.append((pd.util.hash_array(toks) % _LR_DIM).astype(np.int64))
    seg = np.repeat(np.arange(len(texts)), [len(h) for h in hs])
    return (np.concatenate(hs) if hs else np.array([], dtype=np.int64),
            seg)


def _lr_row_grad(h: np.ndarray, seg: np.ndarray, y: np.ndarray,
                 w: np.ndarray) -> tuple[np.ndarray, int]:
    """One full-batch gradient contribution: per-row quantized
    residual × token counts, as an EXACT int64 feature vector (plus
    the row count). Shared leaf of the engine partial and the
    sequential golden."""
    dots = np.bincount(seg, w[h], minlength=len(y))
    s = 1.0 / (1.0 + np.exp(-dots)) - y
    sq = np.rint(s * _LR_QUANT).astype(np.int64)
    g = np.bincount(h, sq[seg], minlength=_LR_DIM).astype(np.int64)
    return g, len(y)


def q_logreg_train_score(sf_dir: str):
    """DISTRIBUTED MODEL TRAINING — full-batch logistic regression on
    hashed bag-of-words features (the fasttext-style quality-
    classifier shape; supervision: lang == 'en'), trained for 3
    epochs and applied to every doc. Each epoch is ONE map pass of
    per-batch gradient partials whose per-row residuals are int64-
    quantized (``_lr_row_grad``) — the partial sum is an integer, so
    any batching/ordering yields the SAME gradient and the trained
    weights are bit-equal to the sequential golden (the IVF-centroid
    quantization contract). The weight vector (4096 floats) is the
    broadcast; epochs × one-scan is the honest cost at any corpus
    size (features recompute per pass — materializing a dense N×D
    matrix is the anti-pattern)."""
    docs = _tbl(sf_dir, "documents", ["doc_id", "text", "lang"])
    w = np.zeros(_LR_DIM)
    n_docs = _tbl_rows(sf_dir, "documents")

    for ep in range(_LR_EPOCHS):
        wref = ray.put(w)

        def grad_partial(t: pa.Table, _ep=ep) -> pa.Table:
            wv = _bget_slot("logreg_w", wref)
            texts = t["text"].to_pylist()
            y = (np.array(t["lang"].to_pylist(), dtype=object)
                 == "en").astype(np.float64)
            h, seg = _lr_features(texts)
            g, _ = _lr_row_grad(h, seg, y, wv)
            return pa.table({"f": pa.array(np.arange(_LR_DIM)),
                             "g": pa.array(g)})

        gsum = np.zeros(_LR_DIM, dtype=np.int64)
        for blk in ray.get(
                docs.map_batches(grad_partial, batch_format="pyarrow")
                .to_arrow_refs()):
            if blk.num_rows:
                np.add.at(gsum, blk["f"].to_numpy(zero_copy_only=False),
                          blk["g"].to_numpy(zero_copy_only=False))
        w = w - _LR_STEP * (gsum / _LR_QUANT) / n_docs

    wref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wv = _bget_slot("logreg_w_final", wref)
        texts = t["text"].to_pylist()
        h, seg = _lr_features(texts)
        dots = np.bincount(seg, wv[h], minlength=len(texts))
        p = 1.0 / (1.0 + np.exp(-dots))
        y = (np.array(t["lang"].to_pylist(), dtype=object)
             == "en").astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "label": pa.array(y),
            "prob": pa.array(_round_half_up(p, 4)),
            "pred": pa.array(p >= 0.5),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def q_session_bounce_rate(sf_dir: str):
    """Per-day BOUNCE RATE — the engagement metric sessionization
    exists to feed: share of sessions with exactly one event, by
    session-start day. Composes on ``session_windows`` (the gap
    sessionizer); what this op adds is only a day-keyed count
    partial + one calendar-bounded combine, so the cost IS the
    sessionizer's."""

    def partial(t: pa.Table) -> pa.Table:
        ts = t["session_start"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        day = (ts // 86_400_000_000) * 86_400_000_000
        one = (t["n"].to_numpy(zero_copy_only=False) == 1) \
            .astype(np.int64)
        u, inv = np.unique(day, return_inverse=True)
        return pa.table({
            "day_us": pa.array(u),
            "n_sessions": pa.array(np.bincount(inv).astype(np.int64)),
            "n_bounce": pa.array(np.bincount(inv, one)
                                 .astype(np.int64)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day_us", as_index=False).sum()
        ns = g["n_sessions"].to_numpy(np.int64)
        nb = g["n_bounce"].to_numpy(np.int64)
        return pd.DataFrame({
            "day": pd.to_datetime(g["day_us"].to_numpy(np.int64),
                                  unit="us"),
            "n_sessions": ns, "n_bounce": nb,
            "bounce_rate": _round_half_up(nb / ns, 4),
        })

    return (
        q_session_windows(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


_TTC_SENTINEL = np.iinfo(np.int64).max


def q_funnel_time_to_convert(sf_dir: str):
    """CONVERSION LATENCY — seconds from a user's first 'view' to
    their first 'purchase' (purchase at/after the view), reported as
    converting-user count + exact median and p90 via quantile_cont's
    interpolation (the group_quantiles formula). Map-side per-user
    first-timestamp partials (sentinel = absent), ONE user-bounded
    combine — user is the dimension; the diffs vector never exceeds
    it."""

    def partial(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        sel = (ty == "view") | (ty == "purchase")
        if not sel.any():
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64()),
                             "p": pa.array([], type=pa.int64())})
        u = t["user_id"].to_numpy(zero_copy_only=False)[sel]
        ts = t["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[sel]
        isv = ty[sel] == "view"
        codes, uniq = pd.factorize(u)
        v = np.full(len(uniq), _TTC_SENTINEL)
        p = np.full(len(uniq), _TTC_SENTINEL)
        np.minimum.at(v, codes[isv], ts[isv])
        np.minimum.at(p, codes[~isv], ts[~isv])
        return pa.table({
            "u": pa.array(np.asarray(uniq, dtype=np.int64)),
            "v": pa.array(v), "p": pa.array(p),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", as_index=False).agg(v=("v", "min"),
                                                p=("p", "min"))
        v = g["v"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        ok = (v != _TTC_SENTINEL) & (p != _TTC_SENTINEL) & (p >= v)
        s = np.sort((p[ok] - v[ok]) / 1_000_000.0)
        n = len(s)

        def qc(q: float) -> float:
            if n == 0:
                return np.nan
            h = (n - 1) * q
            lo = int(np.floor(h))
            fr = h - lo
            return s[lo] * (1.0 - fr) + s[min(lo + 1, n - 1)] * fr

        return pd.DataFrame({
            "n_converted": pd.Series([n], dtype=np.int64),
            "median_s": _round_half_up(np.array([qc(0.5)]), 4),
            "p90_s": _round_half_up(np.array([qc(0.9)]), 4),
        })

    return (
        _tbl(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_pairwise_js_divergence(sf_dir: str):
    """MIXTURE DESIGN MATRIX — Jensen-Shannon divergence between
    every pair of sources' smoothed unigram distributions (the
    symmetric, bounded complement of ``source_kl_divergence``; the
    matrix mixture-weight optimizers consume). SAME (source, token)
    count partials and (sources × vocab)-bounded exchange; the S²/2
    pair evaluation is one dense numpy pass in the combine —
    source count is config-bounded. Rows: (src_a, src_b, js)."""

    def partial(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        toks: list[np.ndarray] = []
        for s, x in zip(t["source"].to_pylist(),
                        t["text"].to_pylist()):
            srcs.append(s)
            toks.append(np.array(x.split(" "), dtype=object))
        if not srcs:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        src_arr = np.repeat(np.array(srcs, dtype=object),
                            [len(x) for x in toks])
        g = pd.DataFrame({"source": src_arr,
                          "w": np.concatenate(toks)}) \
            .groupby(["source", "w"], as_index=False).size()
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "w": pa.array(g["w"], type=pa.string()),
            "n": pa.array(g["size"].to_numpy(np.int64)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["n"].sum()
        scodes, suniq = pd.factorize(g["source"])
        wcodes, wuniq = pd.factorize(g["w"])
        S, V = len(suniq), len(wuniq)
        mat = np.zeros((S, V))
        mat[scodes, wcodes] += g["n"].to_numpy(np.int64)
        p = (mat + _KL_SMOOTH) \
            / (mat.sum(axis=1, keepdims=True) + _KL_SMOOTH * V)
        order_ = np.argsort(np.asarray(suniq, dtype=object),
                            kind="stable")
        p = p[order_]
        names = np.asarray(suniq, dtype=object)[order_]
        rows = []
        for i in range(S):
            for j in range(i + 1, S):
                m = 0.5 * (p[i] + p[j])
                js = 0.5 * (p[i] * np.log(p[i] / m)).sum() \
                    + 0.5 * (p[j] * np.log(p[j] / m)).sum()
                rows.append((names[i], names[j],
                             float(_round_half_up(js, 6))))
        return pd.DataFrame(rows, columns=["src_a", "src_b", "js"]) \
            .astype({"js": np.float64})

    return (
        _tbl(sf_dir, "documents", ["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_price_trend_by_priority(sf_dir: str):
    """Per-segment TREND — OLS slope/intercept of order value over
    time per order priority (the 'is this segment growing' readout):
    order-free per-group moment partials (n, Σx, Σy, Σxy, Σx²) with
    x = epoch days, one group-bounded combine, closed-form OLS. The
    moment formulation meets DuckDB's numerically-stable
    regr_slope/regr_intercept under the round(6)/round(4) contract
    (x, y magnitudes keep every moment sum exact in double)."""

    def partial(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        x = t["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) / 86_400_000_000.0
        y = t["o_totalprice"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(pr)
        return pa.table({
            "pr": pa.array(np.asarray(uniq, dtype=object),
                           type=pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "sx": pa.array(np.bincount(codes, x)),
            "sy": pa.array(np.bincount(codes, y)),
            "sxy": pa.array(np.bincount(codes, x * y)),
            "sxx": pa.array(np.bincount(codes, x * x)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pr", as_index=False).sum() \
            .sort_values("pr", kind="stable")
        n = g["n"].to_numpy(np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxy, sxx = g["sxy"].to_numpy(), g["sxx"].to_numpy()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame({
            "o_orderpriority": g["pr"].to_numpy(),
            "n": g["n"].to_numpy(np.int64),
            "slope_per_day": _round_half_up(slope, 6),
            "intercept": _round_half_up(intercept, 4),
        })

    return (
        _tbl(sf_dir, "orders",
             ["o_orderpriority", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_detector_agreement(sf_dir: str):
    """DETECTOR CROSS-VALIDATION — the diagnostic a dedup policy
    review runs before trusting one detector: pair-set agreement
    between MinHash+LSH (token shingles) and SimHash (Hamming bands)
    over the same corpus. Both pair sets are near-dup-rate bounded;
    pairs pack into one int64 key, tagged partials union through one
    coalesced combine, and the report is a single row (counts + the
    detectors' pair-set Jaccard)."""
    def tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            a = t["id_a"].to_numpy(zero_copy_only=False)
            b = t["id_b"].to_numpy(zero_copy_only=False)
            return pa.table({
                "pair": pa.array((a << np.int64(32)) | b),
                "det": pa.array(np.full(len(a), flag, dtype=np.int64)),
            })
        return f

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mh = set(df[df["det"] == 0]["pair"].to_numpy(np.int64)
                 .tolist())
        sh = set(df[df["det"] == 1]["pair"].to_numpy(np.int64)
                 .tolist())
        nb = len(mh & sh)
        union = len(mh | sh)
        return pd.DataFrame({
            "n_minhash": pd.Series([len(mh)], dtype=np.int64),
            "n_simhash": pd.Series([len(sh)], dtype=np.int64),
            "n_both": pd.Series([nb], dtype=np.int64),
            "agreement": _round_half_up(
                np.array([nb / union if union else 0.0]), 4),
        })

    return (
        q_minhash_lsh(sf_dir).map_batches(tag(0),
                                          batch_format="pyarrow")
        .union(q_simhash_neardup(sf_dir).map_batches(
            tag(1), batch_format="pyarrow"))
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_ks_test(sf_dir: str):
    """Two-sample KOLMOGOROV-SMIRNOV statistic between the 'click'
    and 'purchase' value distributions — the distribution-shift test
    that pairs with ``ab_test_welch``'s mean test: D = max |F_a −
    F_b| evaluated exactly over the pooled support. Same
    domain-bounded histogram-partial shape as ``group_quantiles``
    (float64 BIT PATTERNS as exact histogram keys); the exchange is
    the value domain, never the row count, and the final CDF walk is
    one numpy pass."""

    def partial(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        gs, vs, cs = [], [], []
        for g in ("click", "purchase"):
            u, c = np.unique(v[ty == g].view(np.int64),
                             return_counts=True)
            gs.append(np.full(len(u), g, dtype=object))
            vs.append(u)
            cs.append(c.astype(np.int64))
        return pa.table({
            "g": pa.array(np.concatenate(gs), type=pa.string()),
            "vb": pa.array(np.concatenate(vs)),
            "cnt": pa.array(np.concatenate(cs)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["g", "vb"], as_index=False)["cnt"].sum()
        a = g[g["g"] == "click"]
        b = g[g["g"] == "purchase"]
        support = np.union1d(a["vb"].to_numpy(np.int64),
                             b["vb"].to_numpy(np.int64))

        def cdf(side: pd.DataFrame) -> np.ndarray:
            cnt = np.zeros(len(support), dtype=np.int64)
            idx = np.searchsorted(support,
                                  side["vb"].to_numpy(np.int64))
            cnt[idx] = side["cnt"].to_numpy(np.int64)
            c = cnt.cumsum()
            return c / c[-1]

        d = np.abs(cdf(a) - cdf(b)).max()
        return pd.DataFrame({
            "n_a": pd.Series([int(a["cnt"].sum())], dtype=np.int64),
            "n_b": pd.Series([int(b["cnt"].sum())], dtype=np.int64),
            "ks_d": _round_half_up(np.array([d]), 6),
        })

    return (
        _tbl(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_benford_deviation(sf_dir: str):
    """BENFORD first-digit audit over order totals — the
    data-quality / fraud screen: observed first-significant-digit
    shares vs Benford's log10(1 + 1/d), with per-digit deviation.
    First digit extracted arithmetically (value / 10^floor(log10 v))
    identically in both engines; the partial is a fixed 9-bucket
    bincount — constant-size exchange at any corpus."""

    def partial(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        d = (v / np.power(10.0, np.floor(np.log10(v)))).astype(
            np.int64)
        return pa.table({
            "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
            "n": pa.array(np.bincount(d, minlength=10)[1:10]
                          .astype(np.int64)),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("digit", as_index=False)["n"].sum()
        g = g[g["n"] > 0]  # absent digits: match the oracle's GROUP BY
        n = g["n"].to_numpy(np.int64)
        digits = g["digit"].to_numpy(np.int64)
        obs = n / n.sum()
        exp = np.log10(1.0 + 1.0 / digits)
        return pd.DataFrame({
            "digit": digits, "n": n,
            "observed": _round_half_up(obs, 6),
            "benford": _round_half_up(exp, 6),
            "deviation": _round_half_up(obs - exp, 6),
        })

    return (
        _tbl(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_zipf_fit(sf_dir: str):
    """ZIPF LAW fit over the corpus vocabulary — the sanity statistic
    that flags synthetic/degenerate text (natural corpora fit slope
    ≈ −1): OLS of ln(count) on ln(rank) over the full (n desc, token
    asc)-ranked vocabulary, with r². Counts ride the shared
    ``_bucket_sum`` combine; the rank+OLS pass is ONE vocab-bounded
    coalesced batch (the vocab-family contract) using the same
    moment formulation as ``price_trend_by_priority``."""

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "w"], ascending=[False, True],
                            kind="stable")
        y = np.log(df["n"].to_numpy(np.float64))
        x = np.log(np.arange(1, len(df) + 1, dtype=np.float64))
        n = float(len(df))
        sx, sy = x.sum(), y.sum()
        sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        slope = cov / vx
        return pd.DataFrame({
            "vocab": pd.Series([int(n)], dtype=np.int64),
            "zipf_slope": _round_half_up(np.array([slope]), 6),
            "intercept": _round_half_up(
                np.array([(sy - slope * sx) / n]), 4),
            "r2": _round_half_up(np.array([cov * cov / (vx * vy)]), 6),
        })

    return (
        _bucket_sum(_tbl(sf_dir, "documents", ["text"])
                    .map_batches(_tf_partial, batch_format="pyarrow"),
                    "w", "n")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


# the sweep's (bands, rows) configurations over the 64-perm signature
_MH_SWEEP = ((4, 16), (8, 8), (16, 4))


def q_minhash_band_curve(sf_dir: str):
    """LSH PARAMETER TUNING curve — the banding trade-off a dedup
    policy review reads before fixing (b, r): for each candidate
    config, the expected detection probability 1 − (1 − j^r)^b
    averaged over the VERIFIED near-dup pair set, plus the count of
    pairs detected with ≥ 90% probability. Pure closed-form math over
    the pair-bounded ``minhash_lsh`` output — one coalesced batch, no
    re-banding pass."""

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        j = df["jacc"].to_numpy(np.float64)
        rows = []
        for b, r in _MH_SWEEP:
            p = 1.0 - np.power(1.0 - np.power(j, r), b)
            rows.append((b, r, len(j),
                         float(_round_half_up(p.mean(), 6))
                         if len(j) else 0.0,
                         int((p >= 0.9).sum())))
        return pd.DataFrame(rows, columns=[
            "bands", "rows_per_band", "n_pairs", "exp_recall",
            "n_high_conf"]).astype({
                "bands": np.int64, "rows_per_band": np.int64,
                "n_pairs": np.int64, "exp_recall": np.float64,
                "n_high_conf": np.int64})

    return q_minhash_lsh(sf_dir).map_batches(
        finish, batch_format="pandas", batch_size=1 << 30)


def q_late_event_rate(sf_dir: str):
    """LATE-DATA rate — the watermark-sizing statistic a streaming
    deployment reads: per day, the share of events arriving (in
    event_id order, the log's arrival sequence) with a timestamp
    BEHIND their user's max-so-far. Same user-hash cogroup as the
    window family; per partition one lexsort + per-user shifted
    running-max, then day-bounded count partials."""
    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id"])
    parts = _copart_count(_tbl_rows(sf_dir, "events"))

    def late(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _arrow_out(pd.DataFrame({
                "day_us": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "n_late": pd.Series([], dtype=np.int64)}))
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order_ = np.lexsort((eid, u))
        us, tss = u[order_], ts[order_]
        # running max BEFORE each row, per user, in arrival order —
        # pandas' grouped shift + cummax (both cython; the repo rule:
        # no per-entity Python loops inside map_groups)
        d2 = pd.DataFrame({"u": us, "ts": tss})
        g = d2.groupby("u", sort=False)
        pm = d2.assign(s=g["ts"].shift(1)) \
            .groupby("u", sort=False)["s"].cummax().to_numpy()
        is_late = tss < pm  # NaN prev-max (user's first row) → False
        day = (tss // 86_400_000_000) * 86_400_000_000
        uq, inv = np.unique(day, return_inverse=True)
        return _arrow_out(pd.DataFrame({
            "day_us": uq.astype(np.int64),
            "n": np.bincount(inv).astype(np.int64),
            "n_late": np.bincount(inv, is_late.astype(np.int64))
            .astype(np.int64)}))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day_us", as_index=False).sum()
        n = g["n"].to_numpy(np.int64)
        nl = g["n_late"].to_numpy(np.int64)
        return pd.DataFrame({
            "day": pd.to_datetime(g["day_us"].to_numpy(np.int64),
                                  unit="us"),
            "n": n, "n_late": nl,
            "late_rate": _round_half_up(nl / n, 4),
        })

    return (
        ev.map_batches(_append_user_part_t, batch_format="pyarrow",
                       fn_args=(parts,))
        .groupby("part", num_partitions=parts)
        .map_groups(late, batch_format="pandas")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


def q_dedup_survivorship(sf_dir: str):
    """Entity-resolution SURVIVORSHIP — the merge step after
    ``entity_clusters``: each multi-member cluster collapses to one
    canonical record with best-of-cluster attributes (max retail
    price, min size, member count). The cluster labels are the
    existing op's output; attributes attach through the part
    dimension and the combine is cluster-bounded."""
    labs = q_entity_clusters(sf_dir)
    attrs = _tbl(sf_dir, "part",
                 ["p_partkey", "p_retailprice", "p_size"]).to_pandas()
    order_ = np.argsort(attrs["p_partkey"].to_numpy(np.int64),
                        kind="stable")
    aref = ray.put((
        attrs["p_partkey"].to_numpy(np.int64)[order_],
        attrs["p_retailprice"].to_numpy(np.float64)[order_],
        attrs["p_size"].to_numpy(np.int64)[order_]))

    def partial(t: pa.Table) -> pa.Table:
        ak, ap, asz = _bget_slot("survivorship_attrs", aref)
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        rep = t["cluster_rep"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ak, pk)
        codes, uniq = pd.factorize(rep)
        mxp = np.zeros(len(uniq))
        np.maximum.at(mxp, codes, ap[idx])
        mns = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(mns, codes, asz[idx])
        return pa.table({
            "rep": pa.array(np.asarray(uniq, dtype=np.int64)),
            "n": pa.array(np.bincount(codes).astype(np.int64)),
            "mxp": pa.array(mxp),
            "mns": pa.array(mns),
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("rep", as_index=False).agg(
            n=("n", "sum"), mxp=("mxp", "max"), mns=("mns", "min"))
        g = g[g["n"] > 1]  # canonical rows only for real clusters
        return pd.DataFrame({
            "cluster_rep": g["rep"].to_numpy(np.int64),
            "n_members": g["n"].to_numpy(np.int64),
            "best_price": _round_half_up(g["mxp"].to_numpy(), 2),
            "min_size": g["mns"].to_numpy(np.int64),
        })

    return (
        labs.map_batches(partial, batch_format="pyarrow")
        .map_batches(finish, batch_format="pandas", batch_size=1 << 30)
    )


# --------------------------------------------------------------------------
# Catalog + oracles
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[str], Any]] = {
    "source_counts": q_source_counts,
    "source_counts_salted": q_source_counts_salted,
    "lang_frequency": q_lang_frequency,
    "watermark_max_ts": q_watermark_max_ts,
    "latest_events": q_latest_events,
    "incremental_since_watermark": q_incremental_since_watermark,
    "windowed_events": q_windowed_events,
    "asof_join_clicks": q_asof_join_clicks,
    "range_join_shipments": q_range_join_shipments,
    "pricing_summary": q_pricing_summary,
    "top_parts": q_top_parts,
    "exact_dedup_events": q_exact_dedup_events,
    "anti_join_customers": q_anti_join_customers,
    "bloom_anti_join": q_bloom_anti_join,
    "broadcast_join_region": q_broadcast_join_region,
    "join_orders_lineitem": q_join_orders_lineitem,
    "clean_pipeline": q_clean_pipeline,
    "location_tags_nation": q_location_tags_nation,
    "location_tags_full": q_location_tags_full,
    "embed_format": q_embed_format,
    "token_truncate": q_token_truncate,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "quality_filter": q_quality_filter,
    "repetition_filter": q_repetition_filter,
    "decontaminate_docs": q_decontaminate_docs,
    "dsir_weights": q_dsir_weights,
    "substring_dup_spans": q_substring_dup_spans,
    "substring_dedup_rewrite": q_substring_dedup_rewrite,
    "bm25_topk": q_bm25_topk,
    "curate_corpus": q_curate_corpus,
    "mixture_sample": q_mixture_sample,
    "shuffle_shards": q_shuffle_shards,
    "corpus_stats": q_corpus_stats,
    "langid": q_langid,
    "fingerprints": q_fingerprints,
    "jaccard_pairs": q_jaccard_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh": q_minhash_lsh,
    "minhash_dedup_keep": q_minhash_dedup_keep,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "knn_cosine": q_knn_cosine,
    "embedding_neardup": q_embedding_neardup,
    "embedding_dedup_keep": q_embedding_dedup_keep,
    "embedding_neardup_ann": q_embedding_neardup_ann,
    "ann_ivf": q_ann_ivf,
    "pq_encode": q_pq_encode,
    "ann_pq": q_ann_pq,
    "ann_ivfpq": q_ann_ivfpq,
    "crawl_image_caption": q_crawl_image_caption,
    "crawl_job_records": q_crawl_job_records,
    "recrawl_delta": q_recrawl_delta,
    "multimodal_features": q_multimodal_features,
    "vocab_top_terms": q_vocab_top_terms,
    "kmeans_assign": q_kmeans_assign,
    "semantic_dedup": q_semantic_dedup,
    "train_split": q_train_split,
    "stratified_sample": q_stratified_sample,
    "bottomk_sample": q_bottomk_sample,
    "chunk_documents": q_chunk_documents,
    "bigram_counts": q_bigram_counts,
    "tfidf_top_terms": q_tfidf_top_terms,
    "length_histogram": q_length_histogram,
    "pack_offsets": q_pack_offsets,
    "range_join_events": q_range_join_events,
    "approx_distinct_users": q_approx_distinct_users,
    "cm_counts_users": q_cm_counts_users,
    "asof_join_events": q_asof_join_events,
    "grouped_topk_parts": q_grouped_topk_parts,
    "quantiles_lineitem": q_quantiles_lineitem,
    "rollup_lineitem": q_rollup_lineitem,
    "session_windows": q_session_windows,
    "distinct_users": q_distinct_users,
    "supplier_regions": q_supplier_regions,
    "top_customers_by_spend": q_top_customers_by_spend,
    "embed_documents": q_embed_documents,
    "multimodal_resize": q_multimodal_resize,
    "png_export": q_png_export,
    "clip_align": q_clip_align,
    "phash_neardup": q_phash_neardup,
    "dhash_neardup": q_dhash_neardup,
    "phash_dedup_keep": q_phash_dedup_keep,
    "caption_neardup": q_caption_neardup,
    "caption_dedup_images": q_caption_dedup_images,
    "curate_image_corpus": q_curate_image_corpus,
    "aspect_buckets": q_aspect_buckets,
    "image_training_manifest": q_image_training_manifest,
    "phash_knn": q_phash_knn,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "heavy_hitters_terms": q_heavy_hitters_terms,
    "hopping_windows": q_hopping_windows,
    "zscore_quality": q_zscore_quality,
    "pivot_events": q_pivot_events,
    "weighted_sample": q_weighted_sample,
    "group_quantiles": q_group_quantiles,
    "fuzzy_join_names": q_fuzzy_join_names,
    "ccnet_perplexity": q_ccnet_perplexity,
    "pagerank_orders": q_pagerank_orders,
    "cube_lineitem": q_cube_lineitem,
    "image_fidelity": q_image_fidelity,
    "lag_delta_events": q_lag_delta_events,
    "funnel_conversions": q_funnel_conversions,
    "retention_cohorts": q_retention_cohorts,
    "global_rank_docs": q_global_rank_docs,
    "json_extract_props": q_json_extract_props,
    "star_join_revenue": q_star_join_revenue,
    "custdist_orders": q_custdist_orders,
    "small_qty_revenue": q_small_qty_revenue,
    "large_orders_qty": q_large_orders_qty,
    "user_top_event": q_user_top_event,
    "distinct_users_per_type": q_distinct_users_per_type,
    "user_daily_gapfill": q_user_daily_gapfill,
    "image_neardup_verified": q_image_neardup_verified,
    "hopping_distinct_users": q_hopping_distinct_users,
    "bigram_lift": q_bigram_lift,
    "order_priority_counts": q_order_priority_counts,
    "priority_linecounts": q_priority_linecounts,
    "promo_revenue_pct": q_promo_revenue_pct,
    "top_supplier_revenue": q_top_supplier_revenue,
    "brand_supplier_cnt": q_brand_supplier_cnt,
    "disjunctive_revenue": q_disjunctive_revenue,
    "waiting_suppliers": q_waiting_suppliers,
    "idle_rich_customers": q_idle_rich_customers,
    "unshipped_orders_topk": q_unshipped_orders_topk,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "nation_trade_matrix": q_nation_trade_matrix,
    "rolling_avg_user_value": q_rolling_avg_user_value,
    "ntile_docs": q_ntile_docs,
    "forecast_revenue": q_forecast_revenue,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "returned_item_report": q_returned_item_report,
    "important_parts": q_important_parts,
    "promo_suppliers": q_promo_suppliers,
    "merge_upsert_users": q_merge_upsert_users,
    "pareto_customers": q_pareto_customers,
    "part_copurchase": q_part_copurchase,
    "triangle_count": q_triangle_count,
    "bfs_reach": q_bfs_reach,
    "kn_continuation": q_kn_continuation,
    "decayed_revenue": q_decayed_revenue,
    "graph_components": q_graph_components,
    "event_paths": q_event_paths,
    "pii_redact": q_pii_redact,
    "price_histogram": q_price_histogram,
    "vad_segments": q_vad_segments,
    "scene_cuts": q_scene_cuts,
    "audience_overlap": q_audience_overlap,
    "kcore_parts": q_kcore_parts,
    "cdc_chunks": q_cdc_chunks,
    "price_quantiles_sketch": q_price_quantiles_sketch,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "scene_clips": q_scene_clips,
    "line_dedup": q_line_dedup,
    "bpe_encode": q_bpe_encode,
    "peak_concurrency": q_peak_concurrency,
    "scd2_intervals": q_scd2_intervals,
    "corr_price_qty": q_corr_price_qty,
    "iqr_outliers": q_iqr_outliers,
    "skipgram_pairs": q_skipgram_pairs,
    "minhash_dedup_best": q_minhash_dedup_best,
    "image_patches": q_image_patches,
    "asr_chunks": q_asr_chunks,
    "activity_heatmap": q_activity_heatmap,
    "group_bottomk_sample": q_group_bottomk_sample,
    "price_drawdown": q_price_drawdown,
    "kmv_jaccard": q_kmv_jaccard,
    "entity_clusters": q_entity_clusters,
    "audio_spectral": q_audio_spectral,
    "image_color_hist": q_image_color_hist,
    "graph_walks": q_graph_walks,
    "approx_distinct_by_type": q_approx_distinct_by_type,
    "ann_dim_recall": q_ann_dim_recall,
    "zorder_layout": q_zorder_layout,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "compaction_plan": q_compaction_plan,
    "boilerplate_lines": q_boilerplate_lines,
    "mixture_upsample": q_mixture_upsample,
    "recrawl_schedule": q_recrawl_schedule,
    "percent_rank_docs": q_percent_rank_docs,
    "geo_mean_prices": q_geo_mean_prices,
    "mixture_weights": q_mixture_weights,
    "vocab_coverage": q_vocab_coverage,
    "copurchase_jaccard": q_copurchase_jaccard,
    "zonemap_prune": q_zonemap_prune,
    "incremental_agg_merge": q_incremental_agg_merge,
    "bigram_lm_score": q_bigram_lm_score,
    "bitext_mine": q_bitext_mine,
    "padding_efficiency": q_padding_efficiency,
    "attribution_last_touch": q_attribution_last_touch,
    "class_cohesion": q_class_cohesion,
    "webdataset_shards": q_webdataset_shards,
    "window_dedup": q_window_dedup,
    "dup_rate_by_source": q_dup_rate_by_source,
    "rfm_scores": q_rfm_scores,
    "ab_test_welch": q_ab_test_welch,
    "source_kl_divergence": q_source_kl_divergence,
    "hard_negatives": q_hard_negatives,
    "logreg_train_score": q_logreg_train_score,
    "session_bounce_rate": q_session_bounce_rate,
    "funnel_time_to_convert": q_funnel_time_to_convert,
    "pairwise_js_divergence": q_pairwise_js_divergence,
    "price_trend_by_priority": q_price_trend_by_priority,
    "detector_agreement": q_detector_agreement,
    "ks_test": q_ks_test,
    "benford_deviation": q_benford_deviation,
    "zipf_fit": q_zipf_fit,
    "minhash_band_curve": q_minhash_band_curve,
    "late_event_rate": q_late_event_rate,
    "dedup_survivorship": q_dedup_survivorship,
}

_STOP_SQL = "('a','the','of','and','to','in')"

ORACLE_SQL: dict[str, str] = {
    "source_counts": "SELECT source, count(*) AS n FROM documents GROUP BY source",
    "source_counts_salted": (
        "SELECT source, count(*) AS n FROM documents GROUP BY source"
    ),
    "lang_frequency": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "watermark_max_ts": "SELECT max(ts) AS max_ts FROM events",
    "latest_events": (
        "SELECT event_id, ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 5"
    ),
    "incremental_since_watermark": (
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY "
        "GROUP BY event_type"
    ),
    "windowed_events": (
        "SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n, "
        "round(sum(value), 4) AS sum_value FROM events "
        "GROUP BY user_id, date_trunc('day', ts)"
    ),
    "asof_join_clicks": (
        "SELECT e.event_id AS event_id, e.user_id AS user_id, "
        "e.ts AS ts, c.click_ts AS click_ts, "
        "date_diff('microsecond', c.click_ts, e.ts) AS usecs_since_click "
        "FROM (SELECT * FROM events WHERE event_type = 'error') e "
        "ASOF JOIN (SELECT user_id, ts AS click_ts FROM events "
        "WHERE event_type = 'click') c "
        "ON e.user_id = c.user_id AND e.ts >= c.click_ts"
    ),
    "range_join_shipments": (
        "SELECT o.o_orderkey AS o_orderkey, count(*) AS n_shipped "
        "FROM orders o JOIN lineitem l "
        "ON l.l_shipdate >= o.o_orderdate "
        "AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
        "GROUP BY o.o_orderkey"
    ),
    "pricing_summary": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_quantity) / count(*), 4) AS avg_qty, "
        "round(sum(l_extendedprice) / count(*), 4) AS avg_price, "
        "count(*) AS n FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "top_parts": (
        "SELECT p_partkey, p_name, p_retailprice FROM part "
        "ORDER BY p_retailprice DESC, p_partkey LIMIT 10"
    ),
    "exact_dedup_events": (
        "SELECT user_id, event_type, min(event_id) AS first_event "
        "FROM events GROUP BY user_id, event_type"
    ),
    "anti_join_customers": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN ("
        "SELECT o_custkey FROM orders WHERE o_orderdate > "
        "(SELECT max(o_orderdate) FROM orders) - INTERVAL 30 DAY)"
    ),
    "broadcast_join_region": (
        "SELECT n.n_name AS nation, r.r_name AS region "
        "FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    ),
    "join_orders_lineitem": (
        "SELECT o_orderpriority, count(*) AS n FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    ),
    "clean_pipeline": (
        "SELECT p_partkey, trim(regexp_replace(regexp_replace(regexp_replace("
        "p_name || ' posted 2024-03-15 pays USD100-200/yr', "
        "'\\d{4}-\\d{2}-\\d{2}', '', 'g'), '(USD|GBP)\\d+-\\d+/yr', '', 'g'), "
        "'[-/]', ' ', 'g')) AS cleaned FROM part"
    ),
    "location_tags_nation": (
        "SELECT n_nationkey, n_name, CASE WHEN n_name IN "
        "('BRAZIL','FRANCE','GERMANY','JAPAN','UNITED KINGDOM','UNITED STATES') "
        "THEN n_name ELSE 'NaN' END AS tag FROM nation"
    ),
    "location_tags_full": (
        "SELECT n.n_nationkey, n.n_name, p.loc, p.tag FROM nation n JOIN (VALUES "
        + ", ".join(
            f"({i}, '{loc}', '{tag}')"
            for i, (loc, tag) in enumerate(_FULL_LOC_PROBES)
        )
        + ") AS p(i, loc, tag) ON n.n_nationkey % 25 = p.i"
    ),
    "embed_format": (
        "SELECT doc_id, 'passage: <title>doc-' || doc_id || '</title> "
        "<description>' || text || '</description>' AS passage FROM documents"
    ),
    "token_truncate": (
        "SELECT doc_id, array_to_string(list_slice(string_split(text, ' '), 1, 100), ' ') "
        "AS truncated FROM documents"
    ),
    "token_counts": (
        "SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents"
    ),
    "quality_scores": (
        "WITH t AS (SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents) SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "n_tokens::BIGINT AS n_tokens, "
        "round(length(text)::DOUBLE / n_tokens, 4) AS chars_per_token, "
        f"round(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL}))::DOUBLE "
        "/ n_tokens, 4) AS stopword_ratio FROM t"
    ),
    "quality_filter": (
        "WITH t AS (SELECT doc_id, text, len(string_split(text, ' ')) AS n_tokens "
        "FROM documents), s AS (SELECT doc_id, n_tokens::BIGINT AS n_tokens, "
        "round(length(text)::DOUBLE / n_tokens, 4) AS chars_per_token, "
        f"round(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL}))::DOUBLE "
        "/ n_tokens, 4) AS stopword_ratio FROM t) "
        f"SELECT * FROM s WHERE n_tokens >= {_QF_MIN_TOKENS} "
        f"AND chars_per_token <= {_QF_MAX_CPT} AND stopword_ratio >= {_QF_MIN_STOP}"
    ),
    "corpus_stats": (
        "SELECT count(*)::BIGINT AS n_docs, "
        "sum(len(string_split(text, ' ')))::BIGINT AS n_tokens, "
        "sum(length(text))::BIGINT AS n_chars, "
        "round(sum(len(string_split(text, ' ')))::DOUBLE / count(*), 4) AS avg_tokens "
        "FROM documents"
    ),
    "jaccard_pairs": (
        "WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks "
        f"FROM documents WHERE doc_id < {_JACC_SUBSET}) "
        "SELECT id_a, id_b, jacc FROM ("
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "round(len(list_intersect(a.toks, b.toks))::DOUBLE / "
        "len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jacc "
        "FROM t a, t b WHERE a.doc_id < b.doc_id) "
        f"WHERE jacc >= {_JACC_TAU}"
    ),
    "ngram_jaccard_pairs": (
        "WITH sub AS (SELECT doc_id, text FROM documents "
        f"WHERE doc_id < {_JACC_SUBSET}), "
        "grams AS (SELECT DISTINCT doc_id, "
        f"substr(text, CAST(t.i AS INT), {_NGRAM_K}) AS g "
        f"FROM sub, unnest(range(1, length(text) - {_NGRAM_K - 2})) AS t(i)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i "
        "FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT id_a, id_b, round(i * 1.0 / (sa.n + sb.n - i), 4) AS jacc "
        "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
        "JOIN sizes sb ON sb.doc_id = id_b "
        f"WHERE round(i * 1.0 / (sa.n + sb.n - i), 4) >= {_NGRAM_TAU}"
    ),
    "bloom_anti_join": (
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN ("
        "SELECT o_custkey FROM orders WHERE o_orderdate > "
        "(SELECT max(o_orderdate) FROM orders) - INTERVAL 30 DAY)"
    ),
    "chunk_documents": (
        "WITH c AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n, "
        f"CASE WHEN len(string_split(text, ' ')) <= {_CHUNK_W} THEN 1 "
        f"ELSE CAST(ceil((len(string_split(text, ' ')) - {_CHUNK_W}) "
        f"/ {_CHUNK_S}.0) AS BIGINT) + 1 END AS nchunks FROM documents) "
        f"SELECT doc_id, t.i AS chunk_id, t.i * {_CHUNK_S} AS tok_start, "
        f"least(t.i * {_CHUNK_S} + {_CHUNK_W}, n) AS tok_end "
        "FROM c, unnest(range(0, nchunks)) AS t(i)"
    ),
    "bottomk_sample": (
        "SELECT doc_id FROM documents ORDER BY "
        f"(doc_id * {_HASH_MULT}) % {_HASH_MOD}, doc_id LIMIT {_BK_K}"
    ),
    "decontaminate_docs": (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l "
        "FROM documents), "
        "grams AS (SELECT doc_id, array_to_string("
        f"l[CAST(t.i AS INT):CAST(t.i + {_DECON_GRAM - 1} AS INT)], ' ') AS g "
        f"FROM toks, unnest(range(1, len(l) - {_DECON_GRAM - 2})) AS t(i)), "
        f"bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {_DECON_BENCH}), "
        "hit AS (SELECT DISTINCT c.doc_id FROM grams c JOIN bench b USING (g) "
        f"WHERE c.doc_id >= {_DECON_BENCH}) "
        f"SELECT doc_id FROM documents WHERE doc_id >= {_DECON_BENCH} "
        "AND doc_id NOT IN (SELECT doc_id FROM hit)"
    ),
    "repetition_filter": (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l "
        "FROM documents), "
        "bg AS (SELECT doc_id, l[CAST(t.i AS INT)] || ' ' || "
        "l[CAST(t.i + 1 AS INT)] AS b "
        "FROM toks, unnest(range(1, len(l))) AS t(i)), "
        "st AS (SELECT doc_id, count(*) AS nt, count(DISTINCT b) AS nd "
        "FROM bg GROUP BY doc_id) "
        "SELECT doc_id, round(1.0 - nd * 1.0 / nt, 4) AS dup_frac FROM st "
        f"WHERE round(1.0 - nd * 1.0 / nt, 4) <= {_REP_TAU}"
    ),
    "curate_corpus": (
        "WITH s AS (SELECT doc_id, "
        "len(string_split(text, ' '))::BIGINT AS n_tokens, "
        "round(length(text)::DOUBLE / len(string_split(text, ' ')), 4) AS cpt, "
        f"round(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL}))::DOUBLE "
        "/ len(string_split(text, ' ')), 4) AS stop FROM documents), "
        "toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents), "
        "bg AS (SELECT doc_id, l[CAST(t.i AS INT)] || ' ' || "
        "l[CAST(t.i + 1 AS INT)] AS b "
        "FROM toks, unnest(range(1, len(l))) AS t(i)), "
        "rep AS (SELECT doc_id, round(1.0 - count(DISTINCT b) * 1.0 / count(*), 4) "
        "AS dup_frac FROM bg GROUP BY doc_id), "
        "grams AS (SELECT doc_id, array_to_string("
        f"l[CAST(t.i AS INT):CAST(t.i + {_DECON_GRAM - 1} AS INT)], ' ') AS g "
        f"FROM toks, unnest(range(1, len(l) - {_DECON_GRAM - 2})) AS t(i)), "
        f"bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {_DECON_BENCH}), "
        "hit AS (SELECT DISTINCT c.doc_id FROM grams c JOIN bench b USING (g) "
        f"WHERE c.doc_id >= {_DECON_BENCH}) "
        "SELECT d.doc_id, d.source, s.n_tokens FROM documents d "
        "JOIN s USING (doc_id) JOIN rep USING (doc_id) "
        f"WHERE d.doc_id >= {_DECON_BENCH} AND d.lang = 'en' "
        f"AND s.n_tokens >= {_QF_MIN_TOKENS} AND s.cpt <= {_QF_MAX_CPT} "
        f"AND s.stop >= {_QF_MIN_STOP} AND rep.dup_frac <= {_REP_TAU} "
        "AND d.doc_id NOT IN (SELECT doc_id FROM hit)"
    ),
    "mixture_sample": (
        "SELECT doc_id, source FROM documents "
        f"WHERE (doc_id * {_HASH_MULT}) % {_HASH_MOD} < "
        f"CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 "
        f"THEN {_MIX_THR_EVEN} ELSE {_MIX_THR_ODD} END"
    ),
    "shuffle_shards": (
        f"WITH k AS (SELECT doc_id, (doc_id * {_HASH_MULT}) % {_HASH_MOD} AS h "
        "FROM documents) "
        f"SELECT doc_id, h // {_HASH_MOD // _SHUF_SHARDS} AS shard, "
        f"row_number() OVER (PARTITION BY h // {_HASH_MOD // _SHUF_SHARDS} "
        "ORDER BY h, doc_id) - 1 AS pos FROM k"
    ),
    "knn_cosine": (
        "WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5), "
        "s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) "
        "AS score FROM q, embeddings e WHERE e.vec_id <> q.vec_id) "
        "SELECT query_id, neighbor_id, rank FROM ("
        "SELECT query_id, neighbor_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM s) "
        "WHERE rank <= 10"
    ),
    "embedding_neardup": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id AND "
        f"list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {_COS_TAU}"
    ),
    "distinct_users": "SELECT count(DISTINCT user_id) AS n FROM events",
    "supplier_regions": (
        "SELECT r.r_name AS region, count(*) AS n FROM supplier s "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
    ),
    "top_customers_by_spend": (
        "SELECT o_custkey, c_name, round(sum(o_totalprice), 2) AS spend "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY o_custkey, c_name ORDER BY spend DESC, o_custkey LIMIT 10"
    ),
    "vocab_top_terms": (
        "SELECT term, count(*)::BIGINT AS doc_freq FROM ("
        "SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term "
        "FROM documents) GROUP BY term ORDER BY doc_freq DESC, term LIMIT 100"
    ),
    "train_split": (
        "SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' "
        "ELSE 'test' END AS split, count(*) AS n FROM ("
        "SELECT (doc_id * 2654435761) % 4294967296 % 100 AS b FROM documents) "
        "GROUP BY 1"
    ),
    "stratified_sample": (
        "SELECT source, doc_id FROM ("
        "SELECT source, doc_id, row_number() OVER (PARTITION BY source "
        "ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn "
        "FROM documents) WHERE rn <= 10"
    ),
    "bigram_counts": (
        "WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents), "
        "pairs AS (SELECT l[i] AS w1, l[i+1] AS w2 "
        "FROM toks, unnest(range(1, len(l))) AS t(i)) "
        "SELECT w1 || ' ' || w2 AS bigram, count(*) AS n "
        "FROM pairs GROUP BY 1 ORDER BY n DESC, bigram LIMIT 100"
    ),
    "tfidf_top_terms": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
        "FROM documents), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), "
        "df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1), "
        "n AS (SELECT count(*) AS n FROM documents) "
        "SELECT doc_id, term, (tf * n) / df AS score "
        "FROM tf JOIN df USING (term), n WHERE doc_id < 50 "
        "QUALIFY row_number() OVER (PARTITION BY doc_id "
        "ORDER BY (tf * n) / df DESC, term) = 1"
    ),
    "length_histogram": (
        "SELECT least(n_chars // 200, 9) AS bucket, count(*) AS n "
        "FROM documents GROUP BY 1"
    ),
    "pack_offsets": (
        "WITH c AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n "
        "FROM documents), o AS (SELECT doc_id, n, coalesce(SUM(n) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0"
        ")::BIGINT AS s FROM c) SELECT doc_id, s AS start_off, s + n AS end_off, "
        "s // 512 AS bin_start, (s + n - 1) // 512 AS bin_end FROM o"
    ),
    "range_join_events": (
        "WITH p AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts FROM events WHERE event_type = 'click') "
        "SELECT p.event_id, count(c.ts) AS n_clicks FROM p LEFT JOIN c "
        "ON p.user_id = c.user_id AND c.ts > p.ts - INTERVAL 1 HOUR "
        "AND c.ts <= p.ts GROUP BY p.event_id"
    ),
    "asof_join_events": (
        "WITH p AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, ts FROM events WHERE event_type = 'click') "
        "SELECT p.event_id, p.ts, c.ts AS click_ts "
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
    ),
    "grouped_topk_parts": (
        "SELECT p_brand, p_partkey, p_retailprice, rank FROM ("
        "SELECT p_brand, p_partkey, p_retailprice, row_number() OVER "
        "(PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rank "
        "FROM part) WHERE rank <= 3"
    ),
    "quantiles_lineitem": (
        "SELECT quantile_disc(l_quantity, 0.5) AS p50, "
        "quantile_disc(l_quantity, 0.9) AS p90, "
        "quantile_disc(l_quantity, 0.99) AS p99 FROM lineitem"
    ),
    "rollup_lineitem": (
        "SELECT coalesce(l_returnflag, 'ALL') AS rf, "
        "coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
    "late_event_rate": (
        "WITH w AS (SELECT ts, max(ts) OVER (PARTITION BY user_id "
        "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING) AS pm FROM events) "
        "SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n, "
        "sum(CASE WHEN ts < pm THEN 1 ELSE 0 END)::BIGINT AS n_late, "
        "round(sum(CASE WHEN ts < pm THEN 1 ELSE 0 END) / count(*), "
        "4) AS late_rate FROM w GROUP BY 1"
    ),
    "zipf_fit": (
        "WITH t AS (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "c AS (SELECT w, count(*)::BIGINT AS n FROM t GROUP BY w), "
        "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) "
        "AS rk FROM c) "
        "SELECT count(*)::BIGINT AS vocab, "
        "round(regr_slope(ln(n), ln(rk)), 6) AS zipf_slope, "
        "round(regr_intercept(ln(n), ln(rk)), 4) AS intercept, "
        "round(regr_r2(ln(n), ln(rk)), 6) AS r2 FROM r"
    ),
    "ks_test": (
        "WITH u AS (SELECT value, "
        "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na, "
        "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS nb FROM events WHERE event_type IN ('click', 'purchase') "
        "GROUP BY value), "
        "c AS (SELECT value, sum(na) OVER (ORDER BY value) AS ca, "
        "sum(nb) OVER (ORDER BY value) AS cb FROM u), "
        "t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM u) "
        "SELECT t.ta::BIGINT AS n_a, t.tb::BIGINT AS n_b, "
        "round(max(abs(c.ca / t.ta - c.cb / t.tb)), 6) AS ks_d "
        "FROM c, t GROUP BY t.ta, t.tb"
    ),
    "benford_deviation": (
        "WITH d AS (SELECT CAST(floor(o_totalprice / "
        "pow(10, floor(log10(o_totalprice)))) AS BIGINT) AS digit "
        "FROM orders), "
        "c AS (SELECT digit, count(*)::BIGINT AS n FROM d "
        "GROUP BY digit), "
        "t AS (SELECT sum(n) AS tot FROM c) "
        "SELECT digit, n, round(n / tot, 6) AS observed, "
        "round(log10(1 + 1.0 / digit), 6) AS benford, "
        "round(n / tot - log10(1 + 1.0 / digit), 6) AS deviation "
        "FROM c, t"
    ),
    "price_trend_by_priority": (
        "SELECT o_orderpriority, count(*)::BIGINT AS n, "
        "round(regr_slope(o_totalprice, "
        "epoch_us(o_orderdate) / 86400000000.0), 6) AS slope_per_day, "
        "round(regr_intercept(o_totalprice, "
        "epoch_us(o_orderdate) / 86400000000.0), 4) AS intercept "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "session_bounce_rate": (
        "WITH o AS (SELECT user_id, event_id, ts, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events), "
        "m AS (SELECT user_id, event_id, ts, CASE WHEN prev IS NULL "
        "OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM o), "
        "s AS (SELECT user_id, ts, sum(new_s) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM m), "
        "g AS (SELECT user_id, sid, count(*) AS n, min(ts) AS start "
        "FROM s GROUP BY 1, 2) "
        "SELECT date_trunc('day', start) AS day, "
        "count(*)::BIGINT AS n_sessions, "
        "sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce, "
        "round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) / count(*), 4) "
        "AS bounce_rate FROM g GROUP BY 1"
    ),
    "funnel_time_to_convert": (
        "WITH f AS (SELECT user_id, "
        "min(CASE WHEN event_type = 'view' THEN ts END) AS v, "
        "min(CASE WHEN event_type = 'purchase' THEN ts END) AS p "
        "FROM events GROUP BY user_id), "
        "c AS (SELECT date_diff('microsecond', v, p) / 1000000.0 AS s "
        "FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v) "
        "SELECT count(*)::BIGINT AS n_converted, "
        "round(quantile_cont(s, 0.5), 4) AS median_s, "
        "round(quantile_cont(s, 0.9), 4) AS p90_s FROM c"
    ),
    "session_windows": (
        "WITH o AS (SELECT user_id, event_id, ts, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events), m AS (SELECT user_id, event_id, ts, CASE WHEN prev IS NULL "
        "OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM o), "
        "s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
        "SELECT user_id, sid::BIGINT AS sid, count(*) AS n, "
        "min(ts) AS session_start FROM s GROUP BY user_id, sid"
    ),
    "heavy_hitters_terms": (
        # threshold 2N/(cap+1) mirrors the engine's MG error bound
        "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term "
        "FROM documents), tot AS (SELECT count(*)::DOUBLE AS nn FROM toks) "
        "SELECT term, count(*)::BIGINT AS n FROM toks, tot "
        "GROUP BY term, tot.nn HAVING count(*) > 2 * tot.nn / 513 "
        "ORDER BY n DESC, term"
    ),
    "hopping_windows": (
        "WITH w AS (SELECT make_timestamp((epoch_us(ts) // 43200000000 "
        "- o) * 43200000000) AS win_start, event_type, value FROM events "
        "CROSS JOIN (VALUES (0), (1)) t(o)) "
        "SELECT win_start, event_type, count(*)::BIGINT AS n, "
        "round(sum(value), 4) AS sum_value FROM w GROUP BY 1, 2"
    ),
    "zscore_quality": (
        "WITH s AS (SELECT source, count(*)::BIGINT AS n, "
        "sum(n_chars)::BIGINT AS s1, sum(n_chars*n_chars)::BIGINT AS s2 "
        "FROM documents GROUP BY source) "
        "SELECT d.doc_id, d.source, round((d.n_chars - s.s1 / s.n) / "
        "sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 4) AS z "
        "FROM documents d JOIN s USING (source)"
    ),
    "pivot_events": (
        "SELECT date_trunc('day', ts) AS day, "
        "count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click, "
        "count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error, "
        "count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase, "
        "count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup, "
        "count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view, "
        "coalesce(sum(CAST(round(value * 100) AS BIGINT)) "
        "FILTER (WHERE event_type = 'purchase'), 0) / 100.0 AS purchase_value "
        "FROM events GROUP BY 1"
    ),
    "weighted_sample": (
        "SELECT doc_id, n_chars, "
        "CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / n_chars AS skey "
        "FROM documents ORDER BY skey, doc_id LIMIT 100"
    ),
    "group_quantiles": (
        "SELECT l_returnflag, "
        "quantile_cont(l_extendedprice, 0.25::DOUBLE) AS p25, "
        "quantile_cont(l_extendedprice, 0.5::DOUBLE) AS p50, "
        "quantile_cont(l_extendedprice, 0.75::DOUBLE) AS p75, "
        "quantile_cont(l_extendedprice, 0.9::DOUBLE) AS p90, "
        "quantile_cont(l_extendedprice, 0.99::DOUBLE) AS p99 "
        "FROM lineitem GROUP BY 1"
    ),
    "fuzzy_join_names": (
        "SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, "
        "round(jaccard(a.p_name, b.p_name), 4) AS jacc "
        "FROM part a JOIN part b "
        "ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey "
        "WHERE jaccard(a.p_name, b.p_name) >= 0.9"
    ),
    "cube_lineitem": (
        "SELECT coalesce(l_returnflag, 'ALL') AS rf, "
        "coalesce(l_linestatus, 'ALL') AS ls, count(*)::BIGINT AS n, "
        "sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty "
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
    ),
    "lag_delta_events": (
        "SELECT event_id, user_id, delta_us FROM ("
        "SELECT event_id, user_id, epoch_us(ts) - lag(epoch_us(ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_us "
        "FROM events) WHERE delta_us IS NOT NULL"
    ),
    "funnel_conversions": (
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY 1), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v USING (user_id) "
        "WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c USING (user_id) "
        "WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1) "
        "SELECT 'view' AS stage, count(*)::BIGINT AS n_users FROM v "
        "UNION ALL SELECT 'click', count(*)::BIGINT FROM c "
        "UNION ALL SELECT 'purchase', count(*)::BIGINT FROM p"
    ),
    "retention_cohorts": (
        "WITH f AS (SELECT user_id, "
        "CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cw "
        "FROM events GROUP BY 1), "
        "a AS (SELECT DISTINCT user_id, "
        "CAST(date_trunc('week', ts) AS TIMESTAMP) AS w FROM events) "
        "SELECT f.cw AS cohort_week, "
        "(epoch_us(a.w) - epoch_us(f.cw)) // 604800000000 AS week_offset, "
        "count(*)::BIGINT AS n_users "
        "FROM a JOIN f USING (user_id) GROUP BY 1, 2"
    ),
    "global_rank_docs": (
        "SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) "
        "AS rank FROM documents"
    ),
    "json_extract_props": (
        "SELECT event_type, count(*)::BIGINT AS n, "
        "sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k, "
        "round(sum(CAST(props->>'$.k' AS BIGINT)) / count(*), 4) AS avg_k "
        "FROM events GROUP BY 1"
    ),
    "star_join_revenue": (
        "SELECT r_name AS region, count(*)::BIGINT AS n_orders, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY 1"
    ),
    "custdist_orders": (
        "SELECT n_orders, count(*)::BIGINT AS n_custs FROM ("
        "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1) "
        "GROUP BY 1"
    ),
    "small_qty_revenue": (
        "SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
        "/ 100.0 / 7.0, 2) AS avg_yearly "
        "FROM lineitem l, (SELECT l_partkey AS pk, "
        "0.2 * avg(l_quantity) AS lim FROM lineitem GROUP BY 1) t "
        "WHERE l.l_partkey = t.pk AND l.l_quantity < t.lim"
    ),
    "large_orders_qty": (
        "SELECT o_orderkey, o_custkey, o_totalprice, "
        "CAST(sum(l_quantity) AS BIGINT) AS total_qty "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY 1, 2, 3 HAVING sum(l_quantity) > 300"
    ),
    "user_top_event": (
        "SELECT user_id, event_type AS top_event, n FROM ("
        "SELECT user_id, event_type, count(*)::BIGINT AS n, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY count(*) DESC, event_type) AS rn "
        "FROM events GROUP BY 1, 2) WHERE rn = 1"
    ),
    "distinct_users_per_type": (
        "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
        "FROM events GROUP BY 1"
    ),
    "user_daily_gapfill": (
        "WITH d AS (SELECT CAST(min(date_trunc('day', ts)) AS TIMESTAMP) "
        "AS lo, CAST(max(date_trunc('day', ts)) AS TIMESTAMP) AS hi "
        "FROM events), "
        "days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) "
        "AS day FROM d), "
        "u AS (SELECT DISTINCT user_id FROM events), "
        "c AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) "
        "AS day, count(*)::BIGINT AS n FROM events GROUP BY 1, 2) "
        "SELECT u.user_id, days.day, coalesce(c.n, 0)::BIGINT AS n "
        "FROM u CROSS JOIN days "
        "LEFT JOIN c ON c.user_id = u.user_id AND c.day = days.day"
    ),
    "hopping_distinct_users": (
        "WITH w AS (SELECT DISTINCT make_timestamp((epoch_us(ts) "
        "// 43200000000 - o) * 43200000000) AS win_start, user_id "
        "FROM events CROSS JOIN (VALUES (0), (1)) t(o)) "
        "SELECT win_start, count(*)::BIGINT AS n_users FROM w GROUP BY 1"
    ),
    "bigram_lift": (
        "WITH d AS (SELECT doc_id, string_split(text, ' ') AS L "
        "FROM documents), "
        "bgc AS (SELECT L[i] AS w1, L[i + 1] AS w2, count(*)::BIGINT "
        "AS n_pair FROM d, unnest(range(1, array_length(L))) AS t(i) "
        "GROUP BY 1, 2), "
        "ug AS (SELECT unnest(L) AS w FROM d), "
        "ugc AS (SELECT w, count(*)::BIGINT AS c FROM ug GROUP BY 1), "
        "n AS (SELECT count(*)::BIGINT AS n FROM ug) "
        "SELECT w1, w2, n_pair, round(CAST(n_pair AS DOUBLE) * n.n / "
        "(CAST(u1.c AS DOUBLE) * u2.c), 4) AS lift "
        "FROM bgc CROSS JOIN n "
        "JOIN ugc u1 ON u1.w = bgc.w1 JOIN ugc u2 ON u2.w = bgc.w2 "
        "WHERE n_pair >= 20 ORDER BY lift DESC, w1, w2 LIMIT 20"
    ),
    "order_priority_counts": (
        "SELECT o_orderpriority, count(*)::BIGINT AS n FROM orders "
        "WHERE o_orderdate >= DATE '1997-01-01' "
        "AND o_orderdate < DATE '1997-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY 1"
    ),
    "priority_linecounts": (
        "SELECT l_returnflag, "
        "sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END)::BIGINT AS high_lines, "
        "sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 0 ELSE 1 END)::BIGINT AS low_lines "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= DATE '1997-01-01' "
        "AND l_shipdate < DATE '1998-01-01' GROUP BY 1"
    ),
    "promo_revenue_pct": (
        "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN "
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "ELSE 0 END) / sum(CAST(round(l_extendedprice * (1 - l_discount) "
        "* 100) AS BIGINT)), 4) AS promo_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= DATE '1997-09-01' "
        "AND l_shipdate < DATE '1997-12-01'"
    ),
    "top_supplier_revenue": (
        "WITH r AS (SELECT l_suppkey, sum(CAST(round(l_extendedprice * "
        "(1 - l_discount) * 100) AS BIGINT)) AS c FROM lineitem "
        "WHERE l_shipdate >= DATE '1997-01-01' "
        "AND l_shipdate < DATE '1997-04-01' GROUP BY 1) "
        "SELECT s_suppkey, s_name, c / 100.0 AS total_revenue "
        "FROM r JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE c = (SELECT max(c) FROM r)"
    ),
    "brand_supplier_cnt": (
        "SELECT p_brand, p_type, p_size, "
        "count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3"
    ),
    "disjunctive_revenue": (
        "SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) / 100.0 AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE "
        "(p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 20 AND 30)"
    ),
    "waiting_suppliers": (
        "WITH l AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
        "max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
        "THEN 1 ELSE 0 END) AS late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE o_orderstatus = 'F' GROUP BY 1, 2), "
        "o AS (SELECT ok, count(*) AS nsup, sum(late) AS nlate "
        "FROM l GROUP BY 1), "
        "w AS (SELECT l.sk FROM l JOIN o USING (ok) "
        "WHERE l.late = 1 AND o.nsup >= 2 AND o.nlate = 1) "
        "SELECT s_name, count(*)::BIGINT AS numwait "
        "FROM w JOIN supplier ON sk = s_suppkey "
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"
    ),
    "idle_rich_customers": (
        "WITH thr AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) "
        "/ 100.0 / count(*) AS v FROM customer WHERE c_acctbal > 0) "
        "SELECT n_name, count(*)::BIGINT AS numcust, "
        "sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey, thr "
        "WHERE c_acctbal > thr.v AND c_custkey NOT IN "
        "(SELECT o_custkey FROM orders "
        "WHERE o_orderdate >= DATE '1999-06-01') GROUP BY 1"
    ),
    "unshipped_orders_topk": (
        "SELECT l_orderkey, sum(CAST(round(l_extendedprice * "
        "(1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue, "
        "o_orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < DATE '1997-06-01' "
        "AND l_shipdate > DATE '1997-06-01' "
        "GROUP BY 1, 3, 4 ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "cheapest_supplier_per_part": (
        "SELECT p_partkey, s_name, n_name, unit_price FROM ("
        "SELECT l_partkey AS p_partkey, l_suppkey, "
        "l_extendedprice / l_quantity AS unit_price, "
        "row_number() OVER (PARTITION BY l_partkey "
        "ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn "
        "FROM lineitem JOIN part ON l_partkey = part.p_partkey "
        "WHERE p_size = 15) t "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey WHERE rn = 1"
    ),
    "nation_trade_matrix": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) / 100.0 AS revenue, count(*)::BIGINT AS n_lines "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "WHERE l_shipdate >= DATE '1997-01-01' "
        "AND l_shipdate < DATE '1998-01-01' GROUP BY 1, 2"
    ),
    "rolling_avg_user_value": (
        "SELECT event_id, "
        "(sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0) "
        "/ count(*) OVER w AS rolling_avg FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    ),
    "ntile_docs": (
        "SELECT doc_id, ntile(4) OVER (ORDER BY n_chars, doc_id)"
        "::BIGINT AS quartile FROM documents"
    ),
    "forecast_revenue": (
        "SELECT sum(CAST(round(l_extendedprice * l_discount * 100) "
        "AS BIGINT)) / 100.0 AS revenue FROM lineitem "
        "WHERE l_shipdate >= DATE '1997-01-01' "
        "AND l_shipdate < DATE '1998-01-01' "
        "AND l_discount >= CAST(0.04 AS DOUBLE) "
        "AND l_discount <= CAST(0.06 AS DOUBLE) AND l_quantity < 24"
    ),
    "market_share": (
        "WITH f AS (SELECT year(o_orderdate) AS o_year, "
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "AS cents, CASE WHEN sn.n_name = 'NATION_7' THEN "
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "ELSE 0 END AS n7_cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "JOIN region ON cn.n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' "
        "AND o_orderdate >= DATE '1996-01-01' "
        "AND o_orderdate < DATE '1998-01-01') "
        "SELECT o_year, round(CAST(sum(n7_cents) AS DOUBLE) / sum(cents), "
        "4) AS mkt_share FROM f GROUP BY 1"
    ),
    "product_profit": (
        "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
        "sum(CAST(round((l_extendedprice * (1 - l_discount) - "
        "p_retailprice * l_quantity * CAST(0.2 AS DOUBLE)) * 100) "
        "AS BIGINT)) / 100.0 AS sum_profit "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE 'red%' GROUP BY 1, 2"
    ),
    "returned_item_report": (
        "SELECT c_custkey, c_name, "
        "sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) / 100.0 AS revenue, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= DATE '1997-01-01' "
        "AND o_orderdate < DATE '1997-04-01' AND l_returnflag = 'R' "
        "GROUP BY 1, 2, 4 ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    "important_parts": (
        "WITH v AS (SELECT l_partkey AS p_partkey, "
        "sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) AS cents "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_3' GROUP BY 1), "
        "t AS (SELECT sum(cents) AS total FROM v) "
        "SELECT p_partkey, cents / 100.0 AS value FROM v, t "
        "WHERE cents * 1000 > total"
    ),
    "promo_suppliers": (
        "SELECT s_suppkey, s_name, total_qty FROM supplier JOIN ("
        "SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) "
        "AS total_qty "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_name LIKE 'red%' "
        "AND l_shipdate >= DATE '1997-01-01' "
        "AND l_shipdate < DATE '1998-01-01' "
        "GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 300) "
        "ON l_suppkey = s_suppkey"
    ),
    "merge_upsert_users": (
        "WITH b AS (SELECT user_id, event_id, ts FROM ("
        "SELECT user_id, event_id, ts, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        f"FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF}') "
        "WHERE rn = 1), "
        "d AS (SELECT user_id, event_id, ts FROM ("
        "SELECT user_id, event_id, ts, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        f"FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF}') "
        "WHERE rn = 1) "
        "SELECT user_id, coalesce(d.event_id, b.event_id) AS event_id, "
        "coalesce(d.ts, b.ts) AS ts, "
        "CASE WHEN b.user_id IS NULL THEN 'inserted' "
        "WHEN d.user_id IS NULL THEN 'unchanged' "
        "ELSE 'updated' END AS status "
        "FROM b FULL JOIN d USING (user_id)"
    ),
    "pareto_customers": (
        "WITH m AS (SELECT o_custkey AS c_custkey, "
        "sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents, "
        "count(*) AS n FROM orders GROUP BY 1) "
        "SELECT c_custkey, cents / 100.0 AS total_spend, "
        "n::BIGINT AS n_orders FROM m a "
        "WHERE NOT EXISTS (SELECT 1 FROM m b "
        "WHERE b.cents >= a.cents AND b.n >= a.n "
        "AND (b.cents > a.cents OR b.n > a.n))"
    ),
    "part_copurchase": (
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "count(*)::BIGINT AS n_orders "
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a "
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING count(*) >= 2"
    ),
    "triangle_count": (
        "WITH e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a "
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING count(*) >= 2) "
        "SELECT count(*)::BIGINT AS n_triangles FROM e e1 "
        "JOIN e e2 ON e1.pb = e2.pa "
        "JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb"
    ),
    "bfs_reach": (
        "WITH RECURSIVE p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a "
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "e AS (SELECT pa AS src, pb AS dst FROM p "
        "UNION ALL SELECT pb, pa FROM p), "
        "s AS (SELECT min(src) AS s FROM e), "
        "bfs(node, hop) AS ("
        "SELECT s, 0 FROM s "
        "UNION "
        "SELECT e.dst, bfs.hop + 1 FROM bfs JOIN e ON e.src = bfs.node "
        "WHERE bfs.hop < 3) "
        "SELECT node AS part_key, CAST(min(hop) AS BIGINT) AS hop "
        "FROM bfs GROUP BY 1"
    ),
    "kn_continuation": (
        "WITH toks AS (SELECT string_split(text, ' ') AS l FROM documents), "
        "pairs AS (SELECT DISTINCT l[i] AS w1, l[i+1] AS w2 "
        "FROM toks, unnest(range(1, len(l))) AS t(i)) "
        "SELECT w2 AS word, count(*)::BIGINT AS n_cont "
        "FROM pairs GROUP BY 1 ORDER BY n_cont DESC, word LIMIT 100"
    ),
    "decayed_revenue": (
        "WITH m AS (SELECT max(o_orderdate) AS d FROM orders) "
        "SELECT o_custkey, round(sum(o_totalprice * power(0.5, "
        "datediff('day', o_orderdate, m.d) // 30)), 2) AS decayed "
        "FROM orders, m GROUP BY 1"
    ),
    "graph_components": (
        "WITH RECURSIVE p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb "
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a "
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "e AS (SELECT pa AS src, pb AS dst FROM p "
        "UNION ALL SELECT pb, pa FROM p), "
        "r(node, lab) AS ("
        "SELECT DISTINCT src, src FROM e "
        "UNION "
        "SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.node "
        "WHERE r.lab < e.dst) "
        "SELECT node AS part_key, min(lab) AS component FROM r GROUP BY 1"
    ),
    "event_paths": (
        "SELECT user_id, string_agg(event_type, ',' "
        "ORDER BY ts, event_id) AS path, "
        "count(*)::BIGINT AS n_events FROM events GROUP BY 1"
    ),
    "pii_redact": (
        "WITH t AS (SELECT doc_id, text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id"
        " || '@mail.example.com' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || (doc_id % 256)"
        " || '.' || (doc_id % 100) ELSE '' END AS itext FROM documents) "
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(regexp_replace(itext, '{_PII_EMAIL}', "
        f"'<EMAIL>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g'), '{_PII_IP}', "
        "'<IP>', 'g') AS clean_text, "
        f"(len(regexp_extract_all(itext, '{_PII_EMAIL}'))"
        f" + len(regexp_extract_all(itext, '{_PII_PHONE}'))"
        f" + len(regexp_extract_all(itext, '{_PII_IP}')))::BIGINT AS n_pii "
        "FROM t"
    ),
    "price_histogram": (
        "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) "
        "AS cents FROM lineitem), "
        "b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c) "
        f"SELECT ((cents - mn) * {_PRICE_HIST_BINS}) // (mx - mn + 1) AS bin, "
        "count(*)::BIGINT AS n FROM c, b GROUP BY 1"
    ),
    "bpe_merge_pairs": (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "wf AS (SELECT w, count(*) AS f FROM w WHERE length(w) >= 2 "
        "GROUP BY 1), "
        "p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, f FROM wf, "
        "LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) t) "
        "SELECT pair, sum(f)::BIGINT AS n FROM p GROUP BY 1 "
        "ORDER BY n DESC, pair LIMIT 50"
    ),
    "price_quantiles_sketch": (
        "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) "
        "AS cents FROM lineitem), "
        "b AS (SELECT min(cents) AS mn, max(cents) AS mx, "
        "count(*) AS total FROM c), "
        f"h AS (SELECT ((cents - mn) * {_PRICE_HIST_BINS}) // (mx - mn + 1) "
        "AS bin, count(*) AS n FROM c, b GROUP BY 1), "
        "cum AS (SELECT bin, sum(n) OVER (ORDER BY bin) AS cumn FROM h), "
        f"qs AS (SELECT unnest({list(_SKETCH_QUANTILES)}) AS q), "
        "pick AS (SELECT q, min(bin) AS bin FROM qs, cum, b "
        "WHERE cumn >= (b.total * q + 99) // 100 GROUP BY q) "
        "SELECT q::BIGINT AS q, bin::BIGINT AS bin, "
        f"(b.mn + (bin * (b.mx - b.mn + 1) + {_PRICE_HIST_BINS - 1}) "
        f"// {_PRICE_HIST_BINS})::BIGINT AS est_cents FROM pick, b"
    ),
    "line_dedup": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents), "
        f"l AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, "
        f"array_to_string(ws[(i*{_LINE_W}+1):(i*{_LINE_W}+{_LINE_W})], ' ') "
        "AS line FROM w, LATERAL (SELECT unnest(generate_series(0, "
        f"CAST((len(ws) + {_LINE_W - 1}) // {_LINE_W} AS INTEGER) - 1)) "
        "AS i) t), "
        "k AS (SELECT doc_id, idx, line, row_number() OVER "
        "(PARTITION BY line ORDER BY doc_id, idx) AS rn FROM l) "
        "SELECT doc_id, count(*)::BIGINT AS n_lines, "
        "sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS removed_lines, "
        "coalesce(string_agg(CASE WHEN rn = 1 THEN line END, ' ' "
        "ORDER BY idx), '') AS text "
        "FROM k GROUP BY doc_id"
    ),
    "percent_rank_docs": (
        "SELECT doc_id, round(percent_rank() OVER "
        "(ORDER BY n_chars, doc_id), 6) AS pct_rank FROM documents"
    ),
    "geo_mean_prices": (
        "SELECT l_returnflag, count(*)::BIGINT AS n, "
        "round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean, "
        "round(count(*) / sum(1.0 / l_extendedprice), 4) AS harm_mean "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "mixture_weights": (
        "WITH c AS (SELECT source, count(*)::BIGINT AS n "
        "FROM documents GROUP BY source), "
        f"s AS (SELECT sum(pow(n, {_MIX_ALPHA})) AS z, sum(n) AS tot "
        "FROM c) "
        "SELECT c.source, c.n, "
        f"round(pow(c.n, {_MIX_ALPHA}) / s.z, 6) AS weight, "
        f"CAST(round(s.tot * pow(c.n, {_MIX_ALPHA}) / s.z, 0) AS BIGINT) "
        "AS expected_docs FROM c, s"
    ),
    "vocab_coverage": (
        "WITH t AS (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "c AS (SELECT w, count(*)::BIGINT AS n FROM t GROUP BY w), "
        "r AS (SELECT w, n, row_number() OVER (ORDER BY n DESC, w) "
        "AS rn FROM c), "
        "tot AS (SELECT sum(n) AS s FROM c) "
        "SELECT CAST(k.k AS BIGINT) AS k, "
        "sum(CASE WHEN r.rn <= k.k THEN r.n ELSE 0 END)::BIGINT "
        "AS covered, "
        "CAST((SELECT s FROM tot) AS BIGINT) AS total, "
        "round(sum(CASE WHEN r.rn <= k.k THEN r.n ELSE 0 END) "
        "/ (SELECT s FROM tot), 6) AS coverage "
        f"FROM r CROSS JOIN (VALUES {', '.join(f'({k})' for k in _COV_KS)}) "
        "AS k(k) GROUP BY k.k"
    ),
    "copurchase_jaccard": (
        "WITH d AS (SELECT DISTINCT l_orderkey, l_partkey "
        "FROM lineitem), "
        "e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
        "count(*)::BIGINT AS co FROM d a JOIN d b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING count(*) >= 2), "
        "g AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS dg "
        "FROM lineitem GROUP BY 1) "
        "SELECT e.pa AS part_a, e.pb AS part_b, e.co AS n_orders, "
        "round(e.co / (ga.dg + gb.dg - e.co), 6) AS jacc "
        "FROM e JOIN g ga ON ga.l_partkey = e.pa "
        "JOIN g gb ON gb.l_partkey = e.pb"
    ),
    "zonemap_prune": (
        "WITH l AS (SELECT l_orderkey, epoch_us(l_shipdate) AS us "
        "FROM lineitem), "
        "a AS (SELECT 'orderkey' AS layout, "
        f"l_orderkey // {_ZM_OK_WIDTH} AS bucket, "
        "count(*)::BIGINT AS n, min(us) AS mn, max(us) AS mx "
        "FROM l GROUP BY 1, 2 "
        "UNION ALL SELECT 'shipdate', us // 2678400000000, "
        "count(*)::BIGINT, min(us), max(us) FROM l GROUP BY 1, 2), "
        "p AS (SELECT layout, n, CASE WHEN "
        f"mx < epoch_us(TIMESTAMP '{_ZM_LO}') "
        f"OR mn > epoch_us(TIMESTAMP '{_ZM_HI}') "
        "THEN 1 ELSE 0 END AS pr FROM a) "
        "SELECT layout, count(*)::BIGINT AS n_buckets, "
        "sum(pr)::BIGINT AS n_pruned, sum(n)::BIGINT AS rows_total, "
        "sum(CASE WHEN pr = 1 THEN 0 ELSE n END)::BIGINT "
        "AS rows_scanned, "
        "round(sum(CASE WHEN pr = 1 THEN 0 ELSE n END) / sum(n), 6) "
        "AS scan_frac FROM p GROUP BY layout"
    ),
    "incremental_agg_merge": (
        "SELECT user_id, count(*)::BIGINT AS n_events, "
        "round(sum(value), 4) AS sum_value FROM events GROUP BY user_id"
    ),
    "bigram_lm_score": (
        "WITH tr AS (SELECT string_split(text, ' ') AS ws "
        "FROM documents WHERE doc_id % 2 = 0), "
        "tb AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM tr, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) "
        "t), "
        "bc AS (SELECT w1, w2, count(*)::BIGINT AS c FROM tb "
        "GROUP BY 1, 2), "
        "cc AS (SELECT w1, sum(c) AS c1 FROM bc GROUP BY 1), "
        "v AS (SELECT count(DISTINCT w) AS nv FROM "
        "(SELECT unnest(ws) AS w FROM tr)), "
        "ho AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents WHERE doc_id % 2 = 1 "
        "AND len(string_split(text, ' ')) >= 2), "
        "hb AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2 FROM ho, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) "
        "t), "
        "sc AS (SELECT h.doc_id, "
        f"ln((coalesce(bc.c, 0) + {_LM_K}) / "
        f"(coalesce(cc.c1, 0) + {_LM_K} * (SELECT nv FROM v))) AS lp "
        "FROM hb h LEFT JOIN bc ON bc.w1 = h.w1 AND bc.w2 = h.w2 "
        "LEFT JOIN cc ON cc.w1 = h.w1) "
        "SELECT doc_id, count(*)::BIGINT AS n_bigrams, "
        "round(-avg(lp), 4) AS nll FROM sc GROUP BY doc_id"
    ),
    "padding_efficiency": (
        "WITH t AS (SELECT len(string_split(text, ' ')) AS ntok "
        "FROM documents), "
        f"b AS (SELECT ntok, CAST((ntok + {_PAD_GRID - 1}) "
        f"// {_PAD_GRID} AS BIGINT) AS bucket FROM t) "
        "SELECT bucket, count(*)::BIGINT AS n_seqs, "
        "max(ntok)::BIGINT AS max_tokens, "
        f"(bucket * {_PAD_GRID})::BIGINT AS cap, "
        f"(count(*) * bucket * {_PAD_GRID} - sum(ntok))::BIGINT "
        "AS padded_tokens, "
        f"round(sum(ntok) / (count(*) * bucket * {_PAD_GRID}), 6) "
        "AS efficiency FROM b GROUP BY bucket"
    ),
    "ab_test_welch": (
        "WITH a AS (SELECT count(*) AS n, avg(value) AS m, "
        "var_samp(value) AS v FROM events "
        "WHERE event_type = 'click'), "
        "b AS (SELECT count(*) AS n, avg(value) AS m, "
        "var_samp(value) AS v FROM events "
        "WHERE event_type = 'purchase') "
        "SELECT a.n::BIGINT AS n_a, b.n::BIGINT AS n_b, "
        "round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b, "
        "round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) "
        "AS t_stat, "
        "round(pow(a.v / a.n + b.v / b.n, 2) / "
        "(pow(a.v / a.n, 2) / (a.n - 1) "
        "+ pow(b.v / b.n, 2) / (b.n - 1)), 4) AS welch_df "
        "FROM a, b"
    ),
    "source_kl_divergence": (
        "WITH t AS (SELECT source, unnest(string_split(text, ' ')) "
        "AS w FROM documents), "
        "c AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2), "
        "vg AS (SELECT w, count(*) AS cg FROM t GROUP BY w), "
        "v AS (SELECT count(*) AS nv FROM vg), "
        "ns AS (SELECT source, count(*) AS n FROM t GROUP BY source), "
        "tot AS (SELECT count(*) AS nn FROM t), "
        "grid AS (SELECT ns.source, vg.w, ns.n, vg.cg "
        "FROM ns CROSS JOIN vg), "
        "j AS (SELECT g.source, g.w, coalesce(c.c, 0) AS cs, g.n, "
        "g.cg FROM grid g LEFT JOIN c "
        "ON c.source = g.source AND c.w = g.w), "
        f"p AS (SELECT source, (cs + {_KL_SMOOTH}) / "
        f"(n + {_KL_SMOOTH} * (SELECT nv FROM v)) AS pw, "
        f"(cg + {_KL_SMOOTH}) / ((SELECT nn FROM tot) "
        f"+ {_KL_SMOOTH} * (SELECT nv FROM v)) AS qw FROM j) "
        "SELECT source, round(sum(pw * ln(pw / qw)), 4) AS kl "
        "FROM p GROUP BY source"
    ),
    "window_dedup": (
        "WITH w AS (SELECT event_id, user_id, event_type, ts, "
        "lag(ts) OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts, event_id) AS prev FROM events) "
        "SELECT event_id, user_id, event_type, ts FROM w "
        "WHERE prev IS NULL "
        f"OR date_diff('microsecond', prev, ts) >= {_WDD_GAP_US}"
    ),
    "rfm_scores": (
        "WITH g AS (SELECT o_custkey AS custkey, "
        "date_diff('day', max(o_orderdate), "
        "(SELECT max(o_orderdate) FROM orders)) AS recency_days, "
        "count(*)::BIGINT AS frequency, "
        "round(sum(o_totalprice), 2) AS monetary "
        "FROM orders GROUP BY o_custkey) "
        "SELECT custkey, recency_days::BIGINT AS recency_days, "
        "frequency, monetary, "
        f"ntile({_RFM_K}) OVER (ORDER BY recency_days, custkey)"
        "::BIGINT AS r_score, "
        f"ntile({_RFM_K}) OVER (ORDER BY frequency DESC, custkey)"
        "::BIGINT AS f_score, "
        f"ntile({_RFM_K}) OVER (ORDER BY monetary DESC, custkey)"
        "::BIGINT AS m_score FROM g"
    ),
    "attribution_last_touch": (
        "WITH m AS (SELECT p.value AS value, "
        "date_trunc('day', c.click_ts) AS click_day "
        "FROM (SELECT user_id, ts, value FROM events "
        "WHERE event_type = 'purchase') p "
        "ASOF JOIN (SELECT user_id, ts AS click_ts FROM events "
        "WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts >= c.click_ts) "
        "SELECT click_day, count(*)::BIGINT AS n_purchases, "
        "round(sum(value), 4) AS attributed_value "
        "FROM m GROUP BY click_day"
    ),
    "boilerplate_lines": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents), "
        f"l AS (SELECT array_to_string("
        f"ws[(i*{_LINE_W}+1):(i*{_LINE_W}+{_LINE_W})], ' ') AS line "
        "FROM w, LATERAL (SELECT unnest(generate_series(0, "
        f"CAST((len(ws) + {_LINE_W - 1}) // {_LINE_W} AS INTEGER) - 1)) "
        "AS i) t) "
        "SELECT line, count(*)::BIGINT AS n FROM l GROUP BY line "
        f"ORDER BY n DESC, line LIMIT {_BOILER_TOPK}"
    ),
    "mixture_upsample": (
        "WITH c AS (SELECT lang, count(*) AS n FROM documents "
        "GROUP BY 1), "
        "m AS (SELECT max(n) AS mx FROM c), "
        "f AS (SELECT lang, CAST(ceil(mx::DOUBLE / n) AS BIGINT) "
        "AS fac FROM c, m) "
        "SELECT d.doc_id, CAST(i AS BIGINT) AS copy_idx "
        "FROM documents d JOIN f USING (lang), "
        "LATERAL (SELECT unnest(generate_series(1, fac)) AS i) u"
    ),
    "kmv_jaccard": (
        "WITH d AS (SELECT DISTINCT event_type, user_id FROM events), "
        "h AS (SELECT event_type, "
        f"(user_id * {_HASH_MULT}) % {_HASH_MOD} AS hv FROM d), "
        "t AS (SELECT DISTINCT event_type FROM events), "
        "p AS (SELECT a.event_type AS ta, b.event_type AS tb FROM t a "
        "JOIN t b ON a.event_type < b.event_type), "
        "u AS (SELECT p.ta, p.tb, h.hv, "
        "max(CASE WHEN h.event_type = p.ta THEN 1 ELSE 0 END) AS ina, "
        "max(CASE WHEN h.event_type = p.tb THEN 1 ELSE 0 END) AS inb "
        "FROM p JOIN h ON h.event_type IN (p.ta, p.tb) "
        "GROUP BY p.ta, p.tb, h.hv), "
        "r AS (SELECT ta, tb, ina, inb, row_number() OVER ("
        "PARTITION BY ta, tb ORDER BY hv) AS rn FROM u), "
        f"sel AS (SELECT * FROM r WHERE rn <= {_KMV_K}) "
        "SELECT ta AS type_a, tb AS type_b, count(*)::BIGINT AS k_used, "
        "round(sum(ina * inb) / count(*), 4) AS jacc_est "
        "FROM sel GROUP BY ta, tb"
    ),
    "activity_heatmap": (
        "WITH c AS (SELECT dayofweek(ts) AS dow, hour(ts) AS hod, "
        "count(*)::BIGINT AS n FROM events GROUP BY 1, 2) "
        "SELECT dow, hod, n, round(n / sum(n) OVER (), 4) AS pct FROM c"
    ),
    "group_bottomk_sample": (
        "WITH d AS (SELECT DISTINCT event_type, user_id FROM events), "
        "r AS (SELECT event_type, user_id, row_number() OVER ("
        "PARTITION BY event_type ORDER BY "
        f"(user_id * {_HASH_MULT}) % {_HASH_MOD}, user_id) AS rn FROM d) "
        f"SELECT event_type, user_id FROM r WHERE rn <= {_GBK_K}"
    ),
    "price_drawdown": (
        "WITH s AS (SELECT o_orderpriority, o_totalprice, "
        "max(o_totalprice) OVER (ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run_max "
        "FROM orders) "
        "SELECT o_orderpriority, count(*) FILTER (run_max IS NOT NULL "
        f"AND o_totalprice < {_DRAWDOWN_FRAC} * run_max)::BIGINT "
        "AS n_drawdown, count(*)::BIGINT AS n "
        "FROM s GROUP BY o_orderpriority"
    ),
    "skipgram_pairs": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents), "
        "tok AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w, "
        "CAST(i AS BIGINT) AS i FROM w, "
        "LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u), "
        "p AS (SELECT least(a.w, b.w) || ' ' || greatest(a.w, b.w) "
        "AS pair FROM tok a JOIN tok b ON a.doc_id = b.doc_id "
        f"AND b.i > a.i AND b.i <= a.i + {_SKIP_K}) "
        "SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY 1 "
        "ORDER BY n DESC, pair LIMIT 50"
    ),
    "peak_concurrency": (
        "WITH deltas AS ("
        "SELECT event_type, ts AS t, 1 AS d FROM events "
        "UNION ALL "
        "SELECT event_type, ts + INTERVAL 1 HOUR AS t, -1 AS d "
        "FROM events), "
        "sweep AS (SELECT event_type, sum(d) OVER ("
        "PARTITION BY event_type ORDER BY t, d DESC) AS open "
        "FROM deltas) "
        "SELECT event_type, max(open)::BIGINT AS peak FROM sweep "
        "GROUP BY event_type"
    ),
    "scd2_intervals": (
        "WITH o AS (SELECT user_id, event_type, ts, event_id, "
        "lag(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev FROM events), "
        "ch AS (SELECT user_id, event_type, ts, event_id FROM o "
        "WHERE prev IS NULL OR prev <> event_type), "
        "iv AS (SELECT user_id, event_type, ts AS valid_from, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS valid_to FROM ch) "
        "SELECT user_id, event_type, valid_from, valid_to FROM iv "
        "WHERE valid_to IS NOT NULL"
    ),
    "corr_price_qty": (
        "SELECT l_returnflag, count(*)::BIGINT AS n, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, "
        "round(regr_slope(l_extendedprice, l_quantity), 4) AS slope "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "iqr_outliers": (
        "WITH q AS (SELECT event_type, "
        "quantile_cont(value, 0.25) AS q1, "
        "quantile_cont(value, 0.75) AS q3 FROM events GROUP BY 1) "
        "SELECT e.event_type AS event_type, q1, q3, "
        f"count(*) FILTER (value < q1 - {_IQR_FENCE}*(q3-q1) "
        f"OR value > q3 + {_IQR_FENCE}*(q3-q1))::BIGINT AS n_out "
        "FROM events e JOIN q USING (event_type) "
        "GROUP BY e.event_type, q1, q3"
    ),
    "audience_overlap": (
        "WITH d AS (SELECT DISTINCT event_type, user_id FROM events), "
        "c AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1), "
        "p AS (SELECT a.event_type AS ta, b.event_type AS tb, "
        "count(*) AS nb FROM d a JOIN d b USING (user_id) "
        "WHERE a.event_type < b.event_type GROUP BY 1, 2) "
        "SELECT ta AS type_a, tb AS type_b, ca.n::BIGINT AS n_a, "
        "cb.n::BIGINT AS n_b, nb::BIGINT AS n_both, "
        "round(nb::DOUBLE / (ca.n + cb.n - nb), 4) AS jacc "
        "FROM p JOIN c ca ON ca.event_type = p.ta "
        "JOIN c cb ON cb.event_type = p.tb"
    ),
}
