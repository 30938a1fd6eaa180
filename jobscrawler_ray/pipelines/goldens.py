"""Sequential golden oracles for the queries DuckDB cannot express.

The driver's correctness gate runs each ``queries()[name](sf_dir)``
side-by-side with ``oracle_sql()[name]`` (row count + schema +
order-insensitive value hash). SQL can't express MinHash banding, LSH
bucketing, the stand-in embedding model, the image codecs, or the crawl
orchestration — so for those this module computes the expected output
with an INDEPENDENT SEQUENTIAL implementation (plain Python/numpy
single-process loops, no Ray) and renders it as a ``VALUES``-backed SQL
statement DuckDB can run. What the comparison then verifies is exactly
what a distributed engine can get wrong: the wave/bucket/shuffle
orchestration, partition-order effects, and dedup/merge plumbing. The
leaf kernels (``functions/dedupe.py``, ``functions/textstats.py``,
``functions/codecs.py``, the stand-in model) are definitionally shared —
the same pattern the driver-green ``location_tags_full`` /
``clean_pipeline`` oracles use, and the same split the conformance suite
documents (``pipelines/oracle.py``: shared leaves, independent
orchestration).

Tunables (band counts, seeds, taus) are imported from
``pipelines/queries.py`` so the two sides cannot drift.

Everything here must be BIT-DETERMINISTIC and partition-order-free on
the engine side; ``_ivf_centroids`` int64-quantizes its partial sums for
exactly that reason.

These functions run on the DRIVER only (``__ray_entry__.oracle_sql()``)
— never inside map tasks — so their O(N) sequential cost is paid once
per correctness run, at golden scale.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as papq

from ..functions import codecs, dedupe, textstats
from ..stages.multimodal import resize_area
from .oracle import run_oracle
from .queries import (
    _ANN_BANDS,
    _INV_CANON,
    _INV_PSNR_TAU,
    _round_half_up,
    _ann_bits,
    _ANN_SEED,
    _COS_TAU,
    _IVF_K,
    _IVF_NLIST,
    _ivf_params,
    _IVF_QUANT,
    _MH_BANDS,
    _MH_PERMS,
    _MH_SEED,
    _MH_SHINGLE_K,
    _MH_VERIFY_TAU,
    _norm_rows,
    _probe_lists,
    _BPE_TOPV,
    _bpe_train,
    _bpe_token_len,
    _BITEXT_TOPK,
    _BITEXT_TAU,
    crawl_world_params,
)

# --------------------------------------------------------------------------
# VALUES-SQL rendering
# --------------------------------------------------------------------------


def _lit(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))  # repr round-trips float64 exactly
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported literal type {type(v)}")


def values_sql(df: pd.DataFrame, types: dict[str, str]) -> str:
    """Render a golden DataFrame as ``SELECT ... FROM (VALUES ...)`` with
    explicit casts so DuckDB's inferred types match the engine output."""
    cols = list(df.columns)
    sel = ", ".join(f"CAST({c} AS {types[c]}) AS {c}" for c in cols)
    if df.empty:
        # typed empty relation
        nulls = ", ".join(f"CAST(NULL AS {types[c]}) AS {c}" for c in cols)
        return f"SELECT {nulls} WHERE FALSE"
    rows = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")"
        for row in df.itertuples(index=False)
    )
    return f"SELECT {sel} FROM (VALUES {rows}) AS g({', '.join(cols)})"


# --------------------------------------------------------------------------
# sequential inputs
# --------------------------------------------------------------------------


def _documents(sf_dir: str) -> tuple[list[int], list[str], list[str]]:
    t = papq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "lang"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist()


def _embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    return ids, mat


# --------------------------------------------------------------------------
# text goldens
# --------------------------------------------------------------------------


def golden_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Sequential HLL over the full user_id column in one pass — the
    Ray side merges per-batch register tables by max; elementwise max is
    order-free so both produce the identical 4096-register table."""
    from ..functions import sketch

    uid = papq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )["user_id"].to_numpy()
    regs = sketch.hll_registers(uid)
    return pd.DataFrame({"n_approx": pd.Series(
        [sketch.hll_estimate(regs)], dtype=np.int64)})


def golden_cm_counts_users(sf_dir: str) -> pd.DataFrame:
    """Sequential count-min over the full user_id column in one pass —
    the Ray side merges per-batch cell tables by sum; integer addition
    is order-free so both produce the identical (4×4096) table."""
    from ..functions import sketch
    from .queries import _CM_PROBE_KEYS

    uid = papq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )["user_id"].to_numpy()
    tbl = sketch.cm_table(uid)
    keys = np.arange(_CM_PROBE_KEYS, dtype=np.int64)
    return pd.DataFrame({"user_id": keys,
                         "n_est": sketch.cm_query(tbl, keys).astype(np.int64)})


def golden_langid(sf_dir: str) -> pd.DataFrame:
    ids, texts, langs = _documents(sf_dir)
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype=np.int64),
        "lang": langs,
        "lang_pred": [textstats.lang_id(t) for t in texts],
    })


def golden_fingerprints(sf_dir: str) -> pd.DataFrame:
    ids, texts, _ = _documents(sf_dir)
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype=np.int64),
        "fingerprint": pd.Series(
            [textstats.fingerprint64(t) for t in texts], dtype=np.int64),
        "n_winnow": pd.Series(
            [len(textstats.winnow_fingerprints(t)) for t in texts], dtype=np.int64),
    })


def golden_simhash(sf_dir: str) -> pd.DataFrame:
    ids, texts, _ = _documents(sf_dir)
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype=np.int64),
        "simhash": pd.Series(
            [dedupe.simhash64(t.split(" ")) for t in texts], dtype=np.int64),
    })


def golden_minhash_lsh(sf_dir: str) -> pd.DataFrame:
    """Single-process re-run of shingle → minhash → band bucket →
    candidate pairs → exact-Jaccard verify (same tunables as the
    distributed pipeline in ``q_minhash_lsh``)."""
    ids, texts, _ = _documents(sf_dir)
    hasher = dedupe.MinHasher(num_perm=_MH_PERMS, seed=_MH_SEED)
    shingles: dict[int, np.ndarray] = {}
    buckets: dict[int, set[int]] = {}
    for did, text in zip(ids, texts):
        s = dedupe.shingle_set(text, k=_MH_SHINGLE_K)
        shingles[did] = s
        sig = hasher.signature(s)
        for key in hasher.band_keys(sig, _MH_BANDS):
            buckets.setdefault(key, set()).add(did)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    rows = []
    for a, b in sorted(cand):
        jv = dedupe.jaccard(shingles[a], shingles[b])
        if jv >= _MH_VERIFY_TAU:
            rows.append((a, b, round(jv, 4)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jacc"]).astype(
        {"id_a": np.int64, "id_b": np.int64, "jacc": np.float64})


def _uf():
    """Dict-backed int union-find shared by the golden CC twins (the
    independence contract is engine-vs-golden, not golden-vs-golden):
    ``union`` roots to the SMALLER root, so ``find`` yields the
    component minimum. Returns (find, union, parent) — ``parent``
    exposed for the drop-list idiom ``x in parent and find(x) != x``."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo

    return find, union, parent


def golden_minhash_drops(sf_dir: str) -> list[int]:
    """Union-find over the golden pair list → dropped doc_ids (every
    component member except its minimum)."""
    pairs = golden_minhash_lsh(sf_dir)
    find, union, parent = _uf()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        union(int(a), int(b))
    return sorted(x for x in parent if find(x) != x)


# --------------------------------------------------------------------------
# embedding goldens
# --------------------------------------------------------------------------


def golden_minhash_best_drops(sf_dir: str) -> list[int]:
    """Sequential twin of ``queries.q_minhash_dedup_best``'s drop set:
    union-find over the golden pair list, then per component keep the
    LONGEST member (max whitespace n_tokens via the shared
    ``textstats.token_count_ws`` leaf, tie → min doc_id) and drop the
    rest — independent orchestration (dict union-find + max() loop) of
    the engine's CC + encoded-key Max aggregate."""
    pairs = golden_minhash_lsh(sf_dir)
    ids, texts, _ = _documents(sf_dir)
    ntok = {int(i): int(textstats.token_count_ws(x))
            for i, x in zip(ids, texts)}
    find, union, _parent = _uf()
    nodes: set[int] = set()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        a, b = int(a), int(b)
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    comps: dict[int, list[int]] = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    drops: list[int] = []
    for members in comps.values():
        best = max(members, key=lambda d: (ntok[d], -d))
        drops.extend(m for m in members if m != best)
    return sorted(drops)


def golden_graph_walks(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_graph_walks``: dict-of-lists
    co-purchase adjacency (own order→parts mining loop), the shared
    (A, B, C) step-chooser constants, plain per-walk loop."""
    from .queries import _WALK_A, _WALK_B, _WALK_C, _WALK_LEN

    tbl = papq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                          columns=["l_orderkey", "l_partkey"])
    baskets: dict[int, set[int]] = {}
    for ok, pk in zip(tbl["l_orderkey"].to_pylist(),
                      tbl["l_partkey"].to_pylist()):
        baskets.setdefault(int(ok), set()).add(int(pk))
    cnt: dict[tuple[int, int], int] = {}
    for ps in baskets.values():
        ms = sorted(ps)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
    adj: dict[int, list[int]] = {}
    for (a, b), n in cnt.items():
        if n >= 2:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
    nbr_sorted = {k: sorted(v) for k, v in adj.items()}
    rows = []
    for start in sorted(adj):
        cur = start
        rows.append((start, 0, cur))
        for step in range(1, _WALK_LEN + 1):
            nb = nbr_sorted[cur]
            idx = int((start * int(_WALK_A) + cur * int(_WALK_B)
                       + step * int(_WALK_C)) % len(nb))
            cur = nb[idx]
            rows.append((start, step, cur))
    return pd.DataFrame(rows, columns=["walk_id", "step", "node"]) \
        .astype({"walk_id": np.int64, "step": np.int64,
                 "node": np.int64})


def golden_approx_distinct_by_type(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_approx_distinct_by_type``: one
    whole-column HLL per event_type via the shared sketch leaves."""
    from ..functions import sketch

    tbl = papq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_type", "user_id"])
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    uid = tbl["user_id"].to_numpy()
    rows = []
    for x in sorted(set(et)):
        regs = sketch.hll_registers(uid[et == x])
        rows.append((x, int(sketch.hll_estimate(regs))))
    return pd.DataFrame(rows, columns=["event_type", "n_approx"]) \
        .astype({"n_approx": np.int64})


def golden_dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_dup_cluster_sizes``: union-find
    over the golden pair list → component-size histogram."""
    pairs = golden_minhash_lsh(sf_dir)
    find, union, _parent = _uf()
    nodes: set[int] = set()
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        a, b = int(a), int(b)
        nodes.add(a)
        nodes.add(b)
        union(a, b)
    sizes: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        sizes[r] = sizes.get(r, 0) + 1
    hist: dict[int, int] = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    return pd.DataFrame(
        sorted(hist.items()), columns=["cluster_size", "n_clusters"]
    ).astype({"cluster_size": np.int64, "n_clusters": np.int64})


def golden_compaction_plan(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_compaction_plan``: same listing,
    same (size desc, path asc) order, first-fit re-implemented as an
    index scan over bin-remaining capacities."""
    from .queries import _COMPACT_TARGET, _crawl_out

    root = os.path.join(_crawl_out(sf_dir), "image_caption")
    files = []
    for dirpath, _, names in os.walk(root):
        for nm in names:
            if nm.endswith(".parquet"):
                p = os.path.join(dirpath, nm)
                files.append((os.path.relpath(p, root),
                              os.path.getsize(p)))
    order = sorted(files, key=lambda x: (-x[1], x[0]))
    remaining: list[int] = []
    counts: list[int] = []
    for _, size in order:
        placed = None
        for i in range(len(remaining)):
            if remaining[i] >= size:
                placed = i
                break
        if placed is None:
            remaining.append(_COMPACT_TARGET - size)
            counts.append(1)
        else:
            remaining[placed] -= size
            counts[placed] += 1
    return pd.DataFrame({
        "bin_id": pd.Series(range(len(counts)), dtype=np.int64),
        "n_files": pd.Series(counts, dtype=np.int64),
        "total_bytes": pd.Series(
            [int(_COMPACT_TARGET - r) for r in remaining],
            dtype=np.int64),
    })


def golden_ann_dim_recall(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_ann_dim_recall``: two whole-
    corpus numpy scans (full dims / first half renormalized), same
    rounded-score/id tie order, set intersection per probe."""
    from .queries import _MRL_K, _norm_rows, _round_half_up

    tbl = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    half = mat.shape[1] // 2
    qm = ids < 5
    qids = ids[qm]
    rows = []
    for q in qids:
        tops = []
        for cn, qn in ((_norm_rows(mat), _norm_rows(mat[qm][qids == q])),
                       (_norm_rows(mat[:, :half]),
                        _norm_rows(mat[qm][qids == q][:, :half]))):
            sims = _round_half_up(qn @ cn.T, 6)[0]
            m = ids != q
            order = np.lexsort((ids[m], -sims[m]))[:_MRL_K]
            tops.append(set(int(x) for x in ids[m][order]))
        rows.append((int(q), len(tops[0] & tops[1])))
    return pd.DataFrame(rows, columns=["query_id", "n_overlap"]) \
        .astype({"query_id": np.int64, "n_overlap": np.int64})


def golden_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_zorder_layout``: same 21-bit
    range scaling, bit interleave via a per-row Python loop over the
    42 bit positions (independent of the engine's SWAR spread)."""
    from .queries import _Z_BITS, _Z_BUCKETS

    tbl = papq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                          columns=["l_partkey", "l_suppkey"])
    pk = tbl["l_partkey"].to_pylist()
    sk = tbl["l_suppkey"].to_pylist()
    pm, sm = max(pk), max(sk)
    agg: dict[int, list[int]] = {}
    for p, s in zip(pk, sk):
        pq = (p << _Z_BITS) // (pm + 1)
        sq = (s << _Z_BITS) // (sm + 1)
        code = 0
        for bit in range(_Z_BITS):
            code |= ((pq >> bit) & 1) << (2 * bit)
            code |= ((sq >> bit) & 1) << (2 * bit + 1)
        b = code >> (2 * _Z_BITS - 4)
        e = agg.setdefault(b, [0, p, p, s, s])
        e[0] += 1
        e[1], e[2] = min(e[1], p), max(e[2], p)
        e[3], e[4] = min(e[3], s), max(e[4], s)
    rows = [(b, *agg[b]) for b in sorted(agg)]
    return pd.DataFrame(rows, columns=["bucket", "n", "pk_min",
                                       "pk_max", "sk_min", "sk_max"]) \
        .astype({c: np.int64 for c in ["bucket", "n", "pk_min",
                                       "pk_max", "sk_min", "sk_max"]})


def golden_entity_clusters(sf_dir: str, tau: float = 0.9) -> pd.DataFrame:
    """Sequential twin of ``queries.q_entity_clusters``: brand-blocked
    pairwise char-SET Jaccard via plain Python sets (independent of the
    engine's 128-bit SWAR mask kernel), dict union-find, every part
    mapped to its component-min representative."""
    tbl = papq.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_name", "p_brand"])
    keys = tbl["p_partkey"].to_pylist()
    names = tbl["p_name"].to_pylist()
    brands = tbl["p_brand"].to_pylist()
    blocks: dict[str, list[int]] = {}
    for i, b in enumerate(brands):
        blocks.setdefault(b, []).append(i)
    find, union, _parent = _uf()
    for idxs in blocks.values():
        sets = [set(names[i]) for i in idxs]
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= tau:
                    union(keys[idxs[a]], keys[idxs[b]])
    return pd.DataFrame({
        "p_partkey": pd.Series(keys, dtype=np.int64),
        "cluster_rep": pd.Series([find(k) for k in keys],
                                 dtype=np.int64),
    })


def golden_embedding_drops(sf_dir: str) -> list[int]:
    """Sequential twin of ``q_embedding_dedup_keep``: brute-force exact
    cosine pairs (cos ≥ 0.4) + union-find → dropped vec_ids (every
    component member except its minimum)."""
    ids, mat = _embeddings(sf_dir)
    n = _norm_rows(mat)
    sims = n @ n.T
    iu = np.triu_indices(len(ids), k=1)
    sel = sims[iu] >= _COS_TAU
    find, union, parent = _uf()
    for a, b in zip(ids[iu[0][sel]], ids[iu[1][sel]]):
        union(int(a), int(b))
    return sorted(x for x in parent if find(x) != x)


def golden_bitext_mine(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_bitext_mine``: per even-id source vector,
    a full descending sort of its cosines against the odd-id target
    side (independent of the engine's argpartition), margin =
    best / mean(top-4), smallest-target-id tie-break, rounded-margin
    ≥ τ filter."""
    ids, mat = _embeddings(sf_dir)
    n = _norm_rows(mat)
    asel = ids % 2 == 0
    a_ids, b_ids = ids[asel], ids[~asel]
    A, B = n[asel], n[~asel]
    rows: list[tuple[int, int, float]] = []
    if len(b_ids) >= _BITEXT_TOPK:
        for i in range(len(a_ids)):
            sims = B @ A[i]
            top = np.argsort(-sims, kind="stable")[:_BITEXT_TOPK]
            ts = sims[top]
            tied = top[ts == ts[0]]
            tgt = int(b_ids[tied].min())
            margin = float(_round_half_up(ts[0] / ts.mean(), 4))
            if margin >= _BITEXT_TAU:
                rows.append((int(a_ids[i]), tgt, margin))
    return pd.DataFrame(rows, columns=["src_id", "tgt_id", "margin"]) \
        .astype({"src_id": np.int64, "tgt_id": np.int64,
                 "margin": np.float64})


def golden_embedding_neardup_ann(sf_dir: str) -> pd.DataFrame:
    """Sequential random-hyperplane LSH: same planes (seeded), same
    corpus-scaled bits per band (``_ann_bits``), same chunk*nb+b bucket
    keys, exact cosine within buckets."""
    ids, mat = _embeddings(sf_dir)
    rb = _ann_bits(len(mat))
    rng = np.random.default_rng(_ANN_SEED)
    planes = rng.standard_normal((_ANN_BANDS * rb, mat.shape[1]))
    bits = (mat @ planes.T) > 0
    weights = 1 << np.arange(rb)
    normed = _norm_rows(mat)
    buckets: dict[int, list[int]] = {}
    for b in range(_ANN_BANDS):
        chunk = bits[:, b * rb:(b + 1) * rb] @ weights
        keys = chunk.astype(np.int64) * _ANN_BANDS + b
        for row, key in enumerate(keys):
            buckets.setdefault(int(key), []).append(row)
    out: set[tuple[int, int]] = set()
    for rows in buckets.values():
        if len(rows) < 2:
            continue
        sub = normed[rows]
        sims = sub @ sub.T
        ii, jj = np.nonzero(np.triu(sims >= _COS_TAU, k=1))
        for i, j in zip(ii, jj):
            a, b2 = int(ids[rows[i]]), int(ids[rows[j]])
            out.add((min(a, b2), max(a, b2)))
    rows_out = sorted(out)
    return pd.DataFrame(rows_out, columns=["id_a", "id_b"]).astype(
        {"id_a": np.int64, "id_b": np.int64})


def _golden_ivf_centroids(ids: np.ndarray, mat: np.ndarray,
                          nlist: int = _IVF_NLIST) -> np.ndarray:
    """Strided seed centroids + ONE int64-quantized Lloyd step —
    bit-identical to the distributed partial-sum merge in
    ``queries._ivf_centroids`` (integer sums are associative)."""
    n = len(ids)
    stride = max(1, n // nlist)
    seed_ids = [i * stride for i in range(nlist)]
    sel = np.isin(ids, seed_ids)
    order = np.argsort(ids[sel])
    cent = mat[sel][order].copy()
    assign0 = np.argmax(_norm_rows(mat) @ _norm_rows(cent).T, axis=1)
    quant = np.round(mat * _IVF_QUANT).astype(np.int64)
    new_cent = cent.copy()
    for ci in range(nlist):
        m = assign0 == ci
        tot = int(m.sum())
        if tot:
            new_cent[ci] = quant[m].sum(axis=0) / (tot * _IVF_QUANT)
    return new_cent


def golden_kmeans_assign(sf_dir: str) -> pd.DataFrame:
    ids, mat = _embeddings(sf_dir)
    cn = _norm_rows(_golden_ivf_centroids(ids, mat))
    assign = np.argmax(_norm_rows(mat) @ cn.T, axis=1)
    return pd.DataFrame({"vec_id": pd.Series(ids, dtype=np.int64),
                         "cluster": pd.Series(assign, dtype=np.int64)})


def golden_substring_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_substring_dup_spans``: same
    ``_sub_gram_hashes`` kernel, global distinct-doc count per gram,
    per-doc duplicated-gram stats, same rounding."""
    from collections import Counter

    from .queries import _round_half_up, _sub_gram_hashes

    ids, texts, _ = _documents(sf_dir)
    per_doc = {int(i): _sub_gram_hashes(x) for i, x in zip(ids, texts)}
    cnt: Counter = Counter()
    for g in per_doc.values():
        cnt.update(int(h) for h in g)
    dups = {h for h, n in cnt.items() if n >= 2}
    rows = []
    for i, g in per_doc.items():
        if g.size == 0:
            continue
        dg = sum(1 for h in g if int(h) in dups)
        rows.append((i, int(g.size), dg,
                     float(_round_half_up(dg / g.size, 4))))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_grams", "dup_grams", "dup_frac"]).astype(
        {"doc_id": np.int64, "n_grams": np.int64,
         "dup_grams": np.int64, "dup_frac": np.float64})


def golden_substring_dedup_rewrite(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_substring_dedup_rewrite``: the
    global cross-doc dup-hash set via a Counter over per-doc DISTINCT
    grams, then the same ``_sub_rewrite_doc`` kernel per doc (passing
    the global set is equivalent to the engine's per-doc subsets —
    matching is by membership)."""
    from collections import Counter

    from .queries import _sub_gram_hashes, _sub_rewrite_doc

    ids, texts, _ = _documents(sf_dir)
    cnt: Counter = Counter()
    for x in texts:
        cnt.update(int(h) for h in _sub_gram_hashes(x))
    dup = np.array(sorted(h for h, n in cnt.items() if n >= 2),
                   dtype=np.int64)
    rows = []
    for i, x in zip(ids, texts):
        out, nw, rm = _sub_rewrite_doc(x, dup)
        rows.append((int(i), nw, rm, out))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_words", "removed_words", "text"]).astype(
        {"doc_id": np.int64, "n_words": np.int64,
         "removed_words": np.int64})


def golden_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Sequential BM25 twin of ``queries.q_bm25_topk``: same shared
    tf/score kernels on the whole corpus at once, same exact-int
    avgdl/df constants, same rounded-score ranking order."""
    from .queries import (_BM25_K, _bm25_scores, _bm25_tf_dl,
                          _round_half_up)

    ids, texts, _ = _documents(sf_dir)
    tf, dl = _bm25_tf_dl(texts)
    n = len(ids)
    avgdl = int(dl.sum()) / n
    df = (tf > 0).sum(axis=0).astype(np.float64)
    s = _round_half_up(_bm25_scores(tf, dl, n, avgdl, df), 6)
    ida = np.asarray(ids, dtype=np.int64)
    order = np.lexsort((ida, -s))[:_BM25_K]
    return pd.DataFrame({
        "rank": pd.Series(np.arange(1, len(order) + 1), dtype=np.int64),
        "doc_id": pd.Series(ida[order], dtype=np.int64),
        "score": pd.Series(s[order], dtype=np.float64),
    })


def golden_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_bpe_encode``: full-corpus
    ``Counter`` word frequencies capped to the same (f desc, word asc)
    top-``_BPE_TOPV``, the shared ``_bpe_train`` / ``_bpe_token_len``
    kernels, and a plain per-doc loop with a word→token-count cache —
    independent counting/encode orchestration, shared leaves."""
    from collections import Counter

    ids, texts, _ = _documents(sf_dir)
    cnt: Counter = Counter()
    for x in texts:
        cnt.update(x.split(" "))
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOPV]
    ranks = {p: r for r, p in enumerate(
        _bpe_train([w for w, _ in items], [f for _, f in items]))}
    cache: dict[str, int] = {}
    rows = []
    for i, x in zip(ids, texts):
        toks = x.split(" ")
        s = 0
        for w in toks:
            v = cache.get(w)
            if v is None:
                v = cache[w] = _bpe_token_len(w, ranks)
            s += v
        rows.append((int(i), len(toks), s))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_tokens"]) \
        .astype({"doc_id": np.int64, "n_words": np.int64,
                 "n_tokens": np.int64})


def golden_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """Sequential DSIR twin of ``queries.q_dsir_weights``: same crc32
    bucket hash, same integer bincounts (order-free), same Laplace
    log-ratio table, same per-doc text-order gram sum rounded 4."""
    from .queries import (_DSIR_BUCKETS, _DSIR_TARGET, _dsir_grams,
                          _round_half_up)

    ids, texts, _ = _documents(sf_dir)
    tcnt = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    rcnt = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    raw_grams: list[tuple[int, np.ndarray]] = []
    for i, x in zip(ids, texts):
        g = _dsir_grams(x)
        if i < _DSIR_TARGET:
            if g.size:
                tcnt += np.bincount(g, minlength=_DSIR_BUCKETS)
        else:
            if g.size:
                rcnt += np.bincount(g, minlength=_DSIR_BUCKETS)
                raw_grams.append((int(i), g))
    llr = (np.log((tcnt + 1.0) / (tcnt.sum() + _DSIR_BUCKETS))
           - np.log((rcnt + 1.0) / (rcnt.sum() + _DSIR_BUCKETS)))
    return pd.DataFrame({
        "doc_id": pd.Series([i for i, _ in raw_grams], dtype=np.int64),
        "dsir_w": pd.Series(
            [float(_round_half_up(float(llr[g].sum()), 4))
             for _, g in raw_grams], dtype=np.float64),
    })


def golden_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """Sequential SemDeDup twin of ``queries.q_semantic_dedup``: same
    strided-seed + one-quantized-Lloyd centroids, same argmax
    assignment, same id-sorted within-cluster cosine prune at the
    same ``_COS_TAU`` — engine and golden compare the identical
    ordered rows, so the float comparisons agree bit-for-bit."""
    ids, mat = _embeddings(sf_dir)
    nlist, _ = _ivf_params(len(ids))
    cn = _norm_rows(_golden_ivf_centroids(ids, mat, nlist))
    normed = _norm_rows(mat)
    assign = np.argmax(normed @ cn.T, axis=1)
    keep_ids, keep_cl = [], []
    for c in np.unique(assign):
        rows = np.nonzero(assign == c)[0]
        rows = rows[np.argsort(ids[rows], kind="stable")]
        x = normed[rows]
        drop = np.triu(x @ x.T >= _COS_TAU, k=1).any(axis=0)
        keep_ids.extend(int(i) for i in ids[rows][~drop])
        keep_cl.extend([int(c)] * int((~drop).sum()))
    return pd.DataFrame({"vec_id": pd.Series(keep_ids, dtype=np.int64),
                         "cluster": pd.Series(keep_cl, dtype=np.int64)})


def golden_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """Sequential IVF: strided seed centroids, ONE int64-quantized Lloyd
    step (bit-identical to the distributed partial-sum merge), per-query
    probe of the nprobe nearest lists, rounded-score top-k."""
    ids, mat = _embeddings(sf_dir)
    nlist, nprobe = _ivf_params(len(ids))
    normed = _norm_rows(mat)
    cn = _norm_rows(_golden_ivf_centroids(ids, mat, nlist))
    qmask = ids < 5
    qids = ids[qmask]
    qn = _norm_rows(mat[qmask])
    probe_lists = _probe_lists(qn, cn, nprobe)
    assign = np.argmax(normed @ cn.T, axis=1)

    out = []
    for row in range(len(qids)):
        cand = np.isin(assign, probe_lists[row]) & (ids != qids[row])
        cids = ids[cand]
        sims = np.round(normed[cand] @ qn[row], 6)
        order2 = np.lexsort((cids, -sims))[:_IVF_K]
        for rank, o in enumerate(order2, start=1):
            out.append((int(qids[row]), int(cids[o]), rank))
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "rank"]).astype(
        np.int64)


def _golden_pq_codebooks(ids: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Sequential twin of queries._pq_codebooks: same strided seeds,
    same single Lloyd step with int64-quantized sums (the quantization
    makes the distributed partial merge order-free, so one sequential
    pass lands on the identical codebook)."""
    from .queries import _PQ_K, _PQ_M, _pq_assign_sub

    n = _norm_rows(mat)
    stride = max(1, len(ids) // _PQ_K)
    seed_ids = [i * stride for i in range(_PQ_K)]
    sel = np.isin(ids, seed_ids)
    order = np.argsort(ids[sel])
    seeds = n[sel][order]
    dim = n.shape[1]
    dsub = dim // _PQ_M
    cb = seeds.reshape(_PQ_K, _PQ_M, dsub).transpose(1, 0, 2).copy()
    quant = np.round(n * _IVF_QUANT).astype(np.int64)
    new_cb = cb.copy()
    for m in range(_PQ_M):
        sub = n[:, m * dsub:(m + 1) * dsub]
        assign = _pq_assign_sub(sub, cb[m])
        qsub = quant[:, m * dsub:(m + 1) * dsub]
        for ci in range(_PQ_K):
            s = assign == ci
            if s.any():
                new_cb[m][ci] = qsub[s].sum(axis=0) / (int(s.sum()) * _IVF_QUANT)
    return new_cb


def golden_pq_encode(sf_dir: str) -> pd.DataFrame:
    from .queries import _pq_encode_mat

    ids, mat = _embeddings(sf_dir)
    cb = _golden_pq_codebooks(ids, mat)
    n = _norm_rows(mat)
    return pd.DataFrame({"vec_id": pd.Series(ids, dtype=np.int64),
                         "pq_code": pd.Series(_pq_encode_mat(n, cb),
                                              dtype=np.int64)})


def _golden_pq_search(sf_dir: str, probe: bool) -> pd.DataFrame:
    """Sequential ADC + exact re-rank (same fixed m-order float
    accumulation as the engine), global top-S by (approx, id), exact
    cosine top-10 on the shortlist. ``probe=True`` adds the IVF coarse
    filter (golden twin of ann_ivfpq)."""
    from .queries import (_KNN_K, _PQ_M, _PQ_SHORTLIST, _ivf_params,
                          _pq_encode_mat, _round_half_up)

    ids, mat = _embeddings(sf_dir)
    cb = _golden_pq_codebooks(ids, mat)
    n = _norm_rows(mat)
    codes = _pq_encode_mat(n, cb)
    dsub = cb.shape[2]
    qsel = ids < 5
    qids, qn = ids[qsel], n[qsel]
    if probe:
        nlist, nprobe = _ivf_params(len(ids))
        cn = _norm_rows(_golden_ivf_centroids(ids, mat, nlist))
        probe_lists = _probe_lists(qn, cn, nprobe)
        assign = np.argmax(n @ cn.T, axis=1)
    rows = []
    for r in np.argsort(qids):
        lut = np.stack([qn[r, m * dsub:(m + 1) * dsub] @ cb[m].T
                        for m in range(_PQ_M)])
        mask = ids != qids[r]
        if probe:
            mask &= np.isin(assign, probe_lists[r])
        ids_m, cm = ids[mask], codes[mask]
        score = np.zeros(len(ids_m))
        for m in range(_PQ_M):
            score += lut[m][(cm >> (4 * m)) & 0xF]
        short = np.lexsort((ids_m, -score))[:_PQ_SHORTLIST]
        sids = ids_m[short]
        sel = np.isin(ids, sids)
        sims = _round_half_up(n[sel] @ qn[r], 6)
        vid = ids[sel]
        order = np.lexsort((vid, -sims))[:_KNN_K]
        for rk, o in enumerate(order, 1):
            rows.append((int(qids[r]), int(vid[o]), rk))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"]).astype(np.int64)


def golden_ann_pq(sf_dir: str) -> pd.DataFrame:
    return _golden_pq_search(sf_dir, probe=False)


def golden_ann_ivfpq(sf_dir: str) -> pd.DataFrame:
    return _golden_pq_search(sf_dir, probe=True)


def golden_embed_documents(sf_dir: str) -> pd.DataFrame:
    """The stand-in model is row-independent and unit-normalizes its
    output, so dim is constant and norm is 1.0 (0.0 only for a zero
    projection) — computed through the real model class to stay exact."""
    from ..stages.embed import EmbedDocuments

    ids, texts, _ = _documents(sf_dir)
    model = EmbedDocuments()
    df = model(pd.DataFrame({"doc_id": ids, "text": texts}))
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype=np.int64),
        "dim": pd.Series([len(v) for v in df["embedding"]], dtype=np.int64),
        "norm": np.round(
            [float(np.linalg.norm(v)) for v in df["embedding"]], 4),
    })


# --------------------------------------------------------------------------
# crawl / multimodal goldens (sequential reference-semantics oracle)
# --------------------------------------------------------------------------

_ORACLE_CACHE: dict[str, dict] = {}


def _crawl_oracle(sf_dir: str) -> dict:
    if sf_dir not in _ORACLE_CACHE:
        _ORACLE_CACHE[sf_dir] = run_oracle(crawl_world_params(sf_dir))
    return _ORACLE_CACHE[sf_dir]


def golden_crawl_image_caption(sf_dir: str) -> pd.DataFrame:
    img = _crawl_oracle(sf_dir)["images"]
    return img[["image_id", "w", "h", "fmt", "caption", "phash"]].copy()


def golden_crawl_job_records(sf_dir: str) -> pd.DataFrame:
    rec = _crawl_oracle(sf_dir)["records"]
    return rec[["url_sha1", "site_id", "strategy", "title", "link", "location"]].copy()


def golden_recrawl_delta(sf_dir: str) -> pd.DataFrame:
    """Sequential recrawl-delta oracle: full-crawl(evolved world) minus
    full-crawl(prior world) by url_sha1. The deterministic world keeps
    every existing job URL when ``jobs_per_page`` grows (slot-indexed
    job ids), so the set difference IS the incremental delta
    ``run_recrawl`` must discover."""
    from dataclasses import replace

    wp = crawl_world_params(sf_dir)
    prior = run_oracle(replace(wp, jobs_per_page=wp.jobs_per_page - 1))["records"]
    cur = _crawl_oracle(sf_dir)["records"]
    delta = cur[~cur["url_sha1"].isin(set(prior["url_sha1"]))]
    return delta[["url_sha1", "site_id", "strategy", "title", "link", "location"]].copy()


def golden_recrawl_schedule(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_recrawl_schedule``: per-site
    counts from the sequential prior/current oracle crawls (the same
    world derivation as golden_recrawl_delta), same rate/interval
    arithmetic."""
    from dataclasses import replace

    from .queries import _round_half_up

    wp = crawl_world_params(sf_dir)
    prior = run_oracle(replace(
        wp, jobs_per_page=wp.jobs_per_page - 1))["records"]
    delta = golden_recrawl_delta(sf_dir)
    np_ = prior.groupby("site_id").size()
    nn = delta.groupby("site_id").size().reindex(np_.index,
                                                 fill_value=0)
    rate = nn.to_numpy(np.int64) / np_.to_numpy(np.int64)
    interval = _round_half_up(
        np.minimum(168.0, np.maximum(1.0, 24.0 / (rate + 0.01))), 2)
    return pd.DataFrame({
        "site_id": np_.index.to_numpy(),
        "n_prior": np_.to_numpy(np.int64),
        "n_new": nn.to_numpy(np.int64),
        "change_rate": _round_half_up(rate, 4),
        "interval_h": interval,
    }).sort_values("site_id", kind="stable").reset_index(drop=True)


def golden_multimodal_features(sf_dir: str) -> pd.DataFrame:
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        px, _ = codecs.decode(buf)
        rows.append((
            iid,
            round(float(px.mean()), 4),
            round(float((px.astype(np.float64) @ [0.299, 0.587, 0.114]).mean()), 4),
        ))
    return pd.DataFrame(rows, columns=["image_id", "mean_pixel", "mean_luma"])


def golden_multimodal_resize(sf_dir: str, out_w: int = 32, out_h: int = 32) -> pd.DataFrame:
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        px, _ = codecs.decode(buf)
        thumb = resize_area(px, out_w, out_h)
        rows.append((iid, out_w, out_h, codecs.phash64(thumb)))
    return pd.DataFrame(rows, columns=["image_id", "w", "h", "thumb_phash"]).astype(
        {"w": np.int32, "h": np.int32, "thumb_phash": np.int64})


def golden_png_export(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_png_export``: same decode → encode_png →
    re-decode round-trip per crawled image, orchestration-free loop."""
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        px, _ = codecs.decode(buf)
        png = codecs.encode(px, "png")
        back, fmt = codecs.decode(png)
        rows.append((iid, len(png),
                     bool(fmt == "png" and np.array_equal(back, px))))
    return pd.DataFrame(rows, columns=["image_id", "png_size", "exact"]
                        ).astype({"png_size": np.int64})


def golden_clip_align(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_clip_align``: the same ``ClipAlign``
    tower kernels (shared class — per-row scores are batch-composition
    independent by construction), same rounding, same threshold."""
    from ..stages.multimodal import ClipAlign
    from .queries import _CLIP_THRESHOLD, _round_half_up

    img = _crawl_oracle(sf_dir)["images"]
    ca = ClipAlign()
    rows = []
    for iid, buf, cap in zip(img["image_id"], img["bytes"],
                             img["caption"]):
        s = float(_round_half_up(ca.score(buf, cap), 6))
        rows.append((iid, s, bool(s >= _CLIP_THRESHOLD)))
    return pd.DataFrame(rows, columns=["image_id", "clip_score", "kept"])


def golden_image_patches(sf_dir: str, p: int = 8,
                         flat_var: float = 400.0) -> pd.DataFrame:
    """Sequential twin of ``queries.q_image_patches``: same decode +
    luma leaves, but per-patch variance via an explicit (i, j) Python
    loop over the grid — independent orchestration of the engine's
    reshape→var(axis=1) vectorization."""
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        px, _ = codecs.decode(buf)
        lum = px.astype(np.float64) @ [0.299, 0.587, 0.114]
        hp, wp = lum.shape[0] // p, lum.shape[1] // p
        crop = lum[:hp * p, :wp * p]
        n_flat = 0
        for i in range(hp):
            for j in range(wp):
                block = crop[i * p:(i + 1) * p, j * p:(j + 1) * p]
                if np.var(block.reshape(-1)) < flat_var:
                    n_flat += 1
        rows.append((iid, hp * wp, n_flat, round(float(crop.mean()), 4)))
    return pd.DataFrame(
        rows, columns=["image_id", "n_patches", "n_flat", "mean_luma"]
    ).astype({"n_patches": np.int64, "n_flat": np.int64,
              "mean_luma": np.float64})


def golden_asr_chunks(sf_dir: str, chunk_s: float = 0.25,
                      hop_s: float = 0.20) -> pd.DataFrame:
    """Sequential twin of ``queries.q_asr_chunks``: same synthesis +
    codec round-trip + ``audio_rms`` leaves, while-loop chunk walk
    instead of the engine's range() enumeration."""
    from ..functions import av_codecs
    from ..stages.multimodal import audio_rms

    ids, _, _ = _documents(sf_dir)
    rows = []
    for d in ids:
        buf = av_codecs.encode_audio(av_codecs.gen_wave(int(d)), 16000)
        wave, sr = av_codecs.decode_audio(buf)
        cl, hop = int(round(chunk_s * sr)), int(round(hop_s * sr))
        s = k = 0
        while s < len(wave):
            seg = wave[s:s + cl]
            rows.append((int(d), k, round(s / sr, 6),
                         round(len(seg) / sr, 6), audio_rms(seg)))
            s += hop
            k += 1
    return pd.DataFrame(rows, columns=["clip_id", "chunk_idx",
                                       "start_s", "dur_s", "rms"]) \
        .astype({"clip_id": np.int64, "chunk_idx": np.int64,
                 "start_s": np.float64, "dur_s": np.float64,
                 "rms": np.float64})


def golden_audio_spectral(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_audio_spectral``: same synthesis
    + codec round-trip + shared ``spectral_stats`` leaf, plain loop."""
    from ..functions import av_codecs
    from ..stages.multimodal import spectral_stats

    ids, _, _ = _documents(sf_dir)
    rows = []
    for d in ids:
        buf = av_codecs.encode_audio(av_codecs.gen_wave(int(d)), 16000)
        wave, sr = av_codecs.decode_audio(buf)
        c, b, r = spectral_stats(wave, sr)
        rows.append((int(d), c, b, r))
    return pd.DataFrame(rows, columns=["clip_id", "centroid_hz",
                                       "bandwidth_hz", "rolloff_hz"]) \
        .astype({"clip_id": np.int64})


def golden_image_color_hist(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_image_color_hist``: per-bin
    counts via explicit boolean masks (independent of the engine's
    single bincount), same entropy formula over the ascending bins."""
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        px, _ = codecs.decode(buf)
        q = px.reshape(-1, 3) // 64
        hist = np.zeros(64, dtype=np.int64)
        for r in range(4):
            for g in range(4):
                for b in range(4):
                    hist[r * 16 + g * 4 + b] = int(
                        ((q[:, 0] == r) & (q[:, 1] == g)
                         & (q[:, 2] == b)).sum())
        n = int(hist.sum())
        p = hist[hist > 0] / n
        rows.append((iid, n, int(np.argmax(hist)),
                     round(float(-(p * np.log2(p)).sum()), 4)))
    return pd.DataFrame(rows, columns=["image_id", "n_px", "top_bin",
                                       "entropy"]) \
        .astype({"n_px": np.int64, "top_bin": np.int64,
                 "entropy": np.float64})


def golden_audio_features(sf_dir: str) -> pd.DataFrame:
    """Sequential audio path: same synthesis + codec round-trip +
    feature kernels as the engine's leaves, orchestration-free loop."""
    from ..functions import av_codecs
    from ..stages.multimodal import audio_rms

    ids, _, _ = _documents(sf_dir)
    rows = []
    for d in ids:
        buf = av_codecs.encode_audio(av_codecs.gen_wave(int(d)), 16000)
        wave, sr = av_codecs.decode_audio(buf)
        rows.append((int(d), sr, round(len(wave) / sr, 6), audio_rms(wave)))
    return pd.DataFrame(rows, columns=["clip_id", "sample_rate", "duration_s", "rms"])


def golden_vad_segments(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_vad_segments``: same synthesis + codec
    round-trip + 25 ms energy threshold, but run detection via
    ``itertools.groupby`` over a Python frame loop — an independent
    route to the same segments as the engine's vectorized
    diff-of-padded-mask."""
    from itertools import groupby

    from ..functions import av_codecs
    from ..stages.multimodal import VadSegments, audio_rms

    ids, _, _ = _documents(sf_dir)
    flen_s, thr = VadSegments.FRAME_S, VadSegments.RMS_THRESHOLD
    rows = []
    for d in ids:
        buf = av_codecs.encode_audio(av_codecs.gen_speech_wave(int(d)), 16000)
        wave, sr = av_codecs.decode_audio(buf)
        flen = int(round(sr * flen_s))
        voiced = []
        for f in range(len(wave) // flen):
            x = wave[f * flen:(f + 1) * flen].astype(np.float64)
            voiced.append(bool(np.sqrt(np.mean(x * x)) > thr))
        k, pos = 0, 0
        for v, grp in groupby(voiced):
            n = len(list(grp))
            if v:
                seg = wave[pos * flen:(pos + n) * flen]
                rows.append((int(d), k, round(pos * flen_s, 6),
                             round((pos + n) * flen_s, 6), audio_rms(seg)))
                k += 1
            pos += n
    return pd.DataFrame(
        rows, columns=["clip_id", "seg_idx", "start_s", "end_s", "seg_rms"])


def golden_scene_cuts(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_scene_cuts``: same synthesis + codec
    round-trip + threshold, per-pair Python-loop mean-abs-diff instead
    of the engine's stacked vectorized reduction."""
    from ..functions import av_codecs
    from ..stages.multimodal import SceneCuts

    ids, _, _ = _documents(sf_dir)
    thr = SceneCuts.DIFF_THRESHOLD
    rows = []
    for d in ids:
        if int(d) >= 64:
            continue
        buf = av_codecs.encode_video(av_codecs.gen_scene_frames(int(d)))
        frames = av_codecs.decode_video(buf)
        for i in range(1, len(frames)):
            diff = float(np.mean(np.abs(
                frames[i].astype(np.float64) - frames[i - 1].astype(np.float64))))
            if diff > thr:
                rows.append((int(d), i, round(diff, 4)))
    return pd.DataFrame(rows, columns=["video_id", "cut_idx", "frame_diff"])


def golden_scene_clips(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_scene_clips``: stateful span-building
    loop (start a new span when the per-pair diff crosses the
    threshold) — an independent route to the engine's vectorized
    cut-edge concatenation."""
    from ..functions import av_codecs
    from ..stages.multimodal import SceneCuts

    ids, _, _ = _documents(sf_dir)
    thr = SceneCuts.DIFF_THRESHOLD
    rows = []
    for d in ids:
        if int(d) >= 64:
            continue
        buf = av_codecs.encode_video(av_codecs.gen_scene_frames(int(d)))
        frames = av_codecs.decode_video(buf)
        n = len(frames)
        if n == 0:
            continue
        start, idx = 0, 0
        for i in range(1, n):
            diff = float(np.mean(np.abs(
                frames[i].astype(np.float64)
                - frames[i - 1].astype(np.float64))))
            if diff > thr:
                rows.append((int(d), idx, start, i, i - start))
                idx += 1
                start = i
        rows.append((int(d), idx, start, n, n - start))
    return pd.DataFrame(rows, columns=[
        "video_id", "scene_idx", "start_frame", "end_frame", "n_frames"])


def golden_cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_cdc_chunks``: per-byte sliding-recurrence
    rolling hash ``H_i = (H_{i-1}*P + b_i - b_{i-W}*P^W) mod 2^64`` —
    an independent route to the engine's vectorized shifted
    multiply-add window hash — plus an inline min/max enforcement
    walk."""
    import hashlib

    from ..functions import cdc

    img = _crawl_oracle(sf_dir)["images"]
    W, P = cdc.WINDOW, cdc.P
    mod = 1 << 64
    pW = pow(P, W, mod)
    mask = (1 << cdc.MASK_BITS) - 1
    rows = []
    for iid, buf in zip(img["image_id"], img["bytes"]):
        h, cuts = 0, []
        for i, by in enumerate(buf):
            h = (h * P + by) % mod
            if i >= W:
                h = (h - buf[i - W] * pW) % mod
            if i >= W - 1 and (h & mask) == 0:
                cuts.append(i + 1)
        # min/max enforcement via DIVMOD arithmetic (the engine walks a
        # while-loop) — an independent route to the same chunk set
        start, bounds = 0, []
        for c in cuts + [len(buf)]:
            gap = c - start
            if gap <= 0:
                continue
            n_forced = (gap - 1) // cdc.MAX_LEN
            bounds += [(start + j * cdc.MAX_LEN, cdc.MAX_LEN)
                       for j in range(n_forced)]
            start += n_forced * cdc.MAX_LEN
            rem = gap - n_forced * cdc.MAX_LEN
            if c < len(buf) and rem < cdc.MIN_LEN:
                continue  # candidate too close — keep accumulating
            bounds.append((start, rem))
            start = c
        for k, (o, ln) in enumerate(bounds):
            hh = int.from_bytes(
                hashlib.sha1(buf[o:o + ln]).digest()[:8], "big", signed=True)
            rows.append((iid, k, o, ln, hh))
    return pd.DataFrame(
        rows, columns=["image_id", "chunk_idx", "off", "length",
                       "chunk_hash"])


def golden_kcore_parts(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_kcore_parts``: pandas-mined support≥2
    co-purchase edges (the same semantics as ``_copurchase_edges``,
    orchestration-free), then a dict-of-adjacency-sets peel loop — an
    independent route to the engine's vectorized bincount rounds."""
    import os as _os

    from .queries import _KCORE_K

    li = papq.read_table(
        _os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"]).to_pandas()
    d = li.drop_duplicates()
    pairs = d.merge(d, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    cnt = pairs.groupby(["l_partkey_x", "l_partkey_y"]).size()
    adj: dict[int, set[int]] = {}
    for (a, b) in cnt[cnt >= 2].index:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if n in adj and len(adj[n]) < _KCORE_K:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    rows = sorted((n, len(s)) for n, s in adj.items())
    return pd.DataFrame(rows, columns=["part_key", "core_degree"]).astype(
        np.int64) if rows else pd.DataFrame(
        {"part_key": pd.Series([], dtype=np.int64),
         "core_degree": pd.Series([], dtype=np.int64)})


def golden_video_frames(sf_dir: str) -> pd.DataFrame:
    """Sequential video path: full decode (NOT the engine's
    skip-by-offset sampler) then modulo selection — an independent
    route to the same sampled frames."""
    from ..functions import av_codecs

    ids, _, _ = _documents(sf_dir)
    rows = []
    for d in ids:
        if int(d) >= 64:
            continue
        buf = av_codecs.encode_video(av_codecs.gen_frames(int(d)))
        for i, fr in enumerate(av_codecs.decode_video(buf)):
            if i % 3 == 0:
                rows.append((int(d), i, codecs.phash64(fr)))
    return pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_phash"]).astype(
        {"frame_phash": np.int64})


def golden_phash_neardup(sf_dir: str) -> pd.DataFrame:
    """Sequential banding over original + thumbnail phashes: 8 bands ×
    8 bits, candidate pairs within buckets, Hamming ≤ 8 verify — the
    same tunables as ``q_phash_neardup``."""
    img = _crawl_oracle(sf_dir)["images"]
    thumbs = golden_multimodal_resize(sf_dir)
    all_rows = [(pid, int(h)) for pid, h in zip(img["image_id"], img["phash"])]
    all_rows += [(f"{pid}#thumb", int(h))
                 for pid, h in zip(thumbs["image_id"], thumbs["thumb_phash"])]
    buckets: dict[int, set[tuple[str, int]]] = {}
    for pid, h in all_rows:
        hu = np.uint64(h & 0xFFFF_FFFF_FFFF_FFFF)  # two's-complement view
        for b in range(8):
            band = int((hu >> np.uint64(8 * b)) & np.uint64(0xFF))
            buckets.setdefault(band + (b << 8), set()).add((pid, h))
    out: set[tuple[str, str, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, (pa_id, ha) in enumerate(ms):
            for pb_id, hb in ms[i + 1:]:
                d = dedupe.hamming64(ha, hb)
                if d <= 8:
                    out.add((pa_id, pb_id, d))
    return pd.DataFrame(sorted(out), columns=["id_a", "id_b", "hamming"]).astype(
        {"hamming": np.int64})


def golden_dhash_neardup(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_dhash_neardup``: dhash64 over the oracle
    crawl's decoded originals + their 32×32 area-resize thumbnails,
    sequential 8-band bucketing, Hamming ≤ 8 verify — the
    ``golden_phash_neardup`` orchestration over the gradient hash."""
    img = _crawl_oracle(sf_dir)["images"]
    all_rows: list[tuple[str, int]] = []
    for pid, buf in zip(img["image_id"], img["bytes"]):
        px = codecs.decode(buf)[0]
        all_rows.append((pid, codecs.dhash64(px)))
        all_rows.append((f"{pid}#thumb",
                         codecs.dhash64(resize_area(px, 32, 32))))
    buckets: dict[int, set[tuple[str, int]]] = {}
    for pid, h in all_rows:
        hu = np.uint64(h & 0xFFFF_FFFF_FFFF_FFFF)
        for b in range(8):
            band = int((hu >> np.uint64(8 * b)) & np.uint64(0xFF))
            buckets.setdefault(band + (b << 8), set()).add((pid, h))
    out: set[tuple[str, str, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, (pa_id, ha) in enumerate(ms):
            for pb_id, hb in ms[i + 1:]:
                d = dedupe.hamming64(ha, hb)
                if d <= 8:
                    out.add((pa_id, pb_id, d))
    return pd.DataFrame(sorted(out),
                        columns=["id_a", "id_b", "hamming"]).astype(
        {"hamming": np.int64})


def golden_hard_negatives(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_hard_negatives``: per even-id anchor, a
    plain per-row scan for the best same-label and best
    different-label cosine, with explicit min-id tie resolution
    (independent of the engine's argmax-first trick)."""
    ids, mat = _embeddings(sf_dir)
    labs = papq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["label"])["label"].to_numpy().astype(np.int64)
    n = _norm_rows(mat)
    rows: list[tuple] = []
    for i in range(len(ids)):
        if ids[i] % 2 != 0:
            continue
        sims = n @ n[i]
        sims[i] = -np.inf
        same = labs == labs[i]
        pos = np.where(same, sims, -np.inf)
        neg = np.where(~same, sims, -np.inf)
        pb, nb = pos.max(), neg.max()
        if not (np.isfinite(pb) and np.isfinite(nb)):
            continue
        pid = int(ids[np.flatnonzero(pos == pb)].min())
        nid = int(ids[np.flatnonzero(neg == nb)].min())
        rows.append((int(ids[i]), pid, nid,
                     float(_round_half_up(pb, 4)),
                     float(_round_half_up(nb, 4))))
    return pd.DataFrame(rows, columns=[
        "vec_id", "pos_id", "neg_id", "s_pos", "s_neg"]).astype(
        {"vec_id": np.int64, "pos_id": np.int64, "neg_id": np.int64,
         "s_pos": np.float64, "s_neg": np.float64})


def golden_logreg_train_score(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_logreg_train_score``: one whole-corpus
    'batch' per epoch. The per-row int64 residual quantization
    (shared ``_lr_row_grad`` leaf) makes the gradient an integer sum
    independent of batching, so the sequential weights are BIT-EQUAL
    to the distributed trainer's — the comparison then checks the
    epoch orchestration and the broadcast/refresh plumbing."""
    from .queries import (_LR_DIM, _LR_EPOCHS, _LR_QUANT, _LR_STEP,
                          _lr_features, _lr_row_grad)

    ids, texts, langs = _documents(sf_dir)
    y = np.array([x == "en" for x in langs], dtype=np.float64)
    n = len(ids)
    w = np.zeros(_LR_DIM)
    h, seg = _lr_features(texts)
    for _ in range(_LR_EPOCHS):
        g, _n = _lr_row_grad(h, seg, y, w)
        w = w - _LR_STEP * (g / _LR_QUANT) / n
    dots = np.bincount(seg, w[h], minlength=n)
    p = 1.0 / (1.0 + np.exp(-dots))
    return pd.DataFrame({
        "doc_id": pd.Series(ids, dtype=np.int64),
        "label": y.astype(np.int64),
        "prob": _round_half_up(p, 4),
        "pred": p >= 0.5,
    })


def golden_pairwise_js(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_pairwise_js_divergence``: plain dict
    counting per source, dense smoothed distributions over the union
    vocabulary, explicit pair loop."""
    from .queries import _KL_SMOOTH

    t = papq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["source", "text"])
    counts: dict[str, dict[str, int]] = {}
    vocab: dict[str, int] = {}
    for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        d = counts.setdefault(s, {})
        for w in x.split(" "):
            d[w] = d.get(w, 0) + 1
            vocab.setdefault(w, len(vocab))
    V = len(vocab)
    names = sorted(counts)
    dists = []
    for s in names:
        vec = np.zeros(V)
        for w, c in counts[s].items():
            vec[vocab[w]] = c
        dists.append((vec + _KL_SMOOTH) / (vec.sum() + _KL_SMOOTH * V))
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            p, q = dists[i], dists[j]
            m = 0.5 * (p + q)
            js = 0.5 * (p * np.log(p / m)).sum() \
                + 0.5 * (q * np.log(q / m)).sum()
            rows.append((names[i], names[j],
                         float(_round_half_up(js, 6))))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "js"]) \
        .astype({"js": np.float64})


def golden_class_cohesion(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_class_cohesion``: per label, normalized
    centroid of the normalized vectors, mean member cosine against it
    (plain per-label loop — independent of the engine's partial-sum
    exchange)."""
    ids, mat = _embeddings(sf_dir)
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["label"])
    labels = t["label"].to_numpy().astype(np.int64)
    n = _norm_rows(mat)
    rows = []
    for lab in np.unique(labels):
        sub = n[labels == lab]
        c = sub.sum(axis=0)
        c = c / np.linalg.norm(c)
        rows.append((int(lab), len(sub),
                     float(_round_half_up((sub @ c).mean(), 4))))
    return pd.DataFrame(rows, columns=["label", "n", "cohesion"]) \
        .astype({"label": np.int64, "n": np.int64,
                 "cohesion": np.float64})


def golden_webdataset_shards(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_webdataset_shards``: the oracle crawl's
    images hash-grouped into shards with an explicit dict, members
    sorted per shard, packed by the SHARED ``build_wds_tar`` leaf
    (byte-determinism is the leaf's contract; grouping and ordering
    are re-derived here)."""
    import hashlib

    from ..functions.urlnorm import hash64
    from ..functions.wds import build_wds_tar
    from .queries import _WDS_SHARDS

    img = _crawl_oracle(sf_dir)["images"]
    shards: dict[int, list[tuple[str, bytes, str]]] = {}
    for pid, buf, cap in zip(img["image_id"], img["bytes"],
                             img["caption"]):
        shards.setdefault(hash64(pid) % _WDS_SHARDS, []).append(
            (pid, buf, cap))
    rows = []
    for sid in sorted(shards):
        members = sorted(shards[sid])
        tar = build_wds_tar(members)
        rows.append((sid, len(members), len(tar),
                     hashlib.sha256(tar).hexdigest()))
    return pd.DataFrame(rows, columns=[
        "shard_id", "n_samples", "tar_bytes", "tar_sha256"]).astype(
        {"shard_id": np.int64, "n_samples": np.int64,
         "tar_bytes": np.int64})


def golden_image_neardup_verified(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_image_neardup_verified``: the
    golden phash candidate pairs, verified by canonical-grid PSNR over
    the oracle world's decoded pixels — same tau/grid constants and
    the same shared leaf kernels (resize_area, psnr), independent
    orchestration."""
    pairs = golden_phash_neardup(sf_dir)
    img = _crawl_oracle(sf_dir)["images"]
    raw = dict(zip(img["image_id"], img["bytes"]))
    cache: dict[str, np.ndarray] = {}

    def canon(pid: str) -> np.ndarray:
        b = pid.split("#", 1)[0]
        if b not in cache:
            cache[b] = resize_area(codecs.decode(raw[b])[0],
                                   _INV_CANON, _INV_CANON)
        return cache[b]

    rows = []
    for a, b, _h in pairs.itertuples(index=False):
        p = min(codecs.psnr(canon(a), canon(b)), 99.99)
        if p >= _INV_PSNR_TAU:
            rows.append((a, b, float(_round_half_up(np.float64(p), 2))))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "psnr_db"]).astype(
        {"psnr_db": np.float64})


def golden_caption_neardup(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``queries.q_caption_neardup``: word-shingle
    minhash banding over the oracle crawl's captions, candidate pairs
    within buckets, exact-Jaccard verify — same tunables as the
    documents-table minhash."""
    img = _crawl_oracle(sf_dir)["images"]
    hasher = dedupe.MinHasher(num_perm=_MH_PERMS, seed=_MH_SEED)
    shingles: dict[str, np.ndarray] = {}
    buckets: dict[int, set[str]] = {}
    for pid, cap in zip(img["image_id"], img["caption"]):
        s = dedupe.shingle_set(cap, k=_MH_SHINGLE_K)
        shingles[pid] = s
        sig = hasher.signature(s)
        for key in hasher.band_keys(sig, _MH_BANDS):
            buckets.setdefault(key, set()).add(pid)
    cand: set[tuple[str, str]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                cand.add((a, b))
    rows = []
    for a, b in sorted(cand):
        jv = dedupe.jaccard(shingles[a], shingles[b])
        if jv >= _MH_VERIFY_TAU:
            rows.append((a, b, round(jv, 4)))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jacc"]).astype(
        {"jacc": np.float64})


def golden_caption_dedup_images(sf_dir: str) -> pd.DataFrame:
    """Union-find over the golden caption pairs; the
    lexicographically-least image_id per component survives. Output
    (pid, caption) for every kept image."""
    pairs = golden_caption_neardup(sf_dir)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list[str]] = {}
    for node in set(pairs["id_a"]) | set(pairs["id_b"]):
        comps.setdefault(find(node), []).append(node)
    drops = {n for ms in comps.values() for n in ms if n != min(ms)}
    img = _crawl_oracle(sf_dir)["images"]
    kept = img[~img["image_id"].isin(drops)]
    return pd.DataFrame({"pid": kept["image_id"].astype(object),
                         "caption": kept["caption"].astype(object)})


def golden_phash_dedup_keep(sf_dir: str) -> pd.DataFrame:
    """Sequential union-find over the golden phash pairs + keep the
    lexicographically-least member per component (originals sort
    before their '#thumb' variants) — the independent check of the
    distributed connected-components path in ``q_phash_dedup_keep``."""
    pairs = golden_phash_neardup(sf_dir)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list[str]] = {}
    for node in set(pairs["id_a"]) | set(pairs["id_b"]):
        comps.setdefault(find(node), []).append(node)
    drops = {n for ms in comps.values() for n in ms if n != min(ms)}
    img = _crawl_oracle(sf_dir)["images"]
    all_ids = list(img["image_id"]) + [f"{p}#thumb" for p in img["image_id"]]
    kept = [p for p in all_ids if p not in drops]
    return pd.DataFrame({"pid": pd.Series(kept, dtype=object)})


def golden_image_fidelity(sf_dir: str) -> pd.DataFrame:
    """Sequential twin of ``q_image_fidelity``: same decode →
    qjpg re-encode → PSNR per losslessly-stored crawled image."""
    img = _crawl_oracle(sf_dir)["images"]
    rows = []
    for iid, buf, fmt in zip(img["image_id"], img["bytes"], img["fmt"]):
        if fmt == "qjpg":
            continue
        px, _ = codecs.decode(buf)
        back, _ = codecs.decode(codecs.encode(px, "qjpg"))
        p = min(codecs.psnr(px, back), 99.99)
        rows.append((iid, p, bool(p >= 40.0)))
    df = pd.DataFrame(rows, columns=["image_id", "psnr_db", "pass_40db"])
    from .queries import _round_half_up

    df["psnr_db"] = _round_half_up(df["psnr_db"].to_numpy(np.float64), 2)
    return df


def golden_ccnet_perplexity(sf_dir: str) -> pd.DataFrame:
    """Sequential CCNet twin of ``queries.q_ccnet_perplexity``: same
    crc32 unigram buckets, Laplace-smoothed log-probs and per-doc
    cross-entropy; training counts are exact int64 sums on both sides
    so the float scores agree bit-for-bit."""
    from .queries import _PPL_BUCKETS, _round_half_up, _uni_grams

    t = papq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "lang"])
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    cnt = np.zeros(_PPL_BUCKETS, dtype=np.int64)
    for x, lang in zip(texts, t["lang"].to_pylist()):
        if lang == "en":
            g = _uni_grams(x)
            if g.size:
                cnt += np.bincount(g, minlength=_PPL_BUCKETS)
    logp = np.log((cnt + 1.0) / (int(cnt.sum()) + _PPL_BUCKETS))
    out_ids, ces = [], []
    for i, x in zip(ids, texts):
        g = _uni_grams(x)
        if g.size:
            out_ids.append(i)
            ces.append(-np.mean(logp[g]))
    return pd.DataFrame({
        "doc_id": pd.Series(out_ids, dtype=np.int64),
        "ce": _round_half_up(np.array(ces), 4),
    })


def golden_pagerank_orders(sf_dir: str) -> pd.DataFrame:
    """Sequential PageRank twin of ``queries.q_pagerank_orders``: same
    distinct edge set, node numbering, damping and INT64-quantized
    contributions, so ranks match the distributed run bit-for-bit."""
    from .queries import _PR_DAMP, _PR_ITERS, _PR_Q, _round_half_up

    o = papq.read_table(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_orderkey", "o_custkey"]).to_pandas()
    li = papq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey"]).to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    e = pd.DataFrame({
        "u": j["o_custkey"].to_numpy(np.int64) * 2,
        "v": j["l_suppkey"].to_numpy(np.int64) * 2 + 1,
    }).drop_duplicates()
    nodes = np.unique(np.concatenate([e["u"].to_numpy(np.int64),
                                      e["v"].to_numpy(np.int64)]))
    ui = np.searchsorted(nodes, e["u"].to_numpy(np.int64))
    vi = np.searchsorted(nodes, e["v"].to_numpy(np.int64))
    deg = np.bincount(np.concatenate([ui, vi]),
                      minlength=len(nodes)).astype(np.int64)
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        q = _round_half_up(r / deg * _PR_Q, 0).astype(np.int64)
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, vi, q[ui])
        np.add.at(s, ui, q[vi])
        r = (1.0 - _PR_DAMP) / n + _PR_DAMP * (s.astype(np.float64) / _PR_Q)
    return pd.DataFrame({"node_id": nodes, "pr": _round_half_up(r, 8)})


# --------------------------------------------------------------------------
# catalog
# --------------------------------------------------------------------------


def golden_oracle_sql(sf_dir: str) -> dict[str, str]:
    """SQL oracle strings for every rows-only query, computed from the
    sequential goldens above at ``sf_dir`` scale. Driver-side only."""
    out: dict[str, str] = {}
    out["langid"] = values_sql(golden_langid(sf_dir), {
        "doc_id": "BIGINT", "lang": "VARCHAR", "lang_pred": "VARCHAR"})
    out["fingerprints"] = values_sql(golden_fingerprints(sf_dir), {
        "doc_id": "BIGINT", "fingerprint": "BIGINT", "n_winnow": "BIGINT"})
    out["simhash"] = values_sql(golden_simhash(sf_dir), {
        "doc_id": "BIGINT", "simhash": "BIGINT"})
    # brute-force O(N²) self-join — the banded engine is EXACT at
    # Hamming ≤ 7 (8×8-bit pigeonhole), so the full pair set must match
    out["simhash_neardup"] = (
        f"WITH s AS ({out['simhash']}) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        "FROM s a, s b WHERE a.doc_id < b.doc_id "
        "AND bit_count(xor(a.simhash, b.simhash)) <= 7"
    )
    out["minhash_lsh"] = values_sql(golden_minhash_lsh(sf_dir), {
        "id_a": "BIGINT", "id_b": "BIGINT", "jacc": "DOUBLE"})
    from .queries import _MH_SWEEP
    _sweep_vals = ", ".join(f"({b}, {r})" for b, r in _MH_SWEEP)
    out["minhash_band_curve"] = (
        f"WITH p AS (SELECT jacc FROM ({out['minhash_lsh']})), "
        f"cfg(b, r) AS (VALUES {_sweep_vals}) "
        "SELECT b::BIGINT AS bands, r::BIGINT AS rows_per_band, "
        "(SELECT count(*) FROM p)::BIGINT AS n_pairs, "
        "round(avg(1 - pow(1 - pow(jacc, r), b)), 6) AS exp_recall, "
        "sum(CASE WHEN 1 - pow(1 - pow(jacc, r), b) >= 0.9 "
        "THEN 1 ELSE 0 END)::BIGINT AS n_high_conf "
        "FROM cfg, p GROUP BY b, r")
    out["detector_agreement"] = (
        f"WITH mh AS (SELECT id_a, id_b FROM ({out['minhash_lsh']})), "
        f"sh AS (SELECT id_a, id_b FROM ({out['simhash_neardup']})), "
        "b AS (SELECT count(*) AS nb FROM mh "
        "JOIN sh USING (id_a, id_b)), "
        "c AS (SELECT (SELECT count(*) FROM mh) AS nm, "
        "(SELECT count(*) FROM sh) AS ns, (SELECT nb FROM b) AS nb) "
        "SELECT nm::BIGINT AS n_minhash, ns::BIGINT AS n_simhash, "
        "nb::BIGINT AS n_both, "
        "round(CASE WHEN nm + ns - nb > 0 "
        "THEN nb / (nm + ns - nb) ELSE 0 END, 4) AS agreement FROM c")
    drops = golden_minhash_drops(sf_dir)
    out["minhash_dedup_keep"] = (
        "SELECT doc_id FROM documents"
        + (f" WHERE doc_id NOT IN ({', '.join(map(str, drops))})" if drops else "")
    )
    out["entity_clusters"] = values_sql(golden_entity_clusters(sf_dir), {
        "p_partkey": "BIGINT", "cluster_rep": "BIGINT"})
    out["dedup_survivorship"] = (
        f"WITH ec AS ({out['entity_clusters']}), "
        "j AS (SELECT ec.cluster_rep, p.p_retailprice, p.p_size "
        "FROM ec JOIN part p USING (p_partkey)), "
        "g AS (SELECT cluster_rep, count(*) AS n, "
        "max(p_retailprice) AS mxp, min(p_size) AS mns FROM j "
        "GROUP BY 1) "
        "SELECT cluster_rep, n::BIGINT AS n_members, "
        "round(mxp, 2) AS best_price, mns::BIGINT AS min_size "
        "FROM g WHERE n > 1")
    out["dup_cluster_sizes"] = values_sql(
        golden_dup_cluster_sizes(sf_dir), {
            "cluster_size": "BIGINT", "n_clusters": "BIGINT"})
    out["compaction_plan"] = values_sql(golden_compaction_plan(sf_dir), {
        "bin_id": "BIGINT", "n_files": "BIGINT",
        "total_bytes": "BIGINT"})
    out["ann_dim_recall"] = values_sql(golden_ann_dim_recall(sf_dir), {
        "query_id": "BIGINT", "n_overlap": "BIGINT"})
    out["zorder_layout"] = values_sql(golden_zorder_layout(sf_dir), {
        "bucket": "BIGINT", "n": "BIGINT", "pk_min": "BIGINT",
        "pk_max": "BIGINT", "sk_min": "BIGINT", "sk_max": "BIGINT"})
    out["graph_walks"] = values_sql(golden_graph_walks(sf_dir), {
        "walk_id": "BIGINT", "step": "BIGINT", "node": "BIGINT"})
    out["approx_distinct_by_type"] = values_sql(
        golden_approx_distinct_by_type(sf_dir), {
            "event_type": "VARCHAR", "n_approx": "BIGINT"})
    bdrops = golden_minhash_best_drops(sf_dir)
    out["minhash_dedup_best"] = (
        "SELECT doc_id FROM documents"
        + (f" WHERE doc_id NOT IN ({', '.join(map(str, bdrops))})"
           if bdrops else "")
    )
    out["bitext_mine"] = values_sql(golden_bitext_mine(sf_dir), {
        "src_id": "BIGINT", "tgt_id": "BIGINT", "margin": "DOUBLE"})
    mdrops = golden_minhash_drops(sf_dir)
    _dup_cond = (f"doc_id IN ({', '.join(map(str, mdrops))})"
                 if mdrops else "FALSE")
    out["dup_rate_by_source"] = (
        f"SELECT source, count(*)::BIGINT AS n_docs, "
        f"sum(CASE WHEN {_dup_cond} THEN 1 ELSE 0 END)::BIGINT "
        "AS n_dups, "
        f"round(sum(CASE WHEN {_dup_cond} THEN 1 ELSE 0 END) "
        "/ count(*), 4) AS dup_rate FROM documents GROUP BY source")
    out["class_cohesion"] = values_sql(golden_class_cohesion(sf_dir), {
        "label": "BIGINT", "n": "BIGINT", "cohesion": "DOUBLE"})
    out["hard_negatives"] = values_sql(golden_hard_negatives(sf_dir), {
        "vec_id": "BIGINT", "pos_id": "BIGINT", "neg_id": "BIGINT",
        "s_pos": "DOUBLE", "s_neg": "DOUBLE"})
    out["pairwise_js_divergence"] = values_sql(
        golden_pairwise_js(sf_dir), {
            "src_a": "VARCHAR", "src_b": "VARCHAR", "js": "DOUBLE"})
    out["logreg_train_score"] = values_sql(
        golden_logreg_train_score(sf_dir), {
            "doc_id": "BIGINT", "label": "BIGINT", "prob": "DOUBLE",
            "pred": "BOOLEAN"})
    out["webdataset_shards"] = values_sql(
        golden_webdataset_shards(sf_dir), {
            "shard_id": "BIGINT", "n_samples": "BIGINT",
            "tar_bytes": "BIGINT", "tar_sha256": "VARCHAR"})
    out["embedding_neardup_ann"] = values_sql(golden_embedding_neardup_ann(sf_dir), {
        "id_a": "BIGINT", "id_b": "BIGINT"})
    edrops = golden_embedding_drops(sf_dir)
    out["embedding_dedup_keep"] = (
        "SELECT vec_id FROM embeddings"
        + (f" WHERE vec_id NOT IN ({', '.join(map(str, edrops))})"
           if edrops else "")
    )
    out["ann_ivf"] = values_sql(golden_ann_ivf(sf_dir), {
        "query_id": "BIGINT", "neighbor_id": "BIGINT", "rank": "BIGINT"})
    out["kmeans_assign"] = values_sql(golden_kmeans_assign(sf_dir), {
        "vec_id": "BIGINT", "cluster": "BIGINT"})
    out["semantic_dedup"] = values_sql(golden_semantic_dedup(sf_dir), {
        "vec_id": "BIGINT", "cluster": "BIGINT"})
    out["dsir_weights"] = values_sql(golden_dsir_weights(sf_dir), {
        "doc_id": "BIGINT", "dsir_w": "DOUBLE"})
    out["substring_dup_spans"] = values_sql(
        golden_substring_dup_spans(sf_dir), {
            "doc_id": "BIGINT", "n_grams": "BIGINT",
            "dup_grams": "BIGINT", "dup_frac": "DOUBLE"})
    out["substring_dedup_rewrite"] = values_sql(
        golden_substring_dedup_rewrite(sf_dir), {
            "doc_id": "BIGINT", "n_words": "BIGINT",
            "removed_words": "BIGINT", "text": "VARCHAR"})
    out["bm25_topk"] = values_sql(golden_bm25_topk(sf_dir), {
        "rank": "BIGINT", "doc_id": "BIGINT", "score": "DOUBLE"})
    out["bpe_encode"] = values_sql(golden_bpe_encode(sf_dir), {
        "doc_id": "BIGINT", "n_words": "BIGINT", "n_tokens": "BIGINT"})
    out["pq_encode"] = values_sql(golden_pq_encode(sf_dir), {
        "vec_id": "BIGINT", "pq_code": "BIGINT"})
    out["ann_pq"] = values_sql(golden_ann_pq(sf_dir), {
        "query_id": "BIGINT", "neighbor_id": "BIGINT", "rank": "BIGINT"})
    out["ann_ivfpq"] = values_sql(golden_ann_ivfpq(sf_dir), {
        "query_id": "BIGINT", "neighbor_id": "BIGINT", "rank": "BIGINT"})
    out["embed_documents"] = values_sql(golden_embed_documents(sf_dir), {
        "doc_id": "BIGINT", "dim": "BIGINT", "norm": "DOUBLE"})
    out["crawl_image_caption"] = values_sql(golden_crawl_image_caption(sf_dir), {
        "image_id": "VARCHAR", "w": "INTEGER", "h": "INTEGER",
        "fmt": "VARCHAR", "caption": "VARCHAR", "phash": "BIGINT"})
    out["crawl_job_records"] = values_sql(golden_crawl_job_records(sf_dir), {
        "url_sha1": "VARCHAR", "site_id": "VARCHAR", "strategy": "VARCHAR",
        "title": "VARCHAR", "link": "VARCHAR", "location": "VARCHAR"})
    out["recrawl_delta"] = values_sql(golden_recrawl_delta(sf_dir), {
        "url_sha1": "VARCHAR", "site_id": "VARCHAR", "strategy": "VARCHAR",
        "title": "VARCHAR", "link": "VARCHAR", "location": "VARCHAR"})
    out["recrawl_schedule"] = values_sql(golden_recrawl_schedule(sf_dir), {
        "site_id": "VARCHAR", "n_prior": "BIGINT", "n_new": "BIGINT",
        "change_rate": "DOUBLE", "interval_h": "DOUBLE"})
    out["multimodal_features"] = values_sql(golden_multimodal_features(sf_dir), {
        "image_id": "VARCHAR", "mean_pixel": "DOUBLE", "mean_luma": "DOUBLE"})
    out["multimodal_resize"] = values_sql(golden_multimodal_resize(sf_dir), {
        "image_id": "VARCHAR", "w": "INTEGER", "h": "INTEGER",
        "thumb_phash": "BIGINT"})
    out["png_export"] = values_sql(golden_png_export(sf_dir), {
        "image_id": "VARCHAR", "png_size": "BIGINT", "exact": "BOOLEAN"})
    out["clip_align"] = values_sql(golden_clip_align(sf_dir), {
        "image_id": "VARCHAR", "clip_score": "DOUBLE",
        "kept": "BOOLEAN"})
    out["phash_neardup"] = values_sql(golden_phash_neardup(sf_dir), {
        "id_a": "VARCHAR", "id_b": "VARCHAR", "hamming": "BIGINT"})
    out["dhash_neardup"] = values_sql(golden_dhash_neardup(sf_dir), {
        "id_a": "VARCHAR", "id_b": "VARCHAR", "hamming": "BIGINT"})
    out["phash_dedup_keep"] = values_sql(golden_phash_dedup_keep(sf_dir), {
        "pid": "VARCHAR"})
    out["image_neardup_verified"] = values_sql(
        golden_image_neardup_verified(sf_dir), {
            "id_a": "VARCHAR", "id_b": "VARCHAR", "psnr_db": "DOUBLE"})
    out["caption_neardup"] = values_sql(golden_caption_neardup(sf_dir), {
        "id_a": "VARCHAR", "id_b": "VARCHAR", "jacc": "DOUBLE"})
    out["caption_dedup_images"] = values_sql(
        golden_caption_dedup_images(sf_dir), {
            "pid": "VARCHAR", "caption": "VARCHAR"})
    # Image-table ops where only the INPUT is a golden (the sequential
    # crawl); the gate/bucket/ranking logic itself is re-implemented in
    # SQL, so engine and oracle compute the operator independently.
    img_cte = values_sql(golden_crawl_image_caption(sf_dir), {
        "image_id": "VARCHAR", "w": "INTEGER", "h": "INTEGER",
        "fmt": "VARCHAR", "caption": "VARCHAR", "phash": "BIGINT"})
    out["curate_image_corpus"] = (
        f"WITH img AS ({img_cte}) "
        "SELECT image_id, w, h, fmt, caption, phash FROM img "
        "WHERE least(w, h) >= 24 AND greatest(w, h) <= 2 * least(w, h) "
        "AND length(caption) BETWEEN 20 AND 256 "
        "AND length(caption) - length(replace(caption, ' ', '')) + 1 >= 5"
    )
    out["aspect_buckets"] = (
        f"WITH img AS ({img_cte}), b AS (SELECT image_id, w, h, "
        # geometric-midpoint boundaries in exact integer arithmetic —
        # mirrors _ASPECT_BUCKETS in pipelines/queries.py
        "CASE WHEN 64*w*w < 27*h*h THEN '9:16' "
        "WHEN 4*w*w < 3*h*h THEN '3:4' "
        "WHEN 3*w*w < 4*h*h THEN '1:1' "
        "WHEN 27*w*w < 64*h*h THEN '4:3' ELSE '16:9' END AS bucket "
        "FROM img) "
        "SELECT image_id, bucket, "
        "CAST(CASE bucket WHEN '9:16' THEN 48 WHEN '3:4' THEN 56 "
        "WHEN '1:1' THEN 64 WHEN '4:3' THEN 72 ELSE 80 END AS BIGINT) "
        "AS target_w, "
        "CAST(CASE bucket WHEN '9:16' THEN 80 WHEN '3:4' THEN 72 "
        "WHEN '1:1' THEN 64 WHEN '4:3' THEN 56 ELSE 48 END AS BIGINT) "
        "AS target_h FROM b"
    )
    out["image_training_manifest"] = (
        f"WITH img AS ({img_cte}), kept AS ("
        "SELECT image_id, w, h, "
        "CAST('0x' || substr(image_id, 1, 8) AS UBIGINT) AS key FROM img "
        "WHERE least(w, h) >= 24 AND greatest(w, h) <= 2 * least(w, h) "
        "AND length(caption) BETWEEN 20 AND 256 "
        "AND length(caption) - length(replace(caption, ' ', '')) + 1 >= 5"
        "), m AS (SELECT image_id, w, h, "
        "(key * 2654435761) % 4294967296 AS mixed, "
        "CASE WHEN 64*w*w < 27*h*h THEN '9:16' "
        "WHEN 4*w*w < 3*h*h THEN '3:4' "
        "WHEN 3*w*w < 4*h*h THEN '1:1' "
        "WHEN 27*w*w < 64*h*h THEN '4:3' ELSE '16:9' END AS bucket "
        "FROM kept) "
        "SELECT image_id, bucket, "
        "CAST(CASE bucket WHEN '9:16' THEN 48 WHEN '3:4' THEN 56 "
        "WHEN '1:1' THEN 64 WHEN '4:3' THEN 72 ELSE 80 END AS BIGINT) "
        "AS target_w, "
        "CAST(CASE bucket WHEN '9:16' THEN 80 WHEN '3:4' THEN 72 "
        "WHEN '1:1' THEN 64 WHEN '4:3' THEN 56 ELSE 48 END AS BIGINT) "
        "AS target_h, "
        "CASE WHEN mixed % 100 < 90 THEN 'train' "
        "WHEN mixed % 100 < 95 THEN 'val' ELSE 'test' END AS split, "
        "CAST(mixed // 536870912 AS BIGINT) AS shard FROM m"
    )
    out["phash_knn"] = (
        f"WITH img AS ({img_cte}), "
        "q AS (SELECT image_id AS qid, phash AS qh FROM img "
        "ORDER BY image_id LIMIT 5) "
        "SELECT qid AS query_id, image_id AS neighbor_id, "
        "CAST(bit_count(xor(qh, phash)) AS BIGINT) AS hamming "
        "FROM q, img WHERE image_id <> qid "
        "QUALIFY row_number() OVER (PARTITION BY qid "
        "ORDER BY bit_count(xor(qh, phash)), image_id) <= 5"
    )
    out["audio_features"] = values_sql(golden_audio_features(sf_dir), {
        "clip_id": "BIGINT", "sample_rate": "BIGINT",
        "duration_s": "DOUBLE", "rms": "DOUBLE"})
    out["image_patches"] = values_sql(golden_image_patches(sf_dir), {
        "image_id": "VARCHAR", "n_patches": "BIGINT",
        "n_flat": "BIGINT", "mean_luma": "DOUBLE"})
    out["asr_chunks"] = values_sql(golden_asr_chunks(sf_dir), {
        "clip_id": "BIGINT", "chunk_idx": "BIGINT",
        "start_s": "DOUBLE", "dur_s": "DOUBLE", "rms": "DOUBLE"})
    out["audio_spectral"] = values_sql(golden_audio_spectral(sf_dir), {
        "clip_id": "BIGINT", "centroid_hz": "DOUBLE",
        "bandwidth_hz": "DOUBLE", "rolloff_hz": "DOUBLE"})
    out["image_color_hist"] = values_sql(
        golden_image_color_hist(sf_dir), {
            "image_id": "VARCHAR", "n_px": "BIGINT",
            "top_bin": "BIGINT", "entropy": "DOUBLE"})
    out["video_frames"] = values_sql(golden_video_frames(sf_dir), {
        "video_id": "BIGINT", "frame_idx": "BIGINT", "frame_phash": "BIGINT"})
    out["vad_segments"] = values_sql(golden_vad_segments(sf_dir), {
        "clip_id": "BIGINT", "seg_idx": "BIGINT", "start_s": "DOUBLE",
        "end_s": "DOUBLE", "seg_rms": "DOUBLE"})
    out["scene_cuts"] = values_sql(golden_scene_cuts(sf_dir), {
        "video_id": "BIGINT", "cut_idx": "BIGINT", "frame_diff": "DOUBLE"})
    out["kcore_parts"] = values_sql(golden_kcore_parts(sf_dir), {
        "part_key": "BIGINT", "core_degree": "BIGINT"})
    out["scene_clips"] = values_sql(golden_scene_clips(sf_dir), {
        "video_id": "BIGINT", "scene_idx": "BIGINT",
        "start_frame": "BIGINT", "end_frame": "BIGINT",
        "n_frames": "BIGINT"})
    out["cdc_chunks"] = values_sql(golden_cdc_chunks(sf_dir), {
        "image_id": "VARCHAR", "chunk_idx": "BIGINT", "off": "BIGINT",
        "length": "BIGINT", "chunk_hash": "BIGINT"})
    out["approx_distinct_users"] = values_sql(
        golden_approx_distinct_users(sf_dir), {"n_approx": "BIGINT"})
    out["cm_counts_users"] = values_sql(
        golden_cm_counts_users(sf_dir), {"user_id": "BIGINT", "n_est": "BIGINT"})
    out["ccnet_perplexity"] = values_sql(golden_ccnet_perplexity(sf_dir), {
        "doc_id": "BIGINT", "ce": "DOUBLE"})
    out["pagerank_orders"] = values_sql(golden_pagerank_orders(sf_dir), {
        "node_id": "BIGINT", "pr": "DOUBLE"})
    out["image_fidelity"] = values_sql(golden_image_fidelity(sf_dir), {
        "image_id": "VARCHAR", "psnr_db": "DOUBLE", "pass_40db": "BOOLEAN"})
    return out
