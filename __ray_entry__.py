"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Neither this module nor anything it imports calls ``ray.init()`` /
``ray.shutdown()`` — the driver owns the session.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the full crawl (frontier → politeness → fetch
    → parse → seen-gate → assemble) on a t1-scale deterministic world,
    returning the image+caption table (BASELINE.json input_hint shape,
    minus the raw bytes column for the driver's hash)."""
    from jobscrawler_ray.pipelines.queries import q_crawl_image_caption

    return q_crawl_image_caption("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the training-data extensions). See
    jobscrawler_ray/pipelines/queries.py for the catalog."""
    from jobscrawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL for EVERY query: hand-written ANSI SQL where the op is
    SQL-expressible, and VALUES-backed golden tables computed by an
    independent sequential (no-Ray) implementation for the rest (crawl,
    LSH/minhash, simhash, fingerprints, langid, ANN, the stand-in
    embedding model, multimodal codecs) — see
    jobscrawler_ray/pipelines/goldens.py. The driver compares at
    sf=0.01, so the goldens are generated from that directory."""
    from jobscrawler_ray.pipelines.goldens import golden_oracle_sql
    from jobscrawler_ray.pipelines.queries import ORACLE_SQL

    return {**ORACLE_SQL, **golden_oracle_sql("/root/testdata/sf0.01")}
