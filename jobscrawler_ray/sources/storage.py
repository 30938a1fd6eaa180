"""Storage seam: Lance-first tables with a Parquet fallback.

``BASELINE.json`` specifies Lance tables for the image+caption output;
``pylance`` is not installed in this sandbox (SURVEY.md §7), so writes
go through this seam: Lance when importable, otherwise hive-partitioned
Parquet with the identical Arrow schema (documented deviation — the
partitioned layout and resumable manifest semantics are the same).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except Exception:  # ImportError and friends
    lance = None
    HAVE_LANCE = False


IMAGE_CAPTION_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


def write_table(ds: "rd.Dataset", path: str, partition_cols: list[str] | None = None) -> str:
    """Write a Dataset as a Lance table when available, else partitioned
    Parquet. Returns the path actually written."""
    if HAVE_LANCE:
        ds.write_lance(path)  # pragma: no cover
        return path
    os.makedirs(path, exist_ok=True)
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols)
    else:
        ds.write_parquet(path)
    return path


def read_table(path: str, columns: list[str] | None = None) -> "rd.Dataset":
    if HAVE_LANCE and os.path.isdir(path) and any(
        f.endswith(".lance") for f in os.listdir(path)
    ):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    import glob

    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return rd.read_parquet(files, columns=columns)


def site_config_table(world) -> "rd.Dataset":
    """S1 (``src/crawler.py:301-304``): the per-site config JSON as a
    small Dataset (`from_items`) — the seed table feeding the frontier."""
    return rd.from_items(world.config_rows())
