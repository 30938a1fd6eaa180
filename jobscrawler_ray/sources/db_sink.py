"""Durable record/embedding sinks (S8/S9: the reference's DB layer seam).

The reference lands records in Postgres with per-row
``INSERT ... ON CONFLICT (url) DO NOTHING`` (``src/crawler.py:200-219``)
and embeddings in pgvector with a tenacity retry of 7 attempts /
exponential 2-10 s (``src/embeddings/e5_base_v2_utils.py:99-180``).
Here every sink implements one interface:

    sink.write_batch(table: pa.Table) -> int   # rows actually written

- ``ParquetRecordSink`` — the sandbox-real implementation: append-only
  partitioned parquet with first-write-wins conflict skip on a key
  column (the same D4 semantics the crawl's assembly dedup enforces).
- ``PostgresRecordSink`` / ``PgVectorEmbeddingSink`` — import-guarded
  (psycopg2 absent here): batched executemany with ON CONFLICT DO
  NOTHING, and a bounded-exponential retry mirroring the reference's
  policy. Constructing them without the driver raises with a clear
  message; the interface contract is tested through the parquet sink.
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as papq

try:  # pragma: no cover - psycopg2 absent in this sandbox
    import psycopg2  # type: ignore

    HAVE_PSYCOPG2 = True
except Exception:
    psycopg2 = None
    HAVE_PSYCOPG2 = False


def retry(fn, attempts: int = 7, base_s: float = 2.0, max_s: float = 10.0,
          sleep=time.sleep):
    """The reference's write-retry policy (tenacity ×7, exponential
    2-10 s) as a plain function so every sink shares it."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - sink errors are opaque
            last = e
            if i < attempts - 1:
                sleep(min(max_s, base_s * (2 ** i)))
    raise last


class ParquetRecordSink:
    """Append-only partitioned parquet with conflict-skip on ``key_col``:
    a row whose key was already written by THIS sink (or found in the
    directory at open) is dropped — the reference's ON CONFLICT DO
    NOTHING, expressed as first-write-wins. One sink instance per
    writer/actor; cross-writer duplicates are handled by the assembly
    dedup (D4), exactly like concurrent INSERTs racing on the unique
    index."""

    def __init__(self, path: str, key_col: str = "url_sha1"):
        self.path = path
        self.key_col = key_col
        os.makedirs(path, exist_ok=True)
        self._seen: set = set()
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                t = papq.read_table(os.path.join(path, f), columns=[key_col])
                self._seen.update(t[key_col].to_pylist())

    def write_batch(self, table: pa.Table) -> int:
        keys = table[self.key_col].to_pylist()
        fresh = [i for i, k in enumerate(keys) if k not in self._seen]
        if not fresh:
            return 0
        sub = table.take(pa.array(fresh))
        # intra-batch duplicates: keep the first occurrence
        first_idx = []
        batch_seen: set = set()
        for i, k in enumerate(sub[self.key_col].to_pylist()):
            if k not in batch_seen:
                batch_seen.add(k)
                first_idx.append(i)
        sub = sub.take(pa.array(first_idx))
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex[:12]}.parquet")
        retry(lambda: papq.write_table(sub, out))
        self._seen.update(batch_seen)
        return sub.num_rows

    def num_rows(self) -> int:
        return len(self._seen)


class PostgresRecordSink:
    """Batched ``INSERT ... ON CONFLICT (key) DO NOTHING`` (the
    reference inserts row-by-row, ``src/crawler.py:200-219``; batching
    is the only change).

    ``conn`` injects any DB-API connection (cursor context manager +
    commit/rollback + ``%s`` placeholders) — the pytest suite drives the
    REAL ``write_batch`` path through a sqlite-backed twin; without it
    the sink connects via psycopg2 (import-guarded in this sandbox)."""

    def __init__(self, dsn: str | None = None, table: str = "records",
                 columns: list[str] | None = None, key_col: str = "url",
                 conn=None):
        if conn is not None:
            self.conn = conn
        elif HAVE_PSYCOPG2:  # pragma: no cover - needs a DB
            self.conn = psycopg2.connect(dsn)
        else:
            raise ImportError(
                "psycopg2 is not installed — use ParquetRecordSink (same "
                "write_batch contract) or install psycopg2-binary"
            )
        self.table = table
        self.columns = list(columns or [])
        self.key_col = key_col

    def write_batch(self, table: pa.Table) -> int:
        cols = ", ".join(self.columns)
        ph = ", ".join(["%s"] * len(self.columns))
        sql = (f"INSERT INTO {self.table} ({cols}) VALUES ({ph}) "
               f"ON CONFLICT ({self.key_col}) DO NOTHING")
        rows = list(zip(*(table[c].to_pylist() for c in self.columns)))

        def _do():
            try:
                with self.conn.cursor() as cur:
                    cur.executemany(sql, rows)
                self.conn.commit()
            except Exception:
                # a failed statement leaves the connection in an aborted
                # transaction — without rollback every retry would die
                # with InFailedSqlTransaction instead of retrying the work
                self.conn.rollback()
                raise
            return len(rows)

        return retry(_do)


class PgVectorEmbeddingSink:
    """Embedding sink (``e5_base_v2_utils.py:105-180``): id + vector
    upsert with the reference's retry policy. ``conn`` injection as in
    ``PostgresRecordSink`` (the twin stores the vector as the adapter
    chooses — pgvector binds it natively)."""

    def __init__(self, dsn: str | None = None, table: str = "embeddings",
                 id_col: str = "id", vec_col: str = "embedding", conn=None):
        if conn is not None:
            self.conn = conn
        elif HAVE_PSYCOPG2:  # pragma: no cover - needs a DB + pgvector
            self.conn = psycopg2.connect(dsn)
        else:
            raise ImportError(
                "psycopg2 is not installed — land embeddings in parquet "
                "via the storage seam instead (sources/storage.py)"
            )
        self.table = table
        self.id_col = id_col
        self.vec_col = vec_col

    def write_batch(self, table: pa.Table) -> int:
        sql = (f"INSERT INTO {self.table} ({self.id_col}, {self.vec_col}) "
               f"VALUES (%s, %s) ON CONFLICT ({self.id_col}) DO UPDATE "
               f"SET {self.vec_col} = EXCLUDED.{self.vec_col}")
        rows = [(i, list(v)) for i, v in
                zip(table[self.id_col].to_pylist(), table[self.vec_col].to_pylist())]

        def _do():
            try:
                with self.conn.cursor() as cur:
                    cur.executemany(sql, rows)
                self.conn.commit()
            except Exception:
                self.conn.rollback()  # see PostgresRecordSink._do
                raise
            return len(rows)

        return retry(_do)
