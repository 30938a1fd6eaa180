"""sqlite-backed DB-API twin for the Postgres sinks.

Lets ``PostgresRecordSink`` / ``PgVectorEmbeddingSink`` execute their
REAL ``write_batch`` code paths (SQL build, executemany, commit,
rollback-on-error, retry) without a Postgres server: sqlite ≥ 3.24
supports the same ``ON CONFLICT (col) DO NOTHING`` / ``DO UPDATE SET x
= EXCLUDED.x`` upsert grammar the reference relies on
(``src/crawler.py:200-219``), so the only translation needed is the
placeholder style (``%s`` → ``?``) and binding list-valued parameters
(pgvector binds vectors natively; sqlite gets them JSON-encoded).

Useful beyond tests: a single-node deployment without Postgres can land
records durably via ``PostgresRecordSink(conn=SqliteTwin(path))``.
"""

from __future__ import annotations

import json
import sqlite3


def _bind(v):
    if isinstance(v, (list, tuple)):
        return json.dumps(list(v))
    return v


class _TwinCursor:
    """psycopg2-shaped cursor: context manager + ``%s`` placeholders."""

    def __init__(self, cur: sqlite3.Cursor):
        self._cur = cur

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._cur.close()
        return False

    def execute(self, sql: str, params=()):
        return self._cur.execute(sql.replace("%s", "?"),
                                 tuple(_bind(v) for v in params))

    def executemany(self, sql: str, rows):
        return self._cur.executemany(
            sql.replace("%s", "?"),
            [tuple(_bind(v) for v in r) for r in rows],
        )

    def fetchall(self):
        return self._cur.fetchall()

    def fetchone(self):
        return self._cur.fetchone()


class SqliteTwin:
    """psycopg2-shaped connection over sqlite3."""

    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path)
        self.rollbacks = 0  # observable for tests

    def cursor(self) -> _TwinCursor:
        return _TwinCursor(self._conn.cursor())

    def commit(self) -> None:
        self._conn.commit()

    def rollback(self) -> None:
        self.rollbacks += 1
        self._conn.rollback()

    def close(self) -> None:
        self._conn.close()
