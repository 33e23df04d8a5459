"""SQL-backed durable catalog (karna-db parity, DB-API form).

The reference pins PostgreSQL 17 + diesel for its metadata store
(reference docker-compose.yaml:2-19, flake.nix:26). The JSON-document
`Metastore` keeps the same RECORD model behind the right abstraction;
this module completes the parity by persisting the identical records
through any PEP 249 (DB-API 2.0) connection — typed relational tables,
one transaction per write — exactly the `_load`/`_flush` swap
metastore.py's docstring promises.

In this sandbox the concrete backend is the stdlib ``sqlite3`` (no
Postgres endpoint exists); against production Postgres the SAME class
runs over a psycopg connection with ``paramstyle="format"`` — nothing
else changes, because the surface area is four tiny SQL statements.
The schema mirrors what a diesel migration would declare:

    karna_datasets(name PK, path, fmt, options_json, schema_json,
                   foreign_keys_json)
    karna_queries(name PK, language, text)

Write model: the record set is tiny (one row per dataset), so every
flush rewrites both tables inside ONE transaction — the relational
analog of the JSON store's atomic tmp+rename, giving the same
all-or-nothing durability without row-diff bookkeeping.
"""

from __future__ import annotations

import json
from dataclasses import asdict

from karna_spark.metastore import DatasetRecord, Metastore, SavedQuery

_SCHEMA = (
    """
    CREATE TABLE IF NOT EXISTS karna_datasets (
        name TEXT PRIMARY KEY,
        path TEXT NOT NULL,
        fmt TEXT NOT NULL,
        options_json TEXT NOT NULL,
        schema_json TEXT,
        foreign_keys_json TEXT NOT NULL
    )
    """,
    """
    CREATE TABLE IF NOT EXISTS karna_queries (
        name TEXT PRIMARY KEY,
        language TEXT NOT NULL,
        text TEXT NOT NULL
    )
    """,
)


def connect(dsn: str):
    """DSN → DB-API connection: ``sqlite:///path`` via stdlib sqlite3;
    ``postgresql://…`` via psycopg when installed (not in-sandbox —
    the import failure names the dependency instead of guessing)."""
    if dsn.startswith("sqlite:///"):
        import sqlite3

        # check_same_thread off: the server front-end handles requests
        # on per-request threads (ThreadingHTTPServer), and sqlite's
        # default same-thread guard would 500 every catalog POST; the
        # store serializes its own writes (SqlMetastore._lock), which
        # is the discipline sqlite actually needs
        return (
            sqlite3.connect(dsn[len("sqlite:///"):], check_same_thread=False),
            "qmark",
        )
    if dsn.startswith(("postgresql://", "postgres://")):
        try:
            import psycopg2  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - no PG in sandbox
            raise ImportError(
                "postgres DSNs need psycopg2 (pip install psycopg2-binary)"
            ) from e
        return psycopg2.connect(dsn), "format"  # pragma: no cover
    raise ValueError(f"unsupported metastore DSN: {dsn!r}")


class SqlMetastore(Metastore):
    """`Metastore` persisted through a DB-API connection.

    Same CRUD/attach surface, same front-end integration (the server's
    POST routes and the GraphQL mutations take either store) — only
    the persistence layer differs. ``paramstyle``: ``"qmark"`` (sqlite)
    or ``"format"`` (psycopg)."""

    def __init__(self, conn, paramstyle: str = "qmark"):
        import threading

        self._conn = conn
        self._ph = "?" if paramstyle == "qmark" else "%s"
        # one writer at a time: the server front-end calls through
        # per-request threads, and flush is a whole-set rewrite
        self._lock = threading.Lock()
        self.store_path = f"sql:{type(conn).__module__}"
        self._records = {}
        self._queries = {}
        cur = self._conn.cursor()
        for stmt in _SCHEMA:
            cur.execute(stmt)
        self._conn.commit()
        self._load()

    @classmethod
    def from_dsn(cls, dsn: str) -> "SqlMetastore":
        conn, style = connect(dsn)
        return cls(conn, paramstyle=style)

    # ------------------------------------------------------- persistence
    def _load(self) -> None:
        cur = self._conn.cursor()
        cur.execute(
            "SELECT name, path, fmt, options_json, schema_json, "
            "foreign_keys_json FROM karna_datasets"
        )
        for name, path, fmt, opts, schema, fks in cur.fetchall():
            self._records[name] = DatasetRecord(
                name=name,
                path=path,
                fmt=fmt,
                options=json.loads(opts),
                schema_json=schema,
                foreign_keys=json.loads(fks),
            )
        cur.execute("SELECT name, language, text FROM karna_queries")
        for name, language, text in cur.fetchall():
            self._queries[name] = SavedQuery(
                name=name, language=language, text=text
            )

    def _flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        ph = self._ph
        cur = self._conn.cursor()
        try:
            cur.execute("DELETE FROM karna_datasets")
            cur.execute("DELETE FROM karna_queries")
            for r in self._records.values():
                d = asdict(r)
                cur.execute(
                    "INSERT INTO karna_datasets (name, path, fmt, "
                    "options_json, schema_json, foreign_keys_json) "
                    f"VALUES ({ph}, {ph}, {ph}, {ph}, {ph}, {ph})",
                    (
                        d["name"], d["path"], d["fmt"],
                        json.dumps(d["options"], sort_keys=True),
                        d["schema_json"],
                        json.dumps(d["foreign_keys"]),
                    ),
                )
            for q in self._queries.values():
                cur.execute(
                    "INSERT INTO karna_queries (name, language, text) "
                    f"VALUES ({ph}, {ph}, {ph})",
                    (q.name, q.language, q.text),
                )
            self._conn.commit()  # one transaction: all-or-nothing
        except BaseException:
            self._conn.rollback()
            raise
