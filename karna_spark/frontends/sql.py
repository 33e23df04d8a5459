"""SQL front-end: the primary declared query surface.

"query tabular files like CSV, TSV or parquet using SQL" (reference
README.md:2). On Spark this surface is essentially free — parser,
analyzer, optimizer, and execution are the built-in Catalyst lifecycle
(SURVEY.md §3.2) — so this module is deliberately thin: registration +
execution + a guard that keeps the surface read-only (the reference is
a query engine over files, not a mutable store).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from karna_spark.catalog import load_fixture_tables, register

# Statements a query-over-files engine must not accept: anything that
# mutates state. (SELECT/WITH/VALUES/EXPLAIN/SHOW/DESCRIBE are fine.)
_FORBIDDEN_PREFIXES = (
    "insert",
    "update",
    "delete",
    "merge",
    "drop",
    "create",
    "alter",
    "truncate",
    "set",
)


class SQLFrontendError(ValueError):
    pass


# Iceberg/Delta SQL time-travel clauses over snapshot-store tables:
#   SELECT ... FROM t VERSION AS OF 3
#   SELECT ... FROM t TIMESTAMP AS OF '2026-01-01T00:00:00'
_VERSION_RE = re.compile(r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)", re.I)
_TS_RE = re.compile(r"\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'", re.I)


def execute(
    spark: SparkSession,
    sql_text: str,
    snapshots: "dict | None" = None,
) -> DataFrame:
    """Run one read-only SQL statement against registered datasets.

    ``snapshots`` maps table names to ``SnapshotStore`` instances and
    enables Iceberg's SQL time-travel syntax over them: ``t VERSION AS
    OF <n>`` reads the pinned manifest version, ``t TIMESTAMP AS OF
    '<iso>'`` resolves the newest version committed at or before the
    (UTC) timestamp, and a bare ``t`` reads the latest. Each pinned
    reference becomes its own temp view, so ONE statement can join or
    EXCEPT several versions of the same table — the SQL form of a
    snapshot diff. Resolution is manifest-only (driver-side JSON
    reads); the scan itself stays partition-pruned exactly like
    ``store.read``."""
    head = sql_text.lstrip().split(None, 1)
    if head and head[0].lower() in _FORBIDDEN_PREFIXES:
        raise SQLFrontendError(f"read-only surface: {head[0].upper()} not allowed")
    if snapshots:
        def _pin_version(m: "re.Match") -> str:
            name, v = m.group(1), int(m.group(2))
            if name not in snapshots:
                raise SQLFrontendError(
                    f"VERSION AS OF on unregistered snapshot table {name!r}"
                )
            view = f"{name}__v{v}"
            snapshots[name].read(spark, version=v).createOrReplaceTempView(view)
            return view

        def _pin_ts(m: "re.Match") -> str:
            import datetime

            name, ts = m.group(1), m.group(2)
            if name not in snapshots:
                raise SQLFrontendError(
                    f"TIMESTAMP AS OF on unregistered snapshot table {name!r}"
                )
            try:
                dt = datetime.datetime.fromisoformat(ts)
            except ValueError as e:
                raise SQLFrontendError(f"bad timestamp literal {ts!r}: {e}")
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=datetime.timezone.utc)
            view = f"{name}__ts{abs(hash(ts))}"
            snapshots[name].read(spark, as_of=dt.timestamp()).createOrReplaceTempView(view)
            return view

        sql_text = _VERSION_RE.sub(_pin_version, sql_text)
        sql_text = _TS_RE.sub(_pin_ts, sql_text)
        for name, store in snapshots.items():
            # bare references read the latest version
            if re.search(rf"\b{name}\b", sql_text):
                store.read(spark).createOrReplaceTempView(name)
    return spark.sql(sql_text)


def session_with_fixtures(spark: SparkSession, sf_dir: str) -> SparkSession:
    """Register the fixture tables and return the session — the one-call
    setup all three front-ends (SQL / GraphQL / NL) share."""
    load_fixture_tables(spark, sf_dir)
    return spark


__all__ = ["execute", "register", "session_with_fixtures", "SQLFrontendError"]
