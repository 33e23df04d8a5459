"""SQL front-end: the primary declared query surface.

"query tabular files like CSV, TSV or parquet using SQL" (reference
README.md:2). On Spark this surface is essentially free — parser,
analyzer, optimizer, and execution are the built-in Catalyst lifecycle
(SURVEY.md §3.2) — so this module is deliberately thin: registration +
execution + a guard that keeps the surface read-only (the reference is
a query engine over files, not a mutable store).
"""

from __future__ import annotations

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


def execute(spark: SparkSession, sql_text: str) -> DataFrame:
    """Run one read-only SQL statement against registered datasets."""
    head = sql_text.lstrip().split(None, 1)
    if head and head[0].lower() in _FORBIDDEN_PREFIXES:
        raise SQLFrontendError(f"read-only surface: {head[0].upper()} not allowed")
    return spark.sql(sql_text)


def session_with_fixtures(spark: SparkSession, sf_dir: str) -> SparkSession:
    """Register the fixture tables and return the session — the one-call
    setup all three front-ends (SQL / GraphQL / NL) share."""
    load_fixture_tables(spark, sf_dir)
    return spark


__all__ = ["execute", "register", "session_with_fixtures", "SQLFrontendError"]
