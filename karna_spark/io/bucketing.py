"""Bucketed table layout: pre-shuffled, co-located joins (SURVEY.md §4
"shuffle partition tuning" row; the reference's perf posture is one
adjective, reference README.md:2, so this is north-star scale work).

Bucketing trades a one-time shuffle at WRITE time for zero shuffles at
READ time: two tables bucketed by the same key into the same bucket
count hash-split their rows identically on disk, so an equi-join on
that key is planned as a SortMergeJoin whose children are bare scans —
no Exchange on either side (tests/test_plans.py asserts exactly that).
At 100 TB this is the difference between re-shuffling the fact table
per query and paying the layout cost once at ingest.

Uses the session catalog's managed-table path (``saveAsTable``) because
bucket metadata lives in the catalog, not in the files; with the
default warehouse conf the data lands under ``spark-warehouse/``.
"""

from __future__ import annotations

import os
import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

# saveAsTable interpolates the name into SQL and the warehouse path;
# restrict to plain (optionally db-qualified) identifiers.
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def _clear_stale_location(spark: SparkSession, table_name: str) -> None:
    """A managed table's files can outlive its catalog entry (the
    default catalog is session-scoped in-memory, the warehouse dir is
    not). Creating a same-named table then fails with
    LOCATION_ALREADY_EXISTS — remove the orphaned directory."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    loc = os.path.join(warehouse, table_name.lower())
    if warehouse and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) managed table.

    ``sort_cols`` defaults to the bucket columns — sorted buckets let
    the join skip its Sort as well when keys match. Only
    ``mode='overwrite'`` clears a stale warehouse location; append /
    error / ignore must see the existing table untouched."""
    if not _IDENT.match(table_name):
        raise ValueError(f"invalid table name: {table_name!r}")
    if mode == "overwrite":
        _clear_stale_location(df.sparkSession, table_name)
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata from the catalog)."""
    return spark.table(table_name)
