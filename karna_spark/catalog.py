"""Dataset registration: name ↔ file binding (SURVEY.md §2.1 S1-S6).

The reference's declared data model is "tabular files like CSV, TSV or
parquet" (reference README.md:2) registered in a catalog (its infra
implies a Postgres/Diesel metadata store, reference
docker-compose.yaml:2-19). Spark-native equivalent: each dataset is a
named temp view over a lazily-read DataFrame; the session catalog is the
engine catalog. A durable registry would be a metadata table — out of
scope for the query engine itself.

Scale note: registration is metadata-only (no data read besides schema
inference for headerful CSV); Parquet schemas come from footers. Globs,
directories and Hive-partitioned layouts all work through the same
reader, so a "table" may be one file or 100k objects in S3 — identical
code path, `s3a://` URI only.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The driver's fixture tables (TESTDATA.md); also the vocabulary the
# GraphQL/NL front-ends resolve names against.
FIXTURE_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".tsv": "tsv",
    ".txt": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
}


@dataclass
class Dataset:
    """One registered dataset: a named view over files."""

    name: str
    path: str
    fmt: str
    options: dict[str, str] = field(default_factory=dict)


def infer_format(path: str) -> str:
    """File format from extension; directories default to parquet."""
    _, ext = os.path.splitext(path.rstrip("/"))
    return _FORMAT_BY_EXT.get(ext.lower(), "parquet")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """S1-S5: read CSV/TSV/Parquet/JSON/ORC from a path, glob, directory
    or object-store URI into a DataFrame.

    CSV/TSV default to header+inference (the reference's files carry no
    schema); pass ``schema=`` to skip inference at scale — inference
    costs one extra pass over the text files.
    """
    fmt = fmt or infer_format(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "false" if schema is not None else "true"}
        opts.update(options)
        return reader.options(**opts).csv(path)
    if fmt == "tsv":
        opts = {"header": "true", "sep": "\t", "inferSchema": "false" if schema is not None else "true"}
        opts.update(options)
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    return reader.options(**options).parquet(path)


def register(
    spark: SparkSession,
    name: str,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """S6: bind ``name`` to the files at ``path`` in the session catalog.

    After this, all three front-ends (SQL text, GraphQL, NL) resolve
    ``name`` identically via the Spark session catalog.
    """
    df = read_table(spark, path, fmt=fmt, schema=schema, **options)
    df.createOrReplaceTempView(name)
    return df


def read_fixture_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver fixture table from ``sf_dir``.

    The events fixture stores ``ts`` as parquet ``timestamp[us]`` with
    ``isAdjustedToUTC=false``, which Spark 4 reads as TIMESTAMP_NTZ.
    Time-arithmetic functions (``unix_micros``, ``session_window``,
    watermarks) want the LTZ type, so normalize to ``timestamp`` here —
    the session timezone is pinned UTC (``_SCALE_CONFS`` in session.py),
    making the NTZ→LTZ cast an exact relabel with identical µs values,
    and keeping the DuckDB oracles (tz-naive) byte-identical.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        # Explicit schema: no footer-inference work at plan-build time —
        # repeated builds over the same fixture are action-free.
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[path] = df.schema
    return df


# Fixture schemas are immutable (driver-generated, read-only), so a
# process-lifetime cache is safe.
_SCHEMA_CACHE: dict = {}


def load_fixture_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    """Register the driver's parquet fixture tables from ``sf_dir``.

    Returns name → DataFrame; every table is also a temp view so SQL /
    GraphQL / NL queries can name it.

    Re-pins the engine's runtime confs first (same contract as
    ``registry.table``): a prior query may have carved a per-plan
    posture (e.g. V8 lowers the bloom-filter threshold and disables
    broadcast for its own plan), and lazy execution means those confs
    stay live until the next builder resets them — every builder
    entry point must therefore tune before building.
    """
    from karna_spark.session import tune_session

    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in tables:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            df = read_fixture_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
