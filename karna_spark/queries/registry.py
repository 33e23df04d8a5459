"""Registry plumbing for the driver-checked query surface.

One ``Query`` per SURVEY.md §2 inventory row (or tight batch of rows).
The contract (driver's ``__spark_entry__.py``):

- ``builder(spark, sf_dir)`` returns a DataFrame; never collects.
- ``oracle`` is equivalent ANSI SQL DuckDB runs over the same parquet
  (tables pre-registered as views). ``None`` → rows-only check.
- Column names must match between the two (the driver sorts columns by
  name before hashing) — every computed column is aliased identically
  on both sides.

Float convention: any double-typed aggregate/computed column is wrapped
in ``round(x, 4)`` on BOTH sides, so summation-order noise (different
between any two engines, and between any two cluster runs) cannot flip
the value hash. Fixture money values are 2-decimal, discounts 2-decimal,
so true aggregate values are exact multiples of 1e-4 — rounding recovers
the exact value rather than approximating it.

Integer convention: DuckDB widens integer SUM to HUGEINT (int128);
Spark keeps BIGINT. Oracles cast such sums back to BIGINT explicitly so
schemas agree.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()  # SURVEY.md §2 row ids covered, e.g. ("A1", "P2")
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register_query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] | str = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: add a builder to the registry under ``name``."""
    if isinstance(tags, str):
        tags = tuple(tags.split())

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (parquet scan — schema from footer,
    pushdown/pruning handled by Catalyst; events ns-timestamp handling
    lives in ``catalog.read_fixture_table``).
    """
    # The driver hands builders ITS session — pin the runtime confs the
    # engine's semantics depend on (UTC session tz above all: fixture
    # timestamps are naive/UTC, and TIMESTAMP_NTZ↔LTZ casts go through
    # the session zone).
    from karna_spark.catalog import read_fixture_table
    from karna_spark.session import tune_session

    tune_session(spark)
    return read_fixture_table(spark, sf_dir, name)
