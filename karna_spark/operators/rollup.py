"""Incremental time-bucket rollup (continuous-aggregate maintenance).

The hypertable/materialized-rollup pattern: keep a small pre-aggregated
table over an append-only event stream and maintain it by merging the
rollup of each new data slice, never rescanning history. This works for
any *algebraic* aggregate — one whose partial states combine by simple
arithmetic:

    count   : n_a + n_b
    sum     : s_a + s_b        (integer cents here — exact, associative)
    min/max : min/max of partials
    avg     : finalize as sum/count (never averaged directly)

Scale shape: the rollup state is |buckets| × |keys| rows — orders of
magnitude smaller than the events it summarizes. A refresh shuffles
ONLY the delta slice (one groupBy on the delta) plus the state table
(tiny); history is never re-read. Partitioning the stored state by
bucket date makes the merge read partition-pruned. This is the same
partial/final split Spark itself uses inside two-phase HashAggregate,
lifted to a persistent table boundary.

Float policy: value sums accumulate in integer cents (BIGINT) so the
merge is exact and order-independent — summing doubles in different
slice orders would drift vs a full recompute (and vs the oracle).
min/max are safe on raw doubles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_COLS = ("n_events", "sum_value_c", "min_value", "max_value")


def rollup_slice(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Partial-aggregate one data slice into rollup state: one row per
    (bucket_ts, *key_cols) carrying mergeable partials."""
    return df.groupBy(
        F.date_trunc(bucket, F.col(ts_col).cast("timestamp")).alias("bucket_ts"),
        *[F.col(k) for k in key_cols],
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias("sum_value_c"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Combine rollup states (the incremental step). Associative and
    commutative, so slices can arrive in any order and any grouping —
    merge(merge(a, b), c) == merge(a, merge(b, c)) == full recompute."""
    unioned = reduce(DataFrame.unionByName, states)
    keys = [c for c in unioned.columns if c not in _STATE_COLS]
    return unioned.groupBy(*keys).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_c").alias("sum_value_c"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Resolve partials to user-facing aggregates. avg derives from the
    exact partial sums at read time — the one aggregate that must never
    be merged directly."""
    keys = [c for c in state.columns if c not in _STATE_COLS]
    return state.select(
        *keys,
        "n_events",
        (F.col("sum_value_c") / 100.0).alias("total_value"),
        (F.col("sum_value_c") / 100.0 / F.col("n_events")).alias("avg_value"),
        "min_value",
        "max_value",
    )
