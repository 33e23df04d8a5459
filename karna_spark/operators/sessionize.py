"""Gap-based sessionization (SURVEY.md §2.5 W5 / §2.9 T3, batch form).

A session is a maximal run of a user's events where consecutive gaps
are ≤ ``gap_seconds``. Classic two-window formulation:

    new_session = (ts - lag(ts) > gap)  → running SUM = session index

One shuffle on the user key, one per-key sort — linear in events,
regardless of session count. The streaming twin (native
``session_window`` with a watermark) lives in karna_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Append a per-user session index (1-based, in time order).

    Rows are ordered by timestamp only; equal-timestamp rows land in
    the same session regardless of tie order, so session boundaries are
    deterministic even though intra-tie ordering is not.
    """
    # Microsecond integer arithmetic: Spark timestamps are µs-precision,
    # so this is exact — a seconds-truncated comparison would misjudge
    # gaps within 1s of the threshold (and disagree with any µs-exact
    # engine, e.g. the DuckDB oracle).
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Session-level rollup: one row per (user, session) with start/end,
    event count and duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col))
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_s"),
    )
