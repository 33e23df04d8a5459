"""Gap-based sessionization (SURVEY.md §2.5 W5 / §2.9 T3, batch form).

A session is a maximal run of a user's events where consecutive gaps
are ≤ ``gap_seconds``. Classic two-window formulation:

    new_session = (ts - lag(ts) > gap)  → running SUM = session index

One shuffle on the user key, one per-key sort — linear in events,
regardless of session count. The streaming twin (native
``session_window`` with a watermark) lives in karna_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """NTZ-safe µs extraction. ``unix_micros`` resolves only for the
    LTZ timestamp type; parquet ``timestamp[us]`` with
    ``isAdjustedToUTC=false`` reads as TIMESTAMP_NTZ under Spark 4, so
    cast first — exact under the engine's pinned-UTC session timezone
    (a no-op when the column is already LTZ)."""
    return F.unix_micros(col.cast("timestamp"))


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
    us = _us(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_salted(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    salt_seconds: int = 86_400,
    session_col: str = "session_id",
) -> DataFrame:
    """``sessionize`` for skewed key distributions: identical output,
    bounded per-task work.

    A plain window ``partitionBy(user)`` colocates EVERY event of a hot
    user in one task — AQE cannot split window partitions (SKEW.md).
    This variant salts the key with a coarse time bucket
    (``floor(ts / salt_seconds)``), sessionizes within (user, bucket) —
    parallel across buckets even for one user — then repairs sessions
    spanning bucket boundaries exactly:

    1. Per (user, bucket): local session ids + a 3-column summary
       (n_sessions, first_ts, last_ts). The summary is |users|×|buckets|
       rows — tiny relative to events.
    2. A window over the summary (per user, ordered by bucket; ≤
       |buckets| rows per partition, so never skewed) marks buckets
       whose first event continues the previous bucket's last session
       (gap ≤ threshold), and prefix-sums each bucket's global id base.
    3. Events get ``base + local_id - merged`` — a broadcast-able join
       back on (user, bucket).

    A session spanning k buckets telescopes correctly: each interior
    bucket contributes one merged single-session (adjusted count 0), so
    the whole chain lands on one global id. Numbering equals plain
    ``sessionize`` exactly (bucket order is time order), which is what
    the parity test asserts."""
    us = _us(F.col(ts_col))
    bucket = F.floor(us / F.lit(salt_seconds * 1_000_000)).alias("__bucket")
    salted = df.withColumn("__bucket", bucket)

    w = Window.partitionBy(user_col, "__bucket").orderBy(F.col(ts_col).asc())
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    local = salted.withColumn(
        "__local", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )

    summary = local.groupBy(user_col, "__bucket").agg(
        F.max("__local").alias("__n"),
        F.min(us).alias("__first_us"),
        F.max(us).alias("__last_us"),
    )
    ws = Window.partitionBy(user_col).orderBy("__bucket")
    merged = F.when(
        F.col("__first_us") - F.lag("__last_us").over(ws)
        <= F.lit(gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    summary = summary.withColumn("__merged", merged)
    # Global base: sessions contributed by all earlier buckets, after
    # removing one per boundary merge (this bucket's own merge flag is
    # inside the running sum, hence the trailing correction).
    adj = F.col("__n") - F.col("__merged")
    base = (
        F.sum(adj).over(ws.rowsBetween(Window.unboundedPreceding, 0)) - adj
    ).alias("__base")
    summary = summary.select(user_col, "__bucket", "__merged", base)

    out = local.join(summary, [user_col, "__bucket"]).withColumn(
        session_col, F.col("__base") + F.col("__local") - F.col("__merged")
    )
    return out.drop("__bucket", "__local", "__base", "__merged")


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Session-level rollup: one row per (user, session) with start/end,
    event count and duration seconds."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    us = _us(F.col(ts_col))
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_s"),
    )
