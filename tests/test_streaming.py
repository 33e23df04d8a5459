"""Structured Streaming behavior tests (SURVEY.md §2.9 T4).

The oracle entries prove streaming == batch for on-time data; these
tests cover what the oracle can't: late-data *dropping* across
micro-batch restarts (the actual point of a watermark) and state carry
across batches in the custom stateful operator.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".io_cache", "test_streaming")


def _write_one_file(df, landing, name):
    tmp = os.path.join(landing, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), os.path.join(landing, name))
    shutil.rmtree(tmp)


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, (ts, u, t, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value", "props"
    )


@pytest.fixture()
def workdir():
    d = os.path.join(_TMP, uuid.uuid4().hex[:10])
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_watermark_drops_late_rows_across_restart(spark, workdir):
    """Append-mode restart semantics: after the watermark has passed a
    window's end (persisted in the checkpoint), rows arriving later for
    that window are dropped — they must not re-emit or alter output."""
    from karna_spark.streaming.jobs import events_stream, tumbling_watermark

    landing = os.path.join(workdir, "landing")
    ckpt = os.path.join(workdir, "ckpt")
    outdir = os.path.join(workdir, "out")
    os.makedirs(landing)

    def run_available_now():
        stream = tumbling_watermark(
            events_stream(spark, landing, one_batch=True), window="1 hour", delay="30 minutes"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: events in hour 10; watermark stays at 10:xx → nothing final
    _write_one_file(
        _events_df(spark, [("2024-01-01 10:00:10", 1, "a", 1.0),
                           ("2024-01-01 10:20:00", 1, "a", 2.0)]),
        landing, "00_batch.parquet",
    )
    run_available_now()
    # run 2: an event at 13:00 pushes the watermark to 12:30 → hour-10
    # window finalizes and emits with the on-time rows only
    _write_one_file(
        _events_df(spark, [("2024-01-01 13:00:00", 2, "a", 5.0)]),
        landing, "01_batch.parquet",
    )
    run_available_now()
    # run 3: a LATE row for hour 10 (watermark already at 12:30) → dropped
    _write_one_file(
        _events_df(spark, [("2024-01-01 10:40:00", 3, "a", 100.0)]),
        landing, "02_late.parquet",
    )
    run_available_now()

    out = spark.read.parquet(outdir)
    h10 = out.filter(F.col("window_start") == "2024-01-01 10:00:00").collect()
    assert len(h10) == 1, "hour-10 window must emit exactly once"
    assert h10[0]["n_events"] == 2 and h10[0]["total_value"] == 3.0, "late row must be dropped"


def test_stateful_operator_carries_state_across_batches(spark, workdir):
    """applyInPandasWithState: totals accumulate in group state across
    micro-batches (maxFilesPerTrigger=1 → one batch per file)."""
    from karna_spark.streaming.jobs import events_stream, user_stats_stateful

    landing = os.path.join(workdir, "landing")
    os.makedirs(landing)
    _write_one_file(
        _events_df(spark, [("2024-01-01 10:00:00", 7, "a", 1.50),
                           ("2024-01-01 10:01:00", 7, "a", 2.25)]),
        landing, "00_batch.parquet",
    )
    _write_one_file(
        _events_df(spark, [("2024-01-01 11:00:00", 7, "a", 4.00)]),
        landing, "01_batch.parquet",
    )

    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        user_stats_stateful(events_stream(spark, landing))  # maxFilesPerTrigger=1
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(spark.table(name).collect(), key=lambda r: r["n_events"])
    # one emission per batch; second carries state from the first
    assert [r["n_events"] for r in rows] == [2, 3]
    assert rows[1]["total_value_c"] == 775  # 150 + 225 + 400 cents


def test_streaming_sessionization_native(spark, workdir):
    """T3-streaming: native session_window under a watermark — gap-based
    sessions finalize and emit in append mode."""
    landing = os.path.join(workdir, "landing")
    os.makedirs(landing)
    _write_one_file(
        _events_df(spark, [("2024-01-01 10:00:00", 1, "a", 1.0),
                           ("2024-01-01 10:05:00", 1, "a", 1.0),
                           ("2024-01-01 10:30:00", 1, "a", 1.0)]),
        landing, "00_batch.parquet",
    )
    _write_one_file(
        _events_df(spark, [("2024-01-01 15:00:00", 2, "a", 1.0)]),
        landing, "01_flush.parquet",
    )
    from karna_spark.streaming.jobs import events_stream

    sessions = (
        events_stream(spark, landing)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", "n")
    )
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["user_id"], r["n"]) for r in spark.table(name).collect()}
    # user 1: events at 10:00/10:05 merge (gap<15m); 10:30 starts a new
    # session → two finalized sessions. user 2's session never finalizes.
    assert got == {(1, 2), (1, 1)}


def test_chained_windowed_agg_multi_batch(spark, workdir):
    """T16: hourly→daily chained stateful aggregation across THREE
    micro-batches whose hours interleave — the daily row for a day
    split across batches must merge hourly state, not append; the
    flush sentinel releases the final day. n_hours proves the daily
    stage consumed finalized hourly rows."""
    from karna_spark.streaming.jobs import chained_hourly_daily, events_stream, run_to_memory

    b1 = _events_df(
        spark,
        [
            ("2024-03-01 00:10:00", 1, "view", 1.0),
            ("2024-03-01 02:10:00", 1, "view", 2.0),
        ],
    )
    b2 = _events_df(
        spark,
        [
            ("2024-03-01 00:40:00", 2, "view", 4.0),   # same hour as b1's first
            ("2024-03-01 05:10:00", 2, "view", 8.0),   # new hour, same day
        ],
    )
    b3 = _events_df(
        spark,
        [
            ("2024-03-02 01:00:00", 3, "view", 16.0),  # next day
            ("2024-03-09 00:00:00", 9, "__flush__", 0.0),  # sentinel
        ],
    )
    for i, b in enumerate((b1, b2, b3)):
        _write_one_file(b, workdir, f"{i:02d}_b.parquet")
    out = run_to_memory(
        chained_hourly_daily(events_stream(spark, workdir)), "append"
    )
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["n_hours"], r["total_value"])
        for r in out.collect()
    }
    assert got[("2024-03-01", "view")] == (4, 3, 15.0)
    assert got[("2024-03-02", "view")] == (1, 1, 16.0)
