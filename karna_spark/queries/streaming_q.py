"""Structured Streaming entries (SURVEY.md §2.9 T4, §7 M6).

Each builder runs a real streaming query to completion
(``availableNow``) and returns the sink contents. The watermarked
append-mode entry is oracle-checked against the *batch* aggregation —
the strongest possible statement of Spark's batch/streaming unification
(same ``window`` operator, same results, late-data semantics added).

The staged landing directory + far-future sentinel file mechanism is
documented in karna_spark/streaming/jobs.py; the sentinel's window is
never finalized, so append output is exactly the finalized real
windows.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.queries.registry import register_query
from karna_spark.streaming.jobs import (
    _STREAM_CACHE,
    events_stream,
    run_to_memory,
    stage_events,
    static_enrich_join,
    tumbling_watermark,
    dedup_stream,
    session_window_stream,
    user_stats_stateful,
    view_click_join,
    view_click_left_join,
)


@register_query(
    "streaming_tumbling_watermark",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags="T1 T4",
)
def streaming_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: watermarked 1-hour tumbling aggregation under readStream,
    append output mode, availableNow trigger, file-per-micro-batch.
    Append mode emits each window exactly once when the watermark
    passes its end — the oracle is the plain batch aggregation, so the
    hash-match proves streaming == batch for on-time data. State is
    bounded by the 30-minute watermark delay at any stream size."""
    landing = stage_events(spark, sf_dir, with_sentinel=True)
    return run_to_memory(tumbling_watermark(events_stream(spark, landing)), "append")


@register_query(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_c
    FROM events
    GROUP BY user_id
    """,
    tags="T4 U3",
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals in explicit group state, integer-cent
    arithmetic for cross-engine exactness. Single micro-batch here, so
    each key emits once and the result equals the batch group-by; the
    multi-batch state-carry behavior is pytest-covered
    (tests/test_streaming.py)."""
    landing = stage_events(spark, sf_dir, with_sentinel=False)
    checkpoint = os.path.join(_STREAM_CACHE, "ckpt", uuid.uuid4().hex[:10])
    return run_to_memory(
        user_stats_stateful(events_stream(spark, landing, one_batch=True)),
        "append",
        checkpoint=checkpoint,
    )


@register_query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT v.user_id AS user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           strftime(date_trunc('second', v.ts), '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL 1 HOUR
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    tags="T4 J6",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: watermarked stream-stream inner join — every view matched to
    the same user's clicks within the following hour (the funnel /
    attribution shape). Both streams carry watermarks and the join
    bounds click_ts to a view-relative range, so buffered state expires
    instead of growing with the stream (karna_spark/streaming/jobs.py:
    view_click_join). Inner-join append emits each match exactly once,
    so the complete streaming result hash-matches the batch range join
    the oracle runs."""
    landing = stage_events(spark, sf_dir, with_sentinel=False)
    views = events_stream(spark, landing, one_batch=True).filter(
        F.col("event_type") == "view"
    )
    clicks = events_stream(spark, landing, one_batch=True).filter(
        F.col("event_type") == "click"
    )
    checkpoint = os.path.join(_STREAM_CACHE, "ckpt", uuid.uuid4().hex[:10])
    return run_to_memory(
        view_click_join(views, clicks), "append", checkpoint=checkpoint
    )


@register_query(
    "streaming_left_outer_join",
    oracle="""
    SELECT v.user_id AS user_id,
           v.event_id AS view_id,
           c.event_id AS click_id,
           strftime(date_trunc('second', v.ts), '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id
     AND c.ts >= v.ts
     AND c.ts <= v.ts + INTERVAL 1 HOUR
    """,
    tags="T4 T15 J2",
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: watermarked stream-stream LEFT OUTER join — the matched
    rows emit like the inner join (T4), and every view with NO click
    in its following hour emits exactly once with a NULL click side,
    released only when the click watermark proves no match can still
    arrive. The landing directory delivers the data file then a
    far-future flush sentinel as a second micro-batch; the sentinel
    passes through the watermark operator BEFORE the event-type
    filter drops it, so state expiry fires and the closing no-data
    micro-batch drains every unmatched view — the complete streaming
    result hash-matches the batch LEFT JOIN the oracle runs
    (karna_spark/streaming/jobs.py: view_click_left_join). TWO
    sentinel micro-batches: watermark advancement lags one batch, so
    the nulls released by the first sentinel's watermark are emitted
    while processing the second (availableNow runs no closing
    no-data batch)."""
    landing = stage_events(spark, sf_dir, double_sentinel=True)
    a = events_stream(spark, landing)
    b = events_stream(spark, landing)
    checkpoint = os.path.join(_STREAM_CACHE, "ckpt", uuid.uuid4().hex[:10])
    return run_to_memory(
        view_click_left_join(a, b), "append", checkpoint=checkpoint
    )


@register_query(
    "streaming_dedup_exact",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
           value
    FROM events
    """,
    tags="T4 J9 T6",
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+J9: exactly-once dedup over an at-least-once stream. The
    landing directory delivers the events file TWICE (two identical
    micro-batches); watermarked dropDuplicates on event_id emits every
    event exactly once, so the sink hash-matches the plain events table
    — the oracle never sees the duplication. State stays bounded by the
    1-hour watermark horizon at any stream size
    (karna_spark/streaming/jobs.py: dedup_stream)."""
    landing = stage_events(spark, sf_dir, with_sentinel=False, duplicate=True)
    checkpoint = os.path.join(_STREAM_CACHE, "ckpt", uuid.uuid4().hex[:10])
    return run_to_memory(
        dedup_stream(events_stream(spark, landing)), "append", checkpoint=checkpoint
    )


@register_query(
    "streaming_session_window",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts)
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM tagged
    )
    SELECT user_id,
           strftime(date_trunc('second', MIN(ts)), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(epoch_us(CAST(MAX(ts) AS TIMESTAMP)) - epoch_us(CAST(MIN(ts) AS TIMESTAMP))
                AS DOUBLE) / 1000000.0 AS duration_s
    FROM s
    GROUP BY user_id, sid
    """,
    tags="T3 T4 T3s",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 under true streaming: native F.session_window with a
    watermark, append mode, sentinel-driven finalization (the sentinel
    batch pushes the watermark past every real session close, so the
    sink holds exactly the finalized sessions). Hash-matches the batch
    gap-sessionization rollup — the strongest statement that the
    engine's three session formulations (batch lag/running-sum, salted,
    native streaming) implement one semantics."""
    landing = stage_events(spark, sf_dir, with_sentinel=True)
    return run_to_memory(
        session_window_stream(events_stream(spark, landing)), "append"
    )


@register_query(
    "streaming_foreachbatch_upsert",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    tags="T4 T5 S9",
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental materialization: the events fixture lands
    as three overlapping-date files, each processed as its own
    micro-batch (maxFilesPerTrigger=1, availableNow), and a
    foreachBatch sink merges each batch's daily rollup into a
    persistent state table via write-new + atomic-rename upsert
    (streaming/jobs.py foreachbatch_rollup). The oracle is the batch
    group-by over ALL events — the hash-match proves three partial
    merges reproduce the full recompute exactly (integer-cent sums are
    associative/commutative), i.e. the continuous-aggregate pattern is
    correct, not just plumbed."""
    from karna_spark.streaming.jobs import foreachbatch_rollup, stage_events_split

    landing = stage_events_split(spark, sf_dir, n_files=3)
    state_dir = os.path.join(_STREAM_CACHE, "fb_state", uuid.uuid4().hex[:10])
    state = foreachbatch_rollup(spark, landing, state_dir)
    return state.select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("bucket_day"),
        "event_type",
        "n_events",
        "sum_value_c",
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    )


@register_query(
    "streaming_snapshot_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           3 AS n_versions
    FROM events
    GROUP BY 1, 2
    """,
    tags="T8 S12 T5 T11",
)
def streaming_snapshot_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8+S12: streaming continuous aggregate maintained in the
    manifest-versioned SnapshotStore — each of the three micro-batches
    commits a new time-travelable snapshot (copy-on-write on the
    event_type partitions it touches; the manifest rename is the
    atomic commit, exactly the Delta/Iceberg streaming-sink shape).
    The result reads the FINAL snapshot and carries the version count:
    a hash match proves three merge-commits reproduce the batch
    recompute exactly AND that exactly one snapshot per micro-batch
    was published. Per-version monotonicity (every snapshot remains
    readable; counts only grow) is pytest-asserted — batch ORDER is
    not part of the contract because merge commutes."""
    from karna_spark.streaming.jobs import (
        foreachbatch_snapshot_rollup,
        stage_events_split,
    )

    landing = stage_events_split(spark, sf_dir, n_files=3)
    root = os.path.join(_STREAM_CACHE, "snap_state", uuid.uuid4().hex[:10])
    store = foreachbatch_snapshot_rollup(spark, landing, root)
    n_versions = store.latest_version()
    return store.read(spark).select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("bucket_day"),
        "event_type",
        "n_events",
        "sum_value_c",
        F.lit(n_versions).alias("n_versions"),
    )


_SQL_BIGRAMS_STREAM = (
    "list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-1),"
    " i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))"
)


@register_query(
    "streaming_incremental_dedup",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_SQL_BIGRAMS_STREAM} AS sh FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard,
           CAST(3 AS INT) AS n_batches
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
    tags="T8 J18 J9 T14",
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8+J18: the steady-state ingest dedup run as a real stream —
    three document micro-batches (maxFilesPerTrigger=1 over a disjoint
    doc_id%3 split) each probe the signature table the PRIOR batches
    appended, emit verified near-dup pairs, and append their own
    signatures + text to the stores (streaming/jobs.py:
    foreachbatch_incremental_dedup). Every pair is emitted exactly
    once — when its later member arrives — so the canonicalized union
    of the per-batch pair logs must equal the one-shot exact all-pairs
    answer over the WHOLE corpus: the oracle is the same exact-Jaccard
    all-pairs query that certifies `dedup_minhash_lsh`, so a hash
    match proves no pair is lost or duplicated across batch
    boundaries, whatever the batch order. n_batches (from the pair
    log's distinct batch ids over a split guaranteed to pair in every
    batch) certifies the stream really ran as three micro-batches.
    Per-batch cost is |batch| x bucket occupancy — the 100 TB
    streaming-ingest contract."""
    from karna_spark.streaming.jobs import (
        foreachbatch_incremental_dedup,
        stage_documents_split,
    )

    landing = stage_documents_split(spark, sf_dir, n_files=3)
    root = os.path.join(_STREAM_CACHE, "incdedup", uuid.uuid4().hex[:10])
    pairs = foreachbatch_incremental_dedup(spark, landing, root)
    n_batches = pairs.select("batch_id").distinct().count()
    return pairs.select(
        F.least("new_id", "match_id").alias("id_a"),
        F.greatest("new_id", "match_id").alias("id_b"),
        "jaccard",
        F.lit(n_batches).cast("int").alias("n_batches"),
    )


@register_query(
    "streaming_chained_windowed_agg",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags="T16 T1 T4",
)
def streaming_chained_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16: chained stateful streaming — hourly tumbling aggregation
    rolled up to daily INSIDE the same streaming query (two stateful
    operators, the window-of-window-time re-window), append mode,
    availableNow. The oracle is the flat batch daily aggregate, and
    n_hours (= finalized hourly rows per daily row, cross-checked by
    the oracle's COUNT(DISTINCT hour)) proves the daily stage consumed
    the intermediate hourly stream rather than raw events. The cascade
    is the at-scale shape: raw events shuffle once into hour grain;
    the daily stage's state and input are |hours|-scale."""
    from karna_spark.streaming.jobs import chained_hourly_daily

    landing = stage_events(spark, sf_dir, with_sentinel=True)
    return run_to_memory(chained_hourly_daily(events_stream(spark, landing)), "append")


@register_query(
    "streaming_static_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_mktsegment, c.c_nationkey
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags="T18",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T18: stream-static enrichment join — the event stream joined
    per micro-batch against the static customer dimension
    (streaming/jobs.py:static_enrich_join). Stateless: no watermark,
    no state store; the dimension rides a broadcast hint so the
    STREAM side never shuffles (the posture that holds when the fact
    stream is 100 TB/day and the dimension is millions of rows);
    append emits each enriched row exactly once, so the complete
    streaming output hash-matches the oracle's batch join."""
    landing = stage_events(spark, sf_dir, with_sentinel=False)
    stream = events_stream(spark, landing, one_batch=True)
    dim = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    checkpoint = os.path.join(_STREAM_CACHE, "ckpt", uuid.uuid4().hex[:10])
    return run_to_memory(
        static_enrich_join(stream, dim), "append", checkpoint=checkpoint
    )
