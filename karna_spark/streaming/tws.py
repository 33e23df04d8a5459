"""Custom stateful streaming via ``transformWithStateInPandas``.

``streaming/jobs.py:user_stats_stateful`` runs the T-family's custom
stateful operator on ``applyInPandasWithState`` — Spark's original
arbitrary-state API. Spark 4 ships its successor,
``transformWithStateInPandas`` (SPARK-46815, "Arbitrary State API
v2"): NAMED state variables (value/list/map) instead of one opaque
tuple, per-variable TTL, timers, and initial-state bootstrap. This
module runs the engine's per-user statistics on the v2 API with the
pieces v1 cannot express:

- a ``ValueState`` running event count,
- a ``ListState`` of recent event types (capped at ``keep_last``) —
  v1 would force the whole list through one pickled tuple every
  batch; v2 reads/writes it as its own column-typed variable.

Scale: state lives in the executor state store keyed by user — the
same partitioning/checkpoint story as every watermarked aggregate; a
1000-executor cluster shards users across stores and each micro-batch
touches only arriving keys. TTL (state expiry without a watermark
over the data) is exactly what a 100 TB behavioral stream needs to
keep the store bounded across months.

ENVIRONMENT GATE: the v2 API's python↔JVM state protocol rides
protobuf (``pyspark/sql/streaming/proto/StateMessage_pb2``), and this
sandbox ships no ``google.protobuf`` — so the paired tests
(tests/test_tws.py) importorskip on it and run only where protobuf
exists. The module itself imports cleanly (the protobuf dependency is
lazy, hit at query start), and the TESTED in-sandbox stateful path
remains ``jobs.user_stats_stateful`` (applyInPandasWithState, v1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, n_batches BIGINT, "
    "recent_types STRING"
)


class UserStatsProcessor(StatefulProcessor):
    """Per-user running stats with two named state variables."""

    def __init__(self, keep_last: int = 5, ttl_ms: int | None = None):
        self.keep_last = keep_last
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getValueState(
            "counts", "n_events BIGINT, n_batches BIGINT", self.ttl_ms
        )
        self.recent = handle.getListState(
            "recent", "event_type STRING", self.ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n_new = 0
        types: list[str] = []
        for pdf in rows:
            n_new += len(pdf)
            types.extend(pdf["event_type"].astype(str).tolist())
        prev = self.counts.get() if self.counts.exists() else (0, 0)
        n_events = int(prev[0]) + n_new
        n_batches = int(prev[1]) + 1
        self.counts.update((n_events, n_batches))
        # ListState append is per-element typed rows; cap to the last
        # keep_last by rewriting (the cap keeps state O(1) per user)
        # state elements arrive as plain TUPLES (one per schema field)
        old = [t[0] for t in self.recent.get()]
        if types:
            kept = (old + types)[-self.keep_last:]
            self.recent.put([(t,) for t in kept])
            recent_str = ",".join(kept)
        else:
            recent_str = ",".join(old)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_batches": [n_batches],
                "recent_types": [recent_str],
            }
        )

    def close(self) -> None:
        pass


def user_stats_tws(
    stream: DataFrame, keep_last: int = 5, ttl_ms: int | None = None
) -> DataFrame:
    """Wire the processor onto a stream carrying (user_id,
    event_type, ...). Update mode: one row per user per micro-batch
    the user appears in."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(keep_last, ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
