"""transformWithStateInPandas (Arbitrary State API v2) — the T-family
custom stateful operator on Spark 4's successor API: named state
variables (ValueState counts + capped ListState of recent types),
checked against a batch recomputation of the same statistics.
"""

from __future__ import annotations

import os

import pytest

# the v2 state protocol rides protobuf (StateMessage_pb2); without it
# the streaming python runner dies at query start — skip, don't fail,
# where the sandbox lacks google.protobuf (see streaming/tws.py)
pytest.importorskip("google.protobuf")


def _stage(spark, tmp_path):
    """Two landing files → two micro-batches (maxFilesPerTrigger=1)."""
    land = str(tmp_path / "landing")
    os.makedirs(land, exist_ok=True)
    b1 = [(1, "view"), (1, "click"), (2, "view")]
    b2 = [(1, "purchase"), (2, "click"), (2, "view"), (3, "view")]
    import glob
    import time

    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(
            rows, "user_id long, event_type string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{land}/b{i}")
        # FileStreamSource orders by modification time; two writes
        # milliseconds apart can land on the same mtime tick, making
        # batch order nondeterministic — pin strictly increasing
        # mtimes so batch 0 always precedes batch 1
        t = time.time() + i * 10
        for f in glob.glob(f"{land}/b{i}/*.parquet"):
            os.utime(f, (t, t))
    return land, b1, b2


def test_user_stats_tws_matches_batch(spark, tmp_path):
    from karna_spark.streaming.tws import user_stats_tws

    land, b1, b2 = _stage(spark, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/b*")
    )
    out = user_stats_tws(stream, keep_last=2)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = spark.sql(
        "SELECT * FROM tws_stats"
    ).collect()
    # update mode: keep each user's LAST row (highest n_batches)
    final = {}
    for r in res:
        cur = final.get(r.user_id)
        if cur is None or r.n_batches > cur.n_batches:
            final[r.user_id] = r
    # batch truth over both files
    all_rows = b1 + b2
    for uid in (1, 2, 3):
        events = [t for u, t in all_rows if u == uid]
        assert final[uid].n_events == len(events)
        # capped ListState: last 2 types in arrival order
        assert final[uid].recent_types == ",".join(events[-2:])
    # n_batches counts only batches the user appeared in
    assert final[1].n_batches == 2
    assert final[2].n_batches == 2
    assert final[3].n_batches == 1


def test_user_stats_tws_value_state_survives_batches(spark, tmp_path):
    # the running count must come from state, not from re-reading
    # earlier batches: user 1 has 2 events in batch 1 and 1 in batch
    # 2; a stateless recomputation per batch would report 1, not 3.
    from karna_spark.streaming.tws import user_stats_tws

    land, _, _ = _stage(spark, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{land}/b*")
    )
    q = (
        user_stats_tws(stream, keep_last=5)
        .writeStream.format("memory")
        .queryName("tws_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT n_events FROM tws_state WHERE user_id = 1"
    ).collect()
    assert max(r.n_events for r in rows) == 3
