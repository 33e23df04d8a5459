"""Two-phase prefix-sum operator (operators/prefix.py): value parity
against the naive single-window form, exact NTILE replication, and the
plan guarantee that motivated it — no unpartitioned window ever sees a
data-scale frame."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from karna_spark.operators.prefix import ntile_from_rank, prefix_sum, row_rank


def _fixture(spark, n=997, groups=0):
    # Deterministic pseudo-random weights; n chosen prime so partition
    # boundaries never align with value patterns.
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 100 + 100).alias("w"),
    )
    if groups:
        df = df.withColumn("g", (F.col("id") % groups).cast("int"))
    return df


def test_prefix_sum_matches_single_window(spark):
    df = _fixture(spark)
    got = prefix_sum(df, "w", ["id"], out_col="c", num_partitions=7)
    win = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("c", F.sum("w").over(win))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_prefix_sum_grouped(spark):
    df = _fixture(spark, groups=5)
    got = prefix_sum(df, "w", ["id"], group_by=["g"], out_col="c", num_partitions=7)
    win = (
        Window.partitionBy("g")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("c", F.sum("w").over(win))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_row_rank_desc_order(spark):
    df = _fixture(spark, n=251)
    got = row_rank(df, [F.col("w").desc(), F.col("id")], out_col="rn",
                   num_partitions=5)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("w").desc(), "id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        (r["id"], r["w"], r["rn"]) for r in want.collect()
    )


def test_ntile_from_rank_replicates_ntile(spark):
    # Sweep n around the bucket-count boundary (including n < k) so the
    # first-buckets-take-the-remainder rule is hit in every shape.
    for n in (1, 2, 3, 4, 5, 7, 8, 97):
        df = spark.range(1, n + 1).select(F.col("id"))
        want = df.select(
            "id", F.ntile(4).over(Window.orderBy("id")).alias("b")
        )
        got = df.crossJoin(
            F.broadcast(df.agg(F.count("*").cast("bigint").alias("n")))
        ).select("id", ntile_from_rank(4, F.col("id"), F.col("n")).alias("b"))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), n


def test_prefix_queries_have_no_datascale_unpartitioned_window(spark):
    """The three queries the r6 verdict flagged as single-reducer
    windows now run only prefix-machinery windows: every Window node is
    either partitioned by the range-partition id (data-scale, balanced)
    or runs over the _pfx_sub subtotal frame (numPartitions×|groups|
    rows — metadata-scale)."""
    from karna_spark.queries.registry import REGISTRY

    for name in (
        "sample_weighted_pps",
        "text_sequence_packing",
        "events_rfm_segmentation",
        "sample_top_p_by_lang",
        "events_winsorized_stats",
        "window_distribution_ranks",
    ):
        df = REGISTRY[name].builder(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [l for l in plan.splitlines() if "+- Window [" in l or l.lstrip(" :+-").startswith("Window [")]
        assert windows, name  # the machinery is actually in the plan
        for line in windows:
            assert "_pfx_" in line, f"{name}: non-prefix window: {line.strip()[:160]}"
            if "sum(_pfx_sub" not in line:
                # data-scale window: must be partitioned by the pid.
                assert ", [_pfx_pid" in line, f"{name}: {line.strip()[:160]}"
