"""Empirical scale-efficiency evidence (SURVEY.md §4): data layout
row-group skipping, runtime bloom-filter join pruning, and observed
metrics. These go beyond plan-shape assertions — they MEASURE the
effect (footer statistics, injected runtime filters) that makes the
100 TB story real."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _overlap_fraction(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(#row groups whose [min,max] intersects [lo,hi], #row groups) —
    the fraction a stats-aware reader must actually read."""
    tot = hit = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            tot += 1
            if st.min <= hi and st.max >= lo:
                hit += 1
    return hit, tot


def test_zorder_layout_skips_row_groups_in_both_dims(spark, tmp_path):
    """S13 measured: the z-ordered layout leaves MOST row groups
    skippable for a selective range filter on EITHER interleaved
    dimension; a 1-D sort only serves its own sort column, and a
    random layout serves neither. This is the file-skipping property
    z-ordering exists for, read straight from parquet footer stats."""
    from karna_spark.queries.analytics import _Z_SPARK

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir, sdir, rdir = (str(tmp_path / n) for n in ("z", "s", "r"))
    z = li.selectExpr("*", f"CAST(({_Z_SPARK}) AS BIGINT) AS zval")
    z.repartitionByRange(16, "zval").drop("zval").write.parquet(zdir)
    li.repartitionByRange(16, "l_partkey").write.parquet(sdir)
    li.repartition(16).write.parquet(rdir)

    def frac(path, col, lo, hi):
        hit, tot = _overlap_fraction(path, col, lo, hi)
        return hit / tot

    # z-order: both dimensions prune (roughly half the groups here).
    assert frac(zdir, "l_partkey", 100, 115) <= 0.75
    assert frac(zdir, "l_suppkey", 10, 13) <= 0.75
    # 1-D sort: its own column prunes hard, the other not at all.
    assert frac(sdir, "l_partkey", 100, 115) <= 0.25
    assert frac(sdir, "l_suppkey", 10, 13) >= 0.9
    # random: neither prunes.
    assert frac(rdir, "l_partkey", 100, 115) >= 0.9
    assert frac(rdir, "l_suppkey", 10, 13) >= 0.9


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """AQE-era runtime filtering: when a selective dimension filter
    feeds a shuffle join, Spark injects a bloom filter on the fact
    side (might_contain beneath the scan), so fact rows failing the
    membership test drop BEFORE the shuffle — at 100 TB that is the
    difference between shuffling the table and shuffling the
    matches. Broadcast threshold is disabled to force the shuffle
    path the filter exists for."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        od = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(jmode)
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observed_metrics_on_query(spark):
    """Engine observability: df.observe() attaches accumulator-backed
    metrics to a plan (rows kept, revenue sum) that the server/CLI can
    report per query without a second scan."""
    from pyspark.sql import Observation

    obs = Observation("q_metrics")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter("l_quantity >= 25").observe(
        obs,
        F.count(F.lit(1)).alias("rows_kept"),
        F.sum("l_quantity").alias("qty_sum"),
    )
    n = df.count()
    got = obs.get
    assert got["rows_kept"] == n > 0
    assert got["qty_sum"] >= 25 * n
