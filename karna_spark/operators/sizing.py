"""Size-adaptive parallelism for iterated metadata/frame-scale caches.

Iterative operators (BPE merges, connected components, PageRank, GD
training) loop dozens of times over a PERSISTED frame that is usually
orders of magnitude smaller than the corpus (vocab-, vertex-, or
doc-scale). The frame inherits the session's shuffle parallelism at
materialization, so every iteration pays `shuffle.partitions` tiny
tasks plus an exchange — a fixed cost × iterations that dominates at
fixture scale and wastes scheduler throughput at any scale.

The right parallelism derives from the frame's MEASURED cached size
(guide §2: make partitioning scale-adaptive — derive it from input
size rather than a constant tuned for either local mode or the
cluster): once the first action materializes the cache, its in-memory
byte size is in the plan statistics, and a narrow ``coalesce`` to
``bytes / target_bytes_per_partition`` propagates through every later
iteration. A fixture-scale frame collapses to ONE partition — a
single-partition child satisfies any clustering requirement, so the
per-iteration aggregates and self-joins run exchange-free as single
single-task stages — while a 10M-row web-scale frame keeps ~its
natural parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# 32 MB of cached (deserialized) bytes per partition: small enough to
# keep per-task memory trivial, large enough that per-task overhead is
# noise against real work.
TARGET_PARTITION_BYTES = 32 << 20


def cached_partition_target(
    df: DataFrame, target_bytes: int = TARGET_PARTITION_BYTES
) -> int | None:
    """Partition count for a MATERIALIZED cached frame sized to
    ``target_bytes``; None when plan statistics are unreachable
    (e.g. non-classic sessions)."""
    try:
        nbytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return max(1, -(-nbytes // target_bytes))
    except Exception:
        return None


def coalesce_to_size(df: DataFrame, materialized: DataFrame) -> DataFrame:
    """``df`` coalesced (narrow, no shuffle) to the partition count the
    MATERIALIZED cached frame's size implies — identity when stats are
    unavailable or the frame is already at/below the target count."""
    target = cached_partition_target(materialized)
    if target is None:
        return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.coalesce(target) if target < cur else df


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition a COMPUTE-HEAVY scan whose input layout
    under-parallelizes the session — the guide's remedy for
    unsplittable input (§2.5: "one huge unsplittable file … repartition
    immediately after the read").

    The fixture tables are single-row-group parquet, which Spark cannot
    split below one task no matter the split-size confs — so every
    corpus map pass (Arrow UDF signatures, md5 probes, explode+agg
    featurizers) runs single-threaded while the rest of the box idles.
    Conditional: a no-op whenever the scan already has at least half as
    many partitions as the session has cores (any real multi-file
    table), so at 100 TB — thousands of splits — no shuffle is added;
    the exchange only fires where the layout starves the compute, and
    it moves exactly one pass of the (by construction small) input.
    """
    try:
        cores = df.sparkSession.sparkContext.defaultParallelism
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur * 2 >= cores:
        return df
    return df.repartition(cores)
