"""Incremental materialized-view maintenance from a change feed.

NORTH-STAR provenance: every serving-side warehouse keeps grouped
aggregates (revenue per region, docs per domain, tokens per language)
over tables that mutate by CDC; recomputing them from the base table
on every refresh is the pattern that dies first at 100 TB. The
reference's declared surface has no MV story at all
(`/root/reference/karna-core/src/lib.rs:1-14` is the cargo template);
this is the standard incremental view maintenance algebra (Gupta &
Mumick 1995's counting algorithm, the shape Delta Lake's CDF +
`MERGE` refresh and Materialize/Flink retraction streams use),
re-expressed as two Spark aggregates.

The contract: the feed is Delta-CDF-shaped
(``SnapshotStore.read_change_feed`` — 'I'/'U+' rows carry post-images,
'D'/'U-' rows carry preimages). COUNT and SUM are abelian-group
aggregates, so the maintained view is

    mv'(g) = mv(g) ⊕ Σ_{feed rows in g} sign(op) · contribution(row)

with ``sign`` = +1 for I/U+, −1 for D/U-, and groups whose maintained
count reaches zero dropped (the counting algorithm's liveness rule —
without the count a sum-only view cannot know when a group vanishes).
Sums must be over EXACT types (BIGINT / DECIMAL — money in cents, not
doubles): group theory needs exact inverses, and float retraction
drifts.

Scale: cost is one map-side-combinable aggregate over the FEED
(∝ |delta|, never the base table) plus a |groups|-scale full-outer
merge with the stored view — at 100 TB with a 0.1% daily delta that
is a 1000× scan reduction per refresh, and the merge is
metadata-scale whenever the group domain is (region, language, day,
…). No windows, no collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DecimalType,
    IntegerType,
    LongType,
    ShortType,
)


def _sum_type(df: DataFrame, c: str) -> DataType:
    """The exact accumulator type for summing column ``c``: integral
    inputs widen to BIGINT, DECIMAL(p,s) widens to DECIMAL(38,s)
    (maximum headroom at the input's scale — a DECIMAL(18,2) cents
    column keeps its cents instead of being truncated to whole
    units). Float inputs are REFUSED: retraction needs exact group
    inverses, and float sums drift."""
    dt = df.schema[c].dataType
    if isinstance(dt, DecimalType):
        return DecimalType(38, dt.scale)
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return LongType()
    raise TypeError(
        f"mv sum column {c!r} must be an exact type (integral or "
        f"decimal); got {dt.simpleString()} — cast money to DECIMAL "
        "or integer cents upstream"
    )


def grouped_mv(
    df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Initial materialization: per-group count + exact sums.
    Columns: ``*group_cols, mv_count, <c>_sum per sum col``."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("mv_count")] + [
        F.sum(c).cast(_sum_type(df, c)).alias(f"{c}_sum") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def apply_feed(
    mv: DataFrame,
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Maintain ``mv`` (the :func:`grouped_mv` shape) with one
    CDF-shaped feed. Returns the refreshed view — same schema, groups
    with zero maintained count dropped."""
    sign = (
        F.when(F.col("op").isin("I", "U+"), F.lit(1))
        .when(F.col("op").isin("D", "U-"), F.lit(-1))
        .otherwise(F.lit(None))
        .cast("bigint")
    )
    # Accumulator types come from the STORED view's sum columns (the
    # contract grouped_mv established) — deriving them from the feed
    # would let a feed whose column arrives at a narrower scale (e.g.
    # DECIMAL(18,0) after an upstream cast) silently round the stored
    # cents on the final cast (r10 review). The feed column is still
    # validated exact (float feeds refused), and a feed scale WIDER
    # than the stored scale is refused rather than rounded.
    types = {}
    for c in sum_cols:
        feed_t = _sum_type(feed, c)  # validates exactness, raises on float
        stored = mv.schema[f"{c}_sum"].dataType
        feed_scale = feed_t.scale if isinstance(feed_t, DecimalType) else 0
        stored_scale = (
            stored.scale if isinstance(stored, DecimalType) else 0
        )
        if feed_scale > stored_scale:
            raise TypeError(
                f"feed column {c!r} has scale {feed_scale} but the "
                f"view stores {c}_sum at scale {stored_scale}; widen "
                "the view (re-materialize) instead of rounding the feed"
            )
        types[c] = stored
    delta = (
        feed.withColumn("_sign", sign)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").cast("bigint").alias("_dcount"),
            *[
                F.sum(F.col("_sign") * F.col(c))
                .cast(types[c])
                .alias(f"_d_{c}")
                for c in sum_cols
            ],
        )
    )
    zero = F.lit(0).cast("bigint")
    merged = mv.join(delta, group_cols, "full_outer").select(
        *group_cols,
        (
            F.coalesce(F.col("mv_count"), zero)
            + F.coalesce(F.col("_dcount"), zero)
        ).alias("mv_count"),
        *[
            (
                F.coalesce(F.col(f"{c}_sum"), F.lit(0).cast(types[c]))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0).cast(types[c]))
            )
            .cast(types[c])
            .alias(f"{c}_sum")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col("mv_count") > 0)
