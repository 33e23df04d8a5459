"""As-of join (SURVEY.md §2.3 J8): for each left row, the most recent
right row at-or-before its timestamp, per key.

Spark has no native as-of join. Two classic formulations:

1. range-join + rank: ``left ⋈ right ON key ∧ r_ts <= l_ts`` then keep
   ``row_number() = 1`` per left row. Simple, but the intermediate join
   explodes to |matches| rows per probe — quadratic per key in the
   worst case. Unusable at 100 TB with long histories.
2. **union + ordered window (implemented here)**: tag both sides,
   union them, and carry the last-seen right values forward with
   ``last(col, ignorenulls=True)`` over a per-key window ordered by
   (ts, side). One shuffle on the key, one sort, zero row explosion —
   O(n log n) per key and skew-tolerant (a hot key costs its own sort,
   not a cross-product).

DuckDB's native ``ASOF JOIN`` is the oracle for this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    allow_exact_match: bool = True,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """Enrich ``left`` with ``value_cols`` from the as-of matching
    ``right`` row (left-outer semantics: NULLs where no match, like
    ``pd.merge_asof``).

    direction="backward": latest right row with r_ts <= l_ts (< if
    ``allow_exact_match=False``); "forward": earliest right row with
    r_ts >= l_ts; "nearest": whichever of the backward/forward
    candidates is closer in absolute time, ties to the backward (i.e.
    earlier) row — ``pd.merge_asof(direction="nearest")`` semantics.
    Output: all left columns + ``matched_ts_col`` + ``value_cols``.

    "nearest" costs the same single shuffle + per-key sort as the
    directional forms: both carries are frames over one window ordering
    (backward = preceding last, forward = following first), so Spark
    evaluates them in one WindowExec pass — no second sort, no join.
    """
    if direction == "nearest":
        if not allow_exact_match:
            raise ValueError("direction='nearest' requires allow_exact_match=True")
        return _asof_nearest(left, right, on, left_ts, right_ts, value_cols, matched_ts_col)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns

    # Both sides are projected to one shared layout:
    #   keys | __asof_ts | __asof_side | matched_ts | value_cols | left payload
    right_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(matched_ts_col),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    left_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = right_side.unionByName(left_side)

    # Traversal order: timestamps in match direction; at an equal
    # timestamp the right row sorts first iff exact matches count.
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    side_order = F.col(_SIDE).asc() if allow_exact_match else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    carried = unioned
    for c in [matched_ts_col, *value_cols]:
        carried = carried.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))

    return carried.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col(matched_ts_col),
        *[F.col(c) for c in value_cols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    matched_ts_col: str,
) -> DataFrame:
    """Nearest-match as-of: union both sides once, then carry the
    backward candidate (last preceding non-null) and the forward
    candidate (first following non-null) over the SAME (keys, ts, side)
    ordering — two frames, one sort — and keep whichever is closer.

    Sort order is (ts asc, side asc) with right=0 < left=1, so an
    equal-timestamp right row lands in the *backward* frame of its left
    row: exact matches are backward candidates with distance 0 and
    always win."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns

    right_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__cand_ts"),
        *[F.col(c).alias(f"__cand_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    left_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__cand_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__cand_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = right_side.unionByName(left_side)

    base = Window.partitionBy(*keys).orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
    w_back = base.rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = base.rowsBetween(0, Window.unboundedFollowing)

    carried = unioned
    for c in ["__cand_ts", *[f"__cand_{c}" for c in value_cols]]:
        carried = carried.withColumn(f"__b_{c}", F.last(F.col(c), ignorenulls=True).over(w_back))
        carried = carried.withColumn(f"__f_{c}", F.first(F.col(c), ignorenulls=True).over(w_fwd))

    # µs distances; NTZ-safe cast (see operators/sessionize._us).
    l_us = F.unix_micros(F.col(_TS).cast("timestamp"))
    b_us = F.unix_micros(F.col("__b___cand_ts").cast("timestamp"))
    f_us = F.unix_micros(F.col("__f___cand_ts").cast("timestamp"))
    # Backward wins ties (<=); a missing candidate loses automatically
    # because NULL comparisons are false and the coalesce order below
    # prefers whichever side exists.
    use_back = F.when(
        b_us.isNotNull() & (f_us.isNull() | ((l_us - b_us) <= (f_us - l_us))), True
    ).otherwise(False)

    picked = [
        F.when(use_back, F.col("__b___cand_ts"))
        .otherwise(F.col("__f___cand_ts"))
        .alias(matched_ts_col)
    ] + [
        F.when(use_back, F.col(f"__b___cand_{c}"))
        .otherwise(F.col(f"__f___cand_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return carried.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols], *picked
    )
