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
    r_ts >= l_ts. Output: all left columns + ``matched_ts_col`` +
    ``value_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
