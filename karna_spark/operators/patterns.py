"""Ordered-sequence pattern operators (SURVEY.md §2 T19/A9 family).

The reference's event-analytics surface implies row-pattern questions
("did this user view, then click, then purchase?") — SQL:2016 spells
them MATCH_RECOGNIZE, Flink CEP spells them Pattern.begin/next. The
T19 driver query compresses per-entity streams to symbol strings for
regex patterns; this module holds the GENERAL form the NL front-end
dispatches to: subsequence containment over the raw event-type arrays,
no symbol-alphabet assumption (two event types sharing a first letter
cannot collide here).

Scale: ONE shuffle (the per-entity collect) — the k-step funnel as a
k-way self-join would shuffle the events table k times; the fold over
the collected array is map-side. Per-entity sequences are bounded by
per-entity activity, the same contract as sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_count(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Entities whose chronological event-type sequence contains
    ``steps`` as a SUBSEQUENCE (arbitrary gaps — MATCH_RECOGNIZE's
    skip-to semantics), returned as a 1-row count.

    Per entity: sort the (order, type) structs, fold the type array
    left-to-right advancing a step cursor whenever the next wanted
    step appears (leftmost-greedy matching, which decides subsequence
    existence exactly). The fold is a builtin higher-order function —
    JVM-side, no UDF; the only data-scale shuffle is the groupBy."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    seqs = (
        events.select(
            entity_col,
            F.struct(*order_cols, type_col).alias("e"),
        )
        .groupBy(entity_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list("e")),
                lambda s: s[type_col],
            ).alias("types")
        )
    )
    cursor = F.aggregate(
        F.col("types"),
        F.lit(0),
        lambda acc, t: F.when(
            (acc < F.lit(n)) & (t == F.element_at(steps_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        seqs.select((cursor == F.lit(n)).alias("hit"))
        # coalesce: sum over ZERO groups (empty events frame) is NULL,
        # but a count's contract is 0
        .agg(
            F.coalesce(
                F.sum(F.col("hit").cast("bigint")), F.lit(0)
            ).cast("bigint").alias("n_users")
        )
    )
