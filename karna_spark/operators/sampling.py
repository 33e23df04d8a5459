"""Deterministic sampling operators shared by the query surface and
the NL front-end (SURVEY.md §2.6 O6 family).

Curation pipelines need samples that are reproducible across engines,
reruns, and reshards — audit-trail material — which rules out seeded
`df.sample` (partition-layout dependent). The operators here are
order-based or hash-based and therefore bit-stable anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_quota(
    df: DataFrame, stratum_col: str, order_col: str, fraction: float
) -> DataFrame:
    """Keep the first ceil(n_stratum × fraction) rows of each stratum
    in stable ``order_col`` order. Deterministic across engines and at
    any parallelism — the property a curation audit trail needs.

    One shuffle on the stratum key; per-stratum state is a row
    counter, so skewed strata cost their own sort, never a
    cross-product. (At 100 TB a hot stratum's sort is the skew point —
    if the strata are few and huge, prefer the window-free
    hash-threshold mixture operator, `sample_mixture_hash_threshold`.)
    """
    w = Window.partitionBy(stratum_col).orderBy(order_col)
    ranked = df.select(
        *df.columns,
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(stratum_col)).alias("__n"),
    )
    return ranked.filter(
        F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction))
    ).drop("__rn", "__n")
