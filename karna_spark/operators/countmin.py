"""Count-Min sketch: mergeable frequency estimation.

Completes the classic mergeable-sketch quartet next to HLL (distinct,
A29/A33), KLL (quantiles, A31), and top-k heavy hitters (A32): the
Cormode-Muthukrishnan Count-Min sketch answers "how often did item x
occur" from a depth×width counter matrix with one-sided error
(estimate ≥ truth; overcount ≤ εN with probability 1−δ at
width = e/ε, depth = ln 1/δ).

Spark-first shape: a sketch is stored SPARSE — one row per nonzero
cell ``(group…, seed, pos, cnt)``, never a d×w dense blob — so
building is one map-side-combinable groupBy (≤ depth×width cells per
group regardless of row count), MERGING any union of groups is a
cell-wise sum (another tiny groupBy — the 100 TB rollup answers any
date range from stored per-day cells, no raw re-scan), and a point
estimate touches exactly ``depth`` cells per probe via a broadcast
join of the probe set. Positions are md5-derived (both engines
bit-for-bit, the F37/J9b convention), so estimates — collisions and
all — are hash-certifiable against a DuckDB replay.

Reference surface: elliot14A/karna README.md:2 (aggregate analytics
verbs); algorithm: Cormode & Muthukrishnan 2005 (public).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def _cm_position(value: Column, seed: int, width: int) -> Column:
    """Row ``seed``'s counter index for a string item: first 8 hex
    digits of md5("<seed>:<value>") mod width (same construction as
    operators/bloom.py, replayed digit-by-digit by oracles)."""
    hx = F.md5(F.concat(F.lit(f"{seed}:"), value).cast("binary"))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % width


def cm_position_sql(value_expr: str, seed: int, width: int) -> str:
    """DuckDB spelling of :func:`_cm_position`."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5('{seed}:' || {value_expr}),"
        f" {d}, 1)) - 1) * {16 ** (8 - d)}"
        for d in range(1, 9)
    ]
    return "((" + " + ".join(terms) + f") % {width})"


def cm_build(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Sparse per-group sketches: ``(*group_cols, seed, pos, cnt)``.
    The item explodes to its ``depth`` (seed, pos) cells and the
    groupBy's map-side combine collapses them in-task — the shuffle
    carries ≤ depth×width rows per group however many input rows."""
    group_cols = group_cols or []
    item = F.col(item_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"),
                    _cm_position(item, i, width).alias("pos"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(*group_cols, cells)
        .groupBy(*group_cols, "cell.seed", "cell.pos")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cm_merge(cells: DataFrame) -> DataFrame:
    """Merge sketches across their group columns: cell-wise sum down
    to one global sketch ``(seed, pos, cnt)``. Any subset of groups
    merges the same way — the mergeable-rollup contract."""
    return cells.groupBy("seed", "pos").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cm_estimate(
    merged: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point estimates for ``probes[item_col]``: min over the sketch's
    ``depth`` counters at each probe's positions (0 when a cell is
    absent — sparse cells ARE zeros). The probe frame explodes to
    depth rows, joins the (≤ depth×width)-row sketch on (seed, pos),
    and a per-item min aggregate finishes: probe-scale work only."""
    item = F.col(item_col).cast("string")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"),
                    _cm_position(item, i, width).alias("pos"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    probe_cells = probes.select(
        F.col(item_col), cells
    ).select(item_col, "cell.seed", "cell.pos")
    joined = probe_cells.join(
        F.broadcast(merged), ["seed", "pos"], "left"
    ).select(item_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("c"))
    return joined.groupBy(item_col).agg(
        F.min("c").cast("long").alias("cm_est")
    )
