"""Metadata-scale local rows as pure-JVM literal plans.

Neutral home for :func:`literal_frame` (r12 ADVICE: operators importing
it from ``queries.parity`` inverted the layering — queries import
operators everywhere else, so a future edit could close the circle).
``queries.parity`` re-exports it for existing call sites.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def literal_frame(spark, rows, schema):
    """Metadata-scale LOCAL rows as a pure-JVM literal plan.

    ``spark.createDataFrame(local_list)`` parallelizes through a
    Python RDD: defaultParallelism pickle partitions, each costing a
    Python-worker round-trip when scanned (measured ~200 ms × cores
    per evaluation at local[32]) — and the scan is RE-paid every time
    the frame is recomputed, e.g. as the build side of a broadcast
    join inside an iterative trainer. Driver-resident values this
    small belong IN the plan: one ``inline`` over an array-of-structs
    literal, a single JVM task, no Python workers, constant-foldable.
    ``schema`` is a DDL string or a StructType (pass a StructType when
    a field's type is itself dynamic, e.g. carried over from an input
    column). Falls back to ``createDataFrame`` for empty input
    (``inline`` needs a typed, non-empty array literal).
    """
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if not rows:
        return spark.createDataFrame([], st)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(tuple(r), st.fields)
            ]
        )
        for r in rows
    ]
    # .to(st) re-asserts the declared schema exactly — lit() of a
    # non-null value yields a non-nullable field, and downstream
    # unions/comparisons expect createDataFrame's all-nullable shape.
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs))).to(st)
