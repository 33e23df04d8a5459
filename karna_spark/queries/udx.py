"""User-defined function surface: scalar UDF and UDTF (SURVEY.md §2.8
U1, U4; U2/U3 live in text_pipeline.py / multimodal entries).

The reference declares an extensible query engine with no function
surface of its own (karna-core/src/lib.rs:1-14 — template only); the
north-star pipeline (BASELINE.json) needs user extension points. These
entries prove the two remaining shapes:

- U1 row-at-a-time Python UDF — the *slow path* by design: each row
  crosses the JVM↔Python boundary individually and blocks whole-stage
  codegen. Kept OFF the hot path in every other query; this entry
  exists to prove the surface and document the cost, not to recommend
  it. (The same logic is expressible with built-ins — that formulation
  is what production code should use.)
- U4 Python UDTF (one row → many rows), Spark's table-function
  surface, driven through a SQL LATERAL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from karna_spark.queries.registry import register_query, table


@register_query(
    "udf_scalar_python",
    oracle="""
    SELECT
      o_orderkey,
      o_orderpriority,
      CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_rank,
      CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
           THEN 'expedite' ELSE 'routine' END AS handling
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags="U1",
)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: registered row-at-a-time Python UDF parsing the priority
    rank out of '1-URGENT'-style strings. Deliberately bounded input
    (o_orderkey <= 500): per-row Python costs ~10-100× a built-in —
    at 100 TB this exact logic should be the substr/cast built-in the
    oracle uses (or a pandas UDF, see udf_vectorized_scalar)."""

    def parse_priority(p: str) -> int | None:
        if p and p[0].isdigit():
            return int(p.split("-", 1)[0])
        return None

    prio = F.udf(parse_priority, T.IntegerType())
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        prio("o_orderpriority").alias("priority_rank"),
        F.when(prio("o_orderpriority") <= 2, "expedite")
        .otherwise("routine")
        .alias("handling"),
    )


@register_query(
    "udtf_tokenize_lateral",
    oracle="""
    SELECT doc_id, s.tok AS tok, s.pos AS pos
    FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                                   (x, i) -> struct_pack(tok := x, pos := CAST(i AS INT)))) AS s
      FROM documents
      WHERE doc_id <= 100
    )
    """,
    tags="U4 F9",
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (one row → many rows) tokenizing documents,
    invoked through a SQL LATERAL join. Rows fan out executor-side —
    no driver involvement, arbitrarily wide input. The pos column
    proves per-call ordered emission."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, pos: int")
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001
            if text:
                for i, tok in enumerate(text.split(" ")):
                    yield tok, i + 1

    spark.udtf.register("karna_tokenize", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok, t.pos
        FROM documents d, LATERAL karna_tokenize(d.text) t
        WHERE d.doc_id <= 100
        """
    )
