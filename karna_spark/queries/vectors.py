"""Vector / similarity-search queries (north-star; SURVEY.md §2.7 F8,
operators in karna_spark.operators.similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.functions.vector import cosine, dot, norm_l2
from karna_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_topk,
)
from karna_spark.queries.registry import register_query, table

# Fixture embedding dimensionality (TESTDATA.md: embeddings.embedding is
# a 64-dim float vector). Passed explicitly so LSH plan construction
# stays action-free — ArrayType carries no length, and resolving it
# with a .first() would run a Spark job before the query's own action.
EMB_DIM = 64


@register_query(
    "vector_ops",
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS l2_norm,
           ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))
                 / len(embedding), 4) AS mean_sq,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    WHERE vec_id % 5 = 0
    """,
    tags="F8",
)
def vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: vector math as SQL lambdas (dot/norm) — JVM-side, codegen'd,
    no UDF. The same expressions power the dedup/similarity operators."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(norm_l2(v), 4).alias("l2_norm"),
        F.round(dot(v, v) / F.size(v), 4).alias("mean_sq"),
        F.size(v).alias("dim"),
    )


@register_query(
    "similarity_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos_raw
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos_raw, 4) AS cos, rank
    FROM ranked WHERE rank <= 5
    """,
    tags="F8 J5 W4",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-5 cosine neighbors for 10 query vectors.
    Queries broadcast; the corpus is scanned once; WindowGroupLimit
    caps the shuffle at k rows per query."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    res = ann_bruteforce_topk(emb, queries, "vec_id", "vec_id", "embedding", k=5)
    return res.select(
        "query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank"
    )


@register_query("similarity_topk_lsh", oracle=None, tags="F8 J9")
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: sign-LSH buckets (8 hyperplanes) probed for the
    same 10 queries — the scale path when both sides are large (the
    bucket equi-join replaces the full cross product). Rows-only for
    the driver (the hyperplane constants have no SQL twin); recall vs
    the brute-force baseline is unit-tested."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    res = ann_lsh_topk(
        emb, queries, "vec_id", "vec_id", "embedding", k=5, n_planes=8, dim=EMB_DIM
    )
    return res.select(
        "query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank"
    )


@register_query(
    "similarity_threshold_search",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
      AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) >= 0.15
    """,
    tags="F8 P2",
)
def similarity_threshold_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search: all corpus vectors with cosine ≥ 0.15 to
    one query vector — the filter-pushdown-friendly form of similarity
    search (a scan + narrow predicate, no shuffle at all)."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.lit(True))
        .withColumn("cos_raw", cosine(F.col("embedding"), F.col("qv")))
        .filter(F.col("cos_raw") >= 0.15)
        .select("vec_id", F.round(F.col("cos_raw"), 4).alias("cos"))
    )


@register_query("similarity_topk_ivf", oracle=None, tags="F8 J9 U3")
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN, IVF path: a k-means coarse quantizer (8 cells,
    3 Lloyd iterations — all shuffles bounded by k·dim, not corpus
    size) partitions the corpus into inverted lists; each query probes
    its 2 nearest cells and exact-ranks only those lists. At 100 TB
    the corpus assignment is one broadcast join and the probe cost is
    nprobe/k of the data per query. Rows-only for the driver (Lloyd
    iteration is not SQL-expressible); recall vs the brute-force
    baseline is unit-tested in tests/test_operators.py."""
    from karna_spark.operators.similarity import ann_ivf_topk, train_kmeans

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    cents = train_kmeans(emb, "embedding", k=8, iters=3)
    res = ann_ivf_topk(emb, queries, cents, "vec_id", "vec_id", "embedding", k=5, nprobe=2)
    return res.select(
        "query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank"
    )


@register_query("similarity_topk_pq", oracle=None, tags="F8 U2")
def similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN, product-quantization path: 8 subspaces × 16
    centroids compress each 64-dim float vector to 8 small codes
    (32× smaller than float32 at scale, stored binary in production);
    queries score corpus rows by asymmetric distance — m table lookups
    per row, no float vectors moving after the encode pass. Codebooks
    train on a bounded hash-sample (FAISS practice), so the driver cost
    is capped at any corpus size. Rows-only for the driver (Lloyd
    training is not SQL-expressible); lossless-construction exactness
    and top-k agreement with brute force are unit-tested in
    tests/test_operators.py."""
    from karna_spark.operators.similarity import ann_pq_topk, train_pq

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    codebooks = train_pq(emb, "embedding", m=8, ksub=16, iters=6)
    res = ann_pq_topk(emb, queries, codebooks, "vec_id", "vec_id", "embedding", k=5)
    return res.select(
        "query_id", "neighbor_id", F.round(F.col("adc"), 4).alias("adc"), "rank"
    )
