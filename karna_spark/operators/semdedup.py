"""Semantic deduplication over an embedding column (SemDeDup-style).

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
corpus embeddings with k-means, then compare pairs ONLY within a
cluster and drop all but one member of every near-duplicate group.
Clustering turns the O(N²) semantic-similarity problem into
O(N·K + Σ|cluster|²) — the same blocking idea MinHash-LSH uses for
lexical dedup, with centroids as the blocks.

Spark realization (reference surface: elliot14A/karna README.md:2
declares querying over tabular files; the LLM-pipeline operators are
the scale layer this engine adds on top):

- ``seed_centroids``: deterministic seeding — the K lowest-id vectors.
  Production would run k-means refinement (``similarity.train_kmeans``
  exists and is reused by IVF); a FIXED seed set keeps this operator's
  full pipeline oracle-expressible in ANSI SQL, which is worth more
  here than centroid quality. K rows — broadcastable by construction.
- ``assign_nearest_centroid``: broadcast the K centroids, score each
  vector against all K with the JVM-side ``cosine`` fold (zero Python,
  whole-stage codegen), then argmax per vector with ONE map-side
  combinable groupBy — the K candidate rows for a vector are produced
  on the vector's own partition, so the partial aggregate collapses
  them locally and the shuffle moves ~1 row per vector.
- ``semantic_drop_ids``: self-join the assignment on cluster id
  (shuffle keyed by ``cid``), keep pairs above ``tau``, and drop the
  higher id of each pair — the deterministic keep-lowest-id policy.
  Per-cluster work is quadratic *by contract* (that is SemDeDup);
  cluster size is bounded by K scaling with corpus size (K ≈ N/1000 in
  the paper). A runaway cluster at 100 TB is the classic skew case:
  AQE skew-join splitting handles moderate skew, and splitting a hot
  centroid into satellites (re-seed within the cluster) is the
  documented escape hatch.

Float discipline: per-row cosine is a sequential JVM fold —
bit-deterministic for a given row — and every cross-row reduction over
cosines is integer (sum of ``round(cos·1e4)`` as BIGINT), so results
are partitioning- and order-independent: the same numbers on 8 threads
or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from karna_spark.functions.vector import cosine


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """K deterministic seed centroids: the K lowest-id vectors.
    TakeOrderedAndProject (no full sort), K rows out."""
    return (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(k)
    )


def assign_nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine.

    Returns (id, vec, cid, cos). Ties (never observed on real
    embeddings) break toward the lowest centroid id so the result is a
    pure function of the data. Plan: broadcast nested-loop against K
    rows → map-side partial argmax → one ~|df|-row shuffle.
    """
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cid"),
        cosine(F.col(vec_col), F.col("cvec")).alias("cos"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cos"), (-F.col("cid")).alias("ncid"))).alias("m"),
        # Every candidate row of a vector carries the same embedding,
        # so first() is value-deterministic here.
        F.first(vec_col).alias(vec_col),
    )
    return best.select(
        F.col(id_col),
        F.col(vec_col),
        (-F.col("m.ncid")).alias("cid"),
        F.col("m.cos").alias("cos"),
    )


def semantic_drop_ids(
    assigned: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ids dropped by the keep-lowest-id policy: every vector that has
    a same-cluster partner with a smaller id and cosine ≥ tau. One
    shuffle (join on cid); quadratic within a cluster by contract."""
    u = assigned.select(
        F.col("cid"), F.col(id_col).alias("id_u"), F.col(vec_col).alias("v_u")
    )
    v = assigned.select(
        F.col("cid"), F.col(id_col).alias("id_v"), F.col(vec_col).alias("v_v")
    )
    pairs = (
        u.join(v, "cid")
        .where(F.col("id_u") < F.col("id_v"))
        .where(cosine(F.col("v_u"), F.col("v_v")) >= tau)
    )
    return pairs.select(F.col("id_v").alias(id_col)).distinct()
