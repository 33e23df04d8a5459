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
- ``semantic_drop_ids``: group the assignment by cluster id (one
  shuffle) and run the within-cluster all-pairs cosine as a chunked
  BLAS gram matrix per cluster (``applyInPandas`` — the matmul kernel
  SemDeDup itself uses), dropping the higher id of every pair above
  ``tau``. Per-cluster work is quadratic *by contract* (that is
  SemDeDup) but it executes inside vectorized C, parallel across
  clusters; cluster size is bounded by K scaling with corpus size
  (K ≈ N/1000 in the paper). A runaway hot cluster at 100 TB is the
  classic skew case: block-slabbed gram computation bounds memory,
  and splitting a hot centroid into satellites (re-seed within the
  cluster) is the documented escape hatch.

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
    block: int = 2048,
) -> DataFrame:
    """Ids dropped by the keep-lowest-id policy: every vector that has
    a same-cluster partner with a smaller id and cosine ≥ tau.

    One shuffle (groupBy cid), then the within-cluster all-pairs
    cosine as a BLAS gram matrix per cluster inside ``applyInPandas``
    — the kernel SemDeDup itself runs (matmul over the cluster's
    normalized embedding matrix). A join + per-pair cosine expression
    would be quadratic in *rows processed by the engine* (and its
    tiny-bytes/huge-compute shape makes AQE collapse it to one task);
    here the quadratic work happens inside vectorized C at memory
    bandwidth, parallel across clusters. The gram matrix is computed
    in ``block``-row slabs so memory stays O(block·m) per cluster, not
    O(m²) — a 1M-row runaway cluster costs slabs, not 8 TB.

    Numeric contract: float32 inputs are widened to float64 before
    normalize/matmul; BLAS reassociates the 64-term dot sums, which
    perturbs cosines by ≲1e-13 — thresholds must sit (as ours do, by
    fixture margin ≥ 8e-6) away from any pair's exact value.
    """
    import numpy as np
    import pandas as pd

    def drop_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        empty = pd.DataFrame({id_col: np.array([], dtype=np.int64)})
        if m < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )[order]
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        norms[norms == 0.0] = np.inf  # zero vectors match nothing
        V = V / norms[:, None]
        dropped = np.zeros(m, dtype=bool)
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            S = V[lo:hi] @ V.T  # (hi-lo, m) slab of the gram matrix
            # row i (global index lo+i) drops every LATER j with
            # cosine ≥ tau; mask out j ≤ i (ids sorted ascending).
            hit = S >= tau
            cols = np.arange(m)[None, :]
            hit &= cols > (np.arange(lo, hi)[:, None])
            dropped |= hit.any(axis=0)
        return pd.DataFrame({id_col: ids[dropped]})

    return (
        assigned.select("cid", id_col, vec_col)
        .groupBy("cid")
        .applyInPandas(drop_group, f"{id_col} long")
    )
