"""Connected components over a pair list — near-dup cluster assembly.

Pairwise near-dup detection (MinHash-LSH, SimHash) emits edges; a
dedup policy needs *clusters*: transitively-connected groups with one
canonical representative to keep. This is the standard iterative
min-label propagation (the MapReduce-era hash-to-min algorithm):

    label(v) ← min(label(v), min over neighbors' labels)

repeated until fixpoint. Convergence takes O(component diameter)
rounds; near-dup clusters are dense and shallow (diameter ≤ ~3), so
the loop runs 2-4 times in practice. Each round is one equi-join
(labels onto edge endpoints) plus one min-aggregate — two shuffles on
doc id, nothing quadratic. The driver-side loop holds only a changed-
row COUNT per round (a scalar), never data; labels persist across
rounds and the previous round's cache is released as soon as the next
materializes. For adversarially deep graphs (long chains) the
large-star/small-star variant halves diameter per round; near-dup
workloads don't need it and the simple form shuffles less per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster ids for every vertex appearing in ``pairs``: one row
    (id, cluster_id) per vertex, cluster_id = min vertex id of its
    component — deterministic at any parallelism."""
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        for _ in range(max_iter):
            neigh = edges.join(
                labels.withColumnRenamed("id", "dst"), "dst"
            ).select(F.col("src").alias("id"), "label")
            new_labels = (
                labels.unionByName(neigh)
                .groupBy("id")
                .agg(F.min("label").alias("label"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("label", "old"), "id"
                )
                .filter(F.col("label") < F.col("old"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("id", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def cluster_representatives(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Dedup keep/drop decision: (id, cluster_id, keep) where exactly
    the minimum id of each cluster is kept."""
    cc = connected_components(pairs, src_col, dst_col)
    return cc.withColumn("keep", F.col("id") == F.col("cluster_id"))
