"""Deduplication queries (north-star; operators in
karna_spark.operators.dedup).

The fixture corpus has planted near-duplicates (25 pairs with bigram
Jaccard ≥ 0.9, everything else < 0.2), so threshold 0.5 separates
perfectly: the MinHash-LSH pipeline's output equals the exact all-pairs
answer with probability 1-(1-s²)³² ≈ 1-1e-24 at s≥0.9 — which is why
the LSH query can carry a *strict* DuckDB oracle rather than a weaker
rows-only check. SimHash banding has no cheap SQL twin (64-bit xxhash
replication), so it stays rows-only here and gets its recall test in
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.operators.dedup import (
    blocked_jaccard_pairs,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from karna_spark.operators.text import fingerprint_md5
from karna_spark.queries.registry import register_query, table

# DuckDB spelling of the distinct-word-bigram shingle set.
_SQL_BIGRAMS = (
    "list_distinct(list_transform(generate_series(1, len(string_split(text,' '))-1),"
    " i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))"
)


@register_query(
    "dedup_exact_stats",
    oracle="""
    WITH fp AS (
      SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
      FROM documents
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT f) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT f) AS n_removed
    FROM fp
    """,
    tags="F7 A2 P3",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalize → md5 fingerprint → distinct. One
    hash-shuffle at any scale; the fingerprint (16 bytes) is what
    shuffles, not the document."""
    docs = table(spark, sf_dir, "documents")
    fp = docs.select(fingerprint_md5(F.col("text")).alias("f"))
    return fp.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("f").alias("n_distinct"),
        (F.count("*") - F.count_distinct("f")).alias("n_removed"),
    )


@register_query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_SQL_BIGRAMS} AS sh FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
    tags="J9 F7",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs at Jaccard ≥ 0.5 (64 perms, 32
    bands × 2 rows, word-bigram shingles), verified with exact Jaccard.
    The oracle computes the *exact all-pairs* answer — at the corpus's
    similarity margin the LSH candidate stage has ~1-1e-24 recall, so
    the two agree. Sub-quadratic: only band-bucket collisions are ever
    compared."""
    docs = table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, num_perm=64, bands=32, shingle_n=2
    )


@register_query(
    "dedup_ngram_jaccard_blocked",
    oracle=f"""
    WITH s AS (
      SELECT lang, doc_id, {_SQL_BIGRAMS} AS sh FROM documents
    )
    SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.15
    """,
    tags="J9 F9",
)
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within language blocks at a low threshold —
    the blocked-quadratic strategy for when a cheap key bounds block
    size (and the verifier behind LSH candidates)."""
    docs = table(spark, sf_dir, "documents")
    return blocked_jaccard_pairs(
        docs, "doc_id", "text", ["lang"], threshold=0.15, shingle_n=2
    )


@register_query("dedup_simhash", oracle=None, tags="J9 F7")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 8 of 64 bits, 16-bit slice
    buckets). Rows-only for the driver (xxhash64 bit math has no cheap
    SQL twin); recall against planted dups is unit-tested in
    tests/test_operators.py."""
    docs = table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8)


@register_query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
    tags="J9 F8",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (threshold
    0.35 on this corpus — its max intra-label cosine is 0.475). The
    unblocked scale path swaps the label key for sign-LSH buckets
    (operators.similarity.random_hyperplane_buckets)."""
    emb = table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, "vec_id", "embedding", "label", threshold=0.35)
    return pairs.select(
        "block", "id_a", "id_b", F.round(F.col("cos"), 4).alias("cos")
    )


@register_query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE s AS (
      SELECT doc_id, {_SQL_BIGRAMS} AS sh FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src AS id, dst AS peer FROM edges
      UNION
      SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src
    )
    SELECT id, least(id, min(peer)) AS cluster_id,
           id = least(id, min(peer)) AS keep
    FROM reach GROUP BY id
    """,
    tags="J9 F7",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assembly: MinHash-LSH pairs (same parameters as
    `dedup_minhash_lsh`, whose recall vs exact all-pairs is
    oracle-proved) fed into iterative min-label connected components
    (operators/cluster.py) — one row per clustered doc with its
    component id and the keep/drop decision (keep = minimum doc of the
    component). The oracle recomputes the same fixpoint with a
    recursive CTE over the exact pair set. This is the full dedup
    policy a corpus pipeline executes: detect pairs sub-quadratically,
    then retain one representative per transitive group."""
    from karna_spark.operators.cluster import cluster_representatives

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, num_perm=64, bands=32, shingle_n=2
    )
    return cluster_representatives(pairs).select(
        F.col("id"), F.col("cluster_id"), F.col("keep")
    )
