"""Train/eval contamination detection by word n-gram overlap.

The standard decontamination step in large-scale training-data
pipelines (the n-gram membership test popularized by the GPT-3 and PaLM
dataset reports): a training document is contaminated if it shares at
least one word n-gram with any document of a held-out benchmark set.

Scale shape: the benchmark side is tiny relative to the corpus (eval
suites are MBs; corpora are TBs), so its distinct n-gram set broadcasts
and the membership test is a broadcast semi/inner join applied map-side
to the exploded training n-grams — the 100 TB cost is one scan of the
corpus plus the in-task n-gram expansion, with a shuffle only for the
final per-doc count (one row per surviving (doc, ngram) pair, which
overlap sparsity keeps small). Nothing is quadratic in either corpus.

N-grams stay as strings rather than 64-bit hashes: a hash would halve
the shuffled bytes but admits false-positive contamination; for a
*removal* decision exactness wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from karna_spark.operators.text import word_ngrams


def ngram_set(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (id, ngram) pairs of each document's word n-grams."""
    return df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    ).distinct()


def contaminated_docs(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """Training docs sharing ≥1 word ``n``-gram with any bench doc:
    one row per contaminated doc with the count of distinct shared
    n-grams (the evidence strength a removal policy thresholds on)."""
    t = ngram_set(train, id_col, text_col, n)
    b = bench.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    ).distinct()
    return (
        t.join(F.broadcast(b), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )
