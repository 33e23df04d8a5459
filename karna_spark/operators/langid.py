"""Trained character-n-gram language-ID classifier (F31).

The r6 ``text_lang_id`` row is the marker-word HEURISTIC (stopword
hits); this is the trained path public crawl pipelines actually run
(CLD/fastText shape, reduced to its statistical core): learn
per-language character-bigram profiles from labeled documents, score
unlabeled text with Laplace-smoothed naive-Bayes log-likelihood, and
predict the argmax language. Reference scope: the reference declares
generic query/data-processing over document corpora
(`/root/reference/README.md:2`); language ID is the standard corpus
curation gate at 100 TB (C4/RefinedWeb both filter on it before any
quality scoring).

Exactness: every log-probability is round-quantized to MICRO-NATS and
summed as BIGINT — the certified F26/F30 recipe — so scores reduce
exactly at any parallelism and the DuckDB oracle replays them
bit-for-bit.

Scale shape: training is ONE corpus pass (explode char bigrams →
(lang, bigram) counts, map-side combinable); the model is
|langs| × |alphabet²| rows — metadata-scale, broadcast everywhere; the
DENSE model (every (bigram, lang) pair carries either its smoothed
log-prob or the language's OOV floor) is built once by a
metadata-scale cross join so scoring is a single broadcast EQUI-join
on the bigram plus one map-side aggregate per (doc, lang). No
windows over data-scale frames, no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

E6 = 1_000_000


def char_bigrams(text: Column) -> Column:
    """All overlapping character bigrams of ``text`` (empty array for
    texts shorter than 2 chars — guard first: sequence(1, 0) would
    otherwise step DOWNWARD in Spark)."""
    t = F.lower(F.trim(text))
    return F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_bigram_model(
    train: DataFrame, text_col: str, lang_col: str
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(model, floors)``.

    ``model`` is the DENSE Laplace-smoothed bigram table: one row per
    (bigram seen anywhere in training) × (language), carrying
    ``lp_e6`` = round(ln((c+1)/(total_lang+V)) · 1e6) for seen pairs
    and the language's OOV value for unseen ones —
    |bigrams| × |langs| rows, broadcastable metadata. ``floors`` is
    (lang, floor_e6) for bigrams outside the training vocabulary
    entirely. Both derive from ONE shared (lang, bigram) count pass:
    the count frame is PERSISTED (metadata-scale) so the corpus
    explode runs exactly once no matter how many consumers (tot /
    vocab / V / model / floors) hang off it — unpersisted, Catalyst
    re-executes the corpus pass per consumer, a 4× scan at 100 TB.
    The handle rides on the returned frames (``_karna_persisted``,
    the repo's release contract).
    """
    cnt = (
        train.select(
            F.col(lang_col).alias("lang"),
            F.explode(char_bigrams(F.col(text_col))).alias("bg"),
        )
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("tot"))
    vocab = cnt.select("bg").distinct()
    v = vocab.agg(F.count(F.lit(1)).alias("v"))
    floors = tot.crossJoin(F.broadcast(v)).select(
        "lang",
        F.round(F.log(F.lit(1.0) / (F.col("tot") + F.col("v"))) * E6)
        .cast("bigint")
        .alias("floor_e6"),
    )
    # metadata-scale cross joins: |bigrams| × |langs| (+ the 1-row V).
    model = (
        vocab.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v))
        .join(cnt, ["lang", "bg"], "left")
        .select(
            "lang",
            "bg",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tot") + F.col("v"))
                )
                * E6
            )
            .cast("bigint")
            .alias("lp_e6"),
        )
    )
    model._karna_persisted = [cnt]  # type: ignore[attr-defined]
    floors._karna_persisted = [cnt]  # type: ignore[attr-defined]
    return model, floors


def classify(
    docs: DataFrame,
    model: DataFrame,
    floors: DataFrame,
    id_col: str,
    text_col: str,
    sparse: bool = False,
) -> DataFrame:
    """Predict a language per document: per-doc bigram bag →
    broadcast equi-join against the dense model (bigrams absent from
    the model entirely fall to each language's floor via the
    metadata-scale floors cross join) → exact BIGINT score sum →
    deterministic argmax (score desc, then lexicographic lang).
    Returns (id_col, lang_pred, score_e6). Documents shorter than two
    characters have no bigrams and drop out (nothing to score).

    SCALE NOTE — the |langs| multiplier: the floors cross join fans
    the per-doc bigram bag by |langs| BEFORE the (doc, lang)
    aggregate, so the shuffled intermediate is |langs| × the bag. At
    this model's 5 languages that is the dense-scoring plan fastText
    itself runs; at a 200-language production model the fan-out
    dominates. The aggregate is map-combinable (partial sums reduce
    the fan-out executor-side before the shuffle), so the plan
    survives — but the sparse-scoring escape is cheaper there: join
    the bag against the model FIRST (only (bigram, lang) pairs the
    model has SEEN — sparse, not dense), aggregate per (doc, lang)
    over seen bigrams only, then add each language's floor × (bag
    total − seen count) arithmetically. Same exact BIGINT result,
    intermediate ∝ model hits instead of |langs| × bag.
    ``sparse=True`` runs that plan (differential-tested against dense
    — bit-identical scores by construction: a trained (bg, lang) pair
    scores strictly above the floor, ln(c+1) ≥ ln 2 ≈ 693147
    micro-nats, so the lp≠floor filter recovers the true sparse
    model exactly)."""
    bag = (
        docs.select(
            F.col(id_col), F.explode(char_bigrams(F.col(text_col))).alias("bg")
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    if sparse:
        # true-sparse model: only pairs trained above the floor
        sparse_model = model.join(F.broadcast(floors), "lang").filter(
            F.col("lp_e6") != F.col("floor_e6")
        )
        seen = (
            bag.join(F.broadcast(sparse_model), "bg")
            .groupBy(id_col, "lang")
            .agg(
                F.sum(F.col("n") * F.col("lp_e6")).alias("seen_e6"),
                F.sum("n").alias("n_seen"),
            )
        )
        totals = bag.groupBy(id_col).agg(F.sum("n").alias("n_tot"))
        scored = (
            totals.crossJoin(F.broadcast(floors))
            .join(seen, [id_col, "lang"], "left")
            .select(
                id_col,
                "lang",
                (
                    F.coalesce(F.col("seen_e6"), F.lit(0))
                    + F.col("floor_e6")
                    * (F.col("n_tot") - F.coalesce(F.col("n_seen"), F.lit(0)))
                ).alias("score_e6"),
            )
        )
    else:
        # candidate langs ride the floors frame (|langs| rows)
        scored = (
            bag.crossJoin(F.broadcast(floors))
            .join(F.broadcast(model), ["bg", "lang"], "left")
            .groupBy(id_col, "lang")
            .agg(
                F.sum(
                    F.col("n") * F.coalesce(F.col("lp_e6"), F.col("floor_e6"))
                ).alias("score_e6")
            )
        )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score_e6")).alias("ns"), F.col("lang"))).alias("b")
    )
    return best.select(
        id_col,
        F.col("b.lang").alias("lang_pred"),
        (-F.col("b.ns")).alias("score_e6"),
    )
