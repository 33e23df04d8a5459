"""Text-analysis + multimodal + UDF-surface queries (north-star;
operators in karna_spark.operators.text / .multimodal; SURVEY.md §2.7
F9, §2.8 U1-U3).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.operators.multimodal import (
    attach_media_metadata,
    decode_media,
    sample_frames,
    synthesize_media_df,
)
from karna_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint_md5,
    fingerprint_winnow,
    lang_id,
    quality_features,
    token_counts,
)
from karna_spark.operators.sizing import spread_scan
from karna_spark.queries.parity import literal_frame
from karna_spark.queries.registry import register_query, table


def _sql_markers(code: str) -> str:
    """DuckDB list literal of the marker lexicon for ``code``."""
    items = ", ".join(f"'{m}'" for m in LANG_MARKERS[code])
    return f"len(list_filter(string_split(text, ' '), w -> list_contains([{items}], lower(w))))"


@register_query(
    "text_lang_id",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang AS label,
             {_sql_markers("de")} AS h_de,
             {_sql_markers("en")} AS h_en,
             {_sql_markers("es")} AS h_es,
             {_sql_markers("fr")} AS h_fr
      FROM documents
    )
    SELECT doc_id, label,
           CASE
             WHEN h_de <= 0 AND h_en <= 0 AND h_es <= 0 AND h_fr <= 0 THEN 'und'
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             WHEN h_es >= h_fr THEN 'es'
             ELSE 'fr'
           END AS predicted
    FROM h
    """,
    tags="F9",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: heuristic language-ID — argmax of marker-lexicon hit counts
    with first-wins tie-break. (The fixture's lang labels are synthetic,
    so this checks mechanism determinism, not accuracy.)"""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("label"),
        lang_id(F.col("text")).alias("predicted"),
    )


@register_query(
    "text_quality",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains([{", ".join(f"'{s}'" for s in STOPWORDS)}], lower(w))))
               AS n_stop,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
           CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio
    FROM f
    """,
    tags="F9 F1",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: cheap quality signals (C4/Gopher-style filters). Ratios are
    exact rational arithmetic — identical doubles on both engines, no
    rounding needed."""
    docs = table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_words"].alias("n_words"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["alpha_ratio"].alias("alpha_ratio"),
    )






def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the driver registry (r10 consolidation): strictly dominated by text_duplicate_span_scrub / text_intradoc_span_dedup (rolling-hash fingerprints at span grain, superset machinery). The builder stays for plan/bench/test surfaces.

    F9/F7: document fingerprints — exact (normalized md5) and
    edit-robust (min-5 shingle-hash winnowing)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_md5(F.col("text")).alias("fp_exact"),
        fingerprint_winnow(F.col("text"), shingle_n=3, keep=5).alias("fp_winnow"),
    )


# ------------------------------------------------------------ multimodal
@register_query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents WHERE doc_id % 5 = 0
    """,
    tags="U2 F7",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: opaque-binary metadata path — bytes are hashed and
    sized JVM-side without decoding (dedup + size filters never touch a
    codec). Fixture texts stand in as payload bytes; both engines hash
    the same UTF-8 bytes."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    media = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    meta = attach_media_metadata(media, "payload", "doc_id")
    return meta.select(
        F.col("item_id").alias("doc_id"),
        "n_bytes",
        "sha256",
    )


@register_query(
    "multimodal_decode_pipeline",
    oracle="""
    WITH m AS (
      SELECT CAST(doc_id AS BIGINT) AS d, doc_id % 3 AS kind, doc_id
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
      CASE kind WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/ppm'
           ELSE 'audio/wav' END AS media_type,
      CAST(CASE kind WHEN 0 THEN 4 + d % 13 WHEN 1 THEN 4 + d % 11
           ELSE 64 + d % 100 END AS INT) AS width,
      CAST(CASE kind WHEN 0 THEN 4 + d % 7 WHEN 1 THEN 4 + d % 5
           ELSE 1 END AS INT) AS height,
      CAST(CASE kind WHEN 2 THEN 1 ELSE 3 END AS INT) AS n_channels,
      CASE kind
        WHEN 0 THEN (((d*37)%256 + (d*59)%256 + (d*83)%256) * (4+d%13) * (4+d%7))
                    / ((4+d%13) * (4+d%7) * 3.0) / 255.0
        WHEN 1 THEN (((d*41)%256 + (d*67)%256 + (d*89)%256) * (4+d%11) * (4+d%5))
                    / ((4+d%11) * (4+d%5) * 3.0) / 255.0
        ELSE (abs((d*131)%30000 - 15000) * (64+d%100))
             / CAST(64+d%100 AS DOUBLE) / 32768.0
      END AS mean_intensity
    FROM m
    """,
    tags="U2 U3",
)
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: the full decode pipeline — synthesize real BMP/PPM/WAV
    bytes from doc_id (operators.multimodal.synthesize_media), ship them
    through Arrow-batched mapInPandas, and REALLY parse the containers
    (header fields, padded BMP rows, WAV chunk walk). The oracle
    recomputes every decoded field in closed form from the same seed
    arithmetic, mirroring the exact floating-point operation order so
    the mean compares bit-identically — a wrong stride/padding/chunk
    parse breaks the hash."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    media = synthesize_media_df(docs, "doc_id")
    return decode_media(media).select(
        F.col("item_id").alias("doc_id"),
        "media_type",
        "width",
        "height",
        "n_channels",
        "mean_intensity",
    )


def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the driver registry (r10 consolidation): strictly dominated by multimodal_video_frames (V9 real container frame extraction) + multimodal_decode_pipeline (U2/U3). The builder stays for plan/bench/test surfaces.

    Multimodal: 1→N frame-sampling expansion (posexplode of stride
    offsets) — the row-shape video pipelines need, fully JVM-side. The
    oracle regenerates the same stride offsets from the payload length."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    media = docs.select(
        F.col("doc_id").alias("item_id"), F.encode(F.col("text"), "UTF-8").alias("media")
    )
    return sample_frames(media, every_n_bytes=64, max_frames=4)


# ------------------------------------------------------------ UDF surface
@register_query(
    "udf_grouped_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_pop(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           ROUND((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s USING (event_type)
    """,
    tags="U3 A5",
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map pandas UDF (applyInPandas) — per-group z-score
    normalization computed in vectorized pandas/numpy, the pattern for
    per-group logic Spark expressions can't state. Arrow moves each
    group as one batch; groups are the shuffle unit."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=0)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": ((pdf["value"] - mu) / sigma).round(4),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        zscore, "event_id bigint, event_type string, zscore double"
    )


@register_query(
    "udf_vectorized_scalar",
    oracle="""
    SELECT event_id,
           ROUND(ln(1.0 + value * value), 4) AS log1p_sq
    FROM events WHERE event_id % 20 = 0
    """,
    tags="U2",
)
def udf_vectorized_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-vectorized scalar pandas UDF (numpy batch math). For a
    function this simple the built-in expression is the right choice at
    scale — the query exists to pin the pandas-UDF machinery's
    correctness, and its docstring to say 'prefer F.* when you can'."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log1p_sq(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.round(np.log1p(v * v), 4))

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    return ev.select("event_id", log1p_sq(F.col("value")).alias("log1p_sq"))


# ---------------------------------------------------------------- decontamination
@register_query(
    "text_contamination_ngram",
    oracle="""
    WITH w AS (SELECT doc_id, source,
                      regexp_split_to_array(trim(text), '\\s+') AS ws
               FROM documents),
    g AS (
      SELECT doc_id, source, array_to_string(list_slice(ws, i, i + 3), ' ') AS ngram
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) t
    ),
    bench AS (SELECT DISTINCT ngram FROM g WHERE source = 'src0'),
    train AS (SELECT DISTINCT doc_id, ngram FROM g WHERE source <> 'src0')
    SELECT doc_id, count(*) AS n_shared_ngrams
    FROM train JOIN bench USING (ngram)
    GROUP BY doc_id
    """,
    tags="F9 J9",
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (operators/contamination.py): docs
    from source 'src0' act as the held-out benchmark; every other doc
    is flagged with its count of distinct word 4-grams shared with the
    benchmark. The bench n-gram set broadcasts (eval suites are tiny
    next to a corpus), so the 100 TB cost is one corpus scan + a
    per-doc count shuffle of only the overlapping pairs."""
    from karna_spark.operators.contamination import contaminated_docs

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return contaminated_docs(train, bench, "doc_id", "text", n=4)


def _bloom_oracle() -> str:
    """The DuckDB replay of the Bloom probe: position sets instead of a
    bit array (membership in the distinct-position set ≡ the bit being
    set), with the identical md5 position math — so the oracle
    reproduces the filter's false positives bit-for-bit."""
    from karna_spark.operators.bloom import K_HASHES, M_BITS, bloom_position_sql

    build = "\n        UNION ALL SELECT ".join(
        f"{bloom_position_sql('ngram', i, M_BITS)} FROM bench"
        for i in range(K_HASHES)
    )
    probe = "\n        AND ".join(
        f"{bloom_position_sql('ngram', i, M_BITS)} IN (SELECT p FROM pos)"
        for i in range(K_HASHES)
    )
    return f"""
    WITH w AS (SELECT doc_id, source,
                      regexp_split_to_array(trim(text), '\\s+') AS ws
               FROM documents),
    g AS (
      SELECT doc_id, source, array_to_string(list_slice(ws, i, i + 3), ' ') AS ngram
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) t
    ),
    bench AS (SELECT DISTINCT ngram FROM g WHERE source = 'src0'),
    pos AS (
      SELECT DISTINCT p FROM (SELECT {build}) t(p)
    ),
    train AS (SELECT DISTINCT doc_id, ngram FROM g WHERE source <> 'src0'),
    hits AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged FROM train
      WHERE {probe}
      GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(h.n_flagged, 0) AS n_flagged
    FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
    LEFT JOIN hits h USING (doc_id)
    """


@register_query(
    "dedup_bloom_decontaminate",
    oracle=_bloom_oracle(),
    tags="F9 J9 F37",
)
def dedup_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/bloom.py): the 'src0'
    benchmark's distinct word 4-grams fold into a 65,536-bit / 3-hash
    Bloom filter; every training doc reports how many of its distinct
    4-grams the filter flags. Unlike the exact broadcast join
    (text_contamination_ngram), the probe is MAP-ONLY — no join, no
    explode, no shuffle: the flag count is computed inside the
    projection (size(filter(ngrams, bloom_hit))), so a 100 TB corpus
    costs one scan against an 8 KB bit array however large the
    benchmark suite grows. md5-derived positions make the filter —
    false positives included — replayable by the oracle, so the row
    hash-certifies the probabilistic operator exactly."""
    from karna_spark.operators.bloom import bloom_flag_ngrams

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return bloom_flag_ngrams(train, bench, "doc_id", "text", n=4)


# ---------------------------------------------------------------- BM25
@register_query(
    "text_bm25_scores",
    oracle="""
    WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
               FROM documents),
    dl AS (SELECT doc_id, len(ws) AS dl FROM d),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(ws) AS term FROM d)
      WHERE term IN ('query', 'join', 'shuffle')
      GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term,
             ln(1 + (s.n_docs - count(DISTINCT doc_id) + 0.5)
                    / (count(DISTINCT doc_id) + 0.5)) AS idf
      FROM tf, stats s GROUP BY term, s.n_docs
    )
    SELECT tf.doc_id,
           ROUND(SUM(idf.idf * tf.tf * 2.2
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))), 4)
             AS bm25
    FROM tf
    JOIN idf USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id, stats s
    GROUP BY tf.doc_id
    """,
    tags="F9 A1 F11",
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to the query terms {query,
    join, shuffle} (k1=1.2, b=0.75) — the classic retrieval scorer a
    curation pipeline uses for topical filtering. Pure DataFrame
    composition: explode → two small aggregates (term stats broadcast
    back) → per-doc score; no UDF, one shuffle on doc_id and one on
    term. The corpus stats (N, avgdl) are a 1-row broadcast. The
    implementation lives in operators/retrieval.py (shared with the NL
    front-end's 'top k documents matching <terms>' intent)."""
    from karna_spark.operators.retrieval import bm25_scores

    # spread_scan measured flat-to-slightly-worse here (0.9-1.2 →
    # 1.3 s at sf0.1: the two-scan BM25 already overlaps its work);
    # left unspread.
    return bm25_scores(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        ["query", "join", "shuffle"],
    )


# ---------------------------------------------------------------- PII
@register_query(
    "text_pii_redaction",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com tel 555-'
                  || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
             AS n_emails,
           len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                '<EMAIL>', 'g'),
                 '\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    """,
    tags="F9 F1 F12",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count and redact emails and
    phone-shaped tokens, entirely with JVM-side regex (regexp_count /
    regexp_replace — no Python, codegen-friendly, scales as a map-only
    pass). The fixture text carries no PII, so deterministic fake
    contact strings are appended per doc and the oracle applies the
    same augmentation; the md5 of the redacted text proves the exact
    replacement behavior, not just the counts."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\b555-[0-9]{4}\b"
    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com tel 555-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(email_re)).cast("bigint").alias("n_emails"),
        F.regexp_count("t", F.lit(phone_re)).cast("bigint").alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("t", email_re, "<EMAIL>"), phone_re, "<PHONE>"
            )
        ).alias("redacted_md5"),
    )


# ---------------------------------------------------------------- curation sampling
@register_query(
    "sample_stratified_quota",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    WHERE rn <= ceil(n * 0.2)
    """,
    tags="O6 W1 F13",
)
def sample_stratified_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified quota sampling for dataset curation:
    keep the first 20% of each language stratum in stable doc_id order.
    Unlike seeded random sampling this is reproducible across engines
    (oracle-checkable) and across reruns at any parallelism — the
    property a curation audit trail needs. One shuffle on the stratum
    key; per-stratum state is a row counter, so skewed strata cost
    their own sort, never a cross-product. Implementation in
    operators/sampling.py (shared with the NL front-end's
    'sample N% of T stratified by C' intent)."""
    from karna_spark.operators.sampling import stratified_quota

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_quota(docs, "lang", "doc_id", 0.2)


# ---------------------------------------------------------------- vocab
@register_query(
    "text_vocab_topk",
    oracle="""
    SELECT term AS token,
           count(*) AS term_freq,
           count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
          FROM documents)
    GROUP BY term
    ORDER BY term_freq DESC, token
    LIMIT 50
    """,
    tags="F9 A3 O3 F14",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: the 50 most frequent tokens with term and
    document frequencies (the first step of any tokenizer/vocab
    pipeline). Explode → one two-phase aggregate on the token key →
    ordered limit (plans as TakeOrderedAndProject, no global sort).
    Deterministic tie-break on the token string keeps the cut line
    stable across engines and parallelism."""
    from karna_spark.operators.text import words

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(words(F.trim(F.col("text")))).alias("token")
    )
    return (
        d.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), F.col("token"))
        .limit(50)
    )


@register_query(
    "text_repetition_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, trim(text) AS t,
             regexp_split_to_array(trim(text), '\\s+') AS ws
      FROM documents
    ),
    base AS (
      SELECT doc_id, lang,
             len(ws) AS n_words,
             len(list_distinct(ws)) AS n_distinct,
             1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup_frac,
             len(regexp_replace(t, '\\s+', '', 'g')) AS word_chars
      FROM w
    ),
    counts AS (
      SELECT doc_id, word, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(ws) AS word FROM w)
      GROUP BY doc_id, word
    ),
    top AS (
      SELECT doc_id, word AS top_word, cnt AS top_cnt,
             row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, word) AS r
      FROM counts
    ),
    feat AS (
      SELECT b.lang, b.dup_frac,
             (t.top_cnt * len(t.top_word))::DOUBLE / b.word_chars AS top_frac
      FROM base b JOIN top t ON b.doc_id = t.doc_id AND t.r = 1
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dup_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CAST(round(dup_frac * 10000) AS BIGINT)) AS BIGINT)
             AS sum_dup_frac_e4,
           CAST(SUM(CAST(round(top_frac * 10000) AS BIGINT)) AS BIGINT)
             AS sum_top_frac_e4
    FROM feat
    GROUP BY lang
    """,
    tags="F9 P1 A1 F17",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021 A1.1):
    duplicate-word fraction and most-common-word character fraction per
    document, aggregated per language with a flag count at
    dup_frac > 0.5. The Spark side computes the modal word with a
    single fold over the sorted word array (operators/text.py
    repetition_features) — NO explode, NO per-doc shuffle: the entire
    feature extraction is a map stage and the only shuffle is the
    5-key language rollup. The oracle recomputes the modal word the
    classical way (unnest → count → row_number). Cross-row sums are
    integer (round(x*1e4) BIGINT) so the hash is partition-order
    independent."""
    from karna_spark.operators.sizing import spread_scan
    from karna_spark.operators.text import repetition_features

    # r13 (verdict item 8): the per-doc sorted-word fold is the
    # compute; a single-row-group fixture scan ran it on one core
    # (8-core/32-core ratio was 1.28 — no parallelism at all).
    # Project to the two used columns first so the spread exchange
    # moves only what the fold needs (guide §2.3).
    d = spread_scan(table(spark, sf_dir, "documents").select("lang", "text"))
    f = repetition_features(F.col("text"))
    feat = d.select(
        "lang",
        f["dup_word_frac"].alias("dup_frac"),
        f["top_word_char_frac"].alias("top_frac"),
    )
    return feat.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("dup_frac") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum(F.round(F.col("dup_frac") * 10000).cast("bigint")).alias(
            "sum_dup_frac_e4"
        ),
        F.sum(F.round(F.col("top_frac") * 10000).cast("bigint")).alias(
            "sum_top_frac_e4"
        ),
    )


@register_query(
    "sample_temperature_by_lang",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    s AS (SELECT SUM(sqrt(n_docs)) AS sw FROM counts),
    q AS (
      SELECT lang, n_docs,
             CAST(floor(100 * sqrt(n_docs) / sw) AS BIGINT) AS quota
      FROM counts, s
    ),
    r AS (
      SELECT d.doc_id, d.lang,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d
    ),
    p AS (
      SELECT r.lang, r.doc_id
      FROM r JOIN q ON r.lang = q.lang AND r.rn <= q.quota
    )
    SELECT q.lang, q.n_docs, q.quota,
           COUNT(p.doc_id) AS n_picked,
           CAST(COALESCE(SUM(p.doc_id), 0) AS BIGINT) AS sum_picked_ids
    FROM q LEFT JOIN p ON q.lang = p.lang
    GROUP BY q.lang, q.n_docs, q.quota
    """,
    tags="O6 A1 F7",
)
def sample_temperature_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced corpus sampling (the multilingual-LM
    mixing rule, e.g. mBERT/XLM-R exponent-smoothed sampling, here
    alpha = 0.5): per-language quota ∝ sqrt(count), normalized to a
    100-document budget, then a DETERMINISTIC pseudo-random pick —
    rank by md5(doc_id) inside each language and keep the top quota.
    sqrt is IEEE correctly-rounded (bitwise identical on any engine),
    the md5 ranking is a pure function of the data, and the output
    checksums the picked ids — so the sample is reproducible across
    engines, runs, and cluster layouts. Plan: 5-row quota aggregate
    broadcast back onto the corpus, one window per language partition.
    At 100 TB the exact-rank window over a hot language is the skew
    point; the documented scale path is hash-threshold sampling
    (keep rows with md5 < quota/n bound) which needs no window at all.
    """
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    sw = counts.agg(F.sum(F.sqrt(F.col("n_docs"))).alias("sw"))
    quotas = counts.crossJoin(F.broadcast(sw)).select(
        "lang",
        "n_docs",
        F.floor(F.lit(100) * F.sqrt(F.col("n_docs")) / F.col("sw")).alias("quota"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "lang").withColumn("rn", F.row_number().over(w))
    picked = ranked.join(F.broadcast(quotas), "lang").where(
        F.col("rn") <= F.col("quota")
    )
    agg = picked.groupBy("lang").agg(
        F.count("*").alias("n_picked"),
        F.sum("doc_id").alias("sum_picked_ids"),
    )
    return (
        quotas.join(agg, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "quota",
            F.coalesce(F.col("n_picked"), F.lit(0)).alias("n_picked"),
            F.coalesce(F.col("sum_picked_ids"), F.lit(0)).alias("sum_picked_ids"),
        )
    )


@register_query(
    "text_unigram_logprob",
    oracle="""
    WITH occ AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, COUNT(*) AS cnt FROM occ GROUP BY word
    ),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    q AS (
      SELECT word,
             CAST(round(ln(cnt::DOUBLE / total) * 1000000) AS BIGINT) AS lp_e6
      FROM vocab, tot
    ),
    per_doc AS (
      SELECT occ.doc_id,
             COUNT(*) AS n_words,
             CAST(SUM(-q.lp_e6) AS BIGINT) AS nll_e6
      FROM occ JOIN q USING (word)
      GROUP BY occ.doc_id
    )
    SELECT CAST(floor(nll_e6::DOUBLE / (n_words * 1000000)) AS BIGINT)
             AS nll_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(nll_e6) AS BIGINT) AS sum_nll_e6
    FROM per_doc
    GROUP BY 1
    """,
    tags="F9 A1 F2 F18",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring, unigram edition:
    train the LM on the corpus itself (word → -ln p(word), micro-nat
    quantized to BIGINT so every cross-row reduction is exact), score
    each document by its average per-word negative log-likelihood, and
    histogram documents by whole-nat bucket — the distribution used to
    split a crawl into quality tiers (head/middle/tail in the CCNet
    paper). Plan: one vocabulary aggregate (two-phase), the 1-row
    total broadcast, vocabulary broadcast-joined onto word occurrences
    (vocab ≪ corpus always; falls back to a shuffle join past the
    broadcast threshold automatically), one per-doc aggregate, one
    bucket aggregate. ln() is the only transcendental and is applied
    once per DISTINCT word, not per occurrence."""
    from karna_spark.operators.text import words

    occ = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(words(F.trim(F.col("text")))).alias("word")
    )
    vocab = occ.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    q = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.round(F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000)
        .cast("bigint")
        .alias("lp_e6"),
    )
    per_doc = (
        occ.join(F.broadcast(q), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(-F.col("lp_e6")).alias("nll_e6"),
        )
    )
    return per_doc.groupBy(
        F.floor(
            F.col("nll_e6").cast("double") / (F.col("n_words") * 1000000)
        )
        .cast("bigint")
        .alias("nll_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("nll_e6").cast("bigint").alias("sum_nll_e6"),
    )


@register_query(
    "text_chunk_documents",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
      FROM documents
    ),
    c AS (
      SELECT doc_id, ws, unnest(generate_series(1, len(ws), 30)) AS start
      FROM w
    )
    SELECT doc_id,
           CAST((start - 1) / 30 AS BIGINT) AS chunk_idx,
           CAST(len(ws[start : least(start + 39, len(ws))]) AS INT)
             AS n_chunk_words,
           md5(array_to_string(ws[start : least(start + 39, len(ws))], ' '))
             AS chunk_md5
    FROM c
    """,
    tags="F9 P1 F4 F19",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 40-word
    chunks on a 30-word stride (10-word overlap) — the standard
    sliding-window prep for embedding or training long text. Entirely
    column-level: ``sequence`` generates the chunk starts, posexplode
    fans them out, ``slice`` cuts each chunk — zero Python, zero
    shuffles (the whole operator is a map stage; rows only multiply by
    the ~n/stride chunk factor). Each chunk carries an md5 so the
    oracle certifies the exact chunk CONTENT, not just the counts."""
    from karna_spark.operators.text import words

    CHUNK, STRIDE = 40, 30
    w = table(spark, sf_dir, "documents").select(
        "doc_id", words(F.trim(F.col("text"))).alias("ws")
    )
    c = w.select(
        "doc_id",
        "ws",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.size("ws"), F.lit(1)), F.lit(STRIDE))
        ).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("ws"), F.col("start"), CHUNK)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_chunk_words"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


@register_query(
    "text_sequence_packing",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words
      FROM documents
    ),
    packed AS (
      SELECT lang, n_words,
             CAST(floor(
               (SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_words) / 256.0)
               AS BIGINT) AS bin
      FROM w
    )
    SELECT lang, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM packed
    GROUP BY lang, bin
    """,
    tags="F9 W3 A1 F20",
)
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (the fixed-context batching step):
    assign documents, in deterministic doc_id order within each
    language, to 256-word bins by their cumulative word offset — the
    order-preserving approximation of greedy first-fit packing that
    needs only a running sum, no sequential state. The per-language
    prefix sum uses the two-phase range-partitioned form
    (operators/prefix.py): a PARTITION BY lang window would put
    |corpus|/|languages| rows on each of ~5 reducers, so instead the
    corpus range-partitions on (lang, doc_id), local running totals
    stay balanced, and only the numPartitions×|langs| subtotal frame
    sees a per-group window. Then one aggregate."""
    from karna_spark.operators.prefix import prefix_sum
    from karna_spark.operators.text import words

    w = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(words(F.trim(F.col("text")))).alias("n_words")
    )
    cum = prefix_sum(w, "n_words", ["doc_id"], group_by=["lang"], out_col="c")
    packed = cum.select(
        "lang",
        "n_words",
        F.floor((F.col("c") - F.col("n_words")) / 256.0).cast("bigint").alias("bin"),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )


# ------------------------------------------------- end-to-end pipeline
@register_query(
    "pipeline_training_corpus",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, trim(text) AS t,
             len(regexp_split_to_array(trim(text), '\\s+')) AS wc
      FROM documents
    ),
    -- stage 1: quality gate (length floor)
    quality AS (SELECT * FROM base WHERE wc >= 20),
    -- stage 2: exact dedup, keep lowest doc_id per normalized fingerprint
    fp AS (
      SELECT *, md5(lower(regexp_replace(t, '\\s+', ' ', 'g'))) AS fp
      FROM quality
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fp
      ) WHERE rn = 1
    ),
    -- stage 3: decontamination vs the 'src0' benchmark (shared 4-gram)
    g AS (
      SELECT doc_id, source,
             array_to_string(list_slice(ws, i, i + 3), ' ') AS ngram
      FROM (SELECT doc_id, source,
                   regexp_split_to_array(t, '\\s+') AS ws FROM base),
           LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) ix
    ),
    bench AS (SELECT DISTINCT ngram FROM g WHERE source = 'src0'),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (ngram)
      WHERE g.source <> 'src0'
    ),
    corpus AS (
      SELECT * FROM deduped
      WHERE source <> 'src0'
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    stats AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(wc) AS BIGINT) AS total_tokens
      FROM corpus GROUP BY lang
    )
    SELECT lang, kept_docs, total_tokens,
           ROUND(CAST(total_tokens AS DOUBLE)
                 / CAST(SUM(total_tokens) OVER () AS DOUBLE), 6) AS token_share
    FROM stats
    """,
    tags="F9 F10 J9 A1 O7",
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus build — the composition the
    individual operators exist FOR, in the standard order a 100 TB
    pipeline runs them: (1) quality gate (length floor — cheapest
    filter first, pushed to the scan), (2) exact dedup via normalized
    md5 fingerprint keeping the lowest doc_id (one 16-byte-key
    shuffle), (3) decontamination against the 'src0' benchmark by
    4-gram membership (bench n-gram set broadcasts; corpus side is
    one scan), then per-language corpus statistics with token shares
    (|langs| rows — the window is over the final 5-row frame).
    Every stage is an existing certified operator; this query proves
    they compose without semantic drift. Stage order matters at scale:
    quality+dedup shrink the corpus BEFORE the n-gram explosion."""
    from pyspark.sql import Window

    from karna_spark.operators.contamination import contaminated_docs
    from karna_spark.operators.text import words

    # spread_scan: single-row-group fixture file — the quality/fp/
    # n-gram passes would run single-task otherwise (no-op on any
    # multi-split table).
    docs = spread_scan(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source", F.trim("text").alias("t")
    ).withColumn("wc", F.size(words(F.col("t"))))
    quality = docs.filter(F.col("wc") >= 20)
    fp = quality.withColumn(
        "fp", F.md5(F.lower(F.regexp_replace("t", r"\s+", " ")))
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        fp.withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    dirty = contaminated_docs(train, bench, "doc_id", "t", n=4).select("doc_id")
    corpus = deduped.filter(F.col("source") != "src0").join(
        dirty, "doc_id", "left_anti"
    )
    stats = corpus.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("wc").cast("bigint").alias("total_tokens"),
    )
    w_all = Window.partitionBy()
    return stats.select(
        "lang",
        "kept_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(w_all).cast("double"),
            6,
        ).alias("token_share"),
    )


@register_query(
    "sample_weighted_pps",
    oracle="""
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents
    ),
    cum AS (
      SELECT doc_id, wt,
             CAST(SUM(wt) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS c,
             CAST(SUM(wt) OVER () AS BIGINT) AS total
      FROM w
    )
    SELECT doc_id, wt, CAST(c // (total // 50) AS BIGINT) AS pick_idx
    FROM cum
    WHERE (c - wt) // (total // 50) < c // (total // 50)
    """,
    tags="O6 O7 W3 O8",
)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 depth: systematic PPS (probability-proportional-to-size)
    sampling — selection probability ∝ document weight (n_chars), the
    classic survey-sampling / corpus-mixing design. A document is
    picked iff a multiple of step = total//50 lands inside its
    cumulative-weight interval, so heavy documents are proportionally
    likelier, exactly ~50 picks come out, and the whole decision is
    INTEGER arithmetic over a deterministic (doc_id) order — no RNG,
    no float threshold, engine- and parallelism-exact. The prefix sum
    is the two-phase range-partitioned form (operators/prefix.py):
    balanced local running totals + a metadata-scale offsets window —
    no unpartitioned window ever sees the corpus, so the plan holds at
    100 TB. The grand total is a one-row aggregate broadcast back."""
    from karna_spark.operators.prefix import prefix_sum

    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("wt")
    )
    total = w.agg(F.sum("wt").cast("bigint").alias("total"))
    cum = prefix_sum(w, "wt", ["doc_id"], out_col="c").crossJoin(F.broadcast(total))
    return cum.filter(
        F.expr("(c - wt) div (total div 50)") < F.expr("c div (total div 50)")
    ).select(
        "doc_id",
        "wt",
        F.expr("c div (total div 50)").cast("bigint").alias("pick_idx"),
    )


@register_query(
    "sample_top_p_by_lang",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words
      FROM documents
    ),
    t AS (SELECT lang, SUM(n_words) AS total FROM w GROUP BY lang),
    c AS (
      SELECT w.doc_id, w.lang, w.n_words, t.total,
             SUM(n_words) OVER (PARTITION BY w.lang
                                ORDER BY n_words DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS c
      FROM w JOIN t USING (lang)
    )
    SELECT doc_id, lang, CAST(n_words AS INT) AS n_words,
           CAST(c AS BIGINT) AS cum_words
    FROM c WHERE (c - n_words) * 5 < total * 4
    """,
    tags="O6 O7 F9 O9",
)
def sample_top_p_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 depth: top-p ("nucleus") corpus selection — per language,
    keep the largest documents until they cover 80% of the language's
    tokens (the data-mixing analogue of nucleus sampling: a fixed
    probability mass, not a fixed count, so verbose languages keep
    more documents). A document is kept iff its cumulative interval
    STARTS before the cut — pure integer cross-multiplication, no
    float threshold. The per-language running total is the two-phase
    range-partitioned prefix sum (operators/prefix.py) ordered by
    (n_words DESC, doc_id): no unpartitioned or per-language
    single-reducer window, so the plan survives 100 TB; language
    totals are a tiny aggregate broadcast back."""
    from karna_spark.operators.prefix import prefix_sum
    from karna_spark.operators.text import words

    w = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(words(F.trim(F.col("text")))).alias("n_words")
    )
    cum = prefix_sum(
        w,
        "n_words",
        [F.col("n_words").desc(), F.col("doc_id")],
        group_by=["lang"],
        out_col="c",
    )
    # Each language's total IS its final cumulative value — derive it
    # from the prefix result instead of re-scanning (and re-tokenizing)
    # the corpus for a separate grouped sum.
    totals = cum.groupBy("lang").agg(F.max("c").alias("total"))
    cum = cum.join(F.broadcast(totals), "lang")
    return cum.filter(
        (F.col("c") - F.col("n_words")) * 5 < F.col("total") * 4
    ).select(
        "doc_id",
        "lang",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("c").cast("bigint").alias("cum_words"),
    )


@register_query(
    "text_train_val_test_split",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
             strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS h
      FROM documents
    )
    SELECT lang,
           CASE WHEN h < 13 THEN 'train'
                WHEN h = 13 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM b GROUP BY 1, 2
    """,
    tags="O6 F9 F7 O10",
)
def text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test corpus split: each document's
    bucket is the first hex digit of md5(doc_id) — train 13/16
    (81.25%), val 1/16, test 2/16. Content-independent, stable across
    engines/runs/reshards (the property a training pipeline needs so a
    doc never migrates between splits when the corpus is re-processed),
    and a pure map + one aggregate: zero windows, zero joins, fully
    map-combinable at any scale."""
    from karna_spark.operators.text import words

    b = table(spark, sf_dir, "documents").select(
        "lang",
        F.size(words(F.trim(F.col("text")))).alias("n_words"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        .alias("h"),
    )
    return (
        b.withColumn(
            "split",
            F.when(F.col("h") < 13, F.lit("train"))
            .when(F.col("h") == 13, F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
    )


def _bpe_merge_count() -> int:
    """Merge-count knob for the BPE queries: 20 keeps the per-round
    driver/pytest passes fast; production training and the 200-merge
    bench anchor raise it via KARNA_BPE_MERGES (each merge costs one
    distributed aggregate over the |vocab| frame + a 1-row collect,
    so the knob scales cost linearly and nothing else changes)."""
    return int(os.environ.get("KARNA_BPE_MERGES", "20"))


def _bpe_cte_oracle(k: int) -> str:
    """DuckDB chained-CTE replay of ``learn_bpe`` at ``k`` merges: the
    same word-frequency table, the same deterministic argmax
    (count desc, then lexicographic), and the same greedy
    left-to-right merge fold — expressed as k chained
    pair-count/argmax/merge CTE triples, so the oracle re-derives the
    merge table INDEPENDENTLY instead of replaying Spark's answer
    (the A35 PageRank chained-CTE pattern). The fold uses
    list_reduce over single-element lists (list_reduce seeds the
    accumulator with the first element, so lifting symbols to
    1-lists keeps accumulator and element types aligned)."""
    parts = ["""
    w0 AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    wf AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
      FROM w0 WHERE w <> '' GROUP BY 1
    ),
    s0 AS (
      SELECT w, freq,
             list_append(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)),
                         '</w>') AS syms
      FROM wf
    )"""]
    for i in range(1, k + 1):
        parts.append(f"""
    p{i} AS (
      SELECT syms[j] AS a, syms[j+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM s{i-1}, unnest(generate_series(1, len(syms) - 1)) t(j)
      WHERE len(syms) >= 2
      GROUP BY 1, 2
    ),
    b{i} AS (
      SELECT {i-1} AS merge_idx, a, b, cnt
      FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s{i} AS (
      SELECT w, freq,
        list_reduce(
          list_transform(syms, s -> [s]),
          (acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = bi.a
                                AND x[1] = bi.b
                      THEN list_concat(acc[1:len(acc)-1], [bi.a || bi.b])
                      ELSE list_concat(acc, x) END
        ) AS syms
      FROM s{i-1}, b{i} bi
    )""")
    union = " UNION ALL ".join(
        f"SELECT merge_idx, a AS left_sym, b AS right_sym, a || b AS merged,"
        f" cnt AS pair_freq FROM b{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH " + ",".join(parts) + f""",
    m AS ({union}),
    tot AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS total_words,
             CAST(SUM(freq * len(syms)) AS BIGINT) AS total_bpe_tokens
      FROM s{k}
    )
    SELECT m.merge_idx, m.left_sym, m.right_sym, m.merged, m.pair_freq,
           tot.total_words, tot.total_bpe_tokens
    FROM m, tot"""
    )


_BPE_EXACT_K = 8


@register_query(
    "text_bpe_merges_exact",
    oracle=_bpe_cte_oracle(_BPE_EXACT_K),
    tags="F9 F22",
)
def text_bpe_merges_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F22, hash-certified (r10 — upgrades the retired rows-only
    text_bpe_merges/text_bpe_token_stats pair): byte-pair-encoding
    merge learning (Sennrich 2016) at k=8 merges, certified against a
    DuckDB chained-CTE replay that re-derives every merge
    independently — pair counts, the deterministic argmax (count desc
    then lexicographic), the greedy left-to-right fold, AND the
    applied tokenization (total_words / total_bpe_tokens after all 8
    merges ride on every row), so a wrong fold, tie-break, or count
    anywhere in the loop breaks the hash. Engine shape (operators/
    bpe.py:learn_bpe): one corpus pass builds the (word, freq) frame;
    each merge is ONE distributed pair-count aggregate over the
    |vocab| frame plus a 1-row argmax collect; the merge is a JVM-side
    F.aggregate fold — |vocab|-scale forever, corpus-scale once,
    unchanged at 100 TB. k is a literal (not the env knob): the oracle
    text must replay exactly this many merges."""
    from karna_spark.operators.bpe import learn_bpe, word_frequencies

    wf = word_frequencies(table(spark, sf_dir, "documents"))
    merges, syms = learn_bpe(
        wf, num_merges=_BPE_EXACT_K, return_symbols=True
    )
    mdf = literal_frame(
        spark,
        merges,
        "merge_idx int, left_sym string, right_sym string, "
        "merged string, pair_freq bigint",
    )
    stats = syms.agg(
        F.sum("freq").cast("bigint").alias("total_words"),
        F.sum(F.col("freq") * F.size("syms"))
        .cast("bigint")
        .alias("total_bpe_tokens"),
    )
    out = mdf.crossJoin(F.broadcast(stats))
    out._karna_persisted = getattr(syms, "_karna_persisted", [])  # type: ignore[attr-defined]
    return out


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the driver registry (r10 consolidation): was
    rows-only; superseded by the HASH-CERTIFIED ``text_bpe_merges_exact``
    (k=8 chained-CTE oracle replay). Builder stays for pytest
    differential + env-knob production use.

    F22: REAL byte-pair-encoding merge learning over the corpus
    (Sennrich 2016) — one corpus pass builds the word-frequency table,
    then each merge is one distributed pair-count aggregate over the
    |vocab| frame plus a 1-row argmax collect; the merge itself is a
    JVM-side greedy fold (operators/bpe.py). Deterministic at any
    parallelism (count-desc + lexicographic tie-break), so the merge
    table is stable output. Iterative and therefore not
    SQL-expressible — rows-only driver check; the differential gate is
    tests/test_operators.py::test_learn_bpe_matches_reference (exact
    match against an independent pure-Python implementation, the CC
    vs union-find pattern)."""
    from karna_spark.operators.bpe import learn_bpe, word_frequencies

    wf = word_frequencies(table(spark, sf_dir, "documents"))
    merges = learn_bpe(wf, num_merges=_bpe_merge_count())
    return literal_frame(
        spark,
        merges,
        "merge_idx int, left_sym string, right_sym string, "
        "merged string, pair_freq bigint",
    )


def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETIRED from the driver registry (r10 consolidation): was
    rows-only; the applied-tokenization totals are hash-certified
    inside ``text_bpe_merges_exact`` now. Builder stays for tests.

    F22 applied: tokenize the corpus with the LEARNED BPE merges —
    the word→token-count lookup is the trainer's final symbol frame
    (every vocabulary word's tokenization falls out of training for
    free), so corpus tokenization is one (lang, word) aggregate joined
    to the |vocab| lookup: no per-document merge replay, no Python in
    the path. Emits per-language totals and tokens-per-word — the
    fertility metric tokenizer work optimizes. Deterministic (the
    merge table is), rows-only like the trainer."""
    from karna_spark.operators.bpe import learn_bpe, word_frequencies
    from karna_spark.operators.text import words

    docs = table(spark, sf_dir, "documents")
    _, syms = learn_bpe(
        word_frequencies(docs), num_merges=_bpe_merge_count(),
        return_symbols=True,
    )
    tok_map = syms.select("w", F.size("syms").alias("n_tokens"))
    per_lang = (
        docs.select(
            "lang",
            F.explode(words(F.lower(F.trim(F.col("text"))))).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        per_lang.join(tok_map, "w")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("total_words"),
            F.sum(F.col("c") * F.col("n_tokens"))
            .cast("bigint")
            .alias("total_bpe_tokens"),
        )
        .select(
            "lang",
            "total_words",
            "total_bpe_tokens",
            F.round(
                F.col("total_bpe_tokens").cast("double")
                / F.col("total_words"),
                6,
            ).alias("avg_tokens_per_word"),
        )
    )
    out._karna_persisted = getattr(syms, "_karna_persisted", [])  # type: ignore[attr-defined]
    return out


@register_query(
    "sample_mixture_hash_threshold",
    oracle="""
    WITH n AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT source,
             LEAST(CAST((200 * w * 16777216)
                        // ((SELECT SUM(w) FROM n) * n_docs) AS BIGINT),
                   CAST(16777216 AS BIGINT)) AS thr
      FROM n
    ),
    h AS (
      SELECT doc_id, source,
             CAST(concat('0x',
                  substr(md5(concat('mix:', CAST(doc_id AS VARCHAR))), 1, 6))
                  AS BIGINT) AS h
      FROM documents
    )
    SELECT h.doc_id, h.source, h.h
    FROM h JOIN t USING (source)
    WHERE h.h < t.thr
    """,
    tags="O6 O11 F9",
)
def sample_mixture_hash_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11: hash-threshold mixture sampling — the WINDOW-FREE scale
    path that `sample_temperature_by_lang`'s docstring points at.
    Target mixture over `source` is exponent-smoothed (alpha = 0.5,
    the multilingual-LM mixing rule) toward a 200-document budget:
    per-source acceptance threshold thr_s = floor(B * w_s * H /
    (S * n_s)) with w_s = isqrt(n_s), S = sum(w_s), H = 16^6; a
    document is kept iff the first 6 hex digits of a salted md5 of
    its id fall below its source's threshold. EVERY quantity is
    integer (isqrt = floor of the IEEE-exact sqrt, BIGINT floor-div),
    so the accepted set is bit-identical across engines, runs, and
    reshards — no window, no per-group rank, no skew point: the plan
    is one tiny per-source aggregate broadcast onto a pure row-local
    filter. At 100 TB the per-doc cost is one md5 and one broadcast
    probe; thresholds stay exact because B*w_s*H <= 2e14 << 2^63.
    Reference surface: karna README data-selection claims
    (/root/reference/README.md:2); mixing rule per XLM-R (public).
    """
    docs = table(spark, sf_dir, "documents")
    n = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn("w", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint"))
    )
    sw = n.agg(F.sum("w").cast("bigint").alias("sw"))
    thr = n.crossJoin(F.broadcast(sw)).select(
        "source",
        F.least(
            F.expr("(200 * w * 16777216) DIV (sw * n_docs)"),
            F.lit(16777216).cast("bigint"),
        ).alias("thr"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select("doc_id", "source")
        .withColumn("h", h)
        .join(F.broadcast(thr), "source")
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "source", "h")
    )


@register_query(
    "text_boilerplate_strip",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    s AS (
      SELECT doc_id, g,
             array_to_string(arr[g*2+1 : g*2+2], ' ') AS seg
      FROM (SELECT doc_id, arr,
                   unnest(range(0, (len(arr)+1)//2)) AS g
            FROM d)
    ),
    boiler AS (
      SELECT seg FROM s GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= 25
    ),
    kept AS (
      SELECT * FROM s WHERE seg NOT IN (SELECT seg FROM boiler)
    ),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_segs FROM s GROUP BY doc_id
    ),
    reb AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_kept,
             string_agg(seg, ' ' ORDER BY g) AS cleaned_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segs,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.cleaned_text, '') AS cleaned_text
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    tags="F9 F24",
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24: cross-document boilerplate removal (the CCNet paragraph-
    hash dedup, with deterministic fixed-width segmentation since the
    fixture corpus has no newlines): chunk each document into
    non-overlapping 2-word segments, compute each segment's document
    frequency, strip segments appearing in >= 25 DISTINCT documents
    (headers/footers/nav chrome in a real crawl), and reassemble the
    surviving segments in order — emitting per-doc segment counts and
    the cleaned text itself so the check certifies content, not just
    counts. Plan: one explode -> (seg, doc) distinct -> tiny
    boilerplate set BROADCAST into a left_anti probe (no shuffle of
    the corpus against the set), then one per-doc groupBy whose
    array_sort(collect_list(struct(g, seg))) rebuilds order without
    a window. At 100 TB the exploded-segment aggregate is the same
    shape as the certified posting-gram ops (queries/dedup.py) and
    the boilerplate set stays broadcastable BY CONSTRUCTION — high-df
    segments are few (df >= K caps the set at n_segs/K). A doc whose
    every segment is boilerplate survives as an empty cleaned_text
    row (left join from totals), matching CCNet's drop-then-audit.
    """
    from karna_spark.operators.text import words

    docs = spread_scan(table(spark, sf_dir, "documents"))
    ws = words(F.lower(F.trim(F.col("text"))))
    segs = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(ws) - 1) / F.lit(2)).cast("int")
        ),
        lambda g: F.concat_ws(" ", F.slice(ws, g * 2 + 1, 2)),
    )
    from pyspark.storagelevel import StorageLevel

    # Persist the segment explosion once — three consumers (df counts,
    # the anti-probe, per-doc totals) would otherwise each re-scan and
    # re-split the corpus text (the _posting_grams pattern; count()
    # pins the cache before the plan fans out, caller releases via the
    # _karna_persisted contract).
    seg_rows = docs.select(
        "doc_id", F.posexplode(segs).alias("g", "seg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    seg_rows.count()
    boiler = (
        seg_rows.select("seg", "doc_id")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 25)
        .select("seg")
    )
    # |boiler| ≤ n_segs/25 by the df cap — broadcastable at fixture and
    # typical-crawl scale. If a 100 TB crawl's boilerplate set ever
    # outgrew the broadcast limit, drop this hint and let AQE pick a
    # shuffled join; semantics are unchanged.
    kept = seg_rows.join(F.broadcast(boiler), "seg", "left_anti")
    tot = seg_rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segs")
    )
    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("cleaned_text"),
    )
    out = tot.join(reb, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )
    out._karna_persisted = [seg_rows]  # type: ignore[attr-defined]
    return out


@register_query(
    "text_duplicate_span_scrub",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS s, i + 7 AS e,
             array_to_string(arr[i : i + 7], ' ') AS g
      FROM d, unnest(generate_series(1, len(arr) - 7)) t(i)
      WHERE len(arr) >= 8
    ),
    dup AS (
      SELECT g FROM grams GROUP BY g
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT doc_id, s, e FROM grams WHERE g IN (SELECT g FROM dup)
    ),
    ordered AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM hits
    ),
    islands AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
      FROM ordered
    ),
    merged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e
      FROM islands GROUP BY doc_id, grp
    ),
    positions AS (
      SELECT d.doc_id, pos, arr[pos] AS word, len(arr) AS n
      FROM d, unnest(generate_series(1, len(arr))) t(pos)
    ),
    kept AS (
      SELECT p.doc_id,
             CAST(count(*) AS INT) AS n_kept,
             string_agg(p.word, ' ' ORDER BY p.pos) AS cleaned_text
      FROM positions p
      WHERE NOT EXISTS (SELECT 1 FROM merged m
                        WHERE m.doc_id = p.doc_id
                          AND p.pos BETWEEN m.s AND m.e)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           COALESCE(k.cleaned_text, '') AS cleaned_text,
           CAST(len(d.arr) - COALESCE(k.n_kept, 0) AS INT) AS n_removed
    FROM d LEFT JOIN kept k USING (doc_id)
    """,
    tags="F9 F25",
)
def text_duplicate_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F25: exact duplicated-span scrub — the ExactSubstr dedup of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"), reformulated for Spark: any 8-token span that
    appears in >= 2 DISTINCT documents is memorization fuel; every
    occurrence is removed from every document (overlapping hits are
    interval-merged per doc first), and the surviving tokens are
    reassembled in order. Emits the cleaned text so the driver hash
    certifies content. The paper's suffix array is a single-machine
    structure; the Spark-native equivalent is the sliding k-gram
    frame: token positions come from one `transform(sequence)` over
    the split array (JVM-side, no UDF), duplicate detection is a
    two-phase aggregate — an xxhash64 PREFILTER so the corpus-scale
    shuffle carries 8-byte keys instead of 8-word strings, then an
    EXACT string confirm over only the surviving candidates (hash
    collisions cannot leak through; semantics stay string-exact,
    matching the oracle) — and span removal is a per-doc
    `filter(ws, (w, i) -> ...)` against the interval-merged hit
    list, folded with `aggregate()` (no second explode, no window
    over data-scale frames). At 100 TB: the gram explosion dominates
    (~|tokens| rows) but shuffles only (hash, doc_id) pairs;
    candidate confirm + interval work touch duplicated spans only.
    Provenance: NORTH-STAR training-data curation operator (ExactSubstr,
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better") — not a declared reference surface.
    """
    from pyspark.storagelevel import StorageLevel

    from karna_spark.operators.text import words

    K = 8
    docs = spread_scan(table(spark, sf_dir, "documents"))
    ws = words(F.lower(F.trim(F.col("text"))))
    # PERSISTED (r13): base feeds the gram explosion AND the final
    # reassembly join — uncached, the spread exchange plus the word
    # split ran twice per run (once per consumer). The cache holds
    # (doc_id, text, ws) — one corpus pass's projection, the same
    # MEMORY_AND_DISK posture as minhash's src cache.
    base = docs.select("doc_id", "text", ws.alias("ws")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = F.size(F.col("ws"))
    # (doc_id, s 1-based, g) for every K-token window; persisted once
    # (dup detection + hit projection consume it; the _posting_grams
    # pattern, released via the _karna_persisted contract).
    grams = (
        base.filter(n >= K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n - (K - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, K)),
                )
            ).alias("off", "g"),
        )
        .select(
            "doc_id",
            (F.col("off") + 1).cast("int").alias("s"),
            "g",
            F.xxhash64("g").alias("h"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    grams.count()
    # Phase 1: hash-level df — the only corpus-scale shuffle, 8-byte keys.
    cand_h = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("cd"))
        .filter(F.col("cd") >= 2)
        .select("h")
    )
    # Phase 2: exact confirm on the candidate slice only.
    cand = grams.join(cand_h, "h", "left_semi")
    dup_g = (
        cand.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("cd"))
        .filter(F.col("cd") >= 2)
        .select("g")
    )
    hits = cand.join(dup_g, "g", "left_semi").select(
        "doc_id", "s", (F.col("s") + (K - 1)).alias("e")
    )
    from karna_spark.operators.text import MERGE_INTERVALS_EXPR, drop_spans

    merged = hits.groupBy("doc_id").agg(
        F.expr(MERGE_INTERVALS_EXPR).alias("spans")
    )
    kept_ws = drop_spans(F.col("ws"), F.col("spans"))
    out = base.join(merged, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("spans").isNull(), F.concat_ws(" ", F.col("ws")))
        .otherwise(F.concat_ws(" ", kept_ws))
        .alias("cleaned_text"),
        F.when(F.col("spans").isNull(), F.lit(0))
        .otherwise(n - F.size(kept_ws))
        .cast("int")
        .alias("n_removed"),
    )
    out._karna_persisted = [grams, base]  # type: ignore[attr-defined]
    return out


@register_query(
    "text_bigram_logprob",
    oracle="""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents
    ),
    bg AS (
      SELECT doc_id, arr[i] AS w1, arr[i] || ' ' || arr[i+1] AS bigram
      FROM d, unnest(generate_series(1, len(arr) - 1)) t(i)
      WHERE len(arr) >= 2
    ),
    c2 AS (
      SELECT w1, bigram, COUNT(*) AS cnt FROM bg GROUP BY w1, bigram
    ),
    ctx AS (
      SELECT w1, SUM(cnt) AS cw1 FROM c2 GROUP BY w1
    ),
    vsize AS (
      SELECT COUNT(DISTINCT word) AS V FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents)
    ),
    q AS (
      SELECT c2.bigram,
             CAST(round(ln((c2.cnt + 1)::DOUBLE / (ctx.cw1 + vsize.V))
                        * 1000000) AS BIGINT) AS lp_e6
      FROM c2 JOIN ctx USING (w1), vsize
    ),
    per_doc AS (
      SELECT bg.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(-q.lp_e6) AS BIGINT) AS nll_e6
      FROM bg JOIN q USING (bigram)
      GROUP BY bg.doc_id
    )
    SELECT CAST(floor(nll_e6::DOUBLE * 10 / (n_bigrams * 1000000)) AS BIGINT)
             AS nll_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
           CAST(SUM(nll_e6) AS BIGINT) AS sum_nll_e6
    FROM per_doc
    GROUP BY 1
    """,
    tags="F9 A1 F2 F26",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F26: CCNet-style LM quality scoring, bigram edition — the
    context-aware upgrade over `text_unigram_logprob` (a KenLM stand-
    in trained on the corpus itself): Laplace-smoothed bigram model
    P(w2|w1) = (C(w1,w2)+1) / (Cctx(w1)+V), each document scored by
    its average per-bigram negative log-likelihood, documents
    histogrammed by DECI-nat bucket (CCNet's head/middle/tail split
    at a granularity that separates this corpus).
    Same exactness discipline as the unigram query: ln() fires once
    per DISTINCT bigram, micro-nat quantized to BIGINT, so every
    cross-row reduction is exact integer arithmetic and summation
    order can't drift the hash. Plan: the bigram frame comes from one
    transform(sequence) (JVM, no second explode pass); model counts
    are two-phase aggregates at |distinct-bigram| scale; the model
    broadcast-joins back onto occurrences (vocab² upper bound but
    df-weighted actual size ≪ corpus; AQE falls back to shuffle past
    the threshold). Context counts derive from the bigram table
    itself (sum over w2), keeping the model self-consistent without a
    second corpus pass."""
    from karna_spark.operators.text import words

    docs = table(spark, sf_dir, "documents")
    ws = words(F.trim(F.col("text")))
    base = docs.select("doc_id", ws.alias("ws"))
    n = F.size(F.col("ws"))
    bg = base.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("w1"),
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("ws"), i),
                        F.element_at(F.col("ws"), i + 1),
                    ).alias("bigram"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.bigram").alias("bigram"))
    c2 = bg.groupBy("w1", "bigram").agg(F.count("*").alias("cnt"))
    ctx = c2.groupBy("w1").agg(F.sum("cnt").alias("cw1"))
    vsize = (
        docs.select(F.explode(ws).alias("word"))
        .agg(F.countDistinct("word").alias("V"))
    )
    q = (
        c2.join(ctx, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "bigram",
            F.round(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("cw1") + F.col("V"))
                )
                * 1000000
            )
            .cast("bigint")
            .alias("lp_e6"),
        )
    )
    per_doc = (
        bg.join(F.broadcast(q), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(-F.col("lp_e6")).alias("nll_e6"),
        )
    )
    return per_doc.groupBy(
        F.floor(
            F.col("nll_e6").cast("double")
            * 10
            / (F.col("n_bigrams") * 1000000)
        )
        .cast("bigint")
        .alias("nll_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
        F.sum("nll_e6").cast("bigint").alias("sum_nll_e6"),
    )


@register_query(
    "text_intradoc_span_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS s, i + 2 AS e,
             array_to_string(arr[i : i + 2], ' ') AS g
      FROM d, unnest(generate_series(1, len(arr) - 2)) t(i)
      WHERE len(arr) >= 3
    ),
    firsts AS (
      SELECT doc_id, g, min(s) AS first_s FROM grams GROUP BY doc_id, g
    ),
    hits AS (
      SELECT gr.doc_id, gr.s, gr.e
      FROM grams gr JOIN firsts f
        ON gr.doc_id = f.doc_id AND gr.g = f.g
      WHERE gr.s > f.first_s
    ),
    ordered AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM hits
    ),
    islands AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
      FROM ordered
    ),
    merged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e
      FROM islands GROUP BY doc_id, grp
    ),
    positions AS (
      SELECT d.doc_id, pos, arr[pos] AS word
      FROM d, unnest(generate_series(1, len(arr))) t(pos)
    ),
    kept AS (
      SELECT p.doc_id,
             CAST(count(*) AS INT) AS n_kept,
             string_agg(p.word, ' ' ORDER BY p.pos) AS cleaned_text
      FROM positions p
      WHERE NOT EXISTS (SELECT 1 FROM merged m
                        WHERE m.doc_id = p.doc_id
                          AND p.pos BETWEEN m.s AND m.e)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           COALESCE(k.cleaned_text, '') AS cleaned_text,
           CAST(len(d.arr) - COALESCE(k.n_kept, 0) AS INT) AS n_removed
    FROM d LEFT JOIN kept k USING (doc_id)
    """,
    tags="F9 F27",
)
def text_intradoc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F27: INTRA-document duplicated-span removal — the self-dedup
    complement of F25 (RefinedWeb strips within-page repetition before
    any cross-doc pass): any 3-token span whose exact text already
    occurred EARLIER in the same document is removed (first occurrence
    kept), later occurrences interval-merged per doc and the survivors
    reassembled. Unlike F25 there is no corpus-scale duplicate
    aggregate at all: first-occurrence detection is a (doc_id, gram)
    min-start aggregate whose shuffle key CONTAINS doc_id, so with the
    gram frame already partitioned by document the whole operator is a
    per-document computation — embarrassingly parallel at 100 TB, no
    cross-document traffic. Shares the gram/interval-merge/rebuild
    machinery with F25 (`operators/text.py: MERGE_INTERVALS_EXPR`,
    `drop_spans`); hash certifies the cleaned text."""
    from karna_spark.operators.text import (
        MERGE_INTERVALS_EXPR,
        drop_spans,
        words,
    )

    K = 3  # fixture-scaled: the synthetic docs are short word soup;
    # production crawls use ~50-token spans — K parametrizes freely.
    docs = table(spark, sf_dir, "documents")
    ws = words(F.lower(F.trim(F.col("text"))))
    base = docs.select("doc_id", ws.alias("ws"))
    n = F.size(F.col("ws"))
    grams = (
        base.filter(n >= K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n - (K - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, K)),
                )
            ).alias("off", "g"),
        )
        .select("doc_id", (F.col("off") + 1).cast("int").alias("s"), "g")
    )
    firsts = grams.groupBy("doc_id", "g").agg(F.min("s").alias("first_s"))
    hits = (
        grams.join(firsts, ["doc_id", "g"])
        .filter(F.col("s") > F.col("first_s"))
        .select("doc_id", "s", (F.col("s") + (K - 1)).alias("e"))
    )
    merged = hits.groupBy("doc_id").agg(
        F.expr(MERGE_INTERVALS_EXPR).alias("spans")
    )
    kept_ws = drop_spans(F.col("ws"), F.col("spans"))
    return base.join(merged, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("spans").isNull(), F.concat_ws(" ", F.col("ws")))
        .otherwise(F.concat_ws(" ", kept_ws))
        .alias("cleaned_text"),
        F.when(F.col("spans").isNull(), F.lit(0))
        .otherwise(n - F.size(kept_ws))
        .cast("int")
        .alias("n_removed"),
    )


@register_query(
    "multimodal_audio_spectral",
    oracle="""
    SELECT doc_id AS item_id,
           CAST(256 AS INT) AS n_frames,
           CAST(3 + doc_id % 29 AS INT) AS dominant_bin
    FROM documents WHERE doc_id % 5 = 0
    """,
    tags="U2 F2 V6",
)
def multimodal_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio FEATURE EXTRACTION, certified end to end: each
    item synthesizes a 256-frame 16-bit PCM WAV holding an
    integer-cycle sine whose frequency bin is a closed-form function
    of the id (encode_wav_tone — exactly ``3 + id % 29`` cycles per
    clip, zero spectral leakage), and the extractor
    (operators/multimodal.py: audio_dominant_bin) parses the PCM and
    runs a REAL numpy FFT per clip inside Arrow-batched mapInPandas —
    bytes never visit the driver, per-batch memory bounded by the
    file-split size. The driver hash matches the FFT's argmax bin
    against the oracle's closed form, so the whole decode → DSP →
    feature path is certified, not stubbed — the shape a 100 TB
    audio-curation pipeline runs, with the codec swapped for a real
    one when the decode libs exist."""
    from karna_spark.operators.multimodal import (
        audio_dominant_bin,
        encode_wav_tone,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("item_id"))
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media": [
                        encode_wav_tone(256, 3 + int(i) % 29)
                        for i in pdf["item_id"]
                    ],
                }
            )

    tones = ids.mapInPandas(synth, "item_id long, media binary")
    return audio_dominant_bin(tones).select(
        "item_id", "n_frames", "dominant_bin"
    )


# ---------------------------------------------------------------- O12
@register_query(
    "sample_dsir_importance",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             (source = 'src0' AND lang = 'en') AS is_t,
             CAST(concat('0x', substr(md5(u.word), 1, 2)) AS BIGINT) AS b
      FROM d, unnest(arr) AS u(word)
    ),
    c AS (
      SELECT b,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tcnt,
             CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS rcnt
      FROM w GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(tcnt) AS BIGINT) AS t_total,
             CAST(SUM(rcnt) AS BIGINT) AS r_total
      FROM c
    ),
    lam AS (
      SELECT b,
             CAST(ROUND(LN((tcnt + 1) / CAST(t_total + 256 AS DOUBLE))
                        * 1000000) AS BIGINT)
           - CAST(ROUND(LN((rcnt + 1) / CAST(r_total + 256 AS DOUBLE))
                        * 1000000) AS BIGINT) AS lam
      FROM c, tot
    ),
    s AS (
      SELECT w.doc_id, CAST(SUM(lam.lam) AS BIGINT) AS score_e6
      FROM w JOIN lam USING (b)
      WHERE NOT w.is_t
      GROUP BY w.doc_id
    )
    SELECT doc_id, score_e6
    FROM s ORDER BY score_e6 DESC, doc_id LIMIT 100
    """,
    tags="O12 O6 F9",
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: DSIR — Data Selection via Importance Resampling (Xie et
    al. 2023, the public pretraining-curation recipe): score every
    raw-pool document by how much its hashed-unigram bag looks drawn
    from the TARGET distribution (here: the curated src0/en slice)
    rather than the raw pool, then keep the top-100. Features are
    hashed into 256 buckets (first md5 byte — the paper's hashed
    n-gram trick, which fixes model size at B regardless of vocabulary
    so the λ table BROADCASTS at any corpus scale); per-bucket
    Laplace-smoothed log-ratios λ_b = ln p_target(b) − ln p_raw(b) in
    round-quantized micro-nats (the certified F26 recipe — each ln
    term rounded identically in both engines, then exact BIGINT
    algebra), a document's log importance weight is the exact integer
    sum of λ over its word occurrences. Plan shape: the word explode
    is per-doc local and consumed twice (counts + scoring) off one
    lazy localCheckpoint; the counts aggregate map-combines to ≤256
    rows per task; scoring is a broadcast-λ probe + doc_id-keyed sum;
    selection is TakeOrdered (per-partition top-k, driver merges
    100·partitions rows) — no global sort, no window, no UDF. At
    100 TB the target stays small by definition and everything
    data-scale is embarrassingly parallel. Deterministic ties
    (score desc, doc_id asc) make the selected set bit-identical."""
    docs = table(spark, sf_dir, "documents")
    from karna_spark.operators.text import words

    is_t = (F.col("source") == "src0") & (F.col("lang") == "en")
    w = (
        docs.select(
            "doc_id",
            is_t.alias("is_t"),
            F.explode(words(F.lower(F.trim(F.col("text"))))).alias("word"),
        )
        .select(
            "doc_id",
            "is_t",
            F.conv(F.substring(F.md5(F.col("word")), 1, 2), 16, 10)
            .cast("bigint")
            .alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    # ≤256 rows but TWO consumers (totals + lambda) — checkpoint so
    # the corpus-scale bucket aggregate runs once, not twice.
    c = w.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("bigint").alias("tcnt"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).cast("bigint").alias("rcnt"),
    ).localCheckpoint(eager=False)
    tot = c.agg(
        F.sum("tcnt").cast("bigint").alias("t_total"),
        F.sum("rcnt").cast("bigint").alias("r_total"),
    )
    lam = c.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.round(
                F.log(
                    (F.col("tcnt") + 1).cast("double")
                    / (F.col("t_total") + 256)
                )
                * 1000000
            ).cast("bigint")
            - F.round(
                F.log(
                    (F.col("rcnt") + 1).cast("double")
                    / (F.col("r_total") + 256)
                )
                * 1000000
            ).cast("bigint")
        ).alias("lam"),
    )
    scores = (
        w.filter(~F.col("is_t"))
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.sum("lam").cast("bigint").alias("score_e6"))
    )
    return scores.orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    ).limit(100)


# ---------------------------------------------------------------- V9
@register_query(
    "multimodal_video_frames",
    oracle="""
    WITH clips AS (
      SELECT CAST(doc_id AS BIGINT) AS c, CAST(10 + doc_id % 5 AS INT) AS nf
      FROM documents WHERE doc_id % 25 = 0
    ),
    fr AS (
      SELECT c, nf, CAST(f.f AS INT) AS frame_no
      FROM clips, unnest(generate_series(0, nf - 1, 3)) AS f(f)
    )
    SELECT c AS item_id, nf AS n_frames, frame_no,
           CAST((SELECT SUM(CAST((c*31 + frame_no*7 + j.j*13) % 256 AS BIGINT)
                            << (8 * j.j))
                 FROM unnest(generate_series(0, 6)) AS j(j)) AS BIGINT) AS fp7
    FROM fr
    """,
    tags="V9 U2 U3 S22",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9: video-container frame extraction — synthesize a real (if
    trivially coded) RVID clip per selected document (10-byte header +
    n_frames raw 16×16 grayscale frames, bytes deterministic in
    (clip, frame, offset)), ship the binary column through
    Arrow-batched mapInPandas, parse the header, and seek every 3rd
    frame BY COMPUTED OFFSET — unsampled frames are never
    materialized, the access pattern a keyframe-striding video
    pipeline needs. Each sampled frame emits fp7 (first 7 frame bytes
    as a little-endian integer), so the oracle's closed-form replay of
    the byte formula certifies header parse, stride arithmetic, AND
    that every seek landed on the exact bytes. Codec is a stand-in the
    way BMP/PPM stand in for JPEG/PNG; the container/seek/batch
    plumbing is the real, scale-relevant part (bytes stay
    executor-side, 1→N expansion inside the Arrow batch)."""
    import pandas as pd

    from karna_spark.operators.multimodal import (
        encode_video_raw,
        video_frame_features,
    )

    clips = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 25 == 0)
        .select(F.col("doc_id").cast("bigint").alias("item_id"))
    )

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media": [
                        encode_video_raw(int(c), 10 + int(c) % 5)
                        for c in pdf["item_id"]
                    ],
                }
            )

    media = clips.mapInPandas(synth, "item_id long, media binary")
    return video_frame_features(media, stride=3)


@register_query(
    "text_url_domain_stats",
    oracle="""
    WITH u AS (
        SELECT doc_id, n_chars,
            CASE doc_id % 5 WHEN 0 THEN 'example.com'
                            WHEN 1 THEN 'data.co.uk'
                            WHEN 2 THEN 'archive.org'
                            WHEN 3 THEN 'news.com.au'
                            ELSE 'web-corpus.net' END AS dom,
            CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.'
                            ELSE 'cdn.assets.' END AS sub,
            CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
            CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END AS keep_port,
            '/P/' || CAST(doc_id AS VARCHAR) AS path,
            CASE WHEN doc_id % 2 = 1
                 THEN '?q=' || CAST(doc_id % 11 AS VARCHAR)
                 ELSE '' END AS qs
        FROM documents
    ),
    n AS (
        SELECT doc_id,
               n_chars,
               scheme || '://' || sub || dom || keep_port || path || qs
                   AS url_norm,
               dom AS domain
        FROM u
        UNION ALL
        SELECT doc_id, n_chars,
               'https://' || sub || dom || '/ALT/' || CAST(doc_id AS VARCHAR)
                   AS url_norm,
               dom AS domain
        FROM u WHERE doc_id % 6 = 0
    ),
    d AS (
        SELECT domain,
               count(*) AS n_urls,
               count(DISTINCT doc_id) AS n_docs,
               ROUND(avg(n_chars), 4) AS avg_chars
        FROM n GROUP BY domain
    )
    SELECT n.doc_id, n.url_norm, n.domain, d.n_urls, d.n_docs, d.avg_chars
    FROM n JOIN d USING (domain)
    """,
    tags="F29",
)
def text_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F29: URL normalization + registered-domain curation
    (operators/urls.py — the domain-level gate crawl pipelines run
    before any text scoring). Each document gets a deterministic
    synthetic crawl URL whose RAW form carries the noise a real
    frontier sees — mixed-case scheme and host, default :443 ports,
    fragments — and the engine normalizes it (lower scheme/host, strip
    default port and fragment, preserve case-sensitive path/query),
    extracts the registered domain through the multi-label
    public-suffix rule (data.co.uk stays data.co.uk; cdn.assets
    subdomains collapse to their registrable parent), and joins
    per-domain reputation stats back onto every URL row. The oracle
    derives the SAME canonical forms independently from the generation
    parameters — it never runs the normalizer — so the hash certifies
    the parser against ground truth, not against a replay. All JVM
    string/array expressions: row-local until the |domains|-row
    map-combined aggregate, no UDF, no window — unchanged at 100 TB."""
    from karna_spark.operators.urls import domain_stats, registered_domain, url_host, url_normalize

    doc = F.col("doc_id")
    dom = F.element_at(
        F.array(*[F.lit(x) for x in [
            "example.com", "data.co.uk", "archive.org",
            "news.com.au", "web-corpus.net",
        ]]),
        (doc % 5 + 1).cast("int"),
    )
    sub = F.element_at(
        F.array(F.lit(""), F.lit("www."), F.lit("cdn.assets.")),
        (doc % 3 + 1).cast("int"),
    )
    host_raw = F.concat(sub, dom)
    host_raw = F.when(doc % 7 == 0, F.upper(host_raw)).otherwise(host_raw)
    scheme = F.when(doc % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP"))
    port = (
        F.when(doc % 4 == 0, F.lit(":443"))
        .when(doc % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(F.lit("/P/"), doc.cast("string"))
    qs = F.when(
        doc % 2 == 1, F.concat(F.lit("?q="), (doc % 11).cast("string"))
    ).otherwise(F.lit(""))
    frag = F.when(doc % 3 == 0, F.lit("#Top")).otherwise(F.lit(""))
    raw = F.concat(scheme, F.lit("://"), host_raw, port, path, qs, frag)
    # A second crawl record for every 6th doc (same site, different
    # page): n_urls > n_docs for those domains, so the hash certifies
    # the DISTINCT doc count, not just row counts.
    raw_alt = F.concat(
        F.lit("HTTPS://"), host_raw, F.lit(":443/ALT/"), doc.cast("string")
    )
    # r13: spread_scan on the shared base scan MEASURED AND REVERTED
    # (verdict item 8 protocol) — the URL synthesis is cheap string
    # concat and the two branches pay the round-robin exchange twice
    # (no shared cache), ABBA medians 0.91 s plain vs 1.15 s spread.
    # The heavy part (domain_stats agg + broadcast join) already
    # parallelizes off the union's shuffle.
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", raw.alias("url")
    )
    alts = (
        table(spark, sf_dir, "documents")
        .filter(doc % 6 == 0)
        .select("doc_id", "n_chars", raw_alt.alias("url"))
    )
    urls = (
        docs.unionByName(alts)
        .withColumn("url_norm", url_normalize(F.col("url")))
        .withColumn("domain", registered_domain(url_host(F.col("url"))))
    )
    stats = domain_stats(urls, "url", "doc_id", "n_chars").withColumnRenamed(
        "avg_quality", "avg_chars"
    )
    return urls.join(F.broadcast(stats), "domain").select(
        "doc_id", "url_norm", "domain", "n_urls", "n_docs", "avg_chars"
    )


@register_query(
    "text_stupid_backoff_logprob",
    oracle="""
    WITH d0 AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents
    ),
    train AS (SELECT * FROM d0 WHERE doc_id % 2 = 0),
    scored AS (
      SELECT doc_id,
             list_concat(arr, [
               'z' || CAST(doc_id % 7 AS VARCHAR), arr[1]
             ]) AS arr
      FROM d0 WHERE doc_id % 2 = 1
    ),
    bg_t AS (
      SELECT arr[i] AS w1, arr[i] || ' ' || arr[i+1] AS bigram
      FROM train, unnest(generate_series(1, len(arr) - 1)) t(i)
      WHERE len(arr) >= 2
    ),
    c2 AS (SELECT w1, bigram, COUNT(*) AS cnt FROM bg_t GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(cnt) AS cw1 FROM c2 GROUP BY 1),
    uni AS (
      SELECT word, COUNT(*) AS ucnt FROM (
        SELECT unnest(arr) AS word FROM train) GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(ucnt) AS BIGINT) AS N,
             CAST(COUNT(*) AS BIGINT) AS V
      FROM uni
    ),
    bg_s AS (
      SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2,
             arr[i] || ' ' || arr[i+1] AS bigram
      FROM scored, unnest(generate_series(1, len(arr) - 1)) t(i)
      WHERE len(arr) >= 2
    ),
    model AS (
      SELECT s.bigram,
             CAST(round(CASE
               WHEN c2.cnt IS NOT NULL
                 THEN ln(c2.cnt::DOUBLE / ctx.cw1)
               WHEN uni.ucnt IS NOT NULL
                 THEN ln(0.4 * uni.ucnt::DOUBLE / tot.N)
               ELSE ln(0.4 / (tot.N + tot.V))
             END * 1000000) AS BIGINT) AS lp_e6
      FROM (SELECT DISTINCT w1, w2, bigram FROM bg_s) s
      LEFT JOIN c2 USING (bigram)
      LEFT JOIN ctx ON s.w1 = ctx.w1
      LEFT JOIN uni ON s.w2 = uni.word, tot
    ),
    per_doc AS (
      SELECT bg_s.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(-model.lp_e6) AS BIGINT) AS nll_e6
      FROM bg_s JOIN model USING (bigram)
      GROUP BY 1
    )
    SELECT CAST(floor(nll_e6::DOUBLE * 10 / (n_bigrams * 1000000)) AS BIGINT)
             AS nll_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
           CAST(SUM(nll_e6) AS BIGINT) AS sum_nll_e6
    FROM per_doc
    GROUP BY 1
    """,
    tags="F30",
)
def text_stupid_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F30: stupid-backoff LM scoring on a HELD-OUT split (Brants
    2007, the web-scale recipe) — the methodological upgrade over
    F26's self-scored Laplace model: the model trains on even doc_ids
    (raw MLE bigram, no smoothing) and scores odd doc_ids, backing
    off to 0.4 x unigram for unseen bigrams and to an OOV floor
    0.4/(N+V) for unseen words — held-out scoring is what real
    pipelines run (a Wikipedia-trained model over the crawl). Each
    scored doc carries two planted tokens (a doc_id%7-derived z-token
    then the doc's first word) so BOTH backoff branches provably fire
    on every doc: (last_word, z_k) is an unseen bigram with an unseen
    w2 (OOV floor) and (z_k, first_word) an unseen bigram with a SEEN
    w2 (unigram backoff). Exactness: one ln() per DISTINCT scored
    bigram, micro-nat BIGINT quantization, integer reductions —
    summation order can't drift the hash. Plan: train-side counts are
    two-phase aggregates at |distinct-bigram|/|vocab| scale; the
    scored-bigram model joins back by broadcast (df-weighted size ≪
    corpus; at crawl scale drop the hint and AQE picks SMJ); the 1-row
    (N, V) totals ride a scalar broadcast (BNLJ_OK)."""
    from karna_spark.operators.text import words

    d0 = spread_scan(table(spark, sf_dir, "documents")).select(
        "doc_id", words(F.trim(F.col("text"))).alias("arr")
    )
    train = d0.filter(F.col("doc_id") % 2 == 0)
    scored = d0.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.concat(
            F.col("arr"),
            F.array(
                F.concat(F.lit("z"), (F.col("doc_id") % 7).cast("string")),
                F.element_at(F.col("arr"), 1),
            ),
        ).alias("arr"),
    )

    def bigrams(df, with_doc):
        n = F.size(F.col("arr"))
        cols = (["doc_id"] if with_doc else []) + [
            F.col("b.w1").alias("w1"),
            F.col("b.w2").alias("w2"),
            F.col("b.bigram").alias("bigram"),
        ]
        return (
            df.filter(n >= 2)
            .select(
                *(["doc_id"] if with_doc else []),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("arr"), i).alias("w1"),
                            F.element_at(F.col("arr"), i + 1).alias("w2"),
                            F.concat_ws(
                                " ",
                                F.element_at(F.col("arr"), i),
                                F.element_at(F.col("arr"), i + 1),
                            ).alias("bigram"),
                        ),
                    )
                ).alias("b"),
            )
            .select(*cols)
        )

    bg_t = bigrams(train, with_doc=False)
    c2 = bg_t.groupBy("w1", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = c2.groupBy("w1").agg(F.sum("cnt").alias("cw1"))
    uni = (
        train.select(F.explode("arr").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("ucnt"))
    )
    tot = uni.agg(
        F.sum("ucnt").cast("bigint").alias("N"),
        F.count(F.lit(1)).cast("bigint").alias("V"),
    )
    bg_s = bigrams(scored, with_doc=True)
    dist = bg_s.select("w1", "w2", "bigram").distinct()
    model = (
        dist.join(c2.select("bigram", "cnt"), "bigram", "left")
        .join(ctx, "w1", "left")
        .join(uni.withColumnRenamed("word", "w2"), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            F.round(
                F.when(
                    F.col("cnt").isNotNull(),
                    F.log(F.col("cnt").cast("double") / F.col("cw1")),
                )
                .when(
                    F.col("ucnt").isNotNull(),
                    F.log(F.lit(0.4) * F.col("ucnt").cast("double") / F.col("N")),
                )
                .otherwise(F.log(F.lit(0.4) / (F.col("N") + F.col("V"))))
                * 1000000
            )
            .cast("bigint")
            .alias("lp_e6"),
        )
    )
    per_doc = (
        bg_s.join(F.broadcast(model), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(-F.col("lp_e6")).alias("nll_e6"),
        )
    )
    return per_doc.groupBy(
        F.floor(
            F.col("nll_e6").cast("double") * 10 / (F.col("n_bigrams") * 1000000)
        )
        .cast("bigint")
        .alias("nll_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").cast("bigint").alias("total_bigrams"),
        F.sum("nll_e6").cast("bigint").alias("sum_nll_e6"),
    )


# ---------------------------------------------------------------- F31
@register_query(
    "text_lang_id_classifier",
    oracle="""
    WITH d AS (SELECT doc_id, lower(trim(text)) AS t, lang FROM documents),
    tr AS (SELECT * FROM d WHERE doc_id % 2 = 0),
    te AS (SELECT * FROM d WHERE doc_id % 2 = 1),
    trbg AS (
      SELECT lang, substr(t, i, 2) AS bg
      FROM tr, unnest(generate_series(1, length(t) - 1)) u(i)
      WHERE length(t) >= 2
    ),
    cnt AS (SELECT lang, bg, CAST(COUNT(*) AS BIGINT) AS c
            FROM trbg GROUP BY 1, 2),
    tot AS (SELECT lang, SUM(c) AS tot FROM cnt GROUP BY 1),
    vv AS (SELECT CAST(COUNT(DISTINCT bg) AS BIGINT) AS v FROM cnt),
    model AS (
      SELECT t.lang, vb.bg,
             CAST(round(ln((COALESCE(c.c, 0) + 1)::DOUBLE / (t.tot + vv.v))
                        * 1000000) AS BIGINT) AS lp_e6
      FROM (SELECT DISTINCT bg FROM cnt) vb CROSS JOIN tot t CROSS JOIN vv
      LEFT JOIN cnt c ON c.bg = vb.bg AND c.lang = t.lang
    ),
    floors AS (
      SELECT lang, CAST(round(ln(1.0 / (tot + vv.v)) * 1000000) AS BIGINT)
               AS floor_e6
      FROM tot, vv
    ),
    tebg AS (
      SELECT doc_id, lang AS lang_true, substr(t, i, 2) AS bg
      FROM te, unnest(generate_series(1, length(t) - 1)) u(i)
      WHERE length(t) >= 2
    ),
    bag AS (SELECT doc_id, lang_true, bg, CAST(COUNT(*) AS BIGINT) AS n
            FROM tebg GROUP BY 1, 2, 3),
    scored AS (
      SELECT b.doc_id, b.lang_true, f.lang,
             CAST(SUM(b.n * COALESCE(m.lp_e6, f.floor_e6)) AS BIGINT)
               AS score_e6
      FROM bag b CROSS JOIN floors f
      LEFT JOIN model m ON m.bg = b.bg AND m.lang = f.lang
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, lang_true, lang AS lang_pred, score_e6,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_e6 DESC, lang) AS rn
      FROM scored
    )
    SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_e6) AS BIGINT) AS sum_score_e6
    FROM pred WHERE rn = 1
    GROUP BY 1, 2
    """,
    tags="F31",
)
def text_lang_id_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F31: TRAINED language-ID classifier (operators/langid.py) — the
    statistical core of the CLD/fastText gate crawl pipelines run,
    upgrading the r6 marker-word heuristic (text_lang_id) to a model
    learned from the data: per-language character-bigram profiles
    trained on the even-doc_id half, Laplace-smoothed naive-Bayes
    scoring of the held-out odd half, argmax prediction with a
    deterministic tie-break. Emits the confusion matrix with summed
    scores, so the hash certifies the training counts, the smoothing
    arithmetic, the OOV floors, AND every argmax — not just accuracy.
    Log-probs are micro-nat BIGINTs (the certified F26/F30 recipe):
    reductions are exact at any parallelism and the oracle re-derives
    them independently. Scale shape: train = one corpus pass into a
    |langs|×|bigrams| metadata-scale model (broadcast); score = one
    broadcast equi-join on the bigram + map-combinable per-(doc,lang)
    aggregate; the only data-scale shuffle is the per-doc bag groupBy
    — unchanged at 100 TB."""
    from karna_spark.operators.langid import classify, train_bigram_model
    from karna_spark.operators.sizing import spread_scan

    # r13 (closes the r12 verdict's lang_id claim): BOTH corpus passes
    # — the training bigram explode and the scoring bag explode — are
    # compute-heavy maps over the single-row-group fixture file;
    # spread once, upstream of the train/test split, so each pass
    # parallelizes (no-op on any real multi-split input).
    d = spread_scan(
        table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    model, floors = train_bigram_model(train, "text", "lang")
    pred = classify(test, model, floors, "doc_id", "text")
    out = (
        pred.join(test.select("doc_id", F.col("lang").alias("lang_true")), "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("score_e6").cast("bigint").alias("sum_score_e6"),
        )
    )
    out._karna_persisted = getattr(model, "_karna_persisted", [])  # type: ignore[attr-defined]
    return out


# ---------------------------------------------------------------- J20
@register_query(
    "dedup_image_phash",
    oracle="""
    WITH items AS (SELECT doc_id AS item_id FROM documents WHERE doc_id < 600),
    px AS (
      SELECT i.item_id, u.p,
             (((i.item_id // 3 + 1) * (u.p + 3) * 131
               + (i.item_id // 3) * u.p * u.p * 7) % 256
              + CASE WHEN (u.p + i.item_id % 3) % 53 = 0 THEN 9 ELSE 0 END
             ) % 256 AS v
      FROM items i, unnest(generate_series(0, 255)) u(p)
    ),
    blocks AS (
      SELECT item_id,
             (p // 16 // 2) * 8 + (p % 16) // 2 AS j,
             CAST(SUM(v) AS BIGINT) AS bs
      FROM px GROUP BY 1, 2
    ),
    tots AS (SELECT item_id, SUM(bs) AS tot FROM blocks GROUP BY 1),
    bits AS (
      SELECT b.item_id, b.j,
             CASE WHEN b.bs * 64 > t.tot THEN 1 ELSE 0 END AS bit
      FROM blocks b JOIN tots t USING (item_id)
    ),
    pairs AS (
      SELECT a.item_id AS id_a, b.item_id AS id_b,
             CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS INT)
               AS hamming
      FROM bits a JOIN bits b ON a.j = b.j AND a.item_id < b.item_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
    """,
    tags="J20",
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J20: image perceptual-hash near-duplicate detection — the
    image-side twin of MinHash/SimHash text dedup that multimodal
    corpora run before training (copies, re-encodes, light edits of
    the same picture). Each item gets a deterministic patterned 16×16
    PPM (same-group items are planted near-dups: variants perturb a
    sparse pixel subset; the closed-form pixel arithmetic is mirrored
    by the oracle, the V9 pattern). The engine path is REAL end to
    end: Arrow-batched mapInPandas parses the container and computes
    an all-integer 8×8 average-hash (block_sum·64 > total, strict —
    no float anywhere, so the hash replays exactly in SQL), then the
    SimHash pigeonhole finds pairs: 7 banded EQUI-joins on 10-bit
    hash bands + exact popcount ≤ 6 verification
    (operators/multimodal.py:image_ahash64 / ahash_near_dup_pairs).
    The oracle derives every hash bit independently from the
    generation arithmetic and joins ALL pairs quadratically — the
    engine's banded join must reproduce its answer exactly, which
    certifies decode, downsample, threshold, banding, and popcount at
    once. Scale: candidates ∝ band-bucket occupancy (never |items|²);
    at 100 TB the hash step is one embarrassing-parallel pass and
    signatures persist like J18's."""
    from karna_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        image_ahash64,
        synthesize_patterned_image_df,
    )

    items = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 600)
        .select(F.col("doc_id").alias("item_id"))
    )
    media = synthesize_patterned_image_df(items, "item_id")
    hashes = image_ahash64(media)
    return ahash_near_dup_pairs(hashes, max_hamming=6, band_bits=10)


@register_query(
    "text_html_extract",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             CAST(doc_id % 7 AS VARCHAR) AS m7,
             doc_id % 3 AS m3, doc_id % 4 AS m4,
             CAST(doc_id % 5 AS VARCHAR) AS m5
      FROM documents
    ),
    g AS (
      SELECT doc_id,
        '<html><head><title>Doc ' || doc_id || '</title>'
          || '<style>.nav{color:red}</style>'
          || '<script>var trap="DO NOT EXTRACT";</script></head><body>'
          || '<!-- crawl id ' || doc_id || ' -->'
          || '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
          || '<header><h1>Doc ' || doc_id || '</h1></header>'
          || '<p>' || text || '</p>'
          || '<p>Tags &amp; entities: x' || m7 || ' &lt;ok&gt;</p>'
          || CASE WHEN m3 = 0
               THEN '<p>Appendix section ' || m5 || '.</p>' ELSE '' END
          || '<div class="links"><a href="/l1">more</a> '
          || '<a href="/l2">links</a> <a href="/l3">here</a></div>'
          || CASE WHEN m4 = 0
               THEN '<div class="spacer">   </div>' ELSE '' END
          || '<aside><a href="/r1">Rel 1</a> <a href="/r2">Rel 2</a></aside>'
          || '<footer>&copy; 2026 Web Corpus</footer></body></html>'
          AS html,
        text || chr(10) || 'Tags & entities: x' || m7 || ' <ok>'
          || CASE WHEN m3 = 0
               THEN chr(10) || 'Appendix section ' || m5 || '.'
               ELSE '' END AS main_text,
        CAST(2 + CASE WHEN m3 = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS blocks_kept,
        CAST(1 + CASE WHEN m4 = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS blocks_dropped
      FROM d
    )
    SELECT doc_id, main_text, blocks_kept, blocks_dropped,
           CAST(length(html) AS BIGINT) AS html_chars,
           CAST(length(main_text) AS BIGINT) AS text_chars,
           round(1.0 - length(main_text)::DOUBLE / length(html), 4)
             AS chrome_ratio
    FROM g
    """,
    tags="F32",
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F32: HTML → text main-content extraction (operators/html.py) —
    the first stage of every crawl pipeline (C4/RefinedWeb run
    trafilatura-shaped extraction before URL filtering, language ID,
    or any dedup), closing SURVEY §2's last missing standard stage.

    Each document is wrapped in a deterministic crawl-page template
    (the WAV/PPM/RVID synthesis precedent): script/style payloads with
    trap text that must NOT leak, an HTML comment, nav/header/aside/
    footer chrome, the document text as a prose paragraph, an
    entity-escaped paragraph (&amp;/&lt;/&gt;), a link-list div whose
    link density is 1.0 (the boilerpipe drop signal), and — varying by
    doc_id — an appendix paragraph and a whitespace-only spacer div.
    The engine extracts main text with JVM regex/array/higher-order
    expressions only (no UDF, no shuffle — row-local, so the operator
    scales exactly like the scan feeding it) and emits the kept text,
    block accounting, and the chrome-ratio quality signal.

    The oracle builds the SAME html string from the generation
    parameters but derives every output CLOSED-FORM (expected text =
    the known content paragraphs; expected counts = the known template
    arithmetic) — it never runs the extractor, so the hash certifies
    payload stripping, chrome removal, block segmentation, link-density
    boilerplate rejection, entity decoding, and the ratio math against
    ground truth, not a replay."""
    from karna_spark.operators.html import extract_main_content

    doc = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    m3, m4 = doc % 3, doc % 4
    html = F.concat(
        F.lit("<html><head><title>Doc "), s(doc), F.lit("</title>"),
        F.lit("<style>.nav{color:red}</style>"),
        F.lit('<script>var trap="DO NOT EXTRACT";</script></head><body>'),
        F.lit("<!-- crawl id "), s(doc), F.lit(" -->"),
        F.lit('<nav><a href="/">Home</a> <a href="/about">About</a></nav>'),
        F.lit("<header><h1>Doc "), s(doc), F.lit("</h1></header>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<p>Tags &amp; entities: x"), s(doc % 7),
        F.lit(" &lt;ok&gt;</p>"),
        F.when(
            m3 == 0,
            F.concat(
                F.lit("<p>Appendix section "), s(doc % 5), F.lit(".</p>")
            ),
        ).otherwise(F.lit("")),
        F.lit('<div class="links"><a href="/l1">more</a> '),
        F.lit('<a href="/l2">links</a> <a href="/l3">here</a></div>'),
        F.when(m4 == 0, F.lit('<div class="spacer">   </div>')).otherwise(
            F.lit("")
        ),
        F.lit('<aside><a href="/r1">Rel 1</a> <a href="/r2">Rel 2</a></aside>'),
        F.lit("<footer>&copy; 2026 Web Corpus</footer></body></html>"),
    )
    # r13 (verdict item 8): the block-regex extraction is the compute;
    # spread the single-row-group fixture scan so it uses every core
    # (no-op on real multi-split input).
    from karna_spark.operators.sizing import spread_scan

    pages = spread_scan(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", html.alias("html"))
    return extract_main_content(pages, "html").select(
        "doc_id", "main_text", "blocks_kept", "blocks_dropped",
        "html_chars", "text_chars", "chrome_ratio",
    )


# ---------------------------------------------------------------- F33
@register_query(
    "text_boolean_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents
    ),
    hits AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN token = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf_vector,
             CAST(SUM(CASE WHEN token = 'stream' THEN 1 ELSE 0 END) AS BIGINT) AS tf_stream,
             CAST(SUM(CASE WHEN token = 'filter' THEN 1 ELSE 0 END) AS BIGINT) AS tf_filter,
             CAST(SUM(CASE WHEN token = 'slow'   THEN 1 ELSE 0 END) AS BIGINT) AS tf_slow
      FROM toks
      WHERE token IN ('vector', 'stream', 'filter', 'slow')
      GROUP BY doc_id
    )
    SELECT doc_id, tf_vector, tf_stream, tf_filter,
           tf_vector + tf_stream + tf_filter AS score
    FROM hits
    WHERE tf_vector > 0 AND tf_stream > 0 AND tf_filter > 0 AND tf_slow = 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
    tags="F33 J3 J4 O3",
)
def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F33: inverted-index boolean retrieval — the conjunctive query
    ``vector AND stream AND filter AND NOT slow`` ranked by summed
    term frequency (the boolean-model half of a search engine; BM25
    ranking over the same postings is F11). The plan IS the inverted
    index consulted at query time: tokenize, keep ONLY postings for
    the query's terms (the filter sits under the shuffle, so shuffle
    volume is ∝ matched postings, not corpus tokens), then ONE grouped
    conditional aggregate per doc resolves AND / NOT / score together
    — the NOT term rides the same pass as a zero-count predicate
    instead of a second anti-join scan. Top-k plans as
    TakeOrderedAndProject with a doc_id tie-break. At rest the same
    postings live in the J13 posting-list table; at 100 TB the only
    data-scale work is the token scan, and the aggregate state is
    |matching docs| × 4 counters."""
    from karna_spark.operators.retrieval import boolean_search

    # one certified implementation, two surfaces (r12): this driver
    # row and the NL "containing X and Y but not Z" intent both call
    # the operator — the inline copy it was extracted from is gone
    return boolean_search(
        table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        ["vector", "stream", "filter"],
        ["slow"],
        k=20,
    )


# ---------------------------------------------------------------- O13
@register_query(
    "sample_global_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5('shuf7|' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    )
    SELECT substr(k, 1, 1) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           min(k) AS first_key,
           max(k) AS last_key,
           CAST(min_by(doc_id, k) AS BIGINT) AS first_doc,
           CAST(max_by(doc_id, k) AS BIGINT) AS last_doc
    FROM keyed
    GROUP BY shard ORDER BY shard
    """,
    tags="O13 F7 A1",
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: deterministic global corpus shuffle — the randomize-then-
    shard step every training-data pipeline runs last (sequential
    parquet order is source/time-clustered; training wants i.i.d.
    batches). The shuffle key is md5 over a seed-salted doc id:
    content-independent, reproducible across runs/engines, and
    uniform, so shard = first hex nibble (16 shards here; a real run
    uses more nibbles for more shards) needs NO global sort and NO
    driver state — writing the real thing is
    ``repartition(shard).sortWithinPartitions(key)``, an all-map
    plan plus one shuffle, where a naive ``ORDER BY random()`` is a
    global range sort with a driver-sampled boundary pass. The
    certification fingerprints each shard: size (uniformity), member
    checksum (partition correctness), min/max key and the argmin/
    argmax docs (within-shard ORDER correctness at both ends) — all
    map-combinable aggregates. Seed change ⇒ a different, equally
    certified permutation."""
    keyed = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.lit("shuf7|"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ).alias("k"),
    )
    return (
        keyed.groupBy(F.substring("k", 1, 1).alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.min("k").alias("first_key"),
            F.max("k").alias("last_key"),
            F.min_by("doc_id", "k").cast("bigint").alias("first_doc"),
            F.max_by("doc_id", "k").cast("bigint").alias("last_doc"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------- F34
def _lr_oracle(iters: int = 6, inv_lr: int = 64) -> str:
    """Generated chained-CTE oracle for text_quality_classifier: one
    CTE block per GD iteration, independently re-deriving every
    logit, hard-sigmoid probability, gradient, and weight update in
    DuckDB (the F22/BPE generated-oracle pattern). Floor divisions
    are spelled CAST(floor(a/b) AS BIGINT) over DOUBLE division
    because DuckDB's integer ``//`` truncates toward zero while the
    trainer's Python ``//`` floors — see operators/lr.py."""
    parts = [
        """aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 < 2 THEN 1 ELSE 0 END AS y,
             list_concat(
               regexp_split_to_array(trim(text), '\\s+'),
               CASE WHEN doc_id % 4 < 2
                      THEN ['clean', 'clean', 'clean', 'clean']
                    WHEN doc_id % 5 = 0 THEN ['clean']
                    ELSE [] END) AS ws
      FROM documents
    )""",
        """feat AS (
      SELECT doc_id, y, substr(md5(w), 1, 1) AS b,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM (SELECT doc_id, y, unnest(ws) AS w FROM aug) t
      GROUP BY 1, 2, 3
      UNION ALL
      SELECT doc_id, y, '__bias', CAST(1 AS BIGINT) FROM aug
    )""",
        "tr AS (SELECT * FROM feat WHERE doc_id % 2 = 0)",
        "nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tr)",
        "w0 AS (SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM tr)",
    ]
    for t in range(1, iters + 1):
        parts += [
            f"""z{t} AS (
      SELECT tr.doc_id, tr.y,
             CAST(SUM(COALESCE(w.w, 0) * tr.x) AS BIGINT) AS z
      FROM tr LEFT JOIN w{t - 1} w USING (b) GROUP BY 1, 2
    )""",
            f"""p{t} AS (
      SELECT doc_id, y,
             LEAST(CAST(1000000 AS BIGINT),
                   GREATEST(CAST(0 AS BIGINT),
                            CAST(floor(z / 4.0) AS BIGINT) + 500000)) AS p
      FROM z{t}
    )""",
            f"""g{t} AS (
      SELECT tr.b,
             CAST(SUM((tr.y * 1000000 - p.p) * tr.x) AS BIGINT) AS g
      FROM tr JOIN p{t} p ON tr.doc_id = p.doc_id GROUP BY 1
    )""",
            f"""w{t} AS (
      SELECT w.b,
             w.w + CAST(floor(g.g / (nn.n * {inv_lr}.0)) AS BIGINT) AS w
      FROM w{t - 1} w JOIN g{t} g USING (b), nn
    )""",
        ]
    parts += [
        "te AS (SELECT * FROM feat WHERE doc_id % 2 = 1)",
        f"""zf AS (
      SELECT te.doc_id, te.y,
             CAST(SUM(COALESCE(w.w, 0) * te.x) AS BIGINT) AS z
      FROM te LEFT JOIN w{iters} w USING (b) GROUP BY 1, 2
    )""",
        """pf AS (
      SELECT doc_id, y,
             LEAST(CAST(1000000 AS BIGINT),
                   GREATEST(CAST(0 AS BIGINT),
                            CAST(floor(z / 4.0) AS BIGINT) + 500000)) AS p
      FROM zf
    )""",
    ]
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT 'w:' || b AS item, w AS v1, CAST(NULL AS BIGINT) AS v2
    FROM w{iters}
    UNION ALL
    SELECT 'cm:' || CAST(y AS VARCHAR) || ':'
             || CAST(CASE WHEN p >= 500000 THEN 1 ELSE 0 END AS VARCHAR),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(p) AS BIGINT)
    FROM pf GROUP BY 1
    ORDER BY item
    """
    )


@register_query(
    "text_quality_classifier",
    oracle=_lr_oracle(),
    tags="F34 U1",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F34: TRAINED quality classifier (operators/lr.py) — quantized
    logistic regression over hashed bag-of-words features, the
    classifier-based curation gate the public pipelines describe
    (GPT-3's WebText LR filter, CCNet/Llama quality classes). The
    quality signal is PLANTED in-query (the WAV/PPM/HTML synthesis
    precedent): positive docs carry four extra marker tokens, a fifth
    of the negatives carry one (non-separable on purpose — held-out
    accuracy lands at 0.76 against a 0.50 base rate, a REAL learned
    separation, not a memorized rule), so the oracle can re-derive
    the entire training trajectory closed-form.
    Training: 6 batch-GD iterations, hard-sigmoid link, ALL state in
    BIGINT micro-units — integer-exact end to end, no transcendental
    whose last ulp could differ between libm implementations (the
    exp-free upgrade of the F26/F30 ln recipe). The output is the
    full weight vector PLUS the held-out confusion matrix with
    summed probabilities, so the hash certifies every gradient,
    every floor division, and every prediction — not just accuracy.
    Scale shape: 16+1 hashed buckets keep the model metadata-scale
    (broadcast at any corpus size); each iteration is two
    map-combinable data-scale aggregates + one <=17-row collect (the
    BPE/k-means iteration contract); the feature frame is persisted
    once for its iters+1 consumers (the F31 lesson — at 100 TB,
    re-scanning the corpus per iteration multiplies the I/O bill)."""
    from karna_spark.operators.lr import predict, train_hard_sigmoid_logreg
    from karna_spark.operators.text import words

    d = spread_scan(table(spark, sf_dir, "documents"))
    y = (F.col("doc_id") % 4 < 2).cast("int")
    markers = (
        F.when(
            F.col("doc_id") % 4 < 2,
            F.array(*[F.lit("clean")] * 4),
        )
        .when(F.col("doc_id") % 5 == 0, F.array(F.lit("clean")))
        .otherwise(F.array().cast("array<string>"))
    )
    aug = d.select(
        "doc_id",
        y.alias("y"),
        F.concat(words(F.trim(F.col("text"))), markers).alias("ws"),
    )
    tok = aug.select("doc_id", "y", F.explode("ws").alias("w"))
    feat = (
        tok.select(
            "doc_id",
            "y",
            F.substring(F.md5(F.col("w").cast("binary")), 1, 1).alias("b"),
        )
        .groupBy("doc_id", "y", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .unionByName(
            aug.select(
                "doc_id",
                "y",
                F.lit("__bias").alias("b"),
                F.lit(1).cast("bigint").alias("x"),
            )
        )
    )
    train = feat.filter(F.col("doc_id") % 2 == 0)
    test = feat.filter(F.col("doc_id") % 2 == 1)
    w, _n = train_hard_sigmoid_logreg(train, iters=6, inv_lr=64)
    wrows = literal_frame(
        spark,
        [(f"w:{b}", int(v)) for b, v in sorted(w.items())],
        "item string, v1 long",
    ).select("item", "v1", F.lit(None).cast("bigint").alias("v2"))
    cm = (
        predict(test, w)
        .groupBy("y", "yhat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("v1"),
            F.sum("p").cast("bigint").alias("v2"),
        )
        .select(
            F.concat(
                F.lit("cm:"),
                F.col("y").cast("string"),
                F.lit(":"),
                F.col("yhat").cast("string"),
            ).alias("item"),
            "v1",
            "v2",
        )
    )
    return wrows.unionByName(cm).orderBy("item")


# ------------------------------------------------- BPE apply (F36)
# The certification merge list is FIXED so the DuckDB oracle can spell
# the identical nested-replace chain; a learned list from learn_bpe
# (F22) drops into the same operator unchanged.
_BPE_APPLY_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("s", "t"), ("in", "g"),
]


def _bpe_apply_sql_chain(expr: str) -> str:
    """Nested DuckDB replace() calls mirroring _apply_merges."""
    out = expr
    for a, b in _BPE_APPLY_MERGES:
        out = f"replace({out}, '{a} {b}', '{a}{b}')"
    return out


_BPE_APPLY_CHAIN_SQL = _bpe_apply_sql_chain(
    "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
)


@register_query(
    "text_bpe_encode",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    enc AS (
      SELECT doc_id, ws,
             list_transform(ws, w ->
               {_BPE_APPLY_CHAIN_SQL}
             ) AS toks
      FROM w
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(toks,
                  t -> len(string_split(t, ' ')))), 0) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(toks, ' | ')) AS enc_md5
    FROM enc
    """,
    tags="F36 F22 F9",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F36: BPE tokenizer APPLY (operators/bpe_apply.py:bpe_encode) —
    encode every document with a merge table, the other half of the
    tokenizer lifecycle F22 trains. Each word explodes to
    space-separated symbols and one ``replace('a b','ab')`` per rule
    rewrites it in priority order (left-to-right non-overlapping ==
    BPE's per-rule merge pass), all inside ONE transform() lambda —
    a map-only projection with zero shuffles and zero Python, so
    token counting at 100 TB costs one pass over the text. The
    oracle replays the identical chain with DuckDB's replace(),
    certifying per-doc word counts, token counts, and the md5 of the
    full token stream."""
    from karna_spark.operators.bpe_apply import bpe_encode

    enc = bpe_encode(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        _BPE_APPLY_MERGES,
    )
    return enc.select(
        "doc_id", "n_words", "n_tokens",
        F.md5(F.col("encoded").cast("binary")).alias("enc_md5"),
    )


def _unigram_oracle() -> str:
    """DuckDB replay of the unigram Viterbi: the identical 16-level
    unrolled DP as a CTE column chain, the vocab as one scalar MAP
    (duckdb map_extract ≡ Spark element_at: missing key → NULL →
    coalesce to the same sentinel)."""
    from karna_spark.operators.unigram_tok import (
        _SENTINEL,
        MAX_PIECE,
        MAX_WORD,
        TOP_MULTI,
    )

    levels = []
    for i in range(1, MAX_WORD + 1):
        cands = []
        for j in range(max(0, i - MAX_PIECE), i):
            vj = "0" if j == 0 else f"v{j}"
            look = f"list_extract(map_extract(m, substr(w, {j + 1}, {i - j})), 1)"
            cands.append(f"coalesce({vj} + {look} * 128 - 1, {_SENTINEL})")
        best = f"greatest({', '.join(cands)})" if len(cands) > 1 else cands[0]
        prev = "CAST(0 AS BIGINT)" if i == 1 else f"v{i - 1}"
        levels.append(
            f"d{i} AS (SELECT *, CASE WHEN length(w) >= {i} THEN {best} "
            f"ELSE {prev} END AS v{i} FROM d{i - 1})"
        )
    chain = ",\n    ".join(levels)
    return f"""
    WITH occ AS (
      SELECT doc_id, substr(w, 1, {MAX_WORD}) AS w FROM (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents) t
      WHERE w <> ''
    ),
    wf AS (SELECT w, count(*)::BIGINT AS cnt FROM occ GROUP BY w),
    pieces AS (
      SELECT substr(w, s, l) AS piece, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM wf,
           LATERAL (SELECT unnest(range(1, length(w) + 1)) AS s) ts,
           LATERAL (SELECT unnest(range(1, least({MAX_PIECE}, length(w) - s + 1) + 1)) AS l) tl
      GROUP BY piece
    ),
    vocab0 AS (
      SELECT piece, cnt FROM pieces WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        FROM pieces WHERE length(piece) >= 2) q
      WHERE rk <= {TOP_MULTI}
    ),
    vocab AS (
      SELECT piece,
             CAST(round(ln(cnt::DOUBLE / (SELECT sum(cnt) FROM vocab0)) * 1000000)
                  AS BIGINT) AS s
      FROM vocab0
    ),
    vm AS (SELECT map(list(piece ORDER BY piece), list(s ORDER BY piece)) AS m
           FROM vocab),
    w0 AS (SELECT DISTINCT w FROM occ),
    d0 AS (SELECT w, m FROM w0 CROSS JOIN vm),
    {chain},
    wd AS (
      SELECT w, (-v{MAX_WORD}) % 128 AS n_pieces,
             CAST(-(((-v{MAX_WORD}) - ((-v{MAX_WORD}) % 128)) / 128) AS BIGINT)
               AS score_e6
      FROM d{MAX_WORD}
    )
    SELECT occ.doc_id,
           CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
           CAST(sum(score_e6) AS BIGINT) AS score_e6
    FROM occ JOIN wd USING (w)
    GROUP BY occ.doc_id
    """


@register_query(
    "text_unigram_tokenize",
    oracle=_unigram_oracle(),
    tags="F38",
)
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F38: unigram-LM (SentencePiece-style, Kudo 2018) tokenizer —
    the tokenizer family's third member next to BPE train (F22) and
    BPE encode (F36). Vocab = every single char + top-500 substrings
    (len ≤ 4) of the distinct-word frame by frequency, scores =
    micro-nat-quantized ln(count/total); encode = exact Viterbi
    best-segmentation per DISTINCT word via a 16-level unrolled
    integer DP whose value packs (score, piece count) into one BIGINT
    (128·score − pieces — max ⇒ best score, then fewest pieces), with
    the vocab constant-folded into the plan as a map literal. The
    corpus-scale pass is explode → distinct-word join → per-doc sum:
    no Python, no transcendental outside the |vocab|-row frame. The
    oracle replays the identical DP as a CTE chain, so the row
    hash-certifies the full train+encode lifecycle."""
    from karna_spark.operators.unigram_tok import unigram_tokenize_docs

    docs = spread_scan(table(spark, sf_dir, "documents"))
    return unigram_tokenize_docs(docs, "doc_id", "text")


# --------------------------------------------- RAG index pipeline
# Fixed-window chunker: W words per chunk, stride S (W-S overlap).
_RAG_W, _RAG_S, _RAG_DIMS, _RAG_K = 32, 24, 8, 5
_RAG_QUERY = "distributed query engines shuffle data between stages"


def _rag_qvec() -> list[float]:
    """The query string's hash embedding, computed driver-side once —
    the same per-byte md5 construction the chunk expressions use, so
    it is a plain literal vector in BOTH certification engines."""
    import hashlib

    h = hashlib.md5(_RAG_QUERY.encode()).hexdigest()
    return [
        (int(h[2 * j: 2 * j + 2], 16) - 127.5) / 127.5
        for j in range(_RAG_DIMS)
    ]


def _rag_dim_sql(j: int) -> str:
    """DuckDB: byte j of md5(chunk text), scaled to [-1, 1]."""
    hx = "0123456789abcdef"
    hi = f"(strpos('{hx}', substr(md5(t), {2 * j + 1}, 1)) - 1)"
    lo = f"(strpos('{hx}', substr(md5(t), {2 * j + 2}, 1)) - 1)"
    return f"((({hi}) * 16 + ({lo}) - 127.5) / 127.5)"


def _rag_oracle() -> str:
    import math

    q = _rag_qvec()
    qnorm = math.sqrt(sum(x * x for x in q))
    num = " + ".join(
        f"({_rag_dim_sql(j)}) * ({q[j]!r})" for j in range(_RAG_DIMS)
    )
    sq = " + ".join(
        f"({_rag_dim_sql(j)}) * ({_rag_dim_sql(j)})"
        for j in range(_RAG_DIMS)
    )
    return f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    c AS (
      SELECT doc_id, i,
             doc_id * 1000 + i AS chunk_id,
             array_to_string(
               ws[i * {_RAG_S} + 1 : i * {_RAG_S} + {_RAG_W}], ' ') AS t
      FROM w, LATERAL unnest(range(0,
        CAST(1 + ceil(greatest(0, len(ws) - {_RAG_W}) / {_RAG_S}.0)
             AS BIGINT))) u(i)
    ),
    scored AS (
      SELECT chunk_id, doc_id,
             ROUND(({num}) / (sqrt({sq}) * {qnorm!r}), 4) AS cos
      FROM c WHERE t IS NOT NULL AND t <> ''
    )
    SELECT chunk_id, doc_id, cos,
           CAST(row_number() OVER (ORDER BY cos DESC, chunk_id) AS INT)
             AS rank
    FROM scored ORDER BY cos DESC, chunk_id LIMIT {_RAG_K}
    """


@register_query(
    "pipeline_rag_index",
    oracle=_rag_oracle(),
    tags="PIPE F4 J5 F8",
)
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG ingest+retrieve pipeline: documents → fixed-
    window word chunks (32-word windows, stride 24 — the overlap
    variant of F4's certified chunker) → per-chunk deterministic hash
    embedding (8 dims from md5 bytes, the sandbox stand-in for a real
    encoder — the Spark-side plumbing is what's certified: schema,
    map-only embed pass, normalized cosine) → top-5 chunks for a fixed
    query string by exact cosine. Chunking and embedding are one
    map-only projection (posexplode of a per-doc window count — no
    shuffle until the final bounded TakeOrdered top-k). The oracle
    replays chunk windows, md5-byte embeddings, and the cosine with
    the SAME literal query vector, so the hash certifies the whole
    pipeline's arithmetic. At 100 TB: embed is embarrassingly
    parallel; retrieval would ride the J21/U3 index paths (this row
    certifies the exact baseline they recall-gate against)."""
    import math

    q = _rag_qvec()
    qnorm = math.sqrt(sum(x * x for x in q))
    docs = table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: w != F.lit(""),
    )
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.lit(0), F.size(words) - F.lit(_RAG_W))
            / F.lit(float(_RAG_S))
        )
    ).cast("int")
    chunks = (
        docs.select("doc_id", words.alias("ws"), n_chunks.alias("nc"))
        .select(
            "doc_id",
            F.posexplode(F.sequence(F.lit(0), F.col("nc") - 1)).alias(
                "pos", "i"
            ),
            "ws",
        )
        .select(
            (F.col("doc_id") * 1000 + F.col("i")).alias("chunk_id"),
            "doc_id",
            F.array_join(
                F.slice(
                    F.col("ws"),
                    F.col("i") * _RAG_S + 1,
                    F.lit(_RAG_W),
                ),
                " ",
            ).alias("t"),
        )
    )

    def dim(j: int):
        return (
            F.conv(F.substring(F.md5(F.col("t")), 2 * j + 1, 2), 16, 10)
            .cast("double")
            - 127.5
        ) / 127.5

    num = None
    sq = None
    for j in range(_RAG_DIMS):
        term = dim(j) * F.lit(q[j])
        s2 = dim(j) * dim(j)
        num = term if num is None else num + term
        sq = s2 if sq is None else sq + s2
    # a zero-word document yields one EMPTY chunk window; drop it on
    # both certification sides (the oracle's array_to_string over an
    # empty slice is NULL there) instead of scoring md5('')
    scored = chunks.filter(F.col("t") != "").select(
        "chunk_id",
        "doc_id",
        F.round(num / (F.sqrt(sq) * F.lit(qnorm)), 4).alias("cos"),
    )
    from pyspark.sql import Window as W

    top = scored.orderBy(F.col("cos").desc(), F.col("chunk_id")).limit(
        _RAG_K
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(W.orderBy(F.col("cos").desc(), F.col("chunk_id")))
        .cast("int"),
    )


def _unigram_em_oracle() -> str:
    """DuckDB replay of the hard-EM round: the choice-packed DP (16
    two-step levels), the unrolled argmax backtrack (16 levels of a
    position CASE), path-count aggregation, the prune/floor re-score,
    and the second plain DP — every CTE level MATERIALIZED so the
    engine cannot inline the unrolled chain into an exponential
    expression (the same hazard the Spark side cuts with a
    localCheckpoint)."""
    from karna_spark.operators.unigram_tok import (
        _CHOICE_OFF,
        _SENTINEL,
        MAX_PIECE,
        MAX_WORD,
        TOP_MULTI,
    )

    def lookup(expr: str) -> str:
        return f"list_extract(map_extract(m, {expr}), 1)"

    def choice_chain(src: str, prefix: str) -> list[str]:
        out = []
        for i in range(1, MAX_WORD + 1):
            cands = []
            for j in range(max(0, i - MAX_PIECE), i):
                vj = "0" if j == 0 else f"v{j}"
                cand = (
                    f"coalesce({vj} + "
                    f"{lookup(f'substr(w, {j + 1}, {i - j})')} * 128 - 1, "
                    f"{_SENTINEL})"
                )
                cands.append(f"(({cand}) + {_CHOICE_OFF}) * 32 + {j}")
            best = (
                f"greatest({', '.join(cands)})" if len(cands) > 1 else cands[0]
            )
            prevsrc = src if i == 1 else f"{prefix}{i - 1}b"
            out.append(
                f"{prefix}{i}a AS MATERIALIZED "
                f"(SELECT *, {best} AS p{i} FROM {prevsrc})"
            )
            prevv = "CAST(0 AS BIGINT)" if i == 1 else f"v{i - 1}"
            out.append(
                f"{prefix}{i}b AS MATERIALIZED (SELECT *, "
                f"CASE WHEN length(w) >= {i} THEN "
                f"CAST((p{i} - p{i} % 32) / 32 AS BIGINT) - {_CHOICE_OFF} "
                f"ELSE {prevv} END AS v{i}, "
                f"CASE WHEN length(w) >= {i} THEN CAST(p{i} % 32 AS INT) "
                f"ELSE 0 END AS b{i} FROM {prefix}{i}a)"
            )
        return out

    def plain_chain(src: str, prefix: str, var: str) -> list[str]:
        out = []
        for i in range(1, MAX_WORD + 1):
            cands = []
            for j in range(max(0, i - MAX_PIECE), i):
                vj = "0" if j == 0 else f"{var}{j}"
                cands.append(
                    f"coalesce({vj} + "
                    f"{lookup(f'substr(w, {j + 1}, {i - j})')} * 128 - 1, "
                    f"{_SENTINEL})"
                )
            best = (
                f"greatest({', '.join(cands)})" if len(cands) > 1 else cands[0]
            )
            prev = "CAST(0 AS BIGINT)" if i == 1 else f"{var}{i - 1}"
            prevsrc = src if i == 1 else f"{prefix}{i - 1}"
            out.append(
                f"{prefix}{i} AS MATERIALIZED (SELECT *, "
                f"CASE WHEN length(w) >= {i} THEN {best} ELSE {prev} END "
                f"AS {var}{i} FROM {prevsrc})"
            )
        return out

    def recon_chain(src: str, prefix: str) -> list[str]:
        out = []
        for t in range(1, MAX_WORD + 1):
            pos_prev = "CAST(length(w) AS INT)" if t == 1 else f"pos{t - 1}"
            jcase = (
                "CASE "
                + " ".join(
                    f"WHEN {pos_prev} = {i} THEN b{i}"
                    for i in range(1, MAX_WORD + 1)
                )
                + " ELSE 0 END"
            )
            prevsrc = src if t == 1 else f"{prefix}{t - 1}"
            out.append(
                f"{prefix}{t} AS MATERIALIZED (SELECT *, "
                f"CASE WHEN {pos_prev} > 0 THEN "
                f"substr(w, ({jcase}) + 1, {pos_prev} - ({jcase})) END "
                f"AS piece{t}, "
                f"CASE WHEN {pos_prev} > 0 THEN CAST({jcase} AS INT) "
                f"ELSE 0 END AS pos{t} FROM {prevsrc})"
            )
        return out

    base = f"""
occ AS (
  SELECT doc_id, substr(w, 1, {MAX_WORD}) AS w FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
    FROM documents) t
  WHERE w <> ''
),
wf0 AS (SELECT w, count(*)::BIGINT AS cnt FROM occ GROUP BY w),
pieces AS (
  SELECT substr(w, s, l) AS piece, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM wf0,
       LATERAL (SELECT unnest(range(1, length(w) + 1)) AS s) ts,
       LATERAL (SELECT unnest(range(1, least({MAX_PIECE}, length(w) - s + 1) + 1)) AS l) tl
  GROUP BY piece
),
vocab0 AS (
  SELECT piece, cnt FROM pieces WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM pieces WHERE length(piece) >= 2) q
  WHERE rk <= {TOP_MULTI}
),
vocab1 AS (
  SELECT piece, CAST(round(ln(cnt::DOUBLE / (SELECT sum(cnt) FROM vocab0)) * 1000000) AS BIGINT) AS s
  FROM vocab0
),
vm1 AS (SELECT map(list(piece ORDER BY piece), list(s ORDER BY piece)) AS m FROM vocab1),
w0 AS (SELECT DISTINCT w FROM occ),
c0 AS (SELECT w, m FROM w0 CROSS JOIN vm1)
""".strip()
    parts = [base]
    parts += choice_chain("c0", "c")
    parts += recon_chain(f"c{MAX_WORD}b", "r")
    used = " UNION ALL ".join(
        f"SELECT w, piece{t} AS piece FROM r{MAX_WORD}"
        for t in range(1, MAX_WORD + 1)
    )
    parts.append(
        f"used AS (SELECT w, piece FROM ({used}) WHERE piece IS NOT NULL)"
    )
    parts.append(
        "c2 AS (SELECT u.piece, CAST(SUM(wf0.cnt) AS BIGINT) AS c "
        "FROM used u JOIN wf0 USING (w) GROUP BY u.piece)"
    )
    parts.append(
        """v2c AS (
  SELECT v.piece,
         CASE WHEN length(v.piece) = 1 THEN greatest(COALESCE(c.c, 0), 1)
              ELSE COALESCE(c.c, 0) END AS cnt
  FROM vocab1 v LEFT JOIN c2 c ON c.piece = v.piece
  WHERE length(v.piece) = 1 OR COALESCE(c.c, 0) >= 1
)"""
    )
    parts.append(
        "vocab2 AS (SELECT piece, CAST(round(ln(cnt::DOUBLE / "
        "(SELECT sum(cnt) FROM v2c)) * 1000000) AS BIGINT) AS s FROM v2c)"
    )
    parts.append(
        "vm2 AS (SELECT map(list(piece ORDER BY piece), "
        "list(s ORDER BY piece)) AS m FROM vocab2)"
    )
    parts.append("g0 AS (SELECT w, m FROM w0 CROSS JOIN vm2)")
    parts += plain_chain("g0", "g", "u")
    parts.append(
        f"""wd AS (
  SELECT w, (-u{MAX_WORD}) % 128 AS n_pieces,
         CAST(-(((-u{MAX_WORD}) - ((-u{MAX_WORD}) % 128)) / 128) AS BIGINT) AS s_e6
  FROM g{MAX_WORD}
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT occ.doc_id,
       CAST(sum(n_pieces) AS BIGINT) AS n_tokens_em,
       CAST(sum(s_e6) AS BIGINT) AS score_em_e6
FROM occ JOIN wd USING (w)
GROUP BY occ.doc_id
"""
    )


@register_query(
    "text_unigram_em_round",
    oracle=_unigram_em_oracle(),
    tags="F38",
)
def text_unigram_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F38 (train half): one hard-EM (Viterbi-EM) round of the unigram
    tokenizer — the documented SentencePiece training variant with the
    E-step's expectations replaced by argmax-path counts. Seed vocab →
    choice-packed DP (the argmax predecessor rides INSIDE the packed
    integer: ((cand+OFF)·32+j), exact because cand gaps ≥ 1) → unrolled
    backtrack reconstructs each distinct word's best segmentation →
    piece usage re-counts (weighted by word frequency) → PRUNE unused
    multi-char pieces, floor single chars at 1 (coverage), re-score →
    re-encode the corpus. Joins BPE merge-learning (F22), the quality
    LR (U1), and k-means (F28) in the certified-iterative-trainer
    family. The oracle replays the whole round as MATERIALIZED CTE
    chains; per-doc round-2 token counts and micro-nat scores are
    hash-exact."""
    from karna_spark.operators.unigram_tok import unigram_em_tokenize_docs

    docs = spread_scan(table(spark, sf_dir, "documents"))
    return unigram_em_tokenize_docs(docs, "doc_id", "text")
