"""Driver-checked query registry.

Each module in this package registers named queries: a PySpark builder
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB
oracle string. ``__spark_entry__.py`` exposes the registry to the
driver; tests run the same parity comparison locally.

Import order == registry order; importing this package populates
``registry.REGISTRY``.
"""

from karna_spark.queries import registry  # noqa: F401

# Query modules self-register on import.
from karna_spark.queries import (  # noqa: F401,E402
    tpch,
    tpch_ext,
    relational,
    aggregates,
    aggregates_ext,
    windows,
    timeseries,
    functions_lib,
    text_pipeline,
    dedup,
    vectors,
    frontends_q,
    sources_q,
    udx,
    streaming_q,
    analytics,
)

# Registry order is the order the driver's correctness harness visits
# queries, and the harness is count-capped (the first 50 entries per
# round — CORRECTNESS_rN.json always holds exactly 50 rows).
# ROTATION POLICY (restated at N=201, r8): every registered query's
# newest driver row must be ≤ ceil(N/50) rounds old (the arithmetic
# floor; 5 rounds at the current N). Each round's top-50 is, in
# order: (a) queries with NO driver row yet (new or past-cap), (b)
# queries materially changed this round, (c) the stalest certified
# cohort. Whatever spills past 50 via the setdefault loop leads the
# NEXT round's (c). Round 8 executes the r7 verdict's pre-planned
# rotation verbatim: (c) = the 34 remaining r4-certified rows (37
# minus the 3 retired rows-only queries dedup_simhash /
# similarity_topk_{lsh,ivf}; similarity_topk_pq was r5 — all four are
# now covered by their hash-certified driver twins
# dedup_simhash_md5_pairs / similarity_{lsh,ivf,pq}_recall, see
# SURVEY.md §8) followed by the oldest r5 rows in registry order (0
# fit after the sixteen r8-born queries take the (a) head). The
# full 49-row r5 cohort leads r9's top-50 (plus the oldest r6 row);
# r10 takes the rest of r6 + the r7 head — every query stays
# within the 4-round floor. scripts/rotation_check.py audits this
# mechanically; run it after any reorder here.
_PRIORITY: tuple[str, ...] = (
    # (a) no driver row yet: the sixteen r8-born queries (incremental
    # MinHash ingest dedup J18, embedding centroid drift F23,
    # hash-threshold mixture sampling O11, boilerplate strip F24,
    # snapshot corpus diff S19, sliding HLL window merge A33,
    # duplicated-span scrub F25, bigram-LM scoring F26, dynamic
    # partition pruning V7, steady-state IVF ingest J19,
    # stat-pruned snapshot read S20, streaming ingest dedup T14,
    # correlation-matrix profiling A34, intra-doc span dedup F27,
    # audio spectral features V6d, NL operator-backed intent V1d),
    # plus the two late-r8 rows: certification-grade exact k-means
    # F28 and the binaryFile multimodal ingest scan S22 (their two
    # displaced r4 rows — text_quality, text_token_counts — join the
    # r9 head; N=201 lifts the floor to 5, rotation_check verified).
    "vector_kmeans_lloyd", "source_binary_files",
    "dedup_incremental_minhash", "vector_centroid_drift",
    "sample_mixture_hash_threshold", "text_boilerplate_strip",
    "snapshot_corpus_diff", "agg_hll_sliding_window_merge",
    "text_duplicate_span_scrub", "text_bigram_logprob",
    "source_dynamic_partition_pruning", "similarity_ivf_incremental",
    "snapshot_stat_pruned_read", "streaming_incremental_dedup",
    "profile_correlation_matrix", "text_intradoc_span_dedup",
    "multimodal_audio_spectral", "frontend_nl_near_duplicates",
    # (c) the 34 r4-stale rows — due this round or the floor breaks.
    # UDx + streaming first (the families the r7 verdict called out),
    "udf_scalar_python", "udf_vectorized_scalar", "udf_grouped_zscore",
    "udtf_tokenize_lateral",
    "streaming_stateful_user_stats", "streaming_tumbling_watermark",
    # legacy similarity/dedup still registered (the rows-only four are
    # retired — their twins carry the certification),
    "dedup_embedding_cosine", "dedup_ngram_jaccard_blocked",
    "similarity_threshold_search",
    # agg/function-library block,
    "agg_approx_count_distinct", "agg_count_if_bool", "agg_cube",
    "agg_grouping_sets", "agg_having", "agg_listagg",
    "explode_posexplode", "hash_functions", "join_cross",
    "map_struct_functions", "math_functions", "unpivot_melt",
    # front-ends (GraphQL / NL / SQL passthrough),
    "frontend_graphql_aggregate", "frontend_graphql_nested_list",
    "frontend_nl_aggregate", "frontend_nl_count",
    "frontend_nl_join_aggregate", "frontend_nl_topn",
    "frontend_sql_passthrough",
    # remaining r4 stragglers,
    "q11_important_parts", "sample_systematic", "sliding_window_agg",
    "text_fingerprint", "text_quality", "text_token_counts",
    # (0 slots left) — the full r5 cohort (49 rows) leads r9.
    # ---- 50-cap boundary: everything below is r9's (c) head ----
    "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q4_order_priority", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit",
    "q12_shipping_delay_class",
    "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_discounted_revenue",
    "q20_part_promotion_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q16_supplier_relation_count", "projection_expressions",
    "filter_predicates", "distinct_projection",
    "null_three_valued_logic", "join_star_counts", "join_left_outer",
    "join_full_outer", "sessionization", "sessionization_salted",
    "window_rolling_median", "session_window_agg", "asof_join_nearest",
    "events_incremental_rollup", "timeseries_gap_fill",
    "window_range_trailing", "text_contamination_ngram",
    "text_bm25_scores", "text_pii_redaction", "sample_stratified_quota",
    "text_vocab_topk", "dedup_clusters", "frontend_nl_docs_profile",
    "sink_partition_upsert", "source_schema_evolution",
    "sink_compaction", "streaming_stream_stream_join",
    "streaming_dedup_exact", "streaming_session_window",
)


def _reorder() -> None:
    ordered = {}
    for name in _PRIORITY:
        if name in registry.REGISTRY:
            ordered[name] = registry.REGISTRY[name]
    for name, q in registry.REGISTRY.items():
        ordered.setdefault(name, q)
    registry.REGISTRY.clear()
    registry.REGISTRY.update(ordered)


_reorder()

REGISTRY = registry.REGISTRY
