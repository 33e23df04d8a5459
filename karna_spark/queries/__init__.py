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
# ROTATION POLICY (restated at N>171, r7): every registered query's
# newest driver row must be ≤ ceil(N/50) rounds old (the arithmetic
# floor; 4 rounds at the current N). Each round's top-50 is, in
# order: (a) queries with NO driver row yet (new or past-cap), (b)
# queries materially changed this round, (c) the stalest certified
# cohort, preferring families whose code churned. Whatever spills past
# 50 via the setdefault loop leads the NEXT round's (c). Round 7:
# (a) = the 25 r6-born queries past r6's cap (first driver rows due —
# the r6 verdict's top item) and the 4 r7-born queries, (b) is empty
# as a separate block because every r7-modified query (PPS, packing,
# RFM, TWAP, CDC) is already in (a), (c) = 21 of the 46 r4-certified
# rows, preferring families r7 code touched (sources/snapshots, the
# server result path behind sink_result_page, similarity/dedup,
# multimodal, UDx, streaming). The remaining 25 r4 rows lead r8's (c);
# r8 then continues into the oldest r5 rows so nothing crosses the
# 4-round floor.
_PRIORITY: tuple[str, ...] = (
    # (a) no driver row yet: the 25 r6-born queries past r6's 50-cap
    # (SURVEY.md §8 r7 pre-plan, executed verbatim) ...
    "events_cohort_retention", "scd2_dimension_build",
    "timeseries_twap", "agg_linear_regression",
    "agg_equidepth_histogram", "zorder_layout_stats",
    "dedup_containment", "events_transition_matrix",
    "agg_sketch_accuracy_gate", "streaming_snapshot_rollup",
    "timeseries_ohlc", "events_rfm_segmentation", "basket_affinity_lift",
    "source_cdc_apply", "profile_table_stats", "events_longest_streak",
    "dedup_cluster_keep_best",
    "events_attribution_last_touch", "events_path_mining",
    "agg_yoy_growth", "agg_abc_pareto", "orders_backlog_timeline",
    "events_dau_wau", "sample_weighted_pps", "dq_referential_integrity",
    # ... and the queries born in r7 (two-phase prefix-sum family +
    # data-quality additions)
    "sample_top_p_by_lang", "text_train_val_test_split",
    "events_winsorized_stats", "dq_k_anonymity", "text_ngram_novelty",
    "events_session_length_histogram", "agg_hll_mergeable_rollup",
    "source_jsonl_roundtrip", "window_distribution_ranks",
    "text_bpe_merges", "agg_theta_set_algebra", "agg_kll_quantile_rollup",
    "agg_topk_sketch_merge", "source_orc_roundtrip", "join_null_safe_eq",
    "text_bpe_token_stats",
    # (c) r4-stale rows, churned families first: sources/sinks
    # (SnapshotStore + server result path changed this round),
    "source_csv_roundtrip", "source_tsv_roundtrip",
    "source_multifile_glob", "source_partitioned_layout",
    "source_bucketed_join", "sink_result_page",
    # multimodal + UDx + streaming (r4-certified, untouched since),
    "multimodal_metadata", "multimodal_decode_pipeline",
    "multimodal_frame_sampling",
    # ---- 50-cap boundary: everything below is r8's (c) head ----
    "udf_scalar_python",
    "udf_vectorized_scalar", "udf_grouped_zscore",
    "udtf_tokenize_lateral",
    "streaming_stateful_user_stats", "streaming_tumbling_watermark",
    "dedup_simhash",
    "similarity_topk_lsh", "similarity_topk_ivf", "dedup_embedding_cosine",
    "dedup_ngram_jaccard_blocked", "similarity_threshold_search",
    "agg_approx_count_distinct", "agg_count_if_bool", "agg_cube",
    "agg_grouping_sets", "agg_having", "agg_listagg",
    "explode_posexplode", "frontend_graphql_aggregate",
    "frontend_graphql_nested_list", "frontend_nl_aggregate",
    "frontend_nl_count", "frontend_nl_join_aggregate",
    "frontend_nl_topn", "frontend_sql_passthrough", "hash_functions",
    "join_cross", "map_struct_functions", "math_functions",
    "q11_important_parts", "sample_systematic", "sliding_window_agg",
    "text_fingerprint", "text_quality", "text_token_counts",
    "unpivot_melt",
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
