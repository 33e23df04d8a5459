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
)

# Registry order is the order the driver's correctness harness visits
# queries, and the harness is count-capped (~50 entries per round).
# Rotation policy: every registered query should carry a driver row
# ≤2 rounds old. Round 5 therefore leads with (a) the six TPC-H shapes
# whose only row is r1 — they spilled past the r4 cap, (b) the
# sessionization trio that regressed in r4 (TIMESTAMP_NTZ) and was
# re-fixed this round — their green must be driver-certified, (c) new
# queries registered this round, then (d) the 50 r2-certified family
# representatives, now three rounds stale themselves. The r3/r4-covered
# half is freshest and spills past the cap via the setdefault loop.
_PRIORITY: tuple[str, ...] = (
    # (a) r1-stale TPC-H shapes — three rounds without a driver row
    "q14_promo_revenue", "q16_supplier_relation_count",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_part_promotion_suppliers", "q22_global_sales_opportunity",
    # (b) the r4 regression trio, fixed this round — re-certify first
    "sessionization", "session_window_agg", "sessionization_salted",
    # (c) new or materially changed this round (q7/q8 re-literaled to
    # fixture vocabulary; their r4 rows certified the old constants)
    "q7_volume_shipping", "q8_market_share",
    "events_incremental_rollup", "asof_join_nearest",
    "streaming_stream_stream_join", "text_contamination_ngram",
    "text_bm25_scores", "text_pii_redaction", "sample_stratified_quota",
    "streaming_dedup_exact", "dedup_clusters", "sink_partition_upsert",
    "text_vocab_topk", "similarity_topk_pq",
    "timeseries_gap_fill", "window_range_trailing",
    "source_schema_evolution", "sink_compaction",
    "streaming_session_window", "window_rolling_median",
    "frontend_nl_docs_profile",
    # (d) r2-certified set (newest row r2) in its original order
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q2_min_cost_supplier",
    "q4_order_priority", "q9_product_type_profit", "q12_shipping_delay_class",
    "q13_customer_distribution", "q15_top_supplier",
    "q18_large_volume_customers", "q21_waiting_suppliers",
    "projection_expressions", "filter_predicates", "distinct_projection",
    "null_three_valued_logic", "join_star_counts", "join_left_outer",
    "join_full_outer", "join_semi", "join_anti", "join_theta_range",
    "sort_multi_key", "limit_offset_page", "union_all_vs_distinct",
    "intersect_except", "agg_distinct", "agg_statistical",
    "agg_percentiles", "agg_rollup", "agg_collect", "agg_pivot",
    "window_ranking", "window_offsets", "window_running_aggs",
    "window_topk_per_group", "asof_join_events", "tumbling_window_agg",
    "string_functions", "datetime_functions", "array_functions",
    "json_functions", "text_lang_id", "dedup_exact_stats",
    "dedup_minhash_lsh", "vector_ops", "similarity_topk_bruteforce",
    "frontend_graphql_filter_join",
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
