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
# Round 2 certified the first 50 family representatives
# (CORRECTNESS_r02.json, all green); round 3 therefore ROTATES the 53
# not-yet-driver-checked entries to the front so that across r2∪r3
# every registered query carries a driver-issued correctness row.
# Within the rotation, one representative of each §2 family that has
# no driver row yet comes first; spare TPC-H shapes (family already
# certified via q1-q21 in r2) are last so only they risk spilling past
# the cap. Previously-certified entries follow via the setdefault loop.
_PRIORITY: tuple[str, ...] = (
    # sources & sinks (S1 S2 S5 S7 S8)
    "source_csv_roundtrip", "source_tsv_roundtrip", "source_multifile_glob",
    "source_partitioned_layout", "sink_result_page", "source_bucketed_join",
    # relational stragglers (J5, O6)
    "join_cross", "sample_systematic",
    # aggregation stragglers (A4 A7 A8 A9 A10, F4)
    "agg_approx_count_distinct", "agg_having", "agg_cube",
    "agg_grouping_sets", "agg_listagg", "agg_count_if_bool",
    "unpivot_melt", "explode_posexplode",
    # time windows (T2 T3) + skew-resilient W5
    "sliding_window_agg", "session_window_agg", "sessionization_salted",
    # scalar function families (F2 F5 F7)
    "math_functions", "map_struct_functions", "hash_functions",
    # UDF surface (U1 U2 U3 U4)
    "udf_scalar_python", "udf_vectorized_scalar", "udf_grouped_zscore",
    "udtf_tokenize_lateral",
    # streaming (T4)
    "streaming_tumbling_watermark", "streaming_stateful_user_stats",
    # text analysis (F9)
    "text_quality", "text_token_counts", "text_fingerprint",
    # dedup variants (J9)
    "dedup_simhash", "dedup_ngram_jaccard_blocked", "dedup_embedding_cosine",
    # similarity search variants (F8)
    "similarity_topk_lsh", "similarity_threshold_search",
    "similarity_topk_ivf",
    # multimodal pipeline
    "multimodal_metadata", "multimodal_decode_pipeline",
    "multimodal_frame_sampling",
    # front-ends (§2.10)
    "frontend_sql_passthrough", "frontend_graphql_aggregate",
    "frontend_graphql_nested_list", "frontend_nl_aggregate",
    "frontend_nl_count", "frontend_nl_topn", "frontend_nl_join_aggregate",
    # remaining TPC-H shapes (family driver-certified in r2; spill OK)
    "q7_volume_shipping", "q8_market_share", "q11_important_parts",
    "q14_promo_revenue", "q16_supplier_relation_count",
    "q17_small_quantity_revenue", "q19_discounted_revenue",
    "q20_part_promotion_suppliers", "q22_global_sales_opportunity",
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
