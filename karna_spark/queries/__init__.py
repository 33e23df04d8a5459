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
# queries. Front-load one representative of EVERY operator family
# (SURVEY.md §2.1-§2.10) so that a count- or time-capped harness run
# still exercises the full surface; the remaining entries (more TPC-H
# shapes, slower sources/streaming builders) follow.
_PRIORITY: tuple[str, ...] = (
    # flagship + bench set (S3 P* A* J* O*)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items",
    # representative TPC-H extensions (subqueries, decorrelation, outer joins)
    "q2_min_cost_supplier", "q4_order_priority", "q9_product_type_profit",
    "q12_shipping_delay_class", "q13_customer_distribution",
    "q15_top_supplier", "q18_large_volume_customers", "q21_waiting_suppliers",
    # relational core (P1-P6, J1-J6, O1-O6)
    "projection_expressions", "filter_predicates", "distinct_projection",
    "null_three_valued_logic", "join_star_counts", "join_left_outer",
    "join_full_outer", "join_semi", "join_anti", "join_theta_range",
    "sort_multi_key", "limit_offset_page", "union_all_vs_distinct",
    "intersect_except",
    # aggregation (A1-A10)
    "agg_distinct", "agg_statistical", "agg_percentiles", "agg_rollup",
    "agg_collect", "agg_pivot",
    # windows + time (W1-W5, T1-T3, J8)
    "window_ranking", "window_offsets", "window_running_aggs",
    "window_topk_per_group", "sessionization", "asof_join_events",
    "tumbling_window_agg",
    # scalar function families (F1-F7)
    "string_functions", "datetime_functions", "array_functions",
    "json_functions",
    # north-star pipeline ops (F8-F9, J9, U1-U4)
    "text_lang_id", "dedup_exact_stats", "dedup_minhash_lsh",
    "vector_ops", "similarity_topk_bruteforce",
    # front-ends (§2.10)
    "frontend_graphql_filter_join", "frontend_nl_aggregate",
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
