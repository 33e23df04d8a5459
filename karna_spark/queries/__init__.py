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
#
# ROTATION POLICY (codified at N=205, r9 — the registry scale policy
# the r8 verdict asked for):
#   1. FLOOR: every registered query's newest driver row must be
#      ≤ ceil(N/50) rounds old (5 rounds at the current N).
#   2. HEAD ORDER: each round's top-50 is, in order, (a) queries with
#      NO driver row yet (new queries are certified on their first
#      eligible round — never registered without a path to a row),
#      (b) queries materially changed this round, (c) the stalest
#      certified cohort in registry order. Whatever spills past 50
#      leads the NEXT round's (c).
#   3. FEASIBILITY, not just instantaneous freshness: the plan must
#      stay feasible FOREVER, not merely this round —
#      scripts/rotation_check.py runs an earliest-deadline-first
#      simulation of the next 2×floor rounds (each query's deadline =
#      newest row + floor) and fails if any future round would need
#      more than 50 slots. This is the mechanical form of "don't
#      build a certification cliff".
#   4. CAPACITY: the schedulability bound is N ≤ 50×floor; the policy
#      cap is N ≤ 240 (a 10-row buffer under 250). Past the cap —
#      or whenever the EDF simulation reports sustained ≥48/50
#      utilization — rows whose capability is strictly dominated by a
#      certified superset must be retired/merged before new rows are
#      added (precedent: the r8 retirement of the four rows-only
#      dedup/similarity twins).
#
# Round 11 executes the r10 verdict's post-round reorder. Head =
# (a) the r11-born rows (HTML main-content extraction, partition-spec
# evolution, sequence pattern detection, boolean retrieval, global
# shuffle), (b) the queries whose operators materially changed with
# the r10 ADVICE fixes (snapshots _widest/redact type lattice → the
# evolution read path; the memory-derived MinHash chunk budget), then
# (c) the EDF-obligatory stale cohorts: all 24 r6 rows (deadline r11)
# followed by the first r7 rows in registry order up to slot 50; the
# r7 remainder leads r12's (c) head. rotation_check.py verifies floor
# + EDF feasibility against this order.
_PRIORITY: tuple[str, ...] = (
    # (a) the r11-born rows: HTML→text main-content extraction (F32,
    # operators/html.py), the partition-spec evolution lifecycle (S30,
    # io/snapshots.py:repartition_spec), sequence pattern detection
    # (T19), inverted-index boolean retrieval (F33), and the
    # deterministic global corpus shuffle (O13).
    "text_html_extract", "snapshot_partition_evolution",
    "events_pattern_match", "text_boolean_search",
    "sample_global_shuffle", "snapshot_equality_delete_read",
    "snapshot_stats_agg_pushdown", "snapshot_merge_into",
    "text_quality_classifier",
    # (b) materially changed this round — the r10 ADVICE fixes touch
    # the evolved-read type lattice (_widest int/decimal) and redact's
    # manifest repoint (io/snapshots.py), and the MinHash kernel's
    # chunk cap became memory-budget-derived (operators/dedup.py):
    "snapshot_schema_evolution", "dedup_incremental_minhash",
    # (c) the 24 r6-stale rows (deadline r11), registry order:
    "text_lang_id", "text_repetition_filter",
    "sample_temperature_by_lang", "text_unigram_logprob",
    "text_chunk_documents", "text_sequence_packing",
    "pipeline_training_corpus", "dedup_exact_stats",
    "dedup_minhash_lsh", "dedup_simhash_md5_pairs",
    "dedup_semantic_assign", "dedup_semantic_keep",
    "dedup_shared_ngrams", "vector_ops", "similarity_topk_bruteforce",
    "similarity_lsh_recall", "similarity_ivf_recall",
    "similarity_pq_recall", "frontend_graphql_filter_join",
    "frontend_nl_dynamic_view", "frontend_graphql_dynamic_rel",
    "source_time_travel", "streaming_foreachbatch_upsert",
    "join_interval_overlap",
    # (c) the first 22 r7 rows fill the remaining slots; the other
    # 25 r7 rows lead r12's (c) head:
    "join_null_safe_eq", "agg_hll_mergeable_rollup",
    "agg_theta_set_algebra", "agg_kll_quantile_rollup",
    "agg_topk_sketch_merge", "events_session_length_histogram",
    "window_distribution_ranks", "multimodal_metadata",
    "multimodal_decode_pipeline", "sample_weighted_pps",
    "sample_top_p_by_lang", "text_train_val_test_split",
    "dedup_containment", "dedup_cluster_keep_best",
    "text_ngram_novelty", "source_csv_roundtrip",
    "source_tsv_roundtrip", "source_multifile_glob",
    "source_partitioned_layout", "sink_result_page",
    "source_bucketed_join", "source_cdc_apply",
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
