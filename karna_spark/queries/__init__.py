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
# Round 10 executes the r9 verdict's post-round reorder plus the first
# rule-4 consolidation: 13 strictly-dominated queries retired (each
# builder keeps a RETIRED docstring naming its dominating certified
# superset — agg rollup/cube/having/distinct, NL count/topn/
# docs_profile, join_cross, limit_offset_page, tumbling_window_agg,
# sessionization, multimodal_frame_sampling, text_fingerprint), and
# the rows-only BPE pair is replaced by one hash-certified query, so
# N lands ~210 where floor stays 5 and steady-state demand is
# ~42/50 per round. Head = (a) the r10-born rows, (b) the five
# queries whose operators materially changed with the r9 ADVICE
# fixes, (c) the 19 surviving r5-stale rows, then the oldest r6 rows
# to fill 50. rotation_check.py verifies floor + EDF feasibility.
_PRIORITY: tuple[str, ...] = (
    # (a) no driver row yet — the r10-born rows (registered as they
    # land this round; names listed ahead of implementation so the
    # head stays stable): hash-certified BPE merge learning (F22
    # upgrade), trained language-ID classifier (F31), image
    # perceptual-hash dedup (J20), snapshot schema evolution (S28).
    "text_bpe_merges_exact", "text_lang_id_classifier",
    "dedup_image_phash", "snapshot_schema_evolution",
    # (b) materially changed this round — the r9 ADVICE fixes touched
    # their operators (urls tail-by-position, expectations NULL-FK
    # semantics, mv decimal accumulators, delete_where raw partition
    # keys, MOR broadcast threshold):
    "text_url_domain_stats", "dq_expectations_wap",
    "snapshot_incremental_mv", "snapshot_mor_delete_read",
    "snapshot_changelog_read",
    # (c) the 19 surviving r5-stale rows (deadline r10), registry
    # order:
    "join_left_outer", "join_full_outer", "sessionization_salted",
    "window_rolling_median", "session_window_agg", "asof_join_nearest",
    "events_incremental_rollup", "text_pii_redaction",
    "timeseries_gap_fill", "window_range_trailing",
    "text_contamination_ngram", "text_vocab_topk", "dedup_clusters",
    "sink_partition_upsert", "source_schema_evolution",
    "sink_compaction", "streaming_stream_stream_join",
    "streaming_dedup_exact", "streaming_session_window",
    # (c) the oldest r6 rows fill the remaining slots; whatever
    # spills past 50 leads r11's (c) head:
    "join_semi", "join_anti", "join_theta_range", "sort_multi_key",
    "union_all_vs_distinct", "intersect_except", "join_fuzzy_entity",
    "agg_statistical", "agg_percentiles", "agg_collect", "agg_pivot",
    "window_ranking", "window_offsets", "window_running_aggs",
    "window_topk_per_group", "asof_join_events", "datetime_functions",
    "events_anomaly_mad", "events_funnel_conversion",
    "string_functions", "array_functions", "json_functions",
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
