"""Standing registry-wide plan gates (r8 verdict item 2).

Round 8 ran three one-off manual sweeps over every registered plan —
accidental ``Expand``, misplaced nested-loop joins, single-reducer
windows — and each found real wins (Q21's double-distinct Expand,
theta-algebra's 5× shuffle). This module makes those sweeps a
permanent CI gate: every registered query's plan is explained once
(plan-only — no jobs) and checked against explicit allowlists of the
ADJUDICATED occurrences. A new query that re-introduces an accidental
Expand, a BroadcastNestedLoopJoin that isn't a 1-row scalar
broadcast, or a data-scale unpartitioned window fails here the day it
lands, with instructions to either fix the plan or adjudicate the
exception in the allowlist below.

Row-at-a-time Python and CartesianProduct are gated per-query in
tests/test_plans.py (test_no_rowwise_python_in_hot_path); this module
adds the three sweeps that had no mechanical form.
"""

from __future__ import annotations

import pytest

from karna_spark.queries.registry import REGISTRY
from tests.test_plans import _SLOW_BUILDERS

SF = "/root/testdata/sf0.001"

# ---------------------------------------------------------- allowlists
#
# Every entry is an adjudicated exception. Adding a name here requires
# the same adjudication the r8 sweeps applied: say WHY the construct
# is metadata-scale or semantically required at 100 TB.

# Expand is the physical form of duplicate-the-input grouping. It is
# semantic (required) for cube/rollup/grouping-sets/melt, for
# multi-column countDistinct (one pass instead of N scans), and for
# the sliding-window row multiplication; anywhere else it is almost
# always an accidentally-planned multi-distinct (the Q21 bug class).
EXPAND_OK = {
    "agg_grouping_sets",   # A8: GROUPING SETS semantics (r10: the
                           # retired rollup/cube shorthands are
                           # dominated by this row)
    "profile_table_stats", # A23: multi-countDistinct profile, one scan
    "sliding_window_agg",  # T2: overlapping windows duplicate rows by design
    "unpivot_melt",        # P6: melt = Expand by construction
}

# Every adjudicated BroadcastNestedLoopJoin is a crossJoin(broadcast(X))
# where X is a ≤|groups|-row aggregate (corpus stats, quantile cuts,
# recall denominators) — a scalar/metadata broadcast, not a data-scale
# nested loop. (join_cross, the one true-Cartesian entry, was retired
# in the r10 consolidation — no registered query plans a Cartesian.)
BNLJ_OK = {
    "agg_hll_mergeable_rollup",      # 1-row exact-count comparison side
    "frontend_nl_hybrid_search",     # 1-row anchor query-vector frame
    "retrieval_rrf_fusion",          # 1-row dense query-vector frame
    "similarity_hamming_rerank",     # |queries|-row sketch+vector frames
    "agg_kll_quantile_rollup",       # 1-row exact-quantile comparison side
    "basket_affinity_lift",          # 1-row n_baskets marginal
    "dq_k_anonymity",                # 1-row total-rows denominator
    "dq_referential_integrity",      # 1-row totals frame
    "events_funnel_conversion",      # 1-row step-entry denominators
    "events_rfm_segmentation",       # 1-row user-count frame (prefix ntile)
    "events_session_length_histogram",  # 1-row session-count denominator
    "frontend_nl_bm25_topk",         # 1-row (N, avgdl) corpus stats (r9)
    "graph_pagerank_trade",          # 1-row node-count base scalar (r9)
    "q11_important_parts",           # 1-row global value threshold
    "q22_global_sales_opportunity",  # 1-row avg acctbal scalar
    "sample_dsir_importance",        # 1-row (t_total, r_total) corpus totals (r9b)
    "sample_mixture_hash_threshold", # per-source threshold frame
    "sample_temperature_by_lang",    # 5-row language quota frame
    "sample_weighted_pps",           # 1-row total-weight scalar
    "similarity_ivf_incremental",    # 1-row recall denominator
    "similarity_lsh_recall",         # 1-row recall denominator
    "similarity_topk_bruteforce",    # 1-row query-vector frame
    "text_bigram_logprob",           # 1-row corpus-total frame
    "text_lang_id_classifier",       # |langs|x|bigrams| model build +
                                     # 5-row floors frame (r10)
    "text_stupid_backoff_logprob",   # 1-row (N, V) train-totals frame (r9c)
    "text_bm25_scores",              # 1-row (N, avgdl) corpus stats
    "text_unigram_logprob",          # 1-row corpus-total frame
    "timeseries_gap_fill",           # 1-row (min_ts, max_ts) spine seed
}

# Unpartitioned (single-reducer) windows, allowed ONLY over
# metadata-scale frames: aggregated |groups| rows (gated by the
# HashAggregate-before-SinglePartition tests in test_plans.py) or the
# prefix machinery's numPartitions×|groups| subtotal frame
# (tests/test_prefix.py).
UNPARTITIONED_WINDOW_OK = {
    "agg_abc_pareto",               # |brands| cumulative share
    "frontend_nl_hybrid_search",    # rank windows AFTER top-100/limit-k
                                    # truncation (topn_ranks/rrf_fuse)
    "pipeline_rag_index",           # fused rank over <= k rows post-limit
    "retrieval_rrf_fusion",         # rank windows AFTER top-100/limit-k
                                    # truncation (topn_ranks/rrf_fuse)
    "agg_equidepth_histogram",      # |distinct values| cumulative counts
    "agg_yoy_growth",               # |years| lag frame
    "events_attribution_last_touch",  # |channels| share-of-total
    "events_rfm_segmentation",      # _pfx_sub subtotal frame
    "orders_backlog_timeline",      # |months| cumulative net
    "pipeline_training_corpus",     # |langs| token-budget frame
    "sample_weighted_pps",          # _pfx_sub subtotal frame
}


def _window_partition_groups(line: str) -> list[str]:
    """Top-level bracket groups of a Window plan line, minus the
    expression list and any ORDER BY group — what remains is the
    partition spec (possibly empty)."""
    groups: list[str] = []
    depth = 0
    cur = ""
    for ch in line:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
            else:
                cur += ch
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
            else:
                cur += ch
        elif depth > 0:
            cur += ch
    # groups[0] is the window expression list; of the rest, the ORDER
    # group carries ASC/DESC markers.
    return [g for g in groups[1:] if "ASC" not in g and "DESC" not in g]


@pytest.fixture(scope="module")
def plans(spark) -> dict[str, str]:
    """One simple-mode explain per sweepable registry query. Plan-only:
    building + explaining costs milliseconds per query."""
    out: dict[str, str] = {}
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    for name, q in REGISTRY.items():
        if name in _SLOW_BUILDERS:
            continue
        df = q.builder(spark, SF)
        out[name] = df._jdf.queryExecution().explainString(jvm_mode)
    return out


def test_no_unadjudicated_expand(plans):
    offenders = sorted(
        n for n, p in plans.items() if "Expand" in p and n not in EXPAND_OK
    )
    assert not offenders, (
        f"accidental Expand in {offenders} — usually a multi-distinct "
        "aggregate Catalyst planned as Expand (the Q21 r8 bug class). "
        "Rewrite (split the distincts / pre-aggregate) or adjudicate in "
        "EXPAND_OK with a reason."
    )
    # the allowlist itself stays live — a stale entry means the query
    # was fixed/renamed and the list should shrink
    stale = sorted(
        n for n in EXPAND_OK if n in plans and "Expand" not in plans[n]
    )
    assert not stale, f"EXPAND_OK entries no longer plan an Expand: {stale}"


def test_no_unadjudicated_nested_loop_join(plans):
    offenders = sorted(
        n
        for n, p in plans.items()
        if ("BroadcastNestedLoopJoin" in p or "CartesianProduct" in p)
        and n not in BNLJ_OK
    )
    assert not offenders, (
        f"nested-loop/cartesian join in {offenders} — at 100 TB this is "
        "O(n·m) data movement. Give the join an equi-key (blocking, "
        "banding, bucketing) or, if the build side is a ≤|groups|-row "
        "scalar frame, adjudicate in BNLJ_OK with the frame size."
    )


def test_no_unadjudicated_unpartitioned_window(plans):
    offenders = []
    for name, plan in plans.items():
        if name in UNPARTITIONED_WINDOW_OK:
            continue
        for line in plan.splitlines():
            s = line.strip(" :+-*")
            if not s.startswith("Window "):
                continue
            parts = _window_partition_groups(s)
            if not parts or all(g.strip() == "" for g in parts):
                offenders.append((name, s[:120]))
                break
    assert not offenders, (
        f"unpartitioned window(s) in {offenders} — a single reducer "
        "sorts the whole frame at 100 TB. Partition the window, use the "
        "prefix machinery (operators/prefix.py), or adjudicate in "
        "UNPARTITIONED_WINDOW_OK if the frame is metadata-scale."
    )
