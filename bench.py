#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + materialize via a
count-style action that forces every operator but doesn't serialize the
full result to the driver). A warmup run of the flagship amortizes JVM
and code-gen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: scan-heavy, join-heavy, agg-heavy, window, and the
# north-star pipeline ops — the queries whose plans represent the
# engine's hot paths. Extended as milestones land.
HEADLINE = [
    # scan/join/agg core (shared with rounds 1-2 — regression anchors)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    # window + north-star pipeline ops + front-end translation
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "similarity_topk_lsh",
    "frontend_graphql_nested_list",
    # text + multimodal hot paths (regression anchors since round 5)
    "text_quality",
    "multimodal_decode_pipeline",
    # heaviest r5 additions (anchored since round 6): iterative CC
    # clustering, sort-merge as-of, two-scan BM25
    "dedup_clusters",
    "asof_join_nearest",
    "text_bm25_scores",
    # r6 additions: semantic dedup (centroid blocking + in-cluster
    # pair join) and the fold-based repetition filter
    "dedup_semantic_keep",
    "text_repetition_filter",
    # r6 batch-2: the composed corpus pipeline (quality → dedup →
    # decontamination → stats) and the posting-list containment join
    "pipeline_training_corpus",
    "dedup_containment",
    # r7: the snapshot/CDC write paths (the only heavy IO-path
    # newcomers without a regression anchor) and the two-phase
    # prefix-sum rewrite of PPS sampling
    "source_cdc_apply",
    "streaming_snapshot_rollup",
    "sample_weighted_pps",
    # r8: the mergeable-sketch rollup workhorses (new perf baselines —
    # the 100 TB rollup layer leans on these)
    "agg_hll_mergeable_rollup",
    "agg_theta_set_algebra",
    # r8 batch-2: the heavy new pipeline ops — corpus-pass segment
    # explosion + broadcast anti-probe, and the snapshot-store
    # write→CDC→dual-manifest-read→full-outer diff path
    "text_boilerplate_strip",
    "snapshot_corpus_diff",
    # r8 batch-3: ExactSubstr span scrub — the sliding-gram explosion
    # is the corpus-heaviest text op in the registry; its hash-
    # prefilter shuffle is the number to watch round-over-round
    "text_duplicate_span_scrub",
    # r8 batch-4: the steady-state ingest workhorses (batch probes a
    # precomputed corpus index; these run per-ingest in production, so
    # their per-batch cost is a first-class number)
    "dedup_incremental_minhash",
    "similarity_ivf_incremental",
    # r9: iterative-graph depth — 3 chained |E|-shuffle rank joins in
    # one plan; the per-iteration join cost is the number to watch
    "graph_pagerank_trade",
    # r9 batch-2: the degree-oriented wedge join (quadratic-in-degree
    # if the orientation is wrong — the number proves it isn't), the
    # feed-only incremental MV refresh path (write→CDF→signed-apply
    # ×2), and the two-pass hashed-feature DSIR scorer
    "graph_triangle_count",
    "snapshot_incremental_mv",
    "sample_dsir_importance",
    # r9 batch-3: the merge-on-read delete path (commit → delete-file
    # write → anti-join read ×3 snapshots → COW carry) and the
    # all-codegen URL normalization + domain reputation join
    "snapshot_mor_delete_read",
    "text_url_domain_stats",
    # r10: the trained language-ID scorer (corpus explode → broadcast
    # model equi-join) and the image perceptual-hash banded join
    # (Arrow kernel + 7-band self-join) — the two new data-scale ops
    "text_lang_id_classifier",
    "dedup_image_phash",
    # r11: HTML main-content extraction (the first stage of a crawl
    # pipeline — synthesized markup → JVM-regex block extraction) and
    # the partition-spec evolution lifecycle (commit → metadata respec
    # → mixed-spec MOR upsert → full migration compact + pruned read)
    "text_html_extract",
    "snapshot_partition_evolution",
    # r11 batch-2: MERGE INTO — the lakehouse writer verb (source-
    # left-target clause join → CDC feed → partition-scoped COW);
    # the clause join + touched-partition rewrite is the cost to
    # watch as the write path every pipeline standardizes on
    "snapshot_merge_into",
    # r11 batch-3: the trained quality classifier — 6 GD iterations,
    # each a corpus-scale per-doc aggregate + per-bucket gradient;
    # the per-iteration cost is the number to watch (the BPE/k-means
    # iteration contract applied to model training)
    "text_quality_classifier",
    # r12: the composite transform-spec lifecycle (commit → respec to
    # bucket+truncate → mixed-spec MOR upsert → migration compact →
    # prune_keys scan + spec_key point read) — the S30b write path's
    # cost anchor, dominated like the other snapshot lifecycles by
    # many small commits (local fixed cost, not data-scale work)
    "snapshot_multifield_spec",
    # r12 batch-2: the NOT-MATCHED-BY-SOURCE merge (full-outer clause
    # join — inherently target-scale; watch it against
    # snapshot_merge_into's delta-scale left join) and the hybrid
    # RRF retrieval (BM25 scan + brute cosine, both truncated to
    # top-100 before fusion — cost should track text_bm25_scores)
    "snapshot_merge_full_sync",
    "retrieval_rrf_fusion",
    # r12 batch-3: binary-sketch ANN (8-byte Hamming candidates +
    # bounded exact rerank — watch against similarity_topk_lsh) and
    # the BPE tokenizer APPLY (map-only nested-replace encode; its
    # per-row cost is the token-counting cost of the whole pipeline)
    "similarity_hamming_rerank",
    "text_bpe_encode",
    # r12 batch-4: the RAG ingest+retrieve pipeline (map-only
    # chunk+embed, bounded TakeOrdered top-k — the embed-side cost
    # anchor complementing pipeline_training_corpus)
    "pipeline_rag_index",
    # r12 batch-5 (extension): broadcast-Bloom decontamination (the
    # map-only probe — watch it against text_contamination_ngram's
    # exact join), the unigram Viterbi tokenizer (distinct-word DP +
    # join-back; its cost anchors the third tokenizer), and the
    # shallow-clone lifecycle (symlink fork + both divergence writes —
    # like the other snapshot lifecycles, small-commit fixed cost)
    "dedup_bloom_decontaminate",
    "text_unigram_tokenize",
    "snapshot_clone_divergence",
]


# FROZEN core subtotal (r11 verdict item 1): the exact r10 anchor set,
# never extended — new anchors grow the headline total, so round-over-
# round comparison needs a like-for-like subtotal that stays the same
# size forever. BENCH JSONs carry core_r10_total alongside the total.
CORE_R10 = frozenset({
    "agg_hll_mergeable_rollup", "agg_theta_set_algebra",
    "asof_join_nearest", "dedup_clusters", "dedup_containment",
    "dedup_image_phash", "dedup_incremental_minhash", "dedup_minhash_lsh",
    "dedup_semantic_keep", "frontend_graphql_nested_list",
    "graph_pagerank_trade", "graph_triangle_count",
    "multimodal_decode_pipeline", "pipeline_training_corpus",
    "q10_returned_items", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "sample_dsir_importance", "sample_weighted_pps",
    "similarity_ivf_incremental", "similarity_topk_lsh", "skew_join_aqe",
    "snapshot_corpus_diff", "snapshot_incremental_mv",
    "snapshot_mor_delete_read", "source_cdc_apply",
    "streaming_snapshot_rollup", "text_bm25_scores",
    "text_boilerplate_strip", "text_bpe_merges_200",
    "text_duplicate_span_scrub", "text_lang_id_classifier",
    "text_quality", "text_repetition_filter", "text_url_domain_stats",
    "window_topk_per_group",
})


def pyloop_probe(n: int = 4_000_000) -> float:
    """Pure-python CPU probe (r11 protocol): the host this sandbox
    runs on suffers contention WAVES invisible to guest load averages
    (1-min load ~0, vmstat steal spikes) — five identical-tree r11
    runs spanned 129.9–212.9 s. A tight arithmetic loop exposes the
    wave directly: ~0.45 s quiet at n=4M, 3–4× that inside a wave.
    Interleaved BETWEEN anchors (not just ambient bookends) so a
    mid-run wave is attributed to the anchor measurements it actually
    overlapped."""
    t0 = time.perf_counter()
    s = 0
    for i in range(n):
        s += i * i
    # keep s live so the loop can't be optimized away
    return time.perf_counter() - t0 if s else 0.0


def run_bpe_anchor(spark, sf_dir: str) -> tuple[float, dict]:
    """Tokenizer-depth BPE anchor: request 200 merges from the sf
    corpus (the r7 query runs a toy 20). Each merge is one distributed
    pair-count aggregate over the |vocab| frame + a 1-row argmax
    collect, so this measures per-iteration cost at real tokenizer
    scale. Timed once (no cold/warm split: the first merges ARE the
    warmup; a second 200-job pass would double bench wall-clock for no
    signal).

    The corpus may EXHAUST before 200 merges (sf0.1 runs dry at ~107 —
    every remaining pair is unique), so total seconds alone is not
    comparable round-over-round if the fixture changes. The JSON
    therefore records merges_requested / merges_learned / s_per_merge
    alongside the total; **s_per_merge is the tracked metric** (r8
    verdict item 7)."""
    from karna_spark.operators.bpe import learn_bpe, word_frequencies
    from karna_spark.queries.registry import table

    spark.catalog.clearCache()
    t0 = time.perf_counter()
    wf = word_frequencies(table(spark, sf_dir, "documents"))
    merges = learn_bpe(wf, num_merges=200)
    sec = round(time.perf_counter() - t0, 3)
    detail = {
        "merges_requested": 200,
        "merges_learned": len(merges),
        "s_per_merge": round(sec / max(len(merges), 1), 4),
        # r11 verdict item 8: the corpus at this SF supports fewer
        # merges than requested (every remaining pair unique) — the
        # denominator of record is merges_learned, and this flag keeps
        # s_per_merge trends from being read against the phantom 200.
        "corpus_exhausted": len(merges) < 200,
    }
    print(f"text_bpe_merges_200: {detail}", file=sys.stderr)
    return sec, detail


def run_skew_anchor(spark, sf_dir: str) -> float:
    """AQE skew-join probe, timed (plan shape is separately asserted in
    tests/test_plans.py; SKEW.md carries the narrative). Builds a copy
    of events where one hot user owns ~50% of rows, forces the shuffle
    join path with fixture-scaled skew thresholds, and times the warm
    enrichment join. Scratch build + stats materialization are outside
    the timed region. Prints the observed skew=true split count to
    stderr for SKEW.md cross-checking."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from karna_spark.queries.registry import table

    work = tempfile.mkdtemp(prefix="bench_skew_")
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        events = table(spark, sf_dir, "events")
        skew_path = os.path.join(work, "events_skewed.parquet")
        events.withColumn(
            "user_id",
            F.when(F.rand(42) < 0.5, F.lit(0)).otherwise(F.col("user_id")),
        ).repartition(32).write.mode("overwrite").parquet(skew_path)
        skewed = spark.read.parquet(skew_path)
        stats_path = os.path.join(work, "stats.parquet")
        skewed.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.avg("value").alias("avg_value")
        ).write.mode("overwrite").parquet(stats_path)
        stats = spark.read.parquet(stats_path)

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        def probe():
            return skewed.join(stats, "user_id").groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.round(F.avg(F.col("value") - F.col("avg_value")), 4).alias(
                    "avg_dev"
                ),
            )

        probe().write.format("noop").mode("overwrite").save()  # warm
        secs = []
        for _ in range(3):  # median-of-3 (r10 protocol)
            t0 = time.perf_counter()
            df = probe()
            df.collect()
            secs.append(round(time.perf_counter() - t0, 3))
        sec = sorted(secs)[1]
        marks = df._jdf.queryExecution().executedPlan().toString().count("skew=true")
        print(f"skew_join_aqe: {marks} skew=true split(s)", file=sys.stderr)
        return sec
    finally:
        for k, val in saved.items():
            if val is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, val)
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # LOAD GATE (r10 protocol): anchor timings are only comparable
    # when the box is quiet. Wait (bounded) for the 1-min average to
    # drop below 1.0 before starting; if it never does, proceed but
    # mark the JSON load_gated so round-over-round diffs know these
    # numbers carry contention, not engine drift — exactly the r9
    # skew/BPE adjudication failure mode this protocol closes.
    gate_deadline = time.time() + float(
        os.environ.get("KARNA_BENCH_GATE_WAIT_SEC", "180")
    )
    while os.getloadavg()[0] >= 1.0 and time.time() < gate_deadline:
        time.sleep(5)
    # Ambient host load, sampled BEFORE our own session spins up 32
    # worker threads — this is the external-contention signal; the
    # post-run sample mostly reflects the bench itself.
    load_ambient = os.getloadavg()
    # True when the gate TIMED OUT with the box still busy, i.e. the
    # numbers below carry external contention. (r10 ADVICE: the old
    # key name 'gated' read as the opposite — "this run was
    # load-gated" — inviting inverted adjudication.)
    load_contended = load_ambient[0] >= 1.0

    from karna_spark.queries import REGISTRY
    from karna_spark.session import get_spark

    # Anchors whose queries were retired from the driver registry (r8:
    # similarity_topk_lsh is certified via its similarity_lsh_recall
    # twin) keep their bench identity by calling the builder directly —
    # round-over-round comparability must not silently break.
    from karna_spark.queries.vectors import similarity_topk_lsh

    unregistered = {"similarity_topk_lsh": similarity_topk_lsh}

    spark = get_spark(app_name="karna_spark_bench")

    names = [n for n in HEADLINE if n in REGISTRY or n in unregistered]

    def run(name: str) -> float:
        # Each query is timed standalone: persisted intermediates from
        # the PREVIOUS query (operators cache sources/candidates for
        # their own multi-consumer plans) are dropped first, so one
        # query's cache pressure can't evict/spill into the next
        # query's measurement — without this, later anchors in the
        # pass degrade as leaked blocks accumulate.
        spark.catalog.clearCache()
        build = (
            REGISTRY[name].builder if name in REGISTRY else unregistered[name]
        )
        t0 = time.perf_counter()
        df = build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # MID-RUN CONTENTION GATING (r11 verdict item 1): the guest load
    # gate above cannot see host-level waves, so every warm anchor
    # measurement is bracketed by a pyloop probe — a run whose probe
    # reads contended is DISCARDED and retried (bounded); an anchor
    # still contended after retries is kept but named in the JSON so
    # round-over-round diffs can exclude it instead of chasing a
    # phantom regression.
    # Threshold: 1.5× the quiet baseline with a small absolute jitter
    # floor. (First r12 run taught the calibration: a +0.25 floor on a
    # 0.16 s baseline let ~2.2× probe readings pass as quiet while the
    # whole run sat in a host wave — the floor exists only to absorb
    # scheduler jitter, so it must stay well under the ~2× wave
    # signature.)
    probe_baseline = min(pyloop_probe() for _ in range(3))
    probe_thresh = max(probe_baseline * 1.5, probe_baseline + 0.1)
    probes: dict[str, list[float]] = {}
    contended_anchors: set[str] = set()
    n_retries = 0

    def measure(name: str) -> float:
        nonlocal n_retries
        sec = 0.0
        for attempt in range(3):  # 1 run + up to 2 retries
            sec = run(name)
            p = pyloop_probe()
            probes.setdefault(name, []).append(round(p, 3))
            if p <= probe_thresh:
                return sec
            n_retries += 1
        contended_anchors.add(name)
        return sec

    # First pass is COLD (includes JVM JIT + whole-stage-codegen
    # compilation); the WARM number is the MEDIAN OF THREE further
    # passes (r10 protocol — one warm pass left ~1.5-1.9× outliers
    # unadjudicable in r9; the median absorbs a single noisy run
    # without hiding a real regression, which shifts all three), each
    # pass probe-gated per anchor (r11 protocol).
    cold = {name: run(name) for name in names}
    warm_runs = [{name: measure(name) for name in names} for _ in range(3)]
    per_query = {
        name: sorted(w[name] for w in warm_runs)[1] for name in names
    }
    # The AQE skew-join probe manages its own warm pass and scratch
    # data; it reports warm-only (the cold slot repeats the number so
    # both maps stay same-keyed for round-over-round diffing). The
    # long single-run anchors (skew, BPE) are probe-BRACKETED, not
    # retried: a retry would double bench wall-clock, so a contended
    # bracket just marks them.
    spark.catalog.clearCache()
    skew_sec = run_skew_anchor(spark, sf_dir)
    p = pyloop_probe()
    probes["skew_join_aqe"] = [round(p, 3)]
    if p > probe_thresh:
        contended_anchors.add("skew_join_aqe")
    cold["skew_join_aqe"] = per_query["skew_join_aqe"] = skew_sec
    # 200-merge BPE depth anchor (r8): single-run like the skew probe.
    bpe_sec, bpe_detail = run_bpe_anchor(spark, sf_dir)
    p = pyloop_probe()
    probes["text_bpe_merges_200"] = [round(p, 3)]
    if p > probe_thresh:
        contended_anchors.add("text_bpe_merges_200")
    cold["text_bpe_merges_200"] = per_query["text_bpe_merges_200"] = bpe_sec
    load_after = os.getloadavg()

    # RETROSPECTIVE re-gating: the live threshold is calibrated from
    # probes taken at run START — a run that BEGINS inside a wave
    # inflates it and passes contended anchors as quiet. Once the run
    # is over, the true quiet floor is the minimum probe observed
    # anywhere in the run; anchors whose median probe exceeds the
    # re-derived threshold get named after the fact (no re-timing —
    # the flag is what round-over-round diffing needs).
    all_probes = [p for ps in probes.values() for p in ps]
    final_baseline = min([probe_baseline] + all_probes)
    final_thresh = max(final_baseline * 1.5, final_baseline + 0.1)
    retro = {
        name
        for name, ps in probes.items()
        if sorted(ps)[len(ps) // 2] > final_thresh
    } - contended_anchors

    total = round(sum(per_query.values()), 3)
    core_r10_total = round(
        sum(s for n, s in per_query.items() if n in CORE_R10), 3
    )
    ncpu = os.cpu_count() or 1
    # Load in the JSON so round-over-round deltas are attributable: a
    # high *ambient* 1-min average means sandbox contention, not an
    # engine regression.
    load = {
        "ambient_1m": round(load_ambient[0], 2),
        "after_1m": round(load_after[0], 2),
        "cpus": ncpu,
        "load_contended": load_contended,
        "warm_protocol": "median_of_3",
    }
    if load_ambient[0] > ncpu * 0.5:
        print(
            f"warning: high ambient load ({load_ambient[0]:.1f} on {ncpu} "
            "cpus) — timings may reflect contention, not engine speed",
            file=sys.stderr,
        )
    payload = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "queries_cold": cold,
                # frozen like-for-like subtotal over the r10 anchor
                # set (see CORE_R10) — THE round-over-round number
                "core_r10_total": core_r10_total,
                "core_r10_n": len([n for n in per_query if n in CORE_R10]),
                "sf": sf,
                "load": load,
                "probe": {
                    "baseline_sec": round(probe_baseline, 3),
                    "threshold_sec": round(probe_thresh, 3),
                    "final_baseline_sec": round(final_baseline, 3),
                    "final_threshold_sec": round(final_thresh, 3),
                    "per_anchor": probes,
                    "contended_anchors": sorted(contended_anchors),
                    "contended_anchors_retro": sorted(retro),
                    "retries": n_retries,
                },
                "bpe": bpe_detail,
            }
    )
    # Durable ground truth (r12 verdict item 2): the r11 round-over-
    # round comparison was LOST because the one-line stdout JSON did
    # not survive the driver's pipe/tail capture (BENCH_r11.json
    # "parsed": null despite rc 0). Self-check that the line
    # round-trips json.loads, write a file twin next to this script,
    # and only then print the line as the FINAL stdout output — a
    # capture glitch can no longer erase a round's numbers.
    json.loads(payload)  # refuse to emit a line that can't be parsed
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    except OSError as exc:  # read-only checkout: stdout still carries it
        print(f"warning: could not write {out_path}: {exc}", file=sys.stderr)
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
