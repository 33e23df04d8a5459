"""Aggregation surface extensions (SURVEY.md §2.4 A8-A10, §2.7 F4).

GROUPING SETS beyond rollup/cube, ordered string aggregation, boolean /
conditional-count aggregates, unpivot (wide→long reshaping for the
web-UI table surface the reference implies, reference flake.nix:27),
and positional explode. The reference declares this surface only as
"query tabular files ... using SQL" (reference README.md:2 — no
implementation exists, reference karna-core/src/lib.rs:1-14); shapes
here are the standard SQL constructs a front-end must serve.

Scale posture: every query is built-in-expression only (whole-stage
codegen, no Python on executors). GROUPING SETS plans one shuffle per
grouping-set expansion (Spark `Expand` keeps it single-pass);
unpivot/posexplode are narrow (no shuffle at all before their final
aggregation-free projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.queries.parity import dsum, sql_dsum
from karna_spark.queries.registry import register_query, table


# ---------------------------------------------------------------- A8
@register_query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags="A8 A1 A2",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: explicit GROUPING SETS (finer control than rollup/cube) with
    grouping_id disambiguating NULL-as-subtotal from NULL-as-value.
    Catalyst plans this as a single scan + Expand (one row per set per
    input row) + one hash aggregate — not one pass per set, which is
    what makes multi-granularity aggregation viable at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [
            [F.col("l_returnflag"), F.col("l_linestatus")],
            [F.col("l_returnflag")],
            [],
        ],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        dsum("l_quantity", "sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.grouping_id().cast("long").alias("gid"),
    )


# ---------------------------------------------------------------- A9
@register_query(
    "agg_listagg",
    oracle="""
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_name) AS members,
           COUNT(*) AS n_members
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags="A9 A1 J1 J7 O1",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: ordered string aggregation (LISTAGG / string_agg). Spark's
    collect_list order is partition-arrival order — never reproducible
    on a cluster — so the deterministic spelling is array_sort before
    concat_ws; the oracle's string_agg(... ORDER BY) pins the same
    order. The nation dimension broadcasts; one shuffle on n_name."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("members"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------- A1/A5
@register_query(
    "agg_count_if_bool",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc_gt5,
           bool_and(l_quantity >= 1) AS all_qty_pos,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags="A1 P4 O1",
)
def agg_count_if_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-count and boolean aggregates (count_if / bool_and /
    bool_or) — the idiomatic spelling of SUM(CASE WHEN ...) quality
    gates a data-pipeline health check runs per partition of a 100 TB
    table. All JVM built-ins; partial aggregation applies as usual."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_disc_gt5"),
            F.bool_and(F.col("l_quantity") >= 1).alias("all_qty_pos"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- A10
@register_query(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey,
                 CAST(p_size AS DOUBLE) AS size,
                 p_retailprice AS retailprice
          FROM part)
    UNPIVOT (value FOR metric IN (size, retailprice))
    """,
    tags="A10 P1 P5",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 inverse: unpivot / melt (wide→long), the reshaping a web UI
    needs to chart N metrics from one row. Narrow operation — each input
    row expands in place to one row per metric, no shuffle. Metric
    columns are unified to DOUBLE (unpivot requires a common value
    type in both engines)."""
    part = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------- F4/U4
@register_query(
    "explode_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents
          WHERE doc_id % 20 = 0)
    """,
    tags="F4 F1 P2",
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: positional explode — tokenize and keep each token's offset
    (the shape shingling/n-gram pipelines start from). Zero-shuffle
    narrow op; the generator runs inside codegen. The doc_id filter
    pushes down to the parquet scan before any splitting happens."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("long"))


# ---------------------------------------------------------------- A29
@register_query(
    "agg_hll_mergeable_rollup",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    daily AS (
        SELECT CAST(day AS VARCHAR) AS scope,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM d GROUP BY day
    )
    SELECT scope, n_exact, TRUE AS within_tol FROM daily
    UNION ALL
    SELECT 'ALL' AS scope,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM d
    """,
    tags="A29 A4 A16",
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29: MERGEABLE distinct-count sketches (Apache DataSketches HLL
    via ``hll_sketch_agg``) — the capability ``approx_count_distinct``
    lacks: per-day sketches are built ONCE, then re-aggregated to any
    coarser scope by sketch union without touching raw data (the
    pre-aggregated rollup/OLAP-cube workflow at 100 TB: store one
    sketch per partition, answer distinct-count queries over arbitrary
    date ranges from sketch unions). Certified with the A16 gate
    pattern: both the per-day estimates and the UNION-merged overall
    estimate must land within 5% of exact counts computed in the same
    job; the emitted columns are the exact counts and the gate
    booleans (engine-portable), never raw float estimates. The
    tolerance test is integer-free-form |est − exact|·20 ≤ exact, one
    comparison per scope."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.count_distinct("user_id").cast("bigint").alias("n_exact"),
    )

    def gate(est, exact):
        return (F.abs(est - exact) * 20 <= exact).alias("within_tol")

    daily_rows = daily.select(
        F.col("day").cast("string").alias("scope"),
        "n_exact",
        gate(F.expr("hll_sketch_estimate(sk)"), F.col("n_exact")),
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_all")
    )
    exact_all = ev.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    all_row = exact_all.crossJoin(F.broadcast(merged)).select(
        F.lit("ALL").alias("scope"),
        "n_exact",
        gate(F.col("est_all"), F.col("n_exact")),
    )
    return daily_rows.unionByName(all_row)


# ---------------------------------------------------------------- A30
@register_query(
    "agg_theta_set_algebra",
    oracle="""
    WITH e AS (
        SELECT user_id * 100 + date_part('day', ts) AS ud,
               date_part('day', ts) AS d
        FROM events
    )
    SELECT 'p1_first20d' AS scope,
           CAST(COUNT(DISTINCT CASE WHEN d <= 20 THEN ud END) AS BIGINT)
               AS n_exact, TRUE AS within_tol FROM e
    UNION ALL
    SELECT 'p2_last20d',
           CAST(COUNT(DISTINCT CASE WHEN d >= 11 THEN ud END) AS BIGINT),
           TRUE FROM e
    UNION ALL
    SELECT 'union', CAST(COUNT(DISTINCT ud) AS BIGINT), TRUE FROM e
    UNION ALL
    SELECT 'intersection',
           CAST(COUNT(DISTINCT CASE WHEN d BETWEEN 11 AND 20 THEN ud END)
                AS BIGINT), TRUE FROM e
    UNION ALL
    SELECT 'difference',
           CAST(COUNT(DISTINCT CASE WHEN d <= 10 THEN ud END) AS BIGINT),
           TRUE FROM e
    """,
    tags="A30 A4 A16",
)
def agg_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A30: Theta sketches (Apache DataSketches) — distinct counting
    with SET ALGEBRA, which neither approx_count_distinct nor HLL
    offers: build one sketch per period over active user-days, then
    estimate union (either period), intersection (active in BOTH — the
    retention overlap), and difference (only-first-period — churn)
    WITHOUT re-scanning raw data. At 100 TB: one sketch per
    partition/period answers any overlap question by sketch algebra.
    A16-gate certification: every estimate must land within 5% of the
    exact count computed in the same job (both periods + all three
    algebra results); emitted columns are exact counts + gate
    booleans, engine-portable."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") * 100 + F.dayofmonth("ts")).alias("ud"),
        F.dayofmonth("ts").alias("d"),
    )
    # One map-combinable groupBy(ud) replaces five COUNT(DISTINCT ...)
    # in a single Aggregate — Spark plans multi-distinct as an Expand
    # that pushes n_distincts × the corpus through the shuffle; here
    # the shuffle carries one row per distinct user-day instead (and
    # ud encodes its day, so every period/algebra membership is a
    # function of that one row). The theta inputs are the same SETS as
    # before (sketches are duplicate-insensitive), so estimates, exact
    # counts, and gate booleans are identical. Measured 1.56s → ~0.8s
    # warm at sf0.1; at 100 TB it removes a 5× shuffle expansion.
    per_ud = ev.groupBy("ud").agg(F.max("d").alias("d"))
    row = per_ud.agg(
        F.expr("theta_sketch_agg(CASE WHEN d <= 20 THEN ud END)").alias("s1"),
        F.expr("theta_sketch_agg(CASE WHEN d >= 11 THEN ud END)").alias("s2"),
        F.sum((F.col("d") <= 20).cast("long")).alias("e1"),
        F.sum((F.col("d") >= 11).cast("long")).alias("e2"),
        F.count(F.lit(1)).alias("eu"),
        F.sum(F.col("d").between(11, 20).cast("long")).alias("ei"),
        F.sum((F.col("d") <= 10).cast("long")).alias("ed"),
    ).selectExpr(
        "theta_sketch_estimate(s1) AS est1",
        "theta_sketch_estimate(s2) AS est2",
        "theta_sketch_estimate(theta_union(s1, s2)) AS estu",
        "theta_sketch_estimate(theta_intersection(s1, s2)) AS esti",
        "theta_sketch_estimate(theta_difference(s1, s2)) AS estd",
        "e1", "e2", "eu", "ei", "ed",
    )

    def entry(scope, est, exact):
        return F.struct(
            F.lit(scope).alias("scope"),
            F.col(exact).cast("bigint").alias("n_exact"),
            (F.abs(F.col(est) - F.col(exact)) * 20 <= F.col(exact)).alias(
                "within_tol"
            ),
        )

    return row.select(
        F.explode(
            F.array(
                entry("p1_first20d", "est1", "e1"),
                entry("p2_last20d", "est2", "e2"),
                entry("union", "estu", "eu"),
                entry("intersection", "esti", "ei"),
                entry("difference", "estd", "ed"),
            )
        ).alias("r")
    ).select("r.scope", "r.n_exact", "r.within_tol")


# ---------------------------------------------------------------- A31
@register_query(
    "agg_kll_quantile_rollup",
    oracle="""
    WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events)
    SELECT event_type AS scope, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM v GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(COUNT(*) AS BIGINT), TRUE, TRUE FROM v
    """,
    tags="A31 A6 A16",
)
def agg_kll_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A31: MERGEABLE quantile sketches (DataSketches KLL) — the
    quantile analog of the A29 HLL rollup: one KLL sketch per series
    is built once, then group sketches fold-merge
    (``kll_sketch_merge_double``) into an all-data sketch whose
    quantiles come from the merged sketch alone — no second pass over
    raw values, the pre-aggregated-percentile workflow
    approx_percentile can't re-aggregate. Gate: per-series and merged
    p50/p90 estimates must land within 5% of the observed value range
    of the exact interpolated percentiles computed in the same job.
    Emitted: row counts + gate booleans (engine-portable)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    per = ev.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_double(v)").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile(v, 0.5D)").alias("x50"),
        F.expr("percentile(v, 0.9D)").alias("x90"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )

    def ok(q, x):
        return (F.abs(q - F.col(x)) * 20 <= (F.col("hi") - F.col("lo"))).alias(
            f"{x.replace('x', 'p')}_ok"
        )

    per_rows = per.select(
        F.col("event_type").alias("scope"),
        "n",
        ok(F.expr("kll_sketch_get_quantile_double(sk, 0.5D)"), "x50"),
        ok(F.expr("kll_sketch_get_quantile_double(sk, 0.9D)"), "x90"),
    )
    merged = per.agg(
        F.collect_list("sk").alias("sks"),
        F.sum("n").cast("bigint").alias("n"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
    ).selectExpr(
        "aggregate(slice(sks, 2, size(sks) - 1), element_at(sks, 1),"
        " (acc, x) -> kll_sketch_merge_double(acc, x)) AS m",
        "n", "lo", "hi",
    )
    exact_all = ev.agg(
        F.expr("percentile(v, 0.5D)").alias("x50"),
        F.expr("percentile(v, 0.9D)").alias("x90"),
    )
    all_row = merged.crossJoin(F.broadcast(exact_all)).select(
        F.lit("ALL").alias("scope"),
        "n",
        ok(F.expr("kll_sketch_get_quantile_double(m, 0.5D)"), "x50"),
        ok(F.expr("kll_sketch_get_quantile_double(m, 0.9D)"), "x90"),
    )
    return per_rows.unionByName(all_row)


# ---------------------------------------------------------------- A32
@register_query(
    "agg_topk_sketch_merge",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    tags="A32 A4 A16",
)
def agg_topk_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A32: mergeable heavy-hitters — ``approx_top_k_accumulate`` per
    data shard, ``approx_top_k_combine`` across shards,
    ``approx_top_k_estimate`` on the combined state: the
    frequent-items workflow where per-partition sketch states are
    stored once and any union of shards is answered by state combine
    (at 100 TB: one state per file/day, no raw re-scan). The tracked
    capacity exceeds the item cardinality here, so the sketch is in
    its exact regime and the emitted (item, count) rows hash-match the
    plain GROUP BY oracle — certifying the accumulate→combine→estimate
    path end to end, not just within a tolerance."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    states = (
        ev.withColumn("h", F.col("event_id") % 8)
        .groupBy("h")
        .agg(F.expr("approx_top_k_accumulate(event_type, 5)").alias("st"))
    )
    combined = states.agg(F.expr("approx_top_k_combine(st)").alias("c"))
    return combined.select(
        F.explode(F.expr("approx_top_k_estimate(c, 5)")).alias("r")
    ).select(
        F.col("r.item").alias("item"),
        F.col("r.count").cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------- A33
@register_query(
    "agg_hll_sliding_window_merge",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_exact
      FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    )
    SELECT CAST(day AS VARCHAR) AS scope, n_exact, TRUE AS within_tol
    FROM wau
    """,
    tags="A33 A29 A25 T2",
)
def agg_hll_sliding_window_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A33: SLIDING windows answered from stored per-day sketches —
    the serving-side payoff of mergeable HLL (A29). Per-day user
    sketches are built once; every 7-day trailing window is then one
    union of 7 STORED sketches (each day's sketch fans out to its 7
    report days — a |days|x7 metadata-scale explode), never a rescan
    of raw events. This is what a 100 TB rollup layer does on every
    dashboard query: the raw-data pass happens once at ingest, range
    queries are sketch merges. Gated with the A16/A29 pattern against
    the EXACT sliding distinct computed in the same job via the
    certified A25 contribution-explode shape (`events_dau_wau`);
    emitted columns are exact counts + gate booleans, engine-portable
    by construction. Window ends are restricted to days present in
    the data (the same report-day set the oracle produces)."""
    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    contrib = daily.select(
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("rday"),
        "sk",
    )
    est = contrib.groupBy("rday").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = (
        ev.distinct()
        .select(
            "user_id",
            F.explode(F.sequence("day", F.date_add("day", 6))).alias("rday"),
        )
        .groupBy("rday")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_exact"))
    )
    real_days = daily.select(F.col("day").alias("rday"))
    return (
        exact.join(est, "rday")
        .join(F.broadcast(real_days), "rday")
        .select(
            F.col("rday").cast("string").alias("scope"),
            "n_exact",
            (F.abs(F.col("est") - F.col("n_exact")) * 20 <= F.col("n_exact"))
            .alias("within_tol"),
        )
    )


@register_query(
    "profile_correlation_matrix",
    oracle="""
    WITH pairs AS (
      SELECT 'l_quantity' AS x, 'l_extendedprice' AS y,
             corr(l_quantity, l_extendedprice) AS r FROM lineitem
      UNION ALL SELECT 'l_quantity', 'l_discount',
             corr(l_quantity, l_discount) FROM lineitem
      UNION ALL SELECT 'l_quantity', 'l_tax',
             corr(l_quantity, l_tax) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_discount',
             corr(l_extendedprice, l_discount) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_tax',
             corr(l_extendedprice, l_tax) FROM lineitem
      UNION ALL SELECT 'l_discount', 'l_tax',
             corr(l_discount, l_tax) FROM lineitem
    )
    SELECT x, y, ROUND(r, 4) AS pearson_r FROM pairs
    """,
    tags="A19 A5 A34",
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A34: pairwise Pearson correlation profiling across the lineitem
    measures — the data-profiling companion to A19's per-column stats
    and A13's per-group OLS (r = covariance normalized, computed here
    for every measure pair in ONE pass). Plan: a single global
    aggregate evaluates all six `corr` expressions map-side-combined
    (each corr is an algebraic aggregate — sum/sum-sq/cross-sum
    triples — so the shuffle carries one partial-state row per task,
    never data), then the 1-row result unpivots to the (x, y, r)
    triangle via a literal stack. At 100 TB: one scan, one 1-row
    exchange — profiling cost is the scan, as it must be. Rounded to
    4dp per the inexact-aggregate parity convention."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"{a}|{b}")
            for a, b in pairs
        ]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("x"),
                        F.lit(b).alias("y"),
                        F.col(f"`{a}|{b}`").alias("pearson_r"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.x", "p.y", "p.pearson_r")


# ---------------------------------------------------------------- A38
# Width 128 (not the operator's 1024 default) puts the fixture's 150
# users into the visible-collision regime: most probes estimate exact,
# a few carry the one-sided overcount the sketch's error bound is
# about — both replayed exactly by the oracle.
_CM_W = 128


def _cm_oracle() -> str:
    from karna_spark.operators.countmin import DEPTH, cm_position_sql

    item = "CAST(user_id AS VARCHAR)"
    build = "\n      UNION ALL ".join(
        f"SELECT {i} AS seed, {cm_position_sql(item, i, _CM_W)} AS pos FROM events"
        for i in range(DEPTH)
    )
    probe = "\n      UNION ALL ".join(
        f"SELECT user_id, {i} AS seed, "
        f"{cm_position_sql(item, i, _CM_W)} AS pos FROM probes"
        for i in range(DEPTH)
    )
    return f"""
    WITH cells AS (
      SELECT seed, pos, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      {build}
      ) GROUP BY seed, pos
    ),
    probes AS (SELECT unnest(range(0, 20)) AS user_id),
    pc AS (
      {probe}
    ),
    est AS (
      SELECT pc.user_id,
             CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_est
      FROM pc LEFT JOIN cells c USING (seed, pos)
      GROUP BY pc.user_id
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM events WHERE user_id < 20 GROUP BY user_id
    )
    SELECT e.user_id, e.cm_est,
           COALESCE(x.n_exact, 0) AS n_exact,
           e.cm_est - COALESCE(x.n_exact, 0) AS overcount
    FROM est e LEFT JOIN exact x USING (user_id)
    """


@register_query(
    "agg_countmin_merge_estimate",
    oracle=_cm_oracle(),
    tags="A38 A4",
)
def agg_countmin_merge_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A38: Count-Min sketch (operators/countmin.py — Cormode &
    Muthukrishnan 2005), completing the mergeable-sketch quartet next
    to HLL/KLL/top-k: per-DAY sparse sketches over event user_ids
    (≤ depth×width cells per day via one map-side-combinable groupBy),
    cell-wise MERGED across all days (the stored-rollup contract —
    any date range is a sum of stored cells, never a raw re-scan),
    then point-estimated for a fixed 20-user probe set against the
    exact counts computed in the same job. One-sided error by
    construction (overcount ≥ 0); md5-derived positions make every
    estimate — collisions included — replay exactly in the oracle, so
    the row hash-certifies build, merge, and estimate end to end."""
    from karna_spark.operators.countmin import cm_build, cm_estimate, cm_merge

    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    cells = cm_build(ev, "user_id", ["day"], width=_CM_W)
    merged = cm_merge(cells)
    probes = spark.range(0, 20).select(F.col("id").alias("user_id"))
    est = cm_estimate(merged, probes, "user_id", width=_CM_W)
    exact = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return (
        est.join(exact, "user_id", "left")
        .select(
            "user_id",
            "cm_est",
            F.coalesce(F.col("n_exact"), F.lit(0)).alias("n_exact"),
            (F.col("cm_est") - F.coalesce(F.col("n_exact"), F.lit(0))).alias(
                "overcount"
            ),
        )
    )
