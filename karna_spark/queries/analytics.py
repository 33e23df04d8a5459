"""Warehouse-analytics depth queries (SURVEY.md §2 extension rows
A12-A24, W8, T10/T12/T13, J14, S13) over the events/orders/lineitem
tables.

Classic analytical patterns a reference user would run over tabular
files (reference README.md:2): cohort retention, SCD Type-2 dimension
builds, time-weighted averages and OHLC candles, interval-overlap
joins, grouped OLS regression, equi-depth histograms, z-order layout
clustering, sketch accuracy gates, RFM segmentation, market-basket
affinity, Markov transitions, column profiling, gaps-and-islands
streaks, last-touch attribution, path mining, YoY growth, ABC/Pareto
classification, and delta-encoded interval counting. Each is expressed
as a declarative DataFrame plan — windows and two-phase aggregations,
never self-joins or driver loops — with the 100 TB variant documented
per query.

Float convention (see registry.py): every double output column is the
result of deterministic arithmetic over EXACT intermediates (decimal
sums, integer microseconds, integer counts) followed by one final
round(), so engine-order noise cannot flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from karna_spark.queries.parity import ts_str
from karna_spark.queries.registry import register_query, table

# Microseconds between the fixture's event epoch and the events table
# origin — x-axis recentering keeps regression sums inside BIGINT.
_EPOCH_2024_US = 1_704_067_200_000_000
_US_PER_HOUR = 3_600_000_000


# ---------------------------------------------------------------- A12
@register_query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_date,
           datediff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags="A12 A3 J1",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: cohort retention matrix. Users are cohorted by first-event
    date; each (cohort, day-offset) cell counts distinct active users.
    Two shuffles total: the per-user MIN (map-side combinable to one
    row per user) and the distinct-count aggregate. The cohort frame is
    |users| rows — at 100 TB of events it is still only |users|, and
    the join back is a plain co-partitioned equi-join on user_id (AQE
    broadcasts it when small). No event-to-event self-join anywhere."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    return (
        ev.join(firsts, "user_id")
        .groupBy("cohort_date", F.datediff("d", "cohort_date").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------- W8
@register_query(
    "scd2_dimension_build",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type AS status,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
    tags="W8 W2 P4",
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: Slowly-Changing-Dimension Type 2 build from a change stream.
    Per user, consecutive duplicate statuses are compressed away with
    lag(); each surviving change opens a validity interval closed by
    the next change's lead() (NULL valid_to + is_current flag on the
    open row). ONE shuffle: both windows share the (user_id) partition
    / (ts, event_id) order, so Catalyst plans a single Exchange+Sort
    and evaluates lag and lead in the same Window node. This is the
    standard dimension-history pattern — no self-join, no driver state;
    at 100 TB it scales with the per-user change volume."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        ts_str(F.col("ts"), "valid_from"),
        ts_str(nxt, "valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


# ---------------------------------------------------------------- T10
@register_query(
    "timeseries_twap",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(value AS DECIMAL(18,2)) AS val,
               epoch_us(ts) AS us,
               epoch_us(lead(ts) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id)) AS nxt_us
        FROM events
    )
    SELECT event_type,
           ROUND(CAST(SUM(val * (nxt_us - us)) AS DOUBLE)
                 / CAST(SUM(nxt_us - us) AS DOUBLE), 6) AS twap,
           CAST(COUNT(*) AS BIGINT) AS n_samples
    FROM s
    WHERE nxt_us IS NOT NULL
    GROUP BY event_type
    """,
    tags="T10 W2 F3",
)
def timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: time-weighted average (the TimescaleDB `time_weight`
    pattern). Each sample's value is weighted by its holding duration
    (microseconds to the next sample of the same series, last-observed-
    carried-forward), divided by the observed span. Numerator is an
    EXACT decimal×bigint sum — engine summation order cannot perturb
    it — and the single division + round(6) happens once per group.
    The divisor is the SUM of the weights actually used — which
    telescopes to last-minus-first sample time over the consecutive
    filtered rows — so weights/divisor are consistent and the result
    is a true convex average (never exceeds the observed max). One
    window shuffle on event_type shared with the final aggregate's
    key. At 100 TB: partition by series, order by time — the same plan
    Spark uses for any as-of/LOCF computation; no self-join."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("val"),
        F.unix_micros("ts").alias("us"),
        "ts",
        "event_id",
    )
    s = ev.withColumn("nxt_us", F.lead("us").over(w)).filter(
        F.col("nxt_us").isNotNull()
    )
    return s.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("val") * (F.col("nxt_us") - F.col("us"))).cast("double")
            / F.sum(F.col("nxt_us") - F.col("us")).cast("double"),
            6,
        ).alias("twap"),
        F.count(F.lit(1)).alias("n_samples"),
    )


# ---------------------------------------------------------------- J14
@register_query(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
        SELECT o_orderkey AS k, o_custkey, o_orderpriority,
               CAST(o_orderdate AS DATE) AS s,
               CAST(o_orderdate AS DATE) + CAST((o_orderkey % 5 + 1) AS INT) AS e
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-07-01'
    )
    SELECT a.k AS a_orderkey, b.k AS b_orderkey,
           datediff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1
               AS overlap_days
    FROM iv a JOIN iv b
      ON a.s <= b.e AND b.s <= a.e
    WHERE a.o_orderpriority = '1-URGENT' AND b.o_orderpriority = '5-LOW'
    """,
    tags="J14 J6",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14: interval-overlap join, the scale path for J6's theta-range
    join. A naive `a.s <= b.e AND b.s <= a.e` predicate gives Spark no
    equi-key → BroadcastNestedLoopJoin → O(n·m) at 100 TB. Instead each
    interval is exploded onto the days it covers (bounded fan-out: ≤6
    rows per interval here; bucket width is tuned to median interval
    length in general) and candidates meet in a day-bucketed EQUI-join
    — shuffle-partitionable, AQE-skew-splittable. A pair overlapping d
    days appears in d buckets, so a distinct() collapses duplicates
    before the exact overlap arithmetic. Plan-asserted: no
    BroadcastNestedLoopJoin / CartesianProduct (tests/test_plans.py)."""
    iv = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-07-01"))
        )
        .select(
            F.col("o_orderkey").alias("k"),
            "o_orderpriority",
            F.to_date("o_orderdate").alias("s"),
            F.date_add(
                F.to_date("o_orderdate"),
                (F.col("o_orderkey") % 5 + 1).cast("int"),
            ).alias("e"),
        )
    )
    days = iv.withColumn("day", F.explode(F.sequence("s", "e")))
    a = (
        days.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("k").alias("a_orderkey"), F.col("s").alias("a_s"),
                F.col("e").alias("a_e"), "day")
    )
    b = (
        days.filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("k").alias("b_orderkey"), F.col("s").alias("b_s"),
                F.col("e").alias("b_e"), "day")
    )
    pairs = (
        a.join(b, "day")
        .select("a_orderkey", "b_orderkey", "a_s", "a_e", "b_s", "b_e")
        .distinct()
    )
    return pairs.select(
        "a_orderkey",
        "b_orderkey",
        (
            F.datediff(
                F.least("a_e", "b_e"), F.greatest("a_s", "b_s")
            )
            + 1
        ).alias("overlap_days"),
    )


# ---------------------------------------------------------------- A13
@register_query(
    "agg_linear_regression",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               (epoch_us(ts) - {_EPOCH_2024_US}) // {_US_PER_HOUR} AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums
    """,
    tags="A13 A5",
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: grouped OLS regression (value vs hours-since-origin) from
    sufficient statistics. The five sums (Σx, Σx², Σy, Σxy, Σy²) are
    computed over EXACT intermediates — x is an integer hour offset
    (recentred so Σx² fits BIGINT), y an exact decimal — then slope /
    intercept / r² are one deterministic double expression per group.
    This is the map-side-combinable form: one shuffle moving 6 numbers
    per group, the same plan `regr_slope` would produce but portable
    and hash-stable across engines. At 100 TB: sufficient statistics
    ARE the scalable regression — never collect points."""
    ev = table(spark, sf_dir, "events").selectExpr(
        "event_type",
        f"(unix_micros(ts) - {_EPOCH_2024_US}) div {_US_PER_HOUR} AS x",
        "CAST(value AS DECIMAL(18,2)) AS y",
    )
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, sxy, syy = F.col("sy"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------- A14
@register_query(
    "agg_equidepth_histogram",
    oracle="""
    WITH counts AS (
        SELECT l_quantity AS q, CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT q, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY q ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
               CAST(SUM(c) OVER () AS BIGINT) AS total
        FROM counts
    )
    SELECT CAST((cb * 8) // total AS INT) AS bucket,
           MIN(q) AS lo, MAX(q) AS hi, CAST(SUM(c) AS BIGINT) AS n_rows
    FROM cum GROUP BY 1
    """,
    tags="A14 A6 W3",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: equi-depth histogram (8 buckets over l_quantity) — the
    optimizer-statistics primitive. The naive plan (ntile over raw
    rows) needs a GLOBAL row sort: a single-reducer scan at 100 TB.
    Instead the domain is run-length compressed first (groupBy value →
    |distinct| rows, here 50), and the cumulative window + bucket
    assignment runs over that tiny compressed frame — the global
    window costs |distinct values|, never |rows|. Bucket = floor(8 ×
    cumulative-count-before / total), all integer arithmetic, so both
    engines land identical boundaries."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_quantity").alias("q"))
    counts = li.groupBy("q").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    cum = counts.select(
        "q",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).alias("cb"),
        F.sum("c").over(w_all).alias("total"),
    )
    return (
        cum.groupBy(
            F.expr("CAST((cb * 8) div total AS INT)").alias("bucket")
        )
        .agg(
            F.min("q").alias("lo"),
            F.max("q").alias("hi"),
            F.sum("c").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------- S13
def _zorder_sql_expr(a: str, b: str, bits: int, idiv: str) -> str:
    """Bit-interleave SQL: z = Σᵢ ((a>>i)&1)<<2i | ((b>>i)&1)<<(2i+1),
    spelled as pure non-negative integer arithmetic so the same formula
    (modulo the integer-division spelling: Spark ``div``, DuckDB ``//``)
    computes identical values in both engines."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_SPARK = _zorder_sql_expr("(l_partkey % 256)", "(l_suppkey % 256)", 8, "div")
_Z_DUCK = _zorder_sql_expr("(l_partkey % 256)", "(l_suppkey % 256)", 8, "//")


@register_query(
    "zorder_layout_stats",
    oracle=f"""
    WITH z AS (
        SELECT CAST(({_Z_DUCK}) AS BIGINT) AS zval,
               l_partkey % 256 AS pa, l_suppkey % 256 AS pb
        FROM lineitem
    )
    SELECT CAST(zval // 256 AS BIGINT) AS file_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(pa) AS pa_lo, MAX(pa) AS pa_hi,
           MIN(pb) AS pb_lo, MAX(pb) AS pb_hi
    FROM z GROUP BY 1
    """,
    tags="S13 S8 F2",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13: z-order (Morton) clustering layout — the multidimensional
    file-skipping story behind Delta OPTIMIZE ZORDER. Interleaving the
    bits of (partkey, suppkey) and bucketing rows by z-prefix assigns
    each output file a z-range whose min-max envelope is TIGHT in both
    dimensions simultaneously (each 256-wide z-prefix bucket spans ≤16
    values per dimension — pytest-asserted), so a point/range filter
    on either column prunes ~15/16 of files from footer stats alone.
    The plan is a pure map (integer bit arithmetic, zero UDFs) + one
    aggregate; at 100 TB the write path is `repartitionByRange(zval)`
    with this same expression as the sort key."""
    z = table(spark, sf_dir, "lineitem").selectExpr(
        f"CAST(({_Z_SPARK}) AS BIGINT) AS zval",
        "l_partkey % 256 AS pa",
        "l_suppkey % 256 AS pb",
    )
    return (
        z.groupBy(F.expr("zval div 256").alias("file_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pa").alias("pa_lo"),
            F.max("pa").alias("pa_hi"),
            F.min("pb").alias("pb_lo"),
            F.max("pb").alias("pb_hi"),
        )
    )


# ---------------------------------------------------------------- A15
@register_query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    cnt AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY cur) AS DOUBLE), 6) AS p
    FROM cnt
    """,
    tags="A15 W2 A1",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: first-order Markov transition matrix over per-user event
    sequences — the sequence-statistics primitive behind session
    modeling and next-action prediction features. lead() pairs each
    event with its successor (one window shuffle on user_id), a count
    aggregate collapses to |types|² rows, and the row-normalization
    window runs over that tiny matrix — never the raw events.
    Probabilities are exact-integer ratios rounded once, so both
    engines hash identically. At 100 TB: the only data-scale shuffle
    is the per-user window; everything after is |types|²."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", F.col("event_type").alias("cur"))
        .withColumn("nxt", F.lead("cur").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    w_row = Window.partitionBy("cur")
    return cnt.select(
        "cur",
        "nxt",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_row).cast("double"), 6
        ).alias("p"),
    )


# ---------------------------------------------------------------- A16
@register_query(
    "agg_sketch_accuracy_gate",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS hll_within_5pct,
           TRUE AS p50_within_1pct
    FROM orders GROUP BY o_orderpriority
    """,
    tags="A16 A4 A6",
)
def agg_sketch_accuracy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: sketch ACCURACY gate. A4's approx_count_distinct and A6's
    approx_percentile are the 100 TB path (bounded-memory mergeable
    sketches vs exact distinct/sort), but their value is an accuracy
    CONTRACT. This query computes both the sketch estimate and the
    exact answer in one aggregate and emits the tolerance verdicts
    (HLL at rsd=0.015 within 5% of exact distinct — a >3σ margin, so
    the gate tests the contract, not sketch luck;
    approx_percentile(accuracy=10000) within 1% of the exact median).
    The oracle pins the verdicts TRUE:
    if a Spark upgrade ever degrades a sketch past tolerance, the
    driver's hash gate — not just a unit test — goes red. Exact
    columns double as the A3 correctness anchor."""
    od = table(spark, sf_dir, "orders")
    agg = od.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", 0.015).alias("hll"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_exact"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_distinct",
        (
            F.abs(F.col("hll") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("p50") - F.col("p50_exact")) <= 0.01 * F.col("p50_exact")
        ).alias("p50_within_1pct"),
    )


# ---------------------------------------------------------------- T12
@register_query(
    "timeseries_ohlc",
    oracle="""
    WITH r AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, value,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY 1, 2
    """,
    tags="T12 T1 W1",
)
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: OHLC candle aggregation — the financial-rollup primitive
    (open/high/low/close per series per hour). Open/close are
    positional (first/last in (ts, event_id) order), picked via two
    row_number directions over ONE window partitioning; the aggregate
    then groups on the same (series, bucket) key, so Catalyst reuses
    the window's Exchange — one data-scale shuffle total. All outputs
    are individual source values (no summation), so the hash is exact
    with zero rounding. At 100 TB this is the plan a tick store runs
    per candle build; at extreme per-bucket skew the open/close pick
    degrades gracefully (window, not collect)."""
    w_a = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket"),
            "value",
            "ts",
            "event_id",
        )
        .withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
    )
    return r.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ).select(
        "event_type",
        ts_str(F.col("bucket"), "bucket_hour"),
        "open", "high", "low", "close", "n_ticks",
    )


# ---------------------------------------------------------------- A17
@register_query(
    "events_rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events),
    per_user AS (
        SELECT user_id,
               datediff('day', MAX(CAST(ts AS DATE)), (SELECT d0 FROM anchor))
                   AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM events GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, ROUND(monetary, 2) AS monetary,
           ntile(4) OVER (ORDER BY recency_days, user_id) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_quartile
    FROM per_user
    """,
    tags="A17 A1 W1",
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: RFM (recency/frequency/monetary) customer segmentation.
    The data-scale work is ONE per-user aggregate (map-combinable).
    Quartiles are then EXACT NTILE(4) semantics, but computed without
    a global single-reducer sort: each metric's total-order rank comes
    from the two-phase range-partitioned prefix count
    (operators/prefix.py row_rank — balanced local windows + a
    metadata-scale offsets window), and ntile_from_rank converts
    (rank, |users|) to the bucket with the same first-buckets-get-the-
    remainder rule SQL NTILE uses. user_id tie-breaks make each total
    order unique, so assignment is deterministic in both engines and
    hash-matches the oracle's real ntile. Monetary sums are exact
    decimals; the rounded double is only displayed, never ranked."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    anchor = ev.agg(F.max("d").alias("d0"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("val").cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("d0", "last_d").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from karna_spark.operators.prefix import ntile_from_rank, row_rank

    n_users = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = row_rank(per_user, ["recency_days", "user_id"], out_col="_rn_r")
    ranked = row_rank(
        ranked, [F.col("frequency").desc(), F.col("user_id")], out_col="_rn_f"
    )
    ranked = row_rank(
        ranked, [F.col("monetary").desc(), F.col("user_id")], out_col="_rn_m"
    )
    return ranked.crossJoin(F.broadcast(n_users)).select(
        "user_id",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        ntile_from_rank(4, F.col("_rn_r"), F.col("_n")).alias("r_quartile"),
        ntile_from_rank(4, F.col("_rn_f"), F.col("_n")).alias("f_quartile"),
        ntile_from_rank(4, F.col("_rn_m"), F.col("_n")).alias("m_quartile"),
    )


# ---------------------------------------------------------------- A18
@register_query(
    "basket_affinity_lift",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM ob),
    brand_c AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM ob GROUP BY brand),
    pair_c AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM ob a JOIN ob b ON a.o = b.o AND a.brand < b.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, c_ab,
           ROUND(CAST(c_ab AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(c_ab AS DOUBLE) * n.n_orders / (ca.c * cb.c), 6) AS lift
    FROM pair_c
    JOIN brand_c ca ON ca.brand = brand_a
    JOIN brand_c cb ON cb.brand = brand_b
    CROSS JOIN n
    WHERE c_ab >= 20
    """,
    tags="A18 J1 A1",
)
def basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: market-basket affinity (support + lift per brand pair).
    The pair join is on the ORDER key, so fan-out is bounded by basket
    width (≤7 lineitems per TPC-H order — never corpus²); brand
    marginals and the order count are tiny frames that broadcast back
    onto the |brands|² pair aggregate. Dimension lookup (part→brand)
    broadcasts. Support/lift are exact integer ratios rounded once —
    engine-identical. At 100 TB: identical shape; the only data-scale
    shuffles are the distinct (order, brand) projection and the
    order-keyed pair join, both partitioned on the basket key."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    # Order count stays IN the plan as a broadcast 1-row frame (no
    # eager .count() at build — plan construction must run zero jobs).
    n_frame = ob.agg(F.countDistinct("o").alias("n_orders"))
    brand_c = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("c"))
    a = ob.select("o", F.col("brand").alias("brand_a"))
    b = ob.select("o", F.col("brand").alias("brand_b"))
    pair_c = (
        a.join(b, "o")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= 20)
    )
    ca = brand_c.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = brand_c.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pair_c.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(n_frame))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(F.col("c_ab").cast("double") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("c_ab").cast("double") * F.col("n_orders") / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------- A19
@register_query(
    "profile_table_stats",
    oracle="""
    SELECT 'o_orderpriority' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderpriority) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderpriority) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
    tags="A19 A3 F1",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: column profiling — the ANALYZE TABLE primitive feeding a
    cost-based optimizer and data-quality checks: per column, null
    count, exact distinct cardinality, and min/max (as strings, so one
    schema profiles any type). ONE scan: all per-column stats compute
    in a single aggregate (Catalyst plans the multi-countDistinct via
    one Expand — a deliberate ×|cols| row amplification that is the
    textbook ANALYZE cost); the wide 1-row result is then unpivoted
    driver-free with stack(). At extreme scale the exact distincts
    swap for the HLL sketches certified by A16 — same plan minus the
    Expand."""
    od = table(spark, sf_dir, "orders")
    cols = ["o_orderpriority", "o_orderstatus", "o_custkey"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = od.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_repr, max_repr)"
    )


# ---------------------------------------------------------------- A20
@register_query(
    "events_longest_streak",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
        FROM flagged
    ),
    run_lens AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, MAX(run_len) AS max_streak
    FROM run_lens GROUP BY user_id
    """,
    tags="A20 W2 W3",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: longest same-event streak per user — the run-length
    encoding idiom (gaps-and-islands) behind habit/engagement metrics
    and repetition detection. Change flags (lag) and the running run-id
    (cumulative sum) share ONE window partitioning/ordering, so the
    whole computation costs a single data-scale shuffle on user_id;
    the two aggregates that follow operate on run-level then user-level
    frames, each strictly smaller. Null-safe inequality (IS DISTINCT
    FROM) opens the first run without a special case."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).withColumn(
        "is_new",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn("run_id", F.sum("is_new").over(w_cum))
    run_lens = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return run_lens.groupBy("user_id").agg(F.max("run_len").alias("max_streak"))


# ---------------------------------------------------------------- A21
@register_query(
    "events_attribution_last_touch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type IN ('click','view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS lt_type,
             last_value(CASE WHEN event_type IN ('click','view')
                             THEN ts END IGNORE NULLS)
               OVER w AS lt_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    attributed AS (
      SELECT COALESCE(CASE WHEN lt_ts >= ts - INTERVAL 3 DAY
                           THEN lt_type END, 'none') AS attributed
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT attributed, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share
    FROM attributed GROUP BY attributed
    """,
    tags="A21 W2 J8",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A21: last-touch conversion attribution — every purchase is
    credited to the user's most recent preceding click/view within a
    3-day lookback, else 'none'. The carry is ignore-nulls last_value
    over the (user, time) window — the LOCF idiom shared with as-of
    joins and TWAP, ONE data-scale shuffle, no event self-join (the
    naive formulation is purchases × touches). The share window runs
    over the 3-row attribution summary. Same total semantics in both
    engines because the frame excludes the current row and ties break
    on event_id."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.when(
        F.col("event_type").isin("click", "view"), F.col("event_type")
    )
    touch_ts = F.when(F.col("event_type").isin("click", "view"), F.col("ts"))
    marked = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn("lt_type", F.last(touch_type, ignorenulls=True).over(w)).withColumn(
        "lt_ts", F.last(touch_ts, ignorenulls=True).over(w)
    )
    attributed = marked.filter(F.col("event_type") == "purchase").select(
        F.coalesce(
            F.when(
                F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 3 DAYS"),
                F.col("lt_type"),
            ),
            F.lit("none"),
        ).alias("attributed")
    )
    counts = attributed.groupBy("attributed").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    w_all = Window.partitionBy()
    return counts.select(
        "attributed",
        "n_purchases",
        F.round(
            F.col("n_purchases").cast("double")
            / F.sum("n_purchases").over(w_all).cast("double"),
            6,
        ).alias("share"),
    )


# ---------------------------------------------------------------- A22
@register_query(
    "events_path_mining",
    oracle="""
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    paths AS (
      SELECT array_to_string(list_slice(seq, i, i+2), '>') AS path
      FROM seqs, LATERAL (SELECT unnest(range(1, len(seq)-1)) AS i) t
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 10
    """,
    tags="A22 A9 O3",
)
def events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A22: behavioral path mining — the top-10 most common 3-step
    event sequences (the Sankey/user-journey primitive). Per-user
    ordered sequences come from sort_array(collect_list(struct)) — the
    struct's (ts, event_id) prefix makes the sort total, so the
    per-user list is deterministic at any parallelism — and the
    sliding 3-grams reuse the text-pipeline's slice idiom (pure map,
    no extra shuffle). The final top-k is count DESC with a full path
    tie-break: a total order, so the LIMIT is engine-stable. At 100 TB
    the per-user list is bounded by per-user activity (same contract
    as sessionization); the path aggregate is |distinct paths| ≤
    |types|³ rows."""
    seqs = (
        table(spark, sf_dir, "events")
        .select("user_id", F.struct("ts", "event_id", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("e")), lambda s: s["event_type"]
            ).alias("seq")
        )
    )
    paths = seqs.select(
        F.explode(
            F.when(
                F.size("seq") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("seq") - 2),
                    lambda i: F.concat_ws(">", F.slice("seq", i, 3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


# ---------------------------------------------------------------- A23
@register_query(
    "agg_yoy_growth",
    oracle="""
    WITH yearly AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_c
      FROM orders GROUP BY 1
    )
    SELECT yr, revenue_c,
           ROUND(CAST(revenue_c AS DOUBLE)
                 / CAST(lag(revenue_c) OVER (ORDER BY yr) AS DOUBLE) - 1, 6)
               AS yoy_growth
    FROM yearly
    """,
    tags="A23 W2 F3",
)
def agg_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A23: year-over-year growth — the reporting staple. Revenue is
    summed in integer cents (exact, order-independent) per year; the
    lag window then runs over the |years| frame (7 rows), so the
    global ordering costs nothing at any data scale. Growth is one
    double division of exact integers, rounded once."""
    yearly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "revenue_c"
            )
        )
    )
    w = Window.orderBy("yr")
    return yearly.select(
        "yr",
        "revenue_c",
        F.round(
            F.col("revenue_c").cast("double")
            / F.lag("revenue_c").over(w).cast("double")
            - 1,
            6,
        ).alias("yoy_growth"),
    )


# ---------------------------------------------------------------- A24
@register_query(
    "agg_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    ranked AS (
      SELECT brand, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, brand) AS BIGINT) AS cum_c,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS total_c
      FROM rev
    )
    SELECT brand, rev_c,
           ROUND(CAST(cum_c AS DOUBLE) / total_c, 6) AS cum_share,
           CASE WHEN cum_c * 10 <= total_c * 8 THEN 'A'
                WHEN cum_c * 100 <= total_c * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
    tags="A24 W3 J1",
)
def agg_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A24: ABC / Pareto classification — brands ranked by revenue and
    cut at cumulative 80% (A) / 95% (B), the inventory-prioritization
    staple. Revenue aggregates to the |brands| frame first (exact
    integer cents), so the cumulative window ranks ~25 rows, never the
    fact table. Class cuts are INTEGER comparisons (cum·10 ≤ total·8)
    — no float threshold can flip a boundary row differently per
    engine; the reported share is a round-6 display value only.
    Dimension lookup broadcasts."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pt = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "rev_c"
            )
        )
    )
    w_cum = Window.orderBy(F.col("rev_c").desc(), "brand").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "brand",
        "rev_c",
        F.sum("rev_c").over(w_cum).alias("cum_c"),
        F.sum("rev_c").over(w_all).alias("total_c"),
    )
    return ranked.select(
        "brand",
        "rev_c",
        F.round(F.col("cum_c").cast("double") / F.col("total_c"), 6).alias(
            "cum_share"
        ),
        F.when(F.col("cum_c") * 10 <= F.col("total_c") * 8, "A")
        .when(F.col("cum_c") * 100 <= F.col("total_c") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# ---------------------------------------------------------------- T13
@register_query(
    "orders_backlog_timeline",
    oracle="""
    WITH iv AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m_open,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)
                  + CAST((o_orderkey % 90 + 1) AS INT)) AS DATE) AS m_close
      FROM orders
    ),
    deltas AS (
      SELECT m_open AS m, CAST(1 AS BIGINT) AS d FROM iv
      UNION ALL
      SELECT m_close, CAST(-1 AS BIGINT) FROM iv
    ),
    agg AS (SELECT m, CAST(SUM(d) AS BIGINT) AS net FROM deltas GROUP BY m)
    SELECT m, net, CAST(SUM(net) OVER (ORDER BY m) AS BIGINT) AS open_orders
    FROM agg
    """,
    tags="T13 T7 W3",
)
def orders_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: concurrent-interval counting (open orders per month) via
    DELTA ENCODING — each order contributes +1 at its open month and
    -1 at its close month; a per-month sum then a cumulative window
    yields the live backlog. This replaces the naive interval-stabbing
    join (months × orders, a theta join) with O(n) delta rows and a
    window over the |months| frame — the same trick behind
    "concurrent sessions over time" at any scale. Lifetime here is a
    deterministic function of the key ((o_orderkey % 90)+1 days) so
    both engines derive identical intervals. All-integer arithmetic."""
    iv = table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m_open"),
        F.date_trunc(
            "month",
            F.date_add(
                F.to_date("o_orderdate"), (F.col("o_orderkey") % 90 + 1).cast("int")
            ),
        )
        .cast("date")
        .alias("m_close"),
    )
    deltas = iv.select(F.col("m_open").alias("m"), F.lit(1).alias("d")).unionByName(
        iv.select(F.col("m_close").alias("m"), F.lit(-1).alias("d"))
    )
    agg = deltas.groupBy("m").agg(F.sum("d").cast("bigint").alias("net"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return agg.select(
        "m", "net", F.sum("net").over(w).cast("bigint").alias("open_orders")
    )


# ---------------------------------------------------------------- A25
@register_query(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT day FROM ud) d
      JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    )
    SELECT day, dau, wau FROM dau JOIN wau USING (day)
    """,
    tags="A25 A3 T2",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A25: daily/weekly active users — the sliding DISTINCT
    aggregation, which windows cannot express (no count-distinct over
    a frame). The scalable shape: dedup to (user, day) FIRST (one
    shuffle, |users|·|days| rows max), then each active day
    contributes to the 7 trailing report days via a bounded ×7
    explode, and a plain count-distinct per report day finishes. The
    oracle uses the naive day×activity range join — the plan this
    rewrite avoids, because at 100 TB the range join re-scans the
    activity table once per day while the contribution explode is one
    linear pass. Same family as T13's delta encoding: turn a sliding
    predicate into bounded per-row fan-out."""
    ud = (
        table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return dau.join(wau, "day")


# ---------------------------------------------------------------- A26
@register_query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS relationship,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS child_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS orphan_rows
    UNION ALL
    SELECT 'orders.o_custkey -> customer.c_custkey',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey -> part.p_partkey',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    """,
    tags="A26 J4 A2",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A26: referential-integrity audit — the dbt-style relationship
    test (child rows whose foreign key has no parent), the data-quality
    gate a landing zone runs before publishing. Each relationship is
    one LEFT ANTI join (hash relationship, parent side broadcast when
    small) counted map-side — never a full outer materialization. The
    oracle pins the fixture's conformance (zero orphans) alongside the
    child-row totals, so the hash certifies both the mechanism and the
    dataset contract; a regression that drops parent rows or breaks
    the join key turns this row red."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    pt = table(spark, sf_dir, "part")

    def audit(child, ckey, parent, pkey, label):
        total = child.select(F.count(F.lit(1)).alias("child_rows"))
        orphans = (
            child.join(parent.select(pkey), child[ckey] == parent[pkey], "left_anti")
            .select(F.count(F.lit(1)).alias("orphan_rows"))
        )
        return (
            total.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(label).alias("relationship"), "child_rows", "orphan_rows"
            )
        )

    return (
        audit(li, "l_orderkey", od, "o_orderkey",
              "lineitem.l_orderkey -> orders.o_orderkey")
        .unionByName(
            audit(od, "o_custkey", cu, "c_custkey",
                  "orders.o_custkey -> customer.c_custkey")
        )
        .unionByName(
            audit(li, "l_partkey", pt, "p_partkey",
                  "lineitem.l_partkey -> part.p_partkey")
        )
    )


# ---------------------------------------------------------------- A27
@register_query(
    "events_winsorized_stats",
    oracle="""
    WITH v AS (
        SELECT event_type, event_id, CAST(value AS DECIMAL(18,2)) AS val
        FROM events
    ),
    r AS (
        SELECT event_type, val,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY val, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v
    ),
    cuts AS (
        SELECT event_type,
               MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN val END) AS lo,
               MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN val END) AS hi
        FROM r GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 4) AS mean_raw,
           ROUND(CAST(SUM(least(greatest(val, lo), hi)) AS DOUBLE)
                 / COUNT(*), 4) AS mean_winsorized,
           CAST(SUM(CASE WHEN val < lo OR val > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped
    FROM v JOIN cuts USING (event_type)
    GROUP BY v.event_type
    """,
    tags="A27 A6 W1",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27: exact winsorization — clip each series' values to its
    nearest-rank [p5, p95] and report raw vs winsorized means (the
    robust-statistics preprocessing step). Cut points are ACTUAL data
    values at rank ceil(p·n) — no float interpolation, so both engines
    pick byte-identical cuts, and the means are exact decimal sums
    divided once. The per-series ranking is the two-phase
    range-partitioned prefix count (operators/prefix.py): a PARTITION
    BY event_type window would put |events|/|types| rows on ~5
    reducers; here every window group is a range partition. Cut rows
    are filtered to 2·|types| rows and broadcast back."""
    from karna_spark.operators.prefix import row_rank

    v = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    n_g = v.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = row_rank(
        v, ["val", "event_id"], group_by=["event_type"], out_col="rn"
    ).join(F.broadcast(n_g), "event_type")
    k_lo = ((F.col("n") * 5 + 99) - (F.col("n") * 5 + 99) % 100) / 100
    k_hi = ((F.col("n") * 95 + 99) - (F.col("n") * 95 + 99) % 100) / 100
    cuts = (
        ranked.filter((F.col("rn") == k_lo) | (F.col("rn") == k_hi))
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == k_lo, F.col("val"))).alias("lo"),
            F.max(F.when(F.col("rn") == k_hi, F.col("val"))).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("val"), F.col("lo")), F.col("hi"))
    # Final aggregate reads `ranked` (already materialized through the
    # rank shuffle) rather than re-scanning events a second time.
    return (
        ranked.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum("val").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped).cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_winsorized"),
            F.sum(
                ((F.col("val") < F.col("lo")) | (F.col("val") > F.col("hi")))
                .cast("bigint")
            ).alias("n_clipped"),
        )
    )


# ---------------------------------------------------------------- A28
@register_query(
    "dq_k_anonymity",
    oracle="""
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM qi)
    SELECT c_nationkey, c_mktsegment, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS row_share
    FROM qi CROSS JOIN t
    WHERE n < 30
    """,
    tags="A28 A1",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28: k-anonymity audit — group the table by its quasi-identifier
    columns (nation × market segment) and surface every equivalence
    class smaller than k=30: the classes a release would have to
    suppress or generalize. One map-combinable aggregate over the
    table; the class-count frame is |QI-combinations| (metadata-scale),
    so the share computation broadcasts a one-row total. At 100 TB the
    shape is unchanged — the only data-scale operation is the grouped
    count."""
    qi = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = qi.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        qi.crossJoin(F.broadcast(total))
        .filter(F.col("n") < 30)
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "row_share"
            ),
        )
    )


# ---------------------------------------------------------------- A35
_PR_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
         CAST(l_suppkey AS BIGINT) + 1000000 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
params AS (
  SELECT CAST(1000000000000 AS BIGINT) // count(*) AS base FROM nodes
),
r0 AS (SELECT id, base AS rank FROM nodes, params),
c1 AS (
  SELECT e.dst AS id, SUM(r.rank // o.deg) AS s
  FROM edges e JOIN r0 r ON e.src = r.id JOIN outd o ON e.src = o.src
  GROUP BY e.dst
),
r1 AS (
  SELECT n.id, (15 * p.base + 85 * COALESCE(c.s, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN c1 c ON n.id = c.id, params p
),
c2 AS (
  SELECT e.dst AS id, SUM(r.rank // o.deg) AS s
  FROM edges e JOIN r1 r ON e.src = r.id JOIN outd o ON e.src = o.src
  GROUP BY e.dst
),
r2 AS (
  SELECT n.id, (15 * p.base + 85 * COALESCE(c.s, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN c2 c ON n.id = c.id, params p
),
c3 AS (
  SELECT e.dst AS id, SUM(r.rank // o.deg) AS s
  FROM edges e JOIN r2 r ON e.src = r.id JOIN outd o ON e.src = o.src
  GROUP BY e.dst
),
r3 AS (
  SELECT n.id, (15 * p.base + 85 * COALESCE(c.s, 0)) // 100 AS rank
  FROM nodes n LEFT JOIN c3 c ON n.id = c.id, params p
)
SELECT id, CAST(rank AS BIGINT) AS rank FROM r3
"""


@register_query(
    "graph_pagerank_trade",
    oracle=_PR_ORACLE,
    tags="A35 J1 A1",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification-grade distributed PageRank (operators/graphrank.py)
    over the bidirectional customer↔supplier trade graph (suppliers
    offset by 10^6 into a disjoint id space): 3 exact integer Lloyd-
    style iterations, every division truncating on positive operands,
    so DuckDB replays the identical spec as chained CTEs and the
    result hash-matches bit-for-bit — the kmeans (F28) certification
    recipe applied to the iterative-graph family. The curation story:
    rank domains/documents by link authority before sampling a web
    corpus. Per iteration: one |E|-shuffle rank join, one map-side-
    combinable sum by destination, one |V|-scale metadata join; the
    1-row node-count scalar broadcasts. At cluster scale the edge
    list is bucketed by src so the per-iteration join co-locates."""
    from karna_spark.operators.graphrank import pagerank_exact

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("o_custkey").cast("bigint").alias("c"),
            (F.col("l_suppkey").cast("bigint") + 1000000).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    return pagerank_exact(edges, iterations=3)


# ---------------------------------------------------------------- A36
_TRI_ORACLE = """
WITH li AS (
  SELECT DISTINCT l.l_orderkey, CAST(l.l_suppkey AS BIGINT) AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
),
pairs AS (
  SELECT DISTINCT x.s AS a, y.s AS b
  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey AND x.s < y.s
),
deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS id FROM pairs UNION ALL SELECT b AS id FROM pairs)
  GROUP BY id
),
ori AS (
  SELECT CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.a ELSE p.b END AS src,
         CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.b ELSE p.a END AS dst,
         CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN db.deg ELSE da.deg END AS ddeg
  FROM pairs p JOIN deg da ON p.a = da.id JOIN deg db ON p.b = db.id
),
tri AS (
  SELECT w1.src AS u, w1.dst AS v, w2.dst AS w
  FROM ori w1 JOIN ori w2
    ON w1.src = w2.src AND (w1.ddeg, w1.dst) < (w2.ddeg, w2.dst)
  JOIN ori e ON e.src = w1.dst AND e.dst = w2.dst
),
pern AS (
  SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT u AS id FROM tri UNION ALL SELECT v AS id FROM tri
    UNION ALL SELECT w AS id FROM tri)
  GROUP BY id
)
SELECT d.id, COALESCE(p.triangles, CAST(0 AS BIGINT)) AS triangles
FROM deg d LEFT JOIN pern p ON d.id = p.id
"""


@register_query(
    "graph_triangle_count",
    oracle=_TRI_ORACLE,
    tags="A36 J1 A1",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A36: exact triangle counting (operators/graphrank.py
    `triangle_counts`) over the January-1995 co-supplier graph —
    suppliers are adjacent when they ship lines of the same order; the
    per-node triangle count is the clustering signal a dedup/community
    pass ranks on (the graph-curation sibling of A35's PageRank).
    Degree-ordered orientation makes the wedge join's fan-out
    O(sqrt(|E|)) per node REGARDLESS of degree skew — the scalable
    formulation (a celebrity node generates no wedges; its edges
    orient outward from low-degree neighbors). The one-month order
    window pushes down to the orders scan (partition/row-group
    pruning); pair generation is per-order local (≤ C(7,2) pairs per
    order). All equi-joins, all integer — hash-certified bit-for-bit
    against the identical DuckDB spec."""
    from karna_spark.operators.graphrank import triangle_counts

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").between("1995-01-01", "1995-01-31"))
        .select("o_orderkey")
    )
    sup = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select("l_orderkey", F.col("l_suppkey").cast("bigint").alias("s"))
        .distinct()
    )
    x = sup.select(F.col("l_orderkey").alias("k"), F.col("s").alias("a"))
    y = sup.select(F.col("l_orderkey").alias("k"), F.col("s").alias("b"))
    pairs = (
        x.join(y, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return triangle_counts(pairs)


# ---------------------------------------------------------------- A37
@register_query(
    "dq_expectations_wap",
    oracle="""
    WITH bad AS (
        SELECT o_orderkey,
               o_custkey + 10000000 AS o_custkey,
               'X' AS o_orderstatus,
               -o_totalprice AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    frame AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        UNION ALL SELECT * FROM bad
    ),
    nbad AS (SELECT COUNT(*) AS v FROM bad),
    ntot AS (SELECT COUNT(*) AS t FROM frame)
    SELECT 'not_null:o_orderpriority' AS expectation,
           CAST(v AS BIGINT) AS violations, CAST(t AS BIGINT) AS total,
           v = 0 AS ok
    FROM nbad, ntot
    UNION ALL
    SELECT 'in_range:o_totalprice', CAST(v AS BIGINT), CAST(t AS BIGINT),
           v = 0
    FROM nbad, ntot
    UNION ALL
    SELECT 'accepted_values:o_orderstatus', CAST(v AS BIGINT),
           CAST(t AS BIGINT), v = 0
    FROM nbad, ntot
    UNION ALL
    SELECT 'unique_key:o_orderkey', CAST(v AS BIGINT), CAST(t AS BIGINT),
           v = 0
    FROM nbad, ntot
    UNION ALL
    SELECT 'referential:o_custkey', CAST(v AS BIGINT), CAST(t AS BIGINT),
           v = 0
    FROM nbad, ntot
    """,
    tags="A37",
)
def dq_expectations_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A37: expectation-suite validation, the AUDIT gate in
    write-audit-publish (operators/expectations.py). Orders get a
    planted bad cohort (every 97th key re-inserted with a NULL priority,
    negative price, unknown status, orphaned custkey, and a duplicate
    key), and the five-expectation suite — not-null, range, accepted
    values, key uniqueness, referential — must report EXACTLY the
    planted violation counts. The oracle derives the counts from the
    plant, never running the validator, so the hash certifies each
    check's semantics (incl. NULL-violates for range/accepted). Scale
    shape: the three row-local checks share ONE map-combinable
    aggregate pass; uniqueness is a two-stage grouped count;
    referential is one broadcast left join counting violations and
    total in the same pass — report size = |expectations| rows. The
    branch-head integration (suite refuses a WAP merge) is pytest-gated
    alongside S26."""
    from karna_spark.operators.expectations import expectation_report

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    orders = table(spark, sf_dir, "orders").select(*cols)
    bad = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_custkey", F.col("o_custkey") + 10000000)
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_totalprice", -F.col("o_totalprice"))
        .withColumn("o_orderpriority", F.lit(None).cast("string"))
    )
    frame = orders.unionByName(bad)
    customer = table(spark, sf_dir, "customer")
    return expectation_report(
        frame,
        [
            {"kind": "not_null", "col": "o_orderpriority"},
            {"kind": "in_range", "col": "o_totalprice", "lo": 0, "hi": 10**9},
            {"kind": "accepted_values", "col": "o_orderstatus",
             "values": ["F", "O", "P"]},
            {"kind": "unique_key", "cols": ["o_orderkey"]},
            {"kind": "referential", "col": "o_custkey", "dim": customer,
             "dim_col": "c_custkey"},
        ],
    )


# ---------------------------------------------------------------- T19
@register_query(
    "events_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS sym
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(sym) AS BIGINT) AS n_events,
           CAST(length(regexp_replace(sym, 'vc*p', '!', 'g'))
                - length(replace(regexp_replace(sym, 'vc*p', '!', 'g'),
                                 '!', ''))
                AS BIGINT) AS n_funnels,
           CAST(regexp_matches(sym, 's[^e]*p') AS INTEGER) AS clean_convert
    FROM seqs
    ORDER BY user_id
    """,
    tags="T19 W5 A9",
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19: sequence pattern detection (MATCH_RECOGNIZE-lite) — per
    user, compress the chronological event stream to a symbol string
    (one char per event: the five fixture types have distinct first
    letters) and run regex patterns over it, the row-pattern
    recognition primitive SQL:2016 spells MATCH_RECOGNIZE and Flink
    CEP spells Pattern.begin/next. Two patterns certified: the count
    of non-overlapping CONTIGUOUS funnels ``view click* purchase``
    (leftmost-first, the semantics both Java regex and RE2 give
    non-overlapping scans), and an existence test for ``signup ...
    purchase with no error between`` (``s[^e]*p`` — SKIP-TO semantics
    over arbitrary gaps). The symbol string makes pattern state a
    regex engine's problem instead of a self-join ladder: a k-step
    funnel as a k-way join shuffles the events table k times, while
    this plan shuffles ONCE (the per-user collect) and scans strings
    map-side. Per-user sequences are bounded by per-user activity —
    the same contract as sessionization (W5) and path mining (A22);
    at 100 TB the groupBy is the only data-scale shuffle.
    DuckDB lacks regexp_count, so the oracle counts funnel matches by
    global-replacing each match with a sentinel and diffing lengths —
    same leftmost non-overlapping scan, independently derived."""
    seqs = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.struct("ts", "event_id", "event_type").alias("e"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list("e")),
                    lambda s: F.substring(s["event_type"], 1, 1),
                ),
            ).alias("sym")
        )
    )
    return seqs.select(
        "user_id",
        F.length("sym").cast("bigint").alias("n_events"),
        F.regexp_count("sym", F.lit("vc*p")).cast("bigint").alias("n_funnels"),
        (F.col("sym").rlike("s[^e]*p")).cast("int").alias("clean_convert"),
    ).orderBy("user_id")
