"""Sources & sinks as oracle-checked queries (SURVEY.md §2.1, M-io).

The reference's data domain is "tabular files like CSV, TSV or parquet"
(reference README.md:2) living in object storage (MinIO, reference
docker-compose.yaml:21-40). Each entry here proves a reader/writer path
end-to-end: export a fixture table through the engine's sink (S8), read
it back through the engine's source (S1/S2/S3/S5), and hash-compare
against the oracle reading the *original* parquet — i.e. the round trip
must be lossless.

Exports land under ``<repo>/.io_cache`` (gitignored); ``file://`` here,
``s3a://`` in production — identical reader/writer code (S4 is a conf
change, karna_spark/io/object_store.py).

Scale notes: CSV/TSV inference costs one extra pass over the text —
at 100 TB you pass an explicit schema (read_table(schema=...)); the
partitioned-parquet entry writes the Hive layout partition pruning
needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.catalog import read_table
from karna_spark.io.sinks import write_table
from karna_spark.queries.registry import register_query, table

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".io_cache")


def _export_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_CACHE, tag, name)


@register_query(
    "source_csv_roundtrip",
    oracle="SELECT * FROM nation",
    tags="S1 S8",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S8: nation → CSV export → CSV scan with header + type
    inference. Lossless for int/string columns; proves the header,
    quoting and inference defaults."""
    out = _export_dir(sf_dir, "nation_csv")
    write_table(table(spark, sf_dir, "nation"), out, fmt="csv")
    return read_table(spark, out, fmt="csv")


@register_query(
    "source_tsv_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    tags="S2 S8",
)
def source_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S8: supplier → TSV export → tab-delimited scan. The 2-decimal
    doubles (s_acctbal) round-trip exactly through decimal text."""
    out = _export_dir(sf_dir, "supplier_tsv")
    write_table(table(spark, sf_dir, "supplier"), out, fmt="tsv")
    return read_table(spark, out, fmt="tsv").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@register_query(
    "source_multifile_glob",
    oracle="SELECT * FROM customer",
    tags="S5 S3 S8",
)
def source_multifile_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: a 'table' as many files — customer written as 4 parquet parts,
    read back via a glob over the part files. At 100 TB a table is
    O(100k) objects behind exactly this code path."""
    out = _export_dir(sf_dir, "customer_parts")
    write_table(table(spark, sf_dir, "customer").repartition(4), out, fmt="parquet")
    return read_table(spark, os.path.join(out, "part-*.parquet"), fmt="parquet")


@register_query(
    "source_partitioned_layout",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority,"
    " o_orderstatus FROM orders WHERE o_orderstatus IN ('F', 'O')",
    tags="S5 S8 S3",
)
def source_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S8: Hive-partitioned export (partitionBy o_orderstatus) +
    partition-discovered read with a partition-pruning filter — the
    layout/pruning pair that makes selective scans at 100 TB touch only
    matching directories (verify: .explain shows PartitionFilters)."""
    out = _export_dir(sf_dir, "orders_by_status")
    write_table(
        table(spark, sf_dir, "orders"), out, fmt="parquet", partition_by=["o_orderstatus"]
    )
    df = read_table(spark, out, fmt="parquet")
    return df.filter(F.col("o_orderstatus").isin("F", "O")).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
    )


@register_query(
    "sink_result_page",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 20 OFFSET 10
    """,
    tags="S7 O1 O2",
)
def sink_result_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: one stable result page (orderBy unique-key + offset + limit)
    — the web/CLI serving shape. Catalyst fuses to a bounded top-k; the
    driver never materializes more than the page."""
    from karna_spark.io.sinks import page

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    return page(cust, [F.col("c_acctbal").desc(), F.col("c_custkey")], limit=20, offset=10)


@register_query(
    "source_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags="S5 S8 J1 V4",
)
def source_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing (io.bucketing): lineitem and
    orders are written bucketed by order key into the same bucket
    count, so the equi-join needs NO shuffle on either side — the
    one-time layout shuffle at write replaces a per-query fact-table
    shuffle at 100 TB (tests/test_plans.py asserts the exchange-free
    join plan). The oracle joins the original tables: bucketing must
    be invisible to results."""
    from karna_spark.io.bucketing import read_bucketed, write_bucketed

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_") or "sf"
    li_name, od_name = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    write_bucketed(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        li_name, ["l_orderkey"], 8,
    )
    write_bucketed(
        table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        od_name, ["o_orderkey"], 8,
    )
    li, od = read_bucketed(spark, li_name), read_bucketed(spark, od_name)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


@register_query(
    "sink_partition_upsert",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    """,
    tags="S8 J4",
)
def sink_partition_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 depth: partition-scoped upsert (io/upsert.py). A store
    partitioned by o_orderstatus is seeded with STALE rows (negated
    totalprice) for every 7th order of status 'O'; the delta re-delivers
    those orders with correct values. The upsert rewrites only the 'O'
    partition — other partitions' files stay byte-identical (pytest
    asserts untouched mtimes) — and the read-back hash-matching the
    plain orders table proves replacement + retention exactly."""
    import shutil

    from karna_spark.io.upsert import upsert_partitioned

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    orders = table(spark, sf_dir, "orders").select(*cols)
    out = _export_dir(sf_dir, "orders_upsert_store")
    stale_key = (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderstatus") == "O")
    # Seed: stale values for the keys the delta will replace.
    shutil.rmtree(out, ignore_errors=True)
    seeded = orders.withColumn(
        "o_totalprice",
        F.when(stale_key, -F.col("o_totalprice")).otherwise(F.col("o_totalprice")),
    )
    seeded.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    delta = orders.filter(stale_key)
    upsert_partitioned(
        spark, delta, out, key_cols=["o_orderkey"], partition_col="o_orderstatus"
    )
    return spark.read.parquet(out).select(*cols)


@register_query(
    "source_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name, NULL AS nation_group FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT n_nationkey, n_name, n_nationkey % 3 AS nation_group
    FROM nation WHERE n_nationkey >= 10
    """,
    tags="S3 S5 P5 S10",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 depth: schema evolution across files of one dataset. An old
    batch (3 columns) and a new batch (an added nation_group column) land in
    the same directory; reading with ``mergeSchema`` unions the footer
    schemas and back-fills NULL for the old files — the
    append-only-evolution contract a long-lived landing zone needs. At
    100 TB mergeSchema costs a footer read per file (listing-scale, not
    data-scale); pinning an explicit schema instead skips even that,
    which is why the catalog supports both paths."""
    import shutil

    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    out = _export_dir(sf_dir, "nation_evolving")
    shutil.rmtree(out, ignore_errors=True)
    old = nation.filter(F.col("n_nationkey") < 10)
    new = nation.filter(F.col("n_nationkey") >= 10).withColumn(
        "nation_group", F.col("n_nationkey") % 3
    )
    old.write.mode("overwrite").parquet(out)
    new.write.mode("append").parquet(out)
    return spark.read.option("mergeSchema", "true").parquet(out).select(
        "n_nationkey", "n_name", "nation_group"
    )


@register_query(
    "sink_compaction",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_orderkey % 11 = 0
    """,
    tags="S8 S3 S11",
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 depth: small-file compaction. A fragmented landing directory
    (24 splits of a selection) is rewritten to a handful of right-sized
    files; the read-back hash-matching the source proves losslessness,
    and pytest asserts the file-count collapse. At 100 TB compaction is
    the difference between listing/opening millions of KB-files and
    thousands of ~128 MB ones — target count = ceil(bytes /
    maxPartitionBytes), here fixed small. Content-preserving by
    construction: one repartition, no dedup/reorder semantics."""
    import shutil

    sel = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 11 == 0
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    frag = _export_dir(sf_dir, "lineitem_fragmented")
    compact = _export_dir(sf_dir, "lineitem_compacted")
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(compact, ignore_errors=True)
    sel.repartition(24).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(2).write.mode("overwrite").parquet(compact)
    return spark.read.parquet(compact)


@register_query(
    "source_time_travel",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
    ),
    delta AS (
        SELECT o_orderkey, o_year, ROUND(o_totalprice + 1.00, 2) AS o_totalprice
        FROM base
        WHERE o_orderkey % 7 = 0 AND o_year IN (1995, 1996)
    ),
    v2 AS (
        SELECT * FROM base
        WHERE NOT (o_orderkey % 7 = 0 AND o_year IN (1995, 1996))
        UNION ALL SELECT * FROM delta
    )
    SELECT 'v1' AS snapshot, * FROM base
    UNION ALL
    SELECT 'v2' AS snapshot, * FROM v2
    """,
    tags="S9 S12",
)
def source_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12: snapshot isolation + time travel (io/snapshots.py — the
    Iceberg-lite manifest store). Orders partitioned by year are
    committed as snapshot v1; an upsert touching two year-partitions
    produces v2 via copy-on-write (untouched years are inherited by
    manifest pointer — zero data movement). The result reads BOTH
    snapshots through their manifests and tags the rows; the oracle
    recomputes each snapshot's expected content from the source table,
    so a hash match proves (a) v1 still serves pre-upsert data after
    v2 exists (isolation), (b) v2 reflects exactly the merged delta.
    At 100 TB the upsert cost is the two affected partitions plus one
    JSON rename — never the table."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    root = _export_dir(sf_dir, "orders_snapshots")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)  # v1
    delta = base.filter(
        (F.col("o_orderkey") % 7 == 0) & F.col("o_year").isin(1995, 1996)
    ).withColumn("o_totalprice", F.round(F.col("o_totalprice") + 1.00, 2))
    store.upsert(spark, delta, key_cols=["o_orderkey"])  # v2
    cols = ["snapshot", "o_orderkey", "o_year", "o_totalprice"]
    v1 = store.read(spark, version=1).withColumn("snapshot", F.lit("v1"))
    v2 = store.read(spark, version=2).withColumn("snapshot", F.lit("v2"))
    return v1.select(*cols).unionByName(v2.select(*cols)).withColumn(
        "o_year", F.col("o_year").cast("int")
    )


@register_query(
    "snapshot_mor_delete_read",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
    ),
    v2 AS (
        SELECT * FROM base
        WHERE NOT (o_orderkey % 3 = 0 AND o_year >= 1996)
    ),
    delta AS (
        SELECT o_orderkey, o_year, ROUND(o_totalprice + 5.00, 2) AS o_totalprice
        FROM v2 WHERE o_year = 1995 AND o_orderkey % 10 = 0
    ),
    v3 AS (
        SELECT * FROM v2 WHERE NOT (o_year = 1995 AND o_orderkey % 10 = 0)
        UNION ALL SELECT * FROM delta
    )
    SELECT 'v1' AS snapshot, * FROM base
    UNION ALL SELECT 'v2' AS snapshot, * FROM v2
    UNION ALL SELECT 'v3' AS snapshot, * FROM v3
    """,
    tags="S27",
)
def snapshot_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S27: merge-on-read row deletes (Iceberg v2 position deletes /
    Delta deletion vectors, keyed on the store's synthetic row
    identity). Orders partitioned by year are committed as v1;
    ``delete_where`` records every third order of 1996+ in a KB-scale
    delete file and publishes v2 WITHOUT rewriting a single data file
    (the manifest's partition pointers are byte-identical to v1's —
    asserted in tests/test_snapshots.py); an upsert to 1995 then
    publishes v3 copy-on-write, carrying the delete entries forward
    for the partitions it didn't touch. Reading all three snapshots
    certifies: v1 still serves the deleted rows (time travel), v2
    anti-joins them away, and v3 keeps them gone under a later COW
    commit while applying its delta. At 100 TB this is the delete
    path that makes small deletes affordable — one filtered scan plus
    a tiny write, instead of rewriting every hit partition."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    root = _export_dir(sf_dir, "orders_mor")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)  # v1
    store.delete_where(
        spark, (F.col("o_orderkey") % 3 == 0) & (F.col("o_year") >= 1996)
    )  # v2 — merge-on-read, zero data files rewritten
    delta = (
        store.read(spark, version=2)
        .filter((F.col("o_year") == 1995) & (F.col("o_orderkey") % 10 == 0))
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") + 5.00, 2))
    )
    store.upsert(spark, delta, key_cols=["o_orderkey"])  # v3 — COW carry
    cols = ["snapshot", "o_orderkey", "o_year", "o_totalprice"]
    out = None
    for v in (1, 2, 3):
        s = (
            store.read(spark, version=v)
            .withColumn("snapshot", F.lit(f"v{v}"))
            .select(*cols)
        )
        out = s if out is None else out.unionByName(s)
    return out.withColumn("o_year", F.col("o_year").cast("int"))


@register_query(
    "source_cdc_apply",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer
    ),
    applied AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 11 = 0
                    THEN ROUND(c_acctbal + 10.00, 2) ELSE c_acctbal END
                   AS c_acctbal
        FROM base
        WHERE c_custkey % 13 <> 0
    )
    SELECT 'v1' AS snapshot, * FROM base
    UNION ALL
    SELECT 'v2' AS snapshot, * FROM applied
    """,
    tags="S12 S9 J4 S14",
)
def source_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 depth: CDC apply — a change feed with updates (every 11th
    customer's balance +10) and hard deletes (every 13th customer;
    delete wins on overlap) merged into the snapshot store in ONE
    versioned commit (io/snapshots.py apply_changes). Deletes are
    tombstone-free: the row is simply absent from v2 while v1 still
    serves it — reading BOTH snapshots and hashing against the
    recomputed expectations certifies upsert, delete, and retention
    in one gate. Change rows carry the partition column, so the
    rewrite touches exactly the partitions the feed names — at 100 TB
    the apply costs the affected partitions plus one manifest
    rename."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    root = _export_dir(sf_dir, "customer_cdc")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "c_nationkey")
    store.commit(base)  # v1
    changes = (
        base.filter((F.col("c_custkey") % 11 == 0) | (F.col("c_custkey") % 13 == 0))
        .withColumn(
            "op",
            F.when(F.col("c_custkey") % 13 == 0, F.lit("D")).otherwise(F.lit("U")),
        )
        .withColumn(
            "c_acctbal",
            F.when(F.col("op") == "U", F.round(F.col("c_acctbal") + 10.00, 2)).otherwise(
                F.col("c_acctbal")
            ),
        )
    )
    store.apply_changes(spark, changes, key_cols=["c_custkey"])  # v2
    cols = ["snapshot", "c_custkey", "c_nationkey", "c_acctbal"]
    v1 = store.read(spark, version=1).withColumn("snapshot", F.lit("v1"))
    v2 = store.read(spark, version=2).withColumn("snapshot", F.lit("v2"))
    return (
        v1.select(*cols)
        .unionByName(v2.select(*cols))
        .withColumn("c_nationkey", F.col("c_nationkey").cast("int"))
    )


@register_query(
    "snapshot_changelog_read",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer
    ),
    dels AS (
        SELECT 'D' AS op, c_custkey, c_nationkey, c_acctbal
        FROM base WHERE c_custkey % 13 = 0
    ),
    upds AS (
        SELECT 'U' AS op, c_custkey, c_nationkey,
               ROUND(c_acctbal + 10.00, 2) AS c_acctbal
        FROM base WHERE c_custkey % 11 = 0 AND c_custkey % 13 <> 0
    ),
    ins AS (
        SELECT 'I' AS op, c_custkey + 1000000 AS c_custkey, c_nationkey,
               CAST(1.00 AS DOUBLE) AS c_acctbal
        FROM base WHERE c_custkey % 17 = 0
    )
    SELECT op, c_custkey, CAST(c_nationkey AS INT) AS c_nationkey, c_acctbal
    FROM (SELECT * FROM dels UNION ALL SELECT * FROM upds
          UNION ALL SELECT * FROM ins)
    """,
    tags="S12 S14 S24",
)
def snapshot_changelog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S24: the store-level changelog — commit customers as v1, apply
    a CDC feed (update every 11th, delete every 13th — delete wins on
    overlap — insert a fresh key for every 17th) as v2, then
    `read_changes(1, 2)` emits exactly the I/U/D rows a downstream
    consumer would need to sync incrementally. The oracle recomputes
    the expected changelog from the same deterministic rules, so the
    hash certifies classification, image choice (U/I carry the new
    image, D the old), and the 'unchanged keys emit nothing'
    contract. Manifest pruning keeps the diff cost ∝ changed
    partitions (asserted via inputFiles in tests/test_snapshots.py);
    the diff itself is one key-partitioned full-outer join."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    root = _export_dir(sf_dir, "customer_changelog")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "c_nationkey")
    store.commit(base)  # v1
    upserts = (
        base.filter(
            (F.col("c_custkey") % 11 == 0) | (F.col("c_custkey") % 13 == 0)
        )
        .withColumn(
            "op",
            F.when(F.col("c_custkey") % 13 == 0, F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("op") == "U", F.round(F.col("c_acctbal") + 10.00, 2)
            ).otherwise(F.col("c_acctbal")),
        )
    )
    inserts = base.filter(F.col("c_custkey") % 17 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_nationkey",
        F.lit(1.00).cast("double").alias("c_acctbal"),
        F.lit("I").alias("op"),
    )
    store.apply_changes(
        spark, upserts.unionByName(inserts), key_cols=["c_custkey"]
    )  # v2
    return store.read_changes(spark, 1, 2, key_cols=["c_custkey"]).select(
        "op",
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "c_acctbal",
    )


@register_query(
    "source_jsonl_roundtrip",
    oracle="SELECT * FROM nation",
    tags="S1 S8 S16",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S8 (JSON lines): nation → newline-delimited JSON export →
    JSON scan with schema inference. NDJSON is the third schemaless
    text format next to CSV/TSV ("tabular files like CSV, TSV or
    parquet", reference README.md:2 — "like" includes the other
    self-describing line format every log pipeline emits). Spark's
    JSON reader infers long/string; column order is normalized
    alphabetically on read, which the name-keyed comparison (and any
    sane consumer) is insensitive to. Ints and strings round-trip
    losslessly."""
    out = _export_dir(sf_dir, "nation_jsonl")
    write_table(table(spark, sf_dir, "nation"), out, fmt="json")
    return read_table(spark, out, fmt="json")


@register_query(
    "source_orc_roundtrip",
    oracle="SELECT * FROM region",
    tags="S1 S8 S18",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S8 (ORC): region → ORC export → ORC scan. The second
    self-describing columnar format next to parquet — same predicate
    pushdown/column pruning machinery in Spark's reader, same
    read_table/write_table surface. Lossless by construction (typed
    columnar, no inference involved)."""
    out = _export_dir(sf_dir, "region_orc")
    write_table(table(spark, sf_dir, "region"), out, fmt="orc")
    return read_table(spark, out, fmt="orc")


@register_query(
    "snapshot_corpus_diff",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                  AS BIGINT) AS nw
      FROM documents
    ),
    cls AS (
      SELECT doc_id, lang, nw,
             CASE WHEN doc_id % 10 = 0 THEN 'added'
                  WHEN doc_id % 7 = 0 THEN 'changed'
                  WHEN doc_id % 13 = 0 THEN 'removed'
                  ELSE 'unchanged' END AS change_type
      FROM d
    )
    SELECT change_type, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE change_type
                    WHEN 'added' THEN nw
                    WHEN 'removed' THEN -nw
                    WHEN 'changed' THEN 2
                    ELSE 0 END) AS BIGINT) AS words_delta
    FROM cls GROUP BY 1, 2
    """,
    tags="S19 S12 F9",
)
def snapshot_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S19: cross-release corpus diff — the report a data-curation
    team reviews between dataset versions. The corpus is committed to
    the SnapshotStore as release v1 (one cohort held out), then a CDC
    feed of inserts (the held-out cohort arrives), updates (a second
    cohort's text grows by two words), and deletes (a third cohort is
    retired) produces release v2 via apply_changes. The diff then
    reads BOTH releases back through their manifests — not from the
    in-memory frames — full-outer joins them on doc_id, classifies
    each document added/removed/changed/unchanged by comparing the
    TEXT actually stored (not the generating arithmetic), and
    aggregates per (change_type, lang) document counts and the signed
    word-count delta. The oracle recomputes the expected classes from
    the source table, so a hash match certifies the store round-trips
    every version's content exactly. At 100 TB: the CDC write is
    partition-scoped copy-on-write; the diff is one sort-merge
    full-outer join on the key (both sides corpus-scale — a shuffle
    this semantic genuinely requires) feeding a map-combinable
    aggregate; nothing driver-side but the manifest JSON."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore
    from karna_spark.operators.text import words

    base = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    root = _export_dir(sf_dir, "documents_snapdiff")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "lang")
    store.commit(base.filter(F.col("doc_id") % 10 != 0))  # release v1
    inserts = base.filter(F.col("doc_id") % 10 == 0).withColumn(
        "op", F.lit("I")
    )
    updates = (
        base.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 10 != 0))
        .withColumn("text", F.concat(F.col("text"), F.lit(" corpus update")))
        .withColumn("op", F.lit("U"))
    )
    deletes = base.filter(
        (F.col("doc_id") % 13 == 0)
        & (F.col("doc_id") % 10 != 0)
        & (F.col("doc_id") % 7 != 0)
    ).withColumn("op", F.lit("D"))
    store.apply_changes(
        spark,
        inserts.unionByName(updates).unionByName(deletes),
        key_cols=["doc_id"],
    )  # release v2
    nw = lambda c: F.size(words(F.trim(c))).cast("bigint")  # noqa: E731
    v1 = store.read(spark, version=1).select(
        F.col("doc_id").alias("id1"),
        F.col("lang").alias("lang1"),
        F.col("text").alias("text1"),
    )
    v2 = store.read(spark, version=2).select(
        F.col("doc_id").alias("id2"),
        F.col("lang").alias("lang2"),
        F.col("text").alias("text2"),
    )
    j = v1.join(v2, v1["id1"] == v2["id2"], "full_outer")
    return (
        j.select(
            F.when(F.col("id1").isNull(), F.lit("added"))
            .when(F.col("id2").isNull(), F.lit("removed"))
            .when(F.col("text1") != F.col("text2"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
            F.coalesce(F.col("lang2"), F.col("lang1")).alias("lang"),
            (
                F.coalesce(nw(F.col("text2")), F.lit(0))
                - F.coalesce(nw(F.col("text1")), F.lit(0))
            ).alias("wd"),
        )
        .groupBy("change_type", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("wd").cast("bigint").alias("words_delta"),
        )
    )


@register_query(
    "source_dynamic_partition_pruning",
    oracle="""
    WITH f AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
      FROM orders
    ),
    d AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS o_month,
             CAST(month(o_orderdate) AS INT) AS mo
      FROM orders
    )
    SELECT f.o_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM f JOIN d USING (o_month)
    WHERE d.mo BETWEEN 4 AND 6
    GROUP BY 1
    """,
    tags="S5 J7 V7",
)
def source_dynamic_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """V7: DYNAMIC partition pruning — the runtime companion to
    `source_partitioned_layout`'s static pruning. The fact table is
    exported Hive-partitioned by month; the filter (Q2 months only)
    lives on a DIMENSION attribute, not the partition column, so no
    static pruning is possible: Catalyst must push a
    `dynamicpruningexpression` into the fact scan's PartitionFilters,
    built at runtime from the broadcast dim's join keys (plan-asserted
    in tests/test_plans.py). At 100 TB this is the difference between
    scanning 84 month directories and the 21 the dim filter selects —
    for a predicate the fact scan alone could never see. The dim here
    derives from the same fixture (month -> calendar month number),
    standing in for a real date dimension."""
    out = _export_dir(sf_dir, "orders_by_month")
    fact_src = table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        "o_totalprice",
    )
    write_table(fact_src, out, fmt="parquet", partition_by=["o_month"])
    fact = read_table(spark, out, fmt="parquet")
    dim = (
        table(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
            F.month("o_orderdate").cast("int").alias("mo"),
        )
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim.filter(F.col("mo").between(4, 6))), "o_month")
        .groupBy("o_month")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register_query(
    "join_runtime_bloom_filter",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags="V8 J1 A1",
)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8: runtime bloom-filter semi-join reduction — the 100 TB path
    when the filtered side of a join is selective but TOO BIG to
    broadcast (so dynamic partition pruning and broadcast pruning are
    both unavailable). Catalyst's InjectRuntimeFilter builds a bloom
    filter from the filtered orders keys (one bloom_filter_agg
    subquery) and applies might_contain() to lineitem BEFORE its
    shuffle, so the fact exchange carries ~|matching| rows instead of
    the whole table — the join itself stays exact (bloom is a
    may-contain prefilter; false positives are removed by the real
    join, which is why the oracle is the plain join). Broadcast is
    disabled and the application-side threshold lowered for THIS plan
    only (fixture bytes are far below the 10 GB production default);
    tune_session re-pins the engine defaults for every later query.
    Plan-asserted in tests/test_plans.py: bloom_filter_agg +
    might_contain present, join is SMJ, result exact."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    od = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # After table() (which re-pins engine defaults), carve this plan's
    # posture: no broadcast (the scenario is a non-broadcastable dim),
    # application threshold below fixture bytes so injection fires.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1",
    )
    return (
        li.join(
            od.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == od.o_orderkey,
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register_query(
    "snapshot_stat_pruned_read",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_price
    FROM orders
    WHERE date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
          BETWEEN 2007 AND 2372
    GROUP BY 1
    """,
    tags="S12 S20",
)
def snapshot_stat_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S20 certified through the driver: orders land in the snapshot
    store partitioned by YEAR, and the read is bounded on ``o_day``
    (days since 1990-01-01) — a NON-partition column whose
    per-partition footer bounds are strictly disjoint by year, so the
    manifest-stat pruning path (`read(where=...)`) must skip every
    year outside the 1995-07..1996-06 window before Spark lists a
    single file (the skip itself is asserted on inputFiles() in
    tests/test_plans.py; THIS query's hash certifies the bounded
    read's exactness end to end: store round-trip + prune + residual
    filter match the oracle computed straight off the parquet). At
    100 TB this is the scan-avoidance layer for range predicates on
    sort-correlated columns (dates, sequence ids) that partition keys
    don't capture."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.datediff(F.col("o_orderdate"), F.lit("1990-01-01"))
        .cast("int")
        .alias("o_day"),
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    root = _export_dir(sf_dir, "orders_stat_pruned")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)
    return (
        store.read(spark, where=("o_day", 2007, 2372))
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register_query(
    "source_binary_files",
    oracle="""
    SELECT printf('doc_%08d.bin', doc_id) AS file_name,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS md5_hex
    FROM documents
    WHERE doc_id % 8 = 0
    """,
    tags="S22 V5",
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S22: opaque binary-file ingestion — the real front door for a
    multimodal corpus (image/audio/video files land as FILES; V5's
    typed-metadata model starts at exactly this scan). Fixture prep
    materializes one .bin per selected document (utf-8 bytes of its
    text — deterministic content the oracle can recompute); the
    operator under test is Spark's ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content BINARY). The
    query returns each file's name, the source's own ``length``
    metadata column (no content decode needed to get it), and the
    md5 of the content bytes — hash-matched against the oracle
    deriving the same triple from the documents table, so the scan is
    proven byte-lossless end to end. Scale: binaryFile is a standard
    FileScan (distributed listing, per-file tasks, pathGlobFilter /
    recursiveFileLookup pushdown); content bytes stay in the executor
    — nothing here collects. Prep writes driver-side because it IS
    fixture scaffolding (63 small files), not the measured path."""
    out = _export_dir(sf_dir, "docs_bin")
    if os.path.isdir(out):
        import shutil

        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    rows = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 8 == 0)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        with open(os.path.join(out, f"doc_{r['doc_id']:08d}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return scan.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("md5_hex"),
    )


# ---------------------------------------------------------------- S25
_MV_ORACLE = """
WITH base AS (
  SELECT c_custkey AS k, c_nationkey AS n,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
v2 AS (
  SELECT k, n, CASE WHEN k % 7 = 0 THEN cents + 500 ELSE cents END AS cents
  FROM base WHERE k % 19 <> 0
  UNION ALL
  SELECT k + 2000000 AS k, n, CAST(300 AS BIGINT) AS cents
  FROM base WHERE k % 23 = 0
),
v3 AS (
  SELECT k, n, CASE WHEN k % 5 = 0 THEN cents - 150 ELSE cents END AS cents
  FROM v2 WHERE k % 17 <> 0
)
SELECT CAST(n AS INT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_customers,
       ROUND(SUM(cents) / 100.0, 2) AS total_bal
FROM v3 GROUP BY n
"""


@register_query(
    "snapshot_incremental_mv",
    oracle=_MV_ORACLE,
    tags="S25 S24 S12 A1",
)
def snapshot_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25: incremental materialized-view maintenance (operators/mv.py)
    — the per-nation (count, balance) view is materialized ONCE at v1,
    then refreshed across two CDC commits purely from the store's
    Delta-CDF-shaped change feed (`read_change_feed`: updates emit
    pre- AND post-images), never re-reading the base table: signed
    counting-algorithm application (+I/U+, −D/U-), zero-count groups
    dropped, money kept in BIGINT cents so retraction is exact. The
    oracle recomputes the final state from scratch, so the hash
    certifies that two incremental refreshes ≡ full recompute. Refresh
    cost is ∝ |delta| (one map-combinable aggregate over the feed +
    a |groups|-scale merge) — at 100 TB with a 0.1% daily delta this
    is the 1000× scan reduction that makes serving-side aggregates
    refreshable at all."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore
    from karna_spark.operators.mv import apply_feed, grouped_mv

    base = table(spark, sf_dir, "customer").select(
        F.col("c_custkey"),
        F.col("c_nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    root = _export_dir(sf_dir, "customer_incremental_mv")
    shutil.rmtree(root, ignore_errors=True)
    # distribution='hash' (Iceberg write.distribution-mode): this table
    # is READ-heavy — every refresh re-reads touched partitions and two
    # change feeds scan the written files — so clustering each write by
    # partition value (few files per dir instead of one per task×value)
    # pays for its exchange. Measured: ~-0.5 s on this anchor at sf0.1
    # (OPTIMIZATION_r12.md), and at 100 TB it is the file-count posture
    # every governed table wants on its serving path.
    store = SnapshotStore(root, "c_nationkey", distribution="hash")
    store.commit(base)  # v1
    k = F.col("c_custkey")
    feed_a = (
        base.filter((k % 7 == 0) | (k % 19 == 0))
        .withColumn(
            "op", F.when(k % 19 == 0, F.lit("D")).otherwise(F.lit("U"))
        )
        .withColumn(
            "cents",
            F.when(F.col("op") == "U", F.col("cents") + 500).otherwise(
                F.col("cents")
            ),
        )
        .unionByName(
            base.filter(k % 23 == 0).select(
                (k + 2000000).alias("c_custkey"),
                "c_nationkey",
                F.lit(300).cast("bigint").alias("cents"),
                F.lit("I").alias("op"),
            )
        )
    )
    store.apply_changes(spark, feed_a, key_cols=["c_custkey"])  # v2
    v2 = store.read(spark, version=2)
    k2 = F.col("c_custkey")
    feed_b = (
        v2.filter((k2 % 5 == 0) | (k2 % 17 == 0))
        .withColumn(
            "op", F.when(k2 % 17 == 0, F.lit("D")).otherwise(F.lit("U"))
        )
        .withColumn(
            "cents",
            F.when(F.col("op") == "U", F.col("cents") - 150).otherwise(
                F.col("cents")
            ),
        )
    )
    store.apply_changes(spark, feed_b, key_cols=["c_custkey"])  # v3
    # --- the MV path: materialize at v1, refresh from the feeds only.
    mv = grouped_mv(
        store.read(spark, version=1), ["c_nationkey"], ["cents"]
    )
    for v_from, v_to in ((1, 2), (2, 3)):
        feed = store.read_change_feed(
            spark, v_from, v_to, key_cols=["c_custkey"]
        )
        mv = apply_feed(mv, feed, ["c_nationkey"], ["cents"])
    return mv.select(
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        F.col("mv_count").alias("n_customers"),
        F.round(F.col("cents_sum") / 100.0, 2).alias("total_bal"),
    )


# ---------------------------------------------------------------- S28
@register_query(
    "snapshot_schema_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    sub AS (
      SELECT k + 10000000 AS k, o_year, (k + 10000000) % 97 AS val,
             CASE WHEN k % 20 = 0 THEN 'web' ELSE 'api' END AS channel
      FROM base WHERE o_year = 1995 AND k % 10 = 0
    ),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv
          FROM base),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv
          FROM sub)
    SELECT 'v1' AS snapshot, b.n AS n_rows, b.sk AS sum_keys,
           b.sv AS sum_val, CAST(NULL AS BIGINT) AS n_channel_set,
           'k,o_year,val' AS cols
    FROM b
    UNION ALL
    SELECT 'v2', b.n, b.sk, b.sv, CAST(0 AS BIGINT), 'channel,k,o_year,val'
    FROM b
    UNION ALL
    SELECT 'v3', b.n + s.n, b.sk + s.sk, b.sv + s.sv, s.n,
           'channel,k,o_year,val'
    FROM b, s
    UNION ALL
    SELECT 'v4', b.n + s.n, b.sk + s.sk, b.sv + s.sv, s.n,
           'channel,k,o_year,val_renamed'
    FROM b, s
    UNION ALL
    SELECT 'v5', b.n + s.n, b.sk + s.sk, b.sv + s.sv,
           CAST(NULL AS BIGINT), 'k,o_year,val_renamed'
    FROM b, s
    """,
    tags="S28",
)
def snapshot_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S28: snapshot-layer schema evolution — Iceberg's ALTER TABLE
    family as METADATA-ONLY commits on the store (io/snapshots.py:
    add_column/rename_column/drop_column). v1 commits orders keyed by
    year; v2 ADDS a nullable channel column (zero data files touched —
    old files read NULL); v3 upserts new rows that actually carry the
    column; v4 RENAMES the value column (pure logical→physical
    mapping flip: every existing file keeps its old physical name);
    v5 DROPS channel (logical projection change; time travel to
    v2–v4 still serves it, and the version-suffixed physical names
    mean a later re-add can never resurrect the dropped bytes).
    Each snapshot is fingerprinted — row count, exact key/value sums,
    how many rows have the added column set, and the SORTED column
    list — and the oracle derives all five fingerprints from the base
    table alone, so the hash certifies the mapping layer end to end:
    NULL back-fill, rename invisibility, drop projection, and
    per-version schema under time travel. At 100 TB every one of the
    three DDL ops is one manifest write; the r10 pytest also proves
    compaction, MOR deletes on renamed columns, and redact all
    compose with the mapping."""
    import shutil

    from pyspark.sql.types import StringType

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_schema_evo")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                   # v1
    store.add_column("channel", StringType())            # v2
    delta = base.filter(
        (F.col("o_year") == 1995) & (F.col("k") % 10 == 0)
    ).select(
        (F.col("k") + 10000000).alias("k"),
        "o_year",
        ((F.col("k") + 10000000) % 97).alias("val"),
        F.when(F.col("k") % 20 == 0, F.lit("web"))
        .otherwise(F.lit("api"))
        .alias("channel"),
    )
    store.upsert(spark, delta, key_cols=["k"])           # v3
    store.rename_column("val", "val_renamed")            # v4
    store.drop_column("channel")                         # v5

    out = None
    for v in (1, 2, 3, 4, 5):
        df = store.read(spark, version=v)
        vcol = "val_renamed" if "val_renamed" in df.columns else "val"
        ch = (
            F.sum(F.col("channel").isNotNull().cast("bigint")).cast("bigint")
            if "channel" in df.columns
            else F.lit(None).cast("bigint")
        )
        row = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum(vcol).cast("bigint").alias("sum_val"),
            ch.alias("n_channel_set"),
        ).select(
            F.lit(f"v{v}").alias("snapshot"),
            "n_rows",
            "sum_keys",
            "sum_val",
            "n_channel_set",
            F.lit(",".join(sorted(df.columns))).alias("cols"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@register_query(
    "snapshot_partition_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             substr(o_orderpriority, 1, 1) AS prio,
             o_orderkey % 97 AS val
      FROM orders
    ),
    repl AS (
      SELECT k, o_year, prio, val + 1000 AS val FROM base WHERE k % 10 = 0
    ),
    ins AS (
      SELECT k + 10000000 AS k, o_year, prio, (k + 10000000) % 97 AS val
      FROM base WHERE k % 10 = 0 AND o_year = 1995
    ),
    final AS (
      SELECT * FROM base WHERE k % 10 <> 0
      UNION ALL SELECT * FROM repl
      UNION ALL SELECT * FROM ins
    ),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv,
                 CAST(COUNT(DISTINCT o_year) AS BIGINT) AS ny
          FROM base),
    f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv,
                 CAST(COUNT(DISTINCT prio) AS BIGINT) AS np
          FROM final),
    d AS (SELECT CAST(COUNT(DISTINCT prio) AS BIGINT) AS np FROM
          (SELECT prio FROM repl UNION ALL SELECT prio FROM ins)),
    p1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(k) AS BIGINT) AS sk,
                  CAST(SUM(val) AS BIGINT) AS sv
           FROM final WHERE prio = '1')
    SELECT 'v1' AS snapshot, b.n AS n_rows, b.sk AS sum_keys,
           b.sv AS sum_val, b.ny AS old_spec_ptrs,
           CAST(0 AS BIGINT) AS new_spec_ptrs
    FROM b
    UNION ALL
    SELECT 'v2', b.n, b.sk, b.sv, b.ny, CAST(0 AS BIGINT) FROM b
    UNION ALL
    SELECT 'v3', f.n, f.sk, f.sv, b.ny, d.np FROM b, f, d
    UNION ALL
    SELECT 'v4', f.n, f.sk, f.sv, CAST(0 AS BIGINT), f.np FROM f
    UNION ALL
    SELECT 'v4_pruned_prio_1', p1.n, p1.sk, p1.sv,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM p1
    """,
    tags="S30",
)
def snapshot_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S30: partition-spec evolution — Iceberg's OTHER evolution axis
    (io/snapshots.py:repartition_spec), run through its full lifecycle
    and fingerprinted per version. v1 commits orders partitioned by
    ORDER YEAR; v2 flips the spec to PRIORITY as a metadata-only
    commit (pointers re-keyed to qualified col=val form, zero data
    files touched); v3 upserts against the MIXED table — the delta
    lands under the new spec while replaced keys living in old-spec
    year partitions are retired through a merge-on-read delete entry
    (an in-place rewrite would redistribute their neighbours into
    new-spec directories and collide with inherited pointers); v4 is
    the migration: a full-table compact rewrites every row under the
    current spec, folds the MOR entries in, and prunes the spec
    history. The final row reads ONE new-spec partition by manifest
    pointer (partition pruning under the evolved spec). Each
    fingerprint carries row count, exact key/value sums, and the
    manifest's old-spec/new-spec pointer counts; the oracle derives
    all five from the orders table alone, so the hash certifies
    metadata-only evolution, mixed-spec union reads, MOR retirement,
    migration, and post-migration pruning end to end. At 100 TB the
    spec flip is one manifest write; reads stay ∝ referenced files
    (one scan per spec group, no footer reads)."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.substring("o_orderpriority", 1, 1).alias("prio"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_pspec_evo")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    v1 = store.commit(base)                              # v1: by year
    v2 = store.repartition_spec("prio")                  # v2: by priority
    repl = base.filter(F.col("k") % 10 == 0).withColumn(
        "val", F.col("val") + 1000
    )
    ins = base.filter(
        (F.col("k") % 10 == 0) & (F.col("o_year") == 1995)
    ).select(
        (F.col("k") + 10000000).alias("k"),
        "o_year",
        "prio",
        ((F.col("k") + 10000000) % 97).alias("val"),
    )
    v3 = store.upsert(spark, repl.unionByName(ins), key_cols=["k"])
    v4 = store.compact(spark)                            # migration

    out = None
    for tag_, v in (("v1", v1), ("v2", v2), ("v3", v3), ("v4", v4)):
        doc = store._manifest_doc(v)
        new_ptrs = sum(
            1 for key in doc["partitions"] if key.startswith("prio=")
        )
        old_ptrs = len(doc["partitions"]) - new_ptrs
        row = store.read(spark, version=v).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(tag_).alias("snapshot"),
            "n_rows",
            "sum_keys",
            "sum_val",
            F.lit(old_ptrs).cast("bigint").alias("old_spec_ptrs"),
            F.lit(new_ptrs).cast("bigint").alias("new_spec_ptrs"),
        )
        out = row if out is None else out.unionByName(row)
    pruned = store.read(
        spark, version=v4, partition_values=["prio=1"]
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("k").cast("bigint").alias("sum_keys"),
        F.sum("val").cast("bigint").alias("sum_val"),
    ).select(
        F.lit("v4_pruned_prio_1").alias("snapshot"),
        "n_rows",
        "sum_keys",
        "sum_val",
        F.lit(None).cast("bigint").alias("old_spec_ptrs"),
        F.lit(None).cast("bigint").alias("new_spec_ptrs"),
    )
    return out.unionByName(pruned)


# ---------------------------------------------------------------- S31
@register_query(
    "snapshot_equality_delete_read",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    v1 AS (SELECT * FROM base),
    v2 AS (SELECT * FROM v1 WHERE k % 50 <> 0),
    reins AS (
      SELECT k, o_year, (k % 97) + 1000 AS val
      FROM base WHERE k % 100 = 0
    ),
    v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM reins),
    f AS (
      SELECT 'v1' AS snapshot, * FROM v1
      UNION ALL SELECT 'v2', * FROM v2
      UNION ALL SELECT 'v3', * FROM v3
      UNION ALL SELECT 'v4', * FROM v3
    )
    SELECT snapshot,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM f GROUP BY snapshot ORDER BY snapshot
    """,
    tags="S31",
)
def snapshot_equality_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S31: merge-on-read EQUALITY deletes (Iceberg v2's second
    delete-file form — io/snapshots.py:delete_keys). v1 commits
    orders keyed by year; v2 publishes an equality delete of every
    50th key as a pure key-set write — ZERO data files scanned or
    rewritten (a 10M-id delete from a 100 TB table is O(|keys|)),
    readers anti-join the set under the broadcast threshold; v3
    re-upserts every 100th key (a subset of the deleted ones) with a
    marked value — the rows SURVIVE because the delete is
    sequence-guarded (_rv < delete id), exactly Iceberg's scoping of
    eq deletes to earlier data files; v4 is the full compact that
    folds the filter into the data and retires the entry. Every
    version is fingerprinted (count + exact key/value sums) and the
    oracle re-derives all four states from the base table alone, so
    the hash certifies write-time O(|keys|) deletes, read-time
    anti-join semantics, sequence-number scoping, and
    compact-retirement end to end."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_eq_delete")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                            # v1
    store.delete_keys(
        spark, "k", base.filter(F.col("k") % 50 == 0).select("k")
    )                                                             # v2
    reins = base.filter(F.col("k") % 100 == 0).select(
        "k", "o_year", ((F.col("k") % 97) + 1000).alias("val")
    )
    store.upsert(spark, reins, key_cols=["k"])                    # v3
    store.compact(spark)                                          # v4
    out = None
    for v in (1, 2, 3, 4):
        row = store.read(spark, version=v).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(f"v{v}").alias("snapshot"), "n_rows", "sum_keys", "sum_val"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("snapshot")


# ---------------------------------------------------------------- S32
@register_query(
    "snapshot_stats_agg_pushdown",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    cur AS (
      SELECT k, o_year,
             CASE WHEN o_year = 1995 AND k % 10 = 0
                  THEN val + 1000 ELSE val END AS val
      FROM base
    )
    SELECT CAST(o_year AS VARCHAR) AS partition,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(val) AS BIGINT) AS val_min,
           CAST(MAX(val) AS BIGINT) AS val_max
    FROM cur GROUP BY o_year ORDER BY partition
    """,
    tags="S32",
)
def snapshot_stats_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S32: aggregation pushdown into the MANIFEST
    (io/snapshots.py:stats_agg / count_rows — Iceberg's metadata-table
    count and aggregate pushdown). v1 commits orders keyed by year; v2
    upserts a shifted-value delta into 1995 (rewriting that partition,
    inheriting every other pointer — and with it the other partitions'
    committer-recorded stats). The per-partition row counts and value
    bounds are then answered ENTIRELY from the manifest: zero Spark
    jobs against the data, zero files opened (pytest proves the
    data-free property by chmod-ing the data dirs away). The oracle
    recomputes every count and bound from the base table with the
    upsert applied, so the hash certifies that commit-time footer
    stats + pointer inheritance reproduce the exact scan answer —
    the partition-health dashboard query a 100 TB table serves
    constantly, at 1e-6 of the scan cost. Counts refuse to answer
    over pending MOR deletes (they would overcount) and are
    refreshed by redact; bounds degrade only to supersets (S20's
    conservative contract)."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_stats_agg")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                            # v1
    delta = base.filter(
        (F.col("o_year") == 1995) & (F.col("k") % 10 == 0)
    ).select("k", "o_year", (F.col("val") + 1000).alias("val"))
    store.upsert(spark, delta, key_cols=["k"])                    # v2
    return (
        store.stats_agg(spark, ["val"])
        .select(
            "partition",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("val_min").cast("bigint").alias("val_min"),
            F.col("val_max").cast("bigint").alias("val_max"),
        )
        .orderBy("partition")
    )


# ---------------------------------------------------------------- S33
@register_query(
    "snapshot_merge_into",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    kept AS (
      SELECT k, o_year,
             CASE WHEN k % 7 = 0 THEN val + 500 ELSE val END AS val
      FROM base
      WHERE NOT (k % 7 = 0 AND val < 20)
    ),
    ins AS (
      SELECT k + 20000000 AS k, o_year, (k + 20000000) % 97 AS val
      FROM base
      WHERE k % 500 = 0 AND (k + 20000000) % 97 >= 10
    ),
    merged AS (
      SELECT * FROM kept UNION ALL SELECT * FROM ins
    )
    SELECT CAST(o_year AS INTEGER) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM merged GROUP BY o_year ORDER BY o_year
    """,
    tags="S33",
)
def snapshot_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S33: MERGE INTO (io/snapshots.py:merge — the Delta/Iceberg
    writer verb). v1 commits orders keyed by year; the merge source
    carries every 7th key (matched) plus synthetic new keys: the
    three clauses run together as WHEN MATCHED AND t.val < 20 THEN
    DELETE, WHEN MATCHED THEN UPDATE SET * (source val + 500), WHEN
    NOT MATCHED AND s.val >= 10 THEN INSERT. One source-LEFT-target
    join derives a CDC feed handed to apply_changes, so the merge
    inherits partition-scoped copy-on-write (only years the feed
    touches are rewritten), CAS publish, and evolution handling —
    and matched rows passing neither clause never enter the feed at
    all. The per-year fingerprint is re-derived by the oracle from
    the base table and the clause predicates alone, certifying
    clause precedence (DELETE before UPDATE), condition routing over
    s.*/t.*, and the untouched-row guarantee end to end. At 100 TB
    the join is one shuffle on the merge keys and the write cost is
    ∝ touched partitions — the same bound as upsert."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_merge_into")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                            # v1
    matched_src = base.filter(F.col("k") % 7 == 0).select(
        "k", "o_year", (F.col("val") + 500).alias("val")
    )
    new_src = base.filter(F.col("k") % 500 == 0).select(
        (F.col("k") + 20000000).alias("k"),
        "o_year",
        ((F.col("k") + 20000000) % 97).alias("val"),
    )
    store.merge(
        spark,
        matched_src.unionByName(new_src),
        ["k"],
        matched_delete_cond="t.val < 20",
        not_matched_insert_cond="s.val >= 10",
    )                                                             # v2
    return (
        store.read(spark)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("val").cast("bigint").alias("sum_val"),
        )
        .orderBy("o_year")
    )


@register_query(
    "snapshot_merge_full_sync",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    m AS (  -- matched: unconditional UPDATE SET * (source image)
      SELECT k, o_year, val + 1000 AS val FROM base WHERE k % 3 = 0
    ),
    miss AS (SELECT k, o_year, val FROM base WHERE k % 3 <> 0),
    kept_miss AS (  -- NMBS: DELETE val<30 first, else UPDATE +10000
      SELECT k, o_year, val + 10000 AS val FROM miss WHERE val >= 30
    ),
    ins AS (
      SELECT k + 30000000 AS k, o_year, (k + 30000000) % 97 AS val
      FROM base WHERE k % 400 = 0
    ),
    final AS (
      SELECT * FROM m
      UNION ALL SELECT * FROM kept_miss
      UNION ALL SELECT * FROM ins
    )
    SELECT CAST(o_year AS INTEGER) AS o_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM final GROUP BY o_year ORDER BY o_year
    """,
    tags="S33",
)
def snapshot_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S33: MERGE with WHEN NOT MATCHED BY SOURCE (Delta 2.3+/ANSI
    full-sync clauses; io/snapshots.py:merge). v1 commits orders keyed
    by year; the source carries every 3rd key (val+1000) plus
    synthetic new keys. Clauses: WHEN MATCHED THEN UPDATE SET *, WHEN
    NOT MATCHED THEN INSERT, WHEN NOT MATCHED BY SOURCE AND t.val < 30
    THEN DELETE, WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
    val = t.val + 10000. The oracle re-derives every row's fate from
    the base table and the clause predicates alone, certifying the
    full-outer widening, NMBS clause order (DELETE before UPDATE), the
    t.*-only condition scope, and the SET-image type cast end to end.
    Scale note: an NMBS clause is inherently target-scale (every
    target row must be inspected — same bound Delta documents); the
    write cost stays ∝ touched partitions."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_merge_full_sync")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                            # v1
    matched_src = base.filter(F.col("k") % 3 == 0).select(
        "k", "o_year", (F.col("val") + 1000).alias("val")
    )
    new_src = base.filter(F.col("k") % 400 == 0).select(
        (F.col("k") + 30000000).alias("k"),
        "o_year",
        ((F.col("k") + 30000000) % 97).alias("val"),
    )
    store.merge(
        spark,
        matched_src.unionByName(new_src),
        ["k"],
        not_matched_by_source_delete="t.val < 30",
        not_matched_by_source_update_set={"val": "t.val + 10000"},
    )                                                             # v2
    return (
        store.read(spark)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("val").cast("bigint").alias("sum_val"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------- S30b
# bucket(8, prio) component constants, precomputed once so the DuckDB
# oracle can name them: the transform is crc32(canonical-string) mod n
# on BOTH sides (Spark F.crc32 at write, zlib.crc32 in the driver-side
# pruning twin), and priorities are a closed 5-value domain — a CASE
# over literals is the exact SQL rendering of the bucket function.
def _prio_bucket_case(expr: str) -> str:
    import zlib

    arms = " ".join(
        f"WHEN '{p}' THEN {zlib.crc32(p.encode()) % 8}" for p in "12345"
    )
    return f"(CASE {expr} {arms} END)"


@register_query(
    "snapshot_multifield_spec",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k,
             substr(o_orderpriority, 1, 1) AS prio,
             o_orderkey % 97 AS val
      FROM orders
    ),
    repl AS (
      SELECT k, prio, val + 1000 AS val FROM base WHERE k % 10 = 0
    ),
    ins AS (
      SELECT k + 10000000 AS k, prio, (k + 10000000) % 97 AS val
      FROM base WHERE k % 20 = 0
    ),
    delta AS (SELECT * FROM repl UNION ALL SELECT * FROM ins),
    final AS (
      SELECT * FROM base WHERE k % 10 <> 0
      UNION ALL SELECT * FROM delta
    ),
    probe AS (SELECT k, prio FROM final ORDER BY k LIMIT 1),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv,
                 CAST(COUNT(DISTINCT prio) AS BIGINT) AS np
          FROM base),
    f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv
          FROM final),
    dparts AS (SELECT CAST(COUNT(DISTINCT
                 {_prio_bucket_case("prio")} || '~' ||
                 CAST(k - (k % 32768) AS VARCHAR)) AS BIGINT) AS np
               FROM delta),
    fparts AS (SELECT CAST(COUNT(DISTINCT
                 {_prio_bucket_case("prio")} || '~' ||
                 CAST(k - (k % 32768) AS VARCHAR)) AS BIGINT) AS np
               FROM final),
    pruned AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(k) AS BIGINT) AS sk,
                      CAST(SUM(val) AS BIGINT) AS sv
               FROM final
               WHERE k - (k % 32768) =
                     (SELECT k - (k % 32768) FROM probe)),
    point AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(k) AS BIGINT) AS sk,
                     CAST(SUM(val) AS BIGINT) AS sv
              FROM final
              WHERE k - (k % 32768) =
                    (SELECT k - (k % 32768) FROM probe)
                AND {_prio_bucket_case("prio")} =
                    (SELECT {_prio_bucket_case("prio")} FROM probe))
    SELECT 'v1_by_prio' AS snapshot, b.n AS n_rows, b.sk AS sum_keys,
           b.sv AS sum_val, b.np AS n_parts FROM b
    UNION ALL SELECT 'v2_respec', b.n, b.sk, b.sv, b.np FROM b
    UNION ALL SELECT 'v3_mixed', f.n, f.sk, f.sv,
                     b.np + dparts.np FROM b, f, dparts
    UNION ALL SELECT 'v4_migrated', f.n, f.sk, f.sv, fparts.np
              FROM f, fparts
    UNION ALL SELECT 'v4_pruned_k', pruned.n, pruned.sk, pruned.sv,
                     CAST(NULL AS BIGINT) FROM pruned
    UNION ALL SELECT 'v4_point', point.n, point.sk, point.sv,
                     CAST(NULL AS BIGINT) FROM point
    """,
    tags="S30b",
)
def snapshot_multifield_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S30b: MULTI-FIELD TRANSFORM partition spec — Iceberg's ordered
    spec with bucket/truncate transforms
    (io/snapshots.py:repartition_spec(list), spec_key, prune_keys).
    v1 commits orders partitioned by priority; v2 flips the spec to
    ``[bucket(8, prio), truncate(32768, k)]`` metadata-only (the
    composite tuple is reified as ONE derived string column, rendered
    identically by the Spark write expression and the pure-python
    driver twin); v3 upserts against the mixed table — the delta lands
    under derived composite directories while replaced keys in
    old-spec priority partitions retire through a merge-on-read entry;
    v4 is the migration compact. Then the two pruning proofs: a
    prune_keys equality scan on the TRUNCATE source (drops every
    non-matching composite directory; keeps old-spec dirs
    conservatively — here none remain post-migration) and a spec_key
    POINT read (exactly one directory of the table). The oracle
    re-derives every fingerprint from orders alone — the bucket
    function is crc32(str) mod 8, spelled as a closed CASE over the
    5-value priority domain, and truncate is plain arithmetic — so the
    hash certifies the transform math itself, not just row movement.
    At 100 TB: the respec is one manifest write; a point read costs
    one directory; an equality predicate on any spec SOURCE prunes at
    manifest level through the transform, Iceberg-style."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.substring("o_orderpriority", 1, 1).alias("prio"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_multifield_spec")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "prio")
    v1 = store.commit(base)                               # v1: by prio
    v2 = store.repartition_spec(["bucket(8, prio)", "truncate(32768, k)"])
    repl = base.filter(F.col("k") % 10 == 0).withColumn(
        "val", F.col("val") + 1000
    )
    ins = base.filter(F.col("k") % 20 == 0).select(
        (F.col("k") + 10000000).alias("k"),
        "prio",
        ((F.col("k") + 10000000) % 97).alias("val"),
    )
    v3 = store.upsert(spark, repl.unionByName(ins), key_cols=["k"])
    v4 = store.compact(spark)                             # migration

    def fp(tag_, v, n_parts):
        return store.read(spark, version=v).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(tag_).alias("snapshot"), "n_rows", "sum_keys",
            "sum_val",
            F.lit(n_parts).cast("bigint").alias("n_parts"),
        )

    out = None
    for tag_, v in (
        ("v1_by_prio", v1), ("v2_respec", v2),
        ("v3_mixed", v3), ("v4_migrated", v4),
    ):
        n_parts = len(store._manifest_doc(v)["partitions"])
        row = fp(tag_, v, n_parts)
        out = row if out is None else out.unionByName(row)

    # probe row: smallest key in the final table (deterministic; its
    # priority is a bounded 1-row collect, the spec_key input)
    pr = (
        store.read(spark, version=v4)
        .orderBy("k")
        .select("k", "prio")
        .limit(1)
        .collect()[0]
    )
    keys_k = store.prune_keys("k", pr["k"], version=v4)
    pruned = store.read(spark, version=v4, partition_values=keys_k).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("k").cast("bigint").alias("sum_keys"),
        F.sum("val").cast("bigint").alias("sum_val"),
    ).select(
        F.lit("v4_pruned_k").alias("snapshot"), "n_rows", "sum_keys",
        "sum_val", F.lit(None).cast("bigint").alias("n_parts"),
    )
    pkey = store.spec_key({"prio": pr["prio"], "k": pr["k"]}, version=v4)
    point = store.read(spark, version=v4, partition_values=[pkey]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("k").cast("bigint").alias("sum_keys"),
        F.sum("val").cast("bigint").alias("sum_val"),
    ).select(
        F.lit("v4_point").alias("snapshot"), "n_rows", "sum_keys",
        "sum_val", F.lit(None).cast("bigint").alias("n_parts"),
    )
    return out.unionByName(pruned).unionByName(point)


# ---------------------------------------------------------------- S26
@register_query(
    "snapshot_branch_wap",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    staged AS (
      SELECT k, o_year, val + 500 AS val FROM base WHERE k % 7 = 0
      UNION ALL
      SELECT k + 10000000 AS k, o_year, (k + 10000000) % 97 AS val
      FROM base WHERE k % 14 = 0
    ),
    merged AS (
      SELECT * FROM base WHERE k % 7 <> 0
      UNION ALL SELECT * FROM staged
    ),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv FROM base),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(val) AS BIGINT) AS sv FROM merged)
    SELECT 'parent_v1' AS stage, b.n AS n_rows, b.sk AS sum_keys,
           b.sv AS sum_val FROM b
    UNION ALL SELECT 'parent_during_wap', b.n, b.sk, b.sv FROM b
    UNION ALL SELECT 'branch_staged', s.n, s.sk, s.sv FROM s
    UNION ALL SELECT 'parent_after_publish', s.n, s.sk, s.sv FROM s
    UNION ALL SELECT 'parent_v1_time_travel', b.n, b.sk, b.sv FROM b
    """,
    tags="S26",
)
def snapshot_branch_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S26: the WRITE-AUDIT-PUBLISH cycle on snapshot branches
    (io/snapshots.py:create_branch/branch/merge_branch — Iceberg's
    branch refs, the WAP pattern every governed 100 TB pipeline runs):
    v1 commits orders; a branch forks it by POINTER COPY (zero data);
    the staged upsert (replaced + inserted keys) lands ONLY on the
    branch — the parent's head is byte-identical while the audit runs
    (fingerprinted mid-WAP); merge_branch fast-forwards the staged
    snapshot into the parent chain as its v2 — publish is one manifest
    write, no data moves; the parent's v1 stays time-travelable. The
    oracle derives all five stage fingerprints from orders alone, so
    the hash certifies isolation (parent unchanged during WAP), the
    staged content, the published content, and history retention in
    one row set."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_branch_wap")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    v1 = store.commit(base)
    store.create_branch("audit")

    repl = base.filter(F.col("k") % 7 == 0).withColumn(
        "val", F.col("val") + 500
    )
    ins = base.filter(F.col("k") % 14 == 0).select(
        (F.col("k") + 10000000).alias("k"),
        "o_year",
        ((F.col("k") + 10000000) % 97).alias("val"),
    )
    store.branch("audit").upsert(spark, repl.unionByName(ins), ["k"])

    def fp(stage, df):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(stage).alias("stage"), "n_rows", "sum_keys", "sum_val"
        )

    out = fp("parent_v1", store.read(spark, version=v1))
    # mid-WAP: the parent head must still serve v1's content
    out = out.unionByName(
        fp("parent_during_wap", store.read(spark))
    )
    out = out.unionByName(
        fp("branch_staged", store.branch("audit").read(spark))
    )
    v2 = store.merge_branch("audit")                      # publish
    out = out.unionByName(
        fp("parent_after_publish", store.read(spark, version=v2))
    )
    out = out.unionByName(
        fp("parent_v1_time_travel", store.read(spark, version=v1))
    )
    return out


# ---------------------------------------------------------------- S34
@register_query(
    "snapshot_rollback_read",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    bad AS (
      SELECT * FROM base WHERE k % 5 <> 0
      UNION ALL
      SELECT k, o_year, 0 AS val FROM base WHERE k % 5 = 0
    ),
    good AS (
      SELECT * FROM base WHERE k % 11 <> 0
      UNION ALL
      SELECT k, o_year, val + 7 AS val FROM base WHERE k % 11 = 0
    ),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(val) AS BIGINT) AS sv FROM base),
    w AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(val) AS BIGINT) AS sv FROM bad),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(val) AS BIGINT) AS sv FROM good)
    SELECT 1 AS version, 'commit' AS operation, b.n AS n_rows,
           b.sv AS sum_val FROM b
    UNION ALL SELECT 2, 'upsert', w.n, w.sv FROM w
    UNION ALL SELECT 3, 'rollback', b.n, b.sv FROM b
    UNION ALL SELECT 4, 'upsert', g.n, g.sv FROM g
    ORDER BY version
    """,
    tags="S34 S35",
)
def snapshot_rollback_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S34+S35: rollback lifecycle with the operation log as witness
    (io/snapshots.py:rollback/history — Iceberg's
    ``rollback_to_snapshot`` + the snapshots metadata table). v1
    commits orders; v2 is a BAD upsert (zeroes every 5th key's value);
    v3 rolls the table back to v1 — METADATA-ONLY, one manifest write
    restoring the head while v2 stays auditable; v4 is the corrected
    upsert applied ON TOP of the restored content. Each version's row
    carries the history() OPERATION that produced it plus content
    fingerprints; the oracle re-derives the contents and hardcodes the
    op strings, so the hash certifies both the restore semantics (v3
    content == v1) and the audit trail (the op log names rollback, not
    a masked commit). At 100 TB: undoing a botched million-row write
    costs one JSON manifest, zero data I/O."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_rollback")
    shutil.rmtree(root, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                    # v1
    store.upsert(
        spark,
        base.filter(F.col("k") % 5 == 0).withColumn("val", F.lit(0)),
        ["k"],
    )                                                     # v2 (bad)
    store.rollback(1)                                     # v3
    store.upsert(
        spark,
        base.filter(F.col("k") % 11 == 0).withColumn(
            "val", F.col("val") + 7
        ),
        ["k"],
    )                                                     # v4
    ops = {e["version"]: e["operation"] for e in store.history()}
    out = None
    for v in (1, 2, 3, 4):
        row = store.read(spark, version=v).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(v).cast("bigint").alias("version"),
            F.lit(ops[v]).alias("operation"),
            "n_rows",
            "sum_val",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("version")


# ---------------------------------------------------------------- S35
@register_query(
    "snapshot_history_audit",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    upd AS (
      SELECT * FROM base WHERE k % 9 <> 0
      UNION ALL
      SELECT k, o_year, val + 3 AS val FROM base WHERE k % 9 = 0
    ),
    afterdel AS (SELECT * FROM upd WHERE val < 90),
    ny AS (SELECT CAST(COUNT(DISTINCT o_year) AS BIGINT) AS n FROM base)
    SELECT 1 AS version, CAST(1000.0 AS DOUBLE) AS committed_at,
           'commit' AS operation, ny.n AS n_partitions,
           CAST(0 AS BIGINT) AS n_delete_entries,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_rows
    FROM ny
    UNION ALL
    SELECT 2, CAST(1060.0 AS DOUBLE), 'upsert', ny.n,
           CAST(0 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM upd)
    FROM ny
    UNION ALL
    SELECT 3, CAST(1120.0 AS DOUBLE), 'delete', ny.n,
           CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
    FROM ny
    UNION ALL
    SELECT 4, CAST(1180.0 AS DOUBLE), 'compact',
           (SELECT CAST(COUNT(DISTINCT o_year) AS BIGINT) FROM afterdel),
           CAST(0 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM afterdel)
    FROM ny
    UNION ALL
    SELECT 5, CAST(1240.0 AS DOUBLE), 'rollback', ny.n,
           CAST(0 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base)
    FROM ny
    ORDER BY version
    """,
    tags="S35",
)
def snapshot_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S35: the operation log as a queryable metadata table
    (io/snapshots.py:history_df — Iceberg's snapshots/history table).
    A five-op lifecycle (commit → upsert → MOR delete → compact →
    rollback-to-v1) runs under an INJECTED deterministic commit clock
    (60 s apart from t=1000), then history_df() is returned directly:
    version, committed_at, operation, partition count, pending
    delete-entry count, and the manifest row count — NULL exactly
    while MOR deletes pend (the count_rows refusal rule, surfaced
    honestly in the audit view). The oracle re-derives the row counts
    from orders and hardcodes the clock/op sequence, so the hash
    certifies the ENTIRE audit surface — operations, timestamps,
    delete bookkeeping, row accounting — with zero data I/O at read
    time (driver-side manifest walk; the 100 TB audit dashboard query
    costs no cluster work at all)."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_history_audit")
    shutil.rmtree(root, ignore_errors=True)
    clock = {"t": 940.0}

    def tick() -> float:
        clock["t"] += 60.0
        return clock["t"]

    store = SnapshotStore(root, "o_year", clock=tick)
    store.commit(base)                                    # v1 @1000
    store.upsert(
        spark,
        base.filter(F.col("k") % 9 == 0).withColumn(
            "val", F.col("val") + 3
        ),
        ["k"],
    )                                                     # v2 @1060
    store.delete_where(spark, "val >= 90")                # v3 @1120
    store.compact(spark)                                  # v4 @1180
    store.rollback(1)                                     # v5 @1240
    return store.history_df(spark).orderBy("version")


# ------------------------------------------------------------ S1d Avro
@register_query(
    "source_avro_roundtrip",
    oracle="SELECT * FROM nation",
    tags="S1 S8",
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S8 (Avro): nation → Avro object-container export → Avro
    scan (io/avro_io.py). The remaining mainstream open tabular
    format next to CSV/TSV/Parquet/ORC/NDJSON — this sandbox ships
    neither the spark-avro module nor a DuckDB avro extension, so the
    codec is a self-contained implementation of the PUBLIC Avro OCF
    spec: the sink encodes one container per input partition ON THE
    EXECUTORS (mapInPandas, zigzag-varint binary encoding, embedded
    writer schema, sync-marker framing) and the source decodes them
    through Spark's binaryFile reader — one task per container, bytes
    never crossing the driver. The oracle reads the ORIGINAL parquet,
    so the hash certifies the round trip lossless through a byte
    format neither engine natively speaks."""
    from karna_spark.io.avro_io import read_avro, write_avro

    out = _export_dir(sf_dir, "nation_avro")
    write_avro(table(spark, sf_dir, "nation"), out)
    return read_avro(spark, out)


# ---------------------------------------------------------------- S36
@register_query(
    "snapshot_clone_divergence",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, year(o_orderdate) AS o_year,
             o_orderkey % 97 AS val
      FROM orders
    ),
    v2 AS (
      SELECT k, o_year, CASE WHEN k % 7 = 0 THEN val + 500 ELSE val END AS val
      FROM base
    ),
    clone_div AS (
      SELECT k, o_year, CASE WHEN k % 5 = 0 THEN val + 9 ELSE val END AS val
      FROM v2
    ),
    src_div AS (
      SELECT k, o_year, CASE WHEN k % 3 = 0 THEN val + 1000 ELSE val END AS val
      FROM v2
    ),
    f2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
                  CAST(SUM(val) AS BIGINT) AS sv FROM v2),
    fc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
                  CAST(SUM(val) AS BIGINT) AS sv FROM clone_div),
    fs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sk,
                  CAST(SUM(val) AS BIGINT) AS sv FROM src_div)
    SELECT 'source_v2' AS stage, 'upsert' AS operation,
           n AS n_rows, sk AS sum_keys, sv AS sum_val FROM f2
    UNION ALL SELECT 'clone_at_fork', 'clone', n, sk, sv FROM f2
    UNION ALL SELECT 'clone_diverged', 'upsert', n, sk, sv FROM fc
    UNION ALL SELECT 'source_diverged', 'upsert', n, sk, sv FROM fs
    UNION ALL SELECT 'clone_fork_time_travel', 'clone', n, sk, sv FROM f2
    """,
    tags="S36",
)
def snapshot_clone_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S36: SHALLOW CLONE lifecycle (io/snapshots.py:clone — Delta's
    ``CREATE TABLE ... SHALLOW CLONE``): v1 commits orders, v2 upserts
    every 7th key (so the fork inherits a mixed-version pointer set);
    ``clone()`` forks a fully independent table by POINTER COPY —
    every inherited leaf a symlink (the local-FS form of Iceberg's
    absolute-URI manifests), zero bytes moved, first clone version
    CONTINUING the source lineage so claims never collide. Both
    tables then diverge (clone upserts every 5th key, source every
    3rd); each side's writes are invisible to the other, and the
    clone still time-travels to its fork snapshot afterwards. Each
    stage row carries the operation label the store's history()
    recorded, so the hash also certifies the audit log ('clone', not
    a masked commit). At 100 TB: a full writable dev/test copy of a
    governed table costs one manifest write + |partitions| symlinks."""
    import shutil

    from karna_spark.io.snapshots import SnapshotStore

    base = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        (F.col("o_orderkey") % 97).alias("val"),
    )
    root = _export_dir(sf_dir, "orders_clone_src")
    clroot = _export_dir(sf_dir, "orders_clone_dst")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(clroot, ignore_errors=True)
    store = SnapshotStore(root, "o_year")
    store.commit(base)                                    # v1
    v2 = store.upsert(
        spark,
        base.filter(F.col("k") % 7 == 0).withColumn(
            "val", F.col("val") + 500
        ),
        ["k"],
    )
    cl = store.clone(clroot)                              # fork at v2
    vc = cl.upsert(
        spark,
        cl.read(spark).filter(F.col("k") % 5 == 0).withColumn(
            "val", F.col("val") + 9
        ),
        ["k"],
    )
    vs = store.upsert(
        spark,
        store.read(spark).filter(F.col("k") % 3 == 0).withColumn(
            "val", F.col("val") + 1000
        ),
        ["k"],
    )

    def op_of(st, v):
        return next(
            h["operation"] for h in st.history() if h["version"] == v
        )

    def fp(stage, st, v):
        return st.read(spark, version=v).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("k").cast("bigint").alias("sum_keys"),
            F.sum("val").cast("bigint").alias("sum_val"),
        ).select(
            F.lit(stage).alias("stage"),
            F.lit(op_of(st, v)).alias("operation"),
            "n_rows", "sum_keys", "sum_val",
        )

    out = fp("source_v2", store, v2)
    out = out.unionByName(fp("clone_at_fork", cl, v2))
    out = out.unionByName(fp("clone_diverged", cl, vc))
    out = out.unionByName(fp("source_diverged", store, vs))
    out = out.unionByName(fp("clone_fork_time_travel", cl, v2))
    return out
