"""Scalar function library (SURVEY.md §2.7 F1-F7; F3 lives in
timeseries.py, F8-F9 in vectors.py / text_pipeline.py).

One oracle-checked query per family, each exercising the
representative surface from the inventory. Everything is a built-in
`pyspark.sql.functions` column expression — JVM-side, inside
whole-stage codegen, no Python on the executor hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from karna_spark.queries.registry import register_query, table


# ---------------------------------------------------------------- F1
@register_query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name_head,
           p_brand || '/' || p_type AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           instr(p_name, 'a') AS first_a,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
           trim('  ' || p_type || ' ') AS type_trimmed,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold,
           CASE WHEN regexp_matches(p_type, '^(PROMO|ECONOMY)') THEN 1 ELSE 0 END AS is_cheap_line
    FROM part
    """,
    tags="F1 P1",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: string family — case, slicing, concat, replace, padding,
    search, regex extract/replace/match, LIKE."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
        F.when(F.col("p_type").rlike("^(PROMO|ECONOMY)"), 1).otherwise(0).alias("is_cheap_line"),
    )


# ---------------------------------------------------------------- F2
@register_query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           ROUND(sqrt(l_quantity), 4) AS qty_sqrt,
           ROUND(power(l_discount, 2), 4) AS disc_sq,
           ROUND(ln(l_extendedprice), 4) AS price_ln,
           ROUND(exp(l_discount), 4) AS disc_exp,
           ROUND(sin(l_quantity), 4) AS qty_sin,
           greatest(l_quantity, 10.0) AS qty_floor10,
           least(l_quantity, 40.0) AS qty_cap40
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags="F2 P1 P2",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: math family. Transcendentals rounded to 4dp — libm last-ulp
    differences between JVM and DuckDB are ~1e-15 relative, far inside
    the rounding guard band."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow("l_discount", F.lit(2)), 4).alias("disc_sq"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.round(F.exp("l_discount"), 4).alias("disc_exp"),
        F.round(F.sin("l_quantity"), 4).alias("qty_sin"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.least(F.col("l_quantity"), F.lit(40.0)).alias("qty_cap40"),
    )


# ---------------------------------------------------------------- F4
@register_query(
    "array_functions",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
           CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS has_data,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
             AS first5_sorted,
           CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT)
             AS total_word_chars,
           array_to_string(list_transform(list_sort(list_distinct(string_split(text,' ')))[1:3],
                                          x -> upper(x)), ',') AS first3_upper
    FROM documents
    """,
    tags="F4 F9",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: array family incl. higher-order lambdas (transform,
    aggregate) — all codegen'd SQL expressions, no UDFs."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    dwords = F.array_distinct(words)
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(dwords).alias("n_distinct_words"),
        F.array_contains(words, "data").cast("int").alias("has_data"),
        F.concat_ws(",", F.slice(F.array_sort(dwords), 1, 5)).alias("first5_sorted"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_word_chars"),
        F.concat_ws(
            ",", F.transform(F.slice(F.array_sort(dwords), 1, 3), lambda x: F.upper(x))
        ).alias("first3_upper"),
    )


# ---------------------------------------------------------------- F5
@register_query(
    "map_struct_functions",
    oracle="""
    WITH built AS (
      SELECT n_nationkey,
             struct_pack(name := n_name, region := n_regionkey) AS nation_s,
             map([ 'name', 'key' ], [ n_name, CAST(n_nationkey AS VARCHAR) ]) AS nation_m
      FROM nation
    )
    SELECT n_nationkey,
           nation_s.name AS s_name,
           CAST(nation_s.region AS INT) AS s_region,
           nation_m['name'][1] AS m_name,
           CAST(len(map_keys(nation_m)) AS INT) AS n_keys
    FROM built
    """,
    tags="F5",
)
def map_struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: struct/map construction and field access (results projected
    back to scalars so the comparison is representation-independent)."""
    nation = table(spark, sf_dir, "nation")
    built = nation.select(
        "n_nationkey",
        F.named_struct(
            F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey")
        ).alias("nation_s"),
        F.create_map(
            F.lit("name"), F.col("n_name"), F.lit("key"), F.col("n_nationkey").cast("string")
        ).alias("nation_m"),
    )
    return built.select(
        "n_nationkey",
        F.col("nation_s.name").alias("s_name"),
        F.col("nation_s.region").cast("int").alias("s_region"),
        F.element_at(F.col("nation_m"), "name").alias("m_name"),
        F.size(F.map_keys("nation_m")).alias("n_keys"),
    )


# ---------------------------------------------------------------- F6
@register_query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_valid(props) AS INT) AS is_valid,
           CASE WHEN CAST(json_extract(props, '$.k') AS INT) > 50 THEN 'high' ELSE 'low' END
             AS k_band
    FROM events
    WHERE event_id % 10 = 0
    """,
    tags="F6 P2",
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: JSON string columns (events.props) — typed extraction via
    from_json (schema-on-read, the scalable path: parsed once, pruned
    by Catalyst) plus path extraction via get_json_object."""
    from pyspark.sql import types as T

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.withColumn("p", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_int"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.col("p").isNotNull().cast("int").alias("is_valid"),
        F.when(F.col("p.k") > 50, "high").otherwise("low").alias("k_band"),
    )


# ---------------------------------------------------------------- F7
@register_query(
    "hash_functions",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           length(md5(c_name)) AS md5_len
    FROM customer
    WHERE c_custkey % 10 = 0
    """,
    tags="F7",
)
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: portable cryptographic hashes (md5/sha256 agree across all
    engines — the dedup fingerprint primitives). Engine-internal hashes
    (xxhash64, hash) are used inside LSH operators but are not
    cross-engine comparable, so they're exercised in dedup.py's
    rows-only checks and unit tests."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    return cust.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.length(F.md5("c_name")).alias("md5_len"),
    )
