"""Durable catalog: register → new session → resolvable by all three
front-ends (VERDICT r2 item 5; reference karna-db + Postgres infra
analog)."""

from __future__ import annotations

import json
import os

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "metastore.json")


def test_register_persists_and_attaches(spark, store_path, tmp_path):
    from karna_spark.metastore import Metastore

    # Export a headerful CSV so schema inference actually happens once.
    csv_dir = str(tmp_path / "nation_csv")
    spark.read.parquet(os.path.join(SF_SMOKE, "nation.parquet")).coalesce(
        1
    ).write.option("header", True).csv(csv_dir)

    ms = Metastore(store_path)
    ms.register(spark, "nation_ms", csv_dir, fmt="csv")
    ms.register(spark, "customer_ms", os.path.join(SF_SMOKE, "customer.parquet"))

    # The JSON document is on disk, atomic, and carries the schema.
    doc = json.load(open(store_path))
    names = {d["name"] for d in doc["datasets"]}
    assert names == {"nation_ms", "customer_ms"}
    assert all(d["schema_json"] for d in doc["datasets"])

    # A NEW session (fresh temp-view namespace) + a NEW Metastore
    # instance (fresh process stand-in) can resolve the datasets.
    s2 = spark.newSession()
    with pytest.raises(Exception):
        s2.table("nation_ms").collect()  # not attached yet
    attached = Metastore(store_path).attach(s2)
    assert attached == ["customer_ms", "nation_ms"]

    # SQL front-end
    from karna_spark.frontends.sql import execute

    n = execute(s2, "SELECT COUNT(*) AS n FROM nation_ms").collect()[0]["n"]
    assert n == spark.read.parquet(os.path.join(SF_SMOKE, "nation.parquet")).count()

    # Attached CSV keeps the REGISTERED schema (no re-inference drift).
    reg_schema = spark.table("nation_ms").schema
    assert s2.table("nation_ms").schema == reg_schema


def test_attach_serves_graphql_and_nl(spark, store_path):
    """GraphQL/NL resolve fixture-named datasets attached from the
    metastore in a bare new session."""
    from karna_spark.frontends.graphql import translate
    from karna_spark.frontends.nl import ask
    from karna_spark.metastore import Metastore

    ms = Metastore(store_path)
    for t in ("nation", "customer", "region"):
        ms.register(spark, t, os.path.join(SF_SMOKE, f"{t}.parquet"))

    s2 = spark.newSession()
    Metastore(store_path).attach(s2)

    rows = translate(
        s2, "query { nation(orderBy: [{n_nationkey: ASC}], limit: 2) { n_name } }"
    ).collect()
    assert len(rows) == 2
    counted = ask(s2, "count of customer by region name").collect()
    assert sum(r["count"] for r in counted) == s2.table("customer").count()


def test_drop_removes_record(spark, store_path):
    from karna_spark.metastore import Metastore

    ms = Metastore(store_path)
    ms.register(spark, "r1", os.path.join(SF_SMOKE, "region.parquet"))
    assert ms.drop("r1") is True
    assert ms.drop("r1") is False
    assert Metastore(store_path).get("r1") is None


# ------------------------------------------------ SQL-backed store (r12)
def test_sql_metastore_roundtrip_and_parity(spark, tmp_path):
    """SqlMetastore persists the identical record set through a DB-API
    connection (sqlite in-sandbox, psycopg in production) — register,
    saved queries, FK edges, drop, and cross-connection durability all
    behave exactly like the JSON store."""
    import os
    import sqlite3

    from karna_spark.metastore_sql import SqlMetastore
    from tests.conftest import SF_SMOKE

    db = str(tmp_path / "meta.db")
    ms = SqlMetastore.from_dsn(f"sqlite:///{db}")
    ms.register(
        spark, "nation_sql", os.path.join(SF_SMOKE, "nation.parquet"),
        foreign_keys=[["n_regionkey", "region_sql", "r_regionkey"]],
    )
    ms.register(spark, "region_sql", os.path.join(SF_SMOKE, "region.parquet"))
    ms.save_query("q_top", "sql", "SELECT 1 AS one")
    spark.catalog.dropTempView("nation_sql")
    spark.catalog.dropTempView("region_sql")

    # a FRESH connection sees everything (durability through the DB)
    ms2 = SqlMetastore(sqlite3.connect(db))
    assert sorted(d.name for d in ms2.list()) == ["nation_sql", "region_sql"]
    rec = ms2.get("nation_sql")
    assert rec.fmt == "parquet"
    assert rec.foreign_keys == [["n_regionkey", "region_sql", "r_regionkey"]]
    assert rec.schema_json is not None  # stable-schema contract kept
    assert ms2.get_query("q_top").text == "SELECT 1 AS one"
    # attach binds the views back into a session
    attached = ms2.attach(spark)
    assert set(attached) >= {"nation_sql", "region_sql"}
    assert spark.table("nation_sql").count() == 25
    # drop is durable too
    assert ms2.drop_query("q_top") is True
    assert SqlMetastore(sqlite3.connect(db)).get_query("q_top") is None
    spark.catalog.dropTempView("nation_sql")
    spark.catalog.dropTempView("region_sql")


def test_sql_metastore_drives_graphql_mutation_and_nesting(spark, tmp_path):
    """The SQL store is interface-compatible everywhere a Metastore
    goes: GraphQL mutations write through it, FK edges nest reads."""
    from karna_spark.frontends.graphql import (
        rel_schema_from_metastore,
        translate,
    )
    from karna_spark.metastore_sql import SqlMetastore

    spark.createDataFrame(
        [(1, "north")], "zone_id long, zone_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "zsql"))
    spark.createDataFrame(
        [(10, 1, 7.5)], "trip_id long, zone_id long, fare double"
    ).write.mode("overwrite").parquet(str(tmp_path / "tsql"))
    ms = SqlMetastore.from_dsn(f"sqlite:///{tmp_path / 'm.db'}")
    translate(
        spark,
        f'mutation {{ registerDataset(name: "zsql", '
        f'path: "{tmp_path / "zsql"}") {{ registered }} }}',
        metastore=ms,
    ).collect()
    translate(
        spark,
        f'mutation {{ registerDataset(name: "tsql", '
        f'path: "{tmp_path / "tsql"}", foreignKeys: [{{column: "zone_id", '
        f'refTable: "zsql", refColumn: "zone_id"}}]) {{ registered }} }}',
        metastore=ms,
    ).collect()
    rows = translate(
        spark,
        "query { tsql { trip_id zsql { zone_name } } }",
        rel_schema=rel_schema_from_metastore(ms),
    ).collect()
    assert [(r["trip_id"], r["zsql"]["zone_name"]) for r in rows] == [
        (10, "north")
    ]
    spark.catalog.dropTempView("zsql")
    spark.catalog.dropTempView("tsql")


def test_sql_metastore_flush_is_transactional(spark, tmp_path):
    """A failing flush must leave the PREVIOUS records intact — the
    relational analog of the JSON store's atomic tmp+rename."""
    import os
    import sqlite3

    from karna_spark.metastore_sql import SqlMetastore
    from tests.conftest import SF_SMOKE

    db = str(tmp_path / "meta.db")
    ms = SqlMetastore.from_dsn(f"sqlite:///{db}")
    ms.register(spark, "keepme", os.path.join(SF_SMOKE, "region.parquet"))
    # poison one record so json.dumps raises mid-flush
    ms._records["bad"] = type(ms._records["keepme"])(
        name="bad", path="p", fmt="parquet",
        options={"x": object()},  # unserializable
    )
    import pytest as _pytest

    with _pytest.raises(TypeError):
        ms._flush()
    del ms._records["bad"]
    # the committed state (fresh connection) still holds only 'keepme'
    ms2 = SqlMetastore(sqlite3.connect(db))
    assert [d.name for d in ms2.list()] == ["keepme"]
    spark.catalog.dropTempView("keepme")
