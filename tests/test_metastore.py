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
