"""Session tuning contract: shuffle-partition override precedence.

A deliberately-set shuffle.partitions (cluster operator, env knob) must
survive ``tune_session``; only Spark's stock default of 200 — the
driver's plain session — is replaced with a scale-appropriate value.
"""

from __future__ import annotations

import pytest

from karna_spark.session import shuffle_partitions_default, tune_session


@pytest.fixture(autouse=True)
def _restore_shuffle_conf(spark):
    """These tests poke the shared session's conf; put it back after."""
    original = spark.conf.get("spark.sql.shuffle.partitions")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", original)


def test_tune_session_overrides_stock_default(spark):
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    tune_session(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
    # AQE gets a higher starting parallelism to coalesce down from.
    init = int(
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    )
    assert init >= int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_tune_session_preserves_deliberate_setting(spark):
    spark.conf.set("spark.sql.shuffle.partitions", "96")
    tune_session(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "96"
    tune_session(spark)  # idempotent
    assert spark.conf.get("spark.sql.shuffle.partitions") == "96"


def test_env_knob_wins_over_local_parallelism(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "48")
    assert shuffle_partitions_default() == 48
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    tune_session(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "48"


def test_env_knob_empty_means_leave_alone(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", " ")
    assert shuffle_partitions_default() is None
