"""Session tuning contract: shuffle-partition override precedence.

A deliberately-set shuffle.partitions (cluster operator, env knob,
runtime ``conf.set`` — even to exactly 200) must survive
``tune_session``; only Spark's stock default — a session where the conf
was never explicitly set, like the driver's plain builder — is replaced
with a scale-appropriate value. "Stock default" is simulated here with
``conf.unset`` (which clears the explicit entry and reverts the session
to the built-in 200), not by setting 200, because an explicit 200 is a
deliberate pin under the contract.
"""

from __future__ import annotations

import pytest

from karna_spark.session import (
    _AUTOTUNE_MARKER,
    shuffle_partitions_default,
    tune_session,
)

KEY = "spark.sql.shuffle.partitions"


@pytest.fixture(autouse=True)
def _restore_shuffle_conf(spark):
    """These tests poke the shared session's conf; put it back after."""
    original = spark.conf.get(KEY)
    yield
    spark.conf.set(KEY, original)
    spark.conf.unset(_AUTOTUNE_MARKER)


def test_tune_session_overrides_stock_default(spark):
    # Unset → the session reports Spark's built-in 200 with no explicit
    # entry: the driver's plain-builder state.
    spark.conf.unset(KEY)
    assert spark.conf.get(KEY) == "200"
    tune_session(spark)
    assert spark.conf.get(KEY) != "200"
    assert spark.conf.get(KEY) == str(shuffle_partitions_default())
    # AQE gets a higher starting parallelism to coalesce down from.
    init = int(
        spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    )
    assert init >= int(spark.conf.get(KEY))


def test_tune_session_preserves_deliberate_setting(spark):
    spark.conf.set(KEY, "96")
    tune_session(spark)
    assert spark.conf.get(KEY) == "96"
    tune_session(spark)  # idempotent
    assert spark.conf.get(KEY) == "96"


def test_deliberate_200_is_preserved(spark):
    # The round-4 contract change: an explicit 200 is a pin, not the
    # stock default, and must not be clobbered.
    spark.conf.set(KEY, "200")
    tune_session(spark)
    assert spark.conf.get(KEY) == "200"


def test_retune_replaces_own_autotune_but_not_user_override(spark):
    # First tune on a stock session pins the default and marks it ours.
    spark.conf.unset(KEY)
    tune_session(spark)
    assert spark.conf.get(_AUTOTUNE_MARKER) == spark.conf.get(KEY)
    # A later user conf.set makes the marker stale: re-tuning keeps it.
    spark.conf.set(KEY, "96")
    tune_session(spark)
    assert spark.conf.get(KEY) == "96"


def test_env_knob_wins_over_local_parallelism(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "48")
    assert shuffle_partitions_default() == 48
    spark.conf.unset(KEY)  # stock session — the knob may retune it
    tune_session(spark)
    assert spark.conf.get(KEY) == "48"


def test_env_knob_empty_means_leave_alone(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", " ")
    assert shuffle_partitions_default() is None
