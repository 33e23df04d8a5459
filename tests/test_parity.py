"""Oracle-differential tests: every registered query with an oracle is
compared against DuckDB at sf0.01 — the same comparison the driver's
t2 gate performs (row count + schema + order-insensitive values).

Queries without an oracle get a rows-materialize smoke check.
"""

from __future__ import annotations

import pytest

from karna_spark.oracle import check_query
from karna_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, duck, name):
    res = check_query(spark, duck, name, SF_ORACLE)
    assert res.ok, f"{name}: {res.detail}"
