"""CLI entry (karna-cli analog): subprocess tests asserting output rows
of known queries through all three front-ends."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv: str) -> list[dict]:
    """Run ``python -m karna_spark`` in a fresh process; parse JSONL."""
    proc = subprocess.run(
        [sys.executable, "-m", "karna_spark", *argv],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]


@pytest.mark.slow
def test_cli_all_frontends_one_process(tmp_path):
    """One subprocess round-trip per front-end would cost 3 JVM starts;
    the SQL case also covers --register persistence via the metastore,
    then GraphQL/NL run as separate invocations reattaching from it."""
    store = str(tmp_path / "ms.json")

    rows = run_cli(
        "SELECT r_name FROM region ORDER BY r_name",
        "--fixtures", SF_SMOKE,
        "--metastore", store,
        "--register", f"region_ms={os.path.join(SF_SMOKE, 'region.parquet')}",
    )
    assert [r["r_name"] for r in rows] == [
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    ]

    # The registration persisted: a NEW process resolves region_ms with
    # no --fixtures at all.
    rows = run_cli(
        "SELECT COUNT(*) AS n FROM region_ms",
        "--metastore", store,
    )
    assert rows[0]["n"] == 5

    listed = run_cli("--list-datasets", "--metastore", store)
    assert [d["name"] for d in listed] == ["region_ms"]


@pytest.mark.slow
def test_cli_graphql_and_nl():
    rows = run_cli(
        "--graphql",
        "query { nation(orderBy: [{n_nationkey: ASC}], limit: 2) { n_name } }",
        "--fixtures", SF_SMOKE,
    )
    assert len(rows) == 2 and "n_name" in rows[0]

    rows = run_cli(
        "--nl", "count of orders by order status", "--fixtures", SF_SMOKE
    )
    assert {r["o_orderstatus"] for r in rows} == {"F", "O", "P"}


@pytest.mark.slow
def test_cli_rejects_writes_and_bad_grammar():
    proc = subprocess.run(
        [sys.executable, "-m", "karna_spark", "DROP TABLE nation",
         "--fixtures", SF_SMOKE],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 1
    assert "read-only" in proc.stderr
