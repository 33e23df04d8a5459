"""Mechanical SURVEY.md §2 ↔ registry coverage gate (r8 verdict item 4).

Every §2 inventory row id must be traceable to evidence without
reading prose: either a registered query tagged with the row id
(driver-certified) or an entry in PYTEST_GATED naming the test module
that gates it (storage/serving ops with no query surface). And the
reverse: every row-shaped tag used in the registry must name a real
§2 row — a typo'd tag would otherwise silently count as coverage.
"""

from __future__ import annotations

import os
import re

from karna_spark.queries.registry import REGISTRY

SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")

# §2 rows with no driver-query surface, gated by named test modules.
PYTEST_GATED = {
    "S4": "tests/test_object_store.py",   # object-store scheme dispatch
    "S7": "tests/test_server.py",          # API/CLI result page
    "S15": "tests/test_snapshots.py",      # vacuum
    "S17": "tests/test_snapshots.py",      # redact (right-to-be-forgotten)
    "S21": "tests/test_snapshots.py",      # snapshot tags
    "S23": "tests/test_snapshots.py",      # small-file compaction rewrite
    "S26": "tests/test_snapshots.py",      # branches (write-audit-publish)
    "S29": "tests/test_snapshots.py",      # column type widening
    "S34": "tests/test_snapshots.py",      # snapshot rollback
    "S35": "tests/test_snapshots.py",      # operation log / history
    "V1": "tests/test_frontends.py",       # front-end translators (plus rows)
    "V2": "tests/test_cli.py",             # CLI entry
    "V3": "tests/test_metastore.py",       # durable catalog
    "V5": "tests/test_server.py",          # web server
}

# Registry tags that are deliberately NOT §2 row ids (family labels).
NON_ROW_TAGS = {"FE-NL", "FE-GQL", "PIPE"}

_ROW_RE = re.compile(r"^\| ([A-Z]{1,2}[0-9]+[a-z]?) \|")


def survey_rows() -> set[str]:
    rows: set[str] = set()
    in_s2 = False
    for line in open(SURVEY, encoding="utf-8"):
        if line.startswith("### 2.1 "):
            in_s2 = True
        elif line.startswith("## 3"):
            break
        if in_s2:
            m = _ROW_RE.match(line)
            if m:
                rows.add(m.group(1))
    assert len(rows) > 140, f"SURVEY §2 parse broke: only {len(rows)} rows"
    return rows


def registry_tags() -> set[str]:
    tags: set[str] = set()
    for q in REGISTRY.values():
        tags.update(q.tags)
    return tags


def test_every_survey_row_has_evidence():
    rows = survey_rows()
    covered = registry_tags() | set(PYTEST_GATED)
    missing = sorted(rows - covered)
    assert not missing, (
        f"SURVEY §2 rows with neither a tagged query nor a PYTEST_GATED "
        f"entry: {missing}"
    )


def test_every_row_tag_names_a_survey_row():
    rows = survey_rows()
    bogus = sorted(registry_tags() - rows - NON_ROW_TAGS)
    assert not bogus, (
        f"registry tags that match no SURVEY §2 row (typo or stale): {bogus}"
    )


def test_pytest_gated_modules_exist():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for row, mod in PYTEST_GATED.items():
        assert os.path.exists(os.path.join(here, mod)), (row, mod)
