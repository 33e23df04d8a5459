"""Durable dataset catalog (karna-db analog).

The reference dedicates a crate (reference karna-db/src/lib.rs:1-14,
template only) and its infra (PostgreSQL 17 + diesel-cli, reference
docker-compose.yaml:2-19, flake.nix:26) to a persisted metadata store:
registered datasets must survive the process. The Spark-native
realization keeps the same separation — the ENGINE catalog stays the
Spark session catalog; this module only persists the name↔files binding
(plus the inferred schema, so a registered CSV keeps a stable schema
across sessions per SURVEY.md §1.1) to a small JSON document.

JSON-on-disk stands in for Postgres: the record set is tiny (one row
per dataset), every write rewrites the whole document atomically
(tmp + os.replace), and the file travels with the deployment. Swapping
in a real Postgres/JDBC store would change only ``_load``/``_flush``.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from karna_spark.catalog import infer_format, read_table

DEFAULT_PATH = os.environ.get(
    "KARNA_SPARK_METASTORE", os.path.expanduser("~/.karna_spark/metastore.json")
)


@dataclass
class DatasetRecord:
    """One persisted dataset registration.

    ``foreign_keys`` are declared FK edges ``[fk_col, parent_table,
    parent_col]`` — the metadata the NL and GraphQL front-ends use to
    offer joins/nesting over user-registered datasets (the reference's
    Postgres catalog would hold the same edges as relations)."""

    name: str
    path: str
    fmt: str
    options: dict[str, str] = field(default_factory=dict)
    schema_json: str | None = None  # StructType.json() captured at registration
    foreign_keys: list[list[str]] = field(default_factory=list)


@dataclass
class SavedQuery:
    """A persisted named query in any of the three surface languages —
    the 'saved queries in the catalog' role of the reference's Postgres
    store (reference docker-compose.yaml:2-19)."""

    name: str
    language: str  # sql | graphql | nl
    text: str


class Metastore:
    """Persisted name → files catalog with session attach/detach."""

    def __init__(self, store_path: str = DEFAULT_PATH):
        self.store_path = store_path
        self._records: dict[str, DatasetRecord] = {}
        self._queries: dict[str, SavedQuery] = {}
        self._load()

    # ------------------------------------------------------- persistence
    def _load(self) -> None:
        if not os.path.exists(self.store_path):
            return
        with open(self.store_path, encoding="utf-8") as f:
            doc = json.load(f)
        for rec in doc.get("datasets", []):
            self._records[rec["name"]] = DatasetRecord(**rec)
        for rec in doc.get("queries", []):
            self._queries[rec["name"]] = SavedQuery(**rec)

    def _flush(self) -> None:
        os.makedirs(os.path.dirname(self.store_path) or ".", exist_ok=True)
        doc = {
            "version": 1,
            "datasets": [asdict(r) for r in self._records.values()],
            "queries": [asdict(q) for q in self._queries.values()],
        }
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.store_path) or ".", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                json.dump(doc, f, indent=2, sort_keys=True)
            os.replace(tmp, self.store_path)  # atomic on POSIX
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    # -------------------------------------------------------------- CRUD
    def list(self) -> list[DatasetRecord]:
        return sorted(self._records.values(), key=lambda r: r.name)

    def get(self, name: str) -> DatasetRecord | None:
        return self._records.get(name)

    def drop(self, name: str) -> bool:
        existed = self._records.pop(name, None) is not None
        if existed:
            self._flush()
        return existed

    # ------------------------------------------------------ saved queries
    def save_query(self, name: str, language: str, text: str) -> SavedQuery:
        if language not in ("sql", "graphql", "nl"):
            raise ValueError(f"unknown query language {language!r}")
        q = SavedQuery(name=name, language=language, text=text)
        self._queries[name] = q
        self._flush()
        return q

    def get_query(self, name: str) -> SavedQuery | None:
        return self._queries.get(name)

    def list_queries(self) -> list[SavedQuery]:
        return sorted(self._queries.values(), key=lambda q: q.name)

    def drop_query(self, name: str) -> bool:
        existed = self._queries.pop(name, None) is not None
        if existed:
            self._flush()
        return existed

    # ----------------------------------------------------- Spark binding
    def register(
        self,
        spark: SparkSession,
        name: str,
        path: str,
        fmt: str | None = None,
        foreign_keys: list[list[str]] | None = None,
        **options: str,
    ) -> DataFrame:
        """Register in the live session AND persist the binding.

        The schema observed at registration time (file footer for
        parquet, one inference pass for CSV/TSV) is captured so later
        sessions attach without re-inference and with a STABLE schema —
        the property the reference's Postgres catalog exists to provide.

        ``foreign_keys``: optional FK edges ``[fk_col, parent_table,
        parent_col]`` consumed by the NL/GraphQL front-ends to join or
        nest this dataset against its parents.
        """
        fmt = fmt or infer_format(path)
        df = read_table(spark, path, fmt=fmt, **options)
        df.createOrReplaceTempView(name)
        self._records[name] = DatasetRecord(
            name=name,
            path=path,
            fmt=fmt,
            options=dict(options),
            schema_json=df.schema.json(),
            foreign_keys=[list(fk) for fk in (foreign_keys or [])],
        )
        self._flush()
        return df

    def attach(self, spark: SparkSession, names: list[str] | None = None) -> list[str]:
        """Bind persisted datasets into ``spark``'s temp-view namespace
        (load-on-session-start). Returns the attached names."""
        attached = []
        for rec in self.list():
            if names is not None and rec.name not in names:
                continue
            schema = (
                T.StructType.fromJson(json.loads(rec.schema_json))
                if rec.schema_json
                else None
            )
            df = read_table(spark, rec.path, fmt=rec.fmt, schema=schema, **rec.options)
            df.createOrReplaceTempView(rec.name)
            attached.append(rec.name)
        return attached
