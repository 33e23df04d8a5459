"""Expectation-suite validation — the AUDIT gate in write-audit-publish
(A37).

A snapshot branch (io/snapshots.py, S26) is only worth forking if
something mechanical decides whether it may merge: a suite of
dbt-test / Great-Expectations-shaped checks evaluated against the
branch head, refusing the publish when any expectation is violated.
Reference scope: the reference declares generic data processing over
tabular corpora (`/root/reference/README.md:2`); the validation gate is
a NORTH-STAR extension of A26/A28's audit family.

Scale shape: every ROW-LOCAL expectation (not-null, range, accepted
values) is a 0/1 flag summed in ONE shared aggregate pass over the
frame — adding an expectation adds a column to the same map-combinable
aggregate, never a scan. Key uniqueness is a two-stage map-combinable
aggregate (group counts → excess sum); referential checks are one
broadcast left join each with the violation counted in the same pass as
the total. No windows, no data-scale shuffles beyond the grouped count,
report size = |expectations| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationError(AssertionError):
    """Raised by :func:`assert_expectations` when the suite fails."""


def _flag(e: dict):
    """0/1 violation flag Column for a row-local expectation."""
    kind, col = e["kind"], e.get("col")
    if kind == "not_null":
        bad = F.col(col).isNull()
    elif kind == "in_range":
        bad = F.col(col).isNull() | (F.col(col) < e["lo"]) | (F.col(col) > e["hi"])
    elif kind == "accepted_values":
        bad = F.col(col).isNull() | ~F.col(col).isin(*e["values"])
    else:
        raise ValueError(f"not a row-local expectation: {kind}")
    return F.when(bad, 1).otherwise(0)


def _name(e: dict) -> str:
    cols = e.get("col") or ",".join(e["cols"])
    return f"{e['kind']}:{cols}"


def expectation_report(df: DataFrame, expectations: list[dict]) -> DataFrame:
    """Evaluate the suite; return one row per expectation:
    ``(expectation string, violations long, total long, ok boolean)``.

    Expectation specs::

        {"kind": "not_null",        "col": c}
        {"kind": "in_range",        "col": c, "lo": x, "hi": y}   # NULL violates
        {"kind": "accepted_values", "col": c, "values": [...]}    # NULL violates
        {"kind": "unique_key",      "cols": [k1, ...]}
        {"kind": "referential",     "col": fk, "dim": DataFrame, "dim_col": pk}
    """
    row_local = [e for e in expectations if e["kind"] not in ("unique_key", "referential")]
    reports: list[DataFrame] = []
    if row_local:
        one = df.agg(
            *[F.sum(_flag(e)).alias(f"_v{i}") for i, e in enumerate(row_local)],
            F.count(F.lit(1)).alias("_total"),
        )
        reports.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(_name(e)).alias("expectation"),
                                F.col(f"_v{i}").cast("long").alias("violations"),
                                F.col("_total").alias("total"),
                            )
                            for i, e in enumerate(row_local)
                        ]
                    )
                ).alias("_r")
            ).select("_r.*")
        )
    for e in expectations:
        if e["kind"] == "unique_key":
            reports.append(
                df.groupBy(*e["cols"])
                .agg(F.count(F.lit(1)).alias("_c"))
                .agg(
                    F.lit(_name(e)).alias("expectation"),
                    (F.sum("_c") - F.count(F.lit(1))).alias("violations"),
                    F.sum("_c").alias("total"),
                )
            )
        elif e["kind"] == "referential":
            # dbt / Great Expectations relationship semantics: a NULL
            # foreign key is SKIPPED (not a violation) — pair with a
            # not_null expectation on the FK column when nulls should
            # fail. ``total`` counts all rows so the report still
            # shows coverage. Internal alias is namespaced so a user
            # column named ``_pk`` cannot collide.
            pk = "__karna_ref_pk"
            dim = e["dim"].select(F.col(e["dim_col"]).alias(pk)).distinct()
            fk = df[e["col"]]
            reports.append(
                df.join(F.broadcast(dim), fk == F.col(pk), "left").agg(
                    F.lit(_name(e)).alias("expectation"),
                    F.sum(
                        F.when(fk.isNotNull() & F.col(pk).isNull(), 1)
                        .otherwise(0)
                    ).alias("violations"),
                    F.count(F.lit(1)).alias("total"),
                )
            )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("ok", F.col("violations") == 0)


def assert_expectations(df: DataFrame, expectations: list[dict]) -> None:
    """The WAP gate: raise :class:`ExpectationError` naming every failed
    expectation unless the whole suite passes. Run this against a
    branch head (``store.branch(name).read(spark)``) before
    ``merge_branch`` — the audit step between write and publish."""
    failed = [
        (r["expectation"], r["violations"])
        for r in expectation_report(df, expectations).collect()
        if not r["ok"]
    ]
    if failed:
        raise ExpectationError(
            "expectations failed: "
            + "; ".join(f"{n} ({v} violations)" for n, v in failed)
        )
