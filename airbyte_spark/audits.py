"""Declarative data-quality audits — the "A" of write-audit-publish.

The engine can stage every replay-path commit (EngineConfig.stage_commits;
Iceberg WAP) so downstream readers keep the published head while a sync
awaits review. This module supplies the review: a list of declarative
expectations evaluated against the STAGED table state, and
``CdcEngine.audit_and_publish`` turns the verdict into the atomic
publish-or-abandon decision (abandon also rewinds the checkpoint so the
rejected LSN range replays cleanly — engine.abandon_staged).

Expectations (dbt-test / Great-Expectations shaped, data only):

- ``{"op": "unique_key", "columns": [..]}``        no duplicate keys
- ``{"op": "not_null", "column": c}``               zero NULLs in c
- ``{"op": "accepted_range", "column": c,
    "min": x, "max": y}``                           non-null values within
                                                    bounds (either optional)
- ``{"op": "row_count_min", "min": n}``             at least n rows
- ``{"op": "row_delta", "max_drop_pct": p}``        rows may not drop more
                                                    than p% vs the PUBLISHED
                                                    head (mass-delete guard)
- ``{"op": "expression", "name": ..., "sql": e}``   zero rows violate the
                                                    boolean SQL expression e

Scale design: every violation counter compiles into ONE aggregate pass over
the staged table (conditional sums + count + one distinct-count for
unique_key — Spark's expand plan keeps it a single scan); ``row_delta``
adds one count on the published head. No collects beyond the single
aggregate row. Audits never mutate anything — the decision stays with the
caller (or audit_and_publish).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.lineage import log_metric

_OPS = {"unique_key", "not_null", "accepted_range", "row_count_min",
        "row_delta", "expression"}


@dataclass(frozen=True)
class AuditResult:
    name: str
    passed: bool
    observed: Any
    detail: str = ""


def _spec_name(spec: dict) -> str:
    if spec["op"] == "expression":
        return spec.get("name") or f"expression:{spec['sql']}"
    col = spec.get("column") or ",".join(spec.get("columns", []))
    return f"{spec['op']}:{col}" if col else spec["op"]


def run_audits(
    staged: DataFrame,
    specs: Sequence[dict],
    published: DataFrame | None = None,
) -> list[AuditResult]:
    """Evaluate every expectation; returns one AuditResult per spec, in
    order. Raises ValueError on a malformed spec (bad specs must fail the
    sync loudly, not pass vacuously)."""
    aggs: list = [F.count("*").alias("_n_rows")]
    for i, spec in enumerate(specs):
        op = spec.get("op")
        if op not in _OPS:
            raise ValueError(f"unknown audit op {op!r} in {spec!r}")
        if op == "unique_key":
            cols = spec["columns"]
            if not cols:
                raise ValueError(f"unique_key needs columns: {spec!r}")
            aggs.append(
                F.count_distinct(F.struct(*[F.col(c) for c in cols])).alias(f"_a{i}")
            )
        elif op == "not_null":
            aggs.append(
                F.sum(F.col(spec["column"]).isNull().cast("long")).alias(f"_a{i}")
            )
        elif op == "accepted_range":
            c = F.col(spec["column"])
            cond = F.lit(False)
            if "min" in spec:
                cond = cond | (c < F.lit(spec["min"]))
            if "max" in spec:
                cond = cond | (c > F.lit(spec["max"]))
            if "min" not in spec and "max" not in spec:
                raise ValueError(f"accepted_range needs min and/or max: {spec!r}")
            aggs.append(F.sum(cond.cast("long")).alias(f"_a{i}"))
        elif op == "expression":
            aggs.append(
                F.sum((~F.expr(spec["sql"])).cast("long")).alias(f"_a{i}")
            )
        elif op == "row_delta" and published is None:
            raise ValueError("row_delta audit needs the published DataFrame")
        # row_count_min / row_delta read _n_rows

    row = staged.agg(*aggs).collect()[0]
    n_rows = row["_n_rows"]
    n_published = published.count() if published is not None else None

    out: list[AuditResult] = []
    for i, spec in enumerate(specs):
        op, name = spec["op"], _spec_name(spec)
        if op == "unique_key":
            dupes = n_rows - row[f"_a{i}"]
            out.append(AuditResult(name, dupes == 0, dupes,
                                   f"{dupes} duplicate key rows"))
        elif op in ("not_null", "accepted_range", "expression"):
            bad = row[f"_a{i}"] or 0
            out.append(AuditResult(name, bad == 0, bad,
                                   f"{bad} violating rows"))
        elif op == "row_count_min":
            out.append(AuditResult(name, n_rows >= spec["min"], n_rows,
                                   f"rows={n_rows} min={spec['min']}"))
        elif op == "row_delta":
            if n_published == 0:
                out.append(AuditResult(name, True, n_rows, "no published baseline"))
            else:
                drop_pct = max(0.0, 100.0 * (n_published - n_rows) / n_published)
                out.append(
                    AuditResult(
                        name,
                        drop_pct <= spec["max_drop_pct"],
                        round(drop_pct, 3),
                        f"rows {n_published} -> {n_rows}",
                    )
                )
    for r in out:
        log_metric("audit_result", audit=r.name, passed=r.passed,
                   observed=r.observed)
    return out
