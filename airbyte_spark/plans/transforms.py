"""Declarative record transforms — config-driven filter / add / remove.

Reference parity: the low-code CDK's per-record transformation plugins —
``RecordFilter`` (Jinja predicate over record/state,
declarative/extractors/record_filter.py:13-36), ``AddFields``
(declarative/transformations/add_fields.py:35-130) and ``RemoveFields``
(declarative/transformations/remove_fields.py:15-63) — applied one record
at a time in Python. Here the same pipeline is a list of declarative specs
compiled to Catalyst expressions: the whole chain fuses into the scan's
project/filter stage (whole-stage codegen, zero Python on the data path),
and predicates still push down to the source scan.

Spec grammar (JSON-friendly, like the low-code YAML manifest):
    {"op": "filter", "predicate": "<SQL boolean expr>"}
    {"op": "add_field", "name": "<col>", "expr": "<SQL expr>"}
    {"op": "remove_fields", "names": ["a", "b"]}
    {"op": "extract_path", "column": "<json str col>", "path": ["data", "*"],
     "schema": "<element DDL, e.g. struct<id:bigint,v:string>>"}
    {"op": "sanitize_cursor", "column": "<string cursor col>"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dpath_extract(
    df: DataFrame, column: str, path: list[str], element_schema: str
) -> DataFrame:
    """The dpath response extractor
    (declarative/extractors/dpath_extractor.py:18): pull the record list
    out of a JSON envelope column and explode it to one row per record,
    record fields lifted to top-level columns. A trailing "*" in the path
    means "each element of the array at that location"; without it the
    path names a single object. All JVM-side (from_json + explode —
    no per-record Python, unlike the reference's dpath walk)."""
    steps = [p for p in path if p != "*"]
    explode_last = bool(path) and path[-1] == "*"
    json_path = "$" + "".join(f".{s}" for s in steps)
    if explode_last:
        arr = F.from_json(
            F.get_json_object(F.col(column), json_path),
            f"array<{element_schema}>",
        )
        rec = F.explode(arr).alias("_rec")
    else:
        rec = F.from_json(
            F.get_json_object(F.col(column), json_path), element_schema
        ).alias("_rec")
    keep = [c for c in df.columns if c != column]
    return df.select(*keep, rec).select(*keep, F.col("_rec.*"))


def sanitize_cursor(df: DataFrame, column: str) -> DataFrame:
    """Strip NUL bytes from a string cursor value before comparison /
    checkpointing (StateDecoratingIterator.java:93-100 — some sources emit
    \\u0000 inside text cursors, which breaks downstream state stores)."""
    return df.withColumn(
        column, F.regexp_replace(F.col(column), "\u0000", "")
    )


def apply_transforms(df: DataFrame, specs: list[dict]) -> DataFrame:
    """Compile and apply a declarative transform chain."""
    for spec in specs:
        op = spec["op"]
        if op == "filter":
            df = df.filter(F.expr(spec["predicate"]))
        elif op == "add_field":
            df = df.withColumn(spec["name"], F.expr(spec["expr"]))
        elif op == "remove_fields":
            df = df.drop(*spec["names"])
        elif op == "extract_path":
            df = dpath_extract(df, spec["column"], spec["path"], spec["schema"])
        elif op == "sanitize_cursor":
            df = sanitize_cursor(df, spec["column"])
        else:
            raise ValueError(f"unknown transform op {op!r}")
    return df
