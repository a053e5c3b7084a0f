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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        else:
            raise ValueError(f"unknown transform op {op!r}")
    return df
