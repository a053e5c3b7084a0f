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
    {"op": "extract_typed", "column": "<json str col>",
     "schema": {"<field>": "<DDL type>", ...}, "errors_col": "_ab_errors"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_once(df: DataFrame, carrier, select, keep=()) -> DataFrame:
    """Evaluate an expensive projection exactly ONCE per row.

    ``carrier`` is a struct Column bundling every expensive derivation;
    ``select`` is a callable taking the materialized struct Column and
    returning the output column list. The struct rides through
    ``explode(array(carrier))`` — a one-element Generate — because a
    Generate is an optimizer barrier Catalyst cannot collapse:

    - CollapseProject cannot inline the carrier's expressions into
      downstream projections, so ``OptimizeJsonExprs`` cannot rewrite one
      ``from_json`` into N per-field pruned parses (measured 4x decode cost
      on the Mongo envelope path — each pruned parse re-scans the full JSON
      text);
    - PushDownPredicate cannot move a downstream filter below the Generate
      when it references generated attributes, so quarantine splits
      (``op IS NOT NULL``) test the materialized column instead of
      re-deriving it per row with a second envelope parse (measured 2x on
      the same path).

    Trade-off: column pruning also stops at the barrier — every carrier
    field is computed even if the consumer drops it. Use only where the
    consumer takes (nearly) the whole carrier, e.g. wire decoders.

    ``keep`` columns ride through the Generate untouched (a Generate
    preserves its child's output) and are prepended to the result.
    """
    keep = list(keep)
    g = df.select(*keep, F.explode(F.array(carrier)).alias("_once"))
    return g.select(*keep, *select(F.col("_once")))


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


def schema_extract(
    df: DataFrame,
    column: str,
    schema: dict[str, str],
    errors_col: str = "_ab_errors",
) -> DataFrame:
    """Generic JSON-schema-driven typed extraction with per-column error
    capture — the T+D cast CTE (BigQuerySqlGenerator.java:536-566
    extractAndCast + caseWhenToError driven by the configured catalog
    schema; 'destinations never fail on mismatch',
    airbyte-protocol.md:439-450) compiled for an ARBITRARY ``{name: type}``
    schema instead of a hard-coded envelope.

    Every scalar/string field is pulled in ONE ``from_json`` pass into an
    all-string struct (a string field reproduces ``get_json_object``
    semantics exactly: numbers/booleans render as their JSON text, missing
    and JSON-null both yield NULL) — one JSON parse per row instead of one
    per field, which dominates wide schemas. Each raw string is then
    safe-cast with ``try_cast``, so a bad value yields NULL in the typed
    column and the column NAME lands in ``errors_col`` (comma-joined,
    schema order), never a failed row. String targets take the raw extract
    (no cast can fail). Array/struct/map targets keep a per-field
    ``get_json_object`` + ``from_json`` (a string struct field would NULL a
    nested object instead of returning its JSON text). The whole compile is
    a single narrow projection fused by whole-stage codegen, zero Python on
    the data path.
    """
    import re

    keep = [c for c in df.columns if c != column]
    # Only plain-identifier names ride the shared from_json struct: a name
    # containing '.' means nested-path traversal under get_json_object
    # semantics (NOT a literal top-level key), and a backtick would break
    # the generated DDL — both keep the legacy per-field path below.
    plain = re.compile(r"^[A-Za-z0-9_]+$")
    scalar_names = [
        n for n, t in schema.items()
        if plain.match(n)
        and not t.lower().strip().startswith(("array", "struct", "map"))
    ]
    if scalar_names:
        # ONE parse per row, enforced: without the Generate barrier inside
        # project_once, CollapseProject inlines this from_json into every
        # field reference and OptimizeJsonExprs re-splits it into one pruned
        # parse per field (each re-scanning the JSON text) — the exact
        # N-parses-per-row cost this shared struct exists to avoid.
        raws = F.from_json(
            F.col(column),
            ", ".join(f"`{n}` string" for n in scalar_names),
        )
        base = project_once(
            df,
            raws,
            lambda once: [once.alias("_raws")],
            keep=[*keep, F.col(column)],
        )
        raw_struct = F.col("_raws")
    else:
        base = df
        raw_struct = None
    typed = []
    errs = []
    for name, typ in schema.items():
        t = typ.lower().strip()
        if name in scalar_names:
            raw = raw_struct.getField(name)
            if t in ("string", "varchar", "text"):
                typed.append(raw.alias(name))
                continue
            cast = raw.try_cast(typ)
        else:  # complex type, dotted path, or non-identifier name
            raw = F.get_json_object(F.col(column), f"$.{name}")
            if t.startswith(("array", "struct", "map")):
                cast = F.from_json(raw, typ)
            elif t in ("string", "varchar", "text"):
                typed.append(raw.alias(name))
                continue
            else:
                cast = raw.try_cast(typ)
        typed.append(cast.alias(name))
        # raw present but cast failed -> this column's name joins the
        # record's error list (concat_ws drops the NULL non-errors)
        errs.append(F.when(raw.isNotNull() & cast.isNull(), F.lit(name)))
    err_expr = F.concat_ws(",", *errs) if errs else F.lit("")
    return base.select(*keep, *typed, err_expr.alias(errors_col))


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
        elif op == "extract_typed":
            df = schema_extract(
                df, spec["column"], spec["schema"],
                errors_col=spec.get("errors_col", "_ab_errors"),
            )
        elif op in (
            "hash_field", "mask_field", "encrypt_field",
            "rename_field", "filter_rows",
        ):
            from airbyte_spark.plans.mappers import apply_mappers

            df = apply_mappers(df, [spec])
        else:
            raise ValueError(f"unknown transform op {op!r}")
    return df
