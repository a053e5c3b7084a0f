"""Catalog discovery — the `discover` phase of the sync protocol.

The reference's sources emit an AirbyteCatalog: one entry per stream with a
JSON schema, supported sync modes, source-defined primary key and default
cursor (airbyte-protocol.md:258-336; Stream.as_airbyte_stream,
airbyte_cdk/python/airbyte_cdk/sources/streams/core.py:201-216). Here
discovery reads the Spark schema (for a LakeTable, its committed schema +
spec; for raw files, a one-time inference — inference is a discover-phase
activity only, never on the read path, mirroring discover-vs-read in the
protocol) and maps Spark types to JSON-schema airbyte types (the §1.2
SURVEY.md table, reversed).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from airbyte_spark.lake.table import LakeTable

_SYNC_MODES = ["full_refresh", "incremental"]


def _json_schema_type(dt: T.DataType) -> dict:
    if isinstance(dt, T.StringType):
        return {"type": "string"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.DateType):
        return {"type": "string", "format": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "string", "format": "date-time"}
    if isinstance(dt, T.BinaryType):
        return {"type": "string", "contentEncoding": "base64"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _json_schema_type(dt.elementType)}
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {f.name: _json_schema_type(f.dataType) for f in dt.fields},
        }
    return {"type": "string", "description": f"unsupported spark type {dt.simpleString()}"}


def _stream_entry(
    name: str,
    schema: T.StructType,
    primary_key: str | None = None,
    cursor_field: str | None = None,
) -> dict:
    return {
        "name": name,
        "json_schema": {
            "type": "object",
            "properties": {f.name: _json_schema_type(f.dataType) for f in schema.fields},
        },
        "supported_sync_modes": _SYNC_MODES,
        "source_defined_cursor": cursor_field is not None,
        "default_cursor_field": [cursor_field] if cursor_field else [],
        "source_defined_primary_key": [[primary_key]] if primary_key else [],
    }


def discover_table(table: LakeTable, name: str | None = None) -> dict:
    """Catalog for a LakeTable: committed schema + spec-declared pk/cursor."""
    snap = table.snapshot()
    spec = snap.spec
    return {
        "streams": [
            _stream_entry(
                name or "tokenseq",
                snap.schema,
                primary_key=spec.get("bucket_by"),
                cursor_field=spec.get("cursor_col"),
            )
        ]
    }


def discover_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    name: str | None = None,
    primary_key: str | None = "doc_id",
    cursor_field: str | None = "lsn",
) -> dict:
    """Catalog for a file-based changelog source (schema inferred ONCE here,
    then declared to FileSource on the read path)."""
    if fmt == "parquet":
        schema = spark.read.parquet(path).schema
    elif fmt == "jsonl":
        schema = spark.read.json(path).schema
    elif fmt == "csv":
        schema = spark.read.option("header", "true").option("inferSchema", "true").csv(path).schema
    else:
        schema = spark.read.format(fmt).load(path).schema
    return {
        "streams": [
            _stream_entry(
                name or "changelog",
                schema,
                primary_key=primary_key if primary_key in schema.fieldNames() else None,
                cursor_field=cursor_field if cursor_field in schema.fieldNames() else None,
            )
        ]
    }
