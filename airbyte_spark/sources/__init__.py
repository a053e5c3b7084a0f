"""Source connectors: bounded readers that surface a changelog DataFrame.

The reference's per-format parsers (airbyte-cdk file_based file_types:
csv_parser.py, jsonl_parser.py, avro_parser.py, parquet_parser.py ~950 LoC)
collapse to Spark's built-in readers plus explicit-schema enforcement.
"""

from airbyte_spark.sources.auth import BasicHttpAuth, OAuth2Auth, StaticTokenAuth
from airbyte_spark.sources.declarative import (
    DeclarativeStream,
    ManifestSource,
    interpolate,
)
from airbyte_spark.sources.files import FileSource, open_changelog
from airbyte_spark.sources.http import DatetimeSlicer, HttpStreamSource, Paginator
from airbyte_spark.sources.jdbc import jdbc_snapshot

__all__ = [
    "BasicHttpAuth",
    "DatetimeSlicer",
    "DeclarativeStream",
    "ManifestSource",
    "interpolate",
    "FileSource",
    "open_changelog",
    "HttpStreamSource",
    "OAuth2Auth",
    "Paginator",
    "StaticTokenAuth",
    "jdbc_snapshot",
]
