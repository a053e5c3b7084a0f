"""airbyte_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Reproduces the *semantics* of the reference connector sync loop
(rosecape/airbyte: binlog/WAL tail -> last-writer-wins dedup -> lake upsert,
checkpoint/state, exactly-once via idempotent commits, additive schema
evolution) re-expressed Spark-first:

- change streams and tables are DataFrames, never per-record JSON messages
  (the reference deserializes one JSON line per record even on its async
  path — AsyncStreamConsumer.java:175; we delete that hop entirely);
- the LWW dedup is a ``max_by`` aggregate with map-side partial combine
  instead of the reference's ROW_NUMBER() window
  (BigQuerySqlGenerator.java:572-631) — one exchange, skew-crushed before
  the wire (plan details: PLANS.md);
- the upsert picks one of three regimes per batch by actual event count:
  merge-on-read delta append (small batches — write bytes ~ batch, never
  table), bucket-granularity copy-on-write (mid-size), or a single-action
  whole-table merge (bulk replay), all against a snapshot/manifest table
  format (``airbyte_spark.lake``) with atomic commits and summary-stamped
  batch ids for exactly-once replay;
- multi-stream catalogs sync via ``CatalogEngine`` with per-stream state
  consolidated into one GLOBAL-state document.

See SURVEY.md for the full reference -> Spark mapping.
"""

from airbyte_spark.catalog import CatalogEngine
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.session import get_spark

__all__ = [
    "CatalogEngine",
    "CdcEngine",
    "EngineConfig",
    "StreamConfig",
    "LakeTable",
    "get_spark",
]
