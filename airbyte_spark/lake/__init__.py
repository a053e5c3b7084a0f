"""airbyte_spark.lake — a from-scratch snapshot/manifest table format.

The reference sinks into warehouses or Iceberg (destination-iceberg/
IcebergConsumer.java:131-195: buffer -> temp table -> atomic promote). This
sandbox ships no Iceberg runtime jars, so the lake layer is built from first
principles with the same guarantees Iceberg gives the reference:

- atomic, serializable commits (exclusive-create of the next numbered
  snapshot file == the compare-and-swap of Iceberg's Hadoop catalog);
- snapshot isolation + time travel (readers pin a snapshot's file list);
- schema evolution by metadata only (per-file write-schema recorded; scans
  cast to the current schema — no data rewrite to add/widen columns);
- commit summaries (we stamp batch ids for idempotent, exactly-once replay);
- bucket(primary_key) layout so upserts rewrite only affected buckets.
"""

from airbyte_spark.lake.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
