"""MERGE-style upsert into a LakeTable — bucket-granularity copy-on-write.

Reference semantics: ``MERGE target USING deduped_batch ON pk`` with
newer-wins update condition, DELETE on winning tombstones, and no INSERT for
unmatched tombstones (BigQuerySqlGenerator.java:441-531). The MERGE input
must already be one row per PK (dedup-before-MERGE,
BigQuerySqlGenerator.java:536-540).

Spark-first redesign (no Iceberg MERGE available, and a join is not needed):
both the table and the batch are keyed by the same hash-bucket function, so

  1. find the buckets the batch touches (distinct bucket of winners — tiny),
  2. read ONLY those buckets' files from the current snapshot,
  3. ``unionByName`` target rows (at their stored cursor position) with the
     batch winners and re-run the same LWW max_by aggregate,
  4. rewrite just those buckets; commit atomically.

This replaces a full-table MERGE join with one hash aggregate over
(touched-bucket rows + batch). Unaffected buckets are never read or
shuffled. Tombstone rows are *retained* in storage (marked
_ab_cdc_deleted_at) so an out-of-order older update in a later batch can
never resurrect a deleted row (the reference re-includes loaded deletes for
exactly this reason — BigQuerySqlGenerator.java:577-586); the final read
view filters them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark import schemas as S
from airbyte_spark.lake.table import LakeTable
from airbyte_spark.operators.dedup import lww_dedup

_TS_TMP = "_ts_ms_tmp"


def merge_upsert(
    table: LakeTable,
    winners: DataFrame,
    summary: dict,
    dedup_strategy: str = "agg",
    write_partitions: int | None = None,
    affected_buckets: list[int] | None = None,
) -> int | None:
    """Apply a deduped batch (exactly one row per doc_id, table row shape +
    ``ts_ms``) to the table. Returns the committed snapshot version, or None
    for an empty batch.

    ``affected_buckets``: pass the bucket set if already known (the engine
    folds it into the lineage aggregate) to avoid a second driver action.
    """
    snap = table.snapshot()
    schema = snap.schema
    cols = schema.fieldNames()

    batch = winners.select(*cols, F.col("ts_ms").alias(_TS_TMP))

    affected = affected_buckets
    if affected is None:
        affected = [
            r[0]
            for r in winners.select(table.bucket_expr("doc_id").alias("b")).distinct().collect()
        ]
    if not affected:
        return None

    target = table.scan(buckets=affected).withColumn(
        _TS_TMP, F.unix_millis(F.col(S.COL_EXTRACTED_AT))
    )

    combined = target.unionByName(batch)
    merged = lww_dedup(
        combined,
        key="doc_id",
        strategy=dedup_strategy,
        order_cols=(S.COL_LSN, _TS_TMP),
    ).drop(_TS_TMP)

    return table.write_and_commit(
        merged.select(*cols),
        replace_buckets=affected,
        summary=summary,
        write_partitions=write_partitions,
    )
