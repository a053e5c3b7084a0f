"""Canonical schemas for the engine's two datasets.

- ``changelog``: the flattened CDC envelope. The reference flattens a
  Debezium before/after/op/source event to the after-image (before-image for
  deletes) plus metadata columns (DebeziumEventUtils.java:22-33, 98-109);
  delete events carry only the PK (docs/understanding-airbyte/cdc.md:29) —
  here: null payload columns.
- ``tokenseq``: the final lake table. Typed payload columns plus the
  Destinations-V2 lineage trio (_airbyte_raw_id/_extracted_at/_meta —
  JdbcSqlGenerator.java:208-217) and the CDC tombstone marker
  (_ab_cdc_deleted_at); tombstone rows are retained in storage to suppress
  late out-of-order events (BigQuerySqlGenerator.java:577-586) and filtered
  from the final read view.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"

# Engine metadata columns on the final table.
COL_LSN = "_ab_lsn"
COL_EXTRACTED_AT = "_ab_extracted_at"
COL_RAW_ID = "_ab_raw_id"
COL_DELETED_AT = "_ab_cdc_deleted_at"
COL_META = "_ab_meta"
# Synthesized single-column key for streams with a COMPOSITE primary key
# (protocol list-of-paths PK): md5(to_json(struct(cols))) — null-safe
# (to_json keeps NULL components distinct from string lookalikes), computed
# once at ingest; shared name with the destination's composite-key column.
COL_COMPOSITE_PK = "_ab_pk"

META_TYPE = StructType([StructField("errors", ArrayType(StringType()), True)])


def changelog_schema(n_tok_type=IntegerType()) -> StructType:
    return StructType(
        [
            StructField("op", StringType(), False),
            StructField("doc_id", StringType(), False),
            StructField("lsn", LongType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("source_partition", IntegerType(), False),
            StructField("tokens", ArrayType(IntegerType()), True),
            StructField("n_tok", n_tok_type, True),
            StructField("source", StringType(), True),
        ]
    )


def tokenseq_schema(n_tok_type=IntegerType(), extra_payload: list[StructField] | None = None) -> StructType:
    fields = [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", n_tok_type, True),
        StructField("source", StringType(), True),
    ]
    fields += extra_payload or []
    fields += [
        StructField(COL_LSN, LongType(), False),
        StructField(COL_EXTRACTED_AT, TimestampType(), True),
        StructField(COL_RAW_ID, StringType(), True),
        StructField(COL_DELETED_AT, TimestampType(), True),
        StructField(COL_META, META_TYPE, True),
    ]
    return StructType(fields)


# Payload columns = everything that is not engine metadata.
ENGINE_COLS = [COL_LSN, COL_EXTRACTED_AT, COL_RAW_ID, COL_DELETED_AT, COL_META]


def payload_fields(schema: StructType) -> list[StructField]:
    return [f for f in schema.fields if f.name not in ENGINE_COLS]
