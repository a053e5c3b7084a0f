"""AWS DMS JSON envelope decode (sources/dms.py).

Covers the DMS-specific wire quirks: typed ``data`` payloads, ISO
microsecond commit-time ordering (with and without a wire ``seq``
column), ``load`` -> I, control records + unknown operations +
unparseable timestamps + seq overflow quarantined, delete key-only
images, table routing — plus an integration: decoded envelopes drive
LWW resolution with commit-time order honored.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.sources.debezium import split_malformed
from airbyte_spark.sources.dms import decode_dms

PAYLOAD = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def _env(op, data, ts="2024-05-12T19:20:07.360171Z", txn=42,
         record_type="data", table="docs"):
    return json.dumps(
        {
            "data": data,
            "metadata": {
                "timestamp": ts,
                "record-type": record_type,
                "operation": op,
                "partition-key-type": "schema-table",
                "schema-name": "app",
                "table-name": table,
                "transaction-id": txn,
            },
        }
    )


def _decode(spark, rows, **kw):
    if rows and isinstance(rows[0], tuple):
        df = spark.createDataFrame(rows, "value string, seq long")
    else:
        df = spark.createDataFrame([(r,) for r in rows], "value string")
    return decode_dms(df, PAYLOAD, **kw)


def test_typed_payload_and_commit_time_order(spark):
    rows = [
        _env("insert", {"doc_id": "a", "name": "v1", "score": 1.5},
             ts="2024-05-12T19:20:07.360171Z"),
        _env("update", {"doc_id": "a", "name": "v2", "score": 2.5},
             ts="2024-05-12T19:20:07.360172Z"),
        _env("load", {"doc_id": "b", "name": "seed", "score": 0.5},
             ts="2024-05-12T19:20:06.000000Z"),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["seed", "v1", "v2"]
    assert [r["op"] for r in out] == ["I", "I", "U"]
    # typed JSON: numbers arrive as numbers, no string casts
    assert out[1]["score"] == 1.5
    assert out[1]["ts_ms"] == 1715541607360
    assert out[1]["txn_id"] == 42
    from airbyte_spark.operators.dedup import lww_dedup

    win = {r["doc_id"]: r for r in (
        x.asDict() for x in lww_dedup(_decode(spark, rows), key="doc_id").collect())}
    assert win["a"]["name"] == "v2"


def test_seq_col_breaks_same_microsecond_ties(spark):
    ts = "2024-05-12T19:20:07.360171Z"
    rows = [
        (_env("insert", {"doc_id": "a", "name": "first", "score": 0.0}, ts=ts), 3),
        (_env("update", {"doc_id": "a", "name": "second", "score": 1.0}, ts=ts), 7),
    ]
    out = sorted(
        _decode(spark, rows, seq_col="seq").collect(), key=lambda r: r["lsn"]
    )
    assert [r["name"] for r in out] == ["first", "second"]
    assert out[1]["lsn"] - out[0]["lsn"] == 4  # same micros base, seq delta


def test_quarantine_control_unknown_badts_overflow_garbage(spark):
    rows = [
        (_env("insert", {"doc_id": "ok", "name": "n", "score": 0.0}), 0),
        (_env("create-table", None, record_type="control"), 0),
        (_env("frobnicate", {"doc_id": "x", "name": "n", "score": 0.0}), 0),
        (_env("insert", {"doc_id": "badts", "name": "n", "score": 0.0},
              ts="not-a-time"), 0),
        (_env("insert", {"doc_id": "overflow", "name": "n", "score": 0.0}), 99),
        ("{not json", 0),
    ]
    good, bad = split_malformed(_decode(spark, rows, seq_col="seq", seq_bits=6))
    assert [r["doc_id"] for r in good.collect()] == ["ok"]
    assert bad.count() == 5


def test_delete_key_only_image_and_routing(spark):
    rows = [
        _env("delete", {"doc_id": "a", "name": None, "score": None}, table="t1"),
        _env("insert", {"doc_id": "b", "name": "y", "score": 1.0}, table="t2",
             ts="2024-05-12T19:20:08.000000Z"),
    ]
    out = {r["doc_id"]: r for r in (
        x.asDict() for x in _decode(
            spark, rows, include_table=True, include_metadata=True
        ).collect())}
    assert out["a"]["op"] == "D" and out["a"]["name"] is None
    assert out["a"]["_ab_stream"] == "t1"
    assert out["a"]["_ab_cdc_deleted_at"] is not None
    assert out["b"]["_ab_stream"] == "t2"
    assert out["b"]["_ab_cdc_deleted_at"] is None
