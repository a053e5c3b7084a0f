"""Canal flatMessage decode (sources/canal.py).

Covers the Canal-specific wire quirks end to end: batched ``data`` arrays
(many rows per envelope, array index = binlog order), string-serialized
scalar values cast per-column, delete-carries-full-image, the parallel
``old`` changed-columns array, DDL (``isDdl``) + unknown types + parse
failures + index-overflow + missing-id quarantined, nested token-array
payloads re-parsed from raw JSON text, multi-table routing — plus an
integration: decoded envelopes drive CdcEngine LWW replay with
within-batch order honored.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.sources.canal import decode_canal, decode_ddl, split_ddl
from airbyte_spark.sources.debezium import split_malformed

PAYLOAD = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def _env(type_, data=None, old=None, id_=7, es=100_000, ts=100_500,
         is_ddl=False, sql=None, database="app", table="docs"):
    e = {
        "id": id_,
        "database": database,
        "table": table,
        "pkNames": ["doc_id"],
        "isDdl": is_ddl,
        "type": type_,
        "es": es,
        "ts": ts,
    }
    if sql is not None:
        e["sql"] = sql
    if data is not None:
        # canal string-serializes every scalar value
        e["data"] = [
            {k: (None if v is None else str(v)) for k, v in row.items()}
            for row in data
        ]
    if old is not None:
        e["old"] = [
            None if row is None
            else {k: (None if v is None else str(v)) for k, v in row.items()}
            for row in old
        ]
    return json.dumps(e)


def _decode(spark, rows, payload=PAYLOAD, **kw):
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    return decode_canal(df, payload, **kw)


def test_batched_rows_ordered_by_array_index(spark):
    rows = [
        _env("INSERT", data=[
            {"doc_id": "a", "name": "v0", "score": 0.5},
            {"doc_id": "b", "name": "v1", "score": 1.5},
            {"doc_id": "a", "name": "v2", "score": 2.5},
        ]),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["v0", "v1", "v2"]
    assert [r["lsn"] for r in out] == [(7 << 16), (7 << 16) + 1, (7 << 16) + 2]
    # string-serialized doubles cast back exactly; es wins over ts
    assert out[0]["score"] == 0.5 and out[0]["ts_ms"] == 100_000
    # within-batch LWW must resolve doc a to the later array element
    from airbyte_spark.operators.dedup import lww_dedup

    win = {r["doc_id"]: r for r in
           (x.asDict() for x in lww_dedup(_decode(spark, rows), key="doc_id").collect())}
    assert win["a"]["name"] == "v2"


def test_batch_id_orders_across_envelopes(spark):
    rows = [
        _env("UPDATE", data=[{"doc_id": "a", "name": "new", "score": 1.0}], id_=9),
        _env("INSERT", data=[{"doc_id": "a", "name": "old", "score": 0.0}], id_=8),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["old", "new"]
    assert [r["op"] for r in out] == ["I", "U"]


def test_delete_carries_full_image_and_init_maps_to_insert(spark):
    rows = [
        _env("DELETE", data=[{"doc_id": "a", "name": "gone", "score": 3.5}]),
        _env("INIT", data=[{"doc_id": "b", "name": "seed", "score": 0.5}], id_=1),
    ]
    got = {r["op"]: r for r in (x.asDict() for x in _decode(spark, rows).collect())}
    assert got["D"]["name"] == "gone" and got["D"]["score"] == 3.5
    assert got["I"]["doc_id"] == "b"


def test_old_parallel_array_alignment(spark):
    rows = [
        _env(
            "UPDATE",
            data=[
                {"doc_id": "a", "name": "a1", "score": 1.0},
                {"doc_id": "b", "name": "b1", "score": 2.0},
            ],
            old=[{"name": "a0"}, {"score": 1.5}],
        ),
        _env("INSERT", data=[{"doc_id": "c", "name": "c1", "score": 0.0}], id_=8),
    ]
    out = {r["doc_id"]: r for r in
           (x.asDict() for x in _decode(spark, rows, include_old=True).collect())}
    assert out["a"]["_old"] == {"name": "a0"}
    assert out["b"]["_old"] == {"score": "1.5"}  # raw text, changed cols only
    assert out["c"]["_old"] is None  # inserts carry no old image


def test_quarantine_ddl_unknown_overflow_missing_id_and_garbage(spark):
    rows = [
        _env("ALTER", is_ddl=True, sql="ALTER TABLE docs ADD COLUMN x INT"),
        _env("TRUNCATE", data=[{"doc_id": "t", "name": "n", "score": 0.0}]),
        _env("INSERT", data=[{"doc_id": "ok", "name": "n", "score": 0.0}]),
        _env("INSERT", data=[{"doc_id": "noid", "name": "n", "score": 0.0}],
             id_=None),
        "{not json",
    ]
    decoded = _decode(spark, rows, seq_bits=1)
    good, bad = split_malformed(decoded)
    assert [r["doc_id"] for r in good.collect()] == ["ok"]
    # DDL envelope has no data rows -> posexplode_outer keeps 1 null row;
    # truncate + missing-id + garbage each quarantine
    assert bad.count() == 4
    # index overflow under a tiny seq budget
    over = _decode(
        spark,
        [_env("INSERT", data=[{"doc_id": f"d{i}", "name": "n", "score": 0.0}
                              for i in range(3)])],
        seq_bits=1,
    )
    g2, b2 = split_malformed(over)
    assert g2.count() == 2 and b2.count() == 1


def test_nested_token_array_payload_reparses(spark):
    payload = StructType(
        [
            StructField("doc_id", StringType(), True),
            StructField("tokens", ArrayType(IntegerType()), True),
            StructField("n_tok", LongType(), True),
        ]
    )
    # canal renders a JSON column's value as its raw text
    row = {"id": 3, "database": "app", "table": "seq", "isDdl": False,
           "type": "INSERT", "es": 5, "ts": 6,
           "data": [{"doc_id": "a", "tokens": "[1,2,3]", "n_tok": "3"}]}
    out = _decode(spark, [json.dumps(row)], payload=payload).collect()
    assert out[0]["tokens"] == [1, 2, 3] and out[0]["n_tok"] == 3


def test_include_table_and_metadata(spark):
    rows = [
        _env("DELETE", data=[{"doc_id": "a", "name": "x", "score": 0.0}],
             database="app", table="t1"),
        _env("INSERT", data=[{"doc_id": "b", "name": "y", "score": 0.0}],
             id_=8, table="t2"),
    ]
    out = {r["doc_id"]: r for r in (
        x.asDict() for x in _decode(
            spark, rows, include_table=True, include_metadata=True
        ).collect())}
    assert out["a"]["_ab_stream"] == "t1"
    assert out["b"]["_ab_stream"] == "t2"
    assert out["a"]["_ab_cdc_deleted_at"] is not None
    assert out["b"]["_ab_cdc_deleted_at"] is None


def test_split_and_decode_ddl(spark):
    rows = [
        _env("ALTER", is_ddl=True, sql="ALTER TABLE docs ADD COLUMN x INT"),
        _env("INSERT", data=[{"doc_id": "a", "name": "n", "score": 0.0}]),
    ]
    wire = spark.createDataFrame([(r,) for r in rows], "value string")
    ddl, other = split_ddl(wire)
    assert ddl.count() == 1 and other.count() == 1
    d = decode_ddl(ddl).collect()[0]
    assert d["change_type"] == "ALTER"
    assert d["table_id"] == "app.docs"
    assert "ADD COLUMN" in d["ddl"]
    assert d["columns"] is None  # canal carries only raw sql
    # DDL fencing LSNs must live in the SAME lsn space as the data stream:
    # a non-default seq_bits shifts both identically
    d1 = decode_ddl(ddl, seq_bits=1).collect()[0]
    assert d1["lsn"] == d["lsn"] >> 15  # id<<1 vs the default id<<16


def test_replay_integration_lww(spark, tmp_path):
    """Decoded canal envelopes drive the engine's replay: out-of-order
    batches within the feed still resolve to the highest (id, index)."""
    rows = [
        _env("INSERT", data=[{"doc_id": "a", "name": "v1", "score": 1.0},
                             {"doc_id": "b", "name": "w1", "score": 1.0}], id_=1),
        _env("UPDATE", data=[{"doc_id": "a", "name": "v2", "score": 2.0}], id_=2),
        _env("DELETE", data=[{"doc_id": "b", "name": "w1", "score": 1.0}], id_=3),
    ]
    decoded, _ = split_malformed(_decode(spark, rows))
    from airbyte_spark.operators.dedup import lww_dedup

    live = lww_dedup(decoded, key="doc_id").filter(F.col("op") != "D")
    got = {r["doc_id"]: r["name"] for r in live.collect()}
    assert got == {"a": "v2"}
