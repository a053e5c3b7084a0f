"""Mongo change-stream (Debezium-Mongo) envelope decode (sources/mongo.py).

Covers the Mongo-specific wire quirks end to end: extended-JSON string
images, $oid normalization (image AND key), BsonTimestamp (sec, ord)
packing/order, the update-then-delete race (both images null -> D), patch
updates via updateDescription -> _ab_null_fields, malformed quarantine —
plus an integration: decoded patch envelopes drive CdcEngine patch mode.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.sources.debezium import split_malformed
from airbyte_spark.sources.mongo import bson_timestamp_lsn, decode_mongo

PAYLOAD = StructType(
    [
        StructField("_id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def _env(
    op,
    after=None,
    before=None,
    upd=None,
    removed=None,
    sec=100,
    ord_=1,
    key_id=None,
):
    e = {
        "before": json.dumps(before) if before is not None else None,
        "after": json.dumps(after) if after is not None else None,
        "source": {"ts_ms": sec * 1000, "sec": sec, "ord": ord_, "db": "d", "collection": "c"},
        "op": op,
        "ts_ms": sec * 1000 + 5,
    }
    if upd is not None or removed is not None:
        e["updateDescription"] = {
            "updatedFields": json.dumps(upd) if upd is not None else None,
            "removedFields": removed,
        }
    key = json.dumps({"id": key_id}) if key_id is not None else json.dumps({"id": "k?"})
    return (json.dumps(e), key)


def _decode(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["value", "key"])
    return decode_mongo(df, PAYLOAD, key_col="key", **kw)


def test_full_image_and_oid_normalization(spark):
    rows = [
        _env("c", after={"_id": "a1", "name": "x", "score": 1.5}),
        # $oid-wrapped _id in the image normalizes to the bare hex string
        _env("u", after={"_id": {"$oid": "0a1b"}, "name": "y", "score": 2.0}),
        _env("r", after={"_id": "a3", "name": "z", "score": 3.0}),
    ]
    out = {r["_id"]: r for r in _decode(spark, rows).collect()}
    assert out["a1"]["op"] == "I" and out["a1"]["name"] == "x"
    assert out["0a1b"]["op"] == "U" and out["0a1b"]["score"] == 2.0
    assert out["a3"]["op"] == "I"


def test_delete_recovers_id_from_key(spark):
    rows = [
        # delete: no images; key carries a SERIALIZED {"$oid": ...} doc
        _env("d", key_id=json.dumps({"$oid": "feed01"})),
        # plain-string key form
        _env("d", key_id="beef02", sec=101),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["op"] for r in out] == ["D", "D"]
    assert out[0]["_id"] == "feed01" and out[1]["_id"] == "beef02"
    assert out[0]["name"] is None and out[0]["score"] is None


def test_update_then_delete_race_is_delete(spark):
    # u with both images null and no updateDescription -> D
    # (DebeziumEventUtils.java:116-120)
    rows = [_env("u", key_id="gone01")]
    (r,) = _decode(spark, rows).collect()
    assert r["op"] == "D" and r["_id"] == "gone01"


def test_patch_update_emits_null_fields(spark):
    rows = [
        _env("u", upd={"score": 9.5}, removed=["name"], key_id="p1"),
        _env("u", upd={"name": "n2"}, removed=[], key_id="p2", sec=101),
    ]
    out = {r["_id"]: r for r in _decode(spark, rows, emit_patch=True).collect()}
    p1 = out["p1"]
    assert p1["op"] == "U" and p1["score"] == 9.5 and p1["name"] is None
    assert p1["_ab_null_fields"] == ["name"]
    p2 = out["p2"]
    assert p2["name"] == "n2" and p2["_ab_null_fields"] == []


def test_patch_without_emit_patch_keeps_null_payload(spark):
    rows = [_env("u", upd={"score": 9.5}, removed=["name"], key_id="p1")]
    (r,) = _decode(spark, rows).collect()
    # an updateDescription-bearing u is NOT the delete race: it stays U,
    # with null payload (caller should run full-document capture or pass
    # emit_patch=True) and the id recovered from the key
    assert r["op"] == "U" and r["_id"] == "p1" and r["score"] is None


def test_lsn_is_bson_timestamp_order(spark):
    rows = [
        _env("c", after={"_id": "a", "name": "x", "score": 1.0}, sec=100, ord_=7),
        _env("c", after={"_id": "b", "name": "x", "score": 1.0}, sec=100, ord_=8),
        _env("c", after={"_id": "c", "name": "x", "score": 1.0}, sec=101, ord_=0),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["_id"] for r in out] == ["a", "b", "c"]
    assert out[0]["lsn"] == 100 * (1 << 32) + 7


def test_malformed_rows_quarantined(spark):
    rows = [
        _env("c", after={"_id": "ok1", "name": "x", "score": 1.0}),
        ("{not json", "{}"),
        (json.dumps({"op": "z", "source": {"sec": 1, "ord": 1}}), "{}"),
    ]
    good, bad = split_malformed(_decode(spark, rows))
    assert [r["_id"] for r in good.collect()] == ["ok1"]
    assert bad.count() == 2


def test_decoded_patch_stream_drives_engine_patch_mode(spark, workdir):
    """Integration: a Mongo change-stream tail WITHOUT full-document lookup
    (updateDescription-only updates) decodes with emit_patch=True and lands
    correctly through CdcEngine(update_mode='patch')."""
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine

    seed_rows = [
        ("doc1", "alpha", 1.0),
        ("doc2", "beta", 2.0),
        ("doc3", "gamma", 3.0),
    ]
    envs = [
        _env("u", upd={"score": 10.0}, removed=[], key_id="doc1", sec=200, ord_=1),
        _env("u", upd={"name": "beta2"}, removed=["score"], key_id="doc2", sec=200, ord_=2),
        _env("d", key_id="doc3", sec=200, ord_=3),
        _env(
            "c",
            after={"_id": "doc4", "name": "delta", "score": 4.0},
            sec=200,
            ord_=4,
        ),
    ]
    decoded = _decode(spark, envs, emit_patch=True)
    changelog = decoded.select(
        "op",
        F.col("_id").alias("doc_id"),
        "lsn",
        "ts_ms",
        "source_partition",
        "name",
        "score",
        "_ab_null_fields",
    )

    seed_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("lsn", LongType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("name", StringType(), True),
            StructField("score", DoubleType(), True),
        ]
    )
    seed = spark.createDataFrame(
        [(d, 0, 0, n, s) for d, n, s in seed_rows], seed_schema
    )
    from airbyte_spark import schemas as S

    table_schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("name", StringType(), True),
            StructField("score", DoubleType(), True),
            StructField(S.COL_LSN, LongType(), False),
            *[f for f in S.tokenseq_schema().fields if f.name in S.ENGINE_COLS[1:]],
        ]
    )
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4, update_mode="patch"),
        EngineConfig(batch_events=10, validate_tokens=False),
    )
    eng.create_table(table_schema)
    eng.bootstrap(seed)
    eng.apply_range(changelog, 0, 1 << 62)

    final = {r["doc_id"]: r for r in eng.read_final().collect()}
    assert set(final) == {"doc1", "doc2", "doc4"}
    assert final["doc1"]["score"] == 10.0 and final["doc1"]["name"] == "alpha"
    assert final["doc2"]["name"] == "beta2" and final["doc2"]["score"] is None
    assert final["doc4"]["name"] == "delta" and final["doc4"]["score"] == 4.0
