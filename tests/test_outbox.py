"""Outbox event router (sources/outbox.py): routing by aggregate type,
insert-only semantics, unrouted retention, and replay of a routed stream
into a lake table. Reference parity: Debezium outbox event router SMT
(public docs) consumed by the reference like any topic."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.sources.outbox import UNROUTED, route_outbox


def _outbox(spark, n=60):
    return spark.range(1, n + 1).select(
        F.when(F.col("id") % 10 == 0, F.lit("U")).otherwise(F.lit("I")).alias("op"),
        F.element_at(
            F.array(F.lit("order"), F.lit("user"), F.lit("shipment")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("aggregatetype"),
        F.format_string("a%04d", F.col("id") % 7).alias("aggregateid"),
        F.lit("created").alias("type"),
        F.format_string('{"amount": %d, "note": "n%d"}', F.col("id") * 100, F.col("id"))
        .alias("payload"),
        F.col("id").alias("lsn"),
        (F.col("id") * 1000).alias("ts_ms"),
    )


ROUTES = {
    "order": {"amount": "bigint", "note": "string"},
    "user": {"note": "string"},
}


def test_routing_and_typing(spark):
    out = route_outbox(_outbox(spark), ROUTES)
    orders = out["order"].collect()
    assert all(r.op == "I" for r in orders)
    assert all(r.amount == r.lsn * 100 for r in orders)
    assert {r.event_type for r in orders} == {"created"}
    users = out["user"].collect()
    assert users and all(not hasattr(r, "amount") for r in users)
    # shipment has no route -> retained raw, never dropped
    unrouted = out[UNROUTED].collect()
    assert unrouted and {r.aggregatetype for r in unrouted} == {"shipment"}


def test_non_inserts_excluded(spark):
    out = route_outbox(_outbox(spark), ROUTES)
    routed_lsns = {r.lsn for r in out["order"].collect()} | {
        r.lsn for r in out["user"].collect()
    } | {r.lsn for r in out[UNROUTED].collect()}
    assert all(lsn % 10 != 0 for lsn in routed_lsns)  # the U rows


def test_routed_stream_replays_into_table(spark, workdir):
    """A route's output is changelog-shaped: it replays through the engine
    with aggregateid as the PK and LWW keeps the newest event per entity."""
    out = route_outbox(_outbox(spark), ROUTES)
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "orders"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from airbyte_spark import schemas as S

    eng.create_table(
        StructType(
            [
                StructField("doc_id", StringType(), False),
                StructField("event_type", StringType(), True),
                StructField("amount", LongType(), True),
                StructField("note", StringType(), True),
                StructField("_ab_errors", StringType(), True),
                StructField(S.COL_LSN, LongType(), False),
                *[f for f in S.tokenseq_schema().fields if f.name in S.ENGINE_COLS[1:]],
            ]
        )
    )
    eng.replay(out["order"])
    finals = {r.doc_id: r for r in eng.read_final().collect()}
    # one row per aggregate id, and it is the HIGHEST-lsn order event of it
    expect = {}
    for r in _outbox(spark).collect():
        if r.op == "I" and r.aggregatetype == "order":
            cur = expect.get(r.aggregateid)
            if cur is None or r.lsn > cur.lsn:
                expect[r.aggregateid] = r
    assert set(finals) == set(expect)
    for k, r in expect.items():
        assert finals[k].amount == r.lsn * 100
