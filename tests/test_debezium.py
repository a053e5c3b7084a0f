"""Debezium JSON envelope decoding (sources/debezium.py).

Pins the reference's flattening semantics — after-image with before-image
fallback for deletes (DebeziumEventUtils.java:98-109), op mapping incl.
snapshot reads, per-connector position extraction (Postgres long LSN vs
MySQL file+pos lexicographic order, MySqlCdcTargetPosition.java:73-99) —
and that a decoded Debezium feed drives CdcEngine.replay to the exact same
final table as the native changelog it encodes.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.changelog import ChangelogConfig, changelog_df, seed_df
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.sources.debezium import (
    decode_debezium,
    mysql_packed_lsn,
    split_malformed,
)
from tests.util import assert_frames_equal, final_as_pandas

PAYLOAD = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
    ]
)


def _env(op, doc_id, *, after=None, before=None, lsn=None, file=None, pos=None, ts=1000):
    src = {"ts_ms": ts, "db": "app", "table": "docs"}
    if lsn is not None:
        src["lsn"] = lsn
    if file is not None:
        src["file"], src["pos"] = file, pos
    return json.dumps({"before": before, "after": after, "source": src, "op": op, "ts_ms": ts + 5})


def _decode(spark, envelopes, **kw):
    df = spark.createDataFrame([(e,) for e in envelopes], "value string")
    return decode_debezium(df, PAYLOAD, **kw)


def test_postgres_flattening_and_op_map(spark):
    row = {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2, "source": "web"}
    out = _decode(
        spark,
        [
            _env("c", "d1", after=row, lsn=10),
            _env("r", "d1", after=row, lsn=11),  # snapshot read -> I
            _env("u", "d1", after={**row, "n_tok": 3}, lsn=12),
            # delete: only the PK survives in before (cdc.md:29)
            _env("d", "d1", before={"doc_id": "d1"}, lsn=13),
        ],
    ).orderBy("lsn")
    rows = out.collect()
    assert [r.op for r in rows] == ["I", "I", "U", "D"]
    assert [r.lsn for r in rows] == [10, 11, 12, 13]
    assert rows[0].tokens == [1, 2] and rows[2].n_tok == 3
    # delete falls back to before-image: PK present, payload null
    assert rows[3].doc_id == "d1" and rows[3].tokens is None and rows[3].n_tok is None
    # source.ts_ms wins over envelope ts_ms
    assert all(r.ts_ms == 1000 for r in rows)


def test_mysql_file_pos_total_order(spark):
    """Packed (file, pos) longs sort exactly like the reference's
    file-lexicographic-then-pos comparison, across a binlog rotation."""
    out = _decode(
        spark,
        [
            _env("c", "a", after={"doc_id": "a"}, file="mysql-bin.000009", pos=900),
            _env("c", "b", after={"doc_id": "b"}, file="mysql-bin.000010", pos=4),
            _env("c", "c", after={"doc_id": "c"}, file="mysql-bin.000010", pos=500),
        ],
        connector="mysql",
    )
    rows = out.orderBy("lsn").collect()
    assert [r.doc_id for r in rows] == ["a", "b", "c"]
    assert rows[0].lsn < rows[1].lsn < rows[2].lsn


def test_mysql_packing_is_injective_within_bounds(spark):
    df = spark.range(1).select(
        mysql_packed_lsn(F.lit("mysql-bin.000002"), F.lit(0)).alias("lo"),
        mysql_packed_lsn(F.lit("mysql-bin.000001"), F.lit((1 << 32) - 1)).alias("hi"),
    )
    r = df.first()
    assert r.lo > r.hi  # file boundary dominates any in-file position


def test_malformed_and_unknown_op_quarantined(spark):
    out = _decode(
        spark,
        [
            _env("c", "ok", after={"doc_id": "ok"}, lsn=1),
            "{not json at all",
            _env("t", "trunc", after={"doc_id": "trunc"}, lsn=2),  # unknown op
        ],
    )
    good, bad = split_malformed(out)
    assert [r.doc_id for r in good.collect()] == ["ok"]
    assert bad.count() == 2


def test_include_metadata_columns(spark):
    out = _decode(
        spark,
        [
            _env("u", "d1", after={"doc_id": "d1"}, lsn=1, ts=86_400_000),
            _env("d", "d2", before={"doc_id": "d2"}, lsn=2, ts=86_400_000),
        ],
        include_metadata=True,
    ).orderBy("lsn")
    rows = out.collect()
    assert rows[0]._ab_cdc_updated_at is not None
    assert rows[0]._ab_cdc_deleted_at is None
    assert rows[1]._ab_cdc_deleted_at == rows[1]._ab_cdc_updated_at


def test_partition_col_passthrough(spark):
    df = spark.createDataFrame(
        [(_env("c", "d1", after={"doc_id": "d1"}, lsn=1), 7)], "value string, part int"
    )
    out = decode_debezium(df, PAYLOAD, partition_col="part")
    assert out.first().source_partition == 7


def test_unknown_connector_rejected(spark):
    with pytest.raises(ValueError):
        _decode(spark, [], connector="oracle")


def _encode_changelog_as_debezium(cl):
    """Native changelog -> Debezium envelopes, built JVM-side with to_json."""
    payload = F.struct("doc_id", "tokens", "n_tok", "source")
    pk_only = F.struct(
        F.col("doc_id"),
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.lit(None).cast("string").alias("source"),
    )
    env = F.struct(
        F.when(F.col("op") == "D", pk_only).alias("before"),
        F.when(F.col("op") != "D", payload).alias("after"),
        F.struct(
            F.col("ts_ms"),
            F.col("lsn"),
            F.lit("app").alias("db"),
            F.lit("docs").alias("table"),
        ).alias("source"),
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
        .alias("op"),
        (F.col("ts_ms") + 5).alias("ts_ms"),
    )
    return cl.select(
        F.to_json(env, {"ignoreNullFields": "false"}).alias("value"),
        F.col("source_partition").alias("part"),
    )


def test_debezium_feed_replays_to_identical_table(spark, workdir):
    """Golden end-to-end: encode the synthetic changelog as Debezium JSON,
    decode it, replay — final table bit-identical to the native replay."""
    cfg = ChangelogConfig(n_events=600, n_seed_docs=150, insert_pct=50, update_pct=35)
    seed = seed_df(spark, cfg)
    native = changelog_df(spark, cfg)
    decoded = decode_debezium(
        _encode_changelog_as_debezium(native),
        PAYLOAD,
        partition_col="part",
    )

    def run(cl, sub):
        eng = CdcEngine(
            spark,
            os.path.join(workdir, sub),
            StreamConfig(num_buckets=8),
            EngineConfig(batch_events=250),
        )
        eng.create_table()
        eng.bootstrap(seed)
        eng.replay(cl)
        return final_as_pandas(eng.read_final())

    assert_frames_equal(run(decoded, "dbz"), run(native, "native"))


def test_connect_wrapper_equals_bare_decode(spark):
    """Kafka Connect JSONConverter with schemas.enable=true wraps every
    envelope in {"schema": ..., "payload": ...}; connect_wrapper=True must
    decode identically to the bare envelopes, ignore the in-band schema
    blob, and still quarantine malformed lines."""
    row = {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2, "source": "s"}
    bare = [
        _env("c", "d1", after=row, lsn=10),
        _env("u", "d1", after={**row, "n_tok": 9}, lsn=11),
        _env("d", "d1", before={"doc_id": "d1"}, lsn=12),
    ]
    schema_blob = {"type": "struct", "fields": [{"field": "after", "type": "struct"}]}
    wrapped = [
        json.dumps({"schema": schema_blob, "payload": json.loads(e)}) for e in bare
    ] + ["{broken", json.dumps({"schema": schema_blob, "payload": None})]

    plain = _decode(spark, bare).collect()
    conv = decode_debezium(
        spark.createDataFrame([(e,) for e in wrapped], "value string"),
        PAYLOAD,
        connect_wrapper=True,
    )
    good, bad = split_malformed(conv)
    assert bad.count() == 2  # broken JSON + null payload both op-IS-NULL
    assert sorted(map(tuple, good.collect())) == sorted(map(tuple, plain))

    # one-parse contract holds for the wrapped shape too
    opt = good._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count(", value#") == 1


def test_transaction_metadata_gating(spark):
    """provide.transaction.metadata: events decode their transaction block,
    and split_complete_transactions releases only transactions whose END
    marker exists AND whose observed event count matches it — a truncated
    topic dump can never replay half a source transaction."""
    from airbyte_spark.sources.debezium import (
        decode_transaction_markers,
        split_complete_transactions,
    )

    def env_txn(lsn, txn_id, order):
        e = json.loads(_env("c", f"d{lsn}", after={"doc_id": f"d{lsn}"}, lsn=lsn))
        e["transaction"] = {
            "id": txn_id, "total_order": order, "data_collection_order": order,
        }
        return json.dumps(e)

    events = decode_debezium(
        spark.createDataFrame(
            [(e,) for e in [
                env_txn(1, "txA", 1), env_txn(2, "txA", 2),   # complete
                env_txn(3, "txB", 1),                          # END missing
                env_txn(4, "txC", 1),                          # truncated:
                                                               # END says 2
                _env("c", "d5", after={"doc_id": "d5"}, lsn=5),  # untracked
            ]],
            "value string",
        ),
        PAYLOAD,
        include_txn=True,
    )
    assert {"_txn_id", "_txn_order"} <= set(events.columns)

    markers = decode_transaction_markers(
        spark.createDataFrame(
            [(m,) for m in [
                json.dumps({"status": "BEGIN", "id": "txA", "ts_ms": 1}),
                json.dumps({"status": "END", "id": "txA",
                            "event_count": 2, "ts_ms": 2}),
                json.dumps({"status": "BEGIN", "id": "txB", "ts_ms": 3}),
                json.dumps({"status": "END", "id": "txC",
                            "event_count": 2, "ts_ms": 4}),
                "{broken",
                json.dumps({"status": "ROLLBACK?", "id": "txZ"}),
            ]],
            "value string",
        )
    )
    # malformed / unknown-status markers surface as status NULL, not rows
    assert markers.filter("status IS NULL").count() == 2

    complete, pending = split_complete_transactions(events, markers)
    got_c = sorted(r["doc_id"] for r in complete.collect())
    got_p = sorted(r["doc_id"] for r in pending.collect())
    assert got_c == ["d1", "d2", "d5"]  # txA + the untracked event
    assert got_p == ["d3", "d4"]        # no END / count mismatch

    # the late remainder arrives: txC's second event completes it
    events2 = events.unionByName(
        decode_debezium(
            spark.createDataFrame([(env_txn(6, "txC", 2),)], "value string"),
            PAYLOAD,
            include_txn=True,
        )
    )
    complete2, pending2 = split_complete_transactions(events2, markers)
    assert sorted(r["doc_id"] for r in pending2.collect()) == ["d3"]
    assert "d4" in {r["doc_id"] for r in complete2.collect()}


def test_transaction_metadata_per_collection(spark):
    """Debezium's END event_count totals events across ALL tables of the
    transaction; a single-table topic must gate on its data_collections
    entry, and a multi-table stream must gate per (txn, table)."""
    from airbyte_spark.sources.debezium import (
        decode_transaction_markers,
        split_complete_transactions,
    )

    def env_txn(lsn, txn_id, table="a"):
        e = json.loads(_env("c", f"d{lsn}", after={"doc_id": f"d{lsn}"}, lsn=lsn))
        e["transaction"] = {"id": txn_id, "total_order": lsn,
                            "data_collection_order": lsn}
        e["source"]["table"] = table
        return json.dumps(e)

    # txn t1 touched tables a (2 events) and b (1 event); this topic dump
    # carries only table a's events
    events_a = decode_debezium(
        spark.createDataFrame(
            [(env_txn(1, "t1"),), (env_txn(2, "t1"),)], "value string"
        ),
        PAYLOAD,
        include_txn=True,
    )
    markers = decode_transaction_markers(
        spark.createDataFrame(
            [(json.dumps({
                "status": "END", "id": "t1", "event_count": 3,
                "data_collections": [
                    {"data_collection": "a", "event_count": 2},
                    {"data_collection": "b", "event_count": 1},
                ], "ts_ms": 9}),)],
            "value string",
        )
    )
    # total-count bound: never completes (the documented trap)
    c0, p0 = split_complete_transactions(events_a, markers)
    assert c0.count() == 0 and p0.count() == 2
    # per-collection bound: table a's 2 events match its breakdown entry
    c1, p1 = split_complete_transactions(events_a, markers, collection="a")
    assert c1.count() == 2 and p1.count() == 0
    # a collection absent from the breakdown stays pending
    c2, _p2 = split_complete_transactions(events_a, markers, collection="zz")
    assert c2.count() == 0
    # markers WITHOUT a breakdown fall back to the total bound
    legacy = decode_transaction_markers(
        spark.createDataFrame(
            [(json.dumps({"status": "END", "id": "t1",
                          "event_count": 2, "ts_ms": 9}),)],
            "value string",
        )
    )
    c3, _ = split_complete_transactions(events_a, legacy, collection="a")
    assert c3.count() == 2

    # multi-table stream: both tables present and matching -> complete;
    # drop table b's event -> the WHOLE txn pends (no half-apply)
    rows_ab = [env_txn(1, "t1"), env_txn(2, "t1"),
               env_txn(3, "t1", table="b")]
    ev_ab = decode_debezium(
        spark.createDataFrame([(r,) for r in rows_ab], "value string"),
        PAYLOAD,
        include_txn=True,
        include_table=True,
    )
    c4, p4 = split_complete_transactions(
        ev_ab, markers, collection_col="_ab_stream"
    )
    assert c4.count() == 3 and p4.count() == 0
    from pyspark.sql import functions as F

    c5, p5 = split_complete_transactions(
        ev_ab.filter(F.col("doc_id") != "d3"),  # drop table b's only event
        markers,
        collection_col="_ab_stream",
    )
    assert c5.count() == 0 and p5.count() == 2
