"""Maxwell JSON envelope decode (sources/maxwell.py).

Covers the Maxwell-specific wire quirks end to end: data-is-always-the-full-
image (deletes included), epoch-SECONDS timestamps, in-band transaction
framing (xoffset rows then a commit:true row with no xoffset), xid vs
binlog-position LSN packing and their total orders, ``old`` changed-column
images, non-row types (bootstrap framing, DDL) and parse failures
quarantined, suborder-budget overflow — plus an integration: decoded
envelopes drive CdcEngine LWW replay with within-transaction order honored.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.sources.debezium import split_malformed
from airbyte_spark.sources.maxwell import decode_maxwell

PAYLOAD = StructType(
    [
        StructField("doc_id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def _env(
    type_,
    data=None,
    old=None,
    ts=100,
    xid=7,
    xoffset=None,
    commit=None,
    position=None,
):
    e = {
        "database": "app",
        "table": "docs",
        "type": type_,
        "ts": ts,
        "xid": xid,
    }
    if xoffset is not None:
        e["xoffset"] = xoffset
    if commit is not None:
        e["commit"] = commit
    if position is not None:
        e["position"] = position
    if data is not None:
        e["data"] = data
    if old is not None:
        e["old"] = old
    return json.dumps(e)


def _decode(spark, rows, **kw):
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    return decode_maxwell(df, PAYLOAD, **kw)


def test_insert_update_delete_full_images(spark):
    rows = [
        _env("insert", data={"doc_id": "a", "name": "x", "score": 1.5}, commit=True),
        _env("update", data={"doc_id": "a", "name": "y", "score": 2.0},
             old={"name": "x", "score": 1.5}, xid=8, commit=True),
        # Maxwell deletes carry the FULL deleted row in data, not just the PK
        _env("delete", data={"doc_id": "a", "name": "y", "score": 2.0},
             xid=9, commit=True),
        _env("bootstrap-insert", data={"doc_id": "b", "name": "z", "score": 0.5},
             xid=10, commit=True),
    ]
    got = {r["op"]: r for r in (x.asDict() for x in _decode(spark, rows).collect())}
    assert set(got) == {"I", "U", "D"}
    assert got["D"]["name"] == "y" and got["D"]["score"] == 2.0
    # bootstrap-insert maps to I; two I rows -> the dict kept one, check count
    out = _decode(spark, rows).collect()
    assert sum(1 for r in out if r["op"] == "I") == 2
    # epoch seconds -> millis
    assert all(r["ts_ms"] == 100_000 for r in out)


def test_transaction_framing_orders_commit_row_last(spark):
    # one 3-statement txn: xoffset 0, 1, then the commit row (no xoffset)
    rows = [
        _env("update", data={"doc_id": "a", "name": "v0", "score": 0.0}, xoffset=0),
        _env("update", data={"doc_id": "a", "name": "v1", "score": 1.0}, xoffset=1),
        _env("update", data={"doc_id": "a", "name": "v2", "score": 2.0}, commit=True),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["v0", "v1", "v2"]
    assert out[-1]["lsn"] == (7 << 16) + (1 << 16) - 1  # commit suborder = max
    # LWW over (doc_id, lsn) must resolve to the commit row's image
    from airbyte_spark.operators.dedup import lww_dedup

    win = lww_dedup(_decode(spark, rows), key="doc_id").collect()
    assert len(win) == 1 and win[0]["name"] == "v2"


def test_xid_order_across_transactions(spark):
    rows = [
        _env("insert", data={"doc_id": "a", "name": "old", "score": 0.0},
             xid=5, commit=True),
        _env("update", data={"doc_id": "a", "name": "new", "score": 1.0},
             xid=6, commit=True),
    ]
    out = sorted(_decode(spark, rows).collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["old", "new"]


def test_binlog_position_packing(spark):
    # file rotation dominates offset; offset dominates suborder
    rows = [
        _env("insert", data={"doc_id": "a", "name": "f2", "score": 0.0},
             position="mysql-bin.000002:10", commit=True),
        _env("insert", data={"doc_id": "b", "name": "f1hi", "score": 0.0},
             position="mysql-bin.000001:999999", commit=True),
        _env("insert", data={"doc_id": "c", "name": "f1lo", "score": 0.0},
             position="mysql-bin.000001:10", xoffset=0),
    ]
    out = sorted(
        _decode(spark, rows, use_position=True).collect(), key=lambda r: r["lsn"]
    )
    assert [r["name"] for r in out] == ["f1lo", "f1hi", "f2"]


def test_old_image_and_metadata(spark):
    rows = [
        _env("update", data={"doc_id": "a", "name": "y", "score": 2.0},
             old={"name": "x"}, commit=True),
        _env("delete", data={"doc_id": "a", "name": "y", "score": 2.0},
             xid=8, commit=True),
    ]
    out = {
        r["op"]: r
        for r in _decode(
            spark, rows, include_old=True, include_metadata=True
        ).collect()
    }
    assert out["U"]["_old"]["name"] == "x" and out["U"]["_old"]["score"] is None
    assert out["U"]["_ab_cdc_deleted_at"] is None
    assert out["D"]["_ab_cdc_deleted_at"] is not None


def test_quarantine_non_row_types_and_malformed(spark):
    rows = [
        _env("insert", data={"doc_id": "a", "name": "x", "score": 1.0}, commit=True),
        _env("bootstrap-start"),
        _env("bootstrap-complete"),
        _env("table-alter", data=None),
        "{not json",
        # xoffset at/over the suborder budget must quarantine, not misorder
        _env("update", data={"doc_id": "a", "name": "x", "score": 1.0},
             xoffset=(1 << 16) - 1),
    ]
    good, bad = split_malformed(_decode(spark, rows))
    assert good.count() == 1 and bad.count() == 5


def test_lww_replay_integration(spark):
    """Decoded Maxwell envelopes drive the engine's LWW resolve: two txns on
    one key plus a delete on another resolve exactly as binlog order says."""
    payload = StructType(
        [
            StructField("doc_id", StringType(), True),
            StructField("tokens", StringType(), True),
        ]
    )
    rows = [
        json.dumps({"database": "d", "table": "t", "type": "insert", "ts": 1,
                    "xid": 1, "commit": True,
                    "data": {"doc_id": "a", "tokens": "t1"}}),
        json.dumps({"database": "d", "table": "t", "type": "update", "ts": 2,
                    "xid": 2, "xoffset": 0,
                    "data": {"doc_id": "a", "tokens": "t2"}}),
        json.dumps({"database": "d", "table": "t", "type": "update", "ts": 2,
                    "xid": 2, "commit": True,
                    "data": {"doc_id": "a", "tokens": "t3"}}),
        json.dumps({"database": "d", "table": "t", "type": "insert", "ts": 1,
                    "xid": 1, "xoffset": 0,
                    "data": {"doc_id": "b", "tokens": "bye"}}),
        json.dumps({"database": "d", "table": "t", "type": "delete", "ts": 3,
                    "xid": 3, "commit": True,
                    "data": {"doc_id": "b", "tokens": "bye"}}),
    ]
    feed = spark.createDataFrame([(r,) for r in rows], "value string")
    good, bad = split_malformed(decode_maxwell(feed, payload))
    assert bad.count() == 0
    from airbyte_spark.operators.dedup import lww_dedup

    winners = lww_dedup(good, key="doc_id")
    live = {r["doc_id"]: r for r in winners.filter(F.col("op") != "D").collect()}
    assert set(live) == {"a"} and live["a"]["tokens"] == "t3"


# ---------------------------------------------------------------- property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TYPES = [
    "insert", "update", "delete", "bootstrap-insert",  # row types
    "table-alter", "bootstrap-start",                  # quarantine types
]
_OPS = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}

txns = st.lists(
    st.tuples(
        st.integers(0, 1000),                               # xid
        st.lists(st.integers(0, 5), min_size=1, max_size=5),  # type idx/row
        st.integers(0, 10**6),                              # ts (seconds)
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(txns=txns)
def test_maxwell_decode_matches_python_model(spark, txns):
    """For ARBITRARY transaction shapes (any mix of row/framing/DDL types,
    any txn length, commit row always last) the Spark decode must equal an
    independently-coded Python model of Maxwell's rules: op mapping,
    quarantine, lsn = xid<<16 | suborder (commit row = max), ts*1000."""
    envelopes, expected = [], []
    for xid, type_idxs, ts in txns:
        n = len(type_idxs)
        for j, ti in enumerate(type_idxs):
            typ = _TYPES[ti]
            last = j == n - 1
            e = {"database": "app", "table": "t", "type": typ, "ts": ts, "xid": xid}
            if last:
                e["commit"] = True
            else:
                e["xoffset"] = j
            row = None
            if typ in _OPS:
                row = {"doc_id": f"d{xid}_{j}", "name": str(ti), "score": float(j)}
                e["data"] = row
            envelopes.append(json.dumps(e))
            op = _OPS.get(typ)
            if op is None:
                expected.append((None, None, None, None, None, None))
            else:
                sub = (1 << 16) - 1 if last else j
                expected.append(
                    (op, (xid << 16) + sub, ts * 1000,
                     row["doc_id"], row["name"], row["score"])
                )
    # quarantined rows decode with op NULL and lsn/ts still computable —
    # compare only the op/payload contract there (lsn of a framing row is
    # well-defined but unused): normalize both sides, sort by repr (None
    # and str do not compare; any consistent total order works for set
    # equality)
    got = [
        t if t[0] is not None else (None,) * 6
        for t in (
            (r["op"], r["lsn"], r["ts_ms"], r["doc_id"], r["name"], r["score"])
            for r in _decode(spark, envelopes).collect()
        )
    ]
    want = [e if e[0] is not None else (None,) * 6 for e in expected]
    assert sorted(got, key=repr) == sorted(want, key=repr)


def test_bootstrap_rows_without_xid_order_first(spark):
    """Real Maxwell bootstrap-insert rows carry NO xid: they must decode
    (base-0 LSN, before every transaction), never silently drop through a
    NULL-lsn replay window."""
    rows = [
        json.dumps({"database": "app", "table": "docs",
                    "type": "bootstrap-insert", "ts": 1,
                    "data": {"doc_id": "a", "name": "snap", "score": 0.0}}),
        _env("update", data={"doc_id": "a", "name": "tail", "score": 1.0},
             xid=1, commit=True),
        # a non-bootstrap row with no xid has no position source: quarantine
        json.dumps({"database": "app", "table": "docs", "type": "update",
                    "ts": 1,
                    "data": {"doc_id": "b", "name": "x", "score": 0.0}}),
    ]
    good, bad = split_malformed(_decode(spark, rows))
    assert bad.count() == 1
    out = sorted(good.collect(), key=lambda r: r["lsn"])
    assert [r["name"] for r in out] == ["snap", "tail"]
    assert out[0]["lsn"] is not None and out[0]["lsn"] < (1 << 16)


def test_position_missing_and_rotation_overflow_quarantine(spark):
    rows = [
        _env("insert", data={"doc_id": "a", "name": "ok", "score": 0.0},
             position="mysql-bin.000001:10", commit=True),
        # no position under use_position -> quarantine (non-bootstrap)
        _env("insert", data={"doc_id": "b", "name": "nopos", "score": 0.0},
             commit=True),
        # rotation index past the packing budget -> quarantine, not wrap
        _env("insert", data={"doc_id": "c", "name": "wrap", "score": 0.0},
             position=f"mysql-bin.{1 << 15}:10", commit=True),
        # bootstrap without position still decodes at base 0
        json.dumps({"database": "app", "table": "docs",
                    "type": "bootstrap-insert", "ts": 1,
                    "data": {"doc_id": "d", "name": "snap", "score": 0.0}}),
    ]
    good, bad = split_malformed(_decode(spark, rows, use_position=True))
    assert bad.count() == 2
    names = {r["name"]: r["lsn"] for r in good.collect()}
    assert set(names) == {"ok", "snap"}
    assert names["snap"] < names["ok"]
