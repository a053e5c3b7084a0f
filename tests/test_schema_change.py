"""In-stream DDL (Debezium schema-change envelopes): decode, type mapping,
engine evolution, and the tail-job end-to-end flow where an ALTER TABLE ADD
COLUMN appears mid-dump and post-DDL events carry the new field."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.sources.schema_change import (
    changes_to_payload_schema,
    decode_schema_changes,
    spark_type,
    split_schema_changes,
)

from jobs.cdc_tail_job import build_parser, run

PAYLOAD_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


# ------------------------------------------------------------- type mapping


def test_spark_type_mapping():
    assert spark_type("INT4").simpleString() == "int"
    assert spark_type("BIGINT").simpleString() == "bigint"
    assert spark_type("varchar(255)").simpleString() == "string"
    assert spark_type("numeric(38,9)").simpleString() == "double"
    assert spark_type("_int4").simpleString() == "array<int>"
    assert spark_type("int4[]").simpleString() == "array<int>"
    assert spark_type("TIMESTAMP WITHOUT TIME ZONE").simpleString() == "timestamp"
    assert spark_type("geometry") is None


def _sc_line(lsn, ddl, cols, change_type="ALTER", table="public.tokenseq"):
    return json.dumps(
        {
            "value": json.dumps(
                {
                    "source": {"ts_ms": 1000 + lsn, "lsn": lsn},
                    "ts_ms": 2000 + lsn,
                    "databaseName": "db",
                    "ddl": ddl,
                    "tableChanges": [
                        {
                            "type": change_type,
                            "id": f'"{table}"',
                            "table": {
                                "primaryKeyColumnNames": ["doc_id"],
                                "columns": [
                                    {"name": n, "typeName": t, "optional": True}
                                    for n, t in cols
                                ],
                            },
                        }
                    ],
                }
            ),
            "partition": 0,
        }
    )


BASE_COLS = [
    ("doc_id", "TEXT"),
    ("tokens", "_INT4"),
    ("n_tok", "INT4"),
    ("source", "VARCHAR"),
]


def test_decode_schema_changes(spark):
    lines = [
        _sc_line(10, "ALTER TABLE tokenseq ADD COLUMN quality INT4",
                 BASE_COLS + [("quality", "INT4")]),
    ]
    df = spark.read.schema("value string, key string, partition long").json(
        spark.sparkContext.parallelize(lines)
    )
    rows = decode_schema_changes(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lsn"] == 10 and r["change_type"] == "ALTER"
    assert r["table_id"] == '"public.tokenseq"'
    assert [c["name"] for c in r["columns"]][-1] == "quality"
    assert r["ddl"].startswith("ALTER TABLE")


def test_changes_fold_last_wins_and_additive_keep():
    rows = [
        {"lsn": 20, "ts_ms": 0, "ddl": "d2", "columns": [
            {"name": "a", "type_name": "BIGINT", "optional": True},
        ]},
        {"lsn": 10, "ts_ms": 0, "ddl": "d1", "columns": [
            {"name": "a", "type_name": "INT4", "optional": True},
            {"name": "b", "type_name": "TEXT", "optional": True},
        ]},
    ]
    out = changes_to_payload_schema(rows)
    by = {f.name: f.dataType.simpleString() for f in out.fields}
    # lsn order (10 then 20): a widened int->bigint; b kept though the later
    # event no longer lists it (dropped source columns stay in destination)
    assert by == {"a": "bigint", "b": "string"}


def test_changes_unknown_type_raises_or_degrades():
    rows = [{"lsn": 1, "ts_ms": 0, "ddl": "x", "columns": [
        {"name": "g", "type_name": "GEOMETRY", "optional": True}]}]
    with pytest.raises(ValueError, match="GEOMETRY"):
        changes_to_payload_schema(rows)
    out = changes_to_payload_schema(rows, union_type_fallback=True)
    assert out.fields[0].dataType.simpleString() == "string"


# ------------------------------------------------------------- end to end


def _dml_line(lsn, doc_id, op="c", extra=None, tokens=(1, 2, 3)):
    after = None
    before = None
    img = {"doc_id": doc_id, "tokens": list(tokens), "n_tok": len(tokens),
           "source": "s0"}
    if extra:
        img.update(extra)
    if op == "d":
        before = {"doc_id": doc_id}
    else:
        after = img
    return json.dumps(
        {
            "value": json.dumps(
                {
                    "before": before,
                    "after": after,
                    "source": {"ts_ms": 1000 + lsn, "lsn": lsn},
                    "op": op,
                    "ts_ms": 2000 + lsn,
                }
            ),
            "partition": 0,
        }
    )


def _write_lines(path, lines):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "dump.json"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _args(workdir, **over):
    base = dict(
        lake=os.path.join(workdir, "lake"),
        wire=os.path.join(workdir, "wire"),
        connector="postgres",
        payload_ddl=PAYLOAD_DDL,
        batch_events=100,
        num_buckets=4,
    )
    base.update(over)
    argv = []
    for k, v in base.items():
        if v is True:
            argv.append(f"--{k.replace('_', '-')}")
        elif v is not None and v is not False:
            argv += [f"--{k.replace('_', '-')}", str(v)]
    return build_parser().parse_args(argv)


def test_tail_job_ddl_mid_stream(spark, workdir):
    """ADD COLUMN mid-dump: table evolves, post-DDL rows carry the value,
    pre-DDL rows read NULL, and the DDL line never hits quarantine."""
    lines = [
        _dml_line(1, "doc1"),
        _dml_line(2, "doc2"),
        _sc_line(3, "ALTER TABLE tokenseq ADD COLUMN quality INT4",
                 BASE_COLS + [("quality", "INT4")]),
        _dml_line(4, "doc3", extra={"quality": 77}),
        _dml_line(5, "doc1", op="u", extra={"quality": 42}, tokens=(9, 9)),
    ]
    _write_lines(os.path.join(workdir, "wire"), lines)
    stats = run(spark, _args(workdir))
    assert stats["quarantined"] == 0
    assert stats["events"] == 4  # DML only; the DDL line is not an event

    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.config import EngineConfig, StreamConfig

    eng = CdcEngine(spark, os.path.join(workdir, "lake"),
                    StreamConfig(num_buckets=4), EngineConfig())
    final = {r["doc_id"]: r for r in eng.read_final().collect()}
    assert "quality" in eng.read_final().columns
    assert final["doc1"]["quality"] == 42 and list(final["doc1"]["tokens"]) == [9, 9]
    assert final["doc2"]["quality"] is None
    assert final["doc3"]["quality"] == 77


def test_tail_job_ddl_widening(spark, workdir):
    """n_tok INT -> BIGINT via DDL: schema widens; old and new rows agree."""
    lines = [
        _dml_line(1, "doc1"),
        _sc_line(2, "ALTER TABLE tokenseq ALTER COLUMN n_tok TYPE BIGINT",
                 [(n, "BIGINT" if n == "n_tok" else t) for n, t in BASE_COLS]),
        _dml_line(3, "doc2"),
    ]
    _write_lines(os.path.join(workdir, "wire"), lines)
    run(spark, _args(workdir))

    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.config import EngineConfig, StreamConfig

    eng = CdcEngine(spark, os.path.join(workdir, "lake"),
                    StreamConfig(num_buckets=4), EngineConfig())
    f = eng.read_final()
    assert dict(f.dtypes)["n_tok"] == "bigint"
    assert {r["doc_id"]: r["n_tok"] for r in f.collect()} == {"doc1": 3, "doc2": 3}


def test_apply_schema_changes_idempotent(spark, workdir):
    """Re-applying the same change set commits no new snapshot."""
    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.config import EngineConfig, StreamConfig
    from pyspark.sql.types import StructType

    eng = CdcEngine(spark, os.path.join(workdir, "lake"),
                    StreamConfig(num_buckets=4), EngineConfig())
    eng.create_table()  # default tokenseq schema == PAYLOAD_DDL
    lines = [_sc_line(3, "ALTER TABLE tokenseq ADD COLUMN quality INT4",
                      BASE_COLS + [("quality", "INT4")])]
    df = spark.read.schema("value string, key string, partition long").json(
        spark.sparkContext.parallelize(lines)
    )
    changes = decode_schema_changes(df)
    assert eng.apply_schema_changes(changes) == 1
    v1 = eng.table.current_version()
    assert eng.apply_schema_changes(changes) == 1  # folded again ...
    assert eng.table.current_version() == v1       # ... but no new commit


def test_split_marker(spark):
    lines = [
        _sc_line(1, "ALTER", BASE_COLS),
        _dml_line(2, "doc1"),
    ]
    df = spark.read.schema("value string, key string, partition long").json(
        spark.sparkContext.parallelize(lines)
    )
    sc, other = split_schema_changes(df)
    assert sc.count() == 1 and other.count() == 1
    assert "tableChanges" in sc.first()["value"]


# ------------------------------------------------------------ maxwell DDL


def _mxw_dml(xid, doc_id, type_="insert", extra=None, tokens=(1, 2, 3)):
    img = {"doc_id": doc_id, "tokens": list(tokens), "n_tok": len(tokens),
           "source": "s0"}
    if extra:
        img.update(extra)
    return json.dumps({
        "value": json.dumps({
            "database": "app", "table": "tokenseq", "type": type_,
            "ts": 100 + xid, "xid": xid, "commit": True, "data": img,
        }),
        "partition": 0,
    })


def _mxw_ddl(xid, sql, cols):
    return json.dumps({
        "value": json.dumps({
            "type": "table-alter", "database": "app", "table": "tokenseq",
            "ts": 100 + xid, "sql": sql,
            "def": {"database": "app", "table": "tokenseq",
                    "columns": [{"name": n, "type": t} for n, t in cols],
                    "primary-key": ["doc_id"]},
        }),
        "partition": 0,
    })


MXW_COLS = [("doc_id", "varchar(64)"), ("tokens", "int[]"),
            ("n_tok", "int"), ("source", "text")]


def test_tail_job_maxwell_ddl_mid_stream(spark, workdir):
    """Maxwell output_ddl: a table-alter envelope mid-dump evolves the
    table through the same fold as the Debezium branch — post-DDL rows
    carry the new column, pre-DDL rows read NULL."""
    lines = [
        _mxw_dml(1, "doc1"),
        _mxw_dml(2, "doc2"),
        _mxw_ddl(3, "alter table tokenseq add column quality int",
                 MXW_COLS + [("quality", "int")]),
        _mxw_dml(4, "doc3", extra={"quality": 77}),
        _mxw_dml(5, "doc1", type_="update", extra={"quality": 42},
                 tokens=(9, 9)),
    ]
    _write_lines(os.path.join(workdir, "wire"), lines)
    stats = run(spark, _args(workdir, connector="maxwell"))
    assert stats["quarantined"] == 0
    assert stats["events"] == 4  # the DDL line is not a data event

    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.config import EngineConfig, StreamConfig

    eng = CdcEngine(spark, os.path.join(workdir, "lake"),
                    StreamConfig(num_buckets=4), EngineConfig())
    final = {r["doc_id"]: r for r in eng.read_final().collect()}
    assert "quality" in eng.read_final().columns
    assert final["doc1"]["quality"] == 42 and list(final["doc1"]["tokens"]) == [9, 9]
    assert final["doc2"]["quality"] is None
    assert final["doc3"]["quality"] == 77
