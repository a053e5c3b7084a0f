"""Pure-Python Avro container codec (sources/avro_py.py).

Pins the binary format against the public Avro 1.x spec: zigzag varints,
block/sync framing, null + deflate codecs, unions/arrays/maps/enum/fixed,
and the Spark integration (schema conversion both ways, binaryFile +
mapInPandas fallback read). Reference parity:
airbyte-cdk/python/airbyte_cdk/sources/file_based/file_types/avro_parser.py
(the reference's fastavro-backed parser).
"""

from __future__ import annotations

import os

import pytest

from airbyte_spark.sources.avro_py import (
    _Reader,
    _zigzag,
    from_spark_type,
    read_container,
    read_schema,
    to_spark_type,
    write_avro_fallback,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "string"},
        {"name": "n_tok", "type": ["null", "int"]},
        {"name": "tokens", "type": {"type": "array", "items": "int"}},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "k",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "sig", "type": {"type": "fixed", "name": "s", "size": 4}},
        {"name": "raw", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
    ],
}

ROWS = [
    {"doc_id": "d1", "n_tok": 3, "tokens": [1, 2, 3], "score": 0.5,
     "tags": {"a": 1, "b": -9}, "kind": "B", "sig": b"\x01\x02\x03\x04",
     "raw": b"xyz", "ok": True},
    {"doc_id": "", "n_tok": None, "tokens": [], "score": -1e300,
     "tags": {}, "kind": "A", "sig": b"\x00\x00\x00\x00",
     "raw": b"", "ok": False},
    {"doc_id": "ünicøde", "n_tok": -2147483648, "tokens": [0, -1, 2**31 - 1],
     "score": 3.14, "tags": {"x": 2**62}, "kind": "C",
     "sig": b"\xff\xff\xff\xff", "raw": b"\x80\x81", "ok": True},
]


def test_zigzag_roundtrip_edge_values():
    for v in [0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**63)]:
        buf = bytearray()
        _zigzag(buf, v)
        assert _Reader(bytes(buf)).read_long() == v, v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    data = write_container(ROWS, SCHEMA, codec=codec, block_records=2)
    schema, recs = read_container(data)
    assert schema == SCHEMA
    # fixed/bytes come back as bytes
    norm = [{**r, "sig": bytes(r["sig"]), "raw": bytes(r["raw"])} for r in recs]
    assert norm == ROWS


def test_read_schema_header_only():
    data = write_container(ROWS, SCHEMA)
    assert read_schema(data) == SCHEMA


def test_bad_magic_and_corrupt_sync_raise():
    with pytest.raises(ValueError, match="magic"):
        read_container(b"PAR1" + b"\x00" * 32)
    data = bytearray(write_container(ROWS, SCHEMA, codec="null"))
    data[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(data))


def test_unsupported_codec_rejected():
    with pytest.raises(ValueError, match="codec"):
        write_container(ROWS, SCHEMA, codec="snappy")


def test_schema_conversion_roundtrip():
    st = to_spark_type(SCHEMA)
    names = [f.name for f in st.fields]
    assert names == [f["name"] for f in SCHEMA["fields"]]
    assert st["tokens"].dataType.simpleString() == "array<int>"
    assert st["tags"].dataType.simpleString() == "map<string,bigint>"
    assert st["kind"].dataType.simpleString() == "string"
    assert st["sig"].dataType.simpleString() == "binary"
    # spark -> avro -> spark is stable on the changelog shape
    back = to_spark_type(from_spark_type(st))
    assert [f.name for f in back.fields] == names


def test_general_union_rejected():
    with pytest.raises(ValueError, match="union"):
        to_spark_type(["int", "string"])


def test_spark_fallback_read(spark, workdir):
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    )

    st = StructType(
        [
            StructField("doc_id", StringType(), True),
            StructField("tokens", ArrayType(IntegerType(), True), True),
            StructField("n_tok", IntegerType(), True),
            StructField("lsn", LongType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(f"d{i}", [i, i + 1], 2, i) for i in range(200)]
        + [(None, None, None, 200)],
        st,
    )
    path = os.path.join(workdir, "avro_out")
    write_avro_fallback(df, path, n_files=4)
    assert len([f for f in os.listdir(path) if f.endswith(".avro")]) == 4

    from airbyte_spark.sources.avro_py import read_avro_fallback

    back = read_avro_fallback(spark, path)
    assert back.schema == st
    a = sorted(map(tuple, df.collect()), key=lambda t: (t[3],))
    b = sorted(map(tuple, back.collect()), key=lambda t: (t[3],))
    assert a == b
