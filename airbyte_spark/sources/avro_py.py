"""Pure-Python Avro Object Container File reader (and test-fixture writer).

The reference ships an Avro parser for file-based sources
(airbyte-cdk/python/airbyte_cdk/sources/file_based/file_types/avro_parser.py,
fastavro-backed). Spark's first-class equivalent is the ``spark-avro``
DataSource — ALWAYS preferred when it is on the classpath
(``sources/files.py:is_avro_available``): it is JVM-side, vectorized, and
splittable. This module is the explicit FALLBACK for deployments whose Spark
distribution omits the module (it is not bundled by default): a from-scratch
decoder of the public Avro 1.x container format (spec: single-object
container files — magic ``Obj\\x01``, metadata map carrying
``avro.schema``/``avro.codec``, deflate- or null-coded blocks delimited by a
16-byte sync marker; zigzag-varint primitives).

Scale shape and honesty:

- Files are distributed via ``spark.read.format("binaryFile")`` (one task
  per file — Avro files are only safely splittable by scanning for sync
  markers, which the JVM reader does and this fallback deliberately does
  not) and decoded inside ``mapInPandas`` — Python on the data path, Arrow-
  batched output. That is the documented trade: a working, tested read path
  everywhere, ~an order slower than spark-avro. The caller is told which
  path served the read (``log_metric("avro_fallback_read")``).
- Supported schema subset: null/boolean/int/long/float/double/bytes/string,
  fixed, enum, record, array, map, and 2-branch null unions — the shapes
  file-based connectors actually emit. Logical types decode as their base
  type (documented divergence; the JVM reader converts them). Unsupported
  shapes raise loudly at schema-conversion time, never corrupt silently.

The writer exists so tests and fixtures can produce real container files
with zero external dependencies (no fastavro/spark-avro in this sandbox);
it emits the same subset with null or deflate codec.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decoding

class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        p = self.pos
        self.pos = p + n
        if self.pos > len(self.buf):
            raise EOFError("truncated avro data")
        return self.buf[p : self.pos]

    def read_long(self) -> int:
        """zigzag varint (avro spec 'binary encoding')."""
        b = self.buf
        p = self.pos
        shift = 0
        acc = 0
        while True:
            byte = b[p]
            p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = p
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decoder(schema, names):
    """Compile a schema node into a ``f(reader) -> value`` closure.

    ``names``: named-type registry (record/enum/fixed can be referenced by
    name after definition, avro spec 'names')."""
    if isinstance(schema, str):
        t = schema
        if t in names:
            return names[t]
        if t == "null":
            return lambda r: None
        if t == "boolean":
            return lambda r: r.read(1) == b"\x01"
        if t in ("int", "long"):
            return _Reader.read_long
        if t == "float":
            return lambda r: struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return lambda r: struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return _Reader.read_bytes
        if t == "string":
            return lambda r: r.read_bytes().decode("utf-8")
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):  # union
        branches = [_decoder(b, names) for b in schema]
        return lambda r: branches[r.read_long()](r)
    t = schema["type"]
    if t in ("record", "error"):
        names[schema["name"]] = None  # placeholder for recursive refs
        fields = [(f["name"], _decoder(f["type"], names)) for f in schema["fields"]]

        def rec(r):
            return {n: d(r) for n, d in fields}

        names[schema["name"]] = rec
        return rec
    if t == "enum":
        syms = schema["symbols"]
        dec = lambda r: syms[r.read_long()]  # noqa: E731
        names[schema["name"]] = dec
        return dec
    if t == "fixed":
        n = schema["size"]
        dec = lambda r: r.read(n)  # noqa: E731
        names[schema["name"]] = dec
        return dec
    if t == "array":
        item = _decoder(schema["items"], names)

        def arr(r):
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec): skip size
                    n = -n
                    r.read_long()
                out.extend(item(r) for _ in range(n))

        return arr
    if t == "map":
        val = _decoder(schema["values"], names)

        def mp(r):
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    # key MUST decode before value (python evaluates the
                    # RHS of a subscript assignment first)
                    k = r.read_bytes().decode("utf-8")
                    out[k] = val(r)

        return mp
    if isinstance(t, (dict, list)):  # e.g. {"type": {"type": "array", ...}}
        return _decoder(t, names)
    return _decoder(t, names)  # named primitive wrapper {"type": "long", ...}


def _read_header(r: _Reader):
    """Parse magic + metadata map + sync -> (schema_json, codec, sync)."""
    if r.read(4) != _MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    return schema, codec, sync


def read_schema(data: bytes):
    """Parse only the header of a container file -> schema JSON (cheap
    driver-side sniff; does not touch the data blocks)."""
    return _read_header(_Reader(data))[0]


def read_container(data: bytes):
    """Decode one container file -> (schema_json_dict, list_of_records)."""
    r = _Reader(data)
    schema, codec, sync = _read_header(r)
    dec = _decoder(schema, {})
    records = []
    while r.pos < len(r.buf):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        records.extend(dec(br) for _ in range(count))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
    return schema, records


# ---------------------------------------------------------------- encoding

def _zigzag(buf: bytearray, v: int) -> None:
    # canonical zigzag over unbounded python ints: n>=0 -> 2n, n<0 -> -2n-1
    v = (v << 1) if v >= 0 else ((-v - 1) << 1) | 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _encoder(schema, names):
    if isinstance(schema, str):
        t = schema
        if t in names:
            return names[t]
        if t == "null":
            return lambda b, v: None
        if t == "boolean":
            return lambda b, v: b.append(1 if v else 0)
        if t in ("int", "long"):
            return _zigzag
        if t == "float":
            return lambda b, v: b.extend(struct.pack("<f", v))
        if t == "double":
            return lambda b, v: b.extend(struct.pack("<d", v))
        if t == "bytes":
            def enc_b(b, v):
                _zigzag(b, len(v))
                b.extend(v)
            return enc_b
        if t == "string":
            def enc_s(b, v):
                raw = v.encode("utf-8")
                _zigzag(b, len(raw))
                b.extend(raw)
            return enc_s
        raise ValueError(f"unsupported avro type {t!r}")
    if isinstance(schema, list):
        branches = [(br if isinstance(br, str) else br["type"], _encoder(br, names))
                    for br in schema]

        def enc_u(b, v):
            if v is None:
                for i, (bt, be) in enumerate(branches):
                    if bt == "null":
                        _zigzag(b, i)
                        return
                raise ValueError("null value but no null branch")
            for i, (bt, be) in enumerate(branches):
                if bt != "null":
                    _zigzag(b, i)
                    be(b, v)
                    return

        return enc_u
    t = schema["type"]
    if t in ("record", "error"):
        fields = [(f["name"], _encoder(f["type"], names)) for f in schema["fields"]]

        def enc_r(b, v):
            for n, e in fields:
                e(b, v.get(n))

        names[schema["name"]] = enc_r
        return enc_r
    if t == "enum":
        idx = {s: i for i, s in enumerate(schema["symbols"])}
        return lambda b, v: _zigzag(b, idx[v])
    if t == "fixed":
        return lambda b, v: b.extend(v)
    if t == "array":
        item = _encoder(schema["items"], names)

        def enc_a(b, v):
            if v:
                _zigzag(b, len(v))
                for x in v:
                    item(b, x)
            _zigzag(b, 0)

        return enc_a
    if t == "map":
        val = _encoder(schema["values"], names)

        def enc_m(b, v):
            if v:
                _zigzag(b, len(v))
                for k, x in v.items():
                    raw = k.encode("utf-8")
                    _zigzag(b, len(raw))
                    b.extend(raw)
                    val(b, x)
            _zigzag(b, 0)

        return enc_m
    return _encoder(t, names)


def write_container(
    records, schema_json: dict, codec: str = "deflate", block_records: int = 4096
) -> bytes:
    """Encode records to one container file's bytes (test-fixture writer)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    enc = _encoder(schema_json, {})
    sync = b"\x13\x37" * 8  # any 16 bytes; constant keeps fixtures stable
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema_json).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    head = bytearray()
    _zigzag(head, len(meta))
    for k, v in meta.items():
        raw = k.encode("utf-8")
        _zigzag(head, len(raw))
        head.extend(raw)
        _zigzag(head, len(v))
        head.extend(v)
    _zigzag(head, 0)
    out.write(bytes(head))
    out.write(sync)
    records = list(records)
    for i in range(0, len(records), block_records):
        chunk = records[i : i + block_records]
        body = bytearray()
        for rec in chunk:
            enc(body, rec)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        blk = bytearray()
        _zigzag(blk, len(chunk))
        _zigzag(blk, len(payload))
        out.write(bytes(blk))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


# ----------------------------------------------------------- spark surface

def to_spark_type(schema):
    """Avro schema node -> Spark DataType (the subset above)."""
    from pyspark.sql import types as T

    if isinstance(schema, str):
        m = {
            "null": T.NullType(), "boolean": T.BooleanType(),
            "int": T.IntegerType(), "long": T.LongType(),
            "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType(),
        }
        if schema in m:
            return m[schema]
        raise ValueError(f"unsupported avro type {schema!r}")
    if isinstance(schema, list):
        non_null = [b for b in schema if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only 2-branch null unions supported: {schema!r}")
        return to_spark_type(non_null[0])
    from pyspark.sql import types as T

    t = schema["type"]
    if t in ("record", "error"):
        return T.StructType(
            [T.StructField(f["name"], to_spark_type(f["type"]), True)
             for f in schema["fields"]]
        )
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(to_spark_type(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), to_spark_type(schema["values"]), True)
    return to_spark_type(t)


def from_spark_type(dt, name: str = "record"):
    """Spark DataType -> Avro schema node (nullable fields become 2-branch
    null unions, Spark's own convention)."""
    from pyspark.sql import types as T

    m = {
        T.BooleanType: "boolean", T.IntegerType: "int", T.ShortType: "int",
        T.ByteType: "int", T.LongType: "long", T.FloatType: "float",
        T.DoubleType: "double", T.BinaryType: "bytes", T.StringType: "string",
    }
    for k, v in m.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": (
                        ["null", from_spark_type(f.dataType, f"{name}_{f.name}")]
                        if f.nullable
                        else from_spark_type(f.dataType, f"{name}_{f.name}")
                    ),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        items = from_spark_type(dt.elementType, name + "_item")
        return {"type": "array", "items": ["null", items] if dt.containsNull else items}
    if isinstance(dt, T.MapType):
        vals = from_spark_type(dt.valueType, name + "_value")
        return {"type": "map", "values": ["null", vals] if dt.valueContainsNull else vals}
    raise ValueError(f"unsupported spark type for avro: {dt}")


def write_avro_fallback(df, path: str, n_files: int = 8) -> None:
    """Materialize a DataFrame as container files without spark-avro —
    a TEST/FIXTURE aid (driver-side collect + encode), not a data path."""
    import os

    rows = [r.asDict(recursive=True) for r in df.collect()]
    schema_json = from_spark_type(df.schema)
    os.makedirs(path, exist_ok=True)
    n_files = max(1, min(n_files, len(rows) or 1))
    per = -(-len(rows) // n_files)
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        with open(os.path.join(path, f"part-{i:05d}.avro"), "wb") as fh:
            fh.write(write_container(chunk, schema_json))


def read_avro_fallback(spark, path):
    """Distributed container read without spark-avro: one task per file
    (binaryFile scan), pure-Python block decode inside mapInPandas with
    Arrow-batched output. Schema comes from the first file's header,
    sniffed on the driver through the same Hadoop-agnostic binaryFile scan
    (works for any filesystem Spark can read). ``path``: directory, glob,
    single file, or list of any of those."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").first()
    if first is None:
        raise ValueError(f"no avro files under {path}")
    schema_json = read_schema(bytes(first["content"]))
    spark_schema = to_spark_type(schema_json)
    from pyspark.sql.types import StructType as _St

    if not isinstance(spark_schema, _St):
        raise ValueError("top-level avro schema must be a record")

    def decode(batches):
        import pandas as pd

        cols = [f.name for f in spark_schema.fields]
        for pdf in batches:
            for content in pdf["content"]:
                _, recs = read_container(bytes(content))
                if not recs:
                    continue
                yield pd.DataFrame(
                    {c: [r.get(c) for r in recs] for c in cols}, dtype=object
                )

    from airbyte_spark.lineage import log_metric

    log_metric("avro_fallback_read", path=path, reason="spark-avro not on classpath")
    return files.select("content").mapInPandas(decode, schema=spark_schema)
