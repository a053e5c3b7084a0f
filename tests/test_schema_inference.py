"""Record-driven schema inference for declarative streams — the
connector-builder's SchemaInferrer (airbyte_cdk/utils/schema_inferrer.py)
re-expressed as a {name: DDL} accumulator feeding the engine's vectorized
schema_extract, plus inferred discovery."""

from __future__ import annotations

from airbyte_spark.sources.declarative import (
    DeclarativeStream,
    ManifestSource,
    infer_schema,
)


def test_infer_scalar_widening_and_nulls():
    recs = [
        {"id": 1, "score": 2, "ok": True, "name": "a", "ghost": None},
        {"id": 2, "score": 2.5, "ok": False, "name": "b", "ghost": None},
    ]
    assert infer_schema(recs) == {
        "id": "bigint",
        "score": "double",  # int union float widens
        "ok": "boolean",
        "name": "string",
        "ghost": "string",  # all-null defaults to string
    }


def test_infer_conflict_degrades_to_string():
    recs = [{"v": 1}, {"v": "x"}, {"w": True}, {"w": 2}]
    assert infer_schema(recs) == {"v": "string", "w": "string"}


def test_infer_arrays_and_nested_structs():
    recs = [
        {"tags": [1, 2], "meta": {"a": 1, "b": {"x": 1, "y": "s"}}},
        {"tags": [3], "meta": {"a": 2.5, "b": {"x": 2, "y": "t"}, "c": "new"}},
    ]
    assert infer_schema(recs) == {
        "tags": "array<bigint>",
        # struct fields merge across records; a is widened, c appears
        "meta": "struct<a:double,b:struct<x:bigint,y:string>,c:string>",
    }


def test_infer_skips_non_identifier_keys():
    assert infer_schema([{"a.b": 1, "ok": 2}]) == {"ok": "bigint"}


def test_stream_reads_typed_df_via_inference(spark):
    recs = [
        {"id": 1, "score": 1.5, "tags": ["a"], "meta": {"x": 1}},
        {"id": 2, "score": 2, "tags": ["b", "c"], "meta": {"x": 2}},
    ]
    stream = DeclarativeStream(
        name="s",
        url="https://api.test/items",
        transport=lambda m, u, params=None, headers=None: (200, {"data": recs}),
        infer_schema=True,
    )
    df = stream.records_to_df(spark, recs)
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["score"] == "double"
    assert types["tags"] == "array<string>" and types["meta"] == "struct<x:bigint>"
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert rows[0]["meta"]["x"] == 1 and rows[1]["tags"] == ["b", "c"]


def test_discover_inferred_catalog():
    manifest = {
        "streams": [
            {"name": "typed", "url": "https://api.test/a", "schema": {"id": "int"}},
            {"name": "loose", "url": "https://api.test/b", "infer_schema": True},
        ]
    }

    def transport(method, url, params=None, headers=None):
        return 200, {"data": [{"id": 1, "price": 9.5, "tags": ["x"]}]}

    src = ManifestSource(manifest, transport)
    cat = src.discover_inferred({})
    by_name = {e["name"]: e for e in cat["catalog"]["streams"]}
    # declared schema untouched; schema-less stream sampled and inferred
    assert by_name["typed"]["json_schema"]["properties"] == {"id": {"type": "integer"}}
    props = by_name["loose"]["json_schema"]["properties"]
    assert props["id"] == {"type": "integer"}
    assert props["price"] == {"type": "number"}
    assert props["tags"] == {"type": "array", "items": {"type": "string"}}
