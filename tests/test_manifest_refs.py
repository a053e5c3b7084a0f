"""Manifest $ref resolution (sources/manifest_refs.py vs the reference's
manifest_reference_resolver.py documented contract): string derefs, $ref
dict splat with sibling precedence, path ambiguity (keys containing '/'),
list indices, chained+nested refs, cycles and undefined paths raise, and
a definitions-factored manifest drives ManifestSource end to end."""

from __future__ import annotations

import pytest

from airbyte_spark.sources.manifest_refs import (
    CircularReferenceError,
    UndefinedReferenceError,
    resolve_references,
)


def test_string_ref_and_nested_path():
    m = {"key": 1234, "reference": "#/key", "dict": {"limit": 50}, "lim": "#/dict/limit"}
    out = resolve_references(m)
    assert out["reference"] == 1234 and out["lim"] == 50


def test_ref_splat_with_sibling_precedence():
    m = {
        "definitions": {"kv": {"k1": "v1", "k2": "v2"}},
        "same": {"$ref": "#/definitions/kv"},
        "enhanced": {"$ref": "#/definitions/kv", "k3": "v3", "k2": "OVERRIDE"},
    }
    out = resolve_references(m)
    assert out["same"] == {"k1": "v1", "k2": "v2"}
    assert out["enhanced"] == {"k1": "v1", "k2": "OVERRIDE", "k3": "v3"}


def test_path_ambiguity_prefers_whole_key_then_descends():
    # reference docstring's exact ambiguity case
    m = {
        "nested": {"path": "first one"},
        "nested/path": "uh oh",
        "value": "#/nested/path",
    }
    assert resolve_references(m)["value"] == "uh oh"
    m2 = {"nested": {"path": "first one"}, "value": "#/nested/path"}
    assert resolve_references(m2)["value"] == "first one"


def test_list_indices_and_chained_nested_refs():
    m = {
        "arr": [{"x": 1}, {"x": 2}],
        "second_x": "#/arr/1/x",
        "a": "#/b",
        "b": "#/key",
        "key": 7,
        "outer": {"$ref": "#/inner"},
        "inner": {"deep": "#/key"},
    }
    out = resolve_references(m)
    assert out["second_x"] == 2
    assert out["a"] == 7  # chained
    assert out["outer"] == {"deep": 7}  # nested ref inside referenced value


def test_cycle_and_undefined_raise():
    with pytest.raises(CircularReferenceError):
        resolve_references({"a": "#/b", "b": "#/a"})
    with pytest.raises(UndefinedReferenceError):
        resolve_references({"a": "#/nope/deeper"})
    with pytest.raises(UndefinedReferenceError):
        resolve_references({"a": "#/"})


def test_definitions_factored_manifest_reads_end_to_end(spark):
    """A realistically-factored manifest: shared requester-ish defaults +
    paginator under definitions, streams pull them via $ref."""
    from airbyte_spark.sources.declarative import ManifestSource

    def transport(method, url, params=None, headers=None, body=None):
        assert headers.get("Authorization") == "Bearer T"
        page = int((params or {}).get("page", 1))
        if page > 2:
            return 200, {"data": []}
        return 200, {"data": [{"id": page}], "next_page": page + 1}

    manifest = {
        "definitions": {
            "base": {
                "records_field": "data",
                "paginator": {"kind": "cursor", "param": "page",
                              "token_field": "next_page"},
                "authenticator": {"type": "token", "token": "T"},
            },
            "id_schema": {"id": "int"},
        },
        "streams": [
            {
                "$ref": "#/definitions/base",
                "name": "items",
                "url": "https://api.test/items",
                "schema": "#/definitions/id_schema",
            }
        ],
    }
    src = ManifestSource(manifest, transport)
    df, _state = src.read(spark, {})["items"]
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
