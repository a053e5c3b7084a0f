"""JSONL response decoder (declarative decoders/json_decoder.py JsonDecoder
vs JsonlDecoder semantics) and stream namespaces
(stream_descriptor.namespace -> namespaced lake-table layout)."""

from __future__ import annotations

import os

import pytest

from airbyte_spark.catalog import CatalogEngine
from airbyte_spark.changelog import ChangelogConfig, seed_df
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.sources.declarative import ManifestSource
from airbyte_spark.sources.http import HttpStreamSource, Paginator


def test_jsonl_decoder_paginates_text_pages():
    """Bulk-export API: each page is a text body of newline-delimited JSON
    records; offset pagination stops at the short page."""
    pages = [
        '{"id": 0}\n{"id": 1}\n',
        '{"id": 2}\n\n',  # blank lines skipped; short page -> exhausted
    ]
    calls = []

    def transport(method, url, params=None, headers=None):
        calls.append(dict(params))
        return 200, pages[len(calls) - 1]

    src = HttpStreamSource(
        transport=transport,
        url="https://api.test/export",
        decoder="jsonl",
        paginator=Paginator(kind="offset", page_size=2),
        sleep=lambda s: None,
    )
    assert list(src.read_records()) == [{"id": 0}, {"id": 1}, {"id": 2}]
    assert [c["offset"] for c in calls] == [0, 2]


def test_jsonl_decoder_rejects_dict_body():
    src = HttpStreamSource(
        transport=lambda m, u, params=None, headers=None: (200, {"data": []}),
        url="https://api.test/export",
        decoder="jsonl",
        sleep=lambda s: None,
    )
    with pytest.raises(ValueError, match="text response body"):
        list(src.read_records())


def test_manifest_jsonl_stream(spark):
    manifest = {
        "streams": [
            {
                "name": "export",
                "url": "https://api.test/export",
                "decoder": "jsonl",
                "schema": {"id": "int"},
            }
        ]
    }
    src = ManifestSource(
        manifest, lambda m, u, params=None, headers=None: (200, '{"id": 7}\n')
    )
    df, _ = src.read(spark, {})["export"]
    assert [r["id"] for r in df.collect()] == [7]


def test_namespaced_streams_layout_and_state(spark, workdir):
    """Namespaced streams land under streams/<namespace>/<name> and their
    state descriptors carry the namespace; un-namespaced layout unchanged."""
    cfg_a = ChangelogConfig(n_events=100, n_seed_docs=40, seed=3)
    cat = CatalogEngine(
        spark,
        os.path.join(workdir, "cat"),
        [
            StreamConfig(name="users", namespace="crm", num_buckets=2),
            StreamConfig(name="events", num_buckets=2),
        ],
        EngineConfig(batch_events=50),
    )
    cat.create_tables()
    cat.bootstrap({"users": seed_df(spark, cfg_a), "events": seed_df(spark, cfg_a)})
    assert os.path.isdir(os.path.join(workdir, "cat", "streams", "crm", "users"))
    assert os.path.isdir(os.path.join(workdir, "cat", "streams", "events"))
    descs = {
        e["stream_descriptor"].get("name"): e["stream_descriptor"]
        for e in cat.state()["global"]["stream_states"]
    }
    assert descs["users"] == {"name": "users", "namespace": "crm"}
    assert descs["events"] == {"name": "events"}
    # catalog snapshots pin namespaced streams like any other
    assert set(cat.catalog_snapshot()["streams"]) == {"users", "events"}
    assert cat.read("users").count() == 40


def test_namespace_path_traversal_rejected(spark, workdir):
    with pytest.raises(ValueError, match="invalid namespace"):
        CatalogEngine(
            spark,
            os.path.join(workdir, "cat"),
            [StreamConfig(name="x", namespace="../evil", num_buckets=2)],
        )
