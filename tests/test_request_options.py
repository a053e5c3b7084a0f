"""RequestOption-style injection: pagination values into the query string,
request JSON body, or headers, plus POST bodies with config/partition
interpolation — the reference's request_option.py targets (request
parameter / header / body_json) and HttpRequester body handling. Offline
via injected transports."""

from __future__ import annotations

from airbyte_spark.sources.declarative import ManifestSource
from airbyte_spark.sources.http import HttpStreamSource, Paginator


def _recs(n, start=0):
    return [{"id": i} for i in range(start, start + n)]


class BodyScript:
    """Transport accepting the optional body kwarg, scripted by call index."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, params=None, headers=None, body=None):
        self.calls.append(
            {"method": method, "params": dict(params or {}),
             "headers": dict(headers or {}), "body": body}
        )
        return self.responses.pop(0)


def test_cursor_token_injected_into_post_body():
    """GraphQL-style pagination: POST with the cursor token in the JSON
    body; the static body template fields survive alongside."""
    t = BodyScript(
        [
            (200, {"data": _recs(2), "next_page_token": "T1"}),
            (200, {"data": _recs(1, 2)}),  # no token -> exhausted
        ]
    )
    src = HttpStreamSource(
        transport=t,
        url="https://api.test/graphql",
        http_method="POST",
        body_json={"query": "query{items}"},
        paginator=Paginator(
            kind="cursor", param="after", size_param="first", inject_into="body"
        ),
        sleep=lambda s: None,
    )
    assert list(src.read_records()) == _recs(3)
    assert [c["method"] for c in t.calls] == ["POST", "POST"]
    assert t.calls[0]["body"] == {"query": "query{items}", "first": 100}
    assert t.calls[1]["body"] == {"query": "query{items}", "first": 100, "after": "T1"}
    assert "after" not in t.calls[1]["params"]  # body target, not query string


def test_page_number_injected_into_header():
    t = BodyScript(
        [
            (200, {"data": _recs(2)}),
            (200, {"data": _recs(1, 2)}),
        ]
    )
    src = HttpStreamSource(
        transport=t,
        url="https://api.test/items",
        paginator=Paginator(
            kind="page", param="X-Page", size_param="X-Size",
            page_size=2, inject_into="header",
        ),
        sleep=lambda s: None,
    )
    assert list(src.read_records()) == _recs(3)
    assert t.calls[0]["headers"]["X-Page"] == "1"
    assert t.calls[1]["headers"]["X-Page"] == "2"
    assert t.calls[0]["headers"]["X-Size"] == "2"


def test_resumable_full_refresh_with_body_cursor():
    """RFR checkpoints the body-injected cursor token and resumes with it."""
    t = BodyScript(
        [
            (200, {"data": _recs(2), "next_page_token": "T1"}),
        ]
    )
    src = HttpStreamSource(
        transport=t,
        url="https://api.test/items",
        http_method="POST",
        paginator=Paginator(kind="cursor", param="after", inject_into="body"),
        sleep=lambda s: None,
    )
    it = src.read_full_refresh_resumable(pages_per_checkpoint=1, max_pages=1)
    state, recs = next(it)
    assert recs == _recs(2) and state == {"next_page_token": "T1"}

    t2 = BodyScript([(200, {"data": _recs(1, 2)})])
    src2 = HttpStreamSource(
        transport=t2,
        url="https://api.test/items",
        http_method="POST",
        paginator=Paginator(kind="cursor", param="after", inject_into="body"),
        sleep=lambda s: None,
    )
    state2, recs2 = next(src2.read_full_refresh_resumable(state=state))
    assert recs2 == _recs(1, 2) and state2 == {"complete": True}
    assert t2.calls[0]["body"] == {"limit": 100, "after": "T1"}


def test_get_transports_never_receive_body_kwarg():
    """Back-compat: with an empty body template the transport is called
    WITHOUT the body kwarg, so existing 4-argument transports keep working."""

    def transport(method, url, params=None, headers=None):  # no body param
        return 200, {"data": _recs(1)}

    src = HttpStreamSource(
        transport=transport, url="https://api.test/items", sleep=lambda s: None
    )
    assert list(src.read_records()) == _recs(1)


def test_manifest_post_body_with_config_and_partition():
    """Manifest-declared POST stream: {{ config.* }} resolves at stream
    build, {{ stream_partition.* }} resolves per partition inside the body
    template."""
    manifest = {
        "streams": [
            {
                "name": "search",
                "url": "https://api.test/search",
                "http_method": "POST",
                "body": {"index": "{{ config.index }}", "region": "{{ stream_partition.r }}"},
                "schema": {"id": "int", "r": "string"},
                "partition_router": {
                    "type": "list", "values": ["eu", "us"], "partition_field": "r",
                },
            }
        ]
    }
    seen = []

    def transport(method, url, params=None, headers=None, body=None):
        seen.append((method, dict(body or {})))
        return 200, {"data": [{"id": len(seen)}]}

    src = ManifestSource(manifest, transport)
    stream = src.streams({"index": "docs-v2"})[0]
    records, _ = stream.read_records()
    assert [r["r"] for r in records] == ["eu", "us"]
    # the default paginator injects its size into PARAMS (inject_into
    # defaults to "param"), so the body carries only the template fields
    assert seen == [
        ("POST", {"index": "docs-v2", "region": "eu"}),
        ("POST", {"index": "docs-v2", "region": "us"}),
    ]
