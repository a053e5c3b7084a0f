"""Declarative response-filter error handling — the reference's
DefaultErrorHandler + HttpResponseFilter semantics (declarative/requesters/
error_handlers/default_error_handler.py:105-142; http_response_filter.py:
22-78; backoff_strategies/): FAIL / IGNORE / RETRY by status or body match,
constant or exponential backoff, wired through the manifest interpreter.
All offline via the injected transport; no Spark needed."""

from __future__ import annotations

import pytest

from airbyte_spark.sources.declarative import ManifestSource
from airbyte_spark.sources.http import ErrorHandler, HttpStreamSource, Paginator


def _page(records):
    return {"data": records}


def _recs(n, start=0):
    return [{"id": i} for i in range(start, start + n)]


class Script:
    """Transport scripted as a list of (status, body) responses; records
    every call for assertion."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, method, url, params=None, headers=None):
        self.calls.append({"url": url, "params": dict(params or {})})
        return self.responses.pop(0) if self.responses else (200, _page([]))


def _src(transport, **kw):
    kw.setdefault("paginator", Paginator(kind="offset", page_size=2))
    return HttpStreamSource(
        transport=transport, url="https://api.test/items", sleep=lambda s: None, **kw
    )


def test_ignore_status_yields_empty_scope():
    """A 404 on an IGNOREd status contributes zero records and ends that
    scope's pagination without raising."""
    t = Script([(404, {"error": "gone"})])
    src = _src(t, error_handler=ErrorHandler(ignore_on_status=(404,)))
    assert list(src.read_records()) == []
    assert len(t.calls) == 1  # no retries burned on an ignored response


def test_fail_status_raises_immediately():
    """fail_on_status overrides the default retryable set: one call, no
    backoff retries, hard error."""
    t = Script([(503, {"error": "nope"})])
    src = _src(t, error_handler=ErrorHandler(fail_on_status=(503,)))
    with pytest.raises(RuntimeError, match="HTTP 503"):
        list(src.read_records())
    assert len(t.calls) == 1


def test_custom_retry_status():
    """A status outside the default retryable set retries when declared."""
    t = Script([(418, {}), (418, {}), (200, _page(_recs(1)))])
    src = _src(t, error_handler=ErrorHandler(retry_on_status=(418,)))
    assert list(src.read_records()) == _recs(1)
    assert len(t.calls) == 3


def test_retry_on_body_match_with_200():
    """The 200-with-error-envelope pattern: a success status whose body
    matches retry_on_body_contains is retried, then real records flow."""
    t = Script(
        [
            (200, {"error": "RATE_LIMITED", "data": []}),
            (200, _page(_recs(1))),
        ]
    )
    src = _src(t, error_handler=ErrorHandler(retry_on_body_contains="RATE_LIMITED"))
    assert list(src.read_records()) == _recs(1)
    assert len(t.calls) == 2


def test_constant_backoff_delays():
    """backoff='constant' sleeps the same base every attempt; exponential
    doubles. Asserted through the injected sleep."""
    delays: list[float] = []
    t = Script([(429, {}), (429, {}), (200, _page(_recs(1)))])
    src = HttpStreamSource(
        transport=t,
        url="https://api.test/items",
        paginator=Paginator(kind="offset", page_size=2),
        sleep=delays.append,
        error_handler=ErrorHandler(backoff="constant", backoff_base_s=0.25),
    )
    assert list(src.read_records()) == _recs(1)
    assert delays == [0.25, 0.25]

    delays2: list[float] = []
    t2 = Script([(429, {}), (429, {}), (200, _page(_recs(1)))])
    src2 = HttpStreamSource(
        transport=t2,
        url="https://api.test/items",
        paginator=Paginator(kind="offset", page_size=2),
        sleep=delays2.append,
        error_handler=ErrorHandler(backoff="exponential", backoff_base_s=0.25),
    )
    assert list(src2.read_records()) == _recs(1)
    assert delays2 == [0.25, 0.5]


def test_retry_budget_exhausted_raises():
    t = Script([(429, {})] * 3)
    src = _src(t, error_handler=ErrorHandler(max_retries=2))
    with pytest.raises(RuntimeError, match="HTTP 429 .* after 2 retries"):
        list(src.read_records())
    assert len(t.calls) == 3


def test_legacy_policy_unchanged_without_handler():
    """No error_handler -> exactly the pre-existing behavior: default
    retryable set, exponential backoff, non-retryable fails."""
    t = Script([(503, {}), (200, _page(_recs(1)))])
    assert list(_src(t).read_records()) == _recs(1)
    t2 = Script([(404, {})])
    with pytest.raises(RuntimeError, match="HTTP 404"):
        list(_src(t2).read_records())
    assert len(t2.calls) == 1


def test_manifest_wiring_ignore_partition():
    """End-to-end through the manifest interpreter: a substream partition
    whose endpoint 404s is IGNOREd (declared policy), the healthy
    partitions' records arrive, and the partition field is stamped."""
    manifest = {
        "streams": [
            {
                "name": "projects",
                "url": "https://api.test/projects",
                "schema": {"id": "int"},
            },
            {
                "name": "issues",
                "url": "https://api.test/projects/{{ stream_partition.pid }}/issues",
                "schema": {"id": "int", "pid": "int"},
                "error_handler": {"ignore_on_status": [404]},
                "partition_router": {
                    "type": "substream",
                    "parent_stream": "projects",
                    "parent_key": "id",
                    "partition_field": "pid",
                },
            },
        ]
    }

    def transport(method, url, params=None, headers=None):
        if url.endswith("/projects"):
            return 200, _page([{"id": 1}, {"id": 2}])
        if "/projects/1/" in url:
            return 200, _page([{"id": 10}])
        return 404, {"error": "project hidden"}

    src = ManifestSource(manifest, transport)
    issues = next(s for s in src.streams({}) if s.name == "issues")
    records, _state = issues.read_records()
    assert records == [{"id": 10, "pid": 1}]
