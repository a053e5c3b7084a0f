"""HTTP stream source: pagination strategies, exponential backoff, rate
budget, DataFrame handoff — driven entirely through a stub transport (the
machinery of http.py:34 HttpStream / call_rate.py APIBudget, offline)."""

from __future__ import annotations

import pytest

from airbyte_spark.sources.http import HttpStreamSource, Paginator


class StubTransport:
    """Scripted (status, body) responses; records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls: list[dict] = []

    def __call__(self, method, url, params=None, headers=None):
        self.calls.append({"params": dict(params or {})})
        return self.responses.pop(0)


def _pages(n_records, page_size):
    """Offset-paginated canned responses for n_records total."""
    out = []
    for start in range(0, n_records + 1, page_size):
        recs = [{"id": i, "v": f"r{i}"} for i in range(start, min(start + page_size, n_records))]
        out.append((200, {"data": recs}))
        if len(recs) < page_size:
            break
    return out


def test_offset_pagination_reads_all_records():
    t = StubTransport(_pages(25, 10))
    src = HttpStreamSource(
        transport=t, url="https://api.example.test/items",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    recs = list(src.read_records())
    assert [r["id"] for r in recs] == list(range(25))
    # offsets advanced by records received; limit always sent
    assert [c["params"]["offset"] for c in t.calls] == [0, 10, 20]
    assert all(c["params"]["limit"] == 10 for c in t.calls)


def test_cursor_pagination_stops_when_token_absent():
    t = StubTransport([
        (200, {"data": [{"id": 1}], "next_page_token": "abc"}),
        (200, {"data": [{"id": 2}], "next_page_token": "def"}),
        (200, {"data": [{"id": 3}]}),  # no token -> exhausted
    ])
    src = HttpStreamSource(
        transport=t, url="u",
        paginator=Paginator(kind="cursor", param="cursor", page_size=1),
    )
    assert [r["id"] for r in src.read_records()] == [1, 2, 3]
    assert "cursor" not in t.calls[0]["params"]
    assert t.calls[1]["params"]["cursor"] == "abc"
    assert t.calls[2]["params"]["cursor"] == "def"


def test_backoff_retries_then_succeeds():
    t = StubTransport([
        (429, None), (503, None), (200, {"data": [{"id": 1}]}),
    ])
    sleeps: list[float] = []
    src = HttpStreamSource(
        transport=t, url="u", backoff_base_s=0.1, sleep=sleeps.append,
        paginator=Paginator(page_size=10),
    )
    assert [r["id"] for r in src.read_records()] == [1]
    assert sleeps == [0.1, 0.2]  # exponential


def test_non_retryable_and_exhausted_retries_raise():
    src = HttpStreamSource(
        transport=StubTransport([(404, None)]), url="u", sleep=lambda s: None
    )
    with pytest.raises(RuntimeError, match="HTTP 404"):
        list(src.read_records())
    src2 = HttpStreamSource(
        transport=StubTransport([(429, None)] * 3), url="u",
        max_retries=2, sleep=lambda s: None,
    )
    with pytest.raises(RuntimeError, match="HTTP 429"):
        list(src2.read_records())


def test_rate_budget_spacing():
    t = StubTransport(_pages(15, 10))
    sleeps: list[float] = []
    src = HttpStreamSource(
        transport=t, url="u", min_call_interval_s=5.0, sleep=sleeps.append,
        paginator=Paginator(page_size=10),
    )
    list(src.read_records())
    # second call had to wait ~the full interval (stub responds instantly)
    assert len(sleeps) == 1 and 4.0 < sleeps[0] <= 5.0


def test_to_dataframe_handoff(spark):
    t = StubTransport(_pages(7, 5))
    src = HttpStreamSource(
        transport=t, url="u", paginator=Paginator(page_size=5)
    )
    df = src.to_dataframe(spark, "id long, v string")
    assert df.count() == 7
    assert df.columns == ["id", "v"]


def test_read_incremental_tracks_cursor_state():
    """Incremental API read: checkpointed cursor injected as a request
    param, running max cursor returned as the new state
    (streams/core.py:127-176)."""
    t1 = StubTransport([
        (200, {"data": [{"id": 1, "updated_at": 100}, {"id": 2, "updated_at": 300}]}),
    ])
    src = HttpStreamSource(
        transport=t1, url="u", paginator=Paginator(page_size=10)
    )
    recs, state = src.read_incremental("updated_at", state=None)
    assert [r["id"] for r in recs] == [1, 2] and state == 300

    # second sync: state goes out as the since-param; no newer records ->
    # state echoed unchanged (the CAT abnormally-large-state contract)
    t2 = StubTransport([(200, {"data": []})])
    src2 = HttpStreamSource(transport=t2, url="u", paginator=Paginator(page_size=10))
    recs2, state2 = src2.read_incremental("updated_at", state=300)
    assert recs2 == [] and state2 == 300
    assert t2.calls[0]["params"]["since"] == 300
