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


# ---------------------------------------------------------------------------
# Round 3: authenticators, concurrent prefetch, datetime-sliced incremental
# ---------------------------------------------------------------------------

import threading
import time as _time

from airbyte_spark.sources.auth import BasicHttpAuth, OAuth2Auth, StaticTokenAuth
from airbyte_spark.sources.http import DatetimeSlicer


class KeyedTransport:
    """Thread-safe transport keyed on request params — scripted by a
    function instead of a pop-in-order list, so it works under concurrent
    prefetch. Records a (t0, t1) timeline per call for overlap assertions."""

    def __init__(self, fn, delay_s=0.0):
        self.fn = fn
        self.delay_s = delay_s
        self.calls: list[dict] = []
        self._lock = threading.Lock()

    def __call__(self, method, url, params=None, headers=None):
        t0 = _time.monotonic()
        if self.delay_s:
            _time.sleep(self.delay_s)
        out = self.fn(method, url, dict(params or {}), dict(headers or {}))
        with self._lock:
            self.calls.append({
                "method": method, "url": url,
                "params": dict(params or {}), "headers": dict(headers or {}),
                "t0": t0, "t1": _time.monotonic(),
            })
        return out


def _offset_api(n_records, page_size):
    """params -> one offset-paginated page of n_records total."""

    def fn(method, url, params, headers):
        start = int(params.get("offset", 0))
        recs = [
            {"id": i, "v": f"r{i}"}
            for i in range(start, min(start + page_size, n_records))
        ]
        return 200, {"data": recs}

    return fn


def test_static_token_auth_header_on_every_request():
    seen = []

    def fn(method, url, params, headers):
        seen.append(headers.get("Authorization"))
        return _offset_api(25, 10)(method, url, params, headers)

    src = HttpStreamSource(
        transport=KeyedTransport(fn), url="u",
        paginator=Paginator(page_size=10),
        authenticator=StaticTokenAuth("sekret"),
    )
    assert len(list(src.read_records())) == 25
    assert seen == ["Bearer sekret"] * 3


def test_basic_auth_header():
    auth = BasicHttpAuth("user", "pass")
    # base64("user:pass")
    assert auth.auth_header() == {"Authorization": "Basic dXNlcjpwYXNz"}


def _oauth_env(expires_in=100):
    """A fake clock + transport pair serving both the token endpoint and a
    2-page data API; the clock jumps past token expiry between pages."""
    clock = {"now": 1000.0}
    issued = {"n": 0}

    def fn(method, url, params, headers):
        if url == "https://auth.test/token":
            assert method == "POST"
            assert params["grant_type"] == "refresh_token"
            issued["n"] += 1
            return 200, {"access_token": f"tok{issued['n']}", "expires_in": expires_in}
        # data endpoint: 2 pages of 10 then a short page; advance the clock
        # past expiry after page 1 so page 2 needs a refresh
        clock["now"] += 200.0
        return _offset_api(15, 10)(method, url, params, headers)

    return clock, KeyedTransport(fn)


def test_oauth2_refreshes_expired_token_mid_pagination():
    clock, t = _oauth_env(expires_in=100)
    auth = OAuth2Auth(
        transport=t, token_url="https://auth.test/token",
        client_id="cid", client_secret="cs", refresh_token="rt",
        clock=lambda: clock["now"],
    )
    src = HttpStreamSource(
        transport=t, url="https://api.test/items",
        paginator=Paginator(page_size=10), authenticator=auth,
    )
    recs = list(src.read_records())
    assert [r["id"] for r in recs] == list(range(15))
    data_auths = [
        c["headers"]["Authorization"] for c in t.calls if c["url"] != "https://auth.test/token"
    ]
    # page 1 used tok1; clock jumped past expiry; page 2 refreshed to tok2
    assert data_auths[0] == "Bearer tok1"
    assert "Bearer tok2" in data_auths
    token_calls = [c for c in t.calls if c["url"] == "https://auth.test/token"]
    assert len(token_calls) >= 2  # initial grant + at least one refresh


def test_oauth2_401_invalidates_and_force_refreshes():
    """Server-side revocation: a 401 with a cached-valid token triggers one
    forced refresh and a retry, not a hard failure."""
    clock = {"now": 1000.0}
    issued = {"n": 0}

    def fn(method, url, params, headers):
        if url == "tok":
            issued["n"] += 1
            return 200, {"access_token": f"tok{issued['n']}", "expires_in": 10_000}
        if headers.get("Authorization") == "Bearer tok1":
            return 401, None  # revoked server-side
        return 200, {"data": [{"id": 1}]}

    t = KeyedTransport(fn)
    auth = OAuth2Auth(
        transport=t, token_url="tok", client_id="c", client_secret="s",
        refresh_token="r", clock=lambda: clock["now"],
    )
    src = HttpStreamSource(
        transport=t, url="api", paginator=Paginator(page_size=10),
        authenticator=auth, sleep=lambda s: None,
    )
    assert [r["id"] for r in src.read_records()] == [1]
    assert issued["n"] == 2  # initial grant + forced refresh after 401


def test_prefetch_records_identical_to_sequential_with_overlap():
    """Concurrent lookahead must overlap requests in time while yielding
    exactly the sequential record stream (VERDICT r2 ask #7)."""
    n, page = 55, 10
    t_seq = KeyedTransport(_offset_api(n, page))
    seq = list(HttpStreamSource(
        transport=t_seq, url="u", paginator=Paginator(page_size=page)
    ).read_records())

    t_pre = KeyedTransport(_offset_api(n, page), delay_s=0.05)
    pre = list(HttpStreamSource(
        transport=t_pre, url="u", paginator=Paginator(page_size=page),
        prefetch_pages=4,
    ).read_records())
    assert pre == seq  # identical records, identical order

    # the call timeline shows true overlap: some request started before an
    # earlier one finished
    calls = sorted(t_pre.calls, key=lambda c: c["t0"])
    overlaps = sum(
        1 for a, b in zip(calls, calls[1:]) if b["t0"] < a["t1"]
    )
    assert overlaps >= 1


def test_prefetch_page_kind_and_max_pages():
    t = KeyedTransport(
        lambda m, u, p, h: (200, {"data": [{"id": int(p["page"])}]})
    )
    src = HttpStreamSource(
        transport=t, url="u",
        paginator=Paginator(kind="page", param="page", page_size=1),
        prefetch_pages=3,
    )
    recs = list(src.read_records(max_pages=5))
    assert [r["id"] for r in recs] == [1, 2, 3, 4, 5]


def _sliced_api(events):
    """Time-windowed API: returns events with start <= ts < end."""

    def fn(method, url, params, headers):
        lo, hi = float(params["start_time"]), float(params["end_time"])
        recs = [e for e in events if lo <= e["ts"] < hi]
        off = int(params.get("offset", 0))
        return 200, {"data": recs[off:off + 100]}

    return fn


def test_datetime_sliced_read_and_mid_range_resume():
    """DatetimeBasedCursor semantics: a killed sliced sync resumes at the
    first incomplete window with no lost or duplicated records."""
    events = [{"id": i, "ts": float(100 + 7 * i)} for i in range(40)]  # ts 100..373
    slicer = DatetimeSlicer(start=100.0, step_s=60.0, end=380.0)

    def make_src():
        return HttpStreamSource(
            transport=KeyedTransport(_sliced_api(events)), url="u",
            paginator=Paginator(page_size=100),
        )

    # full uninterrupted read
    full = [r for _, recs in make_src().read_datetime_sliced(slicer) for r in recs]
    assert sorted(r["id"] for r in full) == list(range(40))

    # killed after 2 slices: checkpoint the last committed slice end
    got, state = [], None
    for i, (st, recs) in enumerate(make_src().read_datetime_sliced(slicer)):
        got.extend(recs)
        state = st["slice_end_epoch"]
        if i == 1:
            break  # crash

    # resume from checkpoint with a fresh source
    for st, recs in make_src().read_datetime_sliced(slicer, state=state):
        got.extend(recs)

    ids = [r["id"] for r in got]
    assert sorted(ids) == list(range(40))      # nothing lost
    assert len(ids) == len(set(ids))           # nothing duplicated


def test_datetime_slicer_lookback_redelivers_boundary():
    slicer = DatetimeSlicer(start=0.0, step_s=10.0, end=30.0, lookback_s=5.0)
    # resuming from state=20 with 5s lookback re-opens [15, 30)
    assert list(slicer.slices(state=20.0)) == [(15.0, 25.0), (25.0, 30.0)]


def test_to_dataframe_chunked_matches_unchunked(spark):
    t = KeyedTransport(_offset_api(23, 5))
    src = HttpStreamSource(transport=t, url="u", paginator=Paginator(page_size=5))
    df = src.to_dataframe(spark, "id long, v string", pages_per_chunk=2)
    assert df.count() == 23
    assert df.columns == ["id", "v"]


def _cursor_pages(n):
    """Cursor-paginated canned responses: page i carries token t{i+1}."""
    out = []
    for i in range(n):
        body = {"data": [{"id": i}]}
        if i < n - 1:
            body["next_page_token"] = f"t{i + 1}"
        out.append((200, body))
    return out


def test_full_refresh_resumable_offset_kill_and_resume():
    """Kill after the first checkpoint; a NEW source resumes from the
    checkpointed page index and the union of committed records equals an
    uninterrupted read, with no page re-read."""
    full = [r["id"] for r in HttpStreamSource(
        transport=StubTransport(_pages(45, 10)), url="u",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    ).read_records()]

    t1 = StubTransport(_pages(45, 10))
    src1 = HttpStreamSource(
        transport=t1, url="u",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    it = src1.read_full_refresh_resumable(pages_per_checkpoint=2)
    state, recs = next(it)  # first checkpoint: pages 0-1 committed
    committed = [r["id"] for r in recs]
    assert state == {"next_page_index": 2}
    del it  # crash

    t2 = StubTransport(_pages(45, 10)[2:])  # server only sees pages 2+
    src2 = HttpStreamSource(
        transport=t2, url="u",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    states = []
    for st, recs in src2.read_full_refresh_resumable(state=state, pages_per_checkpoint=2):
        committed.extend(r["id"] for r in recs)
        states.append(st)
    assert committed == full  # nothing lost, nothing duplicated
    assert states[-1] == {"complete": True}
    # the resumed read started exactly at offset 20
    assert t2.calls[0]["params"]["offset"] == 20


def test_full_refresh_resumable_cursor_token_state():
    t = StubTransport(_cursor_pages(4))
    src = HttpStreamSource(
        transport=t, url="u",
        paginator=Paginator(kind="cursor", param="cursor", page_size=1),
    )
    it = src.read_full_refresh_resumable(pages_per_checkpoint=1)
    state, recs = next(it)
    assert state == {"next_page_token": "t1"} and [r["id"] for r in recs] == [0]

    t2 = StubTransport(_cursor_pages(4)[1:])
    src2 = HttpStreamSource(
        transport=t2, url="u",
        paginator=Paginator(kind="cursor", param="cursor", page_size=1),
    )
    got = []
    for st, recs in src2.read_full_refresh_resumable(state=state):
        got.extend(r["id"] for r in recs)
    assert got == [1, 2, 3]
    assert t2.calls[0]["params"]["cursor"] == "t1"


def test_full_refresh_complete_state_starts_over():
    """A finished full refresh never resumes: complete state -> page 0."""
    t = StubTransport(_pages(5, 10))
    src = HttpStreamSource(
        transport=t, url="u",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    out = list(src.read_full_refresh_resumable(state={"complete": True}))
    assert out[-1][0] == {"complete": True}
    assert t.calls[0]["params"]["offset"] == 0
    assert [r["id"] for st, recs in out for r in recs] == [0, 1, 2, 3, 4]


def test_full_refresh_uninterrupted_equals_plain_read():
    t = StubTransport(_pages(37, 10))
    src = HttpStreamSource(
        transport=t, url="u",
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    chunks = list(src.read_full_refresh_resumable(pages_per_checkpoint=3))
    ids = [r["id"] for st, recs in chunks for r in recs]
    assert ids == list(range(37))
    # intermediate checkpoints carry page indexes, final carries complete
    assert [st for st, _ in chunks] == [{"next_page_index": 3}, {"complete": True}]


def test_retry_after_header_overrides_exponential_backoff():
    """A 429 carrying Retry-After waits the server's delay, not the tiny
    exponential guess; 2-tuple transports keep working unchanged."""
    sleeps = []
    t = StubTransport([
        (429, {"error": "slow down"}, {"Retry-After": "7"}),
        (429, {"error": "slow down"}, {"retry-after": 3}),  # case-insensitive
        (200, {"data": [{"id": 1}]}),
    ])
    src = HttpStreamSource(
        transport=t, url="u", backoff_base_s=0.01, sleep=sleeps.append,
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    assert [r["id"] for r in src.read_records()] == [1]
    assert sleeps == [7.0, 3.0]


def test_retry_after_unparseable_falls_back_to_exponential():
    sleeps = []
    t = StubTransport([
        (503, {}, {"Retry-After": "soon"}),
        (200, {"data": [{"id": 1}]}),
    ])
    src = HttpStreamSource(
        transport=t, url="u", backoff_base_s=0.25, sleep=sleeps.append,
        paginator=Paginator(kind="offset", param="offset", page_size=10),
    )
    assert [r["id"] for r in src.read_records()] == [1]
    assert sleeps == [0.25]
