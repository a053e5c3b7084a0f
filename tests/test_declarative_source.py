"""Manifest-interpreted declarative source: interpolation, the four
protocol verbs (spec/check/discover/read), schema-driven typed extraction
with error capture, transform chains, auth wiring, and datetime-sliced
incremental state — all through a scripted offline transport (the
machinery of manifest_declarative_source.py, no network)."""

from __future__ import annotations

import pytest

from airbyte_spark.sources.declarative import (
    DeclarativeStream,
    ManifestSource,
    interpolate,
)


class RoutedTransport:
    """Routes requests by URL; scripted response list per URL. Records
    every call (url, params, headers) for assertions."""

    def __init__(self, routes: dict):
        self.routes = {u: list(rs) for u, rs in routes.items()}
        self.calls: list[dict] = []

    def __call__(self, method, url, params=None, headers=None):
        self.calls.append(
            {"url": url, "params": dict(params or {}), "headers": dict(headers or {})}
        )
        return self.routes[url].pop(0)


MANIFEST = {
    "version": "1.0",
    "spec": {
        "required": ["api_key", "start_ts"],
        "properties": {"api_key": {"type": "string"}, "start_ts": {"type": "number"}},
    },
    "check": {"stream": "users"},
    "streams": [
        {
            "name": "users",
            "url": "https://api.test/v1/users",
            "primary_key": "id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 2},
            "authenticator": {"type": "token", "token": "{{ config.api_key }}"},
            "schema": {
                "id": "bigint",
                "name": "string",
                "score": "bigint",
                "tags": "array<string>",
            },
            "transforms": [
                {"op": "filter", "predicate": "id >= 2"},
                {"op": "add_field", "name": "name_upper", "expr": "upper(name)"},
            ],
        },
        {
            "name": "events",
            "url": "https://api.test/v1/events",
            "primary_key": "event_id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 100},
            "incremental": {
                "type": "datetime",
                "cursor_field": "ts",
                "start": "{{ config.start_ts }}",
                "step_s": 100,
                "end": 300,
                "start_param": "from",
                "end_param": "to",
            },
            "schema": {"event_id": "bigint", "ts": "double"},
        },
    ],
}

USERS_PAGES = [
    (200, {"data": [
        {"id": 1, "name": "ann", "score": 5, "tags": ["a"]},
        {"id": 2, "name": "bo", "score": "NOT_A_NUMBER", "tags": ["b", "c"]},
    ]}),
    (200, {"data": [{"id": 3, "name": "cy", "score": 7, "tags": []}]}),
]


def _events_slice(lo, hi):
    return (200, {"data": [
        {"event_id": t, "ts": float(t)} for t in range(int(lo), int(hi), 50)
    ]})


def _transport():
    return RoutedTransport({
        "https://api.test/v1/users": [p for p in USERS_PAGES],
        "https://api.test/v1/events": [
            _events_slice(0, 100), _events_slice(100, 200), _events_slice(200, 300),
        ],
    })


CONFIG = {"api_key": "sekrit", "start_ts": 0}


def test_interpolate_preserves_type_and_renders_embedded():
    cfg = {"k": 42, "s": "x"}
    assert interpolate("{{ config.k }}", cfg) == 42  # full placeholder: raw value
    assert interpolate("{{ config['k'] }}", cfg) == 42
    assert interpolate("v={{ config.k }}/{{ config.s }}", cfg) == "v=42/x"
    assert interpolate({"a": ["{{ config.s }}"]}, cfg) == {"a": ["x"]}
    with pytest.raises(KeyError):
        interpolate("{{ config.missing }}", cfg)


def test_spec_and_config_validation():
    src = ManifestSource(MANIFEST, _transport())
    assert src.spec()["type"] == "SPEC"
    assert "api_key" in src.spec()["spec"]["required"]
    with pytest.raises(ValueError, match="missing required"):
        src.streams({"api_key": "x"})  # start_ts absent


def test_check_succeeds_and_sends_auth_header():
    t = _transport()
    out = ManifestSource(MANIFEST, t).check(CONFIG)
    assert out == {
        "type": "CONNECTION_STATUS",
        "connectionStatus": {"status": "SUCCEEDED"},
    }
    assert t.calls[0]["headers"]["Authorization"] == "Bearer sekrit"


def test_check_failure_is_a_message_not_a_crash():
    t = RoutedTransport({"https://api.test/v1/users": [(401, None)] * 9,
                         "https://api.test/v1/events": []})
    out = ManifestSource(MANIFEST, t).check(CONFIG)
    assert out["connectionStatus"]["status"] == "FAILED"
    assert "401" in out["connectionStatus"]["message"]


def test_discover_catalog_from_declared_schema():
    cat = ManifestSource(MANIFEST, _transport()).discover(CONFIG)
    assert cat["type"] == "CATALOG"
    streams = {s["name"]: s for s in cat["catalog"]["streams"]}
    u = streams["users"]["json_schema"]["properties"]
    assert u["id"] == {"type": "integer"}
    assert u["tags"] == {"type": "array", "items": {"type": "string"}}
    assert streams["events"]["default_cursor_field"] == ["ts"]
    assert streams["users"]["source_defined_primary_key"] == [["id"]]


def test_read_typed_extraction_transforms_and_error_capture(spark):
    out = ManifestSource(MANIFEST, _transport()).read(spark, CONFIG, streams=["users"])
    df, state = out["users"]
    rows = {r.id: r for r in df.collect()}
    assert state is None  # full refresh
    assert set(rows) == {2, 3}  # id >= 2 filter applied
    assert rows[3].name_upper == "CY"
    assert rows[3].score == 7 and rows[3]._ab_errors == ""
    # dirty score on id=2: typed column NULL, column name captured
    assert rows[2].score is None and rows[2]._ab_errors == "score"
    assert rows[2].tags == ["b", "c"]


def test_read_datetime_incremental_and_resume(spark):
    t = _transport()
    src = ManifestSource(MANIFEST, t)
    df, state = src.read(spark, CONFIG, streams=["events"])["events"]
    assert state == 300.0
    assert df.count() == 6  # 3 slices x 2 events
    slice_bounds = [(c["params"]["from"], c["params"]["to"])
                    for c in t.calls if c["url"].endswith("/events")]
    assert slice_bounds == [(0, 100.0), (100.0, 200.0), (200.0, 300.0)]
    # resume from state: only the un-synced window is requested
    t2 = RoutedTransport({"https://api.test/v1/events": [_events_slice(200, 300)],
                          "https://api.test/v1/users": []})
    df2, state2 = ManifestSource(MANIFEST, t2).read(
        spark, CONFIG, state={"events": 200.0}, streams=["events"]
    )["events"]
    assert state2 == 300.0 and df2.count() == 2
    assert [c["params"]["from"] for c in t2.calls] == [200.0]


def test_read_messages_protocol_shapes(spark):
    msgs = list(ManifestSource(MANIFEST, _transport()).read_messages(
        spark, CONFIG, streams=["events"]
    ))
    records = [m for m in msgs if m["type"] == "RECORD"]
    states = [m for m in msgs if m["type"] == "STATE"]
    assert len(records) == 6 and len(states) == 1
    assert records[0]["record"]["stream"] == "events"
    assert states[0]["state"]["stream"]["stream_state"]["cursor"] == 300.0
    # sourceStats record count rides the STATE message (protocol parity)
    assert states[0]["state"]["sourceStats"]["recordCount"] == 6.0
    # stream-status lifecycle traces: STARTED -> RUNNING (first record) ->
    # COMPLETE, in order around the records
    # (stream_status_utils.as_airbyte_message; abstract_source.py:124-145)
    statuses = [
        m["trace"]["stream_status"]["status"]
        for m in msgs
        if m["type"] == "TRACE" and m["trace"]["type"] == "STREAM_STATUS"
    ]
    assert statuses == ["STARTED", "RUNNING", "COMPLETE"]
    order = [m["type"] for m in msgs if m["type"] in ("TRACE", "RECORD", "STATE")]
    assert order[0] == "TRACE" and order[-1] == "TRACE"


def test_read_messages_failure_emits_incomplete(spark):
    import pytest as _pytest

    class _BoomTransport:
        def __call__(self, *a, **kw):
            raise ConnectionError("wire cut")

    src = ManifestSource(MANIFEST, _BoomTransport())
    msgs = []
    with _pytest.raises(Exception):
        for m in src.read_messages(spark, CONFIG, streams=["events"]):
            msgs.append(m)
    statuses = [
        m["trace"]["stream_status"]["status"]
        for m in msgs
        if m["type"] == "TRACE" and m["trace"].get("type") == "STREAM_STATUS"
    ]
    assert statuses == ["STARTED", "INCOMPLETE"]


def test_oauth2_stream_refreshes_and_retries_on_401(spark):
    manifest = {
        "spec": {"required": [], "properties": {}},
        "streams": [{
            "name": "s",
            "url": "https://api.test/v1/s",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 10},
            "authenticator": {
                "type": "oauth2",
                "token_url": "https://api.test/oauth",
                "client_id": "ci", "client_secret": "cs",
                "refresh_token": "{{ config['rt'] }}",
            },
            "schema": {"id": "bigint"},
        }],
    }
    t = RoutedTransport({
        "https://api.test/oauth": [
            (200, {"access_token": "tokA", "expires_in": 3600}),
            (200, {"access_token": "tokB", "expires_in": 3600}),
        ],
        # first data call 401s (server revoked tokA) -> invalidate+refresh
        "https://api.test/v1/s": [(401, None), (200, {"data": [{"id": 9}]})],
    })
    df, _ = ManifestSource(manifest, t).read(spark, {"rt": "r1"})["s"]
    assert [r.id for r in df.collect()] == [9]
    data_calls = [c for c in t.calls if c["url"].endswith("/v1/s")]
    assert data_calls[0]["headers"]["Authorization"] == "Bearer tokA"
    assert data_calls[1]["headers"]["Authorization"] == "Bearer tokB"


# ---------------------------------------------------------------- routers

SUBSTREAM_MANIFEST = {
    "spec": {"required": [], "properties": {}},
    "streams": [
        {
            "name": "boards",
            "url": "https://api.test/v1/boards",
            "primary_key": "id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 10},
            "schema": {"id": "bigint", "title": "string"},
        },
        {
            "name": "cards",
            "url": "https://api.test/v1/boards/{{ stream_partition.board_id }}/cards",
            "primary_key": "card_id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 10},
            "partition_router": {
                "type": "substream",
                "parent_stream": "boards",
                "parent_key": "id",
                "partition_field": "board_id",
            },
            "incremental": {"type": "cursor", "cursor_field": "ts",
                            "cursor_param": "since"},
            "schema": {"card_id": "bigint", "board_id": "bigint", "ts": "bigint"},
        },
        {
            "name": "metrics",
            "url": "https://api.test/v1/metrics",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 10},
            "partition_router": {
                "type": "list",
                "values": ["eu", "us"],
                "partition_field": "region",
                "request_param": "region",
            },
            "schema": {"metric": "string", "value": "bigint", "region": "string"},
        },
    ],
}


def _boards_page():
    return (200, {"data": [{"id": 1, "title": "a"}, {"id": 2, "title": "b"},
                           {"id": 1, "title": "a"}]})  # dup parent key: one slice


def test_list_partition_router_injects_param_and_tags_records(spark):
    t = RoutedTransport({
        "https://api.test/v1/metrics": [
            (200, {"data": [{"metric": "m", "value": 1}]}),
            (200, {"data": [{"metric": "m", "value": 2}]}),
        ],
    })
    df, state = ManifestSource(SUBSTREAM_MANIFEST, t).read(
        spark, {}, streams=["metrics"]
    )["metrics"]
    rows = {r.region: r.value for r in df.collect()}
    assert rows == {"eu": 1, "us": 2}  # partition field tagged onto records
    assert [c["params"]["region"] for c in t.calls] == ["eu", "us"]
    # full refresh under a router: per-partition state dict of Nones
    assert set(state) == {'{"region": "eu"}', '{"region": "us"}'}


def test_substream_router_reads_parents_and_templates_url(spark):
    t = RoutedTransport({
        "https://api.test/v1/boards": [_boards_page()],
        "https://api.test/v1/boards/1/cards": [
            (200, {"data": [{"card_id": 10, "ts": 5}]}),
        ],
        "https://api.test/v1/boards/2/cards": [
            (200, {"data": [{"card_id": 20, "ts": 7}, {"card_id": 21, "ts": 3}]}),
        ],
    })
    df, state = ManifestSource(SUBSTREAM_MANIFEST, t).read(
        spark, {}, streams=["cards"]
    )["cards"]
    rows = sorted((r.board_id, r.card_id) for r in df.collect())
    assert rows == [(1, 10), (2, 20), (2, 21)]  # FK column present
    # per-partition cursor state (PerPartitionCursor semantics)
    assert state == {'{"board_id": 1}': 5, '{"board_id": 2}': 7}
    urls = [c["url"] for c in t.calls]
    assert "https://api.test/v1/boards/1/cards" in urls
    assert "https://api.test/v1/boards/2/cards" in urls


def test_substream_per_partition_incremental_resume(spark):
    """A resumed sync passes each partition its OWN cursor and only that
    partition's new records arrive — no cross-partition cursor bleed."""
    prior = {'{"board_id": 1}': 5, '{"board_id": 2}': 7}
    t = RoutedTransport({
        "https://api.test/v1/boards": [_boards_page()],
        "https://api.test/v1/boards/1/cards": [
            (200, {"data": [{"card_id": 11, "ts": 9}]}),
        ],
        "https://api.test/v1/boards/2/cards": [(200, {"data": []})],
    })
    df, state = ManifestSource(SUBSTREAM_MANIFEST, t).read(
        spark, {}, state={"cards": prior}, streams=["cards"]
    )["cards"]
    assert [(r.board_id, r.card_id) for r in df.collect()] == [(1, 11)]
    since = {c["url"]: c["params"].get("since")
             for c in t.calls if c["url"].endswith("/cards")}
    assert since == {"https://api.test/v1/boards/1/cards": 5,
                     "https://api.test/v1/boards/2/cards": 7}
    # board 1 advanced; board 2 (no new data) kept its cursor
    assert state == {'{"board_id": 1}': 9, '{"board_id": 2}': 7}


def test_substream_unknown_parent_is_a_manifest_error():
    bad = {"spec": {"required": [], "properties": {}},
           "streams": [{
               "name": "c", "url": "u", "records_field": "data",
               "partition_router": {"type": "substream", "parent_stream": "nope",
                                    "parent_key": "id", "partition_field": "pid"},
           }]}
    with pytest.raises(ValueError, match="not declared"):
        ManifestSource(bad, _transport()).streams({})


def test_use_cache_parent_read_once_across_children(spark):
    """HttpStream.use_cache analog: a parent stream marked use_cache is
    fetched live ONCE per page even though it is read three times in the
    sync (as its own stream + by TWO child substream routers). The
    scripted transport holds a single boards response, so any uncached
    re-fetch would fail loudly."""
    manifest = {
        "spec": {"required": [], "properties": {}},
        "streams": [
            {
                "name": "boards",
                "url": "https://api.test/v1/boards",
                "primary_key": "id",
                "records_field": "data",
                "use_cache": True,
                "paginator": {"kind": "offset", "param": "offset", "page_size": 10},
                "schema": {"id": "bigint", "title": "string"},
            },
            *[
                {
                    "name": child,
                    "url": "https://api.test/v1/boards/"
                           "{{ stream_partition.board_id }}/" + child,
                    "records_field": "data",
                    "paginator": {"kind": "offset", "param": "offset",
                                  "page_size": 10},
                    "partition_router": {
                        "type": "substream",
                        "parent_stream": "boards",
                        "parent_key": "id",
                        "partition_field": "board_id",
                    },
                    "schema": {"x": "bigint", "board_id": "bigint"},
                }
                for child in ("cards", "labels")
            ],
        ],
    }
    t = RoutedTransport({
        "https://api.test/v1/boards": [_boards_page()],  # ONE live page only
        "https://api.test/v1/boards/1/cards": [(200, {"data": [{"x": 1}]})],
        "https://api.test/v1/boards/2/cards": [(200, {"data": [{"x": 2}]})],
        "https://api.test/v1/boards/1/labels": [(200, {"data": [{"x": 3}]})],
        "https://api.test/v1/boards/2/labels": [(200, {"data": [{"x": 4}]})],
    })
    out = ManifestSource(manifest, t).read(spark, {})
    assert out["boards"][0].count() == 3  # raw records (incl. the dup row)
    assert sorted(r.x for r in out["cards"][0].collect()) == [1, 2]
    assert sorted(r.x for r in out["labels"][0].collect()) == [3, 4]
    boards_calls = [c for c in t.calls if c["url"].endswith("/v1/boards")]
    assert len(boards_calls) == 1  # memo served the other two reads


def test_caching_transport_bounded_memo():
    """The memo evicts FIFO past max_entries — a huge cached stream cannot
    balloon the driver; hits/evictions observable."""
    from airbyte_spark.sources.http import CachingTransport

    calls = []

    def t(method, url, params=None, headers=None, body=None):
        calls.append(url)
        return 200, {"u": url}

    c = CachingTransport(t, max_entries=2)
    for u in ("a", "b", "a", "c", "a"):  # 'a' evicted when 'c' lands
        c("GET", u)
    assert c.hits == 1            # the second 'a' only
    assert c.evictions == 2       # 'a' pushed out by 'c'; 'b' by re-cached 'a'
    assert calls == ["a", "b", "c", "a"]
    # errors never cache
    def bad(method, url, params=None, headers=None, body=None):
        return 500, {}
    cb = CachingTransport(bad)
    cb("GET", "x"); cb("GET", "x")
    assert cb.live_calls == 2 and cb.hits == 0
