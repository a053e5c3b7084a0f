"""airbyte-lib-style facade (r3 verdict ask #8): get_source -> check ->
read(cache) -> to_pandas()/sql(), incremental state carried by the cache,
replace-by-pk dedup on re-sync. Mirrors `airbyte-lib/airbyte_lib/`'s
developer surface over ManifestSource + LakeTable."""

from __future__ import annotations

import os
import re

import pytest

from airbyte_spark.lib import LakeCache, SourceCheckFailed, get_source


class RoutedTransport:
    def __init__(self, routes: dict):
        self.routes = {u: list(rs) for u, rs in routes.items()}
        self.calls: list[dict] = []

    def __call__(self, method, url, params=None, headers=None):
        self.calls.append({"url": url, "params": dict(params or {})})
        return self.routes[url].pop(0)


MANIFEST = {
    "version": "1.0",
    "spec": {"required": ["api_key"], "properties": {"api_key": {"type": "string"}}},
    "check": {"stream": "users"},
    "streams": [
        {
            "name": "users",
            "url": "https://api.test/v1/users",
            "primary_key": "id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 100},
            "schema": {"id": "bigint", "name": "string"},
        },
        {
            "name": "events",
            "url": "https://api.test/v1/events",
            "primary_key": "event_id",
            "records_field": "data",
            "paginator": {"kind": "offset", "param": "offset", "page_size": 100},
            "incremental": {
                "type": "cursor",
                "cursor_field": "ts",
            },
            "schema": {"event_id": "bigint", "ts": "bigint"},
        },
    ],
}


def _users_page(rows):
    return (200, {"data": rows})


def test_quickstart_and_sql(spark, workdir):
    transport = RoutedTransport(
        {
            "https://api.test/v1/users": [
                _users_page([{"id": 1, "name": "ann"}, {"id": 2, "name": "bob"}]),
                _users_page([]),
            ],
            "https://api.test/v1/events": [
                _users_page([{"event_id": 10, "ts": 5}]),
                _users_page([]),
            ],
        }
    )
    source = get_source(MANIFEST, config={"api_key": "k"}, transport=transport)
    assert source.get_available_streams() == ["users", "events"]
    source.check()
    # check consumed one scripted users page; refill for the read
    transport.routes["https://api.test/v1/users"] = [
        _users_page([{"id": 1, "name": "ann"}, {"id": 2, "name": "bob"}]),
        _users_page([]),
    ]
    result = source.read(spark, LakeCache(spark, os.path.join(workdir, "cache")))
    users = result["users"].to_pandas()
    assert sorted(users["name"]) == ["ann", "bob"]
    assert result.processed_records["users"] == 2
    assert result.sql("SELECT count(*) AS n FROM users").first()["n"] == 2
    assert set(result) == {"users", "events"}


def test_replace_by_pk_and_incremental_state(spark, workdir):
    cache = LakeCache(spark, os.path.join(workdir, "cache2"))
    t1 = RoutedTransport(
        {
            "https://api.test/v1/users": [
                _users_page([{"id": 1, "name": "ann"}, {"id": 2, "name": "bob"}]),
                _users_page([]),
            ],
            "https://api.test/v1/events": [
                _users_page([{"event_id": 10, "ts": 5}, {"event_id": 11, "ts": 7}]),
                _users_page([]),
            ],
        }
    )
    src1 = get_source(MANIFEST, config={"api_key": "k"}, transport=t1)
    src1.read(spark, cache)

    # sync 2: user 2 renamed, user 3 new; events resume from saved cursor
    t2 = RoutedTransport(
        {
            "https://api.test/v1/users": [
                _users_page([{"id": 2, "name": "bobby"}, {"id": 3, "name": "cal"}]),
                _users_page([]),
            ],
            "https://api.test/v1/events": [
                _users_page([{"event_id": 12, "ts": 9}]),
                _users_page([]),
            ],
        }
    )
    src2 = get_source(MANIFEST, config={"api_key": "k"}, transport=t2)
    result = src2.read(spark, cache)

    users = result["users"].to_pandas().sort_values("id", ignore_index=True)
    assert list(users["id"]) == [1, 2, 3]
    assert list(users["name"]) == ["ann", "bobby", "cal"]  # replaced, not duped

    events = result["events"].to_pandas().sort_values("event_id", ignore_index=True)
    assert list(events["event_id"]) == [10, 11, 12]
    # the cursor param of sync 2's first events call carried sync 1's state
    ev_calls = [c for c in t2.calls if c["url"].endswith("/events")]
    assert ev_calls, "no events calls recorded"
    saved = cache.get_state()["events"]
    assert saved == 9


def test_check_failure_raises(spark):
    transport = RoutedTransport({"https://api.test/v1/users": [(500, {"err": "boom"})]})
    source = get_source(MANIFEST, config={"api_key": "k"}, transport=transport)
    with pytest.raises(SourceCheckFailed):
        source.check()


def test_select_streams_validates(spark):
    source = get_source(MANIFEST, config={"api_key": "k"}, transport=None)
    with pytest.raises(ValueError, match="unknown"):
        source.select_streams(["nope"])


def test_readme_quickstart(spark, workdir):
    """The README's lib-quickstart block, executed verbatim."""
    readme = open(os.path.join(os.path.dirname(__file__), "..", "README.md")).read()
    m = re.search(
        r"<!-- lib-quickstart -->\s*```python\n(.*?)```", readme, re.DOTALL
    )
    assert m, "README lib-quickstart block missing"
    code = m.group(1)
    transport = RoutedTransport(
        {
            "https://api.test/v1/users": [
                _users_page([{"id": 1, "name": "ann"}]),  # consumed by check()
                _users_page([{"id": 1, "name": "ann"}]),  # read page 1
                _users_page([]),  # read termination
            ],
            "https://api.test/v1/events": [
                _users_page([{"event_id": 10, "ts": 5}]),
                _users_page([]),
            ],
        }
    )
    manifest = dict(MANIFEST)
    manifest["spec"] = {
        "required": ["api_key", "start_ts"],
        "properties": {"api_key": {"type": "string"}, "start_ts": {"type": "number"}},
    }
    env = {
        "manifest": manifest,
        "transport": transport,
        "spark": spark,
        "cache_dir": os.path.join(workdir, "readme_cache"),
    }
    exec(compile(code, "README.md:lib-quickstart", "exec"), env)
    assert sorted(env["users"]["name"]) == ["ann"]
    assert env["n"] == 1
