"""Protocol entrypoint (airbyte_spark/entrypoint.py): the four verbs over
file args + JSONL stdout, configured-catalog stream selection, state
round-trip — all with the scripted offline transport."""

from __future__ import annotations

import io
import json

from airbyte_spark.entrypoint import run
from tests.test_declarative_source import CONFIG, MANIFEST, RoutedTransport, _transport


def _files(tmp_path, catalog=None, state=None):
    m = tmp_path / "manifest.json"
    m.write_text(json.dumps(MANIFEST))
    c = tmp_path / "config.json"
    c.write_text(json.dumps(CONFIG))
    args = ["--manifest", str(m), "--config", str(c)]
    if catalog is not None:
        f = tmp_path / "catalog.json"
        f.write_text(json.dumps(catalog))
        args += ["--catalog", str(f)]
    if state is not None:
        f = tmp_path / "state.json"
        f.write_text(json.dumps(state))
        args += ["--state", str(f)]
    return args


def _lines(buf: io.StringIO):
    return [json.loads(x) for x in buf.getvalue().splitlines()]


def test_spec_check_discover_verbs(tmp_path):
    buf = io.StringIO()
    assert run(["spec", *_files(tmp_path)], transport=_transport(), out=buf) == 0
    buf2 = io.StringIO()
    assert run(["check", *_files(tmp_path)], transport=_transport(), out=buf2) == 0
    buf3 = io.StringIO()
    assert run(["discover", *_files(tmp_path)], transport=_transport(), out=buf3) == 0
    (spec,), (check,), (cat,) = _lines(buf), _lines(buf2), _lines(buf3)
    assert spec["type"] == "SPEC" and "api_key" in spec["spec"]["required"]
    assert check["connectionStatus"]["status"] == "SUCCEEDED"
    assert {s["name"] for s in cat["catalog"]["streams"]} == {"users", "events"}


def test_read_with_catalog_selection_and_state(spark, tmp_path):
    catalog = {"streams": [{"stream": {"name": "events"}, "sync_mode": "incremental"}]}
    t = RoutedTransport({
        "https://api.test/v1/events": [
            (200, {"data": [{"event_id": t0, "ts": float(t0)}
                            for t0 in range(int(lo), int(lo) + 100, 50)]})
            for lo in (100, 200)
        ],
        "https://api.test/v1/users": [],
    })
    buf = io.StringIO()
    rc = run(
        ["read", *_files(tmp_path, catalog=catalog, state={"events": 100.0})],
        spark=spark, transport=t, out=buf,
    )
    assert rc == 0
    msgs = _lines(buf)
    recs = [m for m in msgs if m["type"] == "RECORD"]
    states = [m for m in msgs if m["type"] == "STATE"]
    assert len(recs) == 4 and all(m["record"]["stream"] == "events" for m in recs)
    assert states[-1]["state"]["stream"]["stream_state"]["cursor"] == 300.0
    # users was never called: catalog selected events only
    assert all(c["url"].endswith("/events") for c in t.calls)


def test_crash_emits_trace_error(tmp_path):
    """A verb that blows up emits an AirbyteTraceMessage(ERROR) with a
    stack trace and exits 1 — the platform's structured crash report."""

    def bomb(method, url, params=None, headers=None, body=None):
        raise ConnectionError("socket exploded")

    buf = io.StringIO()
    # discover is offline (schema-driven) so use read-free check? check
    # catches its own errors into CONNECTION_STATUS — use a config error
    # instead: required key missing -> ValueError -> config_error TRACE
    m = tmp_path / "manifest.json"
    m.write_text(json.dumps(MANIFEST))
    c = tmp_path / "config.json"
    c.write_text(json.dumps({}))  # api_key missing
    rc = run(
        ["discover", "--manifest", str(m), "--config", str(c)],
        transport=bomb, out=buf,
    )
    assert rc == 1
    (msg,) = _lines(buf)
    assert msg["type"] == "TRACE" and msg["trace"]["type"] == "ERROR"
    assert msg["trace"]["error"]["failure_type"] == "config_error"
    assert "stack_trace" in msg["trace"]["error"]


def test_default_transport_sends_json_body():
    """default_transport serializes the body kwarg as a JSON POST with the
    right content type (checked against a local loopback server)."""
    import http.server
    import threading

    from airbyte_spark.entrypoint import default_transport

    seen = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen["body"] = json.loads(self.rfile.read(n))
            seen["ctype"] = self.headers.get("Content-Type")
            out = json.dumps({"ok": True}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        status, body = default_transport(
            "POST",
            f"http://127.0.0.1:{srv.server_port}/x",
            params={"q": 1},
            body={"query": "items", "after": "T1"},
        )
        assert status == 200 and body == {"ok": True}
        assert seen["body"] == {"query": "items", "after": "T1"}
        assert seen["ctype"] == "application/json"
    finally:
        srv.shutdown()
