"""Protocol entrypoint: ``spec | check | discover | read`` over JSONL.

Reference parity: ``AirbyteEntrypoint`` parses the verb + ``--config /
--catalog / --state`` file args, dispatches to the source, and serializes
AirbyteMessages as JSON lines on stdout — the process boundary the
platform consumes (airbyte_cdk/python/airbyte_cdk/entrypoint.py:49-83;
message shapes airbyte-protocol.md:337-420).

Spark-first: ``read`` still *executes* columnar (ManifestSource.read
builds typed DataFrames; per-record JSON rendering happens only at this
process boundary, exactly like the reference's stdout hop — and unlike
the reference it is optional: library callers take the DataFrames and
never pay it). The HTTP transport is injectable; the default uses
urllib from the standard library.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Callable, TextIO

Transport = Callable[..., tuple[int, Any]]


def default_transport(method: str, url: str, params=None, headers=None, body=None):
    """Minimal stdlib HTTP transport: GET with query params, POST with a
    JSON body (``body=`` kwarg, the RequestOption body_json target) or a
    form body (params), JSON responses. Returns (status, parsed_body).
    HTTP errors return their status (the source's backoff/auth logic
    decides)."""
    import urllib.error
    import urllib.parse
    import urllib.request

    params = params or {}
    headers = dict(headers or {})
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        headers.setdefault("Content-Type", "application/json")
        if params:
            url = f"{url}?{urllib.parse.urlencode(params)}"
    elif method.upper() == "POST":
        data = urllib.parse.urlencode(params).encode()
    elif params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, data=data, headers=headers, method=method.upper())
    try:
        with urllib.request.urlopen(req) as resp:  # noqa: S310 (caller-supplied URL is the point)
            body = resp.read()
            status = resp.status
    except urllib.error.HTTPError as e:
        return e.code, None
    try:
        return status, json.loads(body) if body else None
    except ValueError:
        return status, None


def _load(path: str | None) -> Any:
    if path is None:
        return None
    with open(path) as fh:
        return json.load(fh)


def _emit(out: TextIO, msg: dict) -> None:
    out.write(json.dumps(msg, separators=(",", ":"), default=str) + "\n")


def run(
    argv: list[str],
    spark=None,
    transport: Transport | None = None,
    out: TextIO = sys.stdout,
) -> int:
    """Execute one protocol verb. Returns a process exit code (0 unless the
    verb itself could not run; a FAILED check is still exit 0 with a
    CONNECTION_STATUS message, matching the reference)."""
    from airbyte_spark.sources.declarative import ManifestSource

    p = argparse.ArgumentParser(prog="airbyte-spark")
    p.add_argument("verb", choices=["spec", "check", "discover", "read"])
    p.add_argument("--manifest", required=True, help="manifest JSON path")
    p.add_argument("--config", help="connection config JSON path")
    p.add_argument("--catalog", help="configured catalog JSON path")
    p.add_argument("--state", help="consolidated state JSON path")
    a = p.parse_args(argv)

    src = ManifestSource(_load(a.manifest), transport or default_transport)
    try:
        if a.verb == "spec":
            _emit(out, src.spec())
            return 0
        config = _load(a.config) or {}
        if a.verb == "check":
            _emit(out, src.check(config))
            return 0
        if a.verb == "discover":
            _emit(out, src.discover(config))
            return 0

        # read: configured catalog selects streams (absent -> all declared)
        catalog = _load(a.catalog)
        streams = None
        if catalog is not None:
            streams = [
                (s.get("stream") or {}).get("name") or s.get("name")
                for s in catalog.get("streams", [])
            ]
        state = _load(a.state) or {}
        if spark is None:
            from airbyte_spark.session import get_spark

            spark = get_spark()
        for msg in src.read_messages(spark, config, state=state, streams=streams):
            _emit(out, msg)
        return 0
    except Exception as e:  # emit the failure as a TRACE before exiting
        # AirbyteTraceMessage(ERROR) — the platform's structured crash
        # report (airbyte-protocol.md trace messages; entrypoint.py:49-83
        # wraps verbs the same way). Config-shaped errors (bad/missing
        # config keys) are "config_error", everything else "system_error".
        import time
        import traceback

        failure = (
            "config_error" if isinstance(e, (KeyError, ValueError)) else "system_error"
        )
        _emit(
            out,
            {
                "type": "TRACE",
                "trace": {
                    "type": "ERROR",
                    "emitted_at": int(time.time() * 1000),
                    "error": {
                        "message": f"{type(e).__name__}: {e}",
                        "stack_trace": traceback.format_exc(),
                        "failure_type": failure,
                    },
                },
            },
        )
        return 1


def main() -> None:  # pragma: no cover - thin shell
    raise SystemExit(run(sys.argv[1:]))


if __name__ == "__main__":  # pragma: no cover
    main()
