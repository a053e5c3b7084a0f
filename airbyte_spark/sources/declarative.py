"""Declarative low-code source — a manifest interpreter over the HTTP
stream primitives.

Reference parity: the connector-builder CDK. A YAML/JSON manifest declares
streams (requester, authenticator, paginator, record selector, incremental
cursor, transformations, schema) and ``ManifestDeclarativeSource``
interprets it into a working connector implementing the four protocol
verbs spec/check/discover/read
(airbyte-cdk/python/airbyte_cdk/sources/declarative/
manifest_declarative_source.py:40-150 — validate manifest, build streams
via model_to_component_factory.py, delegate check/discover/read;
interpolation of ``{{ config[...] }}`` via declarative/interpolation/).

Spark-first split: the interpreter composes the SAME driver-side request
machinery the plain HTTP source uses (pagination loop, auth refresh, rate
budget, datetime slices — inherently sequential, identical in the
reference), and hands records to Spark at the earliest possible boundary:
each stream's records become ONE json-lines DataFrame and every declared
schema field is extracted by the vectorized ``schema_extract`` compiler
(one ``from_json`` pass + ``try_cast`` per column, per-column error
capture) — the reference walks records one at a time in Python for the
same steps. Transform chains compile to Catalyst expressions
(``plans/transforms.py``), so after ``createDataFrame`` there is zero
per-record Python.

Config interpolation: ``{{ config.KEY }}`` / ``{{ config['KEY'] }}``
placeholders anywhere in the manifest resolve from the connection config
(the reference uses full Jinja; this engine deliberately supports only
config lookups — the one pattern real manifests overwhelmingly use —
keeping evaluation pure and injection-free). A string that IS a single
placeholder resolves to the raw config value, preserving its type.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from airbyte_spark.lineage import log_metric
from airbyte_spark.plans.transforms import apply_transforms, schema_extract
from airbyte_spark.sources.auth import (
    BasicHttpAuth,
    OAuth2Auth,
    SessionTokenAuth,
    StaticTokenAuth,
    select_authenticator,
)
from airbyte_spark.sources.http import (
    CachingTransport,
    DatetimeSlicer,
    ErrorHandler,
    HttpStreamSource,
    Paginator,
)

Transport = Callable[..., tuple[int, Any]]

_PLACEHOLDER = re.compile(r"\{\{\s*config(?:\.(\w+)|\['(\w+)'\]|\[\"(\w+)\"\])\s*\}\}")


def interpolate(value: Any, config: dict[str, Any]) -> Any:
    """Resolve ``{{ config.* }}`` placeholders recursively. A string that
    is exactly one placeholder returns the config value itself (type
    preserved); embedded placeholders render into the string."""
    if isinstance(value, str):
        m = _PLACEHOLDER.fullmatch(value.strip())
        if m:
            return config[next(g for g in m.groups() if g)]
        return _PLACEHOLDER.sub(
            lambda m: str(config[next(g for g in m.groups() if g)]), value
        )
    if isinstance(value, dict):
        return {k: interpolate(v, config) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate(v, config) for v in value]
    return value


# ``{{ stream_partition.field }}`` — resolved per partition at request time
# (the reference accepts ``stream_slice`` as an alias for the same scope:
# declarative/interpolation/jinja.py ALIASES).
_PARTITION_PLACEHOLDER = re.compile(
    r"\{\{\s*(?:stream_partition|stream_slice)"
    r"(?:\.(\w+)|\['(\w+)'\]|\[\"(\w+)\"\])\s*\}\}"
)


def interpolate_partition(value: Any, partition: dict[str, Any]) -> Any:
    """Resolve ``{{ stream_partition.* }}`` placeholders against one
    partition dict — same contract as :func:`interpolate` (a string that is
    exactly one placeholder keeps the raw value's type)."""
    if isinstance(value, str):
        m = _PARTITION_PLACEHOLDER.fullmatch(value.strip())
        if m:
            return partition[next(g for g in m.groups() if g)]
        return _PARTITION_PLACEHOLDER.sub(
            lambda m: str(partition[next(g for g in m.groups() if g)]), value
        )
    if isinstance(value, dict):
        return {k: interpolate_partition(v, partition) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate_partition(v, partition) for v in value]
    return value


_DDL_JSON = {
    "string": {"type": "string"}, "varchar": {"type": "string"},
    "text": {"type": "string"}, "boolean": {"type": "boolean"},
    "tinyint": {"type": "integer"}, "smallint": {"type": "integer"},
    "int": {"type": "integer"}, "integer": {"type": "integer"},
    "bigint": {"type": "integer"}, "long": {"type": "integer"},
    "float": {"type": "number"}, "double": {"type": "number"},
    "date": {"type": "string", "format": "date"},
    "timestamp": {"type": "string", "format": "date-time"},
    "binary": {"type": "string", "contentEncoding": "base64"},
}


def _ddl_json_schema(ddl: str) -> dict:
    """DDL type string -> JSON-schema fragment (the §1.2 type table,
    reversed — same mapping as sources/discover.py, session-free)."""
    t = ddl.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return {"type": "array", "items": _ddl_json_schema(t[6:-1])}
    if t.startswith(("struct<", "map<")):
        return {"type": "object"}
    if t.startswith("decimal"):
        return {"type": "number"}
    return _DDL_JSON.get(t, {"type": "string", "description": f"unsupported ddl {ddl}"})


_PLAIN_NAME = re.compile(r"^[A-Za-z0-9_]+$")


def _ddl_of(value: Any) -> str | None:
    """DDL type of one JSON value; None for null (unknown)."""
    if value is None:
        return None
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "boolean"
    if isinstance(value, int):
        return "bigint"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "string"
    if isinstance(value, list):
        elem: str | None = None
        for v in value:
            elem = _join_ddl(elem, _ddl_of(v))
        return f"array<{elem or 'string'}>"
    if isinstance(value, dict):
        if not all(isinstance(k, str) and _PLAIN_NAME.match(k) for k in value):
            return "string"  # unrepresentable keys -> keep the JSON text
        fields = ",".join(
            f"{k}:{_ddl_of(v) or 'string'}" for k, v in sorted(value.items())
        )
        return f"struct<{fields}>" if fields else "string"
    return "string"


def _join_ddl(a: str | None, b: str | None) -> str | None:
    """Widening join of two inferred DDL types: null is absorbed, int and
    float widen to double, matching arrays/structs merge recursively, any
    other conflict degrades to string (the JSON text is always recoverable
    — the same degrade-don't-fail rule as the union-type fallback)."""
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a, b} == {"bigint", "double"}:
        return "double"
    if a.startswith("array<") and b.startswith("array<"):
        return f"array<{_join_ddl(a[6:-1], b[6:-1])}>"
    if a.startswith("struct<") and b.startswith("struct<"):
        fa = dict(f.split(":", 1) for f in _split_top(a[7:-1]) if f)
        fb = dict(f.split(":", 1) for f in _split_top(b[7:-1]) if f)
        merged = {k: _join_ddl(fa.get(k), fb.get(k)) for k in sorted(set(fa) | set(fb))}
        return "struct<" + ",".join(f"{k}:{t or 'string'}" for k, t in merged.items()) + ">"
    return "string"


def _split_top(s: str) -> list[str]:
    """Split a struct field list on top-level commas only (nested
    struct/array types carry their own commas)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def infer_schema(records: list[dict], max_records: int = 200) -> dict[str, str]:
    """Infer a ``{name: DDL}`` schema from a record sample — the
    connector-builder's SchemaInferrer re-expressed for the engine's typed
    extractor (airbyte-cdk/python/airbyte_cdk/utils/schema_inferrer.py
    accumulates a genson JSON schema per stream from observed records; here
    the accumulated shape feeds ``schema_extract`` directly, so inference
    and typing share one vocabulary). Only plain-identifier top-level keys
    are inferred (a dotted name means path traversal to the extractor);
    fields that were null in every sampled record default to string.

    Inference is PER READ: two syncs can observe different shapes and
    infer different schemas. Pipelines that union incremental reads (or
    feed a lake table) should pin a declared schema once discovered —
    ``discover_inferred`` exists exactly to promote an observed shape into
    the manifest; downstream, the engine's union-type fallback absorbs
    residual drift by degrading conflicted columns to string."""
    acc: dict[str, str | None] = {}
    for rec in records[:max_records]:
        for k, v in rec.items():
            if isinstance(k, str) and _PLAIN_NAME.match(k):
                acc[k] = _join_ddl(acc.get(k), _ddl_of(v))
    return {k: (t or "string") for k, t in acc.items()}


def _build_api_budget(spec: dict | None):
    """Source-level call-rate budget from the manifest (sources/call_rate.py;
    the reference declares ONE APIBudget per source shared by its streams).

    Grammar: ``{"type": "http"|"plain", "policies": [{"type":
    "moving_window"|"fixed_window"|"unlimited", "match": [{method/url/
    params/headers}...], ...}], ...header names...}``.
    """
    if not spec:
        return None
    from airbyte_spark.sources.call_rate import (
        APIBudget,
        FixedWindowPolicy,
        HttpAPIBudget,
        HttpRequestMatcher,
        MovingWindowPolicy,
        Rate,
        UnlimitedPolicy,
    )

    policies = []
    for p in spec.get("policies", []):
        matchers = [HttpRequestMatcher(**m) for m in p.get("match", [])]
        kind = p.get("type", "moving_window")
        if kind == "unlimited":
            policies.append(UnlimitedPolicy(matchers))
        elif kind == "fixed_window":
            policies.append(FixedWindowPolicy(
                period_s=p["period_s"], call_limit=p["call_limit"], matchers=matchers,
            ))
        elif kind == "moving_window":
            policies.append(MovingWindowPolicy(
                rates=[Rate(int(r["limit"]), float(r["interval_s"])) for r in p["rates"]],
                matchers=matchers,
            ))
        else:
            raise ValueError(f"unknown api_budget policy type {kind!r}")
    kw = {}
    for k in ("ratelimit_remaining_header", "ratelimit_reset_header"):
        if k in spec:
            kw[k] = spec[k]
    if spec.get("type", "http") == "http":
        return HttpAPIBudget(policies, **kw)
    return APIBudget(policies)



def _build_authenticator(
    spec: dict | None,
    transport: Transport,
    on_refresh_token_update: Callable[[str], None] | None = None,
    config: dict | None = None,
):
    if not spec:
        return None
    kind = spec.get("type", "token")
    if kind == "selective":
        # SelectiveAuthenticator (declarative/auth/selective_authenticator
        # .py:15-43): a config value picks which declared authenticator
        # this connection actually uses — each candidate builds lazily
        # through this same factory, so any kind (incl. session_token /
        # oauth2) can sit behind the dispatch
        built = {
            k: _build_authenticator(v, transport, on_refresh_token_update, config)
            for k, v in spec["authenticators"].items()
        }
        return select_authenticator(
            config or {}, built, tuple(spec["authenticator_selection_path"])
        )
    if kind == "session_token":
        return SessionTokenAuth(
            transport=transport,
            login_url=spec["login_url"],
            token_path=tuple(spec.get("token_path", ("session_token",))),
            login_method=spec.get("login_method", "POST"),
            login_body=spec.get("login_body"),
            login_headers=spec.get("login_headers"),
            expiration_duration_s=spec.get("expiration_duration_s"),
            auth_method=spec.get("auth_method", "Bearer"),
            header=spec.get("header", "Authorization"),
        )
    if kind == "token":
        return StaticTokenAuth(
            token=spec["token"], auth_method=spec.get("auth_method", "Bearer")
        )
    if kind == "basic":
        return BasicHttpAuth(
            username=spec["username"], password=spec.get("password", "")
        )
    if kind == "oauth2":
        return OAuth2Auth(
            transport=transport,
            token_url=spec["token_url"],
            client_id=spec["client_id"],
            client_secret=spec["client_secret"],
            refresh_token=spec["refresh_token"],
            scopes=spec.get("scopes"),
            on_refresh_token_update=on_refresh_token_update,
        )
    raise ValueError(f"unknown authenticator type {kind!r}")


@dataclass
class DeclarativeStream:
    """One manifest stream compiled to runnable form (the analog of the
    factory-built ``DeclarativeStream`` component tree)."""

    name: str
    url: str
    transport: Transport
    params: dict[str, Any] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    records_field: str | None = "data"
    paginator: Paginator = field(default_factory=Paginator)
    authenticator: Any = None
    primary_key: str | None = None
    incremental: dict | None = None  # {"type": "datetime"|"cursor", ...}
    transforms: list[dict] = field(default_factory=list)
    schema: dict[str, str] = field(default_factory=dict)  # name -> DDL type
    min_call_interval_s: float = 0.0
    prefetch_pages: int = 0
    api_budget: Any = None  # source-LEVEL budget, shared across streams
    sleep: Callable[[float], None] | None = None
    # {"type": "list", "values": [...], "partition_field": ...,
    #  "request_param": ...} or {"type": "substream", "parent_stream": ...,
    #  "parent_key": ..., "partition_field": ..., "request_param": ...}
    partition_router: dict | None = None
    parent: "DeclarativeStream | None" = None  # wired by ManifestSource
    error_handler: ErrorHandler | None = None  # response-filter policy
    http_method: str = "GET"
    body_json: dict[str, Any] = field(default_factory=dict)  # request body template
    infer_schema: bool = False  # no declared schema -> infer from records
    decoder: str = "json"  # "json" | "jsonl" (bulk-export text bodies)

    @property
    def cursor_field(self) -> str | None:
        return (self.incremental or {}).get("cursor_field")

    def _source(
        self,
        extra_params: dict | None = None,
        url: str | None = None,
        body_json: dict | None = None,
    ) -> HttpStreamSource:
        kwargs: dict[str, Any] = {}
        if self.sleep is not None:
            kwargs["sleep"] = self.sleep
        return HttpStreamSource(
            transport=self.transport,
            url=url or self.url,
            params={**self.params, **(extra_params or {})},
            headers=dict(self.headers),
            records_field=self.records_field,
            paginator=self.paginator,
            authenticator=self.authenticator,
            min_call_interval_s=self.min_call_interval_s,
            prefetch_pages=self.prefetch_pages,
            api_budget=self.api_budget,
            error_handler=self.error_handler,
            http_method=self.http_method,
            body_json=self.body_json if body_json is None else body_json,
            decoder=self.decoder,
            **kwargs,
        )

    def _slicer(self, inc: dict) -> DatetimeSlicer:
        kwargs = {
            k: inc[k]
            for k in ("start", "step_s", "end", "start_param", "end_param", "lookback_s")
            if k in inc
        }
        kwargs["start"] = float(kwargs["start"])
        kwargs["step_s"] = float(kwargs["step_s"])
        return DatetimeSlicer(**kwargs)

    def partitions(self) -> list[dict[str, Any]]:
        """Resolve the partition router into a list of partition dicts
        ({partition_field: value}), one request scope per entry.

        - ``list``: one partition per declared value
          (declarative/partition_routers/list_partition_router.py:15-37,77).
        - ``substream``: a full-refresh driver-side read of the parent
          stream, one partition per distinct ``parent_key`` value in
          declaration order
          (declarative/partition_routers/substream_partition_router.py:18-44).
        """
        pr = self.partition_router
        if not pr:
            return [{}]
        field_ = pr["partition_field"]
        if pr["type"] == "list":
            return [{field_: v} for v in pr["values"]]
        if pr["type"] == "substream":
            if self.parent is None:
                raise ValueError(
                    f"stream {self.name!r}: parent stream "
                    f"{pr.get('parent_stream')!r} not wired"
                )
            parent_records, _ = self.parent.read_records()
            key = pr["parent_key"]
            seen: dict[Any, None] = {}
            for rec in parent_records:
                if key in rec and rec[key] not in seen:
                    seen[rec[key]] = None
            return [{field_: v} for v in seen]
        raise ValueError(f"unknown partition_router type {pr['type']!r}")

    def _read_one(
        self, state: Any, max_pages: int | None, partition: dict[str, Any]
    ) -> tuple[list[dict], Any]:
        """One partition's read in the declared sync mode. The partition
        scope resolves ``{{ stream_partition.* }}`` in the url/params and,
        when ``request_param`` is declared, is injected as a request
        parameter (RequestOption(request_parameter) semantics,
        substream_partition_router.py:66,95-103)."""
        url = interpolate_partition(self.url, partition) if partition else None
        extra: dict[str, Any] = (
            {k: interpolate_partition(v, partition) for k, v in self.params.items()}
            if partition else {}
        )
        # body templates resolve {{ stream_partition.* }} too — the
        # RequestOption body_json target for partitioned POST APIs
        body = (
            interpolate_partition(self.body_json, partition)
            if (partition and self.body_json)
            else None
        )
        rp = (self.partition_router or {}).get("request_param")
        if rp and partition:
            extra[rp] = partition[self.partition_router["partition_field"]]
        inc = self.incremental
        if not inc:
            return (
                list(
                    self._source(extra_params=extra, url=url, body_json=body).read_records(
                        max_pages=max_pages
                    )
                ),
                None,
            )
        if inc["type"] == "datetime":
            records: list[dict] = []
            new_state = state
            for state_doc, recs in self._source(
                extra_params=extra, url=url, body_json=body
            ).read_datetime_sliced(
                self._slicer(inc), state=state, max_pages_per_slice=max_pages
            ):
                records.extend(recs)
                new_state = state_doc["slice_end_epoch"]
            return records, new_state
        if inc["type"] == "cursor":
            return self._source(extra_params=extra, url=url, body_json=body).read_incremental(
                cursor_field=inc["cursor_field"],
                state=state,
                cursor_param=inc.get("cursor_param", "since"),
                max_pages=max_pages,
            )
        raise ValueError(f"unknown incremental type {inc['type']!r}")

    def read_records(
        self, state: Any = None, max_pages: int | None = None
    ) -> tuple[list[dict], Any]:
        """Drive the API read in the declared sync mode. Returns
        ``(records, new_state)`` — state is a slice-end epoch (datetime
        mode), a max cursor value (cursor mode), or None (full refresh).

        With a partition router the read loops partitions; every record is
        tagged with the partition field (so the child table carries its FK
        even when the API response omits it) and state becomes a
        per-partition dict keyed by the JSON-serialized partition — the
        PerPartitionCursor contract
        (declarative/incremental/per_partition_cursor.py:97-185): each
        partition's cursor advances independently and a resumed sync
        re-reads only what each partition hasn't seen."""
        if not self.partition_router:
            return self._read_one(state, max_pages, {})
        field_ = self.partition_router["partition_field"]
        state = state if isinstance(state, dict) else {}
        records: list[dict] = []
        new_state: dict[str, Any] = dict(state)
        for part in self.partitions():
            pkey = json.dumps(part, sort_keys=True, default=str)
            recs, pstate = self._read_one(state.get(pkey), max_pages, part)
            for r in recs:
                r.setdefault(field_, part[field_])
            records.extend(recs)
            new_state[pkey] = pstate
        return records, new_state

    def records_to_df(self, spark: SparkSession, records: list[dict]) -> DataFrame:
        """The driver→Spark handoff: records become one json-lines column
        and the declared schema is compiled by ``schema_extract`` (single
        vectorized from_json + try_cast per field, per-column error
        capture) — the manifest's schema IS the T+D schema. Transform
        chains then compile to Catalyst expressions. No per-record Python
        past this point."""
        raw = spark.createDataFrame(
            [(json.dumps(r),) for r in records], "_ab_data string"
        )
        schema = self.schema
        if not schema and self.infer_schema and records:
            schema = infer_schema(records)
            log_metric(
                "declarative_schema_inferred", stream=self.name, fields=len(schema)
            )
        df = schema_extract(raw, "_ab_data", schema) if schema else raw
        return apply_transforms(df, self.transforms)

    def read_df(
        self, spark: SparkSession, state: Any = None, max_pages: int | None = None
    ) -> tuple[DataFrame, Any]:
        records, new_state = self.read_records(state=state, max_pages=max_pages)
        df = self.records_to_df(spark, records)
        log_metric(
            "declarative_stream_read",
            stream=self.name,
            records=len(records),
            state=new_state,
        )
        return df, new_state


def _stream_status(name: str, status: str, namespace: str | None = None) -> dict:
    """AirbyteStreamStatusTraceMessage (utils/stream_status_utils.py
    ``as_airbyte_message``): stream lifecycle signal the platform uses to
    distinguish 'no records' from 'never ran' and to fail fast per stream."""
    import time as _time

    desc: dict[str, Any] = {"name": name}
    if namespace is not None:
        desc["namespace"] = namespace
    return {
        "type": "TRACE",
        "trace": {
            "type": "STREAM_STATUS",
            "emitted_at": _time.time() * 1000.0,
            "stream_status": {
                "stream_descriptor": desc,
                "status": status,
            },
        },
    }

class ManifestSource:
    """The manifest-interpreted connector: spec / check / discover / read.

    Protocol message shapes follow airbyte-protocol.md (SPEC,
    CONNECTION_STATUS, CATALOG, RECORD, STATE) so the output of each verb
    is what a reference platform would consume off stdout. ``read`` is
    Spark-first: per stream it returns ONE typed DataFrame plus a state
    doc; ``read_messages`` additionally renders driver-side RECORD/STATE
    lines for protocol parity (explicitly NOT the data path — a 100 TB
    sync never serializes per-record JSON on the driver)."""

    def __init__(self, manifest: dict, transport: Transport):
        from airbyte_spark.sources.manifest_refs import resolve_references

        # catalog manifests factor shared config under `definitions:` and
        # pull it in via $ref / "#/..." — dereference once up front
        # (manifest_reference_resolver.py parity; no-op for plain manifests)
        self.manifest = resolve_references(manifest)
        self.transport = transport
        # AirbyteControlMessage(CONNECTOR_CONFIG) analog: rotated single-use
        # refresh tokens land here so the platform/caller can persist the
        # updated config (the reference emits these on stdout mid-sync —
        # airbyte-protocol.md control messages; abstract_oauth.py:169-249).
        self.control_messages: list[dict] = []

    # ------------------------------------------------------------ verbs

    def spec(self) -> dict:
        return {"type": "SPEC", "spec": self.manifest.get("spec", {})}

    def _validate_config(self, config: dict) -> None:
        spec = self.manifest.get("spec", {})
        missing = [k for k in spec.get("required", []) if k not in config]
        if missing:
            raise ValueError(f"config missing required keys: {missing}")

    def streams(self, config: dict) -> list[DeclarativeStream]:
        self._validate_config(config)
        # ONE budget per source, shared by every stream (reference contract)
        budget = _build_api_budget(
            interpolate(self.manifest.get("api_budget"), config)
        )
        out = []
        for raw in self.manifest["streams"]:
            s = interpolate(raw, config)
            # use_cache (HttpStream.use_cache analog): memoize this
            # stream's page responses for the sync, so every child
            # substream's partitions() re-read of a parent is served from
            # the memo — one live round-trip per parent page. The
            # authenticator keeps the RAW transport (login/token endpoints
            # must never cache).
            transport: Transport = (
                CachingTransport(self.transport) if s.get("use_cache")
                else self.transport
            )
            out.append(
                DeclarativeStream(
                    name=s["name"],
                    url=s["url"],
                    transport=transport,
                    params=s.get("params", {}),
                    headers=s.get("headers", {}),
                    records_field=s.get("records_field", "data"),
                    paginator=Paginator(**s.get("paginator", {})),
                    authenticator=_build_authenticator(
                        s.get("authenticator"),
                        self.transport,
                        on_refresh_token_update=self._on_token_rotated(s["name"]),
                        config=config,
                    ),
                    primary_key=s.get("primary_key"),
                    incremental=s.get("incremental"),
                    transforms=s.get("transforms", []),
                    schema=s.get("schema", {}),
                    min_call_interval_s=s.get("min_call_interval_s", 0.0),
                    api_budget=budget,
                    prefetch_pages=s.get("prefetch_pages", 0),
                    partition_router=s.get("partition_router"),
                    http_method=s.get("http_method", "GET"),
                    body_json=s.get("body", {}),
                    infer_schema=s.get("infer_schema", False),
                    decoder=s.get("decoder", "json"),
                    error_handler=(
                        ErrorHandler(
                            **{
                                k: tuple(v) if isinstance(v, list) else v
                                for k, v in s["error_handler"].items()
                            }
                        )
                        if s.get("error_handler")
                        else None
                    ),
                )
            )
        by_name = {st.name: st for st in out}
        for st in out:
            pr = st.partition_router or {}
            if pr.get("type") == "substream":
                parent_name = pr["parent_stream"]
                if parent_name not in by_name:
                    raise ValueError(
                        f"stream {st.name!r}: parent_stream {parent_name!r} "
                        "is not declared in the manifest"
                    )
                st.parent = by_name[parent_name]
        return out

    def _on_token_rotated(self, stream_name: str) -> Callable[[str], None]:
        def hook(new_refresh_token: str) -> None:
            self.control_messages.append(
                {
                    "type": "CONTROL",
                    "control": {
                        "type": "CONNECTOR_CONFIG",
                        "connectorConfig": {
                            "stream": stream_name,
                            "config": {
                                "authenticator": {"refresh_token": new_refresh_token}
                            },
                        },
                    },
                }
            )

        return hook

    def check(self, config: dict) -> dict:
        """Read one page of the designated check stream (the reference's
        ``check_connection`` reads the first stream's first record —
        declarative/checks/check_stream.py:24-54)."""
        try:
            name = self.manifest.get("check", {}).get(
                "stream", self.manifest["streams"][0]["name"]
            )
            stream = next(s for s in self.streams(config) if s.name == name)
            stream.read_records(max_pages=1)
            status = {"status": "SUCCEEDED"}
        except Exception as e:  # protocol: failures are a message, not a crash
            status = {"status": "FAILED", "message": f"{type(e).__name__}: {e}"}
        return {"type": "CONNECTION_STATUS", "connectionStatus": status}

    def discover(self, config: dict) -> dict:
        """Catalog from the declared schemas (the manifest's schema is
        authoritative — no network I/O and no JVM, mirroring
        schema-file-based discovery)."""
        from airbyte_spark.sources.discover import _SYNC_MODES

        entries = []
        for s in self.streams(config):
            entries.append({
                "name": s.name,
                "json_schema": {
                    "type": "object",
                    "properties": {
                        n: _ddl_json_schema(t) for n, t in s.schema.items()
                    },
                },
                "supported_sync_modes": _SYNC_MODES,
                "source_defined_cursor": s.cursor_field is not None,
                "default_cursor_field": [s.cursor_field] if s.cursor_field else [],
                "source_defined_primary_key": (
                    [[s.primary_key]] if s.primary_key else []
                ),
            })
        return {"type": "CATALOG", "catalog": {"streams": entries}}

    def discover_inferred(self, config: dict, max_pages: int = 1) -> dict:
        """Connector-builder discovery: read a page sample per stream and
        return a catalog whose schemas are INFERRED from the observed
        records (schema_inferrer.py accumulate-per-stream behavior).
        Declared schemas win; only schema-less streams are sampled."""
        base = self.discover(config)
        by_name = {e["name"]: e for e in base["catalog"]["streams"]}
        for s in self.streams(config):
            if s.schema or not s.infer_schema:
                continue
            records, _ = s.read_records(max_pages=max_pages)
            inferred = infer_schema(records)
            by_name[s.name]["json_schema"] = {
                "type": "object",
                "properties": {n: _ddl_json_schema(t) for n, t in inferred.items()},
            }
        return base

    def read(
        self,
        spark: SparkSession,
        config: dict,
        state: dict[str, Any] | None = None,
        streams: list[str] | None = None,
        max_pages: int | None = None,
    ) -> dict[str, tuple[DataFrame, Any]]:
        """Sync every (selected) stream: ``{name: (typed DataFrame, new
        state)}``. Per-stream state in one consolidated doc, exactly the
        catalog engine's shape."""
        state = state or {}
        out: dict[str, tuple[DataFrame, Any]] = {}
        for s in self.streams(config):
            if streams is not None and s.name not in streams:
                continue
            out[s.name] = s.read_df(spark, state=state.get(s.name), max_pages=max_pages)
        return out

    def read_messages(
        self,
        spark: SparkSession,
        config: dict,
        state: dict[str, Any] | None = None,
        streams: list[str] | None = None,
        max_pages: int | None = None,
    ) -> Iterator[dict]:
        """Protocol-parity rendering: per stream a STARTED stream-status
        TRACE, RECORD lines per row (RUNNING trace at the first record),
        one STATE with ``sourceStats.recordCount``, then COMPLETE — or
        INCOMPLETE on failure, before the error propagates (the reference's
        per-stream status lifecycle: utils/stream_status_utils.py
        ``as_airbyte_message``; abstract_source.py:124-145 STARTED/COMPLETE/
        INCOMPLETE, :207-209 RUNNING on first record). Driver-side by
        construction — for tests/interop, not the 100 TB path (that's
        ``read`` → DataFrames)."""
        state = state or {}
        for s in self.streams(config):
            if streams is not None and s.name not in streams:
                continue
            name = s.name
            yield _stream_status(name, "STARTED")
            try:
                df, new_state = s.read_df(
                    spark, state=state.get(name), max_pages=max_pages
                )
                n_records = 0
                for row in df.toJSON().toLocalIterator():
                    if n_records == 0:
                        yield _stream_status(name, "RUNNING")
                    n_records += 1
                    yield {
                        "type": "RECORD",
                        "record": {"stream": name, "data": json.loads(row)},
                    }
            except Exception:
                yield _stream_status(name, "INCOMPLETE")
                raise
            yield {
                "type": "STATE",
                "state": {
                    "type": "STREAM",
                    "stream": {
                        "stream_descriptor": {"name": name},
                        "stream_state": {"cursor": new_state},
                    },
                    # per-message record count (protocol sourceStats) — the
                    # platform reconciles source vs destination counts
                    "sourceStats": {"recordCount": float(n_records)},
                },
            }
            yield _stream_status(name, "COMPLETE")
        # rotated-credential CONNECTOR_CONFIG updates accumulated during the
        # read: the platform must persist these before the next sync
        while self.control_messages:
            yield self.control_messages.pop(0)
