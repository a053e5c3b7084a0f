"""HTTP API stream source — pagination, backoff, rate limiting.

Reference semantics: ``HttpStream`` drives a paginated API read — build
request, parse records out of the response, compute the next-page token,
stop when exhausted — with exponential backoff on retryable statuses and a
rate budget between calls (airbyte-cdk/python/airbyte_cdk/sources/streams/
http/http.py:34 class HttpStream; rate limiting call_rate.py:375
``APIBudget``; declarative pagination
declarative/requesters/paginators/).

Spark-first split: the pagination LOOP is inherently sequential driver-side
work (each page's token comes from the previous response — the reference is
identical), so only the *record batches* enter Spark: pages accumulate into
one ``createDataFrame`` per sync (or per N pages), and everything after
that is the engine's normal columnar path. The transport is injected (any
``callable(method, url, params, headers) -> (status, json_body)``), which
keeps the machinery fully testable offline and decouples it from a
specific HTTP client.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from airbyte_spark.lineage import log_metric

Transport = Callable[..., tuple[int, Any]]

RETRYABLE_STATUSES = {429, 500, 502, 503, 504}


@dataclass
class Paginator:
    """Next-page strategy (the declarative paginator collapsed to data).

    - kind="offset": request param ``param`` = running record offset.
    - kind="page":   request param ``param`` = page number (from 1).
    - kind="cursor": request param ``param`` = token found at
      ``token_field`` of the previous response body (stop when absent).
    """

    kind: str = "offset"
    param: str = "offset"
    page_size: int = 100
    size_param: str | None = "limit"
    token_field: str = "next_page_token"


@dataclass
class HttpStreamSource:
    transport: Transport
    url: str
    params: dict[str, Any] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    records_field: str | None = "data"  # None -> body IS the record list
    paginator: Paginator = field(default_factory=Paginator)
    max_retries: int = 5
    backoff_base_s: float = 0.1  # doubles per attempt (exponential)
    min_call_interval_s: float = 0.0  # APIBudget analog
    sleep: Callable[[float], None] = time.sleep  # injectable for tests

    def _call(self, params: dict[str, Any]) -> Any:
        """One request with exponential backoff on retryable statuses
        (HttpStream.should_retry/backoff_time semantics)."""
        attempt = 0
        while True:
            status, body = self.transport(
                "GET", self.url, params=params, headers=self.headers
            )
            if status < 400:
                return body
            if status in RETRYABLE_STATUSES and attempt < self.max_retries:
                delay = self.backoff_base_s * (2**attempt)
                log_metric(
                    "http_retry", url=self.url, status=status,
                    attempt=attempt + 1, backoff_s=round(delay, 3),
                )
                self.sleep(delay)
                attempt += 1
                continue
            raise RuntimeError(f"HTTP {status} from {self.url} after {attempt} retries")

    def _extract(self, body: Any) -> list[dict]:
        recs = body if self.records_field is None else body.get(self.records_field, [])
        if recs is None:
            return []
        return list(recs)

    def read_records(self, max_pages: int | None = None) -> Iterator[dict]:
        """The sequential pagination loop (HttpStream.read_records):
        request -> extract -> next_page_token -> repeat until exhausted."""
        pg = self.paginator
        offset = 0
        page_no = 1
        cursor_token: Any = None
        last_call = 0.0
        pages = 0
        while True:
            params = dict(self.params)
            if pg.size_param:
                params[pg.size_param] = pg.page_size
            if pg.kind == "offset":
                params[pg.param] = offset
            elif pg.kind == "page":
                params[pg.param] = page_no
            elif pg.kind == "cursor":
                if cursor_token is not None:
                    params[pg.param] = cursor_token
            else:
                raise ValueError(f"unknown paginator kind {pg.kind!r}")

            wait = self.min_call_interval_s - (time.monotonic() - last_call)
            if wait > 0:
                self.sleep(wait)  # rate budget (call_rate.py APIBudget)
            last_call = time.monotonic()

            body = self._call(params)
            recs = self._extract(body)
            yield from recs
            pages += 1
            offset += len(recs)
            page_no += 1
            cursor_token = (
                body.get(self.paginator.token_field)
                if isinstance(body, dict)
                else None
            )
            exhausted = (
                len(recs) < pg.page_size
                if pg.kind in ("offset", "page")
                else cursor_token is None
            )
            if exhausted or (max_pages is not None and pages >= max_pages):
                log_metric("http_stream_done", url=self.url, pages=pages)
                return

    def to_dataframe(
        self, spark: SparkSession, schema, max_pages: int | None = None
    ) -> DataFrame:
        """Materialize the paginated read as a typed DataFrame — the
        boundary where the sequential API loop hands off to the columnar
        engine (bootstrap seed or declarative-transform input)."""
        rows = list(self.read_records(max_pages=max_pages))
        return spark.createDataFrame(rows, schema)

    def read_incremental(
        self,
        cursor_field: str,
        state: Any = None,
        cursor_param: str = "since",
        max_pages: int | None = None,
    ) -> tuple[list[dict], Any]:
        """Incremental API read (HttpStream + IncrementalMixin semantics:
        streams/core.py:127-176 read_incremental; inclusive-cursor rule
        incremental-append-deduped.md:108-112): inject the checkpointed
        cursor as a request param, stream the pages, track the running max
        cursor. Returns (records, new_state). The INCLUSIVE >= comparison
        means boundary records can be re-delivered — downstream LWW dedup
        absorbs them, exactly like the reference."""
        params = dict(self.params)
        if state is not None:
            params[cursor_param] = state
        src = HttpStreamSource(
            transport=self.transport,
            url=self.url,
            params=params,
            headers=self.headers,
            records_field=self.records_field,
            paginator=self.paginator,
            max_retries=self.max_retries,
            backoff_base_s=self.backoff_base_s,
            min_call_interval_s=self.min_call_interval_s,
            sleep=self.sleep,
        )
        records = []
        new_state = state
        for rec in src.read_records(max_pages=max_pages):
            records.append(rec)
            cur = rec.get(cursor_field)
            if cur is not None and (new_state is None or cur > new_state):
                new_state = cur
        return records, new_state
