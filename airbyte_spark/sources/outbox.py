"""Outbox event router: CDC on an outbox table -> per-aggregate streams.

The transactional-outbox pattern (Debezium's outbox event router SMT,
public docs; the reference consumes its output like any other topic):
services never publish events directly — they INSERT an event row into an
``outbox`` table inside the same transaction as the state change, and CDC
on that table becomes the event bus. Each outbox row carries:

- ``aggregatetype`` — the routing key (one logical stream per value),
- ``aggregateid``  — the entity key (the routed stream's primary key),
- ``type``         — the event type within the aggregate,
- ``payload``      — the event body as a JSON string.

Spark-first mapping: the outbox table's changelog (any of this package's
decoders or a native changelog) filters to inserts (outbox rows are
immutable; Debezium's router drops updates/deletes and tombstones), routes
by ``aggregatetype`` with one predicate per declared route, and types each
route's payload through the vectorized ``schema_extract`` compiler — so a
route's output is a changelog-shaped DataFrame (op/pk/lsn/ts_ms + typed
payload + per-column error capture) that plugs straight into
``CdcEngine.replay`` / ``DemuxEngine``. Everything is narrow projections
over ONE scan per route; Catalyst pushes the route predicate into the scan.

Unrouted aggregate types are never silently dropped: ``route_outbox``
returns them under the ``UNROUTED`` key for quarantine/audit (same
discipline as ``split_malformed``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans.transforms import schema_extract

#: key under which route_outbox returns events whose aggregatetype matched
#: no declared route.
UNROUTED = "_unrouted"


def route_outbox(
    changelog: DataFrame,
    routes: dict[str, dict[str, str]],
    *,
    aggregate_type_col: str = "aggregatetype",
    aggregate_id_col: str = "aggregateid",
    event_type_col: str = "type",
    payload_col: str = "payload",
    errors_col: str = "_ab_errors",
) -> dict[str, DataFrame]:
    """Split an outbox changelog into typed per-aggregate changelogs.

    ``routes``: ``{aggregatetype: {payload_field: DDL type}}``. Each
    returned DataFrame carries ``op`` (always I), ``doc_id`` (the
    aggregate id — the routed stream's PK), ``lsn``, ``ts_ms``,
    ``source_partition``, ``event_type``, the typed payload columns, and
    ``errors_col``. The ``UNROUTED`` entry keeps the raw rows of any
    aggregatetype without a declared route.
    """
    inserts = changelog.filter(F.col("op") == "I")
    out: dict[str, DataFrame] = {}
    for agg_type, schema in routes.items():
        routed = inserts.filter(F.col(aggregate_type_col) == agg_type).select(
            F.lit("I").alias("op"),
            F.col(aggregate_id_col).cast("string").alias("doc_id"),
            F.col("lsn"),
            F.col("ts_ms"),
            *(
                [F.col("source_partition")]
                if "source_partition" in changelog.columns
                else [F.lit(0).alias("source_partition")]
            ),
            F.col(event_type_col).alias("event_type"),
            F.col(payload_col),
        )
        out[agg_type] = schema_extract(
            routed, payload_col, schema, errors_col=errors_col
        )
    out[UNROUTED] = inserts.filter(
        ~F.col(aggregate_type_col).isin(*routes.keys())
    )
    return out
