"""Custom stateful streaming operator: per-partition cursor tracking.

The reference's concurrent source keeps a per-partition cursor object that
*observes* every record and emits/closes state as slices complete
(airbyte_cdk/python/airbyte_cdk/sources/streams/concurrent/cursor.py:62-89;
the Debezium offset store is the Java analog,
AirbyteFileOffsetBackingStore.java:30-60). In Structured Streaming the same
semantics are an ``applyInPandasWithState`` operator: state keyed by
``source_partition``, updated per micro-batch from the Arrow batches, one
observed-state row emitted per key per trigger.

This is the "custom stateful operator" escape hatch (SURVEY.md §2.9) for
semantics the built-in windowed aggregations can't express — here a
monotone high-water-mark with event counters and monotonicity violation
detection (events arriving with lsn <= already-checkpointed high water are
at-least-once re-deliveries; they are counted, not reapplied — the
'Inclusive Cursors' rule of incremental-append-deduped.md:108-112).

State shape per key: (last_lsn, events_seen, dup_redeliveries).
Output per key per trigger: the updated state + batch delta.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_lsn bigint, events_seen bigint, dup_redeliveries bigint"
OUTPUT_SCHEMA = (
    "source_partition int, last_lsn bigint, events_seen bigint, "
    "dup_redeliveries bigint, batch_events bigint"
)


def _track(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        last_lsn, events_seen, dups = state.get
    else:
        last_lsn, events_seen, dups = 0, 0, 0
    batch_events = 0
    for pdf in pdfs:
        lsns = pdf["lsn"].to_numpy()
        batch_events += len(lsns)
        dups += int((lsns <= last_lsn).sum()) if last_lsn else 0
        if len(lsns):
            last_lsn = max(last_lsn, int(lsns.max()))
        events_seen += len(lsns)
    state.update((last_lsn, events_seen, dups))
    yield pd.DataFrame(
        {
            "source_partition": [int(key[0])],
            "last_lsn": [last_lsn],
            "events_seen": [events_seen],
            "dup_redeliveries": [dups],
            "batch_events": [batch_events],
        }
    )


def partition_cursor_tracker(changelog_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-source-partition cursor state, one row per
    partition per micro-batch. Works on any stream with
    (source_partition, lsn) columns."""
    return changelog_stream.groupBy("source_partition").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
