"""Structured Streaming surface of the engine.

The reference treats CDC as *bounded* replay (CdcTargetPosition.java:17-30),
which the batch engine mirrors; this package is the unbounded-tail variant:
``readStream`` over the changelog + ``foreachBatch`` into the same
validate -> LWW-dedup -> merge path (SURVEY.md §2.9).
"""

from airbyte_spark.streaming.replay import (
    stream_replay,
    stream_replay_continuous,
    stream_replay_df,
    streaming_dedup,
)
from airbyte_spark.streaming.stateful import partition_cursor_tracker

__all__ = [
    "stream_replay",
    "stream_replay_df",
    "stream_replay_continuous",
    "streaming_dedup",
    "partition_cursor_tracker",
]
