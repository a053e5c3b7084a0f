"""Checkpoint document — the GLOBAL state analog.

The reference's CDC state is a GLOBAL AirbyteStateMessage: one shared WAL
position + per-stream states (airbyte-protocol.md:491-511;
MySqlCdcStateHandler.java:38-63). Ours is a JSON document next to the table:
shared max-committed LSN + per-source-partition progress.

Invariants (DebeziumStateDecoratingIterator.java:63-79):
- never checkpoint an offset that is not yet durably committed — we write
  the checkpoint strictly AFTER the lake commit it describes;
- a lost checkpoint is harmless: batch ids stamped into snapshot summaries
  let replay skip already-applied ranges (LakeTable.find_batch).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field


@dataclass
class Checkpoint:
    max_committed_lsn: int = 0
    target_lsn: int | None = None
    table_schema_version: int = 1
    # cursor the replay progress was tracked under; a configured-cursor
    # change invalidates incremental state (the reference soft-resets on
    # cursor change — BaseTypingDedupingTest "testCursorChange")
    cursor_field: str | None = None
    # source_partition -> {"last_lsn": int, "rows_applied": int}
    per_partition: dict[str, dict] = field(default_factory=dict)
    batches: list[str] = field(default_factory=list)

    # The batches list is a FAST-PATH window, not the durable idempotence
    # record (that is the batch_id stamped in each snapshot summary,
    # consulted via LakeTable.find_batch). Keeping every id forever makes
    # the checkpoint doc the largest state artifact on a long tail and its
    # rewrite O(n^2) cumulative; ids behind max_committed_lsn are redundant.
    BATCH_WINDOW = 64  # class constant (unannotated: not a dataclass field)

    def note_batch(self, batch_id: str) -> None:
        """Record a committed batch id, keeping only a recent window."""
        if batch_id not in self.batches:
            self.batches.append(batch_id)
        if len(self.batches) > self.BATCH_WINDOW:
            del self.batches[: len(self.batches) - self.BATCH_WINDOW]

    def to_json(self) -> dict:
        return {
            "shared_state": {
                "max_committed_lsn": self.max_committed_lsn,
                "target_lsn": self.target_lsn,
                "table_schema_version": self.table_schema_version,
                "cursor_field": self.cursor_field,
            },
            "per_partition": [
                {"source_partition": int(p), **v}
                for p, v in sorted(self.per_partition.items(), key=lambda kv: int(kv[0]))
            ],
            "batches": self.batches,
        }

    @staticmethod
    def from_json(d: dict) -> "Checkpoint":
        shared = d.get("shared_state", {})
        return Checkpoint(
            max_committed_lsn=shared.get("max_committed_lsn", 0),
            target_lsn=shared.get("target_lsn"),
            table_schema_version=shared.get("table_schema_version", 1),
            cursor_field=shared.get("cursor_field"),
            per_partition={
                str(e["source_partition"]): {
                    k: v for k, v in e.items() if k != "source_partition"
                }
                for e in d.get("per_partition", [])
            },
            batches=list(d.get("batches", [])),
        )


def load_checkpoint(path: str) -> Checkpoint | None:
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return Checkpoint.from_json(json.load(fh))


def save_checkpoint(path: str, ckpt: Checkpoint) -> None:
    """Atomic replace — readers never observe a torn checkpoint."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(ckpt.to_json(), fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
