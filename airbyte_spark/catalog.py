"""Multi-stream catalog orchestration — the configured-catalog sync loop.

Reference semantics: ``AbstractSource.read`` loops the configured catalog's
streams sequentially, restoring each stream's state from the consolidated
state input and emitting updated per-stream states as it goes
(airbyte_cdk/python/airbyte_cdk/sources/abstract_source.py:89-157);
``ConnectorStateManager`` consolidates legacy/global/per-stream state
shapes into one document (connector_state_manager.py:25-46). A failure in
one stream does not invalidate the others' progress.

Spark-first: each stream is an independent ``CdcEngine`` (own lake table +
own durable checkpoint = the per-stream state), and the catalog engine
maintains the consolidated GLOBAL-state analog ``catalog_state.json`` —
shared info + every stream's state in ONE document — refreshed after each
stream sync. Resume is per-stream: a partially-synced catalog re-run skips
each stream's already-applied ranges independently (batch-id idempotence),
so interleaved/partial failures never cross-contaminate.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.lineage import log_metric


class CatalogEngine:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        streams: list[StreamConfig],
        cfg: EngineConfig | None = None,
    ):
        names = [s.name for s in streams]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate stream names in catalog: {names}")
        self.spark = spark
        self.root = root
        self.streams = list(streams)
        self.engines: dict[str, CdcEngine] = {
            s.name: CdcEngine(spark, os.path.join(root, "streams", s.name), s, cfg)
            for s in streams
        }
        self.state_path = os.path.join(root, "catalog_state.json")
        os.makedirs(root, exist_ok=True)

    def engine(self, name: str) -> CdcEngine:
        return self.engines[name]

    # ------------------------------------------------------------------ sync

    def create_tables(self) -> None:
        from airbyte_spark.lake.table import LakeTable

        for eng in self.engines.values():
            if not LakeTable.exists(eng.table_root):
                eng.create_table()

    def bootstrap(self, seeds: dict[str, DataFrame]) -> None:
        for name, seed in seeds.items():
            self.engines[name].bootstrap(seed)
        self._write_state()

    def sync(
        self,
        changelogs: dict[str, DataFrame | str],
        max_batches: int | None = None,
        concurrency: int = 1,
    ) -> dict[str, dict]:
        """Per-stream incremental sync. Default is the reference's
        sequential stream loop; ``concurrency > 1`` runs streams in a
        bounded thread pool — the stream-level analog of the reference's
        concurrent source (airbyte_cdk/python/airbyte_cdk/sources/
        concurrent_source/concurrent_source.py:74-146, a thread pool over
        per-stream partition readers). Spark schedules concurrent actions
        from multiple threads natively; each stream is an independent
        engine (own table, own checkpoint), so no state is shared beyond
        the consolidated doc, which is written under a lock.

        Returns per-stream replay stats; consolidated state is refreshed
        after EVERY stream completion so a crash mid-catalog leaves the
        finished streams' progress recorded. Failure isolation (both
        modes, matching the reference contract that one stream's failure
        never invalidates the others): every selected stream is attempted
        — including when a consolidated-state WRITE fails (the stream's
        own checkpoint is already durable; only the summary doc is stale).
        Failures land in the result as ``{"error": ...}`` and ONE
        RuntimeError naming the failed streams is raised at the end, with
        the successful streams' commits and state intact; the original
        exception objects are preserved on its ``stream_errors`` dict (and
        the first is its ``__cause__``) so callers can still dispatch on
        typed errors like ``OffsetLossError``/``CursorChangeError`` to run
        the documented resync/soft-reset recovery. Unknown stream names
        raise; streams without a changelog entry are skipped (unselected
        in the configured catalog)."""
        import threading

        unknown = set(changelogs) - set(self.engines)
        if unknown:
            raise KeyError(f"changelog for unconfigured stream(s): {sorted(unknown)}")
        selected = [s.name for s in self.streams if s.name in changelogs]
        results: dict[str, dict] = {}
        errors: dict[str, Exception] = {}
        lock = threading.Lock()
        t0 = time.monotonic()

        def _one(name: str) -> None:
            try:
                stats = self.engines[name].replay(
                    changelogs[name], max_batches=max_batches
                )
                with lock:
                    results[name] = stats
                    self._write_state()
            except Exception as e:  # isolate: other streams keep their progress
                with lock:
                    results[name] = {"error": f"{type(e).__name__}: {e}"}
                    errors[name] = e

        if concurrency <= 1:
            for name in selected:  # deterministic catalog order
                _one(name)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=concurrency) as pool:
                list(pool.map(_one, selected))
        log_metric(
            "catalog_sync_done",
            streams=len(results),
            failed=len(errors),
            wall_ms=int((time.monotonic() - t0) * 1000),
        )
        if errors:
            failed = sorted(errors)
            err = RuntimeError(
                f"catalog sync failed for stream(s) {failed}: "
                + "; ".join(f"{n}: {results[n]['error']}" for n in failed)
            )
            err.stream_errors = errors  # typed originals for caller dispatch
            raise err from errors[failed[0]]
        return results

    # ----------------------------------------------------------------- state

    def _write_state(self) -> None:
        """Consolidated GLOBAL-state doc: shared info + one entry per
        stream embedding that stream's full checkpoint (the
        AirbyteStateMessage GLOBAL shape — airbyte-protocol.md:491-511)."""
        from airbyte_spark.checkpoint import load_checkpoint

        stream_states = []
        for s in self.streams:
            ckpt = load_checkpoint(self.engines[s.name].checkpoint_path)
            stream_states.append(
                {
                    "stream_descriptor": {"name": s.name},
                    "stream_state": ckpt.to_json() if ckpt else None,
                }
            )
        doc = {
            "type": "GLOBAL",
            "global": {
                "shared_state": {
                    "max_committed_lsn": max(
                        (
                            st["stream_state"]["shared_state"]["max_committed_lsn"]
                            for st in stream_states
                            if st["stream_state"] is not None
                        ),
                        default=0,
                    )
                },
                "stream_states": stream_states,
            },
        }
        tmp = self.state_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1)
        os.replace(tmp, self.state_path)

    def state(self) -> dict | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as fh:
            return json.load(fh)
