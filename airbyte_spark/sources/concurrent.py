"""Concurrent slice execution with interval-merged checkpoint state — the
reference's concurrent CDK re-expressed over this repo's HTTP slicers.

Reference semantics (airbyte-cdk/python/airbyte_cdk/sources/streams/
concurrent/cursor.py ``ConcurrentCursor`` + concurrent_source/
concurrent_source.py): slices are read by a worker pool and complete OUT OF
ORDER, so per-slice "last end" state is wrong — the cursor instead tracks
the MERGED INTERVALS of completed slices, checkpoints that interval list,
and on resume re-reads only the gaps. The low-water mark (end of the
interval containing the range start) is what a simple scalar-cursor
consumer may safely read up to.

Spark-first note: the DATA path is unchanged — every slice's records land
via the same one-DataFrame handoff as sequential reads; concurrency here is
I/O parallelism on the API client side (the reference's thread pool), not
record processing. The engine's LWW dedup downstream absorbs any lookback
re-delivery exactly as in the sequential path.
"""

from __future__ import annotations

from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from airbyte_spark.lineage import log_metric


@dataclass
class IntervalTracker:
    """Sorted, merged list of completed [start, end) intervals.

    The state-doc shape mirrors ConcurrentCursor's serialized
    ``slices: [{start, end}]`` list; ``low_water_mark(range_start)`` is the
    contiguous-prefix end (the scalar a non-interval-aware consumer may
    trust)."""

    intervals: list[tuple[float, float]] = field(default_factory=list)

    def add(self, start: float, end: float) -> None:
        if end <= start:
            raise ValueError(f"empty interval [{start}, {end})")
        merged: list[tuple[float, float]] = []
        s, e = start, end
        for a, b in sorted(self.intervals):
            if b < s or a > e:          # disjoint (strict: adjacent merges)
                merged.append((a, b))
            else:
                s, e = min(s, a), max(e, b)
        merged.append((s, e))
        self.intervals = sorted(merged)

    def covers(self, start: float, end: float) -> bool:
        return any(a <= start and end <= b for a, b in self.intervals)

    def gaps(self, lo: float, hi: float) -> list[tuple[float, float]]:
        """Sub-ranges of [lo, hi) not covered by any completed interval."""
        out = []
        t = lo
        for a, b in self.intervals:
            if b <= t or a >= hi:
                continue
            if a > t:
                out.append((t, min(a, hi)))
            t = max(t, b)
            if t >= hi:
                break
        if t < hi:
            out.append((t, hi))
        return out

    def low_water_mark(self, range_start: float) -> float:
        """End of the merged interval containing ``range_start`` (what a
        scalar cursor may safely advance to); ``range_start`` when the
        prefix is still open."""
        for a, b in self.intervals:
            if a <= range_start < b:
                return b
        return range_start

    # ------------------------------------------------------------- state
    def to_doc(self) -> dict[str, Any]:
        return {"slices": [{"start": a, "end": b} for a, b in self.intervals]}

    @classmethod
    def from_doc(cls, doc: dict[str, Any] | None) -> "IntervalTracker":
        t = cls()
        for s in (doc or {}).get("slices", []):
            t.add(float(s["start"]), float(s["end"]))
        return t


def read_slices_concurrent(
    read_slice: Callable[[float, float], list[dict]],
    slicer,
    state: dict[str, Any] | None = None,
    max_workers: int = 4,
    fail_fast: bool = False,
) -> Iterator[tuple[dict[str, Any], list[dict]]]:
    """Read a slicer's windows with a worker pool, yielding
    ``(state_doc, records)`` as each slice COMPLETES (out of order). The
    caller commits the records, then checkpoints the state doc — the doc's
    interval list already includes the just-finished slice, so a sync
    killed between yields resumes reading ONLY the windows with no
    completed interval (gaps), never re-reading finished ones and never
    skipping holes left by out-of-order completion.

    ``read_slice(start, end)`` performs one slice's full paginated read
    (e.g. a closure over ``HttpStreamSource.read_records`` with the bounds
    injected — transports/rate budgets in this repo are thread-safe).
    ``slicer`` supplies ``slices(state=None)`` and the range start
    (``slicer.start``); lookback is intentionally NOT applied per-slice
    here — interval state re-reads exact gaps, and late-data re-delivery
    stays the job of the committed low-water mark a caller passes to its
    next SEQUENTIAL sync, matching the reference's split of duties.

    Failure policy: a failed slice's interval is never added (resume
    re-reads exactly it), and by default every other submitted slice still
    runs to completion and commits before the FIRST failure is raised —
    maximal checkpoint coverage when one slice is poisoned. For systemic
    failures (credentials revoked: every slice will fail) that drains the
    whole window pointlessly; ``fail_fast=True`` instead cancels the
    not-yet-started slices after the first failure, draining only the
    in-flight ones (cancelled slices are ordinary gaps — the next sync
    re-reads them). Interpreter-control exceptions (KeyboardInterrupt,
    SystemExit) always cancel and propagate immediately.
    """
    tracker = IntervalTracker.from_doc(state)
    windows: list[tuple[float, float]] = []
    for s, e in slicer.slices(state=None):
        windows.extend(tracker.gaps(s, e))
    if not windows:
        return
    failure: Exception | None = None
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {pool.submit(read_slice, s, e): (s, e) for s, e in windows}
        pending = set(futures)
        while pending:
            done, pending = wait(pending, return_when=FIRST_COMPLETED)
            # slice order, not set order: which completions share a wait()
            # batch is scheduler timing — processing must not depend on it
            for fut in sorted(done, key=lambda f: futures[f]):
                s, e = futures[fut]
                if fut.cancelled():
                    continue  # fail_fast cancellation: an ordinary gap
                try:
                    records = fut.result()
                except Exception as exc:
                    # a failed slice's interval is NOT added (resume re-reads
                    # exactly it); see the failure policy in the docstring
                    if failure is None:
                        failure = exc
                        if fail_fast:
                            for p in pending:
                                p.cancel()  # queued only; running ones drain
                    log_metric(
                        "concurrent_slice_failed",
                        slice_start=s,
                        slice_end=e,
                        error=str(exc),
                    )
                    continue
                except BaseException:
                    # KeyboardInterrupt/SystemExit in a worker: stop now
                    for p in pending:
                        p.cancel()
                    raise
                tracker.add(s, e)
                log_metric(
                    "concurrent_slice_done",
                    slice_start=s,
                    slice_end=e,
                    records=len(records),
                    low_water_mark=tracker.low_water_mark(slicer.start),
                )
                yield tracker.to_doc(), records
    if failure is not None:
        raise failure
