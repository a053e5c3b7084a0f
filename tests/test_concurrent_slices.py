"""Concurrent slice execution (sources/concurrent.py): interval merge math,
out-of-order completion, kill/resume reading only gaps, low-water mark."""

from __future__ import annotations

import threading
import time

import pytest

from airbyte_spark.sources.concurrent import IntervalTracker, read_slices_concurrent
from airbyte_spark.sources.http import DatetimeSlicer


# ---------------------------------------------------------------- tracker


def test_interval_merge_adjacent_overlap_disjoint():
    t = IntervalTracker()
    t.add(0, 10)
    t.add(20, 30)
    assert t.intervals == [(0, 10), (20, 30)]
    t.add(10, 15)  # adjacent merges
    assert t.intervals == [(0, 15), (20, 30)]
    t.add(12, 22)  # overlap bridges the gap
    assert t.intervals == [(0, 30)]
    with pytest.raises(ValueError):
        t.add(5, 5)


def test_gaps_and_low_water():
    t = IntervalTracker()
    t.add(10, 20)
    t.add(30, 40)
    assert t.gaps(0, 50) == [(0, 10), (20, 30), (40, 50)]
    assert t.gaps(12, 18) == []
    assert t.gaps(15, 35) == [(20, 30)]
    assert t.low_water_mark(0) == 0       # prefix open
    assert t.low_water_mark(10) == 20     # inside first interval
    t.add(0, 10)
    assert t.low_water_mark(0) == 20


def test_state_doc_roundtrip():
    t = IntervalTracker()
    t.add(0, 10)
    t.add(20, 30)
    t2 = IntervalTracker.from_doc(t.to_doc())
    assert t2.intervals == t.intervals
    assert IntervalTracker.from_doc(None).intervals == []


# ------------------------------------------------------------- concurrent


def _slicer(n=6, step=10):
    return DatetimeSlicer(start=0, step_s=step, end=n * step)


def _reader(delays=None, log=None):
    """read_slice stub: records tagged by slice start; optional per-slice
    delay map forces out-of-order completion; optional log records
    completion order."""

    def read(s, e):
        if delays:
            time.sleep(delays.get(s, 0))
        if log is not None:
            log.append(s)
        return [{"id": f"{int(s)}:{i}", "slice": int(s)} for i in range(3)]

    return read


def test_all_slices_read_once_out_of_order():
    log: list = []
    # earlier slices sleep longer -> later slices finish first
    delays = {0: 0.3, 10: 0.25, 20: 0.2, 30: 0.0, 40: 0.0, 50: 0.0}
    out = list(read_slices_concurrent(_reader(delays, log), _slicer(), max_workers=6))
    assert len(out) == 6
    assert log != sorted(log)  # genuinely completed out of order
    ids = [r["id"] for _, recs in out for r in recs]
    assert len(ids) == len(set(ids)) == 18
    # final state covers the whole range as ONE merged interval
    final = IntervalTracker.from_doc(out[-1][0])
    assert final.intervals == [(0.0, 60.0)]


def test_kill_resume_reads_only_gaps():
    delays = {0: 0.2, 10: 0.0, 20: 0.2, 30: 0.0, 40: 0.2, 50: 0.0}
    gen = read_slices_concurrent(_reader(delays), _slicer(), max_workers=6)
    seen = []
    state = None
    for state, recs in gen:
        seen.extend(r["id"] for r in recs)
        if len(seen) >= 9:  # "crash" after 3 slices committed
            gen.close()
            break
    crashed = IntervalTracker.from_doc(state)
    assert crashed.gaps(0, 60)  # the early break left uncovered windows
    # per-WINDOW holes (what resume actually re-reads): a merged hole
    # spanning k windows resumes as k slices, so compare per-window
    holes = [
        g for s in range(0, 60, 10) for g in crashed.gaps(s, s + 10)
    ]

    resumed_slices: list = []
    for state, recs in read_slices_concurrent(
        _reader(log=resumed_slices), _slicer(), state=state, max_workers=2
    ):
        seen.extend(r["id"] for r in recs)
    # resume read EXACTLY the gap windows — no re-read, no loss, no dup
    assert sorted(seen) == sorted(f"{s}:{i}" for s in range(0, 60, 10) for i in range(3))
    assert sorted((int(s) for s in resumed_slices)) == sorted(int(a) for a, b in holes)
    assert IntervalTracker.from_doc(state).intervals == [(0.0, 60.0)]


def test_failed_slice_not_checkpointed():
    def read(s, e):
        if s == 20:
            raise RuntimeError("boom")
        return [{"id": s}]

    state = None
    with pytest.raises(RuntimeError):
        for state, _ in read_slices_concurrent(read, _slicer(n=4), max_workers=1):
            pass
    # failure is deferred until in-flight siblings drain: 0,10,30 committed;
    # exactly the failed slice is the gap, regardless of completion order
    t = IntervalTracker.from_doc(state)
    assert t.gaps(0, 40) == [(20.0, 30.0)]
    assert not t.covers(20, 30)


def test_partial_window_gap_subslices():
    """State covering part of a window: only the uncovered sub-range reads."""
    t = IntervalTracker()
    t.add(0, 15)  # half of window [10,20)
    read_log: list = []

    def read(s, e):
        read_log.append((s, e))
        return []

    list(read_slices_concurrent(read, _slicer(n=3), state=t.to_doc(), max_workers=1))
    assert sorted(read_log) == [(15.0, 20.0), (20.0, 30.0)]


def test_fail_fast_cancels_queued_and_resume_completes():
    """fail_fast=True: the first failure cancels not-yet-started slices
    (ordinary gaps), and a resume with a healthy reader still lands on
    exactly-once coverage of the whole range."""
    def read(s, e):
        if s == 10:
            raise RuntimeError("boom")
        return [{"id": s}]

    state = None
    seen: list = []
    with pytest.raises(RuntimeError, match="boom"):
        for state, recs in read_slices_concurrent(
            read, _slicer(n=6), max_workers=2, fail_fast=True
        ):
            seen.extend(r["id"] for r in recs)
    for state, recs in read_slices_concurrent(
        lambda s, e: [{"id": s}], _slicer(n=6), state=state, max_workers=2
    ):
        seen.extend(r["id"] for r in recs)
    assert sorted(seen) == [0, 10, 20, 30, 40, 50]  # each exactly once
    assert IntervalTracker.from_doc(state).intervals == [(0.0, 60.0)]
