"""File-history incremental cursor: sync N+1 reads only new/changed files.

Reference semantics: rosecape/airbyte
`airbyte-cdk/python/airbyte_cdk/sources/file_based/stream/cursor/
default_file_based_cursor.py` (history + cursor string + capped-history
time-window fallback) and `.../stream/default_file_based_stream.py`
(mtime-ordered read, per-slice state).
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from airbyte_spark.changelog import ChangelogConfig, changelog_df
from airbyte_spark.sources.files import FileHistoryCursor, FileSource, RemoteFile


def _write_batch(spark, src: FileSource, sub: str, lo: int, hi: int, mtime: float):
    """One 'dropped file' under the source path with a pinned mtime."""
    cfg = ChangelogConfig(n_events=hi - lo, n_seed_docs=50)
    df = changelog_df(spark, cfg).withColumn("lsn", F.col("lsn") + F.lit(lo))
    d = os.path.join(src.path, sub)
    df.coalesce(1).write.parquet(d)
    for root, _dirs, names in os.walk(d):
        for n in names:
            os.utime(os.path.join(root, n), (mtime, mtime))


@pytest.fixture()
def src(spark, workdir):
    path = os.path.join(workdir, "drops")
    os.makedirs(path)
    return FileSource(spark, path, fmt="parquet")


def test_first_sync_reads_all_then_noop(spark, src):
    _write_batch(spark, src, "b1", 0, 200, 1_000_000.0)
    df, state = src.incremental(None)
    assert df.count() == 200
    assert state["_ab_source_file_last_modified"] is not None
    # no changes -> nothing to read, state unchanged
    df2, state2 = src.incremental(state)
    assert df2 is None
    assert state2["history"] == state["history"]


def test_new_files_picked_up_exactly_once(spark, src):
    _write_batch(spark, src, "b1", 0, 200, 1_000_000.0)
    _, state = src.incremental(None)
    _write_batch(spark, src, "b2", 200, 350, 1_000_100.0)
    df, state = src.incremental(state)
    assert df.count() == 150  # ONLY the new file
    assert df.agg(F.min("lsn")).first()[0] >= 200
    df3, _ = src.incremental(state)
    assert df3 is None  # and never again


def test_modified_file_resynced(spark, src):
    _write_batch(spark, src, "b1", 0, 100, 1_000_000.0)
    _, state = src.incremental(None)
    # touch the data file forward -> counts as modified, resynced
    for f in src.list_files():
        os.utime(f.uri, (1_000_500.0, 1_000_500.0))
    df, state = src.incremental(state)
    assert df is not None and df.count() == 100
    # touch BACKWARD -> clock anomaly, skipped (reference behavior)
    for f in src.list_files():
        os.utime(f.uri, (900_000.0, 900_000.0))
    df2, _ = src.incremental(state)
    assert df2 is None


def test_resume_mid_listing_no_loss_no_dup(spark, src):
    for i in range(6):
        _write_batch(spark, src, f"b{i}", i * 100, (i + 1) * 100, 1_000_000.0 + i)
    # sync in slices of 2 files; "crash" after committing slice 1
    it = src.incremental_slices(None, files_per_slice=2)
    seen = []
    df, files, committed_state = next(it)
    seen += [r["lsn"] for r in df.select("lsn").collect()]
    del it  # crash: slices 2..3 never ran
    # resume from the committed state: remaining files come exactly once
    for df, files, st in src.incremental_slices(committed_state, files_per_slice=2):
        seen += [r["lsn"] for r in df.select("lsn").collect()]
    assert sorted(seen) == list(range(1, 601))  # nothing lost, nothing doubled


def test_slice_states_are_monotonic(spark, src):
    for i in range(4):
        _write_batch(spark, src, f"b{i}", i * 10, (i + 1) * 10, 1_000_000.0 + i)
    hist_sizes = [len(st["history"]) for _, _, st in src.incremental_slices(None, files_per_slice=1)]
    assert hist_sizes == [1, 2, 3, 4]


# -- pure cursor-state laws (no Spark) ----------------------------------


def _rf(uri: str, ts: str) -> RemoteFile:
    return RemoteFile(last_modified=ts, uri=uri)


def test_history_cap_evicts_earliest():
    cur = FileHistoryCursor(None, max_history=3)
    for i in range(5):
        cur.add_file(_rf(f"f{i}", f"2026-01-0{i + 1}T00:00:00.000000Z"))
    assert set(cur.history) == {"f2", "f3", "f4"}
    assert cur.get_state()["_ab_source_file_last_modified"].endswith("_f4")


def test_full_history_time_window_fallback():
    now = lambda: datetime(2026, 1, 10)  # noqa: E731
    state = {"history": {f"f{i}": f"2026-01-0{i + 5}T00:00:00.000000Z" for i in range(3)}}
    cur = FileHistoryCursor(state, max_history=3, days_window=2, now=now)
    listing = [
        _rf("old_outside_window", "2026-01-01T00:00:00.000000Z"),  # skipped
        _rf("old_inside_window", "2026-01-09T00:00:00.000000Z"),  # window floor 01-08
        _rf("newer_than_anchor", "2026-01-06T00:00:00.000000Z"),  # > earliest history
        _rf("f1", "2026-01-06T00:00:00.000000Z"),  # seen, unchanged
    ]
    got = {f.uri for f in cur.files_to_sync(listing)}
    assert got == {"old_inside_window", "newer_than_anchor"}


def test_partial_history_syncs_all_unseen():
    state = {"history": {"a": "2026-01-05T00:00:00.000000Z"}}
    cur = FileHistoryCursor(state, max_history=100)
    listing = [_rf("ancient", "2020-01-01T00:00:00.000000Z"), _rf("a", "2026-01-05T00:00:00.000000Z")]
    assert [f.uri for f in cur.files_to_sync(listing)] == ["ancient"]
