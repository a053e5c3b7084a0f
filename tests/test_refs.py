"""Table refs: named tags (retention-protected snapshots) and rollback —
reproducible training-run pins and the recover-from-bad-commits path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from airbyte_spark.lake.table import CommitConflict, LakeTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("v", IntegerType(), True),
        StructField("_ab_lsn", LongType(), False),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(spark, workdir):
    return LakeTable.create(
        spark, os.path.join(workdir, "t"), SCHEMA, primary_key="doc_id",
        num_buckets=4, cursor_col="_ab_lsn",
    )


def _commit(spark, table, rows, batch_id=None):
    summary = {"operation": "append"}
    if batch_id:
        summary["batch_id"] = batch_id
    return table.write_and_commit(_df(spark, rows), replace_buckets=None, summary=summary)


def _state(table, version=None, tag=None):
    df = table.read_tag(tag) if tag else table.scan(version=version)
    return sorted((r.doc_id, r.v) for r in df.collect())


def test_tag_create_read_drop(spark, table):
    _commit(spark, table, [("a", 1, 1)])
    v = table.create_tag("train-run-1")
    _commit(spark, table, [("b", 2, 2)])
    assert table.tags() == {"train-run-1": v}
    # tag reads the pinned state, not the head
    assert _state(table, tag="train-run-1") == [("a", 1)]
    assert _state(table) == [("a", 1), ("b", 2)]
    with pytest.raises(CommitConflict):
        table.create_tag("train-run-1")  # re-point requires drop first
    table.drop_tag("train-run-1")
    assert table.tags() == {}
    with pytest.raises(FileNotFoundError):
        table.read_tag("train-run-1")
    with pytest.raises(FileNotFoundError):
        table.drop_tag("train-run-1")
    with pytest.raises(ValueError):
        table.create_tag("bad name/here")
    with pytest.raises(FileNotFoundError):
        table.create_tag("ghost", version=999)


def test_tag_survives_expiration(spark, table):
    _commit(spark, table, [("a", 1, 1)])
    tagged_v = table.create_tag("pin")
    pinned = _state(table)
    for i in range(8):
        _commit(spark, table, [(f"d{i}", i, 10 + i)])
    stats = table.expire_snapshots(keep_last=2)
    assert stats["expired_snapshots"] > 0
    # the tagged snapshot and its files survive past the horizon
    assert tagged_v in table.existing_versions()
    assert _state(table, tag="pin") == pinned
    # untagged old versions are gone
    assert tagged_v + 1 not in table.existing_versions()
    # dropping the tag releases it for the next expiration
    table.drop_tag("pin")
    table.expire_snapshots(keep_last=2)
    assert tagged_v not in table.existing_versions()


def test_rollback_restores_state_and_frees_batches(spark, table):
    _commit(spark, table, [("a", 1, 1)], batch_id="b1")
    v_good = _commit(spark, table, [("b", 2, 2)], batch_id="b2")
    good = _state(table)
    _commit(spark, table, [("c", 3, 3)], batch_id="b3")
    _commit(spark, table, [("d", 4, 4)], batch_id="b4")
    assert table.find_batch("b3") is not None

    v_new = table.rollback_to(v_good)
    assert v_new == table.current_version()
    assert _state(table) == good
    # rolled-back batches are free to re-apply; earlier ones are not
    assert table.find_batch("b3") is None
    assert table.find_batch("b4") is None
    assert table.find_batch("b2") is not None
    # history preserved: the bad head is still time-travel readable
    assert _state(table, version=v_new - 1) == sorted(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)]
    )
    # a fresh loader sees the same head state
    t2 = LakeTable.load(spark, table.root)
    assert _state(t2) == good
    # life goes on: new commits apply on top of the rolled-back head
    _commit(spark, table, [("e", 5, 5)], batch_id="b5")
    assert _state(table) == sorted(good + [("e", 5)])


def test_rollback_noop_and_unknown(spark, table):
    _commit(spark, table, [("a", 1, 1)])
    cur = table.current_version()
    assert table.rollback_to(cur) == cur  # no-op, no new snapshot
    assert table.current_version() == cur
    with pytest.raises(FileNotFoundError):
        table.rollback_to(999)


def test_engine_rollback_then_replay_converges(spark, workdir):
    """Bad data committed 2 batches ago: engine rollback reverts the table
    AND rewinds the checkpoint, and the next replay re-applies the rolled
    range bit-identically to the uninterrupted run."""
    import os as _os

    from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine
    from tests.test_resume import _full_table_pdf

    cfg = ChangelogConfig(n_events=1000, n_seed_docs=150, dup_pct=5.0, corrupt_pct=2.0)
    clpath = _os.path.join(workdir, "changelog")
    seed = seed_df(spark, cfg)
    write_changelog(spark, cfg, clpath)

    def mk(root):
        return CdcEngine(
            spark, root, StreamConfig(num_buckets=8), EngineConfig(batch_events=250)
        )

    root = _os.path.join(workdir, "t")
    e = mk(root)
    e.create_table()
    e.bootstrap(seed)
    e.replay(clpath)  # 4 batches
    expected = _full_table_pdf(e)
    head = e.table.current_version()

    # roll back the last two batch commits
    target = head - 2
    new_head = e.rollback_to(target)
    assert new_head > head
    assert not _full_table_pdf(e).equals(expected)  # recent data gone

    # a FRESH engine (fresh checkpoint load) replays the rolled range
    e2 = mk(root)
    e2.replay(clpath)
    pd_final = _full_table_pdf(e2)
    assert pd_final.equals(expected)
    # and replaying again is a no-op (idempotent after recovery)
    v = e2.table.current_version()
    mk(root).replay(clpath)
    assert e2.table.current_version() == v
