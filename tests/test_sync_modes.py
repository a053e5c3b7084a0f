"""Destination sync modes (airbyte-protocol.md:404-428), offset-loss
detection and full resync (MySqlInitialReadUtil.java:105-114), soft reset
(DefaultTyperDeduper.java:160-165)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.changelog import (
    ChangelogConfig,
    apply_golden,
    changelog_df,
    seed_df,
    write_changelog,
)
from airbyte_spark.config import (
    SYNC_APPEND,
    SYNC_OVERWRITE,
    EngineConfig,
    StreamConfig,
)
from airbyte_spark.engine import CdcEngine, OffsetLossError
from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

CFG = ChangelogConfig(n_events=800, n_seed_docs=100, dup_pct=0.0)


def _mk(spark, workdir, name, sync_mode=None, batch_events=400):
    kw = {"num_buckets": 8}
    if sync_mode:
        kw["sync_mode"] = sync_mode
    eng = CdcEngine(
        spark,
        os.path.join(workdir, name),
        StreamConfig(**kw),
        EngineConfig(batch_events=batch_events),
    )
    eng.create_table()
    return eng


def test_append_mode_keeps_every_record(spark, workdir):
    """incremental|append: no dedup — one row per seed doc + one per event."""
    seed = seed_df(spark, CFG)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, CFG, clpath)
    eng = _mk(spark, workdir, "lake", SYNC_APPEND)
    eng.bootstrap(seed)
    eng.replay(clpath)
    raw = eng.read_raw()
    assert raw.count() == CFG.n_seed_docs + CFG.n_events
    # duplicates per PK are expected and retained
    assert raw.groupBy("doc_id").count().agg(F.max("count")).first()[0] > 1


def test_overwrite_mode_replaces_table(spark, workdir):
    """full_refresh|overwrite: each committed batch replaces the table, so
    the final state is exactly the LWW winners of the LAST batch."""
    seed = seed_df(spark, CFG)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, CFG, clpath)
    eng = _mk(spark, workdir, "lake", SYNC_OVERWRITE, batch_events=10_000)
    eng.bootstrap(seed)
    eng.replay(clpath)  # single batch -> table == winners of all events
    got = eng.read_raw().select("doc_id").distinct().count()
    events = changelog_df(spark, CFG)
    expect = events.select("doc_id").distinct().count()
    assert got == expect  # seed-only docs were overwritten away


def test_offset_loss_detected_and_resync_recovers(spark, workdir):
    seed = seed_df(spark, CFG)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, CFG, clpath)
    eng = _mk(spark, workdir, "lake")
    eng.bootstrap(seed)
    eng.replay(clpath)

    # simulate WAL truncation PAST a rewound checkpoint: keep only the tail
    events = spark.read.parquet(clpath)
    tail = events.filter(F.col("lsn") > 600)
    tailpath = os.path.join(workdir, "cl_tail")
    tail.write.parquet(tailpath)
    from airbyte_spark.checkpoint import Checkpoint, save_checkpoint

    save_checkpoint(eng.checkpoint_path, Checkpoint(max_committed_lsn=100))
    with pytest.raises(OffsetLossError):
        eng.replay(tailpath)

    # full resync from a fresh snapshot + the retained tail == golden of
    # (seed + tail events)
    stats = eng.resync(seed, tailpath)
    assert stats["events"] > 0
    exp = golden_normalize(
        apply_golden(seed.toPandas(), tail.toPandas(), CFG.vocab_size)
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), exp)


def test_soft_reset_then_rebuild_matches_golden(spark, workdir):
    seed = seed_df(spark, CFG)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, CFG, clpath)
    eng = _mk(spark, workdir, "lake")
    eng.bootstrap(seed)
    eng.replay(clpath)
    golden = golden_normalize(
        apply_golden(seed.toPandas(), changelog_df(spark, CFG).toPandas(), CFG.vocab_size)
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), golden)

    eng.soft_reset()
    assert eng.read_raw().count() == 0
    # rebuild from scratch through resync (snapshot + full log replay)
    eng.resync(seed, clpath)
    assert_frames_equal(final_as_pandas(eng.read_final()), golden)


def test_cursor_change_detected_and_soft_reset_recovers(spark, workdir):
    """A configured-cursor change invalidates incremental state: replay
    refuses (CursorChangeError), soft reset + re-bootstrap + replay
    rebuilds to golden (BaseTypingDedupingTest cursor-change scenario;
    DefaultTyperDeduper.java:160-165)."""
    import os

    import pytest

    from airbyte_spark.changelog import (
        ChangelogConfig,
        apply_golden,
        changelog_df,
        seed_df,
        write_changelog,
    )
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine, CursorChangeError
    from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

    cfg = ChangelogConfig(n_events=400, n_seed_docs=100)
    seed = seed_df(spark, cfg)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, cfg, clpath)
    root = os.path.join(workdir, "lake")
    eng = CdcEngine(spark, root, StreamConfig(num_buckets=4), EngineConfig(batch_events=200))
    eng.create_table()
    eng.bootstrap(seed)
    eng.replay(clpath)

    # same lake, cursor reconfigured -> incremental progress is meaningless
    eng2 = CdcEngine(
        spark, root, StreamConfig(num_buckets=4, cursor_field="ts_ms"),
        EngineConfig(batch_events=200),
    )
    with pytest.raises(CursorChangeError):
        eng2.replay(clpath)

    # recovery: soft reset, re-bootstrap, full replay -> golden
    eng2.soft_reset()
    eng2.bootstrap(seed)
    eng2.replay(clpath)
    exp = golden_normalize(
        apply_golden(seed.toPandas(), changelog_df(spark, cfg).toPandas(), cfg.vocab_size)
    )
    assert_frames_equal(final_as_pandas(eng2.read_final()), exp)


def test_raw_audit_table(spark, workdir):
    """Optional Destinations-V2 raw layer: every delivered pre-dedup event
    is retained in <stream>_raw, append-only and batch-id idempotent
    (BigQuerySqlGenerator.java:717-731)."""
    import os

    from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
    from airbyte_spark.config import EngineConfig, StreamConfig
    from airbyte_spark.engine import CdcEngine

    cfg = ChangelogConfig(n_events=400, n_seed_docs=100, dup_pct=2.0)
    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, cfg, clpath)
    root = os.path.join(workdir, "lake")
    ecfg = EngineConfig(batch_events=150, keep_raw_table=True)
    eng = CdcEngine(spark, root, StreamConfig(num_buckets=4), ecfg)
    eng.create_table()
    eng.bootstrap(seed_df(spark, cfg))
    eng.replay(clpath)
    raw = eng.read_raw_log()
    assert raw.count() == cfg.n_events  # every delivered event, dups included
    # dedup NOT applied in the raw layer
    assert raw.select("doc_id", "lsn").distinct().count() <= cfg.n_events
    # idempotence: a re-replay (and a fresh engine) appends nothing
    eng2 = CdcEngine(spark, root, StreamConfig(num_buckets=4), ecfg)
    stats = eng2.replay(clpath)
    assert stats["batches"] == 0
    assert eng2.read_raw_log().count() == cfg.n_events
    # final table unaffected by the raw layer
    assert eng2.read_final().count() > 0
