"""Write-audit-publish at the engine level (EngineConfig.stage_commits).

The Iceberg WAP pattern grafted onto the sync loop: a staged replay is
invisible to published readers until explicitly accepted; rejecting it
reverts the table AND rolls the checkpoint back so the same LSN range
re-applies cleanly. Golden equality is the gate on every path.
"""

from __future__ import annotations

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
from airbyte_spark.engine import CdcEngine
from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

CFG = ChangelogConfig(n_events=1200, n_seed_docs=150, dup_pct=2.0)


def _staged_engine(spark, workdir, **kw) -> CdcEngine:
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=400, stage_commits=True, **kw),
    )
    eng.create_table()
    return eng


def _golden(spark, seed):
    return golden_normalize(
        apply_golden(seed.toPandas(), changelog_df(spark, CFG).toPandas(), CFG.vocab_size)
    )


def _bootstrap_golden(spark, seed):
    empty = ChangelogConfig(n_events=0, n_seed_docs=CFG.n_seed_docs)
    return golden_normalize(
        apply_golden(seed.toPandas(), changelog_df(spark, empty).toPandas(), CFG.vocab_size)
    )


@pytest.fixture()
def setup(spark, workdir):
    seed = seed_df(spark, CFG)
    clpath = os.path.join(workdir, "changelog")
    write_changelog(spark, CFG, clpath)
    return seed, clpath


def test_staged_replay_invisible_until_publish(spark, workdir, setup):
    seed, clpath = setup
    eng = _staged_engine(spark, workdir)
    eng.bootstrap(seed)
    pub_before = eng.table.published_version()
    eng.replay(clpath)
    # multiple staged batch commits exist; published head untouched
    assert eng.table.staged_versions(), "replay committed nothing staged"
    assert eng.table.published_version() == pub_before
    # published reader = bootstrap state; auditor's read_final = staged state
    assert_frames_equal(
        final_as_pandas(eng.read_final_published()), _bootstrap_golden(spark, seed)
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), _golden(spark, seed))
    # accept: one atomic flip, then published == golden
    eng.publish_staged()
    assert eng.table.staged_versions() == []
    assert_frames_equal(
        final_as_pandas(eng.read_final_published()), _golden(spark, seed)
    )


def test_abandon_rolls_back_checkpoint_and_replays(spark, workdir, setup):
    seed, clpath = setup
    eng = _staged_engine(spark, workdir)
    eng.bootstrap(seed)
    eng.replay(clpath)
    eng.abandon_staged()
    # reverted: staged data gone from the head, reader sees bootstrap state
    assert_frames_equal(final_as_pandas(eng.read_final()), _bootstrap_golden(spark, seed))
    # the SAME range replays (batch ids freed + checkpoint rolled back) …
    stats = eng.replay(clpath)
    assert stats["events"] == CFG.n_events, "abandoned range did not re-apply"
    eng.publish_staged()
    # … and the re-applied result is golden
    assert_frames_equal(final_as_pandas(eng.read_final_published()), _golden(spark, seed))


def test_staged_equals_unstaged_golden(spark, workdir, setup):
    """stage+publish must be bit-identical to a plain replay (the WAP layer
    may not perturb merge semantics)."""
    seed, clpath = setup
    staged = _staged_engine(spark, workdir)
    staged.bootstrap(seed)
    staged.replay(clpath)
    staged.publish_staged()

    plain = CdcEngine(
        spark,
        os.path.join(workdir, "lake_plain"),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=400),
    )
    plain.create_table()
    plain.bootstrap(seed)
    plain.replay(clpath)

    assert_frames_equal(
        final_as_pandas(staged.read_final_published()),
        final_as_pandas(plain.read_final()),
    )


def test_abandon_preserves_raw_audit_trail(spark, workdir, setup):
    """The raw table records what was DELIVERED; a rejected publish keeps
    it, and the re-applied range does not append duplicates."""
    seed, clpath = setup
    eng = _staged_engine(spark, workdir, keep_raw_table=True)
    eng.bootstrap(seed)
    eng.replay(clpath)
    raw_after_staged = eng.read_raw_log().count()
    assert raw_after_staged > 0
    eng.abandon_staged()
    assert eng.read_raw_log().count() == raw_after_staged
    eng.replay(clpath)  # re-apply: raw batch ids dedupe the appends
    assert eng.read_raw_log().count() == raw_after_staged
    eng.publish_staged()
    assert_frames_equal(final_as_pandas(eng.read_final_published()), _golden(spark, seed))


def test_scd2_history_stages_alongside(spark, workdir, setup):
    """History is a serving table: staged with the final table, abandoned
    with it, and after reject+re-apply+publish it matches a 1-shot run."""
    seed, clpath = setup
    eng = _staged_engine(spark, workdir, scd2_history=True)
    eng.bootstrap(seed)
    eng.replay(clpath)
    eng.abandon_staged()
    hist_root = eng.table_root + "_history"
    from airbyte_spark.lake.table import LakeTable

    if LakeTable.exists(hist_root):
        assert LakeTable.load(spark, hist_root).staged_versions() == []
    eng.replay(clpath)
    eng.publish_staged()

    plain = CdcEngine(
        spark,
        os.path.join(workdir, "lake_plain"),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=400, scd2_history=True),
    )
    plain.create_table()
    plain.bootstrap(seed)
    plain.replay(clpath)

    cols = ["doc_id", "lsn", "valid_from_ms", "valid_to_ms", "is_active"]
    got = (
        eng.read_history().select(*cols).toPandas()
        .sort_values(["doc_id", "lsn"]).reset_index(drop=True)
    )
    exp = (
        plain.read_history().select(*cols).toPandas()
        .sort_values(["doc_id", "lsn"]).reset_index(drop=True)
    )
    assert_frames_equal(got, exp)
