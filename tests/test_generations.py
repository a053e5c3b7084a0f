"""Generation-swapped staged resync (Airbyte "refreshes" semantics): the
old table serves every read until the rebuilt one is COMPLETE, the swap is
atomic, interrupted rebuilds resume, old generations are droppable."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

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

CFG_A = ChangelogConfig(n_events=400, n_seed_docs=120, seed=41)
CFG_B = ChangelogConfig(n_events=500, n_seed_docs=140, dup_pct=2.0, seed=42)


def _mk(spark, workdir) -> CdcEngine:
    eng = CdcEngine(
        spark, os.path.join(workdir, "e"), StreamConfig(num_buckets=4),
        EngineConfig(batch_events=200),
    )
    eng.create_table()
    eng.bootstrap(seed_df(spark, CFG_A))
    cl_a = os.path.join(workdir, "cl_a")
    write_changelog(spark, CFG_A, cl_a)
    eng.replay(cl_a)
    return eng


def _golden(spark, cfg):
    return golden_normalize(
        apply_golden(
            seed_df(spark, cfg).toPandas(),
            changelog_df(spark, cfg).toPandas(),
            cfg.vocab_size,
        )
    )


def test_staged_resync_serves_old_until_swap(spark, workdir):
    eng = _mk(spark, workdir)
    old = final_as_pandas(eng.read_final())
    cl_b = os.path.join(workdir, "cl_b")
    write_changelog(spark, CFG_B, cl_b)

    # simulate a crash mid-rebuild: generation 1 bootstrapped but NOT
    # replayed/swapped — the serving engine must be completely unaffected
    staged = CdcEngine(
        spark, eng.root, eng.stream, eng.cfg, _pinned_generation=1
    )
    staged.create_table(eng.table.snapshot().schema)
    staged.bootstrap(seed_df(spark, CFG_B))
    assert eng.generation() == 0
    assert_frames_equal(final_as_pandas(eng.read_final()), golden_normalize(old))

    # resume + complete: the staged bootstrap is skipped idempotently,
    # the tail replays, the pointer swaps atomically
    stats = eng.resync_staged(seed_df(spark, CFG_B), cl_b)
    assert stats["generation"] == 1
    assert eng.generation() == 1
    assert_frames_equal(final_as_pandas(eng.read_final()), _golden(spark, CFG_B))

    # post-swap the active checkpoint is the new generation's: replaying
    # the same changelog is a no-op
    assert eng.replay(cl_b)["batches"] == 0

    # a FRESH engine over the same root also resolves generation 1
    eng2 = CdcEngine(spark, eng.root, eng.stream, eng.cfg)
    assert eng2.generation() == 1
    assert_frames_equal(final_as_pandas(eng2.read_final()), _golden(spark, CFG_B))


def test_drop_old_generations(spark, workdir):
    eng = _mk(spark, workdir)
    cl_b = os.path.join(workdir, "cl_b")
    write_changelog(spark, CFG_B, cl_b)
    eng.resync_staged(seed_df(spark, CFG_B), cl_b)
    gen0_root = os.path.join(eng.root, eng.stream.name)
    assert os.path.isdir(gen0_root)  # old generation retained by default
    dropped = eng.drop_old_generations()
    assert dropped == [0]
    assert not os.path.isdir(gen0_root)
    # serving generation untouched
    assert_frames_equal(final_as_pandas(eng.read_final()), _golden(spark, CFG_B))
