"""Online re-bucketing (LakeTable.rebucket) — partition-spec evolution.

The config SIZING RULE (num_buckets ~ table_bytes / target_file_bytes)
means a bucket count chosen at create time is wrong once the table has
grown 100x; rebucket() changes the count in ONE atomic commit (spec change
+ full LWW-resolved rewrite together — the Iceberg REPLACE PARTITION FIELD
analog). These tests prove replay straddling a rebucket stays golden,
layout stays bucket-pure under the new spec, deltas fold, and idempotence
survives."""

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

CFG = ChangelogConfig(n_events=2000, n_seed_docs=300, dup_pct=2.0, corrupt_pct=1.0)


def _mk(spark, workdir, **eng_kw) -> CdcEngine:
    return CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=500, **eng_kw),
    )


def _golden(spark):
    return golden_normalize(
        apply_golden(
            seed_df(spark, CFG).toPandas(),
            changelog_df(spark, CFG).toPandas(),
            CFG.vocab_size,
        )
    )


def _bucket_of(table, pdf):
    """Recompute each row's expected bucket under the CURRENT spec."""
    spec = table.snapshot().spec
    sdf = table.spark.createDataFrame(pdf[["doc_id"]])
    return {
        r["doc_id"]: r["b"]
        for r in sdf.select("doc_id", table.bucket_expr().alias("b")).collect()
    }


def test_replay_straddling_rebucket_stays_golden(spark, workdir):
    ch = os.path.join(workdir, "changelog")
    write_changelog(spark, CFG, ch)
    eng = _mk(spark, workdir)
    eng.create_table()
    eng.bootstrap(seed_df(spark, CFG))
    eng.replay(ch, max_batches=2)

    assert eng.table.snapshot().spec["num_buckets"] == 4
    v = eng.table.rebucket(16)
    assert v is not None
    snap = eng.table.snapshot()
    assert snap.spec["num_buckets"] == 16
    assert snap.summary["operation"] == "rebucket"
    assert all(0 <= f.bucket < 16 for f in snap.files)
    assert all(f.kind != "delta" for f in snap.files)

    # a FRESH engine (no cached state) continues the replay to the end
    eng2 = _mk(spark, workdir)
    eng2.replay(ch)
    assert_frames_equal(final_as_pandas(eng2.read_final()), _golden(spark))
    assert eng2.table.snapshot().spec["num_buckets"] == 16

    # layout is bucket-pure under the NEW spec: every file's rows land in
    # the file's own bucket when re-hashed
    table = eng2.table
    for f in table.snapshot().files:
        rows = spark.read.parquet(os.path.join(table.root, f.path))
        got = rows.select(
            table.bucket_expr(col_name="doc_id").alias("b")
        ).distinct().collect()
        assert {r["b"] for r in got} <= {f.bucket}, f.path


def test_rebucket_same_count_is_noop_and_validates(spark, workdir):
    import pytest

    eng = _mk(spark, workdir)
    eng.create_table()
    eng.bootstrap(seed_df(spark, CFG))
    v0 = eng.table.current_version()
    assert eng.table.rebucket(4) is None
    assert eng.table.current_version() == v0
    with pytest.raises(ValueError):
        eng.table.rebucket(0)


def test_rebucket_folds_mor_deltas(spark, workdir):
    """Deltas present at rebucket time fold into the new bucket-pure base —
    the rewrite IS a compaction under the new spec."""
    big = ChangelogConfig(n_events=400, n_seed_docs=3000, dup_pct=2.0, corrupt_pct=1.0)
    ch = os.path.join(workdir, "changelog")
    write_changelog(spark, big, ch)
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, compact_after_replay_max_files=None),
    )
    eng.create_table()
    eng.bootstrap(seed_df(spark, big))
    eng.replay(ch)
    assert eng.table.delta_file_count() > 0, "scenario must exercise the MoR path"

    before = final_as_pandas(eng.table.scan())
    eng.table.rebucket(8)
    assert eng.table.delta_file_count() == 0
    assert eng.table.snapshot().spec["num_buckets"] == 8
    assert_frames_equal(final_as_pandas(eng.table.scan()), before)
    # golden equality end-to-end as well
    exp = golden_normalize(
        apply_golden(
            seed_df(spark, big).toPandas(), changelog_df(spark, big).toPandas(), big.vocab_size
        )
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), exp)


def test_idempotent_rereplay_after_rebucket(spark, workdir):
    ch = os.path.join(workdir, "changelog")
    write_changelog(spark, CFG, ch)
    eng = _mk(spark, workdir)
    eng.create_table()
    eng.bootstrap(seed_df(spark, CFG))
    eng.replay(ch)
    eng.table.rebucket(16)
    v = eng.table.current_version()
    eng2 = _mk(spark, workdir)
    eng2.replay(ch)  # everything already applied -> no new snapshots
    assert eng2.table.current_version() == v
    assert_frames_equal(final_as_pandas(eng2.read_final()), _golden(spark))
