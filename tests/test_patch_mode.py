"""Partial-update (patch) CDC mode — column-wise LWW fold + resolution.

Reference semantics: partial row images (MongoDB change streams;
MySQL binlog_row_image=MINIMAL) where an update envelope carries only the
changed columns and explicit nulls ride a `_ab_null_fields` list.
Engine behavior under StreamConfig(update_mode="patch") must land exactly
on the patch-aware golden applier, resume bit-identically, and stay
idempotent — the same contract the whole-row suites pin.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.changelog import (
    ChangelogConfig,
    apply_golden,
    changelog_df,
    seed_df,
    write_changelog,
)
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.operators.patch import fold_patches
from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

PATCH_SCHEMA = StructType(
    [
        StructField("op", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("source_partition", IntegerType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", IntegerType(), True),
        StructField("source", StringType(), True),
        StructField("_ab_null_fields", ArrayType(StringType()), True),
    ]
)


def _patch_engine(spark, workdir, batch_events=500, **eng_kw) -> CdcEngine:
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=8, update_mode="patch"),
        EngineConfig(batch_events=batch_events, **eng_kw),
    )
    eng.create_table()
    return eng


def _ev(op, doc, lsn, tokens=None, n_tok=None, source=None, nf=None):
    return (op, doc, lsn, 1_700_000_000_000 + lsn, 0, tokens, n_tok, source, nf or [])


def _events_df(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], PATCH_SCHEMA)


# ------------------------------------------------------------- operator unit


def test_fold_patches_column_wise(spark):
    rows = [
        _ev("I", "a", 1, [1, 2], 2, "web"),
        _ev("U", "a", 2, [3], 1),                       # tokens group only
        _ev("U", "a", 3, source="books"),               # source only
        _ev("U", "a", 4, nf=["source"]),                # explicit null
    ]
    out = fold_patches(
        _events_df(spark, rows), payload_cols=["tokens", "n_tok", "source"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["op"] == "I"  # epoch head is the insert
    assert r["lsn"] == 4
    assert list(r["tokens"]) == [3] and r["n_tok"] == 1
    assert r["source"] is None  # explicit null at the winning lsn
    assert r["_touched_source"] == 1


def test_fold_patches_epochs(spark):
    # delete voids trailing patches; a later insert starts a fresh epoch
    rows = [
        _ev("I", "a", 1, [1], 1, "web"),
        _ev("D", "a", 2),
        _ev("U", "a", 3, [9], 1),           # patch after delete: voided
    ]
    r = fold_patches(
        _events_df(spark, rows), payload_cols=["tokens", "n_tok", "source"]
    ).collect()[0]
    assert r["op"] == "D"

    rows.append(_ev("I", "a", 4, [7], 1, "code"))
    rows.append(_ev("U", "a", 5, source="books"))
    r = fold_patches(
        _events_df(spark, rows), payload_cols=["tokens", "n_tok", "source"]
    ).collect()[0]
    assert r["op"] == "I" and list(r["tokens"]) == [7] and r["source"] == "books"


def test_fold_patches_pure_patch_epoch(spark):
    # no insert in the batch: head op U (doc expected to exist in the table)
    rows = [
        _ev("U", "a", 10, [5, 6], 2),
        _ev("U", "a", 11, source="web"),
    ]
    r = fold_patches(
        _events_df(spark, rows), payload_cols=["tokens", "n_tok", "source"]
    ).collect()[0]
    assert r["op"] == "U" and r["lsn"] == 11
    assert list(r["tokens"]) == [5, 6] and r["source"] == "web"
    assert r["_touched_tokens"] == 1 and r["_touched_source"] == 1


# ----------------------------------------------------------- engine end-to-end


def _run_patch_golden(spark, workdir, cfg: ChangelogConfig, batch_events=500, **eng_kw):
    seed = seed_df(spark, cfg)
    clpath = os.path.join(workdir, "changelog")
    write_changelog(spark, cfg, clpath)
    eng = _patch_engine(spark, workdir, batch_events=batch_events, **eng_kw)
    eng.bootstrap(seed)
    eng.replay(clpath)
    exp = golden_normalize(
        apply_golden(
            seed.toPandas(),
            changelog_df(spark, cfg).toPandas(),
            cfg.vocab_size,
            patch_mode=True,
        )
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), exp)
    return eng


def test_patch_golden_multibatch(spark, workdir):
    cfg = ChangelogConfig(
        n_events=3000, n_seed_docs=400, dup_pct=2.0, corrupt_pct=1.0, patch_updates=True
    )
    _run_patch_golden(spark, workdir, cfg, batch_events=700)


def test_patch_resume_and_idempotence(spark, workdir):
    cfg = ChangelogConfig(n_events=2000, n_seed_docs=300, patch_updates=True)
    seed = seed_df(spark, cfg)
    clpath = os.path.join(workdir, "changelog")
    write_changelog(spark, cfg, clpath)
    eng = _patch_engine(spark, workdir, batch_events=500)
    eng.bootstrap(seed)
    eng.replay(clpath, max_batches=2)  # interrupted mid-replay

    fresh = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=8, update_mode="patch"),
        EngineConfig(batch_events=500),
    )
    fresh.replay(clpath)
    exp = golden_normalize(
        apply_golden(
            seed.toPandas(), changelog_df(spark, cfg).toPandas(), cfg.vocab_size,
            patch_mode=True,
        )
    )
    assert_frames_equal(final_as_pandas(fresh.read_final()), exp)

    # re-replay: zero events applied, no new snapshot
    v_before = fresh.table.snapshot().version
    stats = fresh.replay(clpath)
    assert stats["events"] == 0
    assert fresh.table.snapshot().version == v_before


def test_patch_tombstone_suppression_cross_batch(spark, workdir):
    """A patch landing in a LATER batch than the delete is suppressed —
    the tombstone is positive knowledge (resolve_patches contract)."""
    eng = _patch_engine(spark, workdir, batch_events=10)
    seed = seed_df(spark, ChangelogConfig(n_seed_docs=5))
    eng.bootstrap(seed)
    b1 = _events_df(spark, [_ev("D", "doc000000001", 5)])
    b2 = _events_df(
        spark, [_ev("U", "doc000000001", 15, [1, 2, 3], 3, "books")]
    )
    eng.apply_range(b1, 0, 10)
    eng.apply_range(b2, 10, 20)
    final = eng.read_final().filter(F.col("doc_id") == "doc000000001").collect()
    assert final == []  # still deleted; patch could not resurrect


def test_patch_explicit_null_cross_batch(spark, workdir):
    eng = _patch_engine(spark, workdir, batch_events=10)
    seed = seed_df(spark, ChangelogConfig(n_seed_docs=5))
    eng.bootstrap(seed)
    eng.apply_range(
        _events_df(spark, [_ev("U", "doc000000002", 3, nf=["source"])]), 0, 10
    )
    row = (
        eng.read_final().filter(F.col("doc_id") == "doc000000002").collect()[0]
    )
    assert row["source"] is None          # explicitly nulled
    assert row["tokens"] is not None      # untouched group kept from seed
    assert row["_ab_lsn"] == 3


def test_patch_unknown_doc_upserts_partial(spark, workdir):
    eng = _patch_engine(spark, workdir, batch_events=10)
    seed = seed_df(spark, ChangelogConfig(n_seed_docs=2))
    eng.bootstrap(seed)
    eng.apply_range(
        _events_df(spark, [_ev("U", "ghost", 7, source="web")]), 0, 10
    )
    row = eng.read_final().filter(F.col("doc_id") == "ghost").collect()[0]
    assert row["source"] == "web" and row["tokens"] is None and row["n_tok"] is None


def test_patch_golden_mor_delta_path(spark, workdir):
    """Small batches against a larger table take the merge-on-read delta
    path; resolution against scan() (which LWW-resolves existing deltas)
    must still land on golden."""
    cfg = ChangelogConfig(n_events=1200, n_seed_docs=800, patch_updates=True)
    _run_patch_golden(
        spark, workdir, cfg, batch_events=150,
        mor_max_fraction=0.5, mor_max_delta_files=4,
        compact_after_replay_max_files=None,
    )


def test_patch_stream_replay_matches_golden(spark, workdir):
    """Structured Streaming replay with patch envelopes: the foreachBatch
    epoch path routes through the same _dedup_winners -> patch fold +
    resolve as bounded replay, so an availableNow drain must land exactly
    on the patch-mode golden; a second drain from the same SS checkpoint
    applies nothing."""
    from airbyte_spark.streaming import stream_replay

    cfg = ChangelogConfig(
        n_events=1500, n_seed_docs=250, dup_pct=2.0, corrupt_pct=1.0,
        patch_updates=True,
    )
    seed = seed_df(spark, cfg)
    clpath = os.path.join(workdir, "changelog")
    write_changelog(spark, cfg, clpath, n_files=6)
    eng = _patch_engine(spark, workdir, batch_events=500)
    eng.bootstrap(seed)

    ckpt = os.path.join(workdir, "ss_ckpt")
    stats = stream_replay(eng, clpath, ckpt, max_files_per_trigger=2)
    assert stats["epochs"] >= 3
    exp = golden_normalize(
        apply_golden(
            seed.toPandas(),
            changelog_df(spark, cfg).toPandas(),
            cfg.vocab_size,
            patch_mode=True,
        )
    )
    assert_frames_equal(final_as_pandas(eng.read_final()), exp)

    before = eng.table.current_version()
    stats2 = stream_replay(eng, clpath, ckpt)
    assert stats2["rows_applied"] == 0
    assert eng.table.current_version() == before
