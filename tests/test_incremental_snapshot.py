"""DBLog-style incremental snapshot (engine.snapshot_chunk): snapshot chunks
interleave with tail replay and the final table is bit-identical to
bootstrap-then-replay.

The correctness argument under test: chunk rows carry their as-of LSN and
everything resolves by LWW over (lsn, ts_ms) with tombstones retained in
storage, so
- a tail update newer than the chunk's read point beats the late chunk row,
- a tail DELETE applied before the key's chunk arrives leaves a tombstone
  that the chunk cannot resurrect,
- chunks are idempotent and order-free; whichever chunk completes the set
  stamps the bootstrap-done marker.

Reference parity: Debezium incremental snapshots / Airbyte's
initial-load-concurrent-with-CDC (MySqlInitialReadUtil.java snapshot+tail
orchestration; DBLog, Andreakis & Papapanagiotou 2019).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airbyte_spark.changelog import ChangelogConfig, changelog_df, seed_df
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from tests.util import assert_frames_equal, final_as_pandas

CFG = ChangelogConfig(n_events=600, n_seed_docs=150, dup_pct=2.0, corrupt_pct=1.0)
N_CHUNKS = 3


def _chunk(seed, i):
    return seed.filter(F.crc32(F.col("doc_id")) % N_CHUNKS == i)


def _engine(spark, workdir, sub):
    eng = CdcEngine(
        spark,
        os.path.join(workdir, sub),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=200),
    )
    eng.create_table()
    return eng


def test_interleaved_chunks_match_bootstrap_then_replay(spark, workdir):
    seed = seed_df(spark, CFG)
    cl = changelog_df(spark, CFG)

    # reference: classic bootstrap -> full replay
    ref = _engine(spark, workdir, "ref")
    ref.bootstrap(seed)
    ref.replay(cl)

    # incremental: replay starts FIRST (no snapshot yet), chunks interleave
    inc = _engine(spark, workdir, "inc")
    inc.replay(cl, max_batches=1)           # tail before any snapshot data
    inc.snapshot_chunk(_chunk(seed, 1), 1, N_CHUNKS)  # out of order
    inc.replay(cl, max_batches=1)
    inc.snapshot_chunk(_chunk(seed, 0), 0, N_CHUNKS)
    inc.replay(cl)                           # drain the tail
    inc.snapshot_chunk(_chunk(seed, 2), 2, N_CHUNKS)  # completes the set

    assert_frames_equal(
        final_as_pandas(inc.read_final()), final_as_pandas(ref.read_final())
    )
    # completion was stamped by the last-arriving chunk: bootstrap is a no-op
    assert inc.bootstrap(seed) is None


def test_tail_delete_not_resurrected_by_late_chunk(spark, workdir):
    """The DBLog acid test: a key is deleted by the tail BEFORE its snapshot
    chunk arrives; the late chunk must not bring it back."""
    seed = seed_df(spark, CFG).limit(20).cache()
    victim = seed.select("doc_id").first()["doc_id"]
    delete = seed.filter(F.col("doc_id") == victim).select(
        F.lit("D").alias("op"),
        F.col("doc_id"),
        F.col("tokens"),
        F.col("n_tok"),
        F.col("source"),
        F.lit(10_000).alias("lsn"),
        (F.col("ts_ms") + 10_000).alias("ts_ms"),
        F.lit(0).alias("source_partition"),
    )
    eng = _engine(spark, workdir, "del")
    eng.replay(delete)                       # tombstone lands on an empty table
    eng.snapshot_chunk(seed, 0, 1)           # full snapshot arrives afterwards
    finals = {r["doc_id"] for r in eng.read_final().collect()}
    assert victim not in finals
    assert len(finals) == 19


def test_chunks_idempotent_and_resumable(spark, workdir):
    seed = seed_df(spark, CFG)
    eng = _engine(spark, workdir, "resume")
    v1 = eng.snapshot_chunk(_chunk(seed, 0), 0, N_CHUNKS)
    assert v1 is not None
    # re-apply: skipped, no new snapshot
    assert eng.snapshot_chunk(_chunk(seed, 0), 0, N_CHUNKS) is None
    assert eng.table.current_version() == v1
    # a FRESH engine (crash) resumes by summaries alone
    eng2 = CdcEngine(
        spark,
        os.path.join(workdir, "resume"),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=200),
    )
    assert eng2.snapshot_chunk(_chunk(seed, 0), 0, N_CHUNKS) is None
    eng2.snapshot_chunk(_chunk(seed, 1), 1, N_CHUNKS)
    eng2.snapshot_chunk(_chunk(seed, 2), 2, N_CHUNKS)
    assert eng2.read_final().count() == seed.count()
    # set complete -> bootstrap no-op; further chunks skipped
    assert eng2.bootstrap(seed) is None
    assert eng2.snapshot_chunk(_chunk(seed, 1), 1, N_CHUNKS) is None
