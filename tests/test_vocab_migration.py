"""Vocabulary migration (functions/remap.py + CdcEngine.migrate_vocab):
tokenizer-swap rebuilds generation k+1 with every stored token id
rewritten, checkpoint carried, pointer swapped atomically; v2 events
then replay into the migrated table.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine
from airbyte_spark.functions.remap import (
    NO_MAPPING,
    make_token_remapper,
    mapping_table,
)

SCHEMA = (
    "op string, doc_id string, lsn long, ts_ms long, source_partition int,"
    " tokens array<int>, n_tok int, source string"
)


def test_remap_udf_values_unk_nulls(spark):
    lut = mapping_table([(0, 100), (1, 101), (3, 7)], size=4)
    df = spark.createDataFrame(
        [("a", [0, 1, 3]), ("b", [0, 2, 9]), ("c", None), ("d", [])],
        "doc_id string, tokens array<int>",
    )
    r = make_token_remapper(lut, unk_id=55)
    out = {x["doc_id"]: x.asDict() for x in
           df.select("doc_id", r(F.col("tokens")).alias("r"))
             .select("doc_id", "r.*").collect()}
    assert out["a"]["tokens"] == [100, 101, 7]
    assert out["a"]["n_remapped"] == 3 and out["a"]["n_unk"] == 0
    # 2 inside table but unmapped; 9 outside table -> both unk
    assert out["b"]["tokens"] == [100, 55, 55]
    assert out["b"]["n_unk"] == 2
    assert out["c"]["tokens"] is None and out["c"]["n_unk"] == 0
    assert out["d"]["tokens"] == []


def test_engine_migration_end_to_end(spark, workdir):
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
    )
    eng.create_table()
    # v1 replay: two docs + one deleted doc (tombstone must survive)
    eng.replay(spark.createDataFrame([
        ("I", "a", 1, 1000, 0, [0, 1, 2], 3, "s"),
        ("I", "b", 2, 1001, 0, [2, 2], 2, "s"),
        ("I", "c", 3, 1002, 0, [1], 1, "s"),
        ("D", "c", 4, 1003, 0, None, None, None),
    ], SCHEMA))

    # v2 vocabulary: 0->10, 1->11, 2 dropped (-> unk 99)
    stats = eng.migrate_vocab([(0, 10), (1, 11)], unk_id=99, size=3)
    assert stats["generation"] == 1
    assert stats["ids_remapped"] == 2  # 0,1 in doc a (doc c is a tombstone)
    assert stats["ids_unk"] == 3       # one 2 in doc a, two 2s in doc b

    fin = {r["doc_id"]: r["tokens"] for r in eng.read_final().collect()}
    assert fin == {"a": [10, 11, 99], "b": [99, 99]}

    # checkpoint carried: re-feeding the v1 LSN range applies nothing
    before = eng.table.current_version()
    eng.replay(spark.createDataFrame(
        [("I", "z", 2, 1001, 0, [5], 1, "s")], SCHEMA
    ))
    assert eng.table.current_version() == before

    # v2 events past the checkpoint replay into the migrated generation,
    # and LWW across the migration boundary still works
    eng.replay(spark.createDataFrame([
        ("U", "a", 5, 1004, 0, [10, 10], 2, "s"),
        ("I", "d", 6, 1005, 0, [11], 1, "s"),
    ], SCHEMA))
    fin = {r["doc_id"]: r["tokens"] for r in eng.read_final().collect()}
    assert fin == {"a": [10, 10], "b": [99, 99], "d": [11]}

    # tombstone survived the migration: an out-of-order late U for the
    # deleted doc (lsn below its tombstone) must stay suppressed
    assert "c" not in fin


def test_migration_counts_exclude_tombstones(spark, workdir):
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
    )
    eng.create_table()
    eng.replay(spark.createDataFrame([
        ("I", "x", 1, 1000, 0, [0], 1, "s"),
        ("D", "x", 2, 1001, 0, None, None, None),
    ], SCHEMA))
    stats = eng.migrate_vocab([(0, 1)], unk_id=9, size=1)
    # the only live ids were deleted; nothing to remap, nothing unk
    assert stats["ids_remapped"] == 0 and stats["ids_unk"] == 0
    assert eng.read_final().count() == 0


def test_remap_wide_ids_and_empty_mapping(spark):
    """v2 ids past 2^31 come back as array<bigint> (never int32 wrap);
    an empty mapping maps everything to unk instead of crashing."""
    big = 3_000_000_000
    lut = mapping_table([(0, big), (1, 1)], size=2)
    df = spark.createDataFrame([("a", [0, 1, 5])], "doc_id string, tokens array<int>")
    r = make_token_remapper(lut, unk_id=7)
    out = df.select(r(F.col("tokens")).alias("r")).select("r.*")
    assert dict(out.dtypes)["tokens"] == "array<bigint>"
    row = out.collect()[0]
    assert row["tokens"] == [big, 1, 7]
    assert row["n_remapped"] == 1 and row["n_unk"] == 1

    empty = make_token_remapper(mapping_table([]), unk_id=9)
    row = df.select(empty(F.col("tokens")).alias("r")).select("r.*").collect()[0]
    assert row["tokens"] == [9, 9, 9] and row["n_unk"] == 3


def test_migration_widens_table_for_wide_mapping(spark, workdir):
    """A mapping into a >2^31 id domain widens the staged generation's
    tokens column to array<bigint> — the same promotion replay-side
    widening allows — instead of wrapping."""
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
    )
    eng.create_table()
    eng.replay(spark.createDataFrame(
        [("I", "a", 1, 1000, 0, [0, 1], 2, "s")], SCHEMA
    ))
    big = 3_000_000_000
    stats = eng.migrate_vocab([(0, big), (1, 1)], unk_id=9, size=2)
    assert stats["ids_remapped"] == 1
    assert dict(eng.read_final().dtypes)["tokens"] == "array<bigint>"
    fin = {r["doc_id"]: r["tokens"] for r in eng.read_final().collect()}
    assert fin == {"a": [big, 1]}


def test_migration_widens_leftover_staged_generation(spark, workdir):
    """A leftover staged generation with a narrow (array<int>) tokens
    schema — a crashed resync_staged or prior narrow-mapping run — must
    not make a wide migration overflow at the cast: the required type
    wins and schema evolution widens the stale staged table."""
    root = os.path.join(workdir, "lake")
    eng = CdcEngine(
        spark,
        root,
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
    )
    eng.create_table()
    eng.replay(spark.createDataFrame(
        [("I", "a", 1, 1000, 0, [0, 1], 2, "s")], SCHEMA
    ))
    # simulate the leftover: generation 1 pre-exists with int tokens
    leftover = CdcEngine(
        spark,
        root,
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=100, validate_tokens=False),
        _pinned_generation=1,
    )
    leftover.create_table()
    big = 3_000_000_000
    stats = eng.migrate_vocab([(0, big), (1, 1)], unk_id=9, size=2)
    assert stats["generation"] == 1 and stats["ids_remapped"] == 1
    assert dict(eng.read_final().dtypes)["tokens"] == "array<bigint>"
    fin = {r["doc_id"]: r["tokens"] for r in eng.read_final().collect()}
    assert fin == {"a": [big, 1]}
