"""Additive schema evolution mid-replay (FIXTURES T3 #9/#10):
new payload column + int->long widening applied via metadata-only commits;
pre-evolution rows read with NULL/upcast. Non-additive changes raise
(soft-reset territory, DefaultTyperDeduper.java:160-165)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from airbyte_spark.changelog import ChangelogConfig, seed_df
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine, SchemaEvolutionError


def _mk_engine(spark, workdir):
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=500),
    )
    eng.create_table()
    eng.bootstrap(seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=20)))
    return eng


def _schema(with_lang=False, n_tok_long=False):
    fields = [
        StructField("op", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("lsn", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("source_partition", IntegerType(), False),
        StructField("tokens", ArrayType(IntegerType()), True),
        StructField("n_tok", LongType() if n_tok_long else IntegerType(), True),
        StructField("source", StringType(), True),
    ]
    if with_lang:
        fields.append(StructField("lang", StringType(), True))
    return StructType(fields)


def test_add_column_mid_replay(spark, workdir):
    eng = _mk_engine(spark, workdir)
    # phase 1: vanilla events
    p1 = os.path.join(workdir, "cl1")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, "web")], _schema()
    ).write.parquet(p1)
    eng.replay(p1)
    assert "lang" not in eng.read_final().columns

    # phase 2: events now carry `lang`
    p2 = os.path.join(workdir, "cl2")
    spark.createDataFrame(
        [("U", "doc000000002", 2, 2000, 0, [6], 1, "web", "en")],
        _schema(with_lang=True),
    ).write.parquet(p2)
    eng.replay(p2)

    fin = eng.read_final()
    assert "lang" in fin.columns
    assert fin.filter(F.col("doc_id") == "doc000000002").first().lang == "en"
    # pre-evolution rows surface NULL lang
    assert fin.filter(F.col("doc_id") == "doc000000001").first().lang is None
    assert eng.table.snapshot().schema_version == 2


def test_widen_n_tok_mid_replay(spark, workdir):
    eng = _mk_engine(spark, workdir)
    p1 = os.path.join(workdir, "cl1")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, "web")], _schema()
    ).write.parquet(p1)
    eng.replay(p1)
    assert dict(eng.read_final().dtypes)["n_tok"] == "int"

    p2 = os.path.join(workdir, "cl2")
    spark.createDataFrame(
        [("U", "doc000000003", 2, 2000, 0, [7, 8], 2, "web")],
        _schema(n_tok_long=True),
    ).write.parquet(p2)
    eng.replay(p2)

    fin = eng.read_final()
    assert dict(fin.dtypes)["n_tok"] == "bigint"
    # old rows upcast transparently
    assert fin.filter(F.col("doc_id") == "doc000000001").first().n_tok == 1
    assert fin.filter(F.col("doc_id") == "doc000000003").first().n_tok == 2
    assert eng.table.snapshot().schema_version == 2


def test_non_additive_change_rejected(spark, workdir):
    eng = _mk_engine(spark, workdir)
    bad = StructType(
        [
            StructField("op", StringType(), False),
            StructField("doc_id", StringType(), False),
            StructField("lsn", LongType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("source_partition", IntegerType(), False),
            StructField("tokens", ArrayType(IntegerType()), True),
            StructField("n_tok", StringType(), True),  # int -> string: not additive
            StructField("source", StringType(), True),
        ]
    )
    p = os.path.join(workdir, "cl")
    spark.createDataFrame([("U", "d", 1, 1, 0, [1], "x", "web")], bad).write.parquet(p)
    with pytest.raises(SchemaEvolutionError):
        eng.replay(p)


def test_schema_version_recorded_in_checkpoint(spark, workdir):
    from airbyte_spark.checkpoint import load_checkpoint

    eng = _mk_engine(spark, workdir)
    p2 = os.path.join(workdir, "cl2")
    spark.createDataFrame(
        [("U", "doc000000002", 1, 1000, 0, [6], 1, "web", "en")],
        _schema(with_lang=True),
    ).write.parquet(p2)
    eng.replay(p2)
    ck = load_checkpoint(eng.checkpoint_path)
    assert ck.table_schema_version == 2


def test_weird_column_names_evolve_and_apply(spark, workdir):
    """Reserved-word and space-containing payload column names survive
    evolution, replay, storage, and read-back (SqlGenerator suite's
    weirdColumnNames scenario — identifier handling is the storage
    layer's job, never the engine's)."""
    eng = _mk_engine(spark, workdir)
    fields = list(_schema().fields)
    fields.append(StructField("select", StringType(), True))
    fields.append(StructField("with space", StringType(), True))
    weird = StructType(fields)
    rows = [
        ("I", "w1", 1, 1000, 0, [1, 2], 2, "web", "kw", "sp one"),
        ("U", "w1", 2, 2000, 0, [3], 1, "web", "kw2", "sp two"),
        ("I", "w2", 3, 3000, 1, [4], 1, "code", None, None),
    ]
    df = spark.createDataFrame(rows, weird)
    eng.replay(df)

    snap = eng.table.snapshot()
    names = snap.schema.fieldNames()
    assert "select" in names and "with space" in names

    final = {r["doc_id"]: r for r in eng.read_final().collect()}
    assert final["w1"]["select"] == "kw2"
    assert final["w1"]["with space"] == "sp two"
    assert final["w2"]["select"] is None
    # pre-evolution seed rows read back with NULLs in the new columns
    assert all(
        r["select"] is None for r in eng.read_final().filter(F.col("doc_id").startswith("doc")).collect()
    )


def test_evolution_with_mor_deltas(spark, workdir):
    """Schema evolution interleaved with merge-on-read delta commits:
    delta files written pre-evolution read back NULL-padded/upcast, the
    resolved state is correct, and the fold compaction normalizes files to
    the evolved schema."""
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        # large table + tiny batches -> MoR path; no auto-compaction
        EngineConfig(batch_events=500, compact_after_replay_max_files=None),
    )
    eng.create_table()
    eng.bootstrap(seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=5000)))

    p1 = os.path.join(workdir, "cl1")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, "web")], _schema()
    ).write.parquet(p1)
    eng.replay(p1)
    assert eng.table.delta_file_count() > 0  # pre-evolution delta

    p2 = os.path.join(workdir, "cl2")
    spark.createDataFrame(
        [("U", "doc000000002", 2, 2000, 0, [7], 1, "web", "en")],
        _schema(with_lang=True),
    ).write.parquet(p2)
    eng.replay(p2)

    fin = eng.read_final()
    assert "lang" in fin.columns
    assert fin.filter(F.col("doc_id") == "doc000000002").first().lang == "en"
    assert fin.filter(F.col("doc_id") == "doc000000001").first().lang is None
    before = {(r.doc_id, r.lang) for r in fin.select("doc_id", "lang").collect()}

    # fold: deltas disappear, resolved rows unchanged
    eng.table.compact()
    assert eng.table.delta_file_count() == 0
    after = {
        (r.doc_id, r.lang)
        for r in eng.read_final().select("doc_id", "lang").collect()
    }
    assert after == before


def test_union_type_fallback_to_json_string(spark, workdir):
    """Union/oneOf fallback (supported-data-types.md:74-113): a non-additive
    type conflict degrades the column to a JSON-string serialization when
    union_type_fallback is on — old int values read back as "5", new
    struct values as JSON — instead of raising."""
    from pyspark.sql.types import StructField, StructType

    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=500, union_type_fallback=True),
    )
    base = _schema()
    with_extra_int = StructType(list(base.fields) + [StructField("v", IntegerType(), True)])
    eng.create_table()
    eng.bootstrap(seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=20)))

    p1 = os.path.join(workdir, "cl1")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, "web", 42)], with_extra_int
    ).write.parquet(p1)
    eng.replay(p1)  # adds v:int
    assert eng.read_final().filter(F.col("doc_id") == "doc000000001").first().v == 42

    p2 = os.path.join(workdir, "cl2")
    with_extra_struct = StructType(
        list(base.fields)
        + [StructField("v", StructType([StructField("a", LongType(), True)]), True)]
    )
    spark.createDataFrame(
        [("U", "doc000000002", 2, 2000, 0, [7], 1, "web", (9,))], with_extra_struct
    ).write.parquet(p2)
    eng.replay(p2)  # conflict int vs struct -> fallback to string

    fin = eng.read_final()
    assert dict(fin.dtypes)["v"] == "string"
    assert fin.filter(F.col("doc_id") == "doc000000001").first().v == "42"
    assert fin.filter(F.col("doc_id") == "doc000000002").first().v == '{"a":9}'

    # without the flag the same conflict still raises (soft-reset territory)
    eng2 = CdcEngine(
        spark, os.path.join(workdir, "lake2"),
        StreamConfig(num_buckets=4), EngineConfig(batch_events=500),
    )
    eng2.create_table()
    eng2.bootstrap(seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=10)))
    eng2.replay(p1)
    with pytest.raises(SchemaEvolutionError):
        eng2.replay(p2)


def test_string_column_conflict_raises_without_fallback(spark, workdir):
    """ADVICE r2: a conflicting incoming type against a GENUINELY-string
    table column must raise when union_type_fallback is off — the string
    shortcut only applies to columns the fallback itself degraded."""
    eng = _mk_engine(spark, workdir)  # union_type_fallback defaults to False
    fields = [
        StructField("source", LongType(), True) if f.name == "source" else f
        for f in _schema().fields
    ]
    p = os.path.join(workdir, "cl_strconflict")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, 7)], StructType(fields)
    ).write.parquet(p)
    with pytest.raises(SchemaEvolutionError):
        eng.replay(p)


def test_widen_token_array_elements_mid_replay(spark, workdir):
    """array<int> -> array<bigint> element promotion (Iceberg list-element
    widening): the tokens column itself widens mid-replay as a
    metadata-only commit; pre-evolution rows upcast transparently and
    post-evolution batches carry 64-bit token ids. Validation is off so
    the >2^31 token survives to storage (the vocab-range repair would
    remap it — orthogonal to the widening under test)."""
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=4),
        EngineConfig(batch_events=500, validate_tokens=False),
    )
    eng.create_table()
    eng.bootstrap(seed_df(spark, ChangelogConfig(n_events=0, n_seed_docs=20)))
    p1 = os.path.join(workdir, "cl1")
    spark.createDataFrame(
        [("U", "doc000000001", 1, 1000, 0, [5], 1, "web")], _schema()
    ).write.parquet(p1)
    eng.replay(p1)
    assert dict(eng.read_final().dtypes)["tokens"] == "array<int>"

    wide = StructType(
        [
            f if f.name != "tokens"
            else StructField("tokens", ArrayType(LongType()), True)
            for f in _schema().fields
        ]
    )
    big = 3_000_000_000  # > 2^31: only representable after the widening
    p2 = os.path.join(workdir, "cl2")
    spark.createDataFrame(
        [("U", "doc000000003", 2, 2000, 0, [big, 7], 2, "web")], wide
    ).write.parquet(p2)
    files_before = len(eng.table.snapshot().files)
    eng.replay(p2)

    fin = eng.read_final()
    assert dict(fin.dtypes)["tokens"] == "array<bigint>"
    assert fin.filter(F.col("doc_id") == "doc000000001").first().tokens == [5]
    assert fin.filter(F.col("doc_id") == "doc000000003").first().tokens == [big, 7]
    assert eng.table.snapshot().schema_version == 2
    # the widening commit itself added no data files (metadata-only)
    evolve = [s for s in eng.table.history()
              if s.summary.get("operation") == "evolve-schema"]
    assert len(evolve) == 1
    assert len(evolve[0].files) == files_before
