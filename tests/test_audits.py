"""Declarative data-quality audits (airbyte_spark/audits.py) and the
engine's audit_and_publish gate: pass -> atomic publish; fail -> abandon +
checkpoint rewind (the rejected range replays next sync)."""

from __future__ import annotations

import os

import pytest

from airbyte_spark.audits import run_audits
from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
from airbyte_spark.config import EngineConfig, StreamConfig
from airbyte_spark.engine import CdcEngine

CFG = ChangelogConfig(n_events=800, n_seed_docs=120, dup_pct=2.0)


# ---------------------------------------------------------------- operators


def _df(spark):
    rows = [
        ("a", 1, 10),
        ("b", 2, 20),
        ("c", None, 30),
        ("c", 4, 999),
    ]
    return spark.createDataFrame(rows, "k string, v int, n long")


def test_each_operator(spark):
    df = _df(spark)
    res = run_audits(
        df,
        [
            {"op": "unique_key", "columns": ["k"]},            # c duplicated
            {"op": "unique_key", "columns": ["k", "n"]},       # unique
            {"op": "not_null", "column": "v"},                 # one NULL
            {"op": "not_null", "column": "k"},                 # clean
            {"op": "accepted_range", "column": "n", "min": 0, "max": 100},
            {"op": "row_count_min", "min": 4},
            {"op": "row_count_min", "min": 5},
            {"op": "expression", "name": "v_lt_n", "sql": "v IS NULL OR v < n"},
        ],
    )
    by = {r.name: r for r in res}
    assert not by["unique_key:k"].passed and by["unique_key:k"].observed == 1
    assert by["unique_key:k,n"].passed
    assert not by["not_null:v"].passed and by["not_null:v"].observed == 1
    assert by["not_null:k"].passed
    assert not by["accepted_range:n"].passed  # 999 out of range
    assert by["row_count_min"].observed == 4
    assert [r for r in res if r.name == "row_count_min"][0].passed
    assert not [r for r in res if r.name == "row_count_min"][1].passed
    assert by["v_lt_n"].passed


def test_row_delta_and_validation(spark):
    staged = spark.range(40).toDF("id")
    published = spark.range(100).toDF("id")
    ok = run_audits(staged, [{"op": "row_delta", "max_drop_pct": 70}], published)
    bad = run_audits(staged, [{"op": "row_delta", "max_drop_pct": 50}], published)
    assert ok[0].passed and bad[0].observed == 60.0 and not bad[0].passed
    # empty published baseline passes vacuously (bootstrap sync)
    empty = published.filter("id < 0")
    assert run_audits(staged, [{"op": "row_delta", "max_drop_pct": 0}], empty)[0].passed
    with pytest.raises(ValueError, match="row_delta"):
        run_audits(staged, [{"op": "row_delta", "max_drop_pct": 1}])
    with pytest.raises(ValueError, match="unknown audit op"):
        run_audits(staged, [{"op": "nope"}])
    with pytest.raises(ValueError, match="min and/or max"):
        run_audits(staged, [{"op": "accepted_range", "column": "id"}])


# ------------------------------------------------------------- engine gate


def _staged_engine(spark, workdir, create=True):
    eng = CdcEngine(
        spark,
        os.path.join(workdir, "lake"),
        StreamConfig(num_buckets=8),
        EngineConfig(batch_events=400, stage_commits=True),
    )
    if create:
        eng.create_table()
    return eng


def _run_staged_sync(spark, workdir):
    eng = _staged_engine(spark, workdir)
    seed = seed_df(spark, CFG)
    cl_path = os.path.join(workdir, "changelog")
    write_changelog(spark, CFG, cl_path)
    eng.bootstrap(seed)
    eng.publish_staged()  # bootstrap accepted; the TAIL is under audit
    eng.replay(cl_path)
    return eng, cl_path


GOOD_SPECS = [
    {"op": "unique_key", "columns": ["doc_id"]},
    {"op": "not_null", "column": "doc_id"},
    {"op": "row_delta", "max_drop_pct": 50},
]
BAD_SPECS = GOOD_SPECS + [
    # vocab ids are < vocab_size; an impossible ceiling fails the sync
    {"op": "accepted_range", "column": "n_tok", "min": 0, "max": 1},
]


def test_audit_pass_publishes(spark, workdir):
    eng, _ = _run_staged_sync(spark, workdir)
    published_before = eng.read_final_published().count()
    ok, results = eng.audit_and_publish(GOOD_SPECS)
    assert ok and all(r.passed for r in results)
    assert eng.table.staged_versions() == []
    assert eng.read_final_published().count() == eng.read_final().count()
    assert eng.read_final_published().count() != published_before


def test_audit_fail_abandons_and_range_replays(spark, workdir):
    eng, cl_path = _run_staged_sync(spark, workdir)
    published_before = eng.read_final_published().count()
    ok, results = eng.audit_and_publish(BAD_SPECS)
    assert not ok
    failed = [r.name for r in results if not r.passed]
    assert failed == ["accepted_range:n_tok"]
    # reverted: published head unchanged, nothing staged
    assert eng.table.staged_versions() == []
    assert eng.read_final_published().count() == published_before
    # checkpoint rewound: the same changelog replays, then passes a sane audit
    eng2 = _staged_engine(spark, workdir, create=False)
    stats = eng2.replay(cl_path)
    assert stats["events"] == CFG.n_events
    ok2, _ = eng2.audit_and_publish(GOOD_SPECS)
    assert ok2
