"""Atomic multi-stream transactions (CatalogEngine.sync_transaction):
multi-table write-audit-publish. A replay or audit failure in ANY stream
rolls back EVERY stream (staged commits abandoned, checkpoints rewound);
success publishes all streams and commits ONE catalog snapshot — the
transaction's visibility point for consistent readers. The Nessie /
Iceberg-REST multi-table-transaction semantic over per-table WAP."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airbyte_spark.catalog import CatalogEngine
from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
from airbyte_spark.config import EngineConfig, StreamConfig

CFG_A = ChangelogConfig(n_events=600, n_seed_docs=150, dup_pct=2.0, seed=11)
CFG_B = ChangelogConfig(n_events=400, n_seed_docs=100, dup_pct=2.0, seed=12)


def _mk(spark, workdir):
    cat = CatalogEngine(
        spark,
        os.path.join(workdir, "cat"),
        [
            StreamConfig(name="s_a", num_buckets=4),
            StreamConfig(name="s_b", num_buckets=4),
        ],
        EngineConfig(batch_events=200),
    )
    cat.create_tables()
    cat.bootstrap({"s_a": seed_df(spark, CFG_A), "s_b": seed_df(spark, CFG_B)})
    paths = {}
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        p = os.path.join(workdir, f"cl_{name}")
        write_changelog(spark, cfg, p)
        paths[name] = p
    return cat, paths


def _max_lsn(df) -> int:
    return df.agg(F.max("_ab_lsn").alias("m")).collect()[0]["m"] or 0


def test_transaction_publishes_all_and_commits_one_snapshot(spark, workdir):
    cat, paths = _mk(spark, workdir)
    ok, results = cat.sync_transaction(paths)
    assert ok is True
    assert results["s_a"]["events"] == CFG_A.n_events
    # one snapshot for the whole transaction, on top of the bootstrap one
    assert cat.catalog_versions() == [1, 2]
    assert cat.catalog_snapshot()["op"] == "transaction"
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        eng = cat.engine(name)
        assert eng.table.staged_versions() == []
        assert eng.table.published_version() == eng.table.current_version()
        assert _max_lsn(cat.read(name)) == cfg.n_events
        # pre-transaction consistent view still intact
        assert _max_lsn(cat.read(name, catalog_version=1)) == 0
    # stage_commits restored to the caller's setting
    assert cat.engine("s_a").cfg.stage_commits is False


def test_replay_failure_rolls_back_every_stream(spark, workdir):
    """s_a's changelog path is broken; s_b replays fully (staged) — the
    transaction must abandon s_b's staged commits too and rewind its
    checkpoint so the next transaction re-applies everything."""
    cat, paths = _mk(spark, workdir)
    broken = dict(paths, s_a=os.path.join(workdir, "does-not-exist"))
    with pytest.raises(RuntimeError, match="s_a"):
        cat.sync_transaction(broken)
    assert cat.catalog_versions() == [1]  # no transaction snapshot
    for name in ("s_a", "s_b"):
        eng = cat.engine(name)
        assert eng.table.staged_versions() == []
        # published view unchanged — b's progress was rolled back, not kept
        assert _max_lsn(eng.read_final_published()) == 0
        assert _max_lsn(cat.read(name)) == 0

    # retry with the fixed input applies the whole range exactly once
    ok, _ = cat.sync_transaction(paths)
    assert ok is True
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        assert _max_lsn(cat.read(name)) == cfg.n_events


def test_audit_rejection_abandons_both_streams(spark, workdir):
    """A failing audit on ONE stream rejects the whole transaction; a
    passing re-run then publishes both streams exactly once."""
    cat, paths = _mk(spark, workdir)
    impossible = [{"op": "expression", "name": "nope", "sql": "n_tok < 0"}]
    ok, results = cat.sync_transaction(paths, audits={"s_a": impossible})
    assert ok is False
    assert [r.name for r in results["_audits"]["s_a"] if not r.passed] == ["nope"]
    assert cat.catalog_versions() == [1]
    for name in ("s_a", "s_b"):
        eng = cat.engine(name)
        assert eng.table.staged_versions() == []
        assert _max_lsn(cat.read(name)) == 0

    sane = [{"op": "not_null", "name": "pk", "column": "doc_id"}]
    ok, results = cat.sync_transaction(paths, audits={"s_a": sane, "s_b": sane})
    assert ok is True
    assert all(r.passed for rs in results["_audits"].values() for r in rs)
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        assert _max_lsn(cat.read(name)) == cfg.n_events
    assert cat.catalog_snapshot()["op"] == "transaction"


def test_preexisting_staged_commits_refuse_transaction(spark, workdir):
    import dataclasses

    cat, paths = _mk(spark, workdir)
    eng = cat.engine("s_a")
    orig = eng.cfg
    eng.cfg = dataclasses.replace(orig, stage_commits=True)
    try:
        eng.replay(paths["s_a"], max_batches=1)
    finally:
        eng.cfg = orig
    assert eng.table.staged_versions()
    with pytest.raises(RuntimeError, match="staged commits"):
        cat.sync_transaction(paths)


def test_transaction_concurrency_matches_sequential(spark, workdir):
    cat, paths = _mk(spark, workdir)
    ok, _ = cat.sync_transaction(paths, concurrency=2)
    assert ok is True
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        assert _max_lsn(cat.read(name)) == cfg.n_events


def test_unknown_streams_and_audit_keys_raise_before_staging(spark, workdir):
    cat, paths = _mk(spark, workdir)
    with pytest.raises(KeyError, match="unconfigured"):
        cat.sync_transaction(dict(paths, s_typo=paths["s_a"]))
    with pytest.raises(KeyError, match="unselected"):
        cat.sync_transaction(paths, audits={"s_typo": []})
    # neither attempt staged anything
    for name in ("s_a", "s_b"):
        assert cat.engine(name).table.staged_versions() == []


def test_rollback_rewinds_consolidated_state(spark, workdir):
    """After a rejected transaction the GLOBAL state doc must reflect the
    REWOUND checkpoints — emitting staged progress upstream would let the
    source purge WAL for a range that still has to replay."""
    cat, paths = _mk(spark, workdir)
    impossible = [{"op": "expression", "name": "nope", "sql": "n_tok < 0"}]
    ok, _ = cat.sync_transaction(paths, audits={"s_a": impossible})
    assert ok is False
    doc = cat.state()
    for entry in doc["global"]["stream_states"]:
        st = entry["stream_state"]
        assert (st or {}).get("max_committed_lsn", 0) == 0, entry
