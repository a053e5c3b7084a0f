"""Catalog snapshots: atomic cross-stream version pinning for consistent
multi-table reads — the multi-table-transaction semantics a Nessie/Iceberg
REST catalog layers over per-table commits; state-side analog of the
reference's GLOBAL state message (airbyte-protocol.md:491-511)."""

from __future__ import annotations

import os

import pytest

from airbyte_spark.catalog import CatalogEngine
from airbyte_spark.changelog import ChangelogConfig, seed_df, write_changelog
from airbyte_spark.config import EngineConfig, StreamConfig

CFG_A = ChangelogConfig(n_events=800, n_seed_docs=200, dup_pct=2.0, seed=1)
CFG_B = ChangelogConfig(n_events=500, n_seed_docs=120, dup_pct=2.0, seed=2)


def _mk(spark, workdir, **engine_kw):
    cat = CatalogEngine(
        spark,
        os.path.join(workdir, "cat"),
        [StreamConfig(name="s_a", num_buckets=4), StreamConfig(name="s_b", num_buckets=4)],
        EngineConfig(batch_events=200, **engine_kw),
    )
    cat.create_tables()
    seeds = {"s_a": seed_df(spark, CFG_A), "s_b": seed_df(spark, CFG_B)}
    paths = {}
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        p = os.path.join(workdir, f"cl_{name}")
        write_changelog(spark, cfg, p)
        paths[name] = p
    return cat, seeds, paths


def _max_lsn(df) -> int:
    from pyspark.sql import functions as F

    return df.agg(F.max("_ab_lsn").alias("m")).collect()[0]["m"] or 0


def test_catalog_snapshot_pins_consistent_view(spark, workdir):
    """bootstrap commits catalog v1, a full sync commits v2; reads through
    v1 still see the PRE-sync state of every stream after the sync."""
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    assert cat.catalog_versions() == [1]
    v1 = cat.catalog_snapshot(1)
    assert v1["op"] == "bootstrap" and set(v1["streams"]) == {"s_a", "s_b"}

    cat.sync(paths)
    assert cat.catalog_versions() == [1, 2]
    assert cat.catalog_snapshot()["op"] == "sync"
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        # v1 = seed only (no changelog LSNs yet); v2 = fully applied
        assert _max_lsn(cat.read(name, catalog_version=1)) == 0
        assert _max_lsn(cat.read(name, catalog_version=2)) == cfg.n_events
        assert cat.read(name).count() == cat.engine(name).table.scan().count()


def test_partial_failure_commits_no_catalog_snapshot(spark, workdir):
    """A sync with one failed stream leaves the catalog snapshot untouched:
    the healthy stream's table HAS advanced (durable progress), but the
    consistent read view still pairs both streams at the last coherent
    point. The next full sync publishes a new coherent snapshot."""
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    broken = dict(paths, s_a=os.path.join(workdir, "does-not-exist"))
    with pytest.raises(RuntimeError, match="s_a"):
        cat.sync(broken)
    assert cat.catalog_versions() == [1]
    # direct (freshest) read sees s_b's progress ...
    assert _max_lsn(cat.engine("s_b").table.scan()) == CFG_B.n_events
    # ... while the consistent view still sees the bootstrap pair
    assert _max_lsn(cat.read("s_b")) == 0
    assert _max_lsn(cat.read("s_a")) == 0

    cat.sync({"s_a": paths["s_a"]})  # fix the input; full selected set syncs
    assert cat.catalog_versions() == [1, 2]
    assert _max_lsn(cat.read("s_a", catalog_version=2)) == CFG_A.n_events
    # s_b was not selected in the fixing sync: pinned at its durable head
    assert _max_lsn(cat.read("s_b", catalog_version=2)) == CFG_B.n_events


def test_catalog_version_as_of(spark, workdir):
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    t1 = cat.catalog_snapshot(1)["committed_at_ms"]
    cat.sync(paths)
    t2 = cat.catalog_snapshot(2)["committed_at_ms"]
    assert cat.catalog_version_as_of(t1) == 1
    assert cat.catalog_version_as_of(t2 + 10_000) == 2
    if t2 > t1:  # sub-ms syncs would make the midpoint ambiguous
        assert cat.catalog_version_as_of(t2 - 1) == 1
    with pytest.raises(ValueError):
        cat.catalog_version_as_of(t1 - 1)


def test_staged_commits_never_pinned(spark, workdir):
    """Under write-audit-publish, a catalog snapshot pins the PUBLISHED
    version: an unaudited staged sync is invisible to consistent readers
    until publish_staged()."""
    cat, seeds, paths = _mk(spark, workdir, stage_commits=True)
    cat.bootstrap(seeds)  # bootstrap is never staged
    cat.sync(paths)
    # staged data exists above the published head ...
    assert cat.engine("s_a").table.staged_versions()
    # ... but the snapshot pinned the published (pre-sync) version
    assert _max_lsn(cat.read("s_a")) == 0
    for name in ("s_a", "s_b"):
        cat.engine(name).publish_staged()
    cat._commit_catalog_snapshot("publish")
    assert _max_lsn(cat.read("s_a")) == CFG_A.n_events


def test_demux_pins_only_at_window_barrier(spark, workdir):
    """DemuxEngine publishes a pin at bootstrap and at replay end — all
    tables at the same WAL prefix. A bounded (interrupted) replay pins at
    its window barrier; reads through any pin are cross-table consistent."""
    from airbyte_spark.demux import DemuxEngine

    cfg = ChangelogConfig(n_events=900, n_seed_docs=220, dup_pct=2.0, seed=7)
    from pyspark.sql import functions as F

    from airbyte_spark.changelog import changelog_df

    def routed(df):
        route = (F.abs(F.xxhash64("doc_id")) % 2).cast("string")
        return df.withColumn("_ab_stream", F.concat(F.lit("t"), route))

    dx = DemuxEngine(
        spark,
        os.path.join(workdir, "demux"),
        [StreamConfig(name="t0", num_buckets=4), StreamConfig(name="t1", num_buckets=4)],
        cfg=EngineConfig(batch_events=300),
    )
    dx.create_tables()
    seeds = routed(seed_df(spark, cfg))
    dx.bootstrap(
        {n: seeds.filter(F.col("_ab_stream") == n).drop("_ab_stream") for n in ("t0", "t1")}
    )
    assert dx.snapshots.versions() == [1]

    wal = routed(changelog_df(spark, cfg))
    dx.replay(wal, max_batches=1)  # interrupted after one 300-event window
    assert dx.snapshots.versions() == [1, 2]
    for n in ("t0", "t1"):
        # pin 2 = both tables exactly at WAL prefix 300
        assert _max_lsn(dx.read(n, catalog_version=2)) <= 300
        assert _max_lsn(dx.read(n, catalog_version=1)) == 0
    dx.replay(wal)  # finish
    assert dx.snapshots.versions() == [1, 2, 3]
    tops = [_max_lsn(dx.read(n)) for n in ("t0", "t1")]
    assert max(tops) == cfg.n_events  # the last WAL event lands in one table


def test_expire_catalog_snapshots_keeps_pinned_reads(spark, workdir):
    """Expiration drops old catalog snapshots and trims each table only
    down to the oldest still-pinned version — every retained catalog read
    keeps working."""
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    for _ in range(3):  # one batch per sync -> catalog versions 2, 3, 4
        cat.sync(paths, max_batches=1)
    assert cat.catalog_versions() == [1, 2, 3, 4]

    stats = cat.expire_catalog_snapshots(keep_last=2)
    assert stats["expired_catalog_snapshots"] == 2
    assert cat.catalog_versions() == [3, 4]
    for v in (3, 4):
        for name in ("s_a", "s_b"):
            assert cat.read(name, catalog_version=v).count() > 0
    with pytest.raises(FileNotFoundError):
        cat.catalog_snapshot(1)
