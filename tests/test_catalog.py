"""Multi-stream catalog sync: independent per-stream state, one
consolidated GLOBAL-state doc, per-stream resume bit-identity
(abstract_source.py:89-157 loop; connector_state_manager.py:25-46)."""

from __future__ import annotations

import os

from airbyte_spark.catalog import CatalogEngine
from airbyte_spark.changelog import (
    ChangelogConfig,
    apply_golden,
    changelog_df,
    seed_df,
    write_changelog,
)
from airbyte_spark.config import EngineConfig, StreamConfig
from tests.util import assert_frames_equal, final_as_pandas, golden_normalize

CFG_A = ChangelogConfig(n_events=800, n_seed_docs=200, dup_pct=2.0, seed=1)
CFG_B = ChangelogConfig(n_events=500, n_seed_docs=120, dup_pct=2.0, seed=2)


def _mk(spark, workdir) -> tuple[CatalogEngine, dict, dict]:
    cat = CatalogEngine(
        spark,
        os.path.join(workdir, "cat"),
        [StreamConfig(name="s_a", num_buckets=4), StreamConfig(name="s_b", num_buckets=4)],
        EngineConfig(batch_events=200),
    )
    cat.create_tables()
    seeds = {"s_a": seed_df(spark, CFG_A), "s_b": seed_df(spark, CFG_B)}
    paths = {}
    for name, cfg in (("s_a", CFG_A), ("s_b", CFG_B)):
        p = os.path.join(workdir, f"cl_{name}")
        write_changelog(spark, cfg, p)
        paths[name] = p
    return cat, seeds, paths


def _goldens(spark):
    return {
        "s_a": golden_normalize(
            apply_golden(seed_df(spark, CFG_A).toPandas(), changelog_df(spark, CFG_A).toPandas(), CFG_A.vocab_size)
        ),
        "s_b": golden_normalize(
            apply_golden(seed_df(spark, CFG_B).toPandas(), changelog_df(spark, CFG_B).toPandas(), CFG_B.vocab_size)
        ),
    }


def test_catalog_sync_two_streams_golden(spark, workdir):
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    results = cat.sync(paths)
    assert set(results) == {"s_a", "s_b"}
    exp = _goldens(spark)
    for name in ("s_a", "s_b"):
        assert_frames_equal(final_as_pandas(cat.engine(name).read_final()), exp[name])
    # consolidated GLOBAL-state doc holds both streams' states
    st = cat.state()
    assert st["type"] == "GLOBAL"
    by_name = {
        e["stream_descriptor"]["name"]: e["stream_state"]
        for e in st["global"]["stream_states"]
    }
    assert by_name["s_a"]["shared_state"]["max_committed_lsn"] == CFG_A.n_events
    assert by_name["s_b"]["shared_state"]["max_committed_lsn"] == CFG_B.n_events
    assert st["global"]["shared_state"]["max_committed_lsn"] == max(
        CFG_A.n_events, CFG_B.n_events
    )


def test_catalog_partial_failure_independent_resume(spark, workdir):
    """Interrupt stream A mid-sync (B untouched); a fresh catalog resumes
    each stream from ITS OWN state — both end bit-identical to golden."""
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    # partial: only 1 batch of stream A, nothing of B
    cat.sync({"s_a": paths["s_a"]}, max_batches=1)
    st = cat.state()
    by_name = {
        e["stream_descriptor"]["name"]: e["stream_state"]
        for e in st["global"]["stream_states"]
    }
    assert by_name["s_a"]["shared_state"]["max_committed_lsn"] == 200
    assert by_name["s_b"]["shared_state"]["max_committed_lsn"] == 0

    cat2, _, _ = _mk(spark, workdir)  # fresh engines, same root
    results = cat2.sync(paths)
    assert results["s_a"]["batches"] == 3  # 4 total, 1 already applied
    assert results["s_b"]["batches"] == 3
    exp = _goldens(spark)
    for name in ("s_a", "s_b"):
        assert_frames_equal(final_as_pandas(cat2.engine(name).read_final()), exp[name])


def test_catalog_rejects_unknown_stream(spark, workdir):
    import pytest

    cat, seeds, paths = _mk(spark, workdir)
    with pytest.raises(KeyError):
        cat.sync({"nope": paths["s_a"]})


def test_catalog_concurrent_sync_golden(spark, workdir):
    """concurrency=2: both streams replay in parallel threads against the
    shared SparkSession and still land exactly on golden, with the
    consolidated state doc holding both final states."""
    cat, seeds, paths = _mk(spark, workdir)
    cat.bootstrap(seeds)
    results = cat.sync(paths, concurrency=2)
    assert set(results) == {"s_a", "s_b"}
    exp = _goldens(spark)
    for name in ("s_a", "s_b"):
        assert_frames_equal(final_as_pandas(cat.engine(name).read_final()), exp[name])
    by_name = {
        e["stream_descriptor"]["name"]: e["stream_state"]
        for e in cat.state()["global"]["stream_states"]
    }
    assert by_name["s_a"]["shared_state"]["max_committed_lsn"] == CFG_A.n_events
    assert by_name["s_b"]["shared_state"]["max_committed_lsn"] == CFG_B.n_events


def test_catalog_failure_isolation(spark, workdir):
    """One stream's failure never invalidates the others (both modes): the
    healthy stream commits to golden and its state is recorded; the sync
    raises ONE error naming the failed stream, which resumes cleanly once
    its input is fixed."""
    import pytest

    for concurrency in (1, 2):
        wd = os.path.join(workdir, f"c{concurrency}")
        cat, seeds, paths = _mk(spark, wd)
        cat.bootstrap(seeds)
        broken = dict(paths, s_a=os.path.join(wd, "does-not-exist"))
        with pytest.raises(RuntimeError, match="s_a") as ei:
            cat.sync(broken, concurrency=concurrency)
        # typed originals preserved for caller dispatch (e.g. OffsetLossError)
        assert set(ei.value.stream_errors) == {"s_a"}
        assert isinstance(ei.value.stream_errors["s_a"], Exception)
        assert ei.value.__cause__ is ei.value.stream_errors["s_a"]
        exp = _goldens(spark)
        assert_frames_equal(final_as_pandas(cat.engine("s_b").read_final()), exp["s_b"])
        by_name = {
            e["stream_descriptor"]["name"]: e["stream_state"]
            for e in cat.state()["global"]["stream_states"]
        }
        assert by_name["s_b"]["shared_state"]["max_committed_lsn"] == CFG_B.n_events
        # fix the input: the failed stream syncs from scratch, golden too
        cat.sync({"s_a": paths["s_a"]}, concurrency=concurrency)
        assert_frames_equal(final_as_pandas(cat.engine("s_a").read_final()), exp["s_a"])
