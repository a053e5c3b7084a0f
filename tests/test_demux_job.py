"""Demux spark-submit job (jobs/demux_job.py): the shared-WAL fan-out
driven through the packaged job surface — golden equality per table,
resubmit idempotence, stream-spec parsing."""

from __future__ import annotations

import os

import pytest

from airbyte_spark.changelog import changelog_df
from airbyte_spark.demux import DemuxEngine

from jobs.demux_job import build_parser, parse_stream, run
from tests.test_demux import CFG, _bootstrap, _goldens, _mk, _routed
from tests.util import assert_frames_equal, final_as_pandas


def _args(workdir, **over):
    base = dict(
        root=os.path.join(workdir, "demux"),
        changelog=os.path.join(workdir, "wal"),
        batch_events=300,
    )
    base.update(over)
    argv = []
    for k, v in base.items():
        if v is True:
            argv.append(f"--{k.replace('_', '-')}")
        elif v is not None and v is not False:
            argv += [f"--{k.replace('_', '-')}", str(v)]
    argv += ["--stream", "t0:4", "--stream", "t1:4"]
    return build_parser().parse_args(argv)


def test_parse_stream_specs():
    assert parse_stream("a").name == "a"
    s = parse_stream("b:16")
    assert (s.name, s.num_buckets) == ("b", 16)
    s = parse_stream("c:8:user_id")
    assert (s.name, s.num_buckets, s.primary_key) == ("c", 8, "user_id")
    with pytest.raises(ValueError):
        parse_stream("d:1:x:y")


def test_demux_job_golden_and_idempotent(spark, workdir):
    dx = _mk(spark, workdir)
    _bootstrap(spark, dx)
    _routed(changelog_df(spark, CFG)).write.mode("overwrite").parquet(
        os.path.join(workdir, "wal")
    )

    stats = run(spark, _args(workdir))
    assert stats["events"] == CFG.n_events
    for name, exp in _goldens(spark).items():
        eng = DemuxEngine(
            spark,
            os.path.join(workdir, "demux"),
            [parse_stream("t0:4"), parse_stream("t1:4")],
        ).engine(name)
        assert_frames_equal(final_as_pandas(eng.read_final()), exp)

    # resubmit: shared offset already at target -> noop
    again = run(spark, _args(workdir))
    assert again["events"] == 0 and again["batches"] == 0


def test_demux_job_requires_bootstrapped_tables(spark, workdir):
    _routed(changelog_df(spark, CFG)).limit(10).write.mode("overwrite").parquet(
        os.path.join(workdir, "wal")
    )
    with pytest.raises(SystemExit, match="bootstrap"):
        run(spark, _args(workdir))
