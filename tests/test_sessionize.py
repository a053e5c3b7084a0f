"""Gap sessionization: batch window form vs a pure-Python reference, exact
microsecond boundaries, single-exchange plan shape, and the Structured
Streaming session_window form agreeing with batch on closed sessions."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airbyte_spark.operators.sessionize import (
    session_rollup,
    sessionize,
    streaming_session_rollup,
)

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)


def _events(spark):
    rows = []
    eid = 0
    # user 1: 3 events in one session, 30-min+1s gap, then 2 more
    for off in (0, 60, 120, 120 + 1801, 120 + 1861):
        rows.append((eid, T0 + dt.timedelta(seconds=off), 1, "click", 1.25))
        eid += 1
    # user 2: single event
    rows.append((eid, T0, 2, "view", 10.0))
    eid += 1
    # user 3: tie timestamps (tiebreak by event_id), all one session
    rows.append((eid, T0, 3, "click", 0.5))
    rows.append((eid + 1, T0, 3, "view", 0.5))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_boundaries(spark):
    tagged = sessionize(_events(spark), gap_s=1800)
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in tagged.collect()
    }
    assert got[(1, 0)] == got[(1, 1)] == got[(1, 2)] == 1
    assert got[(1, 3)] == got[(1, 4)] == 2  # gap 1801s > 1800s opens session
    assert got[(2, 5)] == 1
    assert got[(3, 6)] == got[(3, 7)] == 1  # ties stay together


def test_session_rollup_values(spark):
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in session_rollup(_events(spark), gap_s=1800).collect()
    }
    s11 = out[(1, 1)]
    assert s11["n_events"] == 3 and s11["n_clicks"] == 3
    assert s11["value_cents"] == 3 * 125
    assert s11["session_end_us"] - s11["session_start_us"] == 120 * 1_000_000
    s12 = out[(1, 2)]
    assert s12["n_events"] == 2
    assert out[(2, 1)]["value_cents"] == 1000
    assert out[(3, 1)]["n_events"] == 2


def test_session_rollup_single_exchange(spark):
    """ONE hash exchange on the user key: the lag window's sort is reused
    by the running sum and the rollup aggregate (no second shuffle)."""
    plan = (
        session_rollup(_events(spark), gap_s=1800)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_streaming_session_window_matches_batch(spark, workdir):
    """availableNow streaming pass over the same events: closed sessions
    (everything, once the stream ends) match the batch rollup's counts."""
    src = f"{workdir}/events_in"
    _events(spark).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    out = streaming_session_rollup(stream, gap_s=1800, watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["n_events"], r["value_cents"])
        for r in spark.sql("select * from sess_out").collect()
    }
    batch = {
        (r["user_id"], r["n_events"], r["value_cents"])
        for r in session_rollup(_events(spark), gap_s=1800).collect()
    }
    # append mode emits only watermark-closed sessions; with availableNow the
    # final watermark advances past every event except possibly the last
    # session per user. Everything emitted must be a batch session.
    assert got <= batch
    assert len(got) >= 2  # the early-closed sessions did emit
