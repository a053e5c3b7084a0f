"""Gap-based sessionization — batch window form + streaming session_window.

Reference parity: the reference's sources emit raw event streams and leave
sessionization to the warehouse's normalization layer (dbt models over the
raw table — stream_processor.py generates the SQL scaffolding); the
session-gap rule itself is the standard one (a session ends after
``gap`` of inactivity per user). Here it is a first-class operator in both
batch (lag + running-sum windows) and Structured Streaming
(``F.session_window`` + watermark) forms.

Scale shape (batch): ONE exchange, hash-partitioned on the user key; both
windows (lag, running sum) and the rollup aggregate run inside that
partitioning, so the lag window's sort is reused by the groupBy (no second
exchange). Sessionization is inherently sequential per user — a hot user
serializes within one task. For a key that alone exceeds a task's budget,
pre-split by (user, coarse time bucket) and stitch boundary sessions in a
second tiny pass; not done here because the skew bound (events of ONE user)
is orders of magnitude below task budgets for real workloads.

Timestamps compare as exact integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``) so the oracle gate is bit-exact, no float time math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Tag every event with its per-user session sequence number.

    Adds ``ts_us`` (exact integer microseconds), ``session_seq`` (1-based
    per user, ordered by (ts, tiebreak)). One exchange on ``user_col``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # cast handles TIMESTAMP_NTZ sources (parquet isAdjustedToUTC=false):
    # with the session pinned to UTC (session.py) the NTZ->TIMESTAMP cast is
    # value-exact and unix_micros matches DuckDB's epoch_us on the naive ts.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_sess = (
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > gap_s * 1_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    return df.withColumn("ts_us", us).withColumn(
        "session_seq", F.sum(new_sess).over(wrun).cast("long")
    )


def session_rollup(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, click count, exact
    value sum in integer cents (float-free so the oracle hash-matches)."""
    tagged = sessionize(df, user_col, ts_col, order_tiebreak, gap_s)
    return tagged.groupBy(
        F.col(user_col), F.col("session_seq")
    ).agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").cast("long").alias("n_events"),
        F.sum((F.col("event_type") == "click").cast("long")).alias("n_clicks"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def streaming_session_rollup(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Structured Streaming form: watermarked ``session_window`` aggregate.

    Late events inside the watermark merge sessions exactly like the batch
    form; events later than the watermark drop (documented streaming
    semantics, the price of bounded state). Emits one row per closed
    session in append mode.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_s} seconds"),
            F.col(user_col),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )
