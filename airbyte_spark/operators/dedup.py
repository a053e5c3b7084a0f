"""Last-writer-wins dedup — the central operator of the engine.

Reference semantics: keep the most recent record per PK, ordered by cursor
DESC then extracted_at DESC, via ``row_number() OVER (PARTITION BY pk ORDER
BY cursor DESC, _airbyte_extracted_at DESC) = 1``
(BigQuerySqlGenerator.java:572-631; JdbcSqlGenerator.java:171-179).

Spark-first redesign: a window forces a full shuffle + per-partition SORT of
*all* events, and a hot key lands on one task (the reference never faces
this — it is single-process). We instead compute the winner with a
``max_by(payload_struct, order_struct)`` aggregate: Catalyst plans it as
partial_max_by (map-side, BEFORE the shuffle) -> exchange -> final_max_by,
so each map task emits at most one row per key it saw. A doc_id with 10^7
duplicate events shuffles ~num_map_tasks rows, not 10^7 — skew is crushed
before the wire. Plan nuance (see PLANS.md): with an array payload in the
buffer the aggregate is sort-based (HashAggregate needs fixed-width
mutable buffers), i.e. partition-local sorts on both sides of the single
exchange; the hot key still never concentrates, and the alternative
(hash-agg the order key, join winners back) would cost a second full
exchange — strictly worse.

Ordering is made *total* with a deterministic content-hash tie-break so
resumed replays are bit-identical even on pathological (same lsn, same
ts_ms, different payload) inputs.

Three strategies are kept for comparison/testing:
- "agg"    (default): max_by hash aggregate, map-side partial combine.
- "salted": explicit two-phase (doc_id, salt) partial then global — the
  manual skew treatment SURVEY.md §7.2 step 3 describes; semantically
  identical, useful to demonstrate/benchmark the technique.
- "window": the reference-shaped row_number plan, for parity tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ORDER_COLS = ("lsn", "ts_ms")


def _order_struct(df: DataFrame, order_cols: tuple[str, ...]):
    """Total order: (*order_cols, content-hash). Struct comparison in Spark
    is lexicographic by field position."""
    payload = [c for c in df.columns if c not in order_cols]
    return F.struct(
        *[F.col(c) for c in order_cols],
        F.xxhash64(*[F.col(c) for c in payload]).alias("_tb"),
    )


def lww_dedup(
    df: DataFrame,
    key: str = "doc_id",
    strategy: str = "agg",
    salt_buckets: int = 16,
    order_cols: tuple[str, ...] = ORDER_COLS,
) -> DataFrame:
    """One row per ``key``: the max-(lsn, ts_ms) event. Keeps every column.

    Tombstones participate like any event (delete-wins-if-newest —
    BaseSqlGeneratorIntegrationTest.java:863-919 ordering tests).
    """
    cols = [c for c in df.columns if c != key]

    if strategy == "window":
        w = Window.partitionBy(key).orderBy(F.col("_ord").desc())
        return (
            df.withColumn("_ord", _order_struct(df, order_cols))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(key, *cols)  # same column order as the agg strategies
        )
    row = F.struct(*[F.col(c) for c in cols])
    ord_ = _order_struct(df, order_cols)

    if strategy == "salted":
        # Phase 1: partial winner per (key, salt) — salt from the event
        # position so a hot key's events spread across salt_buckets groups.
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
        partial = (
            df.groupBy(F.col(key), salt.alias("_salt"))
            .agg(F.max_by(row, ord_).alias("_row"), F.max(ord_).alias("_ord"))
        )
        winners = (
            partial.groupBy(key)
            .agg(F.max_by(F.col("_row"), F.col("_ord")).alias("_row"))
        )
        return winners.select(F.col(key), F.col("_row.*"))

    # default: single hash aggregate; Catalyst inserts the map-side partial.
    winners = df.groupBy(key).agg(F.max_by(row, ord_).alias("_row"))
    return winners.select(F.col(key), F.col("_row.*"))
