"""Sequence packing and deterministic corpus splitting for training-data
pipelines.

Training-data-pipeline extension (no analog in rosecape/airbyte — the
reference moves records, it never assembles training batches; SURVEY.md
§2.9b). Both operators are standard LLM pre-training preprocessing from the
public literature: greedy in-order sequence packing (docs concatenated into
fixed-capacity contexts, as in GPT-style pre-training pipelines) and
hash-based train/validation/test assignment (deterministic, join-free, the
way web-scale corpora are split so membership never depends on row order).

Scale design (100 TB):
- pack_sequences computes a running token cumsum with a window PARTITIONED
  by the shard columns — each shard's window is independent, so parallelism
  equals the shard count and no global sort exists anywhere. Production
  pipelines pack within bounded shards (source x date / lsn-range) for
  exactly this reason: packing quality needs only local order, and a
  per-shard window keeps every partition's state in memory. One shuffle on
  the shard key, partial aggregation for the per-bin rollup.
- hash_split is a pure narrow projection (md5 prefix -> integer bucket);
  the only exchange is the final tiny per-split rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X


def pack_sequences(
    df: DataFrame,
    capacity: int,
    shard_cols: list[str],
    order_col: str = "doc_id",
    size_col: str = "n_tok",
) -> DataFrame:
    """Assign each document to a packed training sequence: greedy in-order
    packing within each shard — a document starts in the bin where the
    running token count before it lands, so bin boundaries are deterministic
    functions of (shard, order) alone. Returns one row per document:
    shard cols + (doc_id, n_tok, bin) with bin = floor(cum_before/capacity).

    The window is PARTITION BY shard ORDER BY order_col (unique within a
    shard) — running sum, not a global sort; see module docstring for why
    shard-local order is the scalable contract."""
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.select(
        *shard_cols,
        order_col,
        F.col(size_col).cast("long").alias(size_col),
        F.floor((cum - F.col(size_col)) / F.lit(capacity)).cast("long").alias("bin"),
    )


def pack_stats(
    df: DataFrame,
    capacity: int,
    shard_cols: list[str],
    order_col: str = "doc_id",
    size_col: str = "n_tok",
) -> DataFrame:
    """Per-packed-sequence rollup: shard cols + (bin, n_docs, tokens_total,
    fill_pct). fill_pct is integer-floored; a bin can exceed 100 because the
    document that straddles the boundary counts into its starting bin (the
    greedy no-lookahead contract)."""
    p = pack_sequences(df, capacity, shard_cols, order_col, size_col)
    return (
        p.groupBy(*shard_cols, "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(size_col).cast("long").alias("tokens_total"),
        )
        .select(
            *shard_cols,
            "bin",
            "n_docs",
            "tokens_total",
            F.floor(F.lit(100) * F.col("tokens_total") / F.lit(capacity))
            .cast("long")
            .alias("fill_pct"),
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = the first 8 hex
    chars of md5(id) as an integer mod 100 (exactly reproducible in any
    engine with md5 — the oracle shares the hexn_sql dialect template).
    Adds a ``split`` column; membership depends only on the id value, never
    on row order, partitioning, or engine."""
    bucket = F.expr(
        X.hexn_sql(X.SPARK, f"md5({X.STR(X.SPARK, id_col)})", 1, 8)
    ) % 100
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def chunk_documents(
    df: DataFrame,
    window: int = 512,
    stride: int = 384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (stride < window ⇒ window-stride chars of context carry across chunk
    boundaries) — the context-window chunking step that precedes
    tokenization when documents exceed the training sequence length.

    One row per chunk: (id, chunk_idx, chunk_start, chunk_len, chunk_md5).
    Chunk starts are 0, stride, 2·stride, … < length(text), so membership
    is a pure function of the text value — engine/order/partition
    independent, exactly reproducible by the SQL oracle.

    Scale design (100 TB): a narrow projection + explode — zero shuffles;
    row expansion is bounded by len/stride per doc and the text payload is
    dropped in the same projection (only the md5 survives), so nothing
    downstream ever shuffles document bodies."""
    starts = F.explode(
        F.sequence(F.lit(0), F.length(text_col) - 1, F.lit(stride))
    ).alias("chunk_start")
    chunk = F.expr(f"substring({text_col}, chunk_start + 1, {window})")
    return (
        df.where(F.length(text_col) > 0)
        .select(id_col, text_col)
        .select(F.col(id_col), starts, F.col(text_col))
        .select(
            id_col,
            (F.col("chunk_start") / stride).cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )
