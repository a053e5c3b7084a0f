"""Deterministic, distributed change-stream generator.

Every column is a pure arithmetic function of the event index (via
``spark.range``), so generation is embarrassingly parallel, reproducible at
any parallelism, and never touches Python row-at-a-time code (whole-stage
codegen end-to-end). The same formulas are mirrored in plain numpy by the
golden applier's tests.

Knobs mirror the failure modes the reference's CDC suite exercises
(CdcSourceTest.java / BaseSqlGeneratorIntegrationTest.java):
- insert/update/delete mix;
- hot-key skew (top-K docs absorb p% of updates) — the straggler case the
  single-process reference never faces;
- at-least-once duplicate re-emission (dup_pct re-emits an earlier event
  verbatim, same LSN — "Inclusive Cursors", incremental-append-deduped
  .md:108-112);
- payload corruption (n_tok != len(tokens)) to exercise validation repair.

All arithmetic stays below 2^62 so it is identical under ANSI and legacy
overflow semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS_MS = 1_700_000_000_000  # fixed epoch base; no wall clock in data path
_M31 = 2_147_483_648  # 2^31


@dataclass(frozen=True)
class ChangelogConfig:
    n_events: int = 10_000
    n_seed_docs: int = 1_000
    seed: int = 42
    insert_pct: int = 60
    update_pct: int = 30  # delete = 100 - insert - update
    hot_keys: int = 16
    hot_pct: int = 30  # % of updates/deletes hitting the hot set
    dup_pct: float = 2.0  # % of events that are re-emissions (at-least-once)
    dup_lag: int = 50
    corrupt_pct: float = 0.0  # % of events with n_tok != len(tokens)
    n_source_partitions: int = 4
    max_tokens: int = 64
    vocab_size: int = 50_257
    # Patch-style update envelopes (StreamConfig.update_mode="patch"):
    # U events carry only a changed-column subset — tokens+n_tok travel as
    # one group (they are one logical field; a source would never ship one
    # without the other), `source` as another; ~1 in 5 source-bearing
    # patches instead EXPLICITLY nulls it via the `_ab_null_fields` list.
    # The column is emitted whenever this is on (empty array on I events,
    # NULL payloads on D as usual).
    patch_updates: bool = False


def _lcg(c: Column) -> Column:
    return (c * F.lit(1103515245) + F.lit(12345)) % F.lit(_M31)


def _h(c: Column, salt: int, seed: int) -> Column:
    """Two-round LCG hash of a non-negative int64 column; result in [0, 2^31)."""
    mixed = (c + F.lit(salt * 7919 + seed * 104729)) % F.lit(_M31)
    return _lcg(_lcg(mixed))


def _tokens_expr(doc_idx: Column, lsn: Column, length: Column, vocab: int) -> Column:
    """tokens[t] = (doc_idx*1009 + lsn*31 + t*7) % vocab — pure, versioned by lsn."""
    return F.transform(
        F.sequence(F.lit(0), length - F.lit(1)),
        lambda t: ((doc_idx * F.lit(1009) + lsn * F.lit(31) + t * F.lit(7)) % F.lit(vocab)).cast("int"),
    )


def _doc_id_expr(doc_idx: Column) -> Column:
    return F.format_string("doc%09d", doc_idx)


def _source_expr(doc_idx: Column) -> Column:
    return F.element_at(F.array(F.lit("web"), F.lit("books"), F.lit("code")), (doc_idx % 3 + 1).cast("int"))


def seed_df(spark: SparkSession, cfg: ChangelogConfig) -> DataFrame:
    """The initial snapshot: docs [0, n_seed_docs) at LSN 0 (pre-stream).

    Analog of the reference's PK-chunked initial load
    (MySqlInitialLoadRecordIterator.java:30-45) — here a parallel range scan.
    """
    df = spark.range(cfg.n_seed_docs).withColumnRenamed("id", "doc_idx")
    idx = F.col("doc_idx")
    length = (F.lit(1) + _h(idx, 11, cfg.seed) % F.lit(cfg.max_tokens)).cast("int")
    tokens = _tokens_expr(idx, F.lit(0), length, cfg.vocab_size)
    return df.select(
        _doc_id_expr(idx).alias("doc_id"),
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        _source_expr(idx).alias("source"),
        F.lit(0).cast("long").alias("lsn"),
        F.lit(BASE_TS_MS - 1).alias("ts_ms"),
        (idx % cfg.n_source_partitions).cast("int").alias("source_partition"),
    )


def changelog_df(spark: SparkSession, cfg: ChangelogConfig) -> DataFrame:
    """The bounded change stream: n_events rows, strictly increasing event
    position; dup events repeat an earlier event verbatim (same LSN)."""
    s = cfg.seed
    df = spark.range(cfg.n_events)
    i = F.col("id")

    dup_bp = int(cfg.dup_pct * 100)  # basis points
    is_dup = (_h(i, 1, s) % F.lit(10_000) < F.lit(dup_bp)) & (i >= F.lit(cfg.dup_lag))
    j = F.when(is_dup, i - F.lit(cfg.dup_lag)).otherwise(i)

    lsn = (j + F.lit(1)).cast("long")
    ts_ms = (F.lit(BASE_TS_MS) + j * F.lit(1000)).cast("long")

    r_op = _h(j, 2, s) % F.lit(100)
    op = (
        F.when(r_op < F.lit(cfg.insert_pct), F.lit("I"))
        .when(r_op < F.lit(cfg.insert_pct + cfg.update_pct), F.lit("U"))
        .otherwise(F.lit("D"))
    )

    is_hot = _h(j, 3, s) % F.lit(100) < F.lit(cfg.hot_pct)
    existing_idx = F.when(is_hot, _h(j, 4, s) % F.lit(max(cfg.hot_keys, 1))).otherwise(
        _h(j, 5, s) % F.lit(cfg.n_seed_docs)
    )
    doc_idx = F.when(op == "I", F.lit(cfg.n_seed_docs) + j).otherwise(existing_idx)

    length = (F.lit(1) + _h(j, 6, s) % F.lit(cfg.max_tokens)).cast("int")
    tokens = _tokens_expr(doc_idx, lsn, length, cfg.vocab_size)

    corrupt_bp = int(cfg.corrupt_pct * 100)
    is_corrupt = _h(j, 7, s) % F.lit(10_000) < F.lit(corrupt_bp)
    n_tok = F.when(is_corrupt, length + F.lit(1) + (_h(j, 8, s) % F.lit(5)).cast("int")).otherwise(length)

    is_delete = op == "D"
    cols = [
        op.alias("op"),
        _doc_id_expr(doc_idx).alias("doc_id"),
        lsn.alias("lsn"),
        ts_ms.alias("ts_ms"),
        (doc_idx % cfg.n_source_partitions).cast("int").alias("source_partition"),
    ]
    if not cfg.patch_updates:
        return df.select(
            *cols,
            F.when(is_delete, F.lit(None)).otherwise(tokens).alias("tokens"),
            F.when(is_delete, F.lit(None)).otherwise(n_tok).cast("int").alias("n_tok"),
            F.when(is_delete, F.lit(None)).otherwise(_source_expr(doc_idx)).alias("source"),
        )

    # patch envelopes: mask m in [0,4) -> 0: tokens-group only, 1: source
    # only, 2/3: both; explicit source null on ~20% of source-bearing Us
    is_update = op == "U"
    m = _h(j, 21, s) % F.lit(4)
    tok_present = (~is_update) | (m != F.lit(1))
    src_present = (~is_update) | (m != F.lit(0))
    src_null = is_update & src_present & (_h(j, 22, s) % F.lit(5) == F.lit(0))
    return df.select(
        *cols,
        F.when(is_delete | ~tok_present, F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(is_delete | ~tok_present, F.lit(None)).otherwise(n_tok).cast("int").alias("n_tok"),
        F.when(is_delete | ~src_present | src_null, F.lit(None))
        .otherwise(_source_expr(doc_idx))
        .alias("source"),
        F.when(src_null, F.array(F.lit("source")))
        .otherwise(F.array().cast("array<string>"))
        .alias("_ab_null_fields"),
    )


def write_changelog(spark: SparkSession, cfg: ChangelogConfig, path: str, n_files: int = 8) -> None:
    """Materialize the stream as a parquet dataset, range-partitioned by LSN
    so incremental ``lsn > ckpt`` scans prune whole files (the cursor
    predicate of incremental-append-deduped.md:118-122 pushed to storage)."""
    df = changelog_df(spark, cfg)
    df.repartitionByRange(n_files, "lsn").write.mode("overwrite").parquet(path)
