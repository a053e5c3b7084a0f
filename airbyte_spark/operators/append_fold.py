"""Token-append update folds: CDC updates that ship ONLY the appended
token suffix.

The engine's payload is pre-tokenized training sequences; for
document-GROWTH streams (chat transcripts, incrementally appended
documents, streaming ASR output) the natural wire encoding of an update
is the appended token suffix, not the full re-tokenized image — at 100 TB
the wire and the shuffle then carry only NEW tokens, the same argument as
``update_mode="patch"`` for changed columns, but order-SENSITIVE:
appends concatenate in LSN order instead of column-wise LWW.

Semantics per key, in changelog order:

- ``I`` — full token image, starts (or restarts) an epoch;
- ``U`` — appends its ``tokens`` to the current epoch's sequence;
- ``D`` — tombstone: the key is dead until the next ``I``;
- a ``U`` with no live epoch to append to (before any ``I``, or after a
  ``D``) is an **orphan** — counted and dropped, never silently applied
  (the at-least-once analog of the packer's late-row policy).

The fold is computed as a MERGEABLE per-batch summary so cross-batch
application is exact under any order-contiguous batching (the law the
tests pin, hypothesis-fuzzed over random op sequences and split points):

    per key:  (prefix_deltas, prefix_delete, has_epoch, state, alive)

``prefix_deltas`` — U tokens seen before the batch's first I/D (they
append to the PREVIOUS batch's carried state); ``prefix_delete`` — a D
arrived before any I (kills the carried state); ``has_epoch``/``state``/
``alive`` — the post-last-I outcome inside the batch. ``apply`` then
merges a batch summary into the stored live rows:

    has_epoch            -> the batch's own epoch outcome wins
    !has_epoch & pre_del -> delete
    !has_epoch & stored  -> stored.tokens || prefix_deltas
    !has_epoch & none    -> orphan (dropped, counted)

Spark shape: ONE partial-combined ``collect_list`` aggregate per batch
(the shuffle carries each key's batch deltas — the payload itself, the
lower bound) + a pure-Catalyst ``F.aggregate`` fold over the lsn-sorted
events (zero Python on rows); the merge is a full-outer join on the key.
Hot-key bound: a key's per-batch event list folds in one task — the same
inherent-sequentiality unit as gap sessionization (one key's appends
cannot parallelize, by definition of concatenation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMPTY = "CAST(array() AS ARRAY<INT>)"
NULL_ARR = "CAST(NULL AS ARRAY<INT>)"


def fold_token_appends(
    changelog: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    order_cols: tuple[str, ...] = ("lsn", "ts_ms"),
) -> DataFrame:
    """Fold a batch's changelog into one mergeable summary row per key.

    Output: ``key, prefix_deltas array<int>, prefix_delete bool,
    has_epoch bool, state array<int> (nullable), alive bool, n_orphans
    long, last_lsn long``. Pure Catalyst: collect + array_sort +
    ``F.aggregate``; within-batch order is (lsn, ts_ms, op) so the fold
    is partitioning-independent.
    """
    ord_struct = F.struct(
        *[F.col(c) for c in order_cols], F.col("op"),
        F.col(tokens_col).alias("t"),
    )
    g = changelog.groupBy(key).agg(
        F.array_sort(F.collect_list(ord_struct)).alias("_evs"),
        F.max(order_cols[0]).alias("last_lsn"),
    )
    # accumulator: (pre, pre_del, has_epoch, state, alive, orphans)
    zero = (
        f"named_struct('pre', {EMPTY}, 'pre_del', false, 'has_epoch', false,"
        f" 'state', {NULL_ARR}, 'alive', false, 'orphans', 0L)"
    )
    step = f"""
    (acc, e) -> CASE
      WHEN e.op = 'I' THEN named_struct(
        'pre', acc.pre, 'pre_del', acc.pre_del, 'has_epoch', true,
        'state', coalesce(e.t, {EMPTY}), 'alive', true, 'orphans', acc.orphans)
      WHEN e.op = 'D' AND acc.has_epoch THEN named_struct(
        'pre', acc.pre, 'pre_del', acc.pre_del, 'has_epoch', true,
        'state', {NULL_ARR}, 'alive', false, 'orphans', acc.orphans)
      WHEN e.op = 'D' THEN named_struct(
        'pre', {EMPTY}, 'pre_del', true, 'has_epoch', false,
        'state', {NULL_ARR}, 'alive', false, 'orphans', acc.orphans)
      WHEN e.op = 'U' AND acc.has_epoch AND acc.alive THEN named_struct(
        'pre', acc.pre, 'pre_del', acc.pre_del, 'has_epoch', true,
        'state', concat(acc.state, coalesce(e.t, {EMPTY})), 'alive', true,
        'orphans', acc.orphans)
      WHEN e.op = 'U' AND NOT acc.has_epoch AND NOT acc.pre_del THEN
        named_struct(
        'pre', concat(acc.pre, coalesce(e.t, {EMPTY})), 'pre_del', false,
        'has_epoch', false, 'state', acc.state, 'alive', false,
        'orphans', acc.orphans)
      WHEN e.op = 'U' THEN named_struct(
        'pre', acc.pre, 'pre_del', acc.pre_del, 'has_epoch', acc.has_epoch,
        'state', acc.state, 'alive', acc.alive, 'orphans', acc.orphans + 1L)
      ELSE acc
    END
    """
    folded = F.expr(f"aggregate(_evs, {zero}, {step})")
    return g.select(
        key,
        folded.getField("pre").alias("prefix_deltas"),
        folded.getField("pre_del").alias("prefix_delete"),
        folded.getField("has_epoch").alias("has_epoch"),
        folded.getField("state").alias("state"),
        folded.getField("alive").alias("alive"),
        folded.getField("orphans").alias("n_orphans"),
        "last_lsn",
    )


def apply_token_appends(
    stored: DataFrame,
    summary: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Merge a batch summary into the stored live rows -> the new live
    rows ``(key, tokens, n_tok)`` plus ``_orphaned`` (a no-epoch summary
    hit no stored row — surfaced, not applied). Full-outer join on the
    key; untouched stored rows pass through unchanged, so at table scale
    the caller restricts ``stored`` to touched buckets (the engine merge
    path's standard pruning) and this stays f(batch)."""
    s = stored.select(
        F.col(key), F.col(tokens_col).alias("_cur")
    ).alias("s")
    m = summary.alias("m")
    j = s.join(m, on=key, how="full_outer")
    has = F.col("m.has_epoch")
    batch_row = F.col(f"m.{key}").isNotNull()
    new_tokens = (
        F.when(has & F.col("m.alive"), F.col("m.state"))
        .when(has, F.lit(None))  # died inside the batch epoch
        .when(batch_row & F.col("m.prefix_delete"), F.lit(None))
        .when(
            batch_row & F.col("s._cur").isNotNull(),
            F.concat(F.col("s._cur"), F.col("m.prefix_deltas")),
        )
        .when(~batch_row, F.col("s._cur"))  # untouched stored row
        .otherwise(F.lit(None))  # no-epoch appends with nothing stored
    )
    orphaned = (
        batch_row
        & ~has
        & ~F.col("m.prefix_delete")
        & F.col("s._cur").isNull()
        & (F.size(F.col("m.prefix_deltas")) > 0)
    )
    return (
        j.select(
            F.col(key),
            new_tokens.alias(tokens_col),
            orphaned.alias("_orphaned"),
        )
        .filter(F.col(tokens_col).isNotNull() | F.col("_orphaned"))
        .withColumn("n_tok", F.size(F.col(tokens_col)))
    )
