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

def _empty(tok_type: str) -> str:
    return f"CAST(array() AS {tok_type})"


def _null_arr(tok_type: str) -> str:
    return f"CAST(NULL AS {tok_type})"


def fold_token_appends(
    changelog: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    order_cols: tuple[str, ...] = ("lsn", "ts_ms"),
    carry_cols: tuple[str, ...] = (),
    last_cols: tuple[str, ...] = (),
    errors_col: str | None = None,
) -> DataFrame:
    """Fold a batch's changelog into one mergeable summary row per key.

    Output: ``key, prefix_deltas array<int>, prefix_delete bool,
    has_epoch bool, state array<int> (nullable), alive bool, n_orphans
    long, first_lsn long, last_lsn long`` plus, when requested:
    ``carry_cols`` (payload columns carried from the epoch's LAST full
    image — appends never change them, NULL before the first I),
    ``last_<c>`` for ``last_cols`` (taken from the key's final event —
    envelope metadata like source_partition), and ``_errs`` (flattened
    ``errors_col`` arrays across the key's events). Pure Catalyst:
    collect + array_sort + ``F.aggregate``; within-batch order is
    (lsn, ts_ms, op) so the fold is partitioning-independent.
    """
    types = {f.name: f.dataType.simpleString() for f in changelog.schema.fields}
    tok_t = types[tokens_col]
    EMPTY, NULL_ARR = _empty(tok_t), _null_arr(tok_t)
    ord_struct = F.struct(
        *[F.col(c) for c in order_cols], F.col("op"),
        F.col(tokens_col).alias("t"),
        *[F.col(c).alias(f"c_{c}") for c in carry_cols],
        *[F.col(c).alias(f"l_{c}") for c in last_cols],
    )
    aggs = [
        F.array_sort(F.collect_list(ord_struct)).alias("_evs"),
        F.min(order_cols[0]).alias("first_lsn"),
        F.max(order_cols[0]).alias("last_lsn"),
    ]
    if errors_col is not None:
        aggs.append(F.flatten(F.collect_list(errors_col)).alias("_errs"))
    g = changelog.groupBy(key).agg(*aggs)

    def ns(**over) -> str:
        fields = {
            "pre": over.get("pre", "acc.pre"),
            "pre_del": over.get("pre_del", "acc.pre_del"),
            "has_epoch": over.get("has_epoch", "acc.has_epoch"),
            "state": over.get("state", "acc.state"),
            "alive": over.get("alive", "acc.alive"),
            "orphans": over.get("orphans", "acc.orphans"),
        }
        for c in carry_cols:
            fields[f"c_{c}"] = over.get(f"c_{c}", f"acc.c_{c}")
        return "named_struct(" + ", ".join(
            f"'{k}', {v}" for k, v in fields.items()
        ) + ")"

    zero_over = {
        "pre": EMPTY, "pre_del": "false", "has_epoch": "false",
        "state": NULL_ARR, "alive": "false", "orphans": "0L",
    }
    for c in carry_cols:
        zero_over[f"c_{c}"] = f"CAST(NULL AS {types[c]})"
    zero = ns(**{k: v for k, v in zero_over.items()}).replace("acc.", "")
    i_over = {"has_epoch": "true", "state": f"coalesce(e.t, {EMPTY})",
              "alive": "true"}
    for c in carry_cols:
        i_over[f"c_{c}"] = f"e.c_{c}"
    step = f"""
    (acc, e) -> CASE
      WHEN e.op = 'I' THEN {ns(**i_over)}
      WHEN e.op = 'D' AND acc.has_epoch THEN {ns(state=NULL_ARR, alive="false")}
      WHEN e.op = 'D' THEN {ns(pre=EMPTY, pre_del="true", state=NULL_ARR,
                               alive="false")}
      WHEN e.op = 'U' AND acc.has_epoch AND acc.alive THEN {ns(
          state=f"concat(acc.state, coalesce(e.t, {EMPTY}))")}
      WHEN e.op = 'U' AND NOT acc.has_epoch AND NOT acc.pre_del THEN {ns(
          pre=f"concat(acc.pre, coalesce(e.t, {EMPTY}))")}
      WHEN e.op = 'U' THEN {ns(orphans="acc.orphans + 1L")}
      ELSE acc
    END
    """
    folded = F.expr(f"aggregate(_evs, {zero}, {step})")
    last_ev = F.element_at(F.col("_evs"), -1)
    out = [
        F.col(key),
        folded.getField("pre").alias("prefix_deltas"),
        folded.getField("pre_del").alias("prefix_delete"),
        folded.getField("has_epoch").alias("has_epoch"),
        folded.getField("state").alias("state"),
        folded.getField("alive").alias("alive"),
        folded.getField("orphans").alias("n_orphans"),
        F.col("first_lsn"),
        F.col("last_lsn"),
    ]
    out += [folded.getField(f"c_{c}").alias(c) for c in carry_cols]
    out += [last_ev.getField(f"l_{c}").alias(f"last_{c}") for c in last_cols]
    if errors_col is not None:
        out.append(F.col("_errs"))
    return g.select(*out)


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

def resolve_appends(
    table,
    folded: DataFrame,
    affected_buckets: list[int],
    key: str = "doc_id",
    tokens_col: str = "tokens",
    carry_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Turn per-key batch summaries into FULL winner rows against the
    table's current state: read ONLY the touched buckets (manifest-pruned,
    delta-resolved scan), left-join on the key, and apply the append
    algebra. Returns ``(winners, late, orphans)``:

    - winners — rows for the engine's standard merge paths: ``op`` (I when
      the batch's own epoch produced the row, U when it extended a stored
      sequence, D for tombstones), ``lsn`` = the key's last batch lsn (so
      whole-row LWW in the downstream merge supersedes the stored row),
      ``tokens``/``n_tok`` resolved, ``carry_cols`` from the epoch image
      (falling back to the stored value when the batch had no epoch).
      Orphan appends (nothing stored, no epoch) are dropped here — the
      fold already counted within-batch orphans (``n_orphans``);
      cross-batch ones come back as the ``orphans`` frame.
    - late — summary rows whose ``first_lsn`` is at or below the stored
      row's ``_ab_lsn``: appends cannot be replayed out of order
      (concatenation is not idempotent), so the caller enforces its late
      policy (strict raise / divert) instead of silently double-appending.
      Impossible under the engine's LSN-windowed batch replay (windows
      partition the LSN axis); reachable in streaming epochs.
    - orphans — keys whose batch carried only appends but NOTHING is
      stored (cross-batch orphans: deleted/never-created upstream). The
      caller counts and logs them — "counted and dropped, never silently
      applied" is the module policy, and the count must be observable.

    Append to a TOMBSTONED doc is suppressed like patch mode (the scan
    below is live-rows-only, so the stored side is NULL and the append is
    an orphan) — a tombstone is positive knowledge of deletion, and a
    suffix cannot reconstruct the row it extends.
    """
    import airbyte_spark.schemas as S

    cur = (
        table.scan(buckets=affected_buckets)
        .filter(F.col(S.COL_DELETED_AT).isNull())
        .select(
            F.col(key).alias("_t_key"),
            F.col(S.COL_LSN).alias("_t_lsn"),
            F.col(tokens_col).alias("_t_tokens"),
            *[F.col(c).alias(f"_t_{c}") for c in carry_cols],
        )
    )
    j = folded.join(cur, folded[key] == cur["_t_key"], "left")
    is_late = F.col("_t_lsn").isNotNull() & (
        F.col("first_lsn") <= F.col("_t_lsn")
    )
    late = j.filter(is_late).select(key, "first_lsn", "last_lsn",
                                    F.col("_t_lsn").alias("stored_lsn"))
    ok = j.filter(~is_late)
    has = F.col("has_epoch")
    dead = (has & ~F.col("alive")) | (~has & F.col("prefix_delete"))
    extended = ~has & ~F.col("prefix_delete") & F.col("_t_tokens").isNotNull()
    tokens = (
        F.when(has & F.col("alive"), F.col("state"))
        .when(extended, F.concat(F.col("_t_tokens"), F.col("prefix_deltas")))
    )
    op = (
        F.when(dead, F.lit(S.OP_DELETE))
        .when(has, F.lit(S.OP_INSERT))
        .otherwise(F.lit(S.OP_UPDATE))
    )
    orphans = ok.filter(~has & ~F.col("prefix_delete") & F.col("_t_tokens").isNull()).select(
        key, "first_lsn", "last_lsn"
    )
    out = ok.filter(dead | has | extended).select(
        op.alias("op"),
        F.col("last_lsn").alias("lsn"),
        F.col(key),
        tokens.alias(tokens_col),
        F.when(~dead, F.size(tokens)).alias("n_tok"),
        *[
            F.when(dead, F.lit(None).cast(dict(folded.dtypes)[c]))
            .when(has, folded[c])
            .otherwise(F.col(f"_t_{c}"))
            .alias(c)
            for c in carry_cols
        ],
        *[
            folded[c]
            for c in folded.columns
            if c.startswith("last_") and c != "last_lsn"
        ],
        *([folded["_errs"]] if "_errs" in folded.columns else []),
    )
    return out, late, orphans
