"""Partial-update (patch) CDC fold — column-wise last-writer-wins.

Reference semantics: sources that replicate with partial row images emit
update envelopes carrying only the CHANGED fields — MongoDB's change
streams are the reference's canonical case (the connector assembles state
from partial updates; airbyte-integrations/connectors/source-mongodb-v2,
docs/understanding-airbyte/cdc.md), and MySQL `binlog_row_image=MINIMAL`
behaves the same way. A column absent from the envelope means "unchanged";
a column explicitly set to NULL rides a ``null_fields`` list so the two
cases stay distinguishable after JSON extraction (where both surface as
SQL NULL).

Spark-first design — one shuffle on the key, associative everywhere:

1. a window over (key ORDER BY lsn) assigns full-image EPOCHS: every
   insert or delete starts one (a full image supersedes all earlier
   patches; a delete voids them);
2. rows outside each key's latest epoch are dropped (max-epoch via a
   second window over the SAME partitioning — no extra exchange);
3. ONE hash aggregate folds the surviving epoch column-wise:
   ``max_by(value, lsn-if-present)`` per payload column. max_by is
   associative + commutative, so Catalyst's partial/final split gives the
   same two-phase local/global combine that makes whole-row LWW skew-proof
   — a hot doc_id ships at most one partial row per map task.

``resolve_patches`` then turns folded patch rows into FULL table rows by
reading only the touched buckets of the current snapshot (manifest-pruned
scan) and coalescing column-wise — after which the standard commit paths
(merge-on-read delta append, bucket CoW, full merge) apply unchanged.

Spark's ``max_by(x, y)`` skips NULL ``y`` rows but KEEPS a NULL ``x`` at
the winning ``y`` — exactly what explicit-null patches need. DuckDB's
``arg_max`` instead skips NULL args, so the oracle formulation uses
per-column winning-lsn windows (``max(CASE WHEN present THEN lsn END)
OVER (PARTITION BY key)`` + ``MAX(CASE WHEN lsn = wl THEN col END)``),
which matches Spark's semantics value-for-value.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbyte_spark import schemas as S

_EPOCH = "_ab_epoch"
_MAXEPOCH = "_ab_epoch_max"


def touched_col(c: str) -> str:
    return f"_touched_{c}"


def fold_patches(
    df: DataFrame,
    payload_cols: Sequence[str],
    key: str = "doc_id",
    order_col: str = "lsn",
    op_col: str = "op",
    null_fields_col: str | None = "_ab_null_fields",
    carry_cols: Iterable[str] = (),
    errors_col: str | None = None,
) -> DataFrame:
    """Fold a patch-style changelog to ONE row per key.

    Output columns: key, op (head op of the winning epoch: 'I' full image,
    'U' patch needing resolution, 'D' tombstone), order_col (epoch max —
    the row's effective cursor), ts_ms of the last event, every payload
    column (column-wise LWW over PRESENT values) plus ``_touched_<c>``
    flags (int 0/1 — whether any event in the epoch set the column), and
    ``carry_cols`` taken from the last event.

    Presence of column c on an event: op=='I' -> all columns present;
    op=='U' -> present iff the value is non-NULL OR c appears in
    ``null_fields_col`` (explicit null); op=='D' -> nothing present.

    ``errors_col``: optional array<string> column (e.g. _ab_meta.errors
    pre-extracted) folded as the sorted distinct union over the epoch —
    a patch row's repairs may come from several events.
    """
    if null_fields_col is not None and null_fields_col in df.columns:
        nf = F.coalesce(F.col(null_fields_col), F.array().cast("array<string>"))
    else:
        nf = F.array().cast("array<string>")

    w_ord = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy(key)
    df = df.withColumn(
        _EPOCH,
        F.sum(F.when(F.col(op_col).isin(S.OP_INSERT, S.OP_DELETE), 1).otherwise(0)).over(
            w_ord
        ),
    )
    # max-epoch filter reuses the same hashpartitioning(key) exchange
    df = df.withColumn(_MAXEPOCH, F.max(_EPOCH).over(w_key)).filter(
        F.col(_EPOCH) == F.col(_MAXEPOCH)
    )

    is_i = F.col(op_col) == S.OP_INSERT
    is_u = F.col(op_col) == S.OP_UPDATE
    aggs: list = [
        F.min_by(op_col, F.col(order_col)).alias(op_col),
        F.max(order_col).alias(order_col),
        F.max_by("ts_ms", F.col(order_col)).alias("ts_ms"),
    ]
    for c in payload_cols:
        explicit_null = F.array_contains(nf, F.lit(c))
        present = is_i | (is_u & (F.col(c).isNotNull() | explicit_null))
        val = F.when(is_u & explicit_null, F.lit(None)).otherwise(F.col(c))
        y = F.when(present, F.col(order_col))
        aggs.append(F.max_by(val, y).alias(c))
        aggs.append(F.max(present.cast("int")).alias(touched_col(c)))
    for c in carry_cols:
        aggs.append(F.max_by(c, F.col(order_col)).alias(c))
    if errors_col is not None:
        aggs.append(
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.coalesce(F.col(errors_col), F.array().cast("array<string>"))
                        )
                    )
                )
            ).alias(errors_col)
        )
    return df.groupBy(key).agg(*aggs)


def resolve_patches(
    table,
    folded: DataFrame,
    payload_cols: Sequence[str],
    affected_buckets: list[int],
    key: str = "doc_id",
) -> DataFrame:
    """Turn folded patch rows into FULL rows against the table's current
    state: read ONLY the touched buckets (manifest-pruned, delta-resolved
    scan), left-join on the key, and coalesce column-wise — a patched
    column takes the fold's value, an untouched one keeps the stored value
    (NULL when the doc was never seen or was tombstoned: the reference
    upserts what it has, missing fields land NULL).

    A full-image ('I') or tombstone ('D') winner ignores the stored row
    entirely; only 'U' winners coalesce. The stored row can never be newer
    than the fold under bounded replay (batches are LSN-windowed above the
    checkpoint), so no cursor comparison is needed here — the downstream
    whole-row LWW merge still enforces it.

    Tombstone interaction (the asymmetry is deliberate, and mirrors WHY
    tombstones are retained in storage at all):
    - patch to a TOMBSTONED doc -> suppressed (dropped from the winners): a
      tombstone is positive knowledge of deletion, and a partial image
      cannot resurrect a row it cannot reconstruct. Within a batch the
      epoch fold already enforces this (a delete starts a new epoch whose
      head op wins); this extends the rule across batches.
    - patch to an UNKNOWN doc -> kept, untouched columns NULL: no-knowledge
      is not deletion — the reference upserts what it has rather than drop
      delivered data.
    - 'D' winners write NULL payloads even when trailing same-epoch patches
      carried values (those patches are voided by the delete they follow).
    """
    cur = table.scan(buckets=affected_buckets).select(
        F.col(key).alias("_t_key"),
        F.col(S.COL_DELETED_AT).alias("_t_deleted"),
        *[F.col(c).alias(f"_t_{c}") for c in payload_cols],
    )
    joined = folded.join(cur, folded[key] == cur["_t_key"], "left")
    is_u = F.col("op") == S.OP_UPDATE
    is_d = F.col("op") == S.OP_DELETE
    joined = joined.filter(~(is_u & F.col("_t_deleted").isNotNull()))
    out = []
    for c in folded.columns:
        if c in payload_cols:
            out.append(
                F.when(is_d, F.lit(None).cast(dict(folded.dtypes)[c]))
                .when(is_u & (F.col(touched_col(c)) == 0), F.col(f"_t_{c}"))
                .otherwise(folded[c])
                .alias(c)
            )
        elif c.startswith("_touched_"):
            continue
        else:
            out.append(folded[c])
    return joined.select(*out)
