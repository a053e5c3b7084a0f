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

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

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


def pack_spans(
    df: DataFrame,
    capacity: int,
    shard_cols: list[str],
    order_col: str = "doc_id",
    size_col: str = "n_tok",
) -> DataFrame:
    """Per-document SPAN map of the packed contexts — the attention-reset /
    loss-mask boundary metadata a pretraining packer ships with each
    context (block-diagonal attention over packed documents: the model
    must not attend across document boundaries inside one packed
    sequence, so the trainer needs each doc's (start offset, length)
    within its bin). One row per document: shard cols + (bin, pos_in_bin,
    order_col, start_off, n_tok); a straddling document's span may extend
    past ``capacity`` (the greedy no-lookahead contract — the trainer
    truncates or wraps it, both derivable from this map).

    Plan shape: ONE exchange — the running-sum window partitions by the
    shard, and the per-bin row_number's (shard, bin) clustering is
    satisfied by the same hash partitioning (subset rule), so only an
    extra shard-local sort is added. No SinglePartition at any scale.
    """
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    before = (cum - F.col(size_col)).cast("long")
    base = df.select(
        *shard_cols,
        order_col,
        F.col(size_col).cast("long").alias(size_col),
        before.alias("_before"),
        F.floor(before / F.lit(capacity)).cast("long").alias("bin"),
    )
    w2 = Window.partitionBy(*shard_cols, "bin").orderBy(order_col)
    return base.select(
        *shard_cols,
        "bin",
        (F.row_number().over(w2) - 1).cast("long").alias("pos_in_bin"),
        order_col,
        (F.col("_before") - F.col("bin") * F.lit(capacity))
        .cast("long")
        .alias("start_off"),
        size_col,
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


class PackBatchResult(NamedTuple):
    """Result of one incremental packing step (all lazy DataFrames)."""

    packed: DataFrame  # shard_cols + (order_col, size_col, bin)
    state: DataFrame  # shard_cols + (tokens_packed, max_order) — post-batch
    late: DataFrame  # batch rows rejected by the append-only order contract


def empty_pack_state(
    spark: SparkSession,
    batch_like: DataFrame,
    shard_cols: list[str],
    order_col: str = "doc_id",
) -> DataFrame:
    """An empty packer state with shard-column types taken from the batch
    schema: shard_cols + (tokens_packed long, max_order typed like
    ``order_col`` — the high-water comparison must use the order column's
    native ordering, never a lossy cast)."""
    fields = [batch_like.schema[c] for c in shard_cols]
    schema = StructType(
        [StructField(f.name, f.dataType, True) for f in fields]
        + [
            StructField("tokens_packed", LongType(), True),
            StructField(
                "max_order", batch_like.schema[order_col].dataType, True
            ),
        ]
    )
    return spark.createDataFrame([], schema)


def pack_incremental(
    batch: DataFrame,
    state: DataFrame,
    capacity: int,
    shard_cols: list[str],
    order_col: str = "doc_id",
    size_col: str = "n_tok",
) -> PackBatchResult:
    """One incremental step of greedy in-order packing: continue filling
    each shard's training contexts from a durable per-shard offset instead
    of re-packing the corpus.

    ``state`` holds one row per shard already packed into — ``tokens_packed``
    (the shard's running token total, i.e. exactly the cumulative sum a
    one-shot :func:`pack_sequences` would have reached) and ``max_order``
    (the largest ``order_col`` packed so far). Bin assignment for a batch
    row is then ``floor((tokens_packed + cum_before_within_batch) /
    capacity)`` — the same prefix sum as the one-shot pack, decomposed at
    the batch boundary.

    **Batching-invariance (the contract tests pin):** because a prefix sum
    decomposes over any split of an ordered sequence, packing a corpus in
    one batch or in any number of order-contiguous batches yields
    bit-identical (shard, doc, bin) assignments. The DuckDB oracle for the
    gated query is therefore the ONE-SHOT packing SQL — hash equality
    against it is a cross-engine proof of the invariance, not just of the
    arithmetic.

    **Append-only order contract:** greedy packing is history-dependent, so
    a row arriving with ``order_col <= max_order`` for its shard cannot be
    packed without rewriting already-emitted contexts. Such rows are
    returned in ``late`` (never silently packed out of order — same
    non-silence rule as connected_components' convergence check); the
    caller decides (raise, divert to a repair shard, or re-pack the shard).
    In the CDC pipeline they do not occur: packing consumes the deduped
    APPEND stream in LSN order, and updates/deletes are handled upstream by
    the LWW table, not by mutating training shards.

    Scale design (100 TB): ``state`` is one row per shard (metadata-scale —
    the shard key is a physical partition like source x date window), so the
    state join is a broadcast; the within-batch window is shard-local; the
    per-shard state update is a partial-combined aggregate over the batch.
    No global sort, no corpus re-scan, shuffle bounded by the batch.
    """
    st = F.broadcast(
        state.select(
            *shard_cols,
            F.col("tokens_packed").cast("long").alias("_st_tok"),
            # keep the order column's NATIVE type: a cast would null out
            # (e.g. string doc ids) and silently drop rows from BOTH the
            # late and the on-time side of the filter pair below
            F.col("max_order").alias("_st_mo"),
        )
    )
    b = batch.join(st, on=shard_cols, how="left").withColumn(
        "_off", F.coalesce(F.col("_st_tok"), F.lit(0)).cast("long")
    )
    is_late = F.col("_st_mo").isNotNull() & (
        F.col(order_col) <= F.col("_st_mo")
    )
    late = b.filter(is_late).select(*batch.columns)
    ok = b.filter(~is_late)

    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    packed = ok.select(
        *shard_cols,
        order_col,
        F.col(size_col).cast("long").alias(size_col),
        F.floor((F.col("_off") + cum - F.col(size_col)) / F.lit(capacity))
        .cast("long")
        .alias("bin"),
    )

    add = ok.groupBy(*shard_cols).agg(
        F.sum(size_col).cast("long").alias("_add_tok"),
        F.max(order_col).alias("_add_mo"),
    )
    new_state = (
        state.join(add, on=shard_cols, how="full")
        .select(
            *shard_cols,
            (
                F.coalesce(F.col("tokens_packed"), F.lit(0))
                + F.coalesce(F.col("_add_tok"), F.lit(0))
            )
            .cast("long")
            .alias("tokens_packed"),
            # greatest() skips NULLs, so a shard absent from either side
            # keeps the other side's high-water mark
            F.greatest(F.col("max_order"), F.col("_add_mo")).alias("max_order"),
        )
    )
    return PackBatchResult(packed, new_state, late)


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


class IncrementalPacker:
    """Durable, exactly-once training-shard packing over a CDC ingest.

    The missing last mile between the engine's deduped append stream and a
    training run: each batch of new (already deduped) documents is packed
    into fixed-capacity contexts CONTINUING each shard's partially-filled
    tail bin, and appended to a LakeTable of (shard, doc, n_tok, bin)
    assignments. The packer state — per-shard ``(tokens_packed,
    max_order)`` — rides the SAME commit's snapshot summary, so state and
    data can never diverge:

    - **exactly-once** — the commit carries ``batch_id``; a replayed batch
      is skipped by ``find_batch`` (at-least-once upstream, exactly-once
      shards), the same discipline as every other commit path
      (lake/table.py:22-26);
    - **crash-safe** — one atomic CAS commit per batch; there is no window
      where shards are written but state is stale (compare the reference's
      state-after-commit rule, airbyte-protocol.md state semantics);
    - **rollback-coherent** — ``LakeTable.rollback_to`` reverts data and
      (because state lives in the rolled-back lineage's summaries) packer
      state in the same action; freed batch ids legitimately re-apply,
      and re-applying them reproduces bit-identical bins (prefix sums are
      deterministic) — pinned by tests/test_packing_incremental.py;
    - **batching-invariant** — any order-contiguous batching of the same
      stream yields the same table content as a one-shot
      :func:`pack_sequences` (see :func:`pack_incremental`).

    State size is one summary entry per shard — metadata-scale by
    construction (the shard key is a physical partition: source x date /
    LSN range), the same bound as the rollup watermark and the checkpoint
    doc. A pipeline that wanted unbounded shard cardinality would spill
    state to its own bucketed table; at that point the shard key is wrong
    (packing quality only needs LOCAL order, so shards should stay coarse).
    """

    STATE_KEY = "pack_state"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        capacity: int,
        shard_cols: list[str],
        order_col: str = "doc_id",
        size_col: str = "n_tok",
    ):
        from airbyte_spark.lake.table import LakeTable

        self.spark = spark
        self.table = LakeTable(spark, root)
        self.capacity = int(capacity)
        self.shard_cols = list(shard_cols)
        self.order_col = order_col
        self.size_col = size_col

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        batch_like: DataFrame,
        capacity: int,
        shard_cols: list[str],
        order_col: str = "doc_id",
        size_col: str = "n_tok",
        num_buckets: int = 16,
    ) -> "IncrementalPacker":
        """Create the shard-assignment table. ``batch_like`` supplies the
        shard/order column types; ``order_col`` must be globally unique
        (it is the bucket key — the engine's doc id / LSN is)."""
        from airbyte_spark.lake.table import LakeTable

        fields = [
            StructField(f.name, f.dataType, True)
            for f in (batch_like.schema[c] for c in shard_cols)
        ] + [
            StructField(order_col, batch_like.schema[order_col].dataType, True),
            StructField(size_col, LongType(), True),
            StructField("bin", LongType(), True),
        ]
        LakeTable.create(
            spark,
            root,
            StructType(fields),
            primary_key=order_col,
            num_buckets=num_buckets,
            cursor_col=None,
            ts_col=order_col,  # unused: this table only ever appends
        )
        return IncrementalPacker(
            spark, root, capacity, shard_cols, order_col, size_col
        )

    # ------------------------------------------------------------- state

    def state_rows(self) -> list[dict]:
        """Current per-shard offsets, read from the newest pack commit on
        the EFFECTIVE lineage: walk parent pointers from the head, and when
        a rollback marker is met jump to its target so post-rollback reads
        see the rolled-back state, not the abandoned commits'."""
        t = self.table
        v: int | None = t.current_version()
        while v is not None and v >= 1:
            s = t.snapshot(v)
            op = s.summary.get("operation")
            if op == "rollback":
                v = int(s.summary["rollback_to"])
                continue
            if self.STATE_KEY in s.summary:
                return list(s.summary[self.STATE_KEY])
            v = s.parent
        return []

    def state_df(self) -> DataFrame:
        rows = self.state_rows()
        empty = empty_pack_state(
            self.spark,
            self.table.scan().select(*self.shard_cols, self.order_col),
            self.shard_cols,
            self.order_col,
        )
        if not rows:
            return empty
        return self.spark.createDataFrame(rows, empty.schema)

    # ------------------------------------------------------------- apply

    def pack_batch(
        self, batch: DataFrame, batch_id: str, strict: bool = True
    ) -> int | None:
        """Pack one deduped batch and append its shard assignments.
        Idempotent by ``batch_id`` (returns None if already applied).
        ``strict=True`` raises on rows violating the append-only order
        contract; ``strict=False`` excludes them and records ``late_rows``
        in the commit summary (never silent either way)."""
        from airbyte_spark.lineage import log_metric

        t = self.table
        if t.find_batch(batch_id) is not None:
            return None
        res = pack_incremental(
            batch,
            self.state_df(),
            self.capacity,
            self.shard_cols,
            self.order_col,
            self.size_col,
        )
        n_in = batch.count()
        late_n = res.late.count()
        if late_n and strict:
            raise ValueError(
                f"batch {batch_id}: {late_n} rows at or below a shard's "
                f"packed high-water mark ({self.order_col} <= max_order); "
                "greedy packing is append-only — re-pack the shard or pass "
                "strict=False to divert them"
            )
        if n_in - late_n == 0:
            # nothing packed (empty or all-late batch): marker commit keeps
            # the batch id durable without writing an empty data file;
            # state is unchanged, re-record it so the walk stops here
            ver = t.commit_metadata_only(
                {
                    "operation": "pack-append",
                    "batch_id": batch_id,
                    self.STATE_KEY: self.state_rows(),
                    "late_rows": int(late_n),
                    "capacity": self.capacity,
                }
            )
            log_metric("pack_batch", version=ver, batch_id=batch_id,
                       late_rows=int(late_n))
            return ver
        # tiny: one row per shard touched so far, deterministically ordered
        new_state = sorted(
            (r.asDict() for r in res.state.collect()),
            key=lambda d: tuple(str(d[c]) for c in self.shard_cols),
        )
        ver = t.write_and_commit(
            res.packed,
            replace_buckets=None,
            summary={
                "operation": "pack-append",
                "batch_id": batch_id,
                self.STATE_KEY: new_state,
                "late_rows": int(late_n),
                "capacity": self.capacity,
            },
        )
        log_metric(
            "pack_batch", version=ver, batch_id=batch_id, late_rows=int(late_n)
        )
        return ver

    def read(self) -> DataFrame:
        return self.table.scan()
