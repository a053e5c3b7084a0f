"""Incremental training-shard packing (operators/packing.py).

Pins the contracts of pack_incremental / IncrementalPacker:

- batching-invariance: any order-contiguous batching of the same stream
  yields bit-identical (shard, doc, bin) assignments to one-shot
  pack_sequences — the prefix sum decomposes at batch boundaries;
- append-only order contract: rows at or below a shard's packed
  high-water mark are never silently packed (strict raises, non-strict
  diverts + records the count);
- durable packer: exactly-once by batch id, state rides the commit
  summary (cannot diverge from data), rollback rewinds data AND state
  together, and re-applying freed batches reproduces identical bins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.packing import (
    IncrementalPacker,
    empty_pack_state,
    pack_incremental,
    pack_sequences,
)

CAP = 100


def _corpus(spark, n=60, shards=("a", "b", "c")):
    """Deterministic (shard, doc_id, n_tok) rows: sizes 7..67, shards
    round-robin so every shard sees a spread of fills."""
    rows = [
        (shards[i % len(shards)], i, 7 + (i * 13) % 61) for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, "src string, doc_id long, n_tok long")


def _bins(df):
    return {
        (r.src, r.doc_id): (r.n_tok, r.bin)
        for r in df.select("src", "doc_id", "n_tok", "bin").collect()
    }


def _split(df, bounds):
    """Order-contiguous batches: (lo, hi] slices on doc_id."""
    out = []
    lo = 0
    for hi in bounds:
        out.append(df.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)))
        lo = hi
    return out


@pytest.mark.parametrize("bounds", [[60], [20, 40, 60], [1, 2, 30, 59, 60]])
def test_batching_invariance(spark, bounds):
    corpus = _corpus(spark)
    oneshot = _bins(pack_sequences(corpus, CAP, ["src"]))

    state = empty_pack_state(spark, corpus, ["src"])
    got = {}
    for b in _split(corpus, bounds):
        res = pack_incremental(b, state, CAP, ["src"])
        assert res.late.count() == 0
        got.update(_bins(res.packed))
        state = res.state
    assert got == oneshot

    # final state's tokens_packed == each shard's total (the one-shot cumsum)
    totals = {
        r.src: r.tok
        for r in corpus.groupBy("src").agg(F.sum("n_tok").alias("tok")).collect()
    }
    final = {r.src: (r.tokens_packed, r.max_order) for r in state.collect()}
    assert {s: t for s, (t, _) in final.items()} == totals
    max_orders = {
        r.src: r.mo
        for r in corpus.groupBy("src").agg(F.max("doc_id").alias("mo")).collect()
    }
    assert {s: mo for s, (_, mo) in final.items()} == max_orders


def test_late_rows_diverted_not_packed(spark):
    corpus = _corpus(spark, n=20)
    b1, b2 = _split(corpus, [10, 20])
    r1 = pack_incremental(b1, empty_pack_state(spark, corpus, ["src"]), CAP, ["src"])
    # replay rows 5..15: 5..10 are at/below each shard's high-water mark
    replay = corpus.filter((F.col("doc_id") > 4) & (F.col("doc_id") <= 15))
    r2 = pack_incremental(replay, r1.state, CAP, ["src"])
    late_ids = sorted(r.doc_id for r in r2.late.collect())
    assert late_ids == [5, 6, 7, 8, 9, 10]
    packed_ids = sorted(r.doc_id for r in r2.packed.collect())
    assert packed_ids == [11, 12, 13, 14, 15]
    # the on-time rows get the SAME bins as an uninterrupted run
    full = _bins(pack_sequences(corpus.filter(F.col("doc_id") <= 15), CAP, ["src"]))
    got = _bins(r2.packed)
    assert all(full[k] == v for k, v in got.items())


def test_durable_packer_exactly_once_and_invariant(spark, workdir):
    corpus = _corpus(spark)
    root = f"{workdir}/pack"
    p = IncrementalPacker.create(spark, root, corpus, CAP, ["src"])

    batches = _split(corpus, [20, 40, 60])
    versions = [p.pack_batch(b, f"pk-{i}") for i, b in enumerate(batches)]
    assert all(v is not None for v in versions)

    # exactly-once: re-applying any batch is a no-op
    assert p.pack_batch(batches[1], "pk-1") is None
    assert p.table.current_version() == versions[-1]

    got = _bins(p.read())
    assert got == _bins(pack_sequences(corpus, CAP, ["src"]))

    # state in the head summary matches the data
    totals = {
        r.src: r.tok
        for r in corpus.groupBy("src").agg(F.sum("n_tok").alias("tok")).collect()
    }
    assert {d["src"]: d["tokens_packed"] for d in p.state_rows()} == totals


def test_durable_packer_strict_raises_on_late(spark, workdir):
    corpus = _corpus(spark, n=20)
    root = f"{workdir}/pack"
    p = IncrementalPacker.create(spark, root, corpus, CAP, ["src"])
    b1, b2 = _split(corpus, [10, 20])
    p.pack_batch(b1, "s-0")
    overlap = corpus.filter((F.col("doc_id") > 5) & (F.col("doc_id") <= 20))
    with pytest.raises(ValueError, match="append-only"):
        p.pack_batch(overlap, "s-1")
    # non-strict: diverts, records the count, packs the on-time remainder
    v = p.pack_batch(overlap, "s-1", strict=False)
    assert v is not None
    assert p.table.snapshot(v).summary["late_rows"] == 5
    assert _bins(p.read()) == _bins(pack_sequences(corpus, CAP, ["src"]))


def test_durable_packer_all_late_batch_is_marker_commit(spark, workdir):
    corpus = _corpus(spark, n=10)
    root = f"{workdir}/pack"
    p = IncrementalPacker.create(spark, root, corpus, CAP, ["src"])
    p.pack_batch(corpus, "m-0")
    before = p.state_rows()
    nfiles = len(p.table.snapshot().files)
    v = p.pack_batch(corpus.filter(F.col("doc_id") <= 5), "m-1", strict=False)
    assert v is not None
    assert p.table.snapshot(v).summary["late_rows"] == 5
    assert len(p.table.snapshot(v).files) == nfiles  # no data written
    assert p.state_rows() == before
    # idempotent too
    assert p.pack_batch(corpus.filter(F.col("doc_id") <= 5), "m-1") is None


def test_rollback_rewinds_state_and_replay_is_bit_identical(spark, workdir):
    corpus = _corpus(spark)
    root = f"{workdir}/pack"
    p = IncrementalPacker.create(spark, root, corpus, CAP, ["src"])
    batches = _split(corpus, [20, 40, 60])
    v1 = p.pack_batch(batches[0], "rb-0")
    p.pack_batch(batches[1], "rb-1")
    p.pack_batch(batches[2], "rb-2")
    full = _bins(p.read())
    state_v1 = [
        dict(d) for d in IncrementalPacker(spark, root, CAP, ["src"]).state_rows()
    ]

    # roll back to just after batch 0: data AND packer state rewind together
    p.table.rollback_to(v1)
    assert _bins(p.read()) == {
        k: v for k, v in full.items() if k[1] <= 20
    }
    assert {d["src"]: d["max_order"] for d in p.state_rows()} == {
        "a": 18, "b": 19, "c": 20,
    }

    # freed batch ids legitimately re-apply and reproduce identical bins
    assert p.pack_batch(batches[1], "rb-1") is not None
    assert p.pack_batch(batches[2], "rb-2") is not None
    assert _bins(p.read()) == full
    del state_v1
