"""Unit tests for operators/packing.py: greedy in-order sequence packing
and deterministic hash split — exact bin assignment on constructed input,
shard-local (never global) window plan, split stability."""

from __future__ import annotations

from airbyte_spark.operators.packing import hash_split, pack_sequences, pack_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, doc_id long, n_tok long")


def test_pack_sequences_exact_bins(spark):
    # capacity 10, one shard: cum-before 0,4,9,15,18 -> bins 0,0,0,1,1
    d = _df(
        spark,
        [("a", 1, 4), ("a", 2, 5), ("a", 3, 6), ("a", 4, 3), ("a", 5, 7)],
    )
    out = {r["doc_id"]: r["bin"] for r in pack_sequences(d, 10, ["src"]).collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}


def test_pack_sequences_shard_independence(spark):
    # identical docs in two shards get identical bins independently
    d = _df(spark, [("a", 1, 8), ("a", 2, 8), ("b", 1, 8), ("b", 2, 8)])
    rows = pack_sequences(d, 10, ["src"]).collect()
    by = {(r["src"], r["doc_id"]): r["bin"] for r in rows}
    assert by[("a", 1)] == by[("b", 1)] == 0
    assert by[("a", 2)] == by[("b", 2)] == 0  # starts at cum 8 < 10


def test_pack_stats_straddle_counts_into_start_bin(spark):
    # doc 2 (size 9) starts at cum 8 -> bin 0; bin 0 totals 17 > capacity
    d = _df(spark, [("a", 1, 8), ("a", 2, 9)])
    s = {r["bin"]: r for r in pack_stats(d, 10, ["src"]).collect()}
    assert s[0]["n_docs"] == 2 and s[0]["tokens_total"] == 17
    assert s[0]["fill_pct"] == 170


def test_pack_window_is_shard_local_not_global(spark):
    d = _df(spark, [("a", 1, 4)])
    plan = pack_sequences(d, 10, ["src"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan  # a global ORDER BY would show one
    assert "hashpartitioning(src" in plan


def test_hash_split_deterministic_and_complete(spark):
    d = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(d.repartition(7)).collect()}
    assert a == b  # order/partitioning independent
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 700 < c["train"] < 900  # ~80% of 1000, loose band
