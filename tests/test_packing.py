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


def test_chunk_documents_covers_and_reconstructs(spark):
    """Chunks tile the document: stride-prefixes of chunks 0..k-1 plus the
    final chunk concatenate back to the original text, every chunk is
    window-sized except possibly the last, and empty docs emit nothing."""
    from airbyte_spark.operators.packing import chunk_documents

    docs = [
        (1, "abcdefghij"),          # 10 chars: 3 chunks at w=4,s=3
        (2, "xy"),                  # shorter than one window
        (3, ""),                    # empty: no chunks
        (4, "a" * 7),               # exact boundary: starts 0,3,6
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = chunk_documents(df, window=4, stride=3).orderBy("doc_id", "chunk_idx")
    rows = out.collect()
    assert [r.doc_id for r in rows].count(3) == 0
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    texts = dict((d, t) for d, t in docs)
    for doc_id, chunks in by_doc.items():
        text = texts[doc_id]
        assert [c.chunk_start for c in chunks] == [
            i * 3 for i in range(len(chunks))
        ]
        # every chunk is full-width except possibly the final one
        assert all(c.chunk_len == 4 for c in chunks[:-1])
        assert chunks[-1].chunk_len == len(text) - chunks[-1].chunk_start
        # md5s match the real substrings (reconstruction via hashes)
        import hashlib
        for c in chunks:
            seg = text[c.chunk_start:c.chunk_start + 4]
            assert c.chunk_md5 == hashlib.md5(seg.encode()).hexdigest()


def test_pack_spans_contiguous_and_plan(spark):
    """Span map invariants: within a bin spans tile contiguously
    (start[i+1] == start[i] + len[i]); the shard's first span starts at 0;
    bin assignment matches pack_sequences; and the plan keeps ONE exchange
    (the per-bin row_number reuses the shard hash partitioning)."""
    from airbyte_spark.operators.packing import pack_sequences, pack_spans

    rows = [(s, f"d{s}{i:03d}", 700 + (i * 97) % 900)
            for s in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "shard int, doc_id string, n_tok int")
    spans = pack_spans(df, capacity=2048, shard_cols=["shard"])
    got = sorted(
        (r["shard"], r["bin"], r["pos_in_bin"], r["doc_id"],
         r["start_off"], r["n_tok"])
        for r in spans.collect()
    )
    by_bin: dict = {}
    for s, b, p, d, off, n in got:
        by_bin.setdefault((s, b), []).append((p, off, n))
    for (s, b), lst in by_bin.items():
        lst.sort()
        if b == 0:
            assert lst[0][1] == 0  # shard stream starts at offset 0
        for (p1, off1, n1), (p2, off2, n2) in zip(lst, lst[1:]):
            assert p2 == p1 + 1 and off2 == off1 + n1
    # bin assignment identical to pack_sequences
    seq = {(r["shard"], r["doc_id"]): r["bin"]
           for r in pack_sequences(df, 2048, ["shard"]).collect()}
    assert all(seq[(s, d)] == b for s, b, _, d, _, _ in got)
    # plan: ONE shuffle total (AQE prints the exchange in both the final
    # and initial plan sections — count the final section only), and the
    # per-bin row_number reuses it (no second hashpartitioning appears)
    plan = spans._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "SinglePartition" not in plan
