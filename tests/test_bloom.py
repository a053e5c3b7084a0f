"""Seen-key Bloom prefilter: no false negatives ever, deterministic
false positives that match a pure-Python reference bit-for-bit,
partitioning invariance, and a shuffle-free probe plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from airbyte_spark.operators.bloom import bloom_bits, bloom_probe

M, K = 256, 4  # tiny filter: dense fill -> false positives guaranteed


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _docs(spark, n=300, dup_every=7):
    """n docs; every dup_every-th repeats the text of its predecessor."""
    rows = []
    for i in range(n):
        t = f"text body number {i // dup_every * dup_every if i % dup_every == dup_every - 1 else i} padding"
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_positions(text: str, m: int, k: int) -> list[int]:
    h = hashlib.md5(text.encode()).hexdigest()
    return [int(h[6 * i : 6 * i + 6], 16) % m for i in range(k)]


def test_no_false_negatives_and_reference_exact(spark):
    d = _docs(spark)
    corpus = d.filter(F.col("doc_id") < 200)
    probe = d.filter(F.col("doc_id") >= 200)
    bits = bloom_bits(corpus, m=M, k=K)
    got = {
        r["doc_id"]: r["maybe_seen"]
        for r in bloom_probe(probe, bits, m=M, k=K).collect()
    }

    corpus_rows = corpus.collect()
    bitset = set()
    for r in corpus_rows:
        bitset.update(_py_positions(r["text"], M, K))
    corpus_texts = {r["text"] for r in corpus_rows}
    fp = 0
    for r in probe.collect():
        expect = int(all(p in bitset for p in _py_positions(r["text"], M, K)))
        assert got[r["doc_id"]] == expect, r["doc_id"]
        if r["text"] in corpus_texts:
            # a true duplicate can NEVER be missed
            assert got[r["doc_id"]] == 1, f"false negative on {r['doc_id']}"
        elif expect:
            fp += 1
    # the tiny dense filter must actually exhibit false positives, or the
    # test proves nothing about the maybe-side
    assert fp > 0


def test_partitioning_invariance(spark):
    d = _docs(spark)
    corpus, probe = d.filter("doc_id < 200"), d.filter("doc_id >= 200")
    a = sorted(
        map(tuple, bloom_probe(probe, bloom_bits(corpus, m=M, k=K), m=M, k=K)
            .select("doc_id", "maybe_seen").collect())
    )
    b = sorted(
        map(tuple, bloom_probe(
            probe.repartition(11, "text"),
            bloom_bits(corpus.repartition(13), m=M, k=K), m=M, k=K)
            .select("doc_id", "maybe_seen").collect())
    )
    assert a == b


def test_incremental_union_equals_one_shot(spark):
    """Appending per-batch position sets (union+distinct) == building the
    filter over the whole corpus at once."""
    d = _docs(spark)
    corpus = d.filter("doc_id < 200")
    b1 = bloom_bits(corpus.filter("doc_id < 100"), m=M, k=K)
    b2 = bloom_bits(corpus.filter("doc_id >= 100"), m=M, k=K)
    merged = b1.union(b2).distinct()
    one = bloom_bits(corpus, m=M, k=K)
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in one.collect()
    )


def test_probe_plan_has_no_exchange(spark):
    d = _docs(spark)
    bits = bloom_bits(d.filter("doc_id < 200"), m=M, k=K)
    spark.createDataFrame(
        [(r["pos"],) for r in bits.collect()], "pos long"
    ).createOrReplaceTempView("bloom_bits_mat")
    probe = bloom_probe(
        d.filter("doc_id >= 200"), spark.table("bloom_bits_mat"), m=M, k=K
    )
    plan = _explain(probe)
    assert "BroadcastHashJoin" in plan, plan
    # the batch side never shuffles: the only exchanges are broadcasts
    import re

    non_broadcast = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert not non_broadcast, plan
