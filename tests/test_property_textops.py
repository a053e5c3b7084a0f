"""Randomized cross-checks of the corpus-hygiene and packing operators
against independent pure-Python references — the same discipline as
test_property_replay (fuzz the distributed implementation against a
single-threaded oracle that shares no code with it)."""

from __future__ import annotations

import random

import pytest

from airbyte_spark.operators.packing import pack_sequences
from airbyte_spark.operators.text_quality import dup_ngram_fraction


def _rand_corpus(seed: int, n_docs: int = 120, vocab: int = 12):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 9))))
        for i in range(n_docs)
    ]


def _py_dup_ngram(corpus, k=3):
    """Independent reference: per-doc distinct k-grams, corpus doc-frequency,
    duplicated fraction."""
    grams = {}
    for doc_id, text in corpus:
        w = text.split(" ")
        gs = {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)} if len(w) >= k else set()
        if gs:
            grams[doc_id] = gs
    from collections import Counter

    df = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for doc_id, gs in grams.items():
        dup = sum(1 for g in gs if df[g] >= 2)
        out[doc_id] = (len(gs), dup, (100 * dup) // len(gs))
    return out


@pytest.mark.parametrize("seed", [1, 22, 333])
def test_dup_ngram_fraction_matches_python_reference(spark, seed):
    corpus = _rand_corpus(seed)
    d = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_pct"])
        for r in dup_ngram_fraction(d, k=3, cache_grams=False).collect()
    }
    assert got == _py_dup_ngram(corpus)


def _py_pack(rows, capacity):
    """Reference: per-shard in-order running sum, bin = cum_before // cap."""
    out = {}
    by_shard: dict = {}
    for src, doc_id, n in sorted(rows, key=lambda r: (r[0], r[1])):
        cum = by_shard.get(src, 0)
        out[(src, doc_id)] = cum // capacity
        by_shard[src] = cum + n
    return out


@pytest.mark.parametrize("seed,capacity", [(5, 17), (66, 100), (777, 1)])
def test_pack_sequences_matches_python_reference(spark, seed, capacity):
    rng = random.Random(seed)
    rows = [
        (f"s{rng.randint(0, 3)}", i, rng.randint(0, 40)) for i in range(200)
    ]
    d = spark.createDataFrame(rows, "src string, doc_id long, n_tok long")
    got = {
        (r["src"], r["doc_id"]): r["bin"]
        for r in pack_sequences(d.repartition(7), capacity, ["src"]).collect()
    }
    assert got == _py_pack(rows, capacity)
