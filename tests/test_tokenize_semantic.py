"""Unit tests for the corpus tokenizer (operators/tokenize.py) and the
SemDeDup-style semantic dedup (operators/semantic_dedup.py), each checked
against a pure-Python reference implementation — token-ARRAY equality for
the tokenizer (the driver gate only sees the md5 digest), keep/witness
verdicts for the dedup."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.semantic_dedup import semantic_dedup
from airbyte_spark.operators.tokenize import build_vocab, tokenize_corpus

DOCS = [
    (1, "the cat sat on the mat", "web"),
    (2, "the dog sat on the log", "web"),
    (3, "quantum flux capacitor hums", "books"),  # mostly OOV at small vocab
    (4, "the the the cat cat dog", "web"),
    (5, "on a mat on a log", "books"),
]


def _py_vocab(texts: list[str], vocab_top: int) -> dict[str, int]:
    tf: Counter[str] = Counter()
    for t in texts:
        tf.update(t.split(" "))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_top]
    return {w: i for i, (w, _) in enumerate(ranked)}

def _py_tokens(text: str, vocab: dict[str, int], oov: int) -> list[int]:
    return [vocab.get(w, oov) for w in text.split(" ")]


@pytest.mark.parametrize("vocab_top", [3, 8])
def test_tokenize_matches_python_reference(spark, vocab_top):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in tokenize_corpus(df, vocab_top=vocab_top).collect()
    }
    vocab = _py_vocab([t for _, t, _ in DOCS], vocab_top)
    for doc_id, text, source in DOCS:
        exp = _py_tokens(text, vocab, vocab_top)
        row = out[doc_id]
        assert row["tokens"] == exp, f"doc {doc_id}"
        assert row["n_tok"] == len(exp)
        assert row["n_oov"] == sum(1 for t in exp if t == vocab_top)
        assert row["source"] == source


def test_tokenize_order_independent_of_partitioning(spark):
    """Sequence order is carried in the data (array_sort over (pos, tid)
    structs), so the result must be identical under any partitioning."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    base = {r["doc_id"]: r["tokens"] for r in tokenize_corpus(df, vocab_top=4).collect()}
    shuffled = {
        r["doc_id"]: r["tokens"]
        for r in tokenize_corpus(df.repartition(7), vocab_top=4).collect()
    }
    assert base == shuffled


def test_vocab_ids_are_dense_frequency_ranks(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    got = {r["w"]: r["tid"] for r in build_vocab(df, vocab_top=5).collect()}
    assert got == dict(list(_py_vocab([t for _, t, _ in DOCS], 5).items()))


# ---------------------------------------------------------- semantic dedup


def _vecs():
    """8-dim vectors in two obvious clusters around centroid vectors 0/1,
    with exact and scaled near-duplicates injected."""
    base_a = [1.0, 0.0, 0.5, 0.0, 0.2, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.5, 0.0, 0.2, 0.0, 0.0]
    rows = [
        (0, base_a),
        (1, base_b),
        (2, base_a),                      # exact dup of 0
        (3, [x * 1.5 for x in base_a]),   # scaled dup: cosine 1 with 0/2
        (4, base_b),                      # exact dup of 1
        (5, [0.9, 0.1, 0.4, 0.1, 0.2, 0.0, 0.1, 0.0]),  # near a-cluster
        (6, [-1.0, 0.2, -0.5, 0.0, -0.2, 0.0, 0.0, 0.0]),  # anti-correlated
    ]
    return rows


def _py_semantic(rows, dim, n_clusters, cos_pct):
    q = {i: [math.floor(x * 1000) for x in v] for i, v in rows}
    cents = {i: q[i] for i, _ in rows if i < n_clusters}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assign = {
        i: min(cents, key=lambda c: (l2(v, cents[c]), c)) for i, v in q.items()
    }
    verdict = {}
    for i in q:
        witnesses = []
        for j in q:
            if j >= i or assign[j] != assign[i]:
                continue
            dot = sum(x * y for x, y in zip(q[i], q[j]))
            na2 = sum(x * x for x in q[j])
            nb2 = sum(x * x for x in q[i])
            if dot > 0 and 10000 * dot * dot >= cos_pct * cos_pct * na2 * nb2:
                witnesses.append(j)
        verdict[i] = (assign[i], min(witnesses) if witnesses else None)
    return verdict


def test_semantic_dedup_matches_python_reference(spark):
    rows = _vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["keep"], r["witness"])
        for r in semantic_dedup(df, dim=8, n_clusters=2, cos_pct=80).collect()
    }
    exp = _py_semantic(rows, 8, 2, 80)
    assert set(got) == set(exp)
    for i, (cluster, witness) in exp.items():
        g_cluster, g_keep, g_witness = got[i]
        assert g_cluster == cluster, f"vec {i} cluster"
        assert g_witness == witness, f"vec {i} witness"
        assert g_keep == (1 if witness is None else 0), f"vec {i} keep"
    # the scenario actually exercises both verdicts
    assert any(w is not None for _, w in exp.values())
    assert any(w is None for _, w in exp.values())


def test_semantic_dedup_exact_and_scaled_dups_drop(spark):
    rows = _vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in semantic_dedup(df, dim=8, n_clusters=2).collect()}
    # exact dup (2) and scaled dup (3) both fall to the canonical 0
    assert out[2]["keep"] == 0 and out[2]["witness"] == 0
    assert out[3]["keep"] == 0 and out[3]["witness"] == 0
    assert out[4]["keep"] == 0 and out[4]["witness"] == 1
    # canonical representatives and the anti-correlated vector survive
    assert out[0]["keep"] == 1 and out[1]["keep"] == 1 and out[6]["keep"] == 1


# ------------------------------------------------------------- detokenize


def test_detokenize_roundtrip_invariant(spark):
    """Zero-OOV docs decode bit-identically; OOV docs differ only at <unk>
    positions; roundtrip_ok is 1 everywhere (any 0 is a tokenizer bug)."""
    from airbyte_spark.operators.tokenize import detokenize_digest

    rows = [
        ("d1", "the cat sat on the mat", "s1"),
        ("d2", "the dog sat", "s1"),
        ("d3", "zebra xylophone quux", "s2"),  # all-OOV under a tiny vocab
        ("d4", "the the the cat cat dog", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {r["doc_id"]: r for r in detokenize_digest(df, vocab_top=4).collect()}
    assert all(r["roundtrip_ok"] == 1 for r in out.values())
    # d4 uses only the top-4 words (the, cat, dog, ...) -> zero OOV -> exact
    assert out["d4"]["n_oov"] == 0
    assert out["d4"]["decoded_md5"] == out["d4"]["words_md5"]
    # d3 is all-OOV -> digests differ but the invariant still holds
    assert out["d3"]["n_oov"] == out["d3"]["n_tok"]
    assert out["d3"]["decoded_md5"] != out["d3"]["words_md5"]


def test_detokenize_partitioning_invariance(spark):
    from airbyte_spark.operators.tokenize import detokenize_digest

    rows = [(f"d{i}", " ".join(f"w{(i * j) % 11}" for j in range(1, 14)), f"s{i % 3}")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    a = sorted(map(tuple, detokenize_digest(df, vocab_top=8).collect()))
    b = sorted(map(tuple, detokenize_digest(df.repartition(13), vocab_top=8).collect()))
    assert a == b
