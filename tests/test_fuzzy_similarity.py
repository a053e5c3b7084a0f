"""Property tests for the fuzzy-dedup and similarity operators (their exact
values are gated against DuckDB oracles in test_entry.py; these check the
semantic properties a user relies on)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.fuzzy_dedup import (
    embedding_neardup_pairs,
    lsh_bands,
    minhash_lsh_groups,
    ngram_jaccard_pairs,
    simhash_groups,
)
from airbyte_spark.operators.similarity import knn_bruteforce, knn_lsh

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    """documents + injected exact duplicates (testdata itself has none)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionByName(dups).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _quant(pdf):
    return {
        int(r["vec_id"]): np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1000).astype(
            np.int64
        )
        for _, r in pdf.iterrows()
    }


def test_identical_texts_collide_in_every_band(spark, docs):
    """Exact duplicates must share all LSH band keys (minhash is a pure
    function of the shingle set)."""
    dups = (
        docs.groupBy("text").agg(F.collect_list("doc_id").alias("ids"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .toPandas()
    )
    assert len(dups) > 0, "testdata has no exact dup texts; property untestable"
    bands = lsh_bands(docs).toPandas()
    keyed = bands.set_index(["doc_id", "band"])["band_key"]
    for ids in dups["ids"]:
        a, b = sorted(ids)[:2]
        for band in range(8):
            assert keyed[(a, band)] == keyed[(b, band)]


def test_exact_dups_survive_jaccard_at_100(spark, docs):
    pairs = ngram_jaccard_pairs(docs, jaccard_pct=100).toPandas()
    texts = docs.toPandas().set_index("doc_id")["text"]
    assert len(pairs) > 0
    for _, p in pairs.iterrows():
        assert p["inter"] == p["uni"]
    # every exact-dup pair is found (LSH has no false negatives for jaccard=1)
    dup_groups = texts.groupby(texts).groups
    for _, ids in dup_groups.items():
        ids = sorted(int(i) for i in ids)
        if len(ids) >= 2:
            a, b = ids[0], ids[1]
            hit = ((pairs["a_id"] == a) & (pairs["b_id"] == b)).any()
            assert hit, f"missing exact-dup pair ({a},{b})"


def test_simhash_identical_for_identical_text(spark, docs):
    groups = simhash_groups(docs).toPandas()
    n_docs = docs.count()
    assert groups["group_size"].sum() == n_docs


def test_minhash_groups_cover_exact_dups(spark, docs):
    g = minhash_lsh_groups(docs).toPandas()
    assert (g["group_size"] >= 2).all()


def test_knn_bruteforce_matches_numpy(spark, emb):
    got = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5), top_k=3).toPandas()
    q = _quant(emb.toPandas())
    for qid in range(5):
        dots = {cid: int(np.dot(q[qid], v)) for cid, v in q.items() if cid != qid}
        expect = sorted(dots.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert [(int(r["neighbor_id"]), int(r["dot"])) for _, r in sub.iterrows()] == expect


def test_knn_lsh_is_subset_of_bucket(spark, emb):
    """Every LSH result shares the query's sign-bit bucket and its dot is
    exact (verified against numpy)."""
    got = knn_lsh(emb, emb.filter(F.col("vec_id") < 5), top_k=3).toPandas()
    q = _quant(emb.toPandas())

    def bucket(v):
        return sum((1 << b) for b in range(8) if v[b] >= 0)

    for _, r in got.iterrows():
        qv, cv = q[int(r["query_id"])], q[int(r["neighbor_id"])]
        assert bucket(qv) == bucket(cv)
        assert int(r["dot"]) == int(np.dot(qv, cv))


def test_embedding_neardup_threshold(spark, emb):
    pairs = embedding_neardup_pairs(emb, cos_pct=80).toPandas()
    q = _quant(emb.toPandas())
    for _, r in pairs.iterrows():
        a, b = q[int(r["a_id"])], q[int(r["b_id"])]
        dot = float(np.dot(a, b))
        cos = dot / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.79  # integer test admits >= 0.8 up to quantization


def test_connected_components_chain_and_clique(spark):
    """Hash-min label propagation closes chains and merges cliques."""
    from airbyte_spark.operators.components import (
        connected_components,
        dedup_components,
    )

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),      # chain -> component 1, size 4
            (10, 11), (11, 12), (10, 12),  # triangle -> component 10, size 3
            (20, 21),                    # pair -> component 20, size 2
        ],
        "a_id bigint, b_id bigint",
    )
    cc = {r["doc_id"]: r["component_id"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    groups = {
        r["component_id"]: (r["group_size"], r["keep_doc_id"])
        for r in dedup_components(pairs).collect()
    }
    assert groups == {1: (4, 1), 10: (3, 10), 20: (2, 20)}


def test_ngram_jaccard_superbucket_cap(spark):
    """An adversarial identical-shingle corpus (one bucket of m docs) must
    not emit m^2 pairs: capped buckets are excluded, small buckets still
    verified."""
    from airbyte_spark.operators.fuzzy_dedup import ngram_jaccard_pairs

    same = [(i, "aa bb cc dd ee ff gg hh") for i in range(200)]  # superbucket
    near = [(1000, "xx yy zz ww vv"), (1001, "xx yy zz ww vv")]  # small bucket
    df = spark.createDataFrame(same + near, "doc_id bigint, text string")
    out = ngram_jaccard_pairs(df, max_bucket_size=64, log_dropped=True).collect()
    ids = {r["a_id"] for r in out} | {r["b_id"] for r in out}
    assert ids == {1000, 1001}, f"superbucket members leaked pairs: {sorted(ids)[:5]}"
    assert len(out) == 1


def test_dedup_components_by_priority(spark):
    from airbyte_spark.operators.components import dedup_components_by_priority

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a_id", "b_id"]
    )
    pri = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 7)], ["doc_id", "priority"]
    )
    out = {
        r["component_id"]: r
        for r in dedup_components_by_priority(pairs, pri).collect()
    }
    # ties on priority 9 break to the smaller doc_id
    assert out[1]["keep_doc_id"] == 2 and out[1]["keep_priority"] == 9
    assert out[1]["group_size"] == 3
    # doc 11 has NO priority row -> loses to the scored doc 10
    assert out[10]["keep_doc_id"] == 10 and out[10]["keep_priority"] == 7


def test_embedding_neardup_banding(spark):
    """Banded sign-bit LSH: a near-dup pair whose FIRST band disagrees is
    still found through a later band (disjoint bit slices); duplicate
    collisions across bands yield ONE pair; invalid band geometry raises."""
    import pytest

    from airbyte_spark.operators.fuzzy_dedup import embedding_neardup_pairs

    base = [0.125] * 64  # unit-ish norm: the integer test must not overflow
    flip0 = list(base)
    flip0[0] = -0.125  # band 0 (bits 0-11) differs; bands 1-3 agree
    rows = [(0, base), (1, base), (2, flip0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # single 12-bit table misses (0,2)/(1,2): sign bit 0 differs
    one = embedding_neardup_pairs(df, cos_pct=80, n_bits=12, n_bands=1,
                                  cache_quantized=False)
    assert {(r.a_id, r.b_id) for r in one.collect()} == {(0, 1)}

    # 4 bands recover them via bands 1-3 (cosine of flip0 vs base is
    # 62/64 = 0.968 >= 0.8); identical vectors collide in EVERY band but
    # emit one pair each
    four = embedding_neardup_pairs(df, cos_pct=80, n_bits=12, n_bands=4,
                                   cache_quantized=False)
    got = sorted((r.a_id, r.b_id) for r in four.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]

    with pytest.raises(ValueError, match="n_bands"):
        embedding_neardup_pairs(df, n_bits=16, n_bands=5)


def test_semantic_dedup_auto_clusters(spark):
    """auto_clusters = max(16, isqrt(n)); semantic_dedup('auto') equals an
    explicit k of the same value (pure function of the corpus)."""
    from airbyte_spark.operators.semantic_dedup import auto_clusters, semantic_dedup

    assert auto_clusters(0) == 16
    assert auto_clusters(255) == 16
    assert auto_clusters(400) == 20
    assert auto_clusters(1_000_000) == 1000

    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    auto = semantic_dedup(df, dim=8, n_clusters="auto").toPandas()
    pinned = semantic_dedup(df, dim=8, n_clusters=16).toPandas()  # isqrt(40)=6 -> 16
    a = auto.sort_values("vec_id").reset_index(drop=True)
    p = pinned.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(p)
