"""Incremental near-dup index (operators/incremental_dedup.py). Gated laws:

1. BATCHING INDEPENDENCE: any ordered batch partition of the corpus yields
   the identical flagged set as a one-shot run (cap disabled);
2. equivalence with the batch operator: the one-shot flagged set equals
   {b_id} of ngram_jaccard_pairs over the full corpus;
3. parquet round-trip of the index changes nothing;
4. the super-bucket cap suppresses boilerplate pair blowup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.operators.fuzzy_dedup import ngram_jaccard_pairs
from airbyte_spark.operators.incremental_dedup import (
    SignatureBatch,
    append_index,
    incremental_neardup_flags,
    signature_batch,
)

# base sentences long enough to shingle (k=3); near-dups differ by a short
# suffix (high Jaccard), distinct docs share nothing
_BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "large scale data pipelines need careful partitioning and shuffle hygiene",
    "training corpora are deduplicated with minhash signatures and lsh bands",
    "completely unrelated sentence about cooking pasta with garlic and olive oil",
    "spark structured streaming handles late data with watermarks and state",
]


def _corpus(spark):
    rows = []
    for i, t in enumerate(_BASE):
        rows.append((10 * i, t))
        rows.append((10 * i + 3, t))  # exact dup (same batch region)
        rows.append((10 * i + 27, t + " tail"))  # near dup, later id
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(df_flags):
    return sorted(
        (r.doc_id, r.dup_of) for r in df_flags.collect()
    )


def test_batching_independence_and_batch_operator_equivalence(spark):
    corpus = _corpus(spark)
    # one-shot: whole corpus as a single cold-start batch
    one = incremental_neardup_flags(
        signature_batch(corpus), None, max_bucket_size=None
    )
    # incremental: three ordered batches, index accumulated (kept + dropped)
    batches = [
        corpus.filter(F.col("doc_id") < 15),
        corpus.filter((F.col("doc_id") >= 15) & (F.col("doc_id") < 40)),
        corpus.filter(F.col("doc_id") >= 40),
    ]
    index = None
    inc_flags = []
    for b in batches:
        sb = signature_batch(b)
        inc_flags.extend(
            _flags(incremental_neardup_flags(sb, index, max_bucket_size=None))
        )
        index = append_index(index, sb)
    assert sorted(inc_flags) == _flags(one)
    # equivalence with the batch operator's pair relation
    pairs = ngram_jaccard_pairs(corpus, max_bucket_size=None, cache_bands=False)
    dropped = {r.b_id for r in pairs.select("b_id").distinct().collect()}
    assert {d for d, _ in _flags(one)} == dropped
    # and the planted structure is actually found: every base sentence's
    # copies are flagged against the original
    flagged = dict(_flags(one))
    for i in range(len(_BASE)):
        assert flagged[10 * i + 3] == 10 * i
        assert flagged[10 * i + 27] == 10 * i


def test_unbatched_vs_differently_batched(spark):
    corpus = _corpus(spark)
    # adversarial split: batch boundaries interleave id ranges arbitrarily
    odd = corpus.filter(F.col("doc_id") % 2 == 1)
    even = corpus.filter(F.col("doc_id") % 2 == 0)
    sb1, sb2 = signature_batch(even), signature_batch(odd)
    got = sorted(
        _flags(incremental_neardup_flags(sb1, None, max_bucket_size=None))
        + _flags(incremental_neardup_flags(sb2, sb1, max_bucket_size=None))
    )
    one = _flags(
        incremental_neardup_flags(signature_batch(corpus), None, max_bucket_size=None)
    )
    assert got == one


def test_index_parquet_roundtrip(spark, tmp_path):
    corpus = _corpus(spark)
    first = corpus.filter(F.col("doc_id") < 30)
    rest = corpus.filter(F.col("doc_id") >= 30)
    sb = signature_batch(first)
    sb.bands.write.parquet(str(tmp_path / "bands"))
    sb.shingles.write.parquet(str(tmp_path / "shingles"))
    loaded = SignatureBatch(
        bands=spark.read.parquet(str(tmp_path / "bands")),
        shingles=spark.read.parquet(str(tmp_path / "shingles")),
    )
    live = _flags(
        incremental_neardup_flags(signature_batch(rest), sb, max_bucket_size=None)
    )
    cold = _flags(
        incremental_neardup_flags(signature_batch(rest), loaded, max_bucket_size=None)
    )
    assert live == cold and live  # non-empty: cross-batch dups exist


def test_super_bucket_cap_suppresses_boilerplate(spark):
    # 80 identical docs -> every band bucket holds 80 > 64: with the cap all
    # pair generation from those buckets is suppressed
    boiler = spark.createDataFrame(
        [(i, _BASE[0]) for i in range(80)], "doc_id long, text string"
    )
    sb = signature_batch(boiler)
    assert incremental_neardup_flags(sb, None, max_bucket_size=64).count() == 0
    assert incremental_neardup_flags(sb, None, max_bucket_size=None).count() == 79
