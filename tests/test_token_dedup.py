"""Token-span dedup (operators/token_dedup.py): planted verbatim overlap
is found, boilerplate spans are excluded, short docs contribute nothing,
membership is deterministic under repartition, and the plan is equi-join
shaped (no cartesian, digests on the exchange)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.token_dedup import (
    doc_spans,
    token_span_pairs,
    token_span_pairs_oracle_sql,
)


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 words


def _corpus(spark, extra=()):
    """Docs 1 and 2 embed the same 12-word sentence (5 shared 8-windows);
    all other docs are span-disjoint."""
    rows = [
        (1, "one two three " + SHARED + " four five six"),
        (2, "seven eight " + SHARED + " nine ten"),
        (3, "completely different words with no overlap at all here today"),
        (4, "short doc"),  # < 8 tokens: zero windows
        *extra,
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_overlap_found_and_short_docs_silent(spark):
    out = token_span_pairs(_corpus(spark), k=8).collect()
    assert [(r.doc_a, r.doc_b, r.n_shared_spans) for r in out] == [(1, 2, 5)]
    # the 12-word shared run yields exactly 12 - 8 + 1 = 5 windows
    assert doc_spans(_corpus(spark).filter("doc_id = 4"), k=8).count() == 0


def test_min_shared_threshold(spark):
    assert token_span_pairs(_corpus(spark), k=8, min_shared=6).count() == 0
    assert token_span_pairs(_corpus(spark), k=8, min_shared=5).count() == 1


def test_boilerplate_spans_excluded(spark):
    # 70 docs all containing one identical 8-word footer: digest appears in
    # 70 > max_docs_per_span=64 docs -> excluded, no pair explosion
    footer = "standard legal footer text with all rights reserved"  # 8 words
    extra = [(100 + i, f"unique{i} filler{i} " + footer) for i in range(70)]
    out = token_span_pairs(_corpus(spark, extra), k=8, max_docs_per_span=64)
    assert [(r.doc_a, r.doc_b) for r in out.collect()] == [(1, 2)]
    # raising the cap brings the boilerplate pairs back
    out2 = token_span_pairs(_corpus(spark, extra), k=8, max_docs_per_span=128)
    assert out2.count() == 1 + (70 * 69) // 2


def test_stride_sampling_still_catches_long_runs(spark):
    # stride 4 keeps windows at positions 1,5,9,...; the shared run spans
    # positions long enough that at least one sampled window lands inside
    out = token_span_pairs(_corpus(spark), k=8, stride=4, min_shared=1).collect()
    assert {(r.doc_a, r.doc_b) for r in out} <= {(1, 2)}


def test_determinism_under_repartition(spark):
    d = _corpus(spark)
    a = sorted(map(tuple, token_span_pairs(d, k=8).collect()))
    b = sorted(
        map(tuple, token_span_pairs(d.repartition(7, "text"), k=8).collect())
    )
    assert a == b


def test_matches_duckdb_oracle(spark):
    pdf = _corpus(spark).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql(token_span_pairs_oracle_sql("docs", k=8)).df()
    got = token_span_pairs(_corpus(spark), k=8).toPandas()
    key = ["doc_a", "doc_b"]
    assert sorted(map(tuple, got[key + ["n_shared_spans"]].itertuples(index=False))) == \
        sorted(map(tuple, want[key + ["n_shared_spans"]].itertuples(index=False)))


def test_plan_is_equijoin_on_digests(spark):
    plan = _explain(token_span_pairs(_corpus(spark), k=8, cache_spans=False))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # candidate generation is a hash/sort-merge equi-join keyed by the digest
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_excise_duplicate_spans_keep_first_semantics(spark):
    """Hand-checkable ExactSubstr removal: the globally-first occurrence of
    each duplicated window survives; later occurrences (cross-doc AND
    within-doc) are cut; sub-k docs and unique text are untouched; a doc
    that is entirely someone else's text empties out."""
    from airbyte_spark.operators.token_dedup import (
        excise_duplicate_spans,
        tokens_sql,
    )
    from airbyte_spark.plans import textsql as X

    shared = "a b c d e f g h"          # exactly one 8-token window
    rows = [
        (1, shared + " unique tail one two three"),  # first occurrence: kept whole
        (2, shared),                                  # pure duplicate: empties
        (3, "totally different words with no reuse at all"),
        (4, "tiny doc"),                              # < k tokens: untouched
        (5, shared + " " + shared),                   # within-doc repeat of doc1's span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in excise_duplicate_spans(df, k=8).collect()}

    n_orig = {
        r["doc_id"]: r["n"]
        for r in df.selectExpr(
            "doc_id", f"size({tokens_sql(X.SPARK)}) AS n"
        ).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["n_tok"] == n_orig[1]
    assert out[2]["n_tok"] == 0 and out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 0 and out[4]["n_tok"] == 2
    # doc5: 16 tokens, every 8-window duplicated vs doc1/2 or internally
    assert out[5]["n_tok"] == 0 and out[5]["n_removed"] == 16

    # partitioning-independence: the witness rule is a total order
    out7 = {
        r["doc_id"]: (r["n_tok"], r["n_removed"], list(r["tokens"]))
        for r in excise_duplicate_spans(df.repartition(7), k=8).collect()
    }
    assert out7 == {
        k: (v["n_tok"], v["n_removed"], list(v["tokens"])) for k, v in out.items()
    }
