"""Unit tests for operators/text_quality.py: duplicated n-gram fraction,
benchmark contamination, and PII scrubbing — exact values on constructed
inputs, plus the broadcast plan gate for the contamination join."""

from __future__ import annotations

from airbyte_spark.operators.text_quality import (
    contamination_check,
    dup_ngram_fraction,
    pii_scrub,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_ngram_fraction_exact(spark):
    # doc 1 and doc 2 are identical -> every gram duplicated (100%);
    # doc 3 shares no gram; doc 4 shares its first gram with docs 1/2.
    d = _docs(
        spark,
        [
            (1, "a b c d"),          # grams: "a b c", "b c d"
            (2, "a b c d"),
            (3, "x y z"),            # gram: "x y z"
            (4, "a b c q"),          # grams: "a b c", "b c q"
        ],
    )
    out = {r["doc_id"]: r for r in dup_ngram_fraction(d, k=3).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_dup_grams"] == 2
    assert out[1]["dup_pct"] == 100
    assert out[3]["n_grams"] == 1 and out[3]["n_dup_grams"] == 0
    assert out[3]["dup_pct"] == 0
    assert out[4]["n_grams"] == 2 and out[4]["n_dup_grams"] == 1
    assert out[4]["dup_pct"] == 50


def test_dup_ngram_fraction_short_docs_excluded(spark):
    d = _docs(spark, [(1, "a b"), (2, "a b c")])
    got = {r["doc_id"] for r in dup_ngram_fraction(d, k=3).collect()}
    assert got == {2}  # < k words -> no grams -> no row


def test_contamination_check_exact(spark):
    bench = _docs(spark, [(100, "p q r s t u")])  # 5-grams: pqrst, qrstu
    corpus = _docs(
        spark,
        [
            (1, "z z p q r s t z"),   # contains "p q r s t" -> 1 overlap
            (2, "p q r s t u"),        # full copy -> 2 overlaps
            (3, "no overlap here at all friend"),
        ],
    )
    out = {r["doc_id"]: r for r in contamination_check(corpus, bench, k=5).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_overlap_grams"] == 1 and out[1]["n_bench_docs"] == 1
    assert out[2]["n_overlap_grams"] == 2 and out[2]["n_bench_docs"] == 1


def test_contamination_join_is_broadcast(spark):
    bench = _docs(spark, [(100, "p q r s t u")])
    corpus = _docs(spark, [(1, "p q r s t u")])
    plan = contamination_check(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_exact(spark):
    d = _docs(
        spark,
        [
            (1, "write to bob7@mail.com or sue9@mail.org today"),
            (2, "call 555-1234 or 555-99 now"),
            (3, "both bob@x.io and 555-1 here"),
            (4, "clean text with no pii"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert out[1]["scrubbed"] == "write to <EMAIL> or <EMAIL> today"
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 2
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_emails"] == 1 and out[3]["n_phones"] == 1
    assert out[3]["scrubbed"] == "both <EMAIL> and <PHONE> here"
    assert out[4]["scrubbed"] == "clean text with no pii"


def test_pii_scrub_no_shuffle(spark):
    d = _docs(spark, [(1, "x y z")])
    plan = pii_scrub(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_scrub_realworld_forms(spark):
    d = _docs(
        spark,
        [
            (1, "write Bob.Smith@Example.COM today"),
            (2, "dial (212) 867-5309 or 212-867-5309 now"),
            (3, "odd a_b+c%d@mail-host.co.uk form"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["scrubbed"]
    assert out[2]["n_phones"] == 2
    assert out[2]["scrubbed"] == "dial <PHONE> or <PHONE> now"
    assert out[3]["n_emails"] == 1 and "<EMAIL>" in out[3]["scrubbed"]


def test_regexp_replace_all_rejects_unsafe_tokens():
    import pytest

    from airbyte_spark.plans import textsql as X

    for bad in ("it's", "a\\b"):
        with pytest.raises(ValueError):
            X.REGEXP_REPLACE_ALL(X.SPARK, "text", bad, "ok")
    with pytest.raises(ValueError):
        X.REGEXP_REPLACE_ALL(X.SPARK, "text", "ok", "$1")


def test_quality_classifier_matches_oracle_and_labels(spark):
    import duckdb

    from airbyte_spark.operators.text_quality import (
        quality_classifier,
        quality_classifier_oracle_sql,
    )

    rows = [(i, f"w{i % 7} w{i % 7} common shared tokens {'x' * (i % 3 + 1)}")
            for i in range(60)]
    d = _docs(spark, rows)
    got = quality_classifier(d, vocab_top=5, cache_counts=False).toPandas()
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    want = con.sql(quality_classifier_oracle_sql("docs", vocab_top=5)).df()
    key = ["doc_id", "score", "label"]
    assert sorted(map(tuple, got[key].itertuples(index=False))) == sorted(
        map(tuple, want[key].itertuples(index=False))
    )
    assert set(got.label) <= {"keep", "maybe", "drop"}
    assert len(got) == 60  # every doc scored, even all-out-of-vocab ones


def test_quality_classifier_out_of_vocab_scores_zero(spark):
    from airbyte_spark.operators.text_quality import quality_classifier

    # vocab_top=1 -> only the most frequent word ("common", 3x) is in
    # vocabulary; doc 9 has none of it -> score exactly 0, still present
    d = _docs(spark, [
        (1, "common common common rare"),
        (9, "totally outside vocabulary words"),
    ])
    out = {r.doc_id: r for r in
           quality_classifier(d, vocab_top=1, cache_counts=False).collect()}
    assert out[9].score == 0 and out[9].label == "maybe"
    assert out[1].score != 0


def test_quality_classifier_vocab_join_is_broadcast(spark):
    from airbyte_spark.operators.text_quality import quality_classifier
    from tests.test_plans import _explain as _ex  # shared plan helper

    plan = _ex(quality_classifier(
        _docs(spark, [(1, "a b c")]), cache_counts=False
    ))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
