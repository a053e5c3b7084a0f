"""Arrow-vectorized validation: repair + flag, never drop
(BigQuerySqlGenerator.java:544-566 error-capture semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.functions.validate import apply_validation
from airbyte_spark.schemas import changelog_schema


def _mk(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], changelog_schema())


def test_ok_row_untouched(spark):
    df = _mk(spark, [("I", "d1", 1, 1, 0, [1, 2, 3], 3, "web")])
    r = apply_validation(df, vocab_size=100).first()
    assert r.tokens == [1, 2, 3] and r.n_tok == 3 and r._ab_meta.errors == []


def test_n_tok_mismatch_repaired(spark):
    df = _mk(spark, [("I", "d1", 1, 1, 0, [1, 2, 3], 7, "web")])
    r = apply_validation(df, vocab_size=100).first()
    assert r.n_tok == 3 and r._ab_meta.errors == ["n_tok_mismatch"]


def test_oov_normalized(spark):
    df = _mk(spark, [("I", "d1", 1, 1, 0, [1, 250, -3], 3, "web")])
    r = apply_validation(df, vocab_size=100).first()
    assert r.tokens == [1, 50, 97]  # mod-vocab normalization (python % semantics)
    assert r._ab_meta.errors == ["oov_tokens"]


def test_both_errors(spark):
    df = _mk(spark, [("I", "d1", 1, 1, 0, [150], 9, "web")])
    r = apply_validation(df, vocab_size=100).first()
    assert set(r._ab_meta.errors) == {"oov_tokens", "n_tok_mismatch"}
    assert r.n_tok == 1 and r.tokens == [50]


def test_delete_null_passthrough(spark):
    df = _mk(spark, [("D", "d1", 1, 1, 0, None, None, None)])
    r = apply_validation(df, vocab_size=100).first()
    assert r.tokens is None and r.n_tok is None and r._ab_meta.errors == []


def test_vectorized_batch(spark):
    rows = []
    for i in range(500):
        bad = i % 7 == 0
        rows.append(("I", f"d{i}", i + 1, i, 0, [i % 100], 1 if not bad else 5, "web"))
    df = _mk(spark, rows).repartition(4)
    out = apply_validation(df, vocab_size=100)
    flagged = out.filter(F.array_contains("_ab_meta.errors", "n_tok_mismatch")).count()
    assert flagged == len([i for i in range(500) if i % 7 == 0])
    assert out.filter(F.col("n_tok") != F.size("tokens")).count() == 0
