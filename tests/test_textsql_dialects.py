"""Dialect-equivalence property gate for plans/textsql.py.

Every template emits a Spark and a DuckDB expression that must be
value-identical; where the two dialects use DIFFERENT native functions
(hexn_sql / hex16_sql use conv() on Spark vs digit arithmetic on DuckDB,
AINTERSECT is order-scrambled), the equivalence is no longer true by
construction — this suite pins it empirically over randomized inputs so a
dialect regression can never silently skew an oracle comparison.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from airbyte_spark.plans import textsql as X


def _rand_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)] + ["café", "naïve", "東京", "a'b"]
    out = []
    for _ in range(n):
        k = rng.randint(0, 30)
        out.append(" ".join(rng.choice(vocab) for _ in range(k)))
    return out


def _spark_vals(spark, texts: list[str], expr: str) -> list:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r[0] for r in df.selectExpr(f"{expr} AS v").collect()]


def _duck_vals(texts: list[str], expr: str) -> list:
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
        return [r[0] for r in con.sql(f"SELECT {expr} AS v FROM t").fetchall()]
    finally:
        con.close()


@pytest.mark.parametrize("start,n", [(1, 12), (13, 12), (1, 4), (5, 8)])
def test_hexn_conv_matches_digit_arithmetic(spark, start, n):
    texts = _rand_texts(64, seed=start * 100 + n)
    s = _spark_vals(spark, texts, X.hexn_sql(X.SPARK, "md5(text)", start, n))
    d = _duck_vals(texts, X.hexn_sql(X.DUCKDB, "md5(text)", start, n))
    assert s == d
    assert all(v is not None and 0 <= v < 16**n for v in s)


def test_hex16_matches(spark):
    texts = _rand_texts(64, seed=7)
    s = _spark_vals(spark, texts, X.hex16_sql(X.SPARK, "text"))
    d = _duck_vals(texts, X.hex16_sql(X.DUCKDB, "text"))
    assert s == d


def test_minhash_signature_matches(spark):
    texts = [t for t in _rand_texts(40, seed=11) if len(t.split()) >= 3]
    sh_s = X.shingles_sql(X.SPARK, "text", 3)
    sh_d = X.shingles_sql(X.DUCKDB, "text", 3)
    s = _spark_vals(spark, texts, X.minhash_sql(X.SPARK, sh_s, 16))
    d = _duck_vals(texts, X.minhash_sql(X.DUCKDB, sh_d, 16))
    assert [list(v) for v in s] == [list(v) for v in d]


def test_simhash_matches(spark):
    texts = [t for t in _rand_texts(40, seed=13) if len(t.split()) >= 3]
    s = _spark_vals(spark, texts, X.simhash16_sql(X.SPARK, X.shingles_sql(X.SPARK, "text", 3)))
    d = _duck_vals(texts, X.simhash16_sql(X.DUCKDB, X.shingles_sql(X.DUCKDB, "text", 3)))
    assert s == d


def test_aintersect_size_matches(spark):
    """Order differs between engines by contract; SIZE must not."""
    texts = _rand_texts(64, seed=17)
    ex_s = X.SIZE(
        X.SPARK,
        X.AINTERSECT(
            X.SPARK,
            X.ADISTINCT(X.SPARK, X.SPLIT_WORDS(X.SPARK, "text")),
            "array('w1','w2','w3','café')",
        ),
    )
    ex_d = X.SIZE(
        X.DUCKDB,
        X.AINTERSECT(
            X.DUCKDB,
            X.ADISTINCT(X.DUCKDB, X.SPLIT_WORDS(X.DUCKDB, "text")),
            "['w1','w2','w3','café']",
        ),
    )
    assert _spark_vals(spark, texts, ex_s) == _duck_vals(texts, ex_d)


def test_rolling_hash_matches(spark):
    texts = _rand_texts(48, seed=19) + ["", "x"]
    s = _spark_vals(spark, texts, X.rolling_hash_sql(X.SPARK, "text"))
    d = _duck_vals(texts, X.rolling_hash_sql(X.DUCKDB, "text"))
    assert s == d


@pytest.mark.parametrize("w", [1, 3, 10])
def test_lines_matches(spark, w):
    texts = _rand_texts(48, seed=23 + w) + ["", "x", "a b"]
    s = _spark_vals(spark, texts, X.lines_sql(X.SPARK, "text", w))
    d = _duck_vals(texts, X.lines_sql(X.DUCKDB, "text", w))
    assert [list(v) for v in s] == [list(v) for v in d]
    # every word lands in exactly one line, in order
    for t, lines in zip(texts, s):
        assert " ".join(lines) == t


def _pii_texts(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    bits = [
        "plain words here", "a1@b2.com", "x@y.io and z9@q.org", "555-123",
        "not-an-email @ nope", "call 555-9 or 555-12345", "UPPER@CASE.COM",
        "", "café 東京", "trailing dot a@b.c.", "555-", "u@d.net555-1",
    ]
    return [" ".join(rng.choice(bits) for _ in range(rng.randint(0, 5))) for _ in range(n)]


def test_regexp_count_matches(spark):
    from airbyte_spark.operators.text_quality import EMAIL_PAT, PHONE_PAT

    texts = _pii_texts(64, seed=11)
    for pat in (EMAIL_PAT, PHONE_PAT):
        s = _spark_vals(spark, texts, X.REGEXP_COUNT(X.SPARK, "text", pat))
        d = _duck_vals(texts, X.REGEXP_COUNT(X.DUCKDB, "text", pat))
        assert s == d


def test_regexp_replace_all_matches(spark):
    from airbyte_spark.operators.text_quality import EMAIL_PAT, PHONE_PAT

    texts = _pii_texts(64, seed=13)
    se = X.REGEXP_REPLACE_ALL(X.SPARK, "text", EMAIL_PAT, "<EMAIL>")
    de = X.REGEXP_REPLACE_ALL(X.DUCKDB, "text", EMAIL_PAT, "<EMAIL>")
    s = _spark_vals(spark, texts, X.REGEXP_REPLACE_ALL(X.SPARK, se, PHONE_PAT, "<PHONE>"))
    d = _duck_vals(texts, X.REGEXP_REPLACE_ALL(X.DUCKDB, de, PHONE_PAT, "<PHONE>"))
    assert s == d
