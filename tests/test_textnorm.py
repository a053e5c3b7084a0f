"""Unicode cleanup: NFC equivalence, control stripping, whitespace
collapse, NULL passthrough, narrow-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.functions.textnorm import clean_text, unicode_clean


def test_nfc_composes_and_strips(spark):
    rows = [
        (1, "Cafe\u0301  x"),  # decomposed -> composed, spaces collapse
        (2, "Caf\u00e9 x"),    # already composed
        (3, "a\x00b\x07c"),           # controls stripped
        (4, "  lead\t\tmid  trail  "),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {r["i"]: r["c"] for r in clean_text(df, "t", "c").collect()}
    assert got[1] == got[2] == "Caf\u00e9 x"  # NFC makes them identical
    assert got[3] == "abc"
    assert got[4] == "lead mid trail"
    assert got[5] is None


def test_newlines_preserved(spark):
    df = spark.createDataFrame([(1, "a  b\nc\t\td")], "i int, t string")
    assert clean_text(df, "t", "c").first()["c"] == "a b\nc d"


def test_clean_is_narrow(spark):
    df = spark.createDataFrame([(1, "x")], "i int, t string")
    plan = (
        df.select(unicode_clean(F.col("t")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the one honest Arrow UDF (NFC)
