"""URL canonicalization edge cases + URL-dedup keep semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.operators.urls import (
    canonicalize_url,
    registrable_domain,
    url_dedup,
)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/a/b?utm_source=x&b=2&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/", "https://example.com/"),
    ("https://example.com:8080/x", "https://example.com:8080/x"),  # non-default port kept
    ("https://sub.Example.com/p?fbclid=abc&gclid=1&utm_medium=m",
     "https://sub.example.com/p"),  # tracking-only query -> no '?'
    ("https://example.com/q?z=1&y=2&z=0",
     "https://example.com/q?y=2&z=0&z=1"),  # params sorted, duplicates kept
    ("https://www.a.co.uk/", "https://a.co.uk/"),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], "i int, url string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_registrable_domain_naive(spark):
    df = spark.createDataFrame(
        [(1, "https://sub.deep.example.com/x"), (2, "https://a.co.uk/")],
        "i int, c string",
    )
    got = {r["i"]: r["d"] for r in df.select("i", registrable_domain(F.col("c")).alias("d")).collect()}
    assert got[1] == "example.com"
    assert got[2] == "co.uk"  # documented naive (no PSL) behavior


def test_url_dedup_min_witness(spark):
    rows = [
        (10, "https://example.com/a?utm_source=x"),
        (3, "HTTPS://WWW.example.com:443/a"),   # same canonical as 10
        (7, "https://example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df, "url").collect()}
    assert out[3]["keep"] and not out[10]["keep"]  # min id wins
    assert out[7]["keep"]
    assert out[3]["url_canonical"] == out[10]["url_canonical"] == "https://example.com/a"
    assert out[7]["domain"] == "example.com"


def test_canonicalize_is_narrow(spark):
    df = spark.createDataFrame([(1, "https://e.com/")], "i int, url string")
    plan = (
        df.select(canonicalize_url(F.col("url")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
