"""Two-pass Misra–Gries heavy hitters: exactness, superset guarantee,
partitioning-invariance, and the candidate-bounded plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.operators.heavy_hitters import heavy_hitters, mg_candidates


def _toy(spark, n_parts):
    # skewed stream: token "hot" ~30%, "warm" ~10%, long tail of uniques
    rows = []
    for i in range(3000):
        if i % 10 < 3:
            rows.append((["hot"],))
        elif i % 10 == 3:
            rows.append((["warm"],))
        else:
            rows.append(([f"t{i}"],))
    return spark.createDataFrame(rows, "toks array<string>").repartition(n_parts)


def _naive(df, k):
    ex = df.select(F.explode("toks").alias("token"))
    n = ex.count()
    return {
        (r["token"], r["cnt"])
        for r in ex.groupBy("token").agg(F.count("*").alias("cnt")).collect()
        if r["cnt"] * k > n
    }


def test_exact_vs_naive(spark):
    df = _toy(spark, 4)
    for k in (5, 20):
        got = {
            (r["token"], r["cnt"])
            for r in heavy_hitters(df, "toks", k=k).collect()
        }
        assert got == _naive(df, k)


def test_partitioning_invariance(spark):
    """The candidate set may vary with partitioning; the ANSWER may not."""
    base = _toy(spark, 1)
    expected = _naive(base, 8)
    for parts in (1, 3, 7):
        got = {
            (r["token"], r["cnt"])
            for r in heavy_hitters(_toy(spark, parts), "toks", k=8).collect()
        }
        assert got == expected


def test_candidates_superset_at_tight_capacity(spark):
    """capacity = k-1 is the theoretical minimum for the superset proof
    (freq > N/k => freq > N/(capacity+1) => survives some partition)."""
    df = _toy(spark, 4)
    k = 8
    cands = {r["token"] for r in mg_candidates(df, "toks", capacity=k - 1).collect()}
    true_hh = {t for t, _ in _naive(df, k)}
    assert true_hh <= cands
    # and the full operator stays exact at that capacity
    got = {(r["token"], r["cnt"]) for r in heavy_hitters(df, "toks", k=k, capacity=k - 1).collect()}
    assert got == _naive(df, k)


def test_plan_candidate_bounded(spark):
    """Pass 1 is a MapInPandas scan (no exchange below it); pass 2 joins
    the candidates via BROADCAST — the distinct-token vocabulary never
    hash-partitions across the wire."""
    df = _toy(spark, 4)
    out = heavy_hitters(df, "toks", k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
