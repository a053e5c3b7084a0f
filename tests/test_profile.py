"""Column profiling (operators/profile.py): metric correctness incl. nulls,
the approx-distinct variant, and the one-job plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_spark.operators.profile import profile


def _df(spark):
    rows = [
        (1, "a", None),
        (2, "a", 5.0),
        (3, None, 6.0),
        (4, "b", None),
        (4, "b", 7.0),
    ]
    return spark.createDataFrame(rows, "id int, s string, v double")


def test_profile_metrics(spark):
    out = {r["column"]: r for r in profile(_df(spark)).collect()}
    assert set(out) == {"id", "s", "v"}
    r = out["id"]
    assert (r.n, r.n_null, r.n_distinct, r.min_val, r.max_val) == (5, 0, 4, "1", "4")
    r = out["s"]
    assert (r.n, r.n_null, r.n_distinct, r.min_val, r.max_val) == (5, 1, 2, "a", "b")
    r = out["v"]
    assert (r.n, r.n_null, r.n_distinct) == (5, 2, 3)


def test_profile_subset_and_order(spark):
    out = profile(_df(spark), ["v", "id"]).collect()
    assert [r["column"] for r in out] == ["id", "v"]  # deterministic by name


def test_profile_approx_variant(spark):
    out = {r["column"]: r for r in profile(_df(spark), approx_distinct=True).collect()}
    # HLL is exact at tiny cardinalities; n/null identical to exact form
    assert out["id"].n_distinct == 4 and out["s"].n_null == 1


def test_profile_is_one_aggregate_job(spark):
    df = _df(spark)
    plan = profile(df, ["id", "s"])._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over one scan: no join, no union of per-column subplans
    assert plan.count("Aggregate") <= 2  # partial+final at most
    assert "Join" not in plan and "Union" not in plan
