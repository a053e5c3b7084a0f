"""Exact percentile cutoffs: percentile_disc-exact vs a pure-Python
reference, grouped and ungrouped, partitioning invariance, and a plan
with no SinglePartition window for grouped calibration."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.quantiles import percentile_cutoffs

PCTS = [1, 10, 50, 90, 99, 100]


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _ref(scores: list[int], pct: int) -> int:
    """percentile_disc: smallest value whose cumulative count reaches
    ceil(pct*n/100)."""
    s = sorted(scores)
    rank = -(-pct * len(s) // 100)  # ceil
    return s[rank - 1]


def _df(spark, seed=7):
    rng = random.Random(seed)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(1, 50) * rng.randrange(1, 4))
        for _ in range(500)
    ]
    return spark.createDataFrame(rows, "grp string, score long"), rows


def test_grouped_matches_reference(spark):
    df, rows = _df(spark)
    got = {
        (r["grp"], r["pct"]): (r["cutoff"], r["n_rows"])
        for r in percentile_cutoffs(df, "score", PCTS, ["grp"]).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, s in rows:
        by_g.setdefault(g, []).append(s)
    for g, scores in by_g.items():
        for p in PCTS:
            assert got[(g, p)] == (_ref(scores, p), len(scores)), (g, p)


def test_ungrouped_and_invariance(spark):
    df, rows = _df(spark)
    out = percentile_cutoffs(df, "score", [50, 90]).collect()
    scores = [s for _, s in rows]
    got = {r["pct"]: r["cutoff"] for r in out}
    assert got == {50: _ref(scores, 50), 90: _ref(scores, 90)}
    re_out = {
        r["pct"]: r["cutoff"]
        for r in percentile_cutoffs(
            df.repartition(17, "score"), "score", [50, 90]
        ).collect()
    }
    assert re_out == got


def test_null_scores_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", None)], "grp string, score long"
    )
    rows = percentile_cutoffs(df, "score", [50, 100], ["grp"]).collect()
    got = {r["pct"]: (r["cutoff"], r["n_rows"]) for r in rows}
    assert got == {50: (1, 2), 100: (3, 2)}


def test_bad_pct_rejected(spark):
    df, _ = _df(spark)
    with pytest.raises(ValueError):
        percentile_cutoffs(df, "score", [0])
    with pytest.raises(ValueError):
        percentile_cutoffs(df, "score", [101])


def test_grouped_plan_no_single_partition(spark):
    df, _ = _df(spark)
    plan = _explain(percentile_cutoffs(df, "score", PCTS, ["grp"]))
    assert "SinglePartition" not in plan, plan
    # exactly one corpus-scale aggregate feeds everything downstream:
    # partial aggregation must appear before the (grp, score) exchange
    assert "partial" in plan.lower(), plan


# ---------------------------------------------------------------- adaptive


def _adaptive_ref(rows, pct):
    """Python reference for adaptive_filter_summary."""
    by_g: dict[str, list[int]] = {}
    for g, s in rows:
        by_g.setdefault(g, []).append(s)
    out = {}
    for g, scores in by_g.items():
        cut = _ref(scores, pct)
        kept = [s for s in scores if s >= cut]
        out[g] = (cut, len(scores), len(kept), len(scores) - len(kept), sum(kept))
    return out


def test_adaptive_summary_matches_reference(spark):
    from airbyte_spark.operators.quantiles import adaptive_filter_summary

    df, rows = _df(spark)
    got = {
        r["grp"]: (r["cutoff"], r["n_docs"], r["n_kept"], r["n_dropped"], r["kept_score_sum"])
        for r in adaptive_filter_summary(df, "score", 25, ["grp"]).collect()
    }
    assert got == _adaptive_ref(rows, 25)


def test_adaptive_rows_match_summary(spark):
    """adaptive_filter (row level) keeps exactly the rows the summary
    counts, per group."""
    from airbyte_spark.operators.quantiles import adaptive_filter, adaptive_filter_summary

    df, rows = _df(spark)
    kept = adaptive_filter(df, "score", 25, ["grp"])
    per_g = {r["grp"]: r["cnt"] for r in kept.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    summ = {r["grp"]: r["n_kept"] for r in adaptive_filter_summary(df, "score", 25, ["grp"]).collect()}
    assert per_g == summ
    # every kept row individually clears its group's cutoff
    ref = _adaptive_ref(rows, 25)
    for r in kept.collect():
        assert r["score"] >= ref[r["grp"]][0]


def test_adaptive_summary_plan_no_single_partition(spark):
    """The grouped path must never collapse to a SinglePartition sort or
    window — calibration and tallies both run partitioned by group."""
    from airbyte_spark.operators.quantiles import adaptive_filter_summary

    df, _ = _df(spark)
    plan = _explain(adaptive_filter_summary(df, "score", 25, ["grp"]))
    assert "SinglePartition" not in plan


def test_adaptive_validation(spark):
    from airbyte_spark.operators.quantiles import adaptive_filter_summary

    df, _ = _df(spark)
    with pytest.raises(ValueError):
        adaptive_filter_summary(df, "score", 0, ["grp"])
    with pytest.raises(ValueError):
        adaptive_filter_summary(df, "score", 25, [])
