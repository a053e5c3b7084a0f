"""Distributed global rank / curriculum ordering (operators/ranking.py).

Pins: exact equality with the naive global-window rank, determinism under
repartitioning, the equal-population tier contract, and the scale shape —
no SinglePartition stage anywhere in the plan (a global ORDER BY window
would show one).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from airbyte_spark.operators.ranking import bucketed_global_rank, curriculum_order


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # skewed integer quality with heavy ties — the hard case for ranking
        (F.col("id") % 37 + (F.col("id") % 5) * 11).cast("long").alias("quality"),
    )


def test_bucketed_rank_equals_naive_window(spark):
    d = _docs(spark)
    got = bucketed_global_rank(
        d,
        bucket=(-F.floor(F.col("quality") / F.lit(16))).cast("long"),
        order=[F.col("quality").desc(), F.col("doc_id").asc()],
        rank_col="r",
        total_col="n",
    )
    from pyspark.sql.window import Window

    naive = d.withColumn(
        "r_naive",
        F.row_number().over(
            Window.orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        ),
    )
    joined = got.join(naive, ["doc_id", "quality"]).collect()
    assert all(r.r == r.r_naive for r in joined)
    assert all(r.n == 400 for r in joined)


def test_curriculum_determinism_under_repartition(spark):
    d = _docs(spark, 500)
    a = sorted(map(tuple, curriculum_order(d).collect()))
    b = sorted(map(tuple, curriculum_order(d.repartition(13, "quality")).collect()))
    assert a == b


def test_curriculum_tier_contract(spark):
    out = curriculum_order(_docs(spark, 503), n_bins=10).collect()
    # curriculum_pos is a permutation of 1..n
    assert sorted(r.curriculum_pos for r in out) == list(range(1, 504))
    # tiers are equal-population within 1 and ordered by quality:
    # every doc in tier t has quality >= every doc in tier t+1
    sizes = {}
    worst, best = {}, {}
    for r in out:
        sizes[r.tier] = sizes.get(r.tier, 0) + 1
        worst[r.tier] = min(worst.get(r.tier, 1 << 60), r.quality)
        best[r.tier] = max(best.get(r.tier, -1), r.quality)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for t in range(9):
        assert worst[t] >= best[t + 1]
    # curriculum order walks tiers in sequence
    by_pos = sorted(out, key=lambda r: r.curriculum_pos)
    tiers_seen = [r.tier for r in by_pos]
    assert tiers_seen == sorted(tiers_seen)


def test_curriculum_plan_has_no_single_partition(spark):
    plan = _explain(curriculum_order(_docs(spark)))
    assert "SinglePartition" not in plan, plan
    # data-side windows are partitioned by the rank bucket
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_rb" in p for p in parts), plan
