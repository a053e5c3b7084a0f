"""Corpus mixing operators: weighted mixture sampling + per-source token
budgets (operators/mixing.py). Properties gated here:

- mixture membership/copy-count law (floor(w) or floor(w)+1, rates within
  tolerance), determinism under repartition, and the zero-shuffle plan;
- token budget: kept set is the greedy-maximal hash-order prefix per
  source, two-phase plan matches the naive-window law, determinism under
  repartition, and the plan never sorts a whole source in one partition.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from airbyte_spark.operators.mixing import (
    MILLI,
    mixture_oracle_sql,
    mixture_sample,
    token_budget_oracle_sql,
    token_budget_sample,
    training_order,
    training_order_oracle_sql,
)


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("grp"), (F.col("id") % 4).cast("string")).alias("lang"),
        (F.col("id") % 37 + 1).cast("long").alias("n_tok"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )


WEIGHTS = {"grp0": 500, "grp1": 1000, "grp2": 2500, "grp3": 3000}


def test_mixture_copy_count_law(spark):
    out = (
        mixture_sample(_docs(spark), WEIGHTS, group_col="lang")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n"), F.max("repeat_idx").alias("max_idx"))
        .collect()
    )
    per_doc = {r.doc_id: r for r in out}
    for r in out:
        w = WEIGHTS[r.lang]
        lo, hi = w // MILLI, w // MILLI + (1 if w % MILLI else 0)
        assert lo <= r.n <= hi, (r.lang, r.n)
        assert r.max_idx == r.n - 1  # repeat_idx is contiguous from 0
    # exact-weight group: every doc exactly once
    assert all(r.n == 1 for r in out if r.lang == "grp1")
    # integer-weight group: every doc exactly 3 times, and all 100 docs present
    g3 = [r for r in out if r.lang == "grp3"]
    assert len(g3) == 100 and all(r.n == 3 for r in g3)
    # Bernoulli group: some dropped, some kept (md5 buckets spread)
    g0 = [d for d in range(400) if d % 4 == 0]
    kept0 = [d for d in g0 if d in per_doc]
    assert 0 < len(kept0) < len(g0)


def test_mixture_rates_and_determinism(spark):
    d = _docs(spark, 2000)
    out = mixture_sample(d, WEIGHTS, group_col="lang")
    rates = {
        r.lang: r.n / 500.0
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for g, w in WEIGHTS.items():
        assert abs(rates[g] - w / MILLI) < 0.15, (g, rates[g])
    # determinism: membership survives an adversarial repartition
    a = sorted(map(tuple, out.select("doc_id", "repeat_idx").collect()))
    b = sorted(
        map(
            tuple,
            mixture_sample(d.repartition(13, "n_tok"), WEIGHTS, group_col="lang")
            .select("doc_id", "repeat_idx")
            .collect(),
        )
    )
    assert a == b


def test_mixture_plan_is_narrow(spark):
    plan = _explain(mixture_sample(_docs(spark), WEIGHTS, group_col="lang"))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan  # the explode


def test_mixture_matches_duckdb_oracle(spark):
    pdf = _docs(spark, 300).toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = con.sql(
        mixture_oracle_sql("docs", WEIGHTS, group_col="lang", select_cols="doc_id, lang")
    ).df()
    got = (
        mixture_sample(_docs(spark, 300), WEIGHTS, group_col="lang")
        .select("doc_id", "lang", "repeat_idx")
        .toPandas()
    )
    key = ["doc_id", "lang", "repeat_idx"]
    a = got[key].sort_values(key).reset_index(drop=True)
    b = oracle[key].astype({"repeat_idx": "int64"}).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_token_budget_greedy_maximal_prefix(spark):
    budget = 600
    d = _docs(spark)
    kept = token_budget_sample(d, budget).collect()
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    oracle = con.sql(token_budget_oracle_sql("docs", budget)).df()
    got = sorted((r.source, r.doc_id, r.n_tok, r.cum_tok) for r in kept)
    want = sorted(map(tuple, oracle.itertuples(index=False)))
    assert got == want
    # per-source budget respected, and prefix is maximal: the FIRST excluded
    # doc in hash order would overflow the budget
    full = con.sql(
        token_budget_oracle_sql("docs", 10**9)  # no cut: full ordered cumsum
    ).df()
    kept_ids = {(r.source, r.doc_id) for r in kept}
    for src, grp in full.groupby("source"):
        cums = grp.sort_values("cum_tok")
        kept_rows = cums[[(src, d_) in kept_ids for d_ in cums.doc_id]]
        assert kept_rows.cum_tok.max() <= budget
        excluded = cums[[(src, d_) not in kept_ids for d_ in cums.doc_id]]
        if len(excluded):
            assert excluded.cum_tok.min() > budget


def test_token_budget_determinism_under_repartition(spark):
    d = _docs(spark, 800)
    a = sorted(map(tuple, token_budget_sample(d, 900).collect()))
    b = sorted(map(tuple, token_budget_sample(d.repartition(17, "lang"), 900).collect()))
    assert a == b


def test_token_budget_plan_never_sorts_whole_source(spark):
    """The scale property: exchanges hash on (source, _bkt) — 256-way
    parallel within every source — and the only source-only partitioning is
    the window over the TINY per-bucket aggregate. No SinglePartition, no
    global Sort."""
    plan = _explain(token_budget_sample(_docs(spark), 600))
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # big-side data is partitioned by (source, bucket), not by source alone:
    # every hashpartitioning over the base data must include _bkt
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_bkt" in p for p in parts), plan


def test_training_order_is_exact_permutation(spark):
    d = _docs(spark, 777)
    out = training_order(d, shard_size=100).collect()
    assert sorted(r.global_pos for r in out) == list(range(777))
    for r in out:
        assert r.shard == r.global_pos // 100
        assert r.pos_in_shard == r.global_pos % 100


def test_training_order_matches_oracle_and_salt_changes_order(spark):
    d = _docs(spark, 300)
    con = duckdb.connect()
    con.register("docs", d.toPandas())
    want = con.sql(
        training_order_oracle_sql("docs", shard_size=64, select_cols="doc_id")
    ).df()
    got = (
        training_order(d, shard_size=64)
        .select("doc_id", "global_pos", "shard", "pos_in_shard")
        .toPandas()
    )
    key = ["doc_id", "global_pos", "shard", "pos_in_shard"]
    assert sorted(map(tuple, got[key].itertuples(index=False))) == sorted(
        map(tuple, want[key].astype("int64").itertuples(index=False))
    )
    # a different salt is a different (but still deterministic) permutation
    other = {r.doc_id: r.global_pos
             for r in training_order(d, shard_size=64, salt="epoch-2").collect()}
    base = {r.doc_id: r.global_pos for r in training_order(d, shard_size=64).collect()}
    assert base != other
    assert sorted(other.values()) == list(range(300))


def test_training_order_determinism_and_bucketed_plan(spark):
    d = _docs(spark, 500)
    a = sorted((r.doc_id, r.global_pos) for r in training_order(d).collect())
    b = sorted(
        (r.doc_id, r.global_pos)
        for r in training_order(d.repartition(11, "source")).collect()
    )
    assert a == b
    # the big-side row_number window partitions by _bkt (256-way), never the
    # whole corpus; the only SinglePartition is the tiny per-bucket offsets
    plan = _explain(training_order(d))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_bkt" in p for p in parts), plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------------------- stratified


def test_stratified_sample_is_k_smallest_hashes_per_group(spark):
    from airbyte_spark.operators.mixing import stratified_oracle_sql, stratified_sample

    d = _docs(spark, 600)
    out = stratified_sample(d, k=10).toPandas()
    # exactly min(k, group_size) per group, ranks 1..n contiguous
    sizes = out.groupby(["lang", "source"]).size()
    assert (sizes == 10).all()  # 600 rows / 12 groups = 50 each > k
    for _, g in out.groupby(["lang", "source"]):
        assert sorted(g.sample_rank) == list(range(1, 11))
    # membership == the naive oracle's k-smallest-md5 per group
    con = duckdb.connect()
    con.register("documents", d.toPandas())
    exp = con.sql(stratified_oracle_sql("documents", 10)).df()
    key = ["lang", "source", "doc_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key + ["sample_rank"]], b[key + ["sample_rank"]],
                                  check_dtype=False)


def test_stratified_sample_small_group_returns_all(spark):
    from airbyte_spark.operators.mixing import stratified_sample

    d = _docs(spark, 24)  # 12 groups x 2 docs, k=5 > group size
    out = stratified_sample(d, k=5).toPandas()
    assert len(out) == 24
    assert set(out.groupby(["lang", "source"]).size()) == {2}


def test_stratified_sample_repartition_invariant_and_plan(spark):
    from airbyte_spark.operators.mixing import stratified_sample

    d = _docs(spark, 500)
    a = sorted(map(tuple, stratified_sample(d, 7).collect()))
    b = sorted(map(tuple, stratified_sample(d.repartition(13, "doc_id"), 7).collect()))
    assert a == b
    # scale shape: candidates join is broadcast; base data never
    # hash-partitions on the group alone (always with _bkt)
    plan = _explain(stratified_sample(d, 7))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SinglePartition" not in plan


# -------------------------------------------------------------- rebalance


def _rebalance_ref(rows, targets):
    """Pure-Python reference: M = min_g floor(n_g*1000/t_g); rate_g =
    t_g*M // n_g; keep iff md5 bucket < rate."""
    import hashlib

    by_g = {}
    for doc_id, g in rows:
        by_g.setdefault(g, []).append(doc_id)
    m = min((len(by_g.get(g, [])) * 1000) // t for g, t in targets.items())
    kept = set()
    for g, t in targets.items():
        docs = by_g.get(g, [])
        if not docs:
            continue
        rate = (t * m) // len(docs)
        for d in docs:
            b = int(hashlib.md5(d.encode()).hexdigest()[8:14], 16) % 1000
            if b < rate:
                kept.add(d)
    return kept


def test_rebalance_matches_reference_and_deterministic(spark):
    from airbyte_spark.operators.mixing import rebalance_sample

    rows = [(f"doc{i:04d}", ["en", "en", "en", "de", "fr"][i % 5]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    targets = {"en": 500, "de": 300, "fr": 200}
    got = {r["doc_id"] for r in rebalance_sample(df, targets).collect()}
    assert got == _rebalance_ref(rows, targets)
    # partitioning invariance
    got2 = {r["doc_id"] for r in rebalance_sample(df.repartition(17), targets).collect()}
    assert got2 == got
    # achieved shares track the target within bucket granularity
    from collections import Counter

    by_lang = Counter(l for d, l in rows if d in got)
    n = sum(by_lang.values())
    for g, t in targets.items():
        assert abs(by_lang[g] / n - t / 1000) < 0.05, (g, by_lang, n)


def test_rebalance_infeasible_and_validation(spark):
    from airbyte_spark.operators.mixing import rebalance_sample
    import pytest as _pt

    df = spark.createDataFrame([("d1", "en")], "doc_id string, lang string")
    # target group with zero docs -> infeasible -> empty, never skewed
    assert rebalance_sample(df, {"en": 500, "zz": 500}).count() == 0
    with _pt.raises(ValueError, match="sum"):
        rebalance_sample(df, {"en": 999})
    with _pt.raises(ValueError, match="positive"):
        rebalance_sample(df, {"en": 1100, "de": -100})


def test_rebalance_drops_untargeted_groups(spark):
    from airbyte_spark.operators.mixing import rebalance_sample

    rows = [(f"d{i}", "en" if i % 2 else "xx") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = rebalance_sample(df, {"en": 1000})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}
    # single-group target keeps the whole group (rate == 1000)
    assert out.count() == 50
