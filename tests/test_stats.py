"""HLL NDV sketch: registers match a pure-Python reference bit-for-bit,
per-batch merge equals one-shot, the estimate lands near the exact NDV,
and the plan shuffles at most 2^p rows per mapper (partial max)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.stats import hll_estimate, hll_registers, merge_registers

P = 6
M = 1 << P


def _explain(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _py_parts(text: str) -> tuple[int, int]:
    h = int(hashlib.md5(text.encode()).hexdigest()[:12], 16)
    reg, w = h % M, h // M
    rho = (48 - P) + 1 - w.bit_length() if w else (48 - P) + 1
    return reg, rho


def _docs(spark, n=2000, dup_every=4):
    rows = [(i, f"document body {i - (i % dup_every)} tail") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_registers_match_python_reference(spark):
    df = _docs(spark)
    got = {r["register"]: r["rho_max"] for r in hll_registers(df, "text", P).collect()}
    ref: dict[int, int] = {}
    for r in df.collect():
        reg, rho = _py_parts(r["text"])
        ref[reg] = max(ref.get(reg, 0), rho)
    assert got == ref


def test_merge_equals_one_shot_and_partitioning_invariant(spark):
    df = _docs(spark)
    a = hll_registers(df.filter("doc_id < 700"), "text", P)
    b = hll_registers(df.filter("doc_id >= 700").repartition(9), "text", P)
    merged = {
        r["register"]: r["rho_max"] for r in merge_registers(a, b).collect()
    }
    one = {r["register"]: r["rho_max"] for r in hll_registers(df, "text", P).collect()}
    assert merged == one


def test_estimate_near_exact(spark):
    df = _docs(spark, n=4000, dup_every=4)  # exact NDV = 1000
    regs = [
        (r["register"], r["rho_max"])
        for r in hll_registers(df, "text", P).collect()
    ]
    est = hll_estimate(regs, P)
    exact = df.select("text").distinct().count()
    assert exact == 1000
    # standard error ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    assert abs(est - exact) / exact < 0.4, est


def test_bad_p_rejected(spark):
    with pytest.raises(ValueError):
        hll_registers(_docs(spark, 10), "text", p=2)


def test_plan_partial_max_before_exchange(spark):
    plan = _explain(hll_registers(_docs(spark), "text", P))
    # map-side partial max caps the shuffle at 2^p rows per mapper
    assert "partial" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan
