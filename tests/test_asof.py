"""Unit tests for operators/asof.py: as-of semantics on constructed data
plus the one-shuffle/no-join plan gate."""

from __future__ import annotations

from airbyte_spark.operators.asof import asof_enrich


def _inputs(spark):
    versions = spark.createDataFrame(
        [
            ("d1", 10, "I", 5),
            ("d1", 20, "U", 7),
            ("d1", 30, "D", None),
            ("d2", 40, "I", 9),
        ],
        "doc_id string, lsn long, op string, n_tok long",
    )
    probes = spark.createDataFrame(
        [
            ("d1", 5),    # before first version -> NULLs
            ("d1", 10),   # AT a version -> inclusive
            ("d1", 25),   # between versions -> lsn 20
            ("d1", 99),   # after tombstone -> sees the delete, not lsn 20
            ("d2", 50),
            ("d3", 1),    # key with no versions at all -> NULLs
        ],
        "doc_id string, lsn long",
    )
    return probes, versions


def test_asof_semantics(spark):
    probes, versions = _inputs(spark)
    out = asof_enrich(probes, versions, "doc_id", "lsn", ["lsn", "op", "n_tok"])
    got = {(r["doc_id"], r["lsn"]): (r["active_lsn"], r["active_op"], r["active_n_tok"])
           for r in out.collect()}
    assert got[("d1", 5)] == (None, None, None)
    assert got[("d1", 10)] == (10, "I", 5)
    assert got[("d1", 25)] == (20, "U", 7)
    assert got[("d1", 99)] == (30, "D", None)
    assert got[("d2", 50)] == (40, "I", 9)
    assert got[("d3", 1)] == (None, None, None)
    assert len(got) == 6  # probes pass through 1:1


def test_asof_one_shuffle_no_join(spark):
    probes, versions = _inputs(spark)
    out = asof_enrich(probes, versions, "doc_id", "lsn", ["lsn", "op", "n_tok"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a V x P interval join
    assert plan.count("Exchange") == 1  # one shuffle on the key, total
