"""Generic plan-hygiene sweep over EVERY queries() entry: no CartesianProduct
anywhere, and no SinglePartition stage except a documented allowlist of
provably-bounded global aggregates. New queries are covered automatically —
an unexpected global sort/exchange fails this gate until it is either fixed
or explicitly justified below."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")

#: queries whose plans legitimately contain a SinglePartition stage — each
#: one is a BOUNDED global aggregate/window (cardinality independent of
#: corpus size), audited here so the sweep stays a real gate:
BOUNDED_SINGLE_PARTITION = {
    # min over the |target-groups| calibration rows (rates derivation)
    "corpus_rebalance",
    # exclusive offsets window over the <=256-row bucket list (two-phase
    # prefix sum — the whole point is that ONLY this tiny list is global)
    "corpus_shuffle",
    # broadcast max-LSN scalar (1 row, partial-combined max) feeding the
    # two state cutoffs; the diff itself is exchange-reusing full-outer
    "cdc_snapshot_diff",
    # same broadcast max-LSN scalar gating the half/full state cutoffs;
    # the view maintenance itself is semi-joins + one equi-join
    "cdc_join_view",
    # broadcast centroid fold: global agg over the n_clusters centroid rows
    "dedup_semantic",
    # ONE output row per table (multi-distinct expand aggregate)
    "stats_column_profile",
    # broadcast grand-total row joined onto the top-20 list
    "stats_key_skew",
    # Misra-Gries sketch merge: <= parts*k candidate rows to one combiner
    "tokens_heavy_hitters",
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no tiny testdata")
def test_every_query_plan_is_scale_clean(spark):
    import __spark_entry__ as entry

    jvm = spark._jvm
    offenders: dict[str, list[str]] = {}
    qs = entry.queries()
    for name, q in qs.items():
        df = q(spark, SF_DIR)
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "SinglePartition" in plan and name not in BOUNDED_SINGLE_PARTITION:
            flags.append("SinglePartition (not allowlisted)")
        if flags:
            offenders[name] = flags
    assert not offenders, f"scale-unclean plans: {offenders}"
    # the allowlist must not rot: every entry still exists and still needs it
    stale = BOUNDED_SINGLE_PARTITION - set(qs)
    assert not stale, f"allowlist names unknown queries: {stale}"
    for name in sorted(BOUNDED_SINGLE_PARTITION):
        df = qs[name](spark, SF_DIR)
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        assert "SinglePartition" in plan, (
            f"{name} no longer has a SinglePartition stage — drop it from "
            "the allowlist so the gate stays tight"
        )
