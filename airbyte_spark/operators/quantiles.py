"""Exact distributed percentile cutoffs over a bounded integer score
domain — the calibration step in front of every corpus quality filter
("keep the top 80%": which score is the cutoff?).

Training-data-pipeline extension (no analog in rosecape/airbyte —
SURVEY.md §2.9b). Spark's built-in ``percentile_approx`` is a sketch
(rank error, engine-private merge order) and exact ``percentile`` sorts
whole groups; neither is cross-engine oracle-checkable. For the integer
scores quality filters actually use (word counts, length buckets, x100
fixed-point ratios) there is an exact sort-free plan: count per score,
one cumulative window over the (tiny) grouped domain, and the
percentile_disc rule ``smallest score whose cumulative count >=
ceil(pct·n/100)`` in pure integer arithmetic — bit-identical in any
engine, gated against DuckDB (queries() key `docs_quality_percentiles`).

Scale design (100 TB):
- ONE corpus-scale aggregate: groupBy(groups, score) with map-side
  partials — the shuffle carries at most |group|×|domain| rows per
  mapper, never documents.
- Everything downstream (cumulative window, totals, the pct fan-out)
  runs over the grouped table: <= |group|×|domain| rows total. The
  window partitions by group, so no SinglePartition stage appears for
  grouped calibration (plan-gated in tests/test_quantiles.py).
- The plan is exact only because the domain is bounded (integer scores).
  For unbounded/continuous scores, bucket first (e.g. floor(score·100))
  — the cutoff then carries quantization error bounded by the bucket
  width, which is the right trade at corpus scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped_counts(df: DataFrame, score_col: str, gs: list[str]) -> DataFrame:
    """The ONE corpus-scale pass every percentile/filter below shares:
    (group cols, score, _cnt) with map-side partial counts. Everything
    downstream runs over this bounded |group|x|domain| table."""
    return (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*gs, score_col)
        .agg(F.count("*").alias("_cnt"))
    )


def _cutoffs_from_counts(
    counts: DataFrame, score_col: str, pcts: Sequence[int], gs: list[str]
) -> DataFrame:
    """percentile_disc over an already-grouped (group, score, _cnt) table:
    cumulative window over the tiny domain + the integer ceil-rank rule."""
    w = (
        Window.partitionBy(*gs)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("_cum", F.sum("_cnt").over(w))
    tot = counts.groupBy(*gs).agg(F.sum("_cnt").alias("n_rows"))
    j = cum.join(tot, gs) if gs else cum.crossJoin(tot)
    fan = j.withColumn(
        "pct", F.explode(F.array(*[F.lit(int(p)) for p in sorted(set(map(int, pcts)))]))
    )
    # integer ceil: ceil(pct*n/100) == (pct*n + 99) DIV 100 — BIGINT-exact
    eligible = fan.filter(F.col("_cum") >= F.expr("(pct * n_rows + 99) DIV 100"))
    return eligible.groupBy(*gs, "pct", "n_rows").agg(
        F.min(score_col).cast("long").alias("cutoff")
    )


def percentile_cutoffs(
    df: DataFrame,
    score_col: str,
    pcts: Sequence[int],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact percentile_disc cutoffs per group: for each pct in ``pcts``
    (integer 1..100), the smallest ``score_col`` value whose cumulative
    count reaches ``ceil(pct·n/100)``. Returns one row per
    (group, pct): group cols + (pct int, n_rows long, cutoff long).
    NULL scores are excluded (they rank in no percentile)."""
    gs = list(group_cols)
    if not all(1 <= int(p) <= 100 for p in pcts):
        raise ValueError(f"pcts must be integers in 1..100: {pcts!r}")
    return _cutoffs_from_counts(_grouped_counts(df, score_col, gs), score_col, pcts, gs)


def adaptive_filter_summary(
    df: DataFrame,
    score_col: str,
    pct: int,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group summary of an ADAPTIVE quality filter: each group's
    cutoff is its own exact ``pct``-percentile of ``score_col`` (the
    CCNet/RefinedWeb per-source calibration — a fixed global threshold
    over-prunes clean sources and under-prunes noisy ones); a row is kept
    iff score >= cutoff. Returns one row per group: group cols +
    (cutoff, n_docs, n_kept, n_dropped, kept_score_sum — all long).

    Scale design: the corpus is scanned ONCE (the grouped-counts
    aggregate); both the cutoff derivation and the kept/dropped tallies
    run over the bounded (group, score) table, so changing ``pct`` or
    re-running the summary never re-reads documents. Rows with NULL
    score are excluded entirely (same contract as percentile_cutoffs)."""
    gs = list(group_cols)
    if not gs:
        raise ValueError("adaptive_filter_summary requires at least one group column")
    if not 1 <= int(pct) <= 100:
        raise ValueError(f"pct must be an integer in 1..100: {pct!r}")
    counts = _grouped_counts(df, score_col, gs)
    cuts = _cutoffs_from_counts(counts, score_col, [int(pct)], gs).select(*gs, "cutoff")
    keep = (F.col(score_col) >= F.col("cutoff")).cast("long")
    return (
        counts.join(F.broadcast(cuts), gs)
        .groupBy(*gs, "cutoff")
        .agg(
            F.sum("_cnt").alias("n_docs"),
            F.sum(keep * F.col("_cnt")).alias("n_kept"),
            F.sum((1 - keep) * F.col("_cnt")).alias("n_dropped"),
            F.sum(keep * F.col("_cnt") * F.col(score_col)).cast("long").alias("kept_score_sum"),
        )
    )


def adaptive_filter(
    df: DataFrame,
    score_col: str,
    pct: int,
    group_cols: Sequence[str],
) -> DataFrame:
    """The row-level companion of :func:`adaptive_filter_summary`: returns
    the KEPT rows of ``df`` (score >= the group's own pct-percentile).
    One corpus aggregate to calibrate + one broadcast join to filter —
    the corpus itself never shuffles."""
    gs = list(group_cols)
    cuts = percentile_cutoffs(df, score_col, [int(pct)], gs).select(*gs, "cutoff")
    return (
        df.join(F.broadcast(cuts), gs, "left")
        .filter(F.col(score_col) >= F.col("cutoff"))
        .drop("cutoff")
    )
