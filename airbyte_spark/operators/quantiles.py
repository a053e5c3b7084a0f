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
    counts = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(*gs, score_col)
        .agg(F.count("*").alias("_cnt"))
    )
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
