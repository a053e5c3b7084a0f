"""Deterministic HyperLogLog NDV sketch — distinct-key estimation for
sync planning without a countDistinct shuffle.

Engine-infrastructure extension (no analog in rosecape/airbyte — the
reference sizes chunks from server-side table stats,
`source-mysql/.../MySqlInitialReadUtil.java:142-144`
getTableSizeInfoForStreams; a Spark-side ingest engine needs its own
cheap NDV for merge dispatch, bucket-count planning, and skew checks).
Spark's native ``approx_count_distinct`` is the production default; the
reason this operator exists beside it is determinism: its registers are
a pure function of the data (md5-derived, `plans/textsql.hll_parts_sql`)
— independent of partitioning, merge order, and engine — so it is
exactly oracle-checkable in DuckDB (queries() key
`stats_ndv_registers`) and its output is stable enough to persist in
snapshot summaries and DIFF across commits.

Scale design (100 TB):
- ONE narrow projection computes (register, rho) per row; the aggregate
  is groupBy(register).max(rho) with map-side partials — the shuffle is
  capped at 2^p rows per mapper (64 at p=6) regardless of corpus size.
- Mergeable: registers from disjoint batches combine by element-wise
  max (same groupBy shape), so per-batch sketches roll up incrementally
  — the property that lets a CDC sync maintain a running NDV without
  rescanning (tests/test_stats.py pins union == one-shot).
- The float estimate (`hll_estimate`) is driver-side arithmetic over
  2^p integers; only the integer registers are oracle-gated.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

S = X.SPARK


def hll_registers(df: DataFrame, expr: str, p: int = 6) -> DataFrame:
    """The sketch: one row per non-empty register — (register int,
    rho_max int) over ``md5(expr)`` of every row. ``expr`` is any string
    SQL expression (a column name, or e.g. ``concat_ws('|', a, b)``)."""
    if not 4 <= p <= 14:
        raise ValueError(f"p out of range 4..14: {p}")
    reg, rho = X.hll_parts_sql(S, expr, p)
    return (
        df.selectExpr(f"CAST({reg} AS INT) AS register", f"CAST({rho} AS INT) AS rho")
        .groupBy("register")
        .agg(F.max("rho").alias("rho_max"))
    )


def merge_registers(*sketches: DataFrame) -> DataFrame:
    """Combine per-batch sketches: element-wise max (HLL's union)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(registers: list[tuple[int, int]], p: int = 6) -> float:
    """Driver-side HLL estimate from collected (register, rho_max) rows —
    standard bias-corrected harmonic mean with the small-range
    (linear-counting) correction. Registers absent from the list are
    empty (rho 0)."""
    m = 1 << p
    rho = {int(r): int(v) for r, v in registers}
    z = sum(2.0 ** -rho.get(j, 0) for j in range(m))
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / z
    zeros = sum(1 for j in range(m) if j not in rho or rho[j] == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est
