"""Column profiling: the data-quality surface behind catalog discovery.

Reference parity: the reference's discover phase emits per-column JSON
schema (sources/file_based/schema_helpers.py, catalog discovery); platforms
then profile synced tables for data-quality monitoring (row counts, null
rates, cardinalities, ranges). This module computes that profile as ONE
Spark job over the table.

Shape: a single ``agg`` carrying every column's metrics — count / nulls /
exact distinct / min / max — then one narrow explode of the 1-row result to
long format (column, n, n_null, n_distinct, min_val, max_val). The exact
multi-column ``countDistinct`` plans as Spark's expand-based
multi-distinct: ONE pass over the data with an Expand (#cols row
multiplier) feeding one partial-combined aggregate — no per-column jobs, no
driver loop. For very wide tables where the expand multiplier hurts, pass
``approx_distinct=True`` to swap in ``approx_count_distinct`` (HLL, single
aggregate, no expand) — the oracle gates the exact form only.

min/max are rendered as strings so one long-format row type covers every
column type; the gated query profiles exactly-rendered types (integers,
strings) — float rendering differs across engines and stays oracle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, cols: list[str] | None = None, approx_distinct: bool = False
) -> DataFrame:
    """Per-column profile -> (column, n, n_null, n_distinct, min_val,
    max_val), one row per profiled column, deterministic order by name."""
    cols = sorted(cols if cols is not None else df.columns)
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx_distinct
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            nd(c).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n"),
                (F.col("__n") - F.col(f"{c}__nn")).cast("long").alias("n_null"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_val"),
                F.col(f"{c}__mx").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def profile_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile` (exact-distinct form)."""
    parts = [
        f"""
SELECT '{c}' AS "column",
       COUNT(*) AS n,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_val,
       CAST(MAX({c}) AS VARCHAR) AS max_val
FROM {table}"""
        for c in sorted(cols)
    ]
    return "\nUNION ALL\n".join(parts)
