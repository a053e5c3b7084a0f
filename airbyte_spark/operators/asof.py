"""As-of (temporal) join: enrich probe rows with the most recent version
row at-or-before their timestamp, per key.

The reference has no general join operator at all (SURVEY.md §2.3 — its
only join shapes are the MERGE upsert and the substream router), yet
"which version of this record was active at time T" is the first analytics
question every CDC consumer asks. This operator answers it Spark-first.

Scale design (100 TB): the classic formulation is an equi-join on key plus
an interval predicate — which amplifies: a key with V versions and P
probes materializes V*P candidate pairs before the filter. This
implementation instead UNIONS versions and probes, shuffles ONCE on the
key, and runs a carry-forward window (``last(version_struct, ignorenulls)``
ordered by (ts, version-before-probe)): per-key cost is O(V+P) rows
streamed through one window, never V*P, and skewed hot keys degrade
linearly instead of quadratically. Tombstones stay correct because the
carried value is the whole version STRUCT (non-null for every version row,
delete markers included) — after a delete the probe sees the tombstone,
not a stale resurrected image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_enrich(
    probes: DataFrame,
    versions: DataFrame,
    key: str,
    ts_col: str,
    version_cols: list[str],
    prefix: str = "active_",
) -> DataFrame:
    """Left as-of join: every probe row gains ``prefix + c`` for each c in
    ``version_cols``, taken from the latest version row of the same ``key``
    with version.ts <= probe.ts (inclusive: a version AT the probe instant
    counts). Probes before a key's first version — or for keys with no
    versions at all — keep NULLs, mirroring LEFT-join semantics.

    Both inputs must carry ``key`` and ``ts_col``; probe columns pass
    through unchanged. Version ties on (key, ts) resolve to the row sorted
    last by the struct's remaining fields — give versions a unique
    (key, ts) (e.g. ts = lsn) for fully deterministic output."""
    probe_cols = probes.columns
    v_struct = F.struct(*[F.col(c) for c in version_cols])
    v_probe_nulls = [
        F.lit(None).cast(probes.schema[c].dataType).alias(f"_p_{c}")
        for c in probe_cols
    ]
    v = versions.select(
        F.col(key), F.col(ts_col).alias("_ts"), F.lit(0).alias("_is_probe"),
        v_struct.alias("_v"), *v_probe_nulls,
    )
    p = probes.select(
        F.col(key), F.col(ts_col).alias("_ts"), F.lit(1).alias("_is_probe"),
        F.lit(None).cast(v.schema["_v"].dataType).alias("_v"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = p.unionByName(v).withColumn("_av", F.last("_v", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_probe") == 1).select(
        *[F.col(f"_p_{c}").alias(c) for c in probe_cols],
        *[F.col("_av").getField(c).alias(f"{prefix}{c}") for c in version_cols],
    )
