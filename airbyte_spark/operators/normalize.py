"""Nested-array normalization into child tables with parent FK hash.

Reference semantics: legacy base-normalization explodes nested arrays into
child streams keyed by a deterministic hash of the parent's unique key —
`create_from_parent` builds the child from the parent stream
(base-normalization/.../stream_processor.py:133-172) and the surrogate ids
are md5 over the concatenated key fields (+ position for array elements)
(stream_processor.py:675-705).

Spark-first: one ``posexplode`` plus two md5 column expressions — the whole
child-table build is a single narrow projection (no shuffle, no UDF), so it
streams through whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parent_hash_expr(pk_cols: list[str]):
    """_airbyte_unique_key analog: md5 over '-'-joined key fields
    (stream_processor.py:675-705)."""
    return F.md5(F.concat_ws("-", *[F.col(c).cast("string") for c in pk_cols]))


def normalize_child_table(
    parent: DataFrame,
    pk_cols: list[str],
    array_col: str,
    keep_cols: list[str] | None = None,
    pos_col: str = "pos",
    item_col: str | None = None,
) -> DataFrame:
    """Explode ``array_col`` into a child table:

    (_ab_parent_hashid, <keep_cols>, pos, <item>, _ab_child_hashid)

    - ``_ab_parent_hashid``: FK back to the parent row (md5 of its PK).
    - ``_ab_child_hashid``: the child row's own surrogate key
      (md5 of parent hash + element position) — stable across re-syncs, so
      child-table upserts dedup exactly like any PK'd stream.
    """
    item_col = item_col or array_col.rstrip("s") or "item"
    keep = keep_cols if keep_cols is not None else pk_cols
    ph = parent_hash_expr(pk_cols).alias("_ab_parent_hashid")
    exploded = parent.select(
        ph, *keep, F.posexplode(array_col).alias(pos_col, item_col)
    )
    child_hash = F.md5(
        F.concat_ws("-", F.col("_ab_parent_hashid"), F.col(pos_col).cast("string"))
    )
    return exploded.withColumn("_ab_child_hashid", child_hash)
