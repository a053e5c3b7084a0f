"""Distributed global ranking and curriculum ordering.

Training-data-pipeline extension (no analog in rosecape/airbyte — the
reference moves records, it never orders a corpus; SURVEY.md §2.9b).
Curriculum learning orders training data easy-to-hard (Bengio et al. 2009);
production corpus pipelines realize it as: score every document, rank
globally, bin into difficulty tiers, then shuffle *within* tiers so each
tier is internally i.i.d. while the tier sequence is controlled.

The naive Spark form — ``row_number() OVER (ORDER BY quality DESC)`` — is
the canonical scale-killer: a global window collapses to ONE partition and
a 100 TB corpus sorts on a single task. This module computes the exact same
rank with the two-phase bucket-prefix-sum idiom (shared with
``operators/mixing.py`` / ``operators/packing.py``):

1. assign each row a BUCKET that is a monotone prefix of its sort key —
   ordering by (bucket, key) is ordering by (key);
2. ONE partially-combined aggregate: row count per bucket (output = number
   of buckets, metadata-scale);
3. exclusive prefix offsets + grand total computed on the DRIVER over that
   tiny aggregate (a bounded collect — one row per bucket — same contract
   as the merge path's touched-bucket sets; the plan contains NO
   single-partition stage at all);
4. offsets broadcast-joined back; each bucket computes a LOCAL row_number
   and adds its offset — global rank, no partition ever sorts more than
   one bucket's rows.

Determinism: callers must pass a TOTAL order (tie-break by id); rank is
then a pure function of the data — independent of partitioning, engine,
and run — so the DuckDB oracle (the naive global window) matches
bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: md5-prefix shuffle bucket width for the within-tier shuffle: top 2 hex
#: chars of the hash key = 256 buckets per tier.
_HASH_BUCKET_CHARS = 2


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order: Sequence[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over ``order`` without a global sort.

    ``bucket`` MUST be a monotone prefix of ``order``: for any two rows,
    ``order(a) < order(b)`` implies ``bucket(a) <= bucket(b)`` (the caller
    owns this invariant; ``curriculum_order`` shows two instances). ``order``
    must be total (tie-break by a unique id) for a deterministic result.

    Adds ``rank_col`` (1-based, long). With ``total_col`` set, also adds the
    grand total row count (same value on every row) — free, it rides the
    same tiny offsets aggregate.
    """
    b = df.withColumn("_rb", bucket)
    # Bounded driver collect: one row per bucket (caller-bounded cardinality,
    # same contract as operators/merge.py's touched-bucket sets). Computing
    # the exclusive prefix here instead of a window over the aggregate keeps
    # the plan free of ANY single-partition stage.
    counts = sorted(
        b.groupBy("_rb").agg(F.count("*").alias("_bn")).collect(),
        key=lambda r: r["_rb"],
    )
    total = sum(int(r["_bn"]) for r in counts)
    rows, acc = [], 0
    for r in counts:
        rows.append((r["_rb"], acc, total))
        acc += int(r["_bn"])
    from pyspark.sql.types import LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField("_rb", b.schema["_rb"].dataType, True),
            StructField("_off", LongType(), False),
            StructField("_tot", LongType(), False),
        ]
    )
    offsets = df.sparkSession.createDataFrame(rows, off_schema)
    w_local = Window.partitionBy("_rb").orderBy(*order)
    out = (
        b.join(F.broadcast(offsets), "_rb")
        .withColumn(rank_col, (F.col("_off") + F.row_number().over(w_local)).cast("long"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_tot"))
    return out.drop("_rb", "_off", "_tot")


def curriculum_order(
    df: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    n_bins: int = 10,
    quality_bucket_width: int = 16,
) -> DataFrame:
    """Quality-tier curriculum: rank by quality (high first), bin into
    ``n_bins`` equal-population tiers, shuffle deterministically within each
    tier, and emit the global training position.

    Two bucketed global ranks, zero global sorts:

    - quality rank: bucket = ``-(quality DIV width)`` — monotone in
      descending quality; bucket count is bounded by the quality range /
      width, independent of corpus size.
    - curriculum position: order = (tier, md5(id), id); bucket = (tier,
      first 2 hex chars of the hash) — a prefix of that order, ≤ n_bins×256
      buckets.

    Output: ``id_col``, ``quality_col``, ``quality_rank`` (1-based, quality
    desc), ``tier`` (0 = best .. n_bins-1), ``curriculum_pos`` (1-based
    global training order). Tier sizes differ by at most 1
    (``tier = ((rank-1) * n_bins) DIV total``). All integer arithmetic —
    bit-identical to the oracle's naive window form.
    """
    q = F.col(quality_col).cast("long")
    ranked = bucketed_global_rank(
        df.select(F.col(id_col), q.alias(quality_col)),
        # floor is monotone; negation makes the bucket ascend as quality
        # descends — the required prefix of (quality DESC, id ASC)
        bucket=(-F.floor(q / F.lit(quality_bucket_width))).cast("long"),
        order=[q.desc(), F.col(id_col).asc()],
        rank_col="quality_rank",
        total_col="_n",
    )
    tier = F.expr(f"CAST(((quality_rank - 1) * {int(n_bins)}) DIV _n AS INT)")
    h = F.md5(F.col(id_col).cast("string"))
    with_tier = ranked.withColumn("tier", tier.cast("int")).withColumn("_h", h)
    out = bucketed_global_rank(
        with_tier,
        bucket=F.concat(
            F.lpad(F.col("tier").cast("string"), 4, "0"),
            F.substring("_h", 1, _HASH_BUCKET_CHARS),
        ),
        order=[
            F.col("tier").asc(),
            F.col("_h").asc(),
            F.col(id_col).asc(),
        ],
        rank_col="curriculum_pos",
    )
    return out.select(
        id_col, quality_col, "quality_rank", "tier", "curriculum_pos"
    )


def curriculum_oracle_sql(
    docs_cte: str,
    quality_expr: str,
    id_col: str = "doc_id",
    n_bins: int = 10,
) -> str:
    """DuckDB oracle: the naive global-window form of :func:`curriculum_order`
    — provably identical because each bucket is a prefix of its order key.
    ``docs_cte`` must SELECT ``{id_col}`` and expose ``quality_expr``'s input
    columns."""
    return f"""
WITH scored AS (
  SELECT {id_col}, CAST({quality_expr} AS BIGINT) AS quality FROM ({docs_cte})
),
r AS (
  SELECT {id_col}, quality,
         ROW_NUMBER() OVER (ORDER BY quality DESC, {id_col}) AS quality_rank,
         COUNT(*) OVER () AS n
  FROM scored
),
b AS (
  SELECT {id_col}, quality, quality_rank,
         CAST(((quality_rank - 1) * {n_bins}) // n AS INT) AS tier
  FROM r
)
SELECT {id_col}, quality, quality_rank, tier,
       ROW_NUMBER() OVER (
         ORDER BY tier, md5(CAST({id_col} AS VARCHAR)), {id_col}
       ) AS curriculum_pos
FROM b
"""
