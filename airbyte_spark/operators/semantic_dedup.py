"""Semantic deduplication (SemDeDup-style) over an embedding column.

Training-data-pipeline extension (no analog in rosecape/airbyte — see
SURVEY.md §2.9b). Implements the two-stage shape of Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): (1) cluster embeddings with a coarse quantizer, (2)
within each cluster only, drop points whose cosine similarity to another
cluster member exceeds a threshold, keeping one representative.

Like knn_ivf (operators/similarity.py), the coarse quantizer here is
DETERMINISTIC — centroids are the quantized vectors of the n_clusters
smallest ids (a seeded sample), assignment is integer argmin-L2 — so the
whole program is portable SQL with an exact DuckDB oracle. A learned
KMeans quantizer drops in through the identical plan (see
knn_ivf_kmeans) at the cost of the oracle.

The keep rule is min-witness greedy: a vector is DROPPED iff some
cluster-mate with a smaller id is cosine-near it. This is the same rule
as operators/incremental_dedup.py, chosen for the same reason: it is
independent of evaluation order and batching, so the operator composes
with incremental ingest (new vectors judged against the existing corpus
give the same answer as a full recompute).

Scale design (100 TB):
- Centroids broadcast (n_clusters * dim integers); corpus assignment is
  a map-side min_by aggregate — each vector emits one row, no wide
  exchange of the expansion.
- The near-dup test is a self-equi-join ON cluster id — candidate
  fan-in is bounded by cluster size (AQE splits skewed clusters), never
  the O(n^2) all-pairs matrix.
- Only (id, cluster, keep) survive to the output; vectors are projected
  away before the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.operators.fuzzy_dedup import quantized_embeddings
from airbyte_spark.plans import textsql as X

S = X.SPARK


def _assigned(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_clusters: int
) -> DataFrame:
    """(vec_id, e, n2, cluster_id) — deterministic integer coarse-quantizer
    assignment: argmin-L2 to the quantized vectors of the n_clusters
    smallest ids, ties broken by centroid id ASC.

    The argmin is a PURE PROJECTION: all centroids arrive as one sorted
    array on a broadcast single-row crossJoin, and a fold (SQL aggregate())
    over it picks the nearest. No corpus-wide aggregate at all — the
    knn_ivf formulation's groupBy over the corpus x n_clusters expansion
    demotes to a SortAggregate when the vector rides along as a grouping
    or first() column (arrays aren't hash-agg buffer types), which puts
    two corpus-scale sorts on the hot path. Here the corpus side is
    entirely map-side work until the within-cluster join."""
    q = quantized_embeddings(df, id_col, vec_col)
    cent_arr = F.broadcast(
        q.filter(F.col("vec_id") < n_clusters)
        .selectExpr("vec_id AS cid", "e AS cvec")
        .agg(F.expr("array_sort(collect_list(struct(cid, cvec)))").alias("cents"))
    )
    # integer L2 to centroid c, inlined inside the fold
    l2c = (
        f"aggregate(sequence(1, {dim}), CAST(0 AS BIGINT), "
        f"(a, i) -> a + (element_at(e, i) - element_at(c.cvec, i)) "
        f"* (element_at(e, i) - element_at(c.cvec, i)))"
    )
    # struct ordering compares (d2, cid) lexicographically: array_min IS
    # argmin with the cid-ascending tie-break, one distance eval per centroid
    argmin = (
        f"array_min(transform(cents, c -> "
        f"named_struct('d2', {l2c}, 'cid', CAST(c.cid AS BIGINT)))).cid"
    )
    return q.crossJoin(cent_arr).selectExpr(
        "vec_id", "e", f"{X.norm2_sql(S, 'e', dim)} AS n2", f"{argmin} AS cluster_id"
    )


def auto_clusters(n: int) -> int:
    """The IVF-flat balance point: k = max(16, isqrt(n)) makes BOTH stages
    O(n^1.5) — assignment costs n*k distance folds, within-cluster pairing
    ~n^2/k dot products. A FIXED k goes quadratic as the corpus grows (the
    sf1 growth audit measured 135x on 10x data with k=16); k ∝ sqrt(n) is
    the classic coarse-quantizer scaling (SemDeDup itself scales its
    cluster count with corpus size)."""
    import math

    return max(16, math.isqrt(max(n, 0)))


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_clusters: int | str = "auto",
    cos_pct: int = 80,
    cache_assigned: bool = True,
) -> DataFrame:
    """Per-vector semantic-dedup verdict. Returns
    (vec_id, cluster_id, keep int, witness bigint) where keep=0 iff a
    smaller-id cluster-mate passes the integer cosine test
    dot > 0 AND 10000*dot^2 >= cos_pct^2 * |a|^2 * |b|^2, and witness is
    the smallest such mate (NULL when kept).

    ``n_clusters="auto"`` (default) sizes the quantizer as
    ``auto_clusters(count)`` — one bounded count job, then both stages
    scale O(n^1.5) instead of the fixed-k quadratic cliff. Pass an int to
    pin it (the oracle template accepts the same spelling of either).

    ``cache_assigned`` persists the assigned table — both halves of the
    within-cluster self-join consume it, and the argmin assignment is
    the dominant CPU (same trade as embedding_neardup_pairs)."""
    if n_clusters == "auto":
        n_clusters = auto_clusters(df.count())
    a = _assigned(df, id_col, vec_col, dim, n_clusters)
    if cache_assigned:
        a = a.persist()
    dot = X.dot_sql(S, "a_e", "b_e", dim)
    dropped = (
        a.alias("a")
        .join(
            a.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .selectExpr(
            "b.vec_id AS vec_id",
            "a.vec_id AS mate",
            "a.e AS a_e",
            "b.e AS b_e",
            "a.n2 AS na2",
            "b.n2 AS nb2",
        )
        .selectExpr("vec_id", "mate", f"{dot} AS dot", "na2", "nb2")
        .filter(F.expr(f"dot > 0 AND 10000 * dot * dot >= {cos_pct * cos_pct} * na2 * nb2"))
        .groupBy("vec_id")
        .agg(F.min("mate").alias("witness"))
    )
    return (
        a.select("vec_id", "cluster_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.when(F.col("witness").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
            F.col("witness").cast("long").alias("witness"),
        )
    )


def semantic_dedup_oracle_sql(
    table_expr: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_clusters: int | str = "auto",
    cos_pct: int = 80,
    extra_ctes: str = "",
) -> str:
    """DuckDB oracle: identical integer math, argmin via row_number over
    (d2 ASC, cid ASC). ``extra_ctes`` (e.g. a dup-injection CTE the
    ``table_expr`` refers to) is spliced in before the operator CTEs.
    ``n_clusters="auto"`` renders the same max(16, floor(sqrt(n))) rule as
    a scalar subquery over ``table_expr`` — exact parity with the Spark
    side's count-then-isqrt (isqrt == floor(sqrt) for any table that fits
    a double's 2^53 integer range)."""
    d = X.DUCKDB
    if n_clusters == "auto":
        k_expr = (
            f"(SELECT GREATEST(16, CAST(floor(sqrt(count(*))) AS BIGINT)) "
            f"FROM {table_expr})"
        )
    else:
        k_expr = str(int(n_clusters))
    q = X.quantize_sql(d, vec_col)
    l2 = X.l2_sql(d, "e", "cvec", dim)
    dot = X.dot_sql(d, "a_e", "b_e", dim)
    n2 = X.norm2_sql(d, "e", dim)
    pre = f"{extra_ctes.strip().rstrip(',')}," if extra_ctes.strip() else ""
    return f"""
WITH {pre} q AS (
  SELECT {id_col} AS vec_id, {q} AS e FROM {table_expr}
), cent AS (
  SELECT vec_id AS cid, e AS cvec FROM q WHERE vec_id < {k_expr}
), assigned AS (
  SELECT vec_id, e, {n2} AS n2, cid AS cluster_id
  FROM (
    SELECT q.vec_id, q.e, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id ORDER BY {l2} ASC, c.cid ASC
           ) AS rk
    FROM q, cent c
  ) WHERE rk = 1
), dropped AS (
  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS witness
  FROM (SELECT vec_id, e AS a_e, n2 AS na2, cluster_id FROM assigned) a
  JOIN (SELECT vec_id, e AS b_e, n2 AS nb2, cluster_id FROM assigned) b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {dot} > 0
    AND 10000 * ({dot}) * ({dot}) >= {cos_pct * cos_pct} * a.na2 * b.nb2
  GROUP BY b.vec_id
)
SELECT a.vec_id,
       CAST(a.cluster_id AS BIGINT) AS cluster_id,
       CASE WHEN d.witness IS NULL THEN 1 ELSE 0 END AS keep,
       CAST(d.witness AS BIGINT) AS witness
FROM assigned a LEFT JOIN dropped d USING (vec_id)
"""
