"""Similarity search over an embedding column (array<float>).

Training-data-pipeline extension (no analog in rosecape/airbyte). Two
strategies over milli-unit-quantized integer vectors (exact cross-engine
math, plans/textsql.py):

- knn_bruteforce: exact inner-product top-k. The (small) query set is
  broadcast, so the scan side never shuffles — at 100 TB this is one pass
  over the corpus with a per-partition partial top-k (Catalyst plans the
  rank-filter over the broadcast join as map-side work; the only shuffle is
  the final per-query window over #queries * corpus-partition survivors).
- knn_lsh: sign-bit LSH bucketed search — the corpus is pre-bucketed by an
  8-bit hyperplane sketch; each query probes only its own bucket (an
  equi-join on bucket id), trading recall for a ~2^bits fan-in reduction.
  This is the scale path: bucket cardinality bounds the join, and skewed
  buckets split under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbyte_spark.operators.fuzzy_dedup import quantized_embeddings
from airbyte_spark.plans import textsql as X

S = X.SPARK


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    top_k: int = 5,
) -> DataFrame:
    """Exact top-k by integer inner product (MIPS). Returns
    (query_id, neighbor_id, dot, rank); self-matches excluded; ties broken
    by neighbor_id ASC for full determinism."""
    c = quantized_embeddings(corpus, id_col, vec_col).selectExpr("vec_id AS neighbor_id", "e AS ce")
    q = quantized_embeddings(queries, id_col, vec_col).selectExpr("vec_id AS query_id", "e AS qe")
    dot = X.dot_sql(S, "qe", "ce", dim)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{dot} AS dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    top_k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-bit LSH
    bucket, exact integer ranking within it. Same output shape as
    knn_bruteforce (a neighbor missing from the bucket is simply absent —
    the recall/cost trade)."""

    def prep(df: DataFrame, role: str) -> DataFrame:
        q = quantized_embeddings(df, id_col, vec_col)
        return q.selectExpr(
            f"vec_id AS {role}_id",
            f"e AS {role}e",
            f"{X.signbit_bucket_sql(S, 'e', n_bits)} AS {role}_bkt",
        )

    c = prep(corpus, "neighbor")
    q = prep(queries, "query")
    dot = X.dot_sql(S, "querye", "neighbore", dim)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_bkt") == F.col("neighbor_bkt"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{dot} AS dot")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )
