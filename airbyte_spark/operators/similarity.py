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


def _topk_per_query(scored: DataFrame, top_k: int) -> DataFrame:
    """Exact per-query top-k in two phases: a PARTIAL top-k per Arrow batch
    (mapInPandas — a narrow, shuffle-free pass whose output is bounded at
    queries x k per batch) followed by the global row_number window over
    only the survivors. A bare window would shuffle EVERY scored
    (query, neighbor) pair — at corpus scale that shuffle IS the cost of
    the search; a groupBy(collect_list) partial doesn't help because the
    list aggregate ships unbounded partial lists through the exchange.
    Results are identical to the plain-window formulation: the partial
    keeps a superset of each query's global top-k (per-batch winners), and
    ties break (dot desc, neighbor_id asc) in both phases."""
    schema = scored.schema

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(
                ["query_id", "dot", "neighbor_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            yield pdf.groupby("query_id", sort=False).head(top_k)

    survivors = scored.mapInPandas(partial, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("neighbor_id").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


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
    return _topk_per_query(scored, top_k)


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
    return _topk_per_query(scored, top_k)


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
):
    """Train the IVF coarse quantizer (KMeans over the embedding column).
    Returns (model, centroids) where centroids is a list of (cid, vector)
    — small enough to broadcast (n_centroids * dim floats)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    return model, list(enumerate(model.clusterCenters()))


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    top_k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k with a DETERMINISTIC integer coarse quantizer:
    the centroids are the quantized vectors of the ``n_centroids`` smallest
    corpus ids (a seeded sample — no iterative float KMeans), assignment is
    integer argmin-L2, and ranking within the probed lists is the exact
    integer inner product. Every step is expressible in portable SQL, so
    this variant has an exact DuckDB oracle (the KMeans-quantizer variant
    below trades that for data-adaptive centroids).

    Scale shape: centroids broadcast; corpus assignment is a map-side
    min_by hash aggregate over a corpus x n_centroids expansion (each map
    task emits one row per vector — no wide shuffle); the probe search is
    an equi-join on list id. Same output shape as knn_bruteforce.
    """
    c = quantized_embeddings(corpus, id_col, vec_col)
    cent = F.broadcast(
        c.filter(F.col("vec_id") < n_centroids).selectExpr(
            "vec_id AS cid", "e AS cvec"
        )
    )
    l2 = X.l2_sql(S, "e", "cvec", dim)

    # corpus -> inverted lists: argmin_{cid} L2(e, cvec), tie-break cid asc;
    # min_by hash agg = partial map-side, one surviving row per vector
    c_d2 = c.crossJoin(cent).selectExpr("vec_id", "e", "cid", f"{l2} AS d2")
    assigned = (
        c_d2.groupBy("vec_id", "e")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("list_id"))
        .selectExpr("vec_id AS neighbor_id", "e AS ce", "list_id")
    )

    # queries -> n_probe nearest lists (query side is small: window is fine)
    q = quantized_embeddings(queries, id_col, vec_col)
    q_d2 = q.crossJoin(cent).selectExpr("vec_id AS query_id", "e AS qe", "cid", f"{X.l2_sql(S, 'e', 'cvec', dim)} AS d2")
    probe_w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    q_probed = F.broadcast(
        q_d2.withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qe", F.col("cid").alias("list_id"))
    )

    dot = X.dot_sql(S, "qe", "ce", dim)
    scored = (
        q_probed.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{dot} AS dot")
    )
    return _topk_per_query(scored, top_k)


def knn_ivf_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    top_k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic ANN scale path
    (Jegou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011, coarse-quantizer stage): a KMeans coarse quantizer
    partitions the corpus into n_centroids inverted lists; each query
    probes only its n_probe nearest lists and ranks exactly (integer inner
    product) within them. No SQL oracle (iterative float KMeans); recall
    and exactness are unit-tested against brute force instead.

    Scale shape: the corpus is assigned ONCE (map-side, centroids
    broadcast) and the search is an equi-join on list id — candidate
    fan-in is ~corpus * n_probe / n_centroids per query, and Catalyst
    plans the probe join like any bucketed join (AQE splits skewed lists).
    Same output shape as knn_bruteforce; recall is the n_probe knob.
    """
    from pyspark.ml.functions import array_to_vector, vector_to_array

    model, _centroids = train_ivf_centroids(
        corpus, id_col, vec_col, n_centroids=n_centroids, seed=seed
    )

    def assign(df: DataFrame, out_col: str) -> DataFrame:
        feats = df.withColumn("features", array_to_vector(F.col(vec_col)))
        return model.transform(feats).withColumnRenamed("prediction", out_col).drop("features")

    # corpus: one list per vector (the inverted file), quantized in place
    c = assign(corpus, "list_id")
    cq = c.selectExpr(
        f"{id_col} AS neighbor_id",
        f"{X.quantize_sql(S, vec_col)} AS ce",
        "list_id",
    )

    # queries: distance to every centroid -> n_probe nearest lists
    from pyspark.ml.linalg import Vectors

    centroid_rows = [(int(i), [float(x) for x in vec]) for i, vec in _centroids]
    cent = corpus.sparkSession.createDataFrame(centroid_rows, "cid int, cvec array<double>")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec")
    )
    dist2 = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    probes = (
        qv.crossJoin(F.broadcast(cent))
        .select("query_id", "cid", dist2.alias("d2"))
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", F.col("cid").alias("list_id"))
    )
    q = quantized_embeddings(queries, id_col, vec_col).selectExpr("vec_id AS query_id", "e AS qe")
    q_probed = F.broadcast(q.join(probes, "query_id"))

    dot = X.dot_sql(S, "qe", "ce", dim)
    # No .distinct(): each (query, list, neighbor) is already unique —
    # a corpus vector lives in exactly one inverted list, so a (query,
    # neighbor) pair can arise from at most one probed list.
    scored = (
        q_probed.join(cq, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .selectExpr("query_id", "neighbor_id", f"{dot} AS dot")
    )
    return _topk_per_query(scored, top_k)
