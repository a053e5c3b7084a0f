"""Corpus mixing: weighted mixture sampling and per-source token budgets.

Training-data-pipeline extension (no analog in rosecape/airbyte — the
reference moves records, it never composes training mixtures; SURVEY.md
§2.9b). Both operators are the standard "data mixing" stage of LLM
pre-training from the public literature: domain/language re-weighting
(GPT-3's weighted dataset sampling, where e.g. Wikipedia is seen ~3 epochs
while Common Crawl is sub-sampled) and per-source token budgets (cap each
source's contribution to the mixture at a fixed token count).

Both are DETERMINISTIC — membership is a pure function of the row's id,
never of row order, partitioning, RNG state, or engine — so reruns,
resumes, and the DuckDB oracle all agree bit-for-bit.

Scale design (100 TB):
- mixture_sample is a pure NARROW projection: weight lookup (CASE),
  md5-bucket Bernoulli/epoch arithmetic, and an explode whose fan-out is
  the per-row copy count. Zero shuffles, zero driver state; plan-gated in
  tests (no Exchange in the plan at all). Oversampling (weight > 1) emits
  repeat_idx so downstream shuffles (packing, shuffling into training
  order) see distinct rows.
- token_budget_sample needs a running token sum per source in a canonical
  order — the naive form is a window PARTITION BY source ORDER BY hash,
  which at 100 TB sorts an entire source (possibly 50 TB) inside one
  partition. Instead it runs a two-phase distributed prefix sum:
  (1) docs are assigned a 48-bit order key k = hexn(md5(id), 1, 12) and a
      bucket = the key's top 8 bits (k DIV 16^10) — the bucket is a PREFIX
      of k, so ordering by (bucket, k) IS ordering by k;
  (2) per-(source, bucket) token sums — one partially-aggregated exchange
      on a compact key, output ≤ sources × 256 rows;
  (3) exclusive bucket offsets via a window over that TINY aggregate;
  (4) offsets broadcast-joined back, each (source, bucket) partition does
      a LOCAL running sum + offset, filter cum <= budget.
  Parallelism is sources × 256 regardless of source skew; no partition
  ever sorts more than 1/256 of a source. The DuckDB oracle is the naive
  single window — the two forms are provably identical because the bucket
  is a prefix of the order key (ties broken by id in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

#: mixture weights are integers in milli-units: 1000 = keep exactly once,
#: 500 = keep with probability 0.5, 2500 = 2 copies + a third w.p. 0.5.
MILLI = 1000

#: token-budget order key: 12 hex chars (48 bits) of md5(id); bucket = the
#: top 2 hex chars, i.e. k DIV 16^10 — a prefix of k.
_BUCKET_DIV = 16**10


def n_copies_sql(
    d: str,
    group_col: str,
    id_expr: str,
    weights_milli: dict[str, int],
    default_milli: int = MILLI,
) -> str:
    """Dialect-templated copy count for one row: floor(w) epochs plus one
    more iff the id's sampling bucket falls under the fractional part.
    Integer-exact in both engines (shared with the DuckDB oracle)."""
    w = X.weight_case_sql(d, group_col, weights_milli, default_milli)
    bucket = X.sample_bucket_sql(d, id_expr, MILLI)
    whole = X.IDIV(d, w, MILLI)
    frac = f"(({w}) % {MILLI})"
    return f"CAST({whole} + (CASE WHEN {bucket} < {frac} THEN 1 ELSE 0 END) AS BIGINT)"


def mixture_sample(
    df: DataFrame,
    weights_milli: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_milli: int = MILLI,
) -> DataFrame:
    """Deterministic weighted mixture sampling: each row is emitted
    ``floor(w)`` times, plus once more iff its md5 sampling bucket is below
    the fractional remainder of its group's weight. Emits all input columns
    plus ``repeat_idx`` (0-based epoch index). Rows whose copy count is 0
    are dropped. Pure narrow pipeline — no shuffle, no RNG."""
    n = F.expr(n_copies_sql(X.SPARK, group_col, id_col, weights_milli, default_milli))
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            "repeat_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_tok",
) -> DataFrame:
    """Greedy per-source token budget: documents are taken in canonical
    hash order (md5 of id — stable across runs/partitionings/engines)
    while the source's running token total stays <= budget. Returns
    (source, id, n_tok, cum_tok) for the kept prefix.

    Two-phase distributed prefix sum — see module docstring for why this
    replaces the naive per-source global-sort window at scale."""
    k = F.expr(X.hexn_sql(X.SPARK, f"md5({X.STR(X.SPARK, id_col)})", 1, 12))
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.col(size_col).cast("long").alias("n_tok"),
        k.alias("_k"),
    ).withColumn("_bkt", F.expr(f"_k DIV {_BUCKET_DIV}"))

    per_bucket = base.groupBy("source", "_bkt").agg(F.sum("n_tok").alias("_bsum"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "source",
        "_bkt",
        F.coalesce(F.sum("_bsum").over(w_off), F.lit(0)).cast("long").alias("_off"),
    )
    w_local = (
        Window.partitionBy("source", "_bkt")
        .orderBy(F.col("_k").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(offsets), ["source", "_bkt"])
        .withColumn("cum_tok", (F.col("_off") + F.sum("n_tok").over(w_local)))
        .filter(F.col("cum_tok") <= F.lit(int(budget)))
        .select("source", "doc_id", "n_tok", F.col("cum_tok").cast("long").alias("cum_tok"))
    )


def training_order(
    df: DataFrame,
    shard_size: int = 1024,
    id_col: str = "doc_id",
    salt: str = "order-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``global_pos`` = its rank under ``md5(id:salt)`` ordering, plus the
    derived (shard, pos_in_shard). The pseudorandom-but-reproducible
    permutation every training run needs — membership and position are
    pure functions of the id and salt (re-salt for a new epoch order),
    never of partitioning, engine, or RNG state.

    Scale shape — the naive form is ROW_NUMBER() over a GLOBAL sort (one
    partition holds the whole corpus). Here: the order key's top 8 bits
    form a bucket that is a PREFIX of the key, so ordering by (bucket, key)
    IS ordering by key; per-bucket counts (one partially-aggregated
    exchange, <= 256 output rows) -> exclusive bucket offsets via a window
    over that tiny aggregate -> broadcast join back -> bucket-local
    row_number + offset. 256-way parallel, no partition ever sorts more
    than 1/256 of the corpus — the same two-phase prefix machinery as
    token_budget_sample."""
    k = F.expr(
        X.hexn_sql(
            X.SPARK, f"md5(concat({X.STR(X.SPARK, id_col)}, ':{salt}'))", 1, 12
        )
    )
    base = df.withColumn("_k", k).withColumn(
        "_bkt", F.expr(f"_k DIV {_BUCKET_DIV}")
    )
    counts = base.groupBy("_bkt").agg(F.count("*").alias("_n"))
    # exclusive prefix sums over the <=256-row bucket aggregate via a
    # pack-sort-fold (bounded single-row aggregate; O(k^2) on k<=256 is
    # trivial) instead of a no-partition running-sum window — same
    # offsets, no WindowExec single-partition warning in operator logs
    packed = counts.agg(
        F.array_sort(F.collect_list(F.struct("_bkt", "_n"))).alias("_a")
    )
    offsets = (
        packed.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_a) - 1), i -> struct("
                    "element_at(_a, i + 1)._bkt AS _bkt, "
                    "aggregate(slice(_a, 1, i), CAST(0 AS BIGINT), "
                    "(s, x) -> s + x._n) AS _off))"
                )
            ).alias("_s")
        )
        .select(F.col("_s._bkt").alias("_bkt"), F.col("_s._off").alias("_off"))
    )
    w_local = Window.partitionBy("_bkt").orderBy(
        F.col("_k").asc(), F.col(id_col).asc()
    )
    pos = (F.col("_off") + F.row_number().over(w_local) - 1).cast("long")
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn("global_pos", pos)
        .withColumn(
            "shard", F.expr(f"CAST(global_pos DIV {int(shard_size)} AS BIGINT)")
        )
        .withColumn(
            "pos_in_shard", (F.col("global_pos") % F.lit(int(shard_size))).cast("long")
        )
        .drop("_k", "_bkt", "_off")
    )


def training_order_oracle_sql(
    table_expr: str,
    shard_size: int = 1024,
    id_col: str = "doc_id",
    salt: str = "order-v1",
    select_cols: str = "doc_id",
) -> str:
    """The naive global-window DuckDB form of training_order — identical
    because the bucket is a prefix of the order key (ties by id in both)."""
    d = X.DUCKDB
    k = X.hexn_sql(d, f"md5(concat({X.STR(d, id_col)}, ':{salt}'))", 1, 12)
    return f"""
WITH t AS (
  SELECT {select_cols}, {k} AS k FROM {table_expr}
), r AS (
  SELECT {select_cols},
         CAST(ROW_NUMBER() OVER (ORDER BY k, {id_col}) - 1 AS BIGINT) AS global_pos
  FROM t
)
SELECT {select_cols}, global_pos,
       CAST(global_pos // {int(shard_size)} AS BIGINT) AS shard,
       CAST(global_pos % {int(shard_size)} AS BIGINT) AS pos_in_shard
FROM r
"""


def token_budget_oracle_sql(
    table_expr: str,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    size_expr: str = "n_tok",
) -> str:
    """The naive single-window DuckDB form of token_budget_sample — the
    oracle the two-phase Spark plan must match bit-for-bit."""
    d = X.DUCKDB
    k = X.hexn_sql(d, f"md5({X.STR(d, id_col)})", 1, 12)
    return f"""
        WITH t AS (
          SELECT {source_col} AS source, {id_col} AS doc_id,
                 CAST({size_expr} AS BIGINT) AS n_tok, {k} AS k
          FROM {table_expr}
        )
        SELECT source, doc_id, n_tok,
               CAST(SUM(n_tok) OVER (
                 PARTITION BY source ORDER BY k, doc_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        FROM t
        QUALIFY cum_tok <= {int(budget)}
    """


def mixture_oracle_sql(
    table_expr: str,
    weights_milli: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    select_cols: str = "doc_id, lang, source",
    default_milli: int = MILLI,
) -> str:
    """DuckDB oracle for mixture_sample: unnest(range(0, n_copies))."""
    n = n_copies_sql(X.DUCKDB, group_col, id_col, weights_milli, default_milli)
    return f"""
        WITH b AS (
          SELECT {select_cols}, {n} AS n FROM {table_expr}
        )
        SELECT {select_cols},
               CAST(unnest(range(0, n)) AS BIGINT) AS repeat_idx
        FROM b WHERE n > 0
    """


def stratified_sample(
    df: DataFrame,
    k: int,
    group_cols: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling: the k documents with the SMALLEST
    md5 order keys per group — a uniform random sample under the hash, but
    a pure function of the id values (reruns, resumes, repartitions, and
    the DuckDB oracle all pick the identical set). The standard
    "N examples per language/domain" eval-set and ablation-subset draw.

    Scale design (100 TB): the naive form is row_number() over
    (PARTITION BY group ORDER BY hash) — which sorts every group in one
    partition (a 50 TB group = one 50 TB sort-partition). Instead, the
    same bucket-prefix two-phase as token_budget_sample:
    (1) bucket = top 8 bits of the 48-bit order key (a PREFIX of the key,
        so (bucket, key) order IS key order);
    (2) per-(group, bucket) counts — one partially-aggregated exchange on
        a compact key, ≤ groups × 256 rows;
    (3) buckets whose preceding cumulative count >= k can't contribute —
        filtered via a window over the tiny aggregate, survivors
        broadcast-joined back (candidates ≈ k + one bucket per group);
    (4) the ranking window runs over CANDIDATES only.
    Returns group cols + (id, sample_rank), sample_rank in 1..k."""
    key = F.expr(X.hexn_sql(X.SPARK, f"md5({X.STR(X.SPARK, id_col)})", 1, 12))
    gcols = [F.col(c) for c in group_cols]
    base = df.select(
        *gcols, F.col(id_col), key.alias("_k")
    ).withColumn("_bkt", F.expr(f"_k DIV {_BUCKET_DIV}"))

    per_bucket = base.groupBy(*group_cols, "_bkt").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    live = (
        per_bucket.withColumn(
            "_nbefore", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        )
        .filter(F.col("_nbefore") < k)
        .select(*group_cols, "_bkt")
    )
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.col("_k").asc(), F.col(id_col).asc()
    )
    return (
        base.join(F.broadcast(live), [*group_cols, "_bkt"])
        .withColumn("sample_rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .select(*group_cols, id_col, "sample_rank")
    )


def stratified_oracle_sql(
    table_expr: str,
    k: int,
    group_cols: str = "lang, source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for stratified_sample: the naive per-group ranking
    window — provably identical to the two-phase form because the bucket
    is a prefix of the order key (ties broken by id in both)."""
    key = X.hexn_sql(X.DUCKDB, f"md5({X.STR(X.DUCKDB, id_col)})", 1, 12)
    return f"""
        SELECT {group_cols}, {id_col}, sample_rank FROM (
          SELECT {group_cols}, {id_col},
                 CAST(row_number() OVER (
                   PARTITION BY {group_cols}
                   ORDER BY {key}, {id_col}) AS BIGINT) AS sample_rank
          FROM {table_expr})
        WHERE sample_rank <= {int(k)}
    """


def rebalance_sample(
    df: DataFrame,
    targets_milli: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance resampling to a TARGET distribution: keep the largest
    corpus subset whose group shares match ``targets_milli`` (milli-shares
    summing to 1000) exactly in expectation — the "rebalance the language /
    domain mix" stage of corpus curation, with the per-group rates DERIVED
    from the corpus instead of hand-set (contrast mixture_sample, where the
    caller supplies the weights; rebalance is the downsample-only dual).

    Math (all BIGINT-exact, shared with the DuckDB oracle): with n_g docs
    in group g and target share t_g/1000, the largest feasible output size
    is M = min_g floor(n_g*1000/t_g); each group then keeps
    rate_g = (t_g*M) DIV n_g milli — the limiting group keeps (nearly) all
    its docs, every other group downsamples to match. Membership is the
    deterministic md5 sampling bucket (pure function of the id), so reruns,
    any partitioning, and the oracle agree bit-for-bit. Groups absent from
    ``targets_milli`` are dropped; a target group with NO corpus docs makes
    the target infeasible (M = 0, empty result) rather than silently
    skewing the mix.

    Scale: one count-only calibration aggregate (map-side partials; output
    = |groups| rows), rates broadcast back, then a narrow filter pass —
    the corpus never shuffles.
    """
    if sum(targets_milli.values()) != MILLI:
        raise ValueError(f"targets_milli must sum to {MILLI}: {targets_milli!r}")
    if any(t <= 0 for t in targets_milli.values()):
        raise ValueError(f"every target share must be positive: {targets_milli!r}")
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(g, int(t)) for g, t in sorted(targets_milli.items())],
        f"{group_col} string, _t long",
    )
    in_scope = df.filter(F.col(group_col).isin(list(targets_milli)))
    counts = in_scope.groupBy(group_col).agg(F.count("*").alias("_n"))
    j = targets.join(counts, group_col, "left").withColumn(
        "_n", F.coalesce(F.col("_n"), F.lit(0))
    )
    m = j.agg(
        F.min(F.expr(f"_n * {MILLI} DIV _t")).cast("long").alias("_m")
    )
    rates = (
        j.crossJoin(F.broadcast(m))
        .select(
            group_col,
            F.when(F.col("_n") > 0, F.expr("_t * _m DIV _n"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_rate"),
        )
    )
    bucket = F.expr(X.sample_bucket_sql(X.SPARK, id_col, MILLI))
    return (
        in_scope.join(F.broadcast(rates), group_col)
        .filter(bucket < F.col("_rate"))
        .drop("_rate")
    )


def rebalance_oracle_sql(
    table_expr: str,
    targets_milli: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    select_cols: str = "doc_id, lang, source",
) -> str:
    """DuckDB oracle for rebalance_sample: identical integer derivation of
    M and per-group rates, identical md5 bucket membership."""
    d = X.DUCKDB
    vals = ", ".join(
        f"('{g}', {int(t)})" for g, t in sorted(targets_milli.items())
    )
    bucket = X.sample_bucket_sql(d, id_col, MILLI)
    return f"""
WITH targets({group_col}, t) AS (VALUES {vals}),
counts AS (
  SELECT {group_col}, CAST(COUNT(*) AS BIGINT) AS n
  FROM {table_expr}
  WHERE {group_col} IN (SELECT {group_col} FROM targets)
  GROUP BY 1),
caps AS (
  SELECT t.{group_col}, t.t, COALESCE(c.n, 0) AS n
  FROM targets t LEFT JOIN counts c USING ({group_col})),
m AS (SELECT MIN(n * {MILLI} // t) AS m FROM caps),
rates AS (
  SELECT {group_col},
         CASE WHEN n > 0 THEN (t * m.m) // n ELSE 0 END AS rate
  FROM caps, m)
SELECT {select_cols}
FROM {table_expr} d JOIN rates r USING ({group_col})
WHERE {bucket} < r.rate
"""
