"""Frequent-item (heavy hitter) detection — two-pass Misra–Gries.

The corpus-stats primitive behind vocabulary construction, stop-word
discovery, and boilerplate detection: find every token whose global
frequency exceeds N/k, EXACTLY, without ever shuffling the full distinct
token set.

Why not one ``groupBy(token).count()``: at 100 TB the distinct-token
cardinality is billions — the exchange carries the whole vocabulary, and
the post-filter throws >99.99% of it away. Two passes bound the shuffle:

1. **Candidate sketch** (one scan, zero shuffle): each partition folds its
   tokens into a Misra–Gries summary of capacity c via ``mapInPandas`` —
   per Arrow batch a vectorized ``value_counts`` is merged into the
   running summary with the mergeable-summaries rule (add counts, subtract
   the (c+1)-th largest, drop non-positives — Agarwal et al., PODS'12).
   Any token with partition frequency > n_p/(c+1) survives its partition,
   so by pigeonhole the union of survivors ⊇ every global heavy hitter
   (freq > N/(c+1) ⊇ freq > N/k when c+1 >= k). At most c×partitions
   candidate rows leave the scan.
2. **Exact recount** (one scan, candidate-bounded shuffle): explode +
   broadcast-semi-join against the candidates, hash-aggregate counts, and
   filter ``cnt * k > N`` (pure integer compare). The output is EXACT —
   the sketch only bounds the candidate set, never the answer — which is
   what makes the operator oracle-gateable against plain SQL.

Reference scope: the reference computes per-sync record/byte counters and
leaves corpus analytics to warehouses (SURVEY.md §2.4); this operator is
part of the training-data pipeline surface built on the same engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, tokens_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries survivor tokens (superset of every token
    with partition frequency > n_p/(capacity+1)); ``distinct`` across
    partitions. Bounded output: <= capacity rows per partition."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        agg = pd.Series(dtype="int64")
        for pdf in batches:
            arrs = [a for a in pdf[tokens_col] if a is not None and len(a)]
            if not arrs:
                continue
            vc = pd.Series(np.concatenate(arrs)).value_counts()
            agg = agg.add(vc, fill_value=0)
            if len(agg) > capacity:
                cut = agg.nlargest(capacity + 1).iloc[-1]
                agg = agg - cut
                agg = agg[agg > 0]
        yield pd.DataFrame({"token": agg.index.astype(str)})

    return df.select(tokens_col).mapInPandas(fold, schema="token string").distinct()


def heavy_hitters(
    df: DataFrame, tokens_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact tokens with global frequency > N/k (strict), N = total token
    count. Output: (token, cnt, n_total). ``capacity`` defaults to 4k —
    any value >= k-1 preserves exactness; larger only shrinks pass-2 work.
    """
    capacity = capacity or 4 * k
    cands = mg_candidates(df, tokens_col, capacity)
    exploded = df.select(F.explode(tokens_col).alias("token"))
    total = exploded.agg(F.count("*").alias("n_total"))
    counts = (
        exploded.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select("token", "cnt", "n_total")
    )


def heavy_hitters_oracle_sql(
    docs_expr: str, k: int, split_expr: str = "string_split(text, ' ')"
) -> str:
    """DuckDB oracle: the naive exact form (full unnest + HAVING) — equal
    by construction since pass 2 is exact and the sketch is a superset."""
    return f"""
WITH toks AS (SELECT unnest({split_expr}) AS token FROM {docs_expr}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS cnt, tot.n_total AS n_total
FROM toks, tot
GROUP BY token, tot.n_total
HAVING count(*) * {k} > tot.n_total
"""
