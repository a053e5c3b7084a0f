"""Line-level corpus deduplication (the CCNet / RefinedWeb line-dedup
pass): drop every line that occurs in >= ``min_df`` documents corpus-wide
and rebuild each document from its surviving lines, in order.

Training-data-pipeline extension (no analog in rosecape/airbyte — its
pipeline never inspects payload text; SURVEY.md §2.9b). This is the dedup
granularity BETWEEN exact-document dedup (md5 groupBy) and token-span
dedup (operators/token_dedup.py): boilerplate lines (nav bars, cookie
banners, license headers) repeat across millions of otherwise-distinct
pages, and removing them is a standard early pass in CCNet (Wenzek et al.
2020) and RefinedWeb (Penedo et al. 2023). "Lines" here are deterministic
w-word segments (plans/textsql.lines_sql) because the synthetic corpus is
single-line; a real corpus would split on '\\n' through the same plan.

Scale design (100 TB):
- Line TEXT never crosses an exchange. The explode projects each line to
  (doc_id, ln, md5) in the same map stage; the corpus-wide line-frequency
  aggregate shuffles 32-char digests with map-side partial combine; the
  keep/drop join is an equi-join on the digest carrying only (doc_id, ln)
  ints; the per-doc rollup shuffles ints + a small sorted position array.
- The REBUILD is the one corpus-text exchange: documents join their kept
  positions on doc_id (sort-merge; co-located for free when the corpus is
  a bucketed lake table keyed by doc_id) and re-derive line text map-side
  from the original column — strictly cheaper than shuffling every
  surviving line's text through the frequency join and the rollup (two
  corpus-text exchanges).
- Rebuild order is carried in the data (sort_array over 0-based
  positions), so the output is partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

S = X.SPARK


def doc_line_digests(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
) -> DataFrame:
    """(doc_id, ln, g): 0-based line position and md5 digest of each line.
    Text is dropped in the same projection that explodes it — downstream
    exchanges carry fixed-width digests, never line content."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.expr(X.lines_sql(S, text_col, words_per_line))).alias(
            "ln", "_line"
        ),
    ).select("doc_id", "ln", F.md5("_line").alias("g"))


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 10,
    min_df: int = 2,
    cache_digests: bool = True,
) -> DataFrame:
    """Remove corpus-duplicated lines and rebuild each document:
    (doc_id, n_lines, n_dup_lines, kept_text). A line is dropped when its
    digest appears in >= ``min_df`` line instances corpus-wide (a doc
    repeating its own line also counts — self-repetition is boilerplate
    too, matching CCNet's hash-set semantics). ``kept_text`` is the
    surviving lines re-joined in original order ('' when nothing
    survives).

    ``cache_digests`` persists the (doc_id, ln, g) table: both the
    frequency aggregate and the keep/drop join consume it, and the
    split+md5 construction behind it is the dominant CPU (same trade as
    dup_ngram_fraction's gram cache)."""
    lines = doc_line_digests(df, id_col, text_col, words_per_line)
    if cache_digests:
        lines = lines.persist()
    freq = lines.groupBy("g").agg(F.count("*").alias("ldf"))
    kept = (
        lines.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum((F.col("ldf") >= min_df).cast("long")).alias("n_dup_lines"),
            F.sort_array(
                F.collect_list(F.when(F.col("ldf") < min_df, F.col("ln")))
            ).alias("_keep"),
        )
    )
    arr = X.lines_sql(S, text_col, words_per_line)
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col))
        .join(kept, "doc_id")
        .select(
            "doc_id",
            "n_lines",
            "n_dup_lines",
            F.expr(
                # element_at is 1-based; _keep holds 0-based posexplode
                # positions, sorted — original line order by construction
                f"array_join(transform(_keep, i -> element_at({arr}, i + 1)), ' ')"
            ).alias("kept_text"),
        )
    )


def line_dedup_oracle_sql(
    docs_cte: str,
    docs_name: str = "dup_docs",
    words_per_line: int = 10,
    min_df: int = 2,
) -> str:
    """Exact DuckDB oracle: same lines_sql template, struct-unnest for
    positions, string_agg(ORDER BY ln) FILTER for the ordered rebuild."""
    d = X.DUCKDB
    seg = X.lines_sql(d, "text", words_per_line)
    return f"""
WITH {docs_cte},
lx AS (
  SELECT doc_id,
         unnest({seg}) AS line,
         unnest(range(0, len({seg}))) AS ln
  FROM {docs_name}
),
lines AS (SELECT doc_id, CAST(ln AS INT) AS ln, line, md5(line) AS g FROM lx),
freq AS (SELECT g, COUNT(*) AS ldf FROM lines GROUP BY g)
SELECT l.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN f.ldf >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_lines,
       COALESCE(
         string_agg(l.line, ' ' ORDER BY l.ln) FILTER (WHERE f.ldf < {min_df}),
         '') AS kept_text
FROM lines l JOIN freq f USING (g)
GROUP BY l.doc_id
"""
