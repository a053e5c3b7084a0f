"""Corpus-level text-quality operators for training-data pipelines:
duplicated n-gram fraction, benchmark-contamination check, PII scrubbing.

Training-data-pipeline extension (no analog in rosecape/airbyte — its
pipeline never inspects payload text; see SURVEY.md §2.8/§2.9b). Built
from the public data-curation literature: duplicated n-gram fraction is
the Gopher/RefinedWeb repetition-quality family of signals; benchmark
contamination via n-gram overlap is the GPT-3/PaLM eval-decontamination
procedure; PII scrubbing is standard corpus hygiene. All three are pure
DataFrame programs over the dialect templates in plans/textsql.py, so each
has an exact DuckDB oracle (integer/string-exact — no float drift).

Scale design (100 TB):
- dup_ngram_fraction shuffles md5 DIGESTS of shingles, never document
  text: explode distinct shingles map-side -> hash -> two hash aggregates
  with map-side partial combine (the per-gram doc-frequency table and the
  per-doc rollup) + one equi-join on the 32-byte digest. No all-pairs.
- contamination_check broadcasts the benchmark gram set (eval suites are
  KB-MB scale — always the small side); the corpus never shuffles: its
  grams are generated and joined map-side, only the per-doc hit counts
  (<= contaminated docs) reach the exchange.
- pii_scrub is a pure narrow projection (regexp count + replace per row,
  whole-stage codegen, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.operators.fuzzy_dedup import _shingled
from airbyte_spark.plans import textsql as X

S = X.SPARK


def doc_grams(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, g) — md5 digest of each DISTINCT word k-gram per document.
    Distinct-within-doc before the explode keeps the fan-out bounded by
    document content, and hashing before any shuffle means downstream
    exchanges carry 32-byte keys instead of k-word strings."""
    w = _shingled(df, id_col, text_col, k)
    return w.select(
        "doc_id",
        F.explode(F.expr(X.ADISTINCT(S, "sh"))).alias("_sh"),
    ).select("doc_id", F.md5("_sh").alias("g"))


def dup_ngram_fraction(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3,
    cache_grams: bool = True,
) -> DataFrame:
    """Duplicated n-gram fraction per document (Gopher/RefinedWeb-style
    repetition-across-corpus signal): of a document's distinct k-grams, how
    many also occur in at least one OTHER document. Returns
    (doc_id, n_grams, n_dup_grams, dup_pct) with dup_pct integer-floored.

    Plan shape: doc_grams (map-side) -> groupBy g count (partial-combined;
    the gram-frequency table) -> join back on g -> per-doc agg. The join is
    an equi-join on the digest; AQE handles skewed boilerplate grams.

    ``cache_grams`` persists the gram table: both the frequency aggregate
    and the join probe side consume it, and the shingle+md5 construction
    behind it is the query's dominant CPU — without the cache Spark
    recomputes it once per side (same trade as fuzzy_dedup's band cache).
    Pass False for one-shot pipelines that must not retain cache."""
    g = doc_grams(df, id_col, text_col, k)
    if cache_grams:
        g = g.persist()
    freq = g.groupBy("g").agg(F.count("*").alias("gdf"))
    return (
        g.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("gdf") >= 2).cast("long")).alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.floor(F.lit(100) * F.col("n_dup_grams") / F.col("n_grams"))
            .cast("long")
            .alias("dup_pct"),
        )
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Benchmark-contamination report: corpus documents sharing at least one
    word k-gram with any benchmark document (the GPT-3/PaLM n-gram-overlap
    decontamination test). Returns (doc_id, n_overlap_grams, n_bench_docs):
    distinct overlapping grams and distinct benchmark documents hit.

    The benchmark side (an eval suite) is always tiny relative to a corpus,
    so it is broadcast — the corpus is scanned once, its grams never
    shuffle, and only per-doc hit counts reach the exchange."""
    c = doc_grams(corpus, id_col, text_col, k)
    b = (
        doc_grams(benchmark, id_col, text_col, k)
        .select(F.col("doc_id").alias("bench_id"), "g")
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").cast("long").alias("n_overlap_grams"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


def weight_sql(d: str, word_expr: str) -> str:
    """Deterministic per-word classifier weight in [-1000, 1000]: 4 hex
    chars of md5(word) starting at position 3, mod 2001, shifted. A
    stand-in for learned fasttext-style weights — integer-exact in both
    engines, so the classifier has an exact oracle (a real model would
    broadcast its learned table through the identical plan)."""
    return f"({X.hexn_sql(d, f'md5({word_expr})', 3, 4)} % 2001 - 1000)"


def quality_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_top: int = 200,
    lo: int = -5000,
    hi: int = 5000,
    cache_counts: bool = True,
) -> DataFrame:
    """Linear bag-of-words quality classifier (the fasttext-style quality
    filter of the CCNet/GPT-3 data pipelines, linearized): score(doc) =
    Σ count(doc, w) · weight(w) over the corpus's ``vocab_top`` most
    frequent words, bucketed into keep / maybe / drop. Returns
    (doc_id, score, label).

    Scale shape: explode -> per-(doc, word) counts (hash agg with map-side
    partials) -> corpus vocabulary = top-N words by total frequency via
    distributed TakeOrdered (NEVER a global row_number window over the
    full vocabulary — at corpus scale that is a single-partition sort of
    10^8 distinct words) -> tiny weight table broadcast back -> per-doc
    sum. Ties at the vocabulary boundary break by (freq DESC, word ASC) —
    a deterministic total order, so the oracle's row_number form selects
    the identical set."""
    wc = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.expr(X.words_sql(S, text_col))).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    if cache_counts:
        wc = wc.persist()
    vocab = (
        wc.groupBy("w")
        .agg(F.sum("cnt").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("w").asc())
        .limit(vocab_top)
        .selectExpr("w", f"CAST({weight_sql(S, 'w')} AS BIGINT) AS wt")
    )
    return (
        wc.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.coalesce(F.col("wt"), F.lit(0)))
            .cast("long")
            .alias("score")
        )
        .select(
            "doc_id",
            "score",
            F.when(F.col("score") >= hi, F.lit("keep"))
            .when(F.col("score") >= lo, F.lit("maybe"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def quality_classifier_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_top: int = 200,
    lo: int = -5000,
    hi: int = 5000,
) -> str:
    """DuckDB oracle: row_number-windowed vocabulary (equivalent set to the
    TakeOrdered by the deterministic (tf DESC, word) total order)."""
    d = X.DUCKDB
    return f"""
WITH wc AS (
  SELECT {id_col} AS doc_id, unnest({X.words_sql(d, text_col)}) AS w
  FROM {table_expr}
), counts AS (
  SELECT doc_id, w, COUNT(*) AS cnt FROM wc GROUP BY doc_id, w
), vocab AS (
  SELECT w, CAST({weight_sql(d, "w")} AS BIGINT) AS wt
  FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(cnt) DESC, w ASC) AS rk
    FROM counts GROUP BY w
  ) WHERE rk <= {vocab_top}
), scored AS (
  SELECT c.doc_id, CAST(SUM(c.cnt * COALESCE(v.wt, 0)) AS BIGINT) AS score
  FROM counts c LEFT JOIN vocab v USING (w)
  GROUP BY c.doc_id
)
SELECT doc_id, score,
       CASE WHEN score >= {hi} THEN 'keep'
            WHEN score >= {lo} THEN 'maybe'
            ELSE 'drop' END AS label
FROM scored
"""


# PII patterns, shared with the DuckDB oracle verbatim. Character classes
# only ([.] not \.) so the literal parses identically in Spark SQL (Java
# regex) and DuckDB (RE2) string syntax; cross-engine equivalence is pinned
# in tests/test_textsql_dialects.py. Coverage: mixed-case emails with
# dot/underscore/percent/plus/hyphen local parts and multi-label domains;
# phones as NNN-NNN-NNNN / (NNN) NNN-NNNN / bare 555-N+ (a leading country
# code like "+1 " is outside the match and survives — redact-the-number
# semantics, not full phrase removal).
EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_PAT = "[(]?[0-9]{3}[)]?[ -][0-9]{3}[ -]?[0-9]{4}|555-[0-9]+"


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """Scrub emails and phone numbers, reporting per-doc redaction counts:
    (doc_id, n_emails, n_phones, scrubbed) with all occurrences replaced by
    placeholder tokens (emails first, then phones — fixed order so the
    output is deterministic). Narrow projection: codegen'd regexp ops,
    no shuffle, no Python."""
    n_em = f"CAST({X.REGEXP_COUNT(S, text_col, EMAIL_PAT)} AS BIGINT)"
    n_ph = f"CAST({X.REGEXP_COUNT(S, text_col, PHONE_PAT)} AS BIGINT)"
    scrub = X.REGEXP_REPLACE_ALL(
        S,
        X.REGEXP_REPLACE_ALL(S, text_col, EMAIL_PAT, email_token),
        PHONE_PAT,
        phone_token,
    )
    return df.selectExpr(
        f"{id_col} AS doc_id",
        f"{n_em} AS n_emails",
        f"{n_ph} AS n_phones",
        f"{scrub} AS scrubbed",
    )
