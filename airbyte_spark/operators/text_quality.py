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
