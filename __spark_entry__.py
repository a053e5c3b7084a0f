"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an engine operator (SURVEY.md §2) over the
driver testdata and has an exact DuckDB oracle in ``oracle_sql()``. The CDC
operators run over a deterministic changelog *derived* from the `events`
table with arithmetic that is bit-identical in Spark SQL and DuckDB
(airbyte_spark/plans/derived.py), so the full pipeline — LWW dedup,
tombstones, validation pandas UDF, metadata injection, checkpoint aggregate
— is value-hash-gated, not just row-counted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_spark.functions.validate import apply_validation
from airbyte_spark.operators.dedup import lww_dedup
from airbyte_spark.plans.derived import ORACLE_CHANGELOG_CTE, derived_changelog

SF0001 = "/root/testdata/sf0.001"

_VOCAB = 50_257


# ---------------------------------------------------------------- helpers


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_changelog(spark, sf_dir)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_FINAL_COLS = [
    "doc_id",
    "op",
    "lsn",
    "ts_ms",
    "source_partition",
    "event_type",
    "n_tok",
    "payload_hash",
]


# ---------------------------------------------------------------- queries


def q_cdc_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core operator: last-writer-wins winner per key (max_by hash agg)."""
    ch = _changelog(spark, sf_dir).drop("tokens")
    return lww_dedup(ch, key="doc_id").select(*_FINAL_COLS)


def q_cdc_apply_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full replay pipeline in one plan: validate (pandas UDF) -> LWW dedup
    -> tombstone filter -> metadata injection. The flagship query."""
    ch = _changelog(spark, sf_dir)
    ch = apply_validation(ch, _VOCAB)  # repairs corrupted n_tok, flags errors
    winners = lww_dedup(ch, key="doc_id")
    final = winners.filter(F.col("op") != "D")
    return final.select(
        "doc_id",
        "lsn",
        "ts_ms",
        "event_type",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias("tokens_sum"),
        F.md5(F.concat_ws(":", "doc_id", "lsn", "ts_ms")).alias("raw_id"),
        F.size("_ab_meta.errors").cast("long").alias("n_errors"),
    )


def q_cdc_validate_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized validation UDF alone: repair + flag, never drop."""
    ch = _changelog(spark, sf_dir).filter(F.col("op") != "D")
    out = apply_validation(ch.withColumnRenamed("n_tok", "n_tok_raw").withColumn("n_tok", F.col("n_tok_raw")), _VOCAB)
    return out.select(
        "doc_id",
        "lsn",
        F.col("n_tok_raw").cast("long").alias("n_tok_raw"),
        F.col("n_tok").cast("long").alias("n_tok_fixed"),
        F.array_contains("_ab_meta.errors", "n_tok_mismatch").cast("int").alias("had_mismatch"),
    )


def q_cdc_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The defining incremental filter: cursor > checkpoint AND <= target."""
    ch = _changelog(spark, sf_dir).drop("tokens")
    return ch.filter((F.col("lsn") > 3000) & (F.col("lsn") <= 6000)).select(*_FINAL_COLS)


def q_cdc_metadata_injection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_ab_cdc_* metadata columns (deterministic raw id, tombstone ts)."""
    ch = _changelog(spark, sf_dir)
    return ch.select(
        "doc_id",
        "lsn",
        F.md5(F.concat_ws(":", "doc_id", "lsn", "ts_ms")).alias("raw_id"),
        F.when(F.col("op") == "D", F.col("ts_ms")).alias("deleted_at_ms"),
        F.col("ts_ms").alias("extracted_at_ms"),
    )


def q_cdc_checkpoint_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-partition state: max cursor + counters
    (StateDecoratingIterator max-cursor tracking as a groupBy)."""
    ch = _changelog(spark, sf_dir)
    return ch.groupBy("source_partition").agg(
        F.max("lsn").alias("last_lsn"),
        F.count("*").alias("events"),
        F.countDistinct("doc_id").alias("distinct_docs"),
    )


def q_cdc_tombstone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-key op distribution after LWW (tombstone retention check)."""
    ch = _changelog(spark, sf_dir).drop("tokens")
    return lww_dedup(ch, key="doc_id").groupBy("op").agg(F.count("*").alias("n"))


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents: keeper (min id) + copy count per text."""
    d = _docs(spark, sf_dir)
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    ).select("keep_doc_id", "n_copies")


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over a normalized prefix (first 80
    chars) -> near-dup candidate groups."""
    d = _docs(spark, sf_dir)
    fp = F.md5(F.substring(F.col("text"), 1, 80))
    return (
        d.select(F.col("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("group_size"))
    )


def q_docs_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats per document."""
    d = _docs(spark, sf_dir)
    n_space = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        (n_space + F.lit(1)).cast("long").alias("n_words"),
    )


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: word/char ratios as exact integer arithmetic."""
    d = _docs(spark, sf_dir)
    n_space = F.length("text") - F.length(F.regexp_replace("text", " ", ""))
    n_words = n_space + F.lit(1)
    avg_wlen_x100 = ((F.length("text") - n_space) * F.lit(100)).cast("long") / n_words.cast("long")
    return d.select(
        "doc_id",
        "lang",
        n_words.cast("long").alias("n_words"),
        F.floor(avg_wlen_x100).cast("long").alias("avg_word_len_x100"),
        (F.length("text") >= 200).cast("int").alias("is_long"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word hit counts) scored against the
    labeled lang column."""
    d = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = (
        F.when(padded.like("% the %") | padded.like("% and %"), "en")
        .when(padded.like("% der %") | padded.like("% und %"), "de")
        .when(padded.like("% le %") | padded.like("% et %"), "fr")
        .when(padded.like("% el %") | padded.like("% y %"), "es")
        .otherwise("unknown")
    )
    return (
        d.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC pipeline (validate -> dedup -> apply) at sf0.001."""
    return q_cdc_apply_final(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_dedup": q_cdc_lww_dedup,
        "cdc_apply_final": q_cdc_apply_final,
        "cdc_validate_tokens": q_cdc_validate_tokens,
        "cdc_incremental_cursor": q_cdc_incremental_cursor,
        "cdc_metadata_injection": q_cdc_metadata_injection,
        "cdc_checkpoint_agg": q_cdc_checkpoint_agg,
        "cdc_tombstone_stats": q_cdc_tombstone_stats,
        "dedup_exact_docs": q_dedup_exact_docs,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_token_count": q_docs_token_count,
        "docs_quality": q_docs_quality,
        "lang_id": q_lang_id,
    }


_CH = ORACLE_CHANGELOG_CTE  # derived-changelog SELECT (DuckDB dialect)

_WINNERS = f"""
WITH ch AS ({_CH}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC, ts_ms DESC) AS rn
  FROM ch
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_lww_dedup": _WINNERS
        + """
SELECT doc_id, op, lsn, ts_ms, source_partition, event_type, n_tok, payload_hash
FROM ranked WHERE rn = 1
""",
        "cdc_apply_final": _WINNERS
        + """
SELECT doc_id, lsn, ts_ms, event_type,
       CAST(len(tokens) AS BIGINT) AS n_tok,
       CAST(list_sum(tokens) AS BIGINT) AS tokens_sum,
       md5(doc_id || ':' || lsn || ':' || ts_ms) AS raw_id,
       CAST(CASE WHEN n_tok != len(tokens) THEN 1 ELSE 0 END AS BIGINT) AS n_errors
FROM ranked WHERE rn = 1 AND op != 'D'
""",
        "cdc_validate_tokens": f"""
WITH ch AS ({_CH})
SELECT doc_id, lsn,
       n_tok AS n_tok_raw,
       CAST(len(tokens) AS BIGINT) AS n_tok_fixed,
       CAST(CASE WHEN n_tok != len(tokens) THEN 1 ELSE 0 END AS INT) AS had_mismatch
FROM ch WHERE op != 'D'
""",
        "cdc_incremental_cursor": f"""
WITH ch AS ({_CH})
SELECT doc_id, op, lsn, ts_ms, source_partition, event_type, n_tok, payload_hash
FROM ch WHERE lsn > 3000 AND lsn <= 6000
""",
        "cdc_metadata_injection": f"""
WITH ch AS ({_CH})
SELECT doc_id, lsn,
       md5(doc_id || ':' || lsn || ':' || ts_ms) AS raw_id,
       CASE WHEN op = 'D' THEN ts_ms END AS deleted_at_ms,
       ts_ms AS extracted_at_ms
FROM ch
""",
        "cdc_checkpoint_agg": f"""
WITH ch AS ({_CH})
SELECT source_partition, max(lsn) AS last_lsn, count(*) AS events,
       count(DISTINCT doc_id) AS distinct_docs
FROM ch GROUP BY source_partition
""",
        "cdc_tombstone_stats": _WINNERS
        + """
SELECT op, count(*) AS n FROM ranked WHERE rn = 1 GROUP BY op
""",
        "dedup_exact_docs": """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
        "docs_fingerprint": """
SELECT md5(substr(text, 1, 80)) AS fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS group_size
FROM documents GROUP BY 1
""",
        "docs_token_count": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words
FROM documents
""",
        "docs_quality": """
SELECT doc_id, lang,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
       CAST(floor(((length(text) - (length(text) - length(replace(text, ' ', '')))) * 100.0)
            / (length(text) - length(replace(text, ' ', '')) + 1)) AS BIGINT) AS avg_word_len_x100,
       CAST(CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS INT) AS is_long
FROM documents
""",
        "lang_id": """
SELECT lang,
       CASE WHEN (' ' || text || ' ') LIKE '% the %' OR (' ' || text || ' ') LIKE '% and %' THEN 'en'
            WHEN (' ' || text || ' ') LIKE '% der %' OR (' ' || text || ' ') LIKE '% und %' THEN 'de'
            WHEN (' ' || text || ' ') LIKE '% le %' OR (' ' || text || ' ') LIKE '% et %' THEN 'fr'
            WHEN (' ' || text || ' ') LIKE '% el %' OR (' ' || text || ' ') LIKE '% y %' THEN 'es'
            ELSE 'unknown' END AS pred,
       count(*) AS n
FROM documents GROUP BY 1, 2
""",
    }
