"""Corpus tokenization: documents -> the engine's pre-tokenized
training-sequence shape (doc_id, tokens array<int>, n_tok, source).

Training-data-pipeline extension (no analog in rosecape/airbyte — its
pipeline moves records, never builds token ids; see SURVEY.md §2.9b).
This operator is the bridge between the raw `documents` corpus and the
tokenized-sequences table the CDC engine ingests (BASELINE.json
input_hint): a word-level tokenizer with a corpus-derived vocabulary —
the id-assignment stage every subword tokenizer (BPE/WordPiece) ends
with, linearized to whole words so the whole program is expressible in
portable SQL and has an exact DuckDB oracle.

Scale design (100 TB):
- The vocabulary is top-N words by (frequency DESC, word ASC) via a
  distributed TakeOrdered (orderBy+limit — NEVER a global window over
  the full 10^8-word vocabulary); ids are dense ranks 0..N-1 assigned by
  a window over only the N surviving rows (driver-small by definition).
- The corpus side never shuffles text: words explode map-side, the
  (tiny) vocab broadcasts back, and the only wide exchange is the
  per-document regroup of (pos, tid) pairs — integers, not strings.
- Sequence order is restored with array_sort(collect_list(struct(pos,
  tid))): collect_list has no ordering guarantee across merged partial
  aggregates, so order lives in the data (pos is first struct field),
  making the result partitioning-independent — replay-deterministic the
  same way the engine's LWW total order is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

S = X.SPARK


def build_vocab(df: DataFrame, text_col: str = "text", vocab_top: int = 512) -> DataFrame:
    """(w, tid) — the corpus's ``vocab_top`` most frequent words, dense ids
    0..N-1 ordered by (frequency DESC, word ASC). The total order is
    deterministic, so the oracle's row_number formulation assigns the
    identical ids. TakeOrdered bounds the sort at N rows per partition;
    the ranking window runs over the already-truncated (tiny) survivor
    set only."""
    top = (
        df.select(F.explode(F.expr(X.words_sql(S, text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("w").asc())
        .limit(vocab_top)
    )
    # rank the <=vocab_top survivors via pack-sort-posexplode (bounded
    # single-row aggregate) instead of a no-partition rank window — same
    # ids, no WindowExec single-partition warning in operator logs
    packed = top.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("tf")).alias("_neg"), F.col("w").alias("w")))
        ).alias("_a")
    )
    return packed.select(F.posexplode("_a").alias("_pos", "_s")).select(
        F.col("_s.w").alias("w"), F.col("_pos").cast("int").alias("tid")
    )


def tokenize_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    vocab_top: int = 512,
) -> DataFrame:
    """Tokenize every document against the corpus top-N vocabulary.
    Out-of-vocabulary words map to the single OOV id ``vocab_top``.
    Returns (doc_id, tokens array<int>, n_tok int, n_oov bigint, source)
    — exactly the CDC engine's input-table shape (BASELINE.json
    input_hint) plus the OOV count quality signal."""
    vocab = build_vocab(df, text_col, vocab_top)
    pos_words = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.posexplode(F.expr(X.words_sql(S, text_col))).alias("pos", "w"),
    )
    tagged = pos_words.join(F.broadcast(vocab), "w", "left").select(
        "doc_id",
        "source",
        "pos",
        F.coalesce(F.col("tid"), F.lit(vocab_top)).cast("int").alias("tid"),
    )
    return (
        tagged.groupBy("doc_id", "source")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, tid))), p -> p.tid)").alias(
                "tokens"
            ),
            F.sum((F.col("tid") == vocab_top).cast("long")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "tokens",
            F.size("tokens").cast("int").alias("n_tok"),
            "n_oov",
            "source",
        )
    )


def tokenize_digest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    vocab_top: int = 512,
) -> DataFrame:
    """Hash-gateable projection of tokenize_corpus: the token array is
    folded to md5(comma-joined ids) so the driver's value-hash compare
    sees scalar columns (cross-engine array hashing is not part of the
    compare contract). Returns (doc_id, n_tok, n_oov, tokens_md5,
    source)."""
    t = tokenize_corpus(df, id_col, text_col, source_col, vocab_top)
    return t.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "n_oov",
        F.md5(F.array_join(F.expr("transform(tokens, t -> CAST(t AS STRING))"), ",")).alias(
            "tokens_md5"
        ),
        "source",
    )


def tokenize_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    vocab_top: int = 512,
) -> str:
    """DuckDB oracle for tokenize_digest: row_number-windowed vocabulary
    (identical id assignment by the deterministic (tf DESC, w ASC) total
    order), lateral positional unnest, list(tid ORDER BY pos)."""
    d = X.DUCKDB
    return f"""
WITH vocab AS (
  SELECT w, CAST(rk - 1 AS INTEGER) AS tid
  FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rk
    FROM (
      SELECT unnest({X.words_sql(d, text_col)}) AS w FROM {table_expr}
    ) GROUP BY w
  ) WHERE rk <= {vocab_top}
), pos_words AS (
  SELECT {id_col} AS doc_id, {source_col} AS source, i AS pos, ws[i] AS w
  FROM (
    SELECT {id_col}, {source_col}, {X.words_sql(d, text_col)} AS ws
    FROM {table_expr}
  ), unnest(range(1, len(ws) + 1)) AS r(i)
), tagged AS (
  SELECT doc_id, source, pos,
         COALESCE(v.tid, {vocab_top}) AS tid
  FROM pos_words p LEFT JOIN vocab v USING (w)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(CASE WHEN tid = {vocab_top} THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       md5(array_to_string(list(tid ORDER BY pos), ',')) AS tokens_md5,
       source
FROM tagged
GROUP BY doc_id, source
"""


def detokenize_digest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    vocab_top: int = 512,
    unk: str = "<unk>",
) -> DataFrame:
    """Encode -> decode roundtrip through the inverted vocabulary — the
    detokenizer every training pipeline needs next to its tokenizer (and
    the cheapest end-to-end check that the vocab join is lossless in both
    directions). OOV ids decode to the reserved ``unk`` marker.

    Returns (doc_id, n_tok, n_oov, decoded_md5, words_md5, roundtrip_ok,
    source) where ``decoded_md5`` digests the space-joined decoded word
    sequence, ``words_md5`` digests the original word sequence, and
    ``roundtrip_ok`` asserts the invariant "a document with zero OOV
    tokens decodes bit-identically" (1 when n_oov > 0 or the digests
    match — any 0 is a tokenizer bug).

    Scale shape: one extra narrow explode + broadcast vocab join + the
    same (pos, word) regroup idiom as tokenize_corpus — only integer ids
    and vocabulary words (bounded set) cross the wire; original text
    never shuffles (words_md5 is computed map-side before the explode)."""
    vocab = build_vocab(df, text_col, vocab_top)
    words_md5 = df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.array_join(F.expr(X.words_sql(S, text_col)), " ")).alias("words_md5"),
    )
    toks = tokenize_corpus(df, id_col, text_col, source_col, vocab_top)
    pos_tid = toks.select(
        "doc_id", "source", "n_tok", "n_oov", F.posexplode("tokens").alias("pos", "tid")
    )
    decoded = (
        pos_tid.join(F.broadcast(vocab), "tid", "left")
        .select(
            "doc_id",
            "source",
            "n_tok",
            "n_oov",
            "pos",
            F.coalesce(F.col("w"), F.lit(unk)).alias("w"),
        )
        .groupBy("doc_id", "source", "n_tok", "n_oov")
        .agg(
            F.md5(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(pos, w))), p -> p.w)"),
                    " ",
                )
            ).alias("decoded_md5")
        )
    )
    return decoded.join(words_md5, "doc_id").select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "n_oov",
        "decoded_md5",
        "words_md5",
        ((F.col("n_oov") > 0) | (F.col("decoded_md5") == F.col("words_md5")))
        .cast("int")
        .alias("roundtrip_ok"),
        "source",
    )


def detokenize_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    vocab_top: int = 512,
    unk: str = "<unk>",
) -> str:
    """DuckDB oracle for detokenize_digest: the tokenize oracle's CTEs,
    then the inverse vocab join on tid and list(w ORDER BY pos)."""
    d = X.DUCKDB
    return f"""
WITH vocab AS (
  SELECT w, CAST(rk - 1 AS INTEGER) AS tid
  FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rk
    FROM (
      SELECT unnest({X.words_sql(d, text_col)}) AS w FROM {table_expr}
    ) GROUP BY w
  ) WHERE rk <= {vocab_top}
), pos_words AS (
  SELECT {id_col} AS doc_id, {source_col} AS source, i AS pos, ws[i] AS w
  FROM (
    SELECT {id_col}, {source_col}, {X.words_sql(d, text_col)} AS ws
    FROM {table_expr}
  ), unnest(range(1, len(ws) + 1)) AS r(i)
), tagged AS (
  SELECT doc_id, source, pos,
         COALESCE(v.tid, {vocab_top}) AS tid
  FROM pos_words p LEFT JOIN vocab v USING (w)
), decoded AS (
  SELECT doc_id, source,
         CAST(COUNT(*) AS BIGINT) AS n_tok,
         CAST(SUM(CASE WHEN t.tid = {vocab_top} THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         md5(array_to_string(list(COALESCE(v2.w, '{unk}') ORDER BY pos), ' ')) AS decoded_md5
  FROM tagged t LEFT JOIN vocab v2 USING (tid)
  GROUP BY doc_id, source
), originals AS (
  SELECT {id_col} AS doc_id,
         md5(array_to_string({X.words_sql(d, text_col)}, ' ')) AS words_md5
  FROM {table_expr}
)
SELECT d.doc_id, d.n_tok, d.n_oov, d.decoded_md5, o.words_md5,
       CAST(CASE WHEN d.n_oov > 0 OR d.decoded_md5 = o.words_md5 THEN 1 ELSE 0 END AS INT)
         AS roundtrip_ok,
       d.source
FROM decoded d JOIN originals o USING (doc_id)
"""
