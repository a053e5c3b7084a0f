"""Distributed BPE merge training — the word-count formulation.

The tokenizer-training step of a pre-training data pipeline (the reference
stops at transport; this engine's §2.9b extension ships the corpus ops).
Classic byte-pair encoding (Sennrich et al. 2016, public algorithm): learn
the top-N pair merges from corpus statistics, then segment text with them.

Scale shape — the part that matters at 100 TB:

- The ONLY corpus-scale job is the initial word-count aggregate (explode →
  ONE partial-combined groupBy). Everything after runs on the distinct-word
  table (~10^6-10^7 rows even at corpus scale), because BPE statistics are
  a pure function of (word, count) — the corpus text is never touched
  again.
- Each merge iteration is two small jobs over that vocab-sized table: an
  adjacent-pair count (explode zip, partial-combined sum, argmax row
  collected — ONE bounded driver row per iteration) and a greedy merge
  rewrite expressed as a pure-Catalyst ``F.aggregate`` fold over the symbol
  arrays (left-to-right greedy, exactly the sequential semantics — no
  Python on any row). The table is persisted and its lineage is cut with
  ``localCheckpoint`` every few iterations so plan depth stays bounded.
- Determinism / partitioning-independence: the argmax tie-break is total —
  (count DESC, left ASC, right ASC) — so the learned merge list is a pure
  function of the corpus, not of the cluster layout.
- Encoding the corpus = a broadcast join of the trained segmentation table
  (word -> symbols) back onto the documents: no merge re-application at
  corpus-encode time; by construction the table covers every corpus word.

Gating: iterative training is not SQL-expressible, so there is no DuckDB
oracle; instead ``tests/test_bpe.py`` pins the Spark implementation
byte-for-byte against an independent single-threaded reference
implementation (same tie-break), plus partitioning-invariance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # marks word end so "low" != prefix of "lower"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) — the single corpus-scale pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """word -> character symbols + end-of-word marker."""
    return F.concat(
        F.filter(F.split(word, ""), lambda c: c != ""),
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_once(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge (left, right) ->
    left+right, as a Catalyst fold — the exact sequential semantics
    ([a,a,a] under (a,a) -> [aa,a])."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, segmentation)``: merges as ordered
    ``(left, right, pair_count)`` and the trained segmentation table
    ``(word, n, syms array<string>)`` covering every corpus word.
    """
    words = word_counts(docs, text_col).select(
        "word", "n", _initial_symbols(F.col("word")).alias("syms")
    )
    words = words.persist()
    words.count()  # materialize before the iteration loop

    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        pairs = (
            words.select(
                F.col("n"),
                F.explode(
                    F.filter(
                        F.arrays_zip(
                            F.slice("syms", 1, F.size("syms")),
                            F.slice("syms", 2, F.size("syms")),
                        ),
                        lambda p: p["1"].isNotNull(),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        # ONE bounded driver row; total tie-break order makes the learned
        # list independent of partitioning
        best = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).first()
        if best is None or best["cnt"] < min_pair_count:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b, int(best["cnt"])))
        nxt = words.withColumn("syms", _merge_once(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            # cut lineage: plan depth would otherwise grow one fold per merge
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.persist()
            nxt.count()
        words.unpersist()
        words = nxt
    return merges, words


def bpe_encode(
    docs: DataFrame,
    segmentation: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus tokenization with the trained segmentation: documents explode
    to (doc, pos, word), broadcast-join the vocab-sized segmentation, and
    token order is restored via array_sort(collect_list(struct(pos, syms)))
    — partitioning-independent, same idiom as operators/tokenize.py."""
    tokens_by_word = F.broadcast(segmentation.select("word", "syms"))
    exploded = docs.select(
        F.col(id_col),
        F.posexplode(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")).alias(
            "pos", "word"
        ),
    )
    joined = exploded.join(tokens_by_word, "word", "left").select(
        id_col, "pos", F.coalesce("syms", F.array(F.col("word"))).alias("syms")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )
