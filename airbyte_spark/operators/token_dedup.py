"""Token-level span dedup: documents sharing exact k-token windows.

Training-data-pipeline extension (no analog in rosecape/airbyte — see
SURVEY.md §2.9b). This is the exact-substring family of dedup from the
public literature (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better": ExactSubstr removes repeated ≥50-token spans
across documents): MinHash-style sketches find *mostly*-similar pairs,
span matching finds verbatim reuse — boilerplate, licenses, quotes — even
when the surrounding documents differ completely.

Suffix arrays (the paper's tool) are a single-machine construction; the
distributed re-expression is rolling k-token windows: every document emits
the md5 digest of each distinct window of ``k`` consecutive token ids
(stride configurable), and two documents "share a span" iff they share a
window digest. A stride of s > 1 trades recall for s× less data: a shared
run of >= k + s - 1 tokens is still always caught (any such run contains a
window starting at a multiple of s in both docs only when s divides the
alignment — stride > 1 is the sampling variant; stride=1 is exact-k).

Scale design (100 TB):
- Window digests are computed MAP-SIDE from the token array (one
  transform + md5 per window, whole-stage codegen; tokenization itself is
  1 md5/word) and deduped within-doc (array_distinct) before the explode,
  so the exchange carries 32-byte digests — never token arrays, never
  text.
- Pair generation is an equi-join on the digest (never all-pairs);
  digests appearing in > ``max_docs_per_span`` documents (ubiquitous
  boilerplate — the quadratic bombs) are EXCLUDED before the self-join,
  with the drop loggable from the frequency table, exactly the
  fuzzy-dedup super-bucket rule.
- The span table is persisted: the frequency aggregate and both join
  probes consume it, and window construction is the dominant CPU (same
  trade as fuzzy_dedup's band cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

S = X.SPARK

#: digests in more docs than this are boilerplate, not dup evidence
MAX_DOCS_PER_SPAN = 64


def tokens_sql(d: str, text_col: str = "text", vocab: int = 50257) -> str:
    """Deterministic word→token-id mapping: 8 hex chars of md5(word) mod
    vocab (a stand-in BPE vocabulary — integer-exact in both engines).
    Yields array<int> in doc order, duplicates preserved."""
    X._chk(d)
    w = X.words_sql(d, text_col)
    tok = f"CAST({X.hexn_sql(d, 'md5(w)', 1, 8)} % {vocab} AS INT)"
    return f"{X.T(d)}({w}, w -> {tok})"


def span_digests_sql(
    d: str, text_col: str = "text", k: int = 8, stride: int = 1, vocab: int = 50257
) -> str:
    """Array of md5 digests, one per k-token window at positions 1, 1+s,
    1+2s, ... (1-based). Empty array when the doc has < k tokens."""
    X._chk(d)
    toks = tokens_sql(d, text_col, vocab)
    n = X.SIZE(d, "t")
    if d == S:
        win = f"array_join(transform(slice(t, p, {k}), x -> CAST(x AS STRING)), ',')"
        body = f"transform(sequence(1, {n} - {k} + 1, {stride}), p -> md5({win}))"
        guard = (
            f"CASE WHEN {n} >= {k} THEN {body} ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        # bind the token array once as lambda var t (projections have no
        # lateral alias): wrap in a 1-element array, map, take element 0
        return f"{X.T(d)}(array({toks}), t -> {guard})[0]"
    win = (
        f"array_to_string(list_transform(t[p:p+{k}-1], x -> CAST(x AS VARCHAR)), ',')"
    )
    body = f"list_transform(range(1, {n} - {k} + 2, {stride}), p -> md5({win}))"
    guard = f"CASE WHEN {n} >= {k} THEN {body} ELSE CAST([] AS VARCHAR[]) END"
    return f"{X.T(d)}([{toks}], t -> {guard})[1]"


def doc_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    stride: int = 1,
    vocab: int = 50257,
) -> DataFrame:
    """(doc_id, g): distinct k-token window digests per document."""
    arr = span_digests_sql(S, text_col, k, stride, vocab)
    return df.selectExpr(
        f"{id_col} AS doc_id",
        f"explode({X.ADISTINCT(S, arr)}) AS g",
    )


def token_span_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    stride: int = 1,
    vocab: int = 50257,
    max_docs_per_span: int = MAX_DOCS_PER_SPAN,
    min_shared: int = 1,
    cache_spans: bool = True,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` distinct k-token windows:
    (doc_a, doc_b, n_shared_spans), doc_a < doc_b. The distributed
    ExactSubstr candidate report — what a production pipeline feeds into
    span-level excision or doc-level dropping."""
    sp = doc_spans(df, id_col, text_col, k, stride, vocab)
    if cache_spans:
        sp = sp.persist()
    ok = (
        sp.groupBy("g")
        .agg(F.count("*").alias("n_docs"))
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= max_docs_per_span))
        .select("g")
    )
    a = sp.join(ok, "g").select("g", F.col("doc_id").alias("doc_a"))
    b = sp.select("g", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared_spans"))
        .filter(F.col("n_shared_spans") >= min_shared)
    )


def token_span_pairs_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    stride: int = 1,
    vocab: int = 50257,
    max_docs_per_span: int = MAX_DOCS_PER_SPAN,
    min_shared: int = 1,
    extra_cte: str = "",
) -> str:
    """DuckDB oracle: the same window-digest formula (md5 of identical
    strings — digests agree across engines), naive self-join form.
    ``extra_cte`` prepends a CTE (e.g. the dup-injected docs relation)."""
    d = X.DUCKDB
    arr = span_digests_sql(d, text_col, k, stride, vocab)
    pre = f"{extra_cte}," if extra_cte else ""
    return f"""
WITH {pre} sp AS (
  SELECT {id_col} AS doc_id, unnest({X.ADISTINCT(d, arr)}) AS g
  FROM {table_expr}
), ok AS (
  SELECT g FROM sp GROUP BY g
  HAVING COUNT(*) >= 2 AND COUNT(*) <= {max_docs_per_span}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_spans
FROM sp a JOIN ok USING (g) JOIN sp b USING (g)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {min_shared}
"""


def excise_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    vocab: int = 50257,
    cache_spans: bool = True,
) -> DataFrame:
    """The REMOVAL half of ExactSubstr (Lee et al. 2022 excise duplicated
    substrings; ``token_span_pairs`` is the detection half): every k-token
    window that occurs MORE THAN ONCE in the corpus (across documents or
    within one) is removed except its globally-first occurrence — the
    min-(doc_id, pos) witness, a total order, so the result is a pure
    function of the corpus (batching/partitioning-independent).

    Returns ``(doc_id, tokens array<int>, n_tok, n_removed)`` — the
    cleaned token sequence in original order (empty when everything was
    duplicated elsewhere), plus the removed-token count.

    Scale shape: REMOVAL IS LINEAR where pairing is quadratic — there is
    no self-join. One map-side window-digest pass (stride 1 — removal
    needs full coverage), ONE digest aggregate for (count, witness), one
    digest equi-join back (each occurrence contributes one hit row —
    occurrences, never occurrence pairs, so ubiquitous boilerplate needs
    no super-bucket cap here), a positions explode bounded by hits * k,
    and one per-doc ordered re-collect. Shuffles carry 32-byte digests
    and integer positions, never text.
    """
    # tokenize ONCE (split + one md5 per word is the dominant CPU) and
    # derive windows / token explode / counts from the cached array —
    # three consumers, one tokenization pass
    tok_arr = df.selectExpr(
        f"{id_col} AS doc_id", f"{tokens_sql(S, text_col, vocab)} AS _toks"
    )
    if cache_spans:
        tok_arr = tok_arr.persist()
    win = f"array_join(transform(slice(_toks, p, {k}), x -> CAST(x AS STRING)), ',')"
    digests = (
        f"CASE WHEN size(_toks) >= {k} "
        f"THEN transform(sequence(1, size(_toks) - {k} + 1), p -> md5({win})) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    pw = tok_arr.selectExpr(
        "doc_id", f"posexplode({digests}) AS (pos0, g)"
    ).selectExpr("doc_id", "pos0 + 1 AS pos", "g")
    dup = (
        pw.groupBy("g")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("w"),
        )
        .filter(F.col("n_occ") > 1)
        .select("g", "w")
    )
    hits = pw.join(dup, "g").filter(
        (F.col("doc_id") != F.col("w.doc_id")) | (F.col("pos") != F.col("w.pos"))
    )
    covered = hits.select(
        "doc_id", F.explode(F.expr(f"sequence(pos, pos + {k} - 1)")).alias("tp")
    ).distinct()
    toks = tok_arr.selectExpr(
        "doc_id", "posexplode(_toks) AS (tp0, tok)"
    ).selectExpr("doc_id", "tp0 + 1 AS tp", "tok")
    kept = (
        toks.join(covered, ["doc_id", "tp"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(tp, tok))), s -> s.tok)")
            .alias("tokens")
        )
    )
    base = tok_arr.selectExpr("doc_id", "size(_toks) AS _n_orig")
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tokens", F.expr("CAST(array() AS ARRAY<INT>)")).alias("tokens"),
            F.coalesce(F.size("tokens"), F.lit(0)).cast("long").alias("n_tok"),
            (F.col("_n_orig") - F.coalesce(F.size("tokens"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def excise_duplicate_spans_oracle_sql(
    table_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    vocab: int = 50257,
    extra_cte: str = "",
) -> str:
    """DuckDB oracle: identical keep-first rule via row_number over
    (doc_id, pos) within each digest; tokens gated as md5(csv) digests."""
    d = X.DUCKDB
    arr = span_digests_sql(d, text_col, k, 1, vocab)
    toks = tokens_sql(d, text_col, vocab)
    pre = f"{extra_cte}," if extra_cte else ""
    return f"""
WITH {pre} pw0 AS (
  SELECT {id_col} AS doc_id, unnest({arr}) AS g,
         generate_subscripts({arr}, 1) AS pos
  FROM {table_expr}
), ranked AS (
  SELECT doc_id, pos, g,
         COUNT(*) OVER (PARTITION BY g) AS n_occ,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
  FROM pw0
), covered AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos + {k})) AS tp
  FROM ranked WHERE n_occ > 1 AND rn > 1
), toks AS (
  SELECT {id_col} AS doc_id, unnest({toks}) AS tok,
         generate_subscripts({toks}, 1) AS tp
  FROM {table_expr}
), kept AS (
  SELECT t.doc_id,
         string_agg(CAST(t.tok AS VARCHAR), ',' ORDER BY t.tp) AS csv,
         COUNT(*) AS n_tok
  FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.tp = c.tp
  WHERE c.tp IS NULL
  GROUP BY t.doc_id
), base AS (
  SELECT {id_col} AS doc_id, len({toks}) AS n_orig FROM {table_expr}
)
SELECT b.doc_id,
       md5(COALESCE(k.csv, '')) AS clean_md5,
       CAST(COALESCE(k.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(b.n_orig - COALESCE(k.n_tok, 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN kept k USING (doc_id)
"""
