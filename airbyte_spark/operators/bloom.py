"""Seen-key Bloom prefilter: a deterministic Bloom filter over already-
ingested content digests, probed by each incoming batch before the
expensive dedup paths run.

Training-data-pipeline extension (no analog in rosecape/airbyte —
SURVEY.md §2.9b; the reference's only dedup is the PK LWW window,
`destination-bigquery/.../BigQuerySqlGenerator.java:572-631`). At web
scale the standard ingest pattern is a cheap membership sketch in front
of the exact/fuzzy dedup machinery: a URL or content digest that is
"definitely new" (any Bloom bit unset) skips the seen-set entirely;
only "maybe seen" rows (all k bits set) pay the exact verification
join. False positives cost a wasted verify; false negatives are
impossible — the two properties tests/test_bloom.py pins.

Determinism: bit positions are disjoint 6-hex windows of ONE md5 per
row (`plans/textsql.bloom_pos_sql`), so the filter is a pure function
of the data — independent of partitioning, batch order, and engine.
That is what makes it exactly oracle-checkable in DuckDB (queries()
key `dedup_bloom_prefilter`), unlike Spark's native `bloom_filter_agg`
/ `might_contain` pair whose bit layout is engine-private (that pair is
the drop-in production alternative when cross-engine determinism is not
required; same plan shape — one aggregate, one broadcast).

Scale design (100 TB):
- Build: one narrow projection + explode over the corpus, then a
  distinct on the position column — partial-combined, and the shuffle
  is capped at ``m`` distinct integers per mapper regardless of corpus
  size. The result is AT MOST ``m`` rows (a few MB even at m = 2^24):
  always broadcastable, and incrementally maintainable by unioning new
  batches' positions (set-union = append + distinct, batching-
  independent by construction).
- Probe: k LEFT broadcast-hash joins against the bits table — ZERO
  exchanges on the batch side (plan-gated). The batch never shuffles;
  cost is k hash lookups per row.
- Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; for n seen keys
  pick m ≈ 16n–32n bits at k = 4 (fp 2.4%–0.24%). ``m`` beyond ~2^26
  rows would stop being broadcast-friendly — shard the key space into
  independent filters (one per md5 prefix) and probe the matching
  shard, same plan per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_spark.plans import textsql as X

S = X.SPARK

#: default geometry: m = 2^20 bits, k = 4 hash functions — fp < 1% up to
#: ~65k seen keys; demo/query geometry is smaller so sf-scale tests see
#: realistic fill factors.
DEFAULT_M = 1 << 20
DEFAULT_K = 4


def _positions(text_col: str, m: int, k: int) -> list:
    return [F.expr(X.bloom_pos_sql(S, text_col, i, m)) for i in range(k)]


def bloom_bits(
    corpus: DataFrame,
    text_col: str = "text",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The filter itself: the distinct set bit positions (<= m rows) over
    ``md5(text_col)`` of everything seen so far. Persist and append-union
    per batch; order never matters."""
    return (
        corpus.select(F.explode(F.array(*_positions(text_col, m, k))).alias("pos"))
        .distinct()
    )


def bloom_probe(
    batch: DataFrame,
    bits: DataFrame,
    text_col: str = "text",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    flag_col: str = "maybe_seen",
) -> DataFrame:
    """Append ``flag_col`` (int 1/0) to ``batch``: 1 iff ALL k bit
    positions of the row's content digest are set in ``bits``. k left
    broadcast joins — the batch side never exchanges (plan-gated in
    tests/test_bloom.py). ``bits`` MUST have been built with the same
    (m, k) geometry."""
    out = batch
    pos = _positions(text_col, m, k)
    hits = []
    for i, p in enumerate(pos):
        b = F.broadcast(bits.select(F.col("pos").alias(f"_bloom_b{i}")))
        out = out.join(b, p == F.col(f"_bloom_b{i}"), "left")
        hits.append(F.col(f"_bloom_b{i}").isNotNull())
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    return out.withColumn(flag_col, flag.cast("int")).drop(
        *[f"_bloom_b{i}" for i in range(k)]
    )
