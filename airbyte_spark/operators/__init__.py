"""Relational operators of the CDC engine plus the training-data-pipeline
extension (fuzzy dedup, similarity search), expressed Spark-first."""

from airbyte_spark.operators.dedup import lww_dedup
from airbyte_spark.operators.fuzzy_dedup import (
    embedding_neardup_pairs,
    minhash_lsh_groups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_groups,
)
from airbyte_spark.operators.asof import asof_enrich
from airbyte_spark.operators.bloom import bloom_bits, bloom_probe
from airbyte_spark.operators.quantiles import percentile_cutoffs
from airbyte_spark.operators.stats import hll_estimate, hll_registers, merge_registers
from airbyte_spark.operators.incremental_dedup import (
    SignatureBatch,
    append_index,
    incremental_neardup_flags,
    signature_batch,
)
from airbyte_spark.operators.mixing import (
    mixture_sample,
    token_budget_sample,
    training_order,
)
from airbyte_spark.operators.token_dedup import doc_spans, token_span_pairs
from airbyte_spark.operators.components import connected_components, dedup_components
from airbyte_spark.operators.metadata import inject_cdc_metadata
from airbyte_spark.operators.merge import merge_upsert, merge_upsert_full, merge_upsert_mor
from airbyte_spark.operators.normalize import normalize_child_table
from airbyte_spark.operators.scd2 import batch_history_rows, scd2_apply
from airbyte_spark.operators.similarity import (
    knn_bruteforce,
    knn_ivf,
    knn_ivf_kmeans,
    knn_lsh,
)
from airbyte_spark.operators.packing import hash_split, pack_sequences, pack_stats
from airbyte_spark.operators.sessionize import (
    session_rollup,
    sessionize,
    streaming_session_rollup,
)
from airbyte_spark.operators.urls import canonicalize_url, url_dedup
from airbyte_spark.operators.text_quality import (
    contamination_check,
    dup_ngram_fraction,
    pii_scrub,
    quality_classifier,
)

__all__ = [
    "lww_dedup",
    "sessionize",
    "session_rollup",
    "streaming_session_rollup",
    "canonicalize_url",
    "url_dedup",
    "inject_cdc_metadata",
    "merge_upsert",
    "merge_upsert_full",
    "merge_upsert_mor",
    "minhash_signatures",
    "minhash_lsh_groups",
    "ngram_jaccard_pairs",
    "simhash_groups",
    "embedding_neardup_pairs",
    "connected_components",
    "dedup_components",
    "normalize_child_table",
    "batch_history_rows",
    "scd2_apply",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_kmeans",
    "dup_ngram_fraction",
    "contamination_check",
    "pii_scrub",
    "quality_classifier",
    "SignatureBatch",
    "signature_batch",
    "incremental_neardup_flags",
    "append_index",
    "mixture_sample",
    "token_budget_sample",
    "training_order",
    "doc_spans",
    "token_span_pairs",
    "pack_sequences",
    "pack_stats",
    "hash_split",
    "asof_enrich",
]
