"""Catalog discovery (airbyte-protocol discover phase) + IVF ANN recall."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_discover_table_catalog(spark, workdir):
    from airbyte_spark.config import StreamConfig
    from airbyte_spark.engine import CdcEngine
    from airbyte_spark.sources.discover import discover_table

    eng = CdcEngine(spark, os.path.join(workdir, "lake"), StreamConfig(num_buckets=4))
    eng.create_table()
    cat = discover_table(eng.table)
    (stream,) = cat["streams"]
    assert stream["name"] == "tokenseq"
    props = stream["json_schema"]["properties"]
    assert props["doc_id"] == {"type": "string"}
    assert props["tokens"] == {"type": "array", "items": {"type": "integer"}}
    assert props["n_tok"] == {"type": "integer"}
    assert props["_ab_extracted_at"] == {"type": "string", "format": "date-time"}
    assert stream["source_defined_primary_key"] == [["doc_id"]]
    assert stream["default_cursor_field"] == ["_ab_lsn"]
    assert stream["supported_sync_modes"] == ["full_refresh", "incremental"]


def test_discover_files_catalog(spark, workdir):
    from airbyte_spark.changelog import ChangelogConfig, write_changelog
    from airbyte_spark.sources.discover import discover_files

    clpath = os.path.join(workdir, "cl")
    write_changelog(spark, ChangelogConfig(n_events=200, n_seed_docs=50), clpath)
    cat = discover_files(spark, clpath, "parquet")
    (stream,) = cat["streams"]
    props = stream["json_schema"]["properties"]
    assert props["op"] == {"type": "string"}
    assert props["lsn"] == {"type": "integer"}
    assert props["tokens"]["type"] == "array"
    assert stream["source_defined_primary_key"] == [["doc_id"]]
    assert stream["default_cursor_field"] == ["lsn"]


def test_knn_ivf_recall_and_exactness(spark):
    """KMeans-IVF results must be a subset of the exact scoring space (dot
    values identical to brute force for returned pairs) with reasonable
    recall at n_probe=8 of 16 lists."""
    from airbyte_spark.operators.similarity import knn_bruteforce, knn_ivf_kmeans

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_bruteforce(emb, queries, top_k=5).toPandas()
    approx = knn_ivf_kmeans(
        emb, queries, top_k=5, n_centroids=16, n_probe=8, seed=42
    ).toPandas()

    exact_pairs = {(r.query_id, r.neighbor_id): r.dot for r in exact.itertuples()}
    # dot values agree exactly wherever both report the pair
    agree = 0
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in exact_pairs:
            assert r.dot == exact_pairs[(r.query_id, r.neighbor_id)]
            agree += 1
    recall = agree / len(exact_pairs)
    assert recall >= 0.4, f"recall {recall} too low for n_probe=8/16"
    # per-query ranks are 1..k dense and ordered by dot desc
    for _, g in approx.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert list(g["dot"]) == sorted(g["dot"], reverse=True)
    # determinism: same seed -> identical result
    approx2 = knn_ivf_kmeans(
        emb, queries, top_k=5, n_centroids=16, n_probe=8, seed=42
    ).toPandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = approx2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_knn_ivf_deterministic_quantizer(spark):
    """The oracle-gated IVF (integer seeded quantizer): exact dots,
    deterministic, reasonable recall at n_probe=8/16."""
    from airbyte_spark.operators.similarity import knn_bruteforce, knn_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_bruteforce(emb, queries, top_k=5).toPandas()
    approx = knn_ivf(emb, queries, top_k=5, n_centroids=16, n_probe=8).toPandas()
    exact_pairs = {(r.query_id, r.neighbor_id): r.dot for r in exact.itertuples()}
    agree = 0
    for r in approx.itertuples():
        if (r.query_id, r.neighbor_id) in exact_pairs:
            assert r.dot == exact_pairs[(r.query_id, r.neighbor_id)]
            agree += 1
    assert agree / len(exact_pairs) >= 0.3
    approx2 = knn_ivf(emb, queries, top_k=5, n_centroids=16, n_probe=8).toPandas()
    a = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = approx2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
