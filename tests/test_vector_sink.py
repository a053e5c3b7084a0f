"""Vector-index sink (operators/vector_sink.py).

Pins the reference's vector-DB destination semantics — chunking with
_ab_record_id/_ab_stream metadata (document_processor.py), replace-by-record
index writes and CDC-delete chunk removal (writer.py) — plus the
Spark-specific scale contracts: content-preserving chunk assignment,
bucket-scoped CoW (untouched buckets' files byte-identical), idempotent
batch application, and batching-invariance of the maintained index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_spark.operators.vector_sink import (
    META_RECORD_ID,
    ChunkIndex,
    chunk_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_chunks_preserve_content(spark):
    """overlap=0: joining a doc's chunks with the separator reconstructs the
    original text exactly — no characters lost or duplicated."""
    rows = [
        ("d1", "para one\n\npara two\n\npara three is quite a bit longer\n\nfour"),
        ("d2", "x" * 300),  # one segment longer than chunk_size -> 1 chunk
        ("d3", "short"),
    ]
    out = chunk_documents(
        _docs(spark, rows), chunk_size=30, overlap=0, separator="\n\n"
    )
    got = {
        r[META_RECORD_ID]: r.joined
        for r in out.groupBy(META_RECORD_ID)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "page_content"))),
                    lambda s: s["page_content"],
                ),
                "\n\n",
            ).alias("joined")
        )
        .collect()
    }
    assert got == {d: t for d, t in rows}


def test_chunk_boundaries_and_metadata(spark):
    out = chunk_documents(
        _docs(spark, [("d1", "aa bb cc dd ee")]),
        chunk_size=6,
        overlap=0,
        separator=" ",
        stream="docs",
    ).orderBy("chunk_idx")
    rows = out.collect()
    # stride 6: segment starts 0,3,6,9,12 -> chunks 0,0,1,1,2
    assert [r.page_content for r in rows] == ["aa bb", "cc dd", "ee"]
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert all(r._ab_stream == "docs" and r._ab_record_id == "d1" for r in rows)
    assert all(r.n_chars == len(r.page_content) for r in rows)
    # deterministic ids
    again = chunk_documents(
        _docs(spark, [("d1", "aa bb cc dd ee")]), chunk_size=6, separator=" "
    )
    assert {r.chunk_id for r in rows} == {r.chunk_id for r in again.collect()}


def test_overlap_prefixes_previous_tail(spark):
    out = chunk_documents(
        _docs(spark, [("d1", "abcd efgh ijkl")]),
        chunk_size=7,
        overlap=2,
        separator=" ",
    ).orderBy("chunk_idx")
    rows = out.collect()
    # stride 5: starts 0,5,10 -> chunks 0,1,2; each later chunk prefixed
    # with the previous chunk's last 2 chars + separator
    assert rows[0].page_content == "abcd"
    assert rows[1].page_content == "cd efgh"
    assert rows[2].page_content == "gh ijkl"


def test_empty_and_null_docs_emit_nothing(spark):
    out = chunk_documents(
        _docs(spark, [("d1", ""), ("d2", None), ("d3", "ok")]), chunk_size=10
    )
    assert [r[META_RECORD_ID] for r in out.collect()] == ["d3"]


def test_bad_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, []), chunk_size=10, overlap=10)


# ---------------------------------------------------------------- ChunkIndex


def _chunks_of(spark, rows, **kw):
    return chunk_documents(_docs(spark, rows), chunk_size=20, separator=" ", **kw)


def _mk_index(spark, workdir, sub="chunks"):
    import os

    schema = _chunks_of(spark, []).schema
    return ChunkIndex.create(spark, os.path.join(workdir, sub), schema, num_buckets=8)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], f"{META_RECORD_ID} string")


def _state(idx):
    return sorted(
        (r[META_RECORD_ID], r.chunk_idx, r.page_content)
        for r in idx.read().collect()
    )


DOCS_V1 = [("d1", "alpha beta gamma delta"), ("d2", "one two three"), ("d3", "keep me")]
DOCS_V2 = {"d1": "alpha beta", "d4": "brand new document text"}  # d2 deleted


def test_replace_by_record_and_cdc_delete(spark, workdir):
    idx = _mk_index(spark, workdir)
    idx.apply_batch(_chunks_of(spark, DOCS_V1), _ids(spark, ["d1", "d2", "d3"]), "b1")
    # batch 2: d1 shrinks (fewer chunks), d2 deleted, d4 inserted
    live = [(k, v) for k, v in DOCS_V2.items()]
    idx.apply_batch(
        _chunks_of(spark, live), _ids(spark, ["d1", "d2", "d4"]), "b2"
    )
    expect = _chunks_of(spark, [("d1", DOCS_V2["d1"]), ("d3", "keep me"), ("d4", DOCS_V2["d4"])])
    assert _state(idx) == sorted(
        (r[META_RECORD_ID], r.chunk_idx, r.page_content) for r in expect.collect()
    )


def test_idempotent_batch(spark, workdir):
    idx = _mk_index(spark, workdir)
    assert idx.apply_batch(_chunks_of(spark, DOCS_V1), _ids(spark, ["d1", "d2", "d3"]), "b1")
    v = idx.table.current_version()
    assert idx.apply_batch(_chunks_of(spark, DOCS_V1), _ids(spark, ["d1", "d2", "d3"]), "b1") is None
    assert idx.table.current_version() == v


def test_bucket_scoped_rewrite(spark, workdir):
    """A single-record batch leaves every other bucket's files untouched."""
    idx = _mk_index(spark, workdir)
    idx.apply_batch(_chunks_of(spark, DOCS_V1), _ids(spark, ["d1", "d2", "d3"]), "b1")
    before = {f.path: f.bucket for f in idx.table.snapshot().files}
    idx.apply_batch(_chunks_of(spark, [("d1", "rewritten")]), _ids(spark, ["d1"]), "b2")
    after = {f.path: f.bucket for f in idx.table.snapshot().files}
    d1_bucket = idx.table.scan().filter(F.col(META_RECORD_ID) == "d1").select(
        idx.table.bucket_expr(META_RECORD_ID)
    ).first()[0]
    for path, bucket in before.items():
        if bucket != d1_bucket:
            assert path in after, "untouched bucket file was rewritten"
    assert any(b == d1_bucket and p not in before for p, b in after.items())


def test_batching_invariance_golden(spark, workdir):
    """Incremental maintenance == chunking the final doc table in one shot,
    regardless of how the changelog was batched."""
    v1 = DOCS_V1
    b2_live = [("d1", DOCS_V2["d1"]), ("d4", DOCS_V2["d4"])]
    b3_live = [("d4", "edited again"), ("d5", "late arrival")]
    final_docs = [
        ("d1", DOCS_V2["d1"]),
        ("d3", "keep me"),
        ("d4", "edited again"),
        ("d5", "late arrival"),
    ]

    one = _mk_index(spark, workdir, "one")
    one.apply_batch(
        _chunks_of(spark, final_docs), _ids(spark, [d for d, _ in final_docs]), "all"
    )

    inc = _mk_index(spark, workdir, "inc")
    inc.apply_batch(_chunks_of(spark, v1), _ids(spark, ["d1", "d2", "d3"]), "b1")
    inc.apply_batch(_chunks_of(spark, b2_live), _ids(spark, ["d1", "d2", "d4"]), "b2")
    inc.apply_batch(_chunks_of(spark, b3_live), _ids(spark, ["d4", "d5"]), "b3")

    assert _state(inc) == _state(one)
