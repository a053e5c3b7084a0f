"""Embedder plug-point for the vector sink: chunk -> embed -> index.

Re-expresses the reference's vector-DB destination embedder layer
(`airbyte-cdk/python/airbyte_cdk/destinations/vector_db_based/embedder.py`
— the `Embedder` interface with `check()` / `embed_documents()` /
`embedding_dimensions`, its `FromFieldEmbedder` and `FakeEmbedder`
implementations — and `writer.py`, which wires chunker -> embedder ->
indexer per batch).

Spark-first re-expression: an embedder is a DataFrame -> DataFrame
transform that appends an ``array<float>`` column.

- :class:`DeterministicEmbedder` (FakeEmbedder parity) derives a
  unit-normalized vector from md5 of the text ENTIRELY in Catalyst
  expressions — zero Python on the data path, deterministic across runs
  and processes, so CDC re-syncs are bit-identical.
- :class:`FromFieldEmbedder` projects an existing vector column
  (records already carry embeddings), validating width JVM-side.
- :class:`CallableEmbedder` is the real-model plug-point: a user
  callable ``fn(list[str]) -> sequence of vectors`` executed inside
  ``mapInPandas`` (Arrow-batched; ``batch_size`` texts per model call;
  parallel across partitions). The model/client never touches the driver.
- :class:`RemoteEmbedder` is the honestly-stubbed API variant (same
  pattern as functions/multimodal.py's codec stub): all the Spark-side
  plumbing is real, the network call raises ``NotImplementedError`` in
  this sandbox — inject a :class:`CallableEmbedder` with a live client
  to use it.

:class:`VectorSink` composes chunk_documents -> embedder -> ChunkIndex
exactly like the reference's ``writer.py`` batch loop: records carrying a
CDC-delete marker contribute ids but no chunks, so the replace-by-record
upsert drops their chunks from the index; idempotence rides on the chunk
index's batch-id gate.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from airbyte_spark.operators.vector_sink import (
    META_RECORD_ID,
    META_STREAM,
    ChunkIndex,
    chunk_documents,
)


class Embedder:
    """Appends ``out_col: array<float>`` (unit vectors of ``dimensions``)."""

    dimensions: int

    def check(self) -> str | None:
        """None when usable, else a human-readable failure (embedder.py
        check() contract: embed one probe document)."""
        raise NotImplementedError

    def embed(
        self, df: DataFrame, text_col: str = "page_content", out_col: str = "embedding"
    ) -> DataFrame:
        raise NotImplementedError


def deterministic_lanes(col, dimensions: int) -> list:
    """The integer lanes of :class:`DeterministicEmbedder` BEFORE float
    normalization: 32-bit windows of chained ``md5(value:j)`` digests as
    exact int64 — SQL-portable (see :func:`embed_lanes_oracle_sql`), which
    is what makes the embedder value-hash gateable cross-engine."""
    lanes = []
    for j in range(math.ceil(dimensions / 4)):
        digest = F.md5(F.concat_ws(":", col.cast("string"), F.lit(j)))
        for k in range(4):
            if len(lanes) == dimensions:
                break
            lanes.append(F.conv(F.substring(digest, 8 * k + 1, 8), 16, 10).cast("long"))
    return lanes


def embed_lanes_oracle_sql(
    dimensions: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB rendering of :func:`deterministic_lanes` over a table."""
    lanes = []
    j = 0
    while len(lanes) < dimensions:
        for k in range(4):
            if len(lanes) == dimensions:
                break
            lanes.append(
                f"CAST(('0x' || substring(md5({text_col} || ':' || {j}), "
                f"{8 * k + 1}, 8)) AS BIGINT)"
            )
        j += 1
    return f"""
        SELECT {id_col}, [{", ".join(lanes)}] AS lanes
        FROM {table}
        WHERE {text_col} IS NOT NULL
        ORDER BY {id_col}
    """


class DeterministicEmbedder(Embedder):
    """FakeEmbedder parity, but pure Catalyst: float lanes are 32-bit
    windows of chained ``md5(text:j)`` digests mapped to [-1, 1], then
    L2-normalized — whole-stage codegen, no Python, no RNG state."""

    def __init__(self, dimensions: int = 8):
        if dimensions <= 0:
            raise ValueError("dimensions must be positive")
        self.dimensions = dimensions

    def check(self) -> str | None:
        return None

    def embed(self, df, text_col="page_content", out_col="embedding"):
        lanes = [
            lane.cast("double") / F.lit(float(2**31)) - F.lit(1.0)
            for lane in deterministic_lanes(F.col(text_col), self.dimensions)
        ]
        vec = F.array(*lanes)
        norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        unit = F.transform(vec, lambda x: (x / norm).cast("float"))
        return df.withColumn(out_col, unit)


class FromFieldEmbedder(Embedder):
    """The record already carries its vector (embedder.py
    `FromFieldEmbedder`): project + validate width, fail rows that
    disagree with the declared dimensionality (null them + flag)."""

    def __init__(self, field: str, dimensions: int):
        self.field = field
        self.dimensions = dimensions

    def check(self) -> str | None:
        return None

    def embed(self, df, text_col="page_content", out_col="embedding"):
        src = F.col(self.field)
        ok = src.isNotNull() & (F.size(src) == self.dimensions)
        return df.withColumn(
            out_col,
            F.when(ok, src.cast(ArrayType(FloatType()))),
        ).withColumn(f"{out_col}_error", F.when(~ok, F.lit("bad_dimensions")))


class CallableEmbedder(Embedder):
    """The real-model plug-point: ``fn`` sees ``batch_size`` texts per call
    inside an Arrow-batched mapInPandas task (embedder.py batches document
    chunks the same way before each API call)."""

    def __init__(
        self,
        fn: Callable[[Sequence[str]], Iterable[Sequence[float]]],
        dimensions: int,
        batch_size: int = 128,
    ):
        if dimensions <= 0 or batch_size <= 0:
            raise ValueError("dimensions and batch_size must be positive")
        self.fn = fn
        self.dimensions = dimensions
        self.batch_size = batch_size

    def check(self) -> str | None:
        try:
            probe = list(self.fn(["connection probe"]))
        except Exception as e:  # noqa: BLE001
            return f"embedder probe failed: {e}"
        if len(probe) != 1 or len(list(probe[0])) != self.dimensions:
            return (
                f"embedder returned shape ({len(probe)}, "
                f"{len(list(probe[0])) if probe else 0}), "
                f"expected (1, {self.dimensions})"
            )
        return None

    def embed(self, df, text_col="page_content", out_col="embedding"):
        fn, batch_size, dims = self.fn, self.batch_size, self.dimensions
        out_schema = StructType(
            list(df.schema.fields)
            + [StructField(out_col, ArrayType(FloatType()), True)]
        )

        def run(batches):
            import numpy as np

            for pdf in batches:
                for i in range(0, len(pdf), batch_size):
                    sub = pdf.iloc[i : i + batch_size].copy()
                    vecs = list(fn(sub[text_col].astype(str).tolist()))
                    if len(vecs) != len(sub):
                        raise ValueError(
                            f"embedder returned {len(vecs)} vectors "
                            f"for {len(sub)} texts"
                        )
                    sub[out_col] = [
                        np.asarray(v, dtype=np.float32).tolist() for v in vecs
                    ]
                    yield sub

        return df.mapInPandas(run, schema=out_schema)


class RemoteEmbedder(CallableEmbedder):
    """HTTP-API embedder shell (embedder.py's OpenAI/Cohere shape): the
    mapInPandas plumbing, batching, and shape checks are the real code
    path; the network call itself is STUBBED — no embedding service
    exists in this sandbox. Inject :class:`CallableEmbedder` with a live
    client to run for real."""

    def __init__(self, endpoint: str, model: str, dimensions: int, batch_size: int = 128):
        self.endpoint, self.model = endpoint, model

        def _call(texts: Sequence[str]):
            raise NotImplementedError(
                "RemoteEmbedder is a stub: no embedding API is reachable in "
                "this sandbox. Wire CallableEmbedder(fn=<your client>, ...)."
            )

        super().__init__(_call, dimensions, batch_size)

    def check(self) -> str | None:
        return "RemoteEmbedder is a sandbox stub (no network)"


def chunk_schema_with_embedding(
    metadata_fields: Sequence[StructField] = (), out_col: str = "embedding"
) -> StructType:
    """The ChunkIndex table schema for embedded chunks (chunk_documents
    output + the embedding column)."""
    from pyspark.sql.types import IntegerType, StringType

    return StructType(
        [
            StructField("chunk_id", StringType(), False),
            StructField(META_RECORD_ID, StringType(), False),
            StructField(META_STREAM, StringType(), False),
            StructField("chunk_idx", IntegerType(), False),
            StructField("page_content", StringType(), True),
            StructField("n_chars", IntegerType(), True),
            *metadata_fields,
            StructField(out_col, ArrayType(FloatType()), True),
        ]
    )


class VectorSink:
    """chunker -> embedder -> indexer, writer.py's batch loop as one call.

    ``sync(docs, batch_id)`` treats ``docs`` as the deduplicated upsert
    batch of a doc-level stream: rows with ``_ab_cdc_deleted_at`` set are
    deletes (their chunks leave the index, document_processor.py's delete
    path); everything else is chunked, embedded, and replaces the
    record's prior chunks. Idempotent per batch_id.
    """

    def __init__(
        self,
        index: ChunkIndex,
        embedder: Embedder,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        chunk_size: int = 512,
        overlap: int = 0,
        separator: str = "\n\n",
        stream: str = "documents",
        metadata_cols: tuple[str, ...] = (),
        deleted_col: str = "_ab_cdc_deleted_at",
    ):
        self.index = index
        self.embedder = embedder
        self.id_col, self.text_col = id_col, text_col
        self.chunk_size, self.overlap, self.separator = chunk_size, overlap, separator
        self.stream, self.metadata_cols = stream, metadata_cols
        self.deleted_col = deleted_col

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        embedder: Embedder,
        *,
        metadata_fields: Sequence[StructField] = (),
        num_buckets: int = 16,
        **chunker_kwargs,
    ) -> "VectorSink":
        err = embedder.check()
        if err is not None:
            raise RuntimeError(f"embedder check failed: {err}")
        index = ChunkIndex.create(
            spark,
            root,
            chunk_schema_with_embedding(metadata_fields),
            num_buckets=num_buckets,
        )
        return VectorSink(index, embedder, **chunker_kwargs)

    def sync(self, docs: DataFrame, batch_id: str) -> int | None:
        """Apply one doc-level batch; returns the committed version or
        None when the batch was already applied / touched nothing."""
        ids = docs.select(
            F.col(self.id_col).cast("string").alias(META_RECORD_ID)
        ).distinct()
        alive = docs
        if self.deleted_col in docs.columns:
            alive = docs.filter(F.col(self.deleted_col).isNull())
        chunks = chunk_documents(
            alive,
            id_col=self.id_col,
            text_col=self.text_col,
            chunk_size=self.chunk_size,
            overlap=self.overlap,
            separator=self.separator,
            stream=self.stream,
            metadata_cols=self.metadata_cols,
        )
        embedded = self.embedder.embed(chunks)
        return self.index.apply_batch(embedded, ids, batch_id)

    def read(self) -> DataFrame:
        return self.index.read()
