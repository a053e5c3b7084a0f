"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns with typed metadata, the
way a 100 TB training-data lake stores them. The Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signatures, partition behavior — is
real and tested; the actual codec step is STUBBED (PIL/libav are not in
this container): ``fake_decode=True`` substitutes a deterministic
bytes-derived fake so pipelines are end-to-end testable, and
``fake_decode=False`` raises NotImplementedError exactly where a codec
library would plug in.

Scale notes: decode runs inside mapInPandas (Arrow batches, no shuffle);
binary payloads never pass through a groupBy/join — feature extraction
projects them away before any wide stage. ``arrow_max_bytes_hint`` exists
because media blobs hit Arrow's per-batch limits long before row counts do:
set spark.sql.execution.arrow.maxRecordsPerBatch so
rows_per_batch * avg_blob_size stays well under 2 GB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_COLUMNS = ("asset_id", "modality", "payload", "meta_width", "meta_height", "meta_sample_rate")

FEATURE_SCHEMA = (
    "asset_id string, modality string, byte_len bigint, sha256 string, "
    "width int, height int, n_frames int, mean_val double, features array<float>"
)


def synthesize_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic multimodal asset table from the documents table:
    payload = utf-8 bytes of the text (stand-in for real media bytes),
    modality cycled per id, metadata derived arithmetically."""
    return docs.select(
        F.concat(F.lit("asset-"), F.col(id_col).cast("string")).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        (F.lit(64) + (F.col(id_col) % 7) * 32).cast("int").alias("meta_width"),
        (F.lit(64) + (F.col(id_col) % 5) * 32).cast("int").alias("meta_height"),
        F.when(F.col(id_col) % 3 == 1, F.lit(16000)).cast("int").alias("meta_sample_rate"),
    )


def _fake_decode(payload: bytes, modality: str, n_features: int) -> tuple[int, float, np.ndarray]:
    """Deterministic stand-in for a codec: 'frames' = 4 KiB payload chunks,
    'pixels/samples' = the raw bytes, features = per-stripe byte means."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    n_frames = max(1, (buf.size + 4095) // 4096)
    mean_val = float(buf.mean()) if buf.size else 0.0
    stripes = np.array_split(buf, n_features) if buf.size >= n_features else [buf] * n_features
    feats = np.array([float(s.mean()) if s.size else 0.0 for s in stripes], dtype=np.float32)
    return n_frames, mean_val, feats


def extract_asset_features(
    assets: DataFrame,
    n_features: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Decode + feature-extract each asset via mapInPandas (Arrow batches).

    Output: FEATURE_SCHEMA. The payload column is consumed here and NOT
    emitted — downstream stages shuffle only compact features.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "byte_len": np.zeros(n, dtype=np.int64),
                "sha256": [""] * n,
                "width": pdf.get("meta_width", pd.Series([0] * n)).fillna(0).astype(np.int32),
                "height": pdf.get("meta_height", pd.Series([0] * n)).fillna(0).astype(np.int32),
                "n_frames": np.zeros(n, dtype=np.int32),
                "mean_val": np.zeros(n, dtype=np.float64),
                "features": [None] * n,
            }
            for i, (payload, modality) in enumerate(zip(pdf["payload"], pdf["modality"])):
                raw = bytes(payload) if payload is not None else b""
                out["byte_len"][i] = len(raw)
                out["sha256"][i] = hashlib.sha256(raw).hexdigest()
                if not fake_decode:
                    raise NotImplementedError(
                        "real media decode needs PIL/libav (absent in this "
                        "container); run with fake_decode=True"
                    )
                n_frames, mean_val, feats = _fake_decode(raw, modality, n_features)
                out["n_frames"][i] = n_frames
                out["mean_val"][i] = mean_val
                out["features"][i] = feats
            yield pd.DataFrame(out)

    return assets.mapInPandas(fn, FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, stride_bytes: int = 4096, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: explode each asset into up to ``max_frames``
    (frame_idx, frame_offset) rows — pure built-in functions, the binary
    column is cut into offsets without any Python. A real decoder would
    replace offset slicing with codec frame extraction."""
    n_frames = F.greatest(
        F.lit(1), F.ceil(F.octet_length("payload") / F.lit(stride_bytes))
    ).cast("int")
    idx = F.sequence(F.lit(0), F.least(n_frames, F.lit(max_frames)) - 1)
    return assets.select(
        "asset_id",
        "modality",
        F.octet_length("payload").alias("byte_len"),
        F.explode(idx).alias("frame_idx"),
    ).withColumn("frame_offset", (F.col("frame_idx") * stride_bytes).cast("bigint"))
