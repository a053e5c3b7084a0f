"""Multimodal column plumbing: binary payloads + typed metadata through
mapInPandas (the codec itself is stubbed — functions/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from airbyte_spark.functions.multimodal import (
    extract_asset_features,
    sample_frames,
    synthesize_assets,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    return synthesize_assets(docs).cache()


def test_feature_extraction_schema_and_determinism(spark, assets):
    feats = extract_asset_features(assets, n_features=8).toPandas().set_index("asset_id")
    raw = assets.toPandas().set_index("asset_id")
    assert len(feats) == len(raw)
    for aid, row in raw.iterrows():
        payload = bytes(row["payload"])
        got = feats.loc[aid]
        assert got["byte_len"] == len(payload)
        assert got["sha256"] == hashlib.sha256(payload).hexdigest()
        assert got["n_frames"] == max(1, (len(payload) + 4095) // 4096)
        assert len(got["features"]) == 8
        assert got["modality"] in ("image", "audio", "video")
    # determinism: a second run is bit-identical
    feats2 = extract_asset_features(assets, n_features=8).toPandas().set_index("asset_id")
    assert (feats["sha256"] == feats2["sha256"]).all()
    assert feats["mean_val"].equals(feats2["mean_val"])


def test_real_decode_is_stubbed(spark, assets):
    """fake_decode=False must fail loudly where the codec would plug in."""
    with pytest.raises(Exception) as e:
        extract_asset_features(assets.limit(1), fake_decode=False).collect()
    assert "NotImplementedError" in str(e.value)


def test_sample_frames(spark, assets):
    frames = sample_frames(assets, stride_bytes=64, max_frames=3).toPandas()
    per_asset = frames.groupby("asset_id")
    raw = assets.toPandas().set_index("asset_id")
    for aid, g in per_asset:
        blen = len(bytes(raw.loc[aid]["payload"]))
        expect = min(3, max(1, -(-blen // 64)))
        assert len(g) == expect
        assert sorted(g["frame_idx"]) == list(range(expect))
        assert (g["frame_offset"] == g["frame_idx"] * 64).all()
