"""Multimodal plumbing: deterministic stub decode, Arrow batch shapes,
schema round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from audioflux_spark.sources.multimodal import (
    audio_stats,
    gen_assets,
    image_features,
    resize_images,
    sample_frames,
    _decode_image,
)


@pytest.fixture(scope="module")
def assets(spark):
    df = gen_assets(spark, 60).repartition(4).cache()
    df.count()
    return df


def test_decode_deterministic():
    a = _decode_image(b"payload-bytes", 16, 8, 3)
    b = _decode_image(b"payload-bytes", 16, 8, 3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 16, 3)
    c = _decode_image(b"other-bytes", 16, 8, 3)
    assert (a != c).any()


def test_image_features_shape(spark, assets):
    feats = image_features(assets).toPandas()
    n_images = assets.filter("kind = 'image'").count()
    assert len(feats) == n_images
    assert all(len(f) == 8 for f in feats["features"])  # 3 mean + 3 std + h + w


def test_resize(spark, assets):
    out = resize_images(assets, 8, 8).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in out["payload"])


def test_sample_frames(spark, assets):
    res = sample_frames(assets, every_n=4).toPandas()
    vids = assets.filter("kind='video'").select("asset_id", "meta.n_frames").toPandas()
    want = int(sum((nf + 3) // 4 for nf in vids["n_frames"]))
    assert len(res) == want
    assert (res["frame_idx"] % 4 == 0).all()


def test_audio_stats(spark, assets):
    res = audio_stats(assets).toPandas()
    assert len(res) == assets.filter("kind='audio'").count()
    assert ((res["rms"] > 0) & (res["zcr"] > 0) & (res["zcr"] < 1)).all()


def test_determinism_across_partitionings(spark):
    a1 = image_features(gen_assets(spark, 40).repartition(2)).toPandas().sort_values("asset_id")
    a2 = image_features(gen_assets(spark, 40).repartition(7)).toPandas().sort_values("asset_id")
    for x, y in zip(a1["features"], a2["features"]):
        np.testing.assert_array_equal(x, y)
