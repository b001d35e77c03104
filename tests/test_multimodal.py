"""Multimodal plumbing: schema, determinism, stub gating (SURVEY.md extras)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsclust_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    decode_image,
    extract_features,
    resize_media,
    sample_frames,
)


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00", 4, 4, fake_decode=False)
    px = decode_image(b"\x00", 4, 4, fake_decode=True)
    assert px.shape == (4, 4) and px.dtype == np.uint8
    # deterministic: same payload -> same pixels
    np.testing.assert_array_equal(px, decode_image(b"\x00", 4, 4, fake_decode=True))


@pytest.mark.spark
def test_feature_extraction_shape_and_determinism(spark):
    docs = spark.range(20).select(F.col("id").cast("string").alias("doc_id"))
    media = attach_fake_media(docs)
    feats1 = {r.doc_id: r.feature for r in extract_features(media).collect()}
    feats2 = {r.doc_id: r.feature for r in extract_features(media).collect()}
    assert len(feats1) == 20
    for k, v in feats1.items():
        assert len(v) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in v)
        assert v == feats2[k]


@pytest.mark.spark
def test_resize_dimensions(spark):
    docs = spark.range(5).select(F.col("id").cast("string").alias("doc_id"))
    media = attach_fake_media(docs, width=32, height=32)
    out = resize_media(media, out_width=8, out_height=4).collect()
    for r in out:
        assert r.width == 8 and r.height == 4
        assert len(r.payload) == 8 * 4


@pytest.mark.spark
def test_frame_sampling_indices(spark):
    docs = spark.range(1).select(F.col("id").cast("string").alias("doc_id"))
    media = attach_fake_media(docs).withColumn(
        "media",
        F.col("media").withField("n_frames", F.lit(10)),
    )
    idx = sorted(r.frame_idx for r in sample_frames(media, every_n=3).collect())
    assert idx == [0, 3, 6, 9]
