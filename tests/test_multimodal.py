"""Multimodal plumbing: schema, determinism, ANN-compat, stubbed decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahout_spark.operators.ann import brute_force_topk
from mahout_spark.sources.multimodal import (extract_features,
                                             fake_media_table, sample_frames)


def test_feature_extraction_deterministic(spark):
    media = fake_media_table(spark, 40, seed=5)
    f1 = extract_features(media, dim=32).toPandas().sort_values("media_id")
    f2 = extract_features(media.repartition(7), dim=32).toPandas() \
        .sort_values("media_id")
    assert list(f1.columns) == ["media_id", "kind", "meta", "feature"]
    for a, b in zip(f1["feature"], f2["feature"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    norms = [np.linalg.norm(np.asarray(v)) for v in f1["feature"]]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)


def test_features_feed_ann(spark):
    media = fake_media_table(spark, 60, seed=5)
    feats = extract_features(media, dim=32).select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"))
    q = (feats.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    top = brute_force_topk(feats, q, k=3).toPandas()
    # self-similarity 1.0 at rank 1 for every query
    self_rows = top[top["query_id"] == top["neighbor_id"]]
    assert len(self_rows) == 3
    assert np.allclose(self_rows["score"], 1.0, atol=1e-5)


def test_frame_sampling_shape(spark):
    media = fake_media_table(spark, 10, seed=6, kind="video")
    frames = sample_frames(media, every_n=4).toPandas()
    assert list(frames.columns) == ["media_id", "frame_idx", "frame"]
    assert (frames["frame_idx"] % 4 == 0).all()
    assert frames["media_id"].nunique() == 10


def test_real_decoder_is_explicit_stub(spark):
    media = fake_media_table(spark, 3, seed=7)
    with pytest.raises(Exception) as exc:
        extract_features(media, dim=8, decoder="real").collect()
    assert "NotImplementedError" in str(exc.value) or \
        isinstance(exc.value, NotImplementedError) or \
        "not installed" in str(exc.value)
