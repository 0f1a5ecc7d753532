"""Multimodal binary plumbing, ANN recall, vector sinks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from unmixing_spark.io.sinks import (footprint_to_wkt, pixels_to_kml,
                                     points_to_geojson, points_to_kml)
from unmixing_spark.text.multimodal import (decode_image, encode_fake_image,
                                            image_features, resize_images,
                                            sample_video_frames)


def _fake_images(spark, n=8, h=16, w=12, c=3):
    rng = np.random.default_rng(7)
    rows = [(i, bytearray(encode_fake_image(rng.integers(0, 255, (h, w, c)))))
            for i in range(n)]
    return spark.createDataFrame(rows, "id long, image binary")


def test_image_codec_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (10, 7, 3)).astype(np.uint8)
    assert (decode_image(encode_fake_image(arr)) == arr).all()


def test_real_codecs_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_image(b"GARBAGE!")


def test_image_features_distributed(spark):
    df = _fake_images(spark)
    out = image_features(df).orderBy("id").toPandas()
    assert len(out) == 8
    assert (out.height == 16).all() and (out.width == 12).all()
    assert out.mean_r.between(80, 175).all()  # uniform(0,255) means


def test_resize_distributed(spark):
    df = _fake_images(spark)
    out = resize_images(df, 8, 6).orderBy("id").toPandas()
    arr = decode_image(bytes(out.image[0]))
    assert arr.shape == (8, 6, 3)


def test_video_frame_sampling(spark):
    rng = np.random.default_rng(5)
    frames = [encode_fake_image(rng.integers(0, 255, (4, 4, 1)))
              for _ in range(25)]
    video = b"".join(frames)
    df = spark.createDataFrame([(1, bytearray(video))], "id long, video binary")
    out = sample_video_frames(df, every_n=10).orderBy("frame_no").toPandas()
    assert out.frame_no.tolist() == [0, 10, 20]
    assert (decode_image(bytes(out.image[0])) ==
            decode_image(frames[0])).all()


def test_ann_lsh_recall(spark):
    """LSH top-k must recall a healthy fraction of the exact top-k."""
    from unmixing_spark.text.similarity import (ann_bruteforce_topk,
                                                ann_lsh_topk)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 8)
    exact = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    approx = ann_lsh_topk(emb, queries, dim=64, k=5, n_planes=4, n_tables=16).toPandas()
    exact_sets = exact.groupby("query_id").hit_id.apply(set)
    approx_sets = approx.groupby("query_id").hit_id.apply(set)
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 5
               for q in exact_sets.index]
    assert np.mean(recalls) >= 0.8, f"mean recall {np.mean(recalls)}"


def test_sinks_wellformed():
    kml = points_to_kml([("em1", -74.0, 40.7), ("em2", 2.35, 48.86)])
    assert kml.startswith('<?xml') and kml.count("<Placemark>") == 2
    kml2 = pixels_to_kml([("px", -74.0, -73.95, 40.7, 40.75)])
    assert "<Polygon>" in kml2 and "footprint" in kml2
    import json
    gj = json.loads(points_to_geojson([(1.0, 2.0), (3.0, 4.0)]))
    assert gj["type"] == "GeometryCollection" and len(gj["geometries"]) == 2
    wkt = footprint_to_wkt(0.0, 1.0, 0.0, 1.0)
    assert wkt.startswith("POLYGON ((") and wkt.count(",") == 4
