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


def test_jpeg_truncated_unknown_rejected():
    # JPEG is a real codec since r3 (text/jpeg.py; tests/test_jpeg.py) —
    # a truncated stream is a ValueError, unknown magic still rejected
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError):
        decode_image(b"GARBAGE!")


def test_png_codec_roundtrip_real_bytes():
    """Real PNG codec (stdlib zlib + RFC 2083 filters): encode→decode
    round-trip for gray/GA/RGB/RGBA through decode_image's magic sniff."""
    from unmixing_spark.text.multimodal import encode_png
    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 255, (9, 5, c)).astype(np.uint8)
        png = encode_png(arr)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert (decode_image(png) == arr).all(), c


def test_png_all_filter_types():
    """Decode a PNG whose scanlines use filters 1-4 (Sub/Up/Average/
    Paeth), hand-assembled from the spec — NOT produced by our encoder —
    so the filter reconstruction is exercised against independent bytes."""
    import struct
    import zlib

    from unmixing_spark.text.multimodal import decode_png

    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, (5, 4, 3)).astype(np.uint8)
    bpp = 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(12, dtype=int)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(int)
        filt = np.zeros(12, dtype=int)
        for i in range(12):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                    4: paeth(a, b, c)}[ftype]
            filt[i] = (line[i] - pred) % 256
        raw.append(ftype)
        raw.extend(int(v) for v in filt)
        prev = line

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_bmp_codec_roundtrip():
    from unmixing_spark.text.multimodal import decode_bmp, encode_bmp
    rng = np.random.default_rng(17)
    # width 5 forces row padding (15 bytes -> pad 1)
    arr = rng.integers(0, 255, (6, 5, 3)).astype(np.uint8)
    bmp = encode_bmp(arr)
    assert bmp[:2] == b"BM"
    assert (decode_image(bmp) == arr).all()
    assert (decode_bmp(bmp) == arr).all()


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


def test_kml_byte_equality_golden():
    """Full-string KML golden on fixed input — the reference pins its
    generated KML byte-equal to a fixture (tests.py:548-570)."""
    got = pixels_to_kml([("px7", -74.0, -73.95, 40.7, 40.75),
                         ("px9", 2.35, 2.4, 48.85, 48.9)])
    want = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n<Document>\n'
        '  <Placemark>\n    <name>px7</name>\n'
        '    <Point><coordinates>-73.975000,40.725000,0</coordinates></Point>\n'
        '  </Placemark>\n  <Placemark>\n    <name>px7-footprint</name>\n'
        '    <Polygon><outerBoundaryIs><LinearRing><coordinates>'
        '-74.000000,40.700000,0 -73.950000,40.700000,0 -73.950000,40.750000,0'
        ' -74.000000,40.750000,0 -74.000000,40.700000,0'
        '</coordinates></LinearRing></outerBoundaryIs></Polygon>\n'
        '  </Placemark>\n  <Placemark>\n    <name>px9</name>\n'
        '    <Point><coordinates>2.375000,48.875000,0</coordinates></Point>\n'
        '  </Placemark>\n  <Placemark>\n    <name>px9-footprint</name>\n'
        '    <Polygon><outerBoundaryIs><LinearRing><coordinates>'
        '2.350000,48.850000,0 2.400000,48.850000,0 2.400000,48.900000,0'
        ' 2.350000,48.900000,0 2.350000,48.850000,0'
        '</coordinates></LinearRing></outerBoundaryIs></Polygon>\n'
        '  </Placemark>\n</Document>\n</kml>\n')
    assert got == want


def test_point_shapefile_roundtrip(tmp_path):
    """S8: hand-rolled ESRI Shapefile sink (get_idx_as_shp, lsma.py:92-115)
    — valid header magic/shape type, exact coordinate round-trip, all four
    sidecar files present."""
    import struct

    from unmixing_spark.io.shapefile import (read_point_shapefile,
                                             write_point_shapefile)
    pts = [("em1", -74.0, 40.7), ("em2", 2.35, 48.86), ("em3", 139.7, 35.68)]
    base = tmp_path / "endmembers.shp"
    write_point_shapefile(str(base), pts)
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert base.with_suffix(ext).exists(), ext
    got = read_point_shapefile(str(base))
    assert got == [(x, y) for _, x, y in pts]
    shp = base.read_bytes()
    # declared file length (16-bit words, big-endian) matches actual bytes
    assert struct.unpack(">i", shp[24:28])[0] * 2 == len(shp)
    shx = base.with_suffix(".shx").read_bytes()
    assert len(shx) == 100 + 8 * len(pts)
    dbf = base.with_suffix(".dbf").read_bytes()
    assert dbf[0] == 3 and struct.unpack("<I", dbf[4:8])[0] == len(pts)
    assert b"em2" in dbf
    assert base.with_suffix(".prj").read_text().startswith('GEOGCS["GCS_WGS_1984"')


def test_image_features_over_real_png(spark):
    """The distributed feature extractor must work on REAL codec payloads
    (PNG through decode_image's magic sniff), not just the fake codec."""
    from unmixing_spark.text.multimodal import encode_png, image_features
    rng = np.random.default_rng(23)
    rows = [(i, bytearray(encode_png(rng.integers(0, 255, (12, 9, 3))
                                     .astype(np.uint8))))
            for i in range(6)]
    df = spark.createDataFrame(rows, "id long, image binary")
    out = image_features(df).orderBy("id").toPandas()
    assert len(out) == 6
    assert (out.height == 12).all() and (out.width == 9).all()
    assert (out.channels == 3).all()


def test_ann_ivf_recall_on_clustered_data(spark):
    """IVF mechanics: on data with real cluster structure (the regime IVF
    is built for), probing 4/16 inverted lists must recall nearly all of
    the exact top-k. Planted clusters, deterministic."""
    from unmixing_spark.text.similarity import (ann_bruteforce_topk,
                                                ann_ivf_topk)
    rng = np.random.default_rng(31)
    centers = rng.standard_normal((8, 64)) * 5.0
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + rng.standard_normal(64)
        rows.append((i, [float(x) for x in v], c))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int").cache()
    queries = emb.filter(F.col("vec_id") < 8)
    exact = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    approx = ann_ivf_topk(emb, queries, dim=64, k=5,
                          n_centroids=16, n_probe=4).toPandas()
    exact_sets = exact.groupby("query_id").hit_id.apply(set)
    approx_sets = approx.groupby("query_id").hit_id.apply(set)
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 5
               for q in exact_sets.index]
    assert np.mean(recalls) >= 0.9, f"mean recall {np.mean(recalls)}"


def test_ann_ivf_tolerates_zero_norm_vectors(spark):
    """A zero-norm embedding must be dropped (cosine undefined), not kill
    KMeans.fit with a null-element feature vector."""
    from unmixing_spark.text.similarity import ann_ivf_topk
    rng = np.random.default_rng(37)
    rows = [(i, [float(x) for x in rng.standard_normal(64)], 0)
            for i in range(60)]
    rows.append((60, [0.0] * 64, 0))  # the hazard
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 2), dim=64, k=3,
                       n_centroids=4, n_probe=2).toPandas()
    assert len(out) > 0
    assert 60 not in set(out.hit_id)


def test_ann_ivfpq_refine_matches_ivf_ceiling(spark):
    """The residual-PQ ADC shortlist + exact refine tier must not lose
    recall relative to the IVF candidate ceiling it re-ranks within,
    and must clear an absolute floor on this corpus."""
    from unmixing_spark.text.similarity import (
        ann_bruteforce_topk, ann_ivf_topk, ann_ivfpq_topk)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 8)
    exact = ann_bruteforce_topk(emb, queries, k=5).toPandas()
    ivf = ann_ivf_topk(emb, queries, dim=64, k=5).toPandas()
    pq = ann_ivfpq_topk(emb, queries, dim=64, k=5).toPandas()
    e = exact.groupby("query_id").hit_id.apply(set)

    def recall(df):
        s_ = df.groupby("query_id").hit_id.apply(set)
        return np.mean([len(e[q] & s_.get(q, set())) / 5 for q in e.index])

    r_ivf, r_pq = recall(ivf), recall(pq)
    assert r_pq >= 0.55, f"ivfpq recall {r_pq}"
    assert r_pq >= r_ivf - 0.1, f"refine lost recall: {r_pq} vs ivf {r_ivf}"
    # exact-cosine refine output: cos must be sorted desc within query
    for _, g in pq.groupby("query_id"):
        v = g.sort_values("rn")["cos"].to_numpy()
        assert (np.diff(v) <= 1e-12).all()
