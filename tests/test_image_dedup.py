"""Perceptual-hash image dedup: dHash kernel + banded hamming pair join.

The kernel pin reimplements dHash as independent naive loops; the join
pin asserts the banded candidate join equals brute-force all-pairs
(pigeonhole-exact for max_hamming < n_bands, as with q_simhash_pairs).
"""

from __future__ import annotations

import numpy as np
import pytest

from unmixing_spark.text.multimodal import (decode_bmp, decode_image,
                                            decode_png, dhash64, dhash_pairs,
                                            encode_bmp, encode_fake_image,
                                            encode_png, image_dhash)


def _naive_dhash(arr: np.ndarray) -> int:
    """Independent brute-force dHash: python loops, no shared helpers."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        else:
            a = a[..., 0]
    h, w = a.shape
    if h < 8:
        a = a[[r * h // 8 for r in range(8)], :]
        h = 8
    if w < 9:
        a = a[:, [c * w // 9 for c in range(9)]]
        w = 9
    m = np.zeros((8, 9))
    for r in range(8):
        for c in range(9):
            block = a[r * h // 8:(r + 1) * h // 8, c * w // 9:(c + 1) * w // 9]
            m[r, c] = block.mean()
    v = 0
    for r in range(8):
        for c in range(8):
            v = (v << 1) | int(m[r, c + 1] > m[r, c])
    return v - (1 << 64) if v >= (1 << 63) else v


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _smooth_image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic smooth RGB image (low-frequency sinusoid mix) whose
    coarse luma structure survives JPEG quantization."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    chans = []
    for _ in range(3):
        fy, fx = rng.uniform(0.5, 2.5, 2)
        py, px = rng.uniform(0, 2 * np.pi, 2)
        plane = (np.sin(2 * np.pi * fy * yy / h + py)
                 + np.cos(2 * np.pi * fx * xx / w + px))
        chans.append((plane - plane.min()) / (plane.max() - plane.min()))
    return (np.stack(chans, axis=-1) * 255).astype(np.uint8)


def test_dhash_matches_naive_brute_force():
    rng = np.random.default_rng(7)
    for shape in [(48, 64, 3), (16, 12, 3), (30, 40), (11, 9, 1),
                  (4, 5, 3), (8, 9, 4)]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        assert dhash64(arr) == _naive_dhash(arr), shape


def test_dhash_codec_robustness():
    from unmixing_spark.text.jpeg import decode_jpeg, encode_jpeg
    img = _smooth_image(3)
    # PNG/BMP roundtrips are lossless -> identical hash
    h_png = dhash64(decode_png(encode_png(img)))
    h_bmp = dhash64(decode_bmp(encode_bmp(img)))
    assert h_png == dhash64(img)
    assert h_bmp == dhash64(img)
    h_jpg = dhash64(decode_jpeg(encode_jpeg(img, quality=85)))
    assert _hamming(h_jpg, h_png) <= 6, _hamming(h_jpg, h_png)
    # unrelated smooth images land far apart
    other = dhash64(_smooth_image(11))
    assert _hamming(other, h_png) > 7


def test_dhash_pairs_equals_brute_force(spark):
    rows, arrays = [], {}
    n_base = 6
    for i in range(n_base):
        img = _smooth_image(100 + i)
        rows.append((2 * i, bytearray(encode_png(img))))
        # JPEG re-encode of the same image: a planted near-dup
        from unmixing_spark.text.jpeg import encode_jpeg
        rows.append((2 * i + 1, bytearray(encode_jpeg(img, quality=90))))
    df = spark.createDataFrame(rows, "id long, image binary")
    hashes = image_dhash(df)
    got = {(r.id_a, r.id_b): r.hamming
           for r in dhash_pairs(hashes, max_hamming=7).collect()}

    for i, payload in rows:
        arrays[i] = dhash64(decode_image(bytes(payload)))
    want = {}
    ids = sorted(arrays)
    for a in ids:
        for b in ids:
            if a < b and _hamming(arrays[a], arrays[b]) <= 7:
                want[(a, b)] = _hamming(arrays[a], arrays[b])
    assert got == want
    # every planted re-encode pair was found
    for i in range(n_base):
        assert (2 * i, 2 * i + 1) in got, f"missed near-dup pair {i}"


def test_dhash_pairs_parameter_guards(spark):
    df = spark.createDataFrame([(1, 0)], "id long, dhash long")
    with pytest.raises(ValueError):
        dhash_pairs(df, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError):
        dhash_pairs(df, n_bands=7)


def test_image_dhash_distributed_matches_local(spark):
    rng = np.random.default_rng(21)
    rows = [(i, bytearray(encode_fake_image(
        rng.integers(0, 256, (16, 12, 3)).astype(np.uint8))))
        for i in range(10)]
    df = spark.createDataFrame(rows, "id long, image binary").repartition(4)
    got = {r.id: r.dhash for r in image_dhash(df).collect()}
    for i, payload in rows:
        assert got[i] == dhash64(decode_image(bytes(payload)))


def test_registered_query_recovers_all_planted_pairs(spark):
    from unmixing_spark.queries import registry
    spec = registry()["q_image_dhash_pairs"]
    assert spec.oracle is None  # declared rows-only
    rows = spec.spark_fn(spark, "/root/testdata/sf0.001").collect()
    planted = [(r.id_a, r.id_b) for r in rows if r.planted == 1]
    from unmixing_spark.queries.media_q import N_DOCS
    assert len(planted) == N_DOCS
    assert all(b == a + 1 and a % 2 == 0 for a, b in planted)
    assert all(r.hamming <= 7 for r in rows)
