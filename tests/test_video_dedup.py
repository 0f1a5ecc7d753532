"""Video near-dup dedup: frame-sampled dHash + per-bit-majority signature.

The signature pin recomputes the majority vote with independent python
loops over locally decoded frames (exercising the SQL bit-vote incl. the
bit-63 sign term); the envelope test pins the measured robustness
(frame-drop + noise re-encode within the pairing threshold, unrelated
videos far outside); the join test reuses the generic banded pairing.
"""

from __future__ import annotations

import numpy as np

from unmixing_spark.queries.media_q import render_page_video
from unmixing_spark.text.multimodal import (decode_image, dhash64,
                                            dhash_pairs, video_signatures)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _split_frames(buf: bytes) -> list[bytes]:
    import struct
    out, off = [], 0
    while off < len(buf):
        h, w, c = struct.unpack("<HHB", buf[off + 4:off + 9])
        size = 9 + h * w * c
        out.append(buf[off:off + size])
        off += size
    return out


def _naive_signature(buf: bytes, every_n: int) -> int:
    """Independent majority vote: python loops, unsigned bit counting."""
    hashes = [dhash64(decode_image(f))
              for i, f in enumerate(_split_frames(buf)) if i % every_n == 0]
    c = len(hashes)
    v = 0
    for k in range(63, -1, -1):
        ones = sum((h >> k) & 1 for h in hashes)
        v = (v << 1) | int(2 * ones > c)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_video_signature_matches_naive_majority(spark):
    rows = [(i, bytearray(render_page_video(700 + i, perturb=bool(i % 2))))
            for i in range(6)]
    df = spark.createDataFrame(rows, "id long, video binary").repartition(3)
    got = {r.id: (r.vhash, r.n_frames)
           for r in video_signatures(df, every_n=2).collect()}
    saw_negative = False
    for i, payload in rows:
        want = _naive_signature(bytes(payload), every_n=2)
        assert got[i][0] == want, i
        n_frames = len([1 for j, _ in
                        enumerate(_split_frames(bytes(payload)))
                        if j % 2 == 0])
        assert got[i][1] == n_frames
        saw_negative = saw_negative or want < 0
    # the bit-63 sign-term path must actually be exercised
    assert saw_negative


def test_video_signature_robustness_envelope(spark):
    rows = []
    for i in range(8):
        rows.append((2 * i, bytearray(render_page_video(500 + i))))
        rows.append((2 * i + 1,
                     bytearray(render_page_video(500 + i, perturb=True))))
    df = spark.createDataFrame(rows, "id long, video binary")
    sigs = {r.id: r.vhash for r in video_signatures(df, every_n=2).collect()}
    for i in range(8):
        d = _ham(sigs[2 * i], sigs[2 * i + 1])
        assert d <= 7, (i, d)
    for i in range(8):
        for j in range(i + 1, 8):
            assert _ham(sigs[2 * i], sigs[2 * j]) > 7, (i, j)


def test_registered_video_query_recovers_all_planted_pairs(spark):
    from unmixing_spark.queries import registry
    from unmixing_spark.queries.media_q import N_DOCS
    spec = registry()["q_video_sig_pairs"]
    assert spec.oracle is None  # declared rows-only
    rows = spec.spark_fn(spark, "/root/testdata/sf0.001").collect()
    planted = [(r.id_a, r.id_b) for r in rows if r.planted == 1]
    assert len(planted) == N_DOCS
    assert all(b == a + 1 and a % 2 == 0 for a, b in planted)
    assert all(r.hamming <= 7 for r in rows)


def test_video_pairs_equal_brute_force(spark):
    rows = []
    for i in range(5):
        rows.append((2 * i, bytearray(render_page_video(900 + i))))
        rows.append((2 * i + 1,
                     bytearray(render_page_video(900 + i, perturb=True))))
    df = spark.createDataFrame(rows, "id long, video binary")
    sigs = video_signatures(df, every_n=2)
    got = {(r.id_a, r.id_b): r.hamming
           for r in dhash_pairs(sigs.select("id", "vhash"), hash_col="vhash",
                                max_hamming=7).collect()}
    local = {i: _naive_signature(bytes(p), 2) for i, p in rows}
    want = {(a, b): _ham(local[a], local[b])
            for a in local for b in local
            if a < b and _ham(local[a], local[b]) <= 7}
    assert got == want
