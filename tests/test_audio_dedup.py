"""Audio near-dup dedup: spectral fingerprint kernel + banded hamming join.

The kernel pin reimplements the Haitsma-Kalker-style band/median
fingerprint with independent python loops; invariance tests pin the
measured robustness envelope (gain exact, decimate-by-2 re-encode within
the pairing threshold, unrelated clips far outside it); the join test
asserts the generic banded candidate join equals brute-force all-pairs
on audio fingerprints.
"""

from __future__ import annotations

import numpy as np
import pytest

from unmixing_spark.text.audio import (audio_fingerprint64,
                                       audio_fingerprints, decode_wav,
                                       encode_wav)
from unmixing_spark.text.multimodal import dhash_pairs


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _clip(seed: int, rate: int = 8000, dur: float = 1.0) -> np.ndarray:
    """Deterministic noisy sinusoid mix: 5 enveloped tones inside the
    analysis band over an enveloped broadband floor (so every band
    carries genuine energy — empty bands compare quantization noise)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * dur)) / rate
    x = rng.normal(0, 0.15, t.shape)
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
    for _ in range(5):
        f = rng.uniform(250, 1800)
        amp = rng.uniform(0.3, 1.0)
        ph = rng.uniform(0, 2 * np.pi)
        env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
        x = x + amp * np.sin(2 * np.pi * f * t + ph) * env
    x = x / np.max(np.abs(x))
    return np.rint(x * 20000).astype(np.int16)


def _decimate2(x: np.ndarray) -> np.ndarray:
    """Boxcar decimate-by-2, the resample_audio kernel."""
    n = (len(x) // 2) * 2
    win = x[:n].astype(np.float64).reshape(-1, 2).mean(axis=1)
    return np.clip(np.rint(win), -32768, 32767).astype(np.int16)


def test_fingerprint_matches_naive_brute_force():
    # short clips keep the O(m^2) naive DFT affordable; f_hi under the
    # short clip's Nyquist
    for seed in range(3):
        x = _clip(seed, rate=2000, dur=0.2)
        assert audio_fingerprint64(x, 2000, f_hi=900.0) == _naive_fp(
            x, 2000, f_hi=900.0)


def _naive_fp(x, rate, f_hi):
    """Independent brute-force fingerprint: python loops, math.cos Hann,
    naive O(m^2) DFT, no shared helpers."""
    got_edges = [200.0 * (f_hi / 200.0) ** (k / 8.0) for k in range(9)]
    import cmath
    import math
    a = np.asarray(x, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    n = len(a)
    E = [[0.0] * 8 for _ in range(8)]
    for t in range(8):
        seg = a[t * n // 8:(t + 1) * n // 8]
        m = len(seg)
        w = [seg[j] * (0.5 - 0.5 * math.cos(2 * math.pi * j / (m - 1)))
             for j in range(m)]
        for k in range(m // 2 + 1):
            f = k * rate / m
            X = sum(w[j] * cmath.exp(-2j * math.pi * k * j / m)
                    for j in range(m))
            for b in range(8):
                if got_edges[b] <= f < got_edges[b + 1]:
                    E[t][b] += abs(X) ** 2
    v = 0
    for b in range(8):
        col = sorted(E[t][b] for t in range(8))
        med = 0.5 * (col[3] + col[4])
        for t in range(8):
            v = (v << 1) | int(E[t][b] > med)
    return v - (1 << 64) if v >= (1 << 63) else v


def test_fingerprint_invariance_envelope():
    fps = []
    for seed in range(10):
        x = _clip(seed)
        f0 = audio_fingerprint64(x, 8000)
        # gain scaling: exactly invariant (comparisons survive positive
        # scaling; int16 quantization lands on genuine-energy bands)
        half = np.rint(x * 0.5).astype(np.int16)
        assert _ham(f0, audio_fingerprint64(half, 8000)) == 0
        # boxcar decimate-by-2 re-encode: inside the pairing threshold
        d = _ham(f0, audio_fingerprint64(_decimate2(x), 4000))
        assert d <= 7, d
        # stereo duplication decodes to the same mono mix
        stereo = np.stack([x, x], axis=1)
        assert audio_fingerprint64(stereo, 8000) == f0
        fps.append(f0)
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            assert _ham(fps[i], fps[j]) > 7, (i, j)


def test_fingerprint_wav_roundtrip_and_guards():
    x = _clip(42)
    arr, rate = decode_wav(encode_wav(x, 8000))
    assert audio_fingerprint64(arr, rate) == audio_fingerprint64(x, 8000)
    with pytest.raises(ValueError):
        audio_fingerprint64(np.zeros(5, np.int16), 8000)


def test_audio_pairs_banded_equals_brute_force(spark):
    rows, local = [], {}
    for i in range(5):
        x = _clip(300 + i)
        rows.append((2 * i, bytearray(encode_wav(x, 8000))))
        rows.append((2 * i + 1,
                     bytearray(encode_wav(_decimate2(
                         np.rint(x * 0.6).astype(np.int16)), 4000))))
    df = spark.createDataFrame(rows, "id long, audio binary").repartition(3)
    fps = audio_fingerprints(df)
    got = {(r.id_a, r.id_b): r.hamming
           for r in dhash_pairs(fps, hash_col="fp", max_hamming=7).collect()}
    for i, payload in rows:
        arr, rate = decode_wav(bytes(payload))
        local[i] = audio_fingerprint64(arr, rate)
    want = {(a, b): _ham(local[a], local[b])
            for a in local for b in local
            if a < b and _ham(local[a], local[b]) <= 7}
    assert got == want
    for i in range(5):
        assert (2 * i, 2 * i + 1) in got, f"missed planted audio pair {i}"


def test_registered_audio_query_recovers_all_planted_pairs(spark):
    from unmixing_spark.queries import registry
    spec = registry()["q_audio_fp_pairs"]
    assert spec.oracle is None  # declared rows-only
    rows = spec.spark_fn(spark, "/root/testdata/sf0.001").collect()
    planted = [(r.id_a, r.id_b) for r in rows if r.planted == 1]
    from unmixing_spark.queries.media_q import N_DOCS
    assert len(planted) == N_DOCS
    assert all(b == a + 1 and a % 2 == 0 for a, b in planted)
    assert all(r.hamming <= 7 for r in rows)
