"""Audio binary-column operators (text/audio.py): real WAV codec
roundtrip, distributed feature extraction vs direct numpy, resampling."""

from __future__ import annotations

import struct
import wave

import numpy as np
import pytest

from unmixing_spark.text.audio import (
    audio_features, decode_wav, encode_wav, resample_audio)


def _tone(n: int, rate: int, hz: float, amp: int = 12000,
          channels: int = 1) -> np.ndarray:
    t = np.arange(n) / rate
    x = np.rint(amp * np.sin(2 * np.pi * hz * t)).astype(np.int16)
    return np.stack([x] * channels, axis=1) if channels > 1 else x


def test_wav_roundtrip_byte_and_sample_exact():
    arr = _tone(4410, 44100, 440.0, channels=2)
    payload = encode_wav(arr, 44100)
    back, rate = decode_wav(payload)
    assert rate == 44100
    np.testing.assert_array_equal(back, arr)
    # and a re-encode of the decode is byte-identical (canonical header)
    assert encode_wav(back, rate) == payload


def test_wav_interops_with_stdlib_wave(tmp_path):
    """Our encoder's bytes parse with the stdlib wave module, and a
    stdlib-written file parses with our decoder — independent
    implementations agree."""
    arr = _tone(800, 8000, 200.0)
    p = tmp_path / "t.wav"
    p.write_bytes(encode_wav(arr, 8000))
    with wave.open(str(p)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes()) == (1, 2, 8000, 800)
        np.testing.assert_array_equal(
            np.frombuffer(w.readframes(800), dtype="<i2"), arr)
    q = tmp_path / "s.wav"
    with wave.open(str(q), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(_tone(100, 16000, 1000.0, channels=2).tobytes())
    back, rate = decode_wav(q.read_bytes())
    assert rate == 16000 and back.shape == (100, 2)


def test_wav_skips_unknown_chunks_and_rejects_non_pcm16():
    arr = _tone(64, 8000, 100.0)
    payload = bytearray(encode_wav(arr, 8000))
    # splice a LIST chunk between fmt and data (word-aligned, odd size)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    insert_at = payload.index(b"data")
    payload[insert_at:insert_at] = extra
    payload[4:8] = struct.pack("<I", len(payload) - 8)
    back, rate = decode_wav(bytes(payload))
    np.testing.assert_array_equal(back[:, 0], arr)
    # float PCM (fmt=3) must raise, not mis-decode
    f = bytearray(encode_wav(arr, 8000))
    f[20:22] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(f))
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))


def test_audio_features_distributed(spark):
    rate = 8000
    clips = [
        (0, encode_wav(_tone(rate, rate, 440.0), rate)),          # 1 s tone
        (1, encode_wav(np.zeros(400, dtype=np.int16), rate)),     # silence
        (2, encode_wav(_tone(200, rate, 2000.0, channels=2), rate)),
    ]
    df = spark.createDataFrame(clips, "id long, audio binary").repartition(3)
    out = {r["id"]: r for r in audio_features(df).collect()}
    assert len(out) == 3
    for i, payload in clips:
        arr, r = decode_wav(payload)
        x = arr.astype(np.float64)
        assert out[i]["channels"] == arr.shape[1]
        assert out[i]["rate"] == r
        assert out[i]["n_samples"] == arr.shape[0]
        assert out[i]["duration_s"] == pytest.approx(arr.shape[0] / r)
        rms = float(np.sqrt(np.mean(x ** 2)))
        if rms > 0:
            assert out[i]["rms_dbfs"] == pytest.approx(
                20 * np.log10(rms / 32768.0))
        else:
            assert out[i]["rms_dbfs"] == float("-inf")
        assert out[i]["peak"] == int(np.max(np.abs(x)))
    # a 440 Hz tone at 8 kHz crosses zero ~2*440 times/sec
    assert out[0]["zcr"] == pytest.approx(880 / 8000, rel=0.05)
    assert out[1]["zcr"] == 0.0


def test_resample_audio_matches_numpy(spark):
    rate, factor = 16000, 4
    arr = _tone(1003, rate, 300.0, channels=2)  # non-multiple length
    df = spark.createDataFrame([(7, encode_wav(arr, rate))],
                               "id long, audio binary")
    out = resample_audio(df, factor).collect()
    assert len(out) == 1 and out[0]["id"] == 7
    back, new_rate = decode_wav(bytes(out[0]["audio"]))
    assert new_rate == rate // factor
    n = (arr.shape[0] // factor) * factor
    want = np.clip(np.rint(
        arr[:n].astype(np.float64).reshape(-1, factor, 2).mean(axis=1)),
        -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(back, want)
    # the boxcar prefilter attenuates a tone near the new Nyquist:
    # resampling a 1900 Hz tone from 16 kHz to 4 kHz keeps it (below
    # 2 kHz) but the averaging window shrinks its amplitude
    tone = _tone(4000, rate, 1900.0)
    out2 = resample_audio(
        spark.createDataFrame([(1, encode_wav(tone, rate))],
                              "id long, audio binary"), factor).collect()
    back2, _ = decode_wav(bytes(out2[0]["audio"]))
    assert np.max(np.abs(back2)) < 0.7 * np.max(np.abs(tone))
