"""Multimodal columns: opaque binary payloads + typed metadata + UDF plumbing.

Images/audio/video travel as `binary` columns with a metadata struct
(modality, codec, width/height/duration) — the Spark-side plumbing
(schemas, Arrow batch shapes, partitioning) is real and tested; the codec
work itself is STUBBED (this container ships no image/audio libraries):
`decode_image` raises NotImplementedError for real codecs and supports the
deterministic `fake/raw` codec (header-described raw uint8 planes) that the
tests and synthetic data use. On a real cluster the stub body is replaced
by pillow/ffmpeg calls — the Spark plumbing does not change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKE"


def encode_fake_image(arr: np.ndarray) -> bytes:
    """Deterministic fake codec: b'FAKE' + u16 h + u16 w + u8 channels +
    raw uint8 payload. Stands in for PNG/JPEG in tests."""
    h, w, c = arr.shape
    return FAKE_MAGIC + struct.pack("<HHB", h, w, c) + arr.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a binary image payload → (h, w, c) uint8 array.

    Real codecs are stubbed: PNG/JPEG need an image library not present in
    this container."""
    if payload[:4] == FAKE_MAGIC:
        h, w, c = struct.unpack("<HHB", payload[4:9])
        return np.frombuffer(payload[9:9 + h * w * c], dtype=np.uint8).reshape(h, w, c)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "PNG/JPEG decode requires an image library (pillow) — not in this "
            "container; the Spark plumbing is codec-agnostic")
    raise ValueError("unknown image codec")


def image_features(frames: DataFrame, payload_col: str = "image") -> DataFrame:
    """Decode + per-channel stats as a vectorized mapInPandas operator —
    the batch shape a real feature extractor would use."""
    schema = ("id long, height int, width int, channels int, "
              "mean_r double, mean_g double, mean_b double")

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            rows = {k: [] for k in ("id", "height", "width", "channels",
                                    "mean_r", "mean_g", "mean_b")}
            for i, payload in zip(pdf["id"], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                rows["id"].append(int(i))
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["channels"].append(arr.shape[2])
                means = arr.mean(axis=(0, 1))
                for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[name].append(float(means[ch]) if ch < arr.shape[2] else float("nan"))
            yield pd.DataFrame(rows)

    return frames.mapInPandas(_feat, schema)


def resize_images(frames: DataFrame, out_h: int, out_w: int,
                  payload_col: str = "image") -> DataFrame:
    """Nearest-neighbor resize (pure NumPy — works for any decoded image),
    re-encoded with the fake codec. Demonstrates binary→binary transforms."""
    schema = "id long, image binary"

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, payloads = [], []
            for i, payload in zip(pdf["id"], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                ys = (np.arange(out_h) * arr.shape[0] // out_h)
                xs = (np.arange(out_w) * arr.shape[1] // out_w)
                ids.append(int(i))
                payloads.append(encode_fake_image(arr[np.ix_(ys, xs)]))
            yield pd.DataFrame({"id": ids, "image": payloads})

    return frames.mapInPandas(_resize, schema)


def sample_video_frames(videos: DataFrame, every_n: int = 10,
                        payload_col: str = "video") -> DataFrame:
    """Frame sampling over a fake video payload (concatenated fake-image
    frames): one output row per sampled frame — the UDTF-style expansion
    shape (1 row → m rows) a real ffmpeg sampler produces."""
    schema = "id long, frame_no int, image binary"

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, fnos, frames_out = [], [], []
            for i, payload in zip(pdf["id"], pdf[payload_col]):
                buf = bytes(payload)
                off, fno = 0, 0
                while off < len(buf):
                    h, w, c = struct.unpack("<HHB", buf[off + 4:off + 9])
                    size = 9 + h * w * c
                    if fno % every_n == 0:
                        ids.append(int(i))
                        fnos.append(fno)
                        frames_out.append(buf[off:off + size])
                    off += size
                    fno += 1
            yield pd.DataFrame({"id": ids, "frame_no": fnos, "image": frames_out})

    return videos.mapInPandas(_sample, schema)
