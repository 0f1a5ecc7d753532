"""Baseline JPEG decoder — ITU-T T.81 sequential DCT (SOF0), stdlib+numpy.

Re-implemented from the public spec (ITU-T Recommendation T.81, 1992:
Annex F sequential decoding, Annex A DCT/zigzag/quantization, Annex B
interchange format) — no image library. Retires the repo's last multimodal
stub: the reference's multimodal surface treats images as opaque payloads;
here the decode step is real for the three codecs a crawl actually sees
(PNG, BMP, JPEG baseline).

Supported: 8-bit baseline sequential, 1 component (grayscale) or 3
components (YCbCr → RGB, JFIF conversion), arbitrary h/v sampling factors
(4:4:4, 4:2:2, 4:2:0), restart intervals (DRI/RSTn). Not supported (raise
NotImplementedError): progressive (SOF2), arithmetic coding, 12-bit,
hierarchical. Chroma upsampling is nearest-neighbor (spec A.1.1 leaves the
filter open; libjpeg's "fancy" upsampler differs by a few LSB on chroma
edges — the fixture tests bound this).

Verified against an INDEPENDENT decoder (gdk-pixbuf/libjpeg renderings of
four real-world files) in tests/test_jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 Figure A.6): index i in scan order -> (row, col)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 IDCT basis (T.81 A.3.3): A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_U = np.arange(8)
_A = 0.5 * np.cos((2 * _U[None, :] + 1) * _U[:, None] * np.pi / 16.0)
_A[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an (8, 8) coefficient block."""
    return _A.T @ block @ _A


class _Huffman:
    """Canonical Huffman table from DHT BITS/HUFFVAL (T.81 C.2), compiled
    to a 16-bit peek table: lut[peek16] = (length << 8) | value — one
    array read per symbol instead of a bit-by-bit tree walk."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut = np.zeros(1 << 16, dtype=np.uint32)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                prefix = code << (16 - length)
                span = 1 << (16 - length)
                self.lut[prefix:prefix + span] = (length << 8) | vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, 1-padding at
    markers (T.81 F.2.2.5), byte-aligned RSTn consumption."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _ensure(self, n: int) -> None:
        data = self.data
        while self.nbits < n:
            b = data[self.pos] if self.pos < len(data) else 0xFF
            if b == 0xFF:
                nxt = data[self.pos + 1] if self.pos + 1 < len(data) else 0xD9
                if nxt == 0x00:          # stuffed 0xFF data byte
                    self.pos += 2
                else:                    # marker (EOI/RSTn/...): pad with 1s
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, table: _Huffman) -> int:
        self._ensure(16)
        peek = (self.bitbuf >> (self.nbits - 16)) & 0xFFFF
        entry = int(table.lut[peek])
        length = entry >> 8
        if length == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.nbits -= length
        self.bitbuf &= (1 << self.nbits) - 1
        return entry & 0xFF

    def align_and_consume_rst(self) -> None:
        """Byte-align and step over an RSTn marker (T.81 F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1
        if 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map t-bit magnitude to signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, c) uint8 (c = 1 gray, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec:
                    q = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    q = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                qt[tid] = q
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = seg[i + 17:i + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _Huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (8-bit only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (baseline sequential only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
            return _decode_scan(data, pos + 2 + length, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + length
    raise ValueError("JPEG truncated before SOS")


def _tri2(p: np.ndarray, axis: int) -> np.ndarray:
    """2x triangular upsample with sample-centered alignment — the filter
    libjpeg's "fancy" upsampler uses (jdsample.c h2v1/h2v2):
    out[2i] = (3 p[i] + p[i-1])/4, out[2i+1] = (3 p[i] + p[i+1])/4,
    edges replicated."""
    p = np.moveaxis(p, axis, 0)
    prev = np.concatenate([p[:1], p[:-1]])
    nxt = np.concatenate([p[1:], p[-1:]])
    out = np.empty((2 * p.shape[0],) + p.shape[1:], dtype=p.dtype)
    out[0::2] = (3.0 * p + prev) / 4.0
    out[1::2] = (3.0 * p + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _upsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Chroma upsampling: triangular for 2x factors (matches libjpeg's
    default), nearest-neighbor replication otherwise."""
    if fy == 2:
        p = _tri2(p, 0)
    elif fy > 1:
        p = np.repeat(p, fy, axis=0)
    if fx == 2:
        p = _tri2(p, 1)
    elif fx > 1:
        p = np.repeat(p, fx, axis=1)
    return p


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("JPEG missing SOF before SOS")
    h_img, w_img, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
              for c in comps]
    rd = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                rd.align_and_consume_rst()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = rd.decode_huff(huff_dc[td])
                        diff = _extend(rd.read_bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode_huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:   # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break         # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            coeffs[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = coeffs * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = _upsample(p, vmax // c["v"], hmax // c["h"])
        out_planes.append(p[:h_img, :w_img])
    if len(comps) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
