"""Baseline JPEG codec — ITU-T T.81 sequential DCT (SOF0), stdlib+numpy.

Re-implemented from the public spec (ITU-T Recommendation T.81, 1992:
Annex F sequential coding, Annex A DCT/zigzag/quantization, Annex B
interchange format, Annex K standard tables) — no image library. Retires
the repo's last multimodal stub: the reference's multimodal surface
treats images as opaque payloads; here decode AND encode are real for the
codecs a crawl actually sees (PNG, BMP, JPEG baseline).

Decoder: 8-bit baseline sequential (SOF0) AND progressive (SOF2, Annex
G.2: spectral selection + successive approximation, interleaved DC /
non-interleaved AC scans, EOB runs, refinement bits), 1 component
(grayscale) or 3 components (YCbCr → RGB, JFIF conversion), arbitrary
h/v sampling factors (4:4:4, 4:2:2, 4:2:0), restart intervals
(DRI/RSTn). Chroma upsampling is the triangular filter for 2x factors
(libjpeg's default shape; spec A.1.1 leaves the filter open), nearest
otherwise. Not supported (raise NotImplementedError): arithmetic
coding, 12-bit, hierarchical, per-component baseline scans, CMYK.

Encoder: baseline 4:4:4 (gray or RGB→YCbCr) with the Annex K standard
quantization + Huffman tables and libjpeg-compatible quality scaling;
deterministic (pure numpy).

Verified against an INDEPENDENT decoder (gdk-pixbuf/libjpeg renderings of
four real-world files, plus gdk decoding OUR encoder's output) in
tests/test_jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

# standard quantization tables (T.81 Annex K.1, Tables K.1/K.2) in
# natural (row-major) order
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# standard Huffman tables (T.81 Annex K.3): (BITS[1..16], HUFFVAL)
_HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                bytes(range(12)))
_HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  bytes(range(12)))
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))
_HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))

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
    coefs = None  # progressive: per-component zigzag coefficient arrays
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} (8-bit only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} "
                "(baseline sequential + progressive only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — scan follows
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
            if frame is not None and frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                pos = _decode_progressive_scan(
                    data, pos + 2 + length, frame, scan, huff_dc, huff_ac,
                    restart_interval, ss, se, ahal >> 4, ahal & 15, coefs)
                continue
            if frame is not None and (
                    len(scan) < len(frame["comps"])
                    or (len(frame["comps"]) == 1
                        and (frame["comps"][0]["h"] > 1
                             or frame["comps"][0]["v"] > 1))):
                # per-component scans are ALWAYS non-interleaved
                # (T.81 A.2.2) — including a single-component frame with
                # sampling factors > 1: accumulate coefficients per
                # scan, reconstruct at EOI
                if len(scan) != 1:
                    raise NotImplementedError(
                        "baseline scan with %d of %d components (full "
                        "interleave or one component per scan)"
                        % (len(scan), len(frame["comps"])))
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                pos = _decode_baseline_component_scan(
                    data, pos + 2 + length, frame, scan, huff_dc, huff_ac,
                    restart_interval, coefs)
                continue
            return _decode_scan(data, pos + 2 + length, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + length
    if frame is not None and coefs is not None:
        return _reconstruct_coefs(frame, coefs, qt)
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


def _decode_baseline_component_scan(data, pos, frame, scan, huff_dc,
                                    huff_ac, dri, coefs):
    """One baseline sequential scan covering a SINGLE component
    (T.81 A.2.2 non-interleaved data-unit order: row-major over the
    component's OWN ceil(comp_size/8) block grid, not the MCU-padded
    one). Full DC+AC coefficients land in ``coefs`` in zigzag order —
    reconstruction happens at EOI via _reconstruct_coefs, exactly like
    the progressive path. Returns the position of the next marker."""
    comps = frame["comps"]
    cidx = {c["id"]: i for i, c in enumerate(comps)}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    (cid, (td, ta)), = scan.items()
    ci = cidx[cid]
    c = comps[ci]
    if td not in huff_dc:
        raise ValueError("missing DHT DC table %d for scan" % td)
    if ta not in huff_ac:
        raise ValueError("missing DHT AC table %d for scan" % ta)
    cw = -(-(frame["w"] * c["h"]) // hmax)       # ceil component size (A.1.1)
    ch = -(-(frame["h"] * c["v"]) // vmax)
    nbx, nby = -(-cw // 8), -(-ch // 8)
    rd = _BitReader(data, pos)
    pred, unit = 0, 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and unit and unit % dri == 0:
                rd.align_and_consume_rst()
                pred = 0
            blk = coefs[ci][by, bx]
            t = rd.decode_huff(huff_dc[td])
            pred += _extend(rd.read_bits(t), t)
            blk[0] = pred
            k = 1
            while k < 64:
                rs = rd.decode_huff(huff_ac[ta])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:                  # ZRL: 16 zeros
                        k += 16
                        continue
                    break                        # EOB
                k += r
                if k > 63:
                    raise ValueError("AC index overrun")
                blk[k] = _extend(rd.read_bits(s), s)
                k += 1
            unit += 1
    return _next_marker(data, rd.pos)


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("JPEG missing SOF before SOS")
    h_img, w_img, comps = frame["h"], frame["w"], frame["comps"]
    # This decoder handles the single interleaved scan covering every frame
    # component (the shape every baseline encoder in practice emits). T.81
    # also allows per-component scans (ns < nc, non-interleaved data-unit
    # order per A.2.2) and 4-component Adobe CMYK frames — refuse those
    # explicitly rather than mis-decode.
    if len(scan) != len(comps):
        raise NotImplementedError(
            "JPEG per-component scans (ns %d != nc %d): single interleaved "
            "scan only" % (len(scan), len(comps)))
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            "JPEG with %d components (grayscale/YCbCr only)" % len(comps))
    if len(comps) == 1 and (comps[0]["h"] > 1 or comps[0]["v"] > 1):
        raise NotImplementedError(
            "single-component JPEG with sampling factors >1 requires "
            "non-interleaved data-unit order (T.81 A.2.2)")
    for c in comps:
        td, ta = scan[c["id"]]
        if td not in huff_dc:
            raise ValueError("missing DHT DC table %d for scan" % td)
        if ta not in huff_ac:
            raise ValueError("missing DHT AC table %d for scan" % ta)
        if c["tq"] not in qt:
            raise ValueError("missing DQT table %d for scan" % c["tq"])
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
    return _finish_planes(comps, planes, h_img, w_img, hmax, vmax)


def _finish_planes(comps, planes, h_img, w_img, hmax, vmax):
    """Upsample chroma, crop to image size, YCbCr→RGB (JFIF)."""
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


# ---- progressive decoding (T.81 Annex G.2, Huffman) -------------------------
#
# A progressive image is a sequence of scans, each delivering one band of
# zigzag coefficients (spectral selection Ss..Se) at one bit-precision
# level (successive approximation Ah→Al) for one or all components.
# Coefficients accumulate in per-component integer arrays; the IDCT and
# color conversion run once, after all scans (G.1.1.1.1: AC scans are
# single-component and non-interleaved; DC scans may interleave).


def _alloc_coefs(frame):
    """Per-component (blocks_y, blocks_x, 64) zigzag coefficient arrays
    sized to the MCU-padded grid (interleaved DC scans write the padding
    blocks; A.2.3's dummy data units)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
            for c in comps]


def _first_ac_block(rd, blk, ac, ss, se, al, eobrun):
    """One block of an AC first scan (G.2.2, Figure G.3/G.5): run-length
    coding with EOBn end-of-band runs; new coefficients arrive scaled by
    2^Al. Returns the updated EOB run counter."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode_huff(ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:              # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1    # EOBn: this block + 2^r-1+ext more
            if r:
                eobrun += rd.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overrun in progressive scan")
        blk[k] = _extend(rd.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac_block(rd, blk, ac, ss, se, al, eobrun):
    """One block of an AC refinement scan (G.1.2.3): each
    already-nonzero coefficient in the band receives a correction bit;
    newly-nonzero coefficients are inserted at ±2^Al after skipping r
    zero-history positions. Mirrors the spec's decision flow (the same
    one libjpeg's jdphuff.c implements)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode_huff(ac)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:          # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read_bits(r)
                    break
                # ZRL: r=15 → skip 16 zero-history coefficients below
            elif s == 1:             # newly-nonzero coefficient
                newval = p1 if rd.read_bits(1) else -p1
            else:
                # G.1.2.3 allows only s in (0, 1) in a refinement scan;
                # anything else means the stream is desynchronized.
                raise ValueError(
                    "AC refinement scan with magnitude %d "
                    "(G.1.2.3 allows 0 or 1)" % s)
            while k <= se:           # advance r zero-history positions,
                v = int(blk[k])      # refining nonzero-history ones
                if v != 0:
                    if rd.read_bits(1) and not (v & p1):
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:               # inside an EOB run every remaining
            v = int(blk[k])          # nonzero coefficient still refines
            if v != 0:
                if rd.read_bits(1) and not (v & p1):
                    blk[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(data, pos):
    """Position of the next real marker at/after ``pos`` (skipping
    stuffed 0xFF00 and stray RSTn)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return len(data)


def _decode_progressive_scan(data, pos, frame, scan, huff_dc, huff_ac,
                             dri, ss, se, ah, al, coefs):
    """Decode one progressive scan into ``coefs``; returns the stream
    position of the marker following the entropy-coded segment."""
    comps = frame["comps"]
    cidx = {c["id"]: i for i, c in enumerate(comps)}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    members = [cidx[cid] for cid in scan]     # SOS order
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if ss != 0 and len(members) != 1:
        raise ValueError(
            "progressive AC scan with %d components (G.1.1.1.1 allows 1)"
            % len(members))
    # G.1.1.1.1 progression checks: every referenced entropy table must
    # exist, the DC band must arrive before any AC band of the same
    # component, and a refinement scan's Ah must equal the Al at which the
    # band was previously delivered — violations decode garbage silently
    # if let through, so refuse them the way the codec refuses other
    # malformed input.
    hist = frame.setdefault("_delivered", {})   # (ci, k) -> current Al
    for ci in members:
        td, ta = scan[comps[ci]["id"]]
        if ss == 0:
            if ah == 0 and td not in huff_dc:
                raise ValueError("missing DHT DC table %d for scan" % td)
            prev = hist.get((ci, 0))
            if ah == 0:
                if prev is not None:
                    raise ValueError(
                        "duplicate progressive DC first scan (G.1.1.1.1)")
            elif prev != ah:
                raise ValueError(
                    "progressive DC refinement at Ah=%d but band delivered "
                    "at Al=%s (G.1.1.1.1)" % (ah, prev))
            hist[(ci, 0)] = al
        else:
            if ta not in huff_ac:
                raise ValueError("missing DHT AC table %d for scan" % ta)
            if hist.get((ci, 0)) is None:
                raise ValueError(
                    "progressive AC scan before the component's DC scan "
                    "(G.1.1.1.1)")
            for k in range(ss, se + 1):
                prev = hist.get((ci, k))
                if ah == 0:
                    if prev is not None:
                        raise ValueError(
                            "overlapping progressive AC first scans for "
                            "coefficient %d (G.1.1.1.1)" % k)
                elif prev != ah:
                    raise ValueError(
                        "progressive AC refinement at Ah=%d but coefficient "
                        "%d delivered at Al=%s (G.1.1.1.1)" % (ah, k, prev))
                hist[(ci, k)] = al
    rd = _BitReader(data, pos)
    if len(members) == 1:
        # non-interleaved: row-major over the component's OWN data-unit
        # grid, ceil(comp_size/8) per side (A.2.2) — smaller than the
        # MCU-padded allocation for subsampled edge blocks.
        ci = members[0]
        c = comps[ci]
        cw = -(-(frame["w"] * c["h"]) // hmax)   # ceil component size (A.1.1)
        ch = -(-(frame["h"] * c["v"]) // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        td, ta = scan[c["id"]]
        pred, eobrun, unit = 0, 0, 0
        for by in range(nby):
            for bx in range(nbx):
                if dri and unit and unit % dri == 0:
                    rd.align_and_consume_rst()
                    pred, eobrun = 0, 0
                blk = coefs[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        t = rd.decode_huff(huff_dc[td])
                        pred += _extend(rd.read_bits(t), t)
                        blk[0] = pred << al
                    elif rd.read_bits(1):
                        blk[0] |= 1 << al
                elif ah == 0:
                    eobrun = _first_ac_block(
                        rd, blk, huff_ac[ta], ss, se, al, eobrun)
                else:
                    eobrun = _refine_ac_block(
                        rd, blk, huff_ac[ta], ss, se, al, eobrun)
                unit += 1
    else:
        # interleaved DC scan over the MCU grid (A.2.3)
        mcus_x = -(-frame["w"] // (8 * hmax))
        mcus_y = -(-frame["h"] // (8 * vmax))
        preds = {ci: 0 for ci in members}
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and mcu and mcu % dri == 0:
                    rd.align_and_consume_rst()
                    preds = {ci: 0 for ci in members}
                for ci in members:
                    c = comps[ci]
                    td, _ = scan[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by,
                                            mx * c["h"] + bx]
                            if ah == 0:
                                t = rd.decode_huff(huff_dc[td])
                                preds[ci] += _extend(rd.read_bits(t), t)
                                blk[0] = preds[ci] << al
                            elif rd.read_bits(1):
                                blk[0] |= 1 << al
                mcu += 1
    return _next_marker(data, rd.pos)


def _reconstruct_coefs(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient arrays (batched
    einsum over all blocks) — shared by the progressive path (the
    per-bit work happened scan-side) and baseline per-component scans
    (each scan delivered its component's full coefficients)."""
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise NotImplementedError(
            "JPEG with %d components (grayscale/YCbCr only)" % len(comps))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        cf = coefs[ci]
        nby, nbx = cf.shape[:2]
        blocks = np.zeros((nby, nbx, 64))
        # qt tables are kept in DQT (zigzag) order, matching cf's indexing
        blocks[:, :, ZIGZAG] = cf.astype(np.float64) * qt[c["tq"]]
        blocks = blocks.reshape(nby, nbx, 8, 8)
        px = np.einsum("ux,ijuv,vy->ijxy", _A, blocks, _A) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return _finish_planes(comps, planes, frame["h"], frame["w"], hmax, vmax)


# ---- encoder (baseline sequential, standard Annex K tables) -----------------

class _BitWriter:
    """Entropy bit writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Pad to a byte boundary and emit RSTm (raw — restart markers
        are not stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


def _huff_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """value -> (code, length) from canonical BITS/HUFFVAL."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a signed value (T.81 F.1.2.1.1)."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (jcparam.c)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _block_zz(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize one 8x8 sample block to zigzag-order integers."""
    coef = _A @ (block - 128.0) @ _A.T                  # forward DCT
    return np.round(coef.reshape(-1)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)


def _encode_dc(zz0: int, pred: int, dc_codes, bw: _BitWriter) -> int:
    """Huffman-code one DC difference, returning the new predictor."""
    t, code = _magnitude(zz0 - pred)
    c, ln = dc_codes[t]
    bw.write(c, ln)
    bw.write(code, t)
    return zz0


def _encode_ac_band(zz: np.ndarray, ac_codes, bw: _BitWriter) -> None:
    """Huffman-code coefficients 1..63 of one block: (run, size) symbols
    with ZRL and a terminal EOB (F.1.2.2). The identical coding is a
    legal progressive AC first scan at Ah=Al=0 — there 0x00 means an EOB
    run of exactly 1 (G.1.2.2), which is what baseline EOB does."""
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]                      # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]                          # EOB
        bw.write(c, ln)


def _encode_block(block: np.ndarray, q: np.ndarray,
                  dc_codes, ac_codes, bw: _BitWriter, pred: int) -> int:
    """FDCT + quantize + Huffman-encode one 8x8 sample block, returning
    the updated DC predictor (T.81 F.1.2)."""
    zz = _block_zz(block, q)
    pred = _encode_dc(int(zz[0]), pred, dc_codes, bw)
    _encode_ac_band(zz, ac_codes, bw)
    return pred


_SUBSAMPLE = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: str = "444",
                scan_mode: str = "interleaved",
                dri: int = 0) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> JPEG bytes
    (standard Annex K quant + Huffman tables, libjpeg quality scaling).
    ``subsample``: "444", "422" or "420" chroma subsampling
    (box-filtered; ignored for grayscale). ``scan_mode``:
    "interleaved" (SOF0, one SOS, A.2.3 MCU order), "separate" (SOF0,
    one SOS per component, A.2.2 non-interleaved data-unit order over
    the component's own ceil-grid), or "progressive" (SOF2,
    spectral-selection-only scan script: interleaved DC scan then one
    full-band AC scan per component, Ah=Al=0 — same quantized
    coefficients as baseline, progressive framing). ``dri``: restart
    interval in data units ("progressive" mode only — emits DRI + RSTn,
    exercising the progressive restart path end-to-end). Deterministic:
    pure numpy arithmetic."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg takes gray or RGB input")
    hf, vf = _SUBSAMPLE[subsample] if nc == 3 else (1, 1)
    mh, mw = 8 * vf, 8 * hf                      # MCU size in samples
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    padded = np.pad(arr.astype(np.float64),
                    ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    if nc == 3:
        r, g, b = padded[..., 0], padded[..., 1], padded[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if (hf, vf) != (1, 1):                   # box-filter downsample
            cb = cb.reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))
            cr = cr.reshape(ph // vf, vf, pw // hf, hf).mean(axis=(1, 3))
        planes = [y, cb, cr]
        factors = [(hf, vf), (1, 1), (1, 1)]
    else:
        planes = [padded[..., 0]]
        factors = [(1, 1)]
    q_lum = _scaled_q(_Q_LUM, quality)
    q_chrom = _scaled_q(_Q_CHROM, quality)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + q_lum[ZIGZAG].astype(np.uint8).tobytes())
    if nc == 3:
        out += seg(0xDB, b"\x01" + q_chrom[ZIGZAG].astype(np.uint8).tobytes())
    comp_spec = b"".join(
        struct.pack(">BBB", ci + 1, (factors[ci][0] << 4) | factors[ci][1],
                    0 if ci == 0 else 1)
        for ci in range(nc))
    sof = 0xC2 if scan_mode == "progressive" else 0xC0
    out += seg(sof, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
    tables = [(0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM)]
    if nc == 3:
        tables += [(0x01, _HUFF_DC_CHROM), (0x11, _HUFF_AC_CHROM)]
    for tid, (bits, vals) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + vals)
    dc_lum = _huff_codes(*_HUFF_DC_LUM)
    ac_lum = _huff_codes(*_HUFF_AC_LUM)
    dc_chrom = _huff_codes(*_HUFF_DC_CHROM)
    ac_chrom = _huff_codes(*_HUFF_AC_CHROM)
    if scan_mode == "progressive":
        if dri:
            out += seg(0xDD, struct.pack(">H", dri))
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        # quantize every block of each MCU-padded plane up front — the
        # DC scan covers padding blocks (A.2.3 dummy units), AC scans
        # cover only the component's own A.2.2 ceil-grid
        coef = []
        for ci in range(nc):
            qt = q_lum if ci == 0 else q_chrom
            p = planes[ci]
            nby_p, nbx_p = p.shape[0] // 8, p.shape[1] // 8
            zz = np.zeros((nby_p, nbx_p, 64), dtype=np.int64)
            for by in range(nby_p):
                for bx in range(nbx_p):
                    zz[by, bx] = _block_zz(
                        p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], qt)
            coef.append(zz)
        # scan 1: interleaved DC, Ss=Se=0, Ah=Al=0
        scan_spec = b"".join(
            struct.pack(">BB", ci + 1, (0 if ci == 0 else 1) << 4)
            for ci in range(nc))
        out += seg(0xDA, bytes([nc]) + scan_spec + b"\x00\x00\x00")
        bw = _BitWriter()
        preds = [0] * nc
        mcu, rst = 0, 0
        for my in range(ph // mh):
            for mx in range(pw // mw):
                if dri and mcu and mcu % dri == 0:
                    bw.restart(rst)
                    rst = (rst + 1) & 7
                    preds = [0] * nc
                for ci in range(nc):
                    cf_h, cf_v = factors[ci]
                    dc = dc_lum if ci == 0 else dc_chrom
                    for byy in range(cf_v):
                        for bxx in range(cf_h):
                            zz0 = int(coef[ci][my * cf_v + byy,
                                               mx * cf_h + bxx, 0])
                            preds[ci] = _encode_dc(zz0, preds[ci], dc, bw)
                mcu += 1
        out += bw.flush()
        # one full-band AC scan per component (Ss=1, Se=63, Ah=Al=0),
        # non-interleaved over the component ceil-grid
        for ci in range(nc):
            out += seg(0xDA, bytes([1])
                       + struct.pack(">BB", ci + 1, 0 if ci == 0 else 1)
                       + b"\x01\x3f\x00")
            cw = -(-(w * factors[ci][0]) // hmax)
            ch = -(-(h * factors[ci][1]) // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            ac = ac_lum if ci == 0 else ac_chrom
            bw = _BitWriter()
            unit, rst = 0, 0
            for by in range(nby):
                for bx in range(nbx):
                    if dri and unit and unit % dri == 0:
                        bw.restart(rst)
                        rst = (rst + 1) & 7
                    _encode_ac_band(coef[ci][by, bx], ac, bw)
                    unit += 1
            out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)
    if scan_mode == "separate":
        hmax = max(f[0] for f in factors)
        vmax = max(f[1] for f in factors)
        for ci in range(nc):
            out += seg(0xDA, bytes([1])
                       + struct.pack(">BB", ci + 1, 0 if ci == 0 else 0x11)
                       + b"\x00\x3f\x00")
            # A.2.2: row-major over THIS component's ceil-grid (can be
            # narrower than the MCU-padded plane), fresh DC predictor
            cw = -(-(w * factors[ci][0]) // hmax)
            ch = -(-(h * factors[ci][1]) // vmax)
            nbx, nby = -(-cw // 8), -(-ch // 8)
            qt = q_lum if ci == 0 else q_chrom
            dc = dc_lum if ci == 0 else dc_chrom
            ac = ac_lum if ci == 0 else ac_chrom
            bw = _BitWriter()
            pred = 0
            for by in range(nby):
                for bx in range(nbx):
                    pred = _encode_block(
                        planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8],
                        qt, dc, ac, bw, pred)
            out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)
    if scan_mode != "interleaved":
        raise ValueError(f"unknown scan_mode {scan_mode!r}")
    scan_spec = b"".join(struct.pack(">BB", ci + 1, 0 if ci == 0 else 0x11)
                         for ci in range(nc))
    out += seg(0xDA, bytes([nc]) + scan_spec + b"\x00\x3f\x00")

    bw = _BitWriter()
    preds = [0] * nc
    # interleaved MCUs (T.81 A.2.3): component ci contributes its
    # (hf_ci x vf_ci) blocks per MCU, row-major
    for my in range(ph // mh):
        for mx in range(pw // mw):
            for ci in range(nc):
                cf_h, cf_v = factors[ci]
                qt = q_lum if ci == 0 else q_chrom
                dc = dc_lum if ci == 0 else dc_chrom
                ac = ac_lum if ci == 0 else ac_chrom
                for byy in range(cf_v):
                    for bxx in range(cf_h):
                        y0 = (my * cf_v + byy) * 8
                        x0 = (mx * cf_h + bxx) * 8
                        preds[ci] = _encode_block(
                            planes[ci][y0:y0 + 8, x0:x0 + 8],
                            qt, dc, ac, bw, preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
