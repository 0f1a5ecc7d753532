"""Minimal ESRI Shapefile POINT writer — the get_idx_as_shp sink
(lsma.py:92-115) without OGR.

The Shapefile format is a fixed public binary layout (ESRI Shapefile
Technical Description, 1998): a .shp geometry file, a .shx offset index,
a dBase III .dbf attribute table, and a plain-text .prj WKT. Point
records are 20 bytes of content (shape type + x + y), so the whole writer
is straight struct packing. Like the reference sink, this is a
driver-side artifact writer for TINY result sets (endmember locations);
bulk exports go through df.write.parquet.
"""

from __future__ import annotations

import struct
from pathlib import Path

WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _main_header(n_records: int, bbox: tuple[float, float, float, float],
                 record_words: int, index: bool) -> bytes:
    """100-byte .shp/.shx header. Lengths are in 16-bit words."""
    if index:
        file_words = 50 + 4 * n_records
    else:
        file_words = 50 + n_records * (4 + record_words)
    x0, y0, x1, y1 = bbox
    return (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, file_words)
            + struct.pack("<ii", 1000, 1)  # version, shape type POINT
            + struct.pack("<4d", x0, y0, x1, y1)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0))  # z/m ranges


def write_point_shapefile(path: str,
                          points: list[tuple[str, float, float]]) -> None:
    """[(name, lon, lat)] → path.{shp,shx,dbf,prj} (EPSG:4326 points,
    like the reference's srs.ImportFromEPSG(4326), lsma.py:104)."""
    base = Path(path).with_suffix("")
    xs = [p[1] for p in points]
    ys = [p[2] for p in points]
    bbox = (min(xs, default=0.0), min(ys, default=0.0),
            max(xs, default=0.0), max(ys, default=0.0))
    record_words = 10  # 20 bytes: int shape type + 2 doubles

    shp = [_main_header(len(points), bbox, record_words, index=False)]
    shx = [_main_header(len(points), bbox, record_words, index=True)]
    offset_words = 50
    for i, (_, x, y) in enumerate(points, start=1):
        shp.append(struct.pack(">ii", i, record_words))
        shp.append(struct.pack("<idd", 1, x, y))
        shx.append(struct.pack(">ii", offset_words, record_words))
        offset_words += 4 + record_words
    base.with_suffix(".shp").write_bytes(b"".join(shp))
    base.with_suffix(".shx").write_bytes(b"".join(shx))

    # dBase III: one 32-char NAME field
    field_len = 32
    rec_len = 1 + field_len  # deletion flag + field
    dbf_header = struct.pack(
        "<B3BIHH20x", 3, 95, 1, 1, len(points), 32 + 32 + 1, rec_len)
    field_desc = struct.pack("<11sc4xBB14x", b"NAME", b"C", field_len, 0)
    recs = [dbf_header, field_desc, b"\r"]
    for name, _, _ in points:
        recs.append(b" " + name.encode("ascii", "replace")[:field_len]
                    .ljust(field_len, b" "))
    recs.append(b"\x1a")
    base.with_suffix(".dbf").write_bytes(b"".join(recs))
    base.with_suffix(".prj").write_text(WGS84_WKT)


def read_point_shapefile(path: str) -> list[tuple[float, float]]:
    """Parse the .shp back to [(x, y)] — round-trip check used by tests
    (and a convenience reader; only shape type 1 supported)."""
    data = Path(path).with_suffix(".shp").read_bytes()
    assert struct.unpack(">i", data[:4])[0] == 9994, "not a shapefile"
    assert struct.unpack("<i", data[32:36])[0] == 1, "not a POINT shapefile"
    out = []
    pos = 100
    while pos < len(data):
        _, content_words = struct.unpack(">ii", data[pos:pos + 8])
        shape_type, x, y = struct.unpack("<idd", data[pos + 8:pos + 28])
        assert shape_type == 1
        out.append((x, y))
        pos += 8 + content_words * 2
    return out
