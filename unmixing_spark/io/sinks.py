"""Vector sinks: KML, GeoJSON, WKT — driver-side writes of small results.

Reference sinks: get_idx_as_kml (lsma.py:55-90), get_idx_as_shp
(lsma.py:92-115, OGR Shapefile — we emit WKT, the portable equivalent),
pixel_to_geojson (utils.py:848-869), FeatureSpace KML (visualize.py:206-232).
All reference sinks collect tiny result sets (endmember locations, selected
pixels) and write locally; ours do the same: `df.limit(n).collect()` on the
driver, then template the text format. Large exports go through
`df.write.parquet/csv` instead — these sinks are for the human-facing
vector artifacts only.
"""

from __future__ import annotations

import json

KML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<kml xmlns="http://www.opengis.net/kml/2.2">\n<Document>\n')
KML_FOOTER = "</Document>\n</kml>\n"


def points_to_kml(points: list[tuple[str, float, float]]) -> str:
    """[(name, lon, lat)] → KML placemark document (lsma.py:55-90 shape)."""
    parts = [KML_HEADER]
    for name, lon, lat in points:
        parts.append(
            f"  <Placemark>\n    <name>{name}</name>\n"
            f"    <Point><coordinates>{lon:.6f},{lat:.6f},0</coordinates></Point>\n"
            f"  </Placemark>\n")
    parts.append(KML_FOOTER)
    return "".join(parts)


def pixels_to_kml(pixels: list[tuple[str, float, float, float, float]]) -> str:
    """[(name, x_min, x_max, y_min, y_max)] → KML with point + footprint
    polygon per pixel (FeatureSpace sink, visualize.py:206-232)."""
    parts = [KML_HEADER]
    for name, x0, x1, y0, y1 in pixels:
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        ring = (f"{x0:.6f},{y0:.6f},0 {x1:.6f},{y0:.6f},0 "
                f"{x1:.6f},{y1:.6f},0 {x0:.6f},{y1:.6f},0 {x0:.6f},{y0:.6f},0")
        parts.append(
            f"  <Placemark>\n    <name>{name}</name>\n"
            f"    <Point><coordinates>{cx:.6f},{cy:.6f},0</coordinates></Point>\n"
            f"  </Placemark>\n  <Placemark>\n    <name>{name}-footprint</name>\n"
            f"    <Polygon><outerBoundaryIs><LinearRing><coordinates>{ring}"
            f"</coordinates></LinearRing></outerBoundaryIs></Polygon>\n"
            f"  </Placemark>\n")
    parts.append(KML_FOOTER)
    return "".join(parts)


def points_to_geojson(points: list[tuple[float, float]]) -> str:
    """Pixel coords → GeoJSON GeometryCollection (utils.pixel_to_geojson,
    utils.py:848-869)."""
    return json.dumps({
        "type": "GeometryCollection",
        "geometries": [{"type": "Point", "coordinates": [lon, lat]}
                       for lon, lat in points],
    })


def footprint_to_wkt(x0: float, x1: float, y0: float, y1: float) -> str:
    """Pixel footprint → WKT POLYGON (the portable form of
    point_to_pixel_geometry's OGR output, lsma.py:695-741)."""
    return (f"POLYGON (({x0} {y1}, {x1} {y1}, {x1} {y0}, "
            f"{x0} {y0}, {x0} {y1}))")
