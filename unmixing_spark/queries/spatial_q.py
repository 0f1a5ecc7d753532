"""Spatial queries: point lookups, point-in-polygon, kNN, zonal stats.

The north rule's spatial-join surface. Small vector sides (query points,
AOI polygons) are inline VALUES tables — Catalyst auto-broadcasts them, so
every join here is a broadcast hash/nested-loop join against the big page
or cell table, never a shuffle of the big side. The scale-path variants
(ring-bucketed kNN, salted PIP) live in unmixing_spark/spatial/joins.py.
"""

from __future__ import annotations

from unmixing_spark import dialect as D
from unmixing_spark.pagegen import cell_raster_sql, geo_pages_sql
from unmixing_spark.queries import sql_template
from unmixing_spark.spatial.grid import WORLD_GRID

# fixed query points: city centers + offsets (deterministic, in-data)
QUERY_POINTS = [
    ("nyc", -74.0, 40.7), ("london", -0.13, 51.5),
    ("tokyo", 139.7, 35.68), ("sydney", 151.2, -33.87),
]

# AOI rectangles (lon_min, lon_max, lat_min, lat_max) — degenerate-but-real
# polygons; general polygons use the winding-number pandas UDF in
# spatial/joins.py (tested in tests/test_spatial.py)
AOIS = [
    ("americas_ne", -80.0, -70.0, 35.0, 45.0),
    ("europe_w", -5.0, 7.0, 45.0, 55.0),
    ("asia_e", 110.0, 145.0, 30.0, 45.0),
]


def _values_table(d: str, rows: str, alias: str, cols: str) -> str:
    """Inline VALUES table in the dialect's FROM-clause syntax, wrapped as
    a plain subquery so it composes in any join position."""
    if d == D.SPARK:
        return f"(SELECT * FROM VALUES {rows} AS {alias}({cols})) AS {alias}"
    return f"(SELECT * FROM (VALUES {rows}) AS {alias}({cols})) AS {alias}"


def _points_values(d: str) -> str:
    rows = ", ".join(f"('{n}', {D.dbl(lon)}, {D.dbl(lat)})"
                     for n, lon, lat in QUERY_POINTS)
    return _values_table(d, rows, "pts", "name, qlon, qlat")


def _aoi_values(d: str) -> str:
    rows = ", ".join(
        f"('{n}', {D.dbl(a)}, {D.dbl(b)}, {D.dbl(c)}, {D.dbl(e)})"
        for n, a, b, c, e in AOIS)
    return _values_table(d, rows, "aoi", "name, lon_min, lon_max, lat_min, lat_max")


def _spectra_at_xy(d: str) -> str:
    # utils.spectra_at_xy (utils.py:1012-1033): world coords -> cell (inverse
    # affine + truncation, utils.py:1153-1155) -> gather spectra. A point-in-
    # cell lookup join; the query side is broadcast.
    g = WORLD_GRID
    return f"""
    WITH cells AS ({cell_raster_sql(d)}),
    pts AS (SELECT name, {g.cell_sql('qlon', 'qlat')} AS cell_id
            FROM {_points_values(d)})
    SELECT p.name, c.cell_id, c.b1, c.b2, c.b3, c.b4, c.b5, c.b6
    FROM pts p LEFT JOIN cells c ON p.cell_id = c.cell_id
    ORDER BY p.name
    """


sql_template("q_spectra_at_xy", _spectra_at_xy,
             "point->cell spectra lookup join (utils.py:1012-1033, 1104-1157)")


def _pip_join(d: str) -> str:
    # north rule: page coordinates ⋈ AOI polygons (rect AOIs here; general
    # polygons via winding-number UDF in spatial/joins.py). Broadcast range
    # join: the AOI side is tiny -> broadcast nested loop, big side scans once.
    return f"""
    SELECT aoi.name, p.lang, cast(count(*) as bigint) AS pages
    FROM ({geo_pages_sql(d)}) p
    JOIN {_aoi_values(d)}
      ON p.lon >= aoi.lon_min AND p.lon < aoi.lon_max
     AND p.lat >= aoi.lat_min AND p.lat < aoi.lat_max
    GROUP BY aoi.name, p.lang
    """


sql_template("q_point_in_polygon", _pip_join,
             "point-in-polygon join of pages vs AOI polygons (north rule; lsma.py:695-741)")


def _knn_join(d: str) -> str:
    # kNN endmember-candidate search (north rule; generalizes the candidate
    # search of lsma.py:587-655). k=5 nearest occupied cells per query point
    # by squared euclidean distance on cell centers; deterministic tie-break.
    g = WORLD_GRID
    clon = g.cell_center_lon_sql("cell_id")
    clat = g.cell_center_lat_sql("cell_id")
    return f"""
    WITH cells AS ({cell_raster_sql(d)}),
    centers AS (SELECT cell_id, {clon} AS clon, {clat} AS clat, b1 FROM cells),
    scored AS (
      SELECT pts.name, c.cell_id,
             (c.clon - pts.qlon) * (c.clon - pts.qlon)
           + (c.clat - pts.qlat) * (c.clat - pts.qlat) AS d2,
             row_number() OVER (
               PARTITION BY pts.name
               ORDER BY (c.clon - pts.qlon) * (c.clon - pts.qlon)
                      + (c.clat - pts.qlat) * (c.clat - pts.qlat), c.cell_id) AS rn
      FROM {_points_values(d)} CROSS JOIN centers c
    )
    SELECT name, cell_id, round(d2, 8) AS d2, rn
    FROM scored WHERE rn <= 5
    """


sql_template("q_knn_cells", _knn_join,
             "kNN candidate search: k nearest cells per query point (north rule)")


def _zonal_stats(d: str) -> str:
    # raster<->vector zonal aggregation (north rule): per-AOI band means
    g = WORLD_GRID
    clon = g.cell_center_lon_sql("cell_id")
    clat = g.cell_center_lat_sql("cell_id")
    return f"""
    WITH cells AS ({cell_raster_sql(d)}),
    centers AS (SELECT cell_id, {clon} AS clon, {clat} AS clat,
                       b1, b2, b4 FROM cells)
    SELECT aoi.name,
           cast(count(*) as bigint) AS cells,
           round(sum(b1), 3) AS pages,
           round(avg(b2), 5) AS mean_text_len,
           round(avg(b4), 5) AS mean_tokens
    FROM centers c JOIN {_aoi_values(d)}
      ON c.clon >= aoi.lon_min AND c.clon < aoi.lon_max
     AND c.clat >= aoi.lat_min AND c.clat < aoi.lat_max
    GROUP BY aoi.name
    """


sql_template("q_zonal_stats", _zonal_stats,
             "zonal raster<->vector aggregation per AOI (north rule)")


def _feature_space_range(d: str) -> str:
    # FeatureSpace.on_draw 2-D rectangle range query (visualize.py:150-235;
    # pinned headless by tests.py:551-570): select pixels inside the box in
    # feature space, return ids + world coords (the KML payload).
    g = WORLD_GRID
    return f"""
    WITH cells AS ({cell_raster_sql(d)})
    SELECT cell_id,
           round({g.cell_center_lon_sql('cell_id')}, 6) AS lon,
           round({g.cell_center_lat_sql('cell_id')}, 6) AS lat
    FROM cells
    WHERE b2 >= 250.0 AND b2 < 320.0 AND b4 >= 40.0 AND b4 < 60.0
    """


sql_template("q_feature_space_range", _feature_space_range,
             "headless 2-D feature-space rectangle selection (visualize.py:150-235)")


def _endmembers_by_query(d: str) -> str:
    # lsma.endmembers_by_query (lsma.py:501-520): boolean feature-space
    # query -> pixel coords -> world coords
    g = WORLD_GRID
    return f"""
    WITH cells AS ({cell_raster_sql(d)})
    SELECT cell_id,
           {g.cell_to_ix('cell_id')} AS px,
           {g.cell_to_iy('cell_id')} AS py,
           round({g.cell_center_lon_sql('cell_id')}, 6) AS lon,
           round({g.cell_center_lat_sql('cell_id')}, 6) AS lat
    FROM cells
    WHERE b1 >= 2.0 AND b3 >= 2.0
    """


sql_template("q_endmembers_by_query", _endmembers_by_query,
             "boolean query -> candidate coords (lsma.py:501-520)")


def _pixel_geometry(d: str) -> str:
    # lsma.point_to_pixel_geometry (lsma.py:695-741): point -> containing
    # pixel's square footprint corners (numeric; WKT assembly in the sink)
    g = WORLD_GRID
    cell = g.cell_sql("qlon", "qlat")
    return f"""
    WITH pts AS (SELECT name, {cell} AS cell_id FROM {_points_values(d)})
    SELECT name, cell_id,
           round(({g.cell_to_ix('cell_id')}) * {D.dbl(g.deg)} - {D.dbl(180.0)}, 6) AS x_min,
           round(({g.cell_to_ix('cell_id')} + 1) * {D.dbl(g.deg)} - {D.dbl(180.0)}, 6) AS x_max,
           round({D.dbl(90.0)} - ({g.cell_to_iy('cell_id')} + 1) * {D.dbl(g.deg)}, 6) AS y_min,
           round({D.dbl(90.0)} - ({g.cell_to_iy('cell_id')}) * {D.dbl(g.deg)}, 6) AS y_max
    FROM pts ORDER BY name
    """


sql_template("q_pixel_geometry", _pixel_geometry,
             "point -> pixel footprint polygon corners (lsma.py:695-741)")
