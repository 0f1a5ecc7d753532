"""Spatial joins at scale: point-in-polygon, kNN, zonal — the north rule's
join surface beyond the SQL forms in queries/spatial_q.py.

Design for 10^12 points:
- PIP: the polygon side is small (AOIs) → broadcast. Each point is tested
  against candidate polygons pre-filtered by bounding box (a cheap column
  predicate that Catalyst pushes into the scan), then the exact
  winding-number test runs vectorized in a pandas UDF. One narrow stage.
- kNN: never cross-join the big side. Points and cells share the grid, so
  candidates come from expanding cell rings around each query point
  (GridSpec.neighbors generalized to cell rings); only ring cells join.
  For the small query sets typical of endmember search, the query side is
  the broadcast side and the big side is scanned once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from unmixing_spark.spatial.grid import GridSpec, WORLD_GRID


def winding_contains(poly: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized winding-number point-in-polygon test.

    poly: (k, 2) ring (closed or open), lon/lat: (N,). Returns bool (N,).
    Replaces the reference's OGR geometry containment (it builds OGR
    polygons at lsma.py:695-741; we test directly)."""
    px, py = poly[:, 0], poly[:, 1]
    px2, py2 = np.roll(px, -1), np.roll(py, -1)
    wn = np.zeros(len(lon), dtype=np.int64)
    for i in range(len(px)):
        x1, y1, x2, y2 = px[i], py[i], px2[i], py2[i]
        cross = (x2 - x1) * (lat - y1) - (lon - x1) * (y2 - y1)
        up = (y1 <= lat) & (y2 > lat) & (cross > 0)
        dn = (y1 > lat) & (y2 <= lat) & (cross < 0)
        wn += up.astype(np.int64) - dn.astype(np.int64)
    return wn != 0


def point_in_polygon_join(points: DataFrame, polygons: list[tuple[str, np.ndarray]],
                          lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """points ⋈ polygons → points + matched polygon name (inner).

    polygons: [(name, (k,2) ring array)] — closed over (broadcast) by the
    UDF; bbox prefilter stays in the JVM as a pushed-down predicate."""
    names = [n for n, _ in polygons]
    rings = [np.asarray(r, dtype=np.float64) for _, r in polygons]
    bboxes = [(r[:, 0].min(), r[:, 0].max(), r[:, 1].min(), r[:, 1].max())
              for r in rings]

    # bbox OR-filter: cheap JVM-side candidate pruning before Python
    cond = None
    for (x0, x1, y0, y1) in bboxes:
        c = (F.col(lon_col) >= x0) & (F.col(lon_col) <= x1) & \
            (F.col(lat_col) >= y0) & (F.col(lat_col) <= y1)
        cond = c if cond is None else (cond | c)
    pruned = points.filter(cond)

    @F.pandas_udf(T.StringType())
    def match(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        out = np.full(len(lo), None, dtype=object)
        for name, ring, (x0, x1, y0, y1) in zip(names, rings, bboxes):
            cand = (out == None) & (lo >= x0) & (lo <= x1) & (la >= y0) & (la <= y1)  # noqa: E711
            if cand.any():
                hit = winding_contains(ring, lo[cand], la[cand])
                idx = np.flatnonzero(cand)[hit]
                out[idx] = name
        return pd.Series(out)

    return (pruned.withColumn("aoi", match(F.col(lon_col), F.col(lat_col)))
            .filter(F.col("aoi").isNotNull()))


def knn_join(cells: DataFrame, queries: list[tuple[str, float, float]],
             k: int = 5, grid: GridSpec = WORLD_GRID,
             max_rings: int = 64) -> DataFrame:
    """k nearest occupied cells per query point via expanding ring search.

    Scale path: instead of scoring every cell (the SQL form in
    queries/spatial_q.py), each query point only joins cells whose cell_id
    falls in its candidate ring set; rings expand until k hits are
    guaranteed correct (ring r bounds distance from below at (r-1)*deg, so
    once the k-th best hit is closer than that bound, stop). Here rings
    are precomputed generously on the driver (queries are few); the join is
    a broadcast IN-set semi-join against the big cell table."""
    g = grid
    out = []
    qdf = []
    for name, qlon, qlat in queries:
        ix = min(max(int((qlon + 180.0) / g.deg), 0), g.nx - 1)
        iy = min(max(int((90.0 - qlat) / g.deg), 0), g.ny - 1)
        cand = []
        for r in range(max_rings + 1):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    if max(abs(dy), abs(dx)) != r:
                        continue
                    x, y = ix + dx, iy + dy
                    if 0 <= x < g.nx and 0 <= y < g.ny:
                        cand.append(y * g.nx + x)
        qdf.append((name, qlon, qlat, cand))
    spark = cells.sparkSession
    queries_df = spark.createDataFrame(
        [(n, lo, la, c) for n, lo, la, c in qdf],
        "name string, qlon double, qlat double, cand array<bigint>")
    exploded = queries_df.select("name", "qlon", "qlat",
                                 F.explode("cand").alias("cell_id"))
    # candidate set is tiny → broadcast it; the big cell table is the probe
    # side of a broadcast hash join (scanned once, no shuffle)
    joined = cells.join(F.broadcast(exploded), "cell_id")
    clon = (F.col("cell_id") % g.nx + 0.5) * g.deg - 180.0
    clat = 90.0 - (F.floor(F.col("cell_id") / g.nx) + 0.5) * g.deg
    d2 = (clon - F.col("qlon")) ** 2 + (clat - F.col("qlat")) ** 2
    from pyspark.sql import Window
    w = Window.partitionBy("name").orderBy(d2.asc(), F.col("cell_id").asc())
    return (joined.withColumn("d2", d2).withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("name", "cell_id", "d2", "rn"))
