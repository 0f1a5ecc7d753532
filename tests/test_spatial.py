"""Spatial join scale paths vs their SQL reference forms; skew handling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from unmixing_spark import pipeline
from unmixing_spark.spatial.grid import WORLD_GRID
from unmixing_spark.spatial.joins import knn_join, point_in_polygon_join, winding_contains
from unmixing_spark.spatial.skew import salted_agg, skew_report


def test_winding_number_vs_bbox():
    """On a rectangle the winding test must agree with the bbox test; on a
    triangle it must exclude the cut corner."""
    rect = np.array([[0, 0], [10, 0], [10, 5], [0, 5]], dtype=float)
    rng = np.random.default_rng(1)
    lon = rng.uniform(-2, 12, 2000)
    lat = rng.uniform(-2, 7, 2000)
    got = winding_contains(rect, lon, lat)
    want = (lon > 0) & (lon < 10) & (lat > 0) & (lat < 5)
    # boundary points may differ; exclude them
    on_edge = np.isclose(lon, 0) | np.isclose(lon, 10) | np.isclose(lat, 0) | np.isclose(lat, 5)
    assert (got[~on_edge] == want[~on_edge]).all()

    tri = np.array([[0, 0], [10, 0], [0, 10]], dtype=float)
    assert winding_contains(tri, np.array([1.0, 9.0]), np.array([1.0, 9.0])).tolist() == [True, False]


def test_pip_join_matches_sql_form(spark):
    """The pandas-UDF PIP join must agree with the pure-SQL rectangle join
    on rectangle AOIs."""
    geo = pipeline.geo_pages(spark, SF_SMALL).select("url", "lon", "lat")
    rect = np.array([[-80.0, 35.0], [-70.0, 35.0], [-70.0, 45.0], [-80.0, 45.0]])
    got = point_in_polygon_join(geo, [("nyc_box", rect)])
    n_udf = got.count()
    n_sql = geo.filter((F.col("lon") > -80.0) & (F.col("lon") < -70.0) &
                       (F.col("lat") > 35.0) & (F.col("lat") < 45.0)).count()
    assert n_udf == n_sql and n_udf > 0


def test_knn_ring_join_matches_bruteforce(spark):
    """Ring-candidate kNN must return exactly the brute-force top-k."""
    cells = pipeline.cell_raster(spark, SF_SMALL).select("cell_id", "b1").cache()
    queries = [("nyc", -74.0, 40.7), ("tokyo", 139.7, 35.68)]
    got = knn_join(cells, queries, k=5).orderBy("name", "rn").toPandas()

    from unmixing_spark.spatial.grid import WORLD_GRID as g
    pdf = cells.toPandas()
    for name, qlon, qlat in queries:
        clon = (pdf.cell_id % g.nx + 0.5) * g.deg - 180.0
        clat = 90.0 - (pdf.cell_id // g.nx + 0.5) * g.deg
        d2 = (clon - qlon) ** 2 + (clat - qlat) ** 2
        order = np.lexsort((pdf.cell_id.to_numpy(), d2.to_numpy()))
        want = pdf.cell_id.to_numpy()[order][:5]
        have = got[got.name == name].cell_id.to_numpy()
        assert (have == want).all(), f"{name}: {have} != {want}"


def test_skew_report_finds_hotspots(spark):
    geo = pipeline.geo_pages(spark, SF_SMALL)
    rep = skew_report(geo, "tile_id", top=5).toPandas()
    assert len(rep) == 5
    # hotspot design: top tile must be far above the mean key load
    assert rep.skew_factor.iloc[0] > 5.0


def test_salted_agg_equals_plain_agg(spark):
    geo = pipeline.geo_pages(spark, SF_SMALL)
    plain = (geo.groupBy("tile_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg(F.length("text")).alias("mean_len"),
                  F.max("warc_epoch").alias("max_ep"))
             .orderBy("tile_id").toPandas())
    salted = (salted_agg(geo, "tile_id",
                         {"n": ("count", "*"),
                          "mean_len": ("avg", F.length("text")),
                          "max_ep": ("max", "warc_epoch")},
                         n_salts=16, salt_source="url")
              .orderBy("tile_id").toPandas())
    assert (plain.tile_id.to_numpy() == salted.tile_id.to_numpy()).all()
    assert (plain.n.to_numpy() == salted.n.to_numpy()).all()
    assert np.allclose(plain.mean_len, salted.mean_len, rtol=1e-12)
    assert (plain.max_ep.to_numpy() == salted.max_ep.to_numpy()).all()


def test_knn_ring_sparse_region_expands_and_matches(spark):
    """A query point far from any hotspot (mid-ocean) forces the adaptive
    loop through several expansion rounds; the certified result must still
    equal brute force exactly — including the cell_id tie-break."""
    from pyspark.sql import Window

    cells = pipeline.cell_raster(spark, SF_SMALL).cache()
    queries = [("midpacific", -150.0, 0.0), ("nyc", -74.0, 40.7)]
    got = (knn_join(cells, queries, k=5)
           .orderBy("name", "rn").toPandas())

    g = WORLD_GRID
    clon = (F.col("cell_id") % g.nx + 0.5) * g.deg - 180.0
    clat = 90.0 - (F.floor(F.col("cell_id") / g.nx) + 0.5) * g.deg
    frames = []
    for name, qlon, qlat in queries:
        d2 = (clon - qlon) ** 2 + (clat - qlat) ** 2
        w = Window.orderBy(d2.asc(), F.col("cell_id").asc())
        frames.append(
            cells.withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select(F.lit(name).alias("name"), "cell_id", "d2", "rn"))
    want = frames[0].unionByName(frames[1]).orderBy("name", "rn").toPandas()
    assert got.cell_id.tolist() == want.cell_id.tolist()
    assert np.allclose(got.d2, want.d2, rtol=0, atol=1e-12)
