"""Cross-CRS regrid (J2 last edge): SQL Snyder transform vs NumPy, and the
q_crosscrs_regrid gather semantics. Reference: utils.py:676-731
(intersect_rasters; gdal.ReprojectImage at :714, nearest-neighbor)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_SMALL
from unmixing_spark import dialect as D
from unmixing_spark.spatial.reproject import (lonlat_from_utm,
                                              utm_forward_sql,
                                              utm_from_lonlat)


def _grid_select(lon0, dlon, lat0, dlat, n=25):
    return (f"SELECT {D.dbl(lon0)} + x * {D.dbl(dlon)} AS lon, "
            f"{D.dbl(lat0)} + x * {D.dbl(dlat)} AS lat "
            f"FROM (SELECT unnest(range({n})) AS x)")


@pytest.mark.parametrize("epsg,lon0,lat0", [
    (32617, -82.5, 35.0),   # zone 17N — the reference's fixture CRS
    (32618, -74.6, 39.5),   # zone 18N — the query's CRS (NYC hotspot)
    (32718, -74.6, -35.0),  # zone 18S — false-northing branch
])
def test_sql_forward_transform_matches_numpy(epsg, lon0, lat0):
    con = duckdb.connect()
    q = utm_forward_sql(_grid_select(lon0, 0.17, lat0, 0.13), epsg)
    df = con.execute(q).df()
    e, n = utm_from_lonlat(df["lon"].to_numpy(), df["lat"].to_numpy(), epsg)
    assert np.abs(e - df["easting"].to_numpy()).max() < 1e-6
    assert np.abs(n - df["northing"].to_numpy()).max() < 1e-6
    # and the round trip closes (sanity on the zone parameters; the
    # Snyder series truncation grows to ~1e-7 deg at the zone edge)
    lon2, lat2 = lonlat_from_utm(e, n, epsg)
    assert np.abs(lon2 - df["lon"].to_numpy()).max() < 5e-7
    assert np.abs(lat2 - df["lat"].to_numpy()).max() < 5e-7


def test_crosscrs_regrid_gathers_source_values():
    from unmixing_spark.queries.complete_q import _crosscrs_regrid
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/documents.parquet')")
    df = con.execute(_crosscrs_regrid(D.DUCKDB)).df()
    assert len(df) > 20
    filled = df["text_len_resampled"].notna()
    # the NYC hotspot guarantees dense coverage: most cells gather a value
    assert filled.sum() > len(df) * 0.5
    # NoData semantics: unfilled cells exist (sparse 20% world spread) and
    # carry NULL, matching gdal's fill, not 0
    assert (df.loc[filled, "src_pages"] >= 1).all()


def test_spark_rendering_matches_duckdb(spark):
    from unmixing_spark.queries import registry
    spec = registry()["q_crosscrs_regrid"]
    sdf = spec.spark_fn(spark, SF_SMALL).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/documents.parquet')")
    ddf = con.execute(spec.oracle).df()
    s = sdf.sort_values("cell_id").reset_index(drop=True)
    d = ddf.sort_values("cell_id").reset_index(drop=True)
    assert (s["cell_id"].to_numpy() == d["cell_id"].to_numpy()).all()
    sv = s["text_len_resampled"].to_numpy(dtype=float)
    dv = d["text_len_resampled"].to_numpy(dtype=float)
    mask = ~(np.isnan(sv) & np.isnan(dv))
    assert np.array_equal(sv[mask], dv[mask])
