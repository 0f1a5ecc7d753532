from __future__ import annotations

import duckdb
import pytest

from unmixing_spark import dialect as D
from unmixing_spark.spatial.grid import WORLD_GRID, GridSpec


def _eval(sql_expr: str):
    return duckdb.sql(f"SELECT {sql_expr}").fetchone()[0]


def test_cell_roundtrip_center():
    """cell -> center -> cell must be the identity (coordinate round-trip,
    reference tests.py:483-509, <=1 px error; ours is exact by center)."""
    g = WORLD_GRID
    for lon, lat in [(-74.0, 40.7), (0.0, 0.0), (179.99, -89.99), (-180.0, 90.0), (151.2, -33.87)]:
        cell = _eval(g.cell_sql(D.dbl(lon), D.dbl(lat)))
        clon = _eval(g.cell_center_lon_sql(str(cell)))
        clat = _eval(g.cell_center_lat_sql(str(cell)))
        cell2 = _eval(g.cell_sql(D.dbl(clon), D.dbl(clat)))
        assert cell == cell2
        assert abs(clon - lon) <= g.deg
        assert abs(clat - lat) <= g.deg


def test_tile_nesting():
    g = WORLD_GRID
    cell = _eval(g.cell_sql(D.dbl(-74.0), D.dbl(40.7)))
    tile = _eval(g.tile_sql_from_cell(str(cell)))
    r = _eval(g.local_rc_sql(str(cell))[0])
    c = _eval(g.local_rc_sql(str(cell))[1])
    assert 0 <= r < g.tile and 0 <= c < g.tile
    # reconstruct cell from tile + local rc
    ty, tx = divmod(tile, g.ntx)
    iy, ix = ty * g.tile + r, tx * g.tile + c
    assert iy * g.nx + ix == cell


def test_geotransform():
    g = WORLD_GRID
    gt = g.geotransform(0)
    assert gt == (-180.0, g.deg, 0.0, 90.0, 0.0, -g.deg)


def test_neighbors_interior_and_edge():
    g = GridSpec(deg=1.0, tile=10)
    nty = (g.ny + g.tile - 1) // g.tile
    interior = (nty // 2) * g.ntx + g.ntx // 2
    assert len(g.neighbors(interior)) == 8
    assert len(g.neighbors(0)) == 3  # corner
    assert interior not in g.neighbors(interior)


def test_parent_cell_regrid():
    g = WORLD_GRID
    cell = _eval(g.cell_sql(D.dbl(2.35), D.dbl(48.86)))
    parent = _eval(g.parent_cell_sql(str(cell), 4))
    # parent index arithmetic: same point on the 4x coarser grid
    ix, iy = cell % g.nx, cell // g.nx
    assert parent == (iy // 4) * (g.nx // 4) + ix // 4
