"""Rasterization: sparse cell rows → dense multiband tiles.

The reference's raster cube is a dense ``(p, m, n)`` band-major NumPy array
(utils.as_array, utils.py:45-63). Our tile-rowed equivalent (SURVEY.md
§1.5): one row per tile with the flattened band-major pixel payload plus
its GeoTransform struct, assembled by a grouped-map pandas UDF — one Arrow
batch per tile, reshaped in NumPy, never per-row Python.

Scale notes: the only shuffle is the ``groupBy(tile_id)``; upstream
aggregation to cells is a map-side-combinable hash agg, so the shuffle
carries *cells* (≤ tile² rows per tile), not pages. Hot city tiles are
bounded by tile size (at most tile² cells regardless of page count) —
page-level skew is absorbed in the cell aggregation, which AQE handles;
see spatial/skew.py for the salted variant when even cell aggregation
skews.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unmixing_spark.raster import NODATA
from unmixing_spark.spatial.grid import GridSpec, WORLD_GRID

TILE_SCHEMA = (
    "tile_id long, x0 double, y0 double, dx double, dy double, "
    "p int, m int, n int, bands array<double>"
)


def assemble_tiles(cells: DataFrame, band_cols: list[str],
                   grid: GridSpec = WORLD_GRID) -> DataFrame:
    """cells (cell_id, tile_id, b1..bp) → dense tiles.

    ``bands`` is the band-major flattening of the reference's (p, m, n)
    cube with NODATA in unoccupied pixels (utils.py:45-63 shape contract;
    -9999 sentinel per lsma.py:43).
    """
    p = len(band_cols)
    tile = grid.tile
    nxc, ntx, deg = grid.nx, grid.ntx, grid.deg

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_id = int(key[0])
        ty, tx = divmod(tile_id, ntx)
        arr = np.full((p, tile, tile), NODATA, dtype=np.float64)
        iy = (pdf["cell_id"].to_numpy() // nxc).astype(np.int64)
        ix = (pdf["cell_id"].to_numpy() % nxc).astype(np.int64)
        r, c = iy % tile, ix % tile
        for bi, bc in enumerate(band_cols):
            arr[bi, r, c] = pdf[bc].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "tile_id": [tile_id],
            "x0": [-180.0 + tx * tile * deg], "y0": [90.0 - ty * tile * deg],
            "dx": [deg], "dy": [-deg],
            "p": [p], "m": [tile], "n": [tile],
            "bands": [arr.ravel()],
        })

    return cells.repartition(F.col("tile_id")).groupBy("tile_id").applyInPandas(_build, TILE_SCHEMA)


def explode_tiles(tiles: DataFrame, band_names: list[str],
                  grid: GridSpec = WORLD_GRID) -> DataFrame:
    """Inverse pivot: dense tiles → one row per occupied pixel
    (cell_id, b1..bp). The relational `ravel_and_filter` (lsma.py:769-796):
    pixels whose band-0 value is NODATA are dropped."""
    p = len(band_names)
    tile = grid.tile
    nxc, ntx = grid.nx, grid.ntx
    schema = "cell_id long, " + ", ".join(f"{b} double" for b in band_names)

    def _unravel(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                arr = np.asarray(row["bands"], dtype=np.float64).reshape(p, tile, tile)
                keep = arr[0] != NODATA
                r, c = np.nonzero(keep)
                ty, tx = divmod(int(row["tile_id"]), ntx)
                cell = (ty * tile + r).astype(np.int64) * nxc + (tx * tile + c)
                out = {"cell_id": cell}
                for bi, b in enumerate(band_names):
                    out[b] = arr[bi, r, c]
                yield pd.DataFrame(out)

    return tiles.mapInPandas(_unravel, schema)
