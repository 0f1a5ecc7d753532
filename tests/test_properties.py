"""Hypothesis property tests: FCLS, NFINDR, grid arithmetic, composites."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from unmixing_spark import dialect as D
from unmixing_spark.lsma.endmembers import convex_hull, nfindr
from unmixing_spark.lsma.fcls import fcls_abundance
from unmixing_spark.spatial.grid import WORLD_GRID


@settings(max_examples=30, deadline=None)
@given(
    E=arrays(np.float64, (3, 5), elements=st.floats(1.0, 1000.0)),
    X=arrays(np.float64, (16, 5), elements=st.floats(-100.0, 2000.0)),
)
def test_fcls_properties(E, X):
    # need distinguishable endmembers for a well-posed solve
    if np.linalg.matrix_rank(E) < 3:
        return
    A = fcls_abundance(X, E)
    assert (A >= -1e-10).all()
    # ASC is SOFT under the Heinz-Chang δ-augmentation: the sum-to-one
    # row trades off against δ-scaled data rows, so the deviation grows
    # with the size of the unconstrained residual X − E·a — bounded by
    # |X| + |E| (NOT |X| alone: hypothesis found X = 0 against a
    # nontrivial E, where the residual is ≈ |E·a| ~ |E| yet max|X| = 0),
    # giving O(δ² · (|X|+|E|) · |E| · size) with δ = 1/(1000·max|E|).
    # An earlier round it also found the other boundary (X ≈ 300x
    # outside the hull → error 1.0e-3); bound the property by the
    # governing quantity instead of a fixed constant. Absolute accuracy
    # is pinned by the golden fixtures, which use in-hull scenes.
    delta = 1.0 / (1000.0 * np.abs(E).max())
    resid_scale = np.abs(X).max() + np.abs(E).max()
    tol = max(1e-6, 5.0 * delta ** 2 * resid_scale * np.abs(E).max() * E.size)
    assert np.abs(A.sum(axis=1) - 1).max() < tol


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.floats(-180, 180, allow_nan=False),
                          st.floats(-85, 85, allow_nan=False)),
                min_size=3, max_size=40, unique=True))
def test_hull_properties(points):
    hull = convex_hull(points)
    assert set(hull) <= set(map(tuple, points))
    # every input point is inside or on the hull (cross-product test)
    if len(hull) >= 3:
        hx = np.array([h[0] for h in hull])
        hy = np.array([h[1] for h in hull])
        for px, py in points:
            cross = ((np.roll(hx, -1) - hx) * (py - hy)
                     - (px - hx) * (np.roll(hy, -1) - hy))
            assert (cross >= -1e-6 * max(1.0, np.abs(cross).max())).all()


@settings(max_examples=30, deadline=None)
@given(st.floats(-179.999, 179.999), st.floats(-84.999, 84.999))
def test_grid_cell_contains_point(lon, lat):
    g = WORLD_GRID
    cell = duckdb.sql(
        f"SELECT {g.cell_sql(D.dbl(lon), D.dbl(lat))}").fetchone()[0]
    ix, iy = cell % g.nx, cell // g.nx
    assert 0 <= ix < g.nx and 0 <= iy < g.ny
    # the cell's bounds contain the point (within float-division slack)
    west, east = -180 + ix * g.deg, -180 + (ix + 1) * g.deg
    north, south = 90 - iy * g.deg, 90 - (iy + 1) * g.deg
    assert west - 1e-9 <= lon <= east + 1e-9
    assert south - 1e-9 <= lat <= north + 1e-9


def test_nfindr_finds_simplex_vertices():
    """Mixtures of q pure spectra: N-FINDR must recover the pure ones."""
    rng = np.random.default_rng(9)
    pure = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])  # q=3, p=2
    W = rng.dirichlet(np.ones(3) * 2, size=60)
    mixed = W @ pure
    cands = np.vstack([pure, mixed])
    # pad to p >= q-1+1 dims used by volume: nfindr slices to q-1=2 dims
    idx = nfindr(cands, q=3)
    assert set(idx) == {0, 1, 2}, f"expected pure vertices, got {idx}"


def test_nfindr_deterministic():
    rng = np.random.default_rng(11)
    cands = rng.uniform(0, 100, (50, 4))
    assert (nfindr(cands, q=4) == nfindr(cands, q=4)).all()


@settings(max_examples=60, deadline=None)
@given(
    lon_off=st.floats(-2.9, 2.9),
    lat=st.floats(-79.5, 83.5),
    zone=st.integers(1, 60),
    south=st.booleans(),
)
def test_utm_roundtrip_property(lon_off, lat, zone, south):
    """Closed-form UTM <-> lon/lat round-trips to < 1e-7 deg anywhere
    inside a zone, both hemispheres (Snyder series; utils.py:657-673
    analogue)."""
    from unmixing_spark.spatial.reproject import (lonlat_from_utm,
                                                  utm_from_lonlat)
    if south and lat > 0:
        lat = -lat
    if not south and lat < 0:
        lat = -lat
    lon = (-183.0 + 6.0 * zone) + lon_off
    epsg = (32700 if south else 32600) + zone
    e, n = utm_from_lonlat(lon, lat, epsg)
    lon2, lat2 = lonlat_from_utm(e, n, epsg)
    assert abs(float(lon2) - lon) < 1e-7
    assert abs(float(lat2) - lat) < 1e-7
    # northings are non-negative in both hemisphere conventions
    assert float(n) >= 0.0
