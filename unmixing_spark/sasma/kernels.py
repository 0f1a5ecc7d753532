"""Focal-window kernels (driver-side constants, broadcast into UDFs).

The reference's spatial windows (sasma.py:114-186) are the raster analogue
of SQL window frames; they are tiny constant arrays, computed once and
closed over by the focal UDF.
"""

from __future__ import annotations

import numpy as np


def eye_kernel(size: int, band_num: int | None = None) -> np.ndarray:
    """Donut-shaped 0/1 footprint, center excluded (sasma.eye,
    sasma.py:114-136)."""
    c = size // 2 if size % 2 else (size - 1) // 2
    w = np.ones((size, size))
    w[c, c] = 0
    if band_num is not None:
        w = np.repeat(w[None, ...], band_num, axis=0)
    return w


def kernel_idw_l1(size: int, band_num: int | None = None,
                  normalize: bool = False,
                  moore_contiguity: bool = False) -> np.ndarray:
    """Inverse-distance weights by L1 (Von Neumann) or Chebyshev (Moore)
    distance; optional normalize-to-one (sasma.kernel_idw_l1,
    sasma.py:139-186). Vectorized construction."""
    c = size // 2 if size % 2 else (size - 1) // 2
    ii, jj = np.abs(np.indices((size, size)) - c)
    dist = np.maximum(ii, jj) if moore_contiguity else ii + jj
    with np.errstate(divide="ignore"):
        w = np.where(dist == 0, 0.0, 1.0 / dist)
    if normalize:
        w = w / w.sum()
    if band_num is not None:
        w = np.repeat(w[None, ...], band_num, axis=0)
    return w
