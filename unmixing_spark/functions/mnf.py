"""Minimum Noise Fraction rotation — two-pass distributed.

Re-implemented from Green et al. (1988, IEEE TGRS 26:1) — the paper the
reference's dependency wraps (transform.mnf_rotation, transform.py:104-118
delegates to pysptools; per SURVEY.md §7.0 we implement from the paper,
not the package):

1. estimate the noise covariance Σ_N from pixel shift differences,
2. whiten: F = U_N Λ_N^{-1/2},
3. PCA of the whitened signal covariance; components ordered by
   DESCENDING SNR (the "MNF eigen-order" invariant of the north star),
4. deterministic eigenvector sign convention (largest-|entry| positive) so
   outputs are reproducible across LAPACK builds and partitionings.

Distributed plan (SURVEY.md §2.8 L1): pass 1 computes the partial sums
(Σx, ΣxᵀX, Σdᵀd, counts) per Arrow batch via mapInPandas → final combine
on the driver (a classic partial+final aggregation; the reduction is a sum
of per-batch matrices, so cost is O(p²) per batch, independent of data
size). Driver does the (p x p) eigendecompositions. Pass 2 broadcasts the
(p x p) rotation into a narrow mapInPandas projection.

NoData handling: NoData pixels are remapped to 0 before the rotation,
matching transform.py:112.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

NODATA = -9999.0


def _sign_fix(V: np.ndarray) -> np.ndarray:
    """Make each eigenvector's largest-|entry| positive (deterministic)."""
    idx = np.abs(V).argmax(axis=0)
    signs = np.sign(V[idx, np.arange(V.shape[1])])
    signs[signs == 0] = 1.0
    return V * signs


def mnf_rotation_matrix(signal_cov: np.ndarray, noise_cov: np.ndarray):
    """→ (rotation R (p, p), snr eigenvalues desc). Y = (X - mean) @ R."""
    wn, Un = np.linalg.eigh(noise_cov)
    wn = np.maximum(wn, 1e-12 * wn.max())
    F = Un @ np.diag(1.0 / np.sqrt(wn))
    Sw = F.T @ signal_cov @ F
    ws, V = np.linalg.eigh(Sw)
    order = np.argsort(ws)[::-1]
    V = _sign_fix(V[:, order])
    return F @ V, ws[order]


def mnf_rotate(cube: np.ndarray, nodata: float = NODATA):
    """Single-node kernel over a (p, m, n) cube → ((p, m, n) rotated cube,
    snr eigenvalues). Noise via horizontal shift difference (Green 1988
    §III: adjacent-pixel differences share signal, difference is ~√2
    noise)."""
    p, m, n = cube.shape
    # rows iterate the raster row-major, so consecutive rows are horizontal
    # pixel neighbors — the shift-difference pairs
    X = cube.reshape(p, m * n).T.astype(np.float64).copy()
    X[X == nodata] = 0.0
    dX = np.diff(X, axis=0)
    noise_cov = (dX.T @ dX) / (2.0 * (dX.shape[0] - 1))
    mu = X.mean(axis=0)
    Xc = X - mu
    signal_cov = (Xc.T @ Xc) / (X.shape[0] - 1)
    R, snr = mnf_rotation_matrix(signal_cov, noise_cov)
    Y = Xc @ R
    return Y.T.reshape(p, m, n), snr


def mnf_fit_distributed(cells: DataFrame, band_cols: list[str],
                        nodata: float = NODATA):
    """Pass 1: partial covariance sums per Arrow batch → driver eigh.

    Noise is estimated from consecutive-row differences WITHIN each batch
    (cells arrive sorted by cell_id per partition → spatial neighbors),
    dropping the cross-batch seam — an O(1/batch) approximation that keeps
    the pass embarrassingly parallel.
    Returns (rotation R, mean mu, snr)."""
    p = len(band_cols)
    schema = ("n long, ndiff long, sx array<double>, sxx array<double>, "
              "sdd array<double>")

    def _partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = pdf[band_cols].to_numpy(dtype=np.float64)
            X[X == nodata] = 0.0
            d = np.diff(X, axis=0) if len(X) > 1 else np.zeros((0, p))
            yield pd.DataFrame({
                "n": [len(X)], "ndiff": [len(d)],
                "sx": [X.sum(axis=0)],
                "sxx": [(X.T @ X).ravel()],
                "sdd": [(d.T @ d).ravel()],
            })

    parts = cells.mapInPandas(_partial, schema).collect()
    n = sum(r["n"] for r in parts)
    ndiff = sum(r["ndiff"] for r in parts)
    sx = np.sum([np.asarray(r["sx"]) for r in parts], axis=0)
    sxx = np.sum([np.asarray(r["sxx"]) for r in parts], axis=0).reshape(p, p)
    sdd = np.sum([np.asarray(r["sdd"]) for r in parts], axis=0).reshape(p, p)
    mu = sx / n
    signal_cov = (sxx - n * np.outer(mu, mu)) / (n - 1)
    noise_cov = sdd / (2.0 * max(ndiff - 1, 1))
    R, snr = mnf_rotation_matrix(signal_cov, noise_cov)
    return R, mu, snr


def mnf_transform_distributed(cells: DataFrame, band_cols: list[str],
                              R: np.ndarray, mu: np.ndarray,
                              keep_cols=("cell_id",)) -> DataFrame:
    """Pass 2: broadcast rotation, narrow projection (no shuffle)."""
    p = len(band_cols)
    keep_cols = list(keep_cols)
    Rb, mub = np.asarray(R), np.asarray(mu)
    schema = ", ".join([f"{c} long" for c in keep_cols] +
                       [f"mnf{i+1} double" for i in range(p)])

    def _proj(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = pdf[band_cols].to_numpy(dtype=np.float64)
            Y = (X - mub) @ Rb
            out = {c: pdf[c].to_numpy() for c in keep_cols}
            for i in range(p):
                out[f"mnf{i+1}"] = Y[:, i]
            yield pd.DataFrame(out)

    return cells.mapInPandas(_proj, schema)
