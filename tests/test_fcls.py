"""FCLS kernel correctness: vs exact QP, ASC/ANC properties, determinism.

Mirrors the reference's FCLS test strategy (test/tests.py:45-82): golden
determinism across parallelism plus abundance constraints.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from unmixing_spark.lsma.fcls import (fcls_abundance, nnls_multiple,
                                      predict_spectra_from_abundance)


def fcls_exact(x, E, delta):
    """Brute-force exact FCLS: enumerate passive sets, KKT-check."""
    q, p = E.shape
    A = np.vstack([delta * E.T, np.ones((1, q))])
    b = np.concatenate([delta * x, [1.0]])
    best, bestr = None, np.inf
    for r in range(1, q + 1):
        for S in itertools.combinations(range(q), r):
            S = list(S)
            xs, *_ = np.linalg.lstsq(A[:, S], b, rcond=None)
            if (xs < -1e-9).any():
                continue
            full = np.zeros(q)
            full[S] = xs
            w = A.T @ (b - A @ full)
            act = np.ones(q, bool)
            act[S] = False
            if act.any() and (w[act] > 1e-8).any():
                continue
            res = np.linalg.norm(A @ full - b)
            if res < bestr - 1e-12:
                bestr, best = res, full
    return best


def test_fcls_matches_exact_qp():
    rng = np.random.default_rng(7)
    for _ in range(50):
        q = int(rng.integers(2, 6))
        p = int(rng.integers(q, 10))
        E = rng.uniform(0, 1000, (q, p))
        X = rng.uniform(-100, 1200, (5, p))
        A = fcls_abundance(X, E)
        delta = 1.0 / (1000.0 * np.abs(E).max())
        for i in range(len(X)):
            ex = fcls_exact(X[i], E, delta)
            if ex is not None:
                assert np.abs(ex - A[i]).max() < 1e-3


def test_fcls_constraints():
    rng = np.random.default_rng(11)
    E = rng.uniform(0, 500, (4, 6))
    X = rng.uniform(-50, 600, (5000, 6))
    A = fcls_abundance(X, E)
    assert (A >= -1e-12).all(), "non-negativity (ANC)"
    assert np.abs(A.sum(axis=1) - 1).max() < 1e-4, "sum-to-one (ASC)"


def test_fcls_pure_pixels_recovered():
    """A pixel exactly equal to an endmember must unmix to a unit vector."""
    rng = np.random.default_rng(3)
    E = rng.uniform(10, 100, (3, 6))
    A = fcls_abundance(E.copy(), E)
    assert np.abs(A - np.eye(3)).max() < 1e-4


def test_fcls_known_mixture_recovered():
    rng = np.random.default_rng(5)
    E = rng.uniform(10, 100, (3, 6))
    W = rng.dirichlet(np.ones(3), size=200)
    X = W @ E
    A = fcls_abundance(X, E)
    assert np.abs(A - W).max() < 1e-3


def test_fcls_batch_invariance():
    """Chunked vs whole-batch results identical — the reference's
    1-vs-2-process determinism check (tests.py:62-82) at kernel level."""
    rng = np.random.default_rng(13)
    E = rng.uniform(0, 1000, (3, 6))
    X = rng.uniform(0, 1200, (1000, 6))
    whole = fcls_abundance(X, E)
    parts = np.vstack([fcls_abundance(X[:137], E),
                       fcls_abundance(X[137:612], E),
                       fcls_abundance(X[612:], E)])
    assert np.array_equal(whole, parts), "bytes must match across chunking"


def test_forward_model_shape():
    A = np.array([[0.5, 0.5], [1.0, 0.0]])
    E = np.array([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]])
    R = predict_spectra_from_abundance(A, E)
    assert R.shape == (2, 3)
    assert np.allclose(R[0], [2.0, 2.0, 2.0])


def test_nnls_nonnegative_only():
    rng = np.random.default_rng(17)
    A = rng.uniform(-1, 1, (20, 5))
    B = rng.uniform(-1, 1, (20, 50))
    X = nnls_multiple(A.T @ A, A.T @ B)
    assert (X >= -1e-12).all()
    # KKT: for active rows gradient <= 0
    G = A.T @ B - (A.T @ A) @ X
    assert (G[X <= 1e-12] <= 1e-8).all()
