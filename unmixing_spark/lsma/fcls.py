"""Fully constrained least squares (FCLS) spectral unmixing — batched.

Re-implemented from the published algorithms the reference wraps (it calls
``pysptools.abundance_maps.amaps.FCLS``, lsma.py:150; we re-derive from the
papers, per SURVEY.md §7.0):

- Heinz & Chang (2001), "Fully constrained least squares linear spectral
  mixture analysis": enforce the abundance sum-to-one constraint (ASC) by
  augmenting the signature matrix with a constant row whose weight is large
  relative to δ-scaled data rows, then solve non-negative least squares
  (ANC) on the augmented system.
- Van Benthem & Keenan (2004), "Fast algorithm for the solution of
  large-scale non-negativity-constrained least squares problems"
  (FC-NNLS): solve NNLS for MANY right-hand sides sharing one Gram matrix
  by grouping columns with identical passive sets — this is what makes the
  per-pixel loop a handful of vectorized BLAS calls per iteration instead
  of a Python loop over pixels.

This module is deliberately pure NumPy with no Spark imports: it is the
kernel that ``lsma.mapper`` ships to executors inside Arrow-batched pandas
UDFs. Determinism: the solve is per-pixel independent and iteration order
is data-independent, so results are invariant to partitioning — the
property pinned by the reference's 1-vs-2-process test (test/tests.py:62-82)
and by our local[8]-vs-local[32] scaling test.
"""

from __future__ import annotations

import numpy as np

_MAX_OUTER = 50
_MAX_INNER = 100


def _solve(AtA: np.ndarray, AtB: np.ndarray) -> np.ndarray:
    """Normal-equations solve with a rank-deficient fallback: duplicate
    or near-parallel endmembers make the δ-scaled Gram matrix exactly
    singular to LAPACK even when E itself passes a rank check (the δ
    augmentation shrinks the data rows to ~1e-3, so nearly-parallel
    rows collapse). The min-norm lstsq solution keeps the solve
    deterministic and splits the tied abundance mass evenly — the
    active-set loop and ASC row then proceed unchanged."""
    try:
        return np.linalg.solve(AtA, AtB)
    except np.linalg.LinAlgError:
        return np.linalg.lstsq(AtA, AtB, rcond=None)[0]


def _cssls(AtA: np.ndarray, AtB: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Combinatorial subspace least squares: solve the unconstrained normal
    equations restricted to each column's passive set, grouping columns
    that share a passive set (Benthem & Keenan eq. 2.4)."""
    q, n = AtB.shape
    X = np.zeros((q, n))
    codes = (P.astype(np.int64) * (1 << np.arange(q, dtype=np.int64))[:, None]).sum(axis=0)
    for code in np.unique(codes):
        if code == 0:
            continue
        cols = np.flatnonzero(codes == code)
        rows = np.flatnonzero(P[:, cols[0]])
        sub = _solve(AtA[np.ix_(rows, rows)], AtB[np.ix_(rows, cols)])
        X[np.ix_(rows, cols)] = sub
    return X


def nnls_multiple(AtA: np.ndarray, AtB: np.ndarray) -> np.ndarray:
    """min ||A x_j - b_j||_2  s.t. x_j >= 0, for every column j, given the
    shared Gram matrix AtA = AᵀA and cross products AtB = AᵀB.

    Returns X of shape (q, n). Fast-combinatorial active-set method."""
    q, n = AtB.shape
    X = _solve(AtA, AtB)
    P = X > 0.0
    X[~P] = 0.0
    feasible = P.all(axis=0)
    X[:, ~feasible] = 0.0

    todo = np.flatnonzero(~feasible)
    outer = 0
    while todo.size and outer < _MAX_OUTER:
        outer += 1
        Xw = _cssls(AtA, AtB[:, todo], P[:, todo])
        # inner loop: walk back columns that went infeasible
        inner = 0
        neg = (Xw < 0.0) & P[:, todo]
        while neg.any() and inner < _MAX_INNER:
            inner += 1
            bad = np.flatnonzero(neg.any(axis=0))
            for j in bad:  # small: only columns still infeasible
                col = todo[j]
                xw = Xw[:, j]
                xo = X[:, col]
                mask = (xw < 0.0) & P[:, col]
                alpha = np.min(xo[mask] / (xo[mask] - xw[mask]))
                xo = xo + alpha * (xw - xo)
                P[np.abs(xo) < 1e-12, col] = False
                xo[~P[:, col]] = 0.0
                X[:, col] = xo
            Xw = _cssls(AtA, AtB[:, todo], P[:, todo])
            neg = (Xw < 0.0) & P[:, todo]
        X[:, todo] = np.where(P[:, todo], Xw, 0.0)
        # optimality: gradient w = Aᵀb - AᵀA x must be <= 0 on active set
        W = AtB[:, todo] - AtA @ X[:, todo]
        W[P[:, todo]] = -np.inf
        improvable = W.max(axis=0) > 1e-10
        if not improvable.any():
            break
        grow = np.flatnonzero(improvable)
        P[W.argmax(axis=0)[grow], todo[grow]] = True
        todo = todo[grow]
    return X


def fcls_abundance(X: np.ndarray, E: np.ndarray, delta: float | None = None) -> np.ndarray:
    """FCLS abundances for pixels X (N, p) against endmembers E (q, p).

    Returns (N, q) with a_i >= 0 and sum_i a_i ≈ 1 (ASC enforced via the
    Heinz-Chang δ-augmentation; δ defaults to 1/(1000·max|E|), so the
    sum-to-one row dominates the δ-scaled data rows. This is a deliberate
    deviation from the pysptools-conventional 1/(10·max|E|): the tighter δ
    enforces ASC harder, and every pinned abundance / scene SHA-256 in the
    determinism gates is locked to it — do not "fix" it back).

    Mirrors the reference's mapper contract (lsma.py:179-230): per-pixel
    independent, deterministic, NoData rows are the caller's concern
    (filter first — lsma.ravel_and_filter, lsma.py:769-796).
    """
    X = np.asarray(X, dtype=np.float64)
    E = np.asarray(E, dtype=np.float64)
    q, p = E.shape
    if delta is None:
        m = np.abs(E).max()
        delta = 1.0 / (1000.0 * m) if m > 0 else 1.0
    A = np.vstack([delta * E.T, np.ones((1, q))])          # (p+1, q)
    B = np.vstack([delta * X.T, np.ones((1, X.shape[0]))])  # (p+1, N)
    AtA = A.T @ A
    AtB = A.T @ B
    return nnls_multiple(AtA, AtB).T


def fcls3_closed_form_constants(E: np.ndarray, delta: float | None = None):
    """Exact-rational affine constants for the q=3 Heinz-Chang FCLS.

    The δ-augmented NNLS (the exact problem ``fcls_abundance`` solves) has
    normal-equation matrix G = δ²·M + 11ᵀ with M = E·Eᵀ. For every
    non-empty active set S ⊆ {0,1,2}, Sherman-Morrison gives the restricted
    least-squares solution in a numerically STABLE form (the direct solve
    of G is κ(G) ≈ 1e9 ill-conditioned; this form never divides by δ²):

        a_S = N·v_S + s·(1 − sᵀ·v_S)/(δ² + σ)

    with N = M_S⁻¹, s = N·1, σ = 1ᵀ·N·1, and v_i = e_i·x the plain
    endmember-spectrum dot products. Expanding, each abundance is AFFINE
    in v:  a_i = k_i + Σ_j C_ij·v_j  where k = s/(δ²+σ), C = N − k·sᵀ.

    The NNLS optimum is the feasible (a_S ≥ 0) candidate maximizing
    tᵀa — equivalently (monotone transform) the SQL-friendly score
        score_S = Σ_{i∈S} v_i·(a_i + k_i) − c0,   c0 = 1/(δ²+σ).

    All constants are computed in exact rational arithmetic (fractions)
    from the double values of E and δ, then rounded once to doubles — so
    the only float error left in a SQL evaluation is the O(ε) evaluation
    of the affine forms (measured ≈ 2e-14, vs the kernel's κ·ε ≈ 1e-7
    conditioning bound). Returns {subset: (k, C, c0)} with subset a tuple
    of 0-based endmember indices, k/C/c0 plain floats.

    Reference semantics: lsma.py:179-230 (the reference's FCLS mapper);
    algorithm re-derived from Heinz & Chang (2001) eq. 13 at q=3.
    """
    from fractions import Fraction
    from itertools import combinations

    E = np.asarray(E, dtype=np.float64)
    q, p = E.shape
    assert q == 3, "closed form is the q=3 specialization"
    if delta is None:
        m = np.abs(E).max()
        delta = 1.0 / (1000.0 * m) if m > 0 else 1.0
    dF = Fraction(float(delta))
    d2 = dF * dF
    M = [[sum(Fraction(float(E[i, c])) * Fraction(float(E[j, c]))
              for c in range(p)) for j in range(q)] for i in range(q)]

    def _inv(Ms):
        n = len(Ms)
        aug = [[Ms[i][j] for j in range(n)]
               + [Fraction(1 if k == i else 0) for k in range(n)]
               for i in range(n)]
        for col in range(n):
            piv = next(r for r in range(col, n) if aug[r][col] != 0)
            aug[col], aug[piv] = aug[piv], aug[col]
            pv = aug[col][col]
            aug[col] = [x / pv for x in aug[col]]
            for r in range(n):
                if r != col and aug[r][col] != 0:
                    f = aug[r][col]
                    aug[r] = [a - f * b for a, b in zip(aug[r], aug[col])]
        return [row[n:] for row in aug]

    out = {}
    for r in (1, 2, 3):
        for S in combinations(range(3), r):
            Ms = [[M[i][j] for j in S] for i in S]
            N = _inv(Ms)
            s = [sum(row) for row in N]
            sigma = sum(s)
            k = [si / (d2 + sigma) for si in s]
            C = [[N[a][b] - k[a] * s[b] for b in range(r)] for a in range(r)]
            out[S] = ([float(x) for x in k],
                      [[float(x) for x in row] for row in C],
                      float(1 / (d2 + sigma)))
    return out


def fcls3_closed_form_eval(X: np.ndarray, E: np.ndarray,
                           delta: float | None = None) -> np.ndarray:
    """Float evaluation of the q=3 closed form — the Python mirror of the
    q_fcls3_closed_form SQL template (same candidate order, same affine
    forms), used by the parity tests. X: (N, p) pixels → (N, 3)."""
    consts = fcls3_closed_form_constants(E, delta)
    X = np.asarray(X, dtype=np.float64)
    E = np.asarray(E, dtype=np.float64)
    V = X @ E.T                                   # (N, 3) dot products
    n = len(X)
    best_score = np.full(n, -np.inf)
    best_a = np.zeros((n, 3))
    # candidate order matches the SQL CASE: full set, pairs, singletons
    order = [(0, 1, 2), (0, 1), (0, 2), (1, 2), (0,), (1,), (2,)]
    for S in order:
        k, C, c0 = consts[S]
        a = np.array(k)[None, :] + V[:, S] @ np.array(C).T
        feas = (a >= 0.0).all(axis=1)
        score = (V[:, S] * (a + np.array(k)[None, :])).sum(axis=1) - c0
        take = feas & (score > best_score)
        best_score[take] = score[take]
        full = np.zeros((n, 3))
        full[:, S] = a
        best_a[take] = full[take]
    return best_a


def predict_spectra_from_abundance(A: np.ndarray, E: np.ndarray) -> np.ndarray:
    """Forward model R = A·E: abundances (N, q) × endmembers (q, p) →
    predicted spectra (N, p). Reference: lsma.py:744-757."""
    return np.asarray(A, dtype=np.float64) @ np.asarray(E, dtype=np.float64)
