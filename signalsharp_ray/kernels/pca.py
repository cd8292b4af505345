"""PCA top component via fixed-iteration power method.

Reference-roadmap item (/root/reference/docs/docs/future-plans.md "PCA
features" under feature extraction). The distributed part is the EXACT
integer-quantized Gram/covariance exchange (the proven
embedding_covariance pattern, pipelines/queries15.py:331); the power
iteration itself runs on the tiny d x d matrix driver-side — and, for
the SQL oracle, inside a recursive CTE carrying the d-vector state.

Parity design: a FIXED number of iterations (no convergence test — both
engines run the same 15 matvecs, so exact equality holds whether or not
the iteration has converged), every inner product an ascending-j left
fold, the normalization division applied per element inside the fold
(w[j]/||w||), and the final sign fixed by the fold-sum of the loadings.
numpy BLAS matvec is deliberately NOT used: its reduction order is
implementation-defined, while the explicit fold is DuckDB's list_sum.
"""

from __future__ import annotations

from math import sqrt

import numpy as np


def power_iteration_top(cov: np.ndarray, iters: int = 15) -> tuple:
    """(loadings, eigenvalue): dominant eigenvector (unit norm,
    sign-fixed so its ascending fold-sum is >= 0) and eigenvalue estimate
    ||C v|| after `iters` matvecs from the all-ones start vector."""
    C = np.asarray(cov, dtype=np.float64)
    if C.ndim != 2 or C.shape[0] != C.shape[1]:
        raise ValueError("cov must be a square matrix")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = C.shape[0]
    w = [1.0] * d
    for _ in range(iters):
        s = 0.0
        for j in range(d):
            s += w[j] * w[j]
        nrm = sqrt(s)
        v = [w[j] / nrm for j in range(d)]
        w_new = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += C[i][j] * v[j]
            w_new.append(acc)
        w = w_new
    s = 0.0
    for j in range(d):
        s += w[j] * w[j]
    lam = sqrt(s)
    v = [w[j] / lam for j in range(d)]
    sign_fold = 0.0
    for j in range(d):
        sign_fold += v[j]
    if sign_fold < 0.0:
        v = [-x for x in v]
    return np.array(v, dtype=np.float64), lam
