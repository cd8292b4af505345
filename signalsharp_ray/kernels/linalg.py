"""Matrix / polynomial utilities mirroring the reference's public surface.

The reference implements Gauss-Jordan inverse, QR least-squares and a
normal-equation polynomial fitter by hand
(/root/reference/SignalSharp/Utilities/MatrixOperations.cs:32-319,
PolynomialFitter.cs:21-100); we delegate to numpy's LAPACK-backed routines,
preserving the failure semantics the cost functions rely on
(singular system -> try_solve returns None -> +inf cost).
"""

from __future__ import annotations

import numpy as np


def solve_linear_system(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Square systems: exact solve; over-determined: least squares
    (mirrors MatrixOperations.SolveLinearSystem's QR path)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("a must be 2-D")
    if a.shape[0] == a.shape[1]:
        return np.linalg.solve(a, b)
    if a.shape[0] < a.shape[1]:
        raise ValueError("System is under-determined (rows < cols).")
    sol, *_ = np.linalg.lstsq(a, b, rcond=None)
    return sol


def try_solve_linear_system(a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    """None on singular/failed solve (the reference's Try variant returns
    false and the caller maps it to an infinite segment cost).

    Zero-variable parity (MatrixOperationsTests.cs TrySolveLinearSystem_
    EmptySystem / NoVariables / NoVariablesWithNonZeroB): a system with no
    unknowns has the empty solution when b is (effectively) zero and no
    solution otherwise."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.ndim == 2 and a.shape[1] == 0:
        if b.size == 0 or np.allclose(b, 0.0, atol=1e-12):
            return np.empty(0, dtype=np.float64)
        return None
    try:
        sol = solve_linear_system(a, b)
    except (np.linalg.LinAlgError, ValueError):
        return None
    if not np.all(np.isfinite(sol)):
        return None
    return sol


def combinations(n: int, k: int) -> float:
    """Binomial coefficient C(n, k) via the reference's multiplicative
    formulation (MatrixOperations.cs:220-237): k out of range -> 0,
    k in {0, n} -> 1, symmetry C(n,k)=C(n,n-k), float accumulation."""
    if k < 0 or k > n:
        return 0.0
    if k == 0 or k == n:
        return 1.0
    if k > n // 2:
        k = n - k
    result = 1.0
    for i in range(1, k + 1):
        result = result * (n - i + 1) / i
    return result


def invert(a: np.ndarray) -> np.ndarray:
    return np.linalg.inv(np.asarray(a, dtype=np.float64))


def fit_polynomial(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Least-squares polynomial fit; coefficients LOWEST order first
    (PolynomialFitter.FitPolynomial solves the normal equations; numpy's
    QR-based lstsq agrees to rounding on the small edge windows it's used
    for)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.shape != y.shape:
        raise ValueError("Input arrays must have the same length.")
    if order < 0:
        raise ValueError("Polynomial order must be non-negative.")
    if x.size <= order:
        raise ValueError("Number of data points must exceed the polynomial order.")
    design = np.vander(x, order + 1, increasing=True)
    xtx = design.T @ design
    xty = design.T @ y
    return np.linalg.solve(xtx, xty)


def evaluate_polynomial(coefficients: np.ndarray, x: float | np.ndarray):
    """Evaluate with coefficients lowest-order first."""
    coefficients = np.asarray(coefficients, dtype=np.float64)
    return np.polyval(coefficients[::-1], x)


def transpose(matrix: np.ndarray) -> np.ndarray:
    """Matrix transpose (MatrixOperations.cs:32-57)."""
    m = np.asarray(matrix, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError("matrix must be 2-D")
    return m.T.copy()


def add(matrix_a: np.ndarray, matrix_b: np.ndarray) -> np.ndarray:
    """Element-wise matrix addition with the reference's dimension check
    (MatrixOperations.cs:61-103)."""
    a = np.asarray(matrix_a, dtype=np.float64)
    b = np.asarray(matrix_b, dtype=np.float64)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError("inputs must be 2-D")
    if a.shape != b.shape:
        raise ValueError("Matrices must have the same dimensions for addition.")
    return a + b


def multiply(matrix_a: np.ndarray, b) -> np.ndarray:
    """Matrix x matrix (MatrixOperations.cs:107-155) or matrix x vector
    (MatrixOperations.cs:159-193) product with the reference's inner-
    dimension checks."""
    a = np.asarray(matrix_a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("matrix_a must be 2-D")
    if b.ndim == 1:
        if a.shape[1] != b.shape[0]:
            raise ValueError(
                "Number of columns in the matrix must match the length of the vector."
            )
        return a @ b
    if b.ndim == 2:
        if a.shape[1] != b.shape[0]:
            raise ValueError(
                "Inner dimensions of matrices do not match for multiplication."
            )
        return a @ b
    raise ValueError("b must be 1-D or 2-D")


def scalar_multiply(scalar: float, matrix: np.ndarray) -> np.ndarray:
    """Scalar x matrix product (MatrixOperations.cs:197-216)."""
    m = np.asarray(matrix, dtype=np.float64)
    if m.ndim != 2:
        raise ValueError("matrix must be 2-D")
    return float(scalar) * m
