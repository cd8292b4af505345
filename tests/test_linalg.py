"""Ported MatrixOperations / PolynomialFitter fixtures
(/root/reference/SignalSharp.Tests/Utilities/MatrixOperationsTests.cs) for
kernels/linalg.py — the numerical ground truths the smoothing/cost kernels
lean on.
"""

import numpy as np
import pytest

from signalsharp_ray.kernels.linalg import (
    combinations,
    evaluate_polynomial,
    fit_polynomial,
    invert,
    solve_linear_system,
    try_solve_linear_system,
)


class TestCombinations:
    # MatrixOperationsTests.cs Combinations_ValidInputs/_SpecialCases/_EdgeCases
    @pytest.mark.parametrize(
        "n,k,expected",
        [(5, 2, 10), (10, 3, 120), (7, 4, 35), (5, 0, 1), (5, 5, 1), (7, 1, 7),
         (0, 0, 1), (3, 5, 0), (5, -2, 0)],
    )
    def test_values(self, n, k, expected):
        assert combinations(n, k) == expected

    def test_symmetry(self):
        assert combinations(8, 3) == combinations(8, 5)

    def test_large_value_accuracy(self):
        # Combinations_LargeValues_MaintainsAccuracy: C(20,10) = 184756
        assert combinations(20, 10) == pytest.approx(184756, abs=1e-3)


class TestSolveLinearSystem:
    def test_overdetermined_least_squares(self):
        # SolveLinearSystem_ValidInput: 3x2 system -> [-6, 6.5]
        a = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        y = np.array([7.0, 8.0, 9.0])
        np.testing.assert_allclose(solve_linear_system(a, y), [-6.0, 6.5], atol=1e-9)

    def test_square_exact(self):
        a = np.array([[2.0, 1.0], [1.0, 3.0]])
        x = np.array([1.5, -2.0])
        np.testing.assert_allclose(solve_linear_system(a, a @ x), x, atol=1e-12)

    def test_underdetermined_raises(self):
        with pytest.raises(ValueError):
            solve_linear_system(np.ones((1, 3)), np.array([1.0]))

    def test_try_solve_singular_returns_none(self):
        a = np.array([[1.0, 2.0], [2.0, 4.0]])
        assert try_solve_linear_system(a, np.array([1.0, 2.0])) is None

    def test_try_solve_empty_system(self):
        # TrySolveLinearSystem_EmptySystem / NoVariables / NonZeroB parity
        assert try_solve_linear_system(np.empty((0, 0)), np.empty(0)).size == 0
        assert try_solve_linear_system(np.empty((2, 0)), np.zeros(2)).size == 0
        assert try_solve_linear_system(np.empty((2, 0)), np.array([1.0, 0.0])) is None


class TestInverse:
    def test_known_inverse(self):
        # Inverse_ValidSquareMatrix: [[4,7],[2,6]]^-1 = [[0.6,-0.7],[-0.2,0.4]]
        a = np.array([[4.0, 7.0], [2.0, 6.0]])
        np.testing.assert_allclose(
            invert(a), [[0.6, -0.7], [-0.2, 0.4]], atol=1e-12
        )

    def test_identity(self):
        np.testing.assert_allclose(invert(np.eye(3)), np.eye(3), atol=1e-15)

    def test_inverse_of_inverse(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(4, 4)) + 4 * np.eye(4)
        np.testing.assert_allclose(invert(invert(a)), a, atol=1e-9)

    def test_product_is_identity(self):
        a = np.array([[3.0, 1.0], [2.0, 5.0]])
        np.testing.assert_allclose(a @ invert(a), np.eye(2), atol=1e-12)

    def test_singular_raises(self):
        with pytest.raises(np.linalg.LinAlgError):
            invert(np.array([[1.0, 2.0], [2.0, 4.0]]))


class TestPolynomial:
    def test_exact_fit_recovers_coefficients(self):
        # y = 2 + 3x - x^2 fitted at order 2 returns the exact coefficients
        x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0, 3.0])
        y = 2.0 + 3.0 * x - x * x
        np.testing.assert_allclose(
            fit_polynomial(x, y, 2), [2.0, 3.0, -1.0], atol=1e-9
        )

    def test_evaluate_lowest_order_first(self):
        # coefficients [c0, c1, c2]: value at x=2 of 1 + 2x + 3x^2 = 17
        assert evaluate_polynomial(np.array([1.0, 2.0, 3.0]), 2.0) == pytest.approx(17.0)

    def test_mismatched_lengths_raise(self):
        with pytest.raises(ValueError):
            fit_polynomial(np.arange(3.0), np.arange(4.0), 1)

    def test_negative_order_raises(self):
        with pytest.raises(ValueError):
            fit_polynomial(np.arange(3.0), np.arange(3.0), -1)

    def test_insufficient_points_raise(self):
        with pytest.raises(ValueError):
            fit_polynomial(np.arange(2.0), np.arange(2.0), 2)


class TestMatrixSurface:
    """Transpose/Add/Multiply/ScalarMultiply parity with
    MatrixOperations.cs:32-216 (values + validation semantics)."""

    def test_transpose(self):
        from signalsharp_ray.kernels.linalg import transpose

        m = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        np.testing.assert_array_equal(transpose(m), m.T)
        with pytest.raises(ValueError):
            transpose(np.array([1.0, 2.0]))

    def test_add(self):
        from signalsharp_ray.kernels.linalg import add

        a = np.array([[1.0, 2.0], [3.0, 4.0]])
        np.testing.assert_array_equal(add(a, a), 2 * a)
        with pytest.raises(ValueError, match="same dimensions"):
            add(a, np.ones((3, 2)))

    def test_multiply_matrix_and_vector(self):
        from signalsharp_ray.kernels.linalg import multiply

        a = np.array([[1.0, 2.0], [3.0, 4.0]])
        b = np.array([[5.0, 6.0], [7.0, 8.0]])
        np.testing.assert_array_equal(multiply(a, b), a @ b)
        v = np.array([1.0, -1.0])
        np.testing.assert_array_equal(multiply(a, v), a @ v)
        with pytest.raises(ValueError, match="Inner dimensions"):
            multiply(a, np.ones((3, 3)))
        with pytest.raises(ValueError, match="length of the vector"):
            multiply(a, np.ones(3))

    def test_scalar_multiply(self):
        from signalsharp_ray.kernels.linalg import scalar_multiply

        a = np.array([[1.0, -2.0], [0.5, 4.0]])
        np.testing.assert_array_equal(scalar_multiply(-2.0, a), -2.0 * a)
