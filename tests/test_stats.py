"""Statistics kernels vs the reference's StatisticalFunctionsTests semantics."""

import numpy as np
import pytest

from signalsharp_ray.kernels import stats


def test_mean():
    assert stats.mean([1, 2, 3, 4]) == 2.5


def test_population_variance():
    # population (ddof=0): var([1,2,3,4]) = 1.25
    assert stats.variance([1, 2, 3, 4]) == pytest.approx(1.25)
    assert stats.variance([5.0]) == 0.0


def test_std():
    assert stats.standard_deviation([1, 2, 3, 4]) == pytest.approx(np.sqrt(1.25))


def test_median_odd_even():
    assert stats.median([3, 1, 2]) == 2
    assert stats.median([4, 1, 3, 2]) == 2.5
    assert stats.median([7]) == 7
    with pytest.raises(ValueError):
        stats.median([])


def test_normalize():
    np.testing.assert_allclose(stats.normalize([0, 5, 10]), [0.0, 0.5, 1.0])
    np.testing.assert_array_equal(stats.normalize([3, 3, 3]), [0.0, 0.0, 0.0])


def test_zscore():
    z = stats.zscore([1, 2, 3])
    np.testing.assert_allclose(z, [-np.sqrt(1.5), 0, np.sqrt(1.5)])
    np.testing.assert_array_equal(stats.zscore([2, 2, 2]), [0.0, 0.0, 0.0])


def test_zscore_matches_reference_cusum_pretransform():
    # the reference CUSUM tests z-normalize with population sigma
    x = np.array([0.2, 1.1, 0.2, 4.0, 0.1, 0.2, -2.0, 0.2, 0.1])
    z = stats.zscore(x)
    assert z.mean() == pytest.approx(0.0, abs=1e-12)
    assert z.std() == pytest.approx(1.0)


def test_skewness_symmetric_zero():
    assert stats.skewness([1, 2, 3, 4, 5]) == pytest.approx(0.0, abs=1e-12)
    assert stats.skewness([2, 2, 2]) == 0.0
    with pytest.raises(ValueError):
        stats.skewness([1, 2])


def test_skewness_hybrid_g1_formula():
    # reference formula: n/((n-1)(n-2)) * sum(((x-mean)/POPULATION std)^3)
    x = np.array([1.0, 2.0, 4.0, 8.0])
    mu, sd = x.mean(), x.std()
    expected = 4 / (3 * 2) * np.sum(((x - mu) / sd) ** 3)
    assert stats.skewness(x) == pytest.approx(expected)


def test_population_excess_kurtosis():
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    m4 = np.mean((x - x.mean()) ** 4)
    expected = m4 / x.var() ** 2 - 3
    assert stats.population_excess_kurtosis(x) == pytest.approx(expected)
    with pytest.raises(ValueError):
        stats.population_excess_kurtosis([1, 1, 1, 1])


def test_sample_kurtosis_g2():
    x = np.array([2.0, 4.0, 6.0, 8.0, 10.0, 1.0])
    n = x.size
    mu, pop_sd = x.mean(), x.std()
    m4_pop = np.sum(((x - mu) / pop_sd) ** 4)
    m4_s = m4_pop * ((n - 1) / n) ** 2
    expected = (n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))) * m4_s - 3 * (n - 1) ** 2 / (
        (n - 2) * (n - 3)
    )
    assert stats.sample_kurtosis_g2(x) == pytest.approx(expected)


class TestLinalg:
    def test_solve_square(self):
        from signalsharp_ray.kernels.linalg import solve_linear_system

        a = np.array([[2.0, 1.0], [1.0, 3.0]])
        b = np.array([3.0, 5.0])
        np.testing.assert_allclose(a @ solve_linear_system(a, b), b)

    def test_solve_overdetermined_least_squares(self):
        from signalsharp_ray.kernels.linalg import solve_linear_system

        x = np.arange(5.0)
        a = np.column_stack([np.ones(5), x])
        b = 2.0 + 3.0 * x
        np.testing.assert_allclose(solve_linear_system(a, b), [2.0, 3.0], atol=1e-12)

    def test_try_solve_singular_returns_none(self):
        from signalsharp_ray.kernels.linalg import try_solve_linear_system

        a = np.array([[1.0, 2.0], [2.0, 4.0]])
        assert try_solve_linear_system(a, np.array([1.0, 2.0])) is None

    def test_fit_and_evaluate_polynomial(self):
        from signalsharp_ray.kernels.linalg import evaluate_polynomial, fit_polynomial

        x = np.arange(6.0)
        y = 1.0 - 2.0 * x + 0.5 * x ** 2
        c = fit_polynomial(x, y, 2)
        np.testing.assert_allclose(c, [1.0, -2.0, 0.5], atol=1e-9)
        assert evaluate_polynomial(c, 10.0) == pytest.approx(1 - 20 + 50)

    def test_fit_polynomial_validation(self):
        from signalsharp_ray.kernels.linalg import fit_polynomial

        with pytest.raises(ValueError):
            fit_polynomial([1, 2], [1, 2, 3], 1)
        with pytest.raises(ValueError):
            fit_polynomial([1.0, 2.0], [1.0, 2.0], 2)


class TestReferenceEdgeFixtures:
    """Edge-case fixtures ported from
    /root/reference/SignalSharp.Tests/Utilities/StatisticalFunctionsTests.cs
    (83 cases; the double-path edge semantics re-expressed)."""

    def test_mean_empty_returns_zero(self):
        # Mean_Double_EmptySpan_ShouldReturnZero (reference quirk)
        assert stats.mean(np.array([])) == 0.0

    def test_mean_single_value(self):
        assert stats.mean(np.array([42.5])) == 42.5

    def test_mean_mixed_signs(self):
        assert abs(stats.mean(np.array([-2.0, -1.0, 1.0, 2.0]))) < 1e-9

    def test_mean_non_vector_aligned_size(self):
        # 7 elements (not a SIMD multiple in the reference's double path)
        v = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
        assert abs(stats.mean(v) - 4.0) < 1e-9

    def test_variance_empty_and_single_return_zero(self):
        assert stats.variance(np.array([])) == 0.0
        assert stats.variance(np.array([5.0])) == 0.0

    def test_variance_identical_values_zero(self):
        assert stats.variance(np.full(9, 3.25)) == 0.0

    def test_std_empty_single_identical_zero(self):
        assert stats.standard_deviation(np.array([])) == 0.0
        assert stats.standard_deviation(np.array([2.0])) == 0.0
        assert stats.standard_deviation(np.full(5, 7.0)) == 0.0

    def test_std_near_zero_variance(self):
        # StandardDeviation_HandlesNearZeroVariance
        v = np.array([1.0, 1.0 + 1e-12, 1.0 - 1e-12])
        assert stats.standard_deviation(v) >= 0.0

    def test_median_empty_raises(self):
        with pytest.raises(ValueError):
            stats.median(np.array([]))

    def test_median_single_and_duplicates(self):
        assert stats.median(np.array([3.5])) == 3.5
        assert stats.median(np.array([1.0, 2.0, 2.0, 2.0, 5.0])) == 2.0

    def test_normalize_empty_returns_empty(self):
        # the reference test asserts Is.Empty (returns, does not throw)
        assert stats.normalize(np.array([])).size == 0

    def test_normalize_single_value_zero(self):
        np.testing.assert_array_equal(stats.normalize(np.array([5.0])), [0.0])

    def test_normalize_identical_values_zeros(self):
        np.testing.assert_array_equal(stats.normalize(np.full(4, 2.5)), np.zeros(4))

    def test_normalize_mixed_signs(self):
        out = stats.normalize(np.array([-2.0, 0.0, 2.0]))
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0], atol=1e-9)

    def test_zscore_empty_returns_empty(self):
        assert stats.zscore(np.array([])).size == 0

    def test_zscore_single_and_identical_zeros(self):
        np.testing.assert_array_equal(stats.zscore(np.array([4.0])), [0.0])
        np.testing.assert_array_equal(stats.zscore(np.full(6, 1.5)), np.zeros(6))

    def test_skewness_identical_zero_and_short_raises(self):
        assert stats.skewness(np.full(5, 2.0)) == 0.0
        with pytest.raises(ValueError):
            stats.skewness(np.array([1.0, 2.0]))

    def test_skewness_signs(self):
        right = np.array([1.0, 1.0, 1.0, 1.0, 10.0])
        left = np.array([10.0, 10.0, 10.0, 10.0, 1.0])
        assert stats.skewness(right) > 0
        assert stats.skewness(left) < 0

    def test_population_kurtosis_edges(self):
        with pytest.raises(ValueError):
            stats.population_excess_kurtosis(np.array([1.0, 2.0, 3.0]))
        with pytest.raises(ValueError):
            stats.population_excess_kurtosis(np.full(6, 3.0))
        # uniform distribution -> negative excess kurtosis
        assert stats.population_excess_kurtosis(np.arange(1.0, 11.0)) < 0

    def test_sample_kurtosis_g2_edges(self):
        with pytest.raises(ValueError):
            stats.sample_kurtosis_g2(np.array([1.0, 2.0, 3.0]))
        with pytest.raises(ValueError):
            stats.sample_kurtosis_g2(np.full(6, 3.0))
        # large uniform sample -> G2 near the -1.2 uniform limit, above -1.3
        g2 = stats.sample_kurtosis_g2(np.arange(1.0, 101.0))
        assert -1.3 < g2 < -1.0


class TestLinalgReferenceEdges:
    """Edge fixtures from MatrixOperationsTests.cs (40 cases; the
    behaviors our numpy-backed surface must preserve)."""

    def test_inverse_roundtrip_and_product_identity(self):
        from signalsharp_ray.kernels import linalg

        a = np.array([[4.0, 7.0], [2.0, 6.0]])
        inv = linalg.invert(a)
        np.testing.assert_allclose(linalg.invert(inv), a, atol=1e-9)
        np.testing.assert_allclose(a @ inv, np.eye(2), atol=1e-9)

    def test_inverse_singular_raises(self):
        from signalsharp_ray.kernels import linalg

        with pytest.raises(np.linalg.LinAlgError):
            linalg.invert(np.array([[1.0, 2.0], [2.0, 4.0]]))

    def test_solve_underdetermined_raises(self):
        from signalsharp_ray.kernels import linalg

        with pytest.raises(ValueError):
            linalg.solve_linear_system(np.ones((1, 3)), np.array([1.0]))

    def test_try_solve_singular_returns_none(self):
        from signalsharp_ray.kernels import linalg

        a = np.array([[1.0, 2.0], [2.0, 4.0]])
        assert linalg.try_solve_linear_system(a, np.array([1.0, 3.0])) is None

    def test_try_solve_zero_variable_systems(self):
        from signalsharp_ray.kernels import linalg

        # no variables + zero rhs -> empty solution (success)
        sol = linalg.try_solve_linear_system(np.empty((0, 0)), np.empty(0))
        assert sol is not None and sol.size == 0
        sol = linalg.try_solve_linear_system(np.empty((2, 0)), np.zeros(2))
        assert sol is not None and sol.size == 0
        # no variables + nonzero rhs -> no solution
        assert (
            linalg.try_solve_linear_system(np.empty((2, 0)), np.array([1.0, 0.0]))
            is None
        )

    def test_combinations_values(self):
        from signalsharp_ray.kernels.linalg import combinations

        # Combinations_ValidInputs / SpecialCases / EdgeCases
        assert combinations(5, 2) == 10.0
        assert combinations(10, 5) == 252.0
        assert combinations(7, 0) == 1.0
        assert combinations(7, 7) == 1.0
        assert combinations(5, -1) == 0.0
        assert combinations(5, 6) == 0.0
        assert combinations(0, 0) == 1.0
        # symmetry
        assert combinations(20, 13) == combinations(20, 7)
        # Combinations_LargeValues_MaintainsAccuracy
        assert abs(combinations(50, 25) - 126410606437752.0) / 126410606437752.0 < 1e-12
