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
