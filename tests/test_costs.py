"""Cost-function kernels vs reference golden values (FIXTURES.md §2.5,
SignalSharp.Tests/CostFunctions/)."""

import math

import numpy as np
import pytest

from signalsharp_ray.common.constants import VARIANCE_EPSILON
from signalsharp_ray.common.exceptions import SegmentLengthError, UninitializedDataError
from signalsharp_ray.kernels.costs import (
    ARCost,
    BernoulliLikelihoodCost,
    BinomialLikelihoodCost,
    GaussianLikelihoodCost,
    L1Cost,
    L2Cost,
    PoissonLikelihoodCost,
    RBFCost,
    make_cost,
)


class TestL2:
    def test_full_segment(self):
        assert L2Cost().fit([1, 2, 3]).compute_cost() == pytest.approx(2.0)

    def test_partials(self):
        c = L2Cost().fit([1, 1.5, 2, 2.5, 3])
        assert c.compute_cost() == pytest.approx(2.5)
        assert c.compute_cost(1, 4) == pytest.approx(0.5)
        assert c.compute_cost(1, 3) == pytest.approx(0.125)
        assert c.compute_cost(0, 4) == pytest.approx(1.25)

    def test_multidim_sums_over_dims(self):
        c = L2Cost().fit(np.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]]))
        assert c.compute_cost() == pytest.approx(4.0)

    def test_uninitialized(self):
        with pytest.raises(UninitializedDataError):
            L2Cost().compute_cost(0, 1)

    def test_vectorized_matches_scalar(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=50)
        c = L2Cost().fit(x)
        starts = np.arange(0, 40)
        vec = c.segment_costs(starts, 45)
        scalar = np.array([c.compute_cost(int(s), 45) for s in starts])
        np.testing.assert_allclose(vec, scalar)


class TestL1:
    def test_abs_dev_from_median(self):
        c = L1Cost().fit([1, 2, 3, 10])
        # median = 2.5 -> |1-2.5|+|2-2.5|+|3-2.5|+|10-2.5| = 1.5+.5+.5+7.5
        assert c.compute_cost() == pytest.approx(10.0)

    def test_single_point_zero(self):
        assert L1Cost().fit([5.0]).compute_cost(0, 1) == 0.0


class TestRBF:
    def test_detects_segment_structure(self):
        c = RBFCost().fit([1, 1, 1, 5, 5, 5])
        # a homogeneous half costs less than the mixed whole (per point)
        within = c.compute_cost(0, 3) + c.compute_cost(3, 6)
        total = c.compute_cost(0, 6)
        assert within < total

    def test_explicit_gamma_formula(self):
        x = np.array([0.0, 1.0])
        c = RBFCost(gamma=1.0).fit(x)
        # K = [[1, e^-1], [e^-1, 1]]; cost(0,2) = 2 - sum(K)/2
        expected = 2 - (2 + 2 * math.exp(-1)) / 2
        assert c.compute_cost(0, 2) == pytest.approx(expected)

    def test_gamma_median_heuristic(self):
        x = np.array([0.0, 1.0, 3.0])
        c = RBFCost().fit(x)
        # pairwise squared distances upper triangle: 1, 9, 4 -> median 4
        assert c.gamma_ == pytest.approx(0.25)

    def test_clamp_lower_bound(self):
        # tiny distances: karg clamped UP to 1e-2 (not to exp(0)=1)
        c = RBFCost(gamma=1.0).fit([0.0, 1e-6])
        expected = 2 - (2 + 2 * math.exp(-1e-2)) / 2
        assert c.compute_cost(0, 2) == pytest.approx(expected)


class TestGaussian:
    def test_constant_segment_variance_clamp(self):
        c = GaussianLikelihoodCost().fit([1, 1, 1, 5, 5, 5])
        expected = 3 * math.log(VARIANCE_EPSILON)
        assert c.compute_cost(0, 3) == pytest.approx(expected)
        assert c.compute_cost(3, 6) == pytest.approx(expected)

    def test_mixed_segment(self):
        c = GaussianLikelihoodCost().fit([1, 1, 1, 5, 5, 5])
        assert c.compute_cost(0, 6) == pytest.approx(6 * math.log(4.0))

    def test_split_cheaper_than_total(self):
        c = GaussianLikelihoodCost().fit([1, 1, 1, 5, 5, 5])
        assert c.compute_cost(0, 3) + c.compute_cost(3, 6) < c.compute_cost(0, 6)

    def test_low_high_variance(self):
        c = GaussianLikelihoodCost().fit([1.0, 1.1, 0.9])
        assert c.compute_cost(0, 3) == pytest.approx(3 * math.log(0.02 / 3))
        c2 = GaussianLikelihoodCost().fit([1.0, 3.0, 5.0])
        assert c2.compute_cost(0, 3) == pytest.approx(3 * math.log(8 / 3))

    def test_param_count(self):
        c = GaussianLikelihoodCost().fit([[1.0, 2.0], [3.0, 4.0]])
        assert c.segment_parameter_count(2) == 4


class TestPoisson:
    def test_constant_rate(self):
        c = PoissonLikelihoodCost().fit([5, 5, 5])
        # 2*(S - S ln S + S ln n) with S=15, n=3 = 30*(1 - ln 5)
        assert c.compute_cost(0, 3) == pytest.approx(30 * (1 - math.log(5)))

    def test_zero_sum_segments(self):
        c = PoissonLikelihoodCost().fit([0, 5, 0])
        assert c.compute_cost(0, 1) == 0.0
        assert c.compute_cost(1, 2) == pytest.approx(10 * (1 - math.log(5)))

    def test_negative_input_rejected(self):
        with pytest.raises(ValueError):
            PoissonLikelihoodCost().fit([1, -2, 3])

    def test_param_count(self):
        assert PoissonLikelihoodCost().fit([1, 2]).segment_parameter_count(2) == 1


class TestBernoulli:
    def test_homogeneous_zero(self):
        c = BernoulliLikelihoodCost().fit([1, 1, 1, 0, 0, 0])
        assert c.compute_cost(0, 3) == 0.0
        assert c.compute_cost(3, 6) == 0.0

    def test_mixed_formula(self):
        c = BernoulliLikelihoodCost().fit([1, 1, 1, 0, 0, 0])
        n, s = 6, 3
        expected = -2 * (
            s * math.log(s) + (n - s) * math.log(n - s) - n * math.log(n)
        )
        assert c.compute_cost(0, 6) == pytest.approx(expected)

    def test_tolerant_clamping(self):
        c = BernoulliLikelihoodCost().fit([1.0, 0.9999999999, 0.0000000001, 0.0])
        assert c.compute_cost(0, 2) == 0.0

    def test_non_binary_rejected(self):
        with pytest.raises(ValueError):
            BernoulliLikelihoodCost().fit([0.5, 1.0])


class TestBinomial:
    def test_requires_two_rows(self):
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit([1, 2, 3])

    def test_formula(self):
        data = np.array([[5.0, 8.0], [20.0, 15.0]])
        c = BinomialLikelihoodCost().fit(data)
        K, N = 13.0, 35.0
        expected = -(
            K * math.log(K) + (N - K) * math.log(N - K) - N * math.log(N)
        )
        assert c.compute_cost(0, 2) == pytest.approx(expected)

    def test_edge_cases_zero(self):
        data = np.array([[0.0, 10.0], [10.0, 10.0]])
        c = BinomialLikelihoodCost().fit(data)
        assert c.compute_cost(0, 1) == 0.0  # K=0
        assert c.compute_cost(1, 2) == 0.0  # K=N

    def test_invalid_k_gt_n(self):
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[5.0], [3.0]]))

    def test_fit_validation_matches_reference(self):
        # BinomialLikelihoodCostFunctionTests.cs:Fit_InvalidData_* —
        # negative k, n < 1, non-integer values, NaN/inf, 1-D input
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[-1.0], [5.0]]))
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[0.0], [0.0]]))
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[1.5], [5.0]]))
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[np.nan], [5.0]]))
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit(np.array([[1.0], [np.inf]]))
        with pytest.raises(ValueError):
            BinomialLikelihoodCost().fit([1, 2, 3])  # 1-D rejected

    def test_single_point_and_subset_segments(self):
        # ComputeCost_SinglePointSegment / SubsetSegment_ValidData
        data = np.array([[2.0, 5.0, 1.0], [4.0, 10.0, 8.0]])
        c = BinomialLikelihoodCost().fit(data)
        k, n = 2.0, 4.0
        exp = -(k * math.log(k) + (n - k) * math.log(n - k) - n * math.log(n))
        assert c.compute_cost(0, 1) == pytest.approx(exp)
        k, n = 7.0, 14.0  # points 0..1
        exp = -(k * math.log(k) + (n - k) * math.log(n - k) - n * math.log(n))
        assert c.compute_cost(0, 2) == pytest.approx(exp)


class TestAR:
    def test_perfect_ar1_zero_rss(self):
        # x[t] = 0.5 x[t-1] exactly -> RSS ~ 0
        x = [16.0, 8.0, 4.0, 2.0, 1.0, 0.5]
        c = ARCost(order=1, include_intercept=False).fit(x)
        assert c.compute_cost(0, 6) == pytest.approx(0.0, abs=1e-18)

    def test_constant_with_intercept_inf(self):
        c = ARCost(order=1, include_intercept=True).fit([3.0] * 8)
        assert math.isinf(c.compute_cost(0, 8))

    def test_min_length_enforced(self):
        c = ARCost(order=2, include_intercept=True).fit(np.arange(10.0))
        with pytest.raises(SegmentLengthError):
            c.compute_cost(0, 4)  # needs max(3, 5) = 5

    def test_likelihood_metric(self):
        rng = np.random.default_rng(7)
        x = np.cumsum(rng.normal(size=40))
        c = ARCost(order=1).fit(x)
        m = c.compute_likelihood_metric(0, 40)
        assert math.isfinite(m)
        assert c.segment_parameter_count(10) == 3  # p + variance + intercept

    def test_multivariate_rejected(self):
        with pytest.raises(ValueError):
            ARCost(order=1).fit(np.ones((2, 10)))


def test_registry():
    assert isinstance(make_cost("l2"), L2Cost)
    assert isinstance(make_cost("ar", order=2), ARCost)
    with pytest.raises(ValueError):
        make_cost("nope")


# Cross-cost edge behaviors shared by every reference cost-function test
# fixture file (SignalSharp.Tests/CostFunctions/*Tests.cs): uninitialized
# access, invalid indices, zero-length segments, single-point segments,
# and the changepoint-detection property.

_UNIVARIATE_COSTS = [
    ("l2", lambda: L2Cost(), np.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0])),
    ("l1", lambda: L1Cost(), np.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0])),
    ("rbf", lambda: RBFCost(), np.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0])),
    ("gaussian", lambda: GaussianLikelihoodCost(), np.array([1.0, 1.1, 0.9, 5.0, 5.2, 4.8])),
    ("poisson", lambda: PoissonLikelihoodCost(), np.array([1.0, 2.0, 1.0, 9.0, 10.0, 11.0])),
    ("bernoulli", lambda: BernoulliLikelihoodCost(), np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])),
]


@pytest.mark.parametrize("name,mk,sig", _UNIVARIATE_COSTS)
class TestCrossCostEdges:
    def test_compute_before_fit_raises(self, name, mk, sig):
        # ComputeCost_BeforeFit_ThrowsUninitializedDataException
        with pytest.raises(UninitializedDataError):
            mk().compute_cost(0, 1)

    def test_invalid_indices_raise(self, name, mk, sig):
        # ComputeCost_InvalidIndices_ThrowsArgumentOutOfRangeException
        c = mk().fit(sig)
        with pytest.raises(IndexError):
            c.compute_cost(-1, 3)
        with pytest.raises(IndexError):
            c.compute_cost(0, sig.size + 1)
        with pytest.raises(IndexError):
            c.compute_cost(4, 2)

    def test_zero_length_segment_raises(self, name, mk, sig):
        # ComputeCost_InvalidSegmentLength_ThrowsSegmentLengthException
        c = mk().fit(sig)
        with pytest.raises(SegmentLengthError):
            c.compute_cost(2, 2)

    def test_single_point_segment_finite(self, name, mk, sig):
        c = mk().fit(sig)
        v = c.compute_cost(0, 1)
        assert math.isfinite(v) or v == math.inf  # never NaN
        assert not math.isnan(v)

    def test_changepoint_detection_property(self, name, mk, sig):
        # ComputeCost_ChangePointDetection: splitting at the true change
        # is cheaper than the unsplit segment
        c = mk().fit(sig)
        total = c.compute_cost(0, sig.size)
        split = c.compute_cost(0, 3) + c.compute_cost(3, sig.size)
        assert split <= total + 1e-9

    def test_full_signal_default_bounds(self, name, mk, sig):
        c = mk().fit(sig)
        assert c.compute_cost() == pytest.approx(c.compute_cost(0, sig.size))


class TestCostToleranceEdges:
    def test_poisson_near_zero_negative_inside_tolerance(self):
        # Fit_NearZeroNegativeValues_InsideTolerance_Success (clamped to 0)
        c = PoissonLikelihoodCost().fit(np.array([0.0, -1e-10, 1.0, 2.0]))
        assert c.compute_cost(0, 2) == 0.0  # both effectively zero

    def test_poisson_all_zeros_cost_zero(self):
        c = PoissonLikelihoodCost().fit(np.zeros(5))
        assert c.compute_cost(0, 5) == 0.0

    def test_bernoulli_near_zero_one_inside_tolerance(self):
        # Fit_NearZeroOneValues_Success (clamped to exact {0,1})
        c = BernoulliLikelihoodCost().fit(np.array([1e-10, 1.0 - 1e-10, 1.0, 0.0]))
        assert math.isfinite(c.compute_cost(0, 4))

    def test_bernoulli_single_point_zero(self):
        # ComputeCost_SinglePointSegment_ReturnsZero
        c = BernoulliLikelihoodCost().fit(np.array([0.0, 1.0, 1.0]))
        assert c.compute_cost(0, 1) == 0.0
        assert c.compute_cost(1, 2) == 0.0

    def test_poisson_constant_nonzero_golden(self):
        # ComputeCost_FullSegment_ConstantNonZero: S=3*2=6, n=3 ->
        # 2*(6 - 6 ln 6 + 6 ln 3) = 12 - 12 ln 2
        c = PoissonLikelihoodCost().fit(np.array([2.0, 2.0, 2.0]))
        assert c.compute_cost(0, 3) == pytest.approx(12.0 - 12.0 * math.log(2.0), abs=1e-9)

    def test_multidimensional_costs_sum_over_dims(self):
        sig = np.array([[1.0, 1.0, 5.0, 5.0], [2.0, 2.0, 6.0, 6.0]])
        for mk in (L2Cost, GaussianLikelihoodCost, PoissonLikelihoodCost):
            c2 = mk().fit(sig)
            a = mk().fit(sig[0])
            b = mk().fit(sig[1])
            assert c2.compute_cost(0, 4) == pytest.approx(
                a.compute_cost(0, 4) + b.compute_cost(0, 4), abs=1e-9
            )


@pytest.mark.parametrize("name,mk,sig", _UNIVARIATE_COSTS)
def test_empty_fit_behavior_matches_reference(name, mk, sig):
    # Fit on empty data succeeds everywhere (Fit_EmptyData_Success); on
    # ComputeCost the reference returns 0 (L1CostFunction.cs:93-94 explicit
    # early-out; Gaussian/Poisson/Bernoulli tests assert 0) EXCEPT RBF,
    # whose ComputeCost validates segment length first and throws
    c = mk()
    c.fit(np.array([]))
    if name == "rbf":
        with pytest.raises(SegmentLengthError):
            c.compute_cost()
    else:
        assert c.compute_cost() == 0.0
