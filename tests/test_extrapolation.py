"""Extrapolation kernels vs reference golden values (FIXTURES.md §2.6,
SignalSharp.Tests/Extrapolation/)."""

import numpy as np
import pytest

from signalsharp_ray.kernels.extrapolation import (
    HoltOptions,
    holt_forecast,
    linear_forecast,
    ses_forecast,
)
from signalsharp_ray.kernels.kalman import KalmanOptions, kalman_filter


class TestLinear:
    def test_simple_trend(self):
        np.testing.assert_allclose(linear_forecast([1, 3, 5, 7], 2), [9, 11])

    def test_window(self):
        # window [3,5,7] -> slope 2, anchored at 7
        np.testing.assert_allclose(
            linear_forecast([1, 3, 100, 3, 5, 7], 2, window_size=3), [9, 11]
        )

    def test_constant_zero_slope(self):
        np.testing.assert_allclose(linear_forecast([5, 5, 5, 5], 2), [5, 5])

    def test_anchor_quirk(self):
        # noisy data where the fitted line at n-1 != last value: forecast is
        # anchored at the LAST VALUE, not the fitted line
        x = [0.0, 2.0, 1.0, 3.0]
        out = linear_forecast(x, 1)
        xs = np.arange(4.0)
        slope = np.polyfit(xs, x, 1)[0]
        assert out[0] == pytest.approx(3.0 + slope)

    def test_too_short(self):
        with pytest.raises(ValueError):
            linear_forecast([1.0], 1)


class TestSES:
    def test_single_point_no_init(self):
        np.testing.assert_allclose(ses_forecast([10.0], 1, alpha=0.5), [10.0])

    def test_single_point_with_init(self):
        np.testing.assert_allclose(
            ses_forecast([10.0], 1, alpha=0.5, initial_level=5.0), [7.5]
        )

    def test_flat_forecast_golden(self):
        # alpha=.2, [10,12,15]: loop includes x[0] (equal to init level)
        out = ses_forecast([10, 12, 15], 3, alpha=0.2)
        np.testing.assert_allclose(out, [11.32] * 3)

    def test_with_initial_level_golden(self):
        out = ses_forecast([10, 12, 15], 2, alpha=0.2, initial_level=8.0)
        np.testing.assert_allclose(out, [10.296] * 2)

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            ses_forecast([], 1, alpha=0.5)


class TestHolt:
    def test_additive_golden(self):
        out = holt_forecast([1, 2, 3, 4], 3, HoltOptions(alpha=0.5, beta=0.5))
        np.testing.assert_allclose(out, [4.64453125, 5.46875, 6.29296875])

    def test_requires_two_points(self):
        with pytest.raises(ValueError):
            holt_forecast([1.0], 1, HoltOptions(alpha=0.5, beta=0.5))

    def test_multiplicative_requires_positive(self):
        with pytest.raises(ValueError):
            holt_forecast(
                [1.0, -2.0, 3.0],
                1,
                HoltOptions(alpha=0.5, beta=0.5, trend_type="multiplicative"),
            )

    def test_multiplicative_runs(self):
        out = holt_forecast(
            [2.0, 4.0, 8.0, 16.0],
            2,
            HoltOptions(alpha=0.5, beta=0.5, trend_type="multiplicative"),
        )
        assert np.all(out > 16.0)  # growing trend continues

    def test_damped_below_undamped(self):
        undamped = holt_forecast([1, 2, 3, 4], 5, HoltOptions(alpha=0.5, beta=0.5))
        damped = holt_forecast(
            [1, 2, 3, 4],
            5,
            HoltOptions(alpha=0.5, beta=0.5, damp_trend=True, phi=0.8),
        )
        assert damped[-1] < undamped[-1]

    def test_grid_search_auto_params(self):
        x = np.arange(1.0, 21.0)  # perfect linear trend
        out = holt_forecast(x, 2, HoltOptions())  # alpha/beta optimized
        np.testing.assert_allclose(out, [21.0, 22.0], atol=0.2)

    def test_phi_validation(self):
        with pytest.raises(ValueError):
            HoltOptions(alpha=0.5, beta=0.5, damp_trend=True, phi=1.5)


class TestKalman:
    def test_constant_signal_converges(self):
        out = kalman_filter([5.0] * 50)
        np.testing.assert_allclose(out, 5.0)

    def test_hand_computed_two_steps(self):
        opts = KalmanOptions(
            process_variance=0.0,
            measurement_variance=1.0,
            initial_estimate=0.0,
            initial_error=1.0,
        )
        out = kalman_filter([1.0, 1.0], opts)
        # step 1: p_pred=1, k=1/2, x=0.5, p=0.5
        # step 2: p_pred=0.5, k=1/3, x=0.5+ (0.5)/3 = 2/3, p=1/3
        np.testing.assert_allclose(out, [0.5, 2.0 / 3.0])

    def test_smooths_noise(self):
        rng = np.random.default_rng(5)
        x = np.sin(np.linspace(0, 4, 200)) + rng.normal(0, 0.3, 200)
        out = kalman_filter(x, KalmanOptions(process_variance=1e-3, measurement_variance=0.09))
        assert np.var(np.diff(out)) < np.var(np.diff(x))


class TestHoltReferenceGoldens:
    def test_additive_damped_golden(self):
        # HoltMethodExtrapolatorTests.cs:326-343
        out = holt_forecast(
            [11.5, 12.0, 12.8, 13.5],
            2,
            HoltOptions(
                alpha=0.2, beta=0.3, damp_trend=True, phi=0.9,
                initial_level=10.0, initial_trend=1.0,
            ),
        )
        np.testing.assert_allclose(out, [14.0385570389, 14.6087640486], atol=1e-9)

    def test_multiplicative_golden(self):
        # HoltMethodExtrapolatorTests.cs:345-362
        out = holt_forecast(
            [10.0, 12.0, 15.0, 18.0],
            2,
            HoltOptions(alpha=0.4, beta=0.6, trend_type="multiplicative"),
        )
        np.testing.assert_allclose(out, [20.1240675210, 23.5419248994], atol=1e-9)


class TestHoltReferenceGoldens:
    """Hand-computed reference fixtures from HoltMethodExtrapolatorTests.cs
    exercising explicit initial level/trend + damping + multiplicative."""

    def test_damped_with_explicit_initials_golden(self):
        # :186-211 — alpha=.2 beta=.3 phi=.9, L0=10 T0=1 on [11.5,12,12.8,13.5]
        fc = holt_forecast(
            [11.5, 12.0, 12.8, 13.5],
            1,
            HoltOptions(
                alpha=0.2, beta=0.3, damp_trend=True, phi=0.9,
                initial_level=10.0, initial_trend=1.0,
            ),
        )
        assert fc[0] == pytest.approx(14.0385570389, abs=1e-9)

    def test_multiplicative_golden_explicit(self):
        # :214-225 — alpha=.4 beta=.6 multiplicative on [10,12,15,18]
        fc = holt_forecast(
            [10.0, 12.0, 15.0, 18.0],
            1,
            HoltOptions(alpha=0.4, beta=0.6, trend_type="multiplicative"),
        )
        assert fc[0] == pytest.approx(20.1240675210, abs=1e-9)

    def test_auto_optimization_damped_finds_finite_forecast(self):
        # :228-240 — null alpha/beta/phi grid search on a noisy linear trend
        fc = holt_forecast(
            [1.0, 1.9, 3.1, 4.0, 5.2, 5.8, 7.1, 8.0],
            1,
            HoltOptions(damp_trend=True, optimization_grid_steps=5),
        )
        assert np.isfinite(fc[0])

    def test_multiplicative_zero_in_signal_raises_before_optimization(self):
        # :242+ — positivity validated before the (expensive) grid search
        with pytest.raises(ValueError):
            holt_forecast(
                [10.0, 0.0, 15.0],
                1,
                HoltOptions(trend_type="multiplicative", damp_trend=True),
            )

    def test_invalid_alpha_beta_phi_option_validation(self):
        for kwargs in (
            {"alpha": -0.1}, {"alpha": 1.1}, {"beta": -0.1}, {"beta": 1.1},
            {"damp_trend": True, "phi": 0.0}, {"damp_trend": True, "phi": 1.0},
            {"optimization_grid_steps": 0},
        ):
            with pytest.raises(ValueError):
                HoltOptions(**kwargs)

    def test_phi_without_damping_not_validated(self):
        # Constructor_PhiProvided_DampTrendFalse_* — phi ignored, no throw
        HoltOptions(phi=5.0, damp_trend=False)
        HoltOptions(phi=1.0, damp_trend=False)


class TestLinearReferenceEdges:
    def test_window_larger_than_signal_uses_signal_length(self):
        # Fit_WindowSizeLargerThanSignal_UsesSignalLength
        sig = [1.0, 3.0, 5.0, 7.0]
        np.testing.assert_allclose(
            linear_forecast(sig, 2, window_size=100),
            linear_forecast(sig, 2),
            atol=1e-12,
        )

    def test_two_point_signal(self):
        # Fit_ValidSignal_TwoPoints_CalculatesCorrectly: slope 2, anchor 3
        np.testing.assert_allclose(linear_forecast([1.0, 3.0], 2), [5.0, 7.0], atol=1e-9)

    def test_negative_slope(self):
        np.testing.assert_allclose(
            linear_forecast([7.0, 5.0, 3.0, 1.0], 2), [-1.0, -3.0], atol=1e-9
        )

    def test_invalid_horizon_and_window(self):
        with pytest.raises(ValueError):
            linear_forecast([1.0, 2.0], 0)
        with pytest.raises(ValueError):
            linear_forecast([1.0, 2.0], 1, window_size=1)


class TestSESReferenceEdges:
    """Alpha boundary semantics from
    SimpleExponentialSmoothingExtrapolatorTests.cs."""

    def test_alpha_zero_no_init_keeps_first_value(self):
        np.testing.assert_allclose(
            ses_forecast([7.0, 100.0, -3.0], 2, alpha=0.0), [7.0, 7.0], atol=0
        )

    def test_alpha_zero_with_init_keeps_initial_level(self):
        np.testing.assert_allclose(
            ses_forecast([7.0, 100.0], 1, alpha=0.0, initial_level=42.0), [42.0], atol=0
        )

    def test_alpha_one_becomes_last_value(self):
        np.testing.assert_allclose(
            ses_forecast([7.0, 100.0, -3.0], 3, alpha=1.0), [-3.0] * 3, atol=0
        )
        np.testing.assert_allclose(
            ses_forecast([7.0, 100.0, -3.0], 1, alpha=1.0, initial_level=5.0),
            [-3.0],
            atol=0,
        )

    def test_single_point_levels(self):
        # no init: level = x0 smoothed into itself = x0
        np.testing.assert_allclose(ses_forecast([9.0], 1, alpha=0.4), [9.0], atol=0)
        # with init: level = a*x0 + (1-a)*init
        np.testing.assert_allclose(
            ses_forecast([10.0], 1, alpha=0.4, initial_level=5.0),
            [0.4 * 10.0 + 0.6 * 5.0],
            atol=1e-12,
        )

    def test_invalid_horizon_and_alpha(self):
        with pytest.raises(ValueError):
            ses_forecast([1.0, 2.0], 0, alpha=0.3)
        with pytest.raises(ValueError):
            ses_forecast([1.0, 2.0], 1, alpha=1.5)
        with pytest.raises(ValueError):
            ses_forecast([], 1, alpha=0.3)


class TestHoltMultiplicativeInitialValidation:
    """Ported from HoltMethodExtrapolatorTests.cs: Fit_MultiplicativeTrend_
    InitialLevelFromOptions / InitialTrendFromOptions / EstimatedInitialTrend
    _NonPositive_ThrowsArgumentException."""

    def test_initial_level_from_options_non_positive_raises(self):
        import pytest
        from signalsharp_ray.kernels.extrapolation import HoltOptions, holt_forecast

        with pytest.raises(ValueError, match="[Ii]nitial level"):
            holt_forecast(
                [1.0, 2.0, 3.0], 1,
                HoltOptions(alpha=0.5, beta=0.5, trend_type="multiplicative",
                            initial_level=0.0),
            )

    def test_initial_trend_from_options_non_positive_raises(self):
        import pytest
        from signalsharp_ray.kernels.extrapolation import HoltOptions, holt_forecast

        with pytest.raises(ValueError, match="[Ii]nitial trend"):
            holt_forecast(
                [1.0, 2.0, 3.0], 1,
                HoltOptions(alpha=0.5, beta=0.5, trend_type="multiplicative",
                            initial_trend=-1.0),
            )

    def test_estimated_initial_trend_non_positive_raises(self):
        import pytest
        from signalsharp_ray.kernels.extrapolation import HoltOptions, holt_forecast

        # reference semantics: estimated trend = x[1] / initial_level; a
        # large provided level with tiny-but-positive x[1] drives the ratio
        # under epsilon (HoltMethodExtrapolatorTests.cs: initialLevel=1,
        # signal[1]=epsilon/2)
        with pytest.raises(ValueError, match="[Ee]stimated initial"):
            holt_forecast(
                [1.0, 1e-7, 3.0], 1,
                HoltOptions(alpha=0.5, beta=0.5, trend_type="multiplicative",
                            initial_level=1e6),
            )
