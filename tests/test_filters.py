"""Gaussian smoothing + Butterworth kernels (kernels/filters.py) —
reference-roadmap items (/root/reference/docs/docs/future-plans.md)."""

import numpy as np
import pytest

from signalsharp_ray.kernels.filters import (
    butterworth_coefficients,
    butterworth_lowpass,
    gaussian_kernel_weights,
    gaussian_smooth,
)


def test_gaussian_weights_normalized_symmetric():
    w = gaussian_kernel_weights(2.0)
    assert w.size == 13  # radius = ceil(3*sigma) = 6
    assert w.sum() == pytest.approx(1.0, abs=1e-12)
    np.testing.assert_allclose(w, w[::-1])
    assert np.argmax(w) == 6


def test_gaussian_smooth_preserves_linear_interior():
    # A Gaussian kernel has zero first-moment: linear trends pass through
    # exactly in the interior (away from the padded edges).
    x = np.arange(50, dtype=np.float64)
    sm = gaussian_smooth(x, sigma=1.5)
    r = (gaussian_kernel_weights(1.5).size - 1) // 2
    np.testing.assert_allclose(sm[r:-r], x[r:-r], atol=1e-9)


def test_gaussian_smooth_constant_and_edges():
    sm = gaussian_smooth(np.full(20, 7.0), sigma=2.0)
    np.testing.assert_allclose(sm, 7.0)  # nearest-pad keeps constants exact
    assert gaussian_smooth(np.array([]), sigma=1.0).size == 0
    np.testing.assert_allclose(gaussian_smooth(np.array([3.0]), sigma=1.0), [3.0])


def test_gaussian_smooth_reduces_noise_variance():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 2000)
    sm = gaussian_smooth(x, sigma=3.0)
    assert sm.var() < 0.25 * x.var()


def test_gaussian_validation():
    with pytest.raises(ValueError):
        gaussian_smooth(np.ones(5), sigma=0.0)
    with pytest.raises(ValueError):
        gaussian_smooth(np.ones((2, 2)), sigma=1.0)


def test_butterworth_dc_gain_unity():
    # sum(b) / (1 + sum(a)) == 1: a constant input converges to itself
    b0, b1, b2, a1, a2 = butterworth_coefficients(0.1)
    assert (b0 + b1 + b2) / (1.0 + a1 + a2) == pytest.approx(1.0, abs=1e-12)
    y = butterworth_lowpass(np.ones(400), cutoff=0.1)
    assert y[-1] == pytest.approx(1.0, abs=1e-9)


def test_butterworth_attenuates_high_passes_low():
    t = np.arange(600, dtype=np.float64)
    hi = np.sin(2 * np.pi * 0.4 * t)
    lo = np.sin(2 * np.pi * 0.02 * t)
    y_hi = butterworth_lowpass(hi, cutoff=0.05)
    y_lo = butterworth_lowpass(lo, cutoff=0.05)
    assert np.abs(y_hi[300:]).max() < 0.01
    assert np.abs(y_lo[300:]).max() > 0.95


def test_butterworth_zero_state_contract():
    # documented contract: x[i]=y[i]=0 for i<0 — first output is b0*x[0]
    b0, *_ = butterworth_coefficients(0.05)
    x = np.array([10.0, 0.0, 0.0])
    y = butterworth_lowpass(x, cutoff=0.05)
    assert y[0] == pytest.approx(b0 * 10.0, rel=1e-12)


def test_butterworth_validation():
    with pytest.raises(ValueError):
        butterworth_coefficients(0.0)
    with pytest.raises(ValueError):
        butterworth_coefficients(0.5)
    with pytest.raises(ValueError):
        butterworth_coefficients(0.1, order=4)
    with pytest.raises(ValueError):
        butterworth_lowpass(np.ones((3, 2)), cutoff=0.1)
