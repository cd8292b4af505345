"""PELT vs reference golden values (FIXTURES.md §2.1,
SignalSharp.Tests/Detection/PELTTests.cs)."""

import numpy as np
import pytest

from signalsharp_ray.kernels.pelt import PELT, PELTOptions, pelt_breakpoints


SIMPLE = [1, 1, 1, 5, 5, 5, 1, 1, 1]


def test_l2_simple():
    opts = PELTOptions(cost_function="l2", min_size=1, jump=1)
    np.testing.assert_array_equal(PELT(opts).fit_and_detect(SIMPLE, 2.0), [3, 6])


def test_l2_trend_no_changepoints():
    np.testing.assert_array_equal(pelt_breakpoints([1, 2, 3, 4, 5], 10.0), [])


def test_rbf_simple():
    np.testing.assert_array_equal(
        pelt_breakpoints(SIMPLE, 0.1, cost="rbf", min_size=1, jump=1), [3, 6]
    )


def test_rbf_long_exact_no_changepoints():
    pattern = [1, 1, 1, 5, 5, 5, 1, 1, 1, 2, 2, 3, 4, 2, 1]
    signal = np.tile(pattern, 100)  # N = 1500
    assert signal.size == 1500
    out = pelt_breakpoints(signal, 10.0, cost="rbf", min_size=1, jump=1)
    np.testing.assert_array_equal(out, [])


def test_rbf_long_jump5_approximate():
    pattern = [1, 1, 1, 5, 5, 5, 1, 1, 1, 2, 2, 3, 4, 2, 1]
    signal = np.tile(pattern, 100)
    out = pelt_breakpoints(signal, 10.0, cost="rbf", min_size=2, jump=5)
    np.testing.assert_array_equal(out, [1496, 1498])


def test_multidim():
    sig = np.array([[1.0, 1, 1, 10, 10, 10], [5.0, 5, 5, 20, 20, 20]])
    out = pelt_breakpoints(sig, 2.0, cost="l2", min_size=1)
    np.testing.assert_array_equal(out, [3])


def test_short_signal_no_changepoints():
    assert pelt_breakpoints([1.0], 1.0).size == 0
    opts = PELTOptions(min_size=3)
    assert PELT(opts).fit_and_detect([1.0, 5.0, 1.0, 5.0, 9.0], 0.1).size == 0


def test_negative_penalty_rejected():
    with pytest.raises(ValueError):
        pelt_breakpoints(SIMPLE, -1.0)


def test_gaussian_cost_detects_variance_change():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.1, 60)
    b = rng.normal(0, 3.0, 60)
    out = pelt_breakpoints(np.concatenate([a, b]), 10.0, cost="gaussian", min_size=2)
    assert any(abs(int(b_) - 60) <= 2 for b_ in out)


def test_jump_matches_exact_on_simple():
    # jump>1 is approximate, but on this easy signal it finds the same answer
    out = pelt_breakpoints(SIMPLE, 2.0, cost="l2", min_size=1, jump=2)
    assert list(out) in ([3, 6], [4, 6], [2, 6])  # approximation tolerance


def test_detect_without_fit_raises():
    # PELTTests.cs:26-33
    from signalsharp_ray.common.exceptions import UninitializedDataError

    with pytest.raises(UninitializedDataError):
        PELT(PELTOptions()).detect(2.0)


def test_matrix_input_simple():
    # PELTTests.cs:35-55 — 2-D single-row matrix behaves as the 1-D signal
    sig = np.array([[1.0, 1, 1, 5, 5, 5, 1, 1, 1]])
    opts = PELTOptions(cost_function="l2", min_size=1, jump=1)
    np.testing.assert_array_equal(PELT(opts).fit_and_detect(sig, 2.0), [3, 6])


def test_docstring_multivariate_example():
    # PELTAlgorithm.cs:183-187 doc example: { {1,1,10,10}, {5,5,20,20} } -> [2]
    sig = np.array([[1.0, 1, 10, 10], [5.0, 5, 20, 20]])
    out = pelt_breakpoints(sig, 8.0, cost="l2", min_size=1)
    np.testing.assert_array_equal(out, [2])


def test_small_l2_fast_path_identical_to_vectorized():
    """The scalar-float DP fast path (PELT._segment_small_l2) must produce
    bitwise-identical breakpoints to the vectorized path on every config —
    the measured 13-39x speedup on short series is only admissible if the
    output is EXACTLY equal."""
    from signalsharp_ray.kernels import pelt as pelt_mod

    rng = np.random.default_rng(0)
    try:
        for trial in range(200):
            n = int(rng.integers(2, 120))
            kind = trial % 3
            if kind == 0:
                x = rng.normal(50, 10, n)
            elif kind == 1:
                x = np.repeat([0.0, 100.0], [n // 2, n - n // 2])
                x = x + rng.normal(0, 1, n)
            else:
                x = np.zeros(n)
            pen = [0.5, 5.0, 50.0][trial % 3]
            ms = [1, 2, 5][(trial // 3) % 3]
            if n < 2 * ms:
                continue
            pelt_mod._SMALL_N_FAST_PATH = 256
            fast = PELT(PELTOptions(min_size=ms)).fit_and_detect(x, pen)
            pelt_mod._SMALL_N_FAST_PATH = 0
            slow = PELT(PELTOptions(min_size=ms)).fit_and_detect(x, pen)
            np.testing.assert_array_equal(fast, slow, err_msg=f"{n} {pen} {ms}")
    finally:
        pelt_mod._SMALL_N_FAST_PATH = 256
