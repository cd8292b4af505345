"""Binary segmentation kernel (kernels/binseg.py)."""

import numpy as np

from signalsharp_ray.kernels.binseg import binseg_breakpoints


def test_staircase_exact_recovery():
    idx = np.arange(200)
    vals = 100.0 * (idx // 40)
    np.testing.assert_array_equal(
        binseg_breakpoints(vals, penalty=5.0), [40, 80, 120, 160]
    )


def test_constant_and_short_series():
    assert binseg_breakpoints(np.full(100, 7.0), penalty=5.0).size == 0
    assert binseg_breakpoints(np.array([1.0]), penalty=5.0).size == 0
    assert binseg_breakpoints(np.array([]), penalty=5.0).size == 0


def test_single_step():
    x = np.r_[np.zeros(50), np.full(50, 10.0)]
    np.testing.assert_array_equal(binseg_breakpoints(x, penalty=5.0), [50])


def test_noisy_two_segment_near_truth():
    rng = np.random.default_rng(0)
    x = np.r_[rng.normal(0, 1, 300), rng.normal(6, 1, 300)]
    bkps = binseg_breakpoints(x, penalty=10.0)
    assert len(bkps) == 1 and abs(int(bkps[0]) - 300) <= 3


def test_min_size_respected():
    x = np.r_[np.zeros(3), np.full(97, 10.0)]
    bkps = binseg_breakpoints(x, penalty=1.0, min_size=5)
    assert all(b >= 5 and b <= 95 for b in bkps)


def test_max_splits_cap():
    idx = np.arange(400)
    vals = 100.0 * (idx // 40)
    assert binseg_breakpoints(vals, penalty=5.0, max_splits=3).size <= 3
