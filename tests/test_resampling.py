"""Resampling kernels vs reference golden values (FIXTURES.md §2.3)."""

import numpy as np
import pytest

from signalsharp_ray.kernels.resampling import (
    downsample,
    segment_max,
    segment_mean,
    segment_median,
    segment_min,
)


def test_downsample():
    np.testing.assert_array_equal(downsample([1, 2, 3, 4, 5, 6], 2), [1, 3, 5])
    np.testing.assert_array_equal(downsample([1, 2, 3, 4, 5], 2), [1, 3, 5])


def test_segment_mean():
    np.testing.assert_allclose(segment_mean([1, 2, 3, 4, 5, 6], 2), [1.5, 3.5, 5.5])


def test_segment_mean_ragged():
    np.testing.assert_allclose(segment_mean([1, 2, 3, 4, 5], 2), [1.5, 3.5, 5.0])


def test_segment_median():
    np.testing.assert_allclose(segment_median([1, 2, 3, 4, 5, 6], 2), [1.5, 3.5, 5.5])
    np.testing.assert_allclose(
        segment_median([1, 2, 3, 4, 5, 6], 2, use_quickselect=False), [1.5, 3.5, 5.5]
    )


def test_segment_median_ragged():
    np.testing.assert_allclose(segment_median([1, 3, 2, 5, 4, 6, 7], 3), [2, 5, 7])


def test_segment_median_short():
    np.testing.assert_allclose(segment_median([1, 2, 3], 5), [2])


def test_segment_max_min():
    np.testing.assert_array_equal(segment_max([1, 2, 3, 4, 5, 6], 2), [2, 4, 6])
    np.testing.assert_array_equal(segment_min([1, 2, 3, 4, 5, 6], 2), [1, 3, 5])


def test_segment_median_single_element():
    # ResamplingTests.cs:103-124 — single point, factor larger than signal
    np.testing.assert_allclose(segment_median([1], 2), [1])
    np.testing.assert_allclose(segment_median([1], 2, use_quickselect=False), [1])


def test_segment_median_short_both_paths():
    # ResamplingTests.cs:125-146 — factor > len, both median paths agree
    np.testing.assert_allclose(segment_median([1, 2, 3], 5, use_quickselect=False), [2])


def test_segment_median_ragged_quickselect_disabled():
    # ResamplingTests.cs:92-102
    np.testing.assert_allclose(
        segment_median([1, 3, 2, 5, 4, 6, 7], 3, use_quickselect=False), [2, 5, 7]
    )


@pytest.mark.parametrize(
    "fn", [downsample, segment_mean, segment_median, segment_min, segment_max]
)
@pytest.mark.parametrize("factor", [0, -1])
def test_invalid_factor(fn, factor):
    # ResamplingTests.cs throws ArgumentOutOfRangeException for factor <= 0
    # on every operator; our kernels raise ValueError uniformly
    with pytest.raises(ValueError):
        fn([1, 2, 3], factor)
