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


def test_invalid_factor():
    with pytest.raises(ValueError):
        downsample([1, 2], 0)
