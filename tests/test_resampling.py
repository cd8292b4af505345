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


class TestLTTB:
    """kernels/lttb.py vs a straightforward reference implementation."""

    @staticmethod
    def _reference_lttb(x, y, n_out):
        n = len(x)
        if n_out >= n:
            return list(range(n))
        edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        sel = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            if i + 2 < n_out - 1:
                nlo, nhi = edges[i + 1], edges[i + 2]
            else:
                nlo, nhi = edges[i + 1], n
            cx, cy = np.mean(x[nlo:nhi]), np.mean(y[nlo:nhi])
            best, best_area = lo, -1.0
            for j in range(lo, hi):
                area = abs((x[a] - cx) * (y[j] - y[a]) - (x[a] - x[j]) * (cy - y[a]))
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
            a = best
        sel.append(n - 1)
        return sel

    def test_matches_reference_implementation(self):
        from signalsharp_ray.kernels.lttb import lttb

        rng = np.random.default_rng(6)
        x = np.cumsum(rng.integers(1, 5, 500)).astype(float)
        y = rng.normal(0, 1, 500).cumsum()
        got = lttb(x, y, 40)
        want = self._reference_lttb(x, y, 40)
        np.testing.assert_array_equal(got, want)

    def test_invariants(self):
        from signalsharp_ray.kernels.lttb import lttb

        rng = np.random.default_rng(7)
        x = np.arange(1000, dtype=float)
        y = rng.normal(size=1000)
        idx = lttb(x, y, 50)
        assert idx.size == 50
        assert idx[0] == 0 and idx[-1] == 999
        assert np.all(np.diff(idx) > 0)  # strictly increasing subset
        # spike preservation: the global max survives downsampling
        y2 = y.copy()
        y2[417] = 50.0
        assert 417 in lttb(x, y2, 50)

    def test_small_inputs(self):
        from signalsharp_ray.kernels.lttb import lttb

        x = np.arange(5, dtype=float)
        np.testing.assert_array_equal(lttb(x, x, 10), np.arange(5))
        with pytest.raises(ValueError):
            lttb(np.arange(10, dtype=float), np.arange(10, dtype=float), 2)
