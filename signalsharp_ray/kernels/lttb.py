"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, public
algorithm): pick, per bucket, the point forming the largest triangle with
the previously selected point and the next bucket's centroid — the standard
visual-fidelity downsampler for plotting millions of points.

No reference counterpart (the reference's Downsample is a stride); this is
the dashboard-path companion to the rollup tiers. Deterministic: ties
resolve to the FIRST maximal point (np.argmax semantics), so output is
reproducible across runs and layouts (the per-series kernel sees the whole
sorted series, like every analysis kernel).
"""

from __future__ import annotations

import numpy as np


def lttb(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Return the indices of the selected points (ascending). Keeps the
    first and last point; n_out >= 3 required for actual downsampling —
    n_out >= len(x) returns every index."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.size
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first, last, and one bucket)")

    # bucket boundaries over the interior points [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    selected = np.empty(n_out, dtype=np.int64)
    selected[0] = 0
    a = 0  # previously selected index
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        # centroid of the NEXT bucket (or the last point for the final one)
        nlo, nhi = (edges[i + 1], edges[i + 2]) if i + 2 < n_out - 1 else (
            edges[i + 1],
            np.int64(n),
        )
        cx = x[nlo:nhi].mean()
        cy = y[nlo:nhi].mean()
        # triangle area vs previous point a and centroid c, for each candidate
        ax_, ay_ = x[a], y[a]
        area = np.abs(
            (ax_ - cx) * (y[lo:hi] - ay_) - (ax_ - x[lo:hi]) * (cy - ay_)
        )
        a = lo + int(np.argmax(area))
        selected[i + 1] = a
    selected[-1] = n - 1
    return selected
