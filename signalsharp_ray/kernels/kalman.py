"""1-D Kalman filter / smoother kernel.

The reference docs mention Kalman filtering (docs/index.md:28) but the
snapshot ships no implementation, so this follows the standard public
formulation (local-level / local-linear-trend state-space model) and is
golden-tested against hand-computed fixtures rather than reference ones.

Local level model:
    x_t = x_{t-1} + w,  w ~ N(0, q)
    z_t = x_t + v,      v ~ N(0, r)
Predict:  x_pred = x;        p_pred = p + q
Update:   k = p_pred / (p_pred + r)
          x = x_pred + k (z - x_pred);  p = (1 - k) p_pred
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class KalmanOptions:
    process_variance: float = 1e-5  # q
    measurement_variance: float = 1e-2  # r
    initial_estimate: float | None = None  # default: first observation
    initial_error: float = 1.0  # p0

    def __post_init__(self):
        if self.process_variance < 0 or self.measurement_variance <= 0:
            raise ValueError("variances must be positive (process may be zero)")


def kalman_filter(signal, options: KalmanOptions | None = None) -> np.ndarray:
    """Filtered state estimates, same length as the input."""
    opts = options or KalmanOptions()
    z = np.asarray(signal, dtype=np.float64)
    n = z.size
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    x = z[0] if opts.initial_estimate is None else float(opts.initial_estimate)
    p = float(opts.initial_error)
    q, r = opts.process_variance, opts.measurement_variance
    for i in range(n):
        # predict
        p_pred = p + q
        # update
        k = p_pred / (p_pred + r)
        x = x + k * (z[i] - x)
        p = (1.0 - k) * p_pred
        out[i] = x
    return out
