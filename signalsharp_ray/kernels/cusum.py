"""Two-sided CUSUM changepoint detection.

Semantics match /root/reference/SignalSharp/Detection/CUSUM/CUSUMAlgorithm.cs:
threshold = threshold_factor * expected_std, slack = slack_factor * expected_std;
scan starts at i=1; high = max(0, high + x[i] - mean - slack),
low = min(0, low + x[i] - mean + slack); crossing either +/-threshold emits i
and resets BOTH sums; len < 2 -> []. Defaults (CUSUMOptions.cs:18-39):
mean=0, std=1, slack_factor=0, threshold_factor=5.

Sequential per series: the whole (time-sorted) series must reach one kernel
call; see stages.analysis for the groupby contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class CUSUMOptions:
    expected_mean: float = 0.0
    expected_std: float = 1.0
    slack_factor: float = 0.0
    threshold_factor: float = 5.0

    def __post_init__(self):
        if self.expected_std <= 0:
            raise ValueError("expected_std must be positive")
        if self.slack_factor < 0:
            raise ValueError("slack_factor must be non-negative")
        if self.threshold_factor <= 0:
            raise ValueError("threshold_factor must be positive")


def cusum_changepoints(signal, options: CUSUMOptions | None = None) -> np.ndarray:
    opts = options or CUSUMOptions()
    x = np.asarray(signal, dtype=np.float64)
    if x.size < 2:
        return np.array([], dtype=np.int64)
    threshold = opts.threshold_factor * opts.expected_std
    slack = opts.slack_factor * opts.expected_std
    mean = opts.expected_mean

    out: list[int] = []
    high = 0.0
    low = 0.0
    # O(n) scan; resets on detection make this a data-dependent recurrence,
    # so a straight loop is the clearest correct form. Deviation arrays are
    # precomputed to keep the loop body cheap.
    dev_hi = x - (mean + slack)
    dev_lo = x - (mean - slack)
    for i in range(1, x.size):
        high = max(0.0, high + dev_hi[i])
        low = min(0.0, low + dev_lo[i])
        if high > threshold or low < -threshold:
            out.append(i)
            high = 0.0
            low = 0.0
    return np.asarray(out, dtype=np.int64)
