"""Binary segmentation changepoint detection (greedy top-down).

Public algorithm (Scott & Knott 1974; the standard baseline the PELT paper
compares against): recursively split the segment at the point of maximum
L2-cost reduction while the gain exceeds the penalty. O(n log k) with
prefix sums versus PELT's optimal-but-heavier DP — the cheap first-pass
screen a pipeline runs before exact PELT. Greedy, so NOT guaranteed
optimal on adversarial signals; on noiseless staircase data it recovers
exactly the level-change indices (oracle-verified via binseg_step_detection).

No reference counterpart (SignalSharp ships PELT/CUSUM only); included as
the classic alternative the reference's users would reach for next.
"""

from __future__ import annotations

import numpy as np


def binseg_breakpoints(
    signal, penalty: float, min_size: int = 1, max_splits: int | None = None
) -> np.ndarray:
    """Interior breakpoint indices (sorted int64), L2 cost.

    A split at t divides [lo, hi) into [lo, t) and [t, hi); gains for every
    admissible t are computed vectorized from prefix sums, ties resolved to
    the SMALLEST t (deterministic)."""
    x = np.asarray(signal, dtype=np.float64)
    n = x.size
    if n < 2 * min_size:
        return np.array([], dtype=np.int64)
    cs = np.concatenate([[0.0], np.cumsum(x)])
    css = np.concatenate([[0.0], np.cumsum(x * x)])

    def seg_cost(lo: int, hi: int) -> float:
        m = hi - lo
        s = cs[hi] - cs[lo]
        return (css[hi] - css[lo]) - s * s / m

    found: list[int] = []
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2 * min_size:
            continue
        if max_splits is not None and len(found) >= max_splits:
            break
        ts = np.arange(lo + min_size, hi - min_size + 1)
        if ts.size == 0:
            continue
        ml = ts - lo
        mr = hi - ts
        sl = cs[ts] - cs[lo]
        sr = cs[hi] - cs[ts]
        cost_l = (css[ts] - css[lo]) - sl * sl / ml
        cost_r = (css[hi] - css[ts]) - sr * sr / mr
        gains = seg_cost(lo, hi) - cost_l - cost_r
        best = int(np.argmax(gains))  # first max -> smallest t
        if gains[best] > penalty:
            t = int(ts[best])
            found.append(t)
            stack.append((t, hi))
            stack.append((lo, t))
    return np.array(sorted(found), dtype=np.int64)
