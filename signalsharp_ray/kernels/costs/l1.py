"""L1 (sum of absolute deviations from the segment median) cost.

Output-identical to the reference (L1CostFunction.cs:54-167) but the
reference precomputes medians for ALL O(N^2) segments at fit time
(O(N^3 log N)); we compute each queried segment's median lazily with
np.partition — same values, tractable complexity. Median semantics:
sort-based, even length -> mean of the two middle values
(L1CostFunction.cs:125-142).
"""

from __future__ import annotations

import numpy as np

from .base import CostFunction, as_matrix


class L1Cost(CostFunction):
    def fit(self, signal) -> "L1Cost":
        self._data = as_matrix(signal)
        self._n_dims, self._n_points = self._data.shape
        return self

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        # reference order (L1CostFunction.cs:91-100): uninitialized check,
        # then EMPTY-DATA -> 0 before any segment-length validation
        if self._n_points is not None and self._data.size == 0:
            return 0.0
        s, e, _ = self._resolve(start, end)  # raises UninitializedDataError unfitted
        seg = self._data[:, s:e]
        med = np.median(seg, axis=1, keepdims=True)
        return float(np.sum(np.abs(seg - med)))
