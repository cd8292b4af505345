"""AR(p) autoregressive cost (univariate only).

Cost = RSS of an OLS AR(p) fit (optional intercept) over the segment;
likelihood metric = n_eff * ln(var_mle), var_mle = RSS/n_eff, n_eff = n - p;
variance effectively zero (1e-10) -> +inf. Minimum segment length
max(p+1, 2p + intercept). Constant segment with intercept -> failure -> +inf
cost (/root/reference/SignalSharp/CostFunctions/Cost/ARCostFunction.cs:60-416).
Solved with numpy.linalg.lstsq; a singular/failed solve keeps the reference's
+inf-cost semantics.
"""

from __future__ import annotations

import math

import numpy as np

from ...common.constants import DEFAULT_EPSILON, VARIANCE_EPSILON
from .base import LikelihoodCostFunction, as_matrix


class ARCost(LikelihoodCostFunction):
    def __init__(self, order: int, include_intercept: bool = True):
        if order < 1:
            raise ValueError("order must be >= 1")
        self.order = order
        self.include_intercept = include_intercept

    def fit(self, signal) -> "ARCost":
        mat = as_matrix(signal)
        if mat.shape[0] != 1:
            raise ValueError("ARCost only supports univariate signals.")
        if mat.shape[1] < self.order + 1:
            raise ValueError(
                f"Signal length must be at least order + 1 ({self.order + 1})."
            )
        self._signal = mat[0]
        self._n_dims, self._n_points = mat.shape
        return self

    def min_segment_length(self) -> int:
        p = self.order
        min_formation = p + 1
        min_solver = 2 * p + 1 if self.include_intercept else 2 * p
        return max(min_formation, min_solver)

    def _rss(self, seg: np.ndarray) -> float | None:
        """RSS of the OLS AR fit; None signals failure (singular/constant)."""
        p = self.order
        n_eq = seg.size - p
        if n_eq <= 0:
            return None
        if self.include_intercept and np.all(
            np.abs(seg - seg[0]) < DEFAULT_EPSILON
        ):
            return None  # perfect collinearity with the intercept column
        y = seg[p:]
        cols = []
        if self.include_intercept:
            cols.append(np.ones(n_eq))
        for lag in range(1, p + 1):
            cols.append(seg[p - lag : seg.size - lag])
        design = np.column_stack(cols)
        try:
            coef, *_ = np.linalg.lstsq(design, y, rcond=None)
        except np.linalg.LinAlgError:
            return None
        resid = y - design @ coef
        rss = float(resid @ resid)
        if math.isnan(rss) or math.isinf(rss):
            return None
        return rss

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        s, e, _ = self._resolve(start, end, self.min_segment_length())
        rss = self._rss(self._signal[s:e])
        return math.inf if rss is None else rss

    def compute_likelihood_metric(self, start: int, end: int) -> float:
        s, e, n = self._resolve(start, end, self.min_segment_length())
        rss = self._rss(self._signal[s:e])
        if rss is None:
            return math.inf
        n_eff = n - self.order
        if n_eff <= 0:
            return math.inf
        var_mle = rss / n_eff
        if abs(var_mle) < VARIANCE_EPSILON:
            return math.inf
        metric = n_eff * math.log(var_mle)
        if math.isnan(metric) or math.isinf(metric):
            return math.inf
        return metric

    def segment_parameter_count(self, segment_length: int) -> int:
        return self.order + 1 + (1 if self.include_intercept else 0)
