"""Poisson negative log-likelihood cost.

Metric(start,end) = sum_dims 2*(S - S*ln S + S*ln n), S = segment count sum;
S effectively 0 -> 0. Inputs validated non-negative within -1e-9 tolerance
and clamped to 0 (/root/reference/SignalSharp/CostFunctions/Cost/
PoissonLikelihoodCostFunction.cs:95-125, :207-278). 1 parameter/dim (rate).
"""

from __future__ import annotations

import math

import numpy as np

from ...common.constants import DEFAULT_EPSILON
from .base import LikelihoodCostFunction, as_matrix


class PoissonLikelihoodCost(LikelihoodCostFunction):
    def fit(self, signal) -> "PoissonLikelihoodCost":
        mat = as_matrix(signal)
        if np.any(~np.isfinite(mat)):
            raise ValueError("Poisson cost input must be finite.")
        if np.any(mat < -DEFAULT_EPSILON):
            raise ValueError("Poisson cost input must be non-negative counts.")
        mat = np.maximum(mat, 0.0)
        self._n_dims, self._n_points = mat.shape
        zeros = np.zeros((self._n_dims, 1))
        self._ps = np.concatenate([zeros, np.cumsum(mat, axis=1)], axis=1)
        return self

    def _metric(self, start: int | None, end: int | None) -> float:
        if self._n_dims == 0 or self._n_points == 0:
            return 0.0
        s, e, n = self._resolve(start, end)
        seg_sum = self._ps[:, e] - self._ps[:, s]
        log_n = math.log(n)
        total = 0.0
        for ss in seg_sum:
            if abs(ss) < DEFAULT_EPSILON:
                continue
            m = 2.0 * (ss - ss * math.log(ss) + ss * log_n)
            if math.isnan(m) or math.isinf(m):
                return math.inf
            total += m
        return total

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        return self._metric(start, end)

    def compute_likelihood_metric(self, start: int, end: int) -> float:
        return self._metric(start, end)

    def segment_parameter_count(self, segment_length: int) -> int:
        return int(self._n_dims)
