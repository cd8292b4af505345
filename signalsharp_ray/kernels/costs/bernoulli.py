"""Bernoulli negative log-likelihood cost.

Metric = -2*[S ln S + (n-S) ln(n-S) - n ln n], S = #successes in [start,end);
all-0 or all-1 segments (within 1e-9) -> 0. Fit validates every value is
effectively 0 or 1 and clamps it (/root/reference/SignalSharp/CostFunctions/
Cost/BernoulliLikelihoodCostFunction.cs:88-124, :203-283). 1 parameter/dim.
"""

from __future__ import annotations

import math

import numpy as np

from ...common.constants import DEFAULT_EPSILON
from .base import LikelihoodCostFunction, as_matrix


class BernoulliLikelihoodCost(LikelihoodCostFunction):
    def fit(self, signal) -> "BernoulliLikelihoodCost":
        mat = as_matrix(signal)
        near_zero = np.abs(mat) < DEFAULT_EPSILON
        near_one = np.abs(mat - 1.0) < DEFAULT_EPSILON
        if not np.all(near_zero | near_one):
            raise ValueError(
                "Input data must be effectively 0 or 1 for Bernoulli likelihood cost."
            )
        clamped = np.where(near_one, 1.0, 0.0)
        self._n_dims, self._n_points = mat.shape
        zeros = np.zeros((self._n_dims, 1))
        self._ps = np.concatenate([zeros, np.cumsum(clamped, axis=1)], axis=1)
        return self

    def _metric(self, start: int | None, end: int | None) -> float:
        if self._n_dims == 0 or self._n_points == 0:
            return 0.0
        s, e, n = self._resolve(start, end)
        seg_s = self._ps[:, e] - self._ps[:, s]
        total = 0.0
        for succ in seg_s:
            fail = n - succ
            if abs(succ) < DEFAULT_EPSILON or abs(succ - n) < DEFAULT_EPSILON:
                continue
            m = -2.0 * (
                succ * math.log(succ) + fail * math.log(fail) - n * math.log(n)
            )
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
