"""Binomial negative log-likelihood cost over (k; n) count pairs.

Input is a 2-row matrix: row 0 = successes k, row 1 = trials n per point.
Metric = -[K ln K + (N-K) ln(N-K) - N ln N] over segment totals, with
K~0, K~N or N~0 -> 0 and a final max(0, .) clamp
(/root/reference/SignalSharp/CostFunctions/Cost/
BinomialLikelihoodCostFunction.cs:106-156, :242-323). 1 parameter (p).
"""

from __future__ import annotations

import math

import numpy as np

from ...common.constants import DEFAULT_EPSILON
from .base import LikelihoodCostFunction


def _xlogx(x: float, tol: float) -> float:
    return 0.0 if x <= tol else x * math.log(x)


class BinomialLikelihoodCost(LikelihoodCostFunction):
    def fit(self, signal) -> "BinomialLikelihoodCost":
        mat = np.asarray(signal, dtype=np.float64)
        if mat.ndim != 2 or mat.shape[0] != 2:
            raise ValueError(
                "Binomial cost requires a 2-row matrix (row 0: successes k, row 1: trials n)."
            )
        k, n = mat[0], mat[1]
        if np.any(~np.isfinite(mat)):
            raise ValueError("k and n must be finite.")
        rk, rn = np.round(k), np.round(n)
        if (
            np.any(np.abs(k - rk) >= DEFAULT_EPSILON)
            or np.any(np.abs(n - rn) >= DEFAULT_EPSILON)
            or np.any(rk < 0)
            or np.any(rn < 1)
            or np.any(rk > rn)
        ):
            raise ValueError(
                "Requirements: k and n non-negative integers, 0 <= k <= n, n >= 1."
            )
        self._n_dims = 1
        self._n_points = mat.shape[1]
        self._psk = np.concatenate([[0.0], np.cumsum(rk)])
        self._psn = np.concatenate([[0.0], np.cumsum(rn)])
        return self

    def _metric(self, start: int | None, end: int | None) -> float:
        if self._n_points == 0:
            return 0.0
        s, e, _ = self._resolve(start, end)
        big_k = self._psk[e] - self._psk[s]
        big_n = self._psn[e] - self._psn[s]
        tol = DEFAULT_EPSILON
        if abs(big_n) < tol or abs(big_k) < tol or abs(big_k - big_n) < tol:
            return 0.0
        metric = -(_xlogx(big_k, tol) + _xlogx(big_n - big_k, tol) - _xlogx(big_n, tol))
        if math.isnan(metric) or math.isinf(metric):
            return math.inf
        return max(0.0, metric)

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        return self._metric(start, end)

    def compute_likelihood_metric(self, start: int, end: int) -> float:
        return self._metric(start, end)

    def segment_parameter_count(self, segment_length: int) -> int:
        return 1
