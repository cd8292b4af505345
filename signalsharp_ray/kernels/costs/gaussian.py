"""Gaussian negative log-likelihood cost.

Metric(start,end) = sum_dims [ n * ln(max(var_mle, 1e-10)) ] with
var_mle = max(sum_sq_dev, 0)/n from prefix sums; the exact variance floor
VarianceEpsilon=1e-10 is load-bearing for golden parity
(/root/reference/SignalSharp/CostFunctions/Cost/GaussianLikelihoodCostFunction.cs:183-292,
Common/Constants.cs:48). 2 parameters (mean, variance) per dimension.
"""

from __future__ import annotations

import math

import numpy as np

from ...common.constants import VARIANCE_EPSILON
from .base import LikelihoodCostFunction, as_matrix


class GaussianLikelihoodCost(LikelihoodCostFunction):
    def fit(self, signal) -> "GaussianLikelihoodCost":
        mat = as_matrix(signal)
        self._n_dims, self._n_points = mat.shape
        zeros = np.zeros((self._n_dims, 1))
        self._ps = np.concatenate([zeros, np.cumsum(mat, axis=1)], axis=1)
        self._ps2 = np.concatenate([zeros, np.cumsum(mat * mat, axis=1)], axis=1)
        return self

    def _metric(self, start: int | None, end: int | None) -> float:
        if self._n_dims == 0 or self._n_points == 0:
            return 0.0
        s, e, n = self._resolve(start, end)
        seg_sum = self._ps[:, e] - self._ps[:, s]
        seg_sum2 = self._ps2[:, e] - self._ps2[:, s]
        sum_sq_dev = seg_sum2 - seg_sum * seg_sum / n
        var_mle = np.maximum(sum_sq_dev, 0.0) / n
        clamped = np.maximum(var_mle, VARIANCE_EPSILON)
        per_dim = n * np.log(clamped)
        total = float(np.sum(per_dim))
        if math.isnan(total) or math.isinf(total):
            return math.inf
        return total

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        return self._metric(start, end)

    def compute_likelihood_metric(self, start: int, end: int) -> float:
        return self._metric(start, end)

    def segment_costs(self, starts: np.ndarray, end: int) -> np.ndarray:
        """Vectorized metric over many candidate starts with a shared end
        (identical arithmetic to compute_cost; NaN/inf -> +inf per candidate)."""
        n = (end - starts).astype(np.float64)
        seg_sum = self._ps[:, end][:, None] - self._ps[:, starts]
        seg_sum2 = self._ps2[:, end][:, None] - self._ps2[:, starts]
        sum_sq_dev = seg_sum2 - seg_sum * seg_sum / n[None, :]
        var_mle = np.maximum(sum_sq_dev, 0.0) / n[None, :]
        clamped = np.maximum(var_mle, VARIANCE_EPSILON)
        out = np.sum(n[None, :] * np.log(clamped), axis=0)
        out[~np.isfinite(out)] = np.inf
        return out

    def segment_parameter_count(self, segment_length: int) -> int:
        if self._n_dims is None:
            raise_uninit()
        return self._n_dims * 2


def raise_uninit():
    from ...common.exceptions import UninitializedDataError

    raise UninitializedDataError("fit() must be called first.")
