"""RBF kernel cost.

Cost(start,end) = sum_dims [ n - (sum_{i,j in seg} K(i,j)) / n ] with
K(i,j) = 1 when the squared distance is exactly 0, else
exp(-clamp(gamma * (x_i - x_j)^2, 1e-2, 1e2))
(/root/reference/SignalSharp/CostFunctions/Cost/RBFCostFunction.cs:122-142,
:258-285). gamma defaults to the median heuristic computed from the FIRST
dimension's pairwise squared distances (1/median; median==0 or no pairs -> 1.0,
RBFCostFunction.cs:201-222, :292-300) and is then reused for all dimensions.

O(N^2) memory per series: the distributed engine runs this only on rolled-up
tiers with a per-series length cap (see stages.analysis).
"""

from __future__ import annotations

import numpy as np

from .base import CostFunction, as_matrix


class RBFCost(CostFunction):
    def __init__(self, gamma: float | None = None):
        self._gamma_opt = gamma

    def fit(self, signal) -> "RBFCost":
        mat = as_matrix(signal)
        self._n_dims, self._n_points = mat.shape
        n = self._n_points
        gamma = self._gamma_opt
        grams = np.empty((self._n_dims, n, n))
        for dim in range(self._n_dims):
            x = mat[dim]
            d = x[:, None] - x[None, :]
            d2 = d * d
            if gamma is None:
                gamma = self._median_heuristic_gamma(d2)
            karg = np.clip(d2 * gamma, 1e-2, 1e2)
            k = np.exp(-karg)
            k[d2 == 0.0] = 1.0
            grams[dim] = k
        self.gamma_ = gamma if gamma is not None else 1.0
        # 2-D prefix sums with a zero border for O(1) rectangle sums
        ps = np.zeros((self._n_dims, n + 1, n + 1))
        np.cumsum(grams, axis=1, out=grams)
        np.cumsum(grams, axis=2, out=grams)
        ps[:, 1:, 1:] = grams
        self._ps2d = ps
        return self

    @staticmethod
    def _median_heuristic_gamma(d2: np.ndarray) -> float:
        n = d2.shape[0]
        if n < 2:
            return 1.0
        iu = np.triu_indices(n, k=1)
        vals = d2[iu]
        if vals.size == 0:
            return 1.0
        med = float(np.median(vals))
        return 1.0 / med if med != 0.0 else 1.0

    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        # NOTE: unlike L1, the reference RBF has NO empty-data early-out —
        # ComputeCost on an empty fit throws SegmentLengthException
        # (RBFCostFunction.cs ComputeCost: ThrowIfInvalid(segmentLength))
        s, e, n = self._resolve(start, end)
        # rectangle [s, e) x [s, e) via inclusion-exclusion on the prefix sums
        block = (
            self._ps2d[:, e, e]
            - self._ps2d[:, s, e]
            - self._ps2d[:, e, s]
            + self._ps2d[:, s, s]
        )
        return float(np.sum(n - block / n))

    def segment_costs(self, starts: np.ndarray, end: int) -> np.ndarray:
        """Vectorized cost over many candidate starts with a shared end
        (identical arithmetic to compute_cost)."""
        n = (end - starts).astype(np.float64)
        block = (
            self._ps2d[:, end, end][:, None]
            - self._ps2d[:, starts, end]
            - self._ps2d[:, end, starts]
            + self._ps2d[:, starts, starts]
        )
        return np.sum(n[None, :] - block / n[None, :], axis=0)
