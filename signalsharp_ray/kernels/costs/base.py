"""Cost-function ABCs mirroring the reference's plugin surface
(/root/reference/SignalSharp/CostFunctions/Cost/IPELTCostFunction.cs:11-46)."""

from __future__ import annotations

import abc

import numpy as np

from ...common.exceptions import SegmentLengthError, UninitializedDataError


def as_matrix(signal) -> np.ndarray:
    """Normalize input to (dims, n) float64, matching the reference's
    1D -> single-row-matrix wrapping (PELTAlgorithm.cs:75-86)."""
    arr = np.asarray(signal, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    elif arr.ndim != 2:
        raise ValueError("signal must be 1-D or 2-D (dims x time)")
    return arr


class CostFunction(abc.ABC):
    """A fitted, per-segment cost oracle over [start, end) index intervals."""

    supports_information_criteria: bool = False

    _n_points: int | None = None
    _n_dims: int | None = None

    @abc.abstractmethod
    def fit(self, signal) -> "CostFunction":
        ...

    @abc.abstractmethod
    def compute_cost(self, start: int | None = None, end: int | None = None) -> float:
        ...

    @property
    def n_points(self) -> int:
        if self._n_points is None:
            raise UninitializedDataError("fit() must be called first.")
        return self._n_points

    def min_segment_length(self) -> int:
        """Smallest segment this cost can evaluate (AR overrides)."""
        return 1

    def _resolve(self, start: int | None, end: int | None, min_len: int = 1) -> tuple[int, int, int]:
        if self._n_points is None:
            raise UninitializedDataError("fit() must be called before compute_cost().")
        s = 0 if start is None else start
        e = self._n_points if end is None else end
        if s < 0:
            raise IndexError("start must be non-negative")
        if e > self._n_points:
            raise IndexError("end is past the fitted signal")
        if s > e:
            raise IndexError("start must not exceed end")
        SegmentLengthError.check(e - s, min_len)
        return s, e, e - s


class LikelihoodCostFunction(CostFunction):
    supports_information_criteria = True

    @abc.abstractmethod
    def compute_likelihood_metric(self, start: int, end: int) -> float:
        ...

    @abc.abstractmethod
    def segment_parameter_count(self, segment_length: int) -> int:
        ...
