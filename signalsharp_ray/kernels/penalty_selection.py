"""Automatic PELT penalty selection via BIC / AIC / AICc.

Semantics match /root/reference/SignalSharp/Detection/PELT/PELTPenaltySelector.cs:
- grid of ~num_steps log-spaced penalties in [min_p, max_p]; heuristics
  min_p = max(0.1, params * ln n) using the parameter count of a sample
  segment of length min(max(MinSize, min(n,10))), and
  max_p = max(n ln n, 20*min_p, max(1, 1.1*min_p + 1)) (:532-687)
- the special zero-min grid path (:576-614) is replicated exactly
- per penalty: run PELT detect, score the segmentation:
    BIC  = metric + P ln n
    AIC  = metric + 2P
    AICc = AIC + 2P(P+1)/(n-P-1)   (undefined when n <= P+1 -> +inf score)
  with P = sum of per-segment parameter counts + K changepoints (:321-488)
- any segment shorter than MinSize, or a NaN/inf metric -> score +inf (:397-488)
- best = min score; ties within 1e-9 prefer FEWER changepoints (:146-171)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..common.constants import DEFAULT_EPSILON, is_effectively_zero
from ..common.exceptions import PELTAlgorithmError
from .costs.base import LikelihoodCostFunction
from .pelt import PELT


@dataclass
class PenaltySelectionOptions:
    method: str = "bic"  # bic | aic | aicc
    min_penalty: float | None = None
    max_penalty: float | None = None
    num_steps: int = 50


@dataclass
class PenaltySelectionResult:
    selected_penalty: float
    optimal_breakpoints: np.ndarray
    method: str
    diagnostics: list = field(default_factory=list)  # (penalty, score, n_changepoints)


def _log_spaced_penalties(min_p: float, max_p: float, count: int) -> list[float]:
    if count <= 0:
        return []
    if count == 1 or min_p >= max_p:
        return [min_p]
    out: list[float] = []
    if is_effectively_zero(min_p):
        out.append(0.0)
        effective_min = max(1e-9, max_p * 1e-6)
        if effective_min >= max_p:
            if not is_effectively_zero(max_p):
                out.append(max_p)
            return out
        log_min, log_max = math.log(effective_min), math.log(max_p)
        if count == 2 or log_min >= log_max:
            out.append(max_p)
            return out
        step = (log_max - log_min) / (count - 2)
        for i in range(count - 1):
            p = math.exp(log_min + step * i)
            if i == count - 2 or p >= max_p:
                out.append(max_p)
                return out
            out.append(p)
        return out
    log_min, log_max = math.log(min_p), math.log(max_p)
    step = (log_max - log_min) / (count - 1)
    for i in range(count):
        p = math.exp(log_min + step * i)
        if i == count - 1 or p >= max_p:
            out.append(max_p)
            return out
        out.append(p)
    return out


class PELTPenaltySelector:
    def __init__(self, pelt: PELT):
        self.pelt = pelt
        self._options = pelt.options

    def fit_and_select(
        self, signal, selection: PenaltySelectionOptions
    ) -> PenaltySelectionResult:
        arr = np.asarray(signal, dtype=np.float64)
        self.pelt.fit(arr)
        return self._select(arr.shape[-1], selection)

    # -- internals -------------------------------------------------------

    def _likelihood_fn(self) -> LikelihoodCostFunction:
        cost = self.pelt.cost
        if isinstance(cost, LikelihoodCostFunction) and cost.supports_information_criteria:
            return cost
        raise ValueError(
            f"Penalty selection method requires a likelihood cost function; "
            f"{type(cost).__name__} does not support information criteria."
        )

    def _select(self, n: int, selection: PenaltySelectionOptions) -> PenaltySelectionResult:
        method = selection.method.lower()
        if method not in ("bic", "aic", "aicc"):
            raise ValueError(f"Unknown selection method {method!r}")
        lik = self._likelihood_fn()

        penalties = self._penalty_grid(n, selection, lik)
        if not penalties:
            raise PELTAlgorithmError("Penalty range resulted in zero penalties to test.")

        best_score = math.inf
        best_penalty = -1.0
        best_bkps = np.array([], dtype=np.int64)
        diagnostics: list[tuple[float, float, int]] = []

        for penalty in penalties:
            if penalty < 0:
                diagnostics.append((penalty, math.nan, -1))
                continue
            try:
                bkps = self.pelt.detect(penalty)
            except Exception:
                diagnostics.append((penalty, math.nan, -1))
                continue
            score = self._score(method, bkps, n, lik)
            diagnostics.append((penalty, score, len(bkps)))
            if math.isnan(score) or math.isinf(score):
                continue
            if score < best_score:
                best_score, best_penalty, best_bkps = score, penalty, bkps
            elif (
                abs(score - best_score) < DEFAULT_EPSILON
                and len(bkps) < len(best_bkps)
            ):
                best_penalty, best_bkps = penalty, bkps

        if best_penalty < 0:
            raise PELTAlgorithmError(
                "Could not find a suitable penalty: all tested penalties gave "
                "errors, invalid segmentations, or infinite/NaN scores."
            )
        return PenaltySelectionResult(
            selected_penalty=best_penalty,
            optimal_breakpoints=best_bkps,
            method=method,
            diagnostics=diagnostics,
        )

    def _penalty_grid(
        self, n: int, selection: PenaltySelectionOptions, lik: LikelihoodCostFunction
    ) -> list[float]:
        min_p = selection.min_penalty
        if min_p is None:
            min_p = self._estimate_min_penalty(n, lik)
        max_p = selection.max_penalty
        if max_p is None:
            max_p = self._estimate_max_penalty(n, min_p)
        if min_p < 0:
            min_p = 0.0
        if max_p <= min_p:
            max_p = min_p + max(1.0, abs(min_p * 0.1) + 0.1)
        steps = max(2, selection.num_steps)
        return _log_spaced_penalties(min_p, max_p, steps)

    def _estimate_min_penalty(self, n: int, lik: LikelihoodCostFunction) -> float:
        nn = float(max(2, n))
        typical_params = 2.0
        try:
            sample_len = max(self._options.min_size, min(n, 10))
            if n >= sample_len:
                typical_params = max(1.0, lik.segment_parameter_count(sample_len))
        except Exception:
            pass
        return max(0.1, typical_params * math.log(nn))

    @staticmethod
    def _estimate_max_penalty(n: int, min_penalty: float) -> float:
        nn = float(max(2, n))
        max_from_n = nn * math.log(nn)
        max_from_min = min_penalty * 20.0
        max_p = max(max_from_n, max_from_min)
        return max(max_p, max(1.0, min_penalty * 1.1 + 1.0))

    def _score(
        self,
        method: str,
        breakpoints: np.ndarray,
        n: int,
        lik: LikelihoodCostFunction,
    ) -> float:
        k = len(breakpoints)
        bounds = [0, *[int(b) for b in breakpoints], n]
        total_metric = 0.0
        total_params = 0.0
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < self._options.min_size:
                return math.inf
            try:
                m = lik.compute_likelihood_metric(s, e)
            except Exception:
                return math.inf
            if math.isnan(m) or math.isinf(m):
                return math.inf
            total_metric += m
            total_params += lik.segment_parameter_count(e - s)
        p = total_params + k
        if method == "bic":
            return total_metric + p * math.log(n)
        aic = total_metric + 2.0 * p
        if method == "aic":
            return aic
        # aicc
        if n <= p + 1.0:
            return math.inf
        corr = (2.0 * p * (p + 1.0)) / (n - p - 1.0)
        if math.isnan(corr) or math.isinf(corr):
            return math.inf
        return aic + corr
