"""PELT changepoint detection (exact DP with pruning).

Semantics match /root/reference/SignalSharp/Detection/PELT/PELTAlgorithm.cs:
- F[0] = -penalty; F[t] minimal cost of segmenting [0, t) (:199-217)
- for each endpoint t >= MinSize, minimize F[s] + cost(s, t) + penalty over
  admissible candidates s, iterating BACKWARDS from t - MinSize with step
  Jump (:215-268); Jump == 1 is exact PELT, Jump > 1 the reference's
  approximate variant (including its quirk of re-checking index 0 via
  prevCpCandidate = Jump when the backward loop would skip below 0)
- cost-computation errors for a candidate are skipped, not fatal (:236-257)
- pruning: keep s admissible iff F[s] + cost(s, t) <= F[t]; segments still
  shorter than MinSize stay admissible while F[s] is finite; errors during the
  pruning check conservatively keep s (:287-338)
- breakpoints = ascending segment-start indices ("first point after the
  change") from backtracking CP (:349-383)
- signals shorter than 2*MinSize -> no changepoints (:137-150)

Parallelism note: the DP is inherently sequential per series; the distributed
engine gets parallelism from millions of (host,url) groups, each series
fitting one map_groups kernel call.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..common.exceptions import UninitializedDataError
from .costs import CostFunction, L2Cost, make_cost

# scalar-DP fast-path cutoff for univariate L2 (see PELT._segment_small_l2);
# tests set this to 0 to force the vectorized path for parity comparison
_SMALL_N_FAST_PATH = 256


@dataclass
class PELTOptions:
    """Mirrors PELTOptions.cs:26-52 (defaults: L2, MinSize=1, Jump=1)."""

    cost_function: CostFunction | str = field(default="l2")
    min_size: int = 1
    jump: int = 1
    cost_kwargs: dict = field(default_factory=dict)

    def resolve_cost(self) -> CostFunction:
        if isinstance(self.cost_function, str):
            return make_cost(self.cost_function, **self.cost_kwargs)
        return self.cost_function

    def __post_init__(self):
        if self.min_size <= 0:
            raise ValueError("min_size must be positive")
        if self.jump <= 0:
            raise ValueError("jump must be positive")


class PELT:
    def __init__(self, options: PELTOptions | None = None):
        self.options = options or PELTOptions()
        self.cost = self.options.resolve_cost()
        self._n: int | None = None

    def fit(self, signal) -> "PELT":
        arr = np.asarray(signal, dtype=np.float64)
        self._n = arr.shape[-1]
        self.cost.fit(arr)
        return self

    def detect(self, penalty: float) -> np.ndarray:
        if self._n is None:
            raise UninitializedDataError("fit() must be called before detect().")
        if penalty < 0:
            raise ValueError("penalty must be non-negative")
        n = self._n
        min_size = self.options.min_size
        if n < min_size or n < min_size * 2:
            return np.array([], dtype=np.int64)
        cp = self._segment(penalty)
        return self._extract_breakpoints(cp)

    def fit_and_detect(self, signal, penalty: float) -> np.ndarray:
        return self.fit(signal).detect(penalty)

    # -- core DP ---------------------------------------------------------

    def _segment(self, penalty: float) -> np.ndarray:
        n = self._n
        min_size = self.options.min_size
        jump = self.options.jump
        cost = self.cost

        # pure-Python fast path for SHORT univariate L2 series: the numpy
        # candidate/pruning batches cost ~10us of array overhead per DP
        # step, which dominates tiny series (measured 314us for n=7 -> the
        # 100-TB shape is millions of such series). Scalar-float DP computes
        # the IDENTICAL operations in the identical order (np.cumsum is
        # sequential; the cost formula and tie-break are transcribed
        # op-for-op), property-tested equal in tests/test_pelt.py.
        if (
            jump == 1
            and isinstance(cost, L2Cost)
            and cost._n_dims == 1
            and n <= _SMALL_N_FAST_PATH
        ):
            return self._segment_small_l2(penalty)

        F = np.full(n + 1, math.inf)
        F[0] = -penalty
        CP = np.zeros(n + 1, dtype=np.int64)
        admissible: set[int] = {0}

        # fast vectorized path: exact mode with a batch-capable cost
        vectorized = jump == 1 and hasattr(cost, "segment_costs")

        for t in range(min_size, n + 1):
            best_cost = math.inf
            best_prev = 0

            if vectorized:
                cands = np.fromiter(
                    (s for s in admissible if s <= t - min_size),
                    dtype=np.int64,
                )
                if cands.size:
                    seg_costs = cost.segment_costs(cands, t)
                    totals = F[cands] + seg_costs + penalty
                    k = int(np.argmin(totals))
                    # the reference iterates backwards and keeps strict '<',
                    # so among ties the LARGEST candidate index encountered
                    # first wins; argmin returns the first occurrence in our
                    # (unsorted) candidate order — resolve ties explicitly.
                    m = totals[k]
                    if math.isfinite(m):
                        ties = cands[totals == m]
                        best_prev = int(ties.max())
                        best_cost = float(m)
            else:
                s = t - min_size
                while s >= 0:
                    if s in admissible:
                        try:
                            seg_cost = cost.compute_cost(s, t)
                            total = F[s] + seg_cost + penalty
                            if total < best_cost:
                                best_cost = total
                                best_prev = s
                        except Exception:
                            pass  # reference logs and skips (:247-257)
                        # reference quirk (PELTAlgorithm.cs:259-267): in jump
                        # mode, when the ADMISSIBLE candidate just processed
                        # sits in (0, jump) and 0 is admissible, reset the
                        # cursor to `jump` so the decrement below lands on 0.
                        # The reset is skipped when the candidate itself was
                        # not admissible (the `continue` at :226-234 bypasses
                        # the bottom of the loop body).
                        if jump > 1 and 0 < s < jump and 0 in admissible:
                            s = jump
                    s -= jump

            if math.isinf(best_cost):
                F[t] = math.inf
                CP[t] = -1
            else:
                F[t] = best_cost
                CP[t] = best_prev

            # pruning
            next_adm: set[int] = set()
            if vectorized:
                adm = np.fromiter(admissible, dtype=np.int64)
                ready = adm[adm <= t - min_size]
                young = adm[adm > t - min_size]
                if ready.size:
                    seg_costs = cost.segment_costs(ready, t)
                    keep = F[ready] + seg_costs <= F[t]
                    next_adm.update(int(s) for s in ready[keep])
                next_adm.update(int(s) for s in young if math.isfinite(F[s]))
            else:
                for s in admissible:
                    if t - s >= min_size:
                        try:
                            if F[s] + cost.compute_cost(s, t) <= F[t]:
                                next_adm.add(s)
                        except Exception:
                            if math.isfinite(F[s]):
                                next_adm.add(s)
                    elif math.isfinite(F[s]):
                        next_adm.add(s)
            if math.isfinite(F[t]):
                next_adm.add(t)
            admissible = next_adm

        return CP

    def _segment_small_l2(self, penalty: float) -> np.ndarray:
        """Scalar-float transcription of the vectorized DP for univariate
        L2 (jump == 1). Output-identical: same prefix sums (sequential
        accumulation == np.cumsum), same cost expression
        (seg2 - seg*seg/len), same F/CP updates, same largest-index
        tie-break, same pruning rule."""
        n = self._n
        min_size = self.options.min_size
        # prefix sums from the fitted cost (row 0 of the (1, n) matrices)
        ps1 = self.cost._ps[0]
        ps2 = self.cost._ps2[0]
        s1 = [float(v) for v in ps1]
        s2 = [float(v) for v in ps2]

        inf = math.inf
        F = [inf] * (n + 1)
        F[0] = -penalty
        CP = [0] * (n + 1)
        admissible = [0]

        for t in range(min_size, n + 1):
            st1 = s1[t]
            st2 = s2[t]
            limit = t - min_size
            best = inf
            best_prev = -1
            costs = {}
            for s in admissible:
                if s <= limit:
                    d1 = st1 - s1[s]
                    c = (st2 - s2[s]) - d1 * d1 / (t - s)
                    costs[s] = c
                    total = F[s] + c + penalty
                    if total < best:
                        best = total
                        best_prev = s
                    elif total == best and s > best_prev:
                        best_prev = s
            if best == inf or best_prev < 0 or math.isinf(best):
                F[t] = inf
                CP[t] = -1
            else:
                F[t] = best
                CP[t] = best_prev
            ft = F[t]
            next_adm = []
            for s in admissible:
                if s in costs:
                    if F[s] + costs[s] <= ft:
                        next_adm.append(s)
                elif s > limit and not math.isinf(F[s]):
                    next_adm.append(s)
            if not math.isinf(ft):
                next_adm.append(t)
            admissible = next_adm

        return np.asarray(CP, dtype=np.int64)

    def _extract_breakpoints(self, cp: np.ndarray) -> np.ndarray:
        out: list[int] = []
        idx = self._n
        while idx > 0:
            prev = int(cp[idx])
            if prev <= 0:
                break
            out.append(prev)
            idx = prev
        out.reverse()
        return np.asarray(out, dtype=np.int64)


def pelt_breakpoints(
    signal,
    penalty: float,
    cost: str | CostFunction = "l2",
    min_size: int = 1,
    jump: int = 1,
    **cost_kwargs,
) -> np.ndarray:
    """Convenience one-shot API used by the Ray analysis stage."""
    opts = PELTOptions(cost_function=cost, min_size=min_size, jump=jump, cost_kwargs=cost_kwargs)
    return PELT(opts).fit_and_detect(signal, penalty)
