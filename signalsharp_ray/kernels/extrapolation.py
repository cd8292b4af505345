"""Forecast / extrapolation kernels: linear trend, SES, Holt's method.

Reference semantics preserved exactly, including the quirks:
- Linear (/root/reference/SignalSharp/Extrapolation/Linear/LinearExtrapolator.cs
  :53-124): OLS over the last `window_size` points (default: whole signal);
  |denominator| < 1e-12 -> slope 0, intercept = mean; the forecast is ANCHORED
  at the last observed value: y_hat(h) = last_value + slope*h (NOT the fitted
  line).
- SES (/root/reference/SignalSharp/Extrapolation/ExponentialSmoothing/
  SimpleExponentialSmoothingExtrapolator.cs:36-71): level starts at
  initial_level or signal[0]; the update loop INCLUDES signal[0] (so with no
  initial level the first point is smoothed into an init level equal to
  itself); forecast = flat repeat of the final level.
- Holt (/root/reference/SignalSharp/Extrapolation/ExponentialSmoothing/
  HoltMethodExtrapolator.cs): additive or multiplicative trend, optional
  damping phi; L0 = initial_level or x[0]; T0 = initial_trend or x[1]-x[0]
  (additive) / x[1]/L0 (multiplicative); the update loop INCLUDES t=0 (:118);
  missing alpha/beta/phi -> grid search over [0,1] (phi in (eps, 1-eps))
  minimizing one-step-ahead SSE, grid evaluated in row-major order with
  strict '<' improvement (first minimum wins, :201-299); forecasts:
  additive L + (sum_{i=1..h} phi^i) T with phi==1 -> h*T (:540-558);
  multiplicative L * T^(sum phi^i) (:560-613); multiplicative requires
  strictly positive data/level/trend (epsilon 1e-12) else ValueError.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..common.constants import STRICT_EPSILON


# -- linear ---------------------------------------------------------------


def linear_forecast(signal, horizon: int, window_size: int | None = None) -> np.ndarray:
    x = np.asarray(signal, dtype=np.float64)
    if window_size is not None and window_size < 2:
        raise ValueError("window_size must be >= 2")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    n = x.size
    w = min(window_size or n, n)
    if w < 2:
        raise ValueError("Cannot fit linear trend with fewer than 2 points.")
    win = x[n - w :]
    xs = np.arange(w, dtype=np.float64)
    sum_x = xs.sum()
    sum_y = win.sum()
    sum_xy = float(xs @ win)
    sum_x2 = float(xs @ xs)
    denom = w * sum_x2 - sum_x * sum_x
    if abs(denom) < STRICT_EPSILON:
        slope = 0.0
    else:
        slope = (w * sum_xy - sum_x * sum_y) / denom
    last = x[-1]
    steps = np.arange(1, horizon + 1, dtype=np.float64)
    return last + slope * steps


# -- simple exponential smoothing ----------------------------------------


def ses_forecast(
    signal, horizon: int, alpha: float, initial_level: float | None = None
) -> np.ndarray:
    x = np.asarray(signal, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Signal cannot be empty.")
    if not (0.0 <= alpha <= 1.0):
        raise ValueError("alpha must be in [0, 1]")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    level = x[0] if initial_level is None else float(initial_level)
    for v in x:  # loop includes x[0] by reference semantics
        level = alpha * v + (1.0 - alpha) * level
    return np.full(horizon, level, dtype=np.float64)


# -- Holt's linear trend method ------------------------------------------

ADDITIVE = "additive"
MULTIPLICATIVE = "multiplicative"


@dataclass
class HoltOptions:
    alpha: float | None = None
    beta: float | None = None
    trend_type: str = ADDITIVE
    initial_level: float | None = None
    initial_trend: float | None = None
    damp_trend: bool = False
    phi: float | None = None
    optimization_grid_steps: int = 10

    def __post_init__(self):
        if self.alpha is not None and not (0.0 <= self.alpha <= 1.0):
            raise ValueError("alpha must be in [0, 1]")
        if self.beta is not None and not (0.0 <= self.beta <= 1.0):
            raise ValueError("beta must be in [0, 1]")
        if self.damp_trend and self.phi is not None and not (0.0 < self.phi < 1.0):
            raise ValueError("phi must be in (0, 1) when damping")
        if self.optimization_grid_steps <= 0:
            raise ValueError("optimization_grid_steps must be positive")
        if self.trend_type not in (ADDITIVE, MULTIPLICATIVE):
            raise ValueError("trend_type must be 'additive' or 'multiplicative'")


_EPS = STRICT_EPSILON  # NumericUtils.GetStrictEpsilon<double>() == 1e-12


class _HoltState:
    __slots__ = ("level", "trend")

    def __init__(self, level: float, trend: float):
        self.level = level
        self.trend = trend


def _holt_init(x: np.ndarray, opts: HoltOptions) -> _HoltState:
    level = x[0] if opts.initial_level is None else float(opts.initial_level)
    if opts.trend_type == MULTIPLICATIVE and level <= _EPS:
        raise ValueError("Initial level must be strictly positive for multiplicative trend.")
    if opts.trend_type == ADDITIVE:
        trend = (x[1] - x[0]) if opts.initial_trend is None else float(opts.initial_trend)
    else:
        if opts.initial_trend is not None:
            trend = float(opts.initial_trend)
            if trend <= _EPS:
                raise ValueError("Initial trend must be strictly positive for multiplicative trend.")
        else:
            if abs(level) < _EPS:
                raise ValueError("Initial level too close to zero for multiplicative trend.")
            trend = x[1] / level
            if trend <= _EPS:
                raise ValueError("Estimated initial multiplicative trend is non-positive.")
    return _HoltState(float(level), float(trend))


def _holt_update(
    value: float, st: _HoltState, alpha: float, beta: float, phi: float, mult: bool
) -> None:
    pl, pt = st.level, st.trend
    if not mult:
        comp = pl + phi * pt
        st.level = alpha * value + (1.0 - alpha) * comp
        st.trend = beta * (st.level - pl) + (1.0 - beta) * phi * pt
        return
    if pl <= _EPS:
        raise ValueError("Multiplicative update: previous level non-positive.")
    if pt <= _EPS and abs(phi) >= _EPS:
        raise ValueError("Multiplicative update: previous trend non-positive.")
    trend_pow_phi = pt ** phi if (pt > _EPS or abs(phi) < _EPS) else _raise_mult()
    comp = pl * trend_pow_phi
    st.level = alpha * value + (1.0 - alpha) * comp
    if st.level <= _EPS:
        raise ValueError("Multiplicative update: resulting level non-positive.")
    if abs(pl) < _EPS:
        raise ValueError("Multiplicative update: previous level too close to zero.")
    ratio = st.level / pl
    st.trend = beta * ratio + (1.0 - beta) * trend_pow_phi
    if st.trend <= _EPS:
        raise ValueError("Multiplicative update: resulting trend non-positive.")


def _raise_mult():
    raise ValueError("Multiplicative update: trend^phi undefined.")


def _holt_one_step_forecast(st: _HoltState, phi: float, mult: bool) -> float:
    if not mult:
        return st.level + phi * st.trend
    if st.level <= _EPS:
        raise ValueError("Cannot forecast: level non-positive.")
    if st.trend <= _EPS and abs(phi) >= _EPS:
        raise ValueError("Cannot forecast: trend non-positive.")
    factor = st.trend ** phi if (st.trend > _EPS or abs(phi) < _EPS) else _raise_mult()
    return st.level * factor


def _holt_sse(x: np.ndarray, opts: HoltOptions, alpha: float, beta: float, phi: float) -> float:
    mult = opts.trend_type == MULTIPLICATIVE
    try:
        st = _holt_init(x, opts)
        sse = 0.0
        for v in x:
            f = _holt_one_step_forecast(st, phi, mult)
            err = v - f
            sse += err * err
            if math.isnan(sse) or math.isinf(sse):
                return math.inf
            _holt_update(v, st, alpha, beta, phi, mult)
    except (ValueError, OverflowError, ZeroDivisionError):
        return math.inf
    return sse


def _holt_grid_search(x: np.ndarray, opts: HoltOptions) -> tuple[float, float, float]:
    steps = max(2, opts.optimization_grid_steps)
    step_size = 1.0 / (steps - 1)
    opt_alpha = opts.alpha is None
    opt_beta = opts.beta is None
    opt_phi = opts.damp_trend and opts.phi is None

    alphas = (
        [min(max(i * step_size, 0.0), 1.0) for i in range(steps)]
        if opt_alpha
        else [opts.alpha]
    )
    betas = (
        [min(max(j * step_size, 0.0), 1.0) for j in range(steps)]
        if opt_beta
        else [opts.beta]
    )
    if opt_phi:
        eps_gs = STRICT_EPSILON  # DoubleEpsilonForGridSearch == strict epsilon (1e-12)
        phi_step = (1.0 - 2 * eps_gs) / max(1, steps - 1)
        phis = [
            min(max(eps_gs + k * phi_step, eps_gs), 1.0 - eps_gs) for k in range(steps)
        ]
    else:
        phis = [opts.phi if opts.damp_trend else 1.0]

    best = (math.inf, math.nan, math.nan, math.nan)
    for a in alphas:
        for b in betas:
            for p in phis:
                sse = _holt_sse(x, opts, a, b, p)
                if not math.isnan(sse) and not math.isinf(sse) and sse < best[0]:
                    best = (sse, a, b, p)
    if math.isinf(best[0]) or math.isnan(best[1]):
        raise ValueError("Holt parameter optimization failed to find valid parameters.")
    _, a, b, p = best
    if not opts.damp_trend:
        p = 1.0
    return a, b, p


def holt_forecast(signal, horizon: int, options: HoltOptions | None = None) -> np.ndarray:
    opts = options or HoltOptions()
    x = np.asarray(signal, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Holt's method requires at least 2 data points.")
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    mult = opts.trend_type == MULTIPLICATIVE
    if mult and np.any(x <= _EPS):
        raise ValueError("Multiplicative trend requires strictly positive signal values.")

    if opts.alpha is None or opts.beta is None or (opts.damp_trend and opts.phi is None):
        alpha, beta, phi = _holt_grid_search(x, opts)
    else:
        alpha, beta = opts.alpha, opts.beta
        phi = opts.phi if opts.damp_trend else 1.0

    st = _holt_init(x, opts)
    for v in x:  # includes t=0 by reference semantics
        _holt_update(float(v), st, alpha, beta, phi, mult)

    out = np.empty(horizon, dtype=np.float64)
    phi_sum = 0.0
    phi_is_one = abs(phi - 1.0) < _EPS
    if mult and st.level <= _EPS:
        raise ValueError("Cannot extrapolate: fitted level non-positive.")
    if mult and st.trend <= _EPS and abs(phi) >= _EPS:
        raise ValueError("Cannot extrapolate: fitted trend non-positive.")
    for h in range(1, horizon + 1):
        phi_sum = float(h) if phi_is_one else phi_sum + phi ** h
        if not mult:
            out[h - 1] = st.level + phi_sum * st.trend
        else:
            if st.trend <= _EPS and abs(phi_sum) >= _EPS:
                raise ValueError("Cannot extrapolate: trend^exponent undefined.")
            factor = st.trend ** phi_sum if (st.trend > _EPS or abs(phi_sum) < _EPS) else 1.0
            out[h - 1] = st.level * factor
    return out


def holt_winters_forecast(
    signal,
    horizon: int,
    period: int = 24,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> np.ndarray:
    """Additive Holt-Winters (triple exponential smoothing) forecast —
    the seasonal extension of the Holt family above. No reference
    counterpart (emmorts/SignalSharp stops at double smoothing,
    Extrapolation/HoltMethodExtrapolator.cs); this operator's spec is the
    standard additive recurrence with the SQL-replicable initialization:

        L0 = mean(x[0:m])                 (exact integer sum / m)
        T0 = (sum(x[m:2m]) - sum(x[0:m])) / m^2
        s[i] = x[i] - L0                  for i in 0..m-1

        for t in m..n-1:
            so = s[t % m]
            L' = alpha*(x[t] - so) + (1-alpha)*(L + T)
            T' = beta*(L' - L) + (1-beta)*T
            s[t % m] = gamma*(x[t] - L') + (1-gamma)*so

        F_h = L + h*T + s[(n-1+h) % m]

    The scalar float recurrence is transcribed op-for-op into the
    recursive-CTE oracle (pipelines/queries3.py), which carries the
    m-element seasonal state as a SQL list — bitwise parity, the same
    contract as the EMA/CUSUM/Holt oracles. The (1-alpha)-style
    complements are taken as pre-evaluated literals on both sides.

    Requires n >= 2*period; state is O(period).
    """
    x = np.asarray(signal, dtype=np.float64)
    n = x.size
    m = period
    if n < 2 * m:
        raise ValueError("holt_winters_forecast requires n >= 2*period")
    ca, cb, cg = 1.0 - alpha, 1.0 - beta, 1.0 - gamma
    s1 = float(x[:m].sum())
    s2 = float(x[m : 2 * m].sum())
    level = s1 / m
    trend = (s2 - s1) / (m * m)
    seas = [float(v) - level for v in x[:m]]
    for t in range(m, n):
        v = float(x[t])
        so = seas[t % m]
        lp = alpha * (v - so) + ca * (level + trend)
        tp = beta * (lp - level) + cb * trend
        seas[t % m] = gamma * (v - lp) + cg * so
        level, trend = lp, tp
    out = np.empty(horizon, dtype=np.float64)
    for h in range(1, horizon + 1):
        out[h - 1] = level + h * trend + seas[(n - 1 + h) % m]
    return out
