"""Analysis stage: the reference's algorithms as distributed per-series
operators over rolled-up tier points.

Each operator is a groupby(host, url).map_groups kernel: the group is sorted
by bucket_ts inside the kernel (groupby does not guarantee intra-group
order), the numpy kernel from signalsharp_ray.kernels runs on the value
column, and the result is re-emitted as rows. Parallelism comes from the
number of series; per-series state never crosses a kernel call.

Quadratic-memory kernels (RBF, L1 medians) are guarded by max_series_len:
longer series are refused loudly rather than silently OOMing a worker —
callers should analyze a coarser tier instead (the whole point of rollup).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..kernels.cusum import CUSUMOptions, cusum_changepoints
from ..kernels.extrapolation import HoltOptions, holt_forecast, linear_forecast, ses_forecast
from ..kernels.kalman import KalmanOptions, kalman_filter
from ..kernels.pelt import PELT, PELTOptions
from ..kernels.penalty_selection import PELTPenaltySelector, PenaltySelectionOptions
from ..kernels.smoothing import (
    exponential_moving_average,
    savitzky_golay,
    simple_moving_average,
    weighted_moving_average,
)
from ..kernels.stats import zscore

QUADRATIC_COSTS = {"rbf", "l1"}
DEFAULT_MAX_SERIES_LEN = 20_000
QUADRATIC_MAX_SERIES_LEN = 4_000


def _sorted_series(df: pd.DataFrame, value_col: str) -> tuple[pd.DataFrame, np.ndarray]:
    df = df.sort_values("bucket_ts")
    return df, df[value_col].to_numpy(dtype=np.float64)


@dataclass
class ChangepointConfig:
    method: str = "pelt"  # pelt | pelt_auto | cusum
    cost: str = "l2"
    penalty: float = 10.0
    min_size: int = 1
    jump: int = 1
    cost_kwargs: dict = field(default_factory=dict)
    # cusum
    cusum: CUSUMOptions = field(default_factory=CUSUMOptions)
    normalize: bool = True  # z-score before CUSUM (reference test convention)
    # pelt_auto
    selection: PenaltySelectionOptions = field(default_factory=PenaltySelectionOptions)
    max_series_len: int | None = None

    def effective_cap(self) -> int:
        if self.max_series_len is not None:
            return self.max_series_len
        if self.cost in QUADRATIC_COSTS:
            return QUADRATIC_MAX_SERIES_LEN
        return DEFAULT_MAX_SERIES_LEN


def changepoints_kernel(
    df: pd.DataFrame,
    config: ChangepointConfig,
    value_col: str = "mean",
    key_cols: tuple = ("host", "url"),
) -> pd.DataFrame:
    df, values = _sorted_series(df, value_col)
    key_vals = {k: df[k].iloc[0] for k in key_cols}
    n = values.size
    if n > config.effective_cap():
        raise ValueError(
            f"Series {key_vals} has {n} points > cap {config.effective_cap()}; "
            "analyze a coarser tier."
        )
    penalty = config.penalty
    if config.method == "cusum":
        x = zscore(values) if config.normalize else values
        bkps = cusum_changepoints(x, config.cusum)
        penalty = float("nan")
    elif config.method == "pelt":
        opts = PELTOptions(
            cost_function=config.cost,
            min_size=config.min_size,
            jump=config.jump,
            cost_kwargs=config.cost_kwargs,
        )
        bkps = PELT(opts).fit_and_detect(values, config.penalty)
    elif config.method == "pelt_auto":
        opts = PELTOptions(
            cost_function=config.cost,
            min_size=config.min_size,
            jump=config.jump,
            cost_kwargs=config.cost_kwargs,
        )
        res = PELTPenaltySelector(PELT(opts)).fit_and_select(values, config.selection)
        bkps = res.optimal_breakpoints
        penalty = res.selected_penalty
    else:
        raise ValueError(f"Unknown changepoint method {config.method!r}")

    ts = df["bucket_ts"].to_numpy()
    k = len(bkps)
    out = {kk: np.repeat(v, k) for kk, v in key_vals.items()}
    out.update(
        {
            "method": np.repeat(config.method, k),
            "penalty": np.repeat(penalty, k),
            "breakpoint_index": np.asarray(bkps, dtype=np.int32),
            "breakpoint_ts": ts[np.asarray(bkps, dtype=np.int64)] if k else ts[:0],
        }
    )
    return pd.DataFrame(out)


def detect_changepoints(
    tier_ds,
    config: ChangepointConfig | None = None,
    value_col: str = "mean",
    key_cols: tuple = ("host", "url"),
):
    from ..common.raytools import bucketed_map_groups

    cfg = config or ChangepointConfig()
    return bucketed_map_groups(
        tier_ds,
        list(key_cols),
        lambda df: changepoints_kernel(df, cfg, value_col, key_cols),
    )


@dataclass
class SmoothingConfig:
    op: str = "sma"  # sma | ema | wma | savgol | kalman
    window: int = 5
    alpha: float = 0.3
    weights: tuple = (0.1, 0.3, 0.6)
    polyorder: int = 2
    deriv: int = 0
    padding: str = "nearest"  # same-length output for sliding ops
    padded_value: float = 0.0
    kalman: KalmanOptions = field(default_factory=KalmanOptions)


def smooth_kernel(
    df: pd.DataFrame, config: SmoothingConfig, value_col: str = "mean"
) -> pd.DataFrame:
    df, values = _sorted_series(df, value_col)
    op = config.op
    if op == "sma":
        sm = simple_moving_average(values, config.window, config.padding, config.padded_value)
    elif op == "ema":
        sm = exponential_moving_average(values, config.alpha)
    elif op == "wma":
        sm = weighted_moving_average(
            values, np.asarray(config.weights), config.padding, config.padded_value
        )
    elif op == "savgol":
        sm = savitzky_golay(
            values, config.window, config.polyorder, config.deriv, "none", 0.0
        )
    elif op == "kalman":
        sm = kalman_filter(values, config.kalman)
    else:
        raise ValueError(f"Unknown smoothing op {op!r}")
    out = df.copy()
    out["smoothed"] = sm  # same length by construction (padding != none)
    out["op"] = op
    return out


def smooth_series(tier_ds, config: SmoothingConfig | None = None, value_col: str = "mean"):
    from ..common.raytools import bucketed_map_groups

    cfg = config or SmoothingConfig()
    return bucketed_map_groups(
        tier_ds, ["host", "url"], lambda df: smooth_kernel(df, cfg, value_col)
    )


@dataclass
class ForecastConfig:
    method: str = "linear"  # linear | ses | holt
    horizon: int = 3
    window_size: int | None = None
    alpha: float = 0.3
    initial_level: float | None = None
    holt: HoltOptions = field(default_factory=HoltOptions)


def forecast_kernel(
    df: pd.DataFrame,
    config: ForecastConfig,
    tier_us: int,
    value_col: str = "mean",
    key_cols: tuple = ("host", "url"),
) -> pd.DataFrame:
    df, values = _sorted_series(df, value_col)
    key_vals = {k: df[k].iloc[0] for k in key_cols}
    try:
        if config.method == "linear":
            fc = linear_forecast(values, config.horizon, config.window_size)
        elif config.method == "ses":
            fc = ses_forecast(values, config.horizon, config.alpha, config.initial_level)
        elif config.method == "holt":
            fc = holt_forecast(values, config.horizon, config.holt)
        else:
            raise ValueError(f"Unknown forecast method {config.method!r}")
    except ValueError:
        # series too short / invalid for the model -> no forecast rows
        return pd.DataFrame(
            columns=list(key_cols) + ["method", "h", "forecast_ts", "forecast"]
        )
    last_ts = df["bucket_ts"].astype("datetime64[us]").astype("int64").iloc[-1]
    hs = np.arange(1, config.horizon + 1)
    out = {k: np.repeat(v, config.horizon) for k, v in key_vals.items()}
    out.update(
        {
            "method": np.repeat(config.method, config.horizon),
            "h": hs.astype(np.int32),
            "forecast_ts": pd.to_datetime(last_ts + hs * tier_us, unit="us"),
            "forecast": fc,
        }
    )
    return pd.DataFrame(out)


def forecast_series(tier_ds, tier_us: int, config: ForecastConfig | None = None, value_col: str = "mean"):
    from ..common.raytools import bucketed_map_groups

    cfg = config or ForecastConfig()
    return bucketed_map_groups(
        tier_ds,
        ["host", "url"],
        lambda df: forecast_kernel(df, cfg, tier_us, value_col, ("host", "url")),
    )
