"""Gap-fill stage: make each (host, url) series dense on the tier's bucket
grid, synthesizing missing buckets by LOCF (forward-fill) or linear
interpolation.

No reference counterpart (the reference has index==time, so gaps cannot
exist); required by BASELINE.json north_rule. Semantics:
- grid = np.arange(first_bucket, last_bucket + tier, tier) per series
- locf: value = last observed mean (forward fill)
- linear: slope*(t-t0)+v0 between neighboring observed means (explicit
  separate numpy ops — bitwise np.interp-equivalent without FMA-contraction
  build dependence)
- synthesized buckets get gap_filled=True, count=0, sum/min/max=NaN
- ordering: the group is sorted by bucket_ts inside the kernel (groupby does
  not guarantee intra-group order)

Runs as groupby(host, url).map_groups — each series fully materialized in one
kernel call (same co-partitioning contract as the analysis stage).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .rollup import TIERS_US

GAPFILL_METHODS = ("locf", "linear")


def gapfill_arrays(
    ts: np.ndarray,
    mean_obs: np.ndarray,
    tier_us: int,
    method: str = "locf",
    max_gap_buckets: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Numpy-only core: (sorted ts int64, observed means) ->
    (grid, value, observed_mask, pos). Shared by the per-series DataFrame
    path and the fused whole-partition encode kernel."""
    if max_gap_buckets is not None:
        # enumerate only fillable gap slots + observed slots (never the
        # full dense range): bounded output regardless of series sparsity
        gaps = np.diff(ts) // tier_us - 1  # missing buckets between points
        fill_from = np.flatnonzero((gaps > 0) & (gaps <= max_gap_buckets))
        pieces = [ts]
        for i in fill_from:
            pieces.append(np.arange(ts[i] + tier_us, ts[i + 1], tier_us, dtype=np.int64))
        grid = np.sort(np.concatenate(pieces))
    else:
        grid = np.arange(ts[0], ts[-1] + tier_us, tier_us, dtype=np.int64)
    pos = np.searchsorted(ts, grid)
    observed = np.zeros(grid.size, dtype=bool)
    in_range = pos < ts.size
    observed[in_range] = ts[pos[in_range]] == grid[in_range]

    if method == "locf":
        # index of the last observed point at or before each grid slot
        last_idx = np.maximum(np.searchsorted(ts, grid, side="right") - 1, 0)
        value = mean_obs[last_idx]
    else:  # linear
        # explicit slope*(t-t0)+v0 with SEPARATE numpy multiply/add ops
        # (np.interp's fused C expression may FMA-contract on some builds,
        # drifting 1 ulp from a SQL engine's op-for-op evaluation; separate
        # ufunc calls cannot contract). Observed slots get v0 exactly
        # (slope * 0); the last interval clamps to a flat extension.
        idx = np.clip(np.searchsorted(ts, grid, side="right") - 1, 0, ts.size - 1)
        nxt = np.minimum(idx + 1, ts.size - 1)
        t0 = ts[idx].astype(np.float64)
        t1 = ts[nxt].astype(np.float64)
        v0 = mean_obs[idx]
        v1 = mean_obs[nxt]
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(t1 > t0, (v1 - v0) / (t1 - t0), 0.0)
        value = slope * (grid.astype(np.float64) - t0) + v0
    return grid, value, observed, pos


def gapfill_series(
    df: pd.DataFrame,
    tier_us: int,
    method: str = "locf",
    max_gap_buckets: int | None = None,
    key_cols: tuple = ("host", "url"),
) -> pd.DataFrame:
    """max_gap_buckets bounds the fill: a gap with more than this many
    missing buckets is left as a gap (its slots are dropped, not
    synthesized). None = fill everything. Bounding matters at scale — a url
    crawled twice a month must not explode into a dense 1-minute grid."""
    if method not in GAPFILL_METHODS:
        raise ValueError(f"Unknown gap-fill method {method!r}")
    df = df.sort_values("bucket_ts")
    ts = df["bucket_ts"].astype("datetime64[us]").astype("int64").to_numpy()
    if ts.size == 0:
        out = df.copy()
        out["gap_filled"] = np.array([], dtype=bool)
        return out
    mean_obs = df["mean"].to_numpy()
    grid, value, observed, pos = gapfill_arrays(
        ts, mean_obs, tier_us, method, max_gap_buckets
    )

    out = pd.DataFrame(
        {
            **{k: df[k].iloc[0] for k in key_cols},
            "bucket_ts": pd.to_datetime(grid, unit="us"),
            "value": value,
            "gap_filled": ~observed,
        }
    )
    # carry observed aggregates; synthesized buckets get count 0 / NaN stats
    for col, fill in (("count", 0), ("sum", np.nan), ("min", np.nan), ("max", np.nan)):
        vals = np.full(grid.size, fill, dtype=np.float64)
        vals[observed] = df[col].to_numpy()[pos[observed]]
        out[col] = vals.astype(np.int64) if col == "count" else vals
    return out


def gapfill_tier(
    tier_ds,
    tier: str,
    method: str = "locf",
    max_gap_buckets: int | None = None,
    key_cols: tuple = ("host", "url"),
):
    from ..common.raytools import bucketed_map_groups

    tier_us = TIERS_US[tier]
    return bucketed_map_groups(
        tier_ds,
        list(key_cols),
        lambda df: gapfill_series(df, tier_us, method, max_gap_buckets, key_cols),
    )
