"""Round-3 batch 41: point-process and ledger-state diagnostics — the
daily peak-hour histogram (which hour each day peaks, ties to the
earliest hour — the phase stability of the diurnal cycle), the Fano
factor at window sizes {1, 6, 24} hours (variance-to-mean of windowed
counts: ~1 Poisson, >1 clustered — the dispersion twin of
allan_variance), and the returnflag x linestatus contingency matrix
(the l_linestatus column's first consumer).

House parity: peak hours are integer argmaxes with deterministic
(count DESC, hour ASC) ties; Fano ingredients are exact integer
window sums and squares (HUGEINT) with one transcribed expression per
window size; the matrix is pure integer counts with one share
division.

Scale contracts: day tables are retention-bounded; window bins reduce
from the dense grid; the flag matrix is 3x2-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _dense_totals
from .queries16 import _read

QUERIES39: dict = {}
ORACLES39: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
FANO_WINDOWS = (1, 6, 24)


# ---------------------------------------------------------------------------
# Daily peak-hour histogram
# ---------------------------------------------------------------------------


def q_daily_peak_hour(sf_dir: str):
    """For each day: the hour-of-day with the highest total load
    ((count DESC, hour ASC) ties), histogrammed over hours 0-23 — a
    tight histogram means the diurnal peak is phase-stable. Pure
    integer comparisons."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "hod": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
                )
                % 24,
            }
        )
        .groupby(["day_us", "hod"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(ev, ["day_us", "hod"], [("n", "sum")]).to_pandas()
    peaks = []
    for d, g in agg.groupby("day_us"):
        g = g.sort_values(["n_sum", "hod"], ascending=[False, True])
        peaks.append(int(g["hod"].iloc[0]))
    vc = pd.Series(peaks).value_counts()
    return (
        pd.DataFrame(
            {
                "peak_hod": vc.index.to_numpy(np.int64),
                "n_days": vc.to_numpy(np.int64),
            }
        )
        .sort_values("peak_hod")
        .reset_index(drop=True)
    )


ORACLES39["daily_peak_hour"] = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT day, hod,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, hod ASC) AS rn
  FROM c
)
SELECT CAST(hod AS BIGINT) AS peak_hod,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM p WHERE rn = 1 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Fano factor over window sizes
# ---------------------------------------------------------------------------


def q_fano_factor(sf_dir: str):
    """Fano factor (variance / mean of windowed counts) of total load
    at window sizes {1, 6, 24} hours over the dense grid — ~1 means
    Poisson arrivals at that timescale, larger means clustering
    (allan_variance tracks drift; this tracks dispersion). Window sums
    and squares are exact integers; one transcribed expression per
    size."""
    v = _dense_totals(sf_dir)
    rows = []
    for w in FANO_WINDOWS:
        nb = v.size // w
        if nb < 2:
            continue
        y = v[: nb * w].reshape(nb, w).sum(axis=1)
        s = int(y.sum())
        ss = sum(int(a) * int(a) for a in y)
        nf = float(nb)
        mu = float(s) / nf
        var = float(ss) / nf - mu * mu
        rows.append(
            (
                w,
                nb,
                float(_r6away(mu)),
                float(_r6away(var)),
                float(_r6away(var / mu)),
            )
        )
    return pd.DataFrame(
        rows, columns=["window_h", "n_bins", "mean_count", "var_count", "fano"]
    ).astype({"window_h": np.int64, "n_bins": np.int64})


ORACLES39["fano_factor"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx
  FROM grid g LEFT JOIN h USING (bh)
),
tot AS (SELECT COUNT(*) AS n FROM dense),
ws AS (SELECT unnest([1, 6, 24]) AS w),
bins AS (
  SELECT ws.w, d.idx // ws.w AS j, CAST(SUM(d.v) AS BIGINT) AS y
  FROM dense d CROSS JOIN ws, tot
  WHERE d.idx < (tot.n // ws.w) * ws.w
  GROUP BY 1, 2
),
a AS (
  SELECT w, COUNT(*) AS nb,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(SUM(y::HUGEINT * y::HUGEINT) AS BIGINT) AS ss
  FROM bins GROUP BY 1 HAVING COUNT(*) >= 2
),
m AS (
  SELECT w, nb, ss,
         CAST(s AS DOUBLE) / CAST(nb AS DOUBLE) AS mu,
         CAST(ss AS DOUBLE) / CAST(nb AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(nb AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(nb AS DOUBLE)) AS var
  FROM a
)
SELECT CAST(w AS BIGINT) AS window_h,
       CAST(nb AS BIGINT) AS n_bins,
       ROUND(mu, 6) AS mean_count,
       ROUND(var, 6) AS var_count,
       ROUND(var / mu, 6) AS fano
FROM m
"""


# ---------------------------------------------------------------------------
# Returnflag x linestatus matrix
# ---------------------------------------------------------------------------


def q_status_flag_matrix(sf_dir: str):
    """Lineitem counts per (returnflag, linestatus) with the overall
    share — the fulfilment-state ledger (the classic Q1 grouping,
    counts-only view). One bounded exchange; one share division."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"]).map_batches(
        lambda b: b.groupby(["l_returnflag", "l_linestatus"], sort=False)
        .size()
        .reset_index(name="n")
        .rename(columns={"l_returnflag": "returnflag", "l_linestatus": "linestatus"})
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(li, ["returnflag", "linestatus"], [("n", "sum")])
        .to_pandas()
        .sort_values(["returnflag", "linestatus"])
    )
    total = int(agg["n_sum"].sum())
    share = [
        float(_r6away(float(int(n)) / float(total))) for n in agg["n_sum"]
    ]
    return pd.DataFrame(
        {
            "returnflag": agg["returnflag"],
            "linestatus": agg["linestatus"],
            "n_items": agg["n_sum"].astype(np.int64),
            "share": share,
        }
    ).reset_index(drop=True)


ORACLES39["status_flag_matrix"] = """
WITH a AS (
  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
)
SELECT returnflag, linestatus,
       CAST(n AS BIGINT) AS n_items,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share
FROM a
"""


QUERIES39["daily_peak_hour"] = q_daily_peak_hour
QUERIES39["fano_factor"] = q_fano_factor
QUERIES39["status_flag_matrix"] = q_status_flag_matrix
