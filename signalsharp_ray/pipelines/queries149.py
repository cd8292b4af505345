"""Round-4 batch 149: process capability — the SPC Cp / Cpk indices of
event values against the fixed [0, 400] spec band (the apdex bounds the
stream is engineered to): Cp = (USL - LSL) / (6 sigma) asks whether the
process COULD fit the band, Cpk = min(USL - mu, mu - LSL) / (3 sigma)
whether it actually does, off-center and all — the acceptance sheet
beside the Shewhart/EWMA control charts.

House parity: mu and sigma derive from exact centivalue power sums
(population sigma, the cohens_d convention); Cp and Cpk are transcribed
float expressions; spec limits are integer cent constants.

Scale contracts: one per-type exchange of (n, s, ss) integers."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES149: dict = {}
ORACLES149: dict = {}

SPEC_LSL_C = 0  # cents
SPEC_USL_C = 40_000  # 400.00 in cents


def q_process_capability(sf_dir: str):
    """Per event_type: n, mean and population sd of exact centivalues,
    and the capability indices against [0, 400]: Cp = (USL - LSL)/(6 sd)
    and Cpk = min(USL - mu, mu - LSL)/(3 sd) — Cpk >= 1.33 is the
    classic 4-sigma acceptance bar. Zero-variance types are excluded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "n": np.ones(len(batch), dtype=np.int64),
                    "s": c,
                    "ss": c * c,
                }
            )
            .groupby("event_type", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type"],
            [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    rows = []
    for _, r in agg.iterrows():
        n = int(r["n_sum"])
        s = int(r["s_sum"])
        ss = int(r["ss_sum"])
        var_num = n * ss - s * s  # n^2 * population var, exact
        if var_num <= 0:
            continue
        mu = float(s) / float(n)
        sd = math.sqrt(float(var_num)) / float(n)
        cp = (float(SPEC_USL_C) - float(SPEC_LSL_C)) / (6.0 * sd)
        upper = float(SPEC_USL_C) - mu
        lower = mu - float(SPEC_LSL_C)
        cpk = (upper if upper < lower else lower) / (3.0 * sd)
        rows.append(
            (
                r["event_type"],
                n,
                float(_r6away(mu)),
                float(_r6away(sd)),
                float(_r6away(cp)),
                float(_r6away(cpk)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_events", "mu_c", "sd_c", "cp", "cpk"],
    ).astype({"n_events": np.int64})


ORACLES149["process_capability"] = f"""
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM b GROUP BY 1
),
f AS (
  SELECT event_type, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE))
           / CAST(n AS DOUBLE) AS sd
  FROM g WHERE n * ss - CAST(s AS HUGEINT) * s > 0
)
SELECT event_type, n AS n_events,
       ROUND(mu, 6) AS mu_c, ROUND(sd, 6) AS sd_c,
       ROUND((CAST({SPEC_USL_C} AS DOUBLE) - CAST({SPEC_LSL_C} AS DOUBLE))
             / (CAST(6.0 AS DOUBLE) * sd), 6) AS cp,
       ROUND(least(CAST({SPEC_USL_C} AS DOUBLE) - mu,
                   mu - CAST({SPEC_LSL_C} AS DOUBLE))
             / (CAST(3.0 AS DOUBLE) * sd), 6) AS cpk
FROM f
"""


QUERIES149["process_capability"] = q_process_capability
