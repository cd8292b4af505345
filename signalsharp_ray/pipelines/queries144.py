"""Round-4 batch 144: second-order distribution audits — the Benford
SECOND-digit test (the follow-up fraud screen when first digits pass:
fabricators get the leading digit right and the second one wrong), and
the Kolmogorov-Smirnov distance of event interarrival gaps from the
fitted exponential (is the arrival process actually Poisson in TIME —
the companion of poisson_goodness_of_fit, which tests counts).

House parity: digit counts are exact string extractions from the
centivalue integer (identical on both engines); the Benford expectation
folds log10 terms over ascending first digit; the KS statistic is a
MAX over per-point float expressions (order-free — no float summation
anywhere), with F(g) = 1 - exp(-g/mean) sharing libm exp and the exact
integer-ratio mean.

Scale contracts: digit counts pre-reduce in-batch; gaps compute under
the per-type bucketed_map_groups contract over sorted event times."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES144: dict = {}
ORACLES144: dict = {}


# ---------------------------------------------------------------------------
# Benford second-digit audit
# ---------------------------------------------------------------------------


def q_benford_second_digit(sf_dir: str):
    """Per second digit (0-9) of the exact centivalue integer (values
    with at least two digits): observed count and share next to the
    Benford second-digit expectation sum over first digits d1 of
    log10(1 + 1/(10*d1 + d2)) — the audit run after first digits pass.
    Counts are exact; the expectation folds d1 ascending."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        c = np.abs(c)
        keep = c >= 10
        digits = np.array(
            [int(str(int(x))[1]) for x in c[keep]], dtype=np.int64
        )
        return (
            pd.DataFrame(
                {
                    "digit": digits,
                    "n": np.ones(digits.size, dtype=np.int64),
                }
            )
            .groupby("digit", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["digit"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("digit")
    )
    total = int(agg["n_sum"].sum())
    rows = []
    for _, r in agg.iterrows():
        d2 = int(r["digit"])
        n = int(r["n_sum"])
        exp = 0.0
        for d1 in range(1, 10):  # ascending-d1 fold
            exp = exp + math.log10(
                1.0 + 1.0 / float(10 * d1 + d2)
            )
        rows.append(
            (
                d2,
                n,
                float(_r6away(float(n) / float(total))),
                float(_r6away(exp)),
            )
        )
    return pd.DataFrame(
        rows, columns=["digit", "n_values", "observed", "benford_expected"]
    ).astype({"digit": np.int64, "n_values": np.int64})


ORACLES144["benford_second_digit"] = """
WITH b AS (
  SELECT abs(CAST(ROUND(value * 100) AS BIGINT)) AS c FROM events
),
d AS (
  SELECT CAST(substring(CAST(c AS VARCHAR), 2, 1) AS BIGINT) AS digit
  FROM b WHERE c >= 10
),
g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
d1s AS (SELECT unnest(generate_series(1, 9)) AS d1)
SELECT g.digit, CAST(g.n AS BIGINT) AS n_values,
       ROUND(CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS observed,
       ROUND((SELECT list_sum(list(
                log10(CAST(1.0 AS DOUBLE)
                      + CAST(1.0 AS DOUBLE)
                        / CAST(10 * d1s.d1 + g.digit AS DOUBLE))
                ORDER BY d1s.d1)) FROM d1s), 6) AS benford_expected
FROM g CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Exponential KS over interarrival gaps
# ---------------------------------------------------------------------------


def q_gap_exponential_ks(sf_dir: str):
    """Per event_type: the two-sided KS distance between the empirical
    CDF of interarrival gaps (sorted by ts, event_id; gaps in exact
    microseconds) and the exponential with the matched mean (exact
    integer ratio total_gap/n): D = max_i max(i/n - F(g_(i)),
    F(g_(i)) - (i-1)/n) with F(g) = 1 - exp(-g/mean). D near 0 =
    memoryless arrivals; a large D (with the bursty-side sign) is the
    clumping signature. Max over per-point doubles — no float
    summation."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        if ts.size < 3:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "mean_gap_us": pd.Series([], dtype=np.float64),
                    "ks_d": pd.Series([], dtype=np.float64),
                }
            )
        gaps = np.sort(ts[1:] - ts[:-1]).astype(np.int64)
        n = gaps.size
        total = int(gaps.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "n_gaps": pd.Series([], dtype=np.int64),
                    "mean_gap_us": pd.Series([], dtype=np.float64),
                    "ks_d": pd.Series([], dtype=np.float64),
                }
            )
        mean = float(total) / float(n)
        d = 0.0
        for i in range(n):
            fi = 1.0 - math.exp(-float(gaps[i]) / mean)
            hi = float(i + 1) / float(n) - fi
            lo = fi - float(i) / float(n)
            if hi > d:
                d = hi
            if lo > d:
                d = lo
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_gaps": np.array([n], dtype=np.int64),
                "mean_gap_us": [float(_r6away(mean))],
                "ks_d": [float(_r6away(d))],
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "ts", "event_id"]),
        ["event_type"],
        fn,
    )


ORACLES144["gap_exponential_ks"] = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
g AS (SELECT event_type, gap FROM s WHERE gap IS NOT NULL),
m AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(gap) AS BIGINT) AS total
  FROM g GROUP BY 1 HAVING COUNT(*) >= 2 AND SUM(gap) > 0
),
r AS (
  SELECT g.event_type, g.gap,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.gap) AS i,
         m.n, m.total
  FROM g JOIN m USING (event_type)
),
d AS (
  SELECT event_type, n, total,
         MAX(greatest(
           CAST(i AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(1.0 AS DOUBLE)
                - exp(-CAST(gap AS DOUBLE)
                      / (CAST(total AS DOUBLE) / CAST(n AS DOUBLE)))),
           (CAST(1.0 AS DOUBLE)
            - exp(-CAST(gap AS DOUBLE)
                  / (CAST(total AS DOUBLE) / CAST(n AS DOUBLE))))
             - CAST(i - 1 AS DOUBLE) / CAST(n AS DOUBLE))) AS ks
  FROM r GROUP BY 1, 2, 3
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(total AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_us,
       ROUND(ks, 6) AS ks_d
FROM d
"""


QUERIES144["benford_second_digit"] = q_benford_second_digit
QUERIES144["gap_exponential_ks"] = q_gap_exponential_ks
