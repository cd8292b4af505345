"""Round-3 batch 59: steadiness and reach diagnostics — monthly order
volatility (coefficient of variation of monthly order counts over the
multi-year history), per-type audience reach (distinct users touched
by each event type and the share of the whole user base), and the
label balance entropy of the embedding table (are the classes usable
or lopsided).

House parity: monthly counts and user dedups are exact integers; the
CV and entropy are single transcribed expressions (the entropy fold
runs over ascending label).

Scale contracts: monthly and label tables are bounded; user dedups
run inside one (type, user) exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES57: dict = {}
ORACLES57: dict = {}


# ---------------------------------------------------------------------------
# Monthly order volatility
# ---------------------------------------------------------------------------


def q_monthly_order_cv(sf_dir: str):
    """Coefficient of variation of monthly order counts — how lumpy
    demand is at the planning granularity. Exact integer counts and
    power sums; one transcribed expression."""
    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "month_us": b["o_orderdate"]
                .to_numpy("datetime64[us]")
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .view(np.int64),
            }
        )
        .groupby("month_us", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(orders, ["month_us"], [("n", "sum")]).to_pandas()
    v = agg["n_sum"].to_numpy(np.int64)
    m = int(v.size)
    s = int(v.sum())
    ss = sum(int(a) * int(a) for a in v)
    mf = float(m)
    mu = float(s) / mf
    var = float(ss) / mf - mu * mu
    cv = math.sqrt(var if var > 0.0 else 0.0) / mu
    return pd.DataFrame(
        {
            "n_months": np.array([m], dtype=np.int64),
            "mean_monthly": [float(_r6away(mu))],
            "cv": [float(_r6away(cv))],
        }
    )


ORACLES57["monthly_order_cv"] = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n
  FROM orders GROUP BY 1
),
a AS (
  SELECT COUNT(*) AS m,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n::HUGEINT * n::HUGEINT) AS BIGINT) AS ss
  FROM m
),
st AS (
  SELECT m, ss,
         CAST(s AS DOUBLE) / CAST(m AS DOUBLE) AS mu,
         CAST(ss AS DOUBLE) / CAST(m AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(m AS DOUBLE)) AS var
  FROM a
)
SELECT CAST(m AS BIGINT) AS n_months,
       ROUND(mu, 6) AS mean_monthly,
       ROUND(sqrt(GREATEST(var, CAST(0.0 AS DOUBLE))) / mu, 6) AS cv
FROM st
"""


# ---------------------------------------------------------------------------
# Per-type audience reach
# ---------------------------------------------------------------------------


def q_type_audience(sf_dir: str):
    """Per event type: distinct users it reaches and the share of the
    full user base — which actions are universal vs niche. Distinct
    (type, user) pairs dedup inside one exchange; one division."""
    ev = _events(sf_dir, ["event_type", "user_id"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "user_id": b["user_id"].astype(np.int64),
            }
        )
        .drop_duplicates()
        .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
        batch_format="pandas",
    )
    pairs = hash_bucket_aggregate(ev, ["event_type", "user_id"], [("one", "max")])
    per_type = (
        hash_bucket_aggregate(
            pairs.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "event_type": b["event_type"],
                        "u": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            ),
            ["event_type"],
            [("u", "sum")],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    total_users = int(
        hash_bucket_aggregate(
            pairs.map_batches(
                lambda b: pd.DataFrame(
                    {"user_id": b["user_id"].astype(np.int64)}
                ).drop_duplicates().assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
                batch_format="pandas",
            ),
            ["user_id"],
            [("one", "max")],
        )
        .map_batches(
            lambda b: pd.DataFrame({"n": np.array([len(b)], dtype=np.int64)}),
            batch_format="pandas",
        )
        .to_pandas()["n"]
        .sum()
    )
    share = [
        float(_r6away(float(int(u)) / float(total_users)))
        for u in per_type["u_sum"]
    ]
    return pd.DataFrame(
        {
            "event_type": per_type["event_type"],
            "n_users": per_type["u_sum"].astype(np.int64),
            "reach": share,
        }
    ).reset_index(drop=True)


ORACLES57["type_audience"] = """
WITH t AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS u
  FROM events GROUP BY 1
),
tot AS (SELECT COUNT(DISTINCT user_id) AS n FROM events)
SELECT t.event_type,
       CAST(t.u AS BIGINT) AS n_users,
       ROUND(CAST(t.u AS DOUBLE) / CAST(tot.n AS DOUBLE), 6) AS reach
FROM t CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Label balance entropy
# ---------------------------------------------------------------------------


def q_label_balance(sf_dir: str):
    """Embedding label distribution: per-label counts plus the Shannon
    entropy of the label mix against the ln(k) uniform ceiling —
    lopsided labels break classifier evaluation. Exact integer counts;
    the entropy fold runs over ascending label."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label"])
    agg = (
        hash_bucket_aggregate(
            ds.map_batches(
                lambda b: pd.DataFrame(
                    {"label": b["label"].astype(np.int64)}
                )
                .groupby("label", sort=False)
                .size()
                .reset_index(name="n")
                .astype({"n": np.int64}),
                batch_format="pandas",
            ),
            ["label"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("label")
    )
    s = int(agg["n_sum"].sum())
    f = _fold(
        [float(int(m)) * math.log(float(int(m))) for m in agg["n_sum"]]
    )
    h = math.log(float(s)) - f / float(s)
    k = len(agg)
    return pd.DataFrame(
        {
            "n_vecs": np.array([s], dtype=np.int64),
            "n_labels": np.array([k], dtype=np.int64),
            "entropy": [float(_r6away(h))],
            "max_entropy": [float(_r6away(math.log(float(k))))],
        }
    )


ORACLES57["label_balance"] = """
WITH c AS (
  SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n
  FROM embeddings GROUP BY 1
),
a AS (
  SELECT CAST(SUM(n) AS BIGINT) AS s,
         COUNT(*) AS k,
         list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                       ORDER BY label)) AS f
  FROM c
)
SELECT s AS n_vecs,
       CAST(k AS BIGINT) AS n_labels,
       ROUND(ln(CAST(s AS DOUBLE)) - f / CAST(s AS DOUBLE), 6) AS entropy,
       ROUND(ln(CAST(k AS DOUBLE)), 6) AS max_entropy
FROM a
"""


QUERIES57["monthly_order_cv"] = q_monthly_order_cv
QUERIES57["type_audience"] = q_type_audience
QUERIES57["label_balance"] = q_label_balance
