"""Round-3 batch 105: distribution-identity and integrity operators —
the pairwise Kolmogorov-Smirnov distance between event types' value
distributions (all-integer D numerator over the merged centivalue
support, the ks_drift trick applied cross-type), the event_id gap
audit (are surrogate ids dense), and per-supplier active-day coverage
(distinct ship days over the ship-date span).

House parity: the KS numerator is max |cum_a * n_b - cum_b * n_a|
over merged integer support with earliest-value tie-break; id and day
audits are pure integer arithmetic.

Scale contracts: KS reduces per (type, centivalue) through one
exchange and compares bounded distinct-value lists per pair; audits
are bounded aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES103: dict = {}
ORACLES103: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Pairwise KS between type value distributions
# ---------------------------------------------------------------------------


def q_value_ks_pairs(sf_dir: str):
    """Per event_type pair (a < b): sample sizes and the exact KS
    distance between centivalue ECDFs — D = max over the merged
    support of |cum_a * n_b - cum_b * n_a| / (n_a * n_b), all
    integers until the final division."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "c": _cents(batch["value"]),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "c"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "c"],
        [("n", "sum")],
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"type_a": pd.Series(dtype=object),
         "type_b": pd.Series(dtype=object),
         "n_a": pd.Series(dtype=np.int64),
         "n_b": pd.Series(dtype=np.int64),
         "ks_d": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    types = sorted(agg["event_type"].unique().tolist())
    dist = {
        et: agg[agg["event_type"] == et]
        .sort_values("c")[["c", "n_sum"]]
        .to_numpy(np.int64)
        for et in types
    }
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            da, db = dist[a], dist[b]
            na = int(da[:, 1].sum())
            nb = int(db[:, 1].sum())
            support = np.union1d(da[:, 0], db[:, 0])
            ca = dict(zip(da[:, 0], np.cumsum(da[:, 1])))
            cb = dict(zip(db[:, 0], np.cumsum(db[:, 1])))
            best = 0
            cum_a = 0
            cum_b = 0
            for v in support:
                cum_a = int(ca.get(int(v), cum_a))
                cum_b = int(cb.get(int(v), cum_b))
                num = abs(cum_a * nb - cum_b * na)
                if num > best:
                    best = num
            rows.append(
                (a, b, na, nb,
                 float(_r6away(float(best) / float(na * nb))))
            )
    if not rows:
        return out_empty
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "n_a", "n_b", "ks_d"]
    ).astype({"n_a": np.int64, "n_b": np.int64})


ORACLES103["value_ks_pairs"] = """
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(n) AS nt FROM c GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.nt AS na, b.nt AS nb
  FROM tot a JOIN tot b ON a.event_type < b.event_type
),
support AS (
  SELECT p.ta, p.tb, s.v
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, v FROM c) s
    ON s.event_type IN (p.ta, p.tb)
  GROUP BY 1, 2, 3
),
cums AS (
  SELECT sp.ta, sp.tb, sp.v,
         COALESCE((SELECT SUM(ca.n) FROM c ca
                   WHERE ca.event_type = sp.ta AND ca.v <= sp.v), 0)
           AS cum_a,
         COALESCE((SELECT SUM(cb.n) FROM c cb
                   WHERE cb.event_type = sp.tb AND cb.v <= sp.v), 0)
           AS cum_b
  FROM support sp
),
d AS (
  SELECT cu.ta, cu.tb, p.na, p.nb,
         MAX(abs(cu.cum_a * p.nb - cu.cum_b * p.na)) AS num
  FROM cums cu JOIN pairs p ON p.ta = cu.ta AND p.tb = cu.tb
  GROUP BY 1, 2, 3, 4
)
SELECT ta AS type_a, tb AS type_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(CAST(num AS DOUBLE) / CAST(na * nb AS DOUBLE), 6) AS ks_d
FROM d
"""


# ---------------------------------------------------------------------------
# Event-id gap audit
# ---------------------------------------------------------------------------


def q_event_id_gap_audit(sf_dir: str):
    """One global row: event count, id bounds, missing ids inside the
    range, and duplicate-id count — surrogate-key integrity."""
    ev = _events(sf_dir, ["event_id"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "n": np.array([len(b)], dtype=np.int64),
                "lo": np.array(
                    [int(b["event_id"].min())], dtype=np.int64
                ),
                "hi": np.array(
                    [int(b["event_id"].max())], dtype=np.int64
                ),
                "nd": np.array(
                    [int(b["event_id"].nunique())], dtype=np.int64
                ),
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"n_events": pd.Series(dtype=np.int64),
         "min_id": pd.Series(dtype=np.int64),
         "max_id": pd.Series(dtype=np.int64),
         "n_missing": pd.Series(dtype=np.int64),
         "n_duplicates": pd.Series(dtype=np.int64)}
    )
    if ev.empty:
        return out_empty
    # distinct ids across batches need a global dedup pass
    distinct = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_id"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "event_id": b["event_id"].astype(np.int64),
                        "one": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("event_id", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["event_id"],
            [("one", "sum")],
        )
        .map_batches(
            lambda b: pd.DataFrame(
                {
                    "nd": np.array([len(b)], dtype=np.int64),
                    "dups": np.array(
                        [int((b["one_sum"].astype(np.int64) > 1).sum())],
                        dtype=np.int64,
                    ),
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    n = int(ev["n"].sum())
    lo = int(ev["lo"].min())
    hi = int(ev["hi"].max())
    nd = int(distinct["nd"].sum())
    dups = int(distinct["dups"].sum())
    return pd.DataFrame(
        {
            "n_events": np.array([n], dtype=np.int64),
            "min_id": np.array([lo], dtype=np.int64),
            "max_id": np.array([hi], dtype=np.int64),
            "n_missing": np.array([hi - lo + 1 - nd], dtype=np.int64),
            "n_duplicates": np.array([dups], dtype=np.int64),
        }
    )


ORACLES103["event_id_gap_audit"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(DISTINCT event_id)
            AS BIGINT) AS n_missing,
       CAST((SELECT COUNT(*) FROM (
               SELECT event_id FROM events GROUP BY 1 HAVING COUNT(*) > 1
             )) AS BIGINT) AS n_duplicates
FROM events
"""


# ---------------------------------------------------------------------------
# Supplier active-day coverage
# ---------------------------------------------------------------------------


def q_supplier_active_days(sf_dir: str):
    """Per supplier: distinct ship days, ship-date span in days, and
    the coverage share distinct/(span+1)."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["l_suppkey"].astype(np.int64),
                "day": (
                    b["l_shipdate"].astype("datetime64[us]").astype("int64")
                    // DAY_US
                ).astype(np.int64),
                "one": np.ones(len(b), dtype=np.int64),
            }
        ).drop_duplicates(subset=["suppkey", "day"]),
        batch_format="pandas",
    )
    per_day = hash_bucket_aggregate(
        li, ["suppkey", "day"], [("one", "max")]
    )
    agg = (
        hash_bucket_aggregate(
            per_day.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "suppkey": b["suppkey"].astype(np.int64),
                        "nd": np.ones(len(b), dtype=np.int64),
                        "lo": b["day"].astype(np.int64),
                        "hi": b["day"].astype(np.int64),
                    }
                )
                .groupby("suppkey", sort=False)
                .agg(nd=("nd", "sum"), lo=("lo", "min"), hi=("hi", "max"))
                .reset_index(),
                batch_format="pandas",
            ),
            ["suppkey"],
            [("nd", "sum"), ("lo", "min"), ("hi", "max")],
        )
        .to_pandas()
        .sort_values("suppkey")
    )
    span = (
        agg["hi_max"].astype(np.int64) - agg["lo_min"].astype(np.int64)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "suppkey": agg["suppkey"].astype(np.int64),
            "n_active_days": agg["nd_sum"].astype(np.int64),
            "span_days": span,
            "coverage": _r6away(
                agg["nd_sum"].to_numpy(np.float64)
                / (span.to_numpy(np.float64) + 1.0)
            ),
        }
    ).reset_index(drop=True)


ORACLES103["supplier_active_days"] = """
WITH d AS (
  SELECT DISTINCT l_suppkey AS suppkey,
         epoch_us(l_shipdate) // 86400000000 AS day
  FROM lineitem
),
a AS (
  SELECT suppkey, COUNT(*) AS nd, MIN(day) AS lo, MAX(day) AS hi
  FROM d GROUP BY 1
)
SELECT CAST(suppkey AS BIGINT) AS suppkey,
       CAST(nd AS BIGINT) AS n_active_days,
       CAST(hi - lo AS BIGINT) AS span_days,
       ROUND(CAST(nd AS DOUBLE) / (CAST(hi - lo AS DOUBLE) + 1.0), 6)
         AS coverage
FROM a
"""


QUERIES103["value_ks_pairs"] = q_value_ks_pairs
QUERIES103["event_id_gap_audit"] = q_event_id_gap_audit
QUERIES103["supplier_active_days"] = q_supplier_active_days
