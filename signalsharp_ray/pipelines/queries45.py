"""Round-3 batch 47: value-drift and dependency-concentration
diagnostics — per-type mean VALUE drift between window halves (did the
stake change even where volume didn't — the value companion of
halves_drift), and the top-part revenue share per supplier (how
dependent each of the top-10 suppliers is on its single best part).

House parity: half splits use the same exact integer midpoint as
halves_drift; value means divide exact centivalue sums; revenue is the
cents x discount-basis-points integer; argmax/top-k orders are
(revenue DESC, key ASC) over exact integers.

Scale contracts: (type, half) tables are bounded; per-(supplier, part)
revenue reduces through one exchange, the per-supplier argmax through
bucketed groups, and the final top-10 via per-batch candidate merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES45: dict = {}
ORACLES45: dict = {}

TOP_SUPPLIERS = 10


# ---------------------------------------------------------------------------
# Per-type value drift between halves
# ---------------------------------------------------------------------------


def q_value_halves_drift(sf_dir: str):
    """Per event type: mean event value in the first vs second half of
    the observation window (same exact integer midpoint as
    halves_drift; second half includes the midpoint) and their
    difference — stake drift that volume drift misses. Exact cents
    sums; types missing from either half excluded identically."""
    ev = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "ts_us": b["ts"].to_numpy("datetime64[us]").view(np.int64),
                "c": _cents(b["value"]),
            }
        ),
        batch_format="pandas",
    )
    bounds = ev.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [int(b["ts_us"].min())], "hi": [int(b["ts_us"].max())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    lo = int(bounds["lo"].min())
    hi = int(bounds["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        half = (b["ts_us"].to_numpy(np.int64) >= mid).astype(np.int64)
        return (
            pd.DataFrame(
                {"event_type": b["event_type"], "half": half, "c": b["c"]}
            )
            .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
            .groupby(["event_type", "half"], sort=False)
            .agg(n=("n", "sum"), s=("c", "sum"))
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "half"],
        [("n", "sum"), ("s", "sum")],
    ).to_pandas()
    piv = agg.pivot_table(
        index="event_type", columns="half", values=["n_sum", "s_sum"], aggfunc="sum"
    )
    rows = []
    for t in sorted(piv.index):
        try:
            n1 = int(piv[("n_sum", 0)][t])
            n2 = int(piv[("n_sum", 1)][t])
        except (KeyError, ValueError):
            continue
        if n1 == 0 or n2 == 0 or np.isnan(n1) or np.isnan(n2):
            continue
        s1 = int(piv[("s_sum", 0)][t])
        s2 = int(piv[("s_sum", 1)][t])
        m1 = float(s1) / float(n1) / 100.0
        m2 = float(s2) / float(n2) / 100.0
        rows.append(
            (t, n1, n2, float(_r6away(m1)), float(_r6away(m2)),
             float(_r6away(m2 - m1)))
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_first", "n_second", "mean_first",
                 "mean_second", "mean_shift"],
    ).astype({"n_first": np.int64, "n_second": np.int64})


ORACLES45["value_halves_drift"] = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
h AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) >= b.lo + (b.hi - b.lo) // 2
              THEN 1 ELSE 0 END AS half,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events CROSS JOIN b
),
a AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n2,
         CAST(COALESCE(SUM(c) FILTER (WHERE half = 0), 0) AS BIGINT) AS s1,
         CAST(COALESCE(SUM(c) FILTER (WHERE half = 1), 0) AS BIGINT) AS s2
  FROM h GROUP BY 1
)
SELECT event_type,
       n1 AS n_first, n2 AS n_second,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 6) AS mean_first,
       ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0, 6) AS mean_second,
       ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0
             - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0, 6) AS mean_shift
FROM a WHERE n1 > 0 AND n2 > 0
"""


# ---------------------------------------------------------------------------
# Top-part revenue share per supplier
# ---------------------------------------------------------------------------


def q_supplier_top_part_share(sf_dir: str):
    """For the 10 highest-revenue suppliers ((revenue DESC, suppkey
    ASC)): their total discounted revenue, their single best part
    ((part revenue DESC, partkey ASC)), and that part's share — a
    supplier living off one SKU is a fragile dependency. Exact
    cents x basis-point integers end to end."""
    li = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["l_suppkey"].astype(np.int64),
                "partkey": b["l_partkey"].astype(np.int64),
                "rev": _cents(b["l_extendedprice"])
                * np.rint(
                    (1.0 - b["l_discount"].to_numpy(np.float64)) * 100
                ).astype(np.int64),
            }
        )
        .groupby(["suppkey", "partkey"], sort=False)["rev"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    pair_rev = hash_bucket_aggregate(li, ["suppkey", "partkey"], [("rev", "sum")])

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["rev_sum"].sum())
        top = df.sort_values(["rev_sum", "partkey"], ascending=[False, True]).iloc[0]
        return pd.DataFrame(
            {
                "suppkey": np.array([int(df["suppkey"].iloc[0])], dtype=np.int64),
                "total_rev": np.array([tot], dtype=np.int64),
                "top_partkey": np.array([int(top["partkey"])], dtype=np.int64),
                "top_rev": np.array([int(top["rev_sum"])], dtype=np.int64),
            }
        )

    per_supp = bucketed_map_groups(pair_rev, ["suppkey"], argmax)
    top = (
        per_supp.map_batches(
            lambda b: b.sort_values(
                ["total_rev", "suppkey"], ascending=[False, True]
            ).head(TOP_SUPPLIERS),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["total_rev", "suppkey"], ascending=[False, True])
        .head(TOP_SUPPLIERS)
        .reset_index(drop=True)
    )
    share = [
        float(_r6away(float(int(tr)) / float(int(t))))
        for tr, t in zip(top["top_rev"], top["total_rev"])
    ]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "suppkey": top["suppkey"].astype(np.int64),
            "revenue": [
                float(_r6away(float(int(t)) / 10000.0)) for t in top["total_rev"]
            ],
            "top_partkey": top["top_partkey"].astype(np.int64),
            "top_part_share": share,
        }
    )


ORACLES45["supplier_top_part_share"] = f"""
WITH pr AS (
  SELECT l_suppkey AS sk, l_partkey AS pk,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT))
           AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2
),
s AS (
  SELECT sk, CAST(SUM(rev) AS BIGINT) AS total,
         MAX(rev) AS _maxrev
  FROM pr GROUP BY 1
),
tp AS (
  SELECT sk, pk, rev,
         ROW_NUMBER() OVER (PARTITION BY sk ORDER BY rev DESC, pk ASC) AS rn
  FROM pr
),
j AS (
  SELECT s.sk, s.total, tp.pk, tp.rev,
         ROW_NUMBER() OVER (ORDER BY s.total DESC, s.sk ASC) AS rank
  FROM s JOIN tp ON tp.sk = s.sk AND tp.rn = 1
)
SELECT CAST(rank AS BIGINT) AS rank,
       sk AS suppkey,
       ROUND(CAST(total AS DOUBLE) / 10000.0, 6) AS revenue,
       pk AS top_partkey,
       ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS top_part_share
FROM j WHERE rank <= {TOP_SUPPLIERS}
"""


QUERIES45["value_halves_drift"] = q_value_halves_drift
QUERIES45["supplier_top_part_share"] = q_supplier_top_part_share
