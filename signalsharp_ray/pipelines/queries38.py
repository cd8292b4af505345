"""Round-3 batch 40: fiscal and spike-rhythm diagnostics — the monthly
tax summary (taxable base, tax collected as the exact cents x
basis-point integer product, effective rate — the l_tax column's first
consumer), peak spacing (hours between consecutive p99 load spikes —
how periodic the extremes are, beside post_peak_decay's drain curve),
and the return rate per part type (which product families come back).

House parity: tax amounts are exact integer products of price cents
and tax basis points (HUGEINT sums); spike positions come from the
exact nearest-rank p99 on present hours and spacings are integer index
differences; return counts are exact integers through a co-partitioned
part join.

Scale contracts: monthly/typed tables are bounded; the trigger set is
grid-bounded; the part join is co-partitioned on partkey.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries14 import _dense_totals
from .queries16 import _cents_col, _read

QUERIES38: dict = {}
ORACLES38: dict = {}


# ---------------------------------------------------------------------------
# Monthly tax summary
# ---------------------------------------------------------------------------


def q_tax_summary_monthly(sf_dir: str):
    """Per ship month: lineitem count, taxable base (exact extended-
    price cents), tax collected (exact cents x tax-basis-point integer,
    descaled once), and the effective rate — the fiscal ledger view.
    One exchange; two transcribed divisions."""
    li = _read(
        sf_dir, "lineitem", ["l_shipdate", "l_extendedprice", "l_tax"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "month_us": b["l_shipdate"]
                .to_numpy("datetime64[us]")
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .view(np.int64),
                "pc": _cents_col(b["l_extendedprice"]),
                "tax_u": _cents_col(b["l_extendedprice"])
                * np.rint(b["l_tax"].to_numpy(np.float64) * 10000).astype(np.int64),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("month_us", sort=False)
        .agg(n=("n", "sum"), pc=("pc", "sum"), tax_u=("tax_u", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(
            li, ["month_us"], [("n", "sum"), ("pc", "sum"), ("tax_u", "sum")]
        )
        .to_pandas()
        .sort_values("month_us")
    )
    rows = []
    for _, r in agg.iterrows():
        n, pc, tu = int(r["n_sum"]), int(r["pc_sum"]), int(r["tax_u_sum"])
        rows.append(
            (
                int(r["month_us"]),
                n,
                pc,
                float(_r6away(float(tu) / 1000000.0)),
                float(_r6away(float(tu) / float(pc) / 10000.0)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["month_us", "n_items", "taxable_c", "tax_collected",
                 "effective_rate"],
    ).astype({"month_us": np.int64, "n_items": np.int64, "taxable_c": np.int64})


ORACLES38["tax_summary_monthly"] = """
WITH l AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * CAST(ROUND(l_tax * 10000) AS BIGINT) AS tax_u
  FROM lineitem
),
a AS (
  SELECT m, COUNT(*) AS n,
         CAST(SUM(pc) AS BIGINT) AS pc,
         CAST(SUM(tax_u) AS BIGINT) AS tu
  FROM l GROUP BY 1
)
SELECT CAST(epoch_us(m) AS BIGINT) AS month_us,
       CAST(n AS BIGINT) AS n_items,
       pc AS taxable_c,
       ROUND(CAST(tu AS DOUBLE) / 1000000.0, 6) AS tax_collected,
       ROUND(CAST(tu AS DOUBLE) / CAST(pc AS DOUBLE) / 10000.0, 6)
         AS effective_rate
FROM a
"""


# ---------------------------------------------------------------------------
# Peak spacing
# ---------------------------------------------------------------------------


def q_peak_spacing(sf_dir: str):
    """Spacing between consecutive p99 load spikes on the dense total
    grid (hours at or above the exact nearest-rank p99 of present
    hours): spike count, mean and max gap — are extremes periodic
    (diurnal resonance) or clustered. Pure integer index arithmetic;
    one transcribed division."""
    agg = _hourly_counts(sf_dir)
    per = agg.groupby("hour_us")["n_sum"].sum()
    present = np.sort(per.to_numpy(np.int64))
    npres = present.size
    thr = int(present[(99 * npres + 99) // 100 - 1])
    v = _dense_totals(sf_dir)
    trig = np.flatnonzero(v >= thr)
    gaps = np.diff(trig)
    n_gaps = int(gaps.size)
    if n_gaps == 0:
        return pd.DataFrame(
            {
                "n_peaks": np.array([int(trig.size)], dtype=np.int64),
                "n_gaps": np.array([0], dtype=np.int64),
                "mean_gap_h": [0.0],
                "max_gap_h": np.array([0], dtype=np.int64),
            }
        )
    total = int(gaps.sum())
    return pd.DataFrame(
        {
            "n_peaks": np.array([int(trig.size)], dtype=np.int64),
            "n_gaps": np.array([n_gaps], dtype=np.int64),
            "mean_gap_h": [float(_r6away(float(total) / float(n_gaps)))],
            "max_gap_h": np.array([int(gaps.max())], dtype=np.int64),
        }
    )


ORACLES38["peak_spacing"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
thr AS (
  SELECT n AS thr FROM (
    SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn, COUNT(*) OVER () AS cnt
    FROM h
  ) WHERE rn = (99 * cnt + 99) // 100
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
trig AS (
  SELECT d.idx,
         d.idx - LAG(d.idx) OVER (ORDER BY d.idx) AS gap
  FROM dense d CROSS JOIN thr WHERE d.v >= thr.thr
),
a AS (
  SELECT COUNT(*) AS n_peaks,
         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
         CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS total,
         CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS mx
  FROM trig
)
SELECT CAST(n_peaks AS BIGINT) AS n_peaks,
       n_gaps,
       ROUND(CASE WHEN n_gaps > 0
                  THEN CAST(total AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                  ELSE 0.0 END, 6) AS mean_gap_h,
       mx AS max_gap_h
FROM a
"""


# ---------------------------------------------------------------------------
# Return rate per part type
# ---------------------------------------------------------------------------


def q_returns_by_part_type(sf_dir: str):
    """Per part type: lineitem count, returned count ('R' flag) and the
    return rate — which product families come back
    (return_rate_monthly slices time; this slices the catalog). One
    co-partitioned part join; exact integer counts."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "r": (b["l_returnflag"] == "R").to_numpy(np.int64),
            }
        ),
        batch_format="pandas",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "ptype": b["p_type"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, part, on=["partkey"], how="inner")
    agg = hash_bucket_aggregate(
        joined.map_batches(
            lambda b: b.assign(n=lambda d: np.ones(len(d), dtype=np.int64))
            .groupby("ptype", sort=False)
            .agg(n=("n", "sum"), r=("r", "sum"))
            .reset_index(),
            batch_format="pandas",
        ),
        ["ptype"],
        [("n", "sum"), ("r", "sum")],
    ).to_pandas()
    rate = [
        float(_r6away(float(int(r)) / float(int(n))))
        for r, n in zip(agg["r_sum"], agg["n_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "p_type": agg["ptype"],
                "n_items": agg["n_sum"].astype(np.int64),
                "n_returned": agg["r_sum"].astype(np.int64),
                "return_rate": rate,
            }
        )
        .sort_values("p_type")
        .reset_index(drop=True)
    )


ORACLES38["returns_by_part_type"] = """
WITH j AS (
  SELECT p.p_type,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT p_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(r) AS BIGINT) AS n_returned,
       ROUND(CAST(SUM(r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS return_rate
FROM j GROUP BY 1
"""


QUERIES38["tax_summary_monthly"] = q_tax_summary_monthly
QUERIES38["peak_spacing"] = q_peak_spacing
QUERIES38["returns_by_part_type"] = q_returns_by_part_type
