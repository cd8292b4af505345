"""Round-3 batch 96: lexical-law and wallet-band operators — the Zipf
slope per source (does each source keep the corpus's rank-frequency
law), the order rate by customer balance band (wallet vs activity),
and the brevity-law correlation (Zipf's law of abbreviation: frequent
words are shorter — Pearson between token length and ln frequency over
the corpus vocabulary).

House parity: per-source Zipf mirrors the verified zipf_fit machinery
(top-50 by (count DESC, token ASC), ascending-rank OLS folds with libm
logs); balance bands shift positive before floor division (DuckDB //
truncates toward zero on negatives — the lead_time_histogram rule);
the brevity correlation folds five sums ascending the token string.

Scale contracts: token counts reduce distributed; the per-source
top-50 and the vocabulary folds are bounded combines (sources x 50,
alphabet-bounded vocabulary).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries14 import _fold
from .queries16 import _read, _TOKEN_RE

QUERIES94: dict = {}
ORACLES94: dict = {}

BAND_SHIFT = 10  # bands of $1000, shifted +10 so negatives floor correctly


def _token_counts(sf_dir: str, by_source: bool):
    docs = _documents(
        sf_dir, ["source", "text"] if by_source else ["text"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        srcs = batch["source"] if by_source else ["_"] * len(batch)
        for s, text in zip(srcs, batch["text"]):
            for t in _TOKEN_RE.findall((text or "").lower()):
                rows[(s, t)] = rows.get((s, t), 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tok": [k[1] for k in keys],
                "n": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    return hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "tok"],
        [("n", "sum")],
    )


# ---------------------------------------------------------------------------
# Zipf slope per source
# ---------------------------------------------------------------------------


def q_zipf_slope_by_source(sf_dir: str, k: int = 50):
    """Per source: OLS slope/intercept of ln(frequency) on ln(rank)
    over its top-50 tokens (count DESC, token ASC ranks; ascending-rank
    folds)."""
    agg = _token_counts(sf_dir, by_source=True).to_pandas()
    rows = []
    for src, g in agg.groupby("source", sort=True):
        g = g.sort_values(["n_sum", "tok"], ascending=[False, True]).head(k)
        n = len(g)
        if n < 2:
            continue
        sx = sy = sxy = sxx = 0.0
        for i in range(n):
            x = math.log(float(i + 1))
            y = math.log(float(int(g["n_sum"].iloc[i])))
            sx = sx + x
            sy = sy + y
            sxy = sxy + x * y
            sxx = sxx + x * x
        fn = float(n)
        dden = fn * sxx - sx * sx
        if dden == 0.0:
            continue
        slope = (fn * sxy - sx * sy) / dden
        rows.append(
            (src, n, float(_r6away(slope)),
             float(_r6away((sy - slope * sx) / fn)))
        )
    return pd.DataFrame(
        rows, columns=["source", "n_terms", "zipf_slope", "intercept"]
    ).astype({"n_terms": np.int64})


ORACLES94["zipf_slope_by_source"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
c AS (SELECT source, tok, COUNT(*) AS n FROM t GROUP BY 1, 2),
rk AS (
  SELECT source, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, tok ASC) AS rank
  FROM c
  QUALIFY rank <= 50
),
pt AS (
  SELECT source, rank,
         ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y
  FROM rk
),
s AS (
  SELECT source, COUNT(*) AS k,
         list_sum(list(x ORDER BY rank)) AS sx,
         list_sum(list(y ORDER BY rank)) AS sy,
         list_sum(list(x * y ORDER BY rank)) AS sxy,
         list_sum(list(x * x ORDER BY rank)) AS sxx
  FROM pt GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT source, CAST(k AS BIGINT) AS n_terms,
       ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (CAST(k AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - ((CAST(k AS DOUBLE) * sxy - sx * sy)
                    / (CAST(k AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(k AS DOUBLE), 6) AS intercept
FROM s
WHERE CAST(k AS DOUBLE) * sxx - sx * sx != 0
"""


# ---------------------------------------------------------------------------
# Order rate by balance band
# ---------------------------------------------------------------------------


def q_order_rate_by_balance_band(sf_dir: str):
    """Per $1000 account-balance band: customer count, order count, and
    orders per customer (customers with no orders count as zero). Bands
    shift positive before the floor division so negative balances band
    correctly on both sides."""
    # scale shape: orders pre-reduce per custkey, the customer band
    # attaches via one co-partitioned bucketed_join (how='right' keeps
    # zero-order customers) — never a driver dict (customer is O(sf));
    # the band combine is bounded (~200 $1000-bands)
    from ..common.raytools import bucketed_join

    per_cust = hash_bucket_aggregate(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "custkey": b["o_custkey"].astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
            .groupby("custkey", sort=False)
            .sum()
            .reset_index(),
            batch_format="pandas",
        ),
        ["custkey"],
        [("n", "sum")],
    )

    def cust_bands(b: pd.DataFrame) -> pd.DataFrame:
        v = b["c_acctbal"].to_numpy(np.float64) * 100
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        band = (cents + BAND_SHIFT * 100000) // 100000 - BAND_SHIFT
        return pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "band": band.astype(np.int64),
            }
        )

    dim = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        cust_bands, batch_format="pandas"
    )
    joined = bucketed_join(per_cust, dim, on=["custkey"], how="right")

    def by_band(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "band": batch["band"].astype(np.int64),
                    "nc": np.ones(len(batch), dtype=np.int64),
                    "no": batch["n_sum"].fillna(0).astype(np.int64),
                }
            )
            .groupby("band", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        joined.map_batches(by_band, batch_format="pandas")
        .to_pandas()
        .groupby("band", sort=True)
        .sum()
        .reset_index()
    )
    return pd.DataFrame(
        {
            "balance_band": agg["band"].astype(np.int64),
            "n_customers": agg["nc"].astype(np.int64),
            "n_orders": agg["no"].astype(np.int64),
            "orders_per_customer": _r6away(
                agg["no"].to_numpy(np.float64)
                / agg["nc"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES94["order_rate_by_balance_band"] = """
WITH cb AS (
  SELECT c_custkey,
         (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) // 100000 - 10
           AS band
  FROM customer
),
oc AS (
  SELECT cb.band, COUNT(*) AS n
  FROM orders o JOIN cb ON cb.c_custkey = o.o_custkey
  GROUP BY 1
),
cc AS (SELECT band, COUNT(*) AS n FROM cb GROUP BY 1)
SELECT CAST(cc.band AS BIGINT) AS balance_band,
       CAST(cc.n AS BIGINT) AS n_customers,
       CAST(COALESCE(oc.n, 0) AS BIGINT) AS n_orders,
       ROUND(CAST(COALESCE(oc.n, 0) AS DOUBLE) / CAST(cc.n AS DOUBLE), 6)
         AS orders_per_customer
FROM cc LEFT JOIN oc USING (band)
"""


# ---------------------------------------------------------------------------
# Brevity law (Zipf's law of abbreviation)
# ---------------------------------------------------------------------------


def q_brevity_law_corr(sf_dir: str):
    """One global row: Pearson correlation over the corpus vocabulary
    between token character length and ln(frequency) — natural text is
    negative (frequent words are short). Five token-ascending folds."""
    agg = (
        _token_counts(sf_dir, by_source=False)
        .to_pandas()
        .sort_values("tok")
    )
    out_empty = pd.DataFrame(
        {"n_terms": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    n = len(agg)
    if n < 2:
        return out_empty
    sx = sy = sxy = sxx = syy = 0.0
    for tok, cnt in zip(agg["tok"], agg["n_sum"]):
        x = float(len(tok))
        y = math.log(float(int(cnt)))
        sx = sx + x
        sy = sy + y
        sxy = sxy + x * y
        sxx = sxx + x * x
        syy = syy + y * y
    fn = float(n)
    dx = fn * sxx - sx * sx
    dy = fn * syy - sy * sy
    if dx <= 0.0 or dy <= 0.0:
        return out_empty
    r = (fn * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {"n_terms": np.array([n], dtype=np.int64), "r": [float(_r6away(r))]}
    )


ORACLES94["brevity_law_corr"] = """
WITH t AS (
  SELECT UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
pt AS (
  SELECT tok, CAST(length(tok) AS DOUBLE) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM c
),
s AS (
  SELECT COUNT(*) AS k,
         list_sum(list(x ORDER BY tok)) AS sx,
         list_sum(list(y ORDER BY tok)) AS sy,
         list_sum(list(x * y ORDER BY tok)) AS sxy,
         list_sum(list(x * x ORDER BY tok)) AS sxx,
         list_sum(list(y * y ORDER BY tok)) AS syy
  FROM pt
)
SELECT CAST(k AS BIGINT) AS n_terms,
       ROUND((CAST(k AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(k AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(k AS DOUBLE) * syy - sy * sy)), 6) AS r
FROM s
WHERE k >= 2 AND CAST(k AS DOUBLE) * sxx - sx * sx > 0
  AND CAST(k AS DOUBLE) * syy - sy * sy > 0
"""


QUERIES94["zipf_slope_by_source"] = q_zipf_slope_by_source
QUERIES94["order_rate_by_balance_band"] = q_order_rate_by_balance_band
QUERIES94["brevity_law_corr"] = q_brevity_law_corr
