"""Round-3 batch 64: Benford's law over commerce prices — first-digit
distribution of lineitem extended prices with the chi-square distance
from the theoretical Benford probabilities ln(1+1/d)/ln(10) (price
data is the canonical Benford domain; benford_digits covers the events
table, this audits the money column where fraud detection actually
looks).

House parity: first digits extract from the exact integer cent value's
decimal string on both engines; Benford probabilities are transcribed
libm ln ratios; the chi-square folds over ascending digit.

Scale contract: one 9-row exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries14 import _fold
from .queries16 import _cents_col, _read

QUERIES62: dict = {}
ORACLES62: dict = {}


def q_benford_prices(sf_dir: str):
    """First-digit mix of lineitem extended prices (exact cent values'
    leading decimal digit) vs Benford's law: per digit the observed
    count, observed share, theoretical share ln(1+1/d)/ln(10), and the
    global chi-square folded over ascending digit."""
    li = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "digit": np.array(
                    [int(str(int(c))[0]) for c in _cents_col(b["l_extendedprice"])],
                    dtype=np.int64,
                ),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby("digit", sort=False)
        .agg(n=("n", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(li, ["digit"], [("n", "sum")])
        .to_pandas()
        .sort_values("digit")
    )
    o = np.zeros(9, dtype=np.int64)
    o[agg["digit"].to_numpy(np.int64) - 1] = agg["n_sum"].to_numpy(np.int64)
    total = int(o.sum())
    probs = [
        math.log(1.0 + 1.0 / float(d)) / math.log(10.0) for d in range(1, 10)
    ]
    terms = []
    for d in range(9):
        e = float(total) * probs[d]
        terms.append((float(int(o[d])) - e) * (float(int(o[d])) - e) / e)
    chi2 = float(_r6away(_fold(terms)))
    rows = []
    for d in range(9):
        rows.append(
            (
                d + 1,
                int(o[d]),
                float(_r6away(float(int(o[d])) / float(total))),
                float(_r6away(probs[d])),
                chi2,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["digit", "n_items", "observed_share", "benford_share", "chi2"],
    ).astype({"digit": np.int64, "n_items": np.int64})


ORACLES62["benford_prices"] = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
digits AS (SELECT UNNEST(generate_series(1, 9)) AS digit),
dense AS (
  SELECT CAST(digits.digit AS BIGINT) AS digit,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS o
  FROM digits LEFT JOIN c ON c.digit = digits.digit
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM dense),
chi AS (
  SELECT ROUND(list_sum(list(
           (CAST(d.o AS DOUBLE)
            - CAST(t.total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE))
                                         / ln(10.0)))
           * (CAST(d.o AS DOUBLE)
              - CAST(t.total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE))
                                           / ln(10.0)))
           / (CAST(t.total AS DOUBLE) * (ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE))
                                         / ln(10.0)))
           ORDER BY d.digit)), 6) AS chi2
  FROM dense d CROSS JOIN tot t
)
SELECT d.digit,
       d.o AS n_items,
       ROUND(CAST(d.o AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS observed_share,
       ROUND(ln(1.0 + 1.0 / CAST(d.digit AS DOUBLE)) / ln(10.0), 6)
         AS benford_share,
       c.chi2
FROM dense d CROSS JOIN tot t CROSS JOIN chi c
"""


QUERIES62["benford_prices"] = q_benford_prices
