"""Round-3 batch 24: richness / inequality / load-peak shapes — Yule's
characteristic K per source (the classic repeated-token vocabulary
richness constant), the Theil inequality index of per-user spend (the
entropy-based decomposable Gini alternative), the top-5 busiest minutes
(distributed arg-top-k over the minute rollup), and the
lineitems-per-order histogram (the Q13 shape applied to the fact
table).

House parity: Yule's K is a pure integer expression 1e4*(sum m^2 - T)/T^2
(HUGEINT squares); Theil folds (x/mu) ln(x/mu) over ascending user_id
(list_sum contract) with mu from exact integer totals; minute counts
and line counts are exact int64 through one exchange each, with
deterministic (count DESC, minute ASC) top-k ties.

Scale contracts: token counts reduce through one (source, token)
exchange; the minute top-k merges only k rows per batch on the driver;
histograms are cardinality-bounded. The Theil fold is driver-side over
the per-user total table — bounded at test scale and documented as the
same contract as hill_tail_index/gini (at web scale, shard the fold by
user ranges and tree-combine).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries14 import _fold
from .queries16 import _read
from .queries17 import _per_token_counts

QUERIES22: dict = {}
ORACLES22: dict = {}

MINUTE_US = 60_000_000
TOP_MINUTES = 5


# ---------------------------------------------------------------------------
# Yule's characteristic K per source
# ---------------------------------------------------------------------------


def q_yule_k(sf_dir: str):
    """Per source: Yule's K = 1e4 * (sum m^2 - T) / T^2 over token
    frequencies — the repeat-rate richness constant (higher = more
    repetitive vocabulary), stable in T unlike raw type counts. All
    ingredients exact integers; one transcribed expression."""
    per_tok = _per_token_counts(sf_dir)
    agg = hash_bucket_aggregate(
        per_tok.map_batches(
            lambda b: pd.DataFrame(
                {
                    "source": b["source"],
                    "t": b["m_sum"].astype(np.int64),
                    "m2": b["m_sum"].astype(np.int64) * b["m_sum"].astype(np.int64),
                    "v": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["source"],
        [("t", "sum"), ("m2", "sum"), ("v", "sum")],
    ).to_pandas()
    rows = []
    for i in range(len(agg)):
        t = int(agg["t_sum"].iloc[i])
        m2 = int(agg["m2_sum"].iloc[i])
        k = 10000.0 * (float(m2) - float(t)) / (float(t) * float(t))
        rows.append(
            (agg["source"].iloc[i], t, int(agg["v_sum"].iloc[i]), float(_r6away(k)))
        )
    return (
        pd.DataFrame(rows, columns=["source", "n_tokens", "vocab", "yule_k"])
        .astype({"n_tokens": np.int64, "vocab": np.int64})
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES22["yule_k"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
c AS (SELECT source, tok, COUNT(*) AS m FROM t GROUP BY 1, 2),
a AS (
  SELECT source,
         CAST(SUM(m) AS BIGINT) AS t_total,
         CAST(SUM(m::HUGEINT * m::HUGEINT) AS BIGINT) AS m2,
         COUNT(*) AS v
  FROM c GROUP BY 1
)
SELECT source,
       t_total AS n_tokens,
       CAST(v AS BIGINT) AS vocab,
       ROUND(10000.0 * (CAST(m2 AS DOUBLE) - CAST(t_total AS DOUBLE))
             / (CAST(t_total AS DOUBLE) * CAST(t_total AS DOUBLE)), 6) AS yule_k
FROM a
"""


# ---------------------------------------------------------------------------
# Theil inequality index of per-user spend
# ---------------------------------------------------------------------------


def q_theil_index(sf_dir: str):
    """Theil T inequality index of per-user total spend:
    (1/n) * sum (x/mu) ln(x/mu) — 0 = perfectly equal, ln(n) = one user
    owns everything; unlike Gini it decomposes across subgroups. Spend
    totals are exact cents through one exchange; the fold runs over
    ascending user_id (list_sum contract). Users with zero/negative
    totals are excluded on both sides (ln domain)."""
    ev = _events(sf_dir, ["user_id", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "c": _cents(b["value"]),
            }
        )
        .groupby("user_id", sort=False)["c"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_user = (
        hash_bucket_aggregate(ev, ["user_id"], [("c", "sum")])
        .to_pandas()
        .sort_values("user_id")
    )
    per_user = per_user[per_user["c_sum"].astype(np.int64) > 0]
    n = len(per_user)
    s = int(per_user["c_sum"].sum())
    mu = float(s) / float(n)
    terms = [
        (float(int(c)) / mu) * math.log(float(int(c)) / mu)
        for c in per_user["c_sum"]
    ]
    theil = _fold(terms) / float(n)
    return pd.DataFrame(
        {
            "n_users": np.array([n], dtype=np.int64),
            "total_c": np.array([s], dtype=np.int64),
            "theil": [float(_r6away(theil))],
            "max_theil": [float(_r6away(math.log(float(n))))],
        }
    )


ORACLES22["theil_index"] = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
  HAVING CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) > 0
),
s AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS total FROM u),
f AS (
  SELECT list_sum(list(
           (CAST(u.c AS DOUBLE) / (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE)))
           * ln(CAST(u.c AS DOUBLE)
                / (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE)))
           ORDER BY u.user_id)) AS f
  FROM u CROSS JOIN s
)
SELECT CAST(s.n AS BIGINT) AS n_users,
       s.total AS total_c,
       ROUND(f.f / CAST(s.n AS DOUBLE), 6) AS theil,
       ROUND(ln(CAST(s.n AS DOUBLE)), 6) AS max_theil
FROM s CROSS JOIN f
"""


# ---------------------------------------------------------------------------
# Top-5 busiest minutes
# ---------------------------------------------------------------------------


def q_peak_minutes(sf_dir: str, k: int = TOP_MINUTES):
    """The k busiest minutes of the whole stream (count DESC, minute
    ASC ties) — the instantaneous-peak table capacity reviews start
    from. Minute counts reduce through one exchange; each batch then
    surrenders only its local top-k, so the driver merges k rows per
    batch, never the minute table."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "minute_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // MINUTE_US
                )
                * MINUTE_US,
            }
        )
        .groupby("minute_us", sort=False)
        .size()
        .reset_index(name="n"),
        batch_format="pandas",
    )
    per_min = hash_bucket_aggregate(ev, ["minute_us"], [("n", "sum")])
    top = (
        per_min.map_batches(
            lambda b: b.sort_values(
                ["n_sum", "minute_us"], ascending=[False, True]
            ).head(k),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["n_sum", "minute_us"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "minute_us": top["minute_us"].astype(np.int64),
            "n_events": top["n_sum"].astype(np.int64),
        }
    )


ORACLES22["peak_minutes"] = f"""
WITH m AS (
  SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS n
  FROM events GROUP BY 1
),
r AS (
  SELECT minute, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, minute ASC) AS rank
  FROM m
)
SELECT CAST(rank AS BIGINT) AS rank,
       CAST(epoch_us(minute) AS BIGINT) AS minute_us,
       CAST(n AS BIGINT) AS n_events
FROM r WHERE rank <= {TOP_MINUTES}
"""


# ---------------------------------------------------------------------------
# Lineitems-per-order histogram
# ---------------------------------------------------------------------------


def q_linecount_histogram(sf_dir: str):
    """How many orders have exactly k lineitems — the Q13 distribution
    shape applied to the fact table (order size drives picking cost).
    Two exact integer exchanges: per-order counts, then the count
    histogram."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda b: pd.DataFrame({"orderkey": b["l_orderkey"].astype(np.int64)})
        .groupby("orderkey", sort=False)
        .size()
        .reset_index(name="n"),
        batch_format="pandas",
    )
    per_order = hash_bucket_aggregate(li, ["orderkey"], [("n", "sum")])
    hist = hash_bucket_aggregate(
        per_order.map_batches(
            lambda b: pd.DataFrame(
                {
                    "n_lines": b["n_sum"].astype(np.int64),
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["n_lines"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "n_lines": hist["n_lines"].astype(np.int64),
                "n_orders": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("n_lines")
        .reset_index(drop=True)
    )


ORACLES22["linecount_histogram"] = """
WITH c AS (
  SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY 1
"""


QUERIES22["yule_k"] = q_yule_k
QUERIES22["theil_index"] = q_theil_index
QUERIES22["peak_minutes"] = q_peak_minutes
QUERIES22["linecount_histogram"] = q_linecount_histogram
