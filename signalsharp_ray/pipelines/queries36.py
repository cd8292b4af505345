"""Round-3 batch 38: intensity and drift diagnostics — per-nation order
intensity (orders per customer — the demand-density map over the
two-branch dimensional join), first-half vs second-half load drift per
event type (the simplest temporal A/B: did this stream's share of the
window change), and the numeric-token share per source (how number-
heavy each slice of the corpus is — tables/logs score high, prose
low).

House parity: intensity is one transcribed division over exact integer
branch counts; the window split point is the exact integer midpoint of
the [min, max] event-time range and every half-count is an integer
comparison; the drift log-ratio uses libm ln over exact counts;
numeric tokens use the SAME ^digits$ classification through Python re
and DuckDB RE2.

Scale contracts: nation branches reduce through one exchange each;
half-counts are one exchange keyed by (type, half); token counts are
source-bounded.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _TOKEN_RE, _read

QUERIES36: dict = {}
ORACLES36: dict = {}

_DIGIT_RE = re.compile(r"^\d+$")


# ---------------------------------------------------------------------------
# Nation order intensity
# ---------------------------------------------------------------------------


def q_nation_order_intensity(sf_dir: str):
    """Per nation: customer count, order count, and orders per
    customer — where demand is dense vs thin. Orders resolve to
    nations through a co-partitioned custkey join; both branch counts
    are exact integers; one transcribed division."""
    import pyarrow.parquet as pq

    from ..common.raytools import bucketed_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(
        zip(nation["n_nationkey"].astype(np.int64), nation["n_name"])
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "nationkey": b["c_nationkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda b: pd.DataFrame({"custkey": b["o_custkey"].astype(np.int64)})
        .groupby("custkey", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per_cust = hash_bucket_aggregate(orders, ["custkey"], [("n", "sum")])
    joined = bucketed_join(cust, per_cust, on=["custkey"], how="left")
    agg = hash_bucket_aggregate(
        joined.map_batches(
            lambda b: pd.DataFrame(
                {
                    "nationkey": b["nationkey"].astype(np.int64),
                    "nc": np.ones(len(b), dtype=np.int64),
                    "no": b["n_sum"].fillna(0).astype(np.int64),
                }
            )
            .groupby("nationkey", sort=False)
            .agg(nc=("nc", "sum"), no=("no", "sum"))
            .reset_index(),
            batch_format="pandas",
        ),
        ["nationkey"],
        [("nc", "sum"), ("no", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        nc, no = int(r["nc_sum"]), int(r["no_sum"])
        rows.append(
            (
                nmap[int(r["nationkey"])],
                nc,
                no,
                float(_r6away(float(no) / float(nc))),
            )
        )
    return (
        pd.DataFrame(
            rows, columns=["n_name", "n_customers", "n_orders", "orders_per_cust"]
        )
        .astype({"n_customers": np.int64, "n_orders": np.int64})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


ORACLES36["nation_order_intensity"] = """
WITH o AS (
  SELECT o_custkey AS ck, COUNT(*) AS n FROM orders GROUP BY 1
),
a AS (
  SELECT c.c_nationkey AS nk,
         COUNT(*) AS nc,
         CAST(SUM(COALESCE(o.n, 0)) AS BIGINT) AS no
  FROM customer c LEFT JOIN o ON o.ck = c.c_custkey
  GROUP BY 1
)
SELECT n.n_name,
       CAST(a.nc AS BIGINT) AS n_customers,
       a.no AS n_orders,
       ROUND(CAST(a.no AS DOUBLE) / CAST(a.nc AS DOUBLE), 6)
         AS orders_per_cust
FROM a JOIN nation n ON n.n_nationkey = a.nk
"""


# ---------------------------------------------------------------------------
# First-half vs second-half load drift
# ---------------------------------------------------------------------------


def q_halves_drift(sf_dir: str):
    """Per event type: event counts in the first vs second half of the
    observation window (split at the exact integer midpoint of the
    [min, max] event-time range; second half includes the midpoint)
    and the ln ratio — the bluntest possible drift detector, useful as
    the sanity floor under psi_drift/ks_drift. Types missing from
    either half are excluded identically (ln domain)."""
    ev = _events(sf_dir, ["ts", "event_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "ts_us": b["ts"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    bounds = ev.map_batches(
        lambda b: pd.DataFrame(
            {
                "lo": [int(b["ts_us"].min())],
                "hi": [int(b["ts_us"].max())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    lo = int(bounds["lo"].min())
    hi = int(bounds["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        half = (b["ts_us"].to_numpy(np.int64) >= mid).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": b["event_type"], "half": half})
            .groupby(["event_type", "half"], sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64})
        )
        return g

    agg = hash_bucket_aggregate(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "half"],
        [("n", "sum")],
    ).to_pandas()
    piv = agg.pivot_table(
        index="event_type", columns="half", values="n_sum", aggfunc="sum"
    ).fillna(0)
    rows = []
    for t in sorted(piv.index):
        n1 = int(piv.loc[t].get(0, 0))
        n2 = int(piv.loc[t].get(1, 0))
        if n1 == 0 or n2 == 0:
            continue
        rows.append(
            (
                t,
                n1,
                n2,
                float(_r6away(math.log(float(n2)) - math.log(float(n1)))),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_first", "n_second", "ln_ratio"]
    ).astype({"n_first": np.int64, "n_second": np.int64})


ORACLES36["halves_drift"] = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
h AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) >= b.lo + (b.hi - b.lo) // 2
              THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN b
),
a AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS n2
  FROM h GROUP BY 1
)
SELECT event_type,
       n1 AS n_first,
       n2 AS n_second,
       ROUND(ln(CAST(n2 AS DOUBLE)) - ln(CAST(n1 AS DOUBLE)), 6) AS ln_ratio
FROM a WHERE n1 > 0 AND n2 > 0
"""


# ---------------------------------------------------------------------------
# Numeric-token share per source
# ---------------------------------------------------------------------------


def q_numeric_token_share(sf_dir: str):
    """Per source: share of tokens that are pure digit strings —
    tables, logs and price lists score high; prose scores low. Same
    tokenizer and ^digits$ test through Python re and DuckDB RE2;
    exact integer counts; one transcribed division."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, tot, num = [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            toks = _TOKEN_RE.findall((text or "").lower())
            srcs.append(src)
            tot.append(len(toks))
            num.append(sum(1 for t in toks if _DIGIT_RE.match(t)))
        return pd.DataFrame(
            {
                "source": srcs,
                "t": np.array(tot, dtype=np.int64),
                "k": np.array(num, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("t", "sum"), ("k", "sum")],
    ).to_pandas()
    share = [
        float(_r6away(float(int(k)) / float(int(t))))
        for k, t in zip(agg["k_sum"], agg["t_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "source": agg["source"],
                "n_tokens": agg["t_sum"].astype(np.int64),
                "n_numeric": agg["k_sum"].astype(np.int64),
                "numeric_share": share,
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES36["numeric_token_share"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
a AS (
  SELECT source,
         COUNT(*) AS t_total,
         COUNT(*) FILTER (WHERE regexp_matches(tok, '^[0-9]+$')) AS k
  FROM t GROUP BY 1
)
SELECT source,
       CAST(t_total AS BIGINT) AS n_tokens,
       CAST(k AS BIGINT) AS n_numeric,
       ROUND(CAST(k AS DOUBLE) / CAST(t_total AS DOUBLE), 6) AS numeric_share
FROM a
"""


QUERIES36["nation_order_intensity"] = q_nation_order_intensity
QUERIES36["halves_drift"] = q_halves_drift
QUERIES36["numeric_token_share"] = q_numeric_token_share
