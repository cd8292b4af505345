"""Round-3 batch 49: acquisition-mix and demand-gap diagnostics — the
daily new-user share (what fraction of each day's active users are
brand new — growth vs retention at a glance), the mean per-document
character entropy per source (document-level gibberish scoring
averaged per slice; char_entropy_by_source pools characters, this
averages documents), and the longest order-free day run over the
multi-year order calendar (demand droughts).

House parity: new/active user counts are exact integers from
first-seen min-exchanges and per-day distinct dedups; per-doc
entropies fold over ascending character within each doc and the
cross-doc mean folds over ascending doc_id (nested list_sum
contract); droughts are pure integer islands on the dense day grid.

Scale contracts: day tables are retention-bounded; per-doc character
tables are alphabet-bounded inside batch kernels; the day grid is
calendar-bounded.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES47: dict = {}
ORACLES47: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Daily new-user share
# ---------------------------------------------------------------------------


def q_daily_new_share(sf_dir: str):
    """Per day: active distinct users, brand-new users (first event
    that day), and the new share — the growth-vs-retention mix.
    First-seen timestamps and per-day distinct users reduce through
    exchanges; one transcribed division."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "ts_us": b["ts"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    first = hash_bucket_aggregate(
        ev.map_batches(
            lambda b: b.groupby("user_id", sort=False)["ts_us"].min().reset_index(),
            batch_format="pandas",
        ),
        ["user_id"],
        [("ts_us", "min")],
    )
    new_per_day = (
        hash_bucket_aggregate(
            first.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "day_us": (b["ts_us_min"].astype(np.int64) // DAY_US)
                        * DAY_US,
                        "n": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            ),
            ["day_us"],
            [("n", "sum")],
        )
        .to_pandas()
        .set_index("day_us")["n_sum"]
        .astype(np.int64)
    )
    actives = hash_bucket_aggregate(
        ev.map_batches(
            lambda b: pd.DataFrame(
                {
                    "day_us": (b["ts_us"].to_numpy(np.int64) // DAY_US) * DAY_US,
                    "user_id": b["user_id"].astype(np.int64),
                }
            )
            .drop_duplicates()
            .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
            batch_format="pandas",
        ),
        ["day_us", "user_id"],
        [("one", "max")],
    )
    act_per_day = (
        hash_bucket_aggregate(
            actives.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "day_us": b["day_us"].astype(np.int64),
                        "n": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            ),
            ["day_us"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("day_us")
    )
    rows = []
    for _, r in act_per_day.iterrows():
        d = int(r["day_us"])
        act = int(r["n_sum"])
        new = int(new_per_day.get(d, 0))
        rows.append((d, act, new, float(_r6away(float(new) / float(act)))))
    return pd.DataFrame(
        rows, columns=["day_us", "n_active", "n_new", "new_share"]
    ).astype({"day_us": np.int64, "n_active": np.int64, "n_new": np.int64})


ORACLES47["daily_new_share"] = """
WITH f AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS first_day
  FROM events GROUP BY 1
),
nd AS (SELECT first_day AS day, COUNT(*) AS n_new FROM f GROUP BY 1),
a AS (
  SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS n_active
  FROM events GROUP BY 1
)
SELECT CAST(epoch_us(a.day) AS BIGINT) AS day_us,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(nd.n_new, 0) AS BIGINT) AS n_new,
       ROUND(CAST(COALESCE(nd.n_new, 0) AS DOUBLE)
             / CAST(a.n_active AS DOUBLE), 6) AS new_share
FROM a LEFT JOIN nd ON nd.day = a.day
"""


# ---------------------------------------------------------------------------
# Mean per-document character entropy per source
# ---------------------------------------------------------------------------


def q_doc_entropy_mean(sf_dir: str):
    """Per source: the MEAN of per-document character entropies (nats)
    — char_entropy_by_source pools every character into one
    distribution; this scores each document separately and averages,
    so one giant clean doc can't mask many small gibberish ones.
    Per-doc folds run over ascending character; the cross-doc mean
    folds over ascending doc_id (nested list_sum contract); empty docs
    are excluded identically."""
    docs = _documents(sf_dir, ["doc_id", "source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, hs = [], [], []
        for did, src, text in zip(batch["doc_id"], batch["source"], batch["text"]):
            t = text or ""
            if not t:
                continue
            counts = Counter(t)
            s = len(t)
            f = _fold(
                [
                    float(m) * math.log(float(m))
                    for _, m in sorted(counts.items())
                ]
            )
            ids.append(int(did))
            srcs.append(src)
            hs.append(math.log(float(s)) - f / float(s))
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "source": srcs,
                "h": hs,
            }
        )

    per_doc = (
        docs.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    rows = []
    for src, g in per_doc.groupby("source", sort=True):
        g = g.sort_values("doc_id")
        n = len(g)
        mean_h = _fold([float(x) for x in g["h"]]) / float(n)
        rows.append((src, n, float(_r6away(mean_h))))
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "mean_entropy"]
    ).astype({"n_docs": np.int64})


ORACLES47["doc_entropy_mean"] = """
WITH ch AS (
  SELECT doc_id, source,
         UNNEST(list_transform(range(0, length(text)),
                               i -> substr(text, CAST(i AS INT) + 1, 1))) AS ch
  FROM documents WHERE length(text) > 0
),
c AS (SELECT doc_id, source, ch, COUNT(*) AS m FROM ch GROUP BY 1, 2, 3),
d AS (
  SELECT doc_id, source,
         CAST(SUM(m) AS BIGINT) AS s,
         list_sum(list(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE))
                       ORDER BY ch)) AS f
  FROM c GROUP BY 1, 2
),
h AS (
  SELECT doc_id, source,
         ln(CAST(s AS DOUBLE)) - f / CAST(s AS DOUBLE) AS h
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(list_sum(list(h ORDER BY doc_id))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_entropy
FROM h GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Order drought
# ---------------------------------------------------------------------------


def q_order_drought(sf_dir: str):
    """The longest run of consecutive calendar days with NO orders
    (dense [min, max] day grid) plus the count of order-free days —
    demand droughts over the multi-year history. Pure integer island
    arithmetic."""
    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("day_us", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(orders, ["day_us"], [("n", "sum")])
        .to_pandas()
        .sort_values("day_us")
    )
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid_n = (hi - lo) // DAY_US + 1
    v = np.zeros(grid_n, dtype=np.int64)
    v[(agg["day_us"].to_numpy(np.int64) - lo) // DAY_US] = agg["n_sum"].to_numpy(
        np.int64
    )
    zero = v == 0
    nz = int(zero.sum())
    if nz == 0:
        mx = 0
    else:
        padded = np.concatenate(([False], zero, [False]))
        starts = np.flatnonzero(padded[1:] & ~padded[:-1])
        ends = np.flatnonzero(~padded[1:] & padded[:-1])
        mx = int((ends - starts).max())
    return pd.DataFrame(
        {
            "n_days": np.array([grid_n], dtype=np.int64),
            "n_orderless_days": np.array([nz], dtype=np.int64),
            "max_drought_d": np.array([mx], dtype=np.int64),
        }
    )


ORACLES47["order_drought"] = """
WITH d AS (
  SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n
  FROM orders GROUP BY 1
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
dense AS (
  SELECT g.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.day) AS idx
  FROM grid g LEFT JOIN d USING (day)
),
z AS (
  SELECT idx,
         idx - ROW_NUMBER() OVER (ORDER BY idx) AS grp
  FROM dense WHERE v = 0
),
isl AS (SELECT grp, COUNT(*) AS len FROM z GROUP BY 1),
agg AS (
  SELECT CAST(COALESCE(SUM(len), 0) AS BIGINT) AS nz,
         CAST(COALESCE(MAX(len), 0) AS BIGINT) AS mx
  FROM isl
)
SELECT CAST((SELECT COUNT(*) FROM dense) AS BIGINT) AS n_days,
       agg.nz AS n_orderless_days,
       agg.mx AS max_drought_d
FROM agg
"""


QUERIES47["daily_new_share"] = q_daily_new_share
QUERIES47["doc_entropy_mean"] = q_doc_entropy_mean
QUERIES47["order_drought"] = q_order_drought
