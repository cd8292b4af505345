"""Round-5 batch 162: robust two-way decomposition and graph centrality
— Tukey's median polish of the (day-of-week x hour) load matrix (the
robust answer to "what is the weekly shape, net of outliers" — means
would be dragged by incident spikes), and PageRank (damping 0.85, 10
iterations, dangling mass redistributed uniformly) over the
supplier-nation -> customer-nation trade graph.

House parity strategy: median polish is EXACT end-to-end — an integer
count matrix on the dense 7x24 grid (empty cells are genuine zeros),
medians of integers are integers or .5 halves, so every residual is a
dyadic rational both engines represent exactly. PageRank follows the
PCA power-iteration oracle pattern: a dense row-stochastic matrix of
exact one-time divisions w/W carried through a recursive CTE, every
inflow an ascending-source fold over the dense row (zero entries add
exact 0.0), dangling mass a parallel fold.

Scale contracts: both consume tiny aggregates (168 cells; <= 25x25
nation matrix) produced by the same exchanges the verified
value_heatmap / nation_trade_flows queries use."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _events, _r6

QUERIES162: dict = {}
ORACLES162: dict = {}

_PR_D = 0.85
_PR_ITERS = 10


def q_median_polish_dow_hour(sf_dir: str):
    """Tukey median polish (one row sweep, one column sweep) of the
    7x24 (day-of-week x hour) total event-count matrix: residual =
    count - dow_median - hour_median(of row-swept values). Sunday=0 dow
    convention (DuckDB dayofweek). Output (dow, hour, n_events,
    row_effect, col_effect, residual) — 168 exact dyadic rows."""
    from ..common.raytools import hash_bucket_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].to_numpy("datetime64[us]").view(np.int64)
        days = us // 86_400_000_000
        dow = (days + 4) % 7  # 1970-01-01 was a Thursday; Sunday = 0
        hod = (us // 3_600_000_000) % 24
        return pd.DataFrame(
            {"dow": dow.astype(np.int64), "hod": hod.astype(np.int64)}
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["ts"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["dow", "hod"],
            [],
            count_alias="n",
        )
        .to_pandas()
    )
    m = np.zeros((7, 24), dtype=np.int64)
    m[agg["dow"].to_numpy(np.int64), agg["hod"].to_numpy(np.int64)] = (
        agg["n"].to_numpy(np.int64)
    )
    row_med = np.median(m, axis=1)  # integer or .5 — exact dyadic
    r1 = m.astype(np.float64) - row_med[:, None]
    col_med = np.median(r1, axis=0)
    resid = r1 - col_med[None, :]
    dows = np.repeat(np.arange(7, dtype=np.int64), 24)
    hods = np.tile(np.arange(24, dtype=np.int64), 7)
    return pd.DataFrame(
        {
            "dow": dows,
            "hour": hods,
            "n_events": m.reshape(-1),
            "row_effect": _r6(np.repeat(row_med, 24)),
            "col_effect": _r6(np.tile(col_med, 7)),
            "residual": _r6(resid.reshape(-1)),
        }
    )


QUERIES162["median_polish_dow_hour"] = q_median_polish_dow_hour
ORACLES162["median_polish_dow_hour"] = """
WITH grid AS (
  SELECT d.dow, h.hour
  FROM UNNEST(range(0, 7)) AS d(dow), UNNEST(range(0, 24)) AS h(hour)
),
c AS (
  SELECT dayofweek(ts) AS dow, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT grid.dow, grid.hour, CAST(COALESCE(c.n, 0) AS DOUBLE) AS v,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM grid LEFT JOIN c ON c.dow = grid.dow AND c.hour = grid.hour
),
rm AS (SELECT dow, MEDIAN(v) AS row_med FROM m GROUP BY 1),
r1 AS (
  SELECT m.dow, m.hour, m.n, m.v - rm.row_med AS v1, rm.row_med
  FROM m JOIN rm USING (dow)
),
cm AS (SELECT hour, MEDIAN(v1) AS col_med FROM r1 GROUP BY 1)
SELECT r1.dow, r1.hour, r1.n AS n_events,
       ROUND(r1.row_med, 6) AS row_effect,
       ROUND(cm.col_med, 6) AS col_effect,
       ROUND(r1.v1 - cm.col_med, 6) AS residual
FROM r1 JOIN cm USING (hour)
"""


def q_pagerank_nation_flows(sf_dir: str):
    """PageRank over the nation trade graph: nodes are nations
    appearing in the (supplier nation -> customer nation) item-count
    flow matrix; edge probability = items_ij / out_items_i (exact
    one-time division); 10 damped iterations (d = 0.85) from the
    uniform vector, dangling nations' mass redistributed uniformly.
    Output (nation, pagerank) — who sits at the center of the trade
    network, weighted by actual shipped items."""
    from .queries5 import q_nation_trade_flows

    flows = (
        q_nation_trade_flows(sf_dir)
        .to_pandas()[["supp_nation", "cust_nation", "n_items"]]
    )
    nodes = sorted(
        set(flows["supp_nation"]) | set(flows["cust_nation"])
    )
    idx = {name: i for i, name in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n), dtype=np.int64)
    for s, c, k in zip(
        flows["supp_nation"], flows["cust_nation"], flows["n_items"]
    ):
        w[idx[s], idx[c]] = int(k)
    out = w.sum(axis=1)  # exact int out-weights
    p = np.zeros((n, n), dtype=np.float64)
    for j in range(n):
        if out[j] > 0:
            for i in range(n):
                p[j, i] = float(w[j, i]) / float(out[j])
    dangling = out == 0
    r = np.full(n, 1.0 / float(n))
    for _ in range(_PR_ITERS):
        dang = 0.0
        for j in range(n):  # ascending-j fold
            if dangling[j]:
                dang += r[j]
        nr = np.empty(n)
        for i in range(n):
            inflow = 0.0
            for j in range(n):  # ascending-j fold over the dense column
                inflow += p[j, i] * r[j]
            nr[i] = (1.0 - _PR_D) / float(n) + _PR_D * (
                inflow + dang / float(n)
            )
        r = nr
    return pd.DataFrame(
        {"nation": nodes, "pagerank": _r6(r)}
    )


QUERIES162["pagerank_nation_flows"] = q_pagerank_nation_flows
ORACLES162["pagerank_nation_flows"] = """
WITH RECURSIVE fl AS (
  SELECT ns.n_name AS sn, nc.n_name AS cn, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
),
nd AS (
  SELECT name, row_number() OVER (ORDER BY name) - 1 AS i
  FROM (SELECT sn AS name FROM fl UNION SELECT cn FROM fl)
),
nn AS (SELECT COUNT(*) AS n FROM nd),
ow AS (SELECT sn, SUM(w) AS total FROM fl GROUP BY 1),
dense AS (
  SELECT a.i AS j, b.i AS i,
         CASE WHEN ow.total IS NULL OR ow.total = 0 THEN 0.0
              ELSE CAST(COALESCE(fl.w, 0) AS DOUBLE)
                   / CAST(ow.total AS DOUBLE) END AS p,
         CASE WHEN ow.total IS NULL OR ow.total = 0 THEN 1 ELSE 0 END
           AS dang
  FROM nd a
  CROSS JOIN nd b
  LEFT JOIN fl ON fl.sn = a.name AND fl.cn = b.name
  LEFT JOIN ow ON ow.sn = a.name
),
rows_ AS (
  SELECT j, list(p ORDER BY i) AS pr, ANY_VALUE(dang) AS dang
  FROM dense GROUP BY j
),
mat AS (
  SELECT list(pr ORDER BY j) AS pm, list(dang ORDER BY j) AS dg,
         COUNT(*) AS n
  FROM rows_
),
it AS (
  SELECT 0 AS t,
         list_transform(range(0, n), x -> 1.0 / CAST(n AS DOUBLE)) AS r,
         pm, dg, n
  FROM mat
  UNION ALL
  SELECT t + 1,
         list_transform(range(0, n), i ->
           (1.0 - 0.85) / CAST(n AS DOUBLE)
           + 0.85 * (list_sum(list_transform(range(0, n),
                       j -> pm[j + 1][i + 1] * r[j + 1]))
                     + list_sum(list_transform(range(0, n),
                         j -> CASE WHEN dg[j + 1] = 1
                                   THEN r[j + 1] ELSE 0.0 END))
                       / CAST(n AS DOUBLE))),
         pm, dg, n
  FROM it WHERE t < 10
),
fin AS (SELECT r, n FROM it WHERE t = 10)
SELECT nd.name AS nation, ROUND(fin.r[nd.i + 1], 6) AS pagerank
FROM fin, nd
"""
