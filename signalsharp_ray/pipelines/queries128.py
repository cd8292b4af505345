"""Round-4 batch 128: graph analytics over the support-2 co-purchase
graph (parts joined by an edge when bought together in at least TWO
orders — the association-rule support threshold that keeps the graph a
true co-purchase signal rather than coincidence) — global graph
statistics with exact triangle and wedge counts and the global
clustering coefficient, the degree distribution, and k-core sizes via
deterministic integer peeling.

House parity: everything on the graph is integer (edges, degrees,
wedges C(d,2), triangles, peeling) — the single float is the clustering
coefficient's one shared division; k-core peeling replays as a
fixed-round recursive CTE whose per-round induced subgraph is a pure
set operation (no ordering anywhere).

Scale contracts: pair counts build from per-order baskets (pairs never
cross orders, so batch boundaries cannot change any count) and reduce
through one (pa, pb)-keyed exchange; the SUPPORT-2 edge set is
empirically tiny and scale-stable (3.6k edges at sf0.01, 3.9k at sf0.1
— higher scale spreads pairs thinner), so the driver-side
triangle/peeling folds run over a bounded derived table, never the
lineitem table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _r6away

QUERIES128: dict = {}
ORACLES128: dict = {}

SUPPORT = 2
KCORE_KS = (2, 3, 4)
KCORE_ROUNDS = 40

_EDGE_SQL = f"""
e AS (
  SELECT pa, pb FROM (
    SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a
    JOIN lineitem b ON b.l_orderkey = a.l_orderkey
                   AND b.l_partkey > a.l_partkey
  )
  GROUP BY 1, 2 HAVING COUNT(*) >= {SUPPORT}
)
"""


def _edges(sf_dir: str) -> pd.DataFrame:
    """Support-2 co-purchase edges (pa < pb) via basket pair expansion
    inside per-order groups and one (pa, pb)-keyed exchange."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(df["l_partkey"].to_numpy(np.int64))
        if parts.size < 2:
            return pd.DataFrame(
                {
                    "pa": pd.Series([], dtype=np.int64),
                    "pb": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        ii, jj = np.triu_indices(parts.size, k=1)
        return pd.DataFrame(
            {
                "pa": parts[ii],
                "pb": parts[jj],
                "n": np.ones(ii.size, dtype=np.int64),
            }
        )

    # NOTE: co-purchase counts the PAIR once per order (distinct parts),
    # matching the DISTINCT-pair SQL; duplicate part lines in one order
    # collapse via np.unique.
    per_order = bucketed_map_groups(li, ["l_orderkey"], pairs)
    agg = hash_bucket_aggregate(
        per_order, ["pa", "pb"], [("n", "sum")]
    ).to_pandas()
    return agg[agg["n_sum"] >= SUPPORT][["pa", "pb"]].reset_index(drop=True)


def _adj(edges: pd.DataFrame) -> dict:
    adj: dict = {}
    for a, b in zip(
        edges["pa"].to_numpy(np.int64), edges["pb"].to_numpy(np.int64)
    ):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    return adj


# ---------------------------------------------------------------------------
# Global graph statistics
# ---------------------------------------------------------------------------


def q_copurchase_graph_stats(sf_dir: str):
    """One row: node, edge, wedge (sum C(deg, 2)) and exact triangle
    counts of the support-2 co-purchase graph plus the global clustering
    coefficient 3*triangles/wedges — how cliquish the bought-together
    structure is."""
    edges = _edges(sf_dir)
    adj = _adj(edges)
    n_nodes = len(adj)
    n_edges = len(edges)
    wedges = 0
    for nb in adj.values():
        d = len(nb)
        wedges += d * (d - 1) // 2
    tri = 0
    for a, b in zip(
        edges["pa"].to_numpy(np.int64), edges["pb"].to_numpy(np.int64)
    ):
        tri += len(adj[int(a)] & adj[int(b)])
    n_tri = tri // 3  # each triangle was counted once per of its 3 edges
    cc = 3.0 * float(n_tri) / float(wedges) if wedges > 0 else 0.0
    return pd.DataFrame(
        {
            "n_nodes": np.array([n_nodes], dtype=np.int64),
            "n_edges": np.array([n_edges], dtype=np.int64),
            "n_wedges": np.array([wedges], dtype=np.int64),
            "n_triangles": np.array([n_tri], dtype=np.int64),
            "clustering_coef": [float(_r6away(cc))],
        }
    )


ORACLES128["copurchase_graph_stats"] = f"""
WITH {_EDGE_SQL},
nodes AS (SELECT pa AS k FROM e UNION SELECT pb FROM e),
deg AS (
  SELECT k, COUNT(*) AS d
  FROM (SELECT pa AS k FROM e UNION ALL SELECT pb AS k FROM e)
  GROUP BY 1
),
tri AS (
  SELECT COUNT(*) AS t
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pb
  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
),
agg AS (
  SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
         (SELECT COUNT(*) FROM e) AS n_edges,
         (SELECT SUM(d * (d - 1) // 2) FROM deg) AS n_wedges,
         (SELECT t FROM tri) AS n_triangles
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       ROUND(CASE WHEN n_wedges > 0
                  THEN CAST(3.0 AS DOUBLE) * CAST(n_triangles AS DOUBLE)
                       / CAST(n_wedges AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS clustering_coef
FROM agg
"""


# ---------------------------------------------------------------------------
# Degree distribution
# ---------------------------------------------------------------------------


def q_copurchase_degree_distribution(sf_dir: str):
    """Per degree d: how many parts have exactly d support-2 co-purchase
    partners — the assortment graph's shape (a heavy tail = staple parts
    bought with everything)."""
    edges = _edges(sf_dir)
    adj = _adj(edges)
    degs = pd.Series([len(v) for v in adj.values()], dtype=np.int64)
    vc = degs.value_counts().sort_index()
    return pd.DataFrame(
        {
            "degree": vc.index.to_numpy(np.int64),
            "n_parts": vc.to_numpy(np.int64),
        }
    )


ORACLES128["copurchase_degree_distribution"] = f"""
WITH {_EDGE_SQL},
deg AS (
  SELECT k, COUNT(*) AS d
  FROM (SELECT pa AS k FROM e UNION ALL SELECT pb AS k FROM e)
  GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM deg GROUP BY 1
"""


# ---------------------------------------------------------------------------
# k-core sizes via deterministic peeling
# ---------------------------------------------------------------------------


def q_kcore_sizes(sf_dir: str):
    """For k in {2, 3, 4}: the k-core of the support-2 co-purchase graph
    (maximal subgraph where every node keeps >= k neighbors), computed
    by the classic peeling fixpoint — remove all nodes with degree < k,
    recompute, repeat. Pure set arithmetic: the result is
    order-independent, so engine and SQL (a fixed-round recursive CTE)
    agree exactly. Emits (k, n_nodes, n_edges); an empty core emits a
    zero row."""
    edges = _edges(sf_dir)
    rows = []
    for k in KCORE_KS:
        cur = {
            (int(a), int(b))
            for a, b in zip(
                edges["pa"].to_numpy(np.int64),
                edges["pb"].to_numpy(np.int64),
            )
        }
        while True:
            deg: dict = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            nxt = {(a, b) for a, b in cur if a in keep and b in keep}
            if nxt == cur:
                break
            cur = nxt
        nodes = set()
        for a, b in cur:
            nodes.add(a)
            nodes.add(b)
        rows.append((k, len(nodes), len(cur)))
    return pd.DataFrame(
        rows, columns=["k", "n_nodes", "n_edges"]
    ).astype({"k": np.int64, "n_nodes": np.int64, "n_edges": np.int64})


def _kcore_sql(k: int) -> str:
    return f"""
SELECT {k} AS k,
       CAST(COALESCE((SELECT COUNT(DISTINCT n) FROM (
         SELECT pa AS n FROM fin{k} UNION ALL SELECT pb FROM fin{k})), 0)
         AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM fin{k}) AS BIGINT) AS n_edges
"""


_KCORE_CTES = "\n".join(
    f""",
r{k} AS (
  SELECT 0 AS it, pa, pb FROM e
  UNION ALL
  SELECT * FROM (
    WITH w AS (SELECT * FROM r{k}),
    cur AS (
      SELECT pa, pb FROM w
      WHERE it = (SELECT MAX(it) FROM w) AND pa IS NOT NULL
    ),
    deg AS (
      SELECT n, COUNT(*) AS d
      FROM (SELECT pa AS n FROM cur UNION ALL SELECT pb FROM cur)
      GROUP BY 1
    ),
    keep AS (SELECT n FROM deg WHERE d >= {k}),
    nxt AS (
      SELECT c.pa, c.pb FROM cur c
      JOIN keep ka ON ka.n = c.pa
      JOIN keep kb ON kb.n = c.pb
    )
    -- emit the shrunken state; a sentinel NULL row marks collapse to
    -- the empty core; emitting nothing (= no change) ends the recursion
    SELECT (SELECT MAX(it) FROM w) + 1 AS it, pa, pb FROM nxt
    WHERE (SELECT COUNT(*) FROM nxt) < (SELECT COUNT(*) FROM cur)
    UNION ALL
    SELECT (SELECT MAX(it) FROM w) + 1 AS it,
           CAST(NULL AS BIGINT) AS pa, CAST(NULL AS BIGINT) AS pb
    WHERE (SELECT COUNT(*) FROM nxt) = 0
      AND (SELECT COUNT(*) FROM cur) > 0
  )
),
fin{k} AS (
  SELECT pa, pb FROM r{k}
  WHERE it = (SELECT MAX(it) FROM r{k}) AND pa IS NOT NULL
)"""
    for k in KCORE_KS
)

ORACLES128["kcore_sizes"] = (
    f"WITH RECURSIVE {_EDGE_SQL}{_KCORE_CTES}\n"
    + "\nUNION ALL\n".join(_kcore_sql(k) for k in KCORE_KS)
)


QUERIES128["copurchase_graph_stats"] = q_copurchase_graph_stats
QUERIES128["copurchase_degree_distribution"] = q_copurchase_degree_distribution
QUERIES128["kcore_sizes"] = q_kcore_sizes
