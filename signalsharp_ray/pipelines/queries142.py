"""Round-4 batch 142: community structure and unseen mass — Newman
modularity of the BRAND partition over the support-2 co-purchase graph
(do bought-together parts actually cluster by brand, the question
behind assortment taxonomy), and the Good-Turing unseen-probability
mass per source (the chance the NEXT token is a never-seen word — the
other half of the chao1 richness story).

House parity: intra-community edge counts, community degree sums and
hapax/total counts are exact integers; modularity folds
e_c/m - (d_c/(2m))^2 over ascending brand and Good-Turing is one
division per row.

Scale contracts: the support-2 edge set is bounded (measured
scale-stable); brands attach through a co-partitioned join on the part
key (the part table never collapses to a driver dict); token counts
reduce through the standard bucketed exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries14 import _fold
from .queries128 import _EDGE_SQL, _edges

QUERIES142: dict = {}
ORACLES142: dict = {}


# ---------------------------------------------------------------------------
# Brand modularity of the co-purchase graph
# ---------------------------------------------------------------------------


def q_brand_modularity(sf_dir: str):
    """Newman modularity Q = sum_c (e_c/m - (d_c/(2m))^2) of the brand
    partition over the support-2 co-purchase graph: e_c = edges with
    BOTH endpoints in brand c, d_c = degree sum of c's nodes, m = total
    edges. Q near 0 = co-purchases ignore brand; high Q = brand-siloed
    carts. Emits one row per brand with its cell values plus the shared
    Q (ascending-brand fold)."""
    import ray.data as rd

    edges = _edges(sf_dir)
    m = len(edges)
    if m == 0:
        return pd.DataFrame(
            {
                "brand": pd.Series([], dtype=object),
                "n_nodes": pd.Series([], dtype=np.int64),
                "intra_edges": pd.Series([], dtype=np.int64),
                "degree_sum": pd.Series([], dtype=np.int64),
                "modularity": pd.Series([], dtype=np.float64),
            }
        )
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    nodes = sorted(
        set(edges["pa"].tolist()) | set(edges["pb"].tolist())
    )
    node_ds = rd.from_pandas(
        pd.DataFrame({"p_partkey": np.array(nodes, dtype=np.int64)})
    )
    labeled = bucketed_join(node_ds, part, on=["p_partkey"]).to_pandas()
    brand_of = dict(
        zip(
            labeled["p_partkey"].to_numpy(np.int64),
            labeled["p_brand"].to_numpy(),
        )
    )
    deg: dict = {}
    intra: dict = {}
    dsum: dict = {}
    n_nodes: dict = {}
    for a, b in zip(
        edges["pa"].to_numpy(np.int64), edges["pb"].to_numpy(np.int64)
    ):
        ba, bb = brand_of[int(a)], brand_of[int(b)]
        dsum[ba] = dsum.get(ba, 0) + 1
        dsum[bb] = dsum.get(bb, 0) + 1
        if ba == bb:
            intra[ba] = intra.get(ba, 0) + 1
    for n in nodes:
        bn = brand_of[int(n)]
        n_nodes[bn] = n_nodes.get(bn, 0) + 1
    brands = sorted(dsum)
    terms = []
    rows = []
    for c in brands:
        e_c = intra.get(c, 0)
        d_c = dsum[c]
        term = float(e_c) / float(m) - (
            float(d_c) / (2.0 * float(m))
        ) * (float(d_c) / (2.0 * float(m)))
        terms.append(term)
        rows.append((c, n_nodes.get(c, 0), e_c, d_c))
    q = _fold(terms)
    return pd.DataFrame(
        {
            "brand": [r[0] for r in rows],
            "n_nodes": np.array([r[1] for r in rows], dtype=np.int64),
            "intra_edges": np.array([r[2] for r in rows], dtype=np.int64),
            "degree_sum": np.array([r[3] for r in rows], dtype=np.int64),
            "modularity": np.full(len(rows), float(_r6away(q))),
        }
    )


ORACLES142["brand_modularity"] = f"""
WITH {_EDGE_SQL},
lab AS (
  SELECT e.pa, e.pb, xa.p_brand AS ba, xb.p_brand AS bb
  FROM e
  JOIN part xa ON xa.p_partkey = e.pa
  JOIN part xb ON xb.p_partkey = e.pb
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
dsum AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT ba AS brand FROM lab UNION ALL SELECT bb FROM lab)
  GROUP BY 1
),
intra AS (
  SELECT ba AS brand, CAST(COUNT(*) AS BIGINT) AS e_c
  FROM lab WHERE ba = bb GROUP BY 1
),
nn AS (
  SELECT p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM (SELECT pa AS k FROM e UNION SELECT pb FROM e) nodes
  JOIN part p ON p.p_partkey = nodes.k
  GROUP BY 1
),
cells AS (
  SELECT d.brand, COALESCE(i.e_c, 0) AS e_c, d.d,
         COALESCE(nn.n_nodes, 0) AS n_nodes,
         CAST(COALESCE(i.e_c, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
           - (CAST(d.d AS DOUBLE) / (CAST(2.0 AS DOUBLE)
                                     * CAST(m.m AS DOUBLE)))
             * (CAST(d.d AS DOUBLE) / (CAST(2.0 AS DOUBLE)
                                       * CAST(m.m AS DOUBLE))) AS term
  FROM dsum d
  LEFT JOIN intra i ON i.brand = d.brand
  LEFT JOIN nn ON nn.brand = d.brand
  CROSS JOIN m
),
qq AS (SELECT list_sum(list(term ORDER BY brand)) AS q FROM cells)
SELECT c.brand, c.n_nodes, CAST(c.e_c AS BIGINT) AS intra_edges,
       c.d AS degree_sum,
       ROUND(qq.q, 6) AS modularity
FROM cells c CROSS JOIN qq
"""


# ---------------------------------------------------------------------------
# Good-Turing unseen mass
# ---------------------------------------------------------------------------


def q_good_turing_mass(sf_dir: str):
    """Per source: the Good-Turing estimate of unseen-word probability
    mass P(next token is new) = F1/N (hapax occurrences over total
    occurrences), with the complementary sample coverage 1 - F1/N — the
    sampling-completeness companion of chao1_richness (which estimates
    how MANY words are missing; this estimates how OFTEN you'll hit
    one). Exact integers, one shared division."""

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        rows_src: list = []
        rows_tok: list = []
        for src, t in zip(batch["source"], batch["text"].fillna("")):
            for w in t.split():
                rows_src.append(src)
                rows_tok.append(w)
        return pd.DataFrame(
            {
                "source": rows_src,
                "token": rows_tok,
                "n": np.ones(len(rows_tok), dtype=np.int64),
            }
        )

    counts = hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            toks, batch_format="pandas"
        ),
        ["source", "token"],
        [("n", "sum")],
    )

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_sum"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "total": n,
                    "f1": (n == 1).astype(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        counts.map_batches(feats, batch_format="pandas"),
        ["source"],
        [("total", "sum"), ("f1", "sum")],
    ).to_pandas()
    tot = agg["total_sum"].to_numpy(np.int64)
    f1 = agg["f1_sum"].to_numpy(np.int64)
    keep = tot > 0
    mass = f1[keep].astype(np.float64) / tot[keep].astype(np.float64)
    return pd.DataFrame(
        {
            "source": agg["source"].to_numpy()[keep],
            "n_tokens": tot[keep],
            "n_hapax": f1[keep],
            "unseen_mass": _r6away(mass),
            "coverage": _r6away(1.0 - mass),
        }
    )


ORACLES142["good_turing_mass"] = """
WITH t AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
g AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS f1
  FROM c GROUP BY 1 HAVING SUM(n) > 0
)
SELECT source, total AS n_tokens, f1 AS n_hapax,
       ROUND(CAST(f1 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS unseen_mass,
       ROUND(CAST(1.0 AS DOUBLE)
             - CAST(f1 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage
FROM g
"""


QUERIES142["brand_modularity"] = q_brand_modularity
QUERIES142["good_turing_mass"] = q_good_turing_mass
