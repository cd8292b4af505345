"""Round-4 batch 124: embedding-space quality metrics — the
Davies-Bouldin index (RMS-scatter variant, closed-form over exact
quantized component sums), per-vector simplified silhouettes (distance
to own vs nearest other centroid — the per-point cluster-fit table),
reverse-5NN hubness over a deterministic probe panel (the
high-dimensional pathology screen for ANN indexes), and the exact
quantized-norm histogram.

House parity: all vectors pass through the shared symmetric int8
quantization (_quantize_rows == the embedding_quantize SQL transcription
already oracle-verified), so every scatter / distance / dot ingredient
is an exact int64/HUGEINT sum; distances and ratios are transcribed
float expressions (sqrt of exact ints, shared division order); hubness
neighbor ranking sorts on (ROUND(cos,6) DESC, vec_id ASC) — the bm25
deterministic-ranking contract — so top-5 membership is identical on
both engines; cross-label folds run in ascending label/dim order.

Scale contracts: label sums reduce through one (label, dim)-keyed
exchange (k x d bounded); silhouettes broadcast only the k x d sum
table into a second map_batches pass (per-point rows, no cross-point
float reduction anywhere); hubness restricts to the vec_id < 500 panel
(bounded probe, the bloom_dedup_probe pattern); the norm histogram is
an integer partial+final reduce."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries4 import _quantize_rows
from .queries14 import _fold

QUERIES124: dict = {}
ORACLES124: dict = {}

HUB_PANEL = 500
HUB_K = 5
NORM_BUCKET = 20_000

_QUANT_SQL = """
m AS (
  SELECT vec_id, label, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS ma
  FROM embeddings
),
e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(embedding,
           x -> CASE WHEN ma = 0 THEN 0
                     ELSE CAST(ROUND(CAST(x AS DOUBLE) / CAST(ma AS DOUBLE)
                                     * 127) AS BIGINT) END)) AS q
  FROM m
)
"""


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"],
    )


def _label_sums(sf_dir: str) -> pd.DataFrame:
    """(label, dim, n_sum, sq_sum, q2d_sum) via one bucketed exchange."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        labels = batch["label"].to_numpy(np.int64)
        frames = []
        d = q.shape[1]
        for lab in np.unique(labels):
            sel = q[labels == lab]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(d, lab, dtype=np.int64),
                        "dim": np.arange(d, dtype=np.int64),
                        "n": np.full(d, sel.shape[0], dtype=np.int64),
                        "sq": sel.sum(axis=0),
                        "q2d": (sel * sel).sum(axis=0),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return (
        hash_bucket_aggregate(
            _embeddings(sf_dir).map_batches(partial, batch_format="pandas"),
            ["label", "dim"],
            [("n", "sum"), ("sq", "sum"), ("q2d", "sum")],
        )
        .to_pandas()
        .sort_values(["label", "dim"])
    )


# ---------------------------------------------------------------------------
# Davies-Bouldin index (RMS scatter variant)
# ---------------------------------------------------------------------------


def q_davies_bouldin(sf_dir: str):
    """Davies-Bouldin index over the labelled quantized embeddings with
    the RMS (p=2) scatter variant S_l = sqrt(W_l / n_l), W_l the exact
    within-label sum of squares Q2_l - |s_l|^2/n_l — every ingredient an
    exact integer, so the index is a short tree of transcribed float
    expressions. Emits one row per label with its scatter and worst
    similarity ratio R_max, plus the shared DB index (ascending-label
    fold)."""
    agg = _label_sums(sf_dir)
    labels = sorted(agg["label"].unique())
    k = len(labels)
    stats = {}
    for lab in labels:
        g = agg[agg["label"] == lab].sort_values("dim")
        n = int(g["n_sum"].iloc[0])
        s = [int(x) for x in g["sq_sum"]]
        q2 = sum(int(x) for x in g["q2d_sum"])
        s2 = 0
        for x in s:
            s2 += x * x
        w = float(q2) - float(s2) / float(n)
        scatter = math.sqrt(w / float(n))
        stats[lab] = (n, s, scatter)
    rows = []
    rmaxes = []
    for la in labels:
        na, sa, sca = stats[la]
        rmax = None
        for lb in labels:
            if lb == la:
                continue
            nb, sb, scb = stats[lb]
            m2 = _fold(
                [
                    (float(x) / float(na) - float(y) / float(nb))
                    * (float(x) / float(na) - float(y) / float(nb))
                    for x, y in zip(sa, sb)
                ]
            )
            r = (sca + scb) / math.sqrt(m2)
            if rmax is None or r > rmax:
                rmax = r
        rmaxes.append(rmax)
        rows.append((la, na, sca, rmax))
    db = _fold(rmaxes) / float(k)
    return pd.DataFrame(
        {
            "label": [r[0] for r in rows],
            "n_vecs": np.array([r[1] for r in rows], dtype=np.int64),
            "scatter": _r6away([r[2] for r in rows]),
            "r_max": _r6away([r[3] for r in rows]),
            "db_index": np.full(k, float(_r6away(db))),
        }
    )


ORACLES124["davies_bouldin"] = f"""
WITH {_QUANT_SQL},
c AS (
  SELECT label, dim, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS q2d
  FROM e GROUP BY 1, 2
),
lab AS (
  SELECT label, MAX(n) AS n,
         SUM(CAST(sq AS HUGEINT) * sq) AS s2,
         CAST(SUM(q2d) AS HUGEINT) AS q2
  FROM c GROUP BY 1
),
s AS (
  SELECT label, n,
         sqrt((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE)) AS scatter
  FROM lab
),
mm AS (
  SELECT ca.label AS la, cb.label AS lb,
         list_sum(list(
           (CAST(ca.sq AS DOUBLE) / CAST(ca.n AS DOUBLE)
            - CAST(cb.sq AS DOUBLE) / CAST(cb.n AS DOUBLE))
           * (CAST(ca.sq AS DOUBLE) / CAST(ca.n AS DOUBLE)
              - CAST(cb.sq AS DOUBLE) / CAST(cb.n AS DOUBLE))
           ORDER BY ca.dim)) AS m2
  FROM c ca JOIN c cb ON cb.dim = ca.dim AND cb.label <> ca.label
  GROUP BY 1, 2
),
r AS (
  SELECT mm.la AS label, MAX((sa.scatter + sb.scatter) / sqrt(mm.m2)) AS rmax
  FROM mm
  JOIN s sa ON sa.label = mm.la
  JOIN s sb ON sb.label = mm.lb
  GROUP BY 1
),
db AS (
  SELECT list_sum(list(rmax ORDER BY label)) / CAST(COUNT(*) AS DOUBLE)
           AS db_index
  FROM r
)
SELECT s.label, CAST(s.n AS BIGINT) AS n_vecs,
       ROUND(s.scatter, 6) AS scatter,
       ROUND(r.rmax, 6) AS r_max,
       ROUND(db.db_index, 6) AS db_index
FROM s JOIN r USING (label) CROSS JOIN db
"""


# ---------------------------------------------------------------------------
# Per-vector simplified silhouette
# ---------------------------------------------------------------------------


def q_silhouette_simplified(sf_dir: str):
    """Per vector: the simplified silhouette (b - a)/max(a, b) with a =
    distance to the OWN label centroid and b = the minimum distance to
    any other label's centroid. Distances are sqrt(D2)/n_l where D2 =
    sum_d (q_d*n_l - s_d)^2 is an exact integer (centroid fractions
    cleared), so engine and SQL compute the identical float per point —
    and because the output is per-point, NO cross-point float reduction
    exists anywhere. The k x d sum table broadcasts into the second
    pass; the vector table itself streams."""
    agg = _label_sums(sf_dir)
    cents = {}
    for lab, g in agg.groupby("label"):
        g = g.sort_values("dim")
        cents[int(lab)] = (
            int(g["n_sum"].iloc[0]),
            g["sq_sum"].to_numpy(np.int64),
        )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        own = batch["label"].to_numpy(np.int64)
        vid = batch["vec_id"].to_numpy(np.int64)
        a = np.zeros(len(batch), dtype=np.float64)
        b = np.full(len(batch), np.inf, dtype=np.float64)
        for lab, (nl, s) in cents.items():
            diff = q * np.int64(nl) - s[None, :]
            d2 = (diff * diff).sum(axis=1)
            dist = np.sqrt(d2.astype(np.float64)) / float(nl)
            is_own = own == lab
            a[is_own] = dist[is_own]
            b[~is_own] = np.minimum(b[~is_own], dist[~is_own])
        mx = np.maximum(a, b)
        sil = np.where(mx > 0, (b - a) / mx, 0.0)
        return pd.DataFrame(
            {
                "vec_id": vid,
                "label": own,
                "a_dist": _r6away(a),
                "b_dist": _r6away(b),
                "silhouette": _r6away(sil),
            }
        )

    return _embeddings(sf_dir).map_batches(score, batch_format="pandas")


ORACLES124["silhouette_simplified"] = f"""
WITH {_QUANT_SQL},
c AS (
  SELECT label, dim, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq
  FROM e GROUP BY 1, 2
),
d2 AS (
  SELECT e.vec_id, e.label AS own, c.label AS l, MAX(c.n) AS n,
         SUM(CAST(e.q * c.n - c.sq AS HUGEINT) * (e.q * c.n - c.sq)) AS d2
  FROM e JOIN c ON c.dim = e.dim
  GROUP BY 1, 2, 3
),
dist AS (
  SELECT vec_id, own, l,
         sqrt(CAST(d2 AS DOUBLE)) / CAST(n AS DOUBLE) AS dist
  FROM d2
),
ab AS (
  SELECT a.vec_id, a.own AS label, a.dist AS a_dist, b.b_dist
  FROM (SELECT vec_id, own, dist FROM dist WHERE l = own) a
  JOIN (SELECT vec_id, MIN(dist) AS b_dist FROM dist WHERE l <> own
        GROUP BY 1) b USING (vec_id)
)
SELECT vec_id, label, ROUND(a_dist, 6) AS a_dist, ROUND(b_dist, 6) AS b_dist,
       ROUND(CASE WHEN greatest(a_dist, b_dist) > 0
                  THEN (b_dist - a_dist) / greatest(a_dist, b_dist)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS silhouette
FROM ab
"""


# ---------------------------------------------------------------------------
# Reverse-5NN hubness over the probe panel
# ---------------------------------------------------------------------------


def q_hubness(sf_dir: str):
    """Reverse-5NN in-degree for every vector of the deterministic
    vec_id < 500 probe panel: how often each vector appears in another
    panel vector's top-5 by quantized cosine — heavy right tails (hubs)
    are the classic high-dimensional pathology that degrades ANN
    recall. Dots and norms are exact integers; ranking is
    (ROUND(cos, 6) DESC, vec_id ASC); vectors in nobody's top-5 appear
    with in_degree 0."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch["vec_id"].to_numpy(np.int64) < HUB_PANEL
        return batch[sel]

    panel = (
        _embeddings(sf_dir)
        .map_batches(keep, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id")
    )
    vid = panel["vec_id"].to_numpy(np.int64)
    q = _quantize_rows(panel["embedding"])
    dots = q @ q.T  # exact int64
    n2 = (q * q).sum(axis=1)
    ok = n2 > 0
    cos = dots.astype(np.float64) / np.sqrt(
        n2.astype(np.float64)[:, None] * n2.astype(np.float64)[None, :]
    )
    cos_r = _r6away(cos)
    indeg = np.zeros(len(vid), dtype=np.int64)
    for i in range(len(vid)):
        if not ok[i]:
            continue
        cand = [
            (float(-cos_r[i, j]), int(vid[j]), j)
            for j in range(len(vid))
            if j != i and ok[j]
        ]
        cand.sort()
        for _, _, j in cand[:HUB_K]:
            indeg[j] += 1
    return pd.DataFrame(
        {"vec_id": vid[ok], "in_degree": indeg[ok]}
    ).astype({"vec_id": np.int64, "in_degree": np.int64})


ORACLES124["hubness"] = f"""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS ma
  FROM embeddings WHERE vec_id < {HUB_PANEL}
),
e AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(embedding,
           x -> CASE WHEN ma = 0 THEN 0
                     ELSE CAST(ROUND(CAST(x AS DOUBLE) / CAST(ma AS DOUBLE)
                                     * 127) AS BIGINT) END)) AS q
  FROM m
),
n2 AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM e GROUP BY 1
),
ok AS (SELECT vec_id, n2 FROM n2 WHERE n2 > 0),
pairs AS (
  SELECT a.vec_id AS qa, b.vec_id AS qb,
         SUM(CAST(ea.q AS HUGEINT) * eb.q) AS dot
  FROM ok a JOIN ok b ON b.vec_id <> a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id AND eb.dim = ea.dim
  GROUP BY 1, 2
),
scored AS (
  SELECT p.qa, p.qb,
         ROUND(CAST(p.dot AS DOUBLE)
               / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6)
           AS cos_r
  FROM pairs p
  JOIN ok na ON na.vec_id = p.qa
  JOIN ok nb ON nb.vec_id = p.qb
),
top AS (
  SELECT qa, qb FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY qa
                             ORDER BY cos_r DESC, qb ASC) <= {HUB_K}
)
SELECT o.vec_id, CAST(COALESCE(t.c, 0) AS BIGINT) AS in_degree
FROM ok o
LEFT JOIN (SELECT qb, COUNT(*) AS c FROM top GROUP BY 1) t
  ON t.qb = o.vec_id
"""


# ---------------------------------------------------------------------------
# Exact quantized-norm histogram
# ---------------------------------------------------------------------------


def q_embedding_norm_histogram(sf_dir: str):
    """Histogram of exact quantized squared norms in 20k-unit buckets —
    the 30-second sanity check that an embedding table's scale is
    consistent (a bimodal norm histogram usually means two different
    models wrote the column). Pure integer partial+final reduce."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        n2 = (q * q).sum(axis=1)
        b = n2 // NORM_BUCKET
        return (
            pd.DataFrame(
                {
                    "bucket": b,
                    "n": np.ones(len(batch), dtype=np.int64),
                    "mn": n2,
                    "mx": n2,
                }
            )
            .groupby("bucket", sort=False)
            .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _embeddings(sf_dir).map_batches(partial, batch_format="pandas"),
        ["bucket"],
        [("n", "sum"), ("mn", "min"), ("mx", "max")],
    ).to_pandas()
    return pd.DataFrame(
        {
            "bucket": agg["bucket"].to_numpy(np.int64),
            "n_vecs": agg["n_sum"].to_numpy(np.int64),
            "min_norm2": agg["mn_min"].to_numpy(np.int64),
            "max_norm2": agg["mx_max"].to_numpy(np.int64),
        }
    )


ORACLES124["embedding_norm_histogram"] = f"""
WITH {_QUANT_SQL},
n2 AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM e GROUP BY 1
)
SELECT n2 // {NORM_BUCKET} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(n2) AS BIGINT) AS min_norm2,
       CAST(MAX(n2) AS BIGINT) AS max_norm2
FROM n2 GROUP BY 1
"""


QUERIES124["davies_bouldin"] = q_davies_bouldin
QUERIES124["silhouette_simplified"] = q_silhouette_simplified
QUERIES124["hubness"] = q_hubness
QUERIES124["embedding_norm_histogram"] = q_embedding_norm_histogram
