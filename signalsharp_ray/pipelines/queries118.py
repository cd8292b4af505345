"""Round-4 batch 118: referential audit, sequence mining, and spectral
embedding analysis — the customer-name/key consistency audit (TPC-H
names embed their key: 'Customer#000000007'), the top-5 within-session
event-type trigram paths (30-minute session gap), and the dominant
eigenvalue/eigenvector of the embedding covariance via power iteration
over the EXACT distributed Gram matrix (rows-only: SQL has no eig).

House parity: the name audit compares exact parsed integers; path
counts are integers with (count DESC, path ASC) tie-breaks; session
boundaries are exact microsecond gap comparisons on both sides.

Scale contracts: the audit is one projection pass + tiny sums; path
mining reduces per user inside a bucketed exchange, then exchanges
bounded (path, count) partials (|event_type|^3 = 125 keys max); the
Gram matrix aggregates as exact int64 micro-unit products per batch
(dim x dim, bounded), and the power iteration runs on the driver over
that bounded matrix."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries16 import _read

QUERIES118: dict = {}
ORACLES118: dict = {}

MIN30_US = 30 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# Customer name <-> key consistency audit
# ---------------------------------------------------------------------------


def q_customer_name_consistency(sf_dir: str):
    """One global row: customers, how many names parse to an integer
    suffix, how many of those equal c_custkey, and the consistent
    share — a referential-quality audit over the name column."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        names = batch["c_name"].astype(str)
        digits = names.str.extract(r"(\d+)", expand=False)
        parsed = pd.to_numeric(digits, errors="coerce")
        has = parsed.notna()
        eq = has & (
            parsed.fillna(-1).astype(np.int64)
            == batch["c_custkey"].astype(np.int64)
        )
        return pd.DataFrame(
            {
                "n": np.array([len(batch)], dtype=np.int64),
                "parsed": np.array([int(has.sum())], dtype=np.int64),
                "consistent": np.array([int(eq.sum())], dtype=np.int64),
            }
        )

    parts = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame(
            {
                "n_customers": pd.Series(dtype=np.int64),
                "n_parsed": pd.Series(dtype=np.int64),
                "n_consistent": pd.Series(dtype=np.int64),
                "consistent_share": pd.Series(dtype=np.float64),
            }
        )
    parsed = int(parts["parsed"].sum())
    cons = int(parts["consistent"].sum())
    return pd.DataFrame(
        {
            "n_customers": np.array([n], dtype=np.int64),
            "n_parsed": np.array([parsed], dtype=np.int64),
            "n_consistent": np.array([cons], dtype=np.int64),
            "consistent_share": [float(_r6away(float(cons) / float(n)))],
        }
    )


ORACLES118["customer_name_consistency"] = """
WITH p AS (
  SELECT c_custkey,
         TRY_CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS parsed
  FROM customer
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
       CAST(COUNT(*) FILTER (WHERE parsed = c_custkey) AS BIGINT)
         AS n_consistent,
       ROUND(CAST(COUNT(*) FILTER (WHERE parsed = c_custkey) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS consistent_share
FROM p
"""


# ---------------------------------------------------------------------------
# Top-5 within-session event-type trigram paths
# ---------------------------------------------------------------------------


def q_session_path_trigrams(sf_dir: str, k: int = 5):
    """The 5 most common 3-step event_type paths inside 30-minute-gap
    sessions (count DESC, path ASC): what users actually do in
    sequence. Exact integer counts; bounded key space."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
                "event_type": batch["event_type"].astype(str),
                "us": batch["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    ev = _events(sf_dir, ["user_id", "event_id", "event_type", "ts"]).map_batches(
        project, batch_format="pandas"
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["us", "event_id"])
        us = g["us"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        if len(us) < 3:
            return pd.DataFrame(
                {"path": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        sess = np.concatenate(
            [[0], np.cumsum((np.diff(us) > MIN30_US).astype(np.int64))]
        )
        same = (sess[2:] == sess[:-2])
        if not same.any():
            return pd.DataFrame(
                {"path": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        idx = np.flatnonzero(same)
        paths = [
            f"{et[i]}>{et[i + 1]}>{et[i + 2]}" for i in idx
        ]
        return (
            pd.DataFrame({"path": paths, "n": np.ones(len(paths), dtype=np.int64)})
            .groupby("path", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            bucketed_map_groups(ev, ["user_id"], per_user),
            ["path"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["n_sum", "path"], ascending=[False, True])
        .head(k)
    )
    return pd.DataFrame(
        {
            "path": agg["path"].astype(str),
            "n_occurrences": agg["n_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES118["session_path_trigrams"] = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         epoch_us(ts) AS us,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM seq
),
tri AS (
  SELECT user_id, sid, event_type AS a,
         LEAD(event_type, 1) OVER w2 AS b,
         LEAD(event_type, 2) OVER w2 AS c,
         LEAD(sid, 2) OVER w2 AS sid2
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
),
paths AS (
  SELECT a || '>' || b || '>' || c AS path
  FROM tri WHERE c IS NOT NULL AND sid2 = sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM paths GROUP BY 1
QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, path ASC) <= 5
"""


# ---------------------------------------------------------------------------
# Dominant covariance eigenpair via power iteration over the exact Gram
# ---------------------------------------------------------------------------


def q_embedding_top_eigen(sf_dir: str, iters: int = 60):
    """One row: the dominant eigenvalue of the embedding covariance and
    the index + sign-normalized weight of its largest-magnitude
    coordinate. The Gram matrix and mean aggregate DISTRIBUTED as exact
    int64 sums of micro-unit (1e-6-quantized) products — bit-identical
    under any batch split — and the power iteration then runs on the
    driver over the bounded dim x dim matrix. Rows-only by design (SQL
    has no eigensolver); pinned against numpy.linalg.eigh in tests."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(batch["embedding"].to_numpy())
        q = np.rint(m.astype(np.float64) * 1e6).astype(np.int64)
        gram = q.T @ q  # exact: |q| <= ~2e6, dim sums fit int64 at any sf
        s = q.sum(axis=0)
        d = q.shape[1]
        return pd.DataFrame(
            {
                "n": np.array([len(batch)], dtype=np.int64),
                "dim": np.array([d], dtype=np.int64),
                "gram": [gram.ravel()],
                "s": [s],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "n_vectors": pd.Series(dtype=np.int64),
                "top_eigenvalue": pd.Series(dtype=np.float64),
                "top_coord": pd.Series(dtype=np.int64),
                "top_coord_weight": pd.Series(dtype=np.float64),
            }
        )
    n = int(parts["n"].sum())
    d = int(parts["dim"].iloc[0])
    gram = np.zeros(d * d, dtype=np.int64)
    s = np.zeros(d, dtype=np.int64)
    for g_, s_ in zip(parts["gram"], parts["s"]):
        gram += np.asarray(g_, dtype=np.int64)
        s += np.asarray(s_, dtype=np.int64)
    gram = gram.reshape(d, d)
    # covariance in original units: (G/n - mu mu^T) / 1e12, exact ints in
    cov = (gram.astype(np.float64) / n
           - np.outer(s, s).astype(np.float64) / (n * n)) / 1e12
    v = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(iters):
        w = cov @ v
        nw = float(np.linalg.norm(w))
        if nw == 0.0:
            break
        v = w / nw
    lam = float(v @ cov @ v)
    j = int(np.argmax(np.abs(v)))
    weight = float(v[j]) if v[j] >= 0 else float(-v[j])
    return pd.DataFrame(
        {
            "n_vectors": np.array([n], dtype=np.int64),
            "top_eigenvalue": [float(_r6away(lam))],
            "top_coord": np.array([j], dtype=np.int64),
            "top_coord_weight": [float(_r6away(weight))],
        }
    )


QUERIES118["customer_name_consistency"] = q_customer_name_consistency
QUERIES118["session_path_trigrams"] = q_session_path_trigrams
QUERIES118["embedding_top_eigen"] = q_embedding_top_eigen
