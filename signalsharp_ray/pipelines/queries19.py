"""Round-3 batch 21: spectral and dispersion diagnostics — spectral
entropy over the first four diurnal harmonics (four Goertzel bins ->
normalized power entropy: pure sine days score 0, structureless days
score ln(4)), corpus token dispersion (variance-to-mean ratio of the
top-20 tokens across documents — bursty topical tokens vs evenly-spread
function words), order-value quartiles per market segment (nearest-rank
cents), and the monthly lineitem return rate.

House parity: each Goertzel bin is the SAME two-state float recursion
as goertzel_diurnal with its own repr-embedded 2cos(2pi k/24)
coefficient, transcribed against four recursive CTEs; per-bin powers
anchor at ROUND(,6) before the 4-term entropy, whose sums are explicit
left-associated + chains (no folds needed at arity 4); dispersion and
return-rate ingredients are exact integer sums (HUGEINT squares);
quartiles are exact order statistics of int64 cents.

Scale contracts: dense hourly grids are retention-bounded; the top-K
token pass reduces counts through one exchange and merges only
K-per-batch candidates on the driver; the dispersion pass broadcasts
the bounded top-K set; segment grouping follows the quantiles
bucketed_map_groups contract.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries10 import _dense_by_type, goertzel_power
from .queries6 import _hourly_counts
from .queries16 import _TOKEN_RE, _cents_col, _read

QUERIES19: dict = {}
ORACLES19: dict = {}

SPECTRAL_PERIODS = (24.0, 12.0, 8.0, 6.0)  # harmonics k = 1..4 of the day
SPECTRAL_CS = tuple(2.0 * math.cos(2.0 * math.pi / p) for p in SPECTRAL_PERIODS)
TOPK_DISPERSION = 20


# ---------------------------------------------------------------------------
# Spectral entropy over diurnal harmonics
# ---------------------------------------------------------------------------


def q_spectral_entropy(sf_dir: str):
    """Per event type: Goertzel power at periods 24/12/8/6 h over the
    dense hourly grid, normalized into a 4-bin spectrum whose Shannon
    entropy (0 = one pure tone, ln 4 = flat) scores how concentrated
    the diurnal structure is. Powers anchor at ROUND(,6); the entropy
    is H = ln(P) - (sum p ln p)/P over the anchored bins with explicit
    left-associated sums."""
    types, _grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        ps = [float(_r6away(goertzel_power(v, c))) for c in SPECTRAL_CS]
        p1, p2, p3, p4 = ps
        total = ((p1 + p2) + p3) + p4
        if total <= 0.0:
            continue
        terms = [(p * math.log(p) if p > 0.0 else 0.0) for p in ps]
        f = ((terms[0] + terms[1]) + terms[2]) + terms[3]
        h = math.log(total) - f / total
        rows.append((t, int(v.size), p1, p2, p3, p4, float(_r6away(h))))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n", "p24", "p12", "p8", "p6", "spec_entropy"],
    ).astype({"n": np.int64})


def _goertzel_cte(name: str, c: float) -> str:
    return f"""
{name} AS (
  SELECT event_type, CAST(-1 AS BIGINT) AS idx,
         CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2
  FROM mx
  UNION ALL
  SELECT b.event_type, b.idx,
         b.v + {c!r} * {name}.s1 - {name}.s2 AS s1,
         {name}.s1 AS s2
  FROM {name} JOIN base b
    ON b.event_type = {name}.event_type AND b.idx = {name}.idx + 1
),
{name}_p AS (
  SELECT g.event_type,
         ROUND(g.s1 * g.s1 + g.s2 * g.s2 - {c!r} * g.s1 * g.s2, 6) AS p
  FROM {name} g JOIN mx m
    ON m.event_type = g.event_type AND g.idx = m.mx
)"""


ORACLES19["spectral_entropy"] = (
    """
WITH RECURSIVE h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
base AS MATERIALIZED (
  SELECT t.event_type,
         ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1 AS idx,
         CAST(COALESCE(h.n, 0) AS DOUBLE) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
mx AS (SELECT event_type, MAX(idx) AS mx FROM base GROUP BY 1),"""
    + ",".join(
        _goertzel_cte(f"g{k}", c) for k, c in enumerate(SPECTRAL_CS, start=1)
    )
    + """
SELECT m.event_type,
       CAST(m.mx + 1 AS BIGINT) AS n,
       g1_p.p AS p24, g2_p.p AS p12, g3_p.p AS p8, g4_p.p AS p6,
       ROUND(
         ln(((g1_p.p + g2_p.p) + g3_p.p) + g4_p.p)
         - (((CASE WHEN g1_p.p > 0.0 THEN g1_p.p * ln(g1_p.p) ELSE 0.0 END
              + CASE WHEN g2_p.p > 0.0 THEN g2_p.p * ln(g2_p.p) ELSE 0.0 END)
             + CASE WHEN g3_p.p > 0.0 THEN g3_p.p * ln(g3_p.p) ELSE 0.0 END)
            + CASE WHEN g4_p.p > 0.0 THEN g4_p.p * ln(g4_p.p) ELSE 0.0 END)
           / (((g1_p.p + g2_p.p) + g3_p.p) + g4_p.p), 6) AS spec_entropy
FROM mx m
JOIN g1_p USING (event_type) JOIN g2_p USING (event_type)
JOIN g3_p USING (event_type) JOIN g4_p USING (event_type)
WHERE ((g1_p.p + g2_p.p) + g3_p.p) + g4_p.p > 0.0
"""
)


# ---------------------------------------------------------------------------
# Token dispersion (variance-to-mean across documents)
# ---------------------------------------------------------------------------


def q_token_dispersion(sf_dir: str, k: int = TOPK_DISPERSION):
    """For the top-K corpus tokens: the variance-to-mean ratio of their
    per-document counts (zeros included) — VMR ~ 1 is Poisson-spread
    (function words), VMR >> 1 is bursty/topical. Pass 1 finds the
    exact top-K through one count exchange + per-batch top-K merge;
    pass 2 broadcasts the bounded set and reduces exact S/SS sums."""
    docs = _documents(sf_dir, ["doc_id", "source", "text"])
    n_docs_ds = docs.map_batches(
        lambda b: pd.DataFrame({"one": np.ones(1, dtype=np.int64) * len(b)}),
        batch_format="pandas",
    ).to_pandas()
    n_docs = int(n_docs_ds["one"].sum())

    def tok_counts(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for text in batch["text"]:
            for tok in _TOKEN_RE.findall((text or "").lower()):
                rows[tok] = rows.get(tok, 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {"tok": keys, "m": np.array([rows[t] for t in keys], dtype=np.int64)}
        )

    counts = hash_bucket_aggregate(
        docs.map_batches(tok_counts, batch_format="pandas"), ["tok"], [("m", "sum")]
    )
    cand = (
        counts.map_batches(
            lambda b: b.sort_values(["m_sum", "tok"], ascending=[False, True]).head(k),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["m_sum", "tok"], ascending=[False, True])
        .head(k)
    )
    top = set(cand["tok"])  # bounded broadcast

    def per_doc(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for text in batch["text"]:
            seen: dict = {}
            for tok in _TOKEN_RE.findall((text or "").lower()):
                if tok in top:
                    seen[tok] = seen.get(tok, 0) + 1
            for tok, c in seen.items():
                s, ss, d = rows.get(tok, (0, 0, 0))
                rows[tok] = (s + c, ss + c * c, d + 1)
        keys = list(rows)
        return pd.DataFrame(
            {
                "tok": keys,
                "s": np.array([rows[t][0] for t in keys], dtype=np.int64),
                "ss": np.array([rows[t][1] for t in keys], dtype=np.int64),
                "d": np.array([rows[t][2] for t in keys], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(per_doc, batch_format="pandas"),
        ["tok"],
        [("s", "sum"), ("ss", "sum"), ("d", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        s, ss, d = int(r["s_sum"]), int(r["ss_sum"]), int(r["d_sum"])
        mean = float(s) / float(n_docs)
        vmr = (float(ss) / float(n_docs) - mean * mean) / mean
        rows.append((r["tok"], d, s, float(_r6away(vmr))))
    return (
        pd.DataFrame(rows, columns=["token", "n_docs_present", "total_count", "vmr"])
        .astype({"n_docs_present": np.int64, "total_count": np.int64})
        .sort_values("token")
        .reset_index(drop=True)
    )


ORACLES19["token_dispersion"] = f"""
WITH t AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
g AS (SELECT tok, COUNT(*) AS m FROM t GROUP BY 1),
top AS (
  SELECT tok FROM g
  ORDER BY m DESC, tok ASC LIMIT {TOPK_DISPERSION}
),
dc AS (
  SELECT t.tok, t.doc_id, COUNT(*) AS c
  FROM t JOIN top USING (tok) GROUP BY 1, 2
),
n AS (SELECT COUNT(*) AS nd FROM documents),
a AS (
  SELECT tok,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c::HUGEINT * c::HUGEINT) AS BIGINT) AS ss,
         COUNT(*) AS d
  FROM dc GROUP BY 1
)
SELECT a.tok AS token,
       CAST(a.d AS BIGINT) AS n_docs_present,
       a.s AS total_count,
       ROUND((CAST(a.ss AS DOUBLE) / CAST(n.nd AS DOUBLE)
              - (CAST(a.s AS DOUBLE) / CAST(n.nd AS DOUBLE))
                * (CAST(a.s AS DOUBLE) / CAST(n.nd AS DOUBLE)))
             / (CAST(a.s AS DOUBLE) / CAST(n.nd AS DOUBLE)), 6) AS vmr
FROM a CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# Order-value quartiles per market segment
# ---------------------------------------------------------------------------


def q_segment_order_quartiles(sf_dir: str):
    """Per customer market segment: order count, total value, and the
    exact nearest-rank quartiles of order value in cents — the
    relational twin of the events-table quantile family (orders join
    customers co-partitioned on custkey; segments group through the
    quantiles bucketed_map_groups contract)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "price_c": _cents_col(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "segment": b["c_mktsegment"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(orders, cust, on=["custkey"], how="inner")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["price_c"].to_numpy(np.int64))
        n = v.size
        q = lambda p: int(v[(p * n + 99) // 100 - 1])
        return pd.DataFrame(
            {
                "segment": [df["segment"].iloc[0]],
                "n_orders": np.array([n], dtype=np.int64),
                "total_c": np.array([int(v.sum())], dtype=np.int64),
                "q1_c": np.array([q(25)], dtype=np.int64),
                "q2_c": np.array([q(50)], dtype=np.int64),
                "q3_c": np.array([q(75)], dtype=np.int64),
            }
        )

    return bucketed_map_groups(joined, ["segment"], kernel)


ORACLES19["segment_order_quartiles"] = """
WITH j AS (
  SELECT c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS pc
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
  SELECT segment, pc,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY pc) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS cnt
  FROM j
)
SELECT segment,
       CAST(MAX(cnt) AS BIGINT) AS n_orders,
       CAST(SUM(pc) AS BIGINT) AS total_c,
       MAX(CASE WHEN rn = (25 * cnt + 99) // 100 THEN pc END) AS q1_c,
       MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN pc END) AS q2_c,
       MAX(CASE WHEN rn = (75 * cnt + 99) // 100 THEN pc END) AS q3_c
FROM r GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Monthly return rate
# ---------------------------------------------------------------------------


def q_return_rate_monthly(sf_dir: str):
    """Per ship month: lineitem count and extended-price cents split by
    return flag 'R' vs the rest, with item and value return rates —
    the month-over-month quality KPI. Exact integer sums through one
    exchange; two transcribed divisions."""
    li = _read(
        sf_dir, "lineitem", ["l_shipdate", "l_returnflag", "l_extendedprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "month_us": b["l_shipdate"]
                .to_numpy("datetime64[us]")
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .view(np.int64),
                "r": (b["l_returnflag"] == "R").to_numpy(np.int64),
                "pc": _cents_col(b["l_extendedprice"]),
            }
        )
        .assign(
            n=lambda d: np.ones(len(d), dtype=np.int64),
            rpc=lambda d: d["r"] * d["pc"],
        )
        .groupby("month_us", sort=False)
        .agg(n=("n", "sum"), nr=("r", "sum"), pc=("pc", "sum"), rpc=("rpc", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        li, ["month_us"], [("n", "sum"), ("nr", "sum"), ("pc", "sum"), ("rpc", "sum")]
    ).to_pandas()
    item_rate = [
        float(_r6away(float(int(nr)) / float(int(n))))
        for nr, n in zip(agg["nr_sum"], agg["n_sum"])
    ]
    value_rate = [
        float(_r6away(float(int(rpc)) / float(int(pc))))
        for rpc, pc in zip(agg["rpc_sum"], agg["pc_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "month_us": agg["month_us"].astype(np.int64),
                "n_items": agg["n_sum"].astype(np.int64),
                "n_returned": agg["nr_sum"].astype(np.int64),
                "item_rate": item_rate,
                "value_c": agg["pc_sum"].astype(np.int64),
                "value_returned_c": agg["rpc_sum"].astype(np.int64),
                "value_rate": value_rate,
            }
        )
        .sort_values("month_us")
        .reset_index(drop=True)
    )


ORACLES19["return_rate_monthly"] = """
WITH l AS (
  SELECT date_trunc('month', l_shipdate) AS m,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
  FROM lineitem
),
a AS (
  SELECT m, COUNT(*) AS n,
         CAST(SUM(r) AS BIGINT) AS nr,
         CAST(SUM(pc) AS BIGINT) AS pc,
         CAST(SUM(r * pc) AS BIGINT) AS rpc
  FROM l GROUP BY 1
)
SELECT CAST(epoch_us(m) AS BIGINT) AS month_us,
       CAST(n AS BIGINT) AS n_items,
       nr AS n_returned,
       ROUND(CAST(nr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS item_rate,
       pc AS value_c,
       rpc AS value_returned_c,
       ROUND(CAST(rpc AS DOUBLE) / CAST(pc AS DOUBLE), 6) AS value_rate
FROM a
"""


QUERIES19["spectral_entropy"] = q_spectral_entropy
QUERIES19["token_dispersion"] = q_token_dispersion
QUERIES19["segment_order_quartiles"] = q_segment_order_quartiles
QUERIES19["return_rate_monthly"] = q_return_rate_monthly
