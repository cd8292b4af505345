"""Round-3 batch 27: budget-planning and burst diagnostics — the
vocabulary coverage curve (what share of all tokens the top-K cover,
K in {10,100,1000} — the tokenizer-budget planner), the top-10
burstiest users by peak events-per-minute (abuse/bot screening), the
per-region customer vs supplier account-balance rollup (a two-branch
dimensional join), and the lag-1 autocorrelation of inter-arrival gaps
per type (do big gaps cluster — the second-order burstiness gauge
beside interarrival_burstiness).

House parity: coverage is exact integer cumulative sums over the
deterministic (count DESC, token ASC) rank order; burst rates are pure
integer (user, minute) counts with (rate DESC, user ASC) ties;
balances are exact int64 cents; the gap Pearson uses exact
integer/HUGEINT power sums cast to double once each, combined in one
transcribed expression.

Scale contracts: token counts reduce through one exchange and only
K-per-batch candidates merge on the driver; user-minute counts reduce
through one exchange then a per-user max; the dimensional join
broadcasts only the bounded nation/region tables; gap kernels run per
type through bucketed_map_groups.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _TOKEN_RE, _cents_col, _read

QUERIES25: dict = {}
ORACLES25: dict = {}

COVERAGE_KS = (10, 100, 1000)
MINUTE_US = 60_000_000
BURST_TOPK = 10


# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------


def q_vocab_coverage(sf_dir: str):
    """For K in {10,100,1000}: the fraction of ALL token occurrences
    covered by the top-K tokens ((count DESC, token ASC) rank order) —
    the coverage curve that sizes a vocabulary budget. Counts are exact
    integers; per-batch top-K merge keeps the driver at K rows per
    batch; one transcribed division per row."""
    docs = _documents(sf_dir, ["text"])

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
    kmax = max(COVERAGE_KS)
    # total via per-batch partial sums; top-kmax via per-batch candidates
    partials = counts.map_batches(
        lambda b: pd.concat(
            [
                b.sort_values(["m_sum", "tok"], ascending=[False, True])
                .head(kmax)
                .assign(kind="top"),
                pd.DataFrame(
                    {
                        "tok": ["__total__"],
                        "m_sum": [int(b["m_sum"].sum())],
                        "kind": ["tot"],
                    }
                ),
            ],
            ignore_index=True,
        ),
        batch_format="pandas",
    ).to_pandas()
    total = int(partials.loc[partials["kind"] == "tot", "m_sum"].sum())
    top = (
        partials[partials["kind"] == "top"]
        .sort_values(["m_sum", "tok"], ascending=[False, True])
        .head(kmax)
        .reset_index(drop=True)
    )
    cum = np.cumsum(top["m_sum"].to_numpy(np.int64))
    rows = []
    for k in COVERAGE_KS:
        kk = min(k, len(top))
        covered = int(cum[kk - 1])
        rows.append((k, covered, total, float(_r6away(float(covered) / float(total)))))
    return pd.DataFrame(
        rows, columns=["k", "covered", "total_tokens", "coverage"]
    ).astype({"k": np.int64, "covered": np.int64, "total_tokens": np.int64})


ORACLES25["vocab_coverage"] = f"""
WITH t AS (
  SELECT UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
c AS (SELECT tok, COUNT(*) AS m FROM t GROUP BY 1),
r AS (
  SELECT tok, m,
         ROW_NUMBER() OVER (ORDER BY m DESC, tok ASC) AS rn,
         CAST(SUM(m) OVER () AS BIGINT) AS total,
         CAST(SUM(m) OVER (ORDER BY m DESC, tok ASC) AS BIGINT) AS cum
  FROM c
),
ks AS (SELECT UNNEST([{", ".join(str(k) for k in COVERAGE_KS)}]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       r.cum AS covered,
       r.total AS total_tokens,
       ROUND(CAST(r.cum AS DOUBLE) / CAST(r.total AS DOUBLE), 6) AS coverage
FROM ks JOIN r ON r.rn = LEAST(ks.k, (SELECT COUNT(*) FROM c))
"""


# ---------------------------------------------------------------------------
# Top-10 burstiest users (peak per-minute rate)
# ---------------------------------------------------------------------------


def q_user_burst_topk(sf_dir: str, k: int = BURST_TOPK):
    """The k users with the highest single-minute event burst
    (rate DESC, user ASC ties) with their total events — the bot /
    scraper screen. Two exact integer exchanges; each batch surrenders
    only its local top-k."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "minute_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // MINUTE_US
                )
                * MINUTE_US,
            }
        )
        .groupby(["user_id", "minute_us"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per_user_min = hash_bucket_aggregate(ev, ["user_id", "minute_us"], [("n", "sum")])
    per_user = hash_bucket_aggregate(
        per_user_min.map_batches(
            lambda b: pd.DataFrame(
                {
                    "user_id": b["user_id"].astype(np.int64),
                    "peak": b["n_sum"].astype(np.int64),
                    "tot": b["n_sum"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["user_id"],
        [("peak", "max"), ("tot", "sum")],
    )
    top = (
        per_user.map_batches(
            lambda b: b.sort_values(
                ["peak_max", "user_id"], ascending=[False, True]
            ).head(k),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["peak_max", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "user_id": top["user_id"].astype(np.int64),
            "peak_per_minute": top["peak_max"].astype(np.int64),
            "total_events": top["tot_sum"].astype(np.int64),
        }
    )


ORACLES25["user_burst_topk"] = f"""
WITH m AS (
  SELECT user_id, date_trunc('minute', ts) AS minute, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT user_id, MAX(n) AS peak, CAST(SUM(n) AS BIGINT) AS tot
  FROM m GROUP BY 1
),
r AS (
  SELECT user_id, peak, tot,
         ROW_NUMBER() OVER (ORDER BY peak DESC, user_id ASC) AS rank
  FROM u
)
SELECT CAST(rank AS BIGINT) AS rank,
       user_id,
       CAST(peak AS BIGINT) AS peak_per_minute,
       tot AS total_events
FROM r WHERE rank <= {BURST_TOPK}
"""


# ---------------------------------------------------------------------------
# Region balance rollup
# ---------------------------------------------------------------------------


def q_region_balance(sf_dir: str):
    """Per region: customer and supplier counts with exact
    account-balance cent totals — the two-branch dimensional rollup
    (region <- nation <- {customer, supplier}). The bounded
    nation x region dictionary broadcasts; each branch reduces through
    one exchange."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    n2r = dict(
        zip(nation["n_nationkey"].astype(np.int64), nation["n_regionkey"].astype(np.int64))
    )
    r2name = dict(
        zip(region["r_regionkey"].astype(np.int64), region["r_name"])
    )

    def branch(table, keycol, balcol):
        ds = _read(sf_dir, table, [keycol, balcol]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "rk": b[keycol].astype(np.int64).map(n2r).astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                    "bal": _cents_col(b[balcol]),
                }
            )
            .groupby("rk", sort=False)
            .agg(n=("n", "sum"), bal=("bal", "sum"))
            .reset_index(),
            batch_format="pandas",
        )
        return (
            hash_bucket_aggregate(ds, ["rk"], [("n", "sum"), ("bal", "sum")])
            .to_pandas()
            .set_index("rk")
        )

    cust = branch("customer", "c_nationkey", "c_acctbal")
    supp = branch("supplier", "s_nationkey", "s_acctbal")
    rks = sorted(set(cust.index) | set(supp.index))
    rows = []
    for rk in rks:
        rows.append(
            (
                r2name[int(rk)],
                int(cust["n_sum"].get(rk, 0)),
                int(cust["bal_sum"].get(rk, 0)),
                int(supp["n_sum"].get(rk, 0)),
                int(supp["bal_sum"].get(rk, 0)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["r_name", "n_customers", "cust_balance_c", "n_suppliers",
                 "supp_balance_c"],
    ).astype(
        {
            "n_customers": np.int64,
            "cust_balance_c": np.int64,
            "n_suppliers": np.int64,
            "supp_balance_c": np.int64,
        }
    )


ORACLES25["region_balance"] = """
WITH c AS (
  SELECT n.n_regionkey AS rk,
         COUNT(*) AS nc,
         CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1
),
s AS (
  SELECT n.n_regionkey AS rk,
         COUNT(*) AS ns,
         CAST(SUM(CAST(ROUND(su.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal
  FROM supplier su JOIN nation n ON n.n_nationkey = su.s_nationkey
  GROUP BY 1
)
SELECT r.r_name,
       CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(c.bal, 0) AS BIGINT) AS cust_balance_c,
       CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_suppliers,
       CAST(COALESCE(s.bal, 0) AS BIGINT) AS supp_balance_c
FROM region r
LEFT JOIN c ON c.rk = r.r_regionkey
LEFT JOIN s ON s.rk = r.r_regionkey
WHERE c.rk IS NOT NULL OR s.rk IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of inter-arrival gaps
# ---------------------------------------------------------------------------


def q_gap_autocorr(sf_dir: str):
    """Per event type: Pearson correlation between consecutive
    inter-arrival gaps — positive = bursts cluster (long-range
    burstiness), ~0 = renewal process. All power sums are exact
    Python ints / HUGEINTs over integer microsecond gaps, cast to
    double once each for one transcribed expression."""
    ev = _events(sf_dir, ["event_id", "ts", "event_type"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "ts_us": batch["ts"].to_numpy("datetime64[us]").view(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_us", "event_id"])
        g = np.diff(df["ts_us"].to_numpy(np.int64))
        if g.size < 2:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_pairs": pd.Series(dtype=np.int64),
                    "gap_autocorr": pd.Series(dtype=np.float64),
                }
            )
        x = g[:-1]
        y = g[1:]
        n = int(x.size)
        sx = int(x.sum())
        sy = int(y.sum())
        sxx = sum(int(v) * int(v) for v in x)
        syy = sum(int(v) * int(v) for v in y)
        sxy = sum(int(a) * int(b) for a, b in zip(x, y))
        num = float(n) * float(sxy) - float(sx) * float(sy)
        dx = float(n) * float(sxx) - float(sx) * float(sx)
        dy = float(n) * float(syy) - float(sy) * float(sy)
        if not (dx > 0.0 and dy > 0.0):
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_pairs": pd.Series(dtype=np.int64),
                    "gap_autocorr": pd.Series(dtype=np.float64),
                }
            )
        r = num / (math.sqrt(dx) * math.sqrt(dy))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_pairs": np.array([n], dtype=np.int64),
                "gap_autocorr": [float(_r6away(r))],
            }
        )

    return bucketed_map_groups(
        ev.map_batches(prep, batch_format="pandas"), ["event_type"], kernel
    )


ORACLES25["gap_autocorr"] = """
WITH s AS (
  SELECT event_type, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
g AS (
  SELECT event_type, ts, event_id, gap,
         LEAD(gap) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
  FROM s WHERE gap IS NOT NULL
),
p AS (SELECT event_type, gap AS x, nxt AS y FROM g WHERE nxt IS NOT NULL),
a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x::HUGEINT * x::HUGEINT) AS sxx,
         SUM(y::HUGEINT * y::HUGEINT) AS syy,
         SUM(x::HUGEINT * y::HUGEINT) AS sxy
  FROM p GROUP BY 1 HAVING COUNT(*) >= 2
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
  FROM a
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND(num / (sqrt(dx) * sqrt(dy)), 6) AS gap_autocorr
FROM d WHERE dx > 0.0 AND dy > 0.0
"""


QUERIES25["vocab_coverage"] = q_vocab_coverage
QUERIES25["user_burst_topk"] = q_user_burst_topk
QUERIES25["region_balance"] = q_region_balance
QUERIES25["gap_autocorr"] = q_gap_autocorr
