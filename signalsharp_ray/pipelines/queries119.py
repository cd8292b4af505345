"""Round-4 batch 119: calendar loading, decayed engagement, and a
language-id audit — the share of orders landing in the final week of
their fiscal quarter (end-of-quarter loading), an exponentially-decayed
user-engagement leaderboard with EXACT dyadic weights, and the per-source
agreement rate between the heuristic language identifier and the stored
lang label.

House parity: quarter ends are pure calendar arithmetic (date_trunc
quarter + 3 months - 1 day on both sides); decay weights are 2^(40-wk)
held as int64 (dyadic rationals — the float score is a ratio of exact
integers, immune to summation order); agreement counts reuse the exact
LanguageId predictor whose SQL transcription already passes the
language_id oracle.

Scale contracts: all three pre-reduce inside map_batches and exchange
bounded keys (quarters, top-k users after an exact integer sort,
sources); the decayed leaderboard's reference day is one tiny scalar
aggregate, not a driver materialization."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _read

QUERIES119: dict = {}
ORACLES119: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# End-of-quarter order loading
# ---------------------------------------------------------------------------


def q_quarter_end_order_loading(sf_dir: str):
    """Per (year, quarter): order count, orders placed in the quarter's
    FINAL 7 calendar days, and that share — sales-pipeline loading."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["o_orderdate"].astype("datetime64[us]")
        per = d.dt.to_period("Q")
        qend = per.dt.end_time.dt.normalize().astype("datetime64[us]")
        gap_days = (
            (qend.astype("int64") - d.dt.normalize().astype("int64"))
            // DAY_US
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "year": d.dt.year.astype(np.int64),
                    "quarter": d.dt.quarter.astype(np.int64),
                    "n": np.ones(len(d), dtype=np.int64),
                    "last7": (gap_days <= 6).astype(np.int64),
                }
            )
            .groupby(["year", "quarter"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["year", "quarter"],
            [("n", "sum"), ("last7", "sum")],
        )
        .to_pandas()
        .sort_values(["year", "quarter"])
    )
    return pd.DataFrame(
        {
            "year": agg["year"].astype(np.int64),
            "quarter": agg["quarter"].astype(np.int64),
            "n_orders": agg["n_sum"].astype(np.int64),
            "n_last_week": agg["last7_sum"].astype(np.int64),
            "last_week_share": _r6away(
                agg["last7_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES119["quarter_end_order_loading"] = """
WITH b AS (
  SELECT EXTRACT(year FROM o_orderdate) AS year,
         EXTRACT(quarter FROM o_orderdate) AS quarter,
         CASE WHEN o_orderdate >= date_trunc('quarter', o_orderdate)
                                  + INTERVAL 3 MONTH - INTERVAL 7 DAY
              THEN 1 ELSE 0 END AS last7
  FROM orders
)
SELECT CAST(year AS BIGINT) AS year, CAST(quarter AS BIGINT) AS quarter,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(last7) AS BIGINT) AS n_last_week,
       ROUND(CAST(SUM(last7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS last_week_share
FROM b GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Exponentially-decayed user-engagement leaderboard (exact dyadic weights)
# ---------------------------------------------------------------------------


def q_decayed_user_leaderboard(sf_dir: str, k: int = 10):
    """Top-10 users by decayed engagement: each event scores
    2^-(age_weeks) relative to the stream's last day (age capped at 40
    weeks). Weights are held as int64 2^(40 - wk), so per-user scores
    are EXACT integers and the leaderboard ordering (score DESC,
    user ASC) is deterministic; the float score divides by 2^40 only on
    output."""

    def day_partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {"mx": np.array([int((us // DAY_US).max())], dtype=np.int64)}
        )

    ref_day = int(
        _events(sf_dir, ["ts"])
        .map_batches(day_partial, batch_format="pandas")
        .to_pandas()["mx"]
        .max()
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        wk = np.minimum((ref_day - us // DAY_US) // 7, 40).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                    "w": (np.int64(1) << (40 - wk)).astype(np.int64),
                }
            )
            .groupby("user_id", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["user_id", "ts"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["user_id"],
            [("n", "sum"), ("w", "sum")],
        )
        .to_pandas()
        .sort_values(["w_sum", "user_id"], ascending=[False, True])
        .head(k)
    )
    return pd.DataFrame(
        {
            "user_id": agg["user_id"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "decayed_score": _r6away(
                agg["w_sum"].to_numpy(np.float64) / float(1 << 40)
            ),
        }
    ).reset_index(drop=True)


ORACLES119["decayed_user_leaderboard"] = """
WITH r AS (
  SELECT MAX(epoch_us(ts) // 86400000000) AS ref_day FROM events
),
w AS (
  SELECT user_id,
         (CAST(1 AS BIGINT) << CAST(
            40 - LEAST((r.ref_day - epoch_us(ts) // 86400000000) // 7, 40)
            AS INTEGER)) AS wt
  FROM events, r
),
s AS (
  SELECT user_id, COUNT(*) AS n, CAST(SUM(wt) AS BIGINT) AS sw
  FROM w GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(sw AS DOUBLE) / CAST(1099511627776 AS DOUBLE), 6)
         AS decayed_score
FROM s
QUALIFY row_number() OVER (ORDER BY sw DESC, user_id ASC) <= 10
"""


# ---------------------------------------------------------------------------
# Language-id agreement with the stored label, per source
# ---------------------------------------------------------------------------


class _AgreeBySource:
    """Actor-pool: run the house LanguageId predictor (tables built once
    per actor) and partial-aggregate agreement per source."""

    def __init__(self):
        from ..stages.text import LanguageId

        self.lid = LanguageId()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = batch["text"].fillna("").map(self.lid._predict)
        agree = (pred == batch["lang"].astype(str)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"].astype(str),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "agree": agree,
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )


def q_langid_agreement_by_source(sf_dir: str):
    """Per source: docs, docs where the heuristic language identifier
    agrees with the stored lang label, and the agreement share — a
    label-quality audit of the lang-id kernel by corpus slice."""
    from ..common.raytools import pool_size

    agg = (
        hash_bucket_aggregate(
            _documents(sf_dir, ["text", "lang", "source"]).map_batches(
                _AgreeBySource,
                batch_format="pandas",
                concurrency=pool_size(4),
                num_cpus=1,
            ),
            ["source"],
            [("n", "sum"), ("agree", "sum")],
        )
        .to_pandas()
        .sort_values("source")
    )
    return pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_sum"].astype(np.int64),
            "n_agree": agg["agree_sum"].astype(np.int64),
            "agreement": _r6away(
                agg["agree_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES119["langid_agreement_by_source"] = """
WITH c AS (
  SELECT doc_id, source, lang, COALESCE(text, '') AS s,
         length(COALESCE(text, ''))
           - length(regexp_replace(COALESCE(text, ''), '[\\x{4E00}-\\x{9FFF}]', '', 'g')) AS cjk,
         list_transform(regexp_extract_all(COALESCE(text, ''), '[\\p{L}]+'), w -> lower(w)) AS toks
  FROM documents
),
h AS (
  SELECT doc_id, source, lang, s, cjk, len(toks) AS n_toks,
         len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in','that','it','was','for'], t))) AS h_en,
         len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','nicht','ein','ich','mit','den'], t))) AS h_de,
         len(list_filter(toks, t -> list_contains(['le','la','les','et','des','est','un','une','que','pour'], t))) AS h_fr,
         len(list_filter(toks, t -> list_contains(['el','la','los','las','es','y','en','que','por','una'], t))) AS h_es,
         len(list_filter(toks, t -> list_contains(['o','a','os','de','e','que','em','um','uma','para'], t))) AS h_pt,
         len(list_filter(toks, t -> list_contains(['и','в','не','на','что','это','с','по','как','из'], t))) AS h_ru
  FROM c
),
p AS (
  SELECT source, lang,
    CASE
      WHEN s = '' THEN 'und'
      WHEN cjk > GREATEST(8, 0.05 * length(s)) THEN 'zh'
      WHEN n_toks = 0 THEN 'und'
      WHEN h_en > 0 AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_pt AND h_en >= h_ru THEN 'en'
      WHEN h_de > 0 AND h_de > h_en AND h_de >= h_fr AND h_de >= h_es AND h_de >= h_pt AND h_de >= h_ru THEN 'de'
      WHEN h_fr > 0 AND h_fr > h_en AND h_fr > h_de AND h_fr >= h_es AND h_fr >= h_pt AND h_fr >= h_ru THEN 'fr'
      WHEN h_es > 0 AND h_es > h_en AND h_es > h_de AND h_es > h_fr AND h_es >= h_pt AND h_es >= h_ru THEN 'es'
      WHEN h_pt > 0 AND h_pt > h_en AND h_pt > h_de AND h_pt > h_fr AND h_pt > h_es AND h_pt >= h_ru THEN 'pt'
      WHEN h_ru > 0 AND h_ru > h_en AND h_ru > h_de AND h_ru > h_fr AND h_ru > h_es AND h_ru > h_pt THEN 'ru'
      ELSE 'und'
    END AS pred_lang
  FROM h
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE pred_lang = lang) AS BIGINT) AS n_agree,
       ROUND(CAST(COUNT(*) FILTER (WHERE pred_lang = lang) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS agreement
FROM p GROUP BY 1
"""


QUERIES119["quarter_end_order_loading"] = q_quarter_end_order_loading
QUERIES119["decayed_user_leaderboard"] = q_decayed_user_leaderboard
QUERIES119["langid_agreement_by_source"] = q_langid_agreement_by_source
