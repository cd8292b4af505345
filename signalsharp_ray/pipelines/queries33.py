"""Round-3 batch 35: flow-timing and degree diagnostics — transition
latency per behaviour pair (mean microseconds between consecutive
same-user events for every (from, to) type pair — the timing layer on
top of markov_transitions), word-length statistics per language (mean
token length and the long-word share driving readability/lang-id), and
the supplier degree histogram (how many distinct parts each supplier
ships — the supply-network fan-out).

House parity: per-pair gap sums are exact integer microseconds with
(ts, event_id) ordering; token lengths are exact regex-count integers
through one exchange; degree distinct-counts dedup (supplier, part)
keys inside the exchange; every mean is one transcribed division.

Scale contracts: pair tables are catalog^2-bounded; length sums are
language-bounded; the degree histogram is bounded by the max fan-out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _TOKEN_RE, _read

QUERIES33: dict = {}
ORACLES33: dict = {}

LONG_WORD_LEN = 8


# ---------------------------------------------------------------------------
# Transition latency per behaviour pair
# ---------------------------------------------------------------------------


def q_transition_latency(sf_dir: str):
    """Per (from_type, to_type): the count and mean latency (exact
    integer microsecond gaps) of consecutive same-user transitions —
    markov_transitions gives probabilities, this gives the tempo of
    each edge. Per-user pair extraction is vectorized inside hash
    buckets; the pair table is catalog^2-bounded."""
    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "ts_us": b["ts"].to_numpy("datetime64[us]").view(np.int64),
                "event_id": b["event_id"].astype(np.int64),
                "event_type": b["event_type"],
            }
        ),
        batch_format="pandas",
    )

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        g = pd.DataFrame(
            {
                "from_type": et[:-1][same],
                "to_type": et[1:][same],
                "gap": (ts[1:] - ts[:-1])[same],
            }
        )
        out = (
            g.assign(n=lambda d: np.ones(len(d), dtype=np.int64))
            .groupby(["from_type", "to_type"], sort=False)
            .agg(n=("n", "sum"), gap=("gap", "sum"))
            .reset_index()
        )
        out["gap"] = out["gap"].astype(np.int64)
        return out

    agg = hash_bucket_aggregate(
        bucketed_map_groups(ev, ["user_id"], None, whole_bucket_fn=bucket_kernel),
        ["from_type", "to_type"],
        [("n", "sum"), ("gap", "sum")],
    ).to_pandas()
    mean = [
        float(_r6away(float(int(g)) / float(int(n))))
        for g, n in zip(agg["gap_sum"], agg["n_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "from_type": agg["from_type"],
                "to_type": agg["to_type"],
                "n_transitions": agg["n_sum"].astype(np.int64),
                "total_gap_us": agg["gap_sum"].astype(np.int64),
                "mean_gap_us": mean,
            }
        )
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )


ORACLES33["transition_latency"] = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER w AS nxt,
         LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type AS from_type,
       nxt AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(gap) AS BIGINT) AS total_gap_us,
       ROUND(CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_gap_us
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Word-length statistics per language
# ---------------------------------------------------------------------------


def q_word_length_stats(sf_dir: str):
    """Per language: token count, mean token length in characters, and
    the share of long words (>= 8 chars) — the morphology fingerprint
    feeding readability and language ID. Lengths are exact regex-count
    integers through one exchange; two transcribed divisions."""
    docs = _documents(sf_dir, ["lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        langs, n, chars, longw = [], [], [], []
        for lang, text in zip(batch["lang"], batch["text"]):
            toks = _TOKEN_RE.findall((text or "").lower())
            langs.append(lang)
            n.append(len(toks))
            chars.append(sum(len(t) for t in toks))
            longw.append(sum(1 for t in toks if len(t) >= LONG_WORD_LEN))
        return pd.DataFrame(
            {
                "lang": langs,
                "n": np.array(n, dtype=np.int64),
                "chars": np.array(chars, dtype=np.int64),
                "longw": np.array(longw, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang"],
        [("n", "sum"), ("chars", "sum"), ("longw", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, ch, lw = int(r["n_sum"]), int(r["chars_sum"]), int(r["longw_sum"])
        rows.append(
            (
                r["lang"],
                n,
                float(_r6away(float(ch) / float(n))),
                lw,
                float(_r6away(float(lw) / float(n))),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["lang", "n_tokens", "mean_len", "n_long", "long_share"],
        )
        .astype({"n_tokens": np.int64, "n_long": np.int64})
        .sort_values("lang")
        .reset_index(drop=True)
    )


ORACLES33["word_length_stats"] = f"""
WITH t AS (
  SELECT lang,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
a AS (
  SELECT lang,
         COUNT(*) AS n,
         CAST(SUM(length(tok)) AS BIGINT) AS chars,
         CAST(COUNT(*) FILTER (WHERE length(tok) >= {LONG_WORD_LEN}) AS BIGINT)
           AS longw
  FROM t GROUP BY 1
)
SELECT lang,
       CAST(n AS BIGINT) AS n_tokens,
       ROUND(CAST(chars AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_len,
       longw AS n_long,
       ROUND(CAST(longw AS DOUBLE) / CAST(n AS DOUBLE), 6) AS long_share
FROM a
"""


# ---------------------------------------------------------------------------
# Supplier degree histogram
# ---------------------------------------------------------------------------


def q_supplier_degree_histogram(sf_dir: str):
    """How many suppliers ship exactly k distinct parts — the supply
    network fan-out distribution (concentrated sourcing vs broad
    catalogs). The (supplier, part) pairs dedup inside one exchange;
    the per-supplier distinct count and histogram are exact
    integers."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["l_suppkey"].astype(np.int64),
                "partkey": b["l_partkey"].astype(np.int64),
            }
        )
        .drop_duplicates()
        .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
        batch_format="pandas",
    )
    pairs = hash_bucket_aggregate(li, ["suppkey", "partkey"], [("one", "max")])
    per_supp = hash_bucket_aggregate(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "suppkey": b["suppkey"].astype(np.int64),
                    "k": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["suppkey"],
        [("k", "sum")],
    )
    hist = hash_bucket_aggregate(
        per_supp.map_batches(
            lambda b: pd.DataFrame(
                {
                    "n_parts": b["k_sum"].astype(np.int64),
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["n_parts"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "n_parts": hist["n_parts"].astype(np.int64),
                "n_suppliers": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("n_parts")
        .reset_index(drop=True)
    )


ORACLES33["supplier_degree_histogram"] = """
WITH d AS (
  SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS k
  FROM lineitem GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM d GROUP BY 1
"""


QUERIES33["transition_latency"] = q_transition_latency
QUERIES33["word_length_stats"] = q_word_length_stats
QUERIES33["supplier_degree_histogram"] = q_supplier_degree_histogram
