"""Round-3 batch 44: purity and dispersion diagnostics — language
purity per source (share of docs in the source's majority language —
mixed-language slices need routing before training), the busiest
weekly slot (argmax mean load over the 7x24 day-of-week x hour grid),
and unit-price dispersion per part (the widest min-max spreads reveal
inconsistent pricing).

House parity: majority languages are integer argmaxes with
(count DESC, lang ASC) ties; weekly-slot means divide exact integer
sums with (mean-numerator cross-multiplied as integers for the argmax
— no float ordering); unit prices quantize through the SAME
half-away-rounded cents-of-ratio expression on both engines, and
dispersion ranking is an integer (range DESC, partkey ASC) order.

Scale contracts: source x lang and 168-slot tables are bounded; part
dispersion reduces through one min/max exchange with per-batch top-k
merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _read

QUERIES42: dict = {}
ORACLES42: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
DISPERSION_K = 10


# ---------------------------------------------------------------------------
# Language purity per source
# ---------------------------------------------------------------------------


def q_lang_purity(sf_dir: str):
    """Per source: its majority language ((count DESC, lang ASC) ties)
    and that language's share of the source's documents — sources far
    below 1.0 need language routing before model training. Exact
    integer counts; one division."""
    docs = _documents(sf_dir, ["source", "lang"]).map_batches(
        lambda b: b.groupby(["source", "lang"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(docs, ["source", "lang"], [("n", "sum")]).to_pandas()
    rows = []
    for src, g in agg.groupby("source", sort=True):
        g = g.sort_values(["n_sum", "lang"], ascending=[False, True])
        total = int(g["n_sum"].sum())
        top = g.iloc[0]
        rows.append(
            (
                src,
                total,
                top["lang"],
                int(top["n_sum"]),
                float(_r6away(float(int(top["n_sum"])) / float(total))),
            )
        )
    return pd.DataFrame(
        rows, columns=["source", "n_docs", "major_lang", "n_major", "purity"]
    ).astype({"n_docs": np.int64, "n_major": np.int64})


ORACLES42["lang_purity"] = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
r AS (
  SELECT source, lang, n,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n DESC, lang ASC) AS rn
  FROM c
)
SELECT r.source,
       t.total AS n_docs,
       r.lang AS major_lang,
       CAST(r.n AS BIGINT) AS n_major,
       ROUND(CAST(r.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS purity
FROM r JOIN t USING (source)
WHERE r.rn = 1
"""


# ---------------------------------------------------------------------------
# Busiest weekly slot
# ---------------------------------------------------------------------------


def q_peak_week_slot(sf_dir: str):
    """The (day-of-week, hour-of-day) slot with the highest MEAN load
    across the history — the single busiest weekly moment. Slot means
    are total/occurrences; the argmax cross-multiplies exact integers
    (total_a * occ_b vs total_b * occ_a) so no float ordering exists;
    ties break on (dow, hod). dow = (epoch_day + 4) % 7, 0 = Sunday."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "hod": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
                )
                % 24,
            }
        )
        .groupby(["day_us", "hod"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per_day_hod = hash_bucket_aggregate(
        ev, ["day_us", "hod"], [("n", "sum")]
    ).to_pandas()
    per_day_hod["dow"] = (
        per_day_hod["day_us"].astype(np.int64) // DAY_US + 4
    ) % 7
    slot = (
        per_day_hod.assign(occ=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby(["dow", "hod"], sort=True)
        .agg(total=("n_sum", "sum"), occ=("occ", "sum"))
        .reset_index()
    )
    # integer cross-multiplied argmax: best if total*occ_best > total_best*occ
    best = None
    for _, r in slot.iterrows():
        t, o = int(r["total"]), int(r["occ"])
        if best is None:
            best = (int(r["dow"]), int(r["hod"]), t, o)
            continue
        bd, bh, bt, bo = best
        lhs = t * bo
        rhs = bt * o
        if lhs > rhs or (
            lhs == rhs and (int(r["dow"]), int(r["hod"])) < (bd, bh)
        ):
            best = (int(r["dow"]), int(r["hod"]), t, o)
    bd, bh, bt, bo = best
    return pd.DataFrame(
        {
            "dow": np.array([bd], dtype=np.int64),
            "hod": np.array([bh], dtype=np.int64),
            "n_occurrences": np.array([bo], dtype=np.int64),
            "total_events": np.array([bt], dtype=np.int64),
            "mean_load": [float(_r6away(float(bt) / float(bo)))],
        }
    )


ORACLES42["peak_week_slot"] = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT (epoch_us(day) // 86400000000 + 4) % 7 AS dow, hod,
         CAST(SUM(n) AS BIGINT) AS total,
         COUNT(*) AS occ
  FROM c GROUP BY 1, 2
),
r AS (
  SELECT dow, hod, total, occ,
         ROW_NUMBER() OVER (
           ORDER BY CAST(total AS DOUBLE) / CAST(occ AS DOUBLE) DESC,
                    dow ASC, hod ASC) AS rn
  FROM s
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(hod AS BIGINT) AS hod,
       CAST(occ AS BIGINT) AS n_occurrences,
       total AS total_events,
       ROUND(CAST(total AS DOUBLE) / CAST(occ AS DOUBLE), 6) AS mean_load
FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Part unit-price dispersion
# ---------------------------------------------------------------------------


def q_part_price_dispersion(sf_dir: str, k: int = DISPERSION_K):
    """The 10 parts with the widest unit-price spread (max - min of
    half-away-rounded cents of extendedprice/quantity; ties by
    partkey) — inconsistent pricing worth auditing. One min/max
    exchange; per-batch top-k merge on the integer range."""
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_quantity"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "up": _unit_cents(
                    b["l_extendedprice"].to_numpy(np.float64),
                    b["l_quantity"].to_numpy(np.float64),
                ),
            }
        )
        .groupby("partkey", sort=False)
        .agg(mn=("up", "min"), mx=("up", "max"), n=("up", "size"))
        .reset_index()
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        li, ["partkey"], [("mn", "min"), ("mx", "max"), ("n", "sum")]
    )
    top = (
        agg.map_batches(
            lambda b: b.assign(
                rng=lambda d: d["mx_max"].astype(np.int64)
                - d["mn_min"].astype(np.int64)
            )
            .sort_values(["rng", "partkey"], ascending=[False, True])
            .head(k),
            batch_format="pandas",
        )
        .to_pandas()
        .assign(
            rng=lambda d: d["mx_max"].astype(np.int64)
            - d["mn_min"].astype(np.int64)
        )
        .sort_values(["rng", "partkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "partkey": top["partkey"].astype(np.int64),
            "n_items": top["n_sum"].astype(np.int64),
            "min_unit_c": top["mn_min"].astype(np.int64),
            "max_unit_c": top["mx_max"].astype(np.int64),
            "range_c": top["rng"].astype(np.int64),
        }
    )


def _unit_cents(price: np.ndarray, qty: np.ndarray) -> np.ndarray:
    r = price / qty * 100.0
    return (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int64)


ORACLES42["part_price_dispersion"] = f"""
WITH u AS (
  SELECT l_partkey AS pk,
         CAST(ROUND(l_extendedprice / l_quantity * 100.0) AS BIGINT) AS up
  FROM lineitem
),
a AS (
  SELECT pk, COUNT(*) AS n, MIN(up) AS mn, MAX(up) AS mx
  FROM u GROUP BY 1
),
r AS (
  SELECT pk, n, mn, mx, mx - mn AS rng,
         ROW_NUMBER() OVER (ORDER BY mx - mn DESC, pk ASC) AS rank
  FROM a
)
SELECT CAST(rank AS BIGINT) AS rank,
       pk AS partkey,
       CAST(n AS BIGINT) AS n_items,
       mn AS min_unit_c,
       mx AS max_unit_c,
       rng AS range_c
FROM r WHERE rank <= {DISPERSION_K}
"""


QUERIES42["lang_purity"] = q_lang_purity
QUERIES42["peak_week_slot"] = q_peak_week_slot
QUERIES42["part_price_dispersion"] = q_part_price_dispersion
