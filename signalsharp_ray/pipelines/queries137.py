"""Round-4 batch 137: the experimentation / causal-inference family —
A/B arm analysis with the sample-ratio-mismatch guard (users split by
id parity: SRM chi-square against 50/50, per-arm purchase conversion,
and the pooled two-proportion z), CUPED variance reduction (how much a
pre-period covariate shrinks the post-period metric's variance — the
modern experimentation speed-up), and difference-in-differences over
(arm x calendar half) mean values.

House parity: every user/arm/period count and centivalue power sum is
an exact integer (per-user sums reduce through one user-keyed exchange,
cross-user moments through a second tiny one); SRM chi-square, the
pooled z, theta = cov/var, the variance-reduction share and the DiD
estimate are each transcribed float expressions over those integers.

Scale contracts: nothing corpus-sized touches the driver — the driver
folds only O(1) moment rows."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES137: dict = {}
ORACLES137: dict = {}

DAY_US = 86_400_000_000


def _user_half_cents(sf_dir: str):
    """Per (user, calendar half): exact centivalue sum + event count,
    plus per-user purchase flags — one user-keyed exchange."""

    # two passes would be wasteful; instead reduce (user, day) partials
    def partial2(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].to_numpy("datetime64[us]").view(np.int64)
        day = ts // DAY_US
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        buy = (batch["event_type"].to_numpy() == "purchase").astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(np.int64),
                    "day": day,
                    "c": c,
                    "buy": buy,
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["user_id", "day"], sort=False)
            .sum()
            .reset_index()
        )

    return hash_bucket_aggregate(
        _events(sf_dir, ["user_id", "ts", "value", "event_type"]).map_batches(
            partial2, batch_format="pandas"
        ),
        ["user_id", "day"],
        [("c", "sum"), ("buy", "sum"), ("n", "sum")],
    )


def _global_mid(ds) -> int:
    lo = int(ds.min("day"))
    hi = int(ds.max("day"))
    return lo + (hi - lo) // 2


# ---------------------------------------------------------------------------
# A/B analysis with SRM guard
# ---------------------------------------------------------------------------


def q_ab_test_srm(sf_dir: str):
    """Split users into arms by user_id parity (the classic id-hash
    assignment): one row with per-arm user counts, the
    sample-ratio-mismatch chi-square against 50/50 (SRM > ~3.84 means
    the assignment itself is broken — check this BEFORE reading any
    metric), per-arm purchase conversion (users with >= 1 purchase
    event), and the pooled two-proportion z for the conversion delta."""
    ds = _user_half_cents(sf_dir)

    def per_user(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(np.int64),
                    "buy": batch["buy_sum"].to_numpy(np.int64),
                }
            )
            .groupby("user_id", sort=False)
            .sum()
            .reset_index()
        )

    users = hash_bucket_aggregate(
        ds.map_batches(per_user, batch_format="pandas"),
        ["user_id"],
        [("buy", "sum")],
    )

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy(np.int64)
        arm = (uid % 2).astype(np.int64)
        conv = (batch["buy_sum"].to_numpy(np.int64) > 0).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "arm": arm,
                    "users": np.ones(len(batch), dtype=np.int64),
                    "conv": conv,
                }
            )
            .groupby("arm", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            users.map_batches(flags, batch_format="pandas"),
            ["arm"],
            [("users", "sum"), ("conv", "sum")],
        )
        .to_pandas()
        .set_index("arm")
    )
    if 0 not in agg.index or 1 not in agg.index:
        return pd.DataFrame(
            {
                "n_a": pd.Series([], dtype=np.int64),
                "n_b": pd.Series([], dtype=np.int64),
                "srm_chi2": pd.Series([], dtype=np.float64),
                "conv_a": pd.Series([], dtype=np.float64),
                "conv_b": pd.Series([], dtype=np.float64),
                "z_conversion": pd.Series([], dtype=np.float64),
            }
        )
    na, ca = int(agg.loc[0, "users_sum"]), int(agg.loc[0, "conv_sum"])
    nb, cb = int(agg.loc[1, "users_sum"]), int(agg.loc[1, "conv_sum"])
    n = na + nb
    e = float(n) / 2.0
    srm = (float(na) - e) * (float(na) - e) / e + (
        float(nb) - e
    ) * (float(nb) - e) / e
    pa = float(ca) / float(na)
    pb = float(cb) / float(nb)
    pp = float(ca + cb) / float(n)
    denom = math.sqrt(
        pp * (1.0 - pp) * (1.0 / float(na) + 1.0 / float(nb))
    )
    z = (pb - pa) / denom if denom > 0 else 0.0
    return pd.DataFrame(
        {
            "n_a": np.array([na], dtype=np.int64),
            "n_b": np.array([nb], dtype=np.int64),
            "srm_chi2": [float(_r6away(srm))],
            "conv_a": [float(_r6away(pa))],
            "conv_b": [float(_r6away(pb))],
            "z_conversion": [float(_r6away(z))],
        }
    )


ORACLES137["ab_test_srm"] = """
WITH u AS (
  SELECT user_id, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT arm, COUNT(*) AS users, SUM(conv) AS conv FROM u GROUP BY 1
),
t AS (
  SELECT CAST(MAX(CASE WHEN arm = 0 THEN users END) AS BIGINT) AS na,
         CAST(MAX(CASE WHEN arm = 0 THEN conv END) AS BIGINT) AS ca,
         CAST(MAX(CASE WHEN arm = 1 THEN users END) AS BIGINT) AS nb,
         CAST(MAX(CASE WHEN arm = 1 THEN conv END) AS BIGINT) AS cb
  FROM g
),
f AS (
  SELECT na, nb, ca, cb,
         CAST(na + nb AS DOUBLE) / CAST(2.0 AS DOUBLE) AS e,
         CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
         CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
         CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS pp
  FROM t WHERE na IS NOT NULL AND nb IS NOT NULL
)
SELECT na AS n_a, nb AS n_b,
       ROUND((CAST(na AS DOUBLE) - e) * (CAST(na AS DOUBLE) - e) / e
             + (CAST(nb AS DOUBLE) - e) * (CAST(nb AS DOUBLE) - e) / e, 6)
         AS srm_chi2,
       ROUND(pa, 6) AS conv_a,
       ROUND(pb, 6) AS conv_b,
       ROUND(CASE WHEN sqrt(pp * (CAST(1.0 AS DOUBLE) - pp)
                            * (CAST(1.0 AS DOUBLE) / CAST(na AS DOUBLE)
                               + CAST(1.0 AS DOUBLE) / CAST(nb AS DOUBLE)))
                       > 0
                  THEN (pb - pa)
                       / sqrt(pp * (CAST(1.0 AS DOUBLE) - pp)
                              * (CAST(1.0 AS DOUBLE) / CAST(na AS DOUBLE)
                                 + CAST(1.0 AS DOUBLE) / CAST(nb AS DOUBLE)))
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS z_conversion
FROM f
"""


# ---------------------------------------------------------------------------
# CUPED variance reduction
# ---------------------------------------------------------------------------


def q_cuped_variance_reduction(sf_dir: str):
    """One row: CUPED over users present in BOTH calendar halves —
    pre = first-half centivalue total, post = second-half total; theta =
    cov(pre, post)/var(pre) (population moments over exact integer
    sums); the adjusted metric post - theta*pre has variance var(post) -
    cov^2/var(pre), and the reduction share is what the experiment's
    runtime shrinks by. Users missing a half are excluded (stated)."""
    ds = _user_half_cents(sf_dir)
    mid = _global_mid(ds)

    def per_user(batch: pd.DataFrame) -> pd.DataFrame:
        day = batch["day"].to_numpy(np.int64)
        c = batch["c_sum"].to_numpy(np.int64)
        n = batch["n_sum"].to_numpy(np.int64)
        pre = np.where(day <= mid, c, 0)
        post = np.where(day > mid, c, 0)
        npre = np.where(day <= mid, n, 0)
        npost = np.where(day > mid, n, 0)
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(np.int64),
                    "pre": pre,
                    "post": post,
                    "npre": npre,
                    "npost": npost,
                }
            )
            .groupby("user_id", sort=False)
            .sum()
            .reset_index()
        )

    users = hash_bucket_aggregate(
        ds.map_batches(per_user, batch_format="pandas"),
        ["user_id"],
        [("pre", "sum"), ("post", "sum"), ("npre", "sum"), ("npost", "sum")],
    )

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (batch["npre_sum"].to_numpy(np.int64) > 0) & (
            batch["npost_sum"].to_numpy(np.int64) > 0
        )
        x = batch["pre_sum"].to_numpy(np.int64)[keep]
        y = batch["post_sum"].to_numpy(np.int64)[keep]
        return pd.DataFrame(
            {
                "g": np.zeros(1, dtype=np.int64),
                "n": np.array([int(keep.sum())], dtype=np.int64),
                "sx": np.array([int(x.sum())], dtype=np.int64),
                "sy": np.array([int(y.sum())], dtype=np.int64),
                "sxx": np.array(
                    [int((x.astype(object) * x.astype(object)).sum())],
                    dtype=object,
                ),
                "syy": np.array(
                    [int((y.astype(object) * y.astype(object)).sum())],
                    dtype=object,
                ),
                "sxy": np.array(
                    [int((x.astype(object) * y.astype(object)).sum())],
                    dtype=object,
                ),
            }
        ).astype({"sxx": np.int64, "syy": np.int64, "sxy": np.int64})

    agg = hash_bucket_aggregate(
        users.map_batches(moments, batch_format="pandas"),
        ["g"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")],
    ).to_pandas()
    n = int(agg["n_sum"].sum())
    if n < 2:
        return pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "theta": pd.Series([], dtype=np.float64),
                "var_post": pd.Series([], dtype=np.float64),
                "var_adjusted": pd.Series([], dtype=np.float64),
                "reduction": pd.Series([], dtype=np.float64),
            }
        )
    sx = int(agg["sx_sum"].sum())
    sy = int(agg["sy_sum"].sum())
    sxx = int(agg["sxx_sum"].sum())
    syy = int(agg["syy_sum"].sum())
    sxy = int(agg["sxy_sum"].sum())
    nf = float(n)
    varx = float(sxx) / nf - (float(sx) / nf) * (float(sx) / nf)
    vary = float(syy) / nf - (float(sy) / nf) * (float(sy) / nf)
    cov = float(sxy) / nf - (float(sx) / nf) * (float(sy) / nf)
    if varx <= 0.0 or vary <= 0.0:
        return pd.DataFrame(
            {
                "n_users": pd.Series([], dtype=np.int64),
                "theta": pd.Series([], dtype=np.float64),
                "var_post": pd.Series([], dtype=np.float64),
                "var_adjusted": pd.Series([], dtype=np.float64),
                "reduction": pd.Series([], dtype=np.float64),
            }
        )
    theta = cov / varx
    var_adj = vary - cov * cov / varx
    return pd.DataFrame(
        {
            "n_users": np.array([n], dtype=np.int64),
            "theta": [float(_r6away(theta))],
            "var_post": [float(_r6away(vary))],
            "var_adjusted": [float(_r6away(var_adj))],
            "reduction": [float(_r6away(cov * cov / varx / vary))],
        }
    )


ORACLES137["cuped_variance_reduction"] = """
WITH b AS (
  SELECT user_id,
         epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
p AS (
  SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM b
),
u AS (
  SELECT b.user_id,
         CAST(SUM(CASE WHEN b.day <= p.mid THEN b.c ELSE 0 END) AS BIGINT)
           AS pre,
         CAST(SUM(CASE WHEN b.day > p.mid THEN b.c ELSE 0 END) AS BIGINT)
           AS post,
         COUNT(*) FILTER (WHERE b.day <= p.mid) AS npre,
         COUNT(*) FILTER (WHERE b.day > p.mid) AS npost
  FROM b CROSS JOIN p
  GROUP BY 1
),
k AS (SELECT pre, post FROM u WHERE npre > 0 AND npost > 0),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(post AS HUGEINT) * post) AS HUGEINT) AS syy,
         CAST(SUM(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS sxy
  FROM k
),
f AS (
  SELECT n,
         CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS varx,
         CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vary,
         CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov
  FROM m WHERE n >= 2
)
SELECT n AS n_users,
       ROUND(cov / varx, 6) AS theta,
       ROUND(vary, 6) AS var_post,
       ROUND(vary - cov * cov / varx, 6) AS var_adjusted,
       ROUND(cov * cov / varx / vary, 6) AS reduction
FROM f WHERE varx > 0 AND vary > 0
"""


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------


def q_diff_in_diff(sf_dir: str):
    """Difference-in-differences with arms by user-id parity and periods
    by calendar half: per (arm, period) the exact centivalue mean, and
    the DiD estimate (treat_post - treat_pre) - (ctrl_post - ctrl_pre) —
    the causal-inference table every launch review draws. Four exact
    integer cells; five transcribed divisions."""
    ds = _user_half_cents(sf_dir)
    mid = _global_mid(ds)

    def cells(batch: pd.DataFrame) -> pd.DataFrame:
        uid = batch["user_id"].to_numpy(np.int64)
        day = batch["day"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "arm": (uid % 2).astype(np.int64),
                    "period": (day > mid).astype(np.int64),
                    "c": batch["c_sum"].to_numpy(np.int64),
                    "n": batch["n_sum"].to_numpy(np.int64),
                }
            )
            .groupby(["arm", "period"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            ds.map_batches(cells, batch_format="pandas"),
            ["arm", "period"],
            [("c", "sum"), ("n", "sum")],
        )
        .to_pandas()
        .set_index(["arm", "period"])
        .sort_index()
    )
    need = [(0, 0), (0, 1), (1, 0), (1, 1)]
    if any(k not in agg.index for k in need):
        return pd.DataFrame(
            {
                "mean_ctrl_pre": pd.Series([], dtype=np.float64),
                "mean_ctrl_post": pd.Series([], dtype=np.float64),
                "mean_treat_pre": pd.Series([], dtype=np.float64),
                "mean_treat_post": pd.Series([], dtype=np.float64),
                "did_estimate": pd.Series([], dtype=np.float64),
            }
        )
    m = {}
    for k in need:
        m[k] = float(int(agg.loc[k, "c_sum"])) / float(
            int(agg.loc[k, "n_sum"])
        )
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    return pd.DataFrame(
        {
            "mean_ctrl_pre": [float(_r6away(m[(0, 0)]))],
            "mean_ctrl_post": [float(_r6away(m[(0, 1)]))],
            "mean_treat_pre": [float(_r6away(m[(1, 0)]))],
            "mean_treat_post": [float(_r6away(m[(1, 1)]))],
            "did_estimate": [float(_r6away(did))],
        }
    )


ORACLES137["diff_in_diff"] = """
WITH b AS (
  SELECT user_id % 2 AS arm,
         epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
p AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM b),
g AS (
  SELECT b.arm, CASE WHEN b.day > p.mid THEN 1 ELSE 0 END AS period,
         CAST(SUM(b.c) AS BIGINT) AS c, COUNT(*) AS n
  FROM b CROSS JOIN p GROUP BY 1, 2
),
m AS (
  SELECT
    MAX(CASE WHEN arm = 0 AND period = 0
             THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END) AS m00,
    MAX(CASE WHEN arm = 0 AND period = 1
             THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END) AS m01,
    MAX(CASE WHEN arm = 1 AND period = 0
             THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END) AS m10,
    MAX(CASE WHEN arm = 1 AND period = 1
             THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END) AS m11
  FROM g
)
SELECT ROUND(m00, 6) AS mean_ctrl_pre,
       ROUND(m01, 6) AS mean_ctrl_post,
       ROUND(m10, 6) AS mean_treat_pre,
       ROUND(m11, 6) AS mean_treat_post,
       ROUND((m11 - m10) - (m01 - m00), 6) AS did_estimate
FROM m
WHERE m00 IS NOT NULL AND m01 IS NOT NULL
  AND m10 IS NOT NULL AND m11 IS NOT NULL
"""


QUERIES137["ab_test_srm"] = q_ab_test_srm
QUERIES137["cuped_variance_reduction"] = q_cuped_variance_reduction
QUERIES137["diff_in_diff"] = q_diff_in_diff
