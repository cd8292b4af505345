"""The queries()/oracle_sql() registry: one entry per implemented operator
(SURVEY.md §2 + training-data ops), each runnable over a testdata sf dir.

Contract (driver): each callable takes sf_dir and returns a Dataset /
DataFrame / pyarrow Table; the paired oracle_sql entry is ANSI SQL DuckDB
runs on the same parquet (views: region nation customer supplier part orders
lineitem events documents embeddings). Column names MATCH between both sides;
floating-point results of multi-step arithmetic are ROUND(x, 6)ed on BOTH
sides so aggregation-order differences cannot flip the value hash.

Series convention for the events table: series key = event_type; point order
= (ts, event_id) ascending (deterministic under timestamp ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels import resampling, stats
from ..kernels.cusum import CUSUMOptions, cusum_changepoints
from ..kernels.extrapolation import (
    HoltOptions,
    holt_forecast,
    linear_forecast,
    ses_forecast,
)
from ..kernels.kalman import kalman_filter
from ..kernels.pelt import pelt_breakpoints
from ..kernels.penalty_selection import PenaltySelectionOptions
from ..kernels.smoothing import (
    exponential_moving_average,
    savitzky_golay,
    simple_moving_average,
    weighted_moving_average,
)
from ..stages.gapfill import gapfill_tier
from ..stages.rollup import cascade_tier, rollup_tier

EVENT_COLS = ["event_id", "ts", "event_type", "value"]


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns or EVENT_COLS)


def _documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _r6(x):
    return np.round(np.asarray(x, dtype=np.float64), 6)


def _sorted_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["ts", "event_id"])


# ---------------------------------------------------------------------------
# rollup tiers (events, keyed by event_type)
# ---------------------------------------------------------------------------


def _finish_rollup(ds):
    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        cnt = batch["count"].astype(np.int64)
        sum_r = _r6(batch["sum"])
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "bucket_ts": batch["bucket_ts"],
                "cnt": cnt,
                "sum_value": sum_r,
                "min_value": _r6(batch["min"]),
                "max_value": _r6(batch["max"]),
                # derived from the ROUNDED sum so both sides compute the
                # identical value (raw means can straddle a rounding edge)
                "mean_value": _r6(sum_r / cnt.to_numpy()),
            }
        )

    return ds.map_batches(fmt, batch_format="pandas")


def q_rollup_1m(sf_dir: str):
    return _finish_rollup(rollup_tier(_events(sf_dir), "1m", key_cols=["event_type"]))


def q_rollup_1h_cascade(sf_dir: str):
    t1m = rollup_tier(_events(sf_dir), "1m", key_cols=["event_type"])
    return _finish_rollup(cascade_tier(t1m, "1h", key_cols=["event_type"]))


def q_rollup_1d_cascade(sf_dir: str):
    t1m = rollup_tier(_events(sf_dir), "1m", key_cols=["event_type"])
    t1h = cascade_tier(t1m, "1h", key_cols=["event_type"])
    return _finish_rollup(cascade_tier(t1h, "1d", key_cols=["event_type"]))


_ROLLUP_SQL = """
SELECT event_type,
       date_trunc('{unit}', ts) AS bucket_ts,
       COUNT(*) AS cnt,
       ROUND(SUM(value), 6) AS sum_value,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value,
       ROUND(ROUND(SUM(value), 6) / COUNT(*), 6) AS mean_value
FROM events GROUP BY 1, 2
"""


def q_rollup_1h_by_user(sf_dir: str):
    """Higher-cardinality key (user_id) — exercises the shuffle with many
    more groups than event_type."""
    ds = rollup_tier(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        "1h",
        key_cols=["user_id"],
    )

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "bucket_ts": batch["bucket_ts"],
                "cnt": batch["count"].astype(np.int64),
                "sum_value": _r6(batch["sum"]),
            }
        )

    return ds.map_batches(fmt, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-series index-bucket resampling (reference Resampling.cs semantics)
# ---------------------------------------------------------------------------


def _per_series(sf_dir, fn):
    return _events(sf_dir).groupby("event_type").map_groups(fn, batch_format="pandas")


def q_downsample(sf_dir: str, factor: int = 3):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        return df.iloc[::factor][["event_id", "event_type", "ts", "value"]]

    return _per_series(sf_dir, fn)


def _segment_query(sf_dir, op, factor=10):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        agg = {
            "mean": resampling.segment_mean,
            "median": resampling.segment_median,
            "min": resampling.segment_min,
            "max": resampling.segment_max,
        }[op](vals, factor)
        n = vals.size
        counts = np.diff(np.append(np.arange(0, n, factor), n))
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "bucket": np.arange(agg.size, dtype=np.int64),
                f"seg_{op}": _r6(agg),
                "seg_n": counts.astype(np.int64),
            }
        )

    return _per_series(sf_dir, fn)


def q_segment_mean(sf_dir: str):
    return _segment_query(sf_dir, "mean")


def q_segment_median(sf_dir: str):
    return _segment_query(sf_dir, "median")


def q_segment_min(sf_dir: str):
    return _segment_query(sf_dir, "min")


def q_segment_max(sf_dir: str):
    return _segment_query(sf_dir, "max")


_SEGMENT_SQL = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS rn
  FROM events
)
SELECT event_type,
       CAST(FLOOR(rn / {factor}) AS BIGINT) AS bucket,
       ROUND({agg}(value), 6) AS seg_{op},
       COUNT(*) AS seg_n
FROM r GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# smoothing (per event_type series)
# ---------------------------------------------------------------------------


def q_sma(sf_dir: str, window: int = 5):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        sma = simple_moving_average(vals, window)  # 'valid'
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "idx": np.arange(window - 1, vals.size, dtype=np.int64),
                "sma": _r6(sma),
            }
        )

    return _per_series(sf_dir, fn)


def q_wma(sf_dir: str):
    weights = np.array([0.1, 0.3, 0.6])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        wma = weighted_moving_average(vals, weights)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "idx": np.arange(2, vals.size, dtype=np.int64),
                "wma": _r6(wma),
            }
        )

    return _per_series(sf_dir, fn)


def q_ema(sf_dir: str, alpha: float = 0.3):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "idx": np.arange(vals.size, dtype=np.int64),
                "ema": _r6(exponential_moving_average(vals, alpha)),
            }
        )

    return _per_series(sf_dir, fn)


def q_savgol(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "idx": np.arange(vals.size, dtype=np.int64),
                "smoothed": _r6(savitzky_golay(vals, 5, 2)),
            }
        )

    return _per_series(sf_dir, fn)


def q_kalman(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "idx": np.arange(vals.size, dtype=np.int64),
                "filtered": _r6(kalman_filter(vals)),
            }
        )

    return _per_series(sf_dir, fn)


# ---------------------------------------------------------------------------
# normalization / statistics
# ---------------------------------------------------------------------------


def q_zscore(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        vals = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {"event_id": df["event_id"].astype(np.int64), "zvalue": _r6(stats.zscore(vals))}
        )

    return _per_series(sf_dir, fn)


def q_series_stats(sf_dir: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        vals = df["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n": [np.int64(vals.size)],
                "mean_value": [_r6(stats.mean(vals))],
                "std_pop": [_r6(stats.standard_deviation(vals))],
                "median_value": [_r6(stats.median(vals))],
                "skew_g1": [_r6(stats.skewness(vals))],
            }
        )

    return _per_series(sf_dir, fn)


# ---------------------------------------------------------------------------
# extrapolation
# ---------------------------------------------------------------------------


def q_linear_forecast(sf_dir: str, horizon: int = 3):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        fc = linear_forecast(vals, horizon)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "h": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": _r6(fc),
            }
        )

    return _per_series(sf_dir, fn)


def q_ses_forecast(sf_dir: str, horizon: int = 3, alpha: float = 0.3):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        fc = ses_forecast(vals, horizon, alpha)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "h": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": _r6(fc),
            }
        )

    return _per_series(sf_dir, fn)


def q_holt_forecast(sf_dir: str, horizon: int = 3):
    opts = HoltOptions(alpha=0.5, beta=0.5)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)
        fc = holt_forecast(vals, horizon, opts)
        return pd.DataFrame(
            {
                "event_type": df["event_type"].iloc[0],
                "h": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": _r6(fc),
            }
        )

    return _per_series(sf_dir, fn)


# ---------------------------------------------------------------------------
# gap-fill (1h tier by event_type)
# ---------------------------------------------------------------------------


def q_gapfill_locf_1h(sf_dir: str):
    t1h = rollup_tier(_events(sf_dir), "1h", key_cols=["event_type"])

    def round_mean(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # derive from the rounded sum (identical on the SQL side) so LOCF
        # propagates bit-identical values
        batch["mean"] = _r6(_r6(batch["sum"]) / batch["count"].to_numpy())
        return batch

    t1h = t1h.map_batches(round_mean, batch_format="pandas")
    filled = gapfill_tier(t1h, "1h", "locf", key_cols=("event_type",))

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "bucket_ts": batch["bucket_ts"],
                "value": _r6(batch["value"]),
                "gap_filled": batch["gap_filled"].astype(bool),
            }
        )

    return filled.map_batches(fmt, batch_format="pandas")


# ---------------------------------------------------------------------------
# changepoints (rows-only; sequential DP not expressible in SQL)
# ---------------------------------------------------------------------------


def q_cusum_changepoints(sf_dir: str):
    opts = CUSUMOptions(threshold_factor=1.5, slack_factor=0.1)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        z = stats.zscore(df["value"].to_numpy(dtype=np.float64))
        bkps = cusum_changepoints(z, opts)
        return pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].iloc[0], len(bkps)),
                "breakpoint_index": np.asarray(bkps, dtype=np.int64),
            }
        )

    return _per_series(sf_dir, fn)


def q_pelt_changepoints(sf_dir: str):
    """PELT/L2 on the 1d rollup count series per event_type."""
    t1d = rollup_tier(_events(sf_dir), "1d", key_cols=["event_type"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts")
        vals = df["count"].to_numpy(dtype=np.float64)
        bkps = pelt_breakpoints(vals, penalty=10.0, cost="l2", min_size=2)
        return pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].iloc[0], len(bkps)),
                "breakpoint_index": np.asarray(bkps, dtype=np.int64),
            }
        )

    return t1d.groupby("event_type").map_groups(fn, batch_format="pandas")


def q_pelt_auto_penalty(sf_dir: str):
    """BIC-selected penalty (Gaussian cost) on the 1d mean series."""
    from ..kernels.pelt import PELT, PELTOptions
    from ..kernels.penalty_selection import PELTPenaltySelector

    t1d = rollup_tier(_events(sf_dir), "1d", key_cols=["event_type"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts")
        vals = df["mean"].to_numpy(dtype=np.float64)
        sel = PELTPenaltySelector(PELT(PELTOptions(cost_function="gaussian", min_size=2)))
        res = sel.fit_and_select(vals, PenaltySelectionOptions(method="bic"))
        k = len(res.optimal_breakpoints)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_changepoints": [np.int64(k)],
                "selected_penalty": [_r6(res.selected_penalty)],
            }
        )

    return t1d.groupby("event_type").map_groups(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# documents: text analysis + dedup
# ---------------------------------------------------------------------------


def q_token_count(sf_dir: str):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_tokens_ws": text.str.split().str.len().fillna(0).astype(np.int64),
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_char_stats(sf_dir: str):
    """ASCII-explicit char classes so RE2 (DuckDB) and Python agree."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        n_spaces = text.str.count(" ").astype(np.int64)
        n_digits = text.str.count(r"[0-9]").astype(np.int64)
        n_punct = text.str.count(r"[.,;:!?]").astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_chars": n_chars,
                "n_spaces": n_spaces,
                "n_digits": n_digits,
                "n_punct": n_punct,
            }
        )

    return _documents(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir))


def q_quality_scores(sf_dir: str):
    from ..stages.text import quality_scores

    ds = quality_scores(_documents(sf_dir))

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        for c in ("punct_ratio", "digit_ratio", "upper_ratio", "stopword_ratio", "quality_score"):
            batch[c] = _r6(batch[c])
        return batch

    return ds.map_batches(fmt, batch_format="pandas")


def q_language_id(sf_dir: str):
    from ..stages.text import language_id

    return language_id(_documents(sf_dir))


def q_fingerprints(sf_dir: str):
    from ..stages.text import fingerprints

    return fingerprints(_documents(sf_dir))


def q_minhash_near_dups(sf_dir: str):
    from ..stages.dedup import minhash_dedup_pairs

    ds = minhash_dedup_pairs(
        _documents(sf_dir), threshold=0.5, num_perm=64, bands=32
    )

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["jaccard"] = _r6(batch["jaccard"])
        return batch

    return ds.map_batches(fmt, batch_format="pandas")


def q_simhash_near_dups(sf_dir: str):
    from ..stages.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(_documents(sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas()
    row = df.loc[df["vec_id"] == df["vec_id"].min(), "embedding"].iloc[0]
    return np.asarray(row, dtype=np.float64)


def q_knn_cosine(sf_dir: str, k: int = 10):
    from ..stages.similarity import knn_brute_force

    q = _query_vector(sf_dir)
    ds = _embeddings(sf_dir)
    # arrow expression filter (vectorized; pushes into the scan) — never a
    # per-row python predicate
    out = knn_brute_force(ds.filter(expr="vec_id != 0"), q[None, :], k=k)
    return pd.DataFrame(
        {"vec_id": out["vec_id"].astype(np.int64), "cosine": _r6(out["cosine"])}
    )


def q_embedding_near_dups(sf_dir: str, threshold: float = 0.35):
    from ..stages.similarity import embedding_near_dup_pairs

    out = embedding_near_dup_pairs(_embeddings(sf_dir), threshold=threshold).to_pandas()
    if out.empty or "a" not in out.columns:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
    return pd.DataFrame(
        {
            "a": out["a"].astype(np.int64),
            "b": out["b"].astype(np.int64),
            "cosine": _r6(out["cosine"]),
        }
    )


def q_ivf_knn(sf_dir: str, k: int = 10):
    from ..stages.similarity import ivf_knn

    q = _query_vector(sf_dir)
    out = ivf_knn(_embeddings(sf_dir), q[None, :], k=k, n_clusters=8, n_probe=4)
    return pd.DataFrame(
        {"vec_id": out["vec_id"].astype(np.int64), "cosine": _r6(out["cosine"])}
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (synthetic media; rows-only)
# ---------------------------------------------------------------------------


def q_media_features(sf_dir: str):
    import ray.data as rd

    from ..stages.multimodal import extract_features, synth_media_table

    media = rd.from_pandas(synth_media_table(64))
    out = extract_features(media, mode="fake").to_pandas()
    out["feature_mean"] = _r6([np.asarray(f).mean() for f in out["feature"]])
    return out[["media_id", "kind", "feature_mean"]]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        "rollup_1m": q_rollup_1m,
        "rollup_1h_cascade": q_rollup_1h_cascade,
        "rollup_1d_cascade": q_rollup_1d_cascade,
        "rollup_1h_by_user": q_rollup_1h_by_user,
        "downsample": q_downsample,
        "segment_mean": q_segment_mean,
        "segment_median": q_segment_median,
        "segment_min": q_segment_min,
        "segment_max": q_segment_max,
        "sma": q_sma,
        "wma": q_wma,
        "ema": q_ema,
        "savgol": q_savgol,
        "kalman": q_kalman,
        "zscore": q_zscore,
        "series_stats": q_series_stats,
        "linear_forecast": q_linear_forecast,
        "ses_forecast": q_ses_forecast,
        "holt_forecast": q_holt_forecast,
        "gapfill_locf_1h": q_gapfill_locf_1h,
        "cusum_changepoints": q_cusum_changepoints,
        "pelt_changepoints": q_pelt_changepoints,
        "pelt_auto_penalty": q_pelt_auto_penalty,
        "token_count": q_token_count,
        "char_stats": q_char_stats,
        "exact_dedup": q_exact_dedup,
        "quality_scores": q_quality_scores,
        "language_id": q_language_id,
        "fingerprints": q_fingerprints,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "knn_cosine": q_knn_cosine,
        "embedding_near_dups": q_embedding_near_dups,
        "ivf_knn": q_ivf_knn,
        "media_features": q_media_features,
        "pelt_cost_functions": q_pelt_cost_functions,
        "pelt_multivariate": q_pelt_multivariate,
        "optimize_ses_alpha": q_optimize_ses_alpha,
        "lineitem_rollup_1d": q_lineitem_rollup_1d,
        "sliding_window_3h": q_sliding_window_3h,
        "session_windows": q_session_windows,
        "asof_join_orders": q_asof_join_orders,
    }


def build_oracle_sql() -> dict:
    seg = lambda op, agg: _SEGMENT_SQL.format(op=op, agg=agg, factor=10)
    return {
        "rollup_1m": _ROLLUP_SQL.format(unit="minute"),
        "rollup_1h_cascade": _ROLLUP_SQL.format(unit="hour"),
        "rollup_1d_cascade": _ROLLUP_SQL.format(unit="day"),
        "rollup_1h_by_user": """
SELECT user_id,
       date_trunc('hour', ts) AS bucket_ts,
       COUNT(*) AS cnt,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
        "downsample": """
SELECT event_id, event_type, ts, value FROM (
  SELECT event_id, event_type, ts, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS rn
  FROM events
) WHERE rn % 3 = 0
""",
        "segment_mean": seg("mean", "AVG"),
        "segment_median": seg("median", "MEDIAN"),
        "segment_min": seg("min", "MIN"),
        "segment_max": seg("max", "MAX"),
        "sma": """
SELECT event_type, rn AS idx, ROUND(sma, 6) AS sma FROM (
  SELECT event_type,
         row_number() OVER w - 1 AS rn,
         AVG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sma
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
) WHERE rn >= 4
""",
        "wma": """
SELECT event_type, rn AS idx, ROUND(wma, 6) AS wma FROM (
  SELECT event_type,
         row_number() OVER w - 1 AS rn,
         (0.1 * lag(value, 2) OVER w + 0.3 * lag(value, 1) OVER w
          + 0.6 * value) / 1.0 AS wma
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
) WHERE rn >= 2
""",
        "zscore": """
SELECT event_id,
       ROUND((value - AVG(value) OVER w) / stddev_pop(value) OVER w, 6) AS zvalue
FROM events
WINDOW w AS (PARTITION BY event_type)
""",
        "series_stats": """
WITH s AS (
  SELECT event_type, COUNT(*) AS n, AVG(value) AS mu, stddev_pop(value) AS sigma
  FROM events GROUP BY 1
)
SELECT e.event_type,
       s.n AS n,
       ROUND(s.mu, 6) AS mean_value,
       ROUND(s.sigma, 6) AS std_pop,
       ROUND(MEDIAN(e.value), 6) AS median_value,
       ROUND(s.n * SUM(POW((e.value - s.mu) / s.sigma, 3)) / ((s.n - 1) * (s.n - 2)), 6) AS skew_g1
FROM events e JOIN s ON e.event_type = s.event_type
GROUP BY e.event_type, s.n, s.mu, s.sigma
""",
        "linear_forecast": """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS x
  FROM events
),
f AS (
  SELECT event_type, regr_slope(value, x) AS slope, MAX(x) AS xmax FROM r GROUP BY 1
),
l AS (
  SELECT r.event_type, r.value AS last_value
  FROM r JOIN f ON r.event_type = f.event_type AND r.x = f.xmax
)
SELECT f.event_type, h.h AS h, ROUND(l.last_value + f.slope * h.h, 6) AS forecast
FROM f JOIN l ON f.event_type = l.event_type
CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS h) h
""",
        "gapfill_locf_1h": """
WITH r AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         ROUND(ROUND(SUM(value), 6) / COUNT(*), 6) AS mean_v
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM r GROUP BY 1
),
g AS (
  SELECT b.event_type, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM b
)
SELECT g.event_type, g.bucket_ts,
       ROUND(r.mean_v, 6) AS value,
       (r.bucket_ts <> g.bucket_ts) AS gap_filled
FROM g ASOF JOIN r
  ON g.event_type = r.event_type AND g.bucket_ts >= r.bucket_ts
""",
        "token_count": """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tokens_ws
FROM documents
""",
        "char_stats": """
SELECT doc_id,
       length(text) AS n_chars,
       length(text) - length(replace(text, ' ', '')) AS n_spaces,
       length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
FROM documents
""",
        "exact_dedup": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM documents GROUP BY text
""",
        "knn_cosine": """
WITH q AS (
  SELECT embedding FROM embeddings
  WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT e.vec_id AS vec_id,
       ROUND(list_cosine_similarity(e.embedding, q.embedding), 6) AS cosine
FROM embeddings e, q
WHERE e.vec_id <> (SELECT MIN(vec_id) FROM embeddings)
ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC
LIMIT 10
""",
        # ema/savgol/kalman/cusum/pelt/holt/ses: sequential recurrences or
        # DP — not SQL-expressible; the driver records rows-only checks.
        # minhash/simhash/language_id/quality/fingerprints/media: heuristic
        # or hash-based — rows-only.
        "lineitem_rollup_1d": """
SELECT l_returnflag,
       date_trunc('day', l_shipdate) AS bucket_ts,
       COUNT(*) AS cnt,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       ROUND(ROUND(SUM(l_quantity), 6) / COUNT(*), 6) AS mean_qty
FROM lineitem GROUP BY 1, 2
""",
        "sliding_window_3h": """
WITH r AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts, SUM(value) AS s
  FROM events GROUP BY 1, 2
)
SELECT event_type, bucket_ts,
       ROUND(SUM(s) OVER w, 6) AS window_sum,
       ROUND(AVG(s) OVER w, 6) AS window_mean
FROM r
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
        "session_windows": """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY 1, 2
""",
        "asof_join_orders": """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         MAX(o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       CAST(o.o_orderkey AS DOUBLE) AS orderkey,
       ROUND(o.o_totalprice, 6) AS total_price
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
        # embedding_near_dups: threshold on float boundary -> rows-only to
        # avoid knife-edge hash mismatches; ivf_knn approximate -> rows-only.
    }


def q_pelt_cost_functions(sf_dir: str):
    """Breakpoints per cost function (L2/L1/RBF/Gaussian/Poisson/Bernoulli/
    AR) on the 1h-tier count/mean series per event_type — §2.2 coverage
    through the distributed path. Rows-only (DP not SQL-expressible)."""
    t1h = rollup_tier(_events(sf_dir), "1h", key_cols=["event_type"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts")
        mean = df["mean"].to_numpy(dtype=np.float64)
        count = df["count"].to_numpy(dtype=np.float64)
        rows = []
        configs = [
            ("l2", mean, 10.0, {}),
            ("l1", mean[:500], 10.0, {}),
            ("rbf", mean[:500], 1.0, {}),
            ("gaussian", mean, 20.0, {}),
            ("poisson", count, 20.0, {}),
            ("bernoulli", (count > np.median(count)).astype(float), 5.0, {}),
            ("ar", mean, 50.0, {"order": 1}),
        ]
        for cost, series, penalty, kwargs in configs:
            try:
                bkps = pelt_breakpoints(
                    series, penalty, cost=cost, min_size=5, **kwargs
                )
            except Exception:
                bkps = []
            for b in bkps:
                rows.append((df["event_type"].iloc[0], cost, int(b)))
        return pd.DataFrame(
            rows, columns=["event_type", "cost", "breakpoint_index"]
        )

    return t1h.groupby("event_type").map_groups(fn, batch_format="pandas")


def q_pelt_multivariate(sf_dir: str):
    """Multivariate PELT (dims x time: [mean, count z-scored]) on the 1h
    tier per event_type — reference double[,] semantics distributed."""
    t1h = rollup_tier(_events(sf_dir), "1h", key_cols=["event_type"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts")
        mat = np.vstack(
            [
                stats.zscore(df["mean"].to_numpy(dtype=np.float64)),
                stats.zscore(df["count"].to_numpy(dtype=np.float64)),
            ]
        )
        bkps = pelt_breakpoints(mat, penalty=5.0, cost="l2", min_size=5)
        return pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].iloc[0], len(bkps)),
                "breakpoint_index": np.asarray(bkps, dtype=np.int64),
            }
        )

    return t1h.groupby("event_type").map_groups(fn, batch_format="pandas")


def q_optimize_ses_alpha(sf_dir: str):
    """Per-series SES alpha tuned by the grid-search optimizer (one-step-
    ahead SSE objective) with Nelder-Mead refinement — §2.6 coverage."""
    from ..kernels.optimize import (
        GridSearchOptimizer,
        GridSearchOptions,
        NelderMeadOptimizer,
        NelderMeadOptions,
        ParameterDefinition,
    )

    def sse_for(vals):
        def objective(params):
            alpha = params["alpha"]
            level = vals[0]
            sse = 0.0
            for v in vals:
                err = v - level
                sse += err * err
                level = alpha * v + (1 - alpha) * level
            return sse

        return objective

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sorted_group(df)
        vals = df["value"].to_numpy(dtype=np.float64)[:500]
        obj = sse_for(vals)
        grid = GridSearchOptimizer(GridSearchOptions(default_grid_steps=11)).optimize(
            obj, [ParameterDefinition("alpha", 0.01, 0.99)]
        )
        nm = NelderMeadOptimizer(NelderMeadOptions(max_iterations=100)).optimize(
            obj,
            [
                ParameterDefinition(
                    "alpha", 0.01, 0.99, initial_guess=grid.best_parameters["alpha"]
                )
            ],
        )
        best = nm if nm.minimized_metric <= grid.minimized_metric else grid
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "alpha": [_r6(best.best_parameters["alpha"])],
                "sse": [_r6(best.minimized_metric)],
            }
        )

    return _per_series(sf_dir, fn)


def q_lineitem_rollup_1d(sf_dir: str):
    """Engine generality: the same tiered-rollup machinery over a different
    table/shape (lineitem by l_returnflag on l_shipdate)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_shipdate", "l_quantity"],
    )
    out = rollup_tier(
        ds, "1d", key_cols=["l_returnflag"], ts_col="l_shipdate", value_col="l_quantity"
    )

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        cnt = batch["count"].astype(np.int64)
        sum_r = _r6(batch["sum"])
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "bucket_ts": batch["bucket_ts"],
                "cnt": cnt,
                "sum_qty": sum_r,
                "mean_qty": _r6(sum_r / cnt.to_numpy()),
            }
        )

    return out.map_batches(fmt, batch_format="pandas")


def q_sliding_window_3h(sf_dir: str):
    """3-bucket sliding aggregate over the 1h rollup per event_type."""
    from ..stages.windows import sliding_window

    t1h = rollup_tier(_events(sf_dir), "1h", key_cols=["event_type"])
    out = sliding_window(t1h, ["event_type"], window=3, value_col="sum")

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "bucket_ts": batch["bucket_ts"],
                "window_sum": _r6(batch["window_sum"]),
                "window_mean": _r6(batch["window_mean"]),
            }
        )

    return out.map_batches(fmt, batch_format="pandas")


def q_session_windows(sf_dir: str):
    """30-minute-gap sessionization per user_id."""
    from ..stages.windows import session_windows

    ev = _events(sf_dir, ["event_id", "ts", "user_id"])
    out = session_windows(ev, "user_id", timeout_us=1_800_000_000)

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "session_id": batch["session_id"].astype(np.int64),
                "session_start": batch["session_start"],
                "session_end": batch["session_end"],
                "n_events": batch["n_events"].astype(np.int64),
            }
        )

    return out.map_batches(fmt, batch_format="pandas")


def q_asof_join_orders(sf_dir: str):
    """For every event, the latest order of the same customer placed at or
    before the event time (backward as-of join on user_id)."""
    import ray.data as rd

    from ..stages.windows import asof_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    )

    def prep_orders(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.rename(columns={"o_custkey": "user_id", "o_orderdate": "ts"})

    # ties (same customer+date) are resolved globally inside the asof
    # kernel via right_tiebreak=max(o_orderkey) — never per batch, which
    # would depend on block layout
    right = orders.map_batches(prep_orders, batch_format="pandas")
    out = asof_join(
        ev, right, "user_id", left_ts="ts", right_ts="ts",
        right_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak=["o_orderkey"],
    )

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "user_id": batch["user_id"].astype(np.int64),
                "ts": batch["ts"],
                "orderkey": batch["o_orderkey"].astype(np.float64),
                "total_price": _r6(batch["o_totalprice"].fillna(np.nan)),
            }
        )

    return out.map_batches(fmt, batch_format="pandas")
