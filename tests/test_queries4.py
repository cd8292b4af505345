"""Kernel-level tests for pipelines/queries4.py — pure pandas, no Ray.

Each kernel gets a known-answer fixture plus the house split/order
invariance checks: whole-group kernels must be row-order independent
(they sort internally), and the hourly combiner must be split-invariant
(integer sums merge associatively).
"""

import numpy as np
import pandas as pd

from signalsharp_ray.pipelines.queries4 import (
    DAY_US,
    hourly_cents_partial,
    session_stats_kernel,
    twa_day_kernel,
    watermark_keep_kernel,
)

US = 1_000_000


def test_twa_known_answer():
    # day 1970-01-01; obs at 0s (v=1.00) and at 43200s (v=3.00):
    # first holds 43200s, second holds 43200s -> TWA = 2.00
    df = pd.DataFrame(
        {
            "event_type": ["a", "a"],
            "day_us": [0, 0],
            "ts_us": [0, 43_200 * US],
            "event_id": [1, 2],
            "cents": [100, 300],
        }
    )
    out = twa_day_kernel(df)
    assert out["twa_value"].iloc[0] == 2.0
    assert out["n_obs"].iloc[0] == 2


def test_twa_weighting_is_locf_not_mean():
    # obs at 0s (v=10) holding almost all day, obs 1s before midnight (v=0):
    # plain mean is 5, TWA must stay ~10.
    df = pd.DataFrame(
        {
            "event_type": ["a", "a"],
            "day_us": [0, 0],
            "ts_us": [0, DAY_US - US],
            "event_id": [1, 2],
            "cents": [1000, 0],
        }
    )
    out = twa_day_kernel(df)
    assert abs(out["twa_value"].iloc[0] - 10.0) < 1e-3


def test_twa_row_order_invariant():
    rng = np.random.default_rng(7)
    n = 50
    df = pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "day_us": [0] * n,
            "ts_us": np.sort(rng.choice(np.arange(0, DAY_US, US), n, replace=False)),
            "event_id": np.arange(n),
            "cents": rng.integers(0, 10_000, n),
        }
    )
    a = twa_day_kernel(df)
    b = twa_day_kernel(df.iloc[rng.permutation(n)].reset_index(drop=True))
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_watermark_drops_late_event_only():
    # arrival order by event_id; event 3 is 20 min older than the max seen
    # (lateness 10 min) -> dropped; event 4 only 5 min older -> kept.
    base = 10_000 * US
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                [base, base + 3600 * US, base + 3600 * US - 1200 * US,
                 base + 3600 * US - 300 * US],
                unit="us",
            ),
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
        }
    )
    out = watermark_keep_kernel(df, lateness_us=600 * US)
    kept_ids = set(df.loc[out.index, "event_id"] if out.index.size else [])
    assert 3 not in set(df.loc[out.index, "event_id"])
    assert {1, 2, 4} <= set(df.loc[out.index, "event_id"])


def test_watermark_first_event_always_kept():
    df = pd.DataFrame(
        {
            "event_id": [5],
            "ts": pd.to_datetime([123 * US], unit="us"),
            "event_type": ["a"],
            "value": [2.0],
        }
    )
    assert len(watermark_keep_kernel(df)) == 1


def test_watermark_row_order_invariant():
    rng = np.random.default_rng(11)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 3600 * US, n).cumsum() // 3, unit="us"
            ),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    a = watermark_keep_kernel(df).reset_index(drop=True)
    b = watermark_keep_kernel(
        df.iloc[rng.permutation(n)].reset_index(drop=True)
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_session_stats_known_answer():
    # two sessions: events at 0s,60s | gap 31min | 2000s+... one event
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime([0, 60 * US, (60 + 31 * 60) * US], unit="us"),
            "user_id": [42, 42, 42],
            "value": [1.0, 2.5, 4.0],
        }
    )
    out = session_stats_kernel(df)
    assert list(out["session_id"]) == [0, 1]
    assert list(out["n_events"]) == [2, 1]
    assert list(out["duration_us"]) == [60 * US, 0]
    assert list(out["value_sum"]) == [3.5, 4.0]


def test_hourly_partial_split_invariant():
    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(rng.integers(0, 6 * 3600 * US, n), unit="us"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )

    def run(batches):
        parts = pd.concat([hourly_cents_partial(b) for b in batches])
        return (
            parts.groupby(["event_type", "bucket_us"])
            .agg(cents=("cents", "sum"), count=("count", "sum"))
            .reset_index()
            .sort_values(["event_type", "bucket_us"])
            .reset_index(drop=True)
        )

    whole = run([df])
    singles = run([df.iloc[[i]] for i in range(n)])
    skew = run([df.iloc[: n // 9], df.iloc[n // 9 :]])
    pd.testing.assert_frame_equal(whole, singles)
    pd.testing.assert_frame_equal(whole, skew)


def test_winnow_guarantee_shared_window_yields_shared_fingerprint():
    # winnowing guarantee: docs sharing a substring of length w+k-1 = 23
    # chars share at least one selected fingerprint (here: identical
    # prefixes -> identical fingerprint sets)
    from signalsharp_ray.pipelines.queries4 import winnow_doc

    a = winnow_doc("the quick brown fox jumps over the lazy dog once more")
    b = winnow_doc("the quick brown fox jumps over the lazy dog once more")
    assert a == b
    assert a[0] > 0 and a[1] >= 1 and a[1] <= a[0]


def test_winnow_short_text_returns_none():
    from signalsharp_ray.pipelines.queries4 import winnow_doc

    assert winnow_doc("short") is None
    assert winnow_doc("") is None
    # 22 chars: one gram short of a full 16-gram window
    assert winnow_doc("x" * 22) is None
    assert winnow_doc("x" * 23) is not None


def test_ewm_var_matches_naive_recursion():
    from signalsharp_ray.pipelines.queries4 import ewm_var_kernel

    rng = np.random.default_rng(2)
    n = 60
    df = pd.DataFrame(
        {
            "event_type": ["a"] * n,
            "bucket_ts": pd.to_datetime(np.arange(n) * 3_600_000_000, unit="us"),
            "count": rng.integers(0, 50, n),
        }
    )
    out = ewm_var_kernel(df, alpha=0.2)
    m, v = float(df["count"].iloc[0]), 0.0
    for i in range(1, n):
        d = float(df["count"].iloc[i]) - m
        m = m + 0.2 * d
        v = 0.8 * (v + 0.2 * d * d)
    assert out["ewm_mean"].iloc[-1] == np.sign(m) * np.floor(abs(m) * 1e6 + 0.5) / 1e6
    assert out["ewm_var"].iloc[-1] == np.sign(v) * np.floor(abs(v) * 1e6 + 0.5) / 1e6
    # variance non-negative everywhere
    assert (out["ewm_var"].to_numpy() >= 0).all()


def test_hourly_profile_zero_fill_matters():
    from signalsharp_ray.pipelines.queries4 import hourly_profile_kernel

    # observed buckets only at hours 0 and 2 across two days; hour 1 of
    # day 1 is silent -> dense grid must count it as a zero slot
    H = 3_600_000_000
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 3,
            "bucket_ts": pd.to_datetime([0, 2 * H, 24 * H], unit="us"),
            "count": [10, 6, 4],
        }
    )
    out = hourly_profile_kernel(df).set_index("hour_of_day")
    # grid spans hours 0..24 -> hour 0 has 2 slots (counts 10, 4)
    assert out.loc[0, "n_hours"] == 2 and out.loc[0, "sum_count"] == 14
    assert out.loc[0, "mean_count"] == 7.0
    # hour 1 exists as a zero slot
    assert out.loc[1, "n_hours"] == 1 and out.loc[1, "sum_count"] == 0


def test_apdex_partial_split_invariant():
    from signalsharp_ray.pipelines.queries4 import apdex_partial

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(rng.integers(0, 3 * 86_400 * US, n), unit="us"),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 500, n), 2),
        }
    )

    def run(batches):
        parts = pd.concat([apdex_partial(b) for b in batches])
        return (
            parts.groupby(["event_type", "day_us"])
            .agg(sat=("sat", "sum"), tol=("tol", "sum"), n=("n", "sum"))
            .reset_index()
            .sort_values(["event_type", "day_us"])
            .reset_index(drop=True)
        )

    whole = run([df])
    singles = run([df.iloc[[i]] for i in range(n)])
    pd.testing.assert_frame_equal(whole, singles)


def test_token_rarity_doc_partial_split_invariant():
    from signalsharp_ray.pipelines.queries4 import token_rarity_doc_partial

    rng = np.random.default_rng(4)
    n = 300
    df = pd.DataFrame(
        {
            "doc_id": rng.integers(0, 40, n),
            "c": rng.integers(1, 12, n),
        }
    )

    def run(batches):
        parts = pd.concat([token_rarity_doc_partial(b) for b in batches])
        return (
            parts.groupby("doc_id")
            .agg(n=("n", "sum"), sum_c=("sum_c", "sum"),
                 hapax=("hapax", "sum"), rare=("rare", "sum"))
            .reset_index()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    whole = run([df])
    singles = run([df.iloc[[i]] for i in range(n)])
    cut = n // 5
    skew = run([df.iloc[:cut], df.iloc[cut:]])
    pd.testing.assert_frame_equal(whole, singles)
    pd.testing.assert_frame_equal(whole, skew)


def test_debounce_kernel_greedy_semantics():
    from signalsharp_ray.pipelines.queries4 import debounce_kernel

    # events at 0s, 30s, 70s, 100s, 140s with 60s gap:
    # keep 0s; 30s (gap 30 from kept) drop; 70s (gap 70) keep;
    # 100s (gap 30 from 70) drop; 140s (gap 70 from 70) keep
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "ts": pd.to_datetime([0, 30 * US, 70 * US, 100 * US, 140 * US],
                                 unit="us"),
            "user_id": [7] * 5,
        }
    )
    out = debounce_kernel(df, gap_us=60 * US)
    assert list(out["event_id"]) == [1, 3, 5]
    # a session-window (gap-to-PREVIOUS) rule would keep a different set —
    # 100s is only 30s after 70s but 140s is 40s after 100s (dropped event
    # still advances a naive gap rule); greedy kept-state must not.
