"""Kernel tests for pipelines/queries159.py — CUSUM-break t-test,
Lomb-Scargle periodogram, k-fold assignment audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, value, event_type="click"):
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": event_type,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.asarray(value, dtype=np.float64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_cusum_break_ttest_degenerate_step_skipped(tmp_path):
    """Perfectly constant segments have zero pooled variance — the
    degenerate-denominator guard must skip the type on BOTH engines."""
    from signalsharp_ray.pipelines.queries159 import q_cusum_break_ttest

    counts = [2] * 10 + [8] * 10
    days = pd.date_range("2024-01-01", periods=20, freq="1D")
    ts = np.concatenate([np.repeat(d, c) for d, c in zip(days, counts)])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))
    out = q_cusum_break_ttest(str(tmp_path)).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_cusum_break_ttest_noisy_step(tmp_path):
    """Noisy step keeps within-segment variance > 0 so the t-stat is
    emitted and strongly positive."""
    from signalsharp_ray.pipelines.queries159 import q_cusum_break_ttest

    rng = np.random.RandomState(2)
    counts = np.concatenate(
        [rng.randint(2, 5, size=10), rng.randint(9, 13, size=10)]
    )
    days = pd.date_range("2024-01-01", periods=20, freq="1D")
    ts = np.concatenate([np.repeat(d, c) for d, c in zip(days, counts)])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))
    out = q_cusum_break_ttest(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["break_idx"] == 10
    assert r["t_stat"] > 5.0


@pytest.mark.usefixtures("ray_session")
def test_lomb_scargle_daily_cycle(tmp_path):
    """Values carry a pure 24h sinusoid on irregular-ish sample times:
    normalized power at 24h dominates 168h."""
    from signalsharp_ray.pipelines.queries159 import q_lomb_scargle

    hours = np.arange(0, 240, 2)  # every 2 hours for 10 days
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(hours, unit="h")
    value = 10.0 + 5.0 * np.sin(2 * np.pi * hours / 24.0)
    _write_events(tmp_path, pd.DatetimeIndex(ts), value)
    out = q_lomb_scargle(str(tmp_path)).to_pandas()
    p24 = out.loc[out["period_h"] == 24.0, "power_norm"].iloc[0]
    p168 = out.loc[out["period_h"] == 168.0, "power_norm"].iloc[0]
    assert p24 > 20 * max(p168, 1e-9)


@pytest.mark.usefixtures("ray_session")
def test_kfold_assignment_deterministic(tmp_path):
    from signalsharp_ray.pipelines.queries159 import q_kfold_assignment

    n = 100
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x"] * n,
            "lang": "en",
            "source": ["s0"] * 50 + ["s1"] * 50,
            "n_chars": np.ones(n, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_kfold_assignment(str(tmp_path))
    # folds match the hash gate
    exp = (np.arange(n, dtype=np.uint64) * np.uint64(1_000_003)) % np.uint64(5)
    for src, lo in (("s0", 0), ("s1", 50)):
        sub = out[out["source"] == src]
        assert int(sub["n_docs"].sum()) == 50
        cnt = np.bincount(exp[lo : lo + 50].astype(int), minlength=5)
        got = sub.set_index("fold")["n_docs"]
        for f in range(5):
            if cnt[f] == 0:
                assert f not in got.index
            else:
                assert got[f] == cnt[f]
    # deviations per source sum to ~0
    assert out.groupby("source")["dev_pct"].sum().abs().max() < 1e-5
