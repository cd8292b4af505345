"""Kernel tests for pipelines/queries160.py — gap memory coefficient,
spectral flatness, embedding effective dim, knee point."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events_at(tmp_path, times_us, event_type="click"):
    ts = np.asarray(times_us, dtype=np.int64).astype("datetime64[us]")
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": event_type,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_gap_memory_alternating_is_negative(tmp_path):
    """Gaps alternating short/long give strongly negative memory."""
    from signalsharp_ray.pipelines.queries160 import q_gap_memory_coefficient

    gaps = np.tile([1_000_000, 60_000_000], 20)  # 1s / 60s alternating
    times = np.concatenate([[0], np.cumsum(gaps)])
    _write_events_at(tmp_path, times)
    out = q_gap_memory_coefficient(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_gaps"].iloc[0] == 40
    assert out["memory_coef"].iloc[0] < -0.9


@pytest.mark.usefixtures("ray_session")
def test_gap_memory_trending_is_positive(tmp_path):
    """Slowly growing gaps (long follows long) give positive memory."""
    from signalsharp_ray.pipelines.queries160 import q_gap_memory_coefficient

    gaps = (np.arange(1, 41) * 1_000_000).astype(np.int64)
    times = np.concatenate([[0], np.cumsum(gaps)])
    _write_events_at(tmp_path, times)
    out = q_gap_memory_coefficient(str(tmp_path)).to_pandas()
    assert out["memory_coef"].iloc[0] > 0.9


@pytest.mark.usefixtures("ray_session")
def test_spectral_flatness_tonal_vs_flat(tmp_path):
    """A strong 24h square wave is tonal (low flatness); white-ish
    pseudo-random counts are flat (higher flatness)."""
    from signalsharp_ray.pipelines.queries160 import q_spectral_flatness

    hours = pd.date_range("2024-01-01", periods=96, freq="1h")
    tonal = np.where(np.arange(96) % 24 < 12, 2, 8)
    rng = np.random.RandomState(9)
    flat = rng.randint(2, 9, size=96)
    ts, et = [], []
    for h, c in zip(hours, tonal):
        ts.extend([h] * int(c))
        et.extend(["tonal"] * int(c))
    for h, c in zip(hours, flat):
        ts.extend([h] * int(c))
        et.extend(["flat"] * int(c))
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_spectral_flatness(str(tmp_path)).to_pandas().set_index(
        "event_type"
    )
    assert out.loc["tonal", "flatness"] < out.loc["flat", "flatness"]
    assert out.loc["tonal", "flatness"] < 0.2


@pytest.mark.usefixtures("ray_session")
def test_embedding_effective_dim_isotropic(tmp_path):
    """An isotropic 4-D cloud (axis-aligned +/- unit vectors) has
    participation ratio = 4 (all variance directions equal)."""
    from signalsharp_ray.pipelines.queries160 import q_embedding_effective_dim

    vecs = []
    for d in range(4):
        for s in (1.0, -1.0):
            v = [0.0] * 4
            v[d] = s
            vecs.append(v)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(8, dtype=np.int64),
            "embedding": vecs,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "embeddings.parquet")
    out = q_embedding_effective_dim(str(tmp_path))
    assert out["n_vecs"].iloc[0] == 8
    assert out["n_dims"].iloc[0] == 4
    assert out["effective_dim"].iloc[0] == pytest.approx(4.0, abs=1e-4)


@pytest.mark.usefixtures("ray_session")
def test_knee_point_piecewise_curve(tmp_path):
    """Daily counts whose sorted-descending curve is steep then flat:
    the knee lands where the slope breaks."""
    from signalsharp_ray.pipelines.queries160 import q_knee_point

    # sorted desc: [100, 60, 20, 10, 9, 8, 7, 6] -> max chord distance
    counts = [100, 60, 20, 10, 9, 8, 7, 6]
    days = pd.date_range("2024-01-01", periods=8, freq="1D")
    ts = np.concatenate([np.repeat(d, c) for d, c in zip(days, counts)])
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": "click",
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_knee_point(str(tmp_path)).to_pandas()
    assert len(out) == 1
    # direct argmax of the integer cross product
    sv = np.array(sorted(counts, reverse=True))
    x = np.arange(1, 9)
    num = np.abs((sv[-1] - sv[0]) * (x - 1) - (8 - 1) * (sv - sv[0]))
    exp_idx = int(np.argmax(num)) + 1
    assert out["knee_idx"].iloc[0] == exp_idx
    assert out["n_days"].iloc[0] == 8
