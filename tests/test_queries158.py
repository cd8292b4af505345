"""Kernel tests for pipelines/queries158.py — GMM2 EM and Welch
coherence on constructed events tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, counts_by_type):
    ts, et = [], []
    for name, counts in counts_by_type.items():
        hours = pd.date_range("2024-01-01", periods=len(counts), freq="1h")
        for h, c in zip(hours, counts):
            ts.extend([h] * int(c))
            et.extend([name] * int(c))
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


@pytest.mark.usefixtures("ray_session")
def test_gmm2_em_separates_bimodal(tmp_path):
    """Hourly counts alternate 2 and 10: EM recovers the two modes with
    ~equal weights."""
    from signalsharp_ray.pipelines.queries158 import q_gmm2_em

    counts = np.tile([2, 10], 30)
    _write(tmp_path, {"click": counts})
    out = q_gmm2_em(str(tmp_path)).sort_values("mu").reset_index(drop=True)
    assert len(out) == 2
    assert out["mu"].iloc[0] == pytest.approx(2.0, abs=0.2)
    assert out["mu"].iloc[1] == pytest.approx(10.0, abs=0.2)
    assert out["weight"].iloc[0] == pytest.approx(0.5, abs=0.05)
    assert out["weight"].sum() == pytest.approx(1.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_welch_coherence_identical_series_is_one(tmp_path):
    """Identical hourly series -> coherence 1 at every frequency."""
    from signalsharp_ray.pipelines.queries158 import q_welch_coherence

    rng = np.random.RandomState(11)
    counts = rng.randint(1, 6, size=256)
    _write(tmp_path, {"aaa": counts, "bbb": counts})
    out = q_welch_coherence(str(tmp_path))
    assert list(out["k"]) == [1, 2, 3, 4]
    assert (out["n_segments"] == 2).all()
    np.testing.assert_allclose(out["coherence"].to_numpy(), 1.0, atol=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_welch_coherence_requires_full_segment(tmp_path):
    """Fewer than 128 common hours -> no rows."""
    from signalsharp_ray.pipelines.queries158 import q_welch_coherence

    counts = np.ones(64, dtype=int) * 2
    _write(tmp_path, {"aaa": counts, "bbb": counts})
    out = q_welch_coherence(str(tmp_path))
    assert len(out) == 0
