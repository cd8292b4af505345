"""Kernel tests for pipelines/queries35.py — value trend / lang-source
chi2 / day similarity known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries35 import (
    q_day_profile_similarity,
    q_lang_source_chi2,
    q_value_trend_daily,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _events(days, values=None, hours=None):
    n = len(days)
    ts = [
        T0 + days[i] * DAY_US + (hours[i] if hours else 0) * HOUR_US + i
        for i in range(n)
    ]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(values or [1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_value_trend_daily_linear(tmp_path):
    # day d has one event of value d+1 dollars -> slope = 100 cents/day
    days = [0, 1, 2, 3]
    values = [1.0, 2.0, 3.0, 4.0]
    pq.write_table(_events(days, values=values), tmp_path / "events.parquet")
    out = q_value_trend_daily(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 4
    assert r["slope_c_per_day"] == 100.0
    assert r["intercept_c"] == 100.0


@pytest.mark.usefixtures("ray_session")
def test_lang_source_chi2_independent(tmp_path):
    # same lang mix in both sources -> chi2 = 0
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": ["x"] * 8,
            "lang": ["en", "en", "de", "de"] * 2,
            "source": ["web"] * 4 + ["wiki"] * 4,
            "n_chars": np.ones(8, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_lang_source_chi2(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 8 and r["dof"] == 1
    assert r["chi2"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_day_profile_similarity_identical_days(tmp_path):
    # two days with the same non-constant profile -> mean corr 1.0
    days, hours = [], []
    for d in range(2):
        for h, c in [(0, 1), (1, 3), (2, 2)]:
            for _ in range(c):
                days.append(d)
                hours.append(h)
    pq.write_table(_events(days, hours=hours), tmp_path / "events.parquet")
    out = q_day_profile_similarity(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 2 and r["n_pairs"] == 1
    assert r["mean_corr"] == 1.0
