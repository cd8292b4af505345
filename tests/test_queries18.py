"""Kernel tests for pipelines/queries18.py — crest/trimean, drought runs,
Markov entropy rate, lognormal fit known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries18 import (
    q_crest_factor,
    q_doclen_lognormal,
    q_markov_entropy_rate,
    q_max_drought,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


def _events(hours=None, types=None, users=None):
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(types or ["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_crest_factor_known(tmp_path):
    # hourly counts sorted: [1,2,3,4] -> mean 2.5, peak 4, crest 1.6
    hours = [0] * 1 + [1] * 2 + [2] * 3 + [3] * 4
    pq.write_table(_events(hours=hours), tmp_path / "events.parquet")
    out = q_crest_factor(str(tmp_path))
    r = out.iloc[0]
    assert r["peak"] == 4 and r["total"] == 10 and r["n_hours"] == 4
    assert r["crest"] == 1.6
    # q1 = 1 (rank 1), q2 = 2 (rank 2), q3 = 3 (rank 3) -> (1+4+3)/4 = 2.0
    assert r["trimean"] == 2.0


@pytest.mark.usefixtures("ray_session")
def test_max_drought_islands(tmp_path):
    # present hours 0, 4, 5, 9 -> zero islands 1..3 (len 3) and 6..8 (len 3)
    hours = [0, 4, 5, 9]
    pq.write_table(_events(hours=hours), tmp_path / "events.parquet")
    out = q_max_drought(str(tmp_path))
    r = out.iloc[0]
    assert r["n_zero_hours"] == 6
    assert r["max_drought_h"] == 3


@pytest.mark.usefixtures("ray_session")
def test_markov_entropy_deterministic_chain(tmp_path):
    # a -> b -> a -> b ... : next state fully determined -> rate = 0
    types = ["a", "b"] * 20
    pq.write_table(
        _events(hours=list(range(40)), types=types), tmp_path / "events.parquet"
    )
    out = q_markov_entropy_rate(str(tmp_path))
    r = out.iloc[0]
    assert r["n_transitions"] == 39
    assert r["n_states"] == 2
    assert r["entropy_rate"] == 0.0
    assert r["max_rate"] == round(math.log(2.0), 6)


@pytest.mark.usefixtures("ray_session")
def test_doclen_lognormal_constant(tmp_path):
    # all lengths equal -> sigma = 0, median = length
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": ["x" * 100] * 5,
            "lang": ["en"] * 5,
            "source": ["web"] * 5,
            "n_chars": np.full(5, 100, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_doclen_lognormal(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_docs"] == 5
    assert r["ln_mu"] == round(math.log(100.0), 6)
    assert r["ln_sigma"] == 0.0
    assert abs(r["median_est"] - 100.0) < 1e-4
