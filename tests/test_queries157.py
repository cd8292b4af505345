"""Kernel tests for pipelines/queries157.py — GARCH volatility filter
and BPE merge candidates on constructed tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_garch_volatility_recursion(tmp_path):
    """Counts [2,2,8,2,2,...]: the conditional volatility spikes the
    hour AFTER the shock and decays geometrically; values match a
    direct replay of the recursion."""
    from signalsharp_ray.pipelines.queries157 import q_garch_volatility

    counts = np.array([2] * 10 + [8] + [2] * 9)
    hours = pd.date_range("2024-01-01", periods=20, freq="1h")
    ts = np.concatenate([np.repeat(h, c) for h, c in zip(hours, counts)])
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

    out = (
        q_garch_volatility(str(tmp_path))
        .to_pandas()
        .sort_values("idx")
        .reset_index(drop=True)
    )
    assert len(out) == 20
    v = counts.astype(float)
    mu = v.mean()
    c0 = v.var()
    s2 = c0
    exp = [np.sqrt(s2)]
    for t in range(1, 20):
        s2 = 0.1 * c0 + 0.1 * (v[t - 1] - mu) ** 2 + 0.8 * s2
        exp.append(np.sqrt(s2))
    np.testing.assert_allclose(out["cond_vol"].to_numpy(), exp, atol=1e-6)
    # the shock at idx 10 raises vol at idx 11
    assert out["cond_vol"].iloc[11] == out["cond_vol"].max()


@pytest.mark.usefixtures("ray_session")
def test_bpe_merge_candidates(tmp_path):
    """Corpus 'aaab aaab ab': pairs aa x4, ab x3 -> top merges."""
    from signalsharp_ray.pipelines.queries157 import q_bpe_merge_candidates

    texts = ["aaab aaab", "ab"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_bpe_merge_candidates(str(tmp_path))
    assert list(out["pair"]) == ["aa", "ab"]
    assert list(out["n"]) == [4, 3]
    assert list(out["rank"]) == [1, 2]
