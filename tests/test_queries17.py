"""Kernel tests for pipelines/queries17.py — DFA / Simpson / stopwords /
exponential GOF known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries17 import (
    q_dfa,
    q_exp_gof,
    q_simpson_diversity,
    q_stopword_coverage,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


def _events_by_hour(counts):
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


def _docs(texts, source="web"):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array([source] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_dfa_trend_vs_noise(tmp_path):
    # monotone ramp -> trend-dominated, alpha well above 1
    pq.write_table(
        _events_by_hour([1 + i // 2 for i in range(192)]),
        tmp_path / "events.parquet",
    )
    out = q_dfa(str(tmp_path))
    assert set(out["window_h"]) == {24, 48, 96}
    assert out["dfa_alpha"].iloc[0] > 1.0
    assert (out["fluct"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_simpson_uniform_tokens(tmp_path):
    # 4 distinct tokens x 3 each: T=12, num = 4*3*2 = 24, den = 12*11
    pq.write_table(
        _docs(["aa bb cc dd", "aa bb cc dd", "aa bb cc dd"]),
        tmp_path / "documents.parquet",
    )
    out = q_simpson_diversity(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 12 and r["vocab"] == 4
    assert r["simpson"] == round(24.0 / 132.0, 6)
    assert r["effective_vocab"] == round(132.0 / 24.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_stopword_coverage_known(tmp_path):
    pq.write_table(
        _docs(["the cat and the dog", "zebra quark"]),
        tmp_path / "documents.parquet",
    )
    out = q_stopword_coverage(str(tmp_path))
    r = out.iloc[0]
    # tokens: the, cat, and, the, dog, zebra, quark -> 7; stop: the, and, the -> 3
    assert r["n_tokens"] == 7 and r["n_stopwords"] == 3
    assert r["coverage"] == round(3.0 / 7.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_exp_gof_metronome_vs_poisson(tmp_path):
    # perfectly regular arrivals: ECDF is a step at the single gap value;
    # just below the step the exponential CDF has risen to 1 - e^-1 while
    # the ECDF is still ~0, so D ~= 1 - e^-1 ~= 0.632
    n = 200
    ts = [T0 + i * 1_000_000 for i in range(n)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_exp_gof(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_gaps"] == n - 1
    assert r["rate_per_s"] == 1.0  # one event per second
    assert abs(r["ks_d"] - (1.0 - math.exp(-1.0))) < 0.01
