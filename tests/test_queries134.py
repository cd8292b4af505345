"""Kernel tests for pipelines/queries134.py — PSI on a shifted
distribution, burstiness on constructed corpora, SES backtest hand
math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (ts, value)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[0] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(len(rows), dtype=np.int64),
            "event_type": "t",
            "value": np.array([r[1] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_psi_zero_for_identical_halves_positive_for_shift(tmp_path):
    from signalsharp_ray.pipelines.queries134 import q_value_psi

    # 10 days; first half days 1-5, second 6-10
    same = [(f"2024-01-{d:02d} 10:00", float(v))
            for d in range(1, 11) for v in range(1, 21)]
    _write_events(tmp_path, same)
    out = q_value_psi(str(tmp_path)).to_pandas()
    assert out.iloc[0]["psi"] == pytest.approx(0.0, abs=1e-9)

    shifted = [(f"2024-01-{d:02d} 10:00", float(v + (50 if d > 5 else 0)))
               for d in range(1, 11) for v in range(1, 21)]
    _write_events(tmp_path, shifted)
    out2 = q_value_psi(str(tmp_path)).to_pandas()
    assert out2.iloc[0]["psi"] > 1.0  # full distribution shift


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_burstiness_separates_topical_from_uniform(tmp_path):
    from signalsharp_ray.pipelines.queries134 import q_word_burstiness

    # "the" once per doc (uniform); "zebra" 4x in one doc only (bursty)
    texts = ["the aa", "the bb", "the cc", "the zebra zebra zebra zebra"]
    _write_docs(tmp_path, texts)
    out = q_word_burstiness(str(tmp_path)).set_index("token")
    # the: counts [1,1,1,1] -> var 0 -> burstiness 0
    assert out.loc["the", "burstiness"] == pytest.approx(0.0)
    # zebra: counts [0,0,0,4] over 4 docs: mean 1, var 3 -> VMR 3
    assert out.loc["zebra", "burstiness"] == pytest.approx(3.0)


@pytest.mark.usefixtures("ray_session")
def test_ses_backtest_hand_recurrence(tmp_path):
    from signalsharp_ray.pipelines.queries134 import q_ses_backtest

    # daily counts 2, 4, 6 (3 days)
    rows = []
    for d, n in [(1, 2), (2, 4), (3, 6)]:
        rows += [(f"2024-01-{d:02d} 10:00", 1.0)] * n
    _write_events(tmp_path, rows)
    out = q_ses_backtest(str(tmp_path))
    r = out.iloc[0]
    # origins: t=0 level=2, err |2-4|=2; t=1 level=.3*4+.7*2=2.6,
    # err |2.6-6|=3.4 -> mae 2.7; naive mae = (2+2)/2 = 2
    assert r["n_origins"] == 2
    assert r["ses_mae"] == pytest.approx(2.7)
    assert r["naive_mae"] == pytest.approx(2.0)
    assert r["mae_ratio"] == pytest.approx(1.35)
