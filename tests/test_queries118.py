"""Kernel tests for pipelines/queries118.py — session trigram paths and
the power-iteration eigenpair (pinned against numpy.linalg.eigh, since
the query is rows-only by design)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_session_path_trigrams_respects_session_gaps(tmp_path):
    from signalsharp_ray.pipelines.queries118 import q_session_path_trigrams

    rows = [
        # user 1, one session: view>click>purchase and click>purchase>view
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        (1, "2024-01-01 10:15:00", "view"),
        # > 30 min gap: new session — the cross-gap trigram must NOT count
        (1, "2024-01-01 11:00:00", "view"),
        (1, "2024-01-01 11:01:00", "click"),
        # user 2 repeats view>click>purchase
        (2, "2024-01-02 09:00:00", "view"),
        (2, "2024-01-02 09:01:00", "click"),
        (2, "2024-01-02 09:02:00", "purchase"),
    ]
    _write_events(tmp_path, rows)
    out = q_session_path_trigrams(str(tmp_path))
    top = dict(zip(out["path"], out["n_occurrences"]))
    assert top["view>click>purchase"] == 2
    assert top["click>purchase>view"] == 1
    # session 2 of user 1 has only 2 events: no trigram crosses the gap
    assert "purchase>view>view" not in top
    assert "view>view>click" not in top


@pytest.mark.usefixtures("ray_session")
def test_embedding_top_eigen_matches_numpy(tmp_path):
    from signalsharp_ray.pipelines.queries118 import q_embedding_top_eigen

    rng = np.random.default_rng(11)
    d = 8
    # anisotropic cloud: coordinate 2 dominates the variance
    base = rng.normal(0, 0.05, size=(400, d))
    base[:, 2] += rng.normal(0, 1.0, size=400)
    base = np.round(base, 6)  # micro-unit grid: quantization is identity
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(base), dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in base],
            "label": np.zeros(len(base), dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "embeddings.parquet")

    out = q_embedding_top_eigen(str(tmp_path)).iloc[0]

    q = np.rint(base * 1e6).astype(np.int64)
    n = len(q)
    cov = (
        (q.T @ q).astype(np.float64) / n
        - np.outer(q.sum(0), q.sum(0)).astype(np.float64) / (n * n)
    ) / 1e12
    evals, evecs = np.linalg.eigh(cov)
    lam, vec = evals[-1], evecs[:, -1]

    assert int(out["n_vectors"]) == n
    assert abs(float(out["top_eigenvalue"]) - lam) < 1e-6 * max(1.0, lam)
    assert int(out["top_coord"]) == int(np.argmax(np.abs(vec)))
    assert abs(float(out["top_coord_weight"]) - abs(vec).max()) < 1e-4
