"""Kernel tests for pipelines/queries127.py — codec roundtrips through
the query surface and the compression-stat accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type, value, users=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.asarray(
                users if users is not None else np.ones(n), dtype=np.int64
            ),
            "event_type": event_type,
            "value": np.asarray(value, dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_gorilla_roundtrip_emits_exact_means(tmp_path):
    from signalsharp_ray.pipelines.queries127 import q_gorilla_roundtrip_audit

    ts = ["2024-01-01 10:00:30", "2024-01-01 10:20:30", "2024-01-01 12:00:30"]
    _write_events(tmp_path, ts, "m", [1.25, 2.75, 10.0])
    out = q_gorilla_roundtrip_audit(str(tmp_path)).sort_values("hour")
    assert len(out) == 2
    assert out.iloc[0]["mean_value"] == pytest.approx(2.0)  # (1.25+2.75)/2
    assert out.iloc[1]["mean_value"] == pytest.approx(10.0)
    assert out.iloc[0]["n_events"] == 2


@pytest.mark.usefixtures("ray_session")
def test_dod_irregular_roundtrip_bit_exact(tmp_path):
    from signalsharp_ray.pipelines.queries127 import q_dod_irregular_roundtrip

    # irregular gaps incl. sub-second and sign-flipping second diffs
    ts = [
        "2024-01-01 00:00:00.000001",
        "2024-01-01 00:00:00.500000",
        "2024-01-01 00:00:01.000000",
        "2024-01-01 03:17:45.123456",
        "2024-01-02 03:17:45.123457",
    ]
    _write_events(tmp_path, ts, "e", np.ones(5), users=[7] * 5)
    out = q_dod_irregular_roundtrip(str(tmp_path))
    assert list(out["seq"]) == [0, 1, 2, 3, 4]
    got = out["ts"].astype("datetime64[us]").to_numpy().view(np.int64)
    want = pd.to_datetime(ts).astype("datetime64[us]").to_numpy().view(np.int64)
    assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
def test_compression_stats_accounting(tmp_path):
    from signalsharp_ray.pipelines.queries127 import q_codec_compression_stats

    ts = [f"2024-01-01 {h:02d}:00:30" for h in range(24)]
    _write_events(tmp_path, ts, "c", np.full(24, 5.0))
    out = q_codec_compression_stats(str(tmp_path))
    r = out.iloc[0]
    assert r["n_points"] == 24
    assert r["raw_bytes"] == 24 * 16
    # constant series on a regular grid compresses hard
    assert r["gorilla_bytes"] + r["dod_bytes"] < r["raw_bytes"]
    assert r["compression_ratio"] > 1.0
