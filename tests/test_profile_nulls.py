"""profile_events must skip NULL values like the oracle's MIN/MAX/SUM.

Round-3 ADVICE: the numpy rewrite used v.min()/v.max()/vc.sum() over the
raw value array, which propagate NaN — any NULL in events.value (already
counted by the in-contract n_null_value column) would poison min/max/sum
while the DuckDB oracle skips NULLs. This test builds an events table with
NULLs (the shipped testdata has none) and checks engine == oracle.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("null_events")
    rng = np.random.default_rng(7)
    n = 5000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 30 * 86400, n), unit="s"
    )
    value = np.round(rng.uniform(-50, 500, n), 4)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, 200, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase"], n),
            "value": value,
            "props": "{}",
        }
    )
    # ~7% NULL values, including one whole leading stretch so at least one
    # partial batch is likely all-NaN when batches are small
    df.loc[df.index[:150], "value"] = np.nan
    df.loc[df.sample(frac=0.07, random_state=3).index, "value"] = np.nan
    df.to_parquet(os.path.join(root, "events.parquet"), index=False)
    return str(root)


def test_profile_events_skips_nulls(ray_session, null_events_dir):
    from signalsharp_ray.pipelines.queries3 import ORACLES3, QUERIES3

    got = (
        QUERIES3["profile_events"](null_events_dir)
        .to_pandas()
        .iloc[0]
    )
    con = duckdb.connect()
    pq_path = os.path.join(null_events_dir, "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq_path}')"
    )
    want = con.execute(ORACLES3["profile_events"]).fetchdf().iloc[0]
    for col in [
        "n_rows", "n_null_value", "min_value_c", "max_value_c",
        "sum_value_c", "min_ts_us", "max_ts_us",
    ]:
        assert int(got[col]) == int(want[col]), col


def test_profile_partial_all_null_batch(ray_session, tmp_path):
    """A table whose every value is NULL must not crash; min/max fold to
    the neutral sentinels and sum to 0 (oracle would return NULL there, so
    this path is engine-robustness, not oracle parity)."""
    from signalsharp_ray.pipelines.queries3 import QUERIES3

    n = 100
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min").astype(
                "datetime64[us]"
            ),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": "view",
            "value": np.full(n, np.nan),
            "props": "{}",
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = QUERIES3["profile_events"](str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_rows"]) == n
    assert int(got["n_null_value"]) == n
    assert int(got["sum_value_c"]) == 0
