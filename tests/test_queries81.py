"""Kernel test for pipelines/queries81.py — transition lift known
answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries81 import q_transition_lift


@pytest.mark.usefixtures("ray_session")
def test_transition_lift_known(tmp_path):
    # one user: a -> b -> a -> b  => transitions ab, ba, ab
    ts = [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "m")
          for i in range(4)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(4, dtype=np.int64),
            "event_type": ["a", "b", "a", "b"],
            "value": np.ones(4, dtype=np.float64),
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_transition_lift(str(tmp_path)).set_index(["from_type", "to_type"])
    # totals: 3 transitions; to-marginals: b=2, a=1
    # P(b|a)=1, P(b)=2/3 -> lift 1.5 ; P(a|b)=1, P(a)=1/3 -> lift 3
    assert out.loc[("a", "b"), "n_transitions"] == 2
    assert out.loc[("a", "b"), "lift"] == 1.5
    assert out.loc[("b", "a"), "n_transitions"] == 1
    assert out.loc[("b", "a"), "lift"] == 3.0
